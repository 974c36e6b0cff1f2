"""Micro A/B isolating the ivf_cosine_topk pieces (fit round, lists
build, full query) old vs new kernel — same-process interleaved.

Usage: python tools/ab_ivf_pieces.py [pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.ab_lattice_kernel import (  # noqa: E402
    old_assign_cells,
    old_fit_ivf_centroids,
    old_with_cells,
)


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import dasladen_spark.operators.similarity as sim
    from dasladen_spark.session import get_spark, load_table

    spark = get_spark("ab-ivf-pieces")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    c = sim._spread(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        ),
        "neighbor_id",
    )

    new_fit, new_wc = sim.fit_ivf_centroids, sim.with_cells

    def run(piece: str, old: bool) -> float:
        t0 = time.time()
        if piece == "fit":
            fit = old_fit_ivf_centroids if old else new_fit
            fit(c, 16, 1)
        elif piece == "lists":
            cent = CENT
            wc = old_with_cells if old else new_wc
            wc(c, cent, "cv").withColumn(
                "_cn", sim.l2_norm(F.col("cv"))
            ).write.format("noop").mode("overwrite").save()
        elif piece == "assign":
            asg = old_assign_cells if old else sim.assign_cells
            asg(c, CENT, "neighbor_id", "cv").write.format("noop").mode(
                "overwrite"
            ).save()
        return round(time.time() - t0, 3)

    CENT = new_fit(c, 16, 1)
    out: dict = {}
    for piece in ("fit", "assign", "lists"):
        for old in (True, False):
            run(piece, old)  # warm
        walls: dict = {"old": [], "new": []}
        for _ in range(pairs):
            for old in (True, False):
                walls["old" if old else "new"].append(run(piece, old))
        out[piece] = walls
        print(json.dumps({piece: walls}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
