"""Same-process interleaved A/B for the r12 lattice-assignment
kernel rewrite (assign_cells HOF spelling + fused Lloyd recompute in
kmeans_fit / fit_ivf_centroids) vs the round-11 shapes (posexplode →
hash-aggregate assignment + zpos-join recompute).

The OLD implementations are verbatim copies of the pre-change
functions; each rep monkeypatches the operator modules to one
variant, builds the query DataFrame from scratch and times
build + .count() — phase noise hits both arms equally because the
arms alternate inside ONE JVM.

Usage: python tools/ab_lattice_kernel.py [pairs] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_assign_cells(
    df, cent_mat, id_col, vec_col, out_col="cell", normalize=True
):
    from dasladen_spark.operators.pq import (
        PQ_QUANT,
        _lat,
        _zc_lit,
        lattice_denom,
    )

    cm = np.asarray(cent_mat, np.float64)
    ksub, dim = cm.shape
    zc = [[_lat(v) for v in row] for row in cm]
    denom = lattice_denom(F.col(vec_col)) if normalize else F.lit(1.0)
    ex = df.select(
        F.col(id_col).alias("_aid"),
        F.monotonically_increasing_id().alias("_asalt"),
        F.col(vec_col).cast("array<double>").alias("_av"),
        denom.alias("_adenom"),
    ).select(
        "_aid",
        "_asalt",
        "_adenom",
        F.posexplode("_av").alias("_pos", "_x"),
    )
    ex = ex.select(
        "_aid",
        "_asalt",
        "_pos",
        F.floor(
            (F.col("_x") / F.col("_adenom")) * F.lit(PQ_QUANT) + F.lit(0.5)
        ).alias("_zx"),
    )
    sums = [
        F.expr(
            f"sum((_zx - element_at({_zc_lit(zc[c])}, _pos + 1))"
            f" * (_zx - element_at({_zc_lit(zc[c])}, _pos + 1)))"
        ).alias(f"_ad{c}")
        for c in range(ksub)
    ]
    agg = ex.groupBy("_aid", "_asalt").agg(*sums)
    darr = F.array(*[F.col(f"_ad{c}") for c in range(ksub)])
    return agg.select(
        F.col("_aid").alias(id_col),
        (F.array_position(darr, F.array_min(darr)) - 1)
        .cast("int")
        .alias(out_col),
    )


def old_with_cells(
    df, cent_mat, vec_col, out_col="cell", id_col="neighbor_id"
):
    return df.join(
        old_assign_cells(df, cent_mat, id_col, vec_col, out_col), id_col
    )


def old_kmeans_fit(
    df, vec_col, id_col, k=8, iterations=5, fit_fraction=None
):
    from dasladen_spark.operators.pq import PQ_QUANT
    from dasladen_spark.operators.sampling import (
        portable_sample_filter,
        validate_fit_fraction,
    )

    full = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    base = full
    if validate_fit_fraction(fit_fraction):
        base = base.filter(
            portable_sample_filter(
                F.col("id"), fit_fraction, salt="kmeans-seed-fit"
            )
        )
    base = base.persist()
    try:
        init = (
            base.orderBy(
                F.md5(
                    F.concat(
                        F.lit("kmeans-seed"), F.col("id").cast("string")
                    )
                )
            )
            .limit(k)
            .collect()
        )
        if len(init) < k:
            raise ValueError(
                f"kmeans_fit: corpus has {len(init)} rows, needs k={k}"
            )
        cent = [[float(x) for x in r["vec"]] for r in init]
        zpos = base.select(
            "id",
            F.posexplode(F.col("vec").cast("array<double>")).alias(
                "_pos", "_x"
            ),
        ).select(
            "id",
            "_pos",
            F.floor(F.col("_x") * F.lit(PQ_QUANT) + F.lit(0.5)).alias(
                "_zx"
            ),
        )
        for _ in range(iterations):
            cells = old_assign_cells(
                base,
                np.asarray(cent),
                "id",
                "vec",
                "cluster",
                normalize=False,
            )
            stats = (
                zpos.join(cells, "id")
                .groupBy("cluster", "_pos")
                .agg(
                    F.sum("_zx").alias("_s"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()
            )
            for r in stats:
                cent[r["cluster"]][r["_pos"]] = r["_s"] / (
                    r["_n"] * PQ_QUANT
                )
        return old_assign_cells(
            full,
            np.asarray(cent),
            "id",
            "vec",
            "cluster",
            normalize=False,
        ).select("id", "cluster")
    finally:
        base.unpersist()


def old_fit_ivf_centroids(c, n_centroids, lloyd_iters, fit_fraction=None):
    from dasladen_spark.operators.pq import (
        PQ_QUANT,
        collect_normalized,
        lattice_denom,
    )
    from dasladen_spark.operators.sampling import (
        portable_sample_filter,
        validate_fit_fraction,
    )

    base = c.select(
        F.col("neighbor_id").alias("_id"), F.col("cv").alias("_v")
    )
    if validate_fit_fraction(fit_fraction):
        base = base.filter(
            portable_sample_filter(
                F.col("_id"), fit_fraction, salt="ivf-seed-fit"
            )
        )
    base = base.persist()
    try:
        seeds = collect_normalized(
            base.orderBy(
                F.md5(
                    F.concat(F.lit("ivf-seed"), F.col("_id").cast("string"))
                )
            ).limit(n_centroids),
            "_id",
            "_v",
        )
        if len(seeds) < n_centroids:
            raise ValueError(
                f"fit_ivf_centroids: corpus has {len(seeds)} rows,"
                f" needs at least n_centroids={n_centroids}"
            )
        cent = [[float(v) for v in xn] for _sid, xn in seeds]
        zpos = base.select(
            "_id",
            lattice_denom(F.col("_v")).alias("_d"),
            F.posexplode(F.col("_v").cast("array<double>")).alias(
                "_pos", "_x"
            ),
        ).select(
            "_id",
            "_pos",
            F.floor(
                (F.col("_x") / F.col("_d")) * F.lit(PQ_QUANT)
                + F.lit(0.5)
            ).alias("_zx"),
        )
        for _ in range(lloyd_iters):
            cells = old_assign_cells(base, np.asarray(cent), "_id", "_v")
            stats = (
                zpos.join(cells, "_id")
                .groupBy("cell", "_pos")
                .agg(
                    F.sum("_zx").alias("_s"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()
            )
            for r in stats:
                cent[r["cell"]][r["_pos"]] = r["_s"] / (
                    r["_n"] * PQ_QUANT
                )
    finally:
        base.unpersist()
    return np.array(cent, np.float64)


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or [
        "dedup_semantic_clusters",
        "kmeans_embeddings",
        "ann_ivf_topk",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import dasladen_spark.operators.clustering as clus
    import dasladen_spark.operators.similarity as sim
    from dasladen_spark.plans import QUERIES
    from dasladen_spark.session import get_spark

    new_impls = (
        sim.assign_cells,
        clus.kmeans_fit,
        sim.fit_ivf_centroids,
        sim.with_cells,
    )
    old_impls = (
        old_assign_cells,
        old_kmeans_fit,
        old_fit_ivf_centroids,
        old_with_cells,
    )

    def set_variant(old: bool) -> None:
        impls = old_impls if old else new_impls
        (
            sim.assign_cells,
            clus.kmeans_fit,
            sim.fit_ivf_centroids,
            sim.with_cells,
        ) = impls
        # ann_index imported these by value at module load
        import dasladen_spark.operators.ann_index as ai

        ai.fit_ivf_centroids = impls[2]
        ai.with_cells = impls[3]

    spark = get_spark("ab-lattice-kernel")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for name in names:
        fn = QUERIES[name]
        # warm both arms once (index/file caches settle)
        for old in (False, True):
            set_variant(old)
            fn(spark, sf_dir).count()
        walls: dict = {"old": [], "new": []}
        rows: dict = {"old": None, "new": None}
        for _p in range(pairs):
            # alternate which arm goes first: in a drifting machine
            # phase the first run of a pair is systematically
            # penalized, so a fixed order biases the comparison
            order = (True, False) if _p % 2 == 0 else (False, True)
            for old in order:
                set_variant(old)
                spark.catalog.clearCache()
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                walls["old" if old else "new"].append(
                    round(time.time() - t0, 3)
                )
                rows["old" if old else "new"] = n
        assert rows["old"] == rows["new"], (name, rows)
        out[name] = {"rows": rows["new"], **walls}
        print(json.dumps({name: out[name]}), flush=True)
    set_variant(False)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
