"""Distributed k-means over embedding columns.

The iterative ML primitive beyond PageRank/connected-components: each
iteration is ONE map stage (assign: broadcast centroids, vectorized
argmin over Arrow batches) plus ONE hash shuffle (recompute: sum
vectors per cluster with map-side partial aggregation). No driver
ever holds more than k × dim floats, so the same loop runs a
billion-row corpus; lineage is cut per iteration the same way the
graph operators do it.

Determinism: centroids init from the k lowest-id vectors, assignment
ties break toward the lower cluster index, and the recompute sums
components as float64 (order-dependent at the last bit in theory;
the differential test tolerance covers it) — the
differential test (tests/test_operators.py) checks the distributed
result against a dense numpy reference running the identical
algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_udf(centroids: np.ndarray):
    c = centroids.astype(np.float64)            # (k, dim)
    c_norm2 = (c * c).sum(axis=1)               # (k,)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # argmin over squared euclidean distance via the expansion
        # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 (||x||^2 is constant
        # per row, so it never enters the argmin)
        d = -2.0 * (x @ c.T) + c_norm2[None, :]
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return assign


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iterations: int = 5,
) -> DataFrame:
    """Run ``iterations`` of Lloyd's algorithm; returns the final
    (id, cluster) assignment. Init = the k vectors with the smallest
    md5('kmeans-seed' || id) — deterministic AND spread uniformly
    over the corpus even when ids correlate with content (lowest-id
    seeding starts every centroid in the same content neighborhood;
    same hash-ordered scheme as similarity.fit_ivf_centroids)."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    init = (
        base.orderBy(
            F.md5(F.concat(F.lit("kmeans-seed"), F.col("id").cast("string")))
        )
        .limit(k)
        .collect()
    )
    centroids = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in init])

    for _ in range(iterations):
        assigned = base.withColumn(
            "cluster", _assign_udf(centroids)(F.col("vec"))
        )
        # recompute: posexplode to (cluster, dim, component) and SUM —
        # partial (map-side) aggregation applies, the shuffle carries
        # k×dim partial sums per task, and no task ever materializes a
        # whole cluster (collect_list would — quadratic death when one
        # cluster owns most of the corpus)
        comp = assigned.select(
            "cluster",
            F.posexplode(F.col("vec").cast("array<double>")).alias(
                "dim", "val"
            ),
        )
        sums = (
            comp.groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_c = centroids.copy()                 # empty cluster keeps its spot
        counts: dict[int, int] = {}
        for r in sums:
            counts[r["cluster"]] = r["n"]
            new_c[r["cluster"], r["dim"]] = r["s"] / float(r["n"])
        centroids = new_c

    return base.withColumn(
        "cluster", _assign_udf(centroids)(F.col("vec"))
    ).select("id", "cluster")
