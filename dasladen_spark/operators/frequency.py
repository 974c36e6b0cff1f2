"""Certified-exact heavy hitters — top-k frequent values with a
bounded-shuffle plan and a proof of its own exactness.

The naive exact top-k (`groupBy(col).count().orderBy(...).limit(k)`)
shuffles one row per DISTINCT value — at 100 TB of text that is the
full vocabulary (billions of n-grams), and the shuffle IS the query
cost. This operator caps the shuffle at ``P × k×slack`` candidate
rows regardless of vocabulary size:

1. **Candidates** — one Misra-Gries summary per partition
   (``k×slack`` counters, O(1) memory per partition, one pass).
   MG's guarantee: any value with in-partition frequency above
   ``n_p / (k·slack)`` survives partition p; summing over partitions,
   any value with GLOBAL frequency above ``N / (k·slack)`` survives
   in at least one partition — so the candidate union is a superset
   of every sufficiently-frequent value.
2. **Exact recount** — broadcast the candidate set, semi-join, and
   count exactly (map-side combined: ≤ |candidates| rows shuffle).
3. **Certificate** — if the k-th recounted frequency exceeds
   ``N / (k·slack)``, step 1's guarantee says no non-candidate can
   outrank it: the result is EXACT, and the operator proves it from
   its own outputs. Otherwise (adversarially flat distributions) it
   raises rather than silently returning approximations — raise
   ``slack`` and re-run.

Beyond-reference operator (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class UncertifiedTopK(RuntimeError):
    """The MG threshold cannot certify exactness at this slack."""


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    k: int = 20,
    slack: int = 8,
    on_uncertified: str = "raise",
) -> DataFrame:
    """Exact (certified) top-``k`` values of ``df[col]`` by count,
    ties broken by value — see module docstring for the plan shape.
    Returns (``col``, freq) ordered by freq desc, value asc."""
    import pandas as pd

    k2 = k * slack
    vals = df.select(F.col(col).alias("v"))
    v_type = vals.schema["v"].dataType.simpleString()

    def mg_partition(batches):
        counters: dict = {}
        n_rows = 0
        evicted = False
        for pdf in batches:
            for v in pdf["v"]:
                if v is None:
                    continue
                n_rows += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k2:
                    counters[v] = 1
                else:
                    evicted = True
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {
                "v": list(counters.keys()) + [None],
                "n": [None] * len(counters) + [n_rows],
                "evicted": [None] * len(counters) + [evicted],
            }
        )

    summary = vals.mapInPandas(
        mg_partition, f"v {v_type}, n bigint, evicted boolean"
    ).persist()
    try:
        tallies = summary.filter(F.col("n").isNotNull()).agg(
            F.sum("n").alias("n_total"),
            F.max(F.col("evicted").cast("int")).alias("any_evicted"),
        ).collect()[0]
        n_total = tallies["n_total"] or 0
        any_evicted = bool(tallies["any_evicted"])
        cands = summary.filter(F.col("v").isNotNull()).select("v").distinct()
        counts = (
            vals.join(F.broadcast(cands), "v", "left_semi")
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        topk = (
            counts.orderBy(F.col("freq").desc(), F.col("v").asc())
            .limit(k)
            .collect()
        )
    finally:
        summary.unpersist()
    # exactness certificate, two sufficient conditions:
    # - no partition ever evicted → the candidates ARE every distinct
    #   value (a result shorter than k just means < k distinct values)
    # - k full rows whose kth frequency clears the MG survival bound
    #   → no non-candidate can outrank any of them
    threshold = n_total / k2
    certified = not any_evicted or (
        len(topk) == k and topk[-1]["freq"] > threshold
    )
    if not certified:
        kth = topk[-1]["freq"] if topk else 0
        msg = (
            f"top-{k} not certifiable: {len(topk)} candidate rows, kth "
            f"frequency {kth} <= N/(k*slack) = {threshold:.1f}; raise "
            f"slack (currently {slack})"
        )
        if on_uncertified == "raise":
            raise UncertifiedTopK(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r["v"], r["freq"]) for r in topk], f"{col} {v_type}, freq bigint"
    ).orderBy(F.col("freq").desc(), F.col(col).asc())
