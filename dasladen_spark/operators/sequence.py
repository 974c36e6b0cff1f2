"""Distributed gap detection over an integer key sequence.

The classic islands-and-gaps query is ``LEAD(id) OVER (ORDER BY id)``
— a global-order window that Spark plans as a SINGLE PARTITION (every
row through one task). The scalable form mirrors operators/ranking.py:
range-partition on the key, find gaps within each partition with a
local lead, then close the seams with a per-partition (min, max)
summary — one row per partition, folded driver-side (O(partitions),
never O(rows)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__seq_pid"


def sequence_gaps(
    df: DataFrame,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """(rows with integer ``id_col``) → (gap_start, gap_end, gap_len):
    every maximal run of values missing from the sequence between the
    observed min and max. Exact and deterministic; duplicates in the
    input collapse first.

    Cost: one range shuffle + one pid-key shuffle (the within-
    partition lead), plus a partition-count-sized bounds collect —
    the same two-job shape as global_row_number, so it runs on a
    billion-row ledger without a single-task sort."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    ranged = (
        ids.repartitionByRange(n_parts, F.col("id"))
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin sampled range boundaries
    )
    w = Window.partitionBy(_PID).orderBy("id")
    within = (
        ranged.withColumn("__nxt", F.lead("id").over(w))
        .filter(F.col("__nxt") - F.col("id") > 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("__nxt") - 1).alias("gap_end"),
        )
    )
    # seams: consecutive partitions' (max, next min) — one row per
    # partition, never data-sized
    bounds = sorted(
        (r[_PID], r["lo"], r["hi"])
        for r in ranged.groupBy(_PID)
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    seam_rows = [
        (int(prev_hi + 1), int(lo - 1))
        for (_, _, prev_hi), (_, lo, _) in zip(bounds, bounds[1:])
        if lo - prev_hi > 1
    ]
    spark = df.sparkSession
    gaps = within
    if seam_rows:
        gaps = gaps.unionByName(
            spark.createDataFrame(seam_rows, "gap_start long, gap_end long")
        )
    return gaps.select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )
