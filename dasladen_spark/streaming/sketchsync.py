"""Streaming maintenance of a mergeable HLL sketch table.

The daily distinct-users sketch (operators/sketches.hll_sketch) is a
per-(key, bucket) MAXIMUM — a mergeable aggregate, so the streaming
story is the matview pattern (streaming/matview): each micro-batch's
bucket maxima fold into the crash-safe snapshot with max(), and the
snapshot at any moment equals a from-scratch batch build over every
row ever delivered (max is associative, commutative AND idempotent —
replays are harmless even before the applied-batch marker kicks in).
Readers estimate straight off the snapshot with
operators/sketches.hll_estimate, or roll it up (daily → monthly)
with hll_merge — same table shape as the batch ``sketch`` task
(tasks.run_sketch), so batch backfills and the stream maintain ONE
artifact.

Same design as the score-normalization sync (streaming/scoresync)
and the NB model sync (streaming/modelsync): state is rows of exact
integers, merge is a groupBy.

Beyond-reference operator (the reference's watcher is folder-poll
batch, /root/reference/dasladen/processor.py; no streaming exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dasladen_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_rows,
)
from dasladen_spark.streaming.matview import run_incremental_matview


def run_streaming_hll_sketch(
    stream: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols: list[str],
    value_col: str,
    m: int = 16,
) -> None:
    """Drain a stream into the (key_cols..., bucket, m_j) HLL
    snapshot. NULL keys/values are dropped inside hll_rows — the
    SHARED row producer — so the maintained snapshot equals a batch
    hll_sketch over every row ever delivered, NULLs included."""
    rows = hll_rows(stream, key_cols, value_col, m=m)
    run_incremental_matview(
        rows,
        snapshot_path,
        checkpoint,
        [*key_cols, "bucket"],
        {"m_j": "max(rho)"},
        combine={"m_j": "max"},
    )


def read_sketch_estimates(
    spark: SparkSession,
    snapshot_path: str,
    group_cols: list[str],
    m: int = 16,
) -> DataFrame:
    """(group_cols..., est_distinct) from the maintained snapshot —
    the read side of the sync. The snapshot is MERGED to the
    requested keys first (per-bucket MAX): estimating a
    finer-keyed snapshot directly would SUM duplicate buckets'
    harmonic terms and count > m rows per group — garbage (even
    negative-denominator) estimates. Merging to the snapshot's own
    keys is a no-op, so one code path serves both reads."""
    return hll_estimate(
        hll_merge(spark.read.parquet(snapshot_path), group_cols),
        group_cols,
        m=m,
    )
