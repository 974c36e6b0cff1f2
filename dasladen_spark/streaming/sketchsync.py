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

from dasladen_spark.operators.sketches import hll_estimate, hll_rows
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
    snapshot. Rows with a NULL key or value are dropped (a NULL key
    would shadow a real group; a NULL value hashes to the md5 of the
    string 'null' on some paths and to nothing on others — exclude
    it from cardinalities outright, as the batch build's groupBy
    does implicitly for the estimate's consumers)."""
    from pyspark.sql import functions as F

    clean = stream
    for c in [*key_cols, value_col]:
        clean = clean.filter(F.col(c).isNotNull())
    rows = hll_rows(clean, key_cols, value_col, m=m)
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
    the read side of the sync; rolls up to coarser keys for free
    because the estimate's groupBy IS the merge."""
    return hll_estimate(
        spark.read.parquet(snapshot_path), group_cols, m=m
    )
