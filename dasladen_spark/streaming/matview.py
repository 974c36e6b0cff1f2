"""Incrementally-maintained materialized view over a stream.

The lakehouse 'upsert sink': each micro-batch's per-key aggregates
are combined into a parquet snapshot, so readers always see one row
per key covering everything ingested so far.

Exactly-once: foreachBatch can REPLAY a batch after a crash between
the snapshot write and the checkpoint commit; an additive combine
would double-count it. The sink therefore records the last applied
batch id next to the snapshot and skips batches it has already
applied — the standard idempotent-foreachBatch pattern. On a
transactional format (Delta/Iceberg) the txn id in MERGE plays this
role; the dataflow is unchanged.

At 100 TB the full snapshot rewrite is the cost driver; swapping the
parquet read/write for a Delta MERGE turns it into a file-level
upsert, keeping everything else.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_incremental_matview(
    stream: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols: list[str] | str,
    agg_exprs: dict[str, str],
) -> None:
    """Maintain per-key ADDITIVE aggregates of ``stream`` in a
    parquet snapshot. ``agg_exprs`` maps output column → SQL
    aggregate over the batch (e.g. {"n": "count(1)",
    "total": "sum(value)"}); measures must be sum-combinable.

    Merging batch aggregates (not raw rows) keeps the shuffle to the
    batch's key set; the result equals a full batch recompute."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    spark = stream.sparkSession
    marker = snapshot_path + ".last_batch"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # replay of an already-applied batch
        batch_agg = batch_df.groupBy(*keys).agg(
            *[F.expr(e).alias(c) for c, e in agg_exprs.items()]
        )
        if os.path.exists(snapshot_path):
            prev = spark.read.parquet(snapshot_path)
            combined = (
                prev.unionByName(batch_agg)
                .groupBy(*keys)
                .agg(*[F.sum(c).alias(c) for c in agg_exprs])
            )
        else:
            combined = batch_agg
        # write-aside then swap: can't overwrite a path being read
        combined.write.mode("overwrite").parquet(snapshot_path + ".tmp")
        spark.read.parquet(snapshot_path + ".tmp").write.mode(
            "overwrite"
        ).parquet(snapshot_path)
        with open(marker, "w") as fh:
            fh.write(str(batch_id))

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_upsert(
    stream: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols: list[str] | str,
    version_col: str,
) -> None:
    """Last-write-wins keyed upsert of a change stream into a parquet
    snapshot — the CDC-apply sink: readers always see exactly one row
    per key, the one with the highest ``version_col`` (ties broken
    toward the incoming batch, i.e. later appearance wins).

    Exactly-once via the same applied-batch marker as the matview
    (replays skip); per batch the work is one key shuffle over
    batch ∪ snapshot keys. On a transactional table format the union+
    window collapses to MERGE WHEN MATCHED — dataflow unchanged."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    spark = stream.sparkSession
    marker = snapshot_path + ".last_batch"

    from pyspark.sql import Window

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return
        # collapse the batch itself first (a key may change twice in
        # one batch); __src=1 marks incoming rows so they beat equal
        # versions already in the snapshot
        incoming = batch_df.withColumn("__src", F.lit(1))
        if os.path.exists(snapshot_path):
            prev = spark.read.parquet(snapshot_path).withColumn(
                "__src", F.lit(0)
            )
            merged = prev.unionByName(incoming)
        else:
            merged = incoming
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc(), F.col("__src").desc()
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
        latest.write.mode("overwrite").parquet(snapshot_path + ".tmp")
        spark.read.parquet(snapshot_path + ".tmp").write.mode(
            "overwrite"
        ).parquet(snapshot_path)
        with open(marker, "w") as fh:
            fh.write(str(batch_id))

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
