"""Streaming dedup intake: a document stream filtered against — and
feeding — the materialized fingerprint index.

The batch entry point (operators/fingerprint_index) handles scheduled
drops; this is the continuous version: every micro-batch is deduped
within itself, anti-joined against the bucketed index with zero
index-side shuffle, its novel docs land in the accept area, and its
novel fingerprints are appended to the index so the NEXT micro-batch
(and any concurrent batch pipeline sharing the table) dedups against
them.

Replay safety has two layers:

- output: accepted docs write to ``accept_path/batch=N`` with
  overwrite, and an applied-batch marker short-circuits re-delivered
  batches (same pattern as streaming/matview).
- index: appends are tagged with the appending batch id, and the
  anti-join reads only ``batch_id < N`` — so even a batch that
  crashed AFTER its index append recomputes exactly the novel set it
  saw originally instead of finding its own fingerprints and
  emitting nothing (the subtle loss mode a naive untagged index
  has). Duplicate appended rows from the replay are harmless:
  anti-join semantics ignore multiplicity.

Beyond-reference operator (the reference's watcher is folder-poll
batch, /root/reference/dasladen/processor.py; no streaming exists).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dasladen_spark.functions.text import fingerprint
from dasladen_spark.operators.dedup import exact_dedup
from dasladen_spark.operators.fingerprint_index import (
    append_to_index,
    novel_against_index,
)
from dasladen_spark.streaming.matview import _last_applied


def run_streaming_dedup_intake(
    docs: DataFrame,
    index_table: str,
    accept_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    method: str = "exact",
    min_shared: int = 3,
):
    """Start the intake query. ``index_table`` must exist (built once
    from history via build_fingerprint_index; an empty history frame
    works for a cold start). Accepted novel docs appear under
    ``accept_path/batch=N`` as parquet.

    ``method="winnowing"`` switches to NEAR-dup intake: within-batch
    winnowed-fingerprint clusters collapse to their min-id survivor,
    then docs sharing ``min_shared``+ winnowed fingerprints with the
    index are dropped and the admitted docs' fingerprints appended —
    the streaming sibling of the `dedup` task's winnowing method
    (same index layout, same batch-id replay discipline; an index
    table holds either whole-doc or winnowed fps, never both)."""
    os.makedirs(accept_path, exist_ok=True)
    marker = os.path.join(accept_path, "_last_batch")
    # foreachBatch runs in a CLONED session whose writes don't refresh
    # the originating session's cached file listing for the table — a
    # reader that touched the index before the stream would otherwise
    # keep seeing the pre-append snapshot
    orig = docs.sparkSession

    def sink_exact(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        b = batch_df.withColumn("fp", fingerprint(F.col(text_col)))
        # a crawler batch can contain its own duplicates: keep the
        # lowest-id representative before consulting the index
        b = exact_dedup(b, ["fp"], id_col)
        novel = novel_against_index(
            spark, index_table, b, before_batch=batch_id
        ).persist()
        try:
            novel.drop("fp").write.mode("overwrite").parquet(
                f"{accept_path}/batch={batch_id}"
            )
            append_to_index(spark, index_table, novel, batch_id=batch_id)
        finally:
            novel.unpersist()

    def sink_winnowing(batch_df: DataFrame, batch_id: int) -> None:
        from dasladen_spark.operators.dedup import winnowing_pairs
        from dasladen_spark.operators.fingerprint_index import (
            winnowed_novel_against_index,
        )
        from dasladen_spark.operators.graph import dedup_clusters

        spark = batch_df.sparkSession
        scratch: list = []
        pairs = winnowing_pairs(
            batch_df, id_col=id_col, text_col=text_col,
            min_shared=min_shared, scratch=scratch,
        )
        drop = (
            dedup_clusters(pairs, "doc_a", "doc_b")
            .filter(F.col("member") != F.col("survivor"))
            .select(F.col("member").alias(id_col))
        )
        surv = batch_df.join(drop, id_col, "left_anti")
        novel, novel_fps = winnowed_novel_against_index(
            spark, index_table, surv,
            id_col=id_col, text_col=text_col,
            min_shared=min_shared, before_batch=batch_id,
        )
        novel = novel.persist()
        novel_fps = novel_fps.persist()
        try:
            novel.write.mode("overwrite").parquet(
                f"{accept_path}/batch={batch_id}"
            )
            append_to_index(
                spark, index_table, novel_fps, batch_id=batch_id
            )
        finally:
            novel.unpersist()
            novel_fps.unpersist()
            for c in scratch:
                c.unpersist()

    inner = sink_winnowing if method == "winnowing" else sink_exact

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(marker):
            return
        inner(batch_df, batch_id)
        orig.catalog.refreshTable(index_table)
        with open(marker, "w") as fh:
            fh.write(str(batch_id))

    writer = docs.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_ann_sync(
    vecs: DataFrame,
    index_table: str,
    checkpoint: str,
    marker_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Keep a materialized ANN index (operators/ann_index) current as
    new embeddings stream in: each micro-batch's vectors are hashed
    with the index's own family and appended into the bucket layout —
    searches in the same session see them immediately, and the
    100 TB corpus behind the index is never re-signed.

    Idempotency: an applied-batch marker skips re-delivered batches;
    a batch replayed across a crash may append duplicate posting rows,
    which search dedups by (query, neighbor) — read amplification,
    not wrong answers, and compaction reclaims it."""
    from dasladen_spark.operators.ann_index import append_to_ann_index

    os.makedirs(os.path.dirname(marker_path) or ".", exist_ok=True)
    # see run_streaming_dedup_intake: refresh the originating
    # session's table cache after each cloned-session append
    orig = vecs.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(marker_path):
            return
        append_to_ann_index(
            batch_df.sparkSession,
            index_table,
            batch_df,
            id_col=id_col,
            vec_col=vec_col,
        )
        orig.catalog.refreshTable(index_table)
        with open(marker_path, "w") as fh:
            fh.write(str(batch_id))

    writer = vecs.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
