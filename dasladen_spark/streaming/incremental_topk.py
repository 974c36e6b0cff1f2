"""Incrementally-maintained top-k similarity — streaming ANN.

(Pattern per the incremental top-k similarity search literature:
maintain each query's k best neighbors as corpus vectors ARRIVE,
instead of rescanning the corpus per batch.)

Each micro-batch of new corpus vectors is scored against the (small,
broadcast) query set only; the per-query top-k snapshot is then the
top-k of (previous snapshot ∪ batch results) — a merge over ≤ 2k rows
per query, independent of corpus size. Total work per batch:
|batch| × |queries| scoring + a tiny merge, vs |corpus| × |queries|
for recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.operators.similarity import cosine_topk


def merge_topk(
    snapshot: DataFrame | None, batch_scores: DataFrame, k: int
) -> DataFrame:
    """Per-query top-k of snapshot ∪ new scores (dedup on neighbor,
    deterministic cosine/neighbor ordering)."""
    combined = (
        snapshot.select("query_id", "neighbor_id", "cosine").unionByName(
            batch_scores.select("query_id", "neighbor_id", "cosine")
        )
        if snapshot is not None
        else batch_scores.select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        combined.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def run_incremental_topk(
    stream: DataFrame,
    queries: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Maintain per-query top-k cosine neighbors over a stream of
    corpus vectors, parquet-snapshotted per batch (exactly-once via
    the same marker-file pattern as the incremental matview)."""
    spark = stream.sparkSession
    marker = snapshot_path + ".last_batch"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return
        scores = cosine_topk(
            queries,
            batch_df,
            k=k,
            query_id=id_col,
            query_vec=vec_col,
            corpus_id=id_col,
            corpus_vec=vec_col,
            exclude_self=True,
        )
        prev = (
            spark.read.parquet(snapshot_path)
            if os.path.exists(snapshot_path)
            else None
        )
        merged = merge_topk(prev, scores, k)
        merged.write.mode("overwrite").parquet(snapshot_path + ".tmp")
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
