"""Bucketed-table sink — the co-located-join storage layout.

At 100 TB the single biggest recurring cost is re-shuffling the same
fact table on the same key for every join/aggregate. Bucketing pays
that shuffle once at write time: both sides stored bucketed by the
join key ⇒ SortMergeJoin with NO Exchange on either side (asserted in
tests/test_plan_shapes.py::test_bucketed_join_has_no_exchange).

Spark's bucketing requires the session catalog (`saveAsTable`); the
in-memory/derby catalog works locally, Hive/Glue/Unity in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join
    key. ``n_buckets`` should be sized so one bucket of the *final*
    table fits an executor core's working memory (rows / n_buckets ×
    row width ≲ a few hundred MB)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*s)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
