"""Parquet source helpers (the native lakehouse format)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: mergeSchema unions the schemas of all
    files, so rows written before a column existed surface it as
    NULL. This is an extra footer pass over every file — at 100 TB
    pin the merged schema in a catalog instead; this reader is for
    the transition window while old and new writers coexist."""
    return spark.read.option("mergeSchema", True).parquet(path)
