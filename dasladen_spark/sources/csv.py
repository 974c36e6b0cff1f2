"""CSV source — parity with the reference's lazy petl read
(/root/reference/dasladen/task.py:209-221): first row is the header,
every value is a STRING (typing is the `convert` transform's job),
delimiter defaults to ';', encoding to utf-8.

Spark-side: a distributed CSV scan (splittable, predicate-pushdown
capable); `inferSchema` stays off both for parity and because schema
inference is an extra full pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ";",
    encoding: str = "utf-8",
    header: bool = True,
) -> DataFrame:
    return (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("encoding", encoding)
        .option("inferSchema", False)
        .csv(path)
    )


def read_csv_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    delimiter: str = ";",
    encoding: str = "utf-8",
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Typed CSV read with an explicit malformed-row policy — what a
    100 TB ingest actually needs (one bad row must not kill a
    12-hour job, and silently dropping it is worse):

    - PERMISSIVE (default): bad rows land with nulls + the raw line
      in ``corrupt_col`` so they can be quarantined downstream
      (see quarantine_corrupt).
    - DROPMALFORMED: bad rows vanish (count them before trusting).
    - FAILFAST: any bad row fails the job — for data contracts.

    Requires an explicit schema (PERMISSIVE needs it to know what a
    'good' row is; inference is an extra full pass at scale anyway).
    """
    full_schema = f"{schema}, {corrupt_col} STRING"
    return (
        spark.read.schema(full_schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("encoding", encoding)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def quarantine_corrupt(
    df: DataFrame,
    quarantine_path: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Split a PERMISSIVE read: corrupt raw lines are optionally
    written to ``quarantine_path`` (text, one bad line per row, for
    replay after a parser fix) and clean rows are returned without
    the corrupt column. Spark requires caching a PERMISSIVE frame
    before filtering on the corrupt column (SPARK-21610)."""
    from pyspark.sql import functions as F

    df = df.cache()
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    if quarantine_path is not None:
        bad.write.mode("overwrite").text(quarantine_path)
    return df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)

