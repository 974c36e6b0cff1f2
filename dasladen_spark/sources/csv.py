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
