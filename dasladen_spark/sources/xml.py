"""XML source — parity with petl.fromxml's three shapes
(/root/reference/dasladen/task.py:352-369):

- (row, value):        rows matched by `row` tag; each matched
                       `value` child's text becomes a column
- (row, value, attr):  the `attr` attribute of matched `value` nodes
- (row, mapping):      {field: path} projections

Spark 4's native XML reader parses `rowTag` elements into a struct
schema (attributes arrive prefixed with '_'); the shapes above are
column projections on that struct — pure Catalyst, distributed, and
splittable across files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _path_to_col(path: str) -> F.Column:
    """'a/b' → col a.b; 'a/@x' → attribute x of a (Spark: a._x);
    '@x' → row-level attribute (_x)."""
    parts = [p for p in path.split("/") if p]
    cols = []
    for p in parts:
        cols.append("_" + p[1:] if p.startswith("@") else p)
    return F.col(".".join(cols))


def read_xml(
    spark: SparkSession,
    path: str,
    row: str,
    value: str | None = None,
    attr: str | None = None,
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    df = spark.read.format("xml").option("rowTag", row).load(path)
    if mapping:
        return df.select(
            *[_path_to_col(p).alias(field) for field, p in mapping.items()]
        )
    if value is not None:
        col = _path_to_col(f"{value}/@{attr}" if attr else value)
        return df.select(col.alias(attr if attr else value))
    return df
