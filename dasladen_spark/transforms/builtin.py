"""Bundled transforms, re-expressed as Column ops.

Parity with the reference's two bundled utility transforms:
- empty_as_null: '' → None on listed fields or all fields
  (/root/reference/dasladen/util/empty_as_null.py:4-17)
- sanitize_string: ASCII control chars (< 32) → space
  (/root/reference/dasladen/util/sanitize_string.py:4-17)

Both are pure JVM expressions (no UDF), so they vectorize inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _string_fields(df: DataFrame, fields: list[str] | None) -> list[str]:
    if fields:
        return fields
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def empty_as_null(df: DataFrame, *fields: str) -> DataFrame:
    """'' → NULL on the given fields (all string fields if none)."""
    for name in _string_fields(df, list(fields)):
        df = df.withColumn(
            name, F.when(F.col(name) == "", None).otherwise(F.col(name))
        )
    return df


def sanitize_string(df: DataFrame, *fields: str) -> DataFrame:
    """Replace ASCII control characters with spaces."""
    for name in _string_fields(df, list(fields)):
        df = df.withColumn(
            name, F.regexp_replace(F.col(name), r"[\x00-\x1F]", " ")
        )
    return df


#: names usable from JSON `transforms` blocks without a user module
BUILTIN_TRANSFORMS = {
    "empty_as_null": empty_as_null,
    "sanitize_string": sanitize_string,
}
