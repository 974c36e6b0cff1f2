"""Interval-set operators.

merge_intervals — union of overlapping [start, end) intervals per
key, the stack-free SQL formulation: an interval starts a new group
iff its start exceeds the running MAX(end) of every interval before
it (cumulative-max window); group ids are a running sum of those
flags. One key shuffle serves the ordering window, the flag window,
and the rollup — at 100 TB the only wide op is that single hash
exchange on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """(key, start, end)* → (key, merged_start, merged_end)* with all
    overlapping/touching intervals coalesced. Start/end must be
    orderable numerics; output column names are preserved."""
    wo = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = df.select(
        key_col,
        start_col,
        end_col,
        F.sum(
            F.when(
                prev_max.isNull() | (F.col(start_col) > prev_max), 1
            ).otherwise(0)
        )
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__g"),
    )
    return (
        grp.groupBy(key_col, "__g")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
        )
        .drop("__g")
    )
