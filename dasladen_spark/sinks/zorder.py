"""Z-order (Morton curve) clustered parquet layout for two-column
data skipping.

A parquet scan prunes a file when the predicate falls outside the
file's column min/max footer stats. Sorting by ONE column makes that
column's per-file ranges tight and leaves every other column spanning
the full domain; interleaving the bits of TWO columns' rank buckets
(the Morton / z-order curve, the layout behind Delta's OPTIMIZE
ZORDER) keeps BOTH per-file ranges small, so selective predicates on
either column — or both — skip most files. ``write_zordered`` is the
writer; ``plans.relational8.q_zorder_locality`` is the oracle-checked
audit of the same interleave arithmetic; the pyarrow-footer test in
``tests/test_zorder.py`` proves the bbox shrink against a
single-column sort.

Beyond-reference operator (the reference hands storage layout to an
RDBMS, /root/reference/dasladen/task.py:94-107; no layout control
exists there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dasladen_spark.plans.relational8 import _Z_BITS, zvalue


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-order curve over two numeric/date columns.

    Scale shape: one tiny min/max aggregate broadcasts the global
    bounds; bucketing and the Morton interleave are pure JVM integer
    expressions; ``repartitionByRange`` on the z value does ONE
    range-exchange (AQE-compatible, sampled bounds) and
    ``sortWithinPartitions`` lines each file up in curve order so
    every file covers a contiguous z range — a compact (x, y) bbox
    in the footer stats. The helper columns are dropped before the
    write; the layout is invisible to readers except through the
    stats. Date/timestamp columns are bucketed via their epoch-day
    rank; numeric columns via integer rank — both exact.
    """
    a, b = cols

    def as_long(c: str) -> F.Column:
        dt = dict(df.dtypes)[c]
        if dt in ("date", "timestamp", "timestamp_ntz"):
            return F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
        return F.col(c).cast("long")

    tagged = df.withColumn("__zx", as_long(a)).withColumn("__zy", as_long(b))
    bounds = tagged.agg(
        F.min("__zx").alias("__minx"),
        F.max("__zx").alias("__maxx"),
        F.min("__zy").alias("__miny"),
        F.max("__zy").alias("__maxy"),
    )
    # bucket = (v - min) DIV width with width = span DIV 2^bits + 1:
    # divide-first, so a full-width 64-bit domain (hash / snowflake
    # ids, span ~2^63) can never overflow the way the query-side
    # multiply-then-divide form would — (v - min) * 255 wraps bigint
    # silently past 2^55 and would z-order garbage with no error.
    # LEAST caps the last (ragged) bucket at 2^bits - 1.
    mask = (1 << _Z_BITS) - 1
    bucketed = (
        tagged.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__zxb",
            F.expr(
                f"CAST(CASE WHEN __maxx <= __minx THEN 0 ELSE LEAST("
                f" (__zx - __minx) DIV ((__maxx - __minx) DIV {mask + 1} + 1),"
                f" {mask}) END AS INT)"
            ),
        )
        .withColumn(
            "__zyb",
            F.expr(
                f"CAST(CASE WHEN __maxy <= __miny THEN 0 ELSE LEAST("
                f" (__zy - __miny) DIV ((__maxy - __miny) DIV {mask + 1} + 1),"
                f" {mask}) END AS INT)"
            ),
        )
        .withColumn("__z", zvalue(F.col("__zxb"), F.col("__zyb")))
    )
    out_cols = df.columns
    (
        bucketed.repartitionByRange(max(1, n_files), "__z")
        .sortWithinPartitions("__z")
        .select(*out_cols)
        .write.mode(mode)
        .parquet(path)
    )
