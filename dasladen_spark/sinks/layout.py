"""Multi-dimensional data layout: Z-order clustered parquet writes.

Partition directories (sinks/partitioned) prune on ONE low-cardinality
key; sorting files by one column gives min/max row-group pruning on
THAT column only. Queries that filter on several high-cardinality
columns at once (user_id AND time, doc_id AND source hash, lat AND
lon) get nothing from either: every file spans the full range of the
second column.

Z-ordering fixes that with pure layout — no engine support needed at
read time. Each row's filter columns are rank-normalized to ``bits``-
bit integers and their bits INTERLEAVED into one z-value; range-
partitioning + sorting by that z-value places rows so every output
file covers a small hyper-rectangle of the filter space. Parquet's
ordinary column min/max statistics then prune files/row-groups for
predicates on ANY subset of the z-columns — the reader is an
unmodified `spark.read.parquet`.

Everything is JVM Column arithmetic (shift/mask/or, no UDF), and the
only driver-side data is one min/max row per column. The write costs
one range shuffle — the same price as any global sort.

Beyond-reference operator (the reference's only layout control is a
CSV file per task, /root/reference/dasladen/task.py:174-219).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric-ordered view of any sortable column: timestamps/dates
    (incl. NTZ, which cannot cast to double directly) go through
    epoch seconds; numerics cast straight."""
    dtype = dict(df.dtypes)[col]
    v = F.col(col)
    if "timestamp" in dtype or dtype == "date":
        v = v.cast("timestamp")
        return F.unix_micros(v).cast("double")
    return v.cast("double")


def _normalized(v: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) by min-max scaling.
    Nulls sort first (0). Constant columns collapse to 0 — they
    contribute no discrimination, matching their pruning value."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((v - F.lit(lo)) / F.lit(span)) * F.lit((1 << bits) - 1)
    return F.coalesce(F.round(scaled).cast("long"), F.lit(0))


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> Column:
    """The interleaved z-value Column for ``cols`` (little demo knob:
    ``bits`` per dimension, so the z-value uses len(cols)*bits bits —
    keep ≤ 62 total). Timestamps/dates are handled via cast-to-double
    epoch ordering."""
    if len(cols) * bits > 62:
        raise ValueError("len(cols)*bits must fit a signed 64-bit z-value")
    stats = df.select(
        *[
            f
            for c in cols
            for f in (
                F.min(_as_double(df, c)).alias(f"lo_{c}"),
                F.max(_as_double(df, c)).alias(f"hi_{c}"),
            )
        ]
    ).collect()[0]
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        n = _normalized(
            _as_double(df, c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits
        )
        for b in range(bits):
            # bit b of dimension ci lands at position b*ndims + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(n, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    z-order of ``cols``. Size ``n_files`` so each file is
    ~128 MB-1 GB at the target scale; the range partitioner balances
    rows per file regardless of z-value skew."""
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
