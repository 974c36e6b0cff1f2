"""Score normalization across groups — the make-scores-comparable
stage of a curation pipeline (CCNet-style: a 0.6 from source A and a
0.6 from source B rarely mean the same thing; mapping each to the
global score at the same within-group CDF position does).

Beyond-reference operator (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107). Shared by the
``quality_quantile_normalize`` registered query (per-source rollup
report), the ``score`` task kind (per-row normalized output), and the
streaming counts maintainer (``streaming/scoresync.py`` — the
(group, value) count table is ADDITIVE, so the mapping rebuilds
exactly from an incrementally-maintained snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: internal column names of the mapping plan — caller columns must not
#: shadow them (checked loudly)
_RESERVED = {"c", "f", "kind", "gq", "cum", "ns", "nq"}


def _check_names(group_col: str, value_col: str) -> None:
    if group_col in _RESERVED or value_col in _RESERVED:
        raise ValueError(
            f"quantile_normalize_map: column names {sorted(_RESERVED)} are"
            f" reserved internally — rename {group_col!r}/{value_col!r}"
            " before normalizing"
        )
    if group_col == value_col:
        raise ValueError(
            "quantile_normalize_map: group_col and value_col must differ"
        )


#: max rows the ``localize=True`` path will collect to the driver —
#: the enforcement of the "round value_col to bounded cardinality"
#: contract (≈ tens of MB of (group, value, count) rows).
LOCALIZE_ROLLUP_CAP = 2_000_000


def quantile_normalize_map_from_counts(
    s: DataFrame,
    group_col: str,
    value_col: str,
    localize: bool = True,
    max_rollup_rows: int | None = None,
) -> DataFrame:
    """The inverse-CDF mapping derived from a pre-aggregated count
    table ``s`` with columns (group_col, value_col, c) — the entry
    point for incrementally-maintained counts (streaming/scoresync):
    counts are additive, so a matview snapshot feeds this directly
    and the mapping equals a from-scratch build over all rows ever
    delivered. See :func:`quantile_normalize_map` for semantics and
    the scale argument.

    ``localize`` (default) fetches the counts rollup once and rebuilds
    it as a LocalRelation (pandas+Arrow — pure JVM downstream): the
    ECDF plan consumes the rollup THREE times (global distribution,
    corpus total, per-group distribution), and Spark re-executes a
    shared subtree per consumer, so leaving it distributed re-scans
    the corpus 3×. The rollup is bounded by this operator's contract
    (distinct (group, value) pairs — round scores to a fixed scale),
    so the fetch is the kmeans-centroid pattern, MBs at any corpus
    size. Pass ``localize=False`` to keep the lineage distributed
    (e.g. when the counts already come from a materialized table)."""
    from dasladen_spark.functions.vectors import bounded_window_key

    _check_names(group_col, value_col)
    # enforce the no-NULLs invariant here too, not only in the per-row
    # wrapper: a counts producer that forgot to pre-filter would
    # otherwise shift every quantile (NULL values sort nulls-first
    # into the cumulative windows; NULL groups inflate the global
    # ECDF). Cheap — the counts frame is the bounded rollup.
    s = s.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    if localize:
        spark = s.sparkSession
        # enforce the bounded-cardinality contract ON the collecting
        # fetch itself: the rollup must be distinct (group,
        # rounded-value) pairs; a caller that forgot to round a double
        # score column makes it corpus-sized and an unguarded
        # toPandas() would OOM the driver silently. limit(cap+1)
        # bounds what can ever reach the driver, and the SAME fetch
        # is reused as the LocalRelation rebuild — the rollup lineage
        # (a corpus aggregation) executes exactly once, not once for
        # a count probe and again for the collect.
        cap = LOCALIZE_ROLLUP_CAP if max_rollup_rows is None else max_rollup_rows
        pdf = s.limit(cap + 1).toPandas()
        if len(pdf) > cap:
            raise ValueError(
                "quantile_normalize_map_from_counts: counts rollup "
                f"exceeds {cap:,} rows — value_col must be rounded to "
                "bounded cardinality before normalizing (localize=True "
                "collects the rollup to the driver). Round the score "
                "column, or pass localize=False."
            )
        s = spark.createDataFrame(pdf, s.schema)
    g = s.groupBy(value_col).agg(F.sum("c").alias("c"))
    n_tot = s.agg(F.sum("c").alias("n"))
    wg = (
        Window.partitionBy(bounded_window_key(F.col("c")))
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gc = g.select(value_col, F.sum("c").over(wg).alias("cum")).crossJoin(
        F.broadcast(n_tot)
    )
    ws = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wst = Window.partitionBy(group_col)
    sc = s.select(
        group_col,
        value_col,
        "c",
        F.sum("c").over(ws).alias("cum"),
        F.sum("c").over(wst).alias("ns"),
    )
    vtype = dict(s.dtypes)[value_col]
    gtype = dict(s.dtypes)[group_col]
    u = gc.select(
        (F.col("cum").cast("double") / F.col("n").cast("double")).alias("f"),
        F.lit(1).alias("kind"),
        F.col(value_col).alias("gq"),
        F.lit(None).cast(gtype).alias(group_col),
        F.lit(None).cast(vtype).alias(value_col),
        F.lit(None).cast("bigint").alias("c"),
    ).unionAll(
        sc.select(
            (F.col("cum").cast("double") / F.col("ns").cast("double")).alias(
                "f"
            ),
            F.lit(0).alias("kind"),
            F.lit(None).cast(vtype).alias("gq"),
            group_col,
            value_col,
            F.col("c").cast("bigint").alias("c"),
        )
    )
    wm = (
        Window.partitionBy(bounded_window_key(F.col("kind")))
        .orderBy("f", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        u.select(
            group_col,
            value_col,
            "c",
            F.min(F.when(F.col("kind") == 1, F.col("gq"))).over(wm).alias(
                "nq"
            ),
        )
        .filter(F.col(group_col).isNotNull())
    )


def quantile_normalize_map(
    rows: DataFrame, group_col: str, value_col: str, localize: bool = True
) -> DataFrame:
    """Exact inverse-CDF mapping table: for every distinct
    (group, value) pair, the GLOBAL value at the same within-group
    CDF position (>= convention). Returns
    ``(group_col, value_col, c, nq)`` where ``c`` is the pair's row
    count and ``nq`` the normalized value — small enough to broadcast
    back onto any corpus whenever ``value_col`` has bounded
    cardinality (round scores to a fixed scale first).

    Scale shape: ONE pass over ``rows`` builds the distinct
    (group, value) rollup; both ECDFs and the inverse-CDF are windows
    over that bounded frame. The inverse-CDF is a single merge-sorted
    window — group points and global points interleaved by CDF
    fraction; because both axes are monotone, the first following
    global point IS the >=-quantile. Equal rationals divide to equal
    doubles (IEEE round-to-nearest of the true quotient), so the
    fraction ordering and the >= boundary are engine-exact.
    """
    _check_names(group_col, value_col)
    # NULL scores or NULL groups must not enter either ECDF: Spark's
    # nulls-first window ordering would count them as the lowest-score
    # mass and shift every real row's quantile image. Callers see such
    # rows as unmapped (no mapping row exists for them).
    rows = rows.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    s = rows.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    return quantile_normalize_map_from_counts(
        s, group_col, value_col, localize=localize
    )
