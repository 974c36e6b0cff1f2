"""Relational query library, part 2: more TPC-H shapes, pivots,
sessionization, ordered aggregation, exact distributed statistics,
pagination.

Same exact-hash discipline as relational.py (decimal accumulation,
unique-key tiebreaks); same Spark-first plan-shape rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.plans.relational import _SQL_DISC_PRICE, _dec, _disc_price, _ts
from dasladen_spark.session import load_table as _t


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DECIMAL(38,6)) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-down filter + global aggregate —
    zero shuffles beyond the single-row partial-agg exchange."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated range condition →
    left-semi join with a residual predicate."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    slow = o.join(
        l,
        on=[
            o.o_orderkey == l.l_orderkey,
            l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
        ],
        how="left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                              AS DECIMAL(38,4)) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING aggregate feeding a join, then top-k.
    The aggregate runs FIRST (shrinks lineitem to qualifying orders)
    so the join inputs are minimal — the at-scale ordering."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(38,4)").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "q_pivot_segments",
    oracle="""
    SELECT c_nationkey,
           COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS AUTOMOBILE,
           COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS BUILDING,
           COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS FURNITURE,
           COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS HOUSEHOLD,
           COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS MACHINERY
    FROM customer GROUP BY c_nationkey
    """,
)
def q_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: customer counts per nation × market segment. The value
    list is explicit, so Spark skips the extra distinct-values job —
    the only way pivot is usable on a 100 TB input."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    out = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", segs)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; COUNT(CASE) yields 0
    return out.select(
        "c_nationkey", *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in segs]
    )


@query(
    "q_sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_idx
    FROM flagged
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the classic
    lag → flag → running-sum pattern; one shuffle on user_id serves
    both windows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = _t(spark, sf_dir, "events")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.select(
        "user_id", "event_id", F.sum("is_new").over(run).alias("session_idx")
    )


@query(
    "q_minby_maxby",
    oracle="""
    SELECT o_custkey,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def q_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by on a UNIQUE ordering key (o_orderkey) — the only
    way arg-extremes are deterministic under parallel aggregation."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
            F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_ordered_string_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: collect_list is unordered under parallelism,
    so sort INSIDE the aggregate (array_sort) before joining —
    deterministic at any partitioning."""
    n = _t(spark, sf_dir, "nation")
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@query(
    "q_exact_stddev",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n,
           CASE WHEN COUNT(*) > 1 THEN
             sqrt((COUNT(*) * CAST(SUM(CAST(p_retailprice * p_retailprice
                                            AS DECIMAL(18,6))) AS DOUBLE)
                   - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
                     * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE))
                  / (COUNT(*) * (COUNT(*) - 1)))
           END AS price_stddev
    FROM part GROUP BY p_brand
    """,
)
def q_exact_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev via exact decimal moments: the built-in stddev
    accumulates doubles in partition order (non-reproducible at
    scale); Σx and Σx² as decimals make the statistic bit-stable."""
    p = _t(spark, sf_dir, "part")
    n = F.count(F.lit(1))
    sx = F.sum(_dec("p_retailprice")).cast("double")
    sxx = F.sum(
        (F.col("p_retailprice") * F.col("p_retailprice")).cast("decimal(18,6)")
    ).cast("double")
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1)))
    return (
        p.groupBy("p_brand")
        .agg(
            n.alias("n"),
            F.when(n > 1, F.sqrt(var)).alias("price_stddev"),
        )
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination (ORDER BY unique key + LIMIT/OFFSET)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
    )


@query(
    "q_ntile_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS DECIMAL(38,4)) AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, total_spend,
           NTILE(4) OVER (ORDER BY total_spend DESC, o_custkey) AS quartile
    FROM spend
    """,
)
def q_ntile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles over exact-decimal spend, computed by the
    DISTRIBUTED global-ranking operator (operators/ranking.py:
    range-repartition + partition offsets) instead of the
    single-partition `Window.orderBy` Spark would otherwise plan —
    same bit-exact result (this oracle proves it), no 100 TB funnel."""
    from dasladen_spark.operators.ranking import global_ntile

    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("decimal(38,4)").alias("total_spend"))
    )
    return global_ntile(
        spend,
        [F.col("total_spend").desc(), F.col("o_custkey")],
        k=4,
        out_col="quartile",
    ).select("o_custkey", "total_spend", "quartile")


@query(
    "q_cross_join",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian of two tiny inputs (the only sane cross
    join); both sides bounded."""
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@query(
    "q_union_all_counts",
    oracle="""
    SELECT 'orders' AS src, COUNT(*) AS n FROM orders
    UNION ALL
    SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL
    SELECT 'customer', COUNT(*) FROM customer
    """,
)
def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) over per-table counts."""
    def cnt(t):
        return (
            _t(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("src"), "n")
        )

    return cnt("orders").unionAll(cnt("lineitem")).unionAll(cnt("customer"))


@query(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, metric, val
    FROM (SELECT o_orderkey, o_totalprice, o_custkey FROM orders)
    UNPIVOT (val FOR metric IN (o_totalprice, o_custkey))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide metrics → (key, metric, value) long form —
    the inverse of q_pivot_segments. Generate-based (no shuffle);
    both engines cast the value set to a common type (double here)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    )
    return o.unpivot(
        "o_orderkey", ["o_totalprice", "o_custkey"], "metric", "val"
    )


@query(
    "q_window_time_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,4)) AS spend_30d
    FROM orders
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-customer trailing-30-day spend.
    Unlike a ROWS frame, the frame is defined by timestamp distance —
    the rolling-metric shape for irregular event spacing. One shuffle
    on the partition key; rangeBetween over unix seconds replicates
    the INTERVAL semantics exactly."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("decimal(38,4)").alias("spend_30d"),
    )


@query(
    "q_null_semantics",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_rows,
           COUNT(v) AS n_nonnull,
           COUNT(*) - COUNT(v) AS n_null,
           CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe,
           COALESCE(CAST(MAX(v) AS DOUBLE), -1.0) AS max_or_default
    FROM t GROUP BY user_id
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling corners under aggregation: COUNT(*) vs COUNT(col),
    null-safe equality (<=> / IS NOT DISTINCT FROM), COALESCE
    defaults — semantics that silently diverge between engines if
    unspecified, pinned here bit-for-bit."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
        F.sum(F.when(F.col("v").eqNullSafe(F.lit(None)), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nullsafe"),
        F.coalesce(F.max("v").cast("double"), F.lit(-1.0)).alias("max_or_default"),
    )


@query(
    "q_full_outer",
    oracle="""
    WITH cust_orders AS (
      SELECT o_custkey, COUNT(*) AS n_orders
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), cust_urgent AS (
      SELECT o_custkey, COUNT(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    )
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_urgent, 0) AS n_urgent
    FROM cust_orders a FULL OUTER JOIN cust_urgent b
      ON a.o_custkey = b.o_custkey
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two partial aggregates (customers with
    finished orders vs customers with urgent orders — each side has
    keys the other lacks). COALESCE reconciles the key and fills
    absent counts with 0."""
    o = _t(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("b_custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    return a.join(b, a.o_custkey == b.b_custkey, "full_outer").select(
        F.coalesce("o_custkey", "b_custkey").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT ts, event_type, time_bucket(INTERVAL 5 MINUTE, ts) AS b
      FROM events
    ), assigned AS (
      SELECT ts, event_type, b AS win_start FROM starts
      UNION ALL
      SELECT ts, event_type, b - INTERVAL 5 MINUTE FROM starts
    )
    SELECT win_start, event_type, COUNT(*) AS n
    FROM assigned
    WHERE ts >= win_start AND ts < win_start + INTERVAL 10 MINUTE
    GROUP BY win_start, event_type
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute width, 5-minute slide): each event
    lands in 2 overlapping windows. Spark's window() generates the
    copies; the oracle derives the same membership from shifted
    tumbling buckets. The fan-out factor is width/slide — bounded and
    known at plan time."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
