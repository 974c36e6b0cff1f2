"""Relational/analytics queries, part 6: association rules, CUSUM
change-point detection, weekday seasonality, and position-based
multi-touch attribution — the second-order event/basket analytics a
warehouse team reaches for after the part-5 suite.

Beyond-reference operators (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107). Determinism
discipline as in llm3+: one rounded double expression per row, DECIMAL
accumulation for order-sensitive sums, one final ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.functions.vectors import bounded_window_key
from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# --------------------------------------------- association rule mining


@query(
    "q_association_rules",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT ok) AS n_baskets FROM b
    ), itm AS (
      SELECT item, COUNT(*) AS n_item FROM b GROUP BY item
    ), pair AS (
      SELECT a.item AS antecedent, c.item AS consequent,
             COUNT(*) AS n_both
      FROM b a JOIN b c ON a.ok = c.ok AND a.item <> c.item
      GROUP BY 1, 2
    )
    SELECT p.antecedent, p.consequent, p.n_both,
           ROUND(p.n_both / CAST(ia.n_item AS DOUBLE), 6) AS confidence,
           ROUND((p.n_both * (SELECT n_baskets FROM n))
                 / CAST(ia.n_item * ic.n_item AS DOUBLE), 6) AS lift
    FROM pair p
    JOIN itm ia ON ia.item = p.antecedent
    JOIN itm ic ON ic.item = p.consequent
    WHERE p.n_both >= 3
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 20
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over order baskets — support,
    confidence, lift for every part pair co-occurring in ≥3 orders
    (the A-priori 2-itemset pass; q_copurchase_pairs counts the
    co-occurrences, this turns them into ranked rules).

    Scale shape: the pair expansion self-joins on the ORDER key
    (fan-out bounded by basket size, linear in orders — never a
    part-keyed hub join); item supports are one map-side-combined
    count; the basket total is a 1-row broadcast. The distinct
    basket table feeds FOUR plan branches (total, supports, both
    pair sides), so it persists for the one action — without the
    cache the fact table is scanned and re-deduped four times (plan
    probe: 5 scans / 0 reuse); the 20-row result materializes before
    the cache is released. All ratios are exact-integer divisions
    evaluated once in IEEE double and rounded — identical in any
    engine."""
    b = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item"))
        .distinct()
        .persist()
    )
    n = b.agg(F.count_distinct("ok").alias("n_baskets"))
    # itm feeds BOTH rule sides (ia, ic) — without its own persist the
    # item-support aggregate (a full pass over b plus an item-keyed
    # exchange) runs once per side: the r12 plan audit showed the
    # HashAggregate+Exchange subtree duplicated verbatim (operators
    # 30-32 and 39-41), exchange reuse defeated by the per-side
    # aliases. |items|-sized cache, corpus-pass saved.
    itm = (
        b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item")).persist()
    )
    a = b.select(F.col("ok"), F.col("item").alias("antecedent"))
    c = b.select(F.col("ok").alias("ok2"), F.col("item").alias("consequent"))
    pair = (
        a.join(
            c,
            (F.col("ok") == F.col("ok2"))
            & (F.col("antecedent") != F.col("consequent")),
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ia = itm.select(F.col("item").alias("antecedent"), F.col("n_item").alias("n_a"))
    ic = itm.select(F.col("item").alias("consequent"), F.col("n_item").alias("n_c"))
    b.count()  # materialize the cache once; the action below reads it
    return (
        pair.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n))  # one row — the basket total
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.round(F.col("n_both") / F.col("n_a").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_both") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_c")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(20)
    )


# ------------------------------------------ CUSUM change-point audit


@query(
    "q_cusum_drift",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY 1
    ), s AS (
      SELECT SUM(x) AS sx, SUM(x * x) AS sxx, COUNT(*) AS n FROM d
    ), k AS (
      -- greatest(var, 0): the moment form can dip below zero by an
      -- ulp when all days are (nearly) equal; sqrt(NaN) must not leak
      SELECT ROUND(sx / CAST(n AS DOUBLE)
                   + 0.5 * sqrt(greatest(sxx / CAST(n AS DOUBLE)
                                - (sx / CAST(n AS DOUBLE))
                                  * (sx / CAST(n AS DOUBLE)), 0)), 6) AS slack,
             ROUND(4.0 * sqrt(greatest(sxx / CAST(n AS DOUBLE)
                              - (sx / CAST(n AS DOUBLE))
                                * (sx / CAST(n AS DOUBLE)), 0)), 6) AS h
      FROM s
    ), y AS (
      SELECT day, x,
             SUM(CAST(ROUND(x - (SELECT slack FROM k), 6)
                      AS DECIMAL(38,6)))
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    ), m AS (
      SELECT day, x, cum,
             MIN(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS run_min
      FROM y
    )
    SELECT CAST(day AS TIMESTAMP) AS day, x,
           ROUND(CAST(CAST(
             cum - LEAST(run_min, CAST(0 AS DECIMAL(38,6)))
           AS VARCHAR) AS DOUBLE), 6) AS cusum,
           CAST(cum - LEAST(run_min, CAST(0 AS DECIMAL(38,6)))
                AS DOUBLE) > (SELECT h FROM k) AS drift
    FROM m ORDER BY day
    """,
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection on daily event volume —
    the drift monitor a data-quality pipeline runs over intake
    counts. Uses the prefix-minimum closed form
    S_t = y_t − min(0, min_{j≤t} y_j) with y = Σ(x − k), so the
    "recursive" statistic is two bounded windows instead of an
    unexpressible recursion; slack k = μ + σ/2, alarm at 4σ.

    Scale shape: one map-side-combined daily count, a 1-row moments
    broadcast (μ, σ from exact integer Σx/Σx²), and two windows over
    one-row-per-day — bounded by the calendar, partitioned
    explicitly (bounded_window_key)."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .persist()  # days-sized; feeds the moments AND the windows —
    )                # one corpus scan, not two
    d.count()
    s = d.agg(
        F.sum("x").alias("sx"),
        # square in DECIMAL: long*long silently wraps at ~3e9-count
        # days (the oracle's HUGEINT doesn't) — exact either way now
        F.sum(
            (
                F.col("x").cast("decimal(19,0)")
                * F.col("x").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("sx") / F.col("n").cast("double")
    # greatest(var, 0): see the oracle comment — identical guard
    sig = F.sqrt(
        F.greatest(
            F.col("sxx").cast("double") / F.col("n").cast("double")
            - mean * mean,
            F.lit(0.0),
        )
    )
    k = s.select(
        F.round(mean + 0.5 * sig, 6).alias("slack"),
        F.round(4.0 * sig, 6).alias("h"),
    )
    wy = (
        Window.partitionBy(bounded_window_key(F.col("x")))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    y = (
        d.crossJoin(F.broadcast(k))  # one row — the (slack, h) scalars
        .withColumn(
            "cum",
            F.sum(
                F.round(F.col("x") - F.col("slack"), 6).cast("decimal(38,6)")
            ).over(wy),
        )
        .withColumn("run_min", F.min("cum").over(wy))
    )
    cusum = F.col("cum") - F.least(
        F.col("run_min"), F.lit(0).cast("decimal(38,6)")
    )
    return y.select(
        F.col("day").cast("timestamp").alias("day"),
        "x",
        F.round(cusum.cast("double"), 6).alias("cusum"),
        (cusum.cast("double") > F.col("h")).alias("drift"),
    ).orderBy("day")


# ------------------------------------------------ weekday seasonality


@query(
    "q_weekday_seasonality",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             dayname(CAST(date_trunc('day', ts) AS DATE)) AS weekday,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ), o AS (
      SELECT SUM(x) AS tot, COUNT(*) AS n_days FROM d
    )
    SELECT weekday,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(x) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_events,
           ROUND((SUM(x) / CAST(COUNT(*) AS DOUBLE))
                 / ((SELECT tot FROM o)
                    / CAST((SELECT n_days FROM o) AS DOUBLE)), 6)
             AS seasonal_index
    FROM d GROUP BY weekday ORDER BY weekday
    """,
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of event volume: average events per
    observed weekday divided by the overall daily average — >1 means
    the weekday runs hot. The load-shaping profile behind capacity
    planning and the denominator for "is today anomalous given it's
    a Saturday" checks (pairs with q_cusum_drift).

    Scale shape: one daily count, one 7-row weekday rollup, a 1-row
    grand-total broadcast; all sums exact integers, each ratio one
    IEEE-double expression rounded once."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.date_format(
                F.date_trunc("day", F.col("ts")).cast("date"), "EEEE"
            ).alias("weekday"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .persist()  # one-row-per-day; feeds totals AND the weekday
    )                # rollup — one corpus scan
    d.count()
    o = d.agg(F.sum("x").alias("tot"), F.count(F.lit(1)).alias("n_days_all"))
    avg_day = F.col("sum_x") / F.col("n_days").cast("double")
    return (
        d.groupBy("weekday")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("x").alias("sum_x"),
        )
        .crossJoin(F.broadcast(o))  # one row — the grand totals
        .select(
            "weekday",
            "n_days",
            F.round(avg_day, 6).alias("avg_events"),
            F.round(
                avg_day
                / (F.col("tot") / F.col("n_days_all").cast("double")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("weekday")
    )


# ------------------------------- position-based (U-shaped) attribution


@query(
    "q_attribution_position",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.purchase_id, p.value, c.click_id,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.click_ts, c.click_id) AS pos,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touch
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.click_ts < p.ts
       AND c.click_ts >= p.ts - INTERVAL 7 DAY
    ), credit AS (
      SELECT click_id,
             CAST(ROUND(value * CASE
               WHEN n_touch = 1 THEN 1.0
               WHEN n_touch = 2 THEN 0.5
               WHEN pos = 1 OR pos = n_touch THEN 0.4
               ELSE 0.2 / (n_touch - 2) END, 6) AS DECIMAL(38,6)) AS cr
      FROM pairs
    )
    SELECT click_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(CAST(CAST(SUM(cr) AS VARCHAR) AS DOUBLE), 6)
             AS credited_value
    FROM credit GROUP BY click_id
    ORDER BY credited_value DESC, click_id LIMIT 25
    """,
)
def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution:
    the first and last click before a purchase each earn 40% of its
    value, the middle clicks split the remaining 20% — completing the
    attribution family next to last-touch and linear. Top-25 clicks
    by credited value.

    Scale shape: identical join geometry to q_attribution_linear
    (user-keyed 7-day range join, per-purchase windows over the
    bounded touch set, map-side credit aggregation); the position
    weights add one CASE to the credit expression. Per-credit
    rounding + DECIMAL accumulation keeps totals bit-stable."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts"),
        F.col("value"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    pairs = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") < F.col("ts"))
        & (F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
    )
    wp = Window.partitionBy("purchase_id")
    pos = F.row_number().over(wp.orderBy("click_ts", "click_id"))
    n_touch = F.count(F.lit(1)).over(wp)
    share = (
        F.when(n_touch == 1, F.lit(1.0))
        .when(n_touch == 2, F.lit(0.5))
        .when((pos == 1) | (pos == n_touch), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n_touch - 2))
    )
    credit = pairs.select(
        "click_id",
        F.round(F.col("value") * share, 6).cast("decimal(38,6)").alias("cr"),
    )
    return (
        credit.groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(F.sum("cr").cast("double"), 6).alias("credited_value"),
        )
        .orderBy(F.col("credited_value").desc(), "click_id")
        .limit(25)
    )


# --------------------------------------------------- k-core backbone


# k-core oracle: the peel is an INTEGER fixpoint (degree counts +
# semi-joins), so it replays exactly in SQL by unrolling the rounds —
# _KCORE_ROUNDS is a safety margin far above the observed peel depth
# (the sf0.01 co-purchase graph stabilizes after 1 round); extra
# rounds are no-ops on the fixpoint. MATERIALIZED stops DuckDB from
# inlining each round into the next (exponential re-execution).
_KCORE_K = 4
_KCORE_ROUNDS = 12


def _kcore_oracle() -> str:
    parts = [
        """
    WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p
    ),
    e0 AS MATERIALIZED (
      SELECT u, v FROM pairs WHERE u <> v
      UNION SELECT v, u FROM pairs WHERE u <> v
    )"""
    ]
    # one EXTRA round beyond the answer round: the guard below must
    # verify that e{N} is the fixpoint by peeling it once more, not
    # by comparing e{N-1} vs e{N} (which would false-fail when the
    # peel stabilizes exactly at round N)
    for r in range(1, _KCORE_ROUNDS + 2):
        parts.append(f""", k{r} AS MATERIALIZED (
      SELECT u FROM e{r - 1} GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
    ), e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{r - 1} e
      WHERE e.u IN (SELECT u FROM k{r}) AND e.v IN (SELECT u FROM k{r})
    )""")
    # convergence guard: the Spark operator peels to FIXPOINT while
    # this unroll runs a fixed _KCORE_ROUNDS — if a larger sf ever
    # needed more rounds, peeling e{N} once more would shrink it
    # (e{N+1} ⊂ e{N}, counts differ: the peel only removes) and the
    # WHERE below returns 0 rows, failing the gate loudly (row-count
    # mismatch) instead of silently hash-mismatching on a
    # non-converged peel
    n, g = _KCORE_ROUNDS, _KCORE_ROUNDS + 1
    parts.append(f"""
    SELECT u AS id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e{n}
    WHERE (SELECT COUNT(*) FROM e{n}) = (SELECT COUNT(*) FROM e{g})
    GROUP BY u
    ORDER BY degree DESC, id LIMIT 20
    """)
    return "".join(parts)


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense backbone of the co-purchase graph: the 4-core (every
    surviving part co-ordered with ≥4 other surviving parts) — the
    subgraph community/triangle analytics should run on after the
    long tail is peeled away. Top-20 survivors by in-core degree.

    Scale shape (operators/graph.kcore): each peel round is one
    degree count + two semi-joins on the node key, lineage
    localCheckpointed per round; rounds = peel depth, not node
    count. The pair expansion is order-keyed (bounded by basket
    size) like q_copurchase_pairs."""
    from dasladen_spark.operators.graph import kcore

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    edges = (
        a.join(b, on=[a.ok == b.ok, F.col("u") < F.col("v")])
        .select("u", "v")
        .distinct()
    )
    return (
        kcore(edges, k=4)
        .orderBy(F.col("degree").desc(), "id")
        .limit(20)
    )


# --------------------------------------- duplicate-transaction audit


@query(
    "q_duplicate_events_audit",
    oracle="""
    SELECT a.event_id AS first_id, b.event_id AS second_id,
           a.user_id, a.value AS value_a, b.value AS value_b,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
     AND b.event_type = 'purchase' AND a.event_type = 'purchase'
     AND b.event_id > a.event_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    ORDER BY a.user_id, first_id, second_id
    """,
)
def q_duplicate_events_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-fire audit: pairs of purchases by the same user within
    10 minutes — the retry-bug / double-charge candidate list every
    event pipeline reviews before revenue numbers ship (both values
    reported so an exact-amount repeat stands out). Pairs orient by
    event_id so each duplicate reports once.

    Scale shape: a user-keyed self-join — the equality key does the
    heavy pruning, the 10-minute band bounds what's left; one
    shuffle per side, fan-out limited to per-user purchase bursts.
    The oracle's band predicate is the semantic spec; Spark plans
    the same equi-join + range filter."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    a = e.select(
        F.col("event_id").alias("first_id"),
        "user_id",
        F.col("value").alias("value_a"),
        F.col("ts").alias("ts_a"),
    )
    b = e.select(
        F.col("event_id").alias("second_id"),
        F.col("user_id").alias("u2"),
        F.col("value").alias("value_b"),
        F.col("ts").alias("ts_b"),
    )
    return (
        a.join(
            b,
            (F.col("u2") == F.col("user_id"))
            & (F.col("second_id") > F.col("first_id"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "first_id",
            "second_id",
            "user_id",
            "value_a",
            "value_b",
            (F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a"))
            .cast("bigint")
            .alias("gap_s"),
        )
        .orderBy("user_id", "first_id", "second_id")
    )


def _sessionized(e: DataFrame) -> DataFrame:
    """30-minute-gap sessionizer shared by the session queries in
    this module (same rule as relational2.q_sessionize_events):
    lag → break flag → running sum, ONE user-keyed shuffle. Returns
    the events frame plus a ``session_idx`` column."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts") - F.lag("ts").over(w)
                > F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    return flagged.withColumn(
        "session_idx",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("brk")


# ------------------------------------------------- top session paths


@query(
    "q_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ), paths AS (
      SELECT user_id, session_idx,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
                                     ORDER BY ts, event_id) AS pos
        FROM sess
      ) WHERE pos <= 5
      GROUP BY user_id, session_idx
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 15
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top clickstream paths: sessionize (30-minute gap rule, same as
    q_sessionize_events), take each session's first 5 event types in
    order, and rank the most common paths — the "how do users
    actually move" summary behind funnel design.

    Scale shape: the lag→flag→running-sum sessionizer is one
    user-keyed shuffle; the path string builds from an in-group
    sorted array (JVM array_join over a bounded 5-slot prefix — no
    per-row UDF); path counting is map-side combinable."""
    sess = _sessionized(_t(spark, sf_dir, "events"))
    ws = Window.partitionBy("user_id", "session_idx").orderBy(
        "ts", "event_id"
    )
    paths = (
        sess.withColumn("pos", F.row_number().over(ws))
        .filter(F.col("pos") <= 5)
        .groupBy("user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("pos", F.col("event_type").alias("et"))
                        )
                    ),
                    lambda x: x["et"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


# --------------------------------------- categorical mutual information


@query(
    "q_weekday_type_mutual_info",
    oracle="""
    WITH j AS (
      SELECT dayname(CAST(date_trunc('day', ts) AS DATE)) AS wd,
             event_type AS et, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(n) AS t FROM j
    ), mx AS (
      SELECT wd, SUM(n) AS nx FROM j GROUP BY wd
    ), my AS (
      SELECT et, SUM(n) AS ny FROM j GROUP BY et
    ), terms AS (
      SELECT j.wd, j.et,
             CAST(ROUND((j.n / CAST(t.t AS DOUBLE))
               * log2((j.n * CAST(t.t AS DOUBLE))
                      / (CAST(mx.nx AS DOUBLE) * my.ny)), 12)
               AS DECIMAL(38,18)) AS term
      FROM j JOIN mx USING (wd) JOIN my USING (et) CROSS JOIN tot t
    )
    SELECT CAST((SELECT COUNT(*) FROM mx) AS BIGINT) AS n_weekdays,
           CAST((SELECT COUNT(*) FROM my) AS BIGINT) AS n_types,
           ROUND(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE), 6)
             AS mutual_info_bits
    FROM terms
    """,
)
def q_weekday_type_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) between day-of-week and event type —
    the dependence test behind "does behaviour differ by weekday":
    I(X;Y) = Σ p(x,y)·log₂(p(x,y)/(p(x)p(y))), near 0 when the event
    mix is calendar-independent (pairs with q_weekday_seasonality's
    volume lens and q_user_activity_entropy's per-user lens).

    Scale shape: one (weekday, type) contingency count — at most
    7×|types| cells regardless of corpus size — two marginal re-aggs
    of that tiny table, DECIMAL-summed rounded terms."""
    j = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(
                F.date_trunc("day", F.col("ts")).cast("date"), "EEEE"
            ).alias("wd"),
            F.col("event_type").alias("et"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()  # ≤ 7×|types| cells; feeds the total, both
    )                # marginals, and the terms — one corpus scan
    j.count()
    tot = j.agg(F.sum("n").alias("t"))
    mx = j.groupBy("wd").agg(F.sum("n").alias("nx"))
    my = j.groupBy("et").agg(F.sum("n").alias("ny"))
    term = F.round(
        (F.col("n") / F.col("t").cast("double"))
        * F.log2(
            (F.col("n") * F.col("t").cast("double"))
            / (F.col("nx").cast("double") * F.col("ny"))
        ),
        12,
    ).cast("decimal(38,18)")
    terms = (
        j.join(mx, "wd")
        .join(my, "et")
        .crossJoin(F.broadcast(tot))  # one row — the grand total
        .select(term.alias("term"))
    )
    nx_cnt = mx.agg(F.count(F.lit(1)).alias("n_weekdays"))
    ny_cnt = my.agg(F.count(F.lit(1)).alias("n_types"))
    return (
        terms.agg(
            F.round(F.sum("term").cast("double"), 6).alias(
                "mutual_info_bits"
            )
        )
        .crossJoin(F.broadcast(nx_cnt))
        .crossJoin(F.broadcast(ny_cnt))
        .select(
            F.col("n_weekdays").cast("bigint").alias("n_weekdays"),
            F.col("n_types").cast("bigint").alias("n_types"),
            "mutual_info_bits",
        )
    )


# ------------------------------------------- order fulfillment latency


@query(
    "q_fulfillment_latency",
    oracle="""
    WITH lat AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
               AS month,
             CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                  AS DOUBLE) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           quantile_cont(days, 0.5) AS p50_days,
           quantile_cont(days, 0.95) AS p95_days,
           CAST(MAX(days) AS DOUBLE) AS max_days
    FROM lat GROUP BY month ORDER BY month
    """,
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per order month — the SLA
    dashboard number (p50/p95/max days from order placement to line
    shipment). Exact interpolated percentiles (Spark `percentile` ≡
    DuckDB `quantile_cont` on doubles, bit-identical); integer day
    diffs make the interpolation arithmetic exact.

    Scale shape: one key-pruned fact join (orderkey equi-join), one
    month-keyed shuffle for the exact per-group percentile — the
    approx_percentile sketch is the 100 TB path when months hold
    billions of lines (q_approx_sketches)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.datediff("l_shipdate", "o_orderdate").cast("double").alias("days"),
    )
    return (
        lat.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.expr("percentile(days, 0.5)").alias("p50_days"),
            F.expr("percentile(days, 0.95)").alias("p95_days"),
            F.max("days").alias("max_days"),
        )
        .orderBy("month")
    )


# ------------------------------------------- supplier on-time shipping


@query(
    "q_supplier_otd",
    oracle="""
    WITH lat AS (
      SELECT l.l_suppkey AS suppkey,
             datediff('day', o.o_orderdate, l.l_shipdate) <= 30 AS on_time
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name AS supplier,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN on_time THEN 1 ELSE 0 END) AS BIGINT)
             AS n_on_time,
           ROUND(SUM(CASE WHEN on_time THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS otd_rate
    FROM lat JOIN supplier s ON s.s_suppkey = lat.suppkey
    GROUP BY s.s_name
    ORDER BY otd_rate ASC, supplier LIMIT 20
    """,
)
def q_supplier_otd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier on-time-shipping scoreboard: share of each supplier's
    lines shipped within the 30-day SLA of order placement, worst 20
    first — the vendor-performance ranking a procurement dashboard
    leads with.

    Scale shape: orderkey equi-join (the fact-to-fact join prunes to
    two columns a side), flag ratio per supplier via one map-side-
    combined count, small dim join for names, TakeOrdered top-k."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lat = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "l_suppkey",
        (F.datediff("l_shipdate", "o_orderdate") <= 30).alias("on_time"),
    )
    return (
        lat.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("on_time").cast("int")).cast("bigint").alias(
                "n_on_time"
            ),
            F.round(
                F.sum(F.col("on_time").cast("int"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("otd_rate"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_name").alias("supplier"),
            "n_lines",
            "n_on_time",
            "otd_rate",
        )
        .orderBy(F.col("otd_rate").asc(), "supplier")
        .limit(20)
    )


# ----------------------------------------------- DAU/MAU stickiness


@query(
    "q_stickiness_dau_mau",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             user_id
      FROM events
    ), dau AS (
      SELECT month, day, COUNT(DISTINCT user_id) AS dau
      FROM d GROUP BY 1, 2
    ), mau AS (
      SELECT month, COUNT(DISTINCT user_id) AS mau FROM d GROUP BY 1
    )
    SELECT a.month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(a.dau) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_dau,
           CAST(ANY_VALUE(m.mau) AS BIGINT) AS mau,
           ROUND((SUM(a.dau) / CAST(COUNT(*) AS DOUBLE))
                 / ANY_VALUE(m.mau), 6) AS stickiness
    FROM dau a JOIN mau m USING (month)
    GROUP BY a.month ORDER BY a.month
    """,
)
def q_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — mean daily active users over
    monthly active users, the engagement ratio product dashboards
    track (1.0 = every monthly user shows up daily).

    Scale shape: two distinct-count aggregations keyed by (month,
    day) and month — both map-side partial; the join runs on the
    months-sized rollup. Integer counts, exact IEEE divisions."""
    d = _t(spark, sf_dir, "events").select(
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "user_id",
    )
    dau = d.groupBy("month", "day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    mau = d.groupBy("month").agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(mau, "month")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum("dau") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_dau"),
            F.any_value("mau").cast("bigint").alias("mau"),
            F.round(
                (F.sum("dau") / F.count(F.lit(1)).cast("double"))
                / F.any_value("mau"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


# ------------------------------------------------- autocorrelation


@query(
    "q_autocorrelation",
    oracle="""
    WITH wk AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             COUNT(*) AS x
      FROM events GROUP BY 1
    ), stats AS (
      SELECT SUM(x) AS sx, SUM(x * x) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n FROM wk
    ), lagged AS (
      SELECT l.j,
             SUM(a.x * b.x) AS sxy,
             CAST(COUNT(*) AS BIGINT) AS pairs
      FROM wk a
      JOIN (SELECT unnest(generate_series(1, 4)) AS j) l ON TRUE
      JOIN wk b ON b.week = a.week + to_weeks(CAST(l.j AS INTEGER))
      GROUP BY l.j
    )
    SELECT l.j AS lag_weeks, l.pairs,
           ROUND((l.sxy / CAST(l.pairs AS DOUBLE)
                  - (s.sx / CAST(s.n AS DOUBLE))
                    * (s.sx / CAST(s.n AS DOUBLE)))
                 / greatest(s.sxx / CAST(s.n AS DOUBLE)
                            - (s.sx / CAST(s.n AS DOUBLE))
                              * (s.sx / CAST(s.n AS DOUBLE)),
                            0.000000000001), 6) AS acf
    FROM lagged l CROSS JOIN stats s
    ORDER BY lag_weeks
    """,
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of weekly event volume at lags 1-4 — the
    seasonality detector (an ACF spike at lag 1 means momentum, a
    periodic spike means a cycle the forecasting/capacity models must
    carry). Computed from sufficient statistics: ACF(j) ≈
    (E[x·x₊ⱼ] − μ²)/σ², so the series never leaves its weekly rollup.

    Scale shape: the fact table collapses to one row per week FIRST;
    the lag pairing is a self-join of that calendar-bounded series
    against a 4-row lag spine; moments are exact integer sums and
    every ratio is one IEEE expression rounded once."""
    wk = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(F.count(F.lit(1)).alias("x"))
        .persist()  # weeks-sized; feeds moments + both lag-join
    )                # sides — one corpus scan, not three
    wk.count()
    stats = wk.agg(
        F.sum("x").alias("sx"),
        # DECIMAL squares: long*long wraps silently at weekly counts
        # ≈ 3e9 while the oracle promotes to HUGEINT — keep both exact
        F.sum(
            (
                F.col("x").cast("decimal(19,0)")
                * F.col("x").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("sxx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    lags = spark.range(1, 5).select(F.col("id").cast("int").alias("j"))
    a = wk.select(F.col("week").alias("wa"), F.col("x").alias("xa"))
    b = wk.select(F.col("week").alias("wb"), F.col("x").alias("xb"))
    lagged = (
        a.crossJoin(F.broadcast(lags))  # 4-row lag spine
        .join(
            b,
            F.col("wb")
            == F.col("wa") + F.col("j") * F.expr("INTERVAL 7 DAYS"),
        )
        .groupBy("j")
        .agg(
            F.sum(
                (
                    F.col("xa").cast("decimal(19,0)")
                    * F.col("xb").cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            ).alias("sxy"),
            F.count(F.lit(1)).cast("bigint").alias("pairs"),
        )
    )
    mean = F.col("sx") / F.col("n").cast("double")
    var = F.greatest(
        F.col("sxx").cast("double") / F.col("n").cast("double")
        - mean * mean,
        F.lit(1e-12),
    )
    return (
        lagged.crossJoin(F.broadcast(stats))  # one row — the moments
        .select(
            F.col("j").alias("lag_weeks"),
            "pairs",
            F.round(
                (
                    F.col("sxy").cast("double")
                    / F.col("pairs").cast("double")
                    - mean * mean
                )
                / var,
                6,
            ).alias("acf"),
        )
        .orderBy("lag_weeks")
    )


# --------------------------------------------- k-anonymity audit


@query(
    "q_k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT event_type,
             dayname(CAST(date_trunc('day', ts) AS DATE)) AS weekday,
             CAST(floor(value / 100.0) AS BIGINT) AS value_bucket,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           ROUND(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
                 / CAST(SUM(n) AS DOUBLE), 6) AS at_risk_share
    FROM qi
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (event_type,
    weekday, value bucket): how many QI groups fall below k = 5, and
    what share of rows sits in them — the re-identification risk
    number a governance review asks for before a dataset leaves the
    boundary (pairs with pii_redact: that removes direct
    identifiers, this measures the indirect ones).

    Scale shape: one map-side-combined QI group count; the audit is
    a 1-row summary of that rollup — group cardinality, not corpus
    size, bounds everything after the first aggregate."""
    qi = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(
                F.date_trunc("day", F.col("ts")).cast("date"), "EEEE"
            ).alias("weekday"),
            F.floor(F.col("value") / 100.0).cast("bigint").alias(
                "value_bucket"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    small = F.col("n") < 5
    return qi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(small.cast("int")).cast("bigint").alias("n_small_groups"),
        F.sum(F.when(small, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("n").cast("bigint").alias("min_group_size"),
        F.round(
            F.sum(F.when(small, F.col("n")).otherwise(0))
            / F.sum("n").cast("double"),
            6,
        ).alias("at_risk_share"),
    )


# -------------------------------------- population stability index


@query(
    "q_population_stability",
    oracle="""
    WITH b AS (
      -- ts IS NOT NULL: a null timestamp belongs to neither half (a
      -- null is_ref would count as 'current' here but drop in Spark)
      SELECT CAST(floor(value / 100.0) AS BIGINT) AS bucket,
             dayofmonth(ts) <= 15 AS is_ref
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ), cells AS (
      SELECT bucket,
             SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur,
             COUNT(*) AS n_buckets
      FROM cells
    ), terms AS (
      -- Laplace(+1) smoothing so empty-on-one-side buckets stay
      -- finite; proportions then use N + B in the denominator
      SELECT CAST(ROUND(
               ((c.n_ref + 1) / CAST(t.t_ref + t.n_buckets AS DOUBLE)
                - (c.n_cur + 1) / CAST(t.t_cur + t.n_buckets AS DOUBLE))
               * ln(((c.n_ref + 1)
                     / CAST(t.t_ref + t.n_buckets AS DOUBLE))
                    / ((c.n_cur + 1)
                       / CAST(t.t_cur + t.n_buckets AS DOUBLE))), 12)
               AS DECIMAL(38,18)) AS term
      FROM cells c CROSS JOIN tot t
    )
    SELECT CAST((SELECT n_buckets FROM tot) AS BIGINT) AS n_buckets,
           CAST((SELECT t_ref FROM tot) AS BIGINT) AS n_ref,
           CAST((SELECT t_cur FROM tot) AS BIGINT) AS n_cur,
           ROUND(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE), 6) AS psi,
           ROUND(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE), 6) > 0.1
             AS drifted
    FROM terms
    """,
)
def q_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of purchase values, first half of
    the month (reference) vs second half (current) — THE tabular
    drift score risk/ML teams gate models on (PSI < 0.1 stable,
    > 0.25 action). Laplace-smoothed fixed-width value buckets keep
    both engines' proportions exact; the standard quantile-bucket
    variant swaps in the mergeable-histogram edges at scale.

    Scale shape: one map-side-combined (bucket, half) count — bucket
    cardinality, not event count, bounds everything after the first
    aggregate; a 1-row totals broadcast and a DECIMAL-summed term
    per bucket."""
    b = (
        _t(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
        )
        .select(
            F.floor(F.col("value") / 100.0).cast("bigint").alias("bucket"),
            (F.dayofmonth("ts") <= 15).alias("is_ref"),
        )
    )
    cells = b.groupBy("bucket").agg(
        F.sum(F.col("is_ref").cast("int")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("int")).alias("n_cur"),
    ).persist()  # bucket-cardinality; feeds totals AND terms —
    cells.count()  # one corpus scan
    tot = cells.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    p_ref = (F.col("n_ref") + 1) / (
        F.col("t_ref") + F.col("n_buckets")
    ).cast("double")
    p_cur = (F.col("n_cur") + 1) / (
        F.col("t_cur") + F.col("n_buckets")
    ).cast("double")
    terms = (
        cells.crossJoin(F.broadcast(tot))  # one row — the totals
        .select(
            F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 12)
            .cast("decimal(38,18)")
            .alias("term"),
            "n_buckets",
            "t_ref",
            "t_cur",
        )
    )
    psi = F.round(F.sum("term").cast("double"), 6)
    return terms.agg(
        F.any_value("n_buckets").cast("bigint").alias("n_buckets"),
        F.any_value("t_ref").cast("bigint").alias("n_ref"),
        F.any_value("t_cur").cast("bigint").alias("n_cur"),
        psi.alias("psi"),
        (psi > 0.1).alias("drifted"),
    )


# --------------------------------------------- interarrival burstiness


@query(
    "q_interarrival_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT user_id, gap FROM gaps WHERE gap IS NOT NULL
    ), s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             SUM(gap) AS sg,
             SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
               AS sgg
      FROM g GROUP BY user_id HAVING COUNT(*) >= 5
    )
    SELECT user_id, n_gaps,
           ROUND(sg / CAST(n_gaps AS DOUBLE), 6) AS mean_gap_s,
           ROUND(sqrt(greatest(CAST(sgg AS DOUBLE) / n_gaps
                               - (sg / CAST(n_gaps AS DOUBLE))
                                 * (sg / CAST(n_gaps AS DOUBLE)), 0))
                 / greatest(sg / CAST(n_gaps AS DOUBLE), 0.000001), 6)
             AS burstiness_cv
    FROM s
    ORDER BY burstiness_cv DESC, user_id LIMIT 20
    """,
)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user interarrival burstiness: coefficient of variation
    (σ/μ) of the gaps between a user's consecutive events — CV ≈ 1
    is Poisson-random, CV ≫ 1 is bursty (bot retries, scripted
    scraping), CV ≪ 1 is metronomic (cron traffic). Top-20 burstiest
    users with ≥ 5 gaps — the behavioral-anomaly shortlist.

    Scale shape: one user-keyed window for the lag gaps (the same
    shuffle sessionization uses), DECIMAL-exact moment sums per user
    (long·long squares would wrap on year-long second gaps × huge
    histories), TakeOrdered top-k."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
            )
            .cast("bigint")
            .alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap").alias("sg"),
            F.sum(
                (
                    F.col("gap").cast("decimal(19,0)")
                    * F.col("gap").cast("decimal(19,0)")
                ).cast("decimal(38,0)")
            ).alias("sgg"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    mean = F.col("sg") / F.col("n_gaps").cast("double")
    var = F.greatest(
        F.col("sgg").cast("double") / F.col("n_gaps") - mean * mean,
        F.lit(0.0),
    )
    return (
        s.select(
            "user_id",
            "n_gaps",
            F.round(mean, 6).alias("mean_gap_s"),
            F.round(
                F.sqrt(var) / F.greatest(mean, F.lit(1e-6)), 6
            ).alias("burstiness_cv"),
        )
        .orderBy(F.col("burstiness_cv").desc(), "user_id")
        .limit(20)
    )


# ------------------------------------------- session-level conversion


@query(
    "q_session_conversion",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ), marks AS (
      SELECT user_id, session_idx,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS t_purchase
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click THEN 1 ELSE 0 END)
                AS BIGINT) AS n_full_funnel,
           ROUND(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click THEN 1 ELSE 0 END)
                 / CAST(greatest(SUM(CASE WHEN t_view IS NOT NULL
                                     THEN 1 ELSE 0 END), 1) AS DOUBLE), 6)
             AS session_conversion
    FROM marks
    """,
)
def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-level funnel conversion: of sessions that saw a view,
    how many progressed view → click → purchase IN ORDER within the
    same 30-minute session — the intent-scoped complement of
    q_funnel's user-lifetime funnel (a click a week after the view
    counts there, not here).

    Scale shape: the same single user-keyed sessionizer shuffle as
    q_sessionize_events/q_session_paths, then one (user, session)
    first-timestamp rollup and a 1-row summary; NULL-safe ordered
    comparisons encode the strict ordering in both engines."""
    sess = _sessionized(_t(spark, sf_dir, "events"))
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    marks = sess.groupBy("user_id", "session_idx").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    saw_view = F.col("t_view").isNotNull()
    clicked = saw_view & (F.col("t_click") > F.col("t_view"))
    converted = clicked & (F.col("t_purchase") > F.col("t_click"))
    # WHEN/OTHERWISE(0), not boolean casts: `clicked` is NULL (not
    # false) for a view-only session, and SUM over all-NULL would
    # return NULL where the oracle's CASE sums to 0
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return marks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        one_if(saw_view).cast("bigint").alias("n_view"),
        one_if(clicked).cast("bigint").alias("n_view_click"),
        one_if(converted).cast("bigint").alias("n_full_funnel"),
        F.round(
            one_if(converted)
            / F.greatest(one_if(saw_view), F.lit(1)).cast("double"),
            6,
        ).alias("session_conversion"),
    )


# -------------------------------------------- discount elasticity


@query(
    "q_discount_elasticity",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS flag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(ROUND(l_discount * l_discount, 12)
                  AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(ROUND(l_quantity * l_quantity, 12)
                  AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(ROUND(l_discount * l_quantity, 12)
                  AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, n,
           ROUND((sxy / n - (sx / n) * (sy / n))
                 / greatest(sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0))
                            * sqrt(greatest(syy / n - (sy / n) * (sy / n), 0)),
                            0.000000000001), 6) AS corr_discount_qty,
           ROUND((sxy / n - (sx / n) * (sy / n))
                 / greatest(sxx / n - (sx / n) * (sx / n),
                            0.000000000001), 6) AS ols_slope
    FROM s ORDER BY flag
    """,
)
def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does discounting move volume? Per return-flag correlation AND
    OLS slope of quantity on discount — the pricing-analytics readout
    (slope ≈ extra units per discount point; r near zero says the
    discounts are ritual, not causal). Five sufficient statistics per
    group, one scan.

    Determinism: raw sums go through exact DECIMAL(18,2) (the values
    are 2-decimal business numbers); squared/cross terms round at 12
    before DECIMAL accumulation; every ratio is one IEEE expression
    rounded once."""
    li = _t(spark, sf_dir, "lineitem")
    dec2, dec18 = "decimal(18,2)", "decimal(38,18)"
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("l_discount").cast(dec2)).cast("double").alias("sx"),
        F.sum(F.col("l_quantity").cast(dec2)).cast("double").alias("sy"),
        F.sum(
            F.round(F.col("l_discount") * F.col("l_discount"), 12).cast(dec18)
        )
        .cast("double")
        .alias("sxx"),
        F.sum(
            F.round(F.col("l_quantity") * F.col("l_quantity"), 12).cast(dec18)
        )
        .cast("double")
        .alias("syy"),
        F.sum(
            F.round(F.col("l_discount") * F.col("l_quantity"), 12).cast(dec18)
        )
        .cast("double")
        .alias("sxy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    cov = F.col("sxy") / F.col("n") - mx * my
    vx = F.greatest(F.col("sxx") / F.col("n") - mx * mx, F.lit(0.0))
    vy = F.greatest(F.col("syy") / F.col("n") - my * my, F.lit(0.0))
    return s.select(
        "flag",
        "n",
        F.round(
            cov / F.greatest(F.sqrt(vx) * F.sqrt(vy), F.lit(1e-12)), 6
        ).alias("corr_discount_qty"),
        F.round(cov / F.greatest(vx, F.lit(1e-12)), 6).alias("ols_slope"),
    ).orderBy("flag")


# ------------------------------------------ seasonal anomaly days


@query(
    "q_seasonal_anomaly_days",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             dayname(CAST(date_trunc('day', ts) AS DATE)) AS weekday,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ), wd AS (
      SELECT weekday, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(x) AS sx,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
               AS sxx
      FROM d GROUP BY weekday
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day, d.weekday, d.x,
           ROUND(w.sx / CAST(w.n_days AS DOUBLE), 6) AS weekday_mean,
           ROUND((d.x - w.sx / CAST(w.n_days AS DOUBLE))
                 / greatest(sqrt(greatest(
                     CAST(w.sxx AS DOUBLE) / w.n_days
                     - (w.sx / CAST(w.n_days AS DOUBLE))
                       * (w.sx / CAST(w.n_days AS DOUBLE)), 0)),
                     0.000001), 6) AS seasonal_z
    FROM d JOIN wd w USING (weekday)
    -- rank by the ROUNDED score (the alias), exactly as Spark does —
    -- ordering by the raw z could pick a different rank-10 row when
    -- two days differ only past the 6th decimal
    ORDER BY abs(seasonal_z) DESC, day
    LIMIT 10
    """,
)
def q_seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-AWARE daily anomalies: each day's volume z-scored
    against ITS OWN weekday's mean and spread — a hot Saturday is
    normal, a Saturday-sized Tuesday is not (the blind spot of a
    global z-score; pairs with q_cusum_drift's sustained-shift lens
    and q_weekday_seasonality's profile). Top-10 by |z|.

    Scale shape: daily counts, a 7-row weekday-moments rollup joined
    back (broadcast-sized), DECIMAL squares against count overflow,
    TakeOrdered top-k."""
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.date_format(
                F.date_trunc("day", F.col("ts")).cast("date"), "EEEE"
            ).alias("weekday"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .persist()  # one-row-per-day; feeds the weekday moments AND
    )                # the z-score join — one corpus scan
    d.count()
    wd = d.groupBy("weekday").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(
            (
                F.col("x").cast("decimal(19,0)")
                * F.col("x").cast("decimal(19,0)")
            ).cast("decimal(38,0)")
        ).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n_days").cast("double")
    sig = F.greatest(
        F.sqrt(
            F.greatest(
                F.col("sxx").cast("double") / F.col("n_days") - mean * mean,
                F.lit(0.0),
            )
        ),
        F.lit(1e-6),
    )
    z = (F.col("x") - mean) / sig
    return (
        d.join(F.broadcast(wd), "weekday")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "weekday",
            "x",
            F.round(mean, 6).alias("weekday_mean"),
            F.round(z, 6).alias("seasonal_z"),
        )
        .orderBy(F.abs(F.col("seasonal_z")).desc(), "day")
        .limit(10)
    )


# ------------------------------------------------- session quality


@query(
    "q_session_quality",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    ), per AS (
      SELECT user_id, session_idx,
             COUNT(*) AS n_events,
             CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
               AS dur_s
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate,
           ROUND(SUM(n_events) / CAST(COUNT(*) AS DOUBLE), 6)
             AS avg_events_per_session,
           quantile_cont(CAST(dur_s AS DOUBLE), 0.5) AS p50_duration_s,
           quantile_cont(CAST(dur_s AS DOUBLE), 0.95) AS p95_duration_s
    FROM per
    """,
)
def q_session_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-quality panel: bounce rate (single-event
    sessions), mean events per session, and p50/p95 session duration
    — the engagement vitals next to q_session_paths' shapes and
    q_session_conversion's funnel, all from the same one-shuffle
    sessionizer.

    Scale shape: _sessionized's user-keyed window, a (user, session)
    rollup, then a 1-row summary; exact interpolated percentiles on
    integer second durations (percentile ≡ quantile_cont)."""
    per = (
        _sessionized(
            _t(spark, sf_dir, "events").withColumn(
                "event_type", F.lit("")
            )
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_timestamp(F.max("ts"))
                - F.unix_timestamp(F.min("ts"))
            )
            .cast("bigint")
            .alias("dur_s"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("bounce_rate"),
        F.round(
            F.sum("n_events") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_events_per_session"),
        F.expr("percentile(CAST(dur_s AS DOUBLE), 0.5)").alias(
            "p50_duration_s"
        ),
        F.expr("percentile(CAST(dur_s AS DOUBLE), 0.95)").alias(
            "p95_duration_s"
        ),
    )
