"""Relational/analytics queries, part 5: closed-form regression,
robust (winsorized) moments, and distributional entropy — the audit
statistics a pipeline publishes next to its aggregates.

Beyond-reference operators (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107). Determinism
discipline as in llm3+: one rounded double expression per row, DECIMAL
accumulation, one final ROUND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# ------------------------------------------------ per-group OLS trend


@query(
    "q_ols_trend_by_nation",
    oracle="""
    WITH wk AS (
      SELECT n.n_name AS nation,
             -- Monday epoch: week-truncated dates are always Mondays,
             -- so the day diff is an exact multiple of 7 and the
             -- division is exact (a Sunday epoch would collapse the
             -- two weeks straddling it onto the same index)
             CAST(datediff('day', TIMESTAMP '1995-01-02',
                           date_trunc('week', o.o_orderdate)) // 7
                  AS DOUBLE) AS x,
             CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6)))
                  AS VARCHAR) AS DOUBLE) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, date_trunc('week', o.o_orderdate)
    ), s AS (
      SELECT nation,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM wk GROUP BY nation
    )
    SELECT nation, CAST(n AS BIGINT) AS n_weeks,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept
    FROM s ORDER BY nation
    """,
)
def q_ols_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares revenue trend per nation: weekly
    revenue series (the raw facts collapse to |nations × weeks| rows
    first), then slope/intercept from the five sufficient statistics
    (n, Σx, Σy, Σx², Σxy) — ONE map-side-combined aggregate, no
    iterative fitting, no collect. The regression every drift monitor
    runs, at 100 TB the same two-aggregate plan."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    wk = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("week", "o_orderdate").alias("week"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("y")
        )
        .select(
            "nation",
            (
                F.datediff(
                    F.col("week"), F.lit("1995-01-02").cast("timestamp")
                )
                / 7
            )
            .cast("int")
            .cast("double")
            .alias("x"),
            "y",
        )
    )
    s = wk.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "nation",
        F.col("n").cast("bigint").alias("n_weeks"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    ).orderBy("nation")


# ------------------------------------------------ winsorized moments


@query(
    "q_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS pri,
             quantile_cont(o_totalprice, 0.05) AS p5,
             quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority AS pri,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(b.p5, 6) AS p5,
           ROUND(b.p95, 6) AS p95,
           ROUND(CAST(CAST(SUM(CAST(
             ROUND(least(greatest(o.o_totalprice, b.p5), b.p95), 6)
             AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean
    FROM orders o JOIN b ON b.pri = o.o_orderpriority
    GROUP BY o.o_orderpriority, b.p5, b.p95
    ORDER BY pri
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) mean order value per priority —
    the outlier-robust center every monitoring dashboard should show
    instead of the raw mean.

    Scale shape: pass 1 computes the per-group clamp bounds (exact
    percentiles via Spark's percentile aggregate — group-keyed, no
    global sort); pass 2 re-aggregates with values clamped into
    [p5, p95], broadcast-joining the 5-row bounds table back onto the
    scan. Clamped values round at 6 then sum in DECIMAL — same
    linear-interpolation percentile semantics as quantile_cont, same
    bits from both engines."""
    o = _t(spark, sf_dir, "orders")
    b = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p5"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    clamped = o.join(
        F.broadcast(b), o["o_orderpriority"] == b["pri"]
    ).select(
        "pri",
        "p5",
        "p95",
        F.round(
            F.least(F.greatest(F.col("o_totalprice"), F.col("p5")), F.col("p95")),
            6,
        )
        .cast("decimal(38,6)")
        .alias("w"),
    )
    return (
        clamped.groupBy("pri", "p5", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").cast("double").alias("sw"),
        )
        .select(
            "pri",
            F.col("n").cast("bigint").alias("n"),
            F.round("p5", 6).alias("p5"),
            F.round("p95", 6).alias("p95"),
            F.round(F.col("sw") / F.col("n"), 6).alias("winsorized_mean"),
        )
        .orderBy("pri")
    )


# ------------------------------------------------ behavioral entropy


@query(
    "q_user_activity_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    ), t AS (
      SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1
    ), e AS (
      SELECT c.user_id,
             ROUND(CAST(CAST(SUM(CAST(
               ROUND(-(n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE)),
                     12)
               AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE), 6) AS entropy
      FROM c JOIN t ON t.user_id = c.user_id
      GROUP BY c.user_id
    )
    SELECT user_id, entropy FROM e ORDER BY entropy DESC, user_id LIMIT 25
    """,
)
def q_user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral
    diversity score (bots: near 0; explorers: near ln(#types)).
    Top-25 most-diverse users, ties by id.

    Scale shape: everything stays keyed on user_id — per-(user, type)
    counts, per-user totals, and the entropy sum are three
    map-side-combinable aggregates over the SAME key, so one shuffle
    partitioning serves all of them; the top-25 is a
    TakeOrderedAndProject, never a global sort."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    ent = (
        c.join(t, "user_id")
        .select(
            "user_id",
            F.round(-p * F.log(p), 12).cast("decimal(38,18)").alias("term"),
        )
        .groupBy("user_id")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("entropy"))
    )
    return ent.orderBy(F.col("entropy").desc(), "user_id").limit(25)


# ----------------------------------- mergeable exact percentiles


@query(
    "q_quantile_mergeable_rollup",
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT week,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(cents, 0.5) / 100.0, 6) AS p50,
           ROUND(quantile_cont(cents, 0.95) / 100.0, 6) AS p95
    FROM c GROUP BY week ORDER BY week
    """,
)
def q_quantile_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weekly p50/p95 of event values from MERGEABLE per-day
    value histograms — the quantile sibling of the bitmap distinct
    rollup: per-day (value → count) partials are what you persist at
    100 TB; coarser grains merge by adding counts, never by
    re-scanning events; and the percentile itself is computed
    DISTRIBUTED — a week-keyed cumulative window over the histogram
    plus conditional aggregates pick and interpolate the bracketing
    values, so no task ever sees a week's raw values, only its
    distinct-value histogram. (Values are canonicalized to cents so
    the histogram is exact; quantile_cont over the same cents is the
    oracle.)"""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            F.date_trunc("week", "ts").alias("week"),
            F.date_trunc("day", "ts").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("week", "day", "cents")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the day→week merge: counts ADD (the mergeability property)
    hist = daily.groupBy("week", "cents").agg(F.sum("n").alias("n"))
    w = Window.partitionBy("week").orderBy("cents")
    hist = hist.withColumn("cum", F.sum("n").over(w))
    tot = hist.groupBy("week").agg(F.sum("n").alias("tot"))
    h = hist.join(tot, "week")

    def quantile(q: float):
        pos = (F.col("tot") - 1) * F.lit(q)
        lo = F.floor(pos)
        frac = pos - lo
        v_lo = F.min(F.when(F.col("cum") > lo, F.col("cents")))
        v_hi = F.min(F.when(F.col("cum") > lo + 1, F.col("cents")))
        # top rank: lo+1 may exceed the last index — fall back to v_lo
        interp = v_lo + (F.coalesce(v_hi, v_lo) - v_lo) * F.first(frac)
        return F.round(interp / 100.0, 6)

    return (
        h.groupBy("week")
        .agg(
            F.first("tot").cast("bigint").alias("n"),
            quantile(0.5).alias("p50"),
            quantile(0.95).alias("p95"),
        )
        .select(F.col("week").cast("timestamp").alias("week"), "n", "p50", "p95")
        .orderBy("week")
    )


# -------------------------------------------- marketing attribution


@query(
    "q_attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), att AS (
      SELECT p.event_id, p.user_id, p.ts,
             (SELECT MAX(c.ts) FROM c
              WHERE c.user_id = p.user_id AND c.ts < p.ts
                AND c.ts >= p.ts - INTERVAL 7 DAY) AS click_ts
      FROM p
    )
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_attributed,
           ROUND(SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS attributed_share
    FROM att GROUP BY 1 ORDER BY week
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the
    user's most recent click within the preceding 7 days, reported as
    a weekly attribution-share rollup — the event-analytics composite
    behind every marketing dashboard.

    Scale shape: the as-of join (operators/asof) is one user-keyed
    shuffle of clicks+purchases with an in-partition ordered scan —
    never a per-purchase subquery (the oracle's correlated MAX is the
    SEMANTIC spec; the engine's plan is the union-sort trick), then
    one map-side-combined weekly rollup."""
    from dasladen_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    att = asof_join(
        p,
        c,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols={"click_ts": "click_ts"},
        strict=True,
    )
    att = att.withColumn(
        "click_ts",
        F.when(
            F.col("click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
            F.col("click_ts"),
        ),
    )
    return (
        att.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.col("click_ts").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_attributed"),
            F.round(
                F.sum(F.col("click_ts").isNotNull().cast("int"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("attributed_share"),
        )
        .select(
            F.col("week").cast("timestamp").alias("week"),
            "n_purchases",
            "n_attributed",
            "attributed_share",
        )
        .orderBy("week")
    )


# --------------------------------------------- rater agreement (kappa)


@query(
    "q_rater_agreement_kappa",
    oracle=r"""
    WITH r AS (
      SELECT doc_id,
             CAST(n_chars >= 300 AS INT) AS a,
             CAST(len(regexp_extract_all(text, '\S+')) >= 60 AS INT) AS b
      FROM documents
    ), c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
             CAST(SUM(a) AS BIGINT) AS a1, CAST(SUM(b) AS BIGINT) AS b1
      FROM r
    )
    SELECT n, agree,
           ROUND(agree / CAST(n AS DOUBLE), 6) AS po,
           ROUND((a1 * b1 + (n - a1) * (n - b1))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           ROUND((agree / CAST(n AS DOUBLE)
                  - (a1 * b1 + (n - a1) * (n - b1))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0 - (a1 * b1 + (n - a1) * (n - b1))
                    / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM c
    """,
)
def q_rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two labeling policies (here: a length
    rater and a token-count rater) — the agreement statistic every
    labeling/curation pipeline publishes before trusting a rater or
    a distilled classifier as ground truth.

    Scale shape: one map-side-combined aggregate produces the whole
    2×2 confusion summary (n, agreements, per-rater positives); the
    kappa arithmetic is a single driver-free projection over that
    1-row frame."""
    d = _t(spark, sf_dir, "documents")
    r = d.select(
        (F.col("n_chars") >= 300).cast("int").alias("a"),
        (
            F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 60
        )
        .cast("int")
        .alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("int")).cast("bigint").alias("agree"),
        F.sum("a").cast("bigint").alias("a1"),
        F.sum("b").cast("bigint").alias("b1"),
    )
    po = F.col("agree") / F.col("n").cast("double")
    pe = (
        F.col("a1") * F.col("b1")
        + (F.col("n") - F.col("a1")) * (F.col("n") - F.col("b1"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return c.select(
        "n",
        "agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


# ------------------------------------------- dataset fingerprint


@query(
    "q_dataset_fingerprint",
    oracle="""
    WITH h AS (
      SELECT CAST(CAST(
               ('0x' || substr(md5(
                 concat_ws(chr(31),
                   COALESCE(CAST(o_orderkey AS VARCHAR), chr(0) || 'null'),
                   COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || 'null'),
                   COALESCE(o_orderstatus, chr(0) || 'null'),
                   COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 AS VARCHAR), chr(0) || 'null'),
                   COALESCE(strftime(o_orderdate, '%Y-%m-%d'),
                            chr(0) || 'null'),
                   COALESCE(o_orderpriority, chr(0) || 'null')
                 )), 1, 15))::UBIGINT AS HUGEINT) AS DECIMAL(38,0)) AS v
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(v) AS DECIMAL(38,0)) AS VARCHAR) AS content_hash
    FROM h
    """,
)
def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of the orders table
    (operators/checksum): SUM of portable per-row md5 hashes +
    count. Every storage rewrite this engine ships (compaction,
    bucketing, z-order, snapshot swap) must preserve this number —
    the rewrite-invariance test proves it survives arbitrary
    repartitioning, and the DuckDB oracle proves it is
    engine-portable. Mergeable: shard partials add up, so a 100 TB
    validation is one map-side-combined scan."""
    from dasladen_spark.operators.checksum import dataset_fingerprint

    o = _t(spark, sf_dir, "orders")
    return dataset_fingerprint(
        o,
        [
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("decimal(18,2)"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.col("o_orderpriority"),
        ],
    )


@query(
    "q_source_fingerprints",
    oracle="""
    WITH h AS (
      SELECT source,
             CAST(CAST(
               ('0x' || substr(md5(
                 concat_ws(chr(31),
                   COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'null'),
                   COALESCE(text, chr(0) || 'null'),
                   COALESCE(lang, chr(0) || 'null')
                 )), 1, 15))::UBIGINT AS HUGEINT) AS DECIMAL(38,0)) AS v
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(v) AS DECIMAL(38,0)) AS VARCHAR) AS content_hash
    FROM h GROUP BY source ORDER BY source
    """,
)
def q_source_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content fingerprints of the corpus
    (operators/checksum.grouped_fingerprint) — the selective-rewrite
    validator: after re-ingesting or compacting ONE source, only its
    group hash may change. Same portable mergeable hash-sum as
    q_dataset_fingerprint, one map-side-combined aggregate."""
    from dasladen_spark.operators.checksum import grouped_fingerprint

    d = _t(spark, sf_dir, "documents")
    return grouped_fingerprint(
        d, ["source"], [F.col("doc_id"), F.col("text"), F.col("lang")]
    ).orderBy("source")


@query(
    "q_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts, value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.purchase_id, p.value, c.click_id,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touch
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.click_ts < p.ts
       AND c.click_ts >= p.ts - INTERVAL 7 DAY
    ), credit AS (
      SELECT click_id,
             CAST(ROUND(value / n_touch, 6) AS DECIMAL(38,6)) AS cr
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
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution — every click in the 7 days
    before a purchase shares that purchase's value equally (the
    fairness-spread complement of q_attribution_last_touch). Top-25
    clicks by credited value.

    Scale shape: the purchase×click pairing is a user-keyed range
    join (both sides shuffle once on user_id; the 7-day band bounds
    fan-out), the per-purchase touch count is a window over that
    bounded pair set, and credits aggregate map-side per click.
    Per-credit rounding + DECIMAL accumulation keeps the totals
    bit-stable under any partitioning."""
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
    from pyspark.sql import Window

    w = Window.partitionBy("purchase_id")
    credit = pairs.select(
        "click_id",
        F.round(F.col("value") / F.count(F.lit(1)).over(w), 6)
        .cast("decimal(38,6)")
        .alias("cr"),
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


@query(
    "q_daily_quality_scorecard",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             event_id, user_id, value
      FROM events
    ), s AS (
      SELECT day,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(value) AS BIGINT) AS null_values,
             CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
               AS dup_event_ids,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM d GROUP BY day
    )
    SELECT day, n_rows, null_values, dup_event_ids, n_users,
           CAST(n_rows - LAG(n_rows) OVER (ORDER BY day) AS BIGINT)
             AS dod_delta
    FROM s ORDER BY day LIMIT 40
    """,
)
def q_daily_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day data-quality scorecard for the event intake — row
    volume, null measure count, duplicate-id count, distinct users,
    and the day-over-day volume delta: the observability panel that
    catches a broken upstream BEFORE the corpus does (first 40 days).

    Scale shape: one day-keyed aggregate (COUNT DISTINCT per day is
    partial-aggregated within the day's partition range); the lag
    window runs over the days-sized rollup, never raw events."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            "event_id",
            "user_id",
            "value",
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value"))
            .cast("bigint")
            .alias("null_values"),
            (F.count(F.lit(1)) - F.count_distinct("event_id"))
            .cast("bigint")
            .alias("dup_event_ids"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    from pyspark.sql import Window

    from dasladen_spark.functions.vectors import bounded_window_key

    # ≤40 daily rows reach this window (limit below) — explicit
    # single partition, not an accidental global sort
    w = Window.partitionBy(
        bounded_window_key(F.year("day"))
    ).orderBy("day")
    return (
        s.withColumn(
            "dod_delta",
            (F.col("n_rows") - F.lag("n_rows").over(w)).cast("bigint"),
        )
        .orderBy("day")
        .limit(40)
    )


@query(
    "q_user_concentration",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ), top AS (
      SELECT n FROM c ORDER BY n DESC, user_id LIMIT 10
    )
    SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_users,
           CAST((SELECT SUM(n) FROM c) AS BIGINT) AS n_events,
           CAST((SELECT SUM(n) FROM top) AS BIGINT) AS top10_events,
           ROUND((SELECT SUM(n) FROM top)
                 / CAST((SELECT SUM(n) FROM c) AS DOUBLE), 6)
             AS top10_share
    """,
)
def q_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-concentration audit: what share of all events comes
    from the 10 heaviest users — the Pareto check that decides
    whether per-user keys need skew handling (a top10_share in the
    tens of percent means salting before any user-keyed shuffle).

    Scale shape: per-user counts are one map-side-combined aggregate;
    the top-10 is a TakeOrdered over those counts (never a global
    sort); the three totals reduce from the same counts frame."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    top = (
        c.orderBy(F.col("n").desc(), "user_id")
        .limit(10)
        .agg(F.sum("n").cast("bigint").alias("top10_events"))
    )
    return tot.crossJoin(F.broadcast(top)).select(
        "n_users",
        "n_events",
        "top10_events",
        F.round(
            F.col("top10_events") / F.col("n_events").cast("double"), 6
        ).alias("top10_share"),
    )
