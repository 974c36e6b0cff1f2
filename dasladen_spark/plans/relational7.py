"""Relational/analytics queries, part 7: l-diversity privacy audit
and blocked entity-resolution clustering with transitive closure.

Beyond-reference operators (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107). The ER oracle is
a recursive CTE — the one query family where the DuckDB side, not the
Spark side, is the hard part: Spark's iterative min-label propagation
(operators/graph.py) is matched against SQL transitive closure, so
cluster assignments are verified end-to-end, not just edge counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# --------------------------------------------- l-diversity audit


@query(
    "q_l_diversity_audit",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             COUNT(*) AS n,
             COUNT(DISTINCT c_mktsegment) AS l_div
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_diversity,
           CAST(SUM(CASE WHEN l_div < 3 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(l_div) AS BIGINT) AS min_diversity,
           ROUND(SUM(CASE WHEN l_div < 3 THEN n ELSE 0 END)
                 / CAST(SUM(n) AS DOUBLE), 6) AS at_risk_share
    FROM qi
    """,
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the quasi-identifier tuple (nation,
    account-balance bucket) with c_mktsegment as the sensitive
    attribute: a QI group can satisfy k-anonymity (many rows) yet
    leak the sensitive value outright when every row in it shares ONE
    segment — this counts groups with fewer than l = 3 distinct
    sensitive values and the row mass exposed by them (the companion
    number to q_k_anonymity_audit; governance reviews ask for both).

    Scale shape: one map-side-combined group-by with a per-group
    COUNT DISTINCT over a 5-value domain (the distinct expands to at
    most 5 rows per group before the final fold); the audit itself is
    a 1-row summary of that rollup."""
    qi = (
        _t(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0)
            .cast("bigint")
            .alias("bal_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("c_mktsegment").alias("l_div"),
        )
    )
    low = F.col("l_div") < 3
    return qi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(low.cast("int")).cast("bigint").alias("n_low_diversity"),
        F.sum(F.when(low, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("l_div").cast("bigint").alias("min_diversity"),
        F.round(
            F.sum(F.when(low, F.col("n")).otherwise(0))
            / F.sum("n").cast("double"),
            6,
        ).alias("at_risk_share"),
    )


# ------------------------------- entity-resolution cluster rollup


@query(
    "er_customer_clusters",
    oracle="""
    WITH RECURSIVE c AS (
      SELECT c_custkey AS k, c_name AS name,
             substring(c_name, 1, length(c_name) - 2) AS blk
      FROM customer
    ), e AS (
      SELECT a.k AS ka, b.k AS kb
      FROM c a JOIN c b ON a.blk = b.blk AND a.k < b.k
      WHERE levenshtein(a.name, b.name) <= 1
    ), und AS (
      SELECT ka AS a, kb AS b FROM e
      UNION SELECT kb AS a, ka AS b FROM e
    ), nodes AS (
      SELECT DISTINCT a AS id FROM und
    ), r(node, root) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT u.b, r.root FROM r JOIN und u ON u.a = r.node
    ), lab AS (
      SELECT node, MIN(root) AS component FROM r GROUP BY node
    )
    SELECT lab.component AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           cu.c_name AS rep_name
    FROM lab JOIN customer cu ON cu.c_custkey = lab.component
    GROUP BY lab.component, cu.c_name
    HAVING COUNT(*) >= 2
    ORDER BY cluster_id
    """,
)
def er_customer_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clusters over customer names: blocked
    candidate pairs (all-but-last-2-characters blocking key, the
    q_fuzzy_name_match device that caps block size by construction),
    levenshtein ≤ 1 match edges, then TRANSITIVE CLOSURE — A≈B and
    B≈C put A and C in one cluster even at distance 2, which is what
    separates entity resolution from pairwise fuzzy matching. Output:
    one row per multi-member cluster with its representative (the
    minimum key's name).

    Scale shape: the candidate join is block-keyed with fan-out
    bounded by the key design (≤ 100 names per block whatever the
    table size); and because every match edge lies INSIDE one block
    (the join requires equal block keys), components can never span
    blocks — so the closure is partitioned_components
    (operators/graph.py): one shuffle grouping each block's edges,
    union-find per block in an Arrow batch, NO iterative jobs.
    connected_components (iterative label propagation) remains the
    tool for pair lists that span arbitrary rows. The stream side of
    the broadcast candidate join is explicitly repartitioned first:
    a dimension-sized table scans as ONE task, and without the
    spread every block's pair expansion × levenshtein would run on a
    single core (the _spread lesson from operators/dedup — per-row
    heavy compute after a small scan must be forced wide). The
    oracle is a recursive CTE computing the same closure, so cluster
    assignments are cross-engine verified."""
    from dasladen_spark.operators.graph import partitioned_components

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    blk = F.expr("substring(c_name, 1, length(c_name) - 2)")
    a = c.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("c_custkey").alias("ka"),
        F.col("c_name").alias("name_a"),
        blk.alias("blk"),
    )
    b = c.select(
        F.col("c_custkey").alias("kb"),
        F.col("c_name").alias("name_b"),
        blk.alias("blk"),
    )
    edges = (
        a.join(b, on=[a.blk == b.blk, F.col("ka") < F.col("kb")])
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("ka", "kb", a.blk)
    )
    labels = partitioned_components(edges, "blk", src="ka", dst="kb")
    clusters = (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    reps = c.select(
        F.col("c_custkey").alias("component"),
        F.col("c_name").alias("rep_name"),
    )
    # the cluster rollup (≤ rows/2, in practice rows/block_size) is
    # the small side — broadcast IT onto the customer scan, never the
    # reverse
    return (
        reps.join(F.broadcast(clusters), "component")
        .select(
            F.col("component").alias("cluster_id"), "n_members", "rep_name"
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------- cohort retention


@query(
    "q_cohort_retention",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ), cw AS (
      SELECT user_id, MIN(wk) AS cohort_week FROM uw GROUP BY user_id
    ), act AS (
      SELECT c.cohort_week,
             date_diff('day', c.cohort_week, u.wk) // 7 AS week_offset,
             COUNT(*) AS n_active
      FROM uw u JOIN cw c ON c.user_id = u.user_id
      GROUP BY 1, 2
    ), sz AS (
      SELECT cohort_week, COUNT(*) AS n_cohort FROM cw GROUP BY cohort_week
    )
    SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(a.week_offset AS BIGINT) AS week_offset,
           CAST(a.n_active AS BIGINT) AS n_active,
           CAST(s.n_cohort AS BIGINT) AS n_cohort,
           ROUND(a.n_active / CAST(s.n_cohort AS DOUBLE), 6) AS retention
    FROM act a JOIN sz s ON s.cohort_week = a.cohort_week
    ORDER BY a.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by the week of
    their FIRST event; for each cohort and week offset, the share of
    the cohort still active — the standard survival/retention report
    behind churn analysis (row (c, 0) is 100% by construction; decay
    down each cohort row is the retention curve).

    Scale shape: one distinct on (user, week) — the only corpus-sized
    shuffle; cohorts are a per-user min (map-side combinable); the
    activity rollup is (weeks × offsets)-bounded and the cohort-size
    join is a broadcast onto that bounded frame. The retention
    division is the single double expression, rounded once."""
    e = _t(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    cw = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    act = (
        uw.join(cw, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) div 7").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sz = cw.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        act.join(F.broadcast(sz), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.col("week_offset").cast("bigint").alias("week_offset"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            F.round(
                F.col("n_active") / F.col("n_cohort").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------- A/B conversion z-test


@query(
    "q_ab_conversion_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id,
             substr(md5('ab' || CAST(user_id AS VARCHAR)), 1, 8)
               < '80000000' AS in_a,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN in_a THEN converted ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE converted END) AS BIGINT)
               AS conv_b
      FROM u
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
           ROUND(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
           CASE WHEN n_a = 0 OR n_b = 0
                  OR conv_a + conv_b = 0
                  OR conv_a + conv_b = n_a + n_b
             THEN NULL
             ELSE ROUND(
               (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
               / sqrt(
                   ((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
                 ),
               6) END AS z_score
    FROM s
    """,
)
def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users split 50/50
    by the portable md5 hash (never user_id parity — modulo splits
    correlate with fixture assignment rules), conversion = the user
    purchased at least once, and the pooled-variance z statistic that
    decides whether the variants' conversion rates differ beyond
    noise — the readout every experimentation pipeline ends with.

    Scale shape: one user-keyed rollup (map-side combinable MAX) then
    a 1-row fold of four exact integer counts; the z formula is a
    single double expression written IDENTICALLY in both engines over
    those exact counts, rounded once."""
    e = _t(spark, sf_dir, "events")
    u = e.groupBy(
        "user_id",
        (
            F.substring(
                F.md5(F.concat(F.lit("ab"), F.col("user_id").cast("string"))),
                1,
                8,
            )
            < "80000000"
        ).alias("in_a"),
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    s = u.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(F.col("converted")))
        .cast("bigint")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    return s.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        # degenerate designs (an empty variant, zero or universal
        # conversion) have no finite z — NULL in both engines, and
        # the guard also keeps ANSI mode from raising on the division
        F.when(
            (F.col("n_a") == 0)
            | (F.col("n_b") == 0)
            | (F.col("conv_a") + F.col("conv_b") == 0)
            | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (rate_a - rate_b)
                / F.sqrt(
                    pooled
                    * (F.lit(1.0) - pooled)
                    * (
                        F.lit(1.0) / F.col("n_a").cast("double")
                        + F.lit(1.0) / F.col("n_b").cast("double")
                    )
                ),
                6,
            )
        )
        .alias("z_score"),
    )
