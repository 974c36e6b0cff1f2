"""Relational query library, part 4: distributed statistics, time
spines, and training-sequence packing.

Same engine stance as relational.py: the reference delegates all
query power to its backing RDBMS (/root/reference/dasladen/
task.py:94-107,180); Spark SQL is that engine here, and every shape
below is written for the 100 TB plan first (exact decimal component
sums instead of streaming moment aggregates, range-partitioned
prefix sums instead of single-partition windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.functions.text import token_count
from dasladen_spark.operators.ranking import global_prefix_sum, global_row_number
from dasladen_spark.plans.registry import query
from dasladen_spark.plans.relational import _dec, _disc_price
from dasladen_spark.session import load_table as _t


@query(
    "q_exact_corr",
    oracle="""
    WITH c AS (
      -- decimal->double via VARCHAR: DuckDB's direct decimal cast is
      -- not correctly rounded past 2^53; text parse is (matches
      -- Spark's correctly-rounded BigDecimal.doubleValue).
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                  AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                  AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4)))
                  AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice
                  AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice
                  AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_qty_price,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price
    FROM c
    """,
)
def q_exact_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed Pearson correlation + sample covariance per
    group, from decimal component sums (n, Σx, Σy, Σx², Σy², Σxy).

    Spark's built-in ``corr``/``covar_samp`` stream a merge-order-
    dependent moment state, so their low bits vary run-to-run with
    partitioning; component sums in DECIMAL are associative and
    therefore partition-order independent — one partial+final
    aggregate (single shuffle of 6 numbers per group), then identical
    IEEE double arithmetic on both engines. This is also the 100 TB
    shape: the six sums are map-side combined, nothing else moves."""
    l = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    c = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sx"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(18,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(18,4)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(18,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return c.select(
        "l_returnflag",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        ((sxy - sx * sy / n) / (n - F.lit(1.0))).alias("covar_qty_price"),
    )


@query(
    "q_gapfill_monthly",
    oracle="""
    WITH months AS (
      SELECT unnest(generate_series(
        (SELECT date_trunc('month', MIN(l_shipdate)) FROM lineitem),
        (SELECT date_trunc('month', MAX(l_shipdate)) FROM lineitem),
        INTERVAL 1 MONTH)) AS month
    ), rev AS (
      SELECT date_trunc('month', l_shipdate) AS month,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
      FROM lineitem
      WHERE l_quantity > 49 AND l_returnflag = 'R'
      GROUP BY 1
    )
    SELECT m.month AS month,
           COALESCE(r.revenue, CAST(0 AS DECIMAL(38,6))) AS revenue,
           CASE WHEN r.month IS NULL THEN 1 ELSE 0 END AS gap_filled
    FROM months m LEFT JOIN rev r ON m.month = r.month
    """,
)
def q_gapfill_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap fill: a complete month calendar generated from
    the data's own bounds (`sequence` + `explode` on a 1-row
    aggregate), left-joined to a sparse monthly aggregate with
    zero-fill — the canonical dense-time-series report.

    The spine is O(months) rows built driver-free; it broadcasts to
    the join, so the only real shuffle is the revenue aggregate. At
    100 TB the spine side is still tiny (a century is 1,200 rows) —
    the plan is scale-invariant."""
    l = _t(spark, sf_dir, "lineitem")
    bounds = l.agg(
        F.date_trunc("month", F.min("l_shipdate")).alias("lo"),
        F.date_trunc("month", F.max("l_shipdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 MONTH"))
        ).alias("month")
    )
    rev = (
        l.filter((F.col("l_quantity") > 49) & (F.col("l_returnflag") == "R"))
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("rmonth"))
        .agg(F.sum(_disc_price()).cast("decimal(38,6)").alias("revenue"))
    )
    return (
        spine.join(rev, F.col("month") == F.col("rmonth"), "left")
        .select(
            "month",
            F.coalesce(
                F.col("revenue"), F.lit(0).cast("decimal(38,6)")
            ).alias("revenue"),
            F.when(F.col("rmonth").isNull(), 1).otherwise(0).alias("gap_filled"),
        )
    )


@query(
    "q_mode_per_group",
    oracle="""
    SELECT user_bucket, event_type AS modal_type, cnt FROM (
      SELECT user_id % 50 AS user_bucket, event_type, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id % 50
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY 1, 2
    ) t WHERE rn = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) with a deterministic
    tiebreak — the argmax-of-count idiom. Two-level: count per
    (group, value), then a row_number window on the already-reduced
    counts. The window input is |groups|×|distinct values| rows, not
    the raw data, so the expensive shuffle happens on reduced data —
    the shape that survives 100 TB (never window the raw events)."""
    e = _t(spark, sf_dir, "events")
    counts = (
        e.groupBy(
            (F.col("user_id") % 50).alias("user_bucket"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("user_bucket").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_bucket", F.col("event_type").alias("modal_type"), "cnt")
    )


@query(
    "pack_sequences",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS prior
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR(COALESCE(prior, 0) / 2048) AS BIGINT) AS pack_id
    FROM cum
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: assign documents (in doc_id order)
    to ~2048-token training sequences by exclusive running token
    count — the contiguous-fill packing used when batching a corpus
    into fixed-length LM training rows.

    The running total is NOT a global window (single-partition choke
    point): operators/ranking.global_prefix_sum range-partitions on
    doc_id, prefix-sums within partitions, and adds per-partition
    start offsets (one broadcast row per partition). Both jobs are
    fully parallel — the same plan packs a trillion tokens."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    ps = global_prefix_sum(
        toks, [F.col("doc_id")], "n_tokens", out_col="__prior", exclusive=True
    )
    return ps.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("__prior") / F.lit(2048)).cast("bigint").alias("pack_id"),
    )


@query(
    "q_scd2_intervals",
    oracle="""
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: each event
    opens a validity interval that closes when the key's next event
    arrives; the last interval per key is current. The window is
    PARTITIONED by the key (with a unique tiebreak for a total
    order), so every key's history builds independently — one hash
    shuffle on user_id, fully parallel at any scale, unlike a global
    ordering."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "q_rolling_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), tgt AS (
      SELECT CAST(unnest(generate_series(
               day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS wday,
             user_id
      FROM du
    ), counts AS (
      SELECT wday, COUNT(DISTINCT user_id) AS rolling_7d_users
      FROM tgt GROUP BY wday
    )
    SELECT CAST(c.wday AS TIMESTAMP) AS day, c.rolling_7d_users
    FROM counts c JOIN (SELECT DISTINCT day FROM du) obs ON c.wday = obs.day
    """,
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling distinct users per day — the windowed
    COUNT(DISTINCT) SQL windows can't express.

    Scale shape: instead of a range self-join (quadratic in days) or
    a per-day rescan, each distinct (day, user) pair is EXPLODED to
    the ≤7 window-end days it contributes to, then one hash aggregate
    counts distinct users per window — the contribute-forward trick.
    Cardinality is bounded by 7×|distinct day-user pairs|, the
    distinct runs first (map-side combined), and both shuffles key on
    day/user — no skew, no broadcast of the fact side, no windows."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    tgt = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
        "user_id",
    )
    counts = tgt.groupBy("wday").agg(
        F.count_distinct("user_id").alias("rolling_7d_users")
    )
    obs = du.select("day").distinct()
    return counts.join(
        obs, counts["wday"] == obs["day"], "inner"
    ).select(
        F.col("wday").cast("timestamp").alias("day"), "rolling_7d_users"
    )


# pagerank oracle: with exact=True the operator quantizes each
# contribution to floor(c·1e12 + 0.5) — pure IEEE mult/add/floor,
# identical in every engine (round() is NOT: engines disagree at
# 12th-digit boundaries) — and accumulates exact bigints, so
# unrolling the same 5 iterations in SQL replays the ranks
# bit-for-bit. The teleport term is COMPUTED as (1.0 - 0.85)/n with
# every literal CAST to DOUBLE: DuckDB parses decimal-point literals
# as DECIMAL, so a bare (1.0 - 0.85) is the EXACT 0.15 — a different
# binary double than Python/Spark's 1.0 - 0.85.
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    parts = [
        """
    WITH ed AS MATERIALIZED (
      SELECT DISTINCT 'c' || o_custkey AS s, 's' || l_suppkey AS d
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS MATERIALIZED (
      SELECT s, d FROM ed UNION SELECT d, s FROM ed
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT s AS id FROM (
        SELECT s FROM e UNION ALL SELECT d FROM e)
    ), nn AS (SELECT COUNT(*) AS n FROM nodes
    ), deg AS MATERIALIZED (
      SELECT s, COUNT(*) AS deg FROM e GROUP BY s
    ), r0 AS MATERIALIZED (
      SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
      FROM nodes
    )"""
    ]
    for i in range(1, _PR_ITERS + 1):
        parts.append(f""", f{i} AS MATERIALIZED (
      SELECT e.d AS id2,
             SUM(CAST(FLOOR(r.rank / deg.deg * 1e12 + 0.5) AS BIGINT))
               AS inflow
      FROM e JOIN r{i - 1} r ON e.s = r.id JOIN deg ON deg.s = e.s
      GROUP BY e.d
    ), r{i} AS MATERIALIZED (
      SELECT nodes.id,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                 / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE)
                 * (coalesce(CAST(f.inflow AS DOUBLE), 0.0) / 1e12)
                 AS rank
      FROM nodes LEFT JOIN f{i} f ON nodes.id = f.id2
    )""")
    parts.append(f"""
    SELECT id, rank FROM r{_PR_ITERS} ORDER BY rank DESC, id
    """)
    return "".join(parts)


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer↔supplier transaction
    graph (distinct trading pairs from orders⋈lineitem, undirected):
    which parties sit at the center of the trade network.

    The graph build is two broadcast-friendly equi-joins + a
    distinct; each power iteration is one hash-shuffle of (node,
    contribution) pairs (operators/graph.pagerank) — the same plan
    runs a billion-edge graph, iterations× shuffles, no driver
    state."""
    from dasladen_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
    )
    return pagerank(
        edges, iterations=5, undirected=True, exact=True
    ).orderBy(F.col("rank").desc(), "id")


@query(
    "q_percent_rank_cume",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank, cume_dist) per
    priority class — both are pure integer-ratio definitions
    ((rank-1)/(n-1), rows≤current/n), so the doubles match the oracle
    bit-for-bit. One shuffle on the partition key serves both."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "q_pos_tokens",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS words
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS pos,
           words[i] AS word
    FROM w, UNNEST(generate_series(1, len(words))) AS t(i)
    """,
)
def q_pos_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional tokenization (posexplode / UNNEST WITH ORDINALITY):
    each document row fans out to (doc_id, position, token) rows —
    the layout feeding positional n-gram and alignment work. Narrow
    generator, no shuffle; the doc_id<10 predicate is pushed into the
    parquet scan so the explode only ever sees matching rows."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT n.n_name,
           string_agg(c.c_name, ',' ORDER BY c.c_name) AS members,
           COUNT(*) AS n_members
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 9000
    GROUP BY n.n_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): per-nation
    roster of high-balance customers, comma-joined in name order.
    collect_list is shuffle-partial like any agg; the in-group sort
    happens on the grouped array (bounded by group size), never as a
    global sort — and the explicit array_sort makes the result
    deterministic under any partitioning, which bare collect_list
    ordering is not."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "members"
            ),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    ), t AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT event_type, next_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
    FROM t
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: for each consecutive event pair
    in a user's timeline (lead over the per-user order), the count
    and row-normalized probability of moving state A → state B — the
    Markov-chain edge list behind journey analysis and next-event
    prediction baselines.

    One shuffle on user_id for the sequence window, one on the state
    pair for counts; the normalizing window runs over the tiny
    (states × states) matrix. The probability is a single long→double
    division — exact on any engine."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        e.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("event_type")
    return t.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wn).cast("double")).alias(
            "p"
        ),
    )


@query(
    "q_profile_table",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT c_custkey) AS d_custkey,
           COUNT(DISTINCT c_nationkey) AS d_nationkey,
           COUNT(DISTINCT c_mktsegment) AS d_mktsegment,
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_name,
           CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_mktsegment,
           MIN(c_acctbal) AS min_acctbal,
           MAX(c_acctbal) AS max_acctbal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(38,4))
             AS sum_acctbal,
           MIN(length(c_name)) AS min_name_len,
           MAX(length(c_name)) AS max_name_len
    FROM customer
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile — row count, key cardinalities, null
    counts, numeric ranges, exact decimal sum, string-length bounds —
    the discovery step an ETL tool runs before wiring a pipeline.

    All metrics fold into ONE aggregation pass: Catalyst plans the
    multiple COUNT(DISTINCT)s as a single Expand + two-stage agg, so
    the table is scanned once however many metrics are stacked; the
    decimal-component sum keeps the total exact under any
    partitioning."""
    c = _t(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("d_custkey"),
        F.countDistinct("c_nationkey").alias("d_nationkey"),
        F.countDistinct("c_mktsegment").alias("d_mktsegment"),
        F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0)).alias(
            "null_name"
        ),
        F.sum(F.when(F.col("c_mktsegment").isNull(), 1).otherwise(0)).alias(
            "null_mktsegment"
        ),
        F.min("c_acctbal").alias("min_acctbal"),
        F.max("c_acctbal").alias("max_acctbal"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("sum_acctbal"),
        F.min(F.length("c_name")).alias("min_name_len"),
        F.max(F.length("c_name")).alias("max_name_len"),
    )


@query(
    "q_degree_distribution",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), deg AS (
      SELECT cust, COUNT(*) AS degree FROM edges GROUP BY cust
    )
    SELECT degree, COUNT(*) AS n_customers
    FROM deg GROUP BY degree
    """,
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer→supplier trade graph: how
    many distinct suppliers each customer trades with, rolled up to
    (degree, customer count) — the first diagnostic run on any graph
    (skew here predicts every downstream join hotspot).

    Strictly linear shapes: edge-list distinct, per-node count, tiny
    rollup — deliberately NOT a hub self-join, which is degree² and
    the thing this distribution exists to warn you about."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    deg = edges.groupBy("cust").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q_nullsafe_join",
    oracle="""
    SELECT c.c_custkey, n.n_name,
           COALESCE(CAST(c.k AS VARCHAR), 'NULL') AS join_key
    FROM (SELECT c_custkey, NULLIF(c_nationkey, 3) AS k FROM customer) c
    JOIN (SELECT n_nationkey, n_name, NULLIF(n_nationkey, 3) AS k
          FROM nation) n
      ON c.k IS NOT DISTINCT FROM n.k
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics dimension
    tables with 'unknown' members need. NULLIF fabricates NULL keys
    on both sides (nationkey 3 → NULL); the null-safe equality still
    plans as a broadcast HASH join (Spark rewrites <=> to a
    coalesce-keyed comparison), not a nested loop."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("k")
    )
    n = _t(spark, sf_dir, "nation").select(
        "n_name", F.nullif(F.col("n_nationkey"), F.lit(3)).alias("nk")
    )
    return (
        c.join(F.broadcast(n), c.k.eqNullSafe(n.nk))
        .select(
            "c_custkey",
            "n_name",
            F.coalesce(F.col("k").cast("string"), F.lit("NULL")).alias(
                "join_key"
            ),
        )
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             epoch_ms(ts) AS t0,
             LEAD(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS t1
      FROM events
    )
    SELECT user_id,
           -- decimal->double via VARCHAR: DuckDB's direct cast is not
           -- correctly rounded past 2^53 (Spark's is)
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * (t1 - t0))
                AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE)
             / CAST(SUM(t1 - t0) AS DOUBLE) AS twap_value,
           CAST(SUM(t1 - t0) AS BIGINT) AS total_ms
    FROM seq WHERE t1 IS NOT NULL
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each reading is weighted
    by how long it was current (until the next event), the estimator
    telemetry/finance uses when samples arrive irregularly — a plain
    AVG over-counts burst periods.

    The reading is cast to DECIMAL before the multiply, so the
    weight value*dt and its accumulation are exact integer-decimal
    arithmetic — identical under any partitioning (casting the
    double PRODUCT instead hits engine-dependent rounding-boundary
    cases); one user shuffle serves both the lead
    window and the rollup (same key — Catalyst reuses the exchange)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fixtures are TIMESTAMP_NTZ; session tz is UTC, so the LTZ cast
    # reads the same instant DuckDB's epoch_ms sees
    t0 = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    seq = e.select(
        "user_id",
        "value",
        t0.alias("t0"),
        F.lead(t0).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    dt = F.col("t1") - F.col("t0")
    return seq.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)") * dt)
            .cast("decimal(38,2)")
            .cast("double")
            / F.sum(dt).cast("double")
        ).alias("twap_value"),
        F.sum(dt).alias("total_ms"),
    )


@query(
    "q_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
    )
    SELECT CAST(d AS TIMESTAMP) AS day, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY d ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_users
    FROM per_day
    """,
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time — the audience-growth
    curve. The scale trick: 'distinct users up to day X' NEVER runs a
    windowed COUNT DISTINCT (quadratic state); each user collapses to
    their first-seen day (one user shuffle), days roll up to
    new-user counts (one tiny shuffle), and the running total windows
    over the days-sized table — whitelisted single-partition, bounded
    by calendar length, not data volume."""
    e = _t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    from dasladen_spark.functions.vectors import bounded_window_key

    # one row per calendar day — bounded; explicit single partition
    w = (
        Window.partitionBy(bounded_window_key(F.year("d")))
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_day.select(
        F.col("d").cast("timestamp").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "q_copurchase_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_baskets
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_baskets DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs appearing in the
    same order. The self-join key is the ORDER (fanout bounded by
    basket size, ~7 lines — per-order pair expansion is a constant,
    so total work is linear in orders, unlike a part-keyed hub join);
    one equi-join shuffle, one pair-count shuffle, TakeOrdered
    top-k."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = l.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = l.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, on=[a.ok == b.ok, F.col("part_a") < F.col("part_b")])
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .orderBy(F.col("n_baskets").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING
             ) AS cumw,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_returnflag
             ) AS total
      FROM lineitem
    )
    SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median
    FROM w WHERE 2 * cumw >= total
    GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    order statistic (each line counts by its quantity, so a bulk line
    moves the median more than a single unit). Definitionally exact:
    the smallest price whose running weight reaches half the total,
    with the comparison as 2*cumw >= total in integer-decimal
    arithmetic — no division, no float quantile interpolation to
    disagree across engines. One shuffle on the flag serves both the
    running and total windows."""
    l = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    wrun = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    w = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(qty).over(wrun).alias("cumw"),
        F.sum(qty).over(wall).alias("total"),
    )
    return (
        w.filter(F.lit(2) * F.col("cumw") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median"))
    )


@query(
    "q_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT digit, COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
    FROM d GROUP BY digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals — the
    Benford's-law screen fraud audits run over financial columns.
    Explicit floor() before the integer cast: Spark truncates
    double→bigint while other engines round, so the floor pins the
    semantics. One tiny shuffle on the 9-digit key; the share
    normalizer windows over 9 rows (whitelisted)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "digit",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy()).cast("double")
        ).alias("share"),
    )


@query(
    "q_not_in_null_trap",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer
        WHERE c_nationkey NOT IN
          (SELECT n_nationkey FROM nation WHERE n_nationkey < 5))
        AS excl_clean,
      (SELECT COUNT(*) FROM customer
        WHERE c_nationkey NOT IN
          (SELECT NULLIF(n_nationkey, 3) FROM nation
            WHERE n_nationkey < 5))
        AS excl_with_null,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS
          (SELECT 1 FROM nation n
            WHERE NULLIF(n.n_nationkey, 3) = c.c_nationkey
              AND n.n_nationkey < 5))
        AS not_exists_with_null
    """,
)
def q_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, demonstrated side by side: with a clean
    exclusion list NOT IN behaves like an anti join; one NULL in the
    list makes every NOT IN test UNKNOWN (zero rows survive), while
    NOT EXISTS keeps anti-join semantics — three-valued logic every
    SQL engine must honor and most pipelines trip over once.

    Spark plans the NOT IN branch as a null-aware anti join
    (BroadcastHashJoin ... NAAJ); whitelisted 1-row scalar
    aggregates."""
    for t in ("customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"__nit_{t}")
    return spark.sql("""
        SELECT
          (SELECT COUNT(*) FROM __nit_customer
            WHERE c_nationkey NOT IN
              (SELECT n_nationkey FROM __nit_nation WHERE n_nationkey < 5))
            AS excl_clean,
          (SELECT COUNT(*) FROM __nit_customer
            WHERE c_nationkey NOT IN
              (SELECT NULLIF(n_nationkey, 3) FROM __nit_nation
                WHERE n_nationkey < 5))
            AS excl_with_null,
          (SELECT COUNT(*) FROM __nit_customer c
            WHERE NOT EXISTS
              (SELECT 1 FROM __nit_nation n
                WHERE NULLIF(n.n_nationkey, 3) = c.c_nationkey
                  AND n.n_nationkey < 5))
            AS not_exists_with_null
    """)


@query(
    "q_merge_intervals",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_ms(ts) AS s,
             epoch_ms(ts) + CAST(floor(value * 1000) AS BIGINT) AS e
      FROM events WHERE value IS NOT NULL
    ), ord AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ), grp AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                 THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS g
      FROM ord
    ), merged AS (
      SELECT user_id, g, MIN(s) AS ms, MAX(e) AS me
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id, COUNT(*) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_ms
    FROM merged GROUP BY user_id
    """,
)
def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user: each event opens a [ts, ts+value·1s)
    activity window; overlapping windows merge, yielding interval
    count and total covered time — the coverage/utilization
    computation behind billing and uptime.

    The merge is the stack-free SQL formulation: an interval starts a
    new group iff its start exceeds the running MAX(end) of
    everything before it (cumulative-max window), group ids come from
    a running sum of those flags — one user-key shuffle serves every
    window and the rollups; all arithmetic is integer epoch-ms, so
    the result is bit-exact on any engine."""
    from dasladen_spark.operators.intervals import merge_intervals

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    iv = e.select(
        "user_id",
        ms.alias("s"),
        (ms + F.floor(F.col("value") * 1000).cast("bigint")).alias("e"),
    )
    merged = merge_intervals(iv, "user_id", "s", "e")
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("e") - F.col("s")).alias("covered_ms"),
    )


@query(
    "q_max_drawdown",
    oracle="""
    WITH w AS (
      SELECT user_id, value,
             MAX(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS peak
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, MAX(peak - value) AS max_drawdown
    FROM w GROUP BY user_id
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user — the path statistic (largest drop
    from a running peak) risk dashboards compute over any metric
    series. Running MAX is selection (no accumulation error), the
    drop is one exact-rounded double subtraction, so the result is
    engine-exact; one user-key shuffle serves the window and the
    rollup."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.select(
            "user_id",
            (F.max("value").over(w) - F.col("value")).alias("dd"),
        )
        .groupBy("user_id")
        .agg(F.max("dd").alias("max_drawdown"))
    )


@query(
    "q_longest_streak",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), r AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
      FROM d
    ), runs AS (
      SELECT user_id, island, COUNT(*) AS len
      FROM r GROUP BY user_id, island
    )
    SELECT user_id, MAX(len) AS longest_streak_days
    FROM runs GROUP BY user_id
    """,
)
def q_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user — the
    gaps-and-islands identity: consecutive dates minus their
    row_number collapse to one constant 'island' date, so streaks
    fall out of a GROUP BY with zero self-joins. Distinct +
    row_number + two rollups, all on the user key — one shuffle
    serves the chain; integer date arithmetic, engine-exact."""
    e = _t(spark, sf_dir, "events")
    d = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island"),
    )
    runs = r.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak_days")
    )


@query(
    "q_yoy_revenue",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DECIMAL(38,4)) AS rev
      FROM orders GROUP BY 1
    )
    SELECT CAST(mon AS TIMESTAMP) AS month, rev,
           -- DOUBLE, not DECIMAL: NULL decimals round-trip as
           -- Decimal('NaN') through some client layers
           CAST(CAST(LAG(rev, 12) OVER (ORDER BY mon) AS VARCHAR)
                AS DOUBLE) AS rev_prev_year,
           CASE WHEN LAG(rev, 12) OVER (ORDER BY mon) IS NOT NULL THEN
             CAST(CAST(rev AS VARCHAR) AS DOUBLE)
               / CAST(CAST(LAG(rev, 12) OVER (ORDER BY mon) AS VARCHAR)
                      AS DOUBLE) - 1.0
           END AS yoy_growth
    FROM m
    """,
)
def q_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth: month rollup with exact
    decimal sums, then LAG(12) on the month spine — the BI staple.
    The heavy aggregation shuffles on month across the cluster; only
    the months-sized spine (calendar-bounded) passes through the
    whitelisted ordering window. Growth is one exact division on
    correctly-rounded doubles."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("rev")
    )
    from dasladen_spark.functions.vectors import bounded_window_key

    # one row per calendar month — bounded; explicit single partition
    w = Window.partitionBy(bounded_window_key(F.year("mon"))).orderBy("mon")
    prev = F.lag("rev", 12).over(w)
    return m.select(
        F.col("mon").cast("timestamp").alias("month"),
        "rev",
        prev.cast("double").alias("rev_prev_year"),
        F.when(
            prev.isNotNull(),
            F.col("rev").cast("double") / prev.cast("double") - 1.0,
        ).alias("yoy_growth"),
    )


@query(
    "q_new_vs_returning",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(a.day AS TIMESTAMP) AS day,
           CAST(SUM(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END)
             AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN a.day > f.first_day THEN 1 ELSE 0 END)
             AS BIGINT) AS returning_users
    FROM a JOIN f USING (user_id)
    GROUP BY a.day
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the acquisition/retention
    overview chart. Every stage keys on user_id (first-seen agg,
    active-day distinct, the join), so one shuffle co-locates the
    whole chain before the final small day rollup."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    a = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).alias("returning_users"),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "new_users",
            "returning_users",
        )
    )


@query(
    "q_union_by_name",
    oracle="""
    WITH u AS (
      SELECT 'customer' AS src, c_custkey AS id, c_name AS name
      FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS src, s_suppkey AS id, s_name AS name,
             s_acctbal AS balance
      FROM supplier
    )
    SELECT src, COUNT(*) AS n,
           CAST(SUM(CASE WHEN balance IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS missing_balance,
           COUNT(DISTINCT id) AS distinct_ids
    FROM u GROUP BY src
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: two sources with different column sets
    merge BY NAME (missing columns become NULL) — how a pipeline
    absorbs heterogeneous feeds without hand-aligning positions.
    unionByName(allowMissingColumns=True) is the Spark form of
    UNION ALL BY NAME; a positional UNION would silently misalign.
    Narrow union (no shuffle), one rollup on the source tag."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("balance"),
    )
    u = c.unionByName(s, allowMissingColumns=True)
    return u.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("balance").isNull(), 1).otherwise(0)).alias(
            "missing_balance"
        ),
        F.countDistinct("id").alias("distinct_ids"),
    )


@query(
    "q_skew_diagnostics",
    oracle="""
    WITH k AS (
      SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys FROM k
    )
    SELECT k.key, k.n,
           CAST(k.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           CAST(k.n AS DOUBLE) * CAST(t.n_keys AS DOUBLE)
             / CAST(t.total AS DOUBLE) AS skew_factor
    FROM k, t
    ORDER BY k.n DESC, k.key LIMIT 20
    """,
)
def q_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: the 20 heaviest keys with their share of
    all rows and a skew factor (observed count ÷ uniform expectation)
    — the diagnostic that decides salting, AQE skew-join thresholds,
    and broadcast choices BEFORE a hot key melts a shuffle. One key
    rollup + TakeOrdered; the two totals are driver-side scalars
    folded in as literals."""
    l = _t(spark, sf_dir, "lineitem")
    k = l.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total, n_keys = k.agg(
        F.sum("n").cast("bigint"), F.count(F.lit(1))
    ).collect()[0]
    return (
        k.select(
            "key",
            "n",
            (F.col("n").cast("double") / F.lit(float(total))).alias("share"),
            (
                F.col("n").cast("double")
                * F.lit(float(n_keys))
                / F.lit(float(total))
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(20)
    )


@query(
    "q_purchase_intervals",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase'
    ), d AS (
      SELECT user_id,
             epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS delta_ms
      FROM p
    )
    SELECT COUNT(*) AS n_intervals,
           MIN(delta_ms) AS min_ms,
           quantile_cont(delta_ms, 0.5) AS median_ms,
           quantile_cont(delta_ms, 0.9) AS p90_ms,
           MAX(delta_ms) AS max_ms
    FROM d WHERE delta_ms IS NOT NULL
    """,
)
def q_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time distribution: per-user gaps between
    consecutive purchases (lag window), summarized to exact
    percentiles — the repeat-behavior metric behind churn models.
    Integer epoch-ms deltas, exact sort-based percentile (Spark
    `percentile` ≡ quantile_cont); one user shuffle for the lag, one
    whitelisted scalar rollup."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.select((ms - F.lag(ms).over(w)).alias("delta_ms")).filter(
        F.col("delta_ms").isNotNull()
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.min("delta_ms").alias("min_ms"),
        F.expr("percentile(delta_ms, 0.5)").alias("median_ms"),
        F.expr("percentile(delta_ms, 0.9)").alias("p90_ms"),
        F.max("delta_ms").alias("max_ms"),
    )


@query(
    "q_rfm_segments",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
    rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_d,
             COUNT(*) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DECIMAL(38,4)) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT CASE
             WHEN date_diff('day', rfm.last_d, mx.max_d) <= 90
                  AND rfm.freq >= 10 THEN 'champion'
             WHEN date_diff('day', rfm.last_d, mx.max_d) <= 90
                  THEN 'recent'
             WHEN rfm.freq >= 10 THEN 'loyal_lapsing'
             ELSE 'hibernating'
           END AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary) AS DECIMAL(38,4)) AS segment_revenue
    FROM rfm, mx
    GROUP BY 1
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary per customer,
    bucketed by fixed business thresholds into the retention
    playbook's segments with exact decimal revenue per segment.
    Threshold buckets (not NTILE) keep the plan a plain two-level
    rollup — no global-order window anywhere; the corpus max date is
    a driver scalar."""
    o = _t(spark, sf_dir, "orders")
    max_d = o.agg(F.max("o_orderdate")).collect()[0][0]
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_d"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("monetary"),
    )
    recency = F.datediff(F.lit(max_d), F.col("last_d"))
    seg = (
        F.when((recency <= 90) & (F.col("freq") >= 10), "champion")
        .when(recency <= 90, "recent")
        .when(F.col("freq") >= 10, "loyal_lapsing")
        .otherwise("hibernating")
    )
    return (
        rfm.groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("decimal(38,4)").alias("segment_revenue"),
        )
    )


@query(
    "q_hhi_concentration",
    oracle="""
    WITH r AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT nation, COUNT(*) AS n_suppliers,
           CAST(CAST(SUM(rev * rev) AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE)
                * CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE)) AS hhi
    FROM r GROUP BY nation
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market concentration per nation: the sum
    of squared supplier revenue shares, the antitrust/risk metric for
    'is this market one hot key'. Algebraic identity Σ(rᵢ/T)² =
    Σrᵢ²/T² keeps EVERY accumulation in exact decimal (squares of
    decimal revenues, no double sums anywhere); the only floating
    step is one final division of two correctly-rounded doubles.
    Broadcast supplier dim join, two rollups — no skew exposure."""
    l = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    r = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev")
        )
    )
    rev = F.col("rev").cast("decimal(18,4)")
    return r.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        (
            F.sum(rev * rev).cast("double")
            / (
                F.sum(rev).cast("double")
                * F.sum(rev).cast("double")
            )
        ).alias("hhi"),
    )


@query(
    "q_gini_spend",
    oracle="""
    WITH s AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DECIMAL(38,4)) AS spend
      FROM orders GROUP BY o_custkey
    ), r AS (
      SELECT spend, ROW_NUMBER() OVER (ORDER BY spend) AS i FROM s
    )
    SELECT COUNT(*) AS n,
           2.0 * CAST(CAST(SUM(i * spend) AS VARCHAR) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE)
                * CAST(CAST(SUM(spend) AS VARCHAR) AS DOUBLE))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0)
               / CAST(COUNT(*) AS DOUBLE) AS gini
    FROM r
    """,
)
def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality metric in
    its rank formulation G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over
    ascending-sorted spend. The global rank comes from
    operators/ranking.global_row_number (range partition + broadcast
    offsets — never a single-partition window over all customers);
    ties need no tiebreak because Σ i·x within a tie group is
    invariant to rank assignment. Both Σ accumulate in exact decimal;
    the finish is a fixed dag of correctly-rounded double ops."""
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("spend")
    )
    r = global_row_number(s, [F.col("spend")], out_col="i")
    agg = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * F.col("spend")).alias("si"),
        F.sum("spend").alias("st"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "n",
        (
            F.lit(2.0) * F.col("si").cast("double")
            / (n * F.col("st").cast("double"))
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


@query(
    "q_cohort_ltv",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             date_trunc('month', MIN(o_orderdate)) AS cohort
      FROM orders GROUP BY 1
    ), r AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
           date_diff('month', f.cohort, r.mon) AS month_offset,
           COUNT(*) AS active_customers,
           CAST(SUM(r.rev) AS DECIMAL(38,4)) AS revenue
    FROM r JOIN f USING (o_custkey)
    GROUP BY f.cohort, month_offset
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by acquisition
    month, revenue tracked by month offset since acquisition — the
    LTV curve every subscription/commerce dashboard draws. Both
    inputs key on customer (first-order agg, monthly revenue agg,
    the join), so one customer shuffle co-locates the chain before
    the small cohort×offset rollup; revenue stays exact decimal
    end-to-end."""
    o = _t(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    r = o.groupBy(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("mon")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    return (
        r.join(f, "o_custkey")
        .groupBy(
            F.col("cohort").cast("timestamp").alias("cohort"),
            F.months_between(F.col("mon"), F.col("cohort"))
            .cast("int")
            .alias("month_offset"),
        )
        .agg(
            F.count(F.lit(1)).alias("active_customers"),
            F.sum("rev").cast("decimal(38,4)").alias("revenue"),
        )
    )


@query(
    "q_abc_classification",
    oracle="""
    WITH r AS (
      SELECT l_partkey AS part,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
      FROM lineitem GROUP BY 1
    ), c AS (
      SELECT part, rev,
             SUM(rev) OVER (ORDER BY rev DESC, part
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS total
      FROM r
    )
    SELECT CASE WHEN 5 * cum <= 4 * total THEN 'A'
                WHEN 20 * cum <= 19 * total THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(rev) AS DECIMAL(38,4)) AS class_revenue
    FROM c GROUP BY 1
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B to 95%, C the
    tail. The running total comes from operators/ranking.
    global_prefix_sum (range shuffle + broadcast offsets — the
    distributed form of SUM OVER (ORDER BY), never a single-partition
    window); the share thresholds compare as integer-decimal
    cross-products (5·cum ≤ 4·total), so classification is exact —
    no float share ever computed."""
    l = _t(spark, sf_dir, "lineitem")
    r = l.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("rev")
    )
    ranked = global_prefix_sum(
        r, [F.col("rev").desc(), F.col("part")], "rev", out_col="cum"
    )
    total = r.agg(F.sum("rev")).collect()[0][0]
    total_lit = F.expr(f"CAST('{total}' AS DECIMAL(38,4))")
    cls = (
        F.when(F.lit(5) * F.col("cum") <= F.lit(4) * total_lit, "A")
        .when(F.lit(20) * F.col("cum") <= F.lit(19) * total_lit, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").cast("decimal(38,4)").alias("class_revenue"),
    )


@query(
    "q_conversion_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), p AS (
      SELECT user_id, MIN(ts) AS first_purchase FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ), d AS (
      SELECT epoch_ms(first_purchase) - epoch_ms(first_view) AS lat_ms
      FROM v JOIN p USING (user_id)
      WHERE first_purchase >= first_view
    )
    SELECT COUNT(*) AS n_converted,
           MIN(lat_ms) AS min_ms,
           quantile_cont(lat_ms, 0.5) AS median_ms,
           quantile_cont(lat_ms, 0.9) AS p90_ms
    FROM d
    """,
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: first view → first purchase per user,
    summarized to exact percentiles — the time-to-convert metric
    behind funnel optimization. Both MIN aggregates and the join key
    on user_id, so one shuffle co-locates the chain; integer epoch-ms
    deltas, exact sort-based percentile, whitelisted 1-row summary."""
    e = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ms).alias("first_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(ms).alias("first_purchase"))
    )
    d = (
        v.join(p, "user_id")
        .filter(F.col("first_purchase") >= F.col("first_view"))
        .select((F.col("first_purchase") - F.col("first_view")).alias("lat_ms"))
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lat_ms").alias("min_ms"),
        F.expr("percentile(lat_ms, 0.5)").alias("median_ms"),
        F.expr("percentile(lat_ms, 0.9)").alias("p90_ms"),
    )


@query(
    "q_json_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_sum,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS missing_k
    FROM events GROUP BY event_type
    """,
)
def q_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semistructured rollup: aggregate a numeric field extracted
    from raw JSON strings, with missing-key accounting — the shape of
    analytics over an un-modeled properties column. The extraction
    runs inside the scan projection (codegen), so at 100 TB this is
    one pass + one event-type shuffle; no JSON parse ever leaves the
    executor."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("missing_k"),
    )


@query(
    "q_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS rolling_median
    FROM events WHERE value IS NOT NULL
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 5 readings per user — the
    robust smoother dashboards use where a moving AVERAGE chases
    outliers. An order statistic over a sliding ROWS frame: exact
    sort-based percentile per frame (Spark `percentile` ≡
    quantile_cont, linear interpolation on the same rank formula),
    one user-key shuffle."""
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.expr("percentile(value, 0.5)").over(w).alias("rolling_median"),
    )
