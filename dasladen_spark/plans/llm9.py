"""LLM-data-pipeline queries, part 9: distribution-drift testing
(two-sample KS), cross-source near-dup contamination, and winnowing
cluster censuses.

Beyond-reference operators (the reference delegates all query power
to an RDBMS, /root/reference/dasladen/task.py:94-107). Determinism
discipline as in llm3+: exact integer/decimal arithmetic everywhere a
comparison or maximum is taken, one rounded double expression per
output column (the ROUND(decimal(38,12), 6) recipe for divisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.plans.llm import _Q_SQL
from dasladen_spark.plans.llm8 import _WINNOW_CTE, _WIN_MIN_SHARED
from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# ------------------------------------------------ two-sample KS drift


@query(
    "quality_ks_drift",
    oracle=f"""
    WITH q AS ({_Q_SQL}),
    s AS (
      SELECT q.quality,
             CAST(CAST(substr(d.source, 4) AS INT) < 10 AS INT) AS is_ref
      FROM q JOIN documents d ON d.doc_id = q.doc_id
    ), tot AS (
      SELECT CAST(SUM(is_ref) AS DECIMAL(19,0)) AS n_a,
             CAST(SUM(1 - is_ref) AS DECIMAL(19,0)) AS n_b
      FROM s
    ), g AS (
      SELECT quality,
             CAST(SUM(is_ref) AS DECIMAL(19,0)) AS a_cnt,
             CAST(SUM(1 - is_ref) AS DECIMAL(19,0)) AS b_cnt
      FROM s GROUP BY quality
    ), c AS (
      SELECT quality,
             SUM(a_cnt) OVER (ORDER BY quality
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(b_cnt) OVER (ORDER BY quality
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      FROM g
    ), gap AS (
      SELECT c.quality,
             abs(CAST(c.cum_a AS DECIMAL(38,0)) * t.n_b
                 - CAST(c.cum_b AS DECIMAL(38,0)) * t.n_a) AS num,
             CAST(t.n_a AS DECIMAL(38,0)) * t.n_b AS den,
             t.n_a, t.n_b
      FROM c, tot t
    )
    SELECT CAST(n_a AS BIGINT) AS n_ref,
           CAST(n_b AS BIGINT) AS n_new,
           ROUND(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                 AS DECIMAL(38,12)), 6) AS ks_stat,
           quality AS ks_at
    FROM gap
    ORDER BY num DESC, quality ASC
    LIMIT 1
    """,
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    quality-score distributions of the reference source cohort
    (src0–src9) and the candidate cohort (src10–src19) — the
    distribution-level drift test a curation pipeline runs before
    admitting a new crawl batch: PSI (q_population_stability) bins
    first and can hide within-bin shifts; KS is the sup-norm over the
    FULL empirical CDFs, sensitive to any shift anywhere. One row:
    cohort sizes, the KS statistic, and the score at which the CDF
    gap peaks (ties broken toward the smallest score).

    Scale shape: scoring is one JVM projection; the ECDF sweep runs
    over the DISTINCT rounded scores (≤ 10⁴ rows by construction —
    quality is rounded to 4 decimals), so the global-order window is
    calendar-bounded-style tiny, never corpus-sized. The CDF gap is
    compared as an exact integer cross-product (cum_a·n_b −
    cum_b·n_a in DECIMAL(38,0)) — the max and tie-break never touch
    a double; one ROUND(DECIMAL(38,12), 6) division at the end."""
    from dasladen_spark.functions.text import quality_score
    from dasladen_spark.functions.vectors import bounded_window_key

    d = _t(spark, sf_dir, "documents")
    s = d.select(
        quality_score(F.col("text")).alias("quality"),
        (F.expr("cast(substr(source, 4) as int)") < 10)
        .cast("int")
        .alias("is_ref"),
    )
    tot = s.agg(
        F.sum("is_ref").cast("decimal(19,0)").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_ref")).cast("decimal(19,0)").alias("n_b"),
    )
    g = s.groupBy("quality").agg(
        F.sum("is_ref").cast("decimal(19,0)").alias("a_cnt"),
        F.sum(F.lit(1) - F.col("is_ref")).cast("decimal(19,0)").alias("b_cnt"),
    )
    w = (
        Window.partitionBy(bounded_window_key(F.col("quality")))
        .orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.select(
        "quality",
        F.sum("a_cnt").over(w).alias("cum_a"),
        F.sum("b_cnt").over(w).alias("cum_b"),
    )
    gap = c.crossJoin(F.broadcast(tot)).select(
        "quality",
        F.abs(
            F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
            - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
        ).alias("num"),
        (F.col("n_a").cast("decimal(38,0)") * F.col("n_b")).alias("den"),
        "n_a",
        "n_b",
    )
    return (
        gap.orderBy(F.col("num").desc(), F.col("quality").asc())
        .limit(1)
        .select(
            F.col("n_a").cast("bigint").alias("n_ref"),
            F.col("n_b").cast("bigint").alias("n_new"),
            F.round(
                (F.col("num").cast("double") / F.col("den").cast("double"))
                .cast("decimal(38,12)"),
                6,
            ).alias("ks_stat"),
            F.col("quality").alias("ks_at"),
        )
    )


# ------------------------------------- cross-source near-dup census


@query(
    "dedup_near_rate_by_source",
    oracle=_WINNOW_CTE + f"""
    SELECT LEAST(da.source, db.source) AS src_lo,
           GREATEST(da.source, db.source) AS src_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(p.shared_fps) AS BIGINT) AS total_shared_fps
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    WHERE p.shared_fps >= {_WIN_MIN_SHARED}
    GROUP BY 1, 2
    ORDER BY n_pairs DESC, src_lo, src_hi
    LIMIT 20
    """,
)
def dedup_near_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplication census: winnowed-fingerprint
    pairs rolled up by unordered source pair — the contamination map
    that says WHICH feeds are mirroring each other (same-source mass
    on the diagonal = internal boilerplate; off-diagonal mass = one
    crawl re-serving another's content, the case where per-source
    dedup quietly admits cross-source copies).

    Scale shape: inherits winnowing_pairs' bounded plan (staged
    fingerprint projection, hub-capped fp join, persisted exploded
    frame); the source tags join on doc id and the rollup is
    |sources|²-bounded."""
    from dasladen_spark.operators.dedup import winnowing_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    pairs = winnowing_pairs(docs.select("doc_id", "text"))
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("source_a", "source_b").alias("src_lo"),
            F.greatest("source_a", "source_b").alias("src_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("shared_fps").cast("bigint").alias("total_shared_fps"),
        )
        .orderBy(F.col("n_pairs").desc(), "src_lo", "src_hi")
        .limit(20)
    )


# --------------------------------------- winnowing cluster census


@query(
    "dedup_winnowing_clusters",
    # the closure member needs WITH RECURSIVE up front (legal for the
    # non-recursive members too)
    oracle=_WINNOW_CTE.replace("WITH f AS", "WITH RECURSIVE f AS", 1) + f"""
    , pe AS (
      SELECT doc_a, doc_b FROM pairs
      WHERE shared_fps >= {_WIN_MIN_SHARED}
    ), und AS (
      SELECT doc_a AS a, doc_b AS b FROM pe
      UNION SELECT doc_b AS a, doc_a AS b FROM pe
    ), nodes AS (
      SELECT DISTINCT a AS id FROM und
    ), r(node, root) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT u.b, r.root FROM r JOIN und u ON u.a = r.node
    ), lab AS (
      SELECT node, MIN(root) AS component FROM r GROUP BY node
    ), cs AS (
      SELECT component, COUNT(*) AS cluster_size FROM lab GROUP BY component
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM cs
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
)
def dedup_winnowing_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup CLUSTER census: pair edges closed
    transitively (a shared-run chain a~b~c is ONE duplication event
    even when a and c share nothing directly), then a histogram of
    cluster sizes — the number that turns "N pairs" into "how many
    documents would near-dup removal actually drop" (Σ (size−1) per
    cluster). The DuckDB oracle recomputes the closure with a
    recursive CTE, so the cluster structure itself is cross-engine
    verified, not just pair counts.

    Scale shape: winnowing pairs span arbitrary docs (no blocking
    key), so closure uses iterative min-label propagation
    (operators/graph connected_components — near-dup graphs are
    shallow; seeded min-neighbor labels + lazy checkpoints keep it to
    ~1 job per round); the census is a two-level rollup of the
    node-sized label frame."""
    from dasladen_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    from dasladen_spark.operators.dedup import winnowing_pairs

    pairs = winnowing_pairs(docs)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    cs = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        cs.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            "n_docs",
        )
        .orderBy("cluster_size")
    )


# ------------------------------------- DSIR importance weighting


@query(
    "corpus_dsir_weights",
    oracle="""
    WITH tk AS (
      -- portable_sample_filter's predicate: 0.125 × 16^8 = 0x20000000
      SELECT doc_id,
             substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 8)
               < '20000000' AS is_target,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), ex AS (
      SELECT doc_id, is_target, unnest(toks) AS tok FROM tk
    ), occ AS (
      SELECT doc_id, is_target, tok, COUNT(*) AS n
      FROM ex GROUP BY 1, 2, 3
    ), model AS (
      SELECT tok,
             SUM(CASE WHEN is_target THEN n ELSE 0 END) AS ct,
             SUM(CASE WHEN is_target THEN 0 ELSE n END) AS cr
      FROM occ GROUP BY tok
    ), tot AS (
      SELECT SUM(ct) AS big_t, SUM(cr) AS big_r, COUNT(*) AS v
      FROM model
    ), lam AS (
      SELECT m.tok,
             ROUND(ln((m.ct + 1) / CAST(t.big_t + t.v AS DOUBLE))
                   - ln((m.cr + 1) / CAST(t.big_r + t.v AS DOUBLE)),
                   12) AS lam
      FROM model m, tot t
    ), w AS (
      SELECT o.doc_id,
             CAST(SUM(o.n) AS BIGINT) AS n_tokens,
             SUM(CAST(o.n * l.lam AS DECIMAL(38,18))) AS wsum
      FROM occ o JOIN lam l ON l.tok = o.tok
      WHERE NOT o.is_target
      GROUP BY o.doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(CAST(CAST(wsum AS VARCHAR) AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 6) AS weight_per_token
    FROM w
    ORDER BY weight_per_token DESC, doc_id
    LIMIT 100
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every RAW-pool document by
    how much more likely its tokens are under the TARGET sample's
    unigram model than under the raw pool's — the log-likelihood
    ratio Σ n_w·(ln p̂_t(w) − ln p̂_r(w)), add-one smoothed, reported
    per token so long docs don't win by length. The head of this
    ranking is what importance RESAMPLING would draw first: the raw
    docs that look most like the curated target. Target membership is
    the portable md5 split (~12.5%), so the slice is identical in
    both engines and uncorrelated with the fixture's source column.

    Scale shape: ONE corpus tokenization feeds everything — the
    (doc, token) occurrence rollup is the only corpus-sized shuffle,
    the unigram model folds FROM it (token-keyed, map-side
    combinable), totals are a 1-row broadcast, and scoring joins the
    occurrence rows against the vocabulary-sized λ table
    shuffle-side (a corpus-scale vocabulary never broadcasts — the
    text_lm_perplexity discipline). λ rounds to 12 decimals before
    DECIMAL(38,18) accumulation; one rounded division at the end."""
    from dasladen_spark.operators.sampling import (
        dsir_weights,
        portable_sample_filter,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        portable_sample_filter(F.col("doc_id"), 0.125, salt="dsir").alias(
            "is_target"
        ),
    )
    return (
        dsir_weights(d, "is_target")
        .orderBy(F.col("weight_per_token").desc(), "doc_id")
        .limit(100)
    )
