"""Training-data pipeline queries, part 3: corpus-shape diagnostics
and quality-aware dedup.

North-star extensions absent from the reference (its query power is
delegated SQL, /root/reference/dasladen/task.py:94-107). Scale notes
per query; the shared determinism discipline: every cross-engine
double is either a single deterministic expression per row, or an
exact DECIMAL accumulation of per-row doubles (order-independent
under any partitioning), with one ROUND at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.functions.text import (
    normalize_text,
    quality_score,
    token_count,
)
from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

#: DuckDB spelling of functions/text.quality_score (kept in lockstep;
#: the pair is oracle-proven by the `text_quality` query)
_QUALITY_SQL = r"""
    ROUND(
      0.5 * (len(regexp_extract_all({t}, '[A-Za-z]'))
             / greatest(length({t}), 1))
    + 0.25 * greatest(0.0,
        1.0 - (len(regexp_extract_all({t}, '[A-Za-z]'))
                 / greatest(len(regexp_extract_all({t}, '\S+')), 1) - 5.0)
             * (len(regexp_extract_all({t}, '[A-Za-z]'))
                 / greatest(len(regexp_extract_all({t}, '\S+')), 1) - 5.0)
             / 25.0)
    + 0.25 * (len(list_distinct(regexp_extract_all({t}, '\S+')))
              / greatest(len(regexp_extract_all({t}, '\S+')), 1)),
    4)
"""

#: DuckDB spelling of functions/text.normalize_text → md5 fingerprint
_FP_SQL = (
    r"md5(trim(regexp_replace(regexp_replace(lower({t}),"
    r" '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')))"
)


@query(
    "token_length_histogram",
    oracle=r"""
    SELECT source,
           CAST(floor(log2(greatest(
             len(regexp_extract_all(text, '\S+')), 1))) AS INTEGER)
             AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
             AS total_tokens
    FROM documents
    GROUP BY source, bucket
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram per source in power-of-2 token
    buckets (bucket k = [2^k, 2^(k+1)) tokens) — the length-mix
    report that drives packing efficiency and truncation-loss
    estimates for a training run.

    Pure map + one (source, bucket) rollup: tokenization stays in the
    scan projection (codegen), the shuffle carries only the tiny
    histogram key space. log2 on exact power-of-2 integers is IEEE-
    exact, so bucket boundaries are engine-identical."""
    d = _t(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text"))
    bucket = F.floor(F.log2(F.greatest(n_tok, F.lit(1)))).cast("int")
    return d.select(
        "source", bucket.alias("bucket"), n_tok.alias("n_tok")
    ).groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )


_ZIPF_K = 500


@query(
    "text_zipf_slope",
    oracle=rf"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
      ORDER BY n DESC, tok LIMIT {_ZIPF_K}
    ), ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank
      FROM vocab
    ), pts AS (
      SELECT round(ln(CAST(rank AS DOUBLE)), 12) AS x,
             round(ln(CAST(n AS DOUBLE)), 12) AS y
      FROM ranked
    ), sums AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(x AS DECIMAL(38,18))) AS sx,
             SUM(CAST(y AS DECIMAL(38,18))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,18))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,18))) AS sxx
      FROM pts
    )
    SELECT k AS n_points,
           ROUND(
             (k * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
             / (k * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(sx AS VARCHAR) AS DOUBLE)),
           6) AS zipf_slope
    FROM sums
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) over the
    top-500 vocabulary — the one-number corpus-health check (natural
    text ≈ −1; scraped boilerplate or synthetic spam bends it).

    Scale shape: one token shuffle builds counts (map-side combined
    Zipf head), TakeOrdered bounds the vocab at 500 rows, so the rank
    window and the OLS fold run on a constant-size frame (whitelisted
    single-partition — bounded by K, not corpus size). Determinism:
    per-point logs round to 12 decimals (absorbs any 1-ulp libm
    difference), the OLS sums accumulate in DECIMAL (order-free), one
    final double division, ROUND 6."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(_ZIPF_K)
    )
    from dasladen_spark.functions.vectors import bounded_window_key

    # the window input is the ≤ _ZIPF_K-row vocab head — explicit
    # single partition by construction
    w = Window.partitionBy(bounded_window_key(F.col("n"))).orderBy(
        F.col("n").desc(), "tok"
    )
    pts = vocab.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 12).alias("x"),
        F.round(F.log(F.col("n").cast("double")), 12).alias("y"),
    )
    dec = "decimal(38,18)"
    sums = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
    )
    k = F.col("k").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    return sums.select(
        F.col("k").alias("n_points"),
        F.round(
            (k * sxy - sx * sy) / (k * sxx - sx * sx), 6
        ).alias("zipf_slope"),
    )


@query(
    "dedup_best_quality_survivor",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source,
             {_FP_SQL.format(t='text')} AS fp,
             {_QUALITY_SQL.format(t='text')} AS quality
      FROM documents
    ), c AS (
      SELECT doc_id, source, quality,
             CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies,
             ROW_NUMBER() OVER (
               PARTITION BY fp ORDER BY quality DESC, doc_id
             ) AS rn
      FROM f
    )
    SELECT doc_id, source, quality, n_copies
    FROM c WHERE rn = 1
    """,
)
def dedup_best_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivors: within each exact-duplicate
    cluster (normalized-text fingerprint) keep the HIGHEST-quality
    copy (tiebreak lowest doc_id) instead of the naive min-id — the
    policy a curation pipeline actually wants when near-identical
    scrapes differ in mojibake or boilerplate.

    Emits every cluster's survivor with its copy count (clusters of 1
    pass through — the keep-list a downstream join applies directly).
    One fingerprint shuffle serves both the copy count and the
    survivor pick (same window key, Catalyst reuses the exchange);
    quality scores compute in the scan projection."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text")))
    base = d.select(
        "doc_id", "source", quality_score(F.col("text")).alias("quality"),
        fp.alias("fp"),
    )
    wc = Window.partitionBy("fp")
    wr = Window.partitionBy("fp").orderBy(F.col("quality").desc(), "doc_id")
    return (
        base.select(
            "doc_id",
            "source",
            "quality",
            F.count(F.lit(1)).over(wc).cast("bigint").alias("n_copies"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_NOV_N = 8


@query(
    "text_ngram_novelty",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS words
      FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(words) - {_NOV_N - 1}, 0)),
               i -> array_to_string(words[i:i + {_NOV_N - 1}], ' '))) AS ng
      FROM w
    ), first AS (
      SELECT ng, MIN(doc_id) AS first_doc FROM g GROUP BY ng
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM g JOIN first f USING (ng)
    GROUP BY g.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct 8-grams
    whose FIRST corpus occurrence (lowest doc_id) is this document —
    the content-freshness signal that separates original text from
    boilerplate chains and quote-heavy near-copies (novelty ~1 =
    fresh, ~0 = everything seen before).

    Scale shape: n-grams stay distinct-per-doc before any shuffle
    (bounds fan-in at |distinct grams|); the first-occurrence map and
    the gram stream co-shuffle on the gram key (one exchange each,
    co-located join — the map is corpus-sized, so broadcasting it
    would be the mistake); final rollup keys on doc_id. Exact
    long→double division at the end."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    grams = F.when(
        F.size("words") >= _NOV_N,
        F.transform(
            F.sequence(F.lit(1), F.size("words") - (_NOV_N - 1)),
            lambda i: F.array_join(F.slice(F.col("words"), i, _NOV_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = w.select("doc_id", F.explode(grams).alias("ng")).distinct()
    first = g.groupBy("ng").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        g.join(first, "ng")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("bigint").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "novelty"
            ),
        )
    )


@query("embedding_pca_variance")  # eigensolve — no SQL oracle; numpy
# differential test: tests/test_operators.py::test_pca_matches_numpy
def embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 principal-component eigenvalues and explained-variance
    ratios of the embedding corpus — the anisotropy report read
    before whitening or picking an ANN index (a collapsed spectrum
    means the embedder wastes dimensions).

    ONE distributed pass folds each partition into (count, Σx, XᵀX)
    via BLAS on Arrow batches (operators/linalg.py); the driver sums
    partition-count rows — O(d²) memory regardless of corpus size —
    and eigensolves the 64×64 covariance in microseconds."""
    from dasladen_spark.operators.linalg import pca_explained_variance

    emb = _t(spark, sf_dir, "embeddings")
    comps = pca_explained_variance(emb, "embedding", dim=64, k=8)
    return spark.createDataFrame(
        [(c, round(ev, 9), round(r, 9)) for c, ev, r in comps],
        "component INT, eigenvalue DOUBLE, explained_ratio DOUBLE",
    )


@query("embedding_whiten_check")  # driver-side eigensolve — rows-only
# (covariance-identity proof: tests/test_operators.py::
# test_whiten_produces_identity_covariance)
def embedding_whiten_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA-whitening audit: whiten the corpus (broadcast d×d rotation,
    pure map — operators/linalg.whiten), then report per-dimension
    variance of the result, which must sit at 1.0 on every axis. The
    check itself is one posexplode + (dim)-keyed rollup — the
    verification a pipeline runs after fitting a whitening transform
    on a sample and applying it to the full corpus."""
    from dasladen_spark.operators.linalg import whiten

    emb = _t(spark, sf_dir, "embeddings")
    w = whiten(emb, "embedding", dim=64)
    return (
        w.select(F.posexplode("whitened").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.round(F.var_pop("v"), 4).alias("variance"))
        .orderBy("dim")
    )


@query(
    "q_sequence_gaps",
    oracle="""
    WITH ids AS (
      SELECT DISTINCT o_orderkey AS id FROM orders
      WHERE o_orderstatus = 'F'
    ), d AS (
      SELECT id, LEAD(id) OVER (ORDER BY id) AS nxt FROM ids
    )
    SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
           nxt - id - 1 AS gap_len
    FROM d WHERE nxt - id > 1
    """,
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger completeness audit: every maximal run of order keys
    missing from the 'F' (finished) ledger — the gap report an
    append-only id space gets checked against after every load.

    The oracle is the classic LEAD-over-global-order form; the Spark
    plan is operators/sequence.sequence_gaps — range-partitioned
    local leads + a partition-count-sized seam fold, NO single-task
    global window (the thing the naive form would plan)."""
    from dasladen_spark.operators.sequence import sequence_gaps

    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return sequence_gaps(o, "o_orderkey")


@query(
    "embedding_norm_outliers",
    oracle="""
    WITH norms AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                          x -> x * x))) AS nrm
      FROM embeddings
    ), stats AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(nrm AS DECIMAL(38,18))) AS s1,
             SUM(CAST(nrm * nrm AS DECIMAL(38,18))) AS s2
      FROM norms
    ), m AS (
      SELECT n,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n AS mean_n,
             sqrt(greatest(0.0,
               CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n
               - (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                 * (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n))) AS std_n
      FROM stats
    )
    SELECT m.n AS n_vectors,
           ROUND(m.mean_n, 6) AS mean_norm,
           ROUND(m.std_n, 6) AS std_norm,
           CAST(SUM(CASE WHEN abs(norms.nrm - m.mean_n) > 2 * m.std_n
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM norms, m
    GROUP BY m.n, m.mean_n, m.std_n
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm outlier audit: corpus mean/std of the L2 norm
    (exact decimal accumulation — order-free) and the count of
    vectors beyond 2σ — the cheap pre-index check that catches
    un-normalized batches, dead encoders, and NaN-adjacent junk
    before they poison an ANN index.

    Two passes over a norms projection (one for moments, one for
    flags) joined through a broadcast 1-row stats frame; per-row
    norms are the same deterministic left-fold the cosine oracle
    uses, so the z-test threshold is engine-identical."""
    from dasladen_spark.functions.vectors import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", l2_norm(F.col("embedding")).alias("nrm"))
    dec = "decimal(38,18)"
    stats = norms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("nrm").cast(dec)).alias("s1"),
        F.sum((F.col("nrm") * F.col("nrm")).cast(dec)).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean_n = F.col("s1").cast("double") / n
    std_n = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.col("s2").cast("double") / n - mean_n * mean_n,
        )
    )
    m = stats.select(
        F.col("n").alias("n_vectors"),
        mean_n.alias("mean_n"),
        std_n.alias("std_n"),
    )
    return (
        norms.crossJoin(F.broadcast(m))
        .groupBy("n_vectors", "mean_n", "std_n")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("nrm") - F.col("mean_n"))
                    > 2 * F.col("std_n"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            "n_vectors",
            F.round("mean_n", 6).alias("mean_norm"),
            F.round("std_n", 6).alias("std_norm"),
            "n_outliers",
        )
    )
