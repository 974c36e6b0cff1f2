"""Training-data pipeline queries, part 6: learned-model curation and
second-order analytics — Naive-Bayes quality classification, doc-level
contamination containment, product-quantized ANN, BPE vocabulary
induction, graph triangle census, and exponentially-weighted trend
smoothing.

Beyond-reference operators (the reference delegates all query power to
an RDBMS, /root/reference/dasladen/task.py:94-107). Same determinism
discipline as llm3-llm5: every cross-engine double is one expression
rounded to 12 decimals, accumulated in DECIMAL, rounded once at the
end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.plans.llm import _cosine_sql
from dasladen_spark.plans.llm5 import _BM25_SCORED_SQL
from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# ------------------------------------ Naive Bayes quality classifier

#: pseudo-label threshold (chars) — stands in for human quality labels
_NB_LONG = 300


#: shared oracle CTE: per-(test doc, label) NB log-scores — the
#: quality-score query and the eval report read the SAME frame
_NB_SCORED_CTE = f"""
    WITH lab AS (
      SELECT doc_id, text,
             CASE WHEN n_chars >= {_NB_LONG} THEN 'long' ELSE 'short' END
               AS label,
             doc_id % 5 = 0 AS is_test
      FROM documents
    ), toks AS (
      SELECT doc_id, label, is_test,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM lab
    ), cnt AS (
      SELECT tok, label, COUNT(*) AS cnt FROM toks
      WHERE NOT is_test GROUP BY tok, label
    ), stats AS (
      SELECT t.label, COUNT(*) AS tot_occ, ANY_VALUE(d.n_docs) AS n_docs
      FROM toks t
      JOIN (SELECT label, COUNT(*) AS n_docs FROM lab
            WHERE NOT is_test GROUP BY label) d ON d.label = t.label
      WHERE NOT t.is_test GROUP BY t.label
    ), vocab AS (
      SELECT COUNT(DISTINCT tok) AS v FROM toks WHERE NOT is_test
    ), tot AS (
      SELECT SUM(n_docs) AS all_docs FROM stats
    ), pri AS (
      SELECT label, tot_occ,
             ROUND(ln(CAST(n_docs AS DOUBLE) / (SELECT all_docs FROM tot)),
                   12) AS prior
      FROM stats
    ), occ AS (
      SELECT doc_id, tok, COUNT(*) AS n_occ FROM toks
      WHERE is_test GROUP BY doc_id, tok
    ), tsum AS (
      SELECT o.doc_id, s.label,
             SUM(CAST(o.n_occ * ROUND(ln(
               (COALESCE(c.cnt, 0) + 1)
               / CAST(s.tot_occ + (SELECT v FROM vocab) AS DOUBLE)
             ), 12) AS DECIMAL(38,18))) AS t
      FROM occ o
      CROSS JOIN pri s
      LEFT JOIN cnt c ON c.tok = o.tok AND c.label = s.label
      GROUP BY o.doc_id, s.label
    ), scored AS (
      -- every test doc scores every label; token-less docs score
      -- their priors alone (mirrors classify.nb_score's base frame)
      SELECT d.doc_id, s.label,
             ROUND(CAST(CAST(
               COALESCE(t.t, CAST(0 AS DECIMAL(38,18)))
               + CAST(s.prior AS DECIMAL(38,18))
             AS VARCHAR) AS DOUBLE), 6) AS log_score
      FROM (SELECT doc_id FROM lab WHERE is_test) d
      CROSS JOIN pri s
      LEFT JOIN tsum t ON t.doc_id = d.doc_id AND t.label = s.label
    )
"""


@query(
    "text_nb_quality_score",
    oracle=_NB_SCORED_CTE + """
    SELECT l.doc_id, l.log_score AS score_long, s.log_score AS score_short,
           CASE WHEN l.log_score >= s.log_score THEN 'long' ELSE 'short' END
             AS pred
    FROM scored l JOIN scored s USING (doc_id)
    WHERE l.label = 'long' AND s.label = 'short'
    ORDER BY doc_id
    """,
)
def text_nb_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based corpus curation (the fastText-quality-filter
    stage): train multinomial Naive Bayes on a labeled slice
    (doc_id %% 5 != 0; labels are a deterministic length proxy),
    score the held-out slice, emit per-doc class log-scores and the
    argmax prediction.

    Scale shape (operators/classify): training is two map-side-
    combined aggregations; the model stays a token-keyed DataFrame
    (broadcast here; co-keyed join when the vocabulary outgrows a
    broadcast); scoring joins distinct (doc, token) pairs only.
    DECIMAL accumulation makes every score bit-reproducible — the
    DuckDB oracle replays the whole computation."""
    from dasladen_spark.operators.classify import ensure_nb_model, nb_score

    d = _t(spark, sf_dir, "documents").withColumn(
        "label",
        F.when(F.col("n_chars") >= _NB_LONG, F.lit("long")).otherwise(
            F.lit("short")
        ),
    )
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    # train-once via the materialized model tables: without this the
    # lazy model re-derives per plan branch (round-5 verdict: 24
    # scans / 16 shuffles in ONE action — several redundant corpus
    # passes at 100 TB). First call per corpus pays the two training
    # aggregations; every later scoring plan just reads two small
    # model tables (same amortization story as ann_indexed_topk).
    model = ensure_nb_model(train, "nb_quality_model", tag=sf_dir)
    scores = nb_score(
        test,
        spark.table(f"{model}_tok"),
        spark.table(f"{model}_lab"),
    )
    # pivot, not a self-join: the scoring plan executes ONCE and the
    # per-label scores land as columns in the same aggregation
    return (
        scores.groupBy("doc_id")
        .pivot("label", ["long", "short"])
        .agg(F.first("log_score"))
        .select(
            "doc_id",
            F.col("long").alias("score_long"),
            F.col("short").alias("score_short"),
            F.when(F.col("long") >= F.col("short"), F.lit("long"))
            .otherwise(F.lit("short"))
            .alias("pred"),
        )
        .orderBy("doc_id")
    )


# --------------------------------- doc-level contamination containment

_CNT_NGRAM = 8  # same width as decontaminate_ngrams


@query(
    "decontaminate_containment",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS words
      FROM documents
    ), g0 AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(words) - {_CNT_NGRAM - 1}, 0)),
               i -> array_to_string(words[i:i + {_CNT_NGRAM - 1}], ' '))) AS ng
      FROM w
    ), g AS (
      SELECT DISTINCT doc_id, ng FROM g0
    ), bench AS (
      SELECT doc_id AS b_doc, ng FROM g WHERE doc_id % 7 = 0
    ), bsize AS (
      SELECT b_doc, COUNT(*) AS b_grams FROM bench GROUP BY b_doc
    ), train AS (
      SELECT doc_id AS t_doc, ng FROM g WHERE doc_id % 7 <> 0
    ), inter AS (
      SELECT t.t_doc, b.b_doc, COUNT(*) AS shared
      FROM train t JOIN bench b USING (ng)
      GROUP BY t.t_doc, b.b_doc
    )
    SELECT i.t_doc, i.b_doc, i.shared, s.b_grams,
           ROUND(i.shared / CAST(s.b_grams AS DOUBLE), 6) AS containment
    FROM inter i JOIN bsize s USING (b_doc)
    ORDER BY containment DESC, t_doc, b_doc LIMIT 50
    """,
)
def decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-LEVEL contamination audit — the asymmetric complement of
    decontaminate_ngrams' gram-level hits: for each (train doc,
    benchmark doc) pair sharing any 8-gram, score what FRACTION of
    the benchmark doc's distinct 8-grams the train doc contains.
    Containment (not Jaccard) is the right measure here: a long train
    doc that swallowed a short benchmark doc whole has Jaccard ≈ 0
    but containment = 1.

    Scale shape: the benchmark side (doc, gram) pairs are MBs even at
    corpus-TBs, so they broadcast; the train side never shuffles for
    the probe — candidates then aggregate per pair, bounded by actual
    overlaps, and sizes join broadcast again. Top-50 with full
    tie-break keeps the report deterministic."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    grams = F.when(
        F.size("words") >= _CNT_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.size("words") - (_CNT_NGRAM - 1)),
            lambda i: F.array_join(F.slice(F.col("words"), i, _CNT_NGRAM), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = w.select("doc_id", F.explode(grams).alias("ng")).distinct()
    bench = g.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("b_doc"), "ng"
    )
    bsize = bench.groupBy("b_doc").agg(F.count(F.lit(1)).alias("b_grams"))
    train = g.filter(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("t_doc"), "ng"
    )
    inter = (
        train.join(F.broadcast(bench), "ng")
        .groupBy("t_doc", "b_doc")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        inter.join(F.broadcast(bsize), "b_doc")
        .select(
            "t_doc",
            "b_doc",
            "shared",
            "b_grams",
            F.round(
                F.col("shared") / F.col("b_grams").cast("double"), 6
            ).alias("containment"),
        )
        .orderBy(F.col("containment").desc(), "t_doc", "b_doc")
        .limit(50)
    )


# ------------------------------------------- PQ-compressed ANN


# ONE definition of the registered PQ geometry, passed explicitly to
# the operator calls and the oracle generator (the ann_lsh_topk
# single-source rule)
_PQ_M = 16
_PQ_KSUB = 32
_PQ_ITERS = 2
_PQ_DIM = 64
_PQ_K = 5
_PQ_MULT = 8


def _pq_ctes(
    m: int = _PQ_M,
    ksub: int = _PQ_KSUB,
    iters: int = _PQ_ITERS,
    dim: int = _PQ_DIM,
    k: int = _PQ_K,
    mult: int = _PQ_MULT,
    prefix: str = "",
    cand_cte: str = "",
    cand_rel: str | None = None,
    fit_fraction: float | None = None,
    fit_salt: str = "pq-seed-fit",
    fit_where: str | None = None,
) -> str:
    """The PQ replay as a CTE fragment (no leading ``WITH``), ending
    in ``{prefix}top(query_id, rank, neighbor_id, cosine)`` — the
    k-deep exact-reranked result. ``prefix`` namespaces every CTE so
    several independently-fit PQ chains compose in ONE statement
    (the recall-report oracle runs three: flat, indexed, and the
    70%-fit drift chain).

    ``cand_cte`` inlines an extra fragment ending in a
    ``cand(query_id, neighbor_id)`` relation (the indexed variant);
    ``cand_rel`` instead NAMES an externally-defined candidate
    relation — used when several chains share one bucket-join
    candidate set (hyperplane buckets are data-independent, so a
    full-build index and its append-grown sibling probe identical
    candidates).

    ``fit_fraction`` replays fit_pq_codebooks' md5-threshold sampled
    fit (operators/sampling.portable_sample_filter — the predicate
    spells identically in ANSI SQL); ``fit_where`` is the general
    form, an arbitrary SQL predicate over ``vec_id`` restricting the
    seed pick and Lloyd means (the drift chain fits on
    ``vec_id % 10 < 7``). Assignments and codes stay corpus-wide
    either way — exactly the engine's sampled-fit semantics."""
    dsub = dim // m
    q = "1000000.0::DOUBLE"  # operators/pq.PQ_QUANT
    P = prefix
    fit = ""
    fitjoin = ""
    if fit_fraction is not None and 0.0 < fit_fraction < 1.0:
        thr = format(int(fit_fraction * 16**8), "08x")
        fit_where = (
            f"substr(md5('{fit_salt}' || CAST(vec_id AS VARCHAR)), 1, 8)"
            f" < '{thr}'"
        )
    if fit_where:
        fit = f""", {P}fitset AS MATERIALIZED (
      SELECT vec_id FROM {P}xn
      WHERE {fit_where}
    )"""
        fitjoin = f" JOIN {P}fitset USING (vec_id)"
    parts = [
        f"""{P}raw AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), {P}xn AS MATERIALIZED (
      SELECT vec_id, list_transform(v, x -> x / d) AS xn
      FROM (
        SELECT vec_id, v,
               greatest(sqrt(CAST(list_sum(list_transform(v,
                 x -> CAST(floor(x * x * {q} + 0.5) AS BIGINT)))
                 AS DOUBLE) / {q}), 1e-12) AS d
        FROM {P}raw)
    ), {P}zx AS MATERIALIZED (
      SELECT vec_id,
             list_transform(xn, x -> CAST(floor(x * {q} + 0.5) AS BIGINT))
               AS zx
      FROM {P}xn
    ){fit}, {P}seeds AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS c, xn
      FROM (SELECT md5('pq-seed' || CAST(vec_id AS VARCHAR)) AS h, xn
            FROM {P}xn{fitjoin} ORDER BY h LIMIT {ksub})
    ), {P}b0 AS MATERIALIZED (
      SELECT jj.j, s.c, s.xn[jj.j*{dsub}+1 : jj.j*{dsub}+{dsub}] AS coef
      FROM {P}seeds s CROSS JOIN (SELECT unnest(range({m})) AS j) jj
    )"""
    ]
    for r in range(1, iters + 2):
        # assignment a{r} under books b{r-1} (a{iters+1} = final codes)
        parts.append(f""", {P}zb{r - 1} AS MATERIALIZED (
      SELECT j, c,
             list_transform(coef, x -> CAST(floor(x * {q} + 0.5) AS BIGINT))
               AS zc
      FROM {P}b{r - 1}
    ), {P}a{r} AS MATERIALIZED (
      SELECT vec_id, j, c AS code FROM (
        SELECT z.vec_id, b.j, b.c,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id, b.j
                 ORDER BY list_sum(list_transform(
                   list_zip(z.zx[b.j*{dsub}+1 : b.j*{dsub}+{dsub}], b.zc),
                   p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, b.c ASC) AS rn
        FROM {P}zx z CROSS JOIN {P}zb{r - 1} b)
      WHERE rn = 1
    )""")
        if r <= iters:
            # Lloyd mean update b{r}; empty cells keep b{r-1}'s coef
            parts.append(f""", {P}s{r} AS MATERIALIZED (
      SELECT j, code, i, SUM(zv) AS s, COUNT(*) AS n
      FROM (
        SELECT a.j, a.code, unnest(generate_series(1, {dsub})) AS i,
               unnest(z.zx[a.j*{dsub}+1 : a.j*{dsub}+{dsub}]) AS zv
        FROM {P}a{r} a JOIN {P}zx z USING (vec_id){fitjoin})
      GROUP BY 1, 2, 3
    ), {P}b{r} AS MATERIALIZED (
      SELECT p.j, p.c,
             CASE WHEN mm.coef IS NULL THEN p.coef ELSE mm.coef END AS coef
      FROM {P}b{r - 1} p LEFT JOIN (
        SELECT j, code AS c,
               list(CAST(s AS DOUBLE) / (n * {q}) ORDER BY i) AS coef
        FROM {P}s{r} GROUP BY j, code) mm USING (j, c)
    )""")
    lut_dot = " + ".join(
        f"qq.xn[b.j*{dsub}+{i + 1}] * b.coef[{i + 1}]" for i in range(dsub)
    )
    adc_chain = " + ".join(
        f"l.wss[{j + 1}][cd.codes[{j + 1}] + 1]" for j in range(m)
    )
    parts.append(f""", {P}codes AS MATERIALIZED (
      SELECT vec_id, list(code ORDER BY j) AS codes
      FROM {P}a{iters + 1} GROUP BY vec_id
    ), {P}lut AS MATERIALIZED (
      SELECT qq.vec_id AS qid, b.j, b.c, {lut_dot} AS w
      FROM (SELECT vec_id, xn FROM {P}xn WHERE vec_id < 10) qq
           CROSS JOIN {P}b{iters} b
    ), {P}lutq AS MATERIALIZED (
      SELECT qid, list(ws ORDER BY j) AS wss FROM (
        SELECT qid, j, list(w ORDER BY c) AS ws FROM {P}lut GROUP BY qid, j)
      GROUP BY qid
    )""")
    if cand_cte:
        parts.append(cand_cte)
        cand_rel = "cand"
    if cand_rel:
        # indexed variant: ADC only over the bucket-join candidate
        # set (search_ann_index's dropDuplicates + self-exclusion)
        parts.append(f""", {P}adc AS MATERIALIZED (
      SELECT ca.query_id, ca.neighbor_id, {adc_chain} AS adc
      FROM {cand_rel} ca JOIN {P}lutq l ON l.qid = ca.query_id
                   JOIN {P}codes cd ON cd.vec_id = ca.neighbor_id
    ), {P}short AS MATERIALIZED (""")
    else:
        parts.append(f""", {P}adc AS MATERIALIZED (
      SELECT l.qid AS query_id, cd.vec_id AS neighbor_id,
             {adc_chain} AS adc
      FROM {P}lutq l CROSS JOIN {P}codes cd
      WHERE cd.vec_id <> l.qid
    ), {P}short AS MATERIALIZED (""")
    parts.append(f"""
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY adc DESC, neighbor_id) AS rn
        FROM {P}adc) WHERE rn <= {k * mult}
    ), {P}scored AS (
      SELECT s.query_id, s.neighbor_id,
             {_cosine_sql('qr.v', 'nr.v')} AS cosine
      FROM {P}short s JOIN {P}raw qr ON qr.vec_id = s.query_id
                   JOIN {P}raw nr ON nr.vec_id = s.neighbor_id
    ), {P}top AS (
      SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
      FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM {P}scored)
      WHERE rank <= {k}
    )""")
    return "".join(parts)


def _pq_oracle(
    m: int = _PQ_M,
    ksub: int = _PQ_KSUB,
    iters: int = _PQ_ITERS,
    dim: int = _PQ_DIM,
    k: int = _PQ_K,
    mult: int = _PQ_MULT,
    cand_cte: str = "",
    fit_fraction: float | None = None,
    fit_salt: str = "pq-seed-fit",
) -> str:
    """ann_pq_topk's APPROXIMATE result replayed exactly — the
    _lsh_topk_oracle doctrine (model the METHOD, not the exact
    answer), applied to the whole PQ pipeline: since round 9 every
    discrete step is quantized-integer (operators/pq module
    doctrine), so this generated SQL re-derives the codebooks (seed →
    iters unrolled Lloyd rounds), the codes, the ADC shortlist, and
    the exact re-rank bit-for-bit. See :func:`_pq_ctes` for the CTE
    body and the cand/fit parameters."""
    body = _pq_ctes(
        m,
        ksub,
        iters,
        dim,
        k,
        mult,
        cand_cte=cand_cte,
        fit_fraction=fit_fraction,
        fit_salt=fit_salt,
    )
    return f"""
    WITH {body}
    SELECT query_id, rank, neighbor_id, cosine
    FROM top ORDER BY query_id, rank
    """


@query("ann_pq_topk", oracle=_pq_oracle())
# recall@5 additionally audited in
# tests/test_operators.py::test_pq_reranked_recall;
# test_pq_matches_numpy_reference proves fit/encode bit-determinism
# against a scalar sequential replica
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN with exact re-rank — the memory-scale
    path (operators/pq): the corpus scan reads 16-byte codes instead
    of 256-byte vectors (16×), scoring is LUT lookups, and only the
    per-query shortlist (k × rerank_mult rows) ever touches full
    vectors again. Registered at m=16, ksub=32, rerank 8× — recall@5
    ≥ 0.9 vs the exact baseline by test."""
    from dasladen_spark.operators.pq import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk_reranked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS)
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 10)
    return pq_topk_reranked(
        q, emb, codes, books, k=_PQ_K, rerank_mult=_PQ_MULT
    ).orderBy("query_id", "rank")


#: the sampled-fit fraction registered under the correctness gate —
#: passed explicitly to the operator call AND the oracle (the
#: single-source rule), so a retune can't desynchronize them
_PQ_FIT_FRACTION = 0.5


@query(
    "ann_pq_sampled_topk",
    oracle=_pq_oracle(fit_fraction=_PQ_FIT_FRACTION),
)
def ann_pq_sampled_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_pq_topk with ``fit_fraction=0.5`` — the 100 TB fit path:
    codebooks are fit on a deterministic md5-threshold HALF of the
    corpus (operators/sampling.portable_sample_filter, so codebook
    quality converges without the Lloyd passes reading every byte),
    while encode and search still cover every row. The oracle replays
    the sampled fit exactly (same md5 predicate, seeds and Lloyd
    means restricted to the sample), so the sampled-fit machinery —
    not just the full-corpus fit — sits under the driver's exact
    correctness gate."""
    from dasladen_spark.operators.pq import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk_reranked,
    )

    emb = _t(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(
        emb,
        m=_PQ_M,
        ksub=_PQ_KSUB,
        iters=_PQ_ITERS,
        fit_fraction=_PQ_FIT_FRACTION,
    )
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 10)
    return pq_topk_reranked(
        q, emb, codes, books, k=_PQ_K, rerank_mult=_PQ_MULT
    ).orderBy("query_id", "rank")


# the LSH geometry of the materialized ann_idx_pq index — passed
# explicitly to the build AND the oracle (single-source rule)
_PQIDX_TABLES = 16
_PQIDX_BITS = 4


def _pq_indexed_oracle() -> str:
    """ann_pq_indexed_topk replayed exactly: the PQ fit/encode/ADC
    chain of _pq_oracle, with the candidate set restricted to the
    materialized index's hyperplane bucket joins (the same
    quantized-integer bucket replay ann_lsh_topk's oracle uses) —
    i.e. the oracle models BOTH approximations the index makes."""
    from dasladen_spark.operators.dedup import hyperplane_buckets_oracle_cte

    cand = f""", {hyperplane_buckets_oracle_cte(
        _PQIDX_TABLES, _PQIDX_BITS, _PQ_DIM,
        relation="raw", id_col="vec_id", vec_col="v",
    )}, cand AS MATERIALIZED (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c USING (t, bkt)
      WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
    )"""
    return _pq_oracle(cand_cte=cand)


@query("ann_pq_indexed_topk", oracle=_pq_indexed_oracle())
# recall additionally audited in
# tests/test_operators.py::test_pq_indexed_recall and plan-asserted
# (zero corpus-side Exchange, code-bytes-only scan) in
# tests/test_plan_shapes.py::test_pq_indexed_search_scans_codes_only
def ann_pq_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full at-scale ANN stack: a MATERIALIZED bucketed LSH index
    whose posting lists store 16-byte PQ codes (operators/ann_index,
    compress='pq') — built once per corpus snapshot; each query batch
    probes it with a broadcast join (no corpus-side shuffle), scores
    candidates by LUT lookups over the code bytes, and exact-re-ranks
    only the per-query shortlist against the source vectors."""
    from dasladen_spark.operators.ann_index import (
        ensure_ann_index,
        search_ann_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    idx = ensure_ann_index(
        emb,
        "ann_idx_pq",
        tag=sf_dir,
        dim=_PQ_DIM,
        compress="pq",
        num_tables=_PQIDX_TABLES,
        bits_per_table=_PQIDX_BITS,
        pq_m=_PQ_M,
        pq_ksub=_PQ_KSUB,
        pq_iters=_PQ_ITERS,
    )
    return search_ann_index(
        spark,
        idx,
        emb.filter(F.col("vec_id") < 10),
        k=_PQ_K,
        corpus=emb,
        rerank_mult=_PQ_MULT,
    ).orderBy("query_id", "rank")


# ------------------------------------------- BPE vocabulary induction


# BPE oracle: merge learning is INTEGER-only (pair-frequency sums,
# lexicographic tie-breaks), so the 12 rounds unroll into a generated
# CTE chain — pair count → argmax winner → fold-based rewrite per
# round (MATERIALIZED against DuckDB's exponential CTE inlining).
# The rewrite fold is provably equivalent to the operator's
# left-to-right non-overlapping walk: a freshly-merged symbol equals
# left||right and right is non-empty, so it can never re-match as
# `left` within the same round — exactly the i+=2 skip.
_BPE_N = 12


def _bpe_oracle() -> str:
    parts = [
        """
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents
    ), wf AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM tok GROUP BY word
    ), w0 AS MATERIALIZED (
      SELECT list_transform(generate_series(1, length(word)),
                            i -> word[i:i]) AS s, freq
      FROM wf
    )"""
    ]
    for r in range(1, _BPE_N + 1):
        parts.append(f""", p{r} AS MATERIALIZED (
      SELECT s[i] AS l, s[i+1] AS r2, SUM(freq) AS n
      FROM (SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
            FROM w{r - 1} WHERE len(s) >= 2)
      GROUP BY 1, 2
    ), win{r} AS MATERIALIZED (
      SELECT l, r2, n FROM p{r} ORDER BY n DESC, l, r2 LIMIT 1
    ), w{r} AS MATERIALIZED (
      SELECT freq, list_reduce(
        list_prepend(CAST([] AS VARCHAR[]), list_transform(s, x -> [x])),
        (acc, b) -> CASE WHEN len(acc) > 0 AND acc[-1] = win.l
                              AND b[1] = win.r2
                    THEN list_append(acc[1:len(acc)-1], win.l || win.r2)
                    ELSE list_concat(acc, b) END) AS s
      FROM w{r - 1}, win{r} win
    )""")
    parts.append(
        "\n    "
        + " UNION ALL ".join(
            f'SELECT {r} AS merge_rank, l AS "left", r2 AS "right",'
            f" CAST(n AS BIGINT) AS pair_freq FROM win{r}"
            for r in range(1, _BPE_N + 1)
        )
        + " ORDER BY merge_rank"
    )
    return "".join(parts)


@query("text_bpe_learn_merges", oracle=_bpe_oracle())
def text_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training: learn the top-12 BPE merges from corpus
    word frequencies (operators/bpe). The corpus collapses to the
    distinct-word table first, so each merge round costs a
    vocabulary-sized pair count — independent of corpus bytes."""
    from dasladen_spark.operators.bpe import learn_bpe_merges, word_freq_table

    words = word_freq_table(_t(spark, sf_dir, "documents"))
    merges = learn_bpe_merges(words, n_merges=_BPE_N)
    return spark.createDataFrame(
        [(i + 1, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "merge_rank INT, left STRING, right STRING, pair_freq BIGINT",
    ).orderBy("merge_rank")


# ------------------------------------------- hybrid retrieval (RRF)

_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
_RRF_DEPTH = 100  # fuse the top-100 of each ranker


_RRF_ORACLE = f"""
    WITH {_BM25_SCORED_SQL},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT doc_id, dense_rank FROM (
        SELECT e.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 ORDER BY {_cosine_sql('(SELECT qv FROM q)', 'e.embedding')}
                   DESC, e.vec_id) AS dense_rank
        FROM embeddings e WHERE e.vec_id <> 0
      ) WHERE dense_rank <= {_RRF_DEPTH}
    ), sparse AS (
      SELECT doc_id, sparse_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                 AS sparse_rank
        FROM bm25
      ) WHERE sparse_rank <= {_RRF_DEPTH}
    )
    SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
           d.dense_rank, s.sparse_rank,
           COALESCE(ROUND(CAST(1.0 AS DOUBLE) / ({_RRF_K} + d.dense_rank),
                          12), CAST(0.0 AS DOUBLE))
           + COALESCE(ROUND(CAST(1.0 AS DOUBLE) / ({_RRF_K} + s.sparse_rank),
                            12), CAST(0.0 AS DOUBLE))
             AS rrf
    FROM dense d FULL OUTER JOIN sparse s ON s.doc_id = d.doc_id
    ORDER BY rrf DESC, doc_id LIMIT 20
    """


@query("retrieval_rrf_hybrid", oracle=_RRF_ORACLE)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — reciprocal-rank fusion of a DENSE ranking
    (cosine against doc 0's embedding; at 100 TB this list comes from
    the ANN index, here the exact scan for oracle-provability) and a
    SPARSE ranking (the BM25 probe-term scores): the retrieval stack
    every RAG/eval-mining pipeline ships.

    rrf(d) = Σ_lists 1/(K + rank_d); docs absent from a list
    contribute nothing for it. Each ranker is truncated at depth 100
    (standard practice — fusing full corpora is pointless and at
    scale impossible), the fused top-20 is returned with both
    source ranks for auditability.

    Scale shape: both rankers produce bounded lists (top-100), the
    fusion is a full outer join of two 100-row frames — driver-free
    and constant-size regardless of corpus size."""
    from dasladen_spark.operators.similarity import cosine_topk
    from dasladen_spark.plans.llm5 import bm25_scored

    emb = _t(spark, sf_dir, "embeddings")
    dense = (
        cosine_topk(
            emb.filter(F.col("vec_id") == 0), emb, k=_RRF_DEPTH
        )
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("bigint").alias("dense_rank"),
        )
    )
    from pyspark.sql import Window

    # depth-bound FIRST (TakeOrderedAndProject — distributed), then
    # rank the ≤100 surviving rows; the global window only ever sees
    # the bounded frame
    from dasladen_spark.functions.vectors import bounded_window_key

    ws = Window.partitionBy(bounded_window_key(F.col("doc_id"))).orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    sparse = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
        .withColumn("sparse_rank", F.row_number().over(ws).cast("bigint"))
        .select("doc_id", "sparse_rank")
    )
    fused = dense.join(sparse, "doc_id", "full_outer").select(
        "doc_id",
        "dense_rank",
        "sparse_rank",
        (
            F.coalesce(
                F.round(1.0 / (F.lit(_RRF_K) + F.col("dense_rank")), 12),
                F.lit(0.0),
            )
            + F.coalesce(
                F.round(1.0 / (F.lit(_RRF_K) + F.col("sparse_rank")), 12),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)




# ------------------------------------------------ triangle census


@query(
    "q_triangle_count",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), und AS (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM und GROUP BY u
    ), oriented AS (
      SELECT e.u, e.v FROM e
      JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
      WHERE (du.d, e.u) < (dv.d, e.v)
      UNION ALL
      SELECT e.v AS u, e.u AS v FROM e
      JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
      WHERE (dv.d, e.v) < (du.d, e.u)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e2.u = e1.v
    JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (parts co-occurring in
    an order) — the clustering-coefficient primitive for corpus /
    interaction graphs.

    Scale shape: the classic wedge explosion (join on a hub node
    touches deg² pairs) is bounded by DEGREE ORIENTATION — each
    undirected edge is directed from its (degree, id)-smaller
    endpoint, so every out-degree is O(√E) and the wedge join
    enumerates each triangle exactly once. All three joins are
    equi-joins on node keys; nothing is collected."""
    from dasladen_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    e = (
        op.alias("a")
        .join(op.alias("b"), on=F.expr("a.o = b.o AND a.p < b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    return triangle_count(e)


#: Doulion edge-sampling tiers for the triangle ESTIMATOR: p = 1
#: through sf0.1-sized inputs (the estimate IS the exact count at
#: every sf the driver grades), then p = 1/4 and 1/16 as the fact
#: table decades up — the wedge join's E^1.5 cost falls by p^1.5
#: (8× / 64×) while the p⁻³ unbiased scale-up stays exact integer
#: arithmetic. The tier keys on COUNT(lineitem) (cheap, monotone in
#: sf), and the sample itself is the portable md5-prefix predicate —
#: a deterministic function of the edge, so both engines draw the
#: SAME sample and the estimate replays bit-for-bit.
_TRI_TIERS = [
    (30_000_000, "10000000", 4096),  # p=1/16 -> ×16³ (sf10 and up)
    (1_000_000, "40000000", 64),     # p=1/4  -> ×4³  (sf1)
    (0, "zzzzzzzz", 1),              # p=1 (every md5 prefix < 'zz…')
]


def _tri_tier(n_li: int) -> tuple[str, int]:
    for bound, thr, factor in _TRI_TIERS:
        if n_li > bound or bound == 0:
            return thr, factor
    raise AssertionError("unreachable")


_TRI_EDGE_KEY_SQL = (
    "substr(md5('tri-sample:' || CAST(e.u AS VARCHAR) || ':'"
    " || CAST(e.v AS VARCHAR)), 1, 8)"
)


@query(
    "q_triangle_count_estimate",
    oracle=f"""
    WITH param AS (
      SELECT CASE WHEN (SELECT COUNT(*) FROM lineitem) > {_TRI_TIERS[0][0]}
                  THEN '{_TRI_TIERS[0][1]}'
                  WHEN (SELECT COUNT(*) FROM lineitem) > {_TRI_TIERS[1][0]}
                  THEN '{_TRI_TIERS[1][1]}'
                  ELSE '{_TRI_TIERS[2][1]}' END AS thr,
             CASE WHEN (SELECT COUNT(*) FROM lineitem) > {_TRI_TIERS[0][0]}
                  THEN {_TRI_TIERS[0][2]}
                  WHEN (SELECT COUNT(*) FROM lineitem) > {_TRI_TIERS[1][0]}
                  THEN {_TRI_TIERS[1][2]}
                  ELSE {_TRI_TIERS[2][2]} END AS f
    ), op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e0 AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), e AS (
      SELECT u, v FROM e0 e
      WHERE {_TRI_EDGE_KEY_SQL} < (SELECT thr FROM param)
    ), und AS (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM und GROUP BY u
    ), oriented AS (
      SELECT e.u, e.v FROM e
      JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
      WHERE (du.d, e.u) < (dv.d, e.v)
      UNION ALL
      SELECT e.v AS u, e.u AS v FROM e
      JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
      WHERE (dv.d, e.v) < (du.d, e.u)
    )
    SELECT CAST(COUNT(*) * (SELECT f FROM param) AS BIGINT)
             AS n_triangles_est
    FROM oriented e1
    JOIN oriented e2 ON e2.u = e1.v
    JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_triangle_count_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doulion (Tsourakakis et al. 2009) edge-sampled triangle
    ESTIMATE — the 100 TB tier of q_triangle_count, whose exact
    degree-oriented wedge join is algorithmically O(E^1.5) (inherent,
    measured 51× for 10× rows at sf1). Keeping each edge with
    probability p and scaling the sampled census by p⁻³ is unbiased;
    here p steps down as the fact table decades up (_TRI_TIERS), so
    the estimator's wedge cost grows ~p^1.5·E^1.5 ≈ linearly across
    tiers. p = 1 through sf0.1, so every sf the driver grades returns
    the EXACT census; the sample predicate is the portable md5-prefix
    hash of the edge key — deterministic, so the DuckDB oracle draws
    the identical sample and the estimate replays exactly."""
    from dasladen_spark.operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    thr, factor = _tri_tier(li.count())
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    e = (
        op.alias("a")
        .join(op.alias("b"), on=F.expr("a.o = b.o AND a.p < b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .filter(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("tri-sample"), F.col("u"), F.col("v")
                    )
                ),
                1,
                8,
            )
            < F.lit(thr)
        )
    )
    return triangle_count(e).select(
        (F.col("n_triangles") * F.lit(factor))
        .cast("bigint")
        .alias("n_triangles_est")
    )


# ------------------------------------------- EWMA trend smoothing

#: exact decimal spellings of 0.8^j — shared verbatim with the oracle
_EWMA_W = [
    "1",
    "0.8",
    "0.64",
    "0.512",
    "0.4096",
    "0.32768",
    "0.262144",
    "0.2097152",
    "0.16777216",
    "0.134217728",
    "0.1073741824",
    "0.08589934592",
]
_EWMA_WIN = len(_EWMA_W)  # 12 weeks


@query(
    "q_ewma_weekly_revenue",
    oracle=f"""
    WITH wk AS (
      SELECT n.n_name AS nation,
             CAST(date_trunc('week', o.o_orderdate) AS TIMESTAMP) AS week,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(24,6)))
                  AS DECIMAL(24,6)) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ), wts AS (
      SELECT unnest(generate_series(0, {_EWMA_WIN - 1})) AS j,
             unnest([{", ".join("CAST('" + w + "' AS DECIMAL(13,11))" for w in _EWMA_W)}])
               AS wt
    ), pairs AS (
      -- DECIMAL(24,6) × DECIMAL(13,11) = exact DECIMAL(38,17): no
      -- double touches the numerator until the final division
      SELECT a.nation, a.week,
             CAST(b.rev * w.wt AS DECIMAL(38,17)) AS term,
             CAST(w.wt AS DECIMAL(38,11)) AS wt
      FROM wk a
      JOIN wk b ON b.nation = a.nation
       AND datediff('day', b.week, a.week) BETWEEN 0
           AND {(_EWMA_WIN - 1) * 7}
      JOIN wts w ON w.j = datediff('day', b.week, a.week) // 7
    )
    SELECT nation, week,
           -- exact lattice exit (round-and-correct): the double
           -- division only NOMINATES a 6-decimal lattice point r0
           -- (=round(T/W·1e6)); the half-up decision is then settled
           -- ENTIRELY in exact decimal arithmetic — r is the unique
           -- integer with (2r-1)·W <= 2T < (2r+1)·W — so no float
           -- rounding boundary exists at ANY magnitude (the previous
           -- reduce-in-decimal-then-round recipe drifted 1 ulp on
           -- 38/8623 rows at sf1). r0 is within ±1 of r whenever
           -- T/W·1e6 < ~1e15 (double rel-err 3e-16), one correction
           -- step suffices; r/1e6 as one IEEE double division is
           -- correctly rounded identically on both engines.
           CAST(r0 + CASE WHEN t2 >= (r0 * 2 + 1) * w THEN 1
                          WHEN t2 <  (r0 * 2 - 1) * w THEN -1
                          ELSE 0 END AS DOUBLE) / 1000000.0 AS ewma_rev
    FROM (
      SELECT nation, week,
             CAST(ROUND(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(SUM(wt) AS VARCHAR) AS DOUBLE) * 1000000.0,
                  0) AS BIGINT) AS r0,
             -- DECIMAL(30,17): int part to 1e13 (sf1 sums are ~5e9);
             -- ×DECIMAL(7,0) stays at width 37 <= both engines' 38
             CAST(SUM(term) AS DECIMAL(30,17))
               * CAST(2000000 AS DECIMAL(7,0)) AS t2,
             CAST(SUM(wt) AS DECIMAL(13,11)) AS w
      FROM pairs GROUP BY nation, week
    )
    ORDER BY nation, week
    """,
)
def q_ewma_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted weekly revenue trend per nation —
    12-week half-window EWMA (α = 0.2 → weights 0.8^j), the smoothing
    primitive behind drift/trend monitors.

    Scale shape: the raw 100 TB fact table collapses to the
    (nation, week) series FIRST (one map-side-combined aggregate);
    the EWMA is then a bounded self-join of that tiny series on
    (nation, week-range ≤ 12) — never a window over raw rows.

    Determinism: weights are exact decimal literals shared verbatim
    with the oracle, and every product rev × wt is EXACT decimal
    arithmetic (DECIMAL(24,6) × DECIMAL(13,11) → DECIMAL(38,17)) —
    and since round 12 the DIVISION is exact too: the double quotient
    only nominates the 6-decimal lattice point r0, and exact decimal
    comparisons ((2r-1)·W ≤ 2e6·T < (2r+1)·W) settle the half-up
    round, so no float boundary exists at any magnitude. (The two
    earlier float exits each failed one decade up: raw double round
    flipped 1/8623 rows at sf0.1, decimal-reduce-then-round flipped
    38/8623 at sf1 — magnitude-fragile recipes, now retired. r0 is
    within ±1 of true r while T/W·1e6 < ~1e15, far above 100 TB
    revenue sums.)"""
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
            F.sum(F.col("o_totalprice").cast("decimal(24,6)"))
            .cast("decimal(24,6)")
            .alias("rev")
        )
    )
    wts = F.array(*[F.lit(w).cast("decimal(13,11)") for w in _EWMA_W])
    # the calendar-sized series feeds BOTH self-join sides —
    # without a persist the whole fact-table join+rollup runs
    # once per side (r12 plan audit: operators 1-16 duplicated
    # verbatim at 18-33). ≤ |nations|x|weeks| rows at ANY
    # corpus size, so the cache is bounded and the saved pass
    # is over the fact table.
    wk = wk.persist()
    a = wk.alias("a")
    b = wk.alias("b")
    diff_days = F.datediff(F.col("a.week"), F.col("b.week"))
    wt = F.element_at(wts, (diff_days / 7).cast("int") + 1)
    pairs = (
        a.join(
            b,
            on=(F.col("b.nation") == F.col("a.nation"))
            & (diff_days >= 0)
            & (diff_days <= (_EWMA_WIN - 1) * 7),
        )
        .select(
            F.col("a.nation").alias("nation"),
            F.col("a.week").alias("week"),
            (F.col("b.rev") * wt).cast("decimal(38,17)").alias("term"),
            wt.cast("decimal(38,11)").alias("wt"),
        )
    )
    # exact lattice exit, same round-and-correct spelling as the
    # oracle: the double division only NOMINATES the lattice point
    # r0 ≈ round(T/W·1e6); exact decimal comparisons settle the
    # half-up decision ((2r-1)·W ≤ 2e6·T < (2r+1)·W), so the final
    # 6-decimal value never depends on a float rounding boundary.
    sums = pairs.groupBy("nation", "week").agg(
        F.sum("term").cast("decimal(30,17)").alias("t_sum"),
        F.sum("wt").cast("decimal(13,11)").alias("w_sum"),
    )
    r0 = F.round(
        F.col("t_sum").cast("double")
        / F.col("w_sum").cast("double")
        * F.lit(1000000.0),
        0,
    ).cast("bigint")
    t2 = F.col("t_sum") * F.lit(2000000).cast("decimal(7,0)")
    hi = (r0 * 2 + 1) * F.col("w_sum")
    lo = (r0 * 2 - 1) * F.col("w_sum")
    r = r0 + (
        F.when(t2 >= hi, F.lit(1))
        .when(t2 < lo, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (
        sums.select(
            "nation",
            "week",
            (r.cast("double") / F.lit(1000000.0)).alias("ewma_rev"),
        )
        .orderBy("nation", "week")
    )


# ----------------------------- embedding-space label coherence audit


_KNN_AGREEMENT_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS q_label
      FROM embeddings WHERE vec_id < 100
    ), ranked AS (
      SELECT q.query_id, q.q_label, e.label AS n_label,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY {_cosine_sql('q.qv', 'e.embedding')} DESC, e.vec_id
             ) AS rank
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    ), agree AS (
      SELECT query_id, q_label,
             ROUND(SUM(CASE WHEN n_label = q_label THEN 1 ELSE 0 END)
                   / 5.0, 6) AS agreement
      FROM ranked WHERE rank <= 5
      GROUP BY query_id, q_label
    )
    SELECT q_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           ROUND(CAST(CAST(SUM(CAST(agreement AS DECIMAL(38,6)))
                 AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS mean_agreement
    FROM agree GROUP BY q_label ORDER BY label
    """


@query("embedding_knn_label_agreement", oracle=_KNN_AGREEMENT_ORACLE)
def embedding_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-agreement — the embedding-quality audit for labeled
    data: for each probe vector, what fraction of its 5 nearest
    neighbors (exact cosine) share its label? Near-1 per class means
    the embedding space respects the labels; a class near chance is
    either mislabeled or not linearly separated — the check to run
    BEFORE trusting embedding dedup/clustering on a new corpus.

    Scale shape: probes are a bounded sample (100 here — an audit,
    not a join); each probe broadcasts against the corpus scan, the
    per-probe agreement is an exact rational (k_same/5), and the
    per-label summary is one tiny aggregate. At 100 TB the probe
    top-k would come from the ANN index; exact scan here keeps the
    oracle provable."""
    from dasladen_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 100)
    nn = cosine_topk(q, emb, k=5).select("query_id", "neighbor_id")
    lbl = emb.select("vec_id", "label")
    # the kNN result (≤ probes×k rows) is the genuinely small side —
    # broadcast IT onto the corpus label scan, never the reverse
    probe_lbl = lbl.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    nnq = nn.join(probe_lbl, "query_id")
    agree = (
        lbl.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("n_label"),
        )
        .join(F.broadcast(nnq), "neighbor_id")
        .groupBy("query_id", "q_label")
        .agg(
            F.round(
                F.sum((F.col("n_label") == F.col("q_label")).cast("int"))
                / F.lit(5.0),
                6,
            ).alias("agreement")
        )
    )
    return (
        agree.groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.round(
                F.sum(F.col("agreement").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_agreement"),
        )
        .orderBy("label")
    )




# label-propagation oracle: the deterministic synchronous variant is
# INTEGER-only (vote counts, min-label tie-breaks), so the fixed 4
# rounds unroll exactly in SQL — one vote/count/argmax/update CTE
# block per round, MATERIALIZED so DuckDB never inlines a round into
# the next (exponential re-execution).
_LP_ITERS = 4


def _communities_oracle() -> str:
    parts = [
        """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
    ), und AS MATERIALIZED (
      SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
    ), l0 AS MATERIALIZED (
      SELECT DISTINCT u AS id, u AS community FROM und
    )"""
    ]
    for r in range(1, _LP_ITERS + 1):
        parts.append(f""", n{r} AS MATERIALIZED (
      SELECT id2, community, COUNT(*) AS n FROM (
        SELECT e.u AS id2, l.community
        FROM und e JOIN l{r - 1} l ON e.v = l.id
        UNION ALL
        SELECT id, community FROM l{r - 1}
      ) GROUP BY id2, community
    ), l{r} AS MATERIALIZED (
      SELECT prev.id,
             coalesce(b.new_comm, prev.community) AS community
      FROM l{r - 1} prev LEFT JOIN (
        SELECT id2, community AS new_comm FROM (
          SELECT id2, community,
                 ROW_NUMBER() OVER (PARTITION BY id2
                   ORDER BY n DESC, community ASC) AS rk
          FROM n{r}
        ) WHERE rk = 1
      ) b ON prev.id = b.id2
    )""")
    parts.append(f"""
    SELECT community, CAST(COUNT(*) AS BIGINT) AS size
    FROM l{_LP_ITERS} GROUP BY community
    ORDER BY size DESC, community LIMIT 20
    """)
    return "".join(parts)


@query("graph_communities", oracle=_communities_oracle())
def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community structure of the co-purchase graph via deterministic
    synchronous label propagation (operators/graph.label_propagation)
    — the clustering that still says something when the whole graph
    is one connected component. Reports the 20 largest communities.

    Scale shape: each round is one neighbor-keyed count aggregation +
    a per-node window argmax; no collect, lineage checkpointed per
    round."""
    from dasladen_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    e = (
        op.alias("a")
        .join(op.alias("b"), on=F.expr("a.o = b.o AND a.p < b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    comm = label_propagation(e, iterations=4)
    return (
        comm.groupBy("community")
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "community")
        .limit(20)
    )


@query("embedding_mahalanobis_outliers")  # covariance inverse — not
# SQL-expressible; numpy-differential-tested in test_operators.py::
# test_mahalanobis_matches_numpy
def embedding_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance-aware outlier audit: top-20 embeddings by
    Mahalanobis distance (operators/linalg.mahalanobis_outliers) —
    catches vectors that are atypical along low-variance directions,
    which norm-z-score audits (embedding_norm_outliers) cannot see.
    Driver holds O(d²); scoring is one broadcast-rotation pass with
    per-partition shortlists."""
    from dasladen_spark.operators.linalg import mahalanobis_outliers

    emb = _t(spark, sf_dir, "embeddings")
    return mahalanobis_outliers(emb, "vec_id", "embedding", dim=64)


# --------------------------------- sampling / mixture planning


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH s AS (
      -- sigma from the SAME decimal-exact moment sums the Spark side
      -- uses (not Welford stddev_pop — different accumulation, bits
      -- could differ beyond the rounding guard)
      SELECT o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(sqrt(
               CAST(CAST(SUM(CAST(o_totalprice * o_totalprice
                    AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
               - pow(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                     AS VARCHAR) AS DOUBLE) / COUNT(*), 2)
             ), 6) AS sigma
      FROM orders GROUP BY 1
    ), t AS (
      SELECT SUM(n_rows * sigma) AS denom FROM s
    )
    SELECT stratum, n_rows, sigma,
           CAST(round(1000.0 * n_rows * sigma / (SELECT denom FROM t))
                AS BIGINT) AS alloc_k,
           ROUND(1000.0 * sigma / (SELECT denom FROM t), 6) AS rate
    FROM s ORDER BY stratum
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation for a budget of
    1000 rows: each stratum's share ∝ N_h·σ_h — the variance-minimal
    design for estimating the mean, and the allocation step every
    serious stratified sampler runs before drawing (the draw itself
    is sample_stratified's portable hash filter at these rates).

    Scale shape: per-stratum (count, stddev) is ONE map-side-combined
    aggregate; the denominator is a 1-row broadcast. stddev_pop is
    computed from decimal-exact moment sums so both engines see the
    same doubles."""
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        # decimal-exact moments -> identical doubles in both engines
        F.round(
            F.sqrt(
                F.sum(
                    (F.col("o_totalprice") * F.col("o_totalprice")).cast(
                        "decimal(38,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
                - F.pow(
                    F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)),
                    2,
                )
            ),
            6,
        ).alias("sigma"),
    )
    t = s.agg(F.sum(F.col("n_rows") * F.col("sigma")).alias("denom"))
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "stratum",
            "n_rows",
            "sigma",
            F.round(1000.0 * F.col("n_rows") * F.col("sigma") / F.col("denom"))
            .cast("bigint")
            .alias("alloc_k"),
            F.round(1000.0 * F.col("sigma") / F.col("denom"), 6).alias("rate"),
        )
        .orderBy("stratum")
    )


@query(
    "corpus_mixture_temperature",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), t AS (
      SELECT SUM(n_docs) AS total,
             SUM(pow(n_docs / CAST((SELECT SUM(n_docs) FROM s) AS DOUBLE),
                     0.7)) AS z
      FROM s
    )
    SELECT source, n_docs,
           ROUND(n_docs / CAST((SELECT total FROM t) AS DOUBLE), 6)
             AS p_natural,
           ROUND(pow(n_docs / CAST((SELECT total FROM t) AS DOUBLE), 0.7)
                 / (SELECT z FROM t), 6) AS p_sample,
           ROUND(pow(n_docs / CAST((SELECT total FROM t) AS DOUBLE), 0.7)
                 / (SELECT z FROM t)
                 / (n_docs / CAST((SELECT total FROM t) AS DOUBLE)), 6)
             AS upsample_factor
    FROM s ORDER BY source
    """,
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rates (α = 0.7): sampling probability
    ∝ p_natural^α — the multilingual/multi-source rebalancing rule
    (upweights small sources without flattening the mixture, the
    standard alternative to corpus_mixture_plan's equal-share
    budget). Reports natural share, α-sampled share, and the implied
    up/downsample factor per source.

    Scale shape: a source-keyed count aggregate plus a 1-row
    normalizer broadcast — the 100 TB corpus is touched once."""
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    total = s.agg(F.sum("n_docs").alias("total"))
    z = (
        s.crossJoin(F.broadcast(total))
        .agg(
            F.sum(
                F.pow(F.col("n_docs") / F.col("total").cast("double"), 0.7)
            ).alias("z"),
            F.first("total").alias("total"),
        )
    )
    t = z  # (z, total) — one normalizer row
    p_nat = F.col("n_docs") / F.col("total").cast("double")
    p_smp = F.pow(p_nat, 0.7) / F.col("z")
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            F.round(p_nat, 6).alias("p_natural"),
            F.round(p_smp, 6).alias("p_sample"),
            F.round(p_smp / p_nat, 6).alias("upsample_factor"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ evaluation matrices


def _lang_confusion_oracle() -> str:
    from dasladen_spark.plans.llm import _lang_oracle

    return f"""
    WITH pred AS ({_lang_oracle()})
    SELECT lang AS actual, lang_pred AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2 ORDER BY actual, predicted
    """


@query("text_lang_confusion", oracle=_lang_confusion_oracle())
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language identifier against
    the labeled ``lang`` column — the eval artifact that turns "we
    have a lang-id" into "we know its error modes" (which pairs
    confuse, how much lands in 'und'). One map-side-combined
    aggregate over (actual, predicted)."""
    from dasladen_spark.functions.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("actual"),
            lang_id(F.col("text")).alias("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("actual", "predicted")
    )


@query(
    "nb_eval_report",
    oracle=_NB_SCORED_CTE + """
    , pred AS (
      SELECT l.doc_id,
             CASE WHEN l.log_score >= s.log_score THEN 'long'
                  ELSE 'short' END AS pred
      FROM scored l JOIN scored s USING (doc_id)
      WHERE l.label = 'long' AND s.label = 'short'
    ), j AS (
      SELECT p.pred, t.label
      FROM pred p JOIN (SELECT doc_id, label FROM lab WHERE is_test) t
        USING (doc_id)
    ), m AS (
      SELECT 'long' AS label,
             SUM(CASE WHEN pred='long' AND label='long' THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN pred='long' AND label<>'long' THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN pred<>'long' AND label='long' THEN 1 ELSE 0 END) AS fn
      FROM j
      UNION ALL
      SELECT 'short',
             SUM(CASE WHEN pred='short' AND label='short' THEN 1 ELSE 0 END),
             SUM(CASE WHEN pred='short' AND label<>'short' THEN 1 ELSE 0 END),
             SUM(CASE WHEN pred<>'short' AND label='short' THEN 1 ELSE 0 END)
      FROM j
    )
    SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           ROUND(tp / CAST(greatest(tp + fp, 1) AS DOUBLE), 6) AS precision,
           ROUND(tp / CAST(greatest(tp + fn, 1) AS DOUBLE), 6) AS recall,
           ROUND(2.0 * tp / CAST(greatest(2 * tp + fp + fn, 1) AS DOUBLE), 6)
             AS f1
    FROM m ORDER BY label
    """,
)
def nb_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the NB quality classifier
    on its holdout — the eval card that must accompany any learned
    curation filter before its predictions gate data. Reads the SAME
    scored frame as text_nb_quality_score (shared oracle CTE); the
    metrics reduce from one confusion aggregate, guarded against
    empty classes with a max(·,1) denominator.

    Scale shape: scoring is the classifier's token-keyed pass; the
    confusion summary is one map-side-combined aggregate; the report
    is |classes| rows."""
    preds = text_nb_quality_score(spark, sf_dir).select("doc_id", "pred")
    truth = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.when(F.col("n_chars") >= _NB_LONG, F.lit("long"))
            .otherwise(F.lit("short"))
            .alias("label"),
        )
    )
    # ONE scoring pass: the (pred, label) confusion cells (≤ 4 rows)
    # collect to the driver; a per-class union of aggregates would
    # re-execute the whole NB train/score pipeline once per branch
    cm = {
        (r["pred"], r["label"]): r["n"]
        for r in preds.join(truth, "doc_id")
        .groupBy("pred", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    import math

    def r6(x: float) -> float:
        # SQL ROUND is half-away-from-zero; Python round is banker's
        return math.floor(x * 1e6 + 0.5) / 1e6

    def metrics(k: str):
        tp = cm.get((k, k), 0)
        fp = sum(n for (p_, l_), n in cm.items() if p_ == k and l_ != k)
        fn = sum(n for (p_, l_), n in cm.items() if p_ != k and l_ == k)
        return (
            k,
            tp,
            fp,
            fn,
            r6(tp / float(max(tp + fp, 1))),
            r6(tp / float(max(tp + fn, 1))),
            r6(2.0 * tp / float(max(2 * tp + fp + fn, 1))),
        )

    return spark.createDataFrame(
        [metrics("long"), metrics("short")],
        "label STRING, tp BIGINT, fp BIGINT, fn BIGINT,"
        " precision DOUBLE, recall DOUBLE, f1 DOUBLE",
    ).orderBy("label")
