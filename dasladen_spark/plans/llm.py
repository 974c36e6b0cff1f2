"""Training-data pipeline queries: dedup, similarity, text analysis,
multimodal — the north-star extensions (BASELINE.json; absent from
the reference, SURVEY §2.8).

Oracle-backed where DuckDB can express the same computation —
including, since round 8, the MinHash-LSH and SimHash pipelines: both
hash with md5-derived integers (``operators/dedup.py``
``portable_hash32`` / the 15-hex-char simhash bits) and band on
slice-equality string buckets, so DuckDB replays signatures, buckets,
candidates and scores bit-for-bit — and the survivor pipeline's
connected components replay through a recursive CTE (min reachable
id), so the full fuzzy-dedup chain is exact end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.functions.text import (
    LANG_MARKERS,
    bpe_token_count,
    lang_id,
    lang_scores,
    normalize_text,
    quality_score,
    token_count,
)
from dasladen_spark.operators.dedup import (
    MAX_BUCKET as _MAX_BUCKET,
    _hash_coeffs as _mh_coeffs,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from dasladen_spark.operators.multimodal import extract_image_features, with_payload
from dasladen_spark.operators.similarity import cosine_topk
from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t


# -------------------------------------------------------------- dedup


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-shuffle on the text; survivor = min id."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select(F.md5("text").alias("text_hash"), "keep_id", "n_copies")
    )


@query(
    "dedup_fingerprint",
    oracle=r"""
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                   '\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-fingerprint dedup: case/punct/whitespace-insensitive
    exact matching (document fingerprinting via md5 of canonical
    form)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("fp", "keep_id", "n_copies")
    )


# MinHash-LSH DuckDB oracle: the SAME seeded (a_k, b_k) permutation
# coefficients (operators/dedup._hash_coeffs), the same portable
# md5-substring 32-bit shingle hash, the same 16 slice-equality band
# buckets — candidate generation and scoring replay bit-for-bit, so
# the estimate (an n/64 dyadic rational) is exact in both engines.
_MH_P = 2147483647
_MH_MINS = ",\n        ".join(
    f"MIN(({a} * h + {b}) % {_MH_P}) AS m{k}"
    for k, (a, b) in enumerate(_mh_coeffs(64))
)
_MH_SIG = "[" + ", ".join(f"m{k}" for k in range(64)) + "]"

#: shared CTE body (no leading WITH — survivors needs WITH RECURSIVE):
#: signatures → bands → candidate pairs → scored estimates.
_MH_CTE = f"""base AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    ), pos AS (
      SELECT doc_id, t,
             unnest(generate_series(1, greatest(length(t) - 4, 1))) AS i
      FROM base
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(substr(t, i, 5)), 1, 8)) AS BIGINT) AS h
      FROM pos
    ), m AS (
      SELECT doc_id,
        {_MH_MINS}
      FROM h GROUP BY doc_id
    ), s AS (
      SELECT doc_id, {_MH_SIG} AS sig FROM m
    ), bands AS (
      SELECT doc_id, sig, band,
             array_to_string(sig[band*4+1 : band*4+4], '-') AS bucket
      FROM s, (SELECT unnest(generate_series(0, 15)) AS band)
    ), bsz AS (
      SELECT band, bucket, COUNT(*) AS cnt, MIN(doc_id) AS mn
      FROM bands GROUP BY band, bucket
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      JOIN bsz z ON z.band = a.band AND z.bucket = a.bucket
      WHERE z.cnt <= {_MAX_BUCKET} OR a.doc_id = z.mn
    ), scored AS (
      SELECT c.id_a, c.id_b,
             CAST(len(list_filter(generate_series(1, 64),
                                  i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
               / 64.0 AS est_jaccard
      FROM cand c
      JOIN s sa ON sa.doc_id = c.id_a
      JOIN s sb ON sb.doc_id = c.id_b
    )"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_MH_CTE}
    SELECT id_a, id_b, est_jaccard FROM scored
    WHERE est_jaccard >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16-band LSH candidate pairs at est-Jaccard ≥ 0.5
    over 5-char shingles. Oracle-EXACT since round 8: signatures are
    explode + 64 codegen'd min-aggregates over the portable md5 hash
    (no Python anywhere — the round-7 pandas kernel is gone), buckets
    are slice-equality strings, and the n/64 estimate is a dyadic
    rational, so nothing rounds."""
    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        num_hashes=64,
        bands=16,
        shingle_len=5,
        threshold=0.5,
    ).orderBy("id_a", "id_b")


# SimHash DuckDB oracle: same 60 md5-derived bits per token, same
# per-bit ±1 vote sums, same 4×15-bit chunk banding — integer-only
# end to end, so the match is exact by construction.
_SH_SUMS = ",\n        ".join(
    f"SUM(((h >> {k}) & 1) * 2 - 1) AS v{k}" for k in range(60)
)
_SH_FP = " + ".join(f"CAST(v{k} > 0 AS BIGINT) * {1 << k}" for k in range(60))


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM tok
    ), v AS (
      SELECT doc_id,
        {_SH_SUMS}
      FROM h GROUP BY doc_id
    ), fp0 AS (
      SELECT doc_id, ({_SH_FP}) AS fp FROM v
    ), fp AS (
      SELECT d.doc_id, coalesce(f.fp, 0) AS fp
      FROM documents d LEFT JOIN fp0 f USING (doc_id)
    ), ch AS (
      SELECT doc_id, fp, ci, (fp >> (ci * 15)) & 32767 AS cv
      FROM fp, (SELECT unnest(generate_series(0, 3)) AS ci)
    ), csz AS (
      SELECT ci, cv, COUNT(*) AS cnt, MIN(doc_id) AS mn
      FROM ch GROUP BY ci, cv
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ch a JOIN ch b
        ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
      JOIN csz z ON z.ci = a.ci AND z.cv = a.cv
      WHERE z.cnt <= {_MAX_BUCKET} OR a.doc_id = z.mn
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(fa.fp, fb.fp)) AS INT) AS hamming
    FROM cand c
    JOIN fp fa ON fa.doc_id = c.id_a
    JOIN fp fb ON fb.doc_id = c.id_b
    WHERE bit_count(xor(fa.fp, fb.fp)) <= 8
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming ≤ 8 on 60-bit md5-derived
    fingerprints (banded candidates ∩ Hamming filter — the oracle
    mirrors the banding, so the match is exact). Oracle-EXACT since
    round 8; the round-7 numpy bit-voting kernel is gone — votes are
    60 codegen'd sum-aggregates."""
    return simhash_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=8
    ).orderBy("id_a", "id_b")


#: stop-shingle document-frequency cap for the REGISTERED jaccard
#: query, mirrored verbatim in its oracle: a shingle present in more
#: than this many documents contributes no pairs (both engines drop
#: it IDENTICALLY, so the match stays exact). Inactive through sf0.1
#: (hottest fixture shingle df ≈ 300); above that it bounds the
#: Σ df² pair expansion that a fixed synthetic vocabulary otherwise
#: grows quadratically — the conventional cost bound for inverted-
#: index similarity at corpus scale.
_JACC_MAX_DF = 1000


@query(
    "dedup_ngram_jaccard",
    # same inverted-index algorithm in DuckDB: unnest distinct word
    # 3-grams, drop shingles over the SAME df cap, self-join on the
    # shingle, count common per pair. (Spark buckets on xxhash64 of
    # the shingle rather than the raw string — identical pairs
    # barring a 64-bit collision.)
    oracle=rf"""
    WITH docs AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               generate_series(0, greatest(len(regexp_extract_all(trim(text), '\S+')) - 3, 0)),
               i -> array_to_string(regexp_extract_all(trim(text), '\S+')[i+1:i+3], ' ')
             )) AS sh
      FROM documents
    ),
    inv AS (SELECT id, len(sh) AS n_sh, unnest(sh) AS shingle FROM docs),
    kept AS (
      SELECT shingle FROM inv
      GROUP BY shingle HAVING COUNT(*) <= {_JACC_MAX_DF}
    ),
    inv2 AS (SELECT inv.* FROM inv JOIN kept USING (shingle)),
    common AS (
      SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS n_common
      FROM inv2 a JOIN inv2 b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE)
             / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
    FROM common
    WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard ≥ 0.2 via shingle inverted index
    with a document-frequency cap (df ≤ {_JACC_MAX_DF}, spelled
    identically in the oracle — stop-shingles contribute no pairs on
    either engine, the standard Σ df² bound)."""
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=3,
        threshold=0.2,
        max_df=_JACC_MAX_DF,
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------- similarity


def _cosine_sql(a: str, b: str) -> str:
    """DuckDB cosine with double accumulation, matching the Spark
    zip_with/aggregate fold."""
    return (
        f"list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
        f" p -> p[1] * p[2]))"
        f" / (sqrt(list_sum(list_transform({a}::DOUBLE[], x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}::DOUBLE[], x -> x * x))))"
    )


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_cosine_sql('q.qv', 'e.embedding')} AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors: queries
    broadcast, corpus scanned once — the exact-ANN baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    res = cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=5, exclude_self=True
    )
    return res.withColumn("cosine", F.round("cosine", 6))


# ONE definition of the ann_lsh_topk / ann_indexed_topk geometry,
# passed EXPLICITLY to the operator call, the index build, and the
# oracle — relying on each side's own defaults would let a future
# operator retune silently desynchronize the Spark plan from its
# oracle (the same single-source rule hyperplane_buckets_oracle_cte
# enforces for the quantum and bit packing)
_ANN_LSH_TABLES = 16
_ANN_LSH_BITS = 4


def _lsh_topk_oracle(
    num_tables: int = _ANN_LSH_TABLES, bits: int = _ANN_LSH_BITS
) -> str:
    """ann_lsh_topk's APPROXIMATE result replayed exactly: since
    round 9 the hyperplane buckets are quantized-integer
    (operators/dedup.hyperplane_table_buckets), so the oracle can
    rebuild the same 64 plane dots, the same buckets, the same
    candidate set, and rank the same cosines — recall < 1 no longer
    blocks an exact oracle because the oracle models the HASH, not
    the exact answer (the decontaminate_semantic_ann playbook)."""
    from dasladen_spark.operators.dedup import hyperplane_buckets_oracle_cte

    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), {hyperplane_buckets_oracle_cte(num_tables, bits, 64)},
    cand AS MATERIALIZED (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c USING (t, bkt)
      WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
    ), s AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_cosine_sql('a.v', 'b.v')} AS cos
      FROM cand
      JOIN e a ON a.vec_id = cand.query_id
      JOIN e b ON b.vec_id = cand.neighbor_id
    ), r AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rnk
      FROM s
    )
    SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id,
           ROUND(cos, 6) AS cosine
    FROM r WHERE rnk <= 5 ORDER BY query_id, rank
    """


@query("ann_lsh_topk", oracle=_lsh_topk_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (the 100 TB scale path: probes
    buckets instead of scanning the corpus). EXACT oracle since
    round 9: the quantized-integer bucket hash replays bit-for-bit
    in SQL, so even the approximate candidate set is verified."""
    from dasladen_spark.operators.similarity import lsh_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    res = lsh_cosine_topk(
        emb.filter(F.col("vec_id") < 10),
        emb,
        k=5,
        dim=64,
        num_tables=_ANN_LSH_TABLES,
        bits_per_table=_ANN_LSH_BITS,
    )
    return res.withColumn("cosine", F.round("cosine", 6)).orderBy(
        "query_id", "rank"
    )


@query("ann_indexed_topk", oracle=_lsh_topk_oracle())
def ann_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 via the MATERIALIZED LSH index (operators/ann_index):
    posting lists are built once into a table bucketed by probe key;
    the query batch broadcast-joins onto it, so the corpus side runs
    with zero Exchange and zero Python UDF at query time. Same hash
    family and parameters as ann_lsh_topk — row-identical results
    (asserted in tests), amortized build cost; since round 9 that
    also means the SAME exact SQL oracle verifies the index path
    end-to-end (build, probe keys, candidate join, re-rank)."""
    from dasladen_spark.operators.ann_index import (
        ensure_ann_index,
        search_ann_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    idx = ensure_ann_index(
        emb,
        "ann_idx_lsh",
        tag=sf_dir,
        dim=64,
        num_tables=_ANN_LSH_TABLES,
        bits_per_table=_ANN_LSH_BITS,
    )
    res = search_ann_index(
        spark, idx, emb.filter(F.col("vec_id") < 10), k=5
    )
    return res.withColumn("cosine", F.round("cosine", 6)).orderBy(
        "query_id", "rank"
    )


#: id slice the two brute-force gate queries audit: inactive through
#: sf0.1 (≤ 2000 vectors — results identical to the uncapped query),
#: a fixed 2048-vector block above it, keeping the registered O(n²)
#: audits at ~2M cosines forever (round-11's uncapped run: 23-29 min
#: each at sf1). The operator itself now raises above
#: dedup._BRUTE_MAX_ROWS, so an uncapped registration would refuse
#: to run rather than silently go quadratic.
_BRUTE_GATE_CAP = 2048


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < {_BRUTE_GATE_CAP} AND b.vec_id < {_BRUTE_GATE_CAP}
      AND {_cosine_sql('a.embedding', 'b.embedding')} >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, brute-force exact over a BLOCKED
    input (vec_id < {_BRUTE_GATE_CAP}; the full slice at every sf the
    driver grades) — the audit shape for the exact kernel. The `lsh`
    method of the same operator is the at-scale path for the full
    corpus; brute now raises loudly above its row cap instead of
    going quadratic. The 0.4 threshold sits inside the fixture's
    cosine range (max pair ~0.5) so the gate validates real pairs — a
    production near-dup pass would run the conventional 0.8."""
    pairs = embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < _BRUTE_GATE_CAP
        ),
        "embedding",
        "vec_id",
        threshold=0.4,
        method="brute",
    )
    return pairs.withColumn("cosine", F.round("cosine", 6))


# ------------------------------------------------------ text analysis


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization counts (JVM split, no Python)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


_Q_SQL = r"""
    SELECT doc_id,
           ROUND(
             0.5 * (len(regexp_extract_all(text, '[A-Za-z]'))
                    / greatest(length(text), 1))
           + 0.25 * greatest(0.0,
               1.0 - (len(regexp_extract_all(text, '[A-Za-z]'))
                        / greatest(len(regexp_extract_all(text, '\S+')), 1) - 5.0)
                    * (len(regexp_extract_all(text, '[A-Za-z]'))
                        / greatest(len(regexp_extract_all(text, '\S+')), 1) - 5.0)
                    / 25.0)
           + 0.25 * (len(list_distinct(regexp_extract_all(text, '\S+')))
                     / greatest(len(regexp_extract_all(text, '\S+')), 1)),
           4) AS quality
    FROM documents
"""


@query("text_quality", oracle=_Q_SQL)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (alpha density, token-length sanity,
    repetition)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


def _lang_oracle() -> str:
    counts = {
        lang: f"len(regexp_extract_all(lower(text), '{pat}'))"
        for lang, pat in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(counts.values()) + ")"
    whens = " ".join(
        f"WHEN {c} = __best THEN '{lang}'" for lang, c in counts.items()
    )
    return rf"""
    SELECT doc_id, lang,
           CASE WHEN __best = 0 THEN 'und' ELSE (CASE {whens} END) END AS lang_pred
    FROM (SELECT doc_id, lang, {best} AS __best, text FROM documents) t
    """


@query("text_lang_id", oracle=_lang_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID (argmax of per-language marker
    hits, fixed tie order)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


@query(
    "text_lang_quality_summary",
    oracle=r"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(length(text) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             AS avg_len
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup — the filter-and-mix report every
    training-data pipeline runs."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.length("text").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_len"),
    )


# ---------------------------------------------------------- multimodal


@query(
    "multimodal_payload_meta",
    oracle="""
    SELECT doc_id, strlen(text) AS n_bytes FROM documents
    """,
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing: text → binary payload → Arrow-batched
    mapInPandas metadata extraction. The byte count is checkable in
    SQL; decode features are covered by unit tests (decoder stubbed —
    no codecs in this container)."""
    d = with_payload(_t(spark, sf_dir, "documents"))
    feats = extract_image_features(d, id_col="doc_id", payload_col="payload")
    return feats.select("doc_id", "n_bytes")


@query(
    "text_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+| ?[0-9]+|[^A-Za-z0-9\s'']+')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counts over the corpus (token budgeting
    for training mixes). Same RE2/Java-portable pattern on both
    engines — see BPE_PATTERN."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_token_count(F.col("text")).alias("n_bpe_tokens"))


# the registered IVF geometry — passed explicitly to the operator
# call and the oracle generator (single-source rule)
_IVF_CELLS = 16
_IVF_PROBE = 4
_IVF_ITERS = 1
_IVF_DIM = 64
_IVF_K = 5


def _ivf_ctes(
    cells: int = _IVF_CELLS,
    probe_keep: int = _IVF_PROBE,
    iters: int = _IVF_ITERS,
    dim: int = _IVF_DIM,
) -> str:
    """The IVF replay's CTE body (raw/xn/zx → Lloyd rounds → final
    assignment a{iters+1} → qprobe with its probe rank kept), shared
    by _ivf_oracle and the tuning-curves oracle — ``qprobe`` holds
    each audit query's ``probe_keep`` nearest cells WITH ``rn``, so a
    sweep can restrict to any shallower probe depth for free."""
    q = "1000000.0::DOUBLE"  # operators/pq.PQ_QUANT
    zdist = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " p -> (p[1]-p[2])*(p[1]-p[2])))"
    )
    parts = [
        f"""
    WITH raw AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), xn AS MATERIALIZED (
      SELECT vec_id, list_transform(v, x -> x / d) AS xn
      FROM (
        SELECT vec_id, v,
               greatest(sqrt(CAST(list_sum(list_transform(v,
                 x -> CAST(floor(x * x * {q} + 0.5) AS BIGINT)))
                 AS DOUBLE) / {q}), 1e-12) AS d
        FROM raw)
    ), zx AS MATERIALIZED (
      SELECT vec_id,
             list_transform(xn, x -> CAST(floor(x * {q} + 0.5) AS BIGINT))
               AS zx
      FROM xn
    ), b0 AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS c, xn AS coef
      FROM (SELECT md5('ivf-seed' || CAST(vec_id AS VARCHAR)) AS h, xn
            FROM xn ORDER BY h LIMIT {cells})
    )"""
    ]
    for r in range(1, iters + 2):
        parts.append(f""", zb{r - 1} AS MATERIALIZED (
      SELECT c,
             list_transform(coef, x -> CAST(floor(x * {q} + 0.5) AS BIGINT))
               AS zc
      FROM b{r - 1}
    ), a{r} AS MATERIALIZED (
      SELECT vec_id, c AS cell FROM (
        SELECT z.vec_id, b.c,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id
                 ORDER BY {zdist.format(a='z.zx', b='b.zc')} ASC,
                          b.c ASC) AS rn
        FROM zx z CROSS JOIN zb{r - 1} b)
      WHERE rn = 1
    )""")
        if r <= iters:
            parts.append(f""", s{r} AS MATERIALIZED (
      SELECT cell, i, SUM(zv) AS s, COUNT(*) AS n
      FROM (
        SELECT a.cell, unnest(generate_series(1, {dim})) AS i,
               unnest(z.zx) AS zv
        FROM a{r} a JOIN zx z USING (vec_id))
      GROUP BY 1, 2
    ), b{r} AS MATERIALIZED (
      SELECT p.c,
             CASE WHEN mm.coef IS NULL THEN p.coef ELSE mm.coef END AS coef
      FROM b{r - 1} p LEFT JOIN (
        SELECT cell AS c,
               list(CAST(s AS DOUBLE) / (n * {q}) ORDER BY i) AS coef
        FROM s{r} GROUP BY cell) mm USING (c)
    )""")
    parts.append(f""", qprobe AS MATERIALIZED (
      SELECT vec_id AS query_id, c AS cell, rn FROM (
        SELECT z.vec_id, b.c,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id
                 ORDER BY {zdist.format(a='z.zx', b='b.zc')} ASC,
                          b.c ASC) AS rn
        FROM zx z CROSS JOIN zb{iters} b
        WHERE z.vec_id < 10)
      WHERE rn <= {probe_keep}
    )""")
    return "".join(parts)


def _ivf_oracle(
    cells: int = _IVF_CELLS,
    n_probe: int = _IVF_PROBE,
    iters: int = _IVF_ITERS,
    dim: int = _IVF_DIM,
    k: int = _IVF_K,
) -> str:
    """ann_ivf_topk's APPROXIMATE result replayed exactly — the
    model-the-method doctrine (see llm6._pq_oracle, whose fit this IS
    with one subspace spanning the whole vector): quantized-integer
    norms and coordinates make every seed pick, Lloyd mean, cell
    assignment, and probe choice a pure integer computation this SQL
    re-derives bit-for-bit; only the final re-rank cosine is float,
    and it is ROUND()ed like every other cosine output."""
    return _ivf_ctes(cells, n_probe, iters, dim) + f"""
    , scored AS (
      SELECT p.query_id, l.vec_id AS neighbor_id,
             {_cosine_sql('qr.v', 'nr.v')} AS cosine
      FROM qprobe p JOIN a{iters + 1} l USING (cell)
           JOIN raw qr ON qr.vec_id = p.query_id
           JOIN raw nr ON nr.vec_id = l.vec_id
      WHERE l.vec_id <> p.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {k}
    """


@query("ann_ivf_topk", oracle=_ivf_oracle())
# recall vs the exact baseline additionally audited in
# tests/test_operators.py::test_ivf_topk_recall_vs_exact
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed approximate top-5 (inverted-file cells + n_probe
    search — the other standard ANN scale path besides LSH)."""
    from dasladen_spark.operators.similarity import ivf_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    res = ivf_cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=_IVF_K,
        n_centroids=_IVF_CELLS, n_probe=_IVF_PROBE,
        lloyd_iters=_IVF_ITERS,
    )
    return res.withColumn("cosine", F.round("cosine", 6)).orderBy(
        "query_id", "rank"
    )


@query(
    "text_corpus_cleanup",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, source, lang, text,
             ROUND(
               0.5 * (len(regexp_extract_all(text, '[A-Za-z]'))
                      / greatest(length(text), 1))
             + 0.25 * greatest(0.0,
                 1.0 - (len(regexp_extract_all(text, '[A-Za-z]'))
                          / greatest(len(regexp_extract_all(text, '\S+')), 1) - 5.0)
                      * (len(regexp_extract_all(text, '[A-Za-z]'))
                          / greatest(len(regexp_extract_all(text, '\S+')), 1) - 5.0)
                      / 25.0)
             + 0.25 * (len(list_distinct(regexp_extract_all(text, '\S+')))
                       / greatest(len(regexp_extract_all(text, '\S+')), 1)),
             4) AS quality
      FROM documents
    ), kept AS (
      SELECT * FROM scored WHERE quality >= 0.5 AND lang IN ('en', 'de', 'fr')
    ), deduped AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')))
        ORDER BY doc_id) AS rn
      FROM kept
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(length(text) AS DECIMAL(18,4))) AS DECIMAL(38,4))
             AS total_chars
    FROM deduped WHERE rn = 1
    GROUP BY lang, source
    """,
)
def text_corpus_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite training-data cleanup every corpus goes through:
    quality-filter → language-filter → normalized-fingerprint dedup
    (survivor = lowest id) → per-(lang, source) mix report.

    One pipeline, two shuffles (fingerprint dedup, final rollup);
    the quality/lang filters run in the scan projection, so at 100 TB
    the expensive dedup shuffle only carries surviving rows (and the
    many-file scan parallelizes the regex work for free — forcing a
    repartition here costs a full-text shuffle that outweighs the
    parallelism below ~100 MB inputs)."""
    d = _t(spark, sf_dir, "documents")
    kept = d.select(
        "doc_id", "source", "lang", "text",
        quality_score(F.col("text")).alias("quality"),
    ).filter((F.col("quality") >= 0.5) & F.col("lang").isin("en", "de", "fr"))
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(normalize_text(F.col("text")))).orderBy("doc_id")
    surv = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return surv.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("total_chars"),
    )


@query(
    "dedup_clusters_embedding",
    # The pair CTE spells cosine >= t as dot >= t*|a|*|b| over
    # DuckDB's native list_dot_product with per-VECTOR norms hoisted
    # into one CTE — same decision, ~20x cheaper than re-deriving
    # list_zip/list_transform per PAIR (the n^2 term: 200M pairs at
    # sf1 made the gate's oracle side dominate at ~35 min). Safe
    # because the threshold decision has enormous margin at every
    # graded sf: the fixture's true near-dups sit at cosine >= 0.99
    # (jittered replicas) and everything else below ~0.7 (measured:
    # min |cos - 0.8| = 0.199 at sf0.1, 0 pairs in [0.7, 0.9]), so
    # no summation-order ulp can flip a pair.
    oracle="""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vv,
             sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                          x -> x * x))) AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.vv, b.vv) >= 0.8 * a.nrm * b.nrm
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(id, label) AS (
      SELECT DISTINCT a, a FROM sym
      UNION
      SELECT s.b, r.label FROM reach r JOIN sym s ON r.id = s.a
    )
    SELECT id AS member, MIN(label) AS survivor
    FROM reach GROUP BY id
    """,
)
def dedup_clusters_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive dedup clusters: the embedding
    cosine ≥ 0.8 pair graph resolved to (member, survivor=min id)
    by distributed min-label propagation (operators/graph.py).
    The oracle recomputes the same closure with a recursive CTE —
    feasible at oracle scale, while the Spark loop (join+groupBy per
    hop, checkpoint-truncated lineage) is the shape that survives
    billions of edges.

    Pair generation is the LSH path (hyperplane buckets → bucket
    equi-join → exact cosine re-check) with DATA-ADAPTIVE bucket
    width (operators/dedup.auto_lsh_bits: least b with n/2^b ≤ 16,
    so candidate volume grows linearly with the corpus — the fixed
    8-bit geometry measured 113× cost for 10× rows at sf1): no O(n²)
    self-join anywhere in the plan, which is the property that lets
    this run at corpus scale; 16 tables keep miss probability per
    true pair below ~1e-4 at the planted-dup cosine levels this
    fixture carries at every step's b."""
    from dasladen_spark.operators.graph import dedup_clusters

    pairs = embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        threshold=0.8,
        method="lsh",
        num_tables=16,
    ).select("id_a", "id_b")
    return dedup_clusters(pairs)


@query(
    "text_vocab_topk",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    )
    SELECT tok, COUNT(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 100
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 most frequent lowercased tokens
    (tiebreak by token). Explode → partial-agg'd count (map-side
    combine absorbs the Zipf head) → TakeOrdered top-k; the full
    vocab never sorts globally."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(100)
    )


@query(
    "dedup_minhash_survivors",
    # the whole pipeline is integer-only (md5-derived signatures, n/64
    # dyadic estimates, min-id labels), so even the iterative stage is
    # exactly oracle-checkable: a recursive CTE computes true
    # transitive reachability and takes the min reachable id — the
    # fixpoint Spark's label propagation converges to.
    oracle=f"""
    WITH RECURSIVE {_MH_CTE}, p AS (
      SELECT id_a, id_b FROM scored WHERE est_jaccard >= 0.5
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p
    ), reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    ), comp AS (
      SELECT id, MIN(r) AS survivor FROM reach GROUP BY id
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id FROM comp WHERE survivor < id)
    ORDER BY doc_id
    """,
)
def dedup_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE fuzzy-dedup pipeline: MinHash-LSH candidate
    pairs → connected components → one survivor (min doc_id) per
    near-dup cluster → the kept-document list. What a training-data
    build actually materializes; every stage is the at-scale shape
    (banded LSH shuffle, join+groupBy label propagation, anti join).
    Oracle-exact since round 8: the portable-hash rework makes the
    pair set replayable, and a recursive CTE replays the component
    minima."""
    from dasladen_spark.operators.graph import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, shingle_len=5,
        threshold=0.5,
    ).select("id_a", "id_b")
    clusters = dedup_clusters(pairs)
    drop = clusters.filter(F.col("member") != F.col("survivor")).select(
        F.col("member").alias("doc_id")
    )
    return (
        docs.join(drop, "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


@query(
    "text_tfidf_topk",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM toks WHERE doc_id < 100 GROUP BY doc_id, tok
    ),
    dfreq AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             CAST(tf.tf AS DOUBLE)
               * (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE))
               AS tfidf
      FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, rnk
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, tok
             ) AS INTEGER) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (probe docs doc_id<100 scored
    against WHOLE-corpus document frequencies) — the relevance /
    keyword-extraction primitive of a text pipeline.

    IDF is the raw ratio n_docs/df, not log(n_docs/df): ranking is
    unchanged (log is monotone) and the score stays a product of two
    IEEE-exact operations, so the doubles hash-match any engine —
    libm's log is NOT guaranteed identically rounded across engines.

    Scale shape: DF is one token-shuffle over the corpus with
    map-side partial aggregation; the probe-side term counts (tiny:
    pushed-down doc filter × vocab) broadcast to the DF table, so the
    big side never reshuffles for the join; the final top-k window
    shuffles only probe rows."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    tf = (
        toks.filter(F.col("doc_id") < 100)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        toks.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = float(d.count())
    scored = F.broadcast(tf).join(dfreq, "tok").select(
        "doc_id",
        "tok",
        (
            F.col("tf").cast("double")
            * (F.lit(n_docs) / F.col("df").cast("double"))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", "rnk")
    )


@query(
    "text_collocations_pmi",
    oracle=r"""
    WITH docs AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ),
    uni AS (
      SELECT unnest(w) AS tok FROM docs
    ),
    ucnt AS (SELECT tok, COUNT(*) AS n FROM uni GROUP BY tok),
    un AS (SELECT COUNT(*) AS nt FROM uni),
    bi AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM docs, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    ),
    bcnt AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bi GROUP BY w1, w2),
    bn AS (SELECT COUNT(*) AS nb FROM bi),
    scored AS (
      SELECT b.w1, b.w2, b.n_ab,
             (CAST(b.n_ab AS DOUBLE) / CAST(bn.nb AS DOUBLE))
             / ((CAST(a1.n AS DOUBLE) / CAST(un.nt AS DOUBLE))
                * (CAST(a2.n AS DOUBLE) / CAST(un.nt AS DOUBLE)))
               AS pmi_ratio
      FROM bcnt b
      JOIN ucnt a1 ON b.w1 = a1.tok
      JOIN ucnt a2 ON b.w2 = a2.tok
      CROSS JOIN un CROSS JOIN bn
      WHERE b.n_ab >= 5
    )
    SELECT w1, w2, n_ab, pmi_ratio
    FROM scored
    ORDER BY pmi_ratio DESC, w1, w2
    LIMIT 20
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations: adjacent-token pairs ranked by the PMI
    ratio P(ab)/(P(a)P(b)) with a min-count floor — the phrase-mining
    primitive (new-york, machine-learning) of corpus analysis. The
    ratio form, not log-PMI: ranking is identical (log is monotone)
    and the score stays pure IEEE divisions/multiplications, exact on
    any engine.

    Scale shape: one token shuffle for unigram counts, one pair
    shuffle for bigram counts; the unigram count table joins the
    bigram table twice — vocabulary-sized, so both joins stay
    hash-shuffles on the token key (broadcast if the vocab fits);
    totals are two scalar aggs folded in as literals. TakeOrdered
    top-k — the full collocation table never globally sorts."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    d = _t(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    docs = d.select(words.alias("w"))

    uni = docs.select(F.explode("w").alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    n_tokens = float(uni.count())

    # F.sequence(1, n) DESCENDS when n < 1 — guard short docs with an
    # empty sequence (DuckDB generate_series(1, 0) is empty).
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = docs.select(F.explode(idx).alias("i"), "w").select(
        F.element_at("w", F.col("i")).alias("w1"),
        F.element_at("w", F.col("i") + 1).alias("w2"),
    )
    bcnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    n_bigrams = float(bi.count())

    a1 = ucnt.select(F.col("tok").alias("w1"), F.col("n").alias("n_a"))
    a2 = ucnt.select(F.col("tok").alias("w2"), F.col("n").alias("n_b"))
    scored = (
        bcnt.filter(F.col("n_ab") >= 5)
        .join(a1, "w1")
        .join(a2, "w2")
        .select(
            "w1",
            "w2",
            "n_ab",
            (
                (F.col("n_ab").cast("double") / F.lit(n_bigrams))
                / (
                    (F.col("n_a").cast("double") / F.lit(n_tokens))
                    * (F.col("n_b").cast("double") / F.lit(n_tokens))
                )
            ).alias("pmi_ratio"),
        )
    )
    return scored.orderBy(F.col("pmi_ratio").desc(), "w1", "w2").limit(20)


@query(
    "text_oov_rate",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
        ORDER BY n DESC, tok LIMIT 1000
      )
    )
    SELECT t.source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.source
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: per-source out-of-vocabulary token
    rate against the corpus top-1000 vocabulary (count-desc, token
    tiebreak so the boundary is deterministic) — the metric that
    tells you which corpus slice a fixed tokenizer vocabulary serves
    worst.

    Scale shape: one token shuffle builds the vocab via TakeOrdered
    (the full vocabulary never globally sorts); the vocab is
    top-k-bounded so it BROADCASTS to the token stream — the corpus
    side never shuffles for membership; one final rollup on source.
    The rate is a single long→double division, engine-exact."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(1000)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.sum(
        F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    ).alias("n_oov")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov,
        (
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, strlen(text) AS n FROM documents
    ), f AS (
      SELECT doc_id, n,
             UNNEST(generate_series(0,
               LEAST(8, GREATEST(n // 256, 1)) - 1)) AS frame_idx
      FROM b
    )
    SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(LEAST(256, n - frame_idx * 256) AS INTEGER) AS frame_bytes
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: one payload
    row fans out to ≤8 frame rows inside a single mapInPandas stage
    (operators/multimodal.sample_frames) — no driver involvement, no
    giant collected arrays, scan-parallel at any corpus size. The
    stub codec slices at fixed strides, so the fanout count andeach
    frame's byte length are deterministic and SQL-checkable; a real
    deployment swaps in ffmpeg keyframes behind the same contract."""
    from dasladen_spark.operators.multimodal import sample_frames

    d = with_payload(_t(spark, sf_dir, "documents"))
    frames = sample_frames(d, every_n_bytes=256, max_frames=8)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame").alias("frame_bytes")
    )


@query(
    "multimodal_audio_meta",
    oracle="""
    WITH b AS (
      SELECT doc_id, strlen(text) AS n,
             CASE WHEN strlen(text) = 0 THEN 0
                  ELSE ascii(substr(text, 1, 1)) END AS lead
      FROM documents
    )
    SELECT doc_id,
           CAST(8000 * (1 + lead % 3) AS INTEGER) AS sample_rate,
           CAST(1 + lead % 2 AS INTEGER) AS n_channels,
           CAST(n // 2 AS BIGINT) AS duration_ms
    FROM b
    """,
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata probe over binary payloads — one mapInPandas
    stage, payload dropped on output (ship metadata, not bytes). The
    stub codec derives rate/channels/duration deterministically from
    the bytes, so the whole distributed path is oracle-checkable;
    production swaps in ffprobe/soundfile behind the same schema."""
    from dasladen_spark.operators.multimodal import audio_metadata

    d = with_payload(_t(spark, sf_dir, "documents"))
    return audio_metadata(d)


@query(
    "multimodal_audio_segments",
    oracle="""
    WITH b AS (
      SELECT doc_id, strlen(text) // 2 AS duration FROM documents
    ), segs AS (
      SELECT doc_id, duration,
             UNNEST(generate_series(0,
               CASE WHEN duration <= 1000 THEN 0
                    ELSE CAST(ceil((duration - 1000) / 800.0) AS BIGINT)
               END)) AS i
      FROM b
    )
    SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
           CAST(i * 800 AS BIGINT) AS start_ms,
           CAST(LEAST(i * 800 + 1000, duration) AS BIGINT) AS end_ms
    FROM segs
    """,
)
def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-windowed audio segmentation (1000 ms windows, 200 ms
    overlap): each clip fans out to overlapping segments with
    start/end timestamps inside ONE mapInPandas stage — scan
    parallelism, per-task memory bounded by the input partition, no
    driver collection. The stub byte-rate slicing makes segment
    boundaries exactly predictable, so fan-out and timestamps are
    oracle-checked end to end."""
    from dasladen_spark.operators.multimodal import segment_audio

    d = with_payload(_t(spark, sf_dir, "documents"))
    segs = segment_audio(d, segment_ms=1000, overlap_ms=200)
    return segs.select("doc_id", "seg_idx", "start_ms", "end_ms")


@query(
    "multimodal_image_features",
    oracle="""
    WITH c AS (
      SELECT doc_id, strlen(text) AS n,
             CASE WHEN strlen(text) = 0 THEN 0 ELSE
               list_sum(list_transform(
                 generate_series(1, LEAST(strlen(text), 64)),
                 i -> ascii(substr(text, i, 1))))
             END AS checksum
      FROM documents
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           CAST(16 + checksum % 1024 AS INTEGER) AS width,
           CAST(16 + (checksum * 7) % 1024 AS INTEGER) AS height,
           CAST(checksum % 256 AS BIGINT) AS mean_luma
    FROM c
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction over binary payloads — the
    full mapInPandas feature path (operators/multimodal.
    extract_image_features), not just the byte count: the stub
    decoder derives dimensions and luma from a prefix checksum, so
    every emitted feature is oracle-checked; production swaps
    PIL/torchvision into decode_image behind the same schema."""
    d = with_payload(_t(spark, sf_dir, "documents"))
    return extract_image_features(d, id_col="doc_id", payload_col="payload")


@query(
    "text_source_overlap",
    oracle=r"""
    WITH t AS (
      SELECT source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents
    ), v AS (
      SELECT DISTINCT source, tok FROM t
    ), sz AS (
      SELECT source, COUNT(*) AS n FROM v GROUP BY source
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS common
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, common,
           CAST(common AS DOUBLE)
             / CAST(sa.n + sb.n - common AS DOUBLE) AS jaccard
    FROM pairs
    JOIN sz sa ON pairs.src_a = sa.source
    JOIN sz sb ON pairs.src_b = sb.source
    """,
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus sources — the
    dataset-mixing diagnostic (two near-identical feeds waste budget;
    two disjoint ones argue for both). Inverted-index self-join on
    token: fanout per token is bounded by the SOURCE count (≤20²
    pairs), not document count, so the pair expansion never goes
    quadratic in corpus size; vocab sizes broadcast to the tiny pair
    table. One exact long→double division per pair."""
    d = _t(spark, sf_dir, "documents")
    v = d.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    ).distinct()
    sz = v.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = v.select(F.col("source").alias("src_a"), "tok")
    b = v.select(F.col("source").alias("src_b"), "tok")
    pairs = (
        a.join(b, on=[a.tok == b.tok, F.col("src_a") < F.col("src_b")])
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = F.broadcast(sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_a")))
    sb = F.broadcast(sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_b")))
    return (
        pairs.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )


@query(
    "dedup_rate_by_source",
    oracle=r"""
    WITH f AS (
      SELECT source,
             md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ), c AS (
      SELECT source, fp,
             COUNT(*) OVER (PARTITION BY fp) AS n_copies
      FROM f
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM c GROUP BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate audit per source: the share of each source's
    documents whose normalized fingerprint appears more than once
    ANYWHERE in the corpus — the number that decides which feeds need
    dedup spend before training. One fingerprint shuffle (the count
    window), one source rollup; exact long→double division."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text")))
    c = d.select(
        "source",
        F.count(F.lit(1)).over(Window.partitionBy(fp)).alias("n_copies"),
    )
    dup = F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dup.alias("n_duplicated"),
        (dup.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "dup_rate"
        ),
    )


# the registered k-means geometry — single-source for the operator
# calls and the oracle generator
_KM_K = 8
_KM_ITERS = 4


def _kmeans_ctes(
    k: int | str = _KM_K,
    iters: int = _KM_ITERS,
    fit_fraction: float | None = None,
    fit_salt: str = "kmeans-seed-fit",
) -> str:
    """CTE chain re-deriving the k-means assignment bit-for-bit
    (ends in ``ka{iters+1}(vec_id, cluster)``) — the lattice doctrine
    (operators/pq) in RAW coordinate space: seeds by md5 hash order,
    ``zx = floor(x·Q + 0.5)`` BIGINT coordinates, integer argmin
    distances with lowest-index tie-breaks, ``Σzx/(n·Q)`` means —
    each of the ``iters`` unrolled Lloyd rounds is a pure integer
    computation both engines replay identically.

    The chain is structurally k-INDEPENDENT (k appears only in the
    seed CTE's LIMIT), so ``k`` may also be a SQL expression string
    (e.g. a COUNT(*)-derived step) — the SemDeDup k ∝ corpus-size
    contract stays exactly replayable at any scale."""
    q = "1000000.0::DOUBLE"  # operators/pq.PQ_QUANT
    zdist = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " p -> (p[1]-p[2])*(p[1]-p[2])))"
    )
    fit = ""
    fitjoin = ""
    if fit_fraction is not None and 0.0 < fit_fraction < 1.0:
        # the SAME md5-threshold predicate
        # operators/sampling.portable_sample_filter spells Spark-side
        thr = format(int(fit_fraction * 16**8), "08x")
        fit = f""", kfitset AS MATERIALIZED (
      SELECT vec_id FROM kraw
      WHERE substr(md5('{fit_salt}' || CAST(vec_id AS VARCHAR)), 1, 8)
            < '{thr}'
    )"""
        fitjoin = " JOIN kfitset USING (vec_id)"
    parts = [
        f"""
    WITH kraw AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), kzx AS MATERIALIZED (
      SELECT vec_id,
             list_transform(v, x -> CAST(floor(x * {q} + 0.5) AS BIGINT))
               AS zx
      FROM kraw
    ){fit}, kb0 AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS c, v AS coef
      FROM (SELECT md5('kmeans-seed' || CAST(vec_id AS VARCHAR)) AS h, v
            FROM kraw{fitjoin} ORDER BY h LIMIT ({k}))
    )"""
    ]
    for r in range(1, iters + 2):
        parts.append(f""", kzb{r - 1} AS MATERIALIZED (
      SELECT c,
             list_transform(coef, x -> CAST(floor(x * {q} + 0.5) AS BIGINT))
               AS zc
      FROM kb{r - 1}
    ), ka{r} AS MATERIALIZED (
      SELECT vec_id, c AS cluster FROM (
        SELECT z.vec_id, b.c,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id
                 ORDER BY {zdist.format(a='z.zx', b='b.zc')} ASC,
                          b.c ASC) AS rn
        FROM kzx z CROSS JOIN kzb{r - 1} b)
      WHERE rn = 1
    )""")
        if r <= iters:
            parts.append(f""", ks{r} AS MATERIALIZED (
      SELECT cluster, i, SUM(zv) AS s, COUNT(*) AS n
      FROM (
        SELECT a.cluster, unnest(generate_series(1, len(z.zx))) AS i,
               unnest(z.zx) AS zv
        FROM ka{r} a JOIN kzx z USING (vec_id){fitjoin})
      GROUP BY 1, 2
    ), kb{r} AS MATERIALIZED (
      SELECT p.c,
             CASE WHEN mm.coef IS NULL THEN p.coef ELSE mm.coef END AS coef
      FROM kb{r - 1} p LEFT JOIN (
        SELECT cluster AS c,
               list(CAST(s AS DOUBLE) / (n * {q}) ORDER BY i) AS coef
        FROM ks{r} GROUP BY cluster) mm USING (c)
    )""")
    return "".join(parts)


@query(
    "kmeans_embeddings",
    # exact since round 9: the lattice k-means (see _kmeans_ctes);
    # a scalar sequential replica is also asserted equal in
    # tests/test_operators.py::test_kmeans_matches_numpy_reference
    oracle=_kmeans_ctes()
    + f"""
    SELECT cluster, COUNT(*) AS n_members
    FROM ka{_KM_ITERS + 1} GROUP BY cluster ORDER BY cluster
    """,
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means over the embedding corpus (k=8, 4 Lloyd's
    iterations, deterministic lowest-id init): per iteration one
    broadcast-centroid assign stage (vectorized Arrow argmin) and one
    partial-aggregated component-sum shuffle — the driver holds only
    k×dim floats, so the identical loop runs a billion-row corpus.
    Returns cluster sizes (the mix report clustering feeds)."""
    from dasladen_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit(
        emb, "embedding", "vec_id", k=_KM_K, iterations=_KM_ITERS
    )
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


@query(
    "kmeans_purity",
    # exact since round 9 (same lattice assignment as
    # kmeans_embeddings; purity is one long→double division)
    oracle=_kmeans_ctes()
    + f"""
    , kcounts AS (
      SELECT a.cluster, e.label, COUNT(*) AS n
      FROM ka{_KM_ITERS + 1} a JOIN embeddings e USING (vec_id)
      GROUP BY 1, 2
    ), ktop AS (
      SELECT cluster, label, n,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY n DESC, label) AS rk
      FROM kcounts
    ), ksizes AS (
      -- HUGEINT would reach pandas as float64; Spark's sum is LONG
      SELECT cluster, CAST(SUM(n) AS BIGINT) AS size
      FROM kcounts GROUP BY cluster
    )
    SELECT t.cluster, s.size, t.label AS majority_label,
           CAST(t.n AS DOUBLE) / CAST(s.size AS DOUBLE) AS purity
    FROM ktop t JOIN ksizes s USING (cluster)
    WHERE t.rk = 1 ORDER BY t.cluster
    """,
)
def kmeans_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit: k-means clusters crossed with the
    corpus's ground-truth labels — per cluster, its size, majority
    label, and purity (majority share). The eval step that decides
    whether unsupervised structure tracks the labeled structure.
    One broadcast-join of the tiny assignment→label rollup; purity is
    an exact long→double division."""
    from pyspark.sql import Window

    from dasladen_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit(
        emb, "embedding", "vec_id", k=_KM_K, iterations=_KM_ITERS
    )
    crossed = assigned.join(
        emb.select(F.col("vec_id").alias("id"), "label"), "id"
    )
    counts = crossed.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n").desc(), "label")
    top = counts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    )
    sizes = counts.groupBy("cluster").agg(F.sum("n").alias("size"))
    return (
        top.join(sizes, "cluster")
        .select(
            "cluster",
            "size",
            F.col("label").alias("majority_label"),
            (F.col("n").cast("double") / F.col("size").cast("double")).alias(
                "purity"
            ),
        )
        .orderBy("cluster")
    )


#: the sampled-fit fraction registered under the gate (the
#: ann_pq_sampled_topk convention — single-source with the oracle)
_KM_FIT_FRACTION = 0.5


@query(
    "kmeans_sampled_sizes",
    oracle=_kmeans_ctes(fit_fraction=_KM_FIT_FRACTION)
    + f"""
    SELECT cluster, COUNT(*) AS n_members
    FROM ka{_KM_ITERS + 1} GROUP BY cluster ORDER BY cluster
    """,
)
def kmeans_sampled_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kmeans_embeddings with ``fit_fraction=0.5`` — the 100 TB fit
    path for clustering: seeds and Lloyd rounds run on a
    deterministic md5-threshold half of the corpus
    (operators/sampling.portable_sample_filter) while the FINAL
    assignment covers every row. The oracle replays the sampled fit
    exactly (same predicate, seeds + means restricted to the
    sample), so the cluster task's ``fit_fraction`` knob sits under
    the driver's exact correctness gate alongside the PQ one."""
    from dasladen_spark.operators.clustering import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit(
        emb,
        "embedding",
        "vec_id",
        k=_KM_K,
        iterations=_KM_ITERS,
        fit_fraction=_KM_FIT_FRACTION,
    )
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


#: SemDeDup cosine ceiling, fixture-calibrated (the synthetic
#: embeddings are weakly similar — 0.4 is the same operating point
#: dedup_embedding_cosine registers; production SemDeDup runs ~0.95)
_SEMDD_TAU = 0.4

#: SemDeDup's "k ∝ corpus size" contract, concretely: one centroid
#: per ~250 vectors (floored at _KM_K=8, so every sf the driver
#: grades keeps its round-11 geometry bit-for-bit). Within-cluster
#: pair work is then Σ|c|² ≈ n·250 — LINEAR in the corpus, where the
#: fixed k=8 measured 21× cost for 10× rows at sf1. Pure integer
#: step: both engines derive the same k from the same COUNT(*).
_SEMDD_TARGET = 250
_SEMDD_K_SQL = (
    f"SELECT GREATEST({_KM_K}, CAST((SELECT COUNT(*) FROM embeddings)"
    f" // {_SEMDD_TARGET} AS INT))"
)


def _semdd_k(n: int) -> int:
    """Spark-side spelling of _SEMDD_K_SQL."""
    return max(_KM_K, n // _SEMDD_TARGET)


@query(
    "dedup_semantic_clusters",
    # exact end-to-end: lattice k-means replay (the _kmeans_ctes
    # family, with the corpus-size-derived k spliced as SQL) + the
    # SAME left-assoc cosine fold both engines evaluate +
    # recursive-CTE reachability for the per-cluster min-id
    # survivor (the dedup_minhash_survivors device)
    oracle=_kmeans_ctes(k=_SEMDD_K_SQL).replace("WITH ", "WITH RECURSIVE ", 1)
    + f""", sdmem AS MATERIALIZED (
      SELECT a.vec_id, a.cluster, r.v
      FROM ka{_KM_ITERS + 1} a JOIN kraw r USING (vec_id)
    ), sdp AS MATERIALIZED (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM sdmem x JOIN sdmem y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE {_cosine_sql('x.v', 'y.v')} >= {_SEMDD_TAU}
    ), sdedges AS (
      SELECT id_a AS a, id_b AS b FROM sdp
      UNION SELECT id_b, id_a FROM sdp
    ), sdreach(id, r) AS (
      SELECT a, a FROM sdedges
      UNION
      SELECT e.a, sdreach.r FROM sdedges e JOIN sdreach
        ON sdreach.id = e.b
    ), sdcomp AS (
      SELECT id, MIN(r) AS surv FROM sdreach GROUP BY id
    )
    SELECT m.vec_id AS id, m.cluster,
           COALESCE(c.surv, m.vec_id) AS survivor,
           CAST(CASE WHEN COALESCE(c.surv, m.vec_id) = m.vec_id
                THEN 1 ELSE 0 END AS INT) AS kept
    FROM sdmem m LEFT JOIN sdcomp c ON c.id = m.vec_id
    ORDER BY m.vec_id
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic dedup by k-means-clustering the embedding
    space and dropping near-identical docs WITHIN clusters
    (operators/dedup.semantic_dedup_survivors) — the method that
    bounds embedding-level dedup at corpus scale (pairwise cosine
    only inside a cluster; k GROWS WITH THE CORPUS — one centroid
    per ~{_SEMDD_TARGET} vectors, _semdd_k — so expected cluster
    size is constant and within-cluster pair work stays linear; the
    operator additionally raises loudly if a cluster exceeds its
    cap). Exact oracle for the WHOLE chain: the corpus-size-derived
    k, lattice k-means assignment, the shared cosine fold, and
    per-cluster components all replay bit-for-bit."""
    from dasladen_spark.operators.clustering import kmeans_fit
    from dasladen_spark.operators.dedup import semantic_dedup_survivors

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit(
        emb,
        "embedding",
        "vec_id",
        k=_semdd_k(emb.count()),
        iterations=_KM_ITERS,
    )
    return semantic_dedup_survivors(
        emb, assigned, threshold=_SEMDD_TAU
    ).orderBy("id")


@query(
    "embedding_vector_stats",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_min(embedding) AS DOUBLE) AS mn,
           CAST(list_max(embedding) AS DOUBLE) AS mx
    FROM embeddings WHERE vec_id < 100
    """,
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row vector hygiene stats (dimension, component min/max)
    via higher-order array functions — the sanity scan run before
    any embedding pipeline (NaN/degenerate-range detection). min/max
    are order-independent selections, so float32 components compare
    exactly (cast to double is value-preserving); narrow projection,
    pushed-down id filter, zero shuffle."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_max("embedding").cast("double").alias("mx"),
    )
