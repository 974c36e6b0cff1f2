"""Training-data pipeline queries, part 2: corpus sharding, chunking,
decontamination, repetition flags, PII-style redaction.

Like plans/llm.py these are north-star extensions absent from the
reference (its query power is delegated SQL, /root/reference/dasladen/
task.py:94-107); every shape here is written scale-first — narrow
per-row transforms stay in whole-stage codegen, the only shuffles are
the ones the semantics require (one range shuffle for the global
shard order, one hash shuffle on n-grams for decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.operators.ranking import global_row_number
from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

_N_SHARDS = 8
_CHUNK = 64  # words per training chunk
_STRIDE = 48  # 16-word overlap between consecutive chunks
_NGRAM = 8  # decontamination n-gram width


@query(
    "train_shuffle_shards",
    oracle=f"""
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                   doc_id) AS BIGINT) AS pos,
           CAST((ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                    doc_id) - 1) % {_N_SHARDS} AS INTEGER)
             AS shard_id
    FROM documents
    """,
)
def train_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every
    document gets a pseudorandom-but-reproducible position (order by
    md5 of its id) and a round-robin shard assignment.

    The total order comes from operators/ranking.global_row_number —
    range partition on the hash key + per-partition numbering + tiny
    broadcast offsets — NOT a single-partition window, so the same
    plan shuffles a 100 TB corpus with every executor numbering its
    own range. Round-robin on the hashed order gives shards that are
    unbiased samples of the corpus (no topical clustering by id)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("shuffle_key")
    )
    ranked = global_row_number(
        d, [F.col("shuffle_key"), F.col("doc_id")], out_col="pos"
    )
    return ranked.select(
        "doc_id",
        "shuffle_key",
        F.col("pos").cast("bigint").alias("pos"),
        ((F.col("pos") - 1) % _N_SHARDS).cast("int").alias("shard_id"),
    )


@query(
    "doc_chunks",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS words
      FROM documents
    )
    SELECT w.doc_id,
           CAST(t.i AS INTEGER) AS chunk_start,
           array_to_string(w.words[t.i:t.i + {_CHUNK - 1}], ' ')
             AS chunk_text,
           CAST(len(w.words[t.i:t.i + {_CHUNK - 1}]) AS INTEGER)
             AS chunk_tokens
    FROM w, UNNEST(generate_series(
        1, greatest(len(w.words) - {_CHUNK - 1}, 1), {_STRIDE})) AS t(i)
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split each document into
    {_CHUNK}-word training chunks with a {_STRIDE}-word stride
    (overlap keeps context across chunk boundaries); short documents
    yield one (possibly partial) chunk.

    Pure narrow transform — split, generate starts, explode, slice —
    no shuffle at all, so it scales linearly with input bytes and
    stays entirely inside whole-stage codegen. The explode fan-out is
    bounded (~n_words/stride per doc), never quadratic."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("words") - F.lit(_CHUNK - 1), F.lit(1)),
        F.lit(_STRIDE),
    )
    chunk = F.slice(F.col("words"), F.col("i"), _CHUNK)
    return (
        w.select("doc_id", "words", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_start"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).cast("int").alias("chunk_tokens"),
        )
    )


@query(
    "decontaminate_ngrams",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS words
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(words) - {_NGRAM - 1}, 0)),
               i -> array_to_string(words[i:i + {_NGRAM - 1}], ' '))) AS ng
      FROM w
    ), bench AS (
      SELECT DISTINCT ng FROM g WHERE doc_id % 7 = 0
    ), train AS (
      SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % 7 <> 0
    )
    SELECT t.doc_id, COUNT(*) AS n_hits
    FROM train t JOIN bench b USING (ng)
    GROUP BY t.doc_id
    """,
)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    {_NGRAM}-gram with the held-out benchmark slice (doc_id % 7 = 0
    stands in for the benchmark corpus), reporting the count of
    distinct contaminated n-grams per document.

    Scale shape: the benchmark n-gram set is de-duplicated and
    BROADCAST (benchmarks are MBs even when the corpus is TBs), so
    the training side never shuffles — each task filters its own
    n-grams against the broadcast hash set, then one partial+final
    count per doc. Distinct-per-doc before the join bounds the fan-in
    at |matching n-grams|, not |occurrences|."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    grams = F.when(
        F.size("words") >= _NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.size("words") - (_NGRAM - 1)),
            lambda i: F.array_join(F.slice(F.col("words"), i, _NGRAM), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = w.select("doc_id", F.explode(grams).alias("ng"))
    bench = g.filter(F.col("doc_id") % 7 == 0).select("ng").distinct()
    train = g.filter(F.col("doc_id") % 7 != 0).distinct()
    return (
        train.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


@query(
    "text_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(text, ' ') AS words
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct,
             len(list_distinct(list_transform(
               generate_series(1, greatest(len(words) - 1, 0)),
               i -> array_to_string(words[i:i + 1], ' ')))) AS n_distinct_bi,
             greatest(len(words) - 1, 0) AS n_bi
      FROM w
    )
    SELECT doc_id, n_words, n_distinct,
           1.0 - (CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE))
             AS dup_word_ratio,
           1.0 - (CAST(n_distinct_bi AS DOUBLE) / CAST(n_bi AS DOUBLE))
             AS dup_bigram_ratio,
           CAST((1.0 - (CAST(n_distinct AS DOUBLE)
                        / CAST(n_words AS DOUBLE))) > 0.5 AS INTEGER)
             AS flag_repetitive
    FROM m
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition flags: duplicate-word and duplicate-
    bigram ratios per document, plus a binary repetitive-document
    flag — the boilerplate / low-information filter of a pretraining
    quality pipeline.

    All columns are narrow per-row array expressions (no UDF, no
    shuffle); at 100 TB this is a pure map stage pipelined into
    whatever consumes the flags."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("words") - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(F.col("words"), i, 2), " "),
    )
    m = w.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bi"),
        F.greatest(F.size("words") - 1, F.lit(0)).alias("n_bi"),
    )
    dup_w = F.lit(1.0) - (
        F.col("n_distinct").cast("double") / F.col("n_words").cast("double")
    )
    dup_b = F.lit(1.0) - (
        F.col("n_distinct_bi").cast("double") / F.col("n_bi").cast("double")
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_distinct",
        dup_w.alias("dup_word_ratio"),
        dup_b.alias("dup_bigram_ratio"),
        (dup_w > 0.5).cast("int").alias("flag_repetitive"),
    )


@query(
    "pii_redact",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS redacted_name,
           CAST(length(c_name)
                - length(regexp_replace(c_name, '[0-9]', '', 'g'))
             AS INTEGER) AS n_masked
    FROM customer
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction primitive: mask every digit in a free-text
    identifier column and report how many characters were masked —
    the shape of email/phone/ID scrubbing in a compliance pass
    (swap the character class for the production patterns).

    Narrow regexp transforms, JVM-side, zero shuffle — a pure map
    stage at any scale."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "#").alias("redacted_name"),
        (
            F.length("c_name")
            - F.length(F.regexp_replace("c_name", "[0-9]", ""))
        ).cast("int").alias("n_masked"),
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8)
          < '40000000'
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% corpus sample (operators/sampling.py
    portable_sample_filter): membership is a pure function of the
    doc_id hash, so the sample is identical across repartitions,
    re-runs, and cluster sizes — the property `df.sample()` lacks.
    Scan-side filter, zero shuffle; at 100 TB this is one pass that
    prunes 75% of rows before anything downstream."""
    from dasladen_spark.operators.sampling import portable_sample_filter

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "source", "n_chars").filter(
        portable_sample_filter(F.col("doc_id"), 0.25, salt="mix1:")
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT source,
           COUNT(*) AS kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE substr(md5('mix1:' || CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE source
              WHEN 'web'  THEN '33333333'
              WHEN 'news' THEN 'b3333333'
              ELSE 'ffffffff'
            END
    GROUP BY source
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified training-data mix — per-source keep rates (20% web,
    70% news, 100% everything else) decided row-locally from the
    portable doc_id hash, then a per-source audit count. The mix step
    of a data pipeline: one scan-side filter (no shuffle to decide
    membership), one hash agg for the audit. The rate table is a
    CASE over the stratum column, so adding strata never changes the
    plan shape."""
    from dasladen_spark.operators.sampling import portable_sample_filter

    d = _t(spark, sf_dir, "documents")
    digest = F.substring(
        F.md5(F.concat(F.lit("mix1:"), F.col("doc_id").cast("string"))), 1, 8
    )
    thr = (
        F.when(F.col("source") == "web", F.lit("33333333"))
        .when(F.col("source") == "news", F.lit("b3333333"))
        .otherwise(F.lit("ffffffff"))
    )
    return (
        d.filter(digest < thr)
        .groupBy("source")
        .agg(
            F.count("*").alias("kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


@query(
    "sample_split",
    oracle="""
    SELECT CASE
             WHEN h < 'cccccccc' THEN 'train'
             WHEN h < 'e6666666' THEN 'val'
             ELSE 'test'
           END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM (
      SELECT n_chars,
             substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents
    )
    GROUP BY 1
    """,
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from the
    portable doc_id hash (0.8*16^8 = 0xCCCCCCCC exactly, 0.9*16^8 =
    0xE6666666): a document's split is a pure function of its id, so
    it NEVER migrates between train and test across re-runs,
    re-shards, or corpus growth — the leakage guarantee `randomSplit`
    cannot give. Row-local decision + one hash agg for the audit."""
    d = _t(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8
    )
    split = (
        F.when(h < "cccccccc", "train")
        .when(h < "e6666666", "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


@query(
    "dedup_source_priority",
    oracle=r"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY md5(trim(regexp_replace(regexp_replace(
                 lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')))
               ORDER BY CAST(substr(source, 4) AS INTEGER), doc_id
             ) AS rn
      FROM documents
    )
    SELECT source, COUNT(*) AS n_kept
    FROM ranked WHERE rn = 1 GROUP BY source
    """,
)
def dedup_source_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-priority dedup: when the same (normalized) content
    arrives from several sources, keep the copy from the most trusted
    one (lowest source rank; doc_id tiebreak) — the cross-source
    merge step of corpus assembly, where a curated dump must beat its
    web-crawl duplicates. Same single-shuffle fingerprint-window
    shape as text_corpus_cleanup, with the survivor rule made a
    priority ORDER BY instead of plain min-id."""
    from pyspark.sql import Window

    from dasladen_spark.functions.text import normalize_text

    d = _t(spark, sf_dir, "documents")
    rank = F.substring("source", 4, 10).cast("int")
    w = Window.partitionBy(F.md5(normalize_text(F.col("text")))).orderBy(
        rank, "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@query(
    "sample_balanced",
    oracle="""
    SELECT source, doc_id
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
)
def sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced subset: exactly 10 documents per source, chosen by
    hash order (md5 of the id = a deterministic shuffle), so the
    selection is uniform-random-like yet identical across runs,
    partitionings, and engines — the class-balancing step of an eval
    or fine-tune set. One shuffle on the stratum; within-stratum
    top-k by hash rank, never a global sort."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        d.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("source", "doc_id")
    )
