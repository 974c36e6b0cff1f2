"""LLM-data-pipeline queries, part 8: winnowing fingerprint dedup
(the MOSS algorithm — Schleimer/Wilkerson/Aiken, SIGMOD 2003) and
curriculum-ordered training schedules.

Beyond-reference operators (the reference delegates all query power
to an RDBMS, /root/reference/dasladen/task.py:94-107). Determinism
discipline as in llm3+: md5-based content hashes (bit-identical in
any engine), integer/string comparisons wherever possible, one
rounded double expression per output column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

# --------------------------------------------- winnowing fingerprints
#
# Parameters shared by the Spark plan and the DuckDB oracle. k = the
# shingle width in TOKENS, w = the winnowing window in hashes (every
# substring match of at least k + w - 1 tokens is guaranteed to share
# a fingerprint — the winnowing coverage theorem), MAX_DF caps hub
# fingerprints, MIN_SHARED is the pair-report floor.

_WIN_K = 4
_WIN_W = 4
_WIN_MAX_DF = 16
_WIN_MIN_SHARED = 3


def _winnow_fps(text_col: str):
    """Column expr: winnowed fingerprint set (array<string>) of a
    space-tokenized text column — JVM-side only (split / transform /
    slice / md5 / array_min), no Python in the row path.

    Selection rule (robust winnowing): the MIN md5 hex of each window
    of ``_WIN_W`` consecutive k-gram hashes, de-duplicated. Docs with
    fewer hashes than one window contribute their single overall min;
    docs shorter than k tokens contribute nothing. The md5-hex min is
    a pure string comparison — identical in Spark and DuckDB."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # greatest(...) keeps sequence() ascending even when the guard
    # branch is not taken (sequence(1, n) DESCENDS for n < 1)
    hashes = F.when(
        n >= _WIN_K,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - _WIN_K + 1, F.lit(1))),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, _WIN_K))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nh = F.size(hashes)
    return F.when(
        nh >= _WIN_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(nh - _WIN_W + 1, F.lit(1))),
                lambda j: F.array_min(F.slice(hashes, j, _WIN_W)),
            )
        ),
    ).otherwise(
        F.when(nh > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<string>")
        )
    )


@query(
    "dedup_winnowing",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
        CASE
          WHEN len(hashes) >= {_WIN_W} THEN list_distinct(
            list_transform(
              generate_series(1, len(hashes) - {_WIN_W} + 1),
              j -> list_min(hashes[j : j + {_WIN_W} - 1])))
          WHEN len(hashes) > 0 THEN [list_min(hashes)]
          ELSE [] END AS fps
      FROM (
        SELECT doc_id,
          CASE WHEN len(toks) >= {_WIN_K} THEN
            list_transform(
              generate_series(1, len(toks) - {_WIN_K} + 1),
              i -> md5(array_to_string(toks[i : i + {_WIN_K} - 1], ' ')))
          ELSE [] END AS hashes
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
      )
    ), e AS (
      SELECT doc_id, unnest(fps) AS fp FROM f
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_fp FROM e GROUP BY doc_id
    ), df AS (
      SELECT fp, COUNT(*) AS n_docs FROM e GROUP BY fp
    ), good AS (
      SELECT e.doc_id, e.fp FROM e
      JOIN df ON df.fp = e.fp WHERE df.n_docs <= {_WIN_MAX_DF}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fps
      FROM good a JOIN good b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.shared_fps,
           ROUND(p.shared_fps
                 / CAST(LEAST(sa.n_fp, sb.n_fp) AS DOUBLE), 6)
             AS containment
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE p.shared_fps >= {_WIN_MIN_SHARED}
    ORDER BY shared_fps DESC, doc_a, doc_b
    LIMIT 50
    """,
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by winnowed fingerprints — the MOSS
    document-fingerprinting algorithm (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every k-token shingle, keep only the minimum
    hash of each w-window. Unlike MinHash (a random projection of the
    WHOLE document), winnowing is position-local, so any shared run
    of ≥ k+w-1 tokens is GUARANTEED to surface a shared fingerprint —
    the guarantee plagiarism / license-contamination audits need.

    Scale shape: fingerprinting is one embarrassingly-parallel
    JVM-only projection (split → transform/slice/md5 → window-min),
    subsampling shingles ~2/(w+1) before anything shuffles; the pair
    join is fp-keyed with a MAX_DF hub cap (a fingerprint shared by
    more docs than the cap is corpus boilerplate, not a dup signal —
    same stop-shingle device as dedup_minhash_lsh), so the join
    fan-out per key is bounded by construction. Containment
    denominators use the PRE-cap fingerprint counts, so a hub-capped
    pair can never report inflated similarity."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    e = docs.select(
        "doc_id", F.explode(_winnow_fps("text")).alias("fp")
    )
    sizes = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    df_ = e.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    good = (
        e.join(df_, "fp")
        .filter(F.col("n_docs") <= _WIN_MAX_DF)
        .select("doc_id", "fp")
    )
    a = good.select(F.col("doc_id").alias("doc_a"), "fp")
    b = good.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, on=[a.fp == b.fp, F.col("doc_a") < F.col("doc_b")])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= _WIN_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("fp_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("fp_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.round(
                F.col("shared_fps")
                / F.least("fp_a", "fp_b").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy(F.col("shared_fps").desc(), "doc_a", "doc_b")
        .limit(50)
    )


# --------------------------------------------- curriculum ordering


@query(
    "train_curriculum_order",
    oracle="""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), q AS (
      SELECT quantile_cont(n_tokens, 0.25) AS q1,
             quantile_cont(n_tokens, 0.50) AS q2,
             quantile_cont(n_tokens, 0.75) AS q3
      FROM d
    )
    SELECT (1 + CAST(d.n_tokens > q.q1 AS INT)
              + CAST(d.n_tokens > q.q2 AS INT)
              + CAST(d.n_tokens > q.q3 AS INT)) AS phase,
           d.doc_id,
           CAST(d.n_tokens AS BIGINT) AS n_tokens,
           substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
             AS shuffle_key
    FROM d, q
    ORDER BY phase, shuffle_key, doc_id
    LIMIT 100
    """,
)
def train_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training schedule: docs bucketed into four
    difficulty phases by token-count quartile (short → long), shuffled
    WITHIN each phase by an md5 key — the easy-first ordering
    curriculum-learning recipes prescribe, with the intra-phase
    shuffle that keeps each phase i.i.d. First 100 schedule rows.

    Scale shape: phase boundaries are ONE exact-percentile aggregate
    (map-side combinable, 1 row) broadcast back onto the scan — no
    global sort assigns phases. The realized schedule at 100 TB is a
    WRITE ordered by (phase, shuffle_key) — sortWithinPartitions
    after repartitioning by phase — not a driver-side rank; the
    LIMIT here is a TakeOrdered audit sample of the schedule head,
    shuffling only per-partition top rows."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    )
    q = d.agg(
        F.percentile("n_tokens", F.lit(0.25)).alias("q1"),
        F.percentile("n_tokens", F.lit(0.50)).alias("q2"),
        F.percentile("n_tokens", F.lit(0.75)).alias("q3"),
    )
    return (
        d.crossJoin(F.broadcast(q))  # one row — the quartile bounds
        .select(
            (
                F.lit(1)
                + (F.col("n_tokens") > F.col("q1")).cast("int")
                + (F.col("n_tokens") > F.col("q2")).cast("int")
                + (F.col("n_tokens") > F.col("q3")).cast("int")
            ).alias("phase"),
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias(
                "shuffle_key"
            ),
        )
        .orderBy("phase", "shuffle_key", "doc_id")
        .limit(100)
    )
