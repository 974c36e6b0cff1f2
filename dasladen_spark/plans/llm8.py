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
# The operator lives in operators/dedup (winnow_fingerprints /
# winnowing_pairs — shared with the `dedup` task's winnowing method
# and the fingerprint-index intake path); this module binds it to the
# documents table and carries the cross-engine DuckDB oracle. k = the
# shingle width in TOKENS, w = the winnowing window in hashes (every
# substring match of at least k + w - 1 tokens is guaranteed to share
# a fingerprint — the winnowing coverage theorem), MAX_DF caps hub
# fingerprints, MIN_SHARED is the pair-report floor.

from dasladen_spark.operators.dedup import (  # noqa: F401  (re-exports:
    WINNOW_K as _WIN_K,  # tests and task code import these names)
    WINNOW_MAX_DF as _WIN_MAX_DF,
    WINNOW_MIN_SHARED as _WIN_MIN_SHARED,
    WINNOW_W as _WIN_W,
    winnow_fingerprints,
    winnowing_pairs,
)
from dasladen_spark.operators.dedup import winnow_fps_expr as _winnow_fps  # noqa: F401


#: shared DuckDB CTE for every winnowing-family oracle: winnowed
#: fingerprints per doc (f), exploded (e), per-doc counts (sizes),
#: fingerprint document frequency (df), hub-capped postings (good),
#: and candidate pairs with shared-fp counts (pairs — min_shared is
#: applied by each consumer).
_WINNOW_CTE = f"""
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
"""


@query(
    "dedup_winnowing",
    oracle=_WINNOW_CTE + f"""
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
    pair can never report inflated similarity. The exploded
    fingerprint frame feeds FOUR plan branches (sizes, df, both join
    sides) — persisted inside winnowing_pairs so fingerprinting runs
    once, not 7-8× (the rollup-persist discipline of the multi-branch
    relational6 queries)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        winnowing_pairs(docs)
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
