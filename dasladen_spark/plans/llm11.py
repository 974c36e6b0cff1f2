"""LLM-data-pipeline queries, part 11: binary (sign) quantization for
embedding search — the 1-bit-per-dimension first-pass every
billion-vector store runs before exact re-ranking.

Beyond-reference operators (the reference delegates all query power
to an RDBMS, /root/reference/dasladen/task.py:94-107). Determinism
discipline as in llm3+: the Hamming ranking is pure integer
arithmetic (sign packing, XOR, popcount), so there is nothing to
round anywhere — ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

_HALF = 32  # dims per packed long (64-dim fixture → two longs)


def _pack_sql(arr: str) -> str:
    """Portable SQL for the sign-bit fold: transform to 0/1 bits,
    prepend the 0 init (DuckDB's list_reduce has no init argument —
    the first element IS the accumulator, so a raw float must never
    sit in that seat), then fold acc*2 + bit."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({arr}, x -> CAST(x > 0 AS BIGINT))),"
        f" (a, b) -> a * 2 + b)"
    )


def pack_signs(arr: F.Column) -> F.Column:
    """Fold a float-array Column into a sign-bit integer: acc*2 + [x>0]
    left to right — identical sequence to the oracle's list_reduce.
    Pure JVM expression; callers slice to ≤ 63 dims per long."""
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, x: acc * 2 + (x > F.lit(0.0)).cast("long"),
    )


#: shared SQL: packed corpus (p) + packed probe set (q) — reused by
#: ann_hamming_topk and the retrieval_ndcg_mrr eval so the system
#: being evaluated is the system being served, by construction
_PACKED_SQL = f"""p AS (
      SELECT vec_id,
             {_pack_sql(f"embedding[1:{_HALF}]")} AS h1,
             {_pack_sql(f"embedding[{_HALF + 1}:{2 * _HALF}]")} AS h2
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, h1 AS q1, h2 AS q2 FROM p
      WHERE vec_id < 100
    )"""


def hamming_ranked(e: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, hamming, rk ≤ k): the 1-bit sign-pack
    + broadcast-probe + XOR/popcount ranking, ONE implementation for
    the serving query (ann_hamming_topk) and its eval
    (retrieval_ndcg_mrr) — a packing or tie-break change cannot
    silently diverge the two."""
    p = e.select(
        "vec_id",
        pack_signs(F.slice("embedding", 1, _HALF)).alias("h1"),
        pack_signs(F.slice("embedding", _HALF + 1, _HALF)).alias("h2"),
    )
    q = p.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        p.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("h1").bitwiseXOR(F.col("q1")))
                + F.bit_count(F.col("h2").bitwiseXOR(F.col("q2")))
            )
            .cast("int")
            .alias("hamming"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


@query(
    "ann_hamming_topk",
    oracle=f"""
    WITH {_PACKED_SQL}, j AS (
      SELECT q.query_id, p.vec_id AS neighbor_id,
             CAST(bit_count(xor(p.h1, q.q1))
                  + bit_count(xor(p.h2, q.q2)) AS INT) AS hamming
      FROM p, q WHERE p.vec_id <> q.query_id
    ), r AS (
      SELECT query_id, neighbor_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY hamming, neighbor_id) AS rk
      FROM j
    )
    SELECT query_id, neighbor_id, hamming, CAST(rk AS INT) AS rank
    FROM r WHERE rk <= 5
    """,
)
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized nearest neighbours: every embedding collapses
    to its 64 sign bits (two packed longs), queries rank the corpus by
    Hamming distance (XOR + popcount), top-5 per query with id
    tie-break. This is the 1-bit first-pass of modern vector search —
    32× smaller than float32 vectors and the distance is two CPU
    instructions — normally followed by an exact re-rank of the
    shortlist (ann_cosine_topk is the exact sibling; ann_pq_indexed
    the 8-bit path).

    Scale shape: packing is one JVM fold per row (no UDF), the corpus
    carries 16 bytes/vector into the scan, and the probe set
    broadcasts (the ann_cosine_topk shape) — per-partition top-k
    keeps the shuffle at |queries|·k rows. Integer-only ranking: no
    rounding exists anywhere, so the oracle match is exact by
    construction. Ranking comes from :func:`hamming_ranked` — the
    same code retrieval_ndcg_mrr evaluates."""
    e = _t(spark, sf_dir, "embeddings")
    return hamming_ranked(e, 5).select(
        "query_id",
        "neighbor_id",
        "hamming",
        F.col("rk").cast("int").alias("rank"),
    )


# ------------------------------------ ranking evaluation (nDCG / MRR)
#
# How good is the 1-bit Hamming first pass, really? The eval every
# vector store publishes: per query, rank the corpus by Hamming
# distance (the system) and score it against exact-cosine top-10 (the
# truth) with graded gains 10..1. Determinism: the discount table
# 1/log2(i+1) is TEN Python-computed literals embedded verbatim in
# both engines (log2 itself is NOT cross-engine portable — Java and
# glibc disagree by 1 ulp on ~7% of inputs), every DCG term is
# quantized to floor(gain·disc·1e12 + 0.5) and summed as exact
# bigints (the graph_pagerank recipe), and MRR is a single 1/rank
# division — so the whole scorecard replays bit-for-bit.

import math as _math

from dasladen_spark.plans.llm import _cosine_sql as _cosine_sql_11

_EVAL_K = 10
_DISC = [1.0 / _math.log2(i + 1) for i in range(1, _EVAL_K + 1)]
#: ideal DCG for 10 relevant docs with gains 10..1, in 1e-12 units —
#: ONE integer computed here and embedded in both engines
_IDCG_Q = sum(
    int(_math.floor((_EVAL_K - i) * _DISC[i] * 1e12 + 0.5))
    for i in range(_EVAL_K)
)
_DISC_SQL = "[" + ", ".join(f"CAST({d!r} AS DOUBLE)" for d in _DISC) + "]"


@query(
    "retrieval_ndcg_mrr",
    oracle=f"""
    WITH {_PACKED_SQL}, sys AS (
      SELECT query_id, neighbor_id, rk FROM (
        SELECT q.query_id, p.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY bit_count(xor(p.h1, q.q1))
                          + bit_count(xor(p.h2, q.q2)), p.vec_id) AS rk
        FROM p, q WHERE p.vec_id <> q.query_id
      ) WHERE rk <= {_EVAL_K}
    ), qv AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id < 100
    ), truth AS (
      SELECT query_id, neighbor_id, trank FROM (
        SELECT qv.query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY qv.query_id
                 ORDER BY {_cosine_sql_11('qv.qvec', 'e.embedding')} DESC,
                          e.vec_id) AS trank
        FROM qv CROSS JOIN embeddings e
        WHERE e.vec_id <> qv.query_id
      ) WHERE trank <= {_EVAL_K}
    ), gains AS (
      SELECT s.query_id, s.rk,
             coalesce({_EVAL_K + 1} - t.trank, 0) AS gain
      FROM sys s LEFT JOIN truth t
        ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
    )
    SELECT query_id,
           CAST(SUM(CAST(FLOOR(
                 gain * ({_DISC_SQL})[rk] * 1e12 + 0.5) AS BIGINT))
                AS DOUBLE) / {_IDCG_Q} AS ndcg_10,
           coalesce(CAST(1.0 AS DOUBLE)
                    / MIN(CASE WHEN gain > 0 THEN rk END), 0.0)
             AS reciprocal_rank
    FROM gains GROUP BY query_id
    ORDER BY query_id
    """,
)
def retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality scorecard of the binary-sign Hamming first
    pass against exact cosine truth: per query, nDCG@10 with graded
    gains (truth rank 1 → gain 10 … rank 10 → gain 1) and the
    reciprocal rank of the first true neighbor the Hamming ranking
    surfaces. The eval artifact that justifies (or vetoes) running
    the 32×-cheaper 1-bit pass in front of exact re-ranking —
    ann_recall_report's graded, position-aware sibling.

    Scale shape: both rankings are the broadcast-probe shape (tiny
    query set against the corpus scan; the Hamming side reads 16
    bytes/vector), per-partition top-k bounds the shuffles at
    |queries|·k rows, and the eval join is |queries|·k vs
    |queries|·k. Integer gains, literal discount constants, quantized
    DCG terms, one exact division each — oracle-exact end to end."""
    from dasladen_spark.operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    sys_rank = hamming_ranked(e, _EVAL_K).select(
        "query_id", "neighbor_id", "rk"
    )
    truth = cosine_topk(
        e.filter(F.col("vec_id") < 100), e, k=_EVAL_K, exclude_self=True
    ).select(
        "query_id",
        F.col("neighbor_id"),
        F.col("rank").alias("trank"),
    )
    gains = sys_rank.join(
        truth, ["query_id", "neighbor_id"], "left"
    ).select(
        "query_id",
        "rk",
        F.coalesce(F.lit(_EVAL_K + 1) - F.col("trank"), F.lit(0)).alias(
            "gain"
        ),
    )
    disc = F.array(*[F.lit(d) for d in _DISC])
    term = F.floor(
        F.col("gain") * F.element_at(disc, F.col("rk")) * F.lit(1e12)
        + F.lit(0.5)
    )
    return (
        gains.groupBy("query_id")
        .agg(
            (
                F.sum(term).cast("double") / F.lit(float(_IDCG_Q))
            ).alias("ndcg_10"),
            F.coalesce(
                F.lit(1.0)
                / F.min(F.when(F.col("gain") > 0, F.col("rk"))),
                F.lit(0.0),
            ).alias("reciprocal_rank"),
        )
        .orderBy("query_id")
    )
