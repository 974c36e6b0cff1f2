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


@query(
    "ann_hamming_topk",
    oracle=f"""
    WITH p AS (
      SELECT vec_id,
             {_pack_sql(f"embedding[1:{_HALF}]")} AS h1,
             {_pack_sql(f"embedding[{_HALF + 1}:{2 * _HALF}]")} AS h2
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, h1 AS q1, h2 AS q2 FROM p
      WHERE vec_id < 100
    ), j AS (
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
    construction."""
    e = _t(spark, sf_dir, "embeddings")
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
    j = p.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            F.bit_count(F.col("h1").bitwiseXOR(F.col("q1")))
            + F.bit_count(F.col("h2").bitwiseXOR(F.col("q2")))
        )
        .cast("int")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        j.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )
