"""Approximate-nearest-neighbor search over embedding columns.

- cosine_topk: exact brute force — queries are BROADCAST (they are
  the small side by construction), the corpus is scanned once, and
  the only shuffle is the final per-query top-k. At 100 TB this is
  one pass over the corpus: the right baseline.
- lsh_cosine_topk: random-hyperplane bucketing — each query probes
  only its own buckets, trading recall for a corpus-fraction scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dasladen_spark.functions.vectors import cosine_sim
from dasladen_spark.operators.dedup import _spread, hyperplane_bucket_udf


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, rank, cosine). Rank ties are
    broken by neighbor id so results are fully deterministic.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv")
    )
    c = _spread(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv")
        ),
        "neighbor_id",
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    dim: int = 64,
    num_tables: int = 8,
    bits_per_table: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates must share a random-hyperplane
    bucket with the query in at least one table. The corpus is
    exploded once per table (cheap, narrow) and the join is an equi
    join on (table, bucket) — a key shuffle instead of a cross join.
    """
    bucket_udf = hyperplane_bucket_udf(num_tables, bits_per_table, dim)

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        F.posexplode(bucket_udf(F.col(query_vec))).alias("t", "bkt"),
    ).select("query_id", "qv", "t", "bkt")
    c = _spread(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv")
        ),
        "neighbor_id",
    ).select(
        "neighbor_id",
        "cv",
        F.posexplode(bucket_udf(F.col("cv"))).alias("t", "bkt"),
    ).select("neighbor_id", "cv", "t", "bkt")
    cand = q.join(c, on=["t", "bkt"]).dropDuplicates(["query_id", "neighbor_id"])
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
