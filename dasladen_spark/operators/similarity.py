"""Approximate-nearest-neighbor search over embedding columns.

- cosine_topk: exact brute force — queries are BROADCAST (they are
  the small side by construction), the corpus is scanned once, and
  the only shuffle is the final per-query top-k. At 100 TB this is
  one pass over the corpus: the right baseline.
- lsh_cosine_topk: random-hyperplane bucketing — each query probes
  only its own buckets, trading recall for a corpus-fraction scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dasladen_spark.functions.vectors import cosine_sim
from dasladen_spark.operators.dedup import _spread, hyperplane_table_buckets


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
    num_tables: int = 16,
    bits_per_table: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates must share a random-hyperplane
    bucket with the query in at least one table. The corpus is
    exploded once per table (cheap, narrow) and the join is an equi
    join on (table, bucket) — a key shuffle instead of a cross join.

    Default 16 tables x 4 bits: ann_recall_report measures 0.90
    recall@5 on the (weakly-similar) fixture corpus vs 0.60 at 8
    tables; production near-dup cosine levels sit far higher. Tune
    with the report: more tables -> recall, more bits -> smaller
    buckets (fewer candidates per probe).
    """
    # ONE kernel pass over queries ∪ corpus (the side tag joins the
    # group key): half the signature-pipeline stages and half the
    # driver-side plan analysis of running the kernel per side. Each
    # side's id rides in its OWN typed column (NULL on the other
    # side) so a bigint query id and a string corpus id — which the
    # separate query_id/corpus_id parameters invite — never meet in
    # a union type conflict.
    qid_type = queries.schema[query_id].dataType
    cid_type = corpus.schema[corpus_id].dataType
    both = hyperplane_table_buckets(
        queries.select(
            F.lit(True).alias("_is_q"),
            F.col(query_id).alias("_qid"),
            F.lit(None).cast(cid_type).alias("_nid"),
            F.col(query_vec).cast("array<double>").alias("_v"),
        ).unionByName(
            _spread(
                corpus.select(
                    F.lit(False).alias("_is_q"),
                    F.lit(None).cast(qid_type).alias("_qid"),
                    F.col(corpus_id).alias("_nid"),
                    F.col(corpus_vec).cast("array<double>").alias("_v"),
                ),
                "_nid",
            )
        ),
        "_v",
        num_tables,
        bits_per_table,
        dim,
    )
    q = both.filter(F.col("_is_q")).select(
        F.col("_qid").alias("query_id"), F.col("_v").alias("qv"), "t", "bkt"
    )
    c = both.filter(~F.col("_is_q")).select(
        F.col("_nid").alias("neighbor_id"),
        F.col("_v").alias("cv"),
        "t",
        "bkt",
    )
    cand = q.join(c, on=["t", "bkt"]).dropDuplicates(["query_id", "neighbor_id"])
    if exclude_self and qid_type == cid_type:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    # differing id types = differing keyspaces: no corpus row can BE
    # the query row, and a cross-type != would coerce (a non-numeric
    # string casts to NULL against a bigint, the NULL predicate drops
    # EVERY candidate) — so self-exclusion is correctly a no-op there
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


def centroid_assign_udf(cent_mat: np.ndarray):
    """Pandas UDF mapping a vector column to its nearest (by cosine)
    centroid's cell id. The centroid matrix (n_centroids × dim) is
    closure-broadcast; each Arrow batch is one numpy matmul."""
    norm = cent_mat / np.maximum(
        np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ norm.T).argmax(axis=1).astype("int32"))

    return assign


def probe_cells_udf(cent_mat: np.ndarray, n_probe: int):
    """Pandas UDF mapping a query vector to its ``n_probe`` nearest
    cells (array<int>), for the IVF probe explode."""
    probe_norm = cent_mat / np.maximum(
        np.linalg.norm(cent_mat, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ probe_norm.T
        order = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probe_cells


def fit_ivf_centroids(
    c: DataFrame, n_centroids: int, lloyd_iters: int
) -> np.ndarray:
    """Fit the IVF centroid matrix over a (neighbor_id, cv) frame.

    Seeds are the ``n_centroids`` vectors with the smallest
    md5('ivf-seed' || id) — a deterministic hash-ordered sample, so
    the seed set is spread uniformly over the corpus even when ids
    correlate with content (lowest-id seeding would start every cell
    in the same content neighborhood). One TakeOrdered pass; then
    ``lloyd_iters`` distributed k-means steps, each one assign UDF +
    a (cell, dim)-keyed mean whose group count is independent of
    corpus size. Only n_centroids × dim floats ever reach the driver."""
    seeds = (
        c.orderBy(
            F.md5(F.concat(F.lit("ivf-seed"), F.col("neighbor_id").cast("string")))
        )
        .limit(n_centroids)
        .select("cv")
        .collect()
    )
    cent = np.array([r["cv"] for r in seeds], dtype=np.float64)
    for _ in range(lloyd_iters):
        assigned = c.withColumn("cell", centroid_assign_udf(cent)(F.col("cv")))
        means = (
            assigned.select(
                "cell", F.posexplode(F.col("cv").cast("array<double>"))
            )
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        for r in means:
            cent[r["cell"], r["pos"]] = r["m"]
    return cent


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 1,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is
    partitioned into ``n_centroids`` Voronoi cells; each query scores
    only the ``n_probe`` nearest cells' members.

    Scale anatomy (the 100 TB path):
    - centroids: hash-ordered deterministic seed sample, refined by
      ``lloyd_iters`` distributed k-means steps (fit_ivf_centroids).
      Centroids (n_centroids × dim floats) always fit on the driver.
    - inverted lists: one shuffle of the corpus on cell id. For reuse
      across query batches, materialize them once with
      operators/ann_index.build_ann_index(method="ivf") — the
      bucketed-table form of this exact dataflow.
    - search: queries explode to n_probe cells, equi-join on cell id
      (a key shuffle over n_probe/n_centroids of the corpus), exact
      cosine re-rank, per-query top-k window.
    """
    c = _spread(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv")
        ),
        "neighbor_id",
    )
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv"))

    cent = fit_ivf_centroids(c, n_centroids, lloyd_iters)
    lists = c.withColumn("cell", centroid_assign_udf(cent)(F.col("cv")))

    probed = q.select(
        "query_id",
        "qv",
        F.explode(probe_cells_udf(cent, n_probe)(F.col("qv"))).alias("cell"),
    )
    cand = probed.join(lists, on="cell")
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
