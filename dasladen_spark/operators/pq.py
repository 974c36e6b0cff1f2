"""Product quantization — 32× embedding compression with
asymmetric-distance (ADC) top-k search.

At 100 TB the exact-cosine scan's bottleneck is not FLOPs but BYTES:
a 64-dim float32 embedding is 256 B/row, so the corpus scan is I/O
bound. PQ splits each (L2-normalized) vector into ``m`` subvectors
and replaces each with the id of its nearest subspace centroid —
``m`` bytes per row (m=8: 32× smaller), so the search scan reads 3%
of the bytes. Query-time scoring is table lookups: for each query,
an m × ksub table of subspace dot products is precomputed ONCE
(driver-side numpy, ~a few KB), broadcast, and each candidate's
approximate cosine is the sum of m lookups — no per-row vector math
at all.

Plan shape (the part that survives a 1000-executor scale-up):

- codebook fit: hash-ordered seed sample + Lloyd iterations whose
  shuffle is (subspace, code, dim)-keyed — m·ksub·dsub rows per
  round, independent of corpus size; only m × ksub × dsub floats
  ever reach the driver.
- encode: one vectorized Arrow pass over the corpus (a single
  argmax matmul per batch), emitting (id, codes tinyint[]).
- search: mapInPandas over the CODES (not the vectors) keeps a
  per-partition top-k heap per query, so the shuffle to the final
  top-k window is |partitions| × |Q| × k candidate rows — the same
  bounded-candidate shape as operators/ranking.topk_per_group.

Everything is deterministic: seeds are md5-ordered, Lloyd updates
are exact averages of the same assignment, LUT sums are float64 in
fixed subspace order — verified bit-for-bit against a pure-numpy
replica in tests/test_operators.py.

Beyond-reference operator (the reference delegates all query power
to an RDBMS, /root/reference/dasladen/task.py:94-107).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def fit_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
) -> np.ndarray:
    """Fit an (m, ksub, dim/m) codebook tensor over L2-normalized
    vectors.

    Seeds: the ``ksub`` corpus vectors with the smallest
    md5('pq-seed' || id) — a deterministic hash-spread sample (the
    same discipline as similarity.fit_ivf_centroids), sliced per
    subspace. Each Lloyd round is ONE corpus pass (a single encode
    UDF assigns all m subspaces at once) plus a
    (subspace, code, dim)-keyed mean — m·ksub·dsub ≈ a few thousand
    shuffle rows regardless of corpus size."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seeds = (
        corpus.orderBy(
            F.md5(F.concat(F.lit("pq-seed"), F.col(id_col).cast("string")))
        )
        .limit(ksub)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    seed_mat = _normalize_rows(np.array([r["v"] for r in seeds], np.float64))
    books = np.stack(
        [seed_mat[:, j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, ksub, dsub)
    # normalize with the SAME numpy code the encode UDF uses, so the
    # centroid means average exactly the vectors the codes were
    # assigned on (bit-identical to the pure-numpy differential test)
    vecs = corpus.select(_pq_normalize_udf()(F.col(vec_col)).alias("v"))
    for _ in range(iters):
        coded = vecs.select(
            "v",
            F.posexplode(
                pq_encode_udf(books, normalize=False)(F.col("v"))
            ).alias("sub", "code"),
        )
        sums = (
            # explode ONLY the subspace's slice of the vector (dsub
            # values per code row), not the full dim-length array — a
            # full posexplode-then-filter would blow rows up m× before
            # cutting them back
            coded.select(
                "sub",
                "code",
                F.posexplode(
                    F.slice(F.col("v"), F.col("sub") * dsub + 1, dsub)
                ).alias("rel", "x"),
            )
            .select(
                "sub",
                "code",
                (F.col("sub") * dsub + F.col("rel")).alias("pos"),
                "x",
            )
            .groupBy("sub", "code", "pos")
            # DECIMAL accumulation: the centroid sums are identical
            # under any partitioning, so the fitted codebooks (and
            # therefore every code) are a pure function of the corpus
            .agg(
                F.sum(F.col("x").cast("decimal(38,18)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        books = _apply_means(books, sums, dsub)
    return books


def _pq_normalize_udf():
    @F.pandas_udf("array<double>")
    def normalize(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = _normalize_rows(np.stack([np.asarray(v, np.float64) for v in vecs]))
        return pd.Series([row.tolist() for row in x])

    return normalize


def _apply_means(books: np.ndarray, sums, dsub: int) -> np.ndarray:
    out = books.copy()
    acc: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
    for r in sums:
        key = (r["sub"], r["code"])
        vec, n = acc.get(key, (np.zeros(dsub), 0))
        vec[r["pos"] - r["sub"] * dsub] += float(r["s"])
        acc[key] = (vec, max(n, r["n"]))
    for (sub, code), (vec, n) in acc.items():
        if n:
            out[sub, code] = vec / n
    return out


def pq_encode_udf(books: np.ndarray, normalize: bool = True):
    """Pandas UDF: vector → array of m codes (nearest subspace
    centroid by L2 over the NORMALIZED vector). One matmul+argmax per
    subspace per Arrow batch. ``normalize=False`` when the input
    column is already L2-normalized (the fit loop's pre-normalized
    pass), so fit and final encode see bit-identical values."""
    m, ksub, dsub = books.shape
    # ||x - c||² = ||x||² - 2x·c + ||c||² → argmin is argmax(x·c - ½||c||²)
    half_sq = 0.5 * (books**2).sum(axis=2)  # (m, ksub)

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, np.float64) for v in vecs])
        if normalize:
            x = _normalize_rows(x)
        codes = np.empty((len(x), m), np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = (sub @ books[j].T - half_sq[j]).argmax(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return encode


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — the 32×-compressed corpus representation."""
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        pq_encode_udf(books)(F.col(vec_col)).alias("codes"),
    )


def query_lut(books: np.ndarray, q_rows) -> tuple[list, np.ndarray]:
    """(query ids, LUT[q, j, c] = q_sub_j · books[j, c]) for a
    collected (query_id, qv) batch — the single shared spelling of
    the ADC table build, so every caller scores with identical
    bits. Approximate cosine of a coded row is the sum of its m
    lookups."""
    m, ksub, dsub = books.shape
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = _normalize_rows(np.array([r["qv"] for r in q_rows], np.float64))
    lut = np.stack(
        [q_mat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (Q, m, ksub)
    return q_ids, lut


def exact_rerank(
    short: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, neighbor_id) shortlist:
    the tiny shortlist broadcasts onto the corpus scan (a semi-join-
    shaped vector fetch of |Q|·shortlist rows), queries broadcast on
    top, one window per query. The single shared spelling of the
    re-rank stage — used by pq_topk_reranked and the PQ-compressed
    materialized index. Output: (query_id, rank, neighbor_id,
    cosine)."""
    from dasladen_spark.functions.vectors import cosine_sim

    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        cv.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k by asymmetric distance: queries stay exact,
    corpus rows are reconstructed implicitly through the LUT.

    The query batch is collect()ed (queries are the small side by
    construction — the same contract as similarity.cosine_topk); per
    executor, each Arrow batch of codes is scored with ONE fancy-
    indexing sum over the broadcast LUT tensor and only the running
    per-query top-k survives the partition — |partitions| × |Q| × k
    rows reach the final window."""
    m, ksub, dsub = books.shape
    q_rows = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv")
    ).collect()
    if not q_rows:
        return codes.sparkSession.createDataFrame(
            [], "query_id long, rank int, neighbor_id long, adc_score double"
        )
    q_ids_list, lut = query_lut(books, q_rows)
    q_ids = np.array(q_ids_list)

    def score_partition(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].to_numpy())  # (N, m)
            ids = pdf["neighbor_id"].to_numpy()
            # scores (Q, N): sum LUT over subspaces in fixed j order
            scores = np.zeros((len(q_ids), len(ids)))
            for j in range(m):
                scores += lut[:, j, c[:, j]]
            top = min(k + (1 if exclude_self else 0), len(ids))
            for qi in range(len(q_ids)):
                s = scores[qi]
                idx = np.argpartition(-s, top - 1)[:top]
                # deterministic candidate order: score desc, id asc
                idx = idx[np.lexsort((ids[idx], -s[idx]))]
                yield pd.DataFrame(
                    {
                        "query_id": q_ids[qi],
                        "neighbor_id": ids[idx],
                        "adc_score": s[idx],
                    }
                )

    cand = codes.mapInPandas(
        score_partition,
        "query_id long, neighbor_id long, adc_score double",
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("adc_score", 6).alias("adc_score"),
        )
    )


def pq_topk_reranked(
    queries: DataFrame,
    corpus: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    k: int = 5,
    rerank_mult: int = 4,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production PQ shape: ADC over the compressed codes selects
    a ``k × rerank_mult`` shortlist per query (the 100 TB scan reads
    only code bytes), then ONLY the shortlist rows fetch their full
    vectors — |Q| × k × rerank_mult of them, via a broadcast-
    candidate join — for an exact-cosine re-rank. Approximation
    error then only matters below the shortlist boundary, so recall
    recovers most of the gap to exact search at a fraction of the
    I/O. Output schema matches the other ANN paths:
    (query_id, rank, neighbor_id, cosine)."""
    short = pq_adc_topk(
        queries,
        codes,
        books,
        k=k * rerank_mult,
        query_id=query_id,
        query_vec=query_vec,
    ).select("query_id", "neighbor_id")
    return exact_rerank(
        short,
        queries,
        corpus,
        k,
        query_id=query_id,
        query_vec=query_vec,
        id_col=id_col,
        vec_col=vec_col,
    )
