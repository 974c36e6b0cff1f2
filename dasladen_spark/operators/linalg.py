"""Distributed linear algebra over embedding columns.

The scale pattern: anything O(n·d) or O(n·d²) reduces on the
executors; the driver only ever holds O(d²) — for d=64 that is a
4 KB mean and a 32 KB Gram matrix, the same whether the corpus has
five hundred vectors or fifty billion. Eigen-decomposition of the
d×d covariance then runs driver-side in microseconds.

The reference has no vector math at all; this is north-star
LLM-pipeline provision (embedding-space diagnostics before
clustering / ANN indexing / whitening).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def gram_moments(
    df: DataFrame,
    vec_col: str,
    dim: int,
    refold_threshold: int = 64,
    _stats: dict | None = None,
) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed fold → (n, Σx, XᵀX): each partition reduces its
    vectors into a (count, sum-vector, partial Gram) row via Arrow
    batches (numpy matmul — BLAS, not per-element Python).

    The driver never sees O(P) rows: above ``refold_threshold``
    partitions a second-level fold shuffles the P partial rows (tiny —
    ~d² doubles each) into ~√P groups and reduces each group to one
    row, so the collect is O(√P). At d=64 a 100 TB corpus on 128 MB
    splits (~800k partitions) would otherwise land ~26 GB of partials
    on the driver; with the refold it is ~900 rows (~30 MB).

    ``_stats`` (test hook): records partitions / driver_rows /
    two_level so the scale path is assertable."""
    schema = "n long, s array<double>, g array<double>"

    def partial(batches):
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    def refold(batches):
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros(dim * dim, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n += int(pdf["n"].sum())
            s += np.sum(np.stack(pdf["s"].to_numpy()), axis=0)
            g += np.sum(np.stack(pdf["g"].to_numpy()), axis=0)
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.tolist()]})

    partials = df.select(vec_col).mapInPandas(partial, schema)
    n_parts = df.rdd.getNumPartitions()
    two_level = n_parts > refold_threshold
    if two_level:
        groups = max(1, int(n_parts**0.5))
        partials = partials.repartition(groups).mapInPandas(refold, schema)
    rows = partials.collect()
    if _stats is not None:
        _stats.update(
            partitions=n_parts, driver_rows=len(rows), two_level=two_level
        )
    if not rows:
        return 0, np.zeros(dim), np.zeros((dim, dim))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    return n, s, g


def whiten(
    df: DataFrame,
    vec_col: str,
    dim: int,
    out_col: str = "whitened",
    eps: float = 1e-9,
) -> DataFrame:
    """PCA-whiten an embedding column: rotate into the covariance
    eigenbasis and rescale each axis to unit variance — the transform
    that fixes anisotropic embedding spaces before cosine ANN.

    Two passes total: the O(d²) moments fold, then one mapInPandas
    applying the broadcast (d×d) whitening matrix with BLAS — the
    rotation never shuffles the corpus, so the plan is scan-shaped at
    any size."""
    from pyspark.sql import functions as F

    n, s, g = gram_moments(df, vec_col, dim)
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("array<double>"))
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    evals = np.maximum(evals, 0.0)
    w_mat = evecs @ np.diag(1.0 / np.sqrt(evals + eps)) @ evecs.T  # ZCA
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{out_fields}, {out_col} array<double>"

    def apply(batches):
        for pdf in batches:
            if len(pdf):
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                y = (x - mu) @ w_mat.T
                pdf = pdf.assign(**{out_col: list(y)})
            else:
                pdf = pdf.assign(**{out_col: []})
            yield pdf

    return df.mapInPandas(apply, out_schema)


def pca_explained_variance(
    df: DataFrame, vec_col: str, dim: int, k: int = 8
) -> list[tuple[int, float, float]]:
    """Top-k PCA eigenvalues of the corpus covariance and their
    explained-variance ratios, from one distributed moments pass.

    Covariance is the population form C = XᵀX/n − μμᵀ; symmetric
    eigensolve on the driver (d×d). Returns
    [(component, eigenvalue, explained_ratio), ...] largest first."""
    n, s, g = gram_moments(df, vec_col, dim)
    if n == 0:
        return []
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals = np.linalg.eigvalsh(cov)[::-1]
    evals = np.maximum(evals, 0.0)
    total = evals.sum() or 1.0
    return [
        (i + 1, float(evals[i]), float(evals[i] / total))
        for i in range(min(k, dim))
    ]


def mahalanobis_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    ridge: float = 1e-6,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` embeddings by Mahalanobis distance from the
    corpus distribution — the covariance-aware outlier audit (a
    vector can sit at a normal L2 norm yet be wildly atypical along
    a low-variance direction; z-scored norms miss it, this doesn't).

    Scale shape: mean and covariance come from the SAME O(√P)-bounded
    gram_moments fold every other linalg audit uses; the d×d inverse
    (ridge-regularized Cholesky) is driver-side microseconds; scoring
    is one broadcast-rotation Arrow pass over the corpus (a single
    matmul per batch), and only per-partition top-n candidates reach
    the final window. Differential-tested against a sequential numpy
    replica."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n, s, g = gram_moments(df.select(vec_col), vec_col, dim)
    if n == 0:
        # no vectors → no distribution; mirror whiten/pca's guard so
        # an empty frame yields an empty audit, not NaN → LinAlgError
        return df.sparkSession.createDataFrame(
            [], "rank INT, vec_id LONG, mahalanobis DOUBLE"
        )
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    cov += ridge * np.eye(dim)
    inv = np.linalg.inv(cov)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, np.float64) for v in pdf[vec_col]]
            ) - mean
            # d(x)² = (x-μ)ᵀ Σ⁻¹ (x-μ), one matmul per Arrow batch
            d2 = np.einsum("ij,jk,ik->i", x, inv, x)
            out = pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "mahalanobis": np.sqrt(np.maximum(d2, 0.0)),
                }
            )
            # per-partition shortlist: only candidates cross the wire
            yield out.nlargest(min(top_n, len(out)), "mahalanobis")

    cand = df.select(id_col, vec_col).mapInPandas(
        score, "vec_id long, mahalanobis double"
    )
    from dasladen_spark.functions.vectors import bounded_window_key

    # explicit single partition: the input is the ≤ top_n-row limit
    # below, so one partition is the intended plan (see
    # bounded_window_key for why lit(0) wouldn't survive the optimizer)
    w = Window.partitionBy(bounded_window_key(F.col("vec_id"))).orderBy(
        F.col("mahalanobis").desc(), F.col("vec_id").asc()
    )
    return (
        cand.orderBy(F.col("mahalanobis").desc(), F.col("vec_id").asc())
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank", "vec_id", F.round("mahalanobis", 6).alias("mahalanobis")
        )
    )
