"""LLM-pipeline queries, part 12 — embedding-space curation.

Beyond-reference operators (the reference delegates all query power
to the RDBMS — SURVEY §2.8): semantic decontamination (the
paraphrase-robust complement to the n-gram family in llm2/llm6/llm10)
and greedy k-center coreset selection (embedding-space data pruning).
Both are exact-oracle queries: every float they rank or threshold on
is a deterministic left-fold, identical bit-for-bit across Spark and
DuckDB (see functions/vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dasladen_spark.plans.registry import query
from dasladen_spark.session import load_table as _t

_SEM_TAU = 0.35  # inside the fixture's max-cosine range (p90 ≈ 0.347)

_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    " * sqrt(list_sum(list_transform({b}, x -> x * x))))"
)


@query(
    "decontaminate_semantic",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS bid, embedding::DOUBLE[] AS bv
      FROM embeddings WHERE vec_id % 11 = 0 AND vec_id < 500
    ), t AS (
      SELECT vec_id, embedding::DOUBLE[] AS tv
      FROM embeddings WHERE NOT (vec_id % 11 = 0 AND vec_id < 500)
    ), s AS (
      SELECT t.vec_id, b.bid,
             {_COS.format(a="t.tv", b="b.bv")} AS c
      FROM t CROSS JOIN b
    ), r AS (
      SELECT vec_id, bid, c,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY c DESC, bid) AS rn
      FROM s
    )
    SELECT vec_id, bid AS nearest_bench_id, c AS max_cosine
    FROM r WHERE rn = 1 AND c >= CAST({_SEM_TAU} AS DOUBLE)
    """,
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every training
    vector whose cosine to SOME held-out benchmark vector reaches
    {_SEM_TAU} — catches the paraphrased eval question that
    decontaminate_ngrams' exact 8-gram match misses.

    The benchmark slice is FIXED-SIZE (vec_id % 11 = 0 AND vec_id <
    500 — the same 46 vectors at every sf): real eval suites don't
    grow with the training corpus, and a bench side proportional to
    the corpus would make the pair stream quadratic at scale. With it
    fixed, cost is a single linear corpus scan per probe batch.

    Scale shape: benchmark side broadcast, corpus scanned once, the
    only corpus-keyed exchange is the partially-aggregated per-vector
    max (operators/decontaminate.semantic_contamination)."""
    from dasladen_spark.operators.decontaminate import (
        semantic_contamination,
    )

    e = _t(spark, sf_dir, "embeddings")
    is_bench = (F.col("vec_id") % 11 == 0) & (F.col("vec_id") < 500)
    return semantic_contamination(
        e.filter(~is_bench),
        e.filter(is_bench),
        threshold=_SEM_TAU,
    )


_CORESET_K = 8


def _kcenter_oracle(k: int) -> str:
    """Unrolled greedy k-center: round i's distance table is round
    i-1's with a least() against the newest pick. Every round is AS
    MATERIALIZED — without it DuckDB re-inlines each round into the
    next and the plan goes exponential (the kcore/pagerank lesson)."""
    d2 = (
        "list_sum(list_transform(list_zip({a}, {b}),"
        " q -> (q[1] - q[2]) * (q[1] - q[2])))"
    )
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v"
        " FROM embeddings)",
        "c0 AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id"
        " LIMIT 1)",
        "d1 AS MATERIALIZED (SELECT e.vec_id, e.v, "
        + d2.format(a="e.v", b="c.v")
        + " AS d2 FROM e, c0 c)",
    ]
    for i in range(1, k):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT vec_id, v, d2 FROM d{i}"
            f" ORDER BY d2 DESC, vec_id LIMIT 1)"
        )
        if i < k - 1:
            parts.append(
                f"d{i + 1} AS MATERIALIZED (SELECT d.vec_id, d.v,"
                f" least(d.d2, " + d2.format(a="d.v", b="p.v") + ") AS d2"
                f" FROM d{i} d, p{i} p)"
            )
    selects = [
        "SELECT CAST(0 AS INTEGER) AS pick_order, vec_id,"
        " CAST(NULL AS DOUBLE) AS d2 FROM c0"
    ] + [
        f"SELECT CAST({i} AS INTEGER), vec_id, d2 FROM p{i}"
        for i in range(1, k)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@query("sample_coreset_kcenter", oracle=_kcenter_oracle(_CORESET_K))
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus: 8 picks
    that COVER the space (maximize the minimum pairwise distance)
    rather than sample it — the standard seed for data pruning and
    diverse eval-set selection. Exact-oracle despite being iterative:
    the squared-distance fold is deterministic, so the full greedy
    trajectory replays in the unrolled SQL (operators/sampling
    kcenter_coreset; k bounded driver collects of ONE row each)."""
    from dasladen_spark.operators.sampling import kcenter_coreset

    return kcenter_coreset(
        _t(spark, sf_dir, "embeddings"), k=_CORESET_K
    )
