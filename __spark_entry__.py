"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check on sf0.001
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 north-star extensions), (spark, sf_dir) → DataFrame
oracle_sql()   — equivalent DuckDB SQL per query (omitted only for
                 float-geometry / native-sketch ops — PCA/whitening/
                 Mahalanobis, HLL++ internals — whose outputs are not
                 SQL-expressible → rows-only check; the signature,
                 LSH, PQ, IVF, and k-means families are integer-
                 lattice exact, and since round 10 even the recall
                 AUDITS — ann_recall_report incl. the 70%-fit append
                 drift row, ann_tuning_curves — replay exactly)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped join
    + aggregate + deterministic top-k."""
    from dasladen_spark.plans import QUERIES

    return QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dasladen_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dasladen_spark.plans import ORACLES

    return dict(ORACLES)
