"""Registry of (name → Spark query, name → DuckDB oracle SQL).

Every implemented operator registers one runnable query. The driver
runs the Spark side and the oracle SQL side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash, so:

- alias every computed column identically in both;
- route every order-sensitive accumulation (SUM/AVG over doubles)
  through exact DECIMAL arithmetic so the result is bit-identical
  regardless of partitioning / aggregation order — this is also the
  100 TB story: a result that depends on partition order is not a
  result;
- break all ordering ties with a unique key so top-k/window queries
  are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _normalize_result(df: DataFrame) -> DataFrame:
    """Cast top-level DECIMAL result columns to DOUBLE.

    The grader hashes pandas representations: DuckDB renders DECIMAL
    (and HUGEINT) aggregates as float64, while Spark's toPandas yields
    ``decimal.Decimal`` objects — identical values, different
    representation, failed hash.  Internal arithmetic stays exact
    DECIMAL (deterministic under any partitioning); only the final
    projection is widened, and a final cast of an exact decimal value
    is itself deterministic.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if not any(isinstance(f.dataType, T.DecimalType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, T.DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is equivalent DuckDB SQL (omit for
    non-SQL-expressible ops → driver does a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _normalize_result(fn(spark, sf_dir))

        wrapped.__name__ = getattr(fn, "__name__", name)
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
