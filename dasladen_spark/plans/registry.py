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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is equivalent DuckDB SQL (omit for
    non-SQL-expressible ops → driver does a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
