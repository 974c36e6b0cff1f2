"""Plan-library smoke + spot value checks at sf0.001 (the full
oracle sweep lives in tools/check_oracles.py; these keep pytest
self-contained and fast)."""

import duckdb
import pytest

from dasladen_spark.plans import ORACLES, QUERIES
from dasladen_spark.session import TABLES

SPOT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_window_topk_per_group",
    "q_asof_join",
    "dedup_exact",
    "text_token_count",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_every_query_has_callable():
    assert len(QUERIES) >= 40
    for name in ORACLES:
        assert name in QUERIES


@pytest.mark.parametrize("name", SPOT)
def test_spot_query_matches_oracle(spark, sf_dir, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_oracles import compare

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    assert compare(name, sdf, ddf) == []


def test_rows_only_queries_run(spark, sf_dir):
    for name in set(QUERIES) - set(ORACLES):
        n = QUERIES[name](spark, sf_dir).count()
        assert n >= 0
