"""In-sandbox JDBC roundtrip against EMBEDDED Derby.

Spark ships Derby for its Hive metastore, so
``jdbc:derby:memory:…`` gives a real relational database inside this
JVM with no docker and no extra jar — the one environment where the
REAL connect → write_table(truncate) → appenddb → read_sql cycle
(reference task.py:94-107, 242-245) can execute in CI. The dockerized
PostgreSQL sibling (tests/test_live_jdbc.py) stays for real-server
semantics; this covers the Spark-side JDBC write modes:

- create-on-first-write (overwrite, no table yet),
- truncate=True keeps DDL and replaces rows,
- truncate=False appends,
- read_sql pushes a raw query through the JDBC source.
"""

from __future__ import annotations

import uuid

import pytest

from dasladen_spark.connections import Connection


@pytest.fixture()
def derby_conn():
    # a unique in-memory database per test: Derby memory DBs live for
    # the JVM's lifetime, so a fixed name would leak state across runs
    return Connection(
        {
            "name": "derby",
            "driver": "JDBC",
            "url": f"jdbc:derby:memory:dasladen_{uuid.uuid4().hex[:12]};create=true",
            "jdbc_driver": "org.apache.derby.jdbc.EmbeddedDriver",
        }
    )


def test_derby_jdbc_truncate_append_roundtrip(spark, derby_conn):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id INT, nm STRING"
    )
    # first write: table absent -> created + loaded
    derby_conn.write_table(df, spark, "t_roundtrip", truncate=True)
    # appenddb parity: inserts, keeps existing rows
    derby_conn.write_table(
        spark.createDataFrame([(3, "gamma")], "id INT, nm STRING"),
        spark,
        "t_roundtrip",
        truncate=False,
    )
    got = {
        (r["id"], r["nm"])
        for r in derby_conn.read_sql(
            spark, 'SELECT "id", "nm" FROM t_roundtrip'
        ).collect()
    }
    assert got == {(1, "alpha"), (2, "beta"), (3, "gamma")}

    # todb truncate parity: DDL kept, rows replaced (NOT appended)
    derby_conn.write_table(df, spark, "t_roundtrip", truncate=True)
    again = derby_conn.read_sql(
        spark, "SELECT COUNT(*) AS n FROM t_roundtrip"
    ).collect()
    assert again[0]["N"] == 2


def test_derby_jdbc_query_pushdown_runs_on_the_database(spark, derby_conn):
    """read_sql sends the SQL text to the database (the reference's
    delegated-query model): an aggregate computed by Derby itself
    comes back as one row."""
    rows = [(i, i % 3) for i in range(30)]
    derby_conn.write_table(
        spark.createDataFrame(rows, "id INT, grp INT"),
        spark,
        "t_push",
        truncate=True,
    )
    out = derby_conn.read_sql(
        spark,
        'SELECT "grp", COUNT(*) AS n, SUM("id") AS s FROM t_push '
        'GROUP BY "grp"',
    )
    got = {(r["grp"], r["N"], r["S"]) for r in out.collect()}
    assert got == {
        (g, 10, sum(i for i in range(30) if i % 3 == g)) for g in (0, 1, 2)
    }
