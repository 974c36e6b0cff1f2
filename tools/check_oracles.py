"""Local replica of the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on
DuckDB at the given sf_dir, then compares row count, schema shape,
and an order-insensitive VALUE HASH: columns sorted by name, rows
sorted, every cell rendered to a canonical string.  Two frames match
only if the rendered bytes are identical — a Spark `Decimal` vs an
oracle float64, or int64 vs float64, is a FAIL even when the values
are numerically equal (this mirrors the driver's hash, which r01
showed distinguishes representations; the old cross-type
float(x)==float(y) fallback masked 18 graded failures).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from dasladen_spark.session import TABLES, get_spark  # noqa: E402


def load_entry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def render_cell(v) -> str:
    """Canonical string for one cell — representation-sensitive.

    None/NaN/NaT unify to '∅' (both engines may surface SQL NULL
    differently), floats render via repr (bit-exact for float64),
    numpy scalars unwrap via .item() so int64(3) == int(3), and
    everything else falls back to repr of the python object — so a
    decimal.Decimal, date-vs-datetime, or str-vs-bytes difference is
    visible exactly as a hash would see it.
    """
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "∅" if math.isnan(v) else repr(v)
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (bytes, str)):
        try:
            v = v.item()
        except (ValueError, TypeError):
            pass
        if isinstance(v, float):
            return "∅" if math.isnan(v) else repr(v)
    if v is pd.NaT or (isinstance(v, pd.Timestamp) and pd.isna(v)):
        return "∅"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def render(df: pd.DataFrame) -> list[str]:
    """Order-insensitive canonical lines: columns sorted by name, each
    row rendered, rows sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        "|".join(render_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = render(spark_pdf), render(duck_pdf)
    n_bad = sum(1 for x, y in zip(a, b) if x != y)
    if n_bad:
        first = next((x, y) for x, y in zip(a, b) if x != y)
        problems.append(
            f"{n_bad}/{len(a)} rendered rows differ, first:\n"
            f"    spark={first[0][:300]}\n    duck ={first[1][:300]}"
        )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries, oracles = load_entry()
    spark = get_spark("oracle-check")
    con = duck_conn(sf_dir)
    ok, bad, noracle = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            bad.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        finally:
            # operators persist() intermediates whose lifetime is the
            # caller's; 267 queries of leaked cache blocks degrade the
            # session's per-job overhead severely by the tail (the
            # bench.py hygiene note). Materialized index TABLES are
            # disk-backed — unaffected.
            spark.catalog.clearCache()
        if name not in oracles:
            noracle.append(name)
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            bad.append(name)
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            bad.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            ok.append(name)
            print(f"OK   {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(
        f"\n{len(ok)} ok, {len(bad)} failed, {len(noracle)} rows-only"
        f" / {len(queries)} total"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
