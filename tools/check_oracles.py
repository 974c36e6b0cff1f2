"""Local replica of the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` on
DuckDB at the given sf_dir, then compares row count, schema shape,
and order-insensitive values (columns sorted by name, rows sorted,
exact match for non-floats, tight + exact reporting for floats).

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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable primitives
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return v

    df = df.map(norm)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )


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
    a, b = canon(spark_pdf), canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        n_exact = 0
        first_bad = None
        for x, y in zip(av, bv):
            same = repr(x) == repr(y)
            if not same and isinstance(x, float) and isinstance(y, float):
                same = x == y  # repr differs but values equal
            if not same and x is not None and y is not None:
                # decimal vs float cross-type
                try:
                    same = float(x) == float(y)
                except (TypeError, ValueError):
                    same = False
            if same:
                n_exact += 1
            elif first_bad is None:
                first_bad = (x, y)
        if n_exact != len(av):
            problems.append(
                f"col {col}: {len(av) - n_exact}/{len(av)} mismatched, first={first_bad!r}"
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
