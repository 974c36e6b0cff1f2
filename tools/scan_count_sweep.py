"""Sweep EVERY registered query's physical plan for corpus-table scan
multiplicity (guide §2/§5: a corpus-sized subtree that appears N times
in the plan is N full passes at 100 TB even when the local wall hides
it).

For each query: number of `FileScan parquet` nodes per base table,
Exchange count, and Python-eval stage count. Flags any query scanning
one base table more than FLAG_AT times — candidates for persist /
restructure — so the optimization checklist is evidence, not vibes.

Usage: python tools/scan_count_sweep.py [sf_dir] > SWEEP.txt
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dasladen_spark.session import get_spark  # noqa: E402

#: tables that grow with the corpus — repeated scans of these matter;
#: dimension tables (nation, region, ...) broadcast and re-scan free
CORPUS_TABLES = {
    "lineitem",
    "orders",
    "events",
    "documents",
    "embeddings",
    "pairs",
}
FLAG_AT = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scan-count-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    from dasladen_spark.plans import QUERIES

    flagged = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # build-time failure — report, move on
            print(f"{name}: PLAN-ERROR {type(exc).__name__}: {exc}")
            continue
        finally:
            spark.catalog.clearCache()
        scans = Counter()
        for m in re.finditer(r"Location: [^\n]*/([A-Za-z0-9_]+)\.parquet", plan):
            scans[m.group(1)] += 1
        # warehouse-backed materialized tables count as their own name
        for m in re.finditer(
            r"Location: [^\n]*spark-warehouse/([A-Za-z0-9_]+)", plan
        ):
            scans[f"wh:{m.group(1)}"] += 1
        n_ex = plan.count("Exchange hashpartitioning")
        n_py = (
            plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        hot = {
            t: c
            for t, c in scans.items()
            if c >= FLAG_AT and t.replace("wh:", "") in CORPUS_TABLES | set()
            or (t in CORPUS_TABLES and c >= FLAG_AT)
        }
        line = (
            f"{name}: scans={dict(scans)} exchanges={n_ex} py={n_py}"
        )
        print(line)
        if hot:
            flagged.append((name, hot, n_ex))
    print("\n== FLAGGED (corpus table scanned >= %d times) ==" % FLAG_AT)
    for name, hot, n_ex in flagged:
        print(f"  {name}: {hot} exchanges={n_ex}")


if __name__ == "__main__":
    main()
