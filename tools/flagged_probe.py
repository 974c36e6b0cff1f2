"""Spark-only timing for the gate's slowest NON-headline lines at
sf0.1 vs sf1, attributing each line's gate wall time between the
Spark plan and the DuckDB oracle.

The full-gate artifacts (CHECK_sf01_r*.txt / CHECK_sf1_r*.txt) time
Spark execution PLUS oracle execution per query, so a line like
dedup_clusters_embedding can read 87x for 10x rows when the engine
side is linear and the oracle side is the O(n^2) brute-force SPEC
(200M list cosines at sf1). This probe isolates the engine: it runs
only the Spark plan (.count() to stay off the driver-collect path)
and reports the sf0.1 -> sf1 cost ratio of the PLAN, which is the
number that predicts cluster behavior.

Usage: python tools/flagged_probe.py [reps]   (default 2)
Prints one JSON line {"times": {...}, "ratios": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dasladen_spark.session import get_spark  # noqa: E402

FLAGGED = [
    "dedup_clusters_embedding",
    "q_triangle_count",
    "q_triangle_count_estimate",
    "dedup_minhash_survivors",
    "dedup_winnowing_clusters",
    "dedup_ngram_jaccard",
    "decontaminate_semantic_ann",
    "dedup_near_rate_by_source",
    "graph_kcore",
    "graph_communities",
    "ann_pq_indexed_topk",
]

SFS = ["/root/testdata/sf0.1", "/root/repo/.localdata/sf1"]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from dasladen_spark.plans import QUERIES  # noqa: E402

    spark = get_spark("dasladen-flagged-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in SFS:
        QUERIES["scan_filter_project"](spark, sf_dir).count()

    times: dict[str, dict[str, float]] = {}
    for name in FLAGGED:
        times[name] = {}
        for sf_dir in SFS:
            samples = []
            for _ in range(reps):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).count()
                samples.append(time.time() - t0)
            samples.sort()
            times[name][sf_dir.rsplit("sf", 1)[1]] = round(
                samples[len(samples) // 2], 3
            )
            print(f"# {name} @{sf_dir}: {samples}", file=sys.stderr)

    ratios = {
        n: round(by["1"] / by["0.1"], 2) if by.get("0.1") else None
        for n, by in times.items()
    }
    print(json.dumps({"times": times, "ratios": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
