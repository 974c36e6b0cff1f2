"""Fifth-decade scaling evidence: Spark-only wall time at sf1 vs sf10
(60M-row lineitem, 60k docs, 200k embeddings — tools/gen_sf.py with
mult=100) for a representative per-plan-shape subset of the headline
queries.

The 4-decade probe (tools/scaling_probe.py -> PROBE_r12.json) showed
every headline plan sub-linear through sf1; this pushes the heaviest
shapes one more decade to catch anything whose constant factors only
crack above ~10^7 rows (bucket saturation, driver folds, broadcast
limits). Spark-only — oracles at sf10 would measure DuckDB, not the
engine.

Usage: python tools/sf10_probe.py [reps]   (default 2)
Prints one JSON line {"times": {...}, "ratios": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from dasladen_spark.session import get_spark  # noqa: E402

#: one per major plan shape; costs stay minutes-not-hours at sf10
SUBSET = [
    "scan_filter_project",      # parquet scan + pushdown
    "q1_pricing_summary",       # full-table agg
    "q3_shipping_priority",     # 3-way join + agg + topk
    "q_window_topk_per_group",  # partitioned window
    "q_asof_join",              # as-of (union-sort trick)
    "q_range_join",             # range join
    "dedup_exact",              # hash-groupBy dedup
    "dedup_minhash_lsh",        # banded MinHash-LSH
    "dedup_clusters_embedding", # adaptive-LSH pairs + label propagation
    "decontaminate_ngrams",     # n-gram anti-join
    "text_corpus_cleanup",      # composite filter+dedup+rollup
    "text_bm25_topk",           # inverted scoring
    "ann_lsh_topk",             # hyperplane LSH probe
    "ann_hamming_topk",         # 1-bit Hamming probe
    "pack_sequences",           # sequence packing
    "corpus_dsir_weights",      # importance weights
    "q_triangle_count_estimate",  # Doulion tier (p=1/16 at sf10)
    "pipeline_corpus_e2e",      # 10-stage chained task pipeline
]

SFS = ["/root/repo/.localdata/sf1", "/root/repo/.localdata/sf10"]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from dasladen_spark.plans import QUERIES  # noqa: E402

    spark = get_spark("dasladen-sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in SFS:
        QUERIES["scan_filter_project"](spark, sf_dir).count()

    times: dict[str, dict[str, float]] = {}
    for name in SUBSET:
        times[name] = {}
        for sf_dir in SFS:
            samples = []
            for _ in range(reps):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).count()
                samples.append(round(time.time() - t0, 3))
            samples.sort()
            times[name][sf_dir.rsplit("sf", 1)[1]] = samples[len(samples) // 2]
            print(f"# {name} @{sf_dir}: {samples}", file=sys.stderr, flush=True)

    ratios = {
        n: round(by["10"] / by["1"], 2) if by.get("1") else None
        for n, by in times.items()
    }
    print(json.dumps({"times": times, "ratios": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
