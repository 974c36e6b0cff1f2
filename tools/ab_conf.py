"""Same-process interleaved A/B of a runtime SQL conf over registered
queries (guide §1: measure in one JVM so machine phase cancels out).

Usage:
  python tools/ab_conf.py <conf_key> <valA> <valB> <query> [<query> ...]

For each query: 2 untimed warm reps (valA), then PAIRS of timed reps
alternating A/B (default 4 pairs) so phase drift hits both arms
equally. Prints per-query medians for each arm.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_AB_PAIRS (default 4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    key, val_a, val_b = sys.argv[1:4]
    names = sys.argv[4:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pairs = int(os.environ.get("SPARK_GRAFT_AB_PAIRS", "4"))
    from dasladen_spark.session import get_spark

    spark = get_spark("ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    from dasladen_spark.plans import QUERIES

    results = {}
    for name in names:
        fn = QUERIES[name]
        spark.conf.set(key, val_a)
        fn(spark, sf_dir).count()
        fn(spark, sf_dir).count()
        a_times, b_times = [], []
        for i in range(pairs):
            # alternate which arm goes first within each pair
            order = [(val_a, a_times), (val_b, b_times)]
            if i % 2:
                order.reverse()
            for val, sink in order:
                spark.conf.set(key, val)
                t0 = time.time()
                fn(spark, sf_dir).count()
                sink.append(time.time() - t0)
        spark.catalog.clearCache()
        a_times.sort()
        b_times.sort()
        med_a = a_times[len(a_times) // 2]
        med_b = b_times[len(b_times) // 2]
        results[name] = (med_a, med_b)
        print(
            f"{name}: A({val_a}) median {med_a:.3f}s "
            f"[{a_times[0]:.3f}..{a_times[-1]:.3f}]  "
            f"B({val_b}) median {med_b:.3f}s "
            f"[{b_times[0]:.3f}..{b_times[-1]:.3f}]  B/A={med_b/med_a:.2f}",
            flush=True,
        )
    wins = sum(1 for a, b in results.values() if b < a)
    print(f"# B faster on {wins}/{len(results)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
