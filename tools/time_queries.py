"""Time a subset of queries with bench.py's exact methodology
(warm rep + median of N via .count()), for fast optimization
iteration without a full bench run.

Usage: SPARK_GRAFT_SF_DIR=... python tools/time_queries.py q1 q2 ...
Env: SPARK_GRAFT_BENCH_REPS (default 3)

Prints one JSON line {name: median_s}, plus the same calibration
anchor bench.py uses so numbers are phase-comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dasladen_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from bench import WARM_FIRST as _wf
    from dasladen_spark.plans import QUERIES

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["scan_filter_project"](spark, sf_dir).count()

    def _calib() -> float:
        t0 = time.time()
        spark.range(200_000_000, numPartitions=32).selectExpr(
            "sum(id * 2 + 1)"
        ).collect()
        return time.time() - t0

    _calib()
    calibration = sorted(_calib() for _ in range(3))[1]
    print(f"# calibration: {calibration:.3f}s", file=sys.stderr)

    times: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if name in _wf:
            prev = float("inf")
            for _ in range(4):
                t0 = time.time()
                fn(spark, sf_dir).count()
                dt = time.time() - t0
                if dt > prev * 0.8:
                    break
                prev = dt
        else:
            fn(spark, sf_dir).count()
        samples = []
        for _ in range(reps):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
        samples.sort()
        times[name] = samples[len(samples) // 2]
        print(
            f"# {name}: {n} rows, median {times[name]}s "
            f"(min {samples[0]} max {samples[-1]})",
            file=sys.stderr,
        )
        spark.catalog.clearCache()

    calibration_end = sorted(_calib() for _ in range(3))[1]
    print(f"# calibration_end: {calibration_end:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": times, "cal": round(calibration, 3),
                      "cal_end": round(calibration_end, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
