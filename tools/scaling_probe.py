"""Empirical scaling audit: how does each headline query's wall time
grow with data volume?

Runs every bench headline query at sf0.001 / sf0.01 / sf0.1 (100x
span) and fits the log-log slope of median wall time against scale
factor. A slope near (or below) 1.0 is linear scaling — the plan's
work grows with the data, i.e. the shape that survives a further
100x onto a real cluster. A slope well above 1.0 is super-linear
(an all-pairs join, a global sort that stopped fitting, a driver
fold that grew with the data) and names the query to fix.

Short local runs are noisy and dominated by fixed overhead (job
scheduling, Python worker spin-up), which DEFLATES slopes at small
SF — so read slopes here as an upper-confidence check on the big
SF pair and treat "slope ≤ ~1.1" as healthy, not as a precise
exponent.

Usage: python tools/scaling_probe.py [reps]   (default 3)
Prints one JSON line: {"slopes": {query: slope}, "times": {...}}.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dasladen_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from bench import HEADLINE  # noqa: E402

    from dasladen_spark.plans import QUERIES  # noqa: E402

    spark = get_spark("dasladen-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Python workers
    for sf_dir in SFS:
        QUERIES["scan_filter_project"](spark, sf_dir).count()

    times: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
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

    slopes: dict[str, float] = {}
    for name, by_sf in times.items():
        pts = sorted((math.log10(float(s)), math.log10(t)) for s, t in by_sf.items())
        # OLS slope over the three points
        n = len(pts)
        mx = sum(p[0] for p in pts) / n
        my = sum(p[1] for p in pts) / n
        num = sum((p[0] - mx) * (p[1] - my) for p in pts)
        den = sum((p[0] - mx) ** 2 for p in pts)
        slopes[name] = round(num / den, 3) if den else float("nan")
        print(
            f"# {name}: {by_sf}  slope={slopes[name]}",
            file=sys.stderr,
        )

    flagged = {n: s for n, s in slopes.items() if s > 1.15}
    print(json.dumps({"slopes": slopes, "times": times, "superlinear": flagged}))
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
