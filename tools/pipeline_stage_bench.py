"""Per-stage attribution for the pipeline_corpus_e2e bench line
(round-11 verdict ask 4).

Runs the ten-task corpus pipeline REPS times in fresh workspaces
(exactly what bench.py measures) and publishes the median wall per
stage, so every second of the bench line is attributed: input
materialization, each task stage (intake drain, dedups, transforms,
score, decontaminate, DSIR, pack, tar), and the funnel audit.

Usage: python tools/pipeline_stage_bench.py [out_json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), PIPE_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

REPS = int(os.environ.get("PIPE_BENCH_REPS", "3"))


def main() -> dict:
    from dasladen_spark.plans.llm4 import run_corpus_pipeline
    from dasladen_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pipeline-stage-bench")
    per_rep: list[dict] = []
    totals: list[float] = []
    for rep in range(REPS):
        work = tempfile.mkdtemp(prefix="dsl_pipe_bench_")
        walls: dict = {}
        t0 = time.time()
        try:
            run_corpus_pipeline(spark, sf_dir, work, stage_walls_out=walls)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        total = round(time.time() - t0, 3)
        totals.append(total)
        walls["TOTAL"] = total
        per_rep.append(walls)
        print(f"# rep {rep}: {total}s {walls}", file=sys.stderr)

    stages = list(per_rep[0].keys())
    median = {
        s: sorted(r[s] for r in per_rep)[REPS // 2] for s in stages
    }
    attributed = round(sum(v for k, v in median.items() if k != "TOTAL"), 3)
    rec = {
        "sf_dir": sf_dir,
        "reps": REPS,
        "median_total_s": median["TOTAL"],
        "median_stage_s": {k: v for k, v in median.items() if k != "TOTAL"},
        "attributed_s": attributed,
        "unattributed_s": round(median["TOTAL"] - attributed, 3),
        "per_rep": per_rep,
    }
    print(json.dumps({k: rec[k] for k in
                      ("median_total_s", "median_stage_s", "attributed_s",
                       "unattributed_s")}))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(rec, fh, indent=1)
    return rec


if __name__ == "__main__":
    main()
