"""Per-JOB attribution for any registered query (guide §1/§7).

Runs each named query once warm, then once with the Spark event log
enabled, and prints every job the timed action launched — count,
wall seconds, and description. The tool that says whether a 2 s
query is one 2 s job or eight 0.25 s jobs of overhead.

Usage: python tools/query_job_profile.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="dsl_evlog_q_")
    from dasladen_spark.session import get_spark

    spark = get_spark(
        "query-job-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dasladen_spark.plans import QUERIES

    windows = []
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        fn(spark, sf_dir).count()  # warm 2 (index/caches settle)
        t0 = time.time()
        fn(spark, sf_dir).count()
        windows.append((name, t0 * 1000, time.time() * 1000))
        spark.catalog.clearCache()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    log_path = os.path.join(evdir, app_id)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(log_path) as fh:
        for line in fh:
            ev = json.loads(line)
            if ev.get("Event") == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )[:110],
                    "stage_ids": ev.get("Stage IDs", []),
                    "stages": len(ev.get("Stage IDs", [])),
                    "tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:80],
                    "tasks": si.get("Number of Tasks", 0),
                    "ms": (
                        si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)
                    ),
                }

    for name, w0, w1 in windows:
        sel = [
            (j, v)
            for j, v in sorted(jobs.items())
            if "end" in v and v["start"] >= w0 - 50 and v["end"] <= w1 + 50
        ]
        total_job = sum(v["end"] - v["start"] for _, v in sel) / 1000
        print(
            f"\n== {name}: wall {(w1 - w0) / 1000:.3f}s, {len(sel)} jobs, "
            f"sum(job walls) {total_job:.3f}s, "
            f"gaps {(w1 - w0) / 1000 - total_job:.3f}s"
        )
        for j, v in sel:
            print(
                f"  job {j:4d}  {(v['end'] - v['start']) / 1000:7.3f}s  "
                f"stages={v['stages']:2d} tasks={v['tasks']:4d}  {v['desc']}"
            )
            for sid in sorted(v.get("stage_ids", [])):
                st = stages.get(sid)
                if st:
                    print(
                        f"      stage {sid:4d} {st['ms'] / 1000:7.3f}s "
                        f"tasks={st['tasks']:3d}  {st['name']}"
                    )


if __name__ == "__main__":
    main()
