"""Per-JOB attribution inside pipeline_corpus_e2e (guide §1/§7).

Runs run_corpus_pipeline once with the Spark event log enabled, then
joins SparkListenerJobStart/JobEnd events against the per-stage wall
windows (stage_walls_out) to show, for each pipeline stage, every
Spark job it launched — count, wall seconds, and description. The
tool that says whether a 2 s stage is one 2 s job or eight 0.25 s
jobs of overhead.

Usage: python tools/pipeline_job_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="dsl_evlog_")
    from dasladen_spark.session import get_spark

    spark = get_spark(
        "pipeline-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            # one plain-text file — the parser below reads it directly
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dasladen_spark.plans.llm4 import run_corpus_pipeline

    # one warm run (codegen/JIT) then the profiled run
    for profiled in (False, True):
        work = tempfile.mkdtemp(prefix="dsl_pipe_prof_")
        walls: dict = {}
        t0 = time.time()
        try:
            run_corpus_pipeline(spark, sf_dir, work, stage_walls_out=walls)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        total = time.time() - t0
        if profiled:
            t_end = time.time()
            stage_windows = []
            t = t0
            for name, w in walls.items():
                stage_windows.append((name, t, t + w))
                t += w
            print(f"TOTAL {total:.3f}s (attributed {t - t0:.3f}s)")
            spark.stop()
            _report(evdir, stage_windows)
            return


def _report(evdir: str, windows: list) -> None:
    import glob

    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_*)
    files = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        + glob.glob(os.path.join(evdir, "*"))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    jobs: dict[int, dict] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"] / 1000.0,
                        "desc": props.get(
                            "spark.job.description",
                            props.get("callSite.short", ""),
                        )[:90],
                        "stages": len(ev.get("Stage IDs", [])),
                    }
                elif ev.get("Event") == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = (
                            ev["Completion Time"] / 1000.0
                        )
    for name, ws, we in windows:
        in_win = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if ws <= j["start"] < we
        ]
        tot = sum(j.get("end", j["start"]) - j["start"] for _, j in in_win)
        print(f"\n== {name}: wall {we - ws:.3f}s, {len(in_win)} jobs, "
              f"job-time {tot:.3f}s")
        for jid, j in in_win:
            dur = j.get("end", j["start"]) - j["start"]
            print(f"  job {jid:4d} {dur:7.3f}s stages={j['stages']:2d} "
                  f"{j['desc']}")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
