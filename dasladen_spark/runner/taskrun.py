"""JSON task-file runner — parity with taskrun.py + the schedule
quirk fixes (SURVEY §4.3-4.5).

A task file is {"connections": [...], "schedule": {...}, "tasks":
[...]} (/root/reference/dasladen/taskrun.py:42-51); it is recognized
purely by the presence of a "tasks" key (taskrun.py:32-39). Tasks run
sequentially; `disabled: true` routes to nop (taskrun.py:70-72).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

from dasladen_spark.connections import ConnectionRegistry
from dasladen_spark.tasks import TASK_TYPES, TaskContext


def parse_to_int(value, default: int = 0) -> int:
    """Accept both JSON numbers AND strings — the reference returns 0
    for real numbers (processor.py:189-196, a py2 basestring bug);
    fixed here."""
    try:
        return int(value)
    except (TypeError, ValueError):
        return default


class Runner:
    """Wraps one parsed task file (taskrun.py:22-55)."""

    def __init__(self, path_or_config: str | dict):
        if isinstance(path_or_config, dict):
            self.config = path_or_config
        else:
            with open(path_or_config, encoding="utf-8") as f:
                self.config = json.load(f)

    def is_task(self) -> bool:
        return isinstance(self.config, dict) and "tasks" in self.config

    def has_schedule(self) -> bool:
        sched = self.config.get("schedule") or {}
        return bool(sched.get("recurring"))

    @property
    def schedule(self) -> dict:
        return self.config.get("schedule") or {}


class TaskRunner:
    """Runs a task file's tasks sequentially (taskrun.py:64-76)."""

    def __init__(
        self,
        spark: SparkSession,
        runner: Runner,
        input_path: str = "input",
        output_path: str = "output",
        module_path: str = "module",
        log=print,
    ):
        self.spark = spark
        self.runner = runner
        self.log = log
        # per-stage wall clock of the LAST run() — pipeline benches
        # read this for stage attribution (tools/pipeline_stage_bench);
        # initialized here so reading it before run() (or after
        # run_with_schedule, which never populates it) sees {} rather
        # than AttributeError
        self.stage_walls: dict[str, float] = {}
        self.ctx = TaskContext(
            spark=spark,
            connections=ConnectionRegistry(runner.config.get("connections")),
            input_path=input_path,
            output_path=output_path,
            module_path=module_path,
            log=log,
        )

    def run(self) -> None:
        self.stage_walls = {}
        for item in self.runner.config.get("tasks", []):
            task_type = "nop" if item.get("disabled") else item.get("type")
            fn = TASK_TYPES.get(task_type)
            if fn is None:
                # reference parity: an unknown task type fails loudly
                # (task.py:599 raises NotImplementedError) — a typo'd
                # pipeline must not silently skip a stage
                raise ValueError(
                    f"task {item.get('name')!r}: unknown type"
                    f" {task_type!r}; available:"
                    f" {', '.join(sorted(TASK_TYPES))}"
                )
            t0 = time.time()
            self.log(f"task {item.get('name')} ({task_type}): start")
            fn(self.ctx, item)
            wall = time.time() - t0
            self.stage_walls[f"{item.get('name')}:{task_type}"] = round(
                wall, 3
            )
            self.log(
                f"task {item.get('name')} ({task_type}):"
                f" done in {wall:.2f}s"
            )

    def run_with_schedule(self) -> None:
        """times / infinity loop semantics (processor.py:154-169);
        `times` works as int OR string (quirk §4.4 fixed)."""
        sched = self.runner.schedule
        times = parse_to_int(sched.get("times"), default=1)
        if sched.get("infinity"):
            while True:  # pragma: no cover - explicit infinite mode
                self.run()
        for _ in range(max(times, 1)):
            self.run()
