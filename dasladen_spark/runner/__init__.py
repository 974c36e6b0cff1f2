"""Control plane: JSON task-file runner, capture-folder watcher,
scheduler, CLI (SURVEY §2.7, §3)."""

from dasladen_spark.runner.taskrun import Runner, TaskRunner  # noqa: F401
from dasladen_spark.runner.watcher import Watcher  # noqa: F401
