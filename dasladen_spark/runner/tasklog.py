"""Per-task-file log files — parity with the reference's log module
(/root/reference/dasladen/log.py:16-38: FileHandler appends
timestamped lines to ``log/<key>.log``; wired per task file at
base.py:43-48, disabled by ``--no-log`` base.py:34).

Users diagnose failed nightly loads from these files, so the file is
flushed per line and opened in append mode (one file per task-file
key accumulates across runs, like the reference).
"""

from __future__ import annotations

import datetime as dt
import os


class TaskLog:
    """Timestamped log lines to ``<log_dir>/<key>.log`` (append) and,
    when a console callable is given, mirrored there too. Callable so
    it drops into every ``log=`` seam."""

    def __init__(
        self,
        key: str,
        log_dir: str = "log",
        to_file: bool = True,
        console=None,
    ):
        self.console = console
        self.path: str | None = None
        self._fh = None
        if to_file:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{key}.log")
            self._fh = open(self.path, "a", encoding="utf-8")

    def write(self, msg: str) -> None:
        line = f"{dt.datetime.now():%Y-%m-%d %H:%M:%S} {msg}"
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.console:
            self.console(line)

    __call__ = write

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "TaskLog":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
