"""Recurring-schedule parsing — parity with processor.py:54-136 but
without the `schedule` library (not installed): compute next-fire
times directly. Supports the reference's JSON schema:

    {"recurring": true, "frequency": "daily" | "weekly" | "minutes" |
     "hours", "time": "HH:MM", "minutes": N, "hours": N,
     "weekday": ["monday", ...], "one_shot": bool}

The reference's non-recurring branch is unreachable
(taskrun.py:41-47 requires `recurring` truthy — SURVEY §2.7); kept
that gate for parity.
"""

from __future__ import annotations

import datetime as dt

_WEEKDAYS = [
    "monday",
    "tuesday",
    "wednesday",
    "thursday",
    "friday",
    "saturday",
    "sunday",
]


def _parse_time(s: str | None) -> dt.time:
    if not s:
        return dt.time(0, 0)
    parts = [int(p) for p in s.split(":")]
    return dt.time(*parts[:3])


def next_fire(schedule: dict, now: dt.datetime) -> dt.datetime | None:
    """Next fire instant strictly after `now`, or None if the
    schedule is not recurring."""
    if not schedule.get("recurring"):
        return None
    freq = schedule.get("frequency", "daily")

    if freq == "minutes":
        n = int(schedule.get("minutes", 1))
        return now + dt.timedelta(minutes=n)
    if freq == "hours":
        n = int(schedule.get("hours", 1))
        return now + dt.timedelta(hours=n)

    at = _parse_time(schedule.get("time"))
    if freq == "daily":
        # every-N-days (ref processor.py:76-80: "days" count, default
        # 1): first fire at the next at-time, then N-day strides —
        # next_fire is re-invoked with the fire instant as `now`, so
        # the stride lands by skipping N days once today's slot passed
        n_days = int(schedule.get("days", 1))
        candidate = dt.datetime.combine(now.date(), at)
        if candidate <= now:
            candidate += dt.timedelta(days=n_days)
        return candidate
    if freq == "weekly":
        fires = _initial_weekly(schedule, now)
        return min(fires.values()) if fires else None
    raise ValueError(f"unknown frequency {freq!r}")


def _initial_weekly(schedule: dict, now: dt.datetime) -> dict[int, dt.datetime]:
    """Per-weekday first-fire map for a weekly schedule (ref
    processor.py:82-112: each listed weekday is an INDEPENDENT
    schedule.every(weeks).<day> job). Each weekday's first fire is its
    next occurrence pushed out (N-1) extra weeks; afterwards it
    strides N weeks from its OWN last fire — so Monday firing never
    pushes Friday of the same on-week onto an off-week."""
    at = _parse_time(schedule.get("time"))
    n_weeks = int(schedule.get("weeks", 1))
    days = schedule.get("weekday") or _WEEKDAYS
    fires: dict[int, dt.datetime] = {}
    for name in days:
        wd = _WEEKDAYS.index(name.lower())
        offset = (wd - now.date().weekday()) % 7
        candidate = dt.datetime.combine(
            now.date() + dt.timedelta(days=offset), at
        )
        if candidate <= now:
            candidate += dt.timedelta(weeks=1)
        fires[wd] = candidate + dt.timedelta(weeks=n_weeks - 1)
    return fires


class ScheduledJob:
    """One recurring task file; one-shot jobs cancel after the first
    fire (processor.py:50-51)."""

    def __init__(self, schedule: dict, action, now: dt.datetime | None = None):
        self.schedule = schedule
        self.action = action
        self.one_shot = bool(schedule.get("one_shot"))
        self.cancelled = False
        now = now or dt.datetime.now()
        if schedule.get("recurring") and schedule.get("frequency") == "weekly":
            # weekly keeps per-weekday state: each weekday strides N
            # weeks from its own last fire (see _initial_weekly)
            self._weekly: dict[int, dt.datetime] | None = _initial_weekly(
                schedule, now
            )
            self._next = min(self._weekly.values()) if self._weekly else None
        else:
            self._weekly = None
            self._next = next_fire(schedule, now)

    @property
    def next_run(self) -> dt.datetime | None:
        return None if self.cancelled else self._next

    def tick(self, now: dt.datetime | None = None) -> bool:
        """Fire if due; returns whether it fired."""
        now = now or dt.datetime.now()
        if self.cancelled or self._next is None or now < self._next:
            return False
        self.action()
        if self.one_shot:
            self.cancelled = True
        elif self._weekly is not None:
            n_weeks = int(self.schedule.get("weeks", 1))
            for wd, when in self._weekly.items():
                while when <= now:
                    when += dt.timedelta(weeks=n_weeks)
                self._weekly[wd] = when
            self._next = min(self._weekly.values())
        else:
            self._next = next_fire(self.schedule, now)
        return True


class Scheduler:
    """Minimal job list ticked from the watch loop (base.py:69-77)."""

    def __init__(self):
        self.jobs: list[ScheduledJob] = []

    def enqueue(self, schedule: dict, action) -> ScheduledJob:
        job = ScheduledJob(schedule, action)
        self.jobs.append(job)
        return job

    def run_pending(self, now: dt.datetime | None = None) -> int:
        fired = sum(1 for j in self.jobs if j.tick(now))
        self.jobs = [j for j in self.jobs if not j.cancelled]
        return fired
