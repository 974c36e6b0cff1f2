"""Custom stateful streaming operators.

The reference has no streaming at all (its watcher polls task files,
/root/reference/dasladen/processor.py:298-338) — these are the
north-star additions a continuous event pipeline needs, expressed in
Structured Streaming's bounded-state idioms:

- session windows with a watermark (built-in `session_window`)
- per-key running statistics via `applyInPandasWithState` — the
  escape hatch for aggregates Spark doesn't ship, with explicit
  state schema + processing-time timeout so state can't grow
  unboundedly
- watermarked streaming dedup (`dropDuplicatesWithinWatermark`)

Every operator also accepts a batch DataFrame where semantics allow,
so the same pipeline code runs in backfill and live modes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window aggregation: events for a key separated by less
    than ``gap`` merge into one session. Streaming state is bounded
    by the watermark; in batch mode the same expression computes the
    identical sessions in one pass."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"),
        F.col(key_col),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )


#: output schema of running_stats (kept module-level so batch parity
#: checks and the streaming query share one definition)
RUNNING_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n bigint, total double, mx double"


def _make_running_stats_fn(timeout_ms: int | None):
    """Build the per-key fold. A closure (not a module-level fn) so
    the timeout duration travels to the executors with the function:
    the timeout must be re-armed via ``state.setTimeoutDuration`` on
    EVERY invocation for the key — selecting ProcessingTimeTimeout on
    the query alone never expires anything."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle key: emit its final totals once, then drop the
            # state row — the bounded-state guarantee
            n, total, mx = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )
            return
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf["value"].astype("float64")
            n += int(len(vals))
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return fn


def running_user_stats(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum, max) across micro-batches —
    a custom stateful aggregate via ``applyInPandasWithState``.

    State is one fixed-width row per user (bounded); an optional
    processing-time timeout expires idle keys (final row emitted,
    state removed) so a 100 TB keyspace can't pin state forever.
    Input needs (user_id, value) columns."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_running_stats_fn(timeout_ms),
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key emission within the watermark horizon:
    `dropDuplicatesWithinWatermark` keeps state only until the
    watermark passes each key — the bounded-state form of streaming
    dedup (plain dropDuplicates on a stream retains state forever).
    Batch frames fall back to plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
