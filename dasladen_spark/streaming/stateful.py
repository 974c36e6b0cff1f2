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


#: output schema of ewma_by_key (module-level: parity tests share it)
EWMA_SCHEMA = "user_id bigint, n_events bigint, ewma double"
_EWMA_STATE_SCHEMA = "n bigint, s double"


def _make_ewma_fn(alpha: float, timeout_ms: int | None):
    """Per-key exponential smoothing fold. Rows are sorted by
    (ts, event_id) inside each invocation, so given ordered
    micro-batches the recursion s ← α·x + (1−α)·s is a pure function
    of the event sequence — the differential test replays it in
    pandas and matches exactly."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ewma": [s]}
            )
            return
        n, s = state.get if state.exists else (0, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for x in rows["value"].astype("float64"):
            s = float(x) if n == 0 else alpha * float(x) + (1.0 - alpha) * s
            n += 1
        state.update((n, s))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [s]})

    return fn


def ewma_by_key(
    events: DataFrame,
    alpha: float = 0.2,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user exponentially-weighted running mean across
    micro-batches — the streaming sibling of q_ewma_weekly_revenue
    (there the decay is over a bounded window for oracle parity;
    here it is the true unbounded recursion, which only a stateful
    operator can maintain). State per key is TWO numbers regardless
    of history length — the textbook case for
    ``applyInPandasWithState`` over a raw-event replay, which would
    re-read the full history every trigger. Input needs
    (user_id, ts, event_id, value) columns."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_ewma_fn(alpha, timeout_ms),
            outputStructType=EWMA_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


CUSUM_SCHEMA = (
    "user_id bigint, n_events bigint, cusum double, drift boolean"
)
_CUSUM_STATE_SCHEMA = "n bigint, s double"


def _make_cusum_fn(slack: float, threshold: float, timeout_ms: int | None):
    """Per-key one-sided CUSUM fold S ← max(0, S + (x − slack)).
    Rows sort by (ts, event_id) per invocation, so given ordered
    micro-batches the statistic is a pure function of the event
    sequence — the differential test replays it sequentially. Unlike
    the batch q_cusum_drift (whole-history closed form with
    data-derived slack), the streaming detector takes slack/threshold
    as parameters: a live monitor alarms against an agreed baseline,
    not one it re-estimates per batch."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "cusum": [s],
                    "drift": [s > threshold],
                }
            )
            return
        n, s = state.get if state.exists else (0, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for x in rows["value"].astype("float64"):
            s = max(0.0, s + (float(x) - slack))
            n += 1
        state.update((n, s))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cusum": [s],
                "drift": [s > threshold],
            }
        )

    return fn


def cusum_by_key(
    events: DataFrame,
    slack: float,
    threshold: float,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user one-sided CUSUM drift detector across micro-batches —
    the streaming sibling of q_cusum_drift (there the whole history
    is replayed through the prefix-min closed form; here the true
    recursion S ← max(0, S + x − slack) runs live, which only a
    stateful operator can maintain). Emits the running statistic and
    a drift flag once S crosses ``threshold``; state per key is TWO
    numbers regardless of history length. Input needs
    (user_id, ts, event_id, value) columns."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_cusum_fn(slack, threshold, timeout_ms),
            outputStructType=CUSUM_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


P2_SCHEMA = "user_id bigint, n_events bigint, quantile double"
_P2_STATE_SCHEMA = "cnt bigint, q array<double>, n array<bigint>"


def _p2_step(q: list, n: list, x: float, p: float) -> None:
    """One P² update (Jain & Chlamtac 1985): adjust the five markers
    for a new observation ``x``. ``q`` heights and ``n`` positions
    mutate in place; caller guarantees len(q) == len(n) == 5."""
    if x < q[0]:
        q[0] = x
        k = 0
    elif x >= q[4]:
        q[4] = x
        k = 3
    else:
        k = 0
        for i in range(1, 4):
            if x >= q[i]:
                k = i
    for i in range(k + 1, 5):
        n[i] += 1
    # desired positions after cnt observations: 1, 1+2p(c-1)/4... we
    # track them incrementally via the standard dn' increments
    dns = (0.0, p / 2.0, p, (1.0 + p) / 2.0, 1.0)
    # n'_i lives implicitly: n'_i = 1 + dns[i] * (cnt - 1); compute
    # from the running count tracked by the caller via n[4]
    cnt = n[4]
    for i in (1, 2, 3):
        want = 1.0 + dns[i] * (cnt - 1)
        d = want - n[i]
        if (d >= 1.0 and n[i + 1] - n[i] > 1) or (
            d <= -1.0 and n[i - 1] - n[i] < -1
        ):
            d = 1.0 if d >= 1.0 else -1.0
            # parabolic (P²) interpolation, else linear
            qi = q[i] + d / (n[i + 1] - n[i - 1]) * (
                (n[i] - n[i - 1] + d)
                * (q[i + 1] - q[i])
                / (n[i + 1] - n[i])
                + (n[i + 1] - n[i] - d)
                * (q[i] - q[i - 1])
                / (n[i] - n[i - 1])
            )
            if q[i - 1] < qi < q[i + 1]:
                q[i] = qi
            else:
                j = i + (1 if d > 0 else -1)
                q[i] = q[i] + d * (q[j] - q[i]) / (n[j] - n[i])
            n[i] = int(n[i] + d)


def _p2_estimate(cnt: int, q: list, p: float) -> float:
    if cnt <= 5:
        s = sorted(q[:cnt])
        if not s:
            return float("nan")
        # nearest-rank (ceil(p·n) − 1) on the raw retained values —
        # int(p·n) would floor to the UPPER value for even counts at
        # the median
        import math

        idx = max(0, min(cnt - 1, math.ceil(p * cnt) - 1))
        return s[idx]
    return q[2]


def _make_p2_fn(p: float, timeout_ms: int | None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            cnt, q, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "quantile": [_p2_estimate(cnt, list(q), p)],
                }
            )
            return
        cnt, q, n = (
            state.get if state.exists else (0, [0.0] * 5, [0] * 5)
        )
        q, n = list(q), list(n)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for x in rows["value"].astype("float64"):
            x = float(x)
            if cnt < 5:
                q[cnt] = x
                cnt += 1
                if cnt == 5:
                    q.sort()
                    n = [1, 2, 3, 4, 5]
            else:
                cnt += 1
                # _p2_step increments the marker positions itself
                # (n[4] always advances by 1 per observation)
                _p2_step(q, n, x, p)
        state.update((cnt, q, n))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "quantile": [_p2_estimate(cnt, q, p)],
            }
        )

    return fn


def p2_quantile_by_key(
    events: DataFrame,
    p: float = 0.5,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user streaming quantile estimate via the P² algorithm —
    FIVE markers of state per key regardless of history length, the
    classic bounded-memory answer to "p95 latency per key over an
    unbounded stream" (exact per-key percentiles would buffer every
    observation; approx_percentile sketches don't run incrementally
    per key inside a stateful operator). Estimates converge to the
    true quantile as the stream grows; the first five observations
    are exact (nearest-rank on the retained values). Input needs
    (user_id, ts, event_id, value) columns. Deterministic given
    micro-batch order: rows sort by (ts, event_id) per invocation,
    so the differential test replays the identical sequence."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_p2_fn(p, timeout_ms),
            outputStructType=P2_SCHEMA,
            stateStructType=_P2_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


HOLT_SCHEMA = (
    "user_id bigint, n_events bigint, level double, trend double,"
    " forecast double"
)
_HOLT_STATE_SCHEMA = "n bigint, l double, b double"


def _make_holt_fn(alpha: float, beta: float, timeout_ms: int | None):
    """Per-key Holt double-exponential fold:
    level ← α·x + (1−α)(level + trend); trend ← β·(level − level₋₁)
    + (1−β)·trend. Rows sort by (ts, event_id) per invocation, so
    the recursion is a pure function of the event sequence."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, lvl, b = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "level": [lvl],
                    "trend": [b],
                    "forecast": [lvl + b],
                }
            )
            return
        n, lvl, b = state.get if state.exists else (0, 0.0, 0.0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for x in rows["value"].astype("float64"):
            x = float(x)
            if n == 0:
                lvl, b = x, 0.0
            elif n == 1:
                b = x - lvl
                lvl = alpha * x + (1.0 - alpha) * (lvl + b)
            else:
                prev = lvl
                lvl = alpha * x + (1.0 - alpha) * (lvl + b)
                b = beta * (lvl - prev) + (1.0 - beta) * b
            n += 1
        state.update((n, lvl, b))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "level": [lvl],
                "trend": [b],
                "forecast": [lvl + b],
            }
        )

    return fn


def holt_by_key(
    events: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-user Holt double-exponential smoothing across
    micro-batches — level AND trend where ewma_by_key tracks level
    only, so the emitted one-step ``forecast`` (level + trend)
    anticipates drifting series instead of lagging them. State per
    key is THREE numbers regardless of history length. Init follows
    the standard convention: first value seeds the level, the first
    difference seeds the trend. Input needs (user_id, ts, event_id,
    value) columns; deterministic given micro-batch order (rows sort
    by (ts, event_id) per invocation — the differential test replays
    the identical sequence)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_holt_fn(alpha, beta, timeout_ms),
            outputStructType=HOLT_SCHEMA,
            stateStructType=_HOLT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
