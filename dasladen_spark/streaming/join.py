"""Stream-stream interval join.

The reference has no streaming (its watcher is a control-plane
poller, /root/reference/dasladen/processor.py:298-338); this is the
north-star event-attribution shape: match each left event (e.g. a
view/impression) to right events (e.g. purchases) for the same key
that occur within a bounded time window after it.

Structured Streaming can only run a stream-stream join with bounded
state, which requires (a) watermarks on BOTH sides and (b) a time
bound between the two event-time columns in the join condition —
together they let Spark expire buffered rows. This operator builds
exactly that condition, so state per executor is
O(key-rate × (watermark + max_delay)), independent of total stream
length. The same function joins batch DataFrames identically (no
watermark needed), so backfill and live pipelines share one code
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` to ``right`` rows with the same ``key`` whose
    ``right_ts`` falls in ``[left_ts, left_ts + max_delay]``.

    ``left_ts`` / ``right_ts`` must be distinct column names (rename
    before calling); all other column names must not collide. For
    streaming inputs both sides get ``watermark``; pass
    ``how="leftOuter"`` for unmatched-left attribution — note that in
    streaming mode outer results only emit once the watermark passes
    the row (an availableNow drain of a finite file stream withholds
    the final window; batch mode emits everything).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (
        right.withWatermark(right_ts, watermark)
        if right.isStreaming
        else right
    )
    l, r = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l.join(r, cond, how)
    right_cols = [
        F.col(f"r.{c}").alias(c) for c in right.columns if c != key
    ]
    return joined.select([F.col(f"l.{c}") for c in left.columns] + right_cols)


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) fact
    flow to a static dimension table — the lookup every live
    pipeline does before writing (user → account, sku → catalog).

    The dimension is explicitly broadcast: Structured Streaming
    re-evaluates the static side per micro-batch, and a broadcast
    keeps each batch a map-side join — the stream NEVER shuffles for
    the lookup, which is the only stream-join shape that holds at
    full ingest rate. Stream-static joins need no watermark (the
    static side can't grow state). Works identically on batch
    DataFrames, so backfill shares the code path."""
    return stream.join(F.broadcast(dim), on=key, how=how)
