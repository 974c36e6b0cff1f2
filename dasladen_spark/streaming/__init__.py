"""Structured Streaming surface (SURVEY §2.8 — absent from the
reference, whose watcher is control-plane only)."""

from dasladen_spark.streaming.ingest import stream_csv_folder, windowed_event_counts  # noqa: F401
from dasladen_spark.streaming.join import interval_join  # noqa: F401
from dasladen_spark.streaming.stateful import (  # noqa: F401
    running_user_stats,
    sessionized_counts,
    streaming_dedup,
)
