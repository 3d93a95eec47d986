"""Event-time windowed aggregation with watermark (SURVEY.md section
2.10: the reference's only 'watermark' is manually rotating binlogs;
this is the engine-native replacement for late-arriving CDC data).

Tumbling event-time windows over the stream, keyed by event type, with
a watermark bounding state: windows older than (max event time -
delay) are finalized and dropped from state, so memory is O(active
windows) no matter how long the stream runs.  Append output mode emits
each window exactly once, when the watermark passes it -- the right
sink contract for downstream consumers that must not see partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """events stream (ts timestamp, event_type, value) -> finalized
    per-window per-type counts and exact min/max value bounds."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            "event_type",
            "n_events",
            "min_value",
            "max_value",
        )
    )
