"""Engine-native session windows over the event stream (SURVEY.md
§2.10 streaming tier: the declarative sibling of the
applyInPandasWithState sessionizer in sessionize_stream.py -- same
gap semantics, but expressed as a built-in ``session_window``
aggregation so state merging, watermark eviction, and the aggregate
all stay JVM-side with zero Python in the loop).

Semantics (pinned empirically by test_session_window_gap_boundary
and mirrored in the DuckDB lag-gap-island twin): an event EXTENDS the
current session iff its timestamp is at most ``previous timestamp +
gap`` -- the boundary event at exactly ``+gap`` still merges; only a
strictly larger gap starts a new session.  A session's end is
``last event + gap`` (Spark's window.end contract).

Scale: state is keyed by (user, open session) and sessions close as
the watermark passes, so memory is O(active sessions), not O(events);
the aggregation is a standard partial-merge under the hood -- no
per-user global ordering ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_window_stats(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """events stream (ts timestamp, user_id, value) -> one row per
    closed-or-open session per user: bounds, event count, exact value
    extrema (count/min/max only -- order-independent, so streaming
    merge order can't perturb parity with the batch oracle)."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "min_value",
            "max_value",
        )
    )
