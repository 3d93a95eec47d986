"""Stream-stream join: correlating two live feeds inside the engine
(SURVEY.md section 2.10 streaming tier) -- the incremental form of the
batch interval join (operators/joins.py range_join_bucketed), e.g.
attributing each click to the view that preceded it while both streams
are still flowing.

Engine shape: Spark buffers BOTH sides in keyed state and emits a pair
the moment the partner arrives.  Two things bound that state, and both
are part of the join declaration, not tuning:

  * watermarks on both event-time columns -- how late either side may
    arrive; and
  * a time-RANGE predicate tying the two event times together -- how
    long a row can still find new partners.

From watermark + range Spark derives a state horizon per side and
evicts buffered rows the watermark has passed; without the range
predicate an inner stream-stream join would hold every row forever
(the unbounded-state trap, same family as dedup_stream's).  State is
hash-partitioned by the equi-key (user_id) across executors, so at
100 TB/day the buffer for one user lives on one executor and the
total footprint is O(rows inside the horizon), independent of stream
length.

Inner-join completeness: every pair whose two rows both arrive within
their watermark allowance is emitted exactly once -- eviction only
drops state the range predicate already rules out -- so a finite
replay drained with availableNow reproduces the batch interval join
row for row (that equivalence IS the driver oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def view_click_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    window_ms: int = 600_000,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Pair every click with each view by the same user in the
    preceding ``window_ms`` (click in [view_ts, view_ts + window)).

    Inputs are streaming frames with (event_id, user_id, ts) where
    ``ts`` is an event-time timestamp column; output columns match the
    batch range join: (view_event_id, click_event_id, user_id,
    gap_ms)."""
    v = (
        views.withWatermark("ts", watermark_delay)
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark_delay)
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            < F.col("view_ts") + F.expr(f"INTERVAL {window_ms} MILLISECONDS")
        ),
        "inner",
    )
    return joined.select(
        "view_event_id",
        "click_event_id",
        "user_id",
        (F.unix_millis("click_ts") - F.unix_millis("view_ts")).alias("gap_ms"),
    )
