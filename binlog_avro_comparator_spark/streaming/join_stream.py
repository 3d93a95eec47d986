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


def view_click_left_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    window_ms: int = 600_000,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every view emits -- with
    its clicks if any arrive in the window, or ONCE with nulls after
    the watermark proves no click can still come.

    This is the semantics the watermark machinery exists for: an inner
    join only ever adds rows, but an outer join must assert a NEGATIVE
    ("no click happened within 10 minutes"), which is unknowable on an
    open stream until the watermark passes view_ts + window.  Spark
    holds the unmatched view in state exactly that long, then emits the
    null-padded row and evicts -- so the null results arrive late by
    (window + delay), the price of correctness on out-of-order input.

    End-of-replay contract (what the oracle states): with both sides
    drained via availableNow, the final watermark W = min over inputs
    of (max event time - delay); inner pairs all emit, and a matchless
    view emits null-padded iff view_ts + window <= W -- the horizon is
    inclusive, pinned by test_left_join_boundary_horizon.  Matchless views
    YOUNGER than that horizon are still legitimately in state when the
    replay ends -- the stream cannot yet rule out a future click --
    and are absent, like cdc_findings_stream's end-of-stream
    BINLOG_ONLY tier."""
    v = views.withWatermark("ts", watermark_delay).select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.withWatermark("ts", watermark_delay).select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = v.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            < F.col("view_ts") + F.expr(f"INTERVAL {window_ms} MILLISECONDS")
        ),
        "leftOuter",
    )
    return joined.select(
        "view_event_id",
        "click_event_id",
        "user_id",
        (F.unix_millis("click_ts") - F.unix_millis("view_ts")).alias("gap_ms"),
    )
