"""Gap-based sessionization over the ``events`` stream table.

The window-function analogue of the reference's only stateful operator
(P4 event assembly, json_parser.go:43-53): a boundary predicate turns
into a cumulative sum that assigns group ids.  Same pattern, applied to
time gaps instead of header lines.

Scale: one shuffle on user_id (the window partition key); aggregates
are per-(user, session) -- bounded state, no skew beyond a single
user's history.  Session metrics are min/max/count only (order-
independent, exact -- no float summation nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

GAP_MS = 30 * 60 * 1000  # 30 minutes


def sessionize(events: DataFrame, gap_ms: int = GAP_MS) -> DataFrame:
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ms").asc(), F.col("event_id").asc()
    )
    with_gap = events.select(
        "user_id",
        "event_id",
        ms.alias("ts_ms"),
    ).withColumn("prev_ms", F.lag("ts_ms").over(w))
    with_new = with_gap.withColumn(
        "is_new",
        (F.col("prev_ms").isNull() | ((F.col("ts_ms") - F.col("prev_ms")) > gap_ms)).cast(
            "long"
        ),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_ms").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = with_new.withColumn("session_id", F.sum("is_new").over(w2))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
    )
