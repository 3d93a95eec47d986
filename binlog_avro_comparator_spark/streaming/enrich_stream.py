"""Stream-static enrichment join: decorating a live event feed with a
batch dimension (SURVEY.md section 2.10 streaming tier) -- the pattern
behind every "join the clickstream to the user table" pipeline.

Engine shape: unlike a stream-stream join, the static side is a plain
batch DataFrame; Spark re-resolves it against EVERY micro-batch, so the
join is completely STATELESS -- no watermark, no buffered rows, no
state store.  That also means the static side is re-READ per batch
unless it is small enough to broadcast (it is here: one row per user),
in which case each micro-batch is a map-side hash lookup.  At 100 TB of
stream with a large dimension, the same declaration scales by swapping
the broadcast for a pre-bucketed static table co-partitioned with the
stream's shuffle -- the operator code does not change.

Left-outer keeps events whose user has no profile row (impossible when
the profile derives from the same corpus, but the contract matters on a
real feed where new users appear mid-stream before the dimension
refreshes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(18,6)"


def user_profile(events: DataFrame) -> DataFrame:
    """Batch (static) side: one row per user -- lifetime event count,
    purchase count, and decimal-exact total spend.  Map-side-combined
    aggregate over the user key; the output is dimension-sized (one row
    per distinct user), which is what makes the streaming join below
    broadcastable."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("user_n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "user_n_purchases"
        ),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("user_total_value"),
    )


def enrich_with_profile(stream: DataFrame, profile: DataFrame) -> DataFrame:
    """Streaming side: left-join each event to its (broadcast) profile
    row and flag power users (>= 5 lifetime purchases).  Append-mode
    safe with NO watermark: a stream-static join emits each stream row
    exactly once, in the micro-batch it arrives."""
    return (
        stream.select("event_id", "user_id", "event_type", "value")
        .join(F.broadcast(profile), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            "user_n_events",
            "user_n_purchases",
            "user_total_value",
            (F.coalesce(F.col("user_n_purchases"), F.lit(0)) >= 5).alias(
                "is_power_user"
            ),
        )
    )
