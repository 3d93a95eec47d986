"""In-flight pipeline metrics via Spark's Observation API: named
aggregates attached to a plan node and collected AS the action runs --
row counts, null-key tallies, high-water marks for free, with no second
scan of the input (the `df.count()` + `df.agg(...)` anti-pattern reads
everything twice; at 100 TB twice is the difference between a metric
and a bill).

The reference's Go pipeline keeps analogous running counters while it
streams events (processed/matched/mismatched tallies printed in its
summary); this is the Spark-native equivalent: metrics ride the same
Tungsten pass that produces the output."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_metrics(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, "object"]:
    """Attach named metric aggregates to ``df``.  Returns (observed_df,
    observation); after ANY action on observed_df (or a plan built on
    it), ``observation.get`` holds the metric dict -- one pass, no
    re-scan.  Streaming plans surface the same metrics per micro-batch
    through StreamingQueryListener instead; this helper is the batch
    path."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def cdc_ingest_metrics(events: DataFrame) -> tuple[DataFrame, "object"]:
    """The canned ingest health counters for a CDC feed frame (the
    metadata-path schema: log_position + gtid + event_type): total
    rows, null/zero positions (the F2 drop candidates), distinct-free
    max position high-water mark, and GTID-missing count."""
    return with_metrics(
        events,
        "cdc_ingest",
        F.count(F.lit(1)).alias("n_rows"),
        F.count(
            F.when(
                F.col("log_position").isNull() | (F.col("log_position") == 0), 1
            )
        ).alias("n_invalid_position"),
        F.max("log_position").alias("max_position"),
        F.count(F.when(F.col("gtid").isNull(), 1)).alias("n_missing_gtid"),
    )
