"""Streaming deduplication: exactly-once semantics over an
at-least-once transport (SURVEY.md section 2.10 streaming tier).

A CDC feed replayed after a failure redelivers records; the consumer
needs key-based dedup with BOUNDED state.  ``dropDuplicatesWithinWatermark``
is the engine-native answer: state holds one entry per key seen within
the watermark horizon and is evicted once the watermark passes it --
memory is O(keys per horizon), not O(stream).  (Plain
``dropDuplicates`` only bounds state when the event-time column is
PART of the dedup key; with a pure business key like event_id its
state grows forever -- the classic trap this module exists to avoid,
pinned by the eviction test.)

Scale: state is partitioned by key hash across executors like any
stateful streaming op; the dedup itself is a state-store lookup per
record, no shuffle beyond the keyBy."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events_stream: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Keep the first arrival of each key within the watermark horizon.

    With identical redelivered payloads (the CDC replay case) the
    output is deterministic regardless of which copy survives."""
    return events_stream.withWatermark(
        "ts", watermark_delay
    ).dropDuplicatesWithinWatermark(list(key_cols))
