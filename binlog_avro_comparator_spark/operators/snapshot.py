"""CDC apply-changes: materialize current table state from a change
stream.

The reference toolset *verifies* a CDC stream (compare_timestamps.go);
the natural companion operator -- what every CDC consumer ultimately
does with the stream -- is to APPLY it: last write per key wins, a
final DELETE removes the key (the Debezium/Delta ``APPLY CHANGES INTO``
semantics).  The reference gets its analogous last-write-wins behavior
from insertion order (compare_timestamps.go:147); here order is data,
an explicit (ts, id) ordering column pair.

Scale design: ONE hash aggregate, no window.  ``max_by(payload,
struct(ts, id))`` is an ordinary aggregate -- partial aggregation
(map-side combine) applies, so each input partition contributes one
candidate row per key it saw and the shuffle carries keys, not events.
A ``row_number() OVER (PARTITION BY key)`` formulation would move every
event of a hot key into one task; this never does.  The DELETE filter
runs after the aggregate (state per key is O(1) either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# event_type -> CDC operation, same DML vocabulary the fixture derivation
# uses (fixtures.py CHANGE_TYPE_MAP; compare_timestamps.go:231-238)
_OP = {"click": "INSERT", "view": "UPDATE", "purchase": "DELETE"}


def apply_changes(events: DataFrame) -> DataFrame:
    """Materialize the per-user snapshot implied by the event stream:
    click=INSERT, view=UPDATE, purchase=DELETE, applied in (ts,
    event_id) order; users whose LAST change is a DELETE are absent
    from the snapshot.

    Output: one row per live user -- the last operation's type, time,
    value, and the number of changes applied."""
    op = F.lit(None).cast("string")
    for src, dst in _OP.items():
        op = F.when(F.col("event_type") == src, dst).otherwise(op)
    ts_ms = F.unix_millis(F.col("ts"))
    changes = events.filter(
        F.col("event_type").isin(*_OP) & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.struct(
            op.alias("op"),
            ts_ms.alias("ts_ms"),
            F.col("event_id").alias("event_id"),
            F.col("value").alias("value"),
        ).alias("c"),
        F.struct(ts_ms.alias("ts_ms"), F.col("event_id").alias("event_id")).alias(
            "__ord"
        ),
    )
    snap = changes.groupBy("user_id").agg(
        F.max_by("c", F.col("__ord")).alias("last"),
        F.count("*").alias("n_changes"),
    )
    return snap.filter(F.col("last.op") != "DELETE").select(
        "user_id",
        F.col("last.op").alias("last_op"),
        F.col("last.ts_ms").alias("last_ts_ms"),
        F.col("last.event_id").alias("last_event_id"),
        F.round(F.col("last.value"), 4).alias("last_value"),
        "n_changes",
    )
