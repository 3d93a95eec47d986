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


def apply_changes(events: DataFrame, keep_deletes: bool = False) -> DataFrame:
    """Materialize the per-user snapshot implied by the event stream:
    click=INSERT, view=UPDATE, purchase=DELETE, applied in (ts,
    event_id) order; users whose LAST change is a DELETE are absent
    from the snapshot.

    ``keep_deletes=True`` keeps the DELETE-final rows (tombstones) --
    the DELTA form a downstream MERGE consumes (merge_upsert), where a
    trailing delete must travel instead of vanishing.

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
    if not keep_deletes:
        snap = snap.filter(F.col("last.op") != "DELETE")
    return snap.select(
        "user_id",
        F.col("last.op").alias("last_op"),
        F.col("last.ts_ms").alias("last_ts_ms"),
        F.col("last.event_id").alias("last_event_id"),
        F.round(F.col("last.value"), 4).alias("last_value"),
        "n_changes",
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Change-data-feed between two materialized snapshot versions:
    which keys were INSERTed, UPDATEd, or DELETEd going old -> new --
    the read side of the versioned-snapshot story (time travel gives
    you the states; this gives you the delta a downstream consumer
    replays).

    ONE full-outer hash join on the snapshot key; UPDATE is any
    difference in the non-key columns (struct inequality, one
    comparison, no per-column plan blowup); identical rows drop out.
    Both inputs are already aggregate-sized (one row per live key), so
    at 100 TB the diff costs one snapshot-sized shuffle, not an event
    replay.  Returns (user_id, change, old_last_event_id,
    new_last_event_id, old_n_changes, new_n_changes)."""
    payload = [c for c in old.columns if c != "user_id"]
    o = old.select(
        F.col("user_id").alias("__ok"),
        F.struct(*payload).alias("__ov"),
    )
    n = new.select(
        F.col("user_id").alias("__nk"),
        F.struct(*payload).alias("__nv"),
    )
    j = o.join(n, F.col("__ok") == F.col("__nk"), "full_outer")
    change = (
        F.when(F.col("__ok").isNull(), "INSERT")
        .when(F.col("__nk").isNull(), "DELETE")
        .when(F.col("__ov") != F.col("__nv"), "UPDATE")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("__ok"), F.col("__nk")).alias("user_id"),
            "change",
            F.col("__ov.last_event_id").alias("old_last_event_id"),
            F.col("__nv.last_event_id").alias("new_last_event_id"),
            F.col("__ov.n_changes").alias("old_n_changes"),
            F.col("__nv.n_changes").alias("new_n_changes"),
        )
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """SQL ``MERGE INTO`` semantics as one relational operator: rows of
    ``source`` that match a ``target`` key REPLACE that row's non-key
    columns (WHEN MATCHED THEN UPDATE), unmatched source rows INSERT,
    and -- when ``delete_col`` names a boolean column on the source --
    flagged rows DELETE (a delete of an absent key is a no-op, the
    standard MERGE contract).  The lazy-table counterpart of the
    foreachBatch snapshot sink's eager fold: Delta/Iceberg expose this
    statement; plain-parquet pipelines re-express it exactly like this.

    Shape: ONE full-outer join on the key -- the same snapshot-sized
    shuffle as snapshot_diff, co-partitioned with it when composed.
    Non-key payloads travel as single structs (row-atomic, no
    per-column join explosion), and the survivor pick is one coalesce:
    codegen end to end.  Contract: source carries the same columns as
    target (plus the flag), at most one row per key (pre-fold deltas
    with apply_changes(keep_deletes=True), exactly as SQL MERGE
    requires a unique source match).

    Returns the merged table with target's column layout."""
    data_cols = [c for c in target.columns if c not in keys]
    t = target.select(*keys, F.struct(*data_cols).alias("__t"))
    flag = (
        F.col(delete_col) if delete_col else F.lit(False)
    )
    s = source.select(*keys, F.struct(*data_cols).alias("__s"), flag.alias("__del"))
    j = t.join(s, on=keys, how="full_outer")
    return (
        j.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        .select(*keys, F.coalesce("__s", "__t").alias("__r"))
        .select(*keys, *[F.col(f"__r.{c}").alias(c) for c in data_cols])
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension Type-2 history from the change
    stream: every INSERT/UPDATE opens a dimension version carrying the
    row's value, valid from its change time until the NEXT change of
    any kind (a DELETE closes the open version without opening one) --
    the warehouse-standard effective-dated form of the same stream
    apply_changes folds to "current state only".  The reference
    consumes its CDC stream positionally (compare_timestamps.go:147);
    here order is data, the explicit (ts, event_id) pair, so the
    intervals are deterministic under any partitioning.

    Scale: one shuffle on the dimension key.  Both windows (the
    lead() that closes intervals and the row_number() that numbers
    versions) share the same partitioning, so Catalyst plans a single
    Exchange; per-key state is the key's change count -- the same
    bound sessionize already lives with -- and a hot key degrades one
    task, not the stage (AQE skew split applies to the exchange).

    Output: (user_id, version, op, value, valid_from_ms, valid_to_ms,
    is_current) -- valid_to_ms NULL means the version is still open."""
    from pyspark.sql import Window

    op = F.lit(None).cast("string")
    for src, dst in _OP.items():
        op = F.when(F.col("event_type") == src, dst).otherwise(op)
    ch = events.filter(
        F.col("event_type").isin(*_OP) & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        op.alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = ch.withColumn("valid_to_ms", F.lead("ts_ms").over(w))
    versions = seq.filter(F.col("op") != F.lit("DELETE"))
    return versions.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        "op",
        F.round(F.col("value"), 4).alias("value"),
        F.col("ts_ms").alias("valid_from_ms"),
        "valid_to_ms",
        F.col("valid_to_ms").isNull().alias("is_current"),
    )


def scd2_lookup(history: DataFrame, probes: DataFrame) -> DataFrame:
    """Point-in-time (effective-dated) lookup against an SCD2 history:
    for each probe (probe_event_id, user_id, probe_ts_ms), return the
    version whose half-open validity interval [valid_from_ms,
    valid_to_ms) covers the probe instant -- NULL version when the key
    had no state yet (probe predates the first version, or lands in a
    deleted gap).  This is the dimension-join every fact pipeline runs
    against a Type-2 dimension: "what did the row look like WHEN the
    fact happened", not "what does it look like now".

    Scale: an equi-join on the dimension key with the interval
    predicate as a residual filter -- a plain shuffled hash join, NOT
    a range/theta join, because intervals of one key are disjoint by
    construction so the residual keeps at most one row per probe.
    Candidate volume per probe = that key's version count (the same
    per-key bound as the history build), never a cross product."""
    h = history.select(
        F.col("user_id").alias("__hk"),
        "version",
        F.col("value").alias("state_value"),
        "valid_from_ms",
        "valid_to_ms",
    )
    cond = (
        (F.col("user_id") == F.col("__hk"))
        & (F.col("probe_ts_ms") >= F.col("valid_from_ms"))
        & (F.col("valid_to_ms").isNull() | (F.col("probe_ts_ms") < F.col("valid_to_ms")))
    )
    return probes.join(h, cond, "left").select(
        "probe_event_id",
        "user_id",
        "probe_ts_ms",
        "version",
        "state_value",
        "valid_from_ms",
    )


def ivm_refresh_typestats(
    events: DataFrame, cutoff: str = "2024-01-16"
) -> DataFrame:
    """Incremental view maintenance: refresh a materialized GROUP BY
    view -- live users and their summed last_value per last_op -- from
    a change delta WITHOUT recomputing it from the full feed.  This is
    the Materialize/DBSP retraction recipe every CDC-fed dashboard
    table ultimately needs: for each key the delta touches, RETRACT
    the key's old contribution (-1, -value against its old group) and
    ADD the new one (+1, +value against the new group); fold the
    signed contributions into the stored view.

    Here the "stored" inputs (the snapshot and view as of ``cutoff``)
    are derived in-plan from the pre-cutoff feed so the operator is
    self-contained and oracle-checkable; in production they are real
    tables and ONLY the delta tier runs: one apply_changes fold over
    the delta (key-sized), one equi-join of the affected keys against
    the stored snapshot, one tiny signed aggregate merged into the
    view -- the fact history is never rescanned, which is the whole
    point at 100 TB.  Sums carry decimal(18,4) so retraction is EXACT
    (a double running sum would drift from the recompute).  The DuckDB
    oracle recomputes the view from the full feed; incremental ==
    recompute is the correctness statement.  Returns (last_op,
    n_users, sum_last_value)."""
    cut = F.lit(cutoff).cast("timestamp")
    dec = "decimal(18,4)"
    old_snap = apply_changes(
        events.filter(F.col("ts") < cut), keep_deletes=True
    )
    view_old = (
        old_snap.filter(F.col("last_op") != "DELETE")
        .groupBy("last_op")
        .agg(
            F.count("*").alias("__n0"),
            F.sum(F.col("last_value").cast(dec)).alias("__s0"),
        )
    )
    delta_last = apply_changes(
        events.filter(F.col("ts") >= cut), keep_deletes=True
    ).select(
        "user_id",
        F.col("last_op").alias("__d_op"),
        F.col("last_value").alias("__d_val"),
    )
    # every delta change is newer than every stored change (cutoff
    # semantics), so the delta's per-key fold IS the key's new state
    affected = delta_last.join(
        old_snap.select(
            "user_id",
            F.col("last_op").alias("__o_op"),
            F.col("last_value").alias("__o_val"),
        ),
        "user_id",
        "left",
    )
    retract = affected.filter(
        F.col("__o_op").isNotNull() & (F.col("__o_op") != "DELETE")
    ).select(
        F.col("__o_op").alias("last_op"),
        F.lit(-1).alias("__dn"),
        (-F.col("__o_val").cast(dec)).alias("__dv"),
    )
    add = affected.filter(F.col("__d_op") != "DELETE").select(
        F.col("__d_op").alias("last_op"),
        F.lit(1).alias("__dn"),
        F.col("__d_val").cast(dec).alias("__dv"),
    )
    contrib = (
        retract.unionAll(add)
        .groupBy("last_op")
        .agg(F.sum("__dn").alias("__n1"), F.sum("__dv").alias("__s1"))
    )
    merged = view_old.join(contrib, "last_op", "full_outer")
    zero = F.lit(0).cast(dec)
    n = F.coalesce(F.col("__n0"), F.lit(0)) + F.coalesce(F.col("__n1"), F.lit(0))
    s = F.coalesce(F.col("__s0"), zero) + F.coalesce(F.col("__s1"), zero)
    return (
        merged.select(
            "last_op",
            n.alias("n_users"),
            F.round(s.cast("double"), 4).alias("sum_last_value"),
        )
        .filter(F.col("n_users") > 0)
    )


def scd2_audit(history: DataFrame) -> DataFrame:
    """Invariant auditor for an SCD2 history table -- the checks a
    warehouse runs nightly because a broken dimension silently corrupts
    every point-in-time join downstream (scd2_lookup's correctness
    RESTS on interval disjointness): per key, versions must not
    overlap, each version must close exactly where the next opens (no
    unexplained gaps -- a gap is legitimate only across a DELETE), at
    most one version may be open, and every interval must be non-empty
    (from < to).

    Gaps between consecutive versions are REPORTED but not counted
    against consistency: the history encodes a DELETE as
    close-without-open, so a later re-insert legitimately leaves a
    hole, and the version rows alone cannot distinguish that from a
    lost change (pair with cdc_gtid_gaps on the feed for that).

    One window over the history (already key-partitioned, version
    order), then one rollup -- the audit costs a history scan, nothing
    else.  Returns ONE row: (n_keys, n_versions, n_overlaps, n_gaps,
    n_multi_open, n_empty_intervals, consistent)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    nxt_from = F.lead("valid_from_ms").over(w)
    seq = history.select(
        "user_id",
        "version",
        "op",
        "valid_from_ms",
        "valid_to_ms",
        nxt_from.alias("__nxt_from"),
    )
    overlap = (
        F.col("__nxt_from").isNotNull()
        & F.col("valid_to_ms").isNotNull()
        & (F.col("__nxt_from") < F.col("valid_to_ms"))
    )
    gap = (
        F.col("__nxt_from").isNotNull()
        & F.col("valid_to_ms").isNotNull()
        & (F.col("__nxt_from") > F.col("valid_to_ms"))
    )
    open_v = F.col("valid_to_ms").isNull()
    empty = F.col("valid_to_ms").isNotNull() & (
        F.col("valid_to_ms") <= F.col("valid_from_ms")
    )
    per_key = seq.groupBy("user_id").agg(
        F.count("*").alias("__nv"),
        F.sum(overlap.cast("int")).alias("__no"),
        F.sum(gap.cast("int")).alias("__ng"),
        F.sum(open_v.cast("int")).alias("__nopen"),
        F.sum(empty.cast("int")).alias("__ne"),
    )
    agg = per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("__nv").alias("n_versions"),
        F.sum("__no").alias("n_overlaps"),
        F.sum("__ng").alias("n_gaps"),
        F.sum((F.col("__nopen") > 1).cast("int")).alias("n_multi_open"),
        F.sum("__ne").alias("n_empty_intervals"),
    )
    consistent = (
        (F.col("n_overlaps") == 0)
        & (F.col("n_multi_open") == 0)
        & (F.col("n_empty_intervals") == 0)
    )
    return agg.select(
        "n_keys",
        "n_versions",
        "n_overlaps",
        "n_gaps",
        "n_multi_open",
        "n_empty_intervals",
        consistent.alias("consistent"),
    )


def changelog_compaction(events: DataFrame) -> DataFrame:
    """Compact each key's change run into its NET effect -- the
    changelog a CDC relay ships downstream instead of the full event
    history (Kafka log-compaction / Debezium "tombstone + last image"
    semantics, computed set-wise).

    Net rule relative to the state BEFORE the feed, per key in (ts,
    event_id) order:

    - first=INSERT, last=DELETE  -> NOOP   (created then destroyed
      inside the feed: downstream never needs to hear about it)
    - last=DELETE                -> DELETE (existed before, gone now)
    - first=INSERT               -> INSERT (new key, ship last image)
    - otherwise                  -> UPDATE (existed before and after;
      one UPDATE with the last image replaces the whole run)

    Scale shape: ONE hash aggregate -- min_by/max_by on the (ts_ms,
    event_id) ordering struct, map-side combinable, no window over the
    event history and no shuffle beyond the single groupBy.  At 100 TB
    this is the same plan as apply_changes: the event feed streams
    through partial aggregates and only key-cardinality rows shuffle.

    Returns (user_id, net_op, first_op, last_op, last_ts_ms,
    last_event_id, last_value, n_events) -- n_events is the run length
    the single net row replaces.
    """
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
    agg = changes.groupBy("user_id").agg(
        F.min_by("c", F.col("__ord")).alias("first"),
        F.max_by("c", F.col("__ord")).alias("last"),
        F.count("*").alias("n_events"),
    )
    first_op, last_op = F.col("first.op"), F.col("last.op")
    net = (
        F.when((first_op == "INSERT") & (last_op == "DELETE"), "NOOP")
        .when(last_op == "DELETE", "DELETE")
        .when(first_op == "INSERT", "INSERT")
        .otherwise("UPDATE")
    )
    return agg.select(
        "user_id",
        net.alias("net_op"),
        first_op.alias("first_op"),
        last_op.alias("last_op"),
        F.col("last.ts_ms").alias("last_ts_ms"),
        F.col("last.event_id").alias("last_event_id"),
        F.round(F.col("last.value"), 4).alias("last_value"),
        "n_events",
    )
