"""Incremental snapshot maintenance via ``foreachBatch`` -- the
materialized-view form of operators/snapshot.apply_changes: instead of
re-aggregating the whole change history per refresh (or holding every
key in streaming state forever, the complete-mode cost of
cdc_snapshot_stream), each micro-batch folds its changes into a stored
snapshot table.  This is what a CDC consumer actually deploys: state
lives in the TABLE, the stream only carries deltas.

Mergeability is the design center: the stored state is the
pre-delete-filter aggregate (per user: the last change INCLUDING
tombstones, plus the applied-change count).  Two states merge with the
same shapes the batch operator uses -- ``max_by(last, (ts, id))`` picks
the newer last-change (the (ts, id) pair is a total order, so merging
is associative and batch-boundary-insensitive), counts add because the
exactly-once source never splits an event across batches.  DELETE
tombstones must survive in state (a later batch's merge needs to know
the key died); they are filtered only at read time, exactly where the
batch operator filters them.

Storage: plain parquet, versioned directories (``v{batch_id}``) with a
LATEST pointer written after the version commits -- the
write-new-then-swing-pointer discipline that keeps readers off
half-written versions (a table format with MERGE -- Delta/Iceberg --
replaces this whole layer in production; the operator logic above it
is unchanged).  At 100 TB the state table is key-cardinality, not
event-cardinality, and the per-batch merge shuffles state + delta on
user_id -- pre-partition both by the key and the merge is co-located.

End-of-replay contract: after draining a finite replay, reading the
snapshot equals batch ``apply_changes`` over all events -- that
equivalence IS the driver oracle (cdc_apply_changes's SQL verbatim).

SINGLE-WRITER EXCLUSION (operating assumption, not enforced code):
exactly one maintenance query owns a state_dir.  Within a query,
foreachBatch batches are serial, and Structured Streaming's checkpoint
lock keeps a second instance of the SAME query out; what nothing here
prevents is two DIFFERENT queries pointed at one state_dir -- their
interleaved merge/write/swing sequences could each read a stale prev
and drop the other's delta (lost update).  Deployments must pin
state_dir 1:1 to checkpoint_dir (same pairing, same lifecycle); a
catalog table format with MERGE + optimistic concurrency (Delta/
Iceberg) is the upgrade that makes multi-writer safe, replacing this
storage layer without touching the merge semantics above it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.snapshot import _OP


def _batch_state(events_batch: DataFrame) -> DataFrame:
    """One micro-batch of raw events -> mergeable state: per user the
    last change (tombstones INCLUDED) and the change count."""
    op = F.lit(None).cast("string")
    for src, dst in _OP.items():
        op = F.when(F.col("event_type") == src, dst).otherwise(op)
    ts_ms = F.unix_millis(F.col("ts"))
    changes = events_batch.filter(
        F.col("event_type").isin(*_OP) & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.struct(
            op.alias("op"),
            ts_ms.alias("ts_ms"),
            F.col("event_id").alias("event_id"),
            F.col("value").alias("value"),
        ).alias("last"),
    )
    return changes.groupBy("user_id").agg(
        F.max_by(
            "last", F.struct(F.col("last.ts_ms"), F.col("last.event_id"))
        ).alias("last"),
        F.count("*").alias("n_changes"),
    )


def merge_states(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Associative state merge: newer last-change wins per user via the
    same (ts_ms, event_id) total order; counts add."""
    return (
        stored.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.max_by(
                "last", F.struct(F.col("last.ts_ms"), F.col("last.event_id"))
            ).alias("last"),
            F.sum("n_changes").alias("n_changes"),
        )
    )


def _latest_version(state_dir: str) -> str | None:
    pointer = os.path.join(state_dir, "LATEST")
    if not os.path.exists(pointer):
        return None
    with open(pointer, encoding="utf-8") as f:
        return os.path.join(state_dir, f.read().strip())


def commit_batch(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Fold one micro-batch into the stored state: merge the delta,
    commit version ``v{batch_id}``, swing the LATEST pointer.

    Idempotent under foreachBatch's at-least-once replay.  Two replay
    positions exist and both are safe:
      (a) pointer already swung to v{batch_id} -> the batch fully
          committed; re-merging would double n_changes and overwrite
          the very parquet dir being read.  No-op.
      (b) v{batch_id} written but pointer not swung -> prev still
          names the previous version, so the re-merge reads clean
          inputs and the overwrite of v{batch_id} is idempotent."""
    prev = _latest_version(state_dir)
    vdir = os.path.join(state_dir, f"v{batch_id}")
    if prev is not None and os.path.basename(prev) == f"v{batch_id}":
        return
    delta = _batch_state(batch_df)
    merged = merge_states(spark.read.parquet(prev), delta) if prev else delta
    merged.write.mode("overwrite").parquet(vdir)
    # Atomic pointer swing: write-temp + os.replace so a concurrent
    # reader never observes a truncated/empty LATEST.
    pointer = os.path.join(state_dir, "LATEST")
    tmp = pointer + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"v{batch_id}")
    os.replace(tmp, pointer)


def maintain_snapshot(
    events_stream: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Start the foreachBatch maintenance query (caller awaits it).
    Each batch commits through ``commit_batch`` (idempotent)."""
    os.makedirs(state_dir, exist_ok=True)
    spark = events_stream.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch(spark, state_dir, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def list_versions(state_dir: str) -> list[str]:
    """Committed version names, oldest first (numeric batch order)."""
    return sorted(
        (d for d in os.listdir(state_dir) if d.startswith("v")),
        key=lambda d: int(d[1:]),
    )


def prune_versions(state_dir: str, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` versions (never the one LATEST
    points at).  Returns the removed version names.  The versioned
    layout is the poor-man's time travel; pruning bounds its storage
    to keep x state size."""
    import shutil

    latest = os.path.basename(_latest_version(state_dir) or "")
    versions = list_versions(state_dir)
    victims = [v for v in versions[:-keep] if v != latest] if keep else []
    for v in victims:
        shutil.rmtree(os.path.join(state_dir, v))
    return victims


def read_snapshot(
    spark: SparkSession, state_dir: str, version: str | None = None
) -> DataFrame:
    """The snapshot as of ``version`` (default: latest): tombstones
    dropped, projected to the batch apply_changes output contract.
    Passing an older committed version is time travel -- the state AS
    OF that batch."""
    target = (
        os.path.join(state_dir, version)
        if version is not None
        else _latest_version(state_dir)
    )
    if target is None or not os.path.isdir(target):
        raise FileNotFoundError(f"no snapshot version under {state_dir}")
    state = spark.read.parquet(target)
    return state.filter(F.col("last.op") != "DELETE").select(
        "user_id",
        F.col("last.op").alias("last_op"),
        F.col("last.ts_ms").alias("last_ts_ms"),
        F.col("last.event_id").alias("last_event_id"),
        F.round(F.col("last.value"), 4).alias("last_value"),
        "n_changes",
    )


# ---------------------------------------------------------------------------
# Streaming IVM: maintain a downstream GROUP BY view NEXT TO the snapshot,
# with retraction arithmetic per micro-batch (the streaming twin of
# operators/snapshot.ivm_refresh_typestats).

_DEC = "decimal(18,4)"


def _contributions(delta: DataFrame, old_state: DataFrame | None) -> DataFrame:
    """Signed view contributions for one micro-batch: for each key the
    delta touches, retract the key's OLD live contribution and add its
    NEW merged one.  The new per-key state is max((ts, id)) of stored
    vs delta -- NOT "delta wins" -- so arbitrary batch boundaries
    (out-of-order replay chunks) land on the same view as any other
    order; that associativity is what lets the view never be
    recomputed.  Returns (last_op, __dn, __dv) rows."""
    d = delta.select(
        "user_id",
        F.col("last").alias("__d_last"),
    )
    if old_state is not None:
        o = old_state.select(
            "user_id", F.col("last").alias("__o_last")
        )
        j = d.join(o, "user_id", "left")
    else:
        j = d.withColumn(
            "__o_last", F.lit(None).cast(d.schema["__d_last"].dataType)
        )
    take_delta = F.col("__o_last").isNull() | (
        F.struct(F.col("__d_last.ts_ms"), F.col("__d_last.event_id"))
        > F.struct(F.col("__o_last.ts_ms"), F.col("__o_last.event_id"))
    )
    j = j.withColumn(
        "__n_last", F.when(take_delta, F.col("__d_last")).otherwise(F.col("__o_last"))
    )
    val = lambda c: F.round(F.col(f"{c}.value"), 4).cast(_DEC)  # noqa: E731
    retract = j.filter(
        F.col("__o_last").isNotNull() & (F.col("__o_last.op") != "DELETE")
    ).select(
        F.col("__o_last.op").alias("last_op"),
        F.lit(-1).alias("__dn"),
        (-val("__o_last")).alias("__dv"),
    )
    add = j.filter(F.col("__n_last.op") != "DELETE").select(
        F.col("__n_last.op").alias("last_op"),
        F.lit(1).alias("__dn"),
        val("__n_last").alias("__dv"),
    )
    return retract.unionAll(add)


def commit_ivm_batch(
    spark: SparkSession, work_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Fold one micro-batch into versioned (state, view) twins: the
    snapshot state merges as in commit_batch; the VIEW folds only the
    signed contributions of the batch's affected keys -- it is never
    rebuilt from the state, which is the IVM contract.  Same
    write-new-then-swing-pointer idempotency as commit_batch."""
    prev = _latest_version(work_dir)
    if prev is not None and os.path.basename(prev) == f"v{batch_id}":
        return
    delta = _batch_state(batch_df)
    old_state = spark.read.parquet(os.path.join(prev, "state")) if prev else None
    contrib = (
        _contributions(delta, old_state)
        .groupBy("last_op")
        .agg(F.sum("__dn").alias("__n1"), F.sum("__dv").alias("__s1"))
    )
    if prev:
        old_view = spark.read.parquet(os.path.join(prev, "view"))
        merged_view = old_view.join(contrib, "last_op", "full_outer").select(
            "last_op",
            (
                F.coalesce(F.col("n_users"), F.lit(0))
                + F.coalesce(F.col("__n1"), F.lit(0))
            ).alias("n_users"),
            (
                F.coalesce(F.col("__sum"), F.lit(0).cast(_DEC))
                + F.coalesce(F.col("__s1"), F.lit(0).cast(_DEC))
            ).alias("__sum"),
        )
        new_state = merge_states(old_state, delta)
    else:
        merged_view = contrib.select(
            "last_op",
            F.col("__n1").alias("n_users"),
            F.col("__s1").alias("__sum"),
        )
        new_state = delta
    vdir = os.path.join(work_dir, f"v{batch_id}")
    new_state.write.mode("overwrite").parquet(os.path.join(vdir, "state"))
    merged_view.write.mode("overwrite").parquet(os.path.join(vdir, "view"))
    pointer = os.path.join(work_dir, "LATEST")
    tmp = pointer + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"v{batch_id}")
    os.replace(tmp, pointer)


def maintain_ivm(events_stream: DataFrame, work_dir: str, checkpoint_dir: str):
    """Start the foreachBatch IVM maintenance query (caller awaits)."""
    os.makedirs(work_dir, exist_ok=True)
    spark = events_stream.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        commit_ivm_batch(spark, work_dir, batch_df, batch_id)

    return (
        events_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ivm_view(spark: SparkSession, work_dir: str) -> DataFrame:
    """The maintained view at LATEST: live groups only, sum published
    as a rounded double (the batch operator's read shape)."""
    latest = _latest_version(work_dir)
    view = spark.read.parquet(os.path.join(latest, "view"))
    return view.filter(F.col("n_users") > 0).select(
        "last_op",
        "n_users",
        F.round(F.col("__sum").cast("double"), 4).alias("sum_last_value"),
    )
