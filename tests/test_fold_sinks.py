"""Incremental fold sinks (streaming/fold_sinks.py): multi-micro-batch
replay equals the batch operator, with state that never holds the
event history (r8 verdict item 2's done-criteria)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F, types as T

from binlog_avro_comparator_spark.operators.analytics import funnel_stages
from binlog_avro_comparator_spark.operators import compare as C
from binlog_avro_comparator_spark.fixtures import derive_binlog_events
from binlog_avro_comparator_spark.streaming.fold_sinks import (
    maintain_funnel,
    maintain_transactions,
    read_funnel,
    read_transactions,
)

EVENTS_T = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# three event-time-ordered chunks; funnel chains deliberately span
# batch boundaries (u1: view/click/purchase in three different
# chunks), complete within one chunk (u2), stall (u3: view only),
# and a same-millisecond tie resolved by event_id (u4)
_CHUNKS = [
    [
        (1, "2025-06-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2025-06-01 10:00:01", 2, "view", 1.0, "{}"),
        (3, "2025-06-01 10:00:01", 2, "click", 1.0, "{}"),
        (4, "2025-06-01 10:00:02", 3, "signup", 1.0, "{}"),
        (5, "2025-06-01 10:00:03", 4, "click", 1.0, "{}"),  # pre-view click
    ],
    [
        (6, "2025-06-01 10:01:00", 1, "click", 1.0, "{}"),
        (7, "2025-06-01 10:01:01", 2, "purchase", 1.0, "{}"),
        (8, "2025-06-01 10:01:02", 3, "view", 1.0, "{}"),
        # u4: view and a same-ms click with LARGER event_id -> counts
        (9, "2025-06-01 10:01:03", 4, "view", 1.0, "{}"),
        (10, "2025-06-01 10:01:03", 4, "click", 1.0, "{}"),
    ],
    [
        (11, "2025-06-01 10:02:00", 1, "purchase", 1.0, "{}"),
        (12, "2025-06-01 10:02:01", 5, "purchase", 1.0, "{}"),  # no view
    ],
]


def _write_chunks(spark, tmp_path) -> str:
    d = str(tmp_path / "chunks")
    os.makedirs(d)
    import shutil

    for i, rows in enumerate(_CHUNKS):
        df = spark.createDataFrame(
            [
                (eid, __import__("datetime").datetime.fromisoformat(ts), u, et, v, p)
                for (eid, ts, u, et, v, p) in rows
            ],
            EVENTS_T,
        )
        part_dir = os.path.join(d, f"__part_{i}")
        df.coalesce(1).write.parquet(part_dir)
        [part] = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(d, f"chunk_{i:02d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


def _all_events(spark):
    return spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime.fromisoformat(ts), u, et, v, p)
            for rows in _CHUNKS
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )


def _stream(spark, d):
    return (
        spark.readStream.schema(EVENTS_T)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def _drain(q):
    assert q.awaitTermination(120)
    q.stop()


def _versions(state_dir):
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(state_dir, "v*"))
        if os.path.isdir(p)
    )


@pytest.mark.slow
def test_funnel_fold_equals_batch_across_three_triggers(spark, tmp_path):
    d = _write_chunks(spark, tmp_path)
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _drain(maintain_funnel(_stream(spark, d), state_dir, ckpt))
    # >= 3 micro-batches actually committed
    assert len(_versions(state_dir)) == 3
    got = {r.user_id: r for r in read_funnel(spark, state_dir).collect()}
    exp = {r.user_id: r for r in funnel_stages(_all_events(spark)).collect()}
    assert set(got) == set(exp)
    for u in exp:
        assert got[u] == exp[u], f"user {u}: {got[u]} != {exp[u]}"
    # the cross-batch chain reached stage 3, the tie user stage 2
    assert got[1].stage_reached == 3
    assert got[4].stage_reached == 2
    # state never holds the event history: no array columns, one row
    # per viewed user, in EVERY committed version
    for v in _versions(state_dir):
        st = spark.read.parquet(os.path.join(state_dir, v))
        assert not any(
            isinstance(f.dataType, T.ArrayType) for f in st.schema.fields
        )
        assert st.count() <= 4  # users with a view, never event count


@pytest.mark.slow
def test_funnel_fold_prefix_equivalence(spark, tmp_path):
    """Every intermediate version equals the batch operator over the
    chunks folded so far -- the fold is exact at every trigger, not
    just at the end."""
    d = _write_chunks(spark, tmp_path)
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _drain(maintain_funnel(_stream(spark, d), state_dir, ckpt))
    versions = _versions(state_dir)
    for k, v in enumerate(versions):
        prefix = spark.createDataFrame(
            [
                (eid, __import__("datetime").datetime.fromisoformat(ts), u, et, vl, p)
                for rows in _CHUNKS[: k + 1]
                for (eid, ts, u, et, vl, p) in rows
            ],
            EVENTS_T,
        )
        exp = sorted(
            tuple(r) for r in funnel_stages(prefix).collect()
        )
        st = spark.read.parquet(os.path.join(state_dir, v))
        got = sorted(
            tuple(r)
            for r in st.select(
                "user_id",
                F.col("e1.ts_ms"),
                F.col("e2.ts_ms"),
                F.col("e3.ts_ms"),
                (
                    F.lit(1)
                    + F.col("e2").isNotNull().cast("int")
                    + F.col("e3").isNotNull().cast("int")
                ),
            ).collect()
        )
        assert got == exp, f"version {v} diverges from batch prefix"


def test_transactions_fold_equals_batch(spark, tmp_path):
    d = _write_chunks(spark, tmp_path)
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _drain(maintain_transactions(_stream(spark, d), state_dir, ckpt))
    assert len(_versions(state_dir)) == 3
    got = sorted(
        tuple(r) for r in read_transactions(spark, state_dir).collect()
    )
    exp = sorted(
        tuple(r)
        for r in C.transaction_summary(
            derive_binlog_events(_all_events(spark))
        ).collect()
    )
    assert got == exp


@pytest.mark.slow
def test_transactions_fold_idempotent_replay(spark, tmp_path):
    """foreachBatch replay of an already-committed batch is a no-op
    (the at-least-once contract): re-committing the last batch with
    its own batch_id leaves the state identical -- without the guard
    it would double every count in that batch."""
    import binlog_avro_comparator_spark.streaming.fold_sinks as fs

    d = _write_chunks(spark, tmp_path)
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _drain(maintain_transactions(_stream(spark, d), state_dir, ckpt))
    before = sorted(
        tuple(r) for r in read_transactions(spark, state_dir).collect()
    )
    assert os.path.basename(fs._latest_version(state_dir)) == "v2"
    last_chunk = spark.read.schema(EVENTS_T).parquet(
        os.path.join(d, "chunk_02.parquet")
    )
    fs.commit_txn_batch(spark, state_dir, last_chunk, 2)
    after = sorted(
        tuple(r) for r in read_transactions(spark, state_dir).collect()
    )
    assert after == before


def test_funnel_fold_late_view_dropped_like_watermark(spark, tmp_path):
    """Documented contract, pinned: a view arriving LATE (event-time
    before an already-set cursor) does not rewrite history -- the fold
    keeps the first view it saw, exactly the call a watermarked
    production stream makes by dropping late data.  The batch operator
    over the full (un-watermarked) history would prefer the earlier
    view; the divergence is the advertised drop, not a bug."""
    import datetime as dt
    import shutil

    chunks = [
        [(1, "2025-06-01 10:01:00", 1, "view", 1.0, "{}"),
         (2, "2025-06-01 10:02:00", 1, "click", 1.0, "{}")],
        # late view: event-time BEFORE the cursor set by chunk 1
        [(3, "2025-06-01 10:00:00", 1, "view", 1.0, "{}")],
    ]
    d = str(tmp_path / "chunks")
    os.makedirs(d)
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(
            [(e, dt.datetime.fromisoformat(t), u, et, v, p)
             for (e, t, u, et, v, p) in rows],
            EVENTS_T,
        )
        part_dir = os.path.join(d, f"__part_{i}")
        df.coalesce(1).write.parquet(part_dir)
        [part] = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(d, f"chunk_{i:02d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    state_dir, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    _drain(maintain_funnel(_stream(spark, d), state_dir, ckpt))
    [got] = read_funnel(spark, state_dir).collect()
    # fold keeps the 10:01 view (cursor immutable); the click counts
    assert got.view_ts_ms == 1748772060000
    assert got.stage_reached == 2
    # the un-watermarked batch operator WOULD pick the late 10:00 view
    # (and then the click still qualifies) -- the divergence is the
    # documented watermark drop
    all_ev = spark.createDataFrame(
        [(e, dt.datetime.fromisoformat(t), u, et, v, p)
         for rows in chunks for (e, t, u, et, v, p) in rows],
        EVENTS_T,
    )
    [batch] = funnel_stages(all_ev).collect()
    assert batch.view_ts_ms == 1748772000000


_LIFE_CHUNKS = [
    # day-ordered chunks: u1 new on d1; u1 returning d3 (gap 2);
    # u2 new d3; u1 resurrected d20 (gap 17); u2 same-day repeat in a
    # LATER batch (must not recount)
    [
        (1, "2025-06-01 08:00:00", 1, "click", 1.0, "{}"),
        (2, "2025-06-01 09:00:00", 1, "view", 1.0, "{}"),
    ],
    [
        (3, "2025-06-03 08:00:00", 1, "click", 1.0, "{}"),
        (4, "2025-06-03 09:00:00", 2, "view", 1.0, "{}"),
    ],
    [
        (5, "2025-06-03 10:00:00", 2, "click", 1.0, "{}"),  # same-day repeat
        (6, "2025-06-20 08:00:00", 1, "click", 1.0, "{}"),
    ],
]


def _write_life_chunks(spark, tmp_path) -> str:
    global _CHUNKS
    saved = list(_CHUNKS)
    _CHUNKS[:] = _LIFE_CHUNKS
    try:
        return _write_chunks(spark, tmp_path)
    finally:
        _CHUNKS[:] = saved


@pytest.mark.slow
def test_lifecycle_fold_equals_batch_and_bounded_state(spark, tmp_path):
    """Reading LATEST equals batch user_lifecycle after 3 event-time-
    ordered triggers; per-user state is one row (never the (user, day)
    history); a same-day repeat in a later batch does not recount."""
    from binlog_avro_comparator_spark.operators.analytics import (
        user_lifecycle,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        maintain_lifecycle,
        read_lifecycle,
        _latest_version,
    )

    d = _write_life_chunks(spark, tmp_path)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _drain(maintain_lifecycle(_stream(spark, d), state, ckpt))

    got = {r.day: r for r in read_lifecycle(spark, state).collect()}
    import datetime

    all_rows = spark.createDataFrame(
        [
            (eid, datetime.datetime.fromisoformat(ts), u, et, v, p)
            for rows in _LIFE_CHUNKS
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )
    want = {r.day: r for r in user_lifecycle(all_rows).collect()}
    assert set(got) == set(want)
    for day in want:
        for c in ("n_active", "n_new", "n_returning", "n_resurrected"):
            assert getattr(got[day], c) == getattr(want[day], c), (day, c)
    # sanity of the interesting rows
    assert got["2025-06-03"].n_returning == 1 and got["2025-06-03"].n_new == 1
    assert got["2025-06-20"].n_resurrected == 1
    # bounded state: one row per user at LATEST
    users = spark.read.parquet(
        os.path.join(_latest_version(state), "users")
    )
    assert users.count() == 2


def test_vacuum_keeps_latest_and_n_newest(spark, tmp_path):
    """After a 3-trigger fold, vacuum(keep=1) removes the old versions
    but never the LATEST target; the maintained result still reads."""
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        maintain_transactions,
        read_transactions,
        vacuum_state_versions,
    )

    d = _write_chunks(spark, tmp_path)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _drain(maintain_transactions(_stream(spark, d), state, ckpt))
    before = _versions(state)
    assert len(before) == 3
    removed = vacuum_state_versions(state, keep=1)
    assert removed == before[:-1]
    after = _versions(state)
    assert after == before[-1:]
    # still readable at LATEST
    assert read_transactions(spark, state).count() > 0


# three event-time-ordered chunks of Query events (any unmapped
# event_type renders as a Query event); event_ids chosen so
# m = eid % 13 plants: a CREATE, ADD-COLUMN ALTERs, a RENAME TABLE,
# and -- the retroactivity case -- an ALTER against the RENAMED name
# arriving one batch BEFORE the rename edge itself
_DDL_CHUNKS = [
    [
        (1, "2025-06-01 10:00:00", 1, "other", 1.0, "{}"),   # m=1 CREATE
        (10, "2025-06-01 10:00:05", 1, "other", 1.0, "{}"),  # m=10 on t?_r
    ],
    [
        (9, "2025-06-01 10:01:00", 1, "other", 1.0, "{}"),   # m=9 RENAME
        (13, "2025-06-01 10:01:05", 1, "other", 1.0, "{}"),  # m=0 ALTER
    ],
    [
        (26, "2025-06-01 10:02:00", 1, "other", 1.0, "{}"),  # m=0 ALTER
        (14, "2025-06-01 10:02:05", 1, "other", 1.0, "{}"),  # m=1 CREATE
    ],
]


def _write_ddl_chunks(spark, tmp_path) -> str:
    d = str(tmp_path / "ddl_chunks")
    os.makedirs(d)
    import shutil

    for i, rows in enumerate(_DDL_CHUNKS):
        df = spark.createDataFrame(
            [
                (eid, __import__("datetime").datetime.fromisoformat(ts), u, et, v, p)
                for (eid, ts, u, et, v, p) in rows
            ],
            EVENTS_T,
        )
        part_dir = os.path.join(d, f"__part_{i}")
        df.coalesce(1).write.parquet(part_dir)
        [part] = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(d, f"chunk_{i:02d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


@pytest.mark.slow
def test_schema_timeline_fold_equals_batch_across_three_triggers(
    spark, tmp_path
):
    """The streaming DDL timeline (r9 verdict item 4): read-LATEST ==
    batch schema_timeline across 3 triggers, with the table's DDL
    history split across batches AND a statement against the renamed
    name arriving a batch BEFORE its rename edge -- the retroactive
    threading only a statement-log state can give."""
    from binlog_avro_comparator_spark.operators.ddl import schema_timeline
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        _ddl_batch_statements,
        maintain_schema_timeline,
        read_schema_timeline,
    )

    d = _write_ddl_chunks(spark, tmp_path)
    state, ckpt = str(tmp_path / "ddl_state"), str(tmp_path / "ddl_ckpt")
    _drain(maintain_schema_timeline(_stream(spark, d), state, ckpt))
    assert len(_versions(state)) == 3
    all_events = spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime.fromisoformat(ts), u, et, v, p)
            for rows in _DDL_CHUNKS
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )
    cols = [
        "schema_name", "table_name", "version", "ddl_kind", "statement",
        "valid_from", "valid_to", "is_current", "current_name",
        "binlog_file", "log_position",
    ]
    got = sorted(
        tuple(r) for r in read_schema_timeline(spark, state)
        .select(*cols).collect()
    )
    exp = sorted(
        tuple(r) for r in schema_timeline(_ddl_batch_statements(all_events))
        .select(*cols).collect()
    )
    assert got == exp and len(got) == 6
    # ONE canonical history: the m=10 statement (written name t?_r,
    # arrived before its rename edge) threads into the base table
    tl = {r.version: r for r in read_schema_timeline(spark, state).collect()}
    assert len({(r.schema_name, r.table_name) for r in tl.values()}) == 1
    kinds = [tl[v].ddl_kind for v in sorted(tl)]
    assert kinds.count("RENAME") == 1 and kinds[0] == "CREATE"
    # current_name flips at the rename and stays flipped until a later
    # version; every row before the rename keeps the canonical name
    ren_v = next(v for v in sorted(tl) if tl[v].ddl_kind == "RENAME")
    assert all(tl[v].current_name == tl[1].table_name for v in tl if v < ren_v)
    assert tl[ren_v].current_name.endswith("_r")


# --------------------------------------------------------------------------
# guarded payload diff on the live feed (r10 verdict item 3)

# event-time-ordered chunks mixing DML rows (the avro payload slices)
# and ONE Query event (the DDL): the ALTER lands in batch 2 at binlog
# coordinate 1304, BETWEEN keys diffed in batch 1 (1104 pre-window,
# 1504 in-window) -- the retroactivity case: the finding for 1504 was
# already emitted when the window opened.  eids avoid every avro-side
# plant (%13, %29, %17, %31, %37, %47); eid 52 -> m = 52 % 13 = 0, the
# online-DDL ADD COLUMN c0 (moved set KNOWN, so the stable payload
# columns keep reporting inside the window).
_GUARD_CHUNKS = [
    [
        (44, "2025-06-01 10:00:00", 1, "click", 1.0, "{}"),  # key 1104
        (60, "2025-06-01 10:00:01", 1, "click", 1.0, "{}"),  # key 1504
    ],
    [
        (52, "2025-06-01 10:01:00", 1, "other", 1.0, "{}"),  # ALTER @1304
    ],
    [
        (48, "2025-06-01 10:02:00", 1, "click", 1.0, "{}"),  # key 1204
    ],
]


@pytest.mark.slow
def test_guarded_diff_fold_alter_lands_mid_replay(spark, tmp_path):
    """The streaming column guard (fold_sinks.maintain_guarded_payload
    _diff): an ALTER arriving in batch 2 must RETROACTIVELY govern a
    finding emitted in batch 1 -- read-LATEST equals the batch
    payload_diff_column_guard over the full replay, per-column
    suppression included."""
    import shutil

    from binlog_avro_comparator_spark.fixtures import (
        derive_avro_payload_map,
    )
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_drift_window_columns,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        _ddl_batch_statements,
        maintain_guarded_payload_diff,
        read_guarded_payload_diff,
    )

    d = str(tmp_path / "guard_chunks")
    os.makedirs(d)
    for i, rows in enumerate(_GUARD_CHUNKS):
        df = spark.createDataFrame(
            [
                (eid, __import__("datetime").datetime.fromisoformat(ts),
                 u, et, v, p)
                for (eid, ts, u, et, v, p) in rows
            ],
            EVENTS_T,
        )
        part_dir = os.path.join(d, f"__part_{i}")
        df.coalesce(1).write.parquet(part_dir)
        [part] = glob.glob(os.path.join(part_dir, "part-*.parquet"))
        dst = os.path.join(d, f"chunk_{i:02d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    all_events = spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime.fromisoformat(ts),
             u, et, v, p)
            for rows in _GUARD_CHUNKS
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )
    # static binlog side: the avro derivation's values with
    # product_name diverging on EVERY key -- key 1504's divergence is
    # on a STABLE column, so the guard must keep it even in-window
    ap_full = derive_avro_payload_map(all_events)
    bp_rows = [
        (r.binlog_file, r.binlog_position,
         {**r.payload, "product_name": "prod-LOCAL"})
        for r in ap_full.collect()
    ]
    assert sorted(p for _, p, _ in bp_rows) == [1104, 1204, 1504]
    bp = spark.createDataFrame(
        bp_rows,
        "binlog_file string, binlog_position bigint, "
        "payload map<string,string>",
    )
    kt = spark.createDataFrame(
        [(f, p, "db1", "t1") for (f, p, _) in bp_rows],
        "binlog_file string, binlog_position bigint, "
        "schema_name string, table_name string",
    )
    state = str(tmp_path / "guard_state")
    ckpt = str(tmp_path / "guard_ckpt")
    _drain(maintain_guarded_payload_diff(_stream(spark, d), state, ckpt, bp, kt))
    got = read_guarded_payload_diff(spark, state)
    by_key = {}
    for r in got.collect():
        by_key.setdefault(r.binlog_position, []).append(
            (r.column, r.status)
        )
    # pre-window keys keep their findings verbatim
    assert by_key[1104] == [("product_name", "MISMATCH")]
    assert by_key[1204] == [("product_name", "MISMATCH")]
    # the in-window key (diffed one batch BEFORE the ALTER arrived):
    # stable column keeps reporting, the moved column c0 gets its
    # boundary row -- retroactive, column-granular
    assert sorted(by_key[1504]) == [
        ("c0", "DDL_BOUNDARY"), ("product_name", "MISMATCH"),
    ]
    # and the whole frame equals the batch operator over the full feed
    wc = ddl_drift_window_columns(_ddl_batch_statements(all_events))
    exp = sorted(
        tuple(r)
        for r in C.payload_diff_column_guard(bp, ap_full, kt, wc).collect()
    )
    assert sorted(tuple(r) for r in got.collect()) == exp


def _append_chunk(spark, d, i, rows):
    import shutil

    df = spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime.fromisoformat(ts),
             u, et, v, p)
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )
    part_dir = os.path.join(d, f"__part_{i}")
    df.coalesce(1).write.parquet(part_dir)
    [part] = glob.glob(os.path.join(part_dir, "part-*.parquet"))
    dst = os.path.join(d, f"chunk_{i:02d}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(part_dir)
    os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))


@pytest.mark.slow
def test_schema_agreement_live_flips_at_next_read(spark, tmp_path):
    """The live cross-source agreement view (fold_sinks.read_schema_
    agreement): a DDL landing mid-feed flips a column's status at the
    VERY NEXT read -- two drains against one state/checkpoint, the
    second delivering the membership-resetting CREATE -- and the final
    read equals batch schema_agreement over the full feed."""
    from binlog_avro_comparator_spark.operators.ddl import (
        current_columns,
        schema_agreement,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        _ddl_batch_statements,
        maintain_schema_timeline,
        read_schema_agreement,
    )

    d = str(tmp_path / "agree_chunks")
    os.makedirs(d)
    for i, rows in enumerate(_DDL_CHUNKS[:2]):
        _append_chunk(spark, d, i, rows)
    observed = spark.createDataFrame(
        [("db1", "t1", "order_id", 7), ("db1", "t1", "ghost_field", 3)],
        "schema_name string, table_name string, field_name string,"
        " n_obs long",
    )
    state = str(tmp_path / "agree_state")
    ckpt = str(tmp_path / "agree_ckpt")
    _drain(maintain_schema_timeline(_stream(spark, d), state, ckpt))
    first = {
        (r.column_name): (r.status, r.n_obs)
        for r in read_schema_agreement(spark, state, observed).collect()
    }
    # mid-feed state: the CREATE set + the eid-13 ADD c1 + the eid-10
    # ADD p2 (threaded through the rename) are all declared-current
    assert first["order_id"] == ("AGREE", 7)
    assert first["ghost_field"] == ("LAKE_ONLY", 3)
    assert first["c1"] == ("BINLOG_ONLY", 0)
    assert first["p2"] == ("BINLOG_ONLY", 0)
    # the final chunk lands: its CREATE (column list declared) RESETS
    # membership -- the next read must drop c1/p2 from the declared set
    _append_chunk(spark, d, 2, _DDL_CHUNKS[2])
    _drain(maintain_schema_timeline(_stream(spark, d), state, ckpt))
    second = {
        (r.column_name): (r.status, r.n_obs)
        for r in read_schema_agreement(spark, state, observed).collect()
    }
    assert "c1" not in second and "p2" not in second
    assert second["order_id"] == ("AGREE", 7)
    assert second["quantity"] == ("BINLOG_ONLY", 0)
    assert second["ghost_field"] == ("LAKE_ONLY", 3)
    # read-LATEST == batch over the full feed (the shared contract)
    all_events = spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime.fromisoformat(ts),
             u, et, v, p)
            for rows in _DDL_CHUNKS
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )
    exp = sorted(
        tuple(r)
        for r in schema_agreement(
            current_columns(_ddl_batch_statements(all_events)), observed
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in read_schema_agreement(spark, state, observed).collect()
    )
    assert got == exp


@pytest.mark.slow
def test_schema_agreement_live_both_sides_folded(spark, tmp_path):
    """read_schema_agreement_live: declared side from the guarded-diff
    query's statement-log fold, observed side from the summed per-batch
    census log -- NO batch-side frame at read.  Equals the batch
    schema_agreement over the full feed."""
    import shutil

    from binlog_avro_comparator_spark.fixtures import (
        derive_avro_payload_map,
    )
    from binlog_avro_comparator_spark.operators.ddl import (
        current_columns,
        schema_agreement,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        _ddl_batch_statements,
        maintain_guarded_payload_diff,
        read_schema_agreement_live,
    )

    d = str(tmp_path / "live_chunks")
    os.makedirs(d)
    for i, rows in enumerate(_GUARD_CHUNKS):
        _append_chunk(spark, d, i, rows)
    all_events = spark.createDataFrame(
        [
            (eid, __import__("datetime").datetime.fromisoformat(ts),
             u, et, v, p)
            for rows in _GUARD_CHUNKS
            for (eid, ts, u, et, v, p) in rows
        ],
        EVENTS_T,
    )
    ap_full = derive_avro_payload_map(all_events)
    bp_rows = [
        (r.binlog_file, r.binlog_position, r.payload)
        for r in ap_full.collect()
    ]
    bp = spark.createDataFrame(
        bp_rows,
        "binlog_file string, binlog_position bigint, "
        "payload map<string,string>",
    )
    kt = spark.createDataFrame(
        [(f, p, "db1", "t1") for (f, p, _) in bp_rows],
        "binlog_file string, binlog_position bigint, "
        "schema_name string, table_name string",
    )
    state = str(tmp_path / "live_state")
    ckpt = str(tmp_path / "live_ckpt")
    _drain(maintain_guarded_payload_diff(_stream(spark, d), state, ckpt, bp, kt))
    got = {
        (r.column_name): (r.status, r.n_obs)
        for r in read_schema_agreement_live(spark, state).collect()
    }
    # the feed's only DDL is the eid-52 ADD COLUMN c0: declared-only;
    # every shipped payload field is LAKE_ONLY with the full key count
    assert got["c0"] == ("BINLOG_ONLY", 0)
    assert got["product_name"] == ("LAKE_ONLY", 3)
    # equals batch over the full feed, observed census included
    observed = (
        ap_full.join(kt, ["binlog_file", "binlog_position"])
        .select(
            "schema_name",
            "table_name",
            F.explode(F.map_keys("payload")).alias("field_name"),
        )
        .groupBy("schema_name", "table_name", "field_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    exp = sorted(
        tuple(r)
        for r in schema_agreement(
            current_columns(_ddl_batch_statements(all_events)), observed
        ).collect()
    )
    assert sorted(
        tuple(r) for r in read_schema_agreement_live(spark, state).collect()
    ) == exp


_DOCS_T = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# near-dup plants across batch boundaries: docs 1/2 (batch 0) are
# word-identical, doc 5 (batch 2) repeats doc 1's text verbatim -- the
# late arrival that must probe the MAINTAINED index, not its own batch
_LSH_DOC_CHUNKS = [
    [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
        (3, "completely different words about spark shuffle partitions here", "en", "web", 62),
    ],
    [
        (4, "yet another unrelated document concerning parquet row groups", "en", "web", 60),
    ],
    [
        (5, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
    ],
]


def _write_doc_chunk(spark, d, i, rows):
    import shutil

    df = spark.createDataFrame(rows, _DOCS_T)
    part_dir = os.path.join(d, f"__part_{i}")
    df.coalesce(1).write.parquet(part_dir)
    [part] = glob.glob(os.path.join(part_dir, "part-*.parquet"))
    dst = os.path.join(d, f"chunk_{i:02d}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(part_dir)
    os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))


@pytest.mark.slow
def test_lsh_fold_pair_logs_disjoint_and_equal_batch(spark, tmp_path):
    """The maintained LSH index (fold_sinks.maintain_lsh_index): a doc
    arriving batches after its near-dup must pair through the
    ACCUMULATED index; per-batch pair logs are disjoint; the union
    equals batch lsh_candidate_pairs over the full corpus."""
    from binlog_avro_comparator_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        maintain_lsh_index,
        read_lsh_pairs,
    )

    d = str(tmp_path / "lsh_chunks")
    os.makedirs(d)
    for i, rows in enumerate(_LSH_DOC_CHUNKS):
        _write_doc_chunk(spark, d, i, rows)
    state = str(tmp_path / "lsh_state")
    ckpt = str(tmp_path / "lsh_ckpt")
    stream = (
        spark.readStream.schema(_DOCS_T)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    _drain(maintain_lsh_index(stream, state, ckpt, bands=4, rows=4))
    got = sorted(
        (r.doc_a, r.doc_b) for r in read_lsh_pairs(spark, state).collect()
    )
    # the cross-batch late duplicate (5 vs 1 and 5 vs 2) found through
    # the index; the within-batch pair (1, 2) found at arrival
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got
    # per-batch logs are disjoint: a plain union has no duplicates
    assert len(got) == len(set(got))
    # batch 2's log holds exactly the late doc's pairs -- emitted in
    # the LATER document's batch and nowhere else
    b2 = sorted(
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(
            os.path.join(state, "pairs", "b2")
        ).collect()
    )
    assert b2 == [(1, 5), (2, 5)]
    # union == batch operator over the full corpus
    all_docs = spark.createDataFrame(
        [r for rows in _LSH_DOC_CHUNKS for r in rows], _DOCS_T
    )
    exp = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(all_docs, bands=4, rows=4).collect()
    )
    assert got == exp


@pytest.mark.slow
def test_schema_timeline_asof_prefix_correct(spark, tmp_path):
    """Time travel (read_schema_timeline_asof): the timeline as of
    batch k equals the batch operator over the first k+1 chunks -- and
    the as-of view must NOT know about later batches' retroactive
    edges (the m=9 RENAME lands in chunk 1: as-of batch 0 the m=10
    statement keys under its WRITTEN _r name; at LATEST it threads
    into the base history)."""
    from binlog_avro_comparator_spark.operators.ddl import schema_timeline
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        _ddl_batch_statements,
        maintain_schema_timeline,
        read_schema_timeline,
        read_schema_timeline_asof,
    )

    d = _write_ddl_chunks(spark, tmp_path)
    state, ckpt = str(tmp_path / "asof_state"), str(tmp_path / "asof_ckpt")
    _drain(maintain_schema_timeline(_stream(spark, d), state, ckpt))
    cols = [
        "schema_name", "table_name", "version", "ddl_kind", "statement",
        "valid_from", "valid_to", "is_current", "current_name",
    ]
    for k in range(3):
        prefix_events = spark.createDataFrame(
            [
                (eid, __import__("datetime").datetime.fromisoformat(ts),
                 u, et, v, p)
                for rows in _DDL_CHUNKS[: k + 1]
                for (eid, ts, u, et, v, p) in rows
            ],
            EVENTS_T,
        )
        got = sorted(
            tuple(r)
            for r in read_schema_timeline_asof(spark, state, k)
            .select(*cols).collect()
        )
        exp = sorted(
            tuple(r)
            for r in schema_timeline(_ddl_batch_statements(prefix_events))
            .select(*cols).collect()
        )
        assert got == exp, f"as-of batch {k} diverged from batch prefix"
    # as-of batch 0: the rename edge has NOT arrived, so the m=10
    # statement (written against t1_r) keys under the _r name --
    # two distinct table histories
    asof0 = read_schema_timeline_asof(spark, state, 0).collect()
    assert {r.table_name for r in asof0} == {"t1", "t1_r"}
    # at LATEST the same statement threads into the one canonical
    # history (retroactive rename threading)
    latest = read_schema_timeline(spark, state).collect()
    assert {r.table_name for r in latest} == {"t1"}
    # an uncommitted version is an explicit error, never a quiet empty
    with pytest.raises(FileNotFoundError):
        read_schema_timeline_asof(spark, state, 99)


@pytest.mark.slow
def test_log_compaction_preserves_reads_and_future_probes(spark, tmp_path):
    """compact_log_batches: folding the per-trigger b* dirs into one
    c* segment changes NOTHING a reader sees, and a batch arriving
    AFTER compaction still probes the compacted index (the late
    near-dup pairs through the c-segment's band rows)."""
    import shutil

    from binlog_avro_comparator_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        compact_log_batches,
        maintain_lsh_index,
        read_lsh_pairs,
    )

    d = str(tmp_path / "cmp_chunks")
    os.makedirs(d)
    for i, rows in enumerate(_LSH_DOC_CHUNKS[:2]):
        _write_doc_chunk(spark, d, i, rows)
    state = str(tmp_path / "cmp_state")
    ckpt = str(tmp_path / "cmp_ckpt")

    def stream():
        return (
            spark.readStream.schema(_DOCS_T)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    _drain(maintain_lsh_index(stream(), state, ckpt, bands=4, rows=4))
    before = sorted(
        (r.doc_a, r.doc_b) for r in read_lsh_pairs(spark, state).collect()
    )
    # keep a copy of a pair-log b-dir to simulate the crash window
    # (segment published, consumed dirs not yet removed)
    stash = str(tmp_path / "stash_b0")
    shutil.copytree(os.path.join(state, "pairs", "b0"), stash)
    removed_b = compact_log_batches(spark, state, "bands")
    removed_p = compact_log_batches(spark, state, "pairs")
    assert removed_b == ["b0", "b1"] and removed_p == ["b0", "b1"]
    assert not glob.glob(os.path.join(state, "bands", "b*"))
    assert os.path.exists(os.path.join(state, "bands", "c0", "_SUCCESS"))
    # reads identical through the compacted segment
    assert before == sorted(
        (r.doc_a, r.doc_b) for r in read_lsh_pairs(spark, state).collect()
    )
    # a single remaining segment is left alone (nothing to fold)
    assert compact_log_batches(spark, state, "pairs") == []
    # crash simulation: a consumed b-dir resurfaces next to its
    # segment -- the _COMPACTED manifest must keep readers from
    # double-counting, and the next compactor run finishes the removal
    shutil.copytree(stash, os.path.join(state, "pairs", "b0"))
    assert before == sorted(
        (r.doc_a, r.doc_b) for r in read_lsh_pairs(spark, state).collect()
    )
    assert compact_log_batches(spark, state, "pairs") == ["b0"]
    assert not glob.glob(os.path.join(state, "pairs", "b*"))
    # the late duplicate arrives AFTER compaction: it must pair
    # through the c-segment's index rows
    _write_doc_chunk(spark, d, 2, _LSH_DOC_CHUNKS[2])
    _drain(maintain_lsh_index(stream(), state, ckpt, bands=4, rows=4))
    got = sorted(
        (r.doc_a, r.doc_b) for r in read_lsh_pairs(spark, state).collect()
    )
    all_docs = spark.createDataFrame(
        [r for rows in _LSH_DOC_CHUNKS for r in rows], _DOCS_T
    )
    exp = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(all_docs, bands=4, rows=4).collect()
    )
    assert got == exp and (1, 5) in got and (2, 5) in got


@pytest.mark.slow
def test_lsh_fold_partition_invariance(spark, tmp_path):
    """ANY chunking of the corpus folds to the batch operator's exact
    pair set -- the property that makes the maintained index safe to
    deploy against an arbitrary arrival pattern.  Seed-driven random
    corpora and random batch boundaries (commit_lsh_batch called
    directly: it IS the fold semantics, minus the stream plumbing)."""
    import random

    from binlog_avro_comparator_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        commit_lsh_batch,
        read_lsh_pairs,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for seed in (11, 47, 101):
        rng = random.Random(seed)
        docs = [
            (
                i,
                " ".join(rng.choice(vocab) for _ in range(8)),
                "en",
                "web",
                40,
            )
            for i in range(1, 11)
        ]
        # random contiguous batch boundaries (1-4 batches)
        n_batches = rng.randint(1, 4)
        cuts = sorted(rng.sample(range(1, len(docs)), n_batches - 1))
        chunks, prev = [], 0
        for c in cuts + [len(docs)]:
            chunks.append(docs[prev:c])
            prev = c
        state = str(tmp_path / f"pi_state_{seed}")
        for b, rows in enumerate(chunks):
            commit_lsh_batch(
                spark,
                state,
                spark.createDataFrame(rows, _DOCS_T),
                b,
                bands=4,
                rows=4,
            )
        got = sorted(
            (r.doc_a, r.doc_b)
            for r in read_lsh_pairs(spark, state).collect()
        )
        exp = sorted(
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(
                spark.createDataFrame(docs, _DOCS_T), bands=4, rows=4
            ).collect()
        )
        assert got == exp, f"seed {seed}: fold != batch"
        assert len(got) == len(set(got)), f"seed {seed}: duplicate pairs"


@pytest.mark.slow
def test_simhash_fold_verified_pairs_equal_batch(spark, tmp_path):
    """The maintained SimHash index (fold_sinks.maintain_simhash_index):
    the hamming verify runs at probe time against the STORED
    fingerprint, so a doc arriving batches after its near-dup emits a
    verified pair through the accumulated index; the union equals
    batch simhash_near_pairs over the full corpus."""
    from binlog_avro_comparator_spark.operators.dedup import (
        simhash_near_pairs,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        commit_simhash_batch,
        read_simhash_pairs,
    )

    state = str(tmp_path / "sh_state")
    for b, rows in enumerate(_LSH_DOC_CHUNKS):
        commit_simhash_batch(
            spark, state, spark.createDataFrame(rows, _DOCS_T), b
        )
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in read_simhash_pairs(spark, state).collect()
    )
    all_docs = spark.createDataFrame(
        [r for rows in _LSH_DOC_CHUNKS for r in rows], _DOCS_T
    )
    exp = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(all_docs).collect()
    )
    assert got == exp
    # the cross-batch late duplicate verified at hamming 0 through the
    # index (word-identical docs -> identical fingerprints)
    assert (1, 5, 0) in got and (2, 5, 0) in got
    assert len(got) == len({(a, b) for a, b, _ in got})  # disjoint logs


@pytest.mark.slow
def test_dedupd_cli_drain_resume_and_compact(spark, tmp_path):
    """The dedupd CLI end to end: drain-once over two arrivals, a
    restart-safe second drain picking up only the new file, --both
    methods from one checkpoint, --compact leaving single segments,
    and the final pair logs equal to the batch operators."""
    from binlog_avro_comparator_spark.dedupd import main as dedupd_main
    from binlog_avro_comparator_spark.operators.dedup import (
        lsh_candidate_pairs,
        simhash_near_pairs,
    )
    from binlog_avro_comparator_spark.streaming.fold_sinks import (
        read_lsh_pairs,
        read_simhash_pairs,
    )

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    for i, rows in enumerate(_LSH_DOC_CHUNKS[:2]):
        _write_doc_chunk(spark, d, i, rows)
    state = str(tmp_path / "dd_state")
    ckpt = str(tmp_path / "dd_ckpt")
    args = [
        "--dir", d, "--state", state, "--checkpoint", ckpt,
        "--method", "both",
    ]
    assert dedupd_main(args, spark=spark) == 0
    # restart-safe: the late arrival lands, a second drain folds ONLY
    # it (committed batches replay as no-ops), now with compaction
    _write_doc_chunk(spark, d, 2, _LSH_DOC_CHUNKS[2])
    assert dedupd_main(args + ["--compact"], spark=spark) == 0
    all_docs = spark.createDataFrame(
        [r for rows in _LSH_DOC_CHUNKS for r in rows], _DOCS_T
    )
    got_mh = sorted(
        (r.doc_a, r.doc_b)
        for r in read_lsh_pairs(
            spark, os.path.join(state, "minhash")
        ).collect()
    )
    exp_mh = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(all_docs, bands=4, rows=4).collect()
    )
    assert got_mh == exp_mh and (1, 5) in got_mh
    got_sh = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in read_simhash_pairs(
            spark, os.path.join(state, "simhash")
        ).collect()
    )
    exp_sh = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_pairs(all_docs).collect()
    )
    assert got_sh == exp_sh
    # compaction left single segments behind
    assert not glob.glob(os.path.join(state, "minhash", "pairs", "b*"))
    assert glob.glob(os.path.join(state, "minhash", "pairs", "c*"))
