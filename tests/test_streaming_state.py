"""Stateful streaming sessionization + skew utilities."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from binlog_avro_comparator_spark.functions import (
    salted_aggregate,
    salted_broadcastable_join,
)
from binlog_avro_comparator_spark.streaming import sessionize_stream

import pytest


@pytest.mark.slow
def test_sessionize_stream_closes_on_gap(spark, tmp_path):
    base = 1_700_000_000_000_000  # epoch micros
    rows = [
        (10, base),
        (10, base + 60_000_000),                # +1 min -> same session
        (10, base + 45 * 60_000_000),           # +45 min -> closes session 1
        (20, base),
        (20, base + 40 * 60_000_000),           # closes user 20's first session
    ]
    src = tmp_path / "events_stream"
    src.mkdir()
    import json

    with (src / "batch0.json").open("w") as f:
        for uid, us in rows:
            f.write(json.dumps({"user_id": uid, "ts_us": us}) + "\n")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # closed sessions only: the trailing session per user stays open in
    # state (flushes on timeout in a live stream)
    assert got == {(10, 2), (20, 1)}


def test_windowed_agg_with_watermark(spark, tmp_path):
    import json

    from binlog_avro_comparator_spark.streaming import windowed_event_counts

    base = 1_700_000_000_000_000  # epoch micros, aligned to windows below
    rows = [
        ("click", base, 1.0),
        ("click", base + 2 * 60_000_000, 3.0),        # same 10-min window
        ("view", base + 5 * 60_000_000, 7.0),
        ("click", base + 12 * 60_000_000, 2.0),        # next window
        ("view", base + 61 * 60_000_000, 9.0),         # advances watermark past both
    ]
    src = tmp_path / "wsrc"
    src.mkdir()
    with (src / "b0.json").open("w") as f:
        for et, us, v in rows:
            f.write(json.dumps({"event_type": et, "ts_us": us, "value": v}) + "\n")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "wck"))
        .start()
    )
    q.awaitTermination(180)
    # windows align to epoch 10-minute boundaries, not to `base`
    aligned = (base // 1000) - ((base // 1000) % 600_000)
    got = {
        (r.event_type, (r.window_start_ms - aligned) // 60000): (
            r.n_events,
            r.min_value,
            r.max_value,
        )
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    # append mode: only windows the watermark has passed are emitted --
    # the first three windows finalize, the +61min event's own window
    # stays open in state.  base sits 200s into its aligned window, so
    # base+12min lands in the window starting at aligned+10min.
    assert got == {
        ("click", 0): (2, 1.0, 3.0),
        ("view", 0): (1, 7.0, 7.0),
        ("click", 10): (1, 2.0, 2.0),
    }


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 7).alias("v")
    )
    plain = {
        (r.k): (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.c, r.mn, r.mx)
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "s": ("v", "sum"),
                "c": ("v", "count"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_broadcastable_join_guard(spark):
    large = spark.range(100).select(F.col("id").alias("k"))
    small = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_broadcastable_join(large, small, on=["k"])
    assert out.count() == 10
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="max_small_rows"):
        salted_broadcastable_join(large, small, on=["k"], max_small_rows=5)


def test_dedup_stream_cross_batch_and_eviction(spark, tmp_path):
    """dropDuplicates state works ACROSS micro-batches (a redelivery in
    a later file is dropped), and a key redelivered after the watermark
    evicted it passes through again -- bounded state, the documented
    trade."""
    import json
    import os
    import time

    from binlog_avro_comparator_spark.streaming.dedup_stream import dedup_stream

    base = 1_700_000_000_000_000
    batches = [
        # batch 0: key 1 twice in-batch, key 2 once
        [(1, base, "click"), (1, base, "click"), (2, base + 1_000_000, "view")],
        # batch 1: key 1 redelivered (cross-batch dup) + key 3 two hours
        # later -- advances the watermark (used by the NEXT batch) to
        # base+90min, far past key 2's base+1s+30min expiry
        [(1, base, "click"), (3, base + 7_200_000_000, "view")],
        # batch 2: eviction happens at END of a batch, so this batch
        # (any row) is where the advanced watermark actually clears
        # key 2's entry
        [(4, base + 7_201_000_000, "click")],
        # batch 3: key 2 reappears AFTER eviction with a CURRENT event
        # time -> new state entry, passes through again.  (Reappearing
        # with its ORIGINAL old timestamp would be late data, dropped
        # by the watermark before dedup -- also the correct contract.)
        [(2, base + 7_202_000_000, "view")],
    ]
    src = tmp_path / "dsrc"
    src.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        with p.open("w") as f:
            for eid, us, et in rows:
                f.write(json.dumps({"event_id": eid, "ts_us": us, "event_type": et}) + "\n")
        # FileStreamSource orders batches by mtime; same-second writes
        # would make batch order (and thus watermark history) arbitrary
        os.utime(p, (now + i, now + i))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = dedup_stream(stream, key_cols=("event_id",), watermark_delay="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedupstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dck"))
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r.event_id, r.event_type)
        for r in spark.sql("SELECT event_id, event_type FROM dedupstream").collect()
    ]
    assert sorted(got) == [
        (1, "click"),
        (2, "view"),
        (2, "view"),
        (3, "view"),
        (4, "click"),
    ]


def test_stream_stream_join_cross_batch_and_window_bound(spark, tmp_path):
    """Stream-stream inner interval join across micro-batches: a click
    arriving in a LATER batch still pairs with a buffered view (state
    held within the horizon), clicks outside the 10-min window never
    pair, and the same-user same-window click pairs with BOTH
    qualifying views (join, not first-match)."""
    import json

    from binlog_avro_comparator_spark.streaming.join_stream import (
        view_click_join_stream,
    )

    base = 1_700_000_000_000_000  # epoch micros

    def write_batch(name, rows):
        with (src / name).open("w") as f:
            for eid, uid, us in rows:
                f.write(json.dumps({"event_id": eid, "user_id": uid, "ts_us": us}) + "\n")

    src = tmp_path / "views"
    src.mkdir()
    write_batch("b0.json", [
        (1, 10, base),                       # view, user 10
        (2, 10, base + 60_000_000),          # second view, same user, +1 min
        (3, 20, base),                       # view, user 20
    ])
    vschema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_us", T.LongType()),
        ]
    )
    views = (
        spark.readStream.schema(vschema).option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select("event_id", "user_id", "ts")
    )
    csrc = tmp_path / "clicks"
    csrc.mkdir()
    with (csrc / "c0.json").open("w") as f:
        for eid, uid, us in [
            (100, 10, base + 5 * 60_000_000),    # pairs with views 1 AND 2
            (101, 20, base + 20 * 60_000_000),   # 20 min after view 3 -> outside window
        ]:
            f.write(json.dumps({"event_id": eid, "user_id": uid, "ts_us": us}) + "\n")
    clicks = (
        spark.readStream.schema(vschema)
        .json(str(csrc))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .select("event_id", "user_id", "ts")
    )
    out = view_click_join_stream(views, clicks)
    q = (
        out.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "jck"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.view_event_id, r.click_event_id, r.gap_ms)
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == {
        (1, 100, 5 * 60_000),
        (2, 100, 4 * 60_000),
    }


def test_streaming_checkpoint_recovery_no_double_count(spark, tmp_path):
    """Restarting a stateful streaming query from its checkpoint must
    resume at the recorded source offsets: files drained before the
    stop are not re-counted, files added while down are picked up, and
    the final complete-mode state equals the batch aggregate over ALL
    files -- the exactly-once contract a 100 TB ingest leans on after
    any executor/driver loss."""
    import json

    from binlog_avro_comparator_spark.streaming import windowed_event_counts

    base = 1_700_000_000_000_000
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        with (src / name).open("w") as f:
            for et, us in rows:
                f.write(json.dumps({"event_type": et, "ts_us": us, "value": 1.0}) + "\n")

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def drain(qname):
        stream = (
            spark.readStream.schema(schema)
            .json(str(src))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
        q = (
            windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        assert q.awaitTermination(180)
        q.stop()
        return {
            (r.window_start_ms, r.event_type): r.n_events
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    write("b0.json", [("click", base), ("click", base + 1_000_000)])
    first = drain("ckpt_run1")
    win = (1_700_000_000_000 // 600_000) * 600_000  # 10-min window start
    assert first[(win, "click")] == 2

    write("b1.json", [("click", base + 2_000_000), ("view", base + 3_000_000)])
    second = drain("ckpt_run2")
    # resumed, not replayed: 2 old + 1 new click (not 4), plus the view
    assert second[(win, "click")] == 3
    assert second[(win, "view")] == 1


def test_incremental_snapshot_time_travel_and_prune(spark, tmp_path):
    """foreachBatch snapshot maintenance: each micro-batch commits a
    version; an older version reads as the state AS OF that batch
    (time travel), pruning keeps the newest versions and never the
    LATEST pointer's target, and the final snapshot equals the batch
    operator over all events."""
    from binlog_avro_comparator_spark.operators.snapshot import apply_changes
    from binlog_avro_comparator_spark.streaming.snapshot_sink import (
        list_versions,
        maintain_snapshot,
        prune_versions,
        read_snapshot,
    )

    base = 1_700_000_000_000_000
    rows = [
        # chunk 0: user 1 INSERT, user 2 INSERT
        [(1, base, 1, "click", 1.0, "{}"), (2, base + 1_000_000, 2, "click", 2.0, "{}")],
        # chunk 1: user 1 UPDATE, user 2 DELETE
        [(3, base + 2_000_000, 1, "view", 3.0, "{}"),
         (4, base + 3_000_000, 2, "purchase", 0.0, "{}")],
    ]
    src = tmp_path / "chunks"
    src.mkdir()
    schema = (
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    )
    frames = []
    for i, chunk in enumerate(rows):
        df = spark.createDataFrame(chunk, schema).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        ).drop("ts_us")
        df.coalesce(1).write.parquet(str(src / f"c{i}"))
        frames.append(df)
    stream = (
        spark.readStream.schema(frames[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = maintain_snapshot(stream, str(tmp_path / "state"), str(tmp_path / "ck"))
    assert q.awaitTermination(180)
    q.stop()

    state_dir = str(tmp_path / "state")
    versions = list_versions(state_dir)
    assert len(versions) == 2

    # time travel: as of the FIRST batch both users are live
    v0 = {r.user_id: r.last_op for r in read_snapshot(spark, state_dir, versions[0]).collect()}
    final = {r.user_id: r for r in read_snapshot(spark, state_dir).collect()}
    all_events = frames[0].unionByName(frames[1])
    batch = {r.user_id: r for r in apply_changes(all_events).collect()}
    # one chunk arrived first; whichever it was, the final state matches batch
    assert set(v0) in ({1, 2}, {1}, {2})
    assert {u: (r.last_op, r.n_changes) for u, r in final.items()} == {
        u: (r.last_op, r.n_changes) for u, r in batch.items()
    }
    assert final[1].last_op == "UPDATE" and 2 not in final

    removed = prune_versions(state_dir, keep=1)
    assert removed == [versions[0]]
    assert {r.user_id for r in read_snapshot(spark, state_dir).collect()} == {1}


def test_snapshot_commit_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a committed batch must
    be a no-op (same n_changes, no read-while-overwrite of the version
    dir), and a retry from the written-but-pointer-not-swung position
    must converge to the same state."""
    from binlog_avro_comparator_spark.streaming.snapshot_sink import (
        commit_batch,
        read_snapshot,
    )

    base = 1_700_000_000_000_000
    schema = (
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    )

    def frame(chunk):
        return (
            spark.createDataFrame(chunk, schema)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            .drop("ts_us")
        )

    b0 = frame([(1, base, 1, "click", 1.0, "{}")])
    b1 = frame([(2, base + 1_000_000, 1, "view", 2.0, "{}")])
    state_dir = str(tmp_path / "state")
    import os

    os.makedirs(state_dir)
    commit_batch(spark, state_dir, b0, 0)
    commit_batch(spark, state_dir, b1, 1)
    snap = {r.user_id: r for r in read_snapshot(spark, state_dir).collect()}
    assert snap[1].n_changes == 2 and snap[1].last_op == "UPDATE"

    # (a) full replay of the committed batch 1: pointer already at v1
    commit_batch(spark, state_dir, b1, 1)
    snap2 = {r.user_id: r for r in read_snapshot(spark, state_dir).collect()}
    assert snap2[1].n_changes == 2  # NOT doubled

    # (b) retry from written-but-not-swung: swing the pointer back to
    # v0 (simulating a crash between write and swing) and re-commit
    with open(os.path.join(state_dir, "LATEST"), "w", encoding="utf-8") as f:
        f.write("v0")
    commit_batch(spark, state_dir, b1, 1)
    snap3 = {r.user_id: r for r in read_snapshot(spark, state_dir).collect()}
    assert snap3[1].n_changes == 2 and snap3[1].last_op == "UPDATE"


def test_snapshot_commit_crash_between_write_and_swing(spark, tmp_path):
    """TRUE crash injection: kill commit_batch AFTER the v-dir parquet
    write but BEFORE the pointer swing (monkeypatched os.replace raises
    once), then recover by re-running the batch -- the retry must read
    the still-clean previous version, rewrite v1 idempotently, swing
    the pointer, and land on exactly the clean two-batch state."""
    import os

    from binlog_avro_comparator_spark.streaming import snapshot_sink
    from binlog_avro_comparator_spark.streaming.snapshot_sink import (
        commit_batch,
        read_snapshot,
    )

    base = 1_700_000_000_000_000
    schema = (
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    )

    def frame(chunk):
        return (
            spark.createDataFrame(chunk, schema)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            .drop("ts_us")
        )

    b0 = frame([(1, base, 1, "click", 1.0, "{}"),
                (2, base, 2, "click", 5.0, "{}")])
    b1 = frame([(3, base + 1_000_000, 1, "view", 2.0, "{}"),
                (4, base + 2_000_000, 2, "purchase", 0.0, "{}")])
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    commit_batch(spark, state_dir, b0, 0)

    real_replace = os.replace
    boom = {"armed": True}

    def dying_replace(src, dst):
        if boom["armed"] and os.path.basename(dst) == "LATEST":
            boom["armed"] = False
            raise OSError("injected crash before pointer swing")
        return real_replace(src, dst)

    snapshot_sink.os.replace = dying_replace
    try:
        with pytest.raises(OSError, match="injected crash"):
            commit_batch(spark, state_dir, b1, 1)
        # post-crash invariants: v1 exists, pointer still names v0,
        # so readers keep seeing the consistent previous snapshot
        assert os.path.isdir(os.path.join(state_dir, "v1"))
        with open(os.path.join(state_dir, "LATEST"), encoding="utf-8") as f:
            assert f.read().strip() == "v0"
        snap = {r.user_id: r for r in read_snapshot(spark, state_dir).collect()}
        assert snap[1].n_changes == 1 and snap[2].n_changes == 1
        # recovery: foreachBatch replays batch 1 -> exact clean result
        commit_batch(spark, state_dir, b1, 1)
    finally:
        snapshot_sink.os.replace = real_replace
    with open(os.path.join(state_dir, "LATEST"), encoding="utf-8") as f:
        assert f.read().strip() == "v1"
    snap = {r.user_id: r for r in read_snapshot(spark, state_dir).collect()}
    assert snap[1].n_changes == 2 and snap[1].last_op == "UPDATE"
    # user 2's purchase is a DELETE tombstone: filtered at read time
    assert 2 not in snap


def test_left_join_boundary_horizon(spark, tmp_path):
    """Pin Spark's null-emission horizon for the LEFT OUTER
    stream-stream interval join: with final watermark W = min(side
    maxes) - delay, a matchless view emits its null-padded row iff
    view_ts + window <= W -- INCLUSIVE at the boundary.  The
    events_left_join_stream oracle depends on this exact inequality."""
    from binlog_avro_comparator_spark.streaming.join_stream import (
        view_click_left_join_stream,
    )

    T0 = 1_700_000_000_000
    WINDOW, DELAY = 600_000, 10_000
    maxts = T0 + 2_000_000
    w = maxts - DELAY
    rows_v = [
        (1001, 1, maxts),            # anchor; user 1 has a click
        (2001, 21, w - WINDOW - 1),  # closes at W-1: null row expected
        (2002, 22, w - WINDOW),      # closes exactly at W: null row expected
        (2003, 23, w - WINDOW + 1),  # closes at W+1: still in state, absent
    ]
    rows_c = [(3001, 1, maxts)]
    for rows, name in ((rows_v, "views"), (rows_c, "clicks")):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts_ms long"
        ).withColumn("ts", F.timestamp_millis("ts_ms")).select(
            "event_id", "user_id", "ts"
        ).coalesce(1).write.parquet(str(tmp_path / name))

    stream_schema = "event_id long, user_id long, ts timestamp"
    out = view_click_left_join_stream(
        spark.readStream.schema(stream_schema).parquet(str(tmp_path / "views")),
        spark.readStream.schema(stream_schema).parquet(str(tmp_path / "clicks")),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("boundary_probe_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()
    res = spark.table("boundary_probe_sink").collect()
    null_views = {r.view_event_id for r in res if r.click_event_id is None}
    assert null_views == {2001, 2002}
    assert {r.view_event_id for r in res if r.click_event_id is not None} == {1001}


def test_payload_findings_stream_horizons(spark, tmp_path):
    """Pin the FULL OUTER payload-findings emission contract: matched
    pairs emit per-column findings; a matchless binlog row emits
    BINLOG_ONLY iff b_ts + window < W (STRICT -- the inclusive
    <= range predicate means a partner with a_ts == b_ts + window is
    still admissible when the watermark merely equals it), and a
    matchless avro row AVRO_ONLY iff a_ts + window < W, where W =
    min(side maxes) - delay.  The cdc_payload_findings_stream oracle
    depends on these exact inequalities."""
    from binlog_avro_comparator_spark.streaming.compare_stream import (
        streaming_payload_findings,
    )

    T0 = 1_700_000_000_000
    WINDOW = 2_000
    M = T0 + 100_000  # both sides' max event time; delay=0 -> W = M
    b_rows = [
        ("f", 100, {"a": "1", "b": "x", "c": None, "d": "only-b"}, M),
        ("f", 200, {"a": "1"}, M - WINDOW),      # closes AT W: absent
        ("f", 300, {"a": "1"}, M - WINDOW - 1),  # strictly closed: emits
        ("f", 400, {"a": "1"}, M - 9_000),       # well closed: emits
    ]
    a_rows = [
        ("f", 100, {"a": "2", "b": "x", "c": "av", "d": None}, M),
        ("f", 500, {"a": "1"}, M - WINDOW - 1),  # strictly closed: emits
        ("f", 600, {"a": "1"}, M - WINDOW),      # closes AT W: absent
    ]
    schema = (
        "binlog_file string, binlog_position long, "
        "payload map<string,string>, ts_ms long"
    )
    for rows, name in ((b_rows, "b"), (a_rows, "a")):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.timestamp_millis("ts_ms")
        ).select("binlog_file", "binlog_position", "payload", "ts").coalesce(
            1
        ).write.parquet(str(tmp_path / name))

    stream_schema = (
        "binlog_file string, binlog_position long, "
        "payload map<string,string>, ts timestamp"
    )
    out = streaming_payload_findings(
        spark.readStream.schema(stream_schema).parquet(str(tmp_path / "b")),
        spark.readStream.schema(stream_schema).parquet(str(tmp_path / "a")),
        window_ms=WINDOW,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("payload_findings_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    q.stop()
    res = spark.table("payload_findings_probe").collect()
    by_status = {}
    for r in res:
        by_status.setdefault(r.status, []).append(r)
    # matched key 100: a MISMATCH, c BINLOG_NULL, d AVRO_NULL, b agrees
    matched = {(r.column, r.status) for r in res if r.binlog_position == 100}
    assert matched == {("a", "MISMATCH"), ("c", "BINLOG_NULL"),
                       ("d", "AVRO_NULL")}
    assert {r.binlog_position for r in by_status["BINLOG_ONLY"]} == {300, 400}
    assert {r.binlog_position for r in by_status["AVRO_ONLY"]} == {500}
    only = by_status["BINLOG_ONLY"][0]
    assert only.column is None and only.binlog_value is None


def _run_running_stats(spark, tmp_path, api, two_files=True):
    import json

    from binlog_avro_comparator_spark.streaming.running_stats_stream import (
        running_stats_stream,
    )

    base_us = 1_700_000_000_000_000
    # user 10: values rise then fall (max must STICK); user 20: one event
    # per file (state must carry across micro-batches)
    rows = [
        (1, 10, base_us, 5.0),
        (2, 10, base_us + 1_000_000, 9.0),
        (3, 20, base_us + 2_000_000, 1.0),
        (4, 10, base_us + 10_000_000, 3.0),
        (5, 20, base_us + 11_000_000, 0.5),
    ]
    src = tmp_path / f"rs_{api}"
    src.mkdir()
    split = 3 if two_files else len(rows)
    for i, (fname, chunk) in enumerate(
        (("b0.json", rows[:split]), ("b1.json", rows[split:]))
    ):
        if chunk:
            with (src / fname).open("w") as f:
                for eid, uid, us, v in chunk:
                    f.write(json.dumps(
                        {"event_id": eid, "user_id": uid, "ts_us": us, "value": v}
                    ) + "\n")
            # FileStreamSource orders micro-batches by mtime: pin b0
            # strictly older so the cross-batch assertion is stable
            import os

            t = 1_700_000_000 + i * 60
            os.utime(src / fname, (t, t))
    schema = "event_id long, user_id long, ts_us long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    name = f"rs_sink_{api}_{two_files}"
    q = (
        running_stats_stream(stream, api=api)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    return {r.event_id: r for r in spark.table(name).collect()}


_RS_EXPECTED = {
    1: (10, 1, 5.0),
    2: (10, 2, 9.0),
    3: (20, 1, 1.0),
    4: (10, 3, 9.0),   # later smaller value: count advances, max sticks
    5: (20, 2, 1.0),   # second micro-batch: state carried
}


def test_running_stats_stream_v1_cross_batch(spark, tmp_path):
    """GroupState path: per-event emission with state carried across
    micro-batches equals the batch cumulative window."""
    got = _run_running_stats(spark, tmp_path, api="v1")
    assert len(got) == 5
    for eid, (uid, n, mx) in _RS_EXPECTED.items():
        r = got[eid]
        assert (r.user_id, r.n_events_so_far, r.running_max_value) == (uid, n, mx), eid


def test_running_stats_stream_v2_cross_batch(spark, tmp_path):
    """transformWithState path (State API v2): identical contract.
    Skips where the v2 protobuf protocol dependency is absent."""
    from binlog_avro_comparator_spark.streaming.running_stats_stream import (
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf not importable: State API v2 "
                    "python protocol unavailable in this environment")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = _run_running_stats(spark, tmp_path, api="v2")
        assert len(got) == 5
        for eid, (uid, n, mx) in _RS_EXPECTED.items():
            r = got[eid]
            assert (r.user_id, r.n_events_so_far, r.running_max_value) == (uid, n, mx), eid
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_transactions_stream_reassembles_across_batches(spark, tmp_path):
    """A transaction whose DML rows and XID commit marker arrive in
    DIFFERENT micro-batches must still fold to ONE committed summary
    row -- the stateful reassembly that makes the live torn-write
    quarantine possible.  Batch boundaries are forced with
    maxFilesPerTrigger=1."""
    import json
    import os
    import time

    from binlog_avro_comparator_spark.operators.compare import (
        transaction_summary,
    )

    batches = [
        # batch 0: tx1's first two DML rows on two tables
        [
            ("WriteRowsEventV2", 100, "ta", "tx1"),
            ("UpdateRowsEventV2", 200, "tb", "tx1"),
        ],
        # batch 1: tx1's commit marker + tx2's only row (no commit)
        [
            ("XID", 300, "", "tx1"),
            ("DeleteRowsEventV2", 400, "tc", "tx2"),
        ],
    ]
    src = tmp_path / "txsrc"
    src.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        p = src / f"b{i}.json"
        with p.open("w") as f:
            for et, pos, tbl, gtid in rows:
                f.write(
                    json.dumps(
                        {
                            "event_type": et,
                            "log_position": pos,
                            "table": tbl,
                            "gtid_next": gtid,
                        }
                    )
                    + "\n"
                )
        os.utime(p, (now + i, now + i))
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("log_position", T.LongType()),
            T.StructField("table", T.StringType()),
            T.StructField("gtid_next", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        transaction_summary(stream)
        .writeStream.format("memory")
        .queryName("txstream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "txck"))
        .start()
    )
    q.awaitTermination(180)
    got = {r.gtid: r for r in spark.table("txstream").collect()}
    assert set(got) == {"tx1", "tx2"}
    t1 = got["tx1"]
    assert (t1.n_events, t1.n_dml, t1.n_tables) == (3, 2, 2)
    assert (t1.first_position, t1.last_position) == (100, 300)
    assert t1.committed
    t2 = got["tx2"]
    assert (t2.n_events, t2.n_dml) == (1, 1) and not t2.committed
