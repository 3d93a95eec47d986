"""Stateful streaming sessionization + skew utilities."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from binlog_avro_comparator_spark.functions import (
    salted_aggregate,
    salted_broadcastable_join,
)
from binlog_avro_comparator_spark.streaming import sessionize_stream

import pytest


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
