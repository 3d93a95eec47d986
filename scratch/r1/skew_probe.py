"""Round-4 skew probe (r3 verdict #8): the CDC diff's one big-big
shuffle is the full-outer sort-merge join in compare.diff_joined
(compare.py:~180).  Measure it at 10M rows per side under two key
distributions:

  even : binlog_file spread uniformly over 64 files
  hot  : ONE binlog_file holds 50% of all events (rest spread over 64)

Pass bar (verdict): hot wall within ~1.5x of even wall at 10M rows.

Why we expect ~1.0x: the join key is the COMPOSITE (binlog_file,
binlog_position) and positions are unique within a file, so the hash
partitioning of the shuffle spreads a hot file's rows across all
partitions anyway -- file-level heat never concentrates into one
reducer.  AQE skew-split stays armed for residual partition skew.
The probe turns that argument into a measured number.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators import compare as C

spark = get_spark("skew-probe")  # local[32]
spark.sparkContext.setLogLevel("ERROR")

N = 10_000_000


def prepared_frames(hot: bool):
    """Synthetic binlog/avro prepared-shaped frames, 10M rows/side.

    Columns are exactly the ones diff_joined touches.  `hot` routes
    every even id to one file; positions stay unique so the composite
    key is unique either way (matching the real fixture's invariant).
    """
    ids = spark.range(N).select(F.col("id"))
    even_file = F.concat(F.lit("mysql-bin."), (F.col("id") % 64).cast("string"))
    file_col = (
        F.when(F.col("id") % 2 == 0, F.lit("mysql-bin.HOT")).otherwise(even_file)
        if hot
        else even_file
    )
    ts = F.timestamp_millis(F.lit(1_700_000_000_000) + F.col("id"))
    bp = ids.select(
        file_col.alias("binlog_file"),
        F.col("id").alias("binlog_position"),
        F.lit("WriteRowsEventV2").alias("event_type"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
            "immediate_commmit_timestamp"
        ),
        F.concat(F.lit("uuid-0:"), F.col("id").cast("string")).alias("gtid_next"),
        F.lit("db0").alias("schema"),
        F.lit("t0").alias("table"),
        F.col("id").alias("line_no"),
    )
    # ~7.7% avro-only (key offset), ~9% ts beyond tolerance -- keeps the
    # comparison columns doing real work, like the fixture does.
    ap = ids.select(
        file_col.alias("binlog_file"),
        F.when(F.col("id") % 13 == 0, F.col("id") + N).otherwise(F.col("id")).alias(
            "binlog_position"
        ),
        (
            F.lit(1_700_000_000_000)
            + F.col("id")
            + F.when(F.col("id") % 11 == 0, F.lit(250)).otherwise(F.col("id") % 90)
        ).alias("source_timestamp"),
        F.concat(F.lit("uuid-0:"), F.col("id").cast("string")).alias("gtid"),
        F.lit("INSERT").alias("change_type"),
    )
    return bp, ap


# JVM/codegen warm-up so the first measured config doesn't pay
# session spin-up (first run measured 22s even / 5.6s hot purely from
# ordering)
bp0, ap0 = prepared_frames(hot=False)
C.diff_joined(bp0, ap0).write.format("noop").mode("overwrite").save()

for label in ("even", "hot", "even", "hot"):
    bp, ap = prepared_frames(hot=label == "hot")
    t0 = time.time()
    # full materialization of the joined+compared frame (count() would
    # let Catalyst prune the comparison columns)
    C.diff_joined(bp, ap).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"diff_joined 10M/side  files={label:>4}  wall={dt:6.1f}s", flush=True)

spark.stop()
