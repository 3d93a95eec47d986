"""Round-5 skew probe (r4 verdict #6): sharpen the r4 file-heat probe
to the asked-for distribution -- ONE binlog file holds 90% of 10M
events -- and add the case where skew actually reaches the exchange:
duplicate composite keys (the near-unique-key argument's failure mode),
with AQE's skew-split decision read back from the executed plan.

Two variants, 10M rows per side, full diff (compare.diff_joined):

  hot-file      90% of rows in mysql-bin.HOT, positions unique.
                Expectation ~1.0x of even: the shuffle hashes the
                COMPOSITE (file, position); unique positions spread a
                hot file across all partitions, so file heat never
                concentrates into one reducer.
  hot-keys      90% hot file AND the avro side draws 30% of its rows
                from just 64 distinct composite keys (a realistic
                replay/retry storm writing the same keys over and
                over).  Binlog side stays deduped/unique (prepare's J2
                guarantees that invariant), so the join fans out
                probe-side only -- no row explosion, but the shuffle
                partitions holding the 64 keys are ~7000x the median.
                This is exactly the partition-level skew AQE's
                skew-join split exists for; the probe prints whether
                the final adaptive plan marked the join skew=true.

Pass bar: hot-file within ~1.5x of even; hot-keys completes without
straggler blowup (wall within ~2x of even) AND the plan shows AQE
handled it (skew=true) or partition sizes stayed under the split
threshold (also a pass: skew absorbed by hashing + AQE coalescing).
"""
import re
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binlog_avro_comparator_spark.operators import compare as C
from binlog_avro_comparator_spark.session import get_spark

spark = get_spark("skew-probe-r5")  # local[32]
spark.sparkContext.setLogLevel("ERROR")

N = 10_000_000
HOT_FILE_FRAC = 10  # id % 10 != 0 -> hot file (90%)


def frames(variant: str):
    ids = spark.range(N)
    even_file = F.concat(F.lit("mysql-bin."), (F.col("id") % 64).cast("string"))
    if variant == "even":
        file_col = even_file
    else:  # 90% of rows in one file
        file_col = F.when(
            F.col("id") % HOT_FILE_FRAC != 0, F.lit("mysql-bin.HOT")
        ).otherwise(even_file)
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
    # hot-keys: 30% of avro rows collapse onto 64 distinct positions
    # (all inside the hot file) -- duplicate composite keys on the
    # PROBE side, the reference's own granularity (go counts per row)
    pos = F.col("id")
    if variant == "hot-keys":
        pos = F.when(F.col("id") % 10 < 3, (F.col("id") % 64) * 10 + 1).otherwise(
            F.col("id")
        )
    file_a = file_col if variant != "hot-keys" else F.when(
        F.col("id") % 10 < 3, F.lit("mysql-bin.HOT")
    ).otherwise(file_col)
    ap = ids.select(
        file_a.alias("binlog_file"),
        F.when(F.col("id") % 13 == 0, F.col("id") + N).otherwise(pos).alias(
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


def run(variant: str):
    bp, ap = frames(variant)
    out = C.diff_joined(bp, ap)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_skew = len(re.findall(r"skew=true", plan))
    final = "isFinalPlan=true" in plan
    print(
        f"diff_joined 10M/side  {variant:>8}  wall={dt:6.1f}s  "
        f"aqe_final={final}  skew_marked_joins={n_skew}",
        flush=True,
    )


run("even")  # warm-up + baseline
for v in ("even", "hot-file", "hot-keys", "even", "hot-file", "hot-keys"):
    run(v)
spark.stop()
