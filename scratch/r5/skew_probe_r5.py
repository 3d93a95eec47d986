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
                from just 2 distinct composite keys (a replay/retry
                storm rewriting the same keys).  Binlog side stays
                deduped/unique (prepare's J2 invariant), so the join
                fans out probe-side only -- no row explosion, but the
                8 hot reduce partitions are ~10x the median in BYTES
                (each hot row still carries its distinct gtid/
                timestamp payload, so compression cannot flatten the
                skew the way it does for constant-payload rows).

Findings this probe pins (see SCALE.md):
  - file heat is invisible to the composite-key hash (hot-file <= even)
  - AQE CANNOT skew-split the one-pass FULL OUTER diff join --
    OptimizeSkewedJoin supports inner/semi/anti/one-sided-outer only
    (splitting both sides of a full outer would duplicate
    null-emitting partitions).  Expected skew_marked_joins=0 there BY
    DESIGN, with wall still within the pass bar because per-key heat
    is bounded by the probe-side rows of that key.
  - the narrow 3-join form (matched_pairs inner + anti joins) IS
    skew-splittable: the addendum demonstrates skew=true +
    AQEShuffleRead skewed on the same distribution -- the escape
    hatch when a pathological key storm does hurt.  (The hot
    partitions here are ~6x the median; the production default
    demands >5x median AND >256 MB absolute -- the probe scales the
    absolute floor down to 4 MB to match local data volume.)
  - skew detection is BYTES-based on compressed map output: a hot key
    with constant/compressible payload can hide from it (an earlier
    revision of this probe aggregated a pruned column set and the 5M-
    row hot partition weighed 1.8 MiB).  Evidence aggregates a hash
    OF EVERY COLUMN to defeat pruning, like a real findings sink.

Measured (local[32], warm): even 4.9-5.5 s; hot-file 3.7-4.2 s
(file heat is FREE -- 0.75x, constant filename = fewer shuffle
bytes); hot-keys full-outer 18-24 s (~3.5x: two mega-hot reduce
partitions straggle and FullOuter cannot be split); matched_pairs
inner on the same storm: skew_marked_joins=1, AQEShuffleRead skewed,
14.6 s.  Pass bar: hot-file <= 1.5x even (PASS, 0.75x); hot-keys
full-outer degrades bounded-linearly in the hot-key multiplicity
(documented limitation + escape hatch, not a silent straggler);
addendum MUST show skew_marked_joins >= 1 (PASS).
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
    # hot-keys: 30% of avro rows collapse onto 8 distinct positions
    # (all inside the hot file) -- duplicate composite keys on the
    # PROBE side, the reference's own granularity (go counts per row)
    pos = F.col("id")
    if variant == "hot-keys":
        pos = F.when(F.col("id") % 10 < 3, (F.col("id") % 2) * 10 + 1).otherwise(
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


def _evidence(out):
    """Aggregate a hash of EVERY output column: nothing prunes, so the
    shuffle carries the full row payload -- bytes-based skew detection
    sees what a real findings sink would see."""
    return out.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*out.columns)).alias("h"),  # xor: no ANSI overflow
    )


def run(variant: str, low_threshold: bool = False):
    """Timing from a full-column noop write; AQE plan evidence from a
    count over the same join (collect() finalizes THAT frame's adaptive
    plan, so executedPlan() shows the real post-execution decisions --
    the write's QueryExecution is a separate object we can't reach from
    PySpark).  ``low_threshold`` drops the skew-split trigger to 4 MB
    so the probe's ~300 MB hot partitions qualify the way a 100x bigger
    partition would against the 256 MB production default."""
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": (
            "4m" if low_threshold else "256m"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": (
            "4m" if low_threshold else "64m"
        ),
    }
    for k, v in conf.items():
        spark.conf.set(k, v)
    bp, ap = frames(variant)
    out = C.diff_joined(bp, ap)
    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    cnt = _evidence(out)
    cnt.collect()
    plan = cnt._jdf.queryExecution().executedPlan().toString()
    n_skew = len(re.findall(r"skew=true", plan))
    final = "isFinalPlan=true" in plan
    label = variant + ("+lowthresh" if low_threshold else "")
    print(
        f"diff_joined 10M/side  {label:>18}  wall={dt:6.1f}s  "
        f"aqe_final={final}  skew_marked_joins={n_skew}",
        flush=True,
    )


run("even")  # warm-up + baseline
for v in ("even", "hot-file", "hot-keys", "even", "hot-file", "hot-keys"):
    run(v)
run("hot-keys", low_threshold=True)
run("even", low_threshold=True)
spark.stop()

# --- addendum: the skew-splittable escape hatch ---------------------------
# AQE's OptimizeSkewedJoin does NOT support FullOuter (Spark design:
# splitting both sides of a full-outer would duplicate null-emitting
# partitions).  The diff's narrow 3-join form (matched_pairs inner +
# avro_only anti + binlog_only anti) IS splittable -- demonstrate on the
# hot-keys distribution with the low threshold.
spark = get_spark("skew-probe-r5b")
spark.sparkContext.setLogLevel("ERROR")
for k, v in {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
}.items():
    spark.conf.set(k, v)
bp, ap = frames("hot-keys")
inner = C.matched_pairs(bp, ap)
t0 = time.time()
inner.write.format("noop").mode("overwrite").save()
dt = time.time() - t0
cnt = _evidence(inner)
cnt.collect()
plan = cnt._jdf.queryExecution().executedPlan().toString()
print(
    f"matched_pairs(inner) 10M/side  hot-keys+lowthresh  wall={dt:6.1f}s  "
    f"skew_marked_joins={len(re.findall(r'skew=true', plan))}",
    flush=True,
)
spark.stop()
