"""Scale probe: multiply the sf0.1 events table Nx (event_id remapped to
keep key arithmetic/distributions) and run the full one-pass CDC diff.
Checks wall-clock scaling and that counter ratios stay stable."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table
from binlog_avro_comparator_spark.fixtures import derive_avro_rows, derive_binlog_events
from binlog_avro_comparator_spark.operators import compare as C

spark = get_spark("scale-probe")  # local[32]
spark.sparkContext.setLogLevel("ERROR")
base = load_table(spark, "/root/testdata/sf0.1", "events")

for mult in (1, 10, 100):
    ev = (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
          .select((F.col("event_id") * mult + F.col("__m")).alias("event_id"),
                  "ts", "user_id", "event_type", "value", "props"))
    bp = C.prepare_binlog(derive_binlog_events(ev))
    ap = C.prepare_avro(derive_avro_rows(ev))
    t0 = time.time()
    s = C.summary_onepass(derive_avro_rows(ev), bp, ap).collect()[0]
    dt = time.time() - t0
    n = 100_000 * mult
    print(f"mult={mult:>3} events={n:>9,} wall={dt:6.1f}s  "
          f"matched={s.matched:,} ts_mm={s.ts_mismatches:,} a_only={s.avro_only:,} b_only={s.binlog_only:,} "
          f"rows/s={int((s.total_avro_records + s.binlog_build_events)/dt):,}")
spark.stop()
