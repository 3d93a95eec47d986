"""sf1 endurance for the r10 tier: run the new/changed operators at
10x bench scale (/tmp/sf1) and print wall seconds."""
import sys, time
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from __spark_entry__ import queries

PICKS = [
    "cdc_schema_timeline",
    "cdc_schema_columns",
    "cdc_ddl_window_columns",
    "cdc_ddl_partial_parse",
    "cdc_payload_diff_guarded",
    "cdc_payload_diff_column_guarded",
    "cdc_ddl_guard_impact",
    "cdc_schema_timeline_stream",
    "media_ahash",
    "media_perceptual_dup",
    "supplier_similarity",
    "events_hourly_autocorr",
    "media_audio_perceptual_dup",
]

def main():
    spark = get_spark("sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in PICKS:
        t0 = time.time()
        n = qs[name](spark, "/tmp/sf1").count()
        print(f"{name}: {time.time()-t0:.1f}s  {n} rows", flush=True)
    spark.stop()

main()
