"""Drive windowed_event_counts across TWO triggers with a shared
checkpoint: trigger 1 finalizes early windows; trigger 2 delivers a
LATE event (behind the watermark) plus a fresh one -- the late event
must be dropped, the fresh one's window must not double-emit old data."""
import json, os, sys, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F, types as T
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from binlog_avro_comparator_spark.streaming import windowed_event_counts

d = tempfile.mkdtemp(); os.makedirs(f"{d}/src")
aligned = 1_699_999_800_000_000  # epoch-us on a 10-min boundary
def w(path, rows):
    with open(path, "w") as f:
        for et, off_min, v in rows:
            f.write(json.dumps({"event_type": et, "ts_us": aligned + off_min*60_000_000, "value": v})+"\n")
w(f"{d}/src/b0.json", [("click", 1, 1.0), ("click", 3, 3.0), ("view", 5, 7.0),
                        ("click", 12, 2.0), ("view", 61, 9.0)])  # 61min advances watermark
schema = T.StructType([T.StructField("event_type",T.StringType()),
                       T.StructField("ts_us",T.LongType()),
                       T.StructField("value",T.DoubleType())])
stream = (spark.readStream.schema(schema).json(f"{d}/src")
          .withColumn("ts", F.timestamp_micros(F.col("ts_us"))))
out = windowed_event_counts(stream)
def trigger():
    q = (out.writeStream.format("json").option("path", f"{d}/out")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", f"{d}/ck").start())
    q.awaitTermination(180)
    try:
        rows = spark.read.json(f"{d}/out").collect()
    except Exception:
        return []
    return sorted((r.event_type, int((r.window_start_ms - aligned//1000)//60000), int(r.n_events)) for r in rows)
print("after trigger1:", trigger())
# trigger 2: one LATE click (minute 2 -- watermark is at 61-30=31min) and
# one fresh click at minute 70
w(f"{d}/src/b1.json", [("click", 2, 99.0), ("click", 70, 5.0), ("view", 130, 1.0)])
print("after trigger2:", trigger())
spark.stop()
