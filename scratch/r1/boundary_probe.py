"""Pin Spark's stream-stream LEFT OUTER null-emission boundary.

Fixture: matchless views placed exactly at / around the final
watermark horizon W = min(max view ts, max click ts) - 10s.  For each
view v (no clicks for its user), does Spark emit the null-padded row
when v.ts + window == W - 1, == W, == W + 1?
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.streaming.join_stream import (
    view_click_left_join_stream,
)

spark = get_spark("boundary-probe")
spark.sparkContext.setLogLevel("ERROR")

T0 = 1_700_000_000_000  # epoch ms anchor
WINDOW = 600_000
DELAY = 10_000

# max view ts and max click ts both = T0 + 2_000_000 -> W = that - 10s
MAXTS = T0 + 2_000_000
W = MAXTS - DELAY

rows_v = [
    (1001, 1, MAXTS),            # anchor: sets max view ts (user 1 has a click)
    (2001, 21, W - WINDOW - 1),  # window closes at W-1  (< W: expect null row)
    (2002, 22, W - WINDOW),      # window closes at W    (boundary)
    (2003, 23, W - WINDOW + 1),  # window closes at W+1  (> W: expect absent)
]
rows_c = [
    (3001, 1, MAXTS),            # anchor: sets max click ts; matches view 1001
]

tmp = tempfile.mkdtemp(prefix="boundary_probe_")
vdir, cdir = os.path.join(tmp, "views"), os.path.join(tmp, "clicks")
for rows, d in ((rows_v, vdir), (rows_c, cdir)):
    spark.createDataFrame(
        [(i, u, t) for i, u, t in rows], "event_id long, user_id long, ts_ms long"
    ).withColumn("ts", F.timestamp_millis("ts_ms")).select(
        "event_id", "user_id", "ts"
    ).write.parquet(d)

views = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(vdir)
clicks = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(cdir)

out = view_click_left_join_stream(views, clicks)
q = (
    out.writeStream.format("memory")
    .queryName("probe")
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(120)
q.stop()
res = spark.table("probe").orderBy("view_event_id").collect()
print("W =", W)
for r in res:
    print(dict(r.asDict()))
null_views = {r.view_event_id for r in res if r.click_event_id is None}
print("null-emitted views:", sorted(null_views))
print("boundary (window==W) emitted:", 2002 in null_views)
print("W-1 emitted:", 2001 in null_views, "| W+1 emitted:", 2003 in null_views)
shutil.rmtree(tmp)
spark.stop()
