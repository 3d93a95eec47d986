"""Profile the events_left_join_stream drain at sf0.1: micro-batch
count, per-batch durations, state-store metrics -- where do the ~7 s go?"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans.registry import ensure_session_conf
from binlog_avro_comparator_spark.sources.tables import _EVENTS_SCHEMA, events_ts_column
from binlog_avro_comparator_spark.streaming.join_stream import (
    view_click_left_join_stream,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("leftjoin-profile")
spark.sparkContext.setLogLevel("ERROR")
ensure_session_conf(spark)


def side(event_type):
    return (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF)
        .withColumn("ts", events_ts_column(SF))
        .filter(F.col("event_type") == event_type)
        .select("event_id", "user_id", "ts")
    )


for trial in range(2):
    t0 = time.time()
    out = view_click_left_join_stream(side("view"), side("click"))
    q = (
        out.writeStream.format("memory")
        .queryName(f"prof_{trial}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    wall = time.time() - t0
    n = spark.table(f"prof_{trial}").count()
    print(f"--- trial {trial}: wall={wall:.2f}s rows={n}")
    for p in q.recentProgress:
        d = p["durationMs"]
        so = p.get("stateOperators") or [{}]
        print(
            json.dumps(
                {
                    "batchId": p["batchId"],
                    "numInputRows": p["numInputRows"],
                    "durationMs": d,
                    "stateRows": so[0].get("numRowsTotal"),
                    "stateMemUsed": so[0].get("memoryUsedBytes"),
                    "commitTimeMs": so[0].get("commitTimeMs"),
                }
            )
        )
spark.stop()
