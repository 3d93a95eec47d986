"""Incremental streaming probe: file sink + shared checkpoint across
two availableNow triggers; second trigger must process ONLY new files."""
import json, os, sys, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from binlog_avro_comparator_spark.streaming import stream_avro_jsonl, streaming_findings
from binlog_avro_comparator_spark.operators.parse import parse_binlog_text
from binlog_avro_comparator_spark.sources.binlog_text import read_parser_text

d = tempfile.mkdtemp()
os.makedirs(f"{d}/text"); os.makedirs(f"{d}/avro")
open(f"{d}/text/mysql-bin.000001","w").write(
"=== WriteRowsEventV2 ===\nDate: 2025-06-01 12:00:00\nLog position: 100\nSchema: s\nTable: t\n--\n"
"=== DeleteRowsEventV2 ===\nDate: 2025-06-01 12:00:09\nLog position: 200\nSchema: s\nTable: t\n")
def rec(pos, ms, ct="INSERT"):
    return {"source_timestamp": ms, "source_metadata": {"database":"s","table":"t",
        "change_type":{"string":ct},"gtid":None,"binlog_file":{"string":"mysql-bin.000001"},
        "binlog_position":{"long":pos},"is_deleted":{"boolean":False},"primary_keys":[]}}
with open(f"{d}/avro/rows.json","w") as f:
    f.write(json.dumps(rec(100, 1748779200050))+"\n")
    f.write(json.dumps(rec(200, 1748779209000, ct="update"))+"\n")

binlog = parse_binlog_text(read_parser_text(spark, f"{d}/text"))
out_dir, ck = f"{d}/out", f"{d}/ckpt"
def trigger():
    out = streaming_findings(binlog, stream_avro_jsonl(spark, f"{d}/avro"))
    q = (out.writeStream.format("json").option("path", out_dir)
         .trigger(availableNow=True).option("checkpointLocation", ck).start())
    q.awaitTermination(120)
    rows = spark.read.json(out_dir).collect()
    return sorted((r.kind, int(r.binlog_position)) for r in rows)
print("after trigger1:", trigger())
with open(f"{d}/avro/rows2.json","w") as f:
    f.write(json.dumps(rec(999, 1748779200000))+"\n")
print("after trigger2:", trigger())
spark.stop()
