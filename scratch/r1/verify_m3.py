"""Drive the M3 surfaces as a consumer: run_comparison on real fixture
dirs, JSONL entry point, streaming query, multimodal, and the 4 new
driver-contract queries under a VANILLA SparkSession + DuckDB oracles."""
import json, os, sys, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").appName("m3-verify").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from binlog_avro_comparator_spark.pipeline import run_comparison, format_report
from binlog_avro_comparator_spark.streaming import stream_avro_jsonl, streaming_findings
from binlog_avro_comparator_spark.operators.multimodal import MEDIA_SCHEMA, image_features

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
    f.write(json.dumps(rec(200, 1748779209000, ct="update"))+"\n")  # wrong ct for DELETE

# 1. text-entry run_comparison + report
res = run_comparison(spark, binlog_text_dir=f"{d}/text", avro_jsonl=f"{d}/avro/rows.json")
print(format_report(res))
print("findings:", sorted((r.kind, r.binlog_position) for r in res.findings.collect()))

# 2. JSONL entry with materialization roundtrip
os.makedirs(f"{d}/bj")
with open(f"{d}/bj/binlog.json","w") as f:
    f.write(json.dumps({"event_type":"WriteRowsEventV2","timestamp":"2025-06-01T12:00:00Z",
        "log_position":100,"binlog_file":"mysql-bin.000001","schema":"s","table":"t"})+"\n")
res2 = run_comparison(spark, binlog_jsonl=f"{d}/bj/binlog.json", avro_jsonl=f"{d}/avro/rows.json")
s2 = res2.summary.collect()[0]
print("jsonl-entry summary:", tuple(s2))

# 3. streaming with availableNow, then add a second file and re-trigger (incremental)
from binlog_avro_comparator_spark.operators.parse import parse_binlog_text
from binlog_avro_comparator_spark.sources.binlog_text import read_parser_text
binlog = parse_binlog_text(read_parser_text(spark, f"{d}/text"))
ck = f"{d}/ckpt"
def run_batch(qname):
    out = streaming_findings(binlog, stream_avro_jsonl(spark, f"{d}/avro"))
    q = (out.writeStream.format("memory").queryName(qname)
         .trigger(availableNow=True).option("checkpointLocation", ck).start())
    q.awaitTermination(120)
    return sorted((r.kind, r.binlog_position) for r in spark.sql(f"SELECT * FROM {qname}").collect())
print("stream batch1:", run_batch("sf1"))
with open(f"{d}/avro/rows2.json","w") as f:
    f.write(json.dumps(rec(999, 1748779200000))+"\n")  # avro-only arrives later
print("stream batch2 (incremental):", run_batch("sf2"))

# 4. the four new registry queries under the vanilla session vs oracles
import duckdb, math
import numpy as np
import __spark_entry__ as E
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
def norm(v):
    if v is None: return "NULL"
    if isinstance(v,(bool,np.bool_)): return str(bool(v))
    if isinstance(v,(int,np.integer)): return str(int(v))
    if isinstance(v,(float,np.floating)):
        fv=float(v)
        if math.isnan(fv): return "NULL"
        return str(int(fv)) if fv.is_integer() else repr(fv)
    return str(v)
def canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(norm(v) for v in r) for r in df[cols].itertuples(index=False, name=None))
qs, osql = E.queries(), E.oracle_sql()
for name in ["cdc_parse_binlog_text","simhash_fingerprints","simhash_near_pairs","embedding_near_dup"]:
    sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    ddf = con.sql(osql[name]).df()
    print(f"{name}: spark={len(sdf)} duck={len(ddf)} match={canon(sdf)==canon(ddf)}")

# probe: multimodal with empty batch (no image rows at all)
media = spark.createDataFrame([(1,"video",b"xx",("u","m",2))], MEDIA_SCHEMA)
print("probe empty-image-partition rows:", image_features(media).count())
spark.stop()
