"""E1-equivalent end-to-end drive: raw parser text + union-wrapped avro
JSONL -> full consistency diff, through the public package API only."""
import json, sys, tempfile, os
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources.binlog_text import read_parser_text
from binlog_avro_comparator_spark.sources.jsonl import read_avro_jsonl, unwrap_avro, corrupt_count
from binlog_avro_comparator_spark.sources.avro import read_avro_dir
from binlog_avro_comparator_spark.operators.parse import parse_binlog_text
from binlog_avro_comparator_spark.operators import (
    prepare_binlog, prepare_avro, matched_pairs, avro_only, binlog_only, findings, summary)

spark = get_spark("verify-ingestion", cpus=4)
spark.sparkContext.setLogLevel("ERROR")

d = tempfile.mkdtemp()
os.makedirs(f"{d}/binlog_text")
# two binlog files, realistic go-binlogparser-ish dump
open(f"{d}/binlog_text/mysql-bin.000001", "w").write("""=== WriteRowsEventV2 ===
Date: 2025-06-01 12:00:00
Log position: 1234
Schema: shop
Table: orders
Immediate commmit timestamp: 1748779200123456 (2025-06-01T12:00:00.123456789Z)
--
=== XIDEvent ===
Date: 2025-06-01 12:00:00
Log position: 1290
XID: 42
""")
open(f"{d}/binlog_text/mysql-bin.000002", "w").write("""=== DeleteRowsEventV2 ===
Date: 2025-06-02 08:30:00
Log position: 4
Schema: shop
Table: orders
--
=== UpdateRowsEventV2 ===
Date: 2025-06-02 08:30:05
Log position: 400
Schema: shop
Table: orders
""")
# avro side: one clean match, one ts-mismatch, one orphan, one malformed line
avro = [
 {"source_timestamp": 1748779200150, "source_metadata": {"database":"shop","table":"orders",
   "change_type":{"string":"INSERT"},"gtid":None,"binlog_file":{"string":"mysql-bin.000001"},
   "binlog_position":{"long":1234},"is_deleted":{"boolean":False},"primary_keys":["id"]}},
 {"source_timestamp": 1748851805000+500, "source_metadata": {"database":"shop","table":"orders",
   "change_type":{"string":"update"},"gtid":None,"binlog_file":{"string":"mysql-bin.000002"},
   "binlog_position":{"long":400},"is_deleted":{"boolean":False},"primary_keys":["id"]}},
 {"source_timestamp": 1, "source_metadata": {"database":"shop","table":"x",
   "change_type":{"string":"INSERT"},"gtid":None,"binlog_file":{"string":"mysql-bin.000009"},
   "binlog_position":{"long":77},"is_deleted":{"boolean":False},"primary_keys":[]}},
]
with open(f"{d}/avro_rows.json","w") as f:
    for r in avro: f.write(json.dumps(r)+"\n")
    f.write("garbage not json\n")

lines = read_parser_text(spark, f"{d}/binlog_text")
binlog = parse_binlog_text(lines)
print("parsed events:")
for r in binlog.select("binlog_file","line_no","event_type","log_position","timestamp","immediate_commmit_timestamp").orderBy("binlog_file","line_no").collect():
    print("  ", tuple(r))

araw = read_avro_jsonl(spark, f"{d}/avro_rows.json")
cc = corrupt_count(araw).collect()[0]
print("avro lines:", cc.total_lines, "corrupt:", cc.corrupt_lines)
aflat = unwrap_avro(araw.filter("_corrupt_record is null"))

bp, ap = prepare_binlog(binlog), prepare_avro(aflat)
m = matched_pairs(bp, ap)
ao, bo = avro_only(bp, ap), binlog_only(bp, ap)
print("findings:")
for r in findings(m, ao, bo).orderBy("kind","binlog_position").collect():
    print("  ", tuple(r))
print("summary:", tuple(summary(aflat, bp, m, ao, bo).collect()[0]))

# probe 1: gated native-avro reader gives actionable error
try:
    read_avro_dir(spark, d)
    print("PROBE avro-native: NO ERROR (unexpected)")
except NotImplementedError as e:
    print("PROBE avro-native error:", str(e)[:90])

# probe 2: empty text dir
os.makedirs(f"{d}/empty")
open(f"{d}/empty/mysql-bin.000001","w").write("")
n = parse_binlog_text(read_parser_text(spark, f"{d}/empty")).count()
print("PROBE empty file -> events:", n)

# probe 3: CRLF line endings + trailing whitespace
open(f"{d}/binlog_text2","w").close(); os.remove(f"{d}/binlog_text2")
os.makedirs(f"{d}/crlf")
open(f"{d}/crlf/mysql-bin.000003","w").write("=== WriteRowsEventV2 ===\r\nDate: 2025-06-01 12:00:00\r\nLog position: 555\r\n")
r = parse_binlog_text(read_parser_text(spark, f"{d}/crlf")).collect()
print("PROBE crlf:", [(x.event_type, x.log_position, x.timestamp) for x in r])
spark.stop()
