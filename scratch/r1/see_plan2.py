import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators import compare as C
from binlog_avro_comparator_spark.fixtures import derive_avro_rows, derive_binlog_events
from binlog_avro_comparator_spark.sources import load_table
spark = get_spark("p", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
ev = load_table(spark, "/root/testdata/sf0.001", "events")
bp = C.prepare_binlog(derive_binlog_events(ev))
ap = C.prepare_avro(derive_avro_rows(ev))
plan = C.findings_onepass(bp, ap)._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
import re
head = plan.split("\n\n")[0]
print(head)
print("joins:", [l.strip() for l in plan.splitlines() if "Join" in l][:5])
spark.stop()
