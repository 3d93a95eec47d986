import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans import registry
spark = get_spark("explain", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
name = sys.argv[1]
df = qs[name](spark, "/root/testdata/sf0.1")
plan = df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
print(plan[:12000])
spark.stop()
