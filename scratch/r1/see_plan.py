import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.analytics import q1_pricing_summary
from binlog_avro_comparator_spark.sources import load_table
spark = get_spark("p", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
df = q1_pricing_summary(load_table(spark, "/root/testdata/sf0.001", "lineitem"))
print(df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))[:3000])
spark.stop()
