import sys, time
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.dedup import simhash_near_pairs
from binlog_avro_comparator_spark.sources import load_table
spark = get_spark("prof")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/testdata/sf0.1", "documents")
simhash_near_pairs(docs).count()
for i in range(3):
    t0=time.time(); n=simhash_near_pairs(docs).count(); print(f"warm{i}: {n} rows {time.time()-t0:.2f}s")
spark.stop()
