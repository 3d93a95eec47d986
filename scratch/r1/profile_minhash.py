import sys, time
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.dedup import shingles, minhash_signatures, lsh_candidate_pairs
from binlog_avro_comparator_spark.sources import load_table
spark = get_spark("prof")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, "/root/testdata/sf0.1", "documents")
for name, fn in [("shingles", lambda: shingles(docs).count()),
                 ("signatures", lambda: minhash_signatures(docs).count()),
                 ("lsh_pairs", lambda: lsh_candidate_pairs(docs).count())]:
    t0=time.time(); n=fn(); print(f"{name}: {n} rows {time.time()-t0:.2f}s")
spark.stop()
