import math, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import numpy as np
import __spark_entry__ as E
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
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
for name in ["minhash_lsh_pairs", "doc_fingerprint", "simhash_near_pairs"]:
    sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    ddf = con.sql(osql[name]).df()
    print(f"{name}: match={canon(sdf)==canon(ddf)} ({len(sdf)} rows)")
# probe: the spread actually happens -- shingle stage partition count
from binlog_avro_comparator_spark.operators.dedup import shingles
from binlog_avro_comparator_spark.sources import load_table
docs = load_table(spark, "/root/testdata/sf0.01", "documents")
print("scan partitions:", docs.rdd.getNumPartitions(), "-> shingle partitions:", shingles(docs).rdd.getNumPartitions())
spark.stop()
