"""Vanilla-session drive of the numpy ANN path: vs DuckDB oracle AND
row-identical to the fold-based variant; probes: empty partitions
(repartition 64 >> rows), n_queries larger than the corpus."""
import math, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import numpy as np
import __spark_entry__ as E
from binlog_avro_comparator_spark.operators.similarity import cosine_topk, cosine_topk_pandas
from binlog_avro_comparator_spark.sources import load_table
con = duckdb.connect()
con.sql("CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.01/embeddings.parquet'")
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
sdf = qs["ann_cosine_topk_pandas"](spark, "/root/testdata/sf0.01").toPandas()
ddf = con.sql(osql["ann_cosine_topk_pandas"]).df()
print("vs oracle:", len(sdf), len(ddf), canon(sdf)==canon(ddf))
emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
a = canon(cosine_topk(emb).toPandas()); b = canon(cosine_topk_pandas(emb).toPandas())
print("pandas == fold:", a == b)
# probe: many empty partitions
sparse = emb.repartition(64)
print("64-partition run rows:", cosine_topk_pandas(sparse).count())
# probe: n_queries > corpus size
small = emb.filter(F.col("vec_id") < 10)
out = cosine_topk_pandas(small, n_queries=50, k=3)
print("n_queries>corpus rows:", out.count(), "(expect 10 queries x 3 =", 30, ")")
spark.stop()
