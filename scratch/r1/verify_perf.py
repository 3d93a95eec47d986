"""Drive the refactored surfaces under a VANILLA session: one-pass
findings/summary via the driver contract + run_comparison, restructured
LSH queries vs oracles, stateful streaming sessionization, skew utils."""
import json, math, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F, types as T
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import duckdb
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
for name in ["cdc_findings","cdc_summary","minhash_lsh_pairs","simhash_near_pairs","ann_cosine_topk_lsh"]:
    t0=time.time()
    sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    ddf = con.sql(osql[name]).df()
    print(f"{name}: spark={len(sdf)} duck={len(ddf)} match={canon(sdf)==canon(ddf)} ({time.time()-t0:.1f}s)")

# entry() still runs under the vanilla session after the refactor
print("entry rows:", E.entry(spark).count())

# stateful streaming sessionization through the public API, two batches
from binlog_avro_comparator_spark.streaming import sessionize_stream
d = tempfile.mkdtemp(); os.makedirs(f"{d}/src")
base = 1_700_000_000_000_000
with open(f"{d}/src/b0.json","w") as f:
    for uid, us in [(1, base), (1, base+60_000_000), (1, base+45*60_000_000), (2, base)]:
        f.write(json.dumps({"user_id": uid, "ts_us": us})+"\n")
schema = T.StructType([T.StructField("user_id",T.LongType()),T.StructField("ts_us",T.LongType())])
stream = (spark.readStream.schema(schema).json(f"{d}/src")
          .withColumn("ts", F.timestamp_micros(F.col("ts_us"))))
out = sessionize_stream(stream)
q = (out.writeStream.format("json").option("path", f"{d}/out")
     .trigger(availableNow=True).option("checkpointLocation", f"{d}/ck").start())
q.awaitTermination(180)
def sessions():
    try:
        return sorted((int(r.user_id), int(r.n_events)) for r in spark.read.json(f"{d}/out").collect())
    except Exception:
        return []
print("closed sessions after batch1:", sessions())
# batch 2: a late event for user 2 beyond the gap closes user 2's session
with open(f"{d}/src/b1.json","w") as f:
    f.write(json.dumps({"user_id": 2, "ts_us": base+90*60_000_000})+"\n")
q = (out.writeStream.format("json").option("path", f"{d}/out")
     .trigger(availableNow=True).option("checkpointLocation", f"{d}/ck").start())
q.awaitTermination(180)
print("closed sessions after batch2:", sessions())

# skew utils through public API
from binlog_avro_comparator_spark.functions import salted_aggregate, salted_broadcastable_join
df = spark.range(0, 50_000).select((F.when(F.col("id")%100==0, 0).otherwise(F.col("id")%5)).alias("k"), (F.col("id")%11).alias("v"))
plain = {r.k:(r.s,r.c) for r in df.groupBy("k").agg(F.sum("v").alias("s"),F.count("v").alias("c")).collect()}
salted = {r.k:(r.s,r.c) for r in salted_aggregate(df,["k"],{"s":("v","sum"),"c":("v","count")},n_salts=8).collect()}
print("salted == plain:", plain == salted)
try:
    salted_broadcastable_join(df, df, on=["k"], max_small_rows=10)
except ValueError as e:
    print("broadcast guard:", str(e)[:60])
spark.stop()
