import sys, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import numpy as np
import __spark_entry__ as E
from binlog_avro_comparator_spark.operators.multimodal import MEDIA_SCHEMA, image_features
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
media = spark.createDataFrame([(1,"video",b"xx",("u","m",2))], MEDIA_SCHEMA)
print("probe no-image-rows -> features rows:", image_features(media).count())
spark.stop()
