"""Vanilla-session drive: new queries vs oracles, SQL API as an analyst
would use it, tie-break determinism probe (duplicate keys with SAME
line_no under different partitionings must dedup identically)."""
import math, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = SparkSession.builder.master("local[8]").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import duckdb
import numpy as np
import __spark_entry__ as E
con = duckdb.connect()
for t in "events documents".split():
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
for name in ["tfidf_top_terms", "distinct_users_per_type", "ngram_jaccard_pairs"]:
    sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    ddf = con.sql(osql[name]).df()
    print(f"{name}: spark={len(sdf)} duck={len(ddf)} match={canon(sdf)==canon(ddf)}")

# SQL API as an analyst: register views, run raw SQL
from binlog_avro_comparator_spark.plans.sql_api import register_cdc_views, SUMMARY_SQL, FINDINGS_SQL
register_cdc_views(spark, "/root/testdata/sf0.01")
print("SQL summary:", tuple(spark.sql(SUMMARY_SQL).collect()[0]))
print("SQL findings kinds:", spark.sql(f"SELECT kind, count(*) n FROM ({FINDINGS_SQL}) GROUP BY kind ORDER BY kind").collect())

# tie-break determinism probe: same key, same line_no, different content,
# two different partitionings -> identical winner
from binlog_avro_comparator_spark.operators import compare as C
from tests.test_compare_golden import BINLOG_SCHEMA
rows = [
    ("WriteRowsEventV2","2025-06-01T12:00:00Z",None,100,"db","t","gA","f1",5),
    ("WriteRowsEventV2","2025-06-01T12:00:00Z",None,100,"db","t","gB","f1",5),
    ("WriteRowsEventV2","2025-06-01T12:00:00Z",None,100,"db","t","gC","f1",5),
]
winners = set()
for nparts in (1, 3, 7):
    bp = C.prepare_binlog(spark.createDataFrame(rows, BINLOG_SCHEMA).repartition(nparts))
    winners.add(bp.collect()[0].gtid_next)
print("tie-break winners across partitionings:", winners, "deterministic:", len(winners)==1)
spark.stop()
