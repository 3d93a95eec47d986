"""Simulate the verification driver: vanilla SparkSession (no tuned
configs, default ANSI mode), import the contract, run entry + spot
queries vs DuckDB oracles."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# deliberately vanilla: no nanosAsLong, no UTC tz override pre-set
spark = SparkSession.builder.master("local[8]").appName("driver-sim").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
print("ansi.enabled =", spark.conf.get("spark.sql.ansi.enabled"))
print("session tz   =", spark.conf.get("spark.sql.session.timeZone"))

import __spark_entry__ as E

# 1. smoke: entry()
df = E.entry(spark)
rows = df.collect()
print("entry rows:", len(rows), "| schema:", [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields])
print("sample finding:", rows[0].asDict() if rows else None)

# 2. contract shape
qs, osql = E.queries(), E.oracle_sql()
print("queries:", len(qs), "oracles:", len(osql), "oracle keys subset:", set(osql) <= set(qs))

# 3. spot-run three queries at sf0.01 under the vanilla session vs duckdb
import duckdb, math
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
import numpy as np
from decimal import Decimal
def norm(v):
    if v is None: return "NULL"
    if isinstance(v,(bool,np.bool_)): return str(bool(v))
    if isinstance(v,(int,np.integer)): return str(int(v))
    if isinstance(v,(float,np.floating)):
        f=float(v)
        if math.isnan(f): return "NULL"
        return str(int(f)) if f.is_integer() else repr(f)
    return str(v)
def canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(norm(v) for v in r) for r in df[cols].itertuples(index=False, name=None))
for name in ["cdc_summary", "cdc_findings", "q1_pricing_summary", "ann_cosine_topk",
             "cdc_merge_upsert", "doc_bm25_topk", "doc_weighted_sample",
             "graph_supplier_pagerank", "embedding_pq_codes", "events_retention_cohorts",
             # round 6
             "cdc_parse_binlog_typed", "cdc_payload_diff_typed",
             "embedding_kmeans_gemm", "cdc_payload_findings_stream",
             # round 7
             "dedup_transitive_closure", "dedup_closure_overflow",
             "cdc_avro_logical_scan", "cdc_rotate_chain",
             "embedding_bitext_margin", "embedding_knn_label_audit",
             "cdc_parse_stream_pyds", "cdc_avro_schema_census",
             "lineitem_range_sort_plan", "corpus_shingle_saturation",
             "corpus_vocab_drift", "corpus_epoch_manifest",
             "corpus_vocab_drift_stream", "cdc_consistency_watermark",
             "lineitem_zorder_skipping", "corpus_contamination_by_source",
             "ann_ivf_list_balance"]:
    sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
    ddf = con.sql(osql[name]).df()
    match = canon(sdf) == canon(ddf)
    print(f"{name}: spark={len(sdf)} duck={len(ddf)} value-match={match}")

# 4. probe: entry() twice (driver may re-invoke); stable schema
df2 = E.entry(spark)
print("entry re-run rows:", df2.count(), "schema stable:", df2.schema == df.schema)
spark.stop()
