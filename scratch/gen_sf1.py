"""Generate an sf1-scale testdata dir by replicating sf0.1 10x with
replica-consistent key remapping (key' = key*10 + m), so intra-replica
joins stay valid, per-key densities scale like a real 10x corpus, and
every oracle derivation (pure key arithmetic both engines run on the
same parquet) remains self-consistent.  Dimension tables (region,
nation) stay single-copy.  Output: /tmp/sf1/*.parquet -- then

  SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
  python scratch/check.py /tmp/sf1 cdc_parse_binlog_binary,...

The writes are distributed (executors write the parquet); the driver
only plans.  Wall ~1-2 min on local[32].
"""
import os
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
MULT = 10

spark = get_spark("gen-sf1")
spark.sparkContext.setLogLevel("ERROR")

# table -> columns to remap with key*MULT+m (replica-consistent: the
# same transform on both sides of every FK keeps joins valid)
def replicate_events_pyarrow():
    """events.parquet carries the TIMESTAMP(NANOS) ts column whose
    physical type both engines' readers sniff -- preserve it exactly by
    replicating through pyarrow (the table is ~100k rows at sf0.1, so
    a driver-side concat is nothing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    out = os.path.join(DST, "events.parquet")
    if os.path.exists(out):
        print("skip events (exists)")
        return
    eid = t.column("event_id")
    reps = []
    import pyarrow.compute as pc

    for m in range(MULT):
        reps.append(
            t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pc.add(pc.multiply(eid, pa.scalar(MULT, eid.type)), pa.scalar(m, eid.type)),
            )
        )
    pq.write_table(pa.concat_tables(reps), out)
    print(f"wrote events: {sum(r.num_rows for r in reps)} rows")


REMAP = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "part": [],
    "supplier": [],
    "region": None,  # dims: copy single
    "nation": None,
}

os.makedirs(DST, exist_ok=True)
replicate_events_pyarrow()
for table, keys in REMAP.items():
    out = os.path.join(DST, f"{table}.parquet")
    if os.path.exists(out):
        print(f"skip {table} (exists)")
        continue
    base = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
    if keys is None:
        rep = base
    else:
        rep = base.crossJoin(
            spark.range(MULT).select(F.col("id").alias("__m"))
        )
        for k in keys:
            rep = rep.withColumn(k, F.col(k) * MULT + F.col("__m"))
        rep = rep.drop("__m")
    # single FILE per table (check.py's DuckDB views read one file, the
    # driver testdata shape); coalesce(1) is a narrow concatenation
    tmp = out + ".__tmp"
    rep.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), out)
    import shutil

    shutil.rmtree(tmp)
    print(f"wrote {table}: {spark.read.parquet(out).count()} rows")

spark.stop()
