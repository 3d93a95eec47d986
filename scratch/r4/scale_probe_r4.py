"""Round-4 scale probes: replicate sf0.1 inputs Nx (keys remapped so
distributions survive) and measure wall scaling for the round-4
operators: misra_gries_heavy_hitters, supplier_part_counts (Q16),
shipping_priority (Q3), gopher_quality_flags, source_reputation.
Sub-linear-or-linear wall + stable semantics is the pass bar."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table

spark = get_spark("scale-probe-r4")  # local[32]
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def rep_docs(mult):
    base = load_table(spark, SF, "documents")
    return (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
            .select((F.col("doc_id") * mult + F.col("__m")).alias("doc_id"),
                    "text", "lang", "source", "n_chars"))


def rep_lineitem(mult):
    base = load_table(spark, SF, "lineitem")
    # orderkeys remapped so the join keys stay distinct; part/supp keys
    # KEPT so per-key densities (the Q16 relationship, Q3 aggregation
    # width per order) scale the way a bigger corpus would
    return (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
            .select((F.col("l_orderkey") * mult + F.col("__m")).alias("l_orderkey"),
                    "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                    "l_linestatus", "l_shipdate"))


def rep_orders(mult):
    base = load_table(spark, SF, "orders")
    return (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
            .select((F.col("o_orderkey") * mult + F.col("__m")).alias("o_orderkey"),
                    "o_custkey", "o_orderstatus", "o_totalprice",
                    "o_orderdate", "o_orderpriority"))


def probe(name, build, mults=(1, 10, 100)):
    for mult in mults:
        df = build(mult)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{name:>24} mult={mult:>3} wall={dt:7.1f}s", flush=True)


from binlog_avro_comparator_spark.operators.analytics import (
    misra_gries_heavy_hitters,
    shipping_priority,
    supplier_part_counts,
)
from binlog_avro_comparator_spark.operators.textstats import (
    gopher_quality_flags,
    source_reputation,
)

part = load_table(spark, SF, "part")
supplier = load_table(spark, SF, "supplier")
customer = load_table(spark, SF, "customer")

import sys as _sys

_MODE = _sys.argv[1] if len(_sys.argv) > 1 else "r4"

if _MODE == "r4":
    probe("mg_heavy_hitters", lambda m: misra_gries_heavy_hitters(rep_docs(m), "lang", 0.25))
    probe("gopher_quality", lambda m: gopher_quality_flags(rep_docs(m)))
    probe("source_reputation", lambda m: source_reputation(rep_docs(m)))
    probe("supplier_part_counts", lambda m: supplier_part_counts(rep_lineitem(m), part, supplier))
    probe("shipping_priority", lambda m: shipping_priority(customer, rep_orders(m), rep_lineitem(m)))

# time-series + snapshot-diff probes: python scratch/scale_probe_r4.py ts
if _MODE == "ts":
    from binlog_avro_comparator_spark.operators.analytics import (
        gap_fill_locf, time_rollup,
    )
    from binlog_avro_comparator_spark.operators.snapshot import (
        apply_changes, snapshot_diff,
    )

    def rep_events(mult):
        base = load_table(spark, SF, "events")
        return (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
                .select((F.col("event_id") * mult + F.col("__m")).alias("event_id"),
                        "ts",
                        (F.col("user_id") * mult + F.col("__m")).alias("user_id"),
                        "event_type", "value", "props"))

    probe("time_rollup", lambda m: time_rollup(rep_events(m)))
    probe("gap_fill_locf", lambda m: gap_fill_locf(rep_events(m)))
    probe("snapshot_diff", lambda m: snapshot_diff(
        apply_changes(rep_events(m).filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))),
        apply_changes(rep_events(m))))

spark.stop()
