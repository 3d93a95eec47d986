"""Round-5 (continued) scale probes for the corpus-analysis additions:

- shingle_novelty at 1x vs 10x corpus (replicated docs: every shingle's
  df rises 10x -- the worst case for the first-holder join's hot keys)
- inverted_index at 1x vs 10x (term df scales, head-posting agg width
  scales)
- term_pmi at 1x vs 10x (pair volume should scale ~linearly: vocab is
  capped, docs 10x)
- pagerank at 1x vs 10x customers (edge count 10x, supplier side fixed
  -- supplier in-degree 10x, the hot-node case)
- retention_cohorts / event_type_transitions at 10x events

Pass bar: wall scales <= ~linearly; no driver memory growth.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table
from binlog_avro_comparator_spark.functions.caching import cache_scope

spark = get_spark("scale-probe-r5b")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def rep_docs(mult):
    base = load_table(spark, SF, "documents")
    return (
        base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
        .select(
            (F.col("doc_id") * mult + F.col("__m")).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )


def rep_events(mult):
    base = load_table(spark, SF, "events")
    return (
        base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
        .select(
            (F.col("event_id") * mult + F.col("__m")).alias("event_id"),
            "ts",
            (F.col("user_id") * mult + F.col("__m")).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )


def rep_purchases(mult):
    """10x orders (distinct customers), SAME suppliers: supplier
    in-degree grows 10x -- the hot-key direction."""
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    o = (
        o.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
        .select(
            (F.col("o_orderkey") * mult + F.col("__m")).alias("o_orderkey"),
            (F.col("o_custkey") * mult + F.col("__m")).alias("o_custkey"),
        )
    )
    li = (
        li.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
        .select(
            (F.col("l_orderkey") * mult + F.col("__m")).alias("l_orderkey"),
            "l_suppkey",
        )
    )
    return o, li


def timed(label, df):
    t0 = time.time()
    n = df.count()
    print(f"{label}: {n} rows in {time.time() - t0:.1f}s", flush=True)


from binlog_avro_comparator_spark.operators.dedup import shingle_novelty
from binlog_avro_comparator_spark.operators.textstats import inverted_index, term_pmi
from binlog_avro_comparator_spark.operators.analytics import (
    retention_cohorts,
    event_type_transitions,
)
from binlog_avro_comparator_spark.operators.graph import purchase_edges, pagerank

for mult in (1, 10):
    with cache_scope():
        print(f"--- mult={mult}")
        timed(f"novelty x{mult}", shingle_novelty(rep_docs(mult)))
        timed(f"inverted_index x{mult}", inverted_index(rep_docs(mult)))
        timed(f"term_pmi x{mult}", term_pmi(rep_docs(mult)))
        timed(f"retention x{mult}", retention_cohorts(rep_events(mult)))
        timed(f"transitions x{mult}", event_type_transitions(rep_events(mult)))
        o, li = rep_purchases(mult)
        timed(f"pagerank x{mult}", pagerank(purchase_edges(o, li)))


# -- second wave: merge / bm25 / weighted sample ------------------------
from binlog_avro_comparator_spark.operators.snapshot import (
    apply_changes,
    merge_upsert,
)
from binlog_avro_comparator_spark.operators.textstats import (
    bm25_topk,
    weighted_sample_topk,
)

if "--wave2" in sys.argv:
    for mult in (1, 10):
        with cache_scope():
            print(f"--- wave2 mult={mult}")
            ev = rep_events(mult)
            cutoff = F.lit("2024-01-16").cast("timestamp")
            tgt = apply_changes(ev.filter(F.col("ts") < cutoff))
            delta = apply_changes(
                ev.filter(F.col("ts") >= cutoff), keep_deletes=True
            ).withColumn("__d", F.col("last_op") == "DELETE")
            timed(
                f"merge_upsert x{mult}",
                merge_upsert(tgt, delta, ["user_id"], delete_col="__d"),
            )
            timed(f"bm25 x{mult}", bm25_topk(rep_docs(mult)))
            timed(f"weighted_sample x{mult}", weighted_sample_topk(rep_docs(mult)))
