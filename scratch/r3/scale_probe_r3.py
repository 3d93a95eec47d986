"""Round-3 scale probes: replicate sf0.1 inputs Nx (keys remapped so
distributions survive) and measure wall scaling for the new operators:
apply_changes, funnel_stages, pack_sequences, remove_repeated_spans,
kmeans_assignments.  Sub-linear-or-linear wall + stable semantics is
the pass bar (the r2 CDC-probe methodology)."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table

spark = get_spark("scale-probe-r3")  # local[32]
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"


def rep_events(mult):
    base = load_table(spark, SF, "events")
    return (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
            .select((F.col("event_id") * mult + F.col("__m")).alias("event_id"),
                    "ts",
                    # spread users too so per-user state stays bounded
                    (F.col("user_id") * mult + F.col("__m")).alias("user_id"),
                    "event_type", "value", "props"))


def rep_docs(mult):
    base = load_table(spark, SF, "documents")
    return (base.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
            .select((F.col("doc_id") * mult + F.col("__m")).alias("doc_id"),
                    "text", "lang", "source", "n_chars"))


def probe(name, build, mults=(1, 10, 100)):
    for mult in mults:
        df = build(mult)
        t0 = time.time()
        # noop writer: full materialization of every output column
        # (count() would let Catalyst prune the actual work)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{name:>22} mult={mult:>3} wall={dt:7.1f}s", flush=True)


from binlog_avro_comparator_spark.operators.snapshot import apply_changes
from binlog_avro_comparator_spark.operators.analytics import funnel_stages
from binlog_avro_comparator_spark.operators.textstats import pack_sequences
from binlog_avro_comparator_spark.operators.dedup import remove_repeated_spans
from binlog_avro_comparator_spark.operators.similarity import kmeans_assignments

probe("apply_changes", lambda m: apply_changes(rep_events(m)))
probe("funnel_stages", lambda m: funnel_stages(rep_events(m)))
probe("pack_sequences", lambda m: pack_sequences(rep_docs(m), n_shards=64))
probe("remove_repeated_spans", lambda m: remove_repeated_spans(rep_docs(m)),
      mults=(1, 10))

emb = load_table(spark, SF, "embeddings")


def rep_emb(mult):
    return (emb.crossJoin(spark.range(mult).select(F.col("id").alias("__m")))
            .select((F.col("vec_id") * mult + F.col("__m")).alias("vec_id"),
                    "embedding"))


probe("kmeans_assignments", lambda m: kmeans_assignments(rep_emb(m), n_iter=3),
      mults=(1, 10))
spark.stop()
