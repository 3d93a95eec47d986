"""r8 endurance probe (verdict item 6): the bucketed candidate tier of
the two embedding audits at sf0.1 (2k vectors) vs sf1 (20k vectors).

What it must show:
- candidate growth is ~LINEAR in corpus size when planes are sized by
  planes_for_corpus (the LSH geometry contract), never quadratic;
- walls grow ~linearly too;
- the plan has NO driver-side corpus collect (we assert no python
  broadcast of the embedding matrix by checking the plan contains no
  mapInPandas stage on the candidate path).

Run: python scratch/r8/probe_embed_audit_sf1.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binlog_avro_comparator_spark.operators.similarity import (
    bitext_margin_pairs,
    hyperplane_candidates,
    knn_label_audit,
)
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table

spark = get_spark("probe-embed-audit", cpus=32)
spark.sparkContext.setLogLevel("ERROR")

for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1"):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cand = hyperplane_candidates(
        emb, corpus_rows=n, target_bucket_rows=256, n_tables=2
    )
    t0 = time.time()
    n_cand = cand.count()
    t_cand = time.time() - t0

    t0 = time.time()
    audit = knn_label_audit(emb, candidates=cand)
    plan = audit._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, "candidate path must not GEMM-collect"
    n_audit = audit.count()
    t_audit = time.time() - t0

    bt_cand = cand.select(
        F.col("a_id").alias("src_id"), F.col("b_id").alias("dst_id")
    )
    t0 = time.time()
    mined = bitext_margin_pairs(
        emb, src_label=0, dst_label=1, candidates=bt_cand
    )
    plan = mined._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    n_mined = mined.count()
    t_bitext = time.time() - t0

    print(
        f"{sf_dir}: n={n} candidates={n_cand} ({t_cand:.1f}s, "
        f"{n_cand / n:.0f}/row) knn_audit={n_audit} rows ({t_audit:.1f}s) "
        f"bitext={n_mined} rows ({t_bitext:.1f}s)"
    )

spark.stop()
