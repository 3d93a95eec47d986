"""sf1.0 endurance probe for the heaviest pair-join tier (r6 verdict
item 8): wall + CANDIDATE counts for the four exact/near-dup pair
joins at sf0.01 / sf0.1 / sf1 (the 10x-replicated /tmp/sf1 corpus from
scratch/gen_sf1.py).  Candidate volume -- the rows the verification
stage must touch -- is the number that decides 100 TB viability, so
each operator's internal candidate stage is re-derived here exactly as
the operator builds it (post round-7 PPJoin prunes)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.dedup import (
    containment_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    prefix_filter_pairs,
    shingles,
)

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

DIRS = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/sf1"]


def cand_counts(docs, k=3):
    """Candidate-stage row counts, re-derived per operator plan."""
    sh = shingles(docs, k).select("doc_id", "h").cache()
    sh.count()
    dfreq = sh.groupBy("h").agg(F.count("*").alias("__df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # jaccard: rare-shingle (df<=10) self-join
    rare = sh.join(dfreq.filter(F.col("__df") <= 10).select("h"), "h")
    jac = (
        rare.alias("l").join(rare.alias("r"), "h")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id"), F.col("r.doc_id")).distinct().count()
    )
    # prefix filter (t=0.5) with the r7 length+positional prunes
    T = 0.5
    w = Window.partitionBy("doc_id").orderBy("__df", "h")
    ranked = sh.join(dfreq, "h").join(sizes, "doc_id").withColumn(
        "__rn", F.row_number().over(w)
    )
    pref = ranked.filter(
        F.col("__rn") <= F.col("n") - F.ceil(F.lit(T) * F.col("n")) + 1
    ).select("doc_id", "h", "__rn", "n")
    t = F.lit(T)
    ub = (
        F.least(F.col("l.__rn") - 1, F.col("r.__rn") - 1)
        + F.least(F.col("l.n") - F.col("l.__rn"), F.col("r.n") - F.col("r.__rn"))
        + 1
    )
    need = F.ceil(t / (F.lit(1.0) + t) * (F.col("l.n") + F.col("r.n")))
    ppj = (
        pref.alias("l").join(pref.alias("r"), "h")
        .filter(
            (F.col("l.doc_id") < F.col("r.doc_id"))
            & (F.col("r.n") >= F.ceil(t * F.col("l.n")))
            & (F.col("l.n") >= F.ceil(t * F.col("r.n")))
        )
        .groupBy(F.col("l.doc_id"), F.col("r.doc_id"))
        .agg(F.min(ub).alias("u"), F.min(need).alias("m"))
        .filter(F.col("u") >= F.col("m"))
        .count()
    )
    # containment (t=0.8) with the r7 size prune
    TC = 0.8
    prefc = ranked.filter(
        F.col("__rn") <= F.col("n") - F.ceil(F.lit(TC) * F.col("n")) + 1
    ).select(F.col("doc_id").alias("src"), "h", "n")
    dst = sh.join(sizes, "doc_id").select(
        F.col("doc_id").alias("dst"), "h", F.col("n").alias("nd")
    )
    cont = (
        prefc.join(dst, "h")
        .filter(
            (F.col("src") != F.col("dst"))
            & (F.col("nd") >= F.ceil(F.lit(TC) * F.col("n")))
        )
        .select("src", "dst").distinct().count()
    )
    sh.unpersist()
    return jac, ppj, cont


for d in DIRS:
    docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    lsh_cand = lsh_candidate_pairs(docs).count()
    jac_c, ppj_c, cont_c = cand_counts(docs)
    walls = {}
    for name, fn in (
        ("minhash_lsh_pairs", lsh_candidate_pairs),
        ("ngram_jaccard_pairs", jaccard_pairs),
        ("dedup_prefix_filter_pairs", prefix_filter_pairs),
        ("dedup_containment_pairs", containment_pairs),
    ):
        t0 = time.time()
        out = fn(docs).count()
        walls[name] = (time.time() - t0, out)
    print(f"\n=== {d}: {n} docs ===")
    print(f"  candidates: lsh={lsh_cand} jaccard={jac_c} "
          f"prefix_filter={ppj_c} containment={cont_c}")
    for k, (w, o) in walls.items():
        print(f"  {k:28s} wall={w:7.1f}s out={o}")
