"""Candidate-volume probe for the round-7 PPJoin prunes (verdict r6
item 2): on a corpus with HOT shingles (shared boilerplate across most
documents, doc lengths spanning two orders of magnitude), count the
candidate pairs each similarity join would verify WITH and WITHOUT the
length/positional filters.  The output feeds SCALE.md -- the point is
that at 100 TB the verification join is the expensive stage, so
candidate volume is the number that must stay sub-quadratic."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window, functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.dedup import shingles

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark()

# Hot-shingle corpus: a SMALL shared vocabulary (every shingle's
# posting list spans a large slice of the corpus -- the regime of
# templated/log-like text where k-grams repeat corpus-wide) with doc
# sizes log-spread over 1.5 orders of magnitude.  Rare-first prefix
# ordering cannot save this corpus: there ARE no rare tokens, so every
# doc's prefix is made of hot tokens and the prefix self-join fans out
# across wildly mismatched sizes.  Exactly the pair volume the PPJoin
# length window (t*n_a <= n_b <= n_a/t) and the containment size prune
# (n_dst >= ceil(t*n_src)) exist to kill.  Fully deterministic
# (hash-of-doc_id token draws), derived from the sf documents table's
# doc_id spine.
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
corpus = docs.select(
    "doc_id",
    F.expr(
        """
        concat_ws(' ', transform(
          sequence(1, cast(8 * pow(30.0, pmod(hash(doc_id), 997) / 997.0)
                           as int)),
          i -> concat('w', pmod(hash(doc_id * 100003 + i), 300))
        ))
        """
    ).alias("text"),
)
corpus.cache().count()

# k=1: word-level sets, so with a 300-word vocabulary every shingle is
# hot (posting list ~ a large corpus fraction) -- the adversarial regime
K, T = 1, 0.5
sh = shingles(corpus, K).select("doc_id", "h").cache()
sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
dfreq = sh.groupBy("h").agg(F.count("*").alias("__df"))
w = Window.partitionBy("doc_id").orderBy("__df", "h")
ranked = (
    sh.join(dfreq, "h").join(sizes, "doc_id").withColumn("__rn", F.row_number().over(w))
)
pref = ranked.filter(
    F.col("__rn") <= F.col("n") - F.ceil(F.lit(T) * F.col("n")) + 1
).select("doc_id", "h", "__rn", "n")

t = F.lit(T)
joined = pref.alias("l").join(pref.alias("r"), "h").filter(
    F.col("l.doc_id") < F.col("r.doc_id")
)

# r6 form: prefix-share only
old_pairs = joined.select(
    F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
).distinct().count()

# + length window
len_pairs = joined.filter(
    (F.col("r.n") >= F.ceil(t * F.col("l.n")))
    & (F.col("l.n") >= F.ceil(t * F.col("r.n")))
).select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")).distinct().count()

# + positional filter (the shipped r7 plan)
ub = (
    F.least(F.col("l.__rn") - 1, F.col("r.__rn") - 1)
    + F.least(F.col("l.n") - F.col("l.__rn"), F.col("r.n") - F.col("r.__rn"))
    + 1
)
need = F.ceil(t / (F.lit(1.0) + t) * (F.col("l.n") + F.col("r.n")))
new_pairs = (
    joined.filter(
        (F.col("r.n") >= F.ceil(t * F.col("l.n")))
        & (F.col("l.n") >= F.ceil(t * F.col("r.n")))
    )
    .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    .agg(F.min(ub).alias("__ub"), F.min(need).alias("__need"))
    .filter(F.col("__ub") >= F.col("__need"))
    .count()
)

# containment: src prefix x full target, T=0.8
TC = 0.8
prefc = ranked.filter(
    F.col("__rn") <= F.col("n") - F.ceil(F.lit(TC) * F.col("n")) + 1
).select(F.col("doc_id").alias("src"), "h", "n")
dst = sh.join(sizes, "doc_id").select(
    F.col("doc_id").alias("dst"), "h", F.col("n").alias("nd")
)
cj = prefc.join(dst, "h").filter(F.col("src") != F.col("dst"))
old_cont = cj.select("src", "dst").distinct().count()
new_cont = (
    cj.filter(F.col("nd") >= F.ceil(F.lit(TC) * F.col("n")))
    .select("src", "dst")
    .distinct()
    .count()
)

n_docs = corpus.count()
print(f"docs={n_docs}  (300-word vocab, sizes log-spread ~8..240 tokens)")
print(f"prefix_filter_pairs candidates: prefix-only={old_pairs}  "
      f"+length={len_pairs}  +positional={new_pairs}  "
      f"reduction={1 - new_pairs / max(old_pairs, 1):.1%}")
print(f"containment_pairs candidates:   prefix-only={old_cont}  "
      f"+length={new_cont}  reduction={1 - new_cont / max(old_cont, 1):.1%}")
