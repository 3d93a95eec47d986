"""Adversarial dense-component probe for the round-7 closure redesign
(r6 verdict item 3): boilerplate families form dense, shallow near-dup
components (the BASELINE.md round-2 generator regime -- every doc
gains N near-identical replicas).  Measures:

1. the NEW closure (min-label fixpoint + label self-join,
   dedup.closure_pairs) with pair enumeration ON: wall tracks the
   OUTPUT size (D * R^2/2 pairs), nothing worse;
2. the NEW closure with the component-size cap: wall flat in R, output
   = D counted overflow rows -- the 100 TB configuration;
3. the OLD r6 form (recursive CTE, UNION ALL monotone reach-pair
   expansion) on a single dense CLIQUE component: intermediate rows =
   number of increasing paths (~2^n), i.e. exponential detonation at
   sizes the new form doesn't even notice.

Components are stars (center = min id) -- the shape LSH bucketing
actually produces for a replica family (diameter 2, so the fixpoint
closes in 2 rounds regardless of R)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.dedup import (
    closure_overflow,
    closure_pairs,
)

spark = get_spark()
D = 100  # components

docs_dummy = spark.range(0, 1).select(
    F.col("id").alias("doc_id"), F.lit("x").alias("text")
)


def star_edges(r: int):
    """D star components of size r: center c*STRIDE, members +1..+r-1."""
    stride = 1_000_000
    return (
        spark.range(0, D * (r - 1))
        .select(
            ((F.col("id") / (r - 1)).cast("long") * stride).alias("doc_a"),
            (
                (F.col("id") / (r - 1)).cast("long") * stride
                + (F.col("id") % (r - 1))
                + 1
            ).alias("doc_b"),
        )
    )


print(f"{D} star components, varying size R (new closure):")
for r in (8, 32, 128, 512):
    e = star_edges(r).cache()
    e.count()
    t0 = time.time()
    n_pairs = closure_pairs(docs_dummy, cap=10_000_000, edges=e).count()
    t1 = time.time()
    n_over = closure_overflow(docs_dummy, cap=64, edges=e).count()
    n_capped = closure_pairs(docs_dummy, cap=64, edges=e).count()
    t2 = time.time()
    print(
        f"  R={r:4d}: enumerate-all {t1-t0:5.1f}s -> {n_pairs} pairs | "
        f"cap=64 {t2-t1:5.1f}s -> {n_capped} pairs + {n_over} overflow rows"
    )
    e.unpersist()

print("\nsingle dense CLIQUE component, OLD r6 recursive-CTE form:")
for n in (12, 16, 20):
    clique = (
        spark.range(0, n)
        .alias("l")
        .join(spark.range(0, n).alias("r"), F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("doc_a"), F.col("r.id").alias("doc_b"))
    )
    clique.createOrReplaceTempView("nd_pairs")
    t0 = time.time()
    try:
        cnt = spark.sql(
            """
WITH RECURSIVE reach(doc_a, doc_b) AS (
  SELECT doc_a, doc_b FROM nd_pairs
  UNION ALL
  SELECT r.doc_a, p.doc_b FROM reach r JOIN nd_pairs p ON p.doc_a = r.doc_b
)
SELECT count(*) FROM (SELECT DISTINCT doc_a, doc_b FROM reach)"""
        ).collect()[0][0]
    except Exception as e:
        cnt = f"FAILED ({type(e).__name__}: RECURSION_ROW_LIMIT_EXCEEDED)"
    t1 = time.time()
    t_new0 = time.time()
    new_cnt = closure_pairs(docs_dummy, cap=10_000_000, edges=clique).count()
    t_new1 = time.time()
    print(
        f"  clique n={n}: OLD {t1-t0:6.1f}s ({cnt} pairs, ~2^{n} paths "
        f"materialized) | NEW {t_new1-t_new0:5.1f}s ({new_cnt} pairs)"
    )
