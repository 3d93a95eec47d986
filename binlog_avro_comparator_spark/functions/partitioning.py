"""Partition-balancing helpers shared by the corpus operators.

``spread_small_scan`` exists because the local test corpora arrive as
ONE parquet file -> one input split -> one task, which would serialize
all CPU-heavy per-row work (shingling, hashing) onto a single core.

The guard matters at scale: ``repartition()`` is a full shuffle of
every row, so applying it unconditionally to an input that is already
well-partitioned (a 100 TB corpus scan has tens of thousands of file
splits) would double the pipeline's I/O for zero benefit.  We only pay
the shuffle when the scan's own partition count is materially below the
cluster's parallelism -- i.e. exactly the single-file / few-file case
the helper exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's default
    parallelism, but ONLY if its current partition count is below
    ``min_fraction`` of that parallelism.  Well-partitioned inputs pass
    through untouched (no shuffle added to the plan)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    threshold = max(1, int(target * min_fraction))
    if df.rdd.getNumPartitions() >= threshold:
        return df
    return df.repartition(target)
