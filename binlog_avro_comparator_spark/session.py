"""SparkSession builder.

Defaults are tuned for the local[32] test box but every setting is the
one you'd also want on a 1000-executor cluster:

- AQE on (runtime join-strategy changes, skew-join splitting, partition
  coalescing) -- at 100 TB the shuffle sizes are unknowable up front.
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant.
- UTC session timezone so timestamp arithmetic is deployment-independent.
- ``legacy.parquet.nanosAsLong`` because the test corpus stores
  TIMESTAMP(NANOS) which Spark's vectorized reader otherwise rejects;
  sources.tables re-materializes those columns as proper timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "binlog_avro_comparator_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    # local mode = one JVM: driver memory is the only memory knob that
    # matters (default 1g OOMs multi-million-row shuffles; oversizing to
    # ~box RAM measurably hurts small-job latency via GC sizing -- 16g
    # benched best for both the sf0.1 suite and a 10M-row diff)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable configs we rely on to a session we did
    not create (the driver hands us one).  Static configs (like
    nanosAsLong) cannot be set here; sources.tables handles the nanos
    case with an explicit read schema instead."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
