"""Native Avro source (SURVEY.md S5/S6).

``spark.read.format("avro")`` replaces the reference's per-file
`java -jar avro-tools tojson` loop (avro_to_json.sh:52-70) with one
vectorized scan, and dissolves ["null", X] unions into plain nullable
columns -- the wrapper layer (compare_timestamps.go:26-40) vanishes.

The external spark-avro module is not bundled in every PySpark
distribution (it isn't in this container), so the reader probes for it
and raises an actionable error when absent.  The JSONL surface
(sources.jsonl) is feature-complete regardless -- it is also the layer
the reference's own comparator consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .jsonl import unwrap_avro  # re-export convenience


def avro_available(spark: SparkSession) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent-probe-path.avro")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "Failed to find data source: avro" in msg:
            return False
        return True  # datasource resolved; the path error proves it loaded
    return True


def read_avro_dir(spark: SparkSession, path: str) -> DataFrame:
    """S5: one scan over a directory of .avro files; flat probe shape.

    Native avro columns are already unwrapped, so the flattening is a
    plain nested projection (no union handling needed).
    """
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro datasource not on the classpath. Start the session "
            "with --packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "or ingest via the union-wrapped JSONL path "
            "(sources.jsonl.read_avro_jsonl), which is feature-complete."
        )
    df = spark.read.format("avro").load(f"{path}/*.avro")
    sm = "source_metadata"
    return df.select(
        "source_timestamp",
        F.col(f"{sm}.database").alias("database"),
        F.col(f"{sm}.table").alias("table"),
        F.coalesce(F.col(f"{sm}.change_type"), F.lit("")).alias("change_type"),
        F.coalesce(F.col(f"{sm}.gtid"), F.lit("")).alias("gtid"),
        F.coalesce(F.col(f"{sm}.binlog_file"), F.lit("")).alias("binlog_file"),
        F.coalesce(F.col(f"{sm}.binlog_position"), F.lit(0)).alias("binlog_position"),
        F.coalesce(F.col(f"{sm}.is_deleted"), F.lit(False)).alias("is_deleted"),
        F.col(f"{sm}.primary_keys").alias("primary_keys"),
    )
