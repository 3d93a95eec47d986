"""Readers for the driver-generated parquet test tables.

Scale note: these are plain ``spark.read.parquet`` scans -- columnar,
vectorized, filter/column pushdown all apply.  The one wrinkle is that
``events.parquet`` stores its ``ts`` column as parquet TIMESTAMP(NANOS),
which Spark's reader rejects unless either (a) the session was built with
``spark.sql.legacy.parquet.nanosAsLong`` or (b) the read supplies an
explicit schema typing the column as LONG.  We always do (b) so the code
also works under a session we didn't create (the verification driver's),
then rebuild a proper ``TimestampType`` column with
``timestamp_micros(ts div 1000)``.  The source data is microsecond-
aligned; the floor-division matches DuckDB's own ns->us truncation, so
both engines see identical instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# events is the only table with a TIMESTAMP(NANOS) physical column.
_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw epoch nanoseconds
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = spark.read.schema(_EVENTS_SCHEMA).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so ``spark.sql`` queries can name the tables."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
