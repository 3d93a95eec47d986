"""Readers for the driver-generated parquet test tables.

Scale note: these are plain ``spark.read.parquet`` scans -- columnar,
vectorized, filter/column pushdown all apply.  The one wrinkle is the
``events.parquet`` ``ts`` column, whose physical type has shipped as
BOTH parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across data
generations, and neither maps to a clean session-independent Spark
read: NANOS is rejected outright unless the session sets
``legacy.parquet.nanosAsLong``, and MICROS with isAdjustedToUTC=false
infers as TIMESTAMP_NTZ (on which ``unix_millis`` & friends are type
errors).  So we always read ``ts`` with an explicit LONG schema --
which yields the raw epoch integer under either physical type and any
session -- and rebuild a proper ``TimestampType`` column, scaling by
the unit sniffed once per file from the parquet FOOTER (a driver-side
metadata read, no data scan; cached).  Truncation to microseconds
matches DuckDB's own ns->us handling, so both engines see identical
instants.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

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

# events is the only table with a timestamp physical column (see module
# docstring for why it is read as LONG).
_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw epoch integer (unit per footer)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@functools.lru_cache(maxsize=None)
def events_ts_unit(path: str) -> str:
    """Timestamp unit ('ns' | 'us' | 'ms') of the events ``ts`` column,
    from the parquet footer.  Driver-side, metadata-only, cached per
    path -- at 100 TB this is one footer read, not a data scan."""
    import pyarrow.parquet as pq

    t = str(pq.read_schema(path).field("ts").type)
    for unit in ("ns", "us", "ms"):
        if f"[{unit}" in t:
            return unit
    raise ValueError(f"unsupported events.ts type {t!r} in {path}")


def events_ts_column(sf_dir: str) -> Column:
    """Raw-long ``ts`` -> TimestampType, scaled per the file's unit."""
    unit = events_ts_unit(f"{sf_dir}/events.parquet")
    raw = F.col("ts")
    if unit == "ns":
        return F.timestamp_micros(F.expr("ts div 1000"))
    if unit == "us":
        return F.timestamp_micros(raw)
    return F.timestamp_millis(raw)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        df = spark.read.schema(_EVENTS_SCHEMA).parquet(path)
        return df.withColumn("ts", events_ts_column(sf_dir))
    return spark.read.parquet(path)


def register_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so ``spark.sql`` queries can name the tables."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
