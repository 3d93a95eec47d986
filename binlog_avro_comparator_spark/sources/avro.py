"""Native Avro source (SURVEY.md S5/S6).

Replaces the reference's per-file `java -jar avro-tools tojson` loop
(avro_to_json.sh:52-70) with one distributed scan.  Two engines:

- The JVM avro datasource: block-splittable, fully JVM-side.
  Preferred at scale (a 100 TB avro lake with large files splits at
  block granularity).  Spark 4 bundles the full implementation inside
  spark-sql; only the "avro" short name is unregistered without the
  spark-avro module jar, so resolution falls back to the
  fully-qualified AvroFileFormat class name (see avro_jvm_format).
- A dependency-free fallback: Spark's ``binaryFile`` source lists and
  ships the files, and the pure-Python codec (``avro_codec``, Apache
  Avro 1.11 spec) decodes them inside ``mapInPandas`` Arrow batches.
  Parallelism is file-granular -- the right shape for CDC/binlog-style
  avro dumps (many bounded files, one per binlog segment), documented
  as the fallback's scale contract.  Both engines are oracle-checked.

Both engines produce the same unwrapped frame: ["null", X] unions
dissolve into plain nullable columns, so the JSON wrapper layer the
reference hand-unwraps (compare_timestamps.go:26-40) vanishes, and one
shared projection (`flatten_probe`) emits the probe-side shape.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import AVRO_NATIVE_SCHEMA
from .avro_codec import decode_container
from .jsonl import unwrap_avro  # re-export convenience

# Writer schema of the reference's Datastream-shaped avro files
# (field set from compare_timestamps.go:43-64; union-wrapping visible in
# avro-tools' JSON output, avro_to_json.sh:60).  Used by fixture
# generators; the decoder itself is schema-driven from each file header.
DATASTREAM_AVRO_SCHEMA: dict = {
    "type": "record",
    "name": "avro_row",
    "fields": [
        {
            "name": "source_timestamp",
            "type": {"type": "long", "logicalType": "timestamp-millis"},
        },
        {
            "name": "source_metadata",
            "type": {
                "type": "record",
                "name": "source_metadata",
                "fields": [
                    {"name": "database", "type": "string"},
                    {"name": "table", "type": "string"},
                    {"name": "change_type", "type": ["null", "string"]},
                    {"name": "gtid", "type": ["null", "string"]},
                    {"name": "datastream_master_server_uuid", "type": ["null", "string"]},
                    {"name": "datastream_master_server_id", "type": ["null", "long"]},
                    {"name": "binlog_file", "type": ["null", "string"]},
                    {"name": "binlog_position", "type": ["null", "long"]},
                    {"name": "is_deleted", "type": ["null", "boolean"]},
                    {"name": "primary_keys", "type": {"type": "array", "items": "string"}},
                ],
            },
        },
    ],
}

_META_FIELDS = [f["name"] for f in DATASTREAM_AVRO_SCHEMA["fields"][1]["type"]["fields"]]


def _evolution_reader_schema() -> dict:
    """The canonical schema as a READER schema for evolved lakes:
    every nullable field declares ``default: null`` (so files written
    before the field existed resolve instead of erroring) and
    ``table`` accepts the legacy producer name ``table_name`` via an
    alias -- the two knobs Avro schema resolution actually turns.
    Built from DATASTREAM_AVRO_SCHEMA so the shapes can never drift."""
    import copy

    rs = copy.deepcopy(DATASTREAM_AVRO_SCHEMA)
    for f in rs["fields"][1]["type"]["fields"]:
        if isinstance(f["type"], list) and f["type"][0] == "null":
            f["default"] = None
        if f["name"] == "table":
            f["aliases"] = ["table_name"]
    return rs


DATASTREAM_AVRO_READER_SCHEMA: dict = _evolution_reader_schema()


# Spark 4 ships the complete Avro implementation inside spark-sql
# (AvroFileFormat, AvroDeserializer, ... are all in the main jar) but
# does NOT register the "avro" short name unless the spark-avro module
# jar adds its DataSourceRegister entry -- lookupDataSource then throws
# the "Avro is built-in but external" error.  The fully-qualified v1
# class name bypasses short-name lookup and uses the bundled classes
# directly, giving the block-splittable JVM reader with zero extra
# deployment.  Resolution order: short name (a real spark-avro jar on
# the classpath wins), then the bundled FQCN.
_AVRO_FQCN = "org.apache.spark.sql.avro.AvroFileFormat"
_FORMAT_CACHE: dict[str, str | None] = {}


def avro_jvm_format(spark: SparkSession) -> str | None:
    """The usable JVM avro format name for this session, or None."""
    key = spark.sparkContext.applicationId
    if key not in _FORMAT_CACHE:
        _FORMAT_CACHE[key] = None
        for fmt in ("avro", _AVRO_FQCN):
            try:
                spark.read.format(fmt).load("/nonexistent-probe-path.avro")
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "Failed to find data source" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
                    continue
                _FORMAT_CACHE[key] = fmt  # resolved; the path error proves it loaded
                break
            else:  # pragma: no cover - probe path never exists
                _FORMAT_CACHE[key] = fmt
                break
    return _FORMAT_CACHE[key]


def avro_available(spark: SparkSession) -> bool:
    return avro_jvm_format(spark) is not None


def flatten_probe(df: DataFrame) -> DataFrame:
    """Nested native frame -> flat probe shape.  The ''/0/False
    coalesces mirror Go's zero-values for absent union branches
    (compare_timestamps.go:67-105).

    source_timestamp is normalized to epoch-millis LONG regardless of
    engine: spark-avro materializes the timestamp-millis logical type
    as TimestampType, while the pure-Python codec (and the reference's
    int64 contract, compare_timestamps.go:44) keeps the raw long."""
    sm = "source_metadata"
    ts_field = next(f for f in df.schema.fields if f.name == "source_timestamp")
    src_ts = (
        F.unix_millis(F.col("source_timestamp"))
        if isinstance(ts_field.dataType, T.TimestampType)
        else F.col("source_timestamp").cast("long")
    )
    return df.select(
        src_ts.alias("source_timestamp"),
        F.col(f"{sm}.database").alias("database"),
        F.col(f"{sm}.table").alias("table"),
        F.coalesce(F.col(f"{sm}.change_type"), F.lit("")).alias("change_type"),
        F.coalesce(F.col(f"{sm}.gtid"), F.lit("")).alias("gtid"),
        F.coalesce(F.col(f"{sm}.binlog_file"), F.lit("")).alias("binlog_file"),
        F.coalesce(F.col(f"{sm}.binlog_position"), F.lit(0)).alias("binlog_position"),
        F.coalesce(F.col(f"{sm}.is_deleted"), F.lit(False)).alias("is_deleted"),
        F.col(f"{sm}.primary_keys").alias("primary_keys"),
    )


def read_avro_native(spark: SparkSession, path: str) -> DataFrame:
    """S5 via the JVM avro datasource (block-splittable scan -- the
    shape you want for a 100 TB avro lake with multi-GB files, vs the
    Python fallback's file-granular parallelism)."""
    fmt = avro_jvm_format(spark)
    if fmt is None:
        raise RuntimeError(
            "no JVM avro datasource on this classpath; use read_avro_python"
        )
    return spark.read.format(fmt).load(f"{path}/*.avro")


def read_avro_python(
    spark: SparkSession,
    path: str,
    with_lineage: bool = False,
    reader_schema: dict | None = None,
) -> DataFrame:
    """S5 fallback: binaryFile listing + Arrow-batched pure-Python
    decode.  One decode task per file; a file is the sequential unit
    (same bound as the reference's per-file avro-tools loop, but files
    decode concurrently across the cluster instead of serially).

    ``with_lineage=True`` adds (``__file``, ``__pos``): source file
    path and the record's 0-based position within it -- the exact
    ordering of the reference's sequential per-file loop, for
    consumers that must reproduce it (avro2json).

    ``reader_schema``: apply Avro schema resolution per file (see
    avro_codec.resolve_read) so a directory mixing producer schema
    versions scans as one uniform frame -- each task resolves against
    the writer schema embedded in its own file's header."""
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)

    schema = AVRO_NATIVE_SCHEMA
    if with_lineage:
        from pyspark.sql import types as _T

        schema = _T.StructType(
            [_T.StructField("__file", _T.StringType()), _T.StructField("__pos", _T.LongType())]
            + list(AVRO_NATIVE_SCHEMA.fields)
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                _, records = decode_container(
                    bytes(content), reader_schema=reader_schema
                )
                rows: list[dict[str, Any]] = []
                for pos, rec in enumerate(records):
                    meta = rec.get("source_metadata") or {}
                    row: dict[str, Any] = {
                        "source_timestamp": rec.get("source_timestamp"),
                        "source_metadata": {k: meta.get(k) for k in _META_FIELDS},
                    }
                    if with_lineage:
                        row["__file"] = fname
                        row["__pos"] = pos
                    rows.append(row)
                if rows:
                    yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(decode, schema=schema)


def read_avro_logical(
    spark: SparkSession,
    path: str,
    spark_schema: T.StructType,
    reader_schema: dict | None = None,
) -> DataFrame:
    """Generic distributed ``.avro`` scan with LOGICAL-TYPE decode: the
    pure-Python codec converts decimal / date / time-millis/micros /
    timestamp-millis/micros / uuid annotations to typed values, and the
    Arrow batch surfaces them as real Spark columns (DecimalType,
    DateType, TimeType, TimestampType) -- what a Datastream lake with
    DECIMAL money columns needs, and what the reference's fixed payload
    never exercises (compare_timestamps.go:57-63 declares raw
    primitives only).

    ``spark_schema`` declares the surfaced frame (top-level record
    fields by name; extra decoded fields are dropped, so a projection
    is also column pruning).  ``reader_schema`` applies Avro schema
    resolution per file, as in read_avro_python.  Parallelism is
    file-granular (binaryFile listing), the documented fallback-engine
    contract."""
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    )
    names = spark_schema.fieldNames()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, records = decode_container(
                    bytes(content), reader_schema=reader_schema, logical_types=True
                )
                rows = list(records)
                if rows:
                    yield pd.DataFrame(rows).reindex(columns=names)

    return files.select("content").mapInPandas(decode, schema=spark_schema)


def read_avro_schema_census(spark: SparkSession, path: str) -> DataFrame:
    """Writer-schema census over an avro lake at METADATA cost: per
    file, the md5 fingerprint of the raw writer-schema bytes (exactly
    as the producer serialized them), codec, and the record count
    summed from block headers alone (avro_codec.container_stats never
    decodes a value).  The first question against a lake written over
    years by evolving producers -- which schema versions exist, where,
    and how much data each covers -- answered by reading a few hundred
    bytes per file.  Returns (file, schema_md5, codec, n_records,
    n_blocks)."""
    import hashlib
    import os as _os

    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    )
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("schema_md5", T.StringType()),
            T.StructField("codec", T.StringType()),
            T.StructField("n_records", T.LongType()),
            T.StructField("n_blocks", T.LongType()),
        ]
    )
    from .avro_codec import container_stats

    def census(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    st = container_stats(bytes(content))
                except Exception:  # noqa: BLE001
                    # warn-and-skip contract (SURVEY 2.8): one truncated
                    # or foreign file must not kill a million-file
                    # census -- it becomes a CORRUPT row to triage
                    rows.append((_os.path.basename(p), None, "CORRUPT", 0, 0))
                    continue
                rows.append(
                    (
                        _os.path.basename(p),
                        hashlib.md5(st["schema_json"]).hexdigest(),
                        st["codec"],
                        st["n_records"],
                        st["n_blocks"],
                    )
                )
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    return files.select("path", "content").mapInPandas(census, schema=schema)


def read_avro_dir(spark: SparkSession, path: str) -> DataFrame:
    """S5: one scan over a directory of .avro files; flat probe shape.
    Uses the JVM datasource when present, else the pure-Python engine."""
    if avro_available(spark):
        nested = read_avro_native(spark, path)
    else:
        nested = read_avro_python(spark, path)
    return flatten_probe(nested)
