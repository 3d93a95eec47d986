"""Explicit read schemas (never inference -- determinism).

Spellings with triple-m / 'orignal' are the reference's contract --
they mirror the upstream parser's output keys (json_parser.go:95,:102;
SURVEY.md quirk Q6) and are matched by JSON tag in
compare_timestamps.go:16.  Preserve verbatim.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- binlog_events (D3) ----------------------------------------------------
# Contract columns consumed by the comparison (compare_timestamps.go:13-22).
# The open-schema tail (xid, query, last_committed, ...) rides in `extra`.
BINLOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # RFC3339, second precision
        T.StructField("immediate_commmit_timestamp", T.StringType()),  # RFC3339Nano (sic)
        T.StructField("orignal_commmit_timestamp", T.StringType()),  # (sic)
        T.StructField("log_position", T.LongType()),
        T.StructField("table", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("gtid_next", T.StringType()),
        T.StructField("binlog_file", T.StringType()),
    ]
)


def _wrapped(name: str, inner: T.DataType, key: str) -> T.StructField:
    """avro-tools' JSON encoding of a ["null", X] union: {"<x>": v}
    (compare_timestamps.go:26-40)."""
    return T.StructField(name, T.StructType([T.StructField(key, inner)]))


# --- avro_rows (D4), union-wrapped JSONL form ------------------------------
# As emitted by `avro-tools tojson` (avro_to_json.sh:60); declared struct
# shape from compare_timestamps.go:43-64.
AVRO_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("source_timestamp", T.LongType()),  # direct long (:44)
        T.StructField(
            "source_metadata",
            T.StructType(
                [
                    T.StructField("database", T.StringType()),
                    T.StructField("table", T.StringType()),
                    _wrapped("change_type", T.StringType(), "string"),
                    _wrapped("gtid", T.StringType(), "string"),
                    _wrapped("datastream_master_server_uuid", T.StringType(), "string"),
                    _wrapped("datastream_master_server_id", T.LongType(), "long"),
                    _wrapped("binlog_file", T.StringType(), "string"),
                    _wrapped("binlog_position", T.LongType(), "long"),
                    _wrapped("is_deleted", T.BooleanType(), "boolean"),
                    T.StructField("primary_keys", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "payload",
            T.StructType(
                [
                    _wrapped("order_id", T.IntegerType(), "int"),
                    _wrapped("customer_name", T.StringType(), "string"),
                    _wrapped("product_name", T.StringType(), "string"),
                    _wrapped("quantity", T.IntegerType(), "int"),
                    _wrapped("order_timestamp", T.LongType(), "long"),
                ]
            ),
        ),
    ]
)

# --- avro_rows, native/unwrapped form --------------------------------------
# What spark.read.format("avro") yields: unions dissolve into plain
# nullable columns (SURVEY.md section 1.2).
AVRO_NATIVE_SCHEMA = T.StructType(
    [
        T.StructField("source_timestamp", T.LongType()),
        T.StructField(
            "source_metadata",
            T.StructType(
                [
                    T.StructField("database", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("change_type", T.StringType()),
                    T.StructField("gtid", T.StringType()),
                    T.StructField("datastream_master_server_uuid", T.StringType()),
                    T.StructField("datastream_master_server_id", T.LongType()),
                    T.StructField("binlog_file", T.StringType()),
                    T.StructField("binlog_position", T.LongType()),
                    T.StructField("is_deleted", T.BooleanType()),
                    T.StructField("primary_keys", T.ArrayType(T.StringType())),
                ]
            ),
        ),
    ]
)
