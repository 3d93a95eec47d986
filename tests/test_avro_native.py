"""S5 native-.avro runtime path: pure-Python container codec +
distributed binaryFile/mapInPandas reader (avro_to_json.sh:52-70 is the
reference behavior being replaced)."""

from __future__ import annotations

import io

import pytest

from binlog_avro_comparator_spark.schemas import AVRO_NATIVE_SCHEMA
from binlog_avro_comparator_spark.sources.avro import (
    DATASTREAM_AVRO_SCHEMA,
    flatten_probe,
    read_avro_dir,
    read_avro_python,
)
from binlog_avro_comparator_spark.sources.avro_codec import (
    _Reader,
    decode_container,
    decode_value,
    encode_container,
    encode_value,
    write_long,
    zigzag_decode,
    zigzag_encode,
)

SYNC = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"


def _rec(i: int, *, null_meta: bool = False) -> dict:
    return {
        "source_timestamp": 1_704_180_000_000 + i,
        "source_metadata": {
            "database": f"db{i % 2}",
            "table": f"t{i % 3}",
            "change_type": None if null_meta else "INSERT",
            "gtid": None if null_meta else f"uuid-0:{i}",
            "datastream_master_server_uuid": None,
            "datastream_master_server_id": None if null_meta else 42,
            "binlog_file": None if null_meta else "mysql-bin.000001",
            "binlog_position": None if null_meta else 100 * i + 4,
            "is_deleted": None if null_meta else (i % 5 == 0),
            "primary_keys": [] if null_meta else ["id", f"k{i}"],
        },
    }


def test_zigzag_edge_values():
    for n in [0, -1, 1, -2, 2, 2**31 - 1, -(2**31), 2**62, -(2**63), 2**63 - 1]:
        assert zigzag_decode(zigzag_encode(n)) == n


def test_varint_long_roundtrip():
    for n in [0, -1, 127, 128, -300, 10**18, -(10**18), 2**63 - 1, -(2**63)]:
        buf = io.BytesIO()
        write_long(buf, n)
        assert _Reader(buf.getvalue()).read_long() == n


def test_value_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "kitchen_sink",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "u", "type": ["null", "string", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["R", "G", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 8}},
        ],
    }
    value = {
        "b": True,
        "i": -7,
        "l": 2**40,
        "f": 0.5,
        "d": -1.25,
        "s": "héllo ☃",
        "by": b"\x00\xff",
        "u": 99,
        "arr": [1, -2, 3],
        "m": {"k1": "v1", "k2": "v2"},
        "e": "G",
        "fx": b"12345678",
    }
    buf = io.BytesIO()
    encode_value(buf, schema, value)
    assert decode_value(_Reader(buf.getvalue()), schema) == value
    # union null branch
    buf2 = io.BytesIO()
    encode_value(buf2, ["null", "string"], None)
    assert decode_value(_Reader(buf2.getvalue()), ["null", "string"]) is None


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_multiblock(codec):
    records = [_rec(i, null_meta=(i % 4 == 3)) for i in range(25)]
    blob = encode_container(
        DATASTREAM_AVRO_SCHEMA, records, codec=codec, records_per_block=7, sync=SYNC
    )
    schema, it = decode_container(blob)
    assert schema["name"] == "avro_row"
    assert list(it) == records


def test_container_deterministic_with_fixed_sync():
    records = [_rec(i) for i in range(5)]
    a = encode_container(DATASTREAM_AVRO_SCHEMA, records, sync=SYNC)
    b = encode_container(DATASTREAM_AVRO_SCHEMA, records, sync=SYNC)
    assert a == b


def test_container_corruption_detected():
    blob = encode_container(DATASTREAM_AVRO_SCHEMA, [_rec(0)], sync=SYNC)
    with pytest.raises(ValueError, match="bad magic"):
        decode_container(b"Nope" + blob[4:])
    # flip a byte inside the block's trailing sync marker
    _, it = decode_container(blob[:-1] + bytes([blob[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="sync marker"):
        list(it)


def test_read_avro_dir_distributed(spark, tmp_path):
    """End-to-end S5: two generated .avro files -> one flat probe frame.
    Exercises the full fallback engine (binaryFile scan + mapInPandas
    decode + flatten_probe) exactly as read_avro_dir dispatches it."""
    d = tmp_path / "avro"
    d.mkdir()
    recs_a = [_rec(i) for i in range(10)]
    recs_b = [_rec(i + 10, null_meta=(i % 2 == 0)) for i in range(6)]
    (d / "part-a.avro").write_bytes(
        encode_container(DATASTREAM_AVRO_SCHEMA, recs_a, sync=SYNC)
    )
    (d / "part-b.avro").write_bytes(
        encode_container(DATASTREAM_AVRO_SCHEMA, recs_b, codec="null", sync=SYNC)
    )
    (d / "ignored.txt").write_text("not avro")

    df = read_avro_dir(spark, str(d))
    rows = {r.source_timestamp: r for r in df.collect()}
    assert len(rows) == 16
    r5 = rows[1_704_180_000_000 + 5]
    assert (r5.database, r5.table) == ("db1", "t2")
    assert r5.binlog_position == 504 and r5.is_deleted is True
    assert r5.primary_keys == ["id", "k5"]
    # null union branches coalesce to Go zero-values in the probe shape
    r10 = rows[1_704_180_000_000 + 10]
    assert (r10.change_type, r10.gtid, r10.binlog_file) == ("", "", "")
    assert (r10.binlog_position, r10.is_deleted) == (0, False)


def test_jvm_avro_engine_matches_python(spark, tmp_path):
    """The bundled-in-spark-sql JVM AvroFileFormat (resolved by FQCN,
    see avro_jvm_format) reads our codec's container files and agrees
    row-for-row with the pure-Python engine, including timestamp-millis
    normalization through flatten_probe."""
    from binlog_avro_comparator_spark.sources.avro import (
        avro_jvm_format,
        flatten_probe,
        read_avro_native,
        read_avro_python,
    )

    fmt = avro_jvm_format(spark)
    assert fmt is not None, "Spark 4 bundles AvroFileFormat in spark-sql"

    d = tmp_path / "avro"
    d.mkdir()
    recs = [_rec(i) for i in range(8)] + [_rec(8, null_meta=True)]
    (d / "p.avro").write_bytes(encode_container(DATASTREAM_AVRO_SCHEMA, recs, sync=SYNC))

    def flat(df):
        return sorted(
            (r.source_timestamp, r.database, r.change_type, r.binlog_position,
             r.is_deleted, tuple(r.primary_keys))
            for r in flatten_probe(df).collect()
        )

    got_jvm = flat(read_avro_native(spark, str(d)))
    got_py = flat(read_avro_python(spark, str(d)))
    assert got_jvm == got_py and len(got_jvm) == 9


def test_fallback_parallelism_is_per_file(spark, tmp_path):
    """The decode stage must carry one task per file (the fallback's
    documented scale contract), not a single serial task."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        (d / f"f{i}.avro").write_bytes(
            encode_container(DATASTREAM_AVRO_SCHEMA, [_rec(i)], sync=SYNC)
        )
    nested = read_avro_python(spark, str(d))
    assert nested.rdd.getNumPartitions() >= 4
    assert nested.count() == 4


def test_flatten_probe_projection(spark):
    """The nested->probe projection in isolation (native-path shape)."""
    nested = spark.createDataFrame(
        [
            (
                1000,
                ("dbx", "ty", None, None, None, None, None, None, None, ["pk"]),
            )
        ],
        AVRO_NATIVE_SCHEMA,
    )
    row = flatten_probe(nested).collect()[0]
    assert row.database == "dbx" and row.table == "ty"
    assert row.change_type == "" and row.gtid == "" and row.binlog_file == ""
    assert row.binlog_position == 0 and row.is_deleted is False
    assert row.primary_keys == ["pk"]


def test_codec_property_roundtrip():
    """Hypothesis sweep: arbitrary values through the kitchen-sink
    schema survive encode->decode bit-exactly (zigzag full int64 range,
    unicode strings, null unions, variable arrays/maps, both codecs)."""
    from hypothesis import given, settings, strategies as st

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "l", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "u", "type": ["null", "long", "string"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ],
    }
    rec = st.fixed_dictionaries(
        {
            "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "s": st.text(max_size=40),
            "b": st.binary(max_size=40),
            "f": st.booleans(),
            "d": st.floats(allow_nan=False, width=64),
            "u": st.one_of(
                st.none(),
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                st.text(max_size=10),
            ),
            "arr": st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8
            ),
            "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
        }
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(rec, max_size=12), st.sampled_from(["null", "deflate"]))
    def roundtrip(records, codec):
        blob = encode_container(schema, records, codec=codec, records_per_block=5, sync=SYNC)
        _, it = decode_container(blob)
        assert list(it) == records

    roundtrip()


def test_codec_truncated_and_unknown_codec_errors():
    blob = encode_container(DATASTREAM_AVRO_SCHEMA, [_rec(0)], sync=SYNC)
    with pytest.raises(EOFError):
        _, it = decode_container(blob[: len(blob) // 2])
        list(it)
    # unsupported codec named in the header -> actionable error
    bad = blob.replace(b"deflate", b"snappyy", 1)
    with pytest.raises(ValueError, match="codec"):
        decode_container(bad)


def test_cross_validated_against_apache_avro_java(spark):
    """Spec-compliance cross-check against the OFFICIAL Apache Avro
    implementation (the avro jar on Spark's classpath):

    1. bytes from OUR encoder decode correctly in Java's
       DataFileReader (proves files we synthesize are standard), and
    2. bytes from Java's DataFileWriter decode correctly in OUR
       decoder (proves the engine reads real-world .avro files).
    """
    import json

    jvm = spark._jvm
    rec = {
        "source_timestamp": 1_704_180_000_123,
        "source_metadata": {
            "database": "db1",
            "table": "t2",
            "change_type": "INSERT",
            "gtid": None,
            "datastream_master_server_uuid": None,
            "datastream_master_server_id": 42,
            "binlog_file": "mysql-bin.000001",
            "binlog_position": 504,
            "is_deleted": True,
            "primary_keys": ["id", "k5"],
        },
    }

    # direction 1: our encoder -> Java reader
    blob = encode_container(
        DATASTREAM_AVRO_SCHEMA, [rec], codec="deflate", sync=SYNC
    )
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.org.apache.avro.file.SeekableByteArrayInput(bytearray(blob)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert dfr.getSchema().getName() == "avro_row"
    got = []
    while dfr.hasNext():
        got.append(json.loads(str(dfr.next())))
    dfr.close()
    assert got == [rec]

    # direction 2: Java writer -> our decoder.  The record is built by
    # Java's own JSON decoder (py4j flattens java.lang.Long to Python
    # int, so field-wise puts can't carry long types) -- which also
    # exercises the avro-JSON union wrapping the reference's avro-tools
    # output uses ({"string": v} / {"long": v} / null).
    jschema = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(DATASTREAM_AVRO_SCHEMA)
    )
    avro_json = json.dumps(
        {
            "source_timestamp": 1_704_180_000_123,
            "source_metadata": {
                "database": "db1",
                "table": "t2",
                "change_type": {"string": "INSERT"},
                "gtid": None,
                "datastream_master_server_uuid": None,
                "datastream_master_server_id": {"long": 42},
                "binlog_file": {"string": "mysql-bin.000001"},
                "binlog_position": {"long": 504},
                "is_deleted": {"boolean": True},
                "primary_keys": ["id", "k5"],
            },
        }
    )
    jreader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    jrec = jreader.read(
        None, jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(jschema, avro_json)
    )
    baos = jvm.java.io.ByteArrayOutputStream()
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(jschema, baos)
    dfw.append(jrec)
    dfw.close()
    schema, it = decode_container(bytes(baos.toByteArray()))
    assert schema["name"] == "avro_row"
    assert list(it) == [rec]


def test_decoder_fuzz_corruption_fails_cleanly():
    """Fuzz: random single-byte corruptions of a valid container must
    either decode to the original records (corruption hit dead space /
    was value-neutral) or raise a clean ValueError/EOFError/zlib error
    -- never hang, never return garbage silently for header/sync
    damage.  Deflate's checksumless raw stream means a flipped byte
    INSIDE a compressed block can decode to altered values; the
    container-level guards (magic, sync, lengths) are what this codec
    promises, matching the Java implementation's behavior."""
    import random
    import zlib

    records = [_rec(i) for i in range(8)]
    blob = bytearray(
        encode_container(DATASTREAM_AVRO_SCHEMA, records, codec="null", sync=SYNC)
    )
    rng = random.Random(99)
    clean, errors = 0, 0
    for _ in range(300):
        b = bytearray(blob)
        pos = rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
        try:
            schema, it = decode_container(bytes(b))
            out = list(it)
        except (ValueError, EOFError, KeyError, IndexError, OverflowError,
                UnicodeDecodeError, zlib.error):
            errors += 1
            continue
        clean += 1
        # a successful decode of a corrupted NULL-codec container can
        # only differ from the original in decoded VALUES, never shape
        assert len(out) == len(records)
    assert errors > 0 and clean > 0  # both regimes exercised


def test_flatten_probe_normalizes_timestamp_type(spark):
    """spark-avro materializes timestamp-millis as TimestampType; the
    shared projection must emit epoch-millis LONG for that engine too
    (the pure-Python path's long passes through unchanged)."""
    import datetime

    from pyspark.sql import functions as F, types as T

    nested_schema = T.StructType(
        [
            T.StructField("source_timestamp", T.TimestampType()),
            AVRO_NATIVE_SCHEMA["source_metadata"],
        ]
    )
    ts = datetime.datetime(2025, 6, 1, 12, 0, 0, 123000, tzinfo=datetime.timezone.utc)
    nested = spark.createDataFrame(
        [(ts, ("db", "t", None, None, None, None, None, None, None, []))],
        nested_schema,
    )
    row = flatten_probe(nested).collect()[0]
    assert row.source_timestamp == 1_748_779_200_123  # epoch millis, long
    assert flatten_probe(nested).schema["source_timestamp"].dataType.simpleString() == "bigint"


def test_avro2json_cli_end_to_end(spark, tmp_path):
    """E2 parity loop: .avro files -> avro2json CLI -> JSONL that the
    comparator's typed reader ingests with identical values."""
    from binlog_avro_comparator_spark.avro2json import main as a2j_main
    from binlog_avro_comparator_spark.sources.jsonl import (
        read_avro_jsonl,
        unwrap_avro,
    )

    d = tmp_path / "avro"
    d.mkdir()
    recs = [_rec(i, null_meta=(i % 3 == 2)) for i in range(9)]
    (d / "a.avro").write_bytes(encode_container(DATASTREAM_AVRO_SCHEMA, recs[:5], sync=SYNC))
    (d / "b.avro").write_bytes(encode_container(DATASTREAM_AVRO_SCHEMA, recs[5:], sync=SYNC))
    out = tmp_path / "avro_rows.json"
    rc = a2j_main(["--avro-dir", str(d), "--out", str(out)], spark=spark)
    assert rc == 0
    emitted = out.read_text().splitlines()
    assert len(emitted) == 9
    # reference ordering: files by name, records by in-file position
    import json as _json

    ts_order = [_json.loads(ln)["source_timestamp"] for ln in emitted]
    assert ts_order == [1_704_180_000_000 + i for i in range(9)]
    # null union branches emit literal null, like avro-tools
    rec2 = _json.loads(emitted[2])
    assert rec2["source_metadata"]["change_type"] is None
    assert rec2["source_metadata"]["binlog_position"] is None
    rec3 = _json.loads(emitted[3])
    assert rec3["source_metadata"]["change_type"] == {"string": "INSERT"}
    assert rec3["source_metadata"]["datastream_master_server_id"] == {"long": 42}
    back = unwrap_avro(read_avro_jsonl(spark, str(out)).filter("_corrupt_record is null"))
    rows = {r.source_timestamp: r for r in back.collect()}
    assert len(rows) == 9
    r3 = rows[1_704_180_000_000 + 3]
    assert (r3.database, r3.binlog_position, r3.gtid) == ("db1", 304, "uuid-0:3")
    r2 = rows[1_704_180_000_000 + 2]  # null branches -> Go zero-values on unwrap
    assert (r2.change_type, r2.binlog_position, r2.is_deleted) == ("", 0, False)


# ---------------------------------------------------------------------------
# schema resolution (Avro 1.11 "Schema Resolution")
# ---------------------------------------------------------------------------
def _resolve_one(writer_schema, reader_schema, value):
    import io as _io

    from binlog_avro_comparator_spark.sources.avro_codec import (
        _Reader,
        encode_value,
        resolve_read,
    )

    buf = _io.BytesIO()
    encode_value(buf, writer_schema, value)
    return resolve_read(_Reader(buf.getvalue()), writer_schema, reader_schema)


def test_resolution_rename_default_skip_promote():
    """One record exercising all four resolution moves: field matched
    via reader alias, writer-only field skipped, reader-only field
    defaulted, int promoted to long inside a union."""
    writer = {
        "type": "record", "name": "r", "fields": [
            {"name": "table_name", "type": "string"},
            {"name": "legacy", "type": "string"},
            {"name": "sid", "type": ["null", "int"]},
        ],
    }
    reader = {
        "type": "record", "name": "r", "fields": [
            {"name": "table", "type": "string", "aliases": ["table_name"]},
            {"name": "sid", "type": ["null", "long"]},
            {"name": "pos", "type": ["null", "long"], "default": None},
        ],
    }
    got = _resolve_one(writer, reader, {"table_name": "t1", "legacy": "x", "sid": 7})
    assert got == {"table": "t1", "sid": 7, "pos": None}
    assert isinstance(got["sid"], int)


def test_resolution_missing_field_without_default_errors():
    import pytest as _pytest

    writer = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "string"}]}
    reader = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "string"},
                         {"name": "b", "type": "string"}]}
    with _pytest.raises(ValueError, match="no default"):
        _resolve_one(writer, reader, {"a": "x"})


def test_resolution_primitive_promotions():
    assert _resolve_one("int", "double", 3) == 3.0
    assert _resolve_one("long", "float", 5) == 5.0
    assert _resolve_one("float", "double", 1.5) == 1.5
    assert _resolve_one("string", "bytes", "hi") == b"hi"
    assert _resolve_one("bytes", "string", b"hi") == "hi"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="promote"):
        _resolve_one("double", "float", 1.0)


def test_resolution_enum_and_nested_array():
    writer = {"type": "record", "name": "r", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "E",
                               "symbols": ["A", "B", "NEWER"]}},
        {"name": "xs", "type": {"type": "array", "items": "int"}},
    ]}
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "e", "type": {"type": "enum", "name": "E",
                               "symbols": ["A", "B"], "default": "A"}},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
    ]}
    got = _resolve_one(writer, reader, {"e": "NEWER", "xs": [1, 2]})
    assert got == {"e": "A", "xs": [1, 2]}  # unknown symbol -> reader default
    got2 = _resolve_one(writer, reader, {"e": "B", "xs": []})
    assert got2["e"] == "B"


def test_container_reader_schema_resolution_roundtrip():
    """decode_container(reader_schema=...) surfaces a v1-written file
    in the current shape; identical schemas bypass resolution."""
    from binlog_avro_comparator_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    writer = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": "string"},
        {"name": "gone", "type": "long"},
    ]}
    reader = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": "string"},
        {"name": "added", "type": ["null", "string"], "default": None},
    ]}
    data = encode_container(writer, [{"k": "a", "gone": 1}, {"k": "b", "gone": 2}])
    _, recs = decode_container(data, reader_schema=reader)
    assert list(recs) == [{"k": "a", "added": None}, {"k": "b", "added": None}]
    _, plain = decode_container(data)
    assert list(plain)[0] == {"k": "a", "gone": 1}


# ---------------------------------------------------------------------------
# logical types (round 7): decimal / date / time / timestamp / uuid
# ---------------------------------------------------------------------------
def test_logical_types_roundtrip():
    """Typed Python values -> avro wire bytes -> typed values, for
    every logical annotation the codec converts; raw primitives pass
    through the same schema untouched when logical decode is off."""
    import datetime as dt
    from decimal import Decimal

    from binlog_avro_comparator_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    schema = {
        "type": "record", "name": "r", "fields": [
            {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 12, "scale": 2}},
            {"name": "decf", "type": {"type": "fixed", "name": "d8", "size": 8,
                                      "logicalType": "decimal",
                                      "precision": 15, "scale": 3}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tms", "type": {"type": "int", "logicalType": "time-millis"}},
            {"name": "tus", "type": {"type": "long", "logicalType": "time-micros"}},
            {"name": "tsms", "type": {"type": "long",
                                      "logicalType": "timestamp-millis"}},
            {"name": "tsus", "type": {"type": "long",
                                      "logicalType": "timestamp-micros"}},
            {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
        ],
    }
    rec = {
        "dec": Decimal("-1234.56"),
        "decf": Decimal("0.001"),
        "d": dt.date(2024, 2, 29),
        "tms": dt.time(23, 59, 59, 123000),
        "tus": dt.time(0, 0, 0, 1),
        "tsms": dt.datetime(2024, 1, 2, 3, 4, 5, 678000),
        "tsus": dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
        "u": "00000000-0000-4000-8000-000000000007",
    }
    data = encode_container(schema, [rec], sync=b"\x00" * 16)
    _, it = decode_container(data, logical_types=True)
    got = next(iter(it))
    assert got == rec
    assert isinstance(got["dec"], Decimal) and isinstance(got["decf"], Decimal)
    # logical decode OFF: raw primitives (spec default the engine's
    # Datastream contract relies on -- timestamp-millis stays a long)
    _, raw_it = decode_container(data)
    raw = next(iter(raw_it))
    assert raw["tsms"] == 1704164645678 and isinstance(raw["tsms"], int)
    assert raw["d"] == (dt.date(2024, 2, 29) - dt.date(1970, 1, 1)).days
    assert isinstance(raw["dec"], bytes)
    # negative unscaled two's complement survives exactly
    assert int.from_bytes(raw["dec"], "big", signed=True) == -123456


def test_logical_decimal_resolution_reader_annotation_wins():
    """Schema resolution + logical decode: the reader's decimal
    annotation converts even through a union, and a plain-long reader
    over a timestamp-millis writer surfaces the raw long."""
    import io as _io

    from decimal import Decimal

    from binlog_avro_comparator_spark.sources.avro_codec import (
        _Reader,
        encode_value,
        resolve_read,
    )

    dec_t = {"type": "bytes", "logicalType": "decimal",
             "precision": 12, "scale": 2}
    writer = {"type": "record", "name": "r", "fields": [
        {"name": "amt", "type": ["null", dec_t]},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-millis"}},
    ]}
    reader_plain = {"type": "record", "name": "r", "fields": [
        {"name": "amt", "type": ["null", dec_t]},
        {"name": "ts", "type": "long"},
    ]}
    buf = _io.BytesIO()
    encode_value(buf, writer, {"amt": Decimal("42.07"), "ts": 1234})
    got = resolve_read(_Reader(buf.getvalue()), writer, reader_plain, True)
    assert got == {"amt": Decimal("42.07"), "ts": 1234}
    # logical=False: raw bytes surface
    got_raw = resolve_read(_Reader(buf.getvalue()), writer, reader_plain, False)
    assert isinstance(got_raw["amt"], bytes)


def test_schema_census_and_corrupt_file_row(spark, tmp_path):
    """The census reads ONLY headers/block counts (values never
    decode), and a truncated/foreign file surfaces as a CORRUPT row
    instead of failing the scan (SURVEY 2.8 warn-and-skip)."""
    from binlog_avro_comparator_spark.sources.avro import read_avro_schema_census
    from binlog_avro_comparator_spark.sources.avro_codec import encode_container

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    data = encode_container(schema, [{"x": i} for i in range(2500)],
                            sync=b"\x01" * 16)
    (tmp_path / "a.avro").write_bytes(data)
    (tmp_path / "b.avro").write_bytes(data[: len(data) // 2])  # truncated
    (tmp_path / "c.avro").write_bytes(b"not an avro file at all")
    got = {r.file: r for r in read_avro_schema_census(spark, str(tmp_path)).collect()}
    assert got["a.avro"].n_records == 2500 and got["a.avro"].n_blocks == 3
    assert got["a.avro"].codec == "deflate" and got["a.avro"].schema_md5
    assert got["b.avro"].codec == "CORRUPT" and got["b.avro"].schema_md5 is None
    assert got["c.avro"].codec == "CORRUPT"
