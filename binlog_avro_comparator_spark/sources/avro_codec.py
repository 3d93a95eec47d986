"""Pure-Python Avro Object Container File codec (SURVEY.md S5).

The external spark-avro datasource is not bundled in this container, so
the native ``.avro`` runtime path (the reference's only real ingestion,
avro_to_json.sh:52-70, via `avro-tools tojson`) is served by this
dependency-free codec instead: the distributed reader in ``avro.py``
scans files with Spark's binaryFile source and decodes them in Arrow
batches via ``mapInPandas``.

Implements the published Apache Avro 1.11 specification
(container file format + binary encoding):
  - header: magic ``Obj\\x01``, file-metadata map (``avro.schema``,
    ``avro.codec``), 16-byte sync marker
  - blocks: zigzag-varint record count, byte size, payload, sync marker
  - codecs: ``null`` and ``deflate`` (raw zlib, -15 window bits)
  - values: zigzag varint int/long, little-endian float/double,
    length-prefixed bytes/string, union = branch index + value,
    array/map in count-prefixed blocks (negative count = byte-size
    follows), enum = int index, fixed = N raw bytes, record = fields
    in schema order

The encoder exists for fixture generation (tests and the oracle-checked
``cdc_avro_native_scan`` query synthesize ``.avro`` inputs with it); the
decoder is the engine path.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import zlib
from decimal import Decimal
from typing import Any, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

# ---------------------------------------------------------------------------
# logical types (Avro 1.11 spec "Logical Types") -- OPT-IN: the engine's
# Datastream contract keeps timestamp-millis as a raw long
# (compare_timestamps.go:44's int64 contract), so conversion only runs
# when the caller asks for it (decode_container(..., logical_types=True)).
# Unknown logical annotations fall back to the raw primitive, as the
# spec requires.
# ---------------------------------------------------------------------------
_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)


def from_logical(raw: Any, schema: dict) -> Any:
    """Raw decoded primitive/fixed -> the logical type's in-memory
    form: decimal -> decimal.Decimal, date -> datetime.date,
    time-millis/micros -> datetime.time, timestamp-millis/micros ->
    naive-UTC datetime.datetime, uuid -> str (already one)."""
    lt = schema.get("logicalType")
    if lt == "decimal":
        # bytes/fixed: big-endian two's-complement unscaled integer
        unscaled = int.from_bytes(raw, "big", signed=True)
        return Decimal(unscaled).scaleb(-schema.get("scale", 0))
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=raw)
    if lt == "time-millis":
        return (_EPOCH_DT + _dt.timedelta(milliseconds=raw)).time()
    if lt == "time-micros":
        return (_EPOCH_DT + _dt.timedelta(microseconds=raw)).time()
    if lt == "timestamp-millis":
        return _EPOCH_DT + _dt.timedelta(milliseconds=raw)
    if lt == "timestamp-micros":
        return _EPOCH_DT + _dt.timedelta(microseconds=raw)
    return raw  # uuid is already a string; unknown logicals stay raw


def to_logical_raw(value: Any, schema: dict) -> Any:
    """Inverse of from_logical (encoder side): typed value -> the raw
    primitive the wire format carries.  Raw-typed inputs pass through
    so fixtures may supply pre-encoded primitives."""
    lt = schema.get("logicalType")
    if lt == "decimal" and isinstance(value, Decimal):
        scale = schema.get("scale", 0)
        unscaled = int(value.scaleb(scale).to_integral_value())
        if schema.get("type") == "fixed":
            return unscaled.to_bytes(schema["size"], "big", signed=True)
        n = max(1, (unscaled.bit_length() + 8) // 8)  # sign bit included
        return unscaled.to_bytes(n, "big", signed=True)
    if lt == "date" and isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
        return (value - _EPOCH_DATE).days
    if lt in ("time-millis", "time-micros") and isinstance(value, _dt.time):
        us = ((value.hour * 60 + value.minute) * 60 + value.second) * 1_000_000 + value.microsecond
        return us // 1000 if lt == "time-millis" else us
    if lt in ("timestamp-millis", "timestamp-micros") and isinstance(value, _dt.datetime):
        us = round((value - _EPOCH_DT).total_seconds() * 1_000_000)
        return us // 1000 if lt == "timestamp-millis" else us
    return value


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------
def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


class _Reader:
    """Cursor over one container file's bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"avro: truncated read at {self.pos} (wanted {n} bytes)")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            byte = self.data[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return zigzag_decode(acc)
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long (corrupt file)")

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


# ---------------------------------------------------------------------------
# schema-driven value decode
# ---------------------------------------------------------------------------
def decode_value(r: _Reader, schema: Any, logical: bool = False) -> Any:
    if isinstance(schema, dict) and schema.get("type") in _PRIMITIVES:
        # {"type": "long", "logicalType": ...} -- logical types ride on
        # primitives; by default expose the raw primitive
        # (timestamp-millis stays a long, matching
        # compare_timestamps.go:44's int64 contract).  With
        # ``logical=True`` the annotation converts (decimal/date/time/
        # timestamp/uuid -> typed Python values, see from_logical).
        raw = decode_value(r, schema["type"])
        if logical and "logicalType" in schema:
            return from_logical(raw, schema)
        return raw
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) != b"\x00"
        if schema in ("int", "long"):
            return r.read_long()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "bytes":
            return r.read_bytes()
        if schema == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"avro: unknown named type reference {schema!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union branch {idx} out of range")
        return decode_value(r, schema[idx], logical)
    t = schema["type"]
    if t == "record":
        return {
            f["name"]: decode_value(r, f["type"], logical)
            for f in schema["fields"]
        }
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        raw = r.read(schema["size"])
        if logical and "logicalType" in schema:
            return from_logical(raw, schema)
        return raw
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:  # block byte-size follows; skip it, decode items
                r.read_long()
                count = -count
            for _ in range(count):
                out.append(decode_value(r, schema["items"], logical))
    if t == "map":
        out: dict[str, Any] = {}
        while True:
            count = r.read_long()
            if count == 0:
                return out
            if count < 0:
                r.read_long()
                count = -count
            for _ in range(count):
                k = r.read_bytes().decode("utf-8")
                out[k] = decode_value(r, schema["values"], logical)
    if t in _PRIMITIVES:
        return decode_value(r, t)
    raise ValueError(f"avro: unsupported schema type {t!r}")


def decode_container(
    data: bytes, reader_schema: Any = None, logical_types: bool = False
) -> tuple[dict, Iterator[dict]]:
    """Parse one Object Container File: returns (writer schema, record
    iterator).  Lazy per-block so a multi-block file never holds more
    than one inflated block in memory.

    ``reader_schema``: surface every record in THIS schema's shape
    regardless of the schema the file was written with (Avro schema
    resolution -- see ``resolve_read``).  A lake written over years by
    evolving producers reads as one uniform frame.

    ``logical_types``: convert logical annotations (decimal, date,
    time-millis/micros, timestamp-millis/micros, uuid) to typed Python
    values instead of raw primitives -- what a Datastream lake with
    DECIMAL columns needs to surface typed Spark frames."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = r.read(SYNC_SIZE)

    resolved = reader_schema is not None and reader_schema != schema

    def records() -> Iterator[dict]:
        while not r.at_end():
            n = r.read_long()
            block = r.read(r.read_long())
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            if r.read(SYNC_SIZE) != sync:
                raise ValueError("avro: sync marker mismatch (corrupt block)")
            br = _Reader(block)
            for _ in range(n):
                if resolved:
                    yield resolve_read(br, schema, reader_schema, logical_types)
                else:
                    yield decode_value(br, schema, logical_types)

    return schema, records()


# ---------------------------------------------------------------------------
# encode (fixture generation only -- the engine never writes avro)
# ---------------------------------------------------------------------------
def encode_value(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, dict) and schema.get("type") in _PRIMITIVES:
        if "logicalType" in schema:
            value = to_logical_raw(value, schema)
        schema = schema["type"]
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            write_long(buf, value)
        elif schema == "float":
            buf.write(struct.pack("<f", value))
        elif schema == "double":
            buf.write(struct.pack("<d", value))
        elif schema == "bytes":
            write_long(buf, len(value))
            buf.write(value)
        elif schema == "string":
            b = value.encode("utf-8")
            write_long(buf, len(b))
            buf.write(b)
        else:
            raise ValueError(f"avro: unknown type {schema!r}")
        return
    if isinstance(schema, list):  # union: first matching branch
        for idx, branch in enumerate(schema):
            if _union_match(branch, value):
                write_long(buf, idx)
                encode_value(buf, branch, value)
                return
        raise ValueError(f"avro: no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode_value(buf, f["type"], value[f["name"]])
    elif t == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif t == "fixed":
        if "logicalType" in schema:
            value = to_logical_raw(value, schema)
        buf.write(value)
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode_value(buf, schema["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                encode_value(buf, "string", k)
                encode_value(buf, schema["values"], v)
        write_long(buf, 0)
    elif t in _PRIMITIVES:
        encode_value(buf, t, value)
    else:
        raise ValueError(f"avro: unsupported schema type {t!r}")


def _union_match(branch: Any, value: Any) -> bool:
    name = branch if isinstance(branch, str) else branch.get("type")
    if value is None:
        return name == "null"
    if isinstance(value, bool):
        return name == "boolean"
    # logical-typed values pick the branch carrying their annotation
    # (checked before the raw-primitive rules; datetime before date --
    # datetime subclasses date)
    lt = branch.get("logicalType", "") if isinstance(branch, dict) else ""
    if isinstance(value, Decimal):
        return lt == "decimal"
    if isinstance(value, _dt.datetime):
        return lt.startswith("timestamp-")
    if isinstance(value, _dt.date):
        return lt == "date"
    if isinstance(value, _dt.time):
        return lt.startswith("time-")
    if isinstance(value, int):
        return name in ("int", "long")
    if isinstance(value, float):
        return name in ("float", "double")
    if isinstance(value, str):
        return name in ("string", "enum")
    if isinstance(value, bytes):
        return name in ("bytes", "fixed")
    if isinstance(value, dict):
        return name in ("record", "map")
    if isinstance(value, list):
        return name == "array"
    return False


def encode_container(
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    records_per_block: int = 1000,
    sync: bytes | None = None,
) -> bytes:
    """Serialize records into one Object Container File.  Deterministic
    when ``sync`` is supplied (fixtures pass a fixed marker so generated
    files are byte-stable across runs)."""
    if sync is None:
        sync = os.urandom(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise ValueError("avro: sync marker must be 16 bytes")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(out, len(meta))
    for k, v in meta.items():
        encode_value(out, "string", k)
        write_long(out, len(v))
        out.write(v)
    write_long(out, 0)
    out.write(sync)
    for start in range(0, len(records), records_per_block):
        chunk = records[start : start + records_per_block]
        body = io.BytesIO()
        for rec in chunk:
            encode_value(body, schema, rec)
        raw = body.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            raw = comp.compress(raw) + comp.flush()
        write_long(out, len(chunk))
        write_long(out, len(raw))
        out.write(raw)
        out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# schema resolution (Avro 1.11 spec "Schema Resolution": reading data
# written with an OLD producer schema under the pipeline's current
# reader schema -- match by field name/alias, apply reader defaults,
# promote primitives, skip writer-only fields)
# ---------------------------------------------------------------------------
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}

_NO_DEFAULT = object()


def _unwrap(schema: Any) -> Any:
    """Logical types ride on primitives; resolution sees the primitive
    (the decode_value convention)."""
    if (
        isinstance(schema, dict)
        and schema.get("type") in _PRIMITIVES
        and "fields" not in schema
    ):
        return schema["type"]
    return schema


def _resolvable(writer: Any, reader: Any) -> bool:
    """Can data of ``writer`` be read as ``reader``?  (Shallow check
    used for union branch selection; nested mismatches surface as
    errors during the recursive resolve.)"""
    w, rd = _unwrap(writer), _unwrap(reader)
    if isinstance(rd, list):
        return any(_resolvable(w, b) for b in rd)
    if isinstance(w, list):
        # a writer union matches if any branch could; per-datum the
        # actual branch is checked again at resolve time
        return any(_resolvable(b, rd) for b in w)
    if isinstance(w, str) and isinstance(rd, str):
        return w == rd or rd in _PROMOTIONS.get(w, ())
    if isinstance(w, dict) and isinstance(rd, dict):
        wt, rt = w.get("type"), rd.get("type")
        if wt != rt:
            return False
        if wt in ("record", "enum", "fixed"):
            names = {rd.get("name")} | set(rd.get("aliases", ()))
            return w.get("name") in names
        return True  # array/map: item mismatch surfaces in recursion
    return False


def _promote(value: Any, w: str, rd: str) -> Any:
    if w == rd:
        return value
    if rd not in _PROMOTIONS.get(w, ()):
        raise ValueError(f"avro: cannot promote {w!r} to {rd!r}")
    if rd in ("float", "double"):
        return float(value)
    if w == "string" and rd == "bytes":
        return value.encode("utf-8")
    if w == "bytes" and rd == "string":
        return value.decode("utf-8")
    return value  # int -> long


def resolve_read(
    r: _Reader, writer: Any, reader: Any, logical: bool = False
) -> Any:
    """Decode one value written as ``writer`` but surfaced as
    ``reader`` (Avro 1.11 schema resolution).  Writer-only record
    fields are decoded and discarded (a pure skip walks the same
    bytes); reader-only fields take their declared default.  With
    ``logical=True`` the READER's logical annotations convert (the
    reader schema is the pipeline's declared contract, so its
    logicalType wins; a writer-only annotation surfaces raw)."""
    w, rd = _unwrap(writer), _unwrap(reader)
    if isinstance(w, list):  # writer union: branch index picks the datum
        idx = r.read_long()
        if not 0 <= idx < len(w):
            raise ValueError(f"avro: union branch {idx} out of range")
        return resolve_read(r, w[idx], rd, logical)
    if isinstance(rd, list):  # reader union, writer not: first match wins
        for branch in rd:
            if _resolvable(w, branch):
                return resolve_read(r, w, branch, logical)
        raise ValueError(f"avro: no reader branch accepts writer {w!r}")
    if isinstance(w, str):
        if not isinstance(rd, str):
            raise ValueError(f"avro: writer {w!r} vs reader {rd!r}")
        val = _promote(decode_value(r, w), w, rd)
        if logical and isinstance(reader, dict) and "logicalType" in reader:
            return from_logical(val, reader)
        return val
    wt = w["type"]
    if wt == "record":
        if not _resolvable(w, rd):
            raise ValueError(
                f"avro: record {w.get('name')!r} does not resolve to "
                f"{rd.get('name')!r}"
            )
        by_name: dict[str, Any] = {}
        alias_of = {
            a: f["name"] for f in rd["fields"] for a in f.get("aliases", ())
        }
        reader_fields = {f["name"]: f for f in rd["fields"]}
        for wf in w["fields"]:
            name = wf["name"]
            name = name if name in reader_fields else alias_of.get(name, name)
            rf = reader_fields.get(name)
            if rf is None:  # writer-only: walk the bytes, drop the value
                decode_value(r, wf["type"])
            else:
                by_name[name] = resolve_read(r, wf["type"], rf["type"], logical)
        out = {}
        for rf in rd["fields"]:
            if rf["name"] in by_name:
                out[rf["name"]] = by_name[rf["name"]]
            else:
                dflt = rf.get("default", _NO_DEFAULT)
                if dflt is _NO_DEFAULT:
                    raise ValueError(
                        f"avro: field {rf['name']!r} missing from writer "
                        "schema and reader declares no default"
                    )
                out[rf["name"]] = dflt
        return out
    if wt == "enum":
        sym = w["symbols"][r.read_long()]
        if sym in rd["symbols"]:
            return sym
        dflt = rd.get("default")
        if dflt is None:
            raise ValueError(f"avro: enum symbol {sym!r} unknown to reader")
        return dflt
    if wt == "fixed":
        if rd.get("size") != w["size"]:
            raise ValueError("avro: fixed size mismatch")
        raw = r.read(w["size"])
        if logical and "logicalType" in rd:
            return from_logical(raw, rd)
        return raw
    if wt == "array":
        out_l: list[Any] = []
        while True:
            count = r.read_long()
            if count == 0:
                return out_l
            if count < 0:
                r.read_long()
                count = -count
            for _ in range(count):
                out_l.append(resolve_read(r, w["items"], rd["items"], logical))
    if wt == "map":
        out_m: dict[str, Any] = {}
        while True:
            count = r.read_long()
            if count == 0:
                return out_m
            if count < 0:
                r.read_long()
                count = -count
            for _ in range(count):
                key = r.read_bytes().decode("utf-8")
                out_m[key] = resolve_read(r, w["values"], rd["values"], logical)
    raise ValueError(f"avro: unsupported writer type {wt!r}")


def container_stats(data: bytes) -> dict:
    """HEADER-ONLY statistics for one Object Container File: the
    writer schema's raw bytes (exactly as the producer serialized
    them -- fingerprints must not depend on a re-serialization),
    codec, and the record count summed from BLOCK HEADERS alone (the
    count varint precedes each block's payload, so counting rows costs
    a few bytes per block, never a value decode).  The metadata pass a
    lake census runs over millions of files."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    r.read(SYNC_SIZE)
    n_records = 0
    n_blocks = 0
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        r.read(size + SYNC_SIZE)  # skip payload + sync, no decode
        n_records += n
        n_blocks += 1
    return {
        "schema_json": meta["avro.schema"],
        "codec": meta.get("avro.codec", b"null").decode(),
        "n_records": n_records,
        "n_blocks": n_blocks,
    }
