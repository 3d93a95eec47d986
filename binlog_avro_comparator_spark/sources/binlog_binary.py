"""S2: MySQL binlog BINARY decode -- the one reference stage that was
previously out of engine scope (comparator.sh:91-93 shells out to an
external ``go-binlogparser`` binary and ingests its TEXT; rounds 1-3
started at that text layer).  This module closes the gap with a native
binary-layer source: real binlog v4 bytes in, the parsed-event
contract table out -- no external binary, no text intermediate.

Format knowledge is public (MySQL source/docs: binary log file layout
``0xFE 'bin'`` magic + v4 events with a 19-byte little-endian common
header ``timestamp:4 type:1 server_id:4 event_size:4 log_pos:4
flags:2``).  The decoder understands the event types the comparator's
metadata contract touches:

  FORMAT_DESCRIPTION (15)  skipped (validates the stream start)
  GTID_LOG (33)            SID(16) + GNO(8) -> ``gtid_next``; the
                           7-byte immediate_commit_timestamp (micros)
                           -> ``immediate_commmit_timestamp`` (triple-m
                           contract spelling, quirk Q6); 0 means the
                           field was absent -> NULL
  TABLE_MAP (19)           schema/table names for the FOLLOWING rows
                           event
  WRITE/UPDATE/DELETE_ROWS v2 (30/31/32), XID (16), QUERY (2)
                           the emitted metadata rows (json_parser.go's
                           :56-66 event-type vocabulary)

TWO decode tiers, matching the two consumer contracts:

  decode_binlog_bytes       metadata-only (the reference's contract:
                            compare_timestamps.go:13-22 consumes event
                            metadata; row payloads skipped by
                            event_size -- cheap, no TABLE_MAP state)
  decode_binlog_rows_bytes  row-image decode: TABLE_MAP column types/
                            metadata/optional COLUMN_NAME (the 8.0
                            binlog_row_metadata=FULL TLV) drive a full
                            WRITE/UPDATE/DELETE image parse into a
                            payload map -- the one capability the
                            reference DECLARES (its avro struct carries
                            payload.* -- compare_timestamps.go:57-63)
                            but never checks; operators/compare.py's
                            payload_diff closes that gap.

Scale: ``spark.read.format("binaryFile")`` parallelizes across files
(binlogs rotate, so files are bounded -- the same unit of parallelism
the reference's per-file loop and our text path use); within a file
decoding is inherently sequential (events chain by log_pos), done in
one Arrow-batched mapInPandas pass with pure ``struct`` parsing and no
payload retained after its row is emitted.
"""

from __future__ import annotations

import re
import struct
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MAGIC = b"\xfebin"
HEADER_LEN = 19

# binlog_checksum algorithm codes (public MySQL constants).  Servers
# >= 5.6.1 write the algorithm byte into the FORMAT_DESCRIPTION event
# (last data byte before the FDE's own 4-byte checksum field); when the
# algorithm is CRC32 -- the MySQL 8.0 DEFAULT -- every subsequent event
# carries a 4-byte CRC32 tail INSIDE its event_size that is NOT part of
# the event body.  Without stripping it, the row-image decoder can
# misread the CRC bytes as a phantom all-NULL row image (<= 8-column
# tables) -- a wrong answer, not a skip.
BINLOG_CHECKSUM_ALG_OFF = 0
BINLOG_CHECKSUM_ALG_CRC32 = 1
BINLOG_CHECKSUM_ALG_UNDEF = 0xFF
_CHECKSUM_MIN_VERSION = (5, 6, 1)

ROTATE_EVENT = 4  # payload: 8-byte LE first-position + next file name
FORMAT_DESCRIPTION_EVENT = 15
XID_EVENT = 16
QUERY_EVENT = 2
TABLE_MAP_EVENT = 19
WRITE_ROWS_EVENT_V2 = 30
UPDATE_ROWS_EVENT_V2 = 31
DELETE_ROWS_EVENT_V2 = 32
GTID_LOG_EVENT = 33
# MySQL 8.0.20+ binlog_transaction_compression wraps a transaction's
# events in one Transaction_payload_event (public libbinlogevents
# layout: TLV header fields + the embedded event stream)
TRANSACTION_PAYLOAD_EVENT = 40
# TLV field types (OTW_PAYLOAD_*): 0 = header-end mark, 1 = payload
# size, 2 = compression type, 3 = uncompressed size
_TX_FIELD_END, _TX_FIELD_SIZE = 0, 1
_TX_FIELD_COMPRESSION, _TX_FIELD_UNCOMP_SIZE = 2, 3
TX_COMPRESSION_ZSTD = 0
TX_COMPRESSION_NONE = 255

_ROWS_NAMES = {
    WRITE_ROWS_EVENT_V2: "WriteRowsEventV2",
    UPDATE_ROWS_EVENT_V2: "UpdateRowsEventV2",
    DELETE_ROWS_EVENT_V2: "DeleteRowsEventV2",
}

# MySQL column type codes (public protocol constants) -- the subset the
# row-image decoder understands.  Anything else aborts that event's row
# decode (the field length would be unknowable), warn-and-skip style.
MYSQL_TYPE_TINY = 1
MYSQL_TYPE_SHORT = 2
MYSQL_TYPE_LONG = 3
MYSQL_TYPE_FLOAT = 4
MYSQL_TYPE_DOUBLE = 5
MYSQL_TYPE_LONGLONG = 8
MYSQL_TYPE_INT24 = 9
MYSQL_TYPE_TIMESTAMP = 7  # legacy pre-5.6.4: 4-byte LE epoch seconds
MYSQL_TYPE_DATE = 10
MYSQL_TYPE_TIME = 11  # legacy: 3-byte LE HHMMSS decimal
MYSQL_TYPE_DATETIME = 12  # legacy: 8-byte LE YYYYMMDDHHMMSS decimal
MYSQL_TYPE_YEAR = 13
MYSQL_TYPE_VARCHAR = 15
MYSQL_TYPE_BIT = 16
# the 5.6.4+ temporal formats real CDC tables actually carry (big-endian
# packed integers + fractional-second tail, public my_time layout)
MYSQL_TYPE_TIMESTAMP2 = 17
MYSQL_TYPE_DATETIME2 = 18
MYSQL_TYPE_TIME2 = 19
MYSQL_TYPE_JSON = 245  # binary JSON document (public json_binary layout)
MYSQL_TYPE_NEWDECIMAL = 246
MYSQL_TYPE_ENUM = 247  # appears in TABLE_MAP as STRING + real-type meta
MYSQL_TYPE_SET = 248  # ditto
MYSQL_TYPE_BLOB = 252  # all BLOB/TEXT variants map here in binlogs
MYSQL_TYPE_STRING = 254  # CHAR; meta byte0 carries ENUM/SET real type
MYSQL_TYPE_GEOMETRY = 255  # length-prefixed SRID + WKB

# TABLE_MAP optional-metadata TLV types (public MySQL 8.0 format):
# SIGNEDNESS (always written when the table has numeric columns; one
# bit per NUMERIC column, MSB-first) and COLUMN_NAME
# (binlog_row_metadata=FULL).
_OPTMETA_SIGNEDNESS = 1
_OPTMETA_COLUMN_NAME = 4

# the column types that consume a SIGNEDNESS bit (the set the public
# replication clients use; one bit per such column, in column order)
_NUMERIC_TYPES = {
    MYSQL_TYPE_TINY, MYSQL_TYPE_SHORT, MYSQL_TYPE_INT24, MYSQL_TYPE_LONG,
    MYSQL_TYPE_LONGLONG, MYSQL_TYPE_FLOAT, MYSQL_TYPE_DOUBLE,
    MYSQL_TYPE_NEWDECIMAL,
}

# Fixture payload columns: the five the reference's avro contract
# declares (compare_timestamps.go:57-63).  VARCHAR metadata = max byte
# length (< 256 -> 1-byte value length prefix); customer_name is the
# one nullable column (null-bitmap coverage).
PAYLOAD_COLUMNS = [
    ("order_id", MYSQL_TYPE_LONG, None),
    ("customer_name", MYSQL_TYPE_VARCHAR, 64),
    ("product_name", MYSQL_TYPE_VARCHAR, 64),
    ("quantity", MYSQL_TYPE_LONG, None),
    ("order_timestamp", MYSQL_TYPE_LONGLONG, None),
]

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("line_no", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("immediate_commmit_timestamp", T.StringType()),
        T.StructField("log_position", T.LongType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("gtid_next", T.StringType()),
    ]
)


# --- encode (fixture/test side) -------------------------------------------

def _header(ts_sec: int, type_code: int, payload_len: int, log_pos: int) -> bytes:
    return struct.pack(
        "<IBIIIH", ts_sec & 0xFFFFFFFF, type_code, 1, HEADER_LEN + payload_len,
        log_pos & 0xFFFFFFFF, 0,
    )


def _event(ts_sec: int, type_code: int, payload: bytes, log_pos: int) -> bytes:
    return _header(ts_sec, type_code, len(payload), log_pos) + payload


def _fde(ts_sec: int, checksum_alg: int | None = None) -> bytes:
    payload = (
        struct.pack("<H", 4)
        + b"8.0.0-synthetic".ljust(50, b"\x00")
        + struct.pack("<I", ts_sec & 0xFFFFFFFF)
        + bytes([HEADER_LEN])
        + bytes(39)  # post-header length table, skipped via event_size
        # checksum-algorithm descriptor byte (5.6.1+ layout); the 4-byte
        # checksum field that completes the [alg][crc32] tail is added
        # by the _with_crc post-pass in encode_binlog_file
        + (b"" if checksum_alg is None else bytes([checksum_alg]))
    )
    return _event(ts_sec, FORMAT_DESCRIPTION_EVENT, payload, 0)


def _with_crc(ev: bytes) -> bytes:
    """Append the BINLOG_CHECKSUM_ALG_CRC32 tail to one encoded event:
    event_size grows by 4 (the checksum is INSIDE the declared size,
    like real servers write it) and the CRC32 covers the whole event as
    written -- updated header + body -- excluding the checksum itself."""
    ts, code, srv, size, pos, flags = struct.unpack_from("<IBIIIH", ev, 0)
    out = struct.pack("<IBIIIH", ts, code, srv, size + 4, pos, flags) + ev[HEADER_LEN:]
    return out + struct.pack("<I", zlib.crc32(out))


def _gtid(ts_sec: int, sid: bytes, gno: int, ict_us: int, log_pos: int) -> bytes:
    # realistic replica shape: bit 55 of the 7-byte field is the
    # 'original commit timestamp follows' FLAG (set on any binlog a
    # replica wrote), with the 7-byte original timestamp appended --
    # encoding it exercises the decoder's flag strip on every fixture
    ict7 = (ict_us & ((1 << 55) - 1)) | (1 << 55)
    payload = (
        bytes([1])                      # commit flag
        + sid                           # 16-byte SID
        + struct.pack("<q", gno)
        + bytes([2])                    # logical timestamp typecode
        + struct.pack("<qq", 0, 0)      # last_committed, sequence_number
        + struct.pack("<Q", ict7)[:7]   # 7-byte micros + flag bit 55
        + struct.pack("<Q", ict_us & ((1 << 55) - 1))[:7]  # original ts
    )
    return _event(ts_sec, GTID_LOG_EVENT, payload, log_pos)


def _lenenc(n: int) -> bytes:
    """MySQL length-encoded integer (public wire format)."""
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _table_map(ts_sec: int, schema: str, table: str, log_pos: int) -> bytes:
    s, t = schema.encode(), table.encode()
    payload = (
        struct.pack("<IH", 1, 0) + b"\x00\x00"  # table_id(6) + flags(2)
        + bytes([len(s)]) + s + b"\x00"
        + bytes([len(t)]) + t + b"\x00"
        + bytes([1, 3])                 # 1 column, type LONG
        + bytes([0])                    # metadata block length 0
        + bytes([0])                    # null bitmap
    )
    return _event(ts_sec, TABLE_MAP_EVENT, payload, log_pos)


def _table_map_payload(ts_sec: int, schema: str, table: str, log_pos: int) -> bytes:
    """TABLE_MAP declaring the PAYLOAD_COLUMNS shape: column types,
    per-type metadata (VARCHAR max length, 2 bytes LE), null bitmap
    (customer_name nullable), and the MySQL 8.0 optional-metadata TLV
    carrying COLUMN_NAME (binlog_row_metadata=FULL) so the decoder can
    emit a named payload map instead of positional c0..c4."""
    s, t = schema.encode(), table.encode()
    meta = b"".join(
        struct.pack("<H", m) for _, typ, m in PAYLOAD_COLUMNS
        if typ == MYSQL_TYPE_VARCHAR
    )
    null_bitmap = 0
    for i, (name, _, _) in enumerate(PAYLOAD_COLUMNS):
        if name == "customer_name":
            null_bitmap |= 1 << i
    names_blob = b"".join(
        _lenenc(len(n.encode())) + n.encode() for n, _, _ in PAYLOAD_COLUMNS
    )
    payload = (
        struct.pack("<IH", 1, 0) + b"\x00\x00"  # table_id(6) + flags(2)
        + bytes([len(s)]) + s + b"\x00"
        + bytes([len(t)]) + t + b"\x00"
        + _lenenc(len(PAYLOAD_COLUMNS))
        + bytes(typ for _, typ, _ in PAYLOAD_COLUMNS)
        + _lenenc(len(meta)) + meta
        + bytes([null_bitmap])
        + bytes([_OPTMETA_COLUMN_NAME]) + _lenenc(len(names_blob)) + names_blob
    )
    return _event(ts_sec, TABLE_MAP_EVENT, payload, log_pos)


def _encode_image(values: tuple) -> bytes:
    """One row image for the PAYLOAD_COLUMNS shape: null bitmap over
    the (all-present) columns, then each non-null value in declared
    order -- LONG as <i, LONGLONG as <q, VARCHAR as 1-byte-len + utf8
    (max length < 256)."""
    null_bits = 0
    out = []
    for i, ((_, typ, _), v) in enumerate(zip(PAYLOAD_COLUMNS, values)):
        if v is None:
            null_bits |= 1 << i
            continue
        if typ == MYSQL_TYPE_LONG:
            out.append(struct.pack("<i", int(v)))
        elif typ == MYSQL_TYPE_LONGLONG:
            out.append(struct.pack("<q", int(v)))
        else:  # VARCHAR, max < 256
            b = str(v).encode()
            out.append(bytes([len(b)]) + b)
    return bytes([null_bits]) + b"".join(out)


def _rows_payload(
    ts_sec: int, type_code: int, log_pos: int, images: list[tuple]
) -> bytes:
    """Rows event v2 with GENUINE row images (vs the metadata-only
    ``_rows`` stub): full columns-present bitmaps and one encoded image
    per entry in ``images`` (UPDATE passes before/after alternating)."""
    present = bytes([(1 << len(PAYLOAD_COLUMNS)) - 1])
    payload = (
        struct.pack("<IH", 1, 0) + b"\x00\x00"  # table_id(6) + flags(2)
        + struct.pack("<H", 2)          # v2 extra-info length (incl. itself)
        + _lenenc(len(PAYLOAD_COLUMNS))
        + present
    )
    if type_code == UPDATE_ROWS_EVENT_V2:
        payload += present              # after-image columns bitmap
    payload += b"".join(_encode_image(img) for img in images)
    return _event(ts_sec, type_code, payload, log_pos)


def _rows(ts_sec: int, type_code: int, log_pos: int) -> bytes:
    payload = (
        struct.pack("<IH", 1, 0) + b"\x00\x00"  # table_id(6) + flags(2)
        + struct.pack("<H", 2)          # v2 extra-info length (incl. itself)
        + bytes([1])                    # column count (lenenc, 1)
        + bytes([1])                    # columns-present bitmap
    )
    if type_code == UPDATE_ROWS_EVENT_V2:
        payload += bytes([1])           # after-image bitmap
    return _event(ts_sec, type_code, payload, log_pos)


# --- typed fixture (extended column types) --------------------------------
# A second fixture table exercising the column types real CDC tables
# carry beyond the 8-type reference subset: temporal2 formats, packed
# decimal, TEXT/BLOB, CHAR, ENUM, SET.  meta is the RAW TABLE_MAP
# metadata bytes for the column (discrete bytes, first-byte-high for
# NEWDECIMAL/STRING -- matching _META_BE on the decode side).
TYPED_COLUMNS = [
    ("t_id", MYSQL_TYPE_LONG, b""),
    ("t_date", MYSQL_TYPE_DATE, b""),
    ("t_year", MYSQL_TYPE_YEAR, b""),
    ("t_dt", MYSQL_TYPE_DATETIME2, bytes([3])),       # DATETIME(3)
    ("t_ts", MYSQL_TYPE_TIMESTAMP2, bytes([0])),      # TIMESTAMP(0)
    ("t_time", MYSQL_TYPE_TIME2, bytes([0])),         # TIME(0)
    ("t_dec", MYSQL_TYPE_NEWDECIMAL, bytes([12, 2])),  # DECIMAL(12,2)
    ("t_text", MYSQL_TYPE_BLOB, bytes([2])),          # TEXT (2B length)
    ("t_char", MYSQL_TYPE_STRING, bytes([MYSQL_TYPE_STRING, 80])),  # CHAR(20) utf8mb4
    ("t_enum", MYSQL_TYPE_STRING, bytes([MYSQL_TYPE_ENUM, 1])),
    ("t_set", MYSQL_TYPE_STRING, bytes([MYSQL_TYPE_SET, 1])),
    ("t_json", MYSQL_TYPE_JSON, bytes([4])),
    ("t_u8", MYSQL_TYPE_TINY, b""),        # TINYINT UNSIGNED
    ("t_u64", MYSQL_TYPE_LONGLONG, b""),   # BIGINT UNSIGNED (> 2^63)
    ("t_geo", MYSQL_TYPE_GEOMETRY, bytes([4])),  # POINT
]
TYPED_NULLABLE = {"t_text"}
TYPED_UNSIGNED = {"t_u8", "t_u64"}
TYPED_SCHEMA_NAME, TYPED_TABLE_NAME = "tdb", "typed"


def _encode_decimal(s: str, precision: int, scale: int) -> bytes:
    """Inverse of _decode_decimal: canonical decimal string -> packed
    bytes (big-endian 9-digit groups, sign in the first byte's MSB,
    negative values fully inverted)."""
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    ip, _, fp = s.partition(".")
    fp = (fp + "0" * scale)[:scale]
    intg = precision - scale
    ip = ip.zfill(intg) if intg else ""
    intg0, frac0 = intg // 9, scale // 9
    intg0x, frac0x = intg - intg0 * 9, scale - frac0 * 9
    buf = bytearray()
    if intg0x:
        buf += int(ip[:intg0x] or "0").to_bytes(_DEC_DIG2BYTES[intg0x], "big")
        ip = ip[intg0x:]
    for i in range(intg0):
        buf += int(ip[i * 9 : (i + 1) * 9] or "0").to_bytes(4, "big")
    for i in range(frac0):
        buf += int(fp[i * 9 : (i + 1) * 9]).to_bytes(4, "big")
    if frac0x:
        buf += int(fp[frac0 * 9 : frac0 * 9 + frac0x]).to_bytes(
            _DEC_DIG2BYTES[frac0x], "big"
        )
    if neg:
        for i in range(len(buf)):
            buf[i] = ~buf[i] & 0xFF
    buf[0] ^= 0x80
    return bytes(buf)


def _encode_frac(micros: int, fsp: int) -> bytes:
    n = _frac_bytes(fsp)
    return (micros // 10 ** (6 - 2 * n)).to_bytes(n, "big") if n else b""


def _split_dt(s: str) -> tuple[int, int, int, int, int, int, int]:
    """'YYYY-MM-DD HH:MM:SS[.f]' -> (y, mo, d, h, mi, sec, micros)."""
    date_part, time_part = s.split(" ")
    y, mo, d = (int(x) for x in date_part.split("-"))
    hms, _, fr = time_part.partition(".")
    h, mi, sec = (int(x) for x in hms.split(":"))
    return y, mo, d, h, mi, sec, int((fr + "000000")[:6]) if fr else 0


def _encode_typed_value(typ: int, meta: bytes, v: str) -> bytes:
    """Canonical string (the exact _decode_value rendering) -> row-image
    bytes for one column.  The encode/decode pair is the roundtrip the
    typed-fixture tests pin."""
    if typ == MYSQL_TYPE_TINY:
        return (int(v) & 0xFF).to_bytes(1, "little")
    if typ == MYSQL_TYPE_SHORT:
        return (int(v) & 0xFFFF).to_bytes(2, "little")
    if typ == MYSQL_TYPE_INT24:
        return (int(v) & 0xFFFFFF).to_bytes(3, "little")
    if typ == MYSQL_TYPE_LONG:
        return (int(v) & 0xFFFFFFFF).to_bytes(4, "little")
    if typ == MYSQL_TYPE_LONGLONG:
        return (int(v) & (1 << 64) - 1).to_bytes(8, "little")
    if typ == MYSQL_TYPE_DATE:
        y, mo, d = (int(x) for x in v.split("-"))
        return ((y << 9) | (mo << 5) | d).to_bytes(3, "little")
    if typ == MYSQL_TYPE_TIMESTAMP:
        y, mo, d, h, mi, sec, _ = _split_dt(v)
        epoch = int(
            datetime(y, mo, d, h, mi, sec, tzinfo=timezone.utc).timestamp()
        )
        return epoch.to_bytes(4, "little")
    if typ == MYSQL_TYPE_DATETIME:
        y, mo, d, h, mi, sec, _ = _split_dt(v)
        n = ((y * 100 + mo) * 100 + d) * 1_000_000 + (h * 100 + mi) * 100 + sec
        return n.to_bytes(8, "little")
    if typ == MYSQL_TYPE_TIME:
        neg = v.startswith("-")
        h, mi, sec = (int(x) for x in v.lstrip("-").split(":"))
        n = h * 10000 + mi * 100 + sec
        if neg:
            n = -n
        return (n & 0xFFFFFF).to_bytes(3, "little")
    if typ == MYSQL_TYPE_BIT:
        nbits = meta[0] + meta[1] * 8  # meta = [bits % 8][whole bytes]
        return int(v).to_bytes((nbits + 7) // 8, "big")
    if typ == MYSQL_TYPE_YEAR:
        return bytes([0 if v == "0000" else int(v) - 1900])
    if typ == MYSQL_TYPE_DATETIME2:
        fsp = meta[0]
        y, mo, d, h, mi, sec, micros = _split_dt(v)
        packed = (
            (((y * 13 + mo) & 0x1FFFF) << 22)
            | (d << 17) | (h << 12) | (mi << 6) | sec
        )
        return (packed + 0x8000000000).to_bytes(5, "big") + _encode_frac(micros, fsp)
    if typ == MYSQL_TYPE_TIMESTAMP2:
        fsp = meta[0]
        y, mo, d, h, mi, sec, micros = _split_dt(v)
        epoch = int(
            datetime(y, mo, d, h, mi, sec, tzinfo=timezone.utc).timestamp()
        )
        return epoch.to_bytes(4, "big") + _encode_frac(micros, fsp)
    if typ == MYSQL_TYPE_TIME2:
        fsp = meta[0]
        neg = v.startswith("-")
        if neg:
            v = v[1:]
        hms_s, _, fr = v.partition(".")
        h, mi, sec = (int(x) for x in hms_s.split(":"))
        micros = int((fr + "000000")[:6]) if fr else 0
        hms = (h << 12) | (mi << 6) | sec
        if fsp >= 5:
            packed = (hms << 24) + micros
            if neg:
                packed = -packed
            return (packed + 0x800000000000).to_bytes(6, "big")
        n = _frac_bytes(fsp)
        frac_units = micros // 10 ** (6 - 2 * n) if n else 0
        if neg and frac_units:
            intpart, frac = -hms - 1, (1 << (8 * n)) - frac_units
        else:
            intpart, frac = (-hms if neg else hms), frac_units
        out = (intpart + 0x800000).to_bytes(3, "big")
        return out + (frac.to_bytes(n, "big") if n else b"")
    if typ == MYSQL_TYPE_NEWDECIMAL:
        return _encode_decimal(v, meta[0], meta[1])
    if typ == MYSQL_TYPE_BLOB:
        b = v.encode()
        return len(b).to_bytes(meta[0], "little") + b
    if typ == MYSQL_TYPE_JSON:
        import json as _json

        doc = _encode_json_doc(_json.loads(v))
        return len(doc).to_bytes(meta[0], "little") + doc
    if typ == MYSQL_TYPE_GEOMETRY:
        m = re.fullmatch(r"SRID=(\d+);POINT\(([^ ]+) ([^)]+)\)", v)
        if m:
            blob = (
                int(m.group(1)).to_bytes(4, "little")
                + bytes([1])
                + (1).to_bytes(4, "little")
                + struct.pack("<dd", float(m.group(2)), float(m.group(3)))
            )
        else:
            mh = re.fullmatch(r"SRID=(\d+);0x([0-9A-Fa-f]*)", v)
            blob = int(mh.group(1)).to_bytes(4, "little") + bytes.fromhex(
                mh.group(2)
            )
        return len(blob).to_bytes(meta[0], "little") + blob
    if typ == MYSQL_TYPE_STRING:
        real = meta[0]
        if real in (MYSQL_TYPE_ENUM, MYSQL_TYPE_SET):
            return int(v).to_bytes(meta[1], "little")
        b = v.encode()
        w = 2 if meta[1] > 255 else 1
        return len(b).to_bytes(w, "little") + b
    raise ValueError(f"unsupported typed column type {typ}")


def _table_map_typed(ts_sec: int, log_pos: int) -> bytes:
    """TABLE_MAP declaring the TYPED_COLUMNS shape (same structure as
    _table_map_payload: types + raw per-type metadata + null bitmap +
    the COLUMN_NAME optional-metadata TLV)."""
    s, t = TYPED_SCHEMA_NAME.encode(), TYPED_TABLE_NAME.encode()
    meta = b"".join(m for _, _, m in TYPED_COLUMNS)
    null_bitmap = 0
    for i, (name, _, _) in enumerate(TYPED_COLUMNS):
        if name in TYPED_NULLABLE:
            null_bitmap |= 1 << i
    names_blob = b"".join(
        _lenenc(len(n.encode())) + n.encode() for n, _, _ in TYPED_COLUMNS
    )
    # SIGNEDNESS TLV: one bit per numeric column (MSB-first), set for
    # the TYPED_UNSIGNED columns -- what real servers always write
    sign_bits = bytearray()
    bit = 0
    for name, typ, _ in TYPED_COLUMNS:
        if typ not in _NUMERIC_TYPES:
            continue
        if bit % 8 == 0:
            sign_bits.append(0)
        if name in TYPED_UNSIGNED:
            sign_bits[bit // 8] |= 1 << (7 - bit % 8)
        bit += 1
    nb_len = (len(TYPED_COLUMNS) + 7) // 8
    payload = (
        struct.pack("<IH", 2, 0) + b"\x00\x00"  # table_id=2 + flags
        + bytes([len(s)]) + s + b"\x00"
        + bytes([len(t)]) + t + b"\x00"
        + _lenenc(len(TYPED_COLUMNS))
        + bytes(typ for _, typ, _ in TYPED_COLUMNS)
        + _lenenc(len(meta)) + meta
        + null_bitmap.to_bytes(nb_len, "little")
        + bytes([_OPTMETA_SIGNEDNESS]) + _lenenc(len(sign_bits))
        + bytes(sign_bits)
        + bytes([_OPTMETA_COLUMN_NAME]) + _lenenc(len(names_blob)) + names_blob
    )
    return _event(ts_sec, TABLE_MAP_EVENT, payload, log_pos)


def _typed_rows_event(ts_sec: int, log_pos: int, values: dict) -> bytes:
    """WRITE rows event v2 with ONE image over the TYPED_COLUMNS
    shape; ``values`` maps column name -> canonical string (None =
    SQL NULL, must be a TYPED_NULLABLE column)."""
    n = len(TYPED_COLUMNS)
    nb_len = (n + 7) // 8
    present = ((1 << n) - 1).to_bytes(nb_len, "little")
    null_bits = 0
    out = []
    for i, (name, typ, meta) in enumerate(TYPED_COLUMNS):
        v = values.get(name)
        if v is None:
            null_bits |= 1 << i
            continue
        out.append(_encode_typed_value(typ, meta, str(v)))
    payload = (
        struct.pack("<IH", 2, 0) + b"\x00\x00"
        + struct.pack("<H", 2)
        + _lenenc(n)
        + present
        + null_bits.to_bytes(nb_len, "little")
        + b"".join(out)
    )
    return _event(ts_sec, WRITE_ROWS_EVENT_V2, payload, log_pos)


def encode_typed_binlog_file(rows: list[dict], checksum: bool = False) -> bytes:
    """Render typed-fixture rows (one file, line order) as a binlog v4
    stream: magic + FDE, then per row GTID + typed TABLE_MAP + a WRITE
    rows event carrying the row's image.  Each dict needs ``timestamp``
    (RFC3339 Z), ``log_position``, ``line_no`` and the TYPED_COLUMNS
    value strings.  ``checksum`` mirrors encode_binlog_file."""
    alg = BINLOG_CHECKSUM_ALG_CRC32 if checksum else None
    if not rows:
        blob = _fde(0, alg)
        return MAGIC + (_with_crc(blob) if checksum else blob)
    out = [_fde(_parse_ts_sec(rows[0]["timestamp"]), alg)]
    for r in rows:
        ts = _parse_ts_sec(r["timestamp"])
        pos = int(r["log_position"])
        out.append(_gtid(ts, FIXTURE_SID, int(r["line_no"]) + 1, 0, pos))
        out.append(_table_map_typed(ts, pos))
        out.append(_typed_rows_event(ts, pos, r))
    if checksum:
        return MAGIC + b"".join(_with_crc(e) for e in out)
    return MAGIC + b"".join(out)


def tx_payload_event(
    ts_sec: int,
    log_pos: int,
    inner: bytes,
    compression: int = TX_COMPRESSION_NONE,
) -> bytes:
    """Transaction_payload_event wrapping an embedded event stream
    (headers included, no magic, no per-event checksums -- the wrapped
    shape MySQL 8.0.20+ binlog_transaction_compression writes).  TLV
    fields: compression type, uncompressed size, payload size,
    header-end mark, then the (possibly compressed) payload.
    ``compression=TX_COMPRESSION_ZSTD`` requires an importable zstd
    codec (fixture-side only; raises ImportError without one)."""
    payload = inner
    if compression == TX_COMPRESSION_ZSTD:
        try:
            import zstandard

            payload = zstandard.ZstdCompressor().compress(inner)
        except ImportError:
            from compression import zstd

            payload = zstd.compress(inner)

    def fld(t: int, v: int) -> bytes:
        vb = v.to_bytes(max(1, (v.bit_length() + 7) // 8), "little")
        return _lenenc(t) + _lenenc(len(vb)) + vb

    tlv = (
        fld(_TX_FIELD_COMPRESSION, compression)
        + fld(_TX_FIELD_UNCOMP_SIZE, len(inner))
        + fld(_TX_FIELD_SIZE, len(payload))
        + _lenenc(_TX_FIELD_END)
    )
    return _event(ts_sec, TRANSACTION_PAYLOAD_EVENT, tlv + payload, log_pos)


def _xid(ts_sec: int, xid: int, log_pos: int) -> bytes:
    return _event(ts_sec, XID_EVENT, struct.pack("<Q", xid & (2**64 - 1)), log_pos)


def _rotate(ts_sec: int, next_file: str, log_pos: int) -> bytes:
    """ROTATE_EVENT (public Rotate_log_event layout): 8-byte LE
    position of the first event in the next file (always 4, right
    after the magic) + the next file's name, NOT null-terminated --
    the last event a server writes into a finishing segment."""
    return _event(
        ts_sec, ROTATE_EVENT, struct.pack("<Q", 4) + next_file.encode(), log_pos
    )


def _query(ts_sec: int, schema: str, log_pos: int) -> bytes:
    # realistic server shape: a non-empty status-variable block
    # (Q_FLAGS2 = type 0x00 + uint32) sits between the post-header and
    # the schema name on every real MySQL Query event -- encoding it
    # exercises the decoder's status_vars_length skip on every fixture
    s = schema.encode()
    status = bytes([0x00]) + struct.pack("<I", 0)  # Q_FLAGS2
    payload = (
        struct.pack("<IIBHH", 1, 0, len(s), 0, len(status))
        + status + s + b"\x00" + b"BEGIN"
    )
    return _event(ts_sec, QUERY_EVENT, payload, log_pos)


FIXTURE_SID = bytes.fromhex("0f8e1a243b5c4d6e8f90a1b2c3d4e5f6")
FIXTURE_SID_STR = "0f8e1a24-3b5c-4d6e-8f90-a1b2c3d4e5f6"


def _parse_ts_sec(rfc3339: str) -> int:
    dt = datetime.strptime(rfc3339, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp())


def _parse_ict_us(ict: str | None) -> int:
    if not ict:
        return 0  # encoded zero = field absent (decoder maps back to NULL)
    dt = datetime.strptime(ict, "%Y-%m-%dT%H:%M:%S.%fZ").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp()) * 1_000_000 + dt.microsecond


def encode_binlog_file(
    events: list[dict], checksum: bool = False, next_file: str | None = None
) -> bytes:
    """Render derived contract events (one file's worth, already in
    line order) as a real binlog v4 byte stream: magic + FDE, then per
    event a GTID_LOG (gtid_next + immediate commit timestamp), a
    TABLE_MAP for rows events, and the event itself.  ``events`` dicts
    carry the derive_binlog_events columns plus ``line_no`` (GNO =
    line_no + 1 -- GTID sequence numbers are >= 1).

    ``checksum=True`` emits the ``binlog_checksum=CRC32`` on-disk shape
    (the MySQL 8.0 default): the FDE declares ALG_CRC32 in its
    checksum-algorithm byte and EVERY event -- the FDE included --
    carries a real CRC32 tail inside its event_size.  ``checksum=False``
    keeps the legacy byte-exact checksum-free output (alg byte absent;
    the all-zero post-header table reads as ALG_OFF at body[-5], which
    is also what a genuine server writes there when checksums are off).

    ``next_file``: append a ROTATE_EVENT naming the next segment as
    the final event -- what a real server writes when the segment
    closes (the contract `ls -v` ordering silently assumes,
    comparator.sh:85-100, and the chain rotate_chain_audit verifies).
    Omitted (None) = the segment reads as the still-active tail."""
    alg = BINLOG_CHECKSUM_ALG_CRC32 if checksum else None
    if not events:
        blob = _fde(0, alg)
        if next_file is not None:
            rot = _rotate(0, next_file, 0)
            return MAGIC + (
                _with_crc(blob) + _with_crc(rot) if checksum else blob + rot
            )
        return MAGIC + (_with_crc(blob) if checksum else blob)
    out = [MAGIC, _fde(_parse_ts_sec(events[0]["timestamp"]), alg)]
    for ev in events:
        ts = _parse_ts_sec(ev["timestamp"])
        pos = int(ev["log_position"])
        gno = int(ev["line_no"]) + 1
        out.append(
            _gtid(ts, FIXTURE_SID, gno, _parse_ict_us(ev["immediate_commmit_timestamp"]), pos)
        )
        et = ev["event_type"]
        if et in _ROWS_NAMES.values():
            code = {v: k for k, v in _ROWS_NAMES.items()}[et]
            # payload-bearing event dicts (derive_binlog_events_with_payload)
            # get the full-fidelity encoding: typed TABLE_MAP + genuine row
            # images; metadata-only dicts keep the legacy stub bytes so the
            # existing byte-golden fixtures are unchanged
            if ev.get("order_timestamp") is not None:
                after = (
                    ev["order_id"], ev["customer_name"], ev["product_name"],
                    ev["quantity"], ev["order_timestamp"],
                )
                if code == WRITE_ROWS_EVENT_V2:
                    images = [after]
                elif code == UPDATE_ROWS_EVENT_V2:
                    before = (
                        ev["order_id"], ev["customer_name"], ev["product_name"],
                        ev["before_quantity"], ev["before_order_timestamp"],
                    )
                    images = [before, after]
                else:  # DELETE: the removed row is the before image
                    images = [after]
                out.append(_table_map_payload(ts, ev["schema"], ev["table"], pos))
                out.append(_rows_payload(ts, code, pos, images))
            else:
                out.append(_table_map(ts, ev["schema"], ev["table"], pos))
                out.append(_rows(ts, code, pos))
        elif et == "XID":
            out.append(_xid(ts, int(ev["line_no"]), pos))
        else:  # Query and anything else the header vocabulary folds there
            out.append(_query(ts, ev["schema"], pos))
    if next_file is not None:
        out.append(
            _rotate(_parse_ts_sec(events[-1]["timestamp"]), next_file, 0)
        )
    if checksum:
        return out[0] + b"".join(_with_crc(e) for e in out[1:])
    return b"".join(out)


# --- decode (the engine source) -------------------------------------------

def _fmt_ts(sec: int) -> str:
    return datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _fmt_ict(us: int) -> str:
    dt = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{us % 1_000_000:06d}Z"


def _sid_str(sid: bytes) -> str:
    h = sid.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def _fde_checksum_alg(body: bytes) -> int:
    """FORMAT_DESCRIPTION body -> checksum algorithm.  Public layout:
    binlog_version:2 server_version:50 create_ts:4 header_len:1
    post-header-length table, then -- on servers >= 5.6.1, which is
    when binlog_checksum shipped -- the algorithm byte at body[-5]
    followed by the FDE's own 4-byte checksum field (present even when
    the algorithm is OFF, per the server's FDE write path; this is the
    same unconditional body[-5] read mysqlbinlog and the public
    replication clients use).  Pre-5.6.1 servers (and bodies too short
    to carry the tail) have no checksum support -> OFF."""
    if len(body) < 57 + 5:
        return BINLOG_CHECKSUM_ALG_OFF
    ver = body[2:52].split(b"\x00", 1)[0].decode("ascii", "replace")
    m = re.match(r"(\d+)\.(\d+)\.(\d+)", ver)
    if m is None or tuple(int(g) for g in m.groups()) < _CHECKSUM_MIN_VERSION:
        return BINLOG_CHECKSUM_ALG_OFF
    return body[-5]


def _transaction_payload_fields(body: bytes):
    """Transaction_payload_event body -> (compression_type,
    payload_bytes); None on malformation.  TLV header: repeated
    [type:lenenc][length:lenenc][value:length bytes] fields (integer
    values little-endian) until the header-end mark (type 0, no
    length), then the embedded payload."""
    p = 0
    ctype = None
    psize = None
    while True:
        r = _read_lenenc(body, p)
        if r is None:
            return None
        t, p = r
        if t == _TX_FIELD_END:
            break
        r = _read_lenenc(body, p)
        if r is None:
            return None
        ln, p = r
        if p + ln > len(body):
            return None
        val = int.from_bytes(body[p : p + ln], "little")
        p += ln
        if t == _TX_FIELD_SIZE:
            psize = val
        elif t == _TX_FIELD_COMPRESSION:
            ctype = val
        # _TX_FIELD_UNCOMP_SIZE is advisory
    payload = body[p : p + psize] if psize is not None else body[p:]
    return ctype, payload


def _zstd_decompress(data: bytes) -> bytes | None:
    """zstd if a codec is importable (the ``zstandard`` package or the
    3.14+ ``compression.zstd`` stdlib module), else None -- the caller
    turns None into a COUNTED skip rather than a silent one."""
    try:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(data)
    except ImportError:
        pass
    except Exception:
        return None  # corrupt frame: counted skip, never raise
    try:
        from compression import zstd

        return zstd.decompress(data)
    except ImportError:
        return None
    except Exception:
        return None


def _iter_events(
    data: bytes, stats: dict | None = None, state: dict | None = None
) -> Iterator[tuple[int, int, int, bytes]]:
    """Walk a binlog v4 byte stream -> (ts_sec, code, log_pos, body)
    per event, with checksum handling centralized so no consumer ever
    sees CRC bytes as payload: the FORMAT_DESCRIPTION event's
    checksum-algorithm byte arms CRC32 mode, after which every event's
    4-byte tail is VERIFIED (zlib.crc32 over the event as written;
    mismatch => warn-and-skip that event, keep scanning -- the header
    chain is still intact) and stripped before the body is yielded.
    Same tolerance contract as before: a truncated trailing event stops
    the walk, never raises.

    Transaction_payload_event (compressed transactions, MySQL 8.0.20+)
    is unwrapped transparently: the embedded event stream -- which
    carries NO per-event checksums; the outer event's CRC covers it --
    is yielded event by event.  A zstd payload with no importable
    codec, or a corrupt TLV/frame, is a COUNTED skip via ``stats``
    (keys ``compressed_tx_skipped`` / ``crc_failed``), never a silent
    one and never a raise.

    ``state`` (r8, the byte-offset stream tail): when given, the walk
    starts at ``state['pos']`` (default: after the magic) with CRC
    mode seeded from ``state['crc']`` -- the two pieces of walk-level
    context a mid-file resume must carry, since the FDE that arms CRC
    mode only exists at the file head -- and writes both back as it
    advances, so ``state['pos']`` always reads the boundary after the
    last COMPLETE event (a torn tail event never moves it)."""
    if state is None:
        state = {}
    _p = state.get("pos")
    off = len(MAGIC) if _p is None else int(_p)  # pos=0 is a real start
    n = len(data)
    crc_tail = int(state.get("crc") or 0)
    state["pos"] = off
    while off + HEADER_LEN <= n:
        ts_sec, code, _server, size, log_pos, _flags = struct.unpack_from(
            "<IBIIIH", data, off
        )
        if size < HEADER_LEN or off + size > n:
            break  # truncated tail: warn-and-stop, never raise
        body = data[off + HEADER_LEN : off + size]
        if code == FORMAT_DESCRIPTION_EVENT:
            crc_tail = (
                4
                if _fde_checksum_alg(body) == BINLOG_CHECKSUM_ALG_CRC32
                else 0
            )
        elif crc_tail:
            if size < HEADER_LEN + 4 or zlib.crc32(
                data[off : off + size - 4]
            ) != int.from_bytes(data[off + size - 4 : off + size], "little"):
                off += size
                state["pos"] = off
                if stats is not None:
                    stats["crc_failed"] = stats.get("crc_failed", 0) + 1
                continue  # corrupt event: skip it, the chain is intact
            body = body[:-4]
        off += size
        state["pos"] = off
        state["crc"] = crc_tail
        if code == TRANSACTION_PAYLOAD_EVENT:
            r = _transaction_payload_fields(body)
            inner = None
            if r is not None:
                ctype, payload = r
                if ctype in (TX_COMPRESSION_NONE, None):
                    inner = payload
                elif ctype == TX_COMPRESSION_ZSTD:
                    inner = _zstd_decompress(payload)
            if inner is None:
                if stats is not None:
                    stats["compressed_tx_skipped"] = (
                        stats.get("compressed_tx_skipped", 0) + 1
                    )
                continue
            ioff, m = 0, len(inner)
            while ioff + HEADER_LEN <= m:
                its, icode, _isrv, isize, ipos, _ifl = struct.unpack_from(
                    "<IBIIIH", inner, ioff
                )
                if isize < HEADER_LEN or ioff + isize > m:
                    break
                yield its, icode, ipos, inner[ioff + HEADER_LEN : ioff + isize]
                ioff += isize
            continue
        yield ts_sec, code, log_pos, body


def fresh_decode_ctx() -> dict:
    """The decoder context a byte-sliced resume carries between
    micro-batches (r8): walk-level (pos, crc -- see _iter_events) plus
    row-level (the open transaction's gtid/ict, the current TABLE_MAP's
    schema/table, and the per-file event ordinal).  A whole-file decode
    starts from this; a delta decode starts from the previous slice's
    end context, and the union of slice outputs equals the whole-file
    decode (pinned by pytest)."""
    return {
        "pos": None,
        "crc": 0,
        "gtid": None,
        "ict": None,
        "schema": None,
        "table": None,
        "ordinal": 0,
    }


def decode_binlog_bytes(
    basename: str, data: bytes, stats: dict | None = None
) -> Iterator[tuple]:
    """One file's bytes -> contract rows.  Tolerant the way the text
    layer is (SURVEY section 2.8): a truncated trailing event stops the
    scan instead of raising; unknown event types are skipped by
    event_size (forward-compatible, exactly how real consumers skip
    events they don't understand).  CRC32-checksummed binlogs (the
    MySQL 8.0 default) are handled by _iter_events: tails verified and
    stripped, so checksummed and plain files decode identically;
    compressed transactions are unwrapped or COUNTED into ``stats``."""
    if not data.startswith(MAGIC):
        return
    yield from decode_binlog_slice(basename, data, fresh_decode_ctx(), stats)


def decode_binlog_slice(
    basename: str, data: bytes, ctx: dict, stats: dict | None = None
) -> Iterator[tuple]:
    """decode_binlog_bytes parameterized by a CARRIED context: start at
    ``ctx['pos']`` with the walk + transaction + table-map state the
    previous slice ended with, yield contract rows, and MUTATE ``ctx``
    to the end-of-slice state (callers read it back after exhausting
    the iterator).  This is what makes the binary stream tail resumable
    mid-file: the offset stores (byte pos, ctx), so a growing segment
    decodes incrementally yet byte-identically to a whole-file pass."""
    gtid: str | None = ctx.get("gtid")
    ict: str | None = ctx.get("ict")
    schema: str | None = ctx.get("schema")
    table: str | None = ctx.get("table")
    ordinal = int(ctx.get("ordinal") or 0)

    def _sync() -> None:
        ctx.update(
            gtid=gtid, ict=ict, schema=schema, table=table, ordinal=ordinal
        )

    for ts_sec, code, log_pos, body in _iter_events(data, stats, state=ctx):
        if code == GTID_LOG_EVENT:
            # a GTID event opens a NEW transaction: clear the previous
            # transaction's immediate_commit_timestamp up front so a
            # short-layout (5.6/5.7, 42-byte) event that lacks the
            # field doesn't inherit the prior transaction's value
            ict = None
            # SID+GNO need only the 25-byte prefix -- the MySQL
            # 5.6/5.7 Gtid_log_event is 42 bytes (no commit-timestamp
            # fields) and must still yield gtid_next; the 7-byte
            # immediate_commit_timestamp exists only in the 8.0 layout
            # (>= 49 bytes)
            if len(body) >= 1 + 16 + 8:
                sid = body[1:17]
                (gno,) = struct.unpack_from("<q", body, 17)
                gtid = f"{_sid_str(sid)}:{gno}"
            if len(body) >= 1 + 16 + 8 + 1 + 16 + 7:
                # bit 55 of the 7-byte field is a FLAG ('original
                # commit timestamp follows'), set on any binlog a
                # replica wrote -- it is NOT part of the microseconds;
                # without the strip a replica's timestamps jump by
                # 2^55 us (~year 3100) and every matched pair reports
                # TIMESTAMP_MISMATCH
                us = int.from_bytes(body[42:49], "little") & ((1 << 55) - 1)
                ict = _fmt_ict(us) if us else None
            continue
        if code == TABLE_MAP_EVENT:
            # malformed bodies (declared event_size too small for the
            # fields) skip the event rather than raising -- the module
            # contract is warn-and-skip, never a failed Spark job
            p = 8  # table_id(6) + flags(2)
            if len(body) < p + 1:
                continue
            slen = body[p]
            if len(body) < p + 1 + slen + 1 + 1:
                continue
            schema = body[p + 1 : p + 1 + slen].decode("utf-8", "replace")
            p += 1 + slen + 1
            tlen = body[p]
            table = body[p + 1 : p + 1 + tlen].decode("utf-8", "replace")
            continue
        if code in _ROWS_NAMES:
            ordinal += 1
            yield (basename, ordinal, _ROWS_NAMES[code], _fmt_ts(ts_sec), ict,
                   log_pos, schema, table, gtid)
        elif code == XID_EVENT:
            ordinal += 1
            yield (basename, ordinal, "XID", _fmt_ts(ts_sec), ict,
                   log_pos, None, None, gtid)
        elif code == QUERY_EVENT:
            # post-header: thread_id(4) exec_time(4) schema_len(1)
            # error_code(2) status_vars_len(2); real servers ALWAYS
            # write status vars (Q_FLAGS2, Q_SQL_MODE, charset, ...)
            # between the post-header and the schema name -- skipping
            # by the declared length is what makes genuine binlogs
            # decode, not just the zero-status fixture bytes
            if len(body) < 13:
                continue  # malformed post-header: warn-and-skip
            slen, = struct.unpack_from("<B", body, 8)
            svlen, = struct.unpack_from("<H", body, 11)
            qschema = body[13 + svlen : 13 + svlen + slen].decode(
                "utf-8", "replace"
            )
            ordinal += 1
            yield (basename, ordinal, "Query", _fmt_ts(ts_sec), ict,
                   log_pos, qschema or None, None, gtid)
        # FDE and anything else: skipped by event_size
    _sync()


# --- row-image decode (payload tier) --------------------------------------

ROWS_SCHEMA = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("event_no", T.LongType()),
        T.StructField("row_no", T.IntegerType()),
        T.StructField("image", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("immediate_commmit_timestamp", T.StringType()),
        T.StructField("log_position", T.LongType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("gtid_next", T.StringType()),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType())),
    ]
)

# metadata bytes per column type inside TABLE_MAP
_META_LEN = {
    MYSQL_TYPE_TINY: 0, MYSQL_TYPE_SHORT: 0, MYSQL_TYPE_LONG: 0,
    MYSQL_TYPE_LONGLONG: 0, MYSQL_TYPE_INT24: 0,
    MYSQL_TYPE_FLOAT: 1, MYSQL_TYPE_DOUBLE: 1, MYSQL_TYPE_VARCHAR: 2,
    MYSQL_TYPE_DATE: 0, MYSQL_TYPE_YEAR: 0,
    MYSQL_TYPE_TIMESTAMP: 0, MYSQL_TYPE_TIME: 0, MYSQL_TYPE_DATETIME: 0,
    MYSQL_TYPE_BIT: 2,  # [bits % 8][whole bytes]
    MYSQL_TYPE_TIMESTAMP2: 1, MYSQL_TYPE_DATETIME2: 1, MYSQL_TYPE_TIME2: 1,
    MYSQL_TYPE_NEWDECIMAL: 2,  # [precision][scale]
    MYSQL_TYPE_JSON: 1,  # length-prefix width (4 on real servers)
    MYSQL_TYPE_BLOB: 1,  # length-prefix width (1/2/3/4 bytes)
    MYSQL_TYPE_GEOMETRY: 1,  # length-prefix width (4 on real servers)
    MYSQL_TYPE_STRING: 2,  # [real-type-or-packed-high-bits][length]
}
# meta whose two bytes combine FIRST-BYTE-HIGH (the TABLE_MAP stores
# them as discrete bytes, not a little-endian int): NEWDECIMAL is
# (precision, scale), STRING is (real type | packed length bits, len)
_META_BE = {MYSQL_TYPE_NEWDECIMAL, MYSQL_TYPE_STRING}

# decimal binary layout (public strings/decimal.c): groups of 9 decimal
# digits pack into 4 big-endian bytes; a leading/trailing partial group
# of d digits needs _DEC_DIG2BYTES[d] bytes
_DEC_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _frac_bytes(fsp: int) -> int:
    """Fractional-second storage width: fsp digits round up to whole
    byte pairs -- 0 -> 0B, 1-2 -> 1B, 3-4 -> 2B, 5-6 -> 3B."""
    return (fsp + 1) // 2


def _read_frac(body: bytes, p: int, fsp: int) -> tuple[int, int] | None:
    """Read the big-endian fractional-second field at p -> (micros,
    new offset); the stored unit is 10^(2*bytes) per second."""
    n = _frac_bytes(fsp)
    if p + n > len(body):
        return None
    if n == 0:
        return 0, p
    v = int.from_bytes(body[p : p + n], "big")
    return v * 10 ** (6 - 2 * n), p + n


def _fmt_frac(micros: int, fsp: int) -> str:
    return "." + f"{micros:06d}"[:fsp] if fsp else ""


# MySQL binary JSON value types (public json_binary.h layout)
_JSON_SMALL_OBJECT = 0x00
_JSON_LARGE_OBJECT = 0x01
_JSON_SMALL_ARRAY = 0x02
_JSON_LARGE_ARRAY = 0x03
_JSON_LITERAL = 0x04
_JSON_INT16 = 0x05
_JSON_UINT16 = 0x06
_JSON_INT32 = 0x07
_JSON_UINT32 = 0x08
_JSON_INT64 = 0x09
_JSON_UINT64 = 0x0A
_JSON_DOUBLE = 0x0B
_JSON_STRING = 0x0C

_JSON_ERR = object()  # decode-failure sentinel (None is a valid JSON value)


def _json_varlen(data: bytes, p: int):
    """Variable-length string size (7 bits per byte, high bit =
    continuation) -> (length, new offset); None on malformation."""
    length, shift = 0, 0
    while p < len(data) and shift <= 28:
        b = data[p]
        p += 1
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            return length, p
        shift += 7
    return None


def _json_val(t: int, data: bytes):
    """One binary-JSON value of type ``t`` whose payload begins at
    data[0] (container offsets are relative to data[0], per the public
    layout) -> python value, or _JSON_ERR on malformation."""
    try:
        if t == _JSON_LITERAL:
            return {0: None, 1: True, 2: False}.get(data[0], _JSON_ERR)
        if t == _JSON_INT16:
            return struct.unpack_from("<h", data, 0)[0]
        if t == _JSON_UINT16:
            return struct.unpack_from("<H", data, 0)[0]
        if t == _JSON_INT32:
            return struct.unpack_from("<i", data, 0)[0]
        if t == _JSON_UINT32:
            return struct.unpack_from("<I", data, 0)[0]
        if t == _JSON_INT64:
            return struct.unpack_from("<q", data, 0)[0]
        if t == _JSON_UINT64:
            return struct.unpack_from("<Q", data, 0)[0]
        if t == _JSON_DOUBLE:
            return struct.unpack_from("<d", data, 0)[0]
        if t == _JSON_STRING:
            r = _json_varlen(data, 0)
            if r is None:
                return _JSON_ERR
            ln, q = r
            if q + ln > len(data):
                return _JSON_ERR
            return data[q : q + ln].decode("utf-8", "replace")
        if t in (
            _JSON_SMALL_OBJECT,
            _JSON_LARGE_OBJECT,
            _JSON_SMALL_ARRAY,
            _JSON_LARGE_ARRAY,
        ):
            large = t in (_JSON_LARGE_OBJECT, _JSON_LARGE_ARRAY)
            is_obj = t in (_JSON_SMALL_OBJECT, _JSON_LARGE_OBJECT)
            w = 4 if large else 2
            if len(data) < 2 * w:
                return _JSON_ERR
            count = int.from_bytes(data[0:w], "little")
            p = 2 * w
            keys = []
            if is_obj:
                for _ in range(count):
                    if p + w + 2 > len(data):
                        return _JSON_ERR
                    koff = int.from_bytes(data[p : p + w], "little")
                    klen = int.from_bytes(data[p + w : p + w + 2], "little")
                    if koff + klen > len(data):
                        return _JSON_ERR
                    keys.append(
                        data[koff : koff + klen].decode("utf-8", "replace")
                    )
                    p += w + 2
            vals = []
            inline_types = {_JSON_LITERAL, _JSON_INT16, _JSON_UINT16}
            if large:
                inline_types |= {_JSON_INT32, _JSON_UINT32}
            for _ in range(count):
                if p + 1 + w > len(data):
                    return _JSON_ERR
                vt = data[p]
                if vt in inline_types:
                    v = _json_val(vt, data[p + 1 : p + 1 + w])
                else:
                    voff = int.from_bytes(data[p + 1 : p + 1 + w], "little")
                    if voff > len(data):
                        return _JSON_ERR
                    v = _json_val(vt, data[voff:])
                if v is _JSON_ERR:
                    return _JSON_ERR
                vals.append(v)
                p += 1 + w
            return dict(zip(keys, vals)) if is_obj else vals
    except (struct.error, IndexError):
        return _JSON_ERR
    return _JSON_ERR


def _decode_json_blob(blob: bytes):
    """Whole binary-JSON document (type byte + payload) -> canonical
    compact JSON text, or None on malformation."""
    import json as _json

    if not blob:
        return None
    v = _json_val(blob[0], blob[1:])
    if v is _JSON_ERR:
        return None
    return _json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def _encode_json_value(v) -> tuple[int, bytes]:
    """Python value -> (type byte, payload bytes), small container
    format (the fixture-side inverse of _json_val; real servers write
    large format only past 64 KiB)."""
    if v is None or isinstance(v, bool):
        return _JSON_LITERAL, bytes([0 if v is None else 1 if v else 2])
    if isinstance(v, int):
        if -(1 << 15) <= v < (1 << 15):
            return _JSON_INT16, struct.pack("<h", v)
        if -(1 << 31) <= v < (1 << 31):
            return _JSON_INT32, struct.pack("<i", v)
        return _JSON_INT64, struct.pack("<q", v)
    if isinstance(v, float):
        return _JSON_DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        ln, out = len(b), bytearray()
        while True:
            out.append((ln & 0x7F) | (0x80 if ln > 0x7F else 0))
            ln >>= 7
            if not ln:
                break
        return _JSON_STRING, bytes(out) + b
    # containers: small format, 2-byte counts/offsets
    is_obj = isinstance(v, dict)
    items = list(v.items()) if is_obj else [(None, x) for x in v]
    w, count = 2, len(items)
    header_len = 2 * w + (count * (w + 2) if is_obj else 0) + count * (1 + w)
    key_blobs = [str(k).encode() for k, _ in items] if is_obj else []
    enc = [_encode_json_value(x) for _, x in items]
    # keys first, then out-of-line values, after the entry tables
    tail = bytearray()
    key_offs = []
    for kb in key_blobs:
        key_offs.append(header_len + len(tail))
        tail += kb
    val_entries = []
    for t, payload in enc:
        if t in (_JSON_LITERAL, _JSON_INT16, _JSON_UINT16):
            val_entries.append(bytes([t]) + payload.ljust(w, b"\x00"))
        else:
            val_entries.append(
                bytes([t]) + (header_len + len(tail)).to_bytes(w, "little")
            )
            tail += payload
    size = header_len + len(tail)
    out = bytearray()
    out += count.to_bytes(w, "little") + size.to_bytes(w, "little")
    if is_obj:
        for off, kb in zip(key_offs, key_blobs):
            out += off.to_bytes(w, "little") + len(kb).to_bytes(2, "little")
    for ve in val_entries:
        out += ve
    out += tail
    return (_JSON_SMALL_OBJECT if is_obj else _JSON_SMALL_ARRAY), bytes(out)


def _encode_json_doc(v) -> bytes:
    t, payload = _encode_json_value(v)
    return bytes([t]) + payload


def _decode_decimal(body: bytes, p: int, precision: int, scale: int):
    """NEWDECIMAL at offset p -> (canonical decimal string with exactly
    ``scale`` fraction digits, new offset); None on truncation.  Public
    layout: sign = MSB of the first byte (1 = non-negative), negative
    values stored with ALL bytes inverted, digits in big-endian groups
    of 9 (partial lead/tail groups per _DEC_DIG2BYTES)."""
    intg = precision - scale
    intg0, frac0 = intg // 9, scale // 9
    intg0x, frac0x = intg - intg0 * 9, scale - frac0 * 9
    size = (
        intg0 * 4 + _DEC_DIG2BYTES[intg0x]
        + frac0 * 4 + _DEC_DIG2BYTES[frac0x]
    )
    if p + size > len(body) or size == 0:
        return None
    buf = bytearray(body[p : p + size])
    negative = not (buf[0] & 0x80)
    buf[0] ^= 0x80
    if negative:
        for i in range(size):
            buf[i] = ~buf[i] & 0xFF
    q = 0
    int_digits = []
    if intg0x:
        w = _DEC_DIG2BYTES[intg0x]
        int_digits.append(str(int.from_bytes(buf[q : q + w], "big")).zfill(intg0x))
        q += w
    for _ in range(intg0):
        int_digits.append(str(int.from_bytes(buf[q : q + 4], "big")).zfill(9))
        q += 4
    frac_digits = []
    for _ in range(frac0):
        frac_digits.append(str(int.from_bytes(buf[q : q + 4], "big")).zfill(9))
        q += 4
    if frac0x:
        w = _DEC_DIG2BYTES[frac0x]
        frac_digits.append(str(int.from_bytes(buf[q : q + w], "big")).zfill(frac0x))
        q += w
    ip = "".join(int_digits).lstrip("0") or "0"
    s = ("-" if negative else "") + ip
    if scale:
        s += "." + "".join(frac_digits)
    return s, p + size


def _read_lenenc(data: bytes, p: int) -> tuple[int, int] | None:
    """Length-encoded int at offset p -> (value, new offset); None on
    truncation."""
    if p >= len(data):
        return None
    b0 = data[p]
    if b0 < 0xFB:
        return b0, p + 1
    need = {0xFC: 2, 0xFD: 3, 0xFE: 8}.get(b0)
    if need is None or p + 1 + need > len(data):
        return None
    return int.from_bytes(data[p + 1 : p + 1 + need], "little"), p + 1 + need


def _parse_table_map(body: bytes) -> dict | None:
    """Full TABLE_MAP parse: names + column types + metadata + optional
    COLUMN_NAME metadata (MySQL 8.0 binlog_row_metadata=FULL).  Returns
    {table_id, schema, table, types, metas, names} -- ``types`` is None
    when the column region is malformed (schema/table still usable) and
    ``names`` falls back to positional c0..cN when the optional TLV is
    absent (pre-8.0 binlogs don't log column names)."""
    if len(body) < 9:
        return None
    table_id = int.from_bytes(body[0:6], "little")
    p = 8  # table_id(6) + flags(2)
    slen = body[p]
    if len(body) < p + 1 + slen + 1 + 1:
        return None
    schema = body[p + 1 : p + 1 + slen].decode("utf-8", "replace")
    p += 1 + slen + 1
    tlen = body[p]
    if len(body) < p + 1 + tlen + 1:
        return None
    table = body[p + 1 : p + 1 + tlen].decode("utf-8", "replace")
    p += 1 + tlen + 1
    out = {"table_id": table_id, "schema": schema, "table": table,
           "types": None, "metas": None, "names": None, "unsigned": None}
    r = _read_lenenc(body, p)
    if r is None:
        return out
    n_cols, p = r
    if p + n_cols > len(body):
        return out
    types = list(body[p : p + n_cols])
    p += n_cols
    r = _read_lenenc(body, p)
    if r is None:
        return out
    meta_len, p = r
    if p + meta_len > len(body):
        return out
    meta_blob, mp = body[p : p + meta_len], 0
    metas: list[int] = []
    for t in types:
        w = _META_LEN.get(t)
        if w is None or mp + w > len(meta_blob):
            return out  # unknown type: row decode impossible
        metas.append(
            int.from_bytes(
                meta_blob[mp : mp + w],
                "big" if t in _META_BE else "little",
            )
            if w
            else 0
        )
        mp += w
    p += meta_len + (n_cols + 7) // 8  # skip null bitmap
    names = [f"c{i}" for i in range(n_cols)]
    unsigned = [False] * n_cols
    # optional metadata TLVs (type, lenenc length, value)
    while p + 1 < len(body):
        t = body[p]
        r = _read_lenenc(body, p + 1)
        if r is None:
            break
        vlen, p = r
        if p + vlen > len(body):
            break
        if t == _OPTMETA_COLUMN_NAME:
            blob, q, got = body[p : p + vlen], 0, []
            while q < len(blob):
                rr = _read_lenenc(blob, q)
                if rr is None:
                    break
                nl, q = rr
                got.append(blob[q : q + nl].decode("utf-8", "replace"))
                q += nl
            if len(got) == n_cols:
                names = got
        elif t == _OPTMETA_SIGNEDNESS:
            # one bit per NUMERIC column, MSB-first in column order --
            # without this an UNSIGNED BIGINT above 2^63 decodes as a
            # negative number (a wrong answer, not a skip)
            blob = body[p : p + vlen]
            bit = 0
            for i, ct in enumerate(types):
                if ct not in _NUMERIC_TYPES:
                    continue
                byte_i, bit_i = bit // 8, bit % 8
                if byte_i < len(blob):
                    unsigned[i] = bool(blob[byte_i] >> (7 - bit_i) & 1)
                bit += 1
        p += vlen
    out["types"], out["metas"], out["names"] = types, metas, names
    out["unsigned"] = unsigned
    return out


def _read_len_prefixed(body: bytes, p: int, w: int):
    """w-byte little-endian length prefix + that many utf8 bytes at
    offset p -> (text, new offset); None on truncation.  Shared by
    VARCHAR, CHAR (STRING) and BLOB/TEXT values."""
    if p + w > len(body):
        return None
    ln = int.from_bytes(body[p : p + w], "little")
    if p + w + ln > len(body):
        return None
    return body[p + w : p + w + ln].decode("utf-8", "replace"), p + w + ln


def _decode_value(body: bytes, p: int, typ: int, meta: int, unsigned: bool = False):
    """One column value at offset p -> (string value, new offset);
    None on truncation.  Canonical renderings (what the payload map
    carries; each is the exact string the typed fixture derivation
    produces, so oracles compare values not encodings): integers as
    decimal text (``unsigned`` from the SIGNEDNESS TLV switches the
    integer types to their unsigned reading), floats via repr
    (shortest round-trip), VARCHAR/CHAR/TEXT as utf8, DATE
    ``YYYY-MM-DD``, YEAR ``YYYY``, DATETIME2
    ``YYYY-MM-DD HH:MM:SS[.fsp]``, TIMESTAMP2 the same rendered in
    UTC, TIME2 ``[-]HH:MM:SS[.fsp]``, NEWDECIMAL with exactly
    ``scale`` fraction digits, ENUM as the 1-based index, SET as the
    member bitmask integer (basic TABLE_MAP metadata carries no
    name lists), JSON as canonical compact text."""
    try:
        if typ == MYSQL_TYPE_TINY:
            if unsigned:
                return (str(body[p]), p + 1) if p < len(body) else None
            return str(struct.unpack_from("<b", body, p)[0]), p + 1
        if typ == MYSQL_TYPE_SHORT:
            return str(struct.unpack_from("<H" if unsigned else "<h", body, p)[0]), p + 2
        if typ == MYSQL_TYPE_INT24:
            if p + 3 > len(body):
                return None
            v = int.from_bytes(body[p : p + 3], "little")
            if not unsigned and v & (1 << 23):
                v -= 1 << 24
            return str(v), p + 3
        if typ == MYSQL_TYPE_LONG:
            return str(struct.unpack_from("<I" if unsigned else "<i", body, p)[0]), p + 4
        if typ == MYSQL_TYPE_LONGLONG:
            return str(struct.unpack_from("<Q" if unsigned else "<q", body, p)[0]), p + 8
        if typ == MYSQL_TYPE_FLOAT:
            return repr(struct.unpack_from("<f", body, p)[0]), p + 4
        if typ == MYSQL_TYPE_DOUBLE:
            return repr(struct.unpack_from("<d", body, p)[0]), p + 8
        if typ == MYSQL_TYPE_VARCHAR:
            return _read_len_prefixed(body, p, 2 if meta > 255 else 1)
        if typ == MYSQL_TYPE_DATE:
            # 3 bytes LE: day(5) | month(4) | year(15)
            if p + 3 > len(body):
                return None
            v = int.from_bytes(body[p : p + 3], "little")
            return f"{v >> 9:04d}-{(v >> 5) & 15:02d}-{v & 31:02d}", p + 3
        if typ == MYSQL_TYPE_TIMESTAMP:
            # legacy 4-byte LE epoch seconds, rendered in UTC like
            # TIMESTAMP2
            if p + 4 > len(body):
                return None
            sec = int.from_bytes(body[p : p + 4], "little")
            dt = datetime.fromtimestamp(sec, tz=timezone.utc)
            return dt.strftime("%Y-%m-%d %H:%M:%S"), p + 4
        if typ == MYSQL_TYPE_DATETIME:
            # legacy 8-byte LE integer YYYYMMDDHHMMSS
            if p + 8 > len(body):
                return None
            v = int.from_bytes(body[p : p + 8], "little")
            d, hms = divmod(v, 1_000_000)
            return (
                f"{d // 10000:04d}-{d // 100 % 100:02d}-{d % 100:02d} "
                f"{hms // 10000:02d}:{hms // 100 % 100:02d}:{hms % 100:02d}",
                p + 8,
            )
        if typ == MYSQL_TYPE_TIME:
            # legacy 3-byte LE signed integer HHMMSS
            if p + 3 > len(body):
                return None
            v = int.from_bytes(body[p : p + 3], "little")
            if v & (1 << 23):
                v -= 1 << 24
            sign, v = ("-" if v < 0 else ""), abs(v)
            return (
                f"{sign}{v // 10000:02d}:{v // 100 % 100:02d}:{v % 100:02d}",
                p + 3,
            )
        if typ == MYSQL_TYPE_BIT:
            nbits = (meta >> 8) * 8 + (meta & 0xFF)
            nbytes = (nbits + 7) // 8
            if nbytes == 0 or p + nbytes > len(body):
                return None
            return (
                str(int.from_bytes(body[p : p + nbytes], "big")),
                p + nbytes,
            )
        if typ == MYSQL_TYPE_YEAR:
            # 1 byte: offset from 1900; 0 is the zero-year
            v = body[p] if p < len(body) else None
            if v is None:
                return None
            return ("0000" if v == 0 else str(1900 + v)), p + 1
        if typ == MYSQL_TYPE_DATETIME2:
            # 5 bytes BE (sign-offset packed: ym(17) d(5) h(5) m(6)
            # s(6)) + fractional tail; public my_time.h layout
            if p + 5 > len(body):
                return None
            packed = int.from_bytes(body[p : p + 5], "big") - 0x8000000000
            r = _read_frac(body, p + 5, meta)
            if r is None:
                return None
            micros, q = r
            ym = (packed >> 22) & 0x1FFFF
            s = (
                f"{ym // 13:04d}-{ym % 13:02d}-{(packed >> 17) & 31:02d} "
                f"{(packed >> 12) & 31:02d}:{(packed >> 6) & 63:02d}:"
                f"{packed & 63:02d}"
            )
            return s + _fmt_frac(micros, meta), q
        if typ == MYSQL_TYPE_TIMESTAMP2:
            # 4 bytes BE epoch seconds + fractional tail; rendered in
            # UTC (engine-deterministic; session-tz rendering would
            # make the payload value depend on the host)
            if p + 4 > len(body):
                return None
            sec = int.from_bytes(body[p : p + 4], "big")
            r = _read_frac(body, p + 4, meta)
            if r is None:
                return None
            micros, q = r
            dt = datetime.fromtimestamp(sec, tz=timezone.utc)
            return dt.strftime("%Y-%m-%d %H:%M:%S") + _fmt_frac(micros, meta), q
        if typ == MYSQL_TYPE_TIME2:
            if meta >= 5:
                if p + 6 > len(body):
                    return None
                packed = int.from_bytes(body[p : p + 6], "big") - 0x800000000000
                q = p + 6
            else:
                n = _frac_bytes(meta)
                if p + 3 + n > len(body):
                    return None
                intpart = int.from_bytes(body[p : p + 3], "big") - 0x800000
                frac = int.from_bytes(body[p + 3 : p + 3 + n], "big") if n else 0
                if intpart < 0 and frac:
                    intpart += 1
                    frac -= 1 << (8 * n)
                packed = (intpart << 24) + frac * (10000 if n == 1 else 100)
                q = p + 3 + n
            neg = packed < 0
            if neg:
                packed = -packed
            hms, micros = packed >> 24, packed & 0xFFFFFF
            s = (
                ("-" if neg else "")
                + f"{(hms >> 12) & 0x3FF:02d}:{(hms >> 6) & 63:02d}:{hms & 63:02d}"
            )
            return s + _fmt_frac(micros, meta), q
        if typ == MYSQL_TYPE_NEWDECIMAL:
            return _decode_decimal(body, p, meta >> 8, meta & 0xFF)
        if typ == MYSQL_TYPE_BLOB:
            if not 1 <= meta <= 4:
                return None
            return _read_len_prefixed(body, p, meta)
        if typ == MYSQL_TYPE_JSON:
            w = meta if 1 <= meta <= 4 else 4
            if p + w > len(body):
                return None
            ln = int.from_bytes(body[p : p + w], "little")
            if p + w + ln > len(body):
                return None
            doc = _decode_json_blob(body[p + w : p + w + ln])
            if doc is None:
                return None
            return doc, p + w + ln
        if typ == MYSQL_TYPE_GEOMETRY:
            # length-prefixed [SRID:4 LE][WKB]; POINT (the common CDC
            # geometry -- lat/lng columns) renders as text, anything
            # else falls back to a lossless hex rendering
            w = meta if 1 <= meta <= 4 else 4
            if p + w > len(body):
                return None
            ln = int.from_bytes(body[p : p + w], "little")
            if p + w + ln > len(body) or ln < 4:
                return None
            blob = body[p + w : p + w + ln]
            srid = int.from_bytes(blob[0:4], "little")
            wkb = blob[4:]
            if (
                len(wkb) == 21
                and wkb[0] == 1  # little-endian WKB
                and int.from_bytes(wkb[1:5], "little") == 1  # POINT
            ):
                x, y = struct.unpack_from("<dd", wkb, 5)
                return f"SRID={srid};POINT({x!r} {y!r})", p + w + ln
            return f"SRID={srid};0x{wkb.hex().upper()}", p + w + ln
        if typ == MYSQL_TYPE_STRING:
            real, b1 = meta >> 8, meta & 0xFF
            if real == MYSQL_TYPE_ENUM or real == MYSQL_TYPE_SET:
                if not 1 <= b1 <= 8 or p + b1 > len(body):
                    return None
                return str(int.from_bytes(body[p : p + b1], "little")), p + b1
            # CHAR: the high length bits may be packed into the type
            # byte (the public ((b0 & 0x30) ^ 0x30) << 4 trick)
            length = b1 if (real & 0x30) == 0x30 else b1 | (((real & 0x30) ^ 0x30) << 4)
            return _read_len_prefixed(body, p, 2 if length > 255 else 1)
    except struct.error:
        return None
    return None  # unreachable for supported types


def _decode_image(body: bytes, p: int, tm: dict, present: int):
    """One row image -> (payload dict, new offset); None on any
    malformation.  ``present`` is the columns-present bitmap for this
    image; the null bitmap indexes over PRESENT columns only."""
    types, metas, names = tm["types"], tm["metas"], tm["names"]
    unsigned = tm.get("unsigned") or [False] * len(types)
    idx_present = [i for i in range(len(types)) if present >> i & 1]
    nb_len = (len(idx_present) + 7) // 8
    if p + nb_len > len(body):
        return None
    null_bits = int.from_bytes(body[p : p + nb_len], "little")
    p += nb_len
    payload: dict = {}
    for j, i in enumerate(idx_present):
        if null_bits >> j & 1:
            payload[names[i]] = None
            continue
        r = _decode_value(body, p, types[i], metas[i], unsigned[i])
        if r is None:
            return None
        payload[names[i]], p = r
    return payload, p


def decode_binlog_rows_bytes(
    basename: str, data: bytes, stats: dict | None = None
) -> Iterator[tuple]:
    """One file's bytes -> ROW-IMAGE rows: one output row per decoded
    image inside every WRITE/UPDATE/DELETE rows event (UPDATE yields a
    'before' and an 'after' row).  ``event_no`` is the 1-based ordinal
    of the rows event within its file (over rows events only, so it is
    derivable as a row_number in any engine); ``row_no`` the 1-based
    image ordinal within the event.  Same tolerance contract as the
    metadata decoder: truncated tails stop the scan, events whose table
    map lacks decodable column types (unknown type codes, malformed
    metadata) are skipped whole, never raised on.

    Checksummed binlogs: _iter_events strips the verified CRC32 tail
    BEFORE the image loop sees the body -- without that, the 4 CRC
    bytes after the last genuine image could parse as a phantom
    all-NULL row (null bitmap 0xFF over a <= 8-column table), a wrong
    answer rather than a skip (round-5 verdict's top finding)."""
    if not data.startswith(MAGIC):
        return
    gtid: str | None = None
    ict: str | None = None
    table_maps: dict[int, dict] = {}
    event_no = 0
    for ts_sec, code, log_pos, body in _iter_events(data, stats):
        if code == GTID_LOG_EVENT:
            ict = None  # new transaction: clear the previous ict
            if len(body) >= 1 + 16 + 8:
                sid = body[1:17]
                (gno,) = struct.unpack_from("<q", body, 17)
                gtid = f"{_sid_str(sid)}:{gno}"
            if len(body) >= 1 + 16 + 8 + 1 + 16 + 7:
                us = int.from_bytes(body[42:49], "little") & ((1 << 55) - 1)
                ict = _fmt_ict(us) if us else None
            continue
        if code == TABLE_MAP_EVENT:
            tm = _parse_table_map(body)
            if tm is not None:
                table_maps[tm["table_id"]] = tm
            continue
        if code not in _ROWS_NAMES:
            continue
        event_no += 1
        if len(body) < 10:
            continue
        table_id = int.from_bytes(body[0:6], "little")
        tm = table_maps.get(table_id)
        if tm is None or tm["types"] is None:
            continue  # no decodable column map: skip the event whole
        (extra_len,) = struct.unpack_from("<H", body, 8)
        p = 8 + max(2, extra_len)  # extra-info length includes itself
        r = _read_lenenc(body, p)
        if r is None:
            continue
        n_cols, p = r
        if n_cols != len(tm["types"]):
            continue
        bm_len = (n_cols + 7) // 8
        if p + bm_len > len(body):
            continue
        present1 = int.from_bytes(body[p : p + bm_len], "little")
        p += bm_len
        present2 = present1
        if code == UPDATE_ROWS_EVENT_V2:
            if p + bm_len > len(body):
                continue
            present2 = int.from_bytes(body[p : p + bm_len], "little")
            p += bm_len
        ev_name = _ROWS_NAMES[code]
        row_no = 0
        while p < len(body):
            if code == UPDATE_ROWS_EVENT_V2:
                image = "before" if row_no % 2 == 0 else "after"
                present = present1 if row_no % 2 == 0 else present2
            else:
                image = "before" if code == DELETE_ROWS_EVENT_V2 else "after"
                present = present1
            r = _decode_image(body, p, tm, present)
            if r is None:
                break  # malformed remainder: keep what decoded so far
            payload, p = r
            row_no += 1
            yield (basename, event_no, row_no, image, ev_name,
                   _fmt_ts(ts_sec), ict, log_pos, tm["schema"], tm["table"],
                   gtid, payload)


def read_binlog_rows_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory of binary binlogs -> the ROW-IMAGE table (one row per
    image, ``payload`` as map<string,string>).  Same distribution shape
    as read_binlog_binary_dir: binaryFile scan parallelizes across
    files (the binlog rotation unit), decode is one Arrow-batched
    mapInPandas pass of pure struct parsing."""
    import os

    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "mysql-bin.*")
        .load(path)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    decode_binlog_rows_bytes(os.path.basename(p), bytes(content))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROWS_SCHEMA.fields]
            )

    return files.mapInPandas(decode, schema=ROWS_SCHEMA)


def decode_binlog_drift_bytes(basename: str, data: bytes) -> Iterator[tuple]:
    """Schema-drift rows for the BINARY path (twin of the text path's
    operators/parse.schema_drift_report): one row per TABLE_MAP whose
    column signature (names + types) differs from the PREVIOUS map for
    the same schema.table in this file -- i.e. DDL between
    transactions.  The rows decoder keeps decoding correctly across
    the change (each rows event uses the map in force at its
    position); this channel makes the change VISIBLE instead of
    silent.  Yields (binlog_file, log_position, schema, table,
    n_cols_before, n_cols_after, added_cols, removed_cols) with the
    added/removed column-name lists as csv."""
    if not data.startswith(MAGIC):
        return
    seen: dict[tuple, tuple] = {}  # (schema, table) -> (names, types)
    for _ts, code, log_pos, body in _iter_events(data):
        if code != TABLE_MAP_EVENT:
            continue
        tm = _parse_table_map(body)
        if tm is None or tm["types"] is None:
            continue
        key = (tm["schema"], tm["table"])
        sig = (tuple(tm["names"]), tuple(tm["types"]))
        prev = seen.get(key)
        seen[key] = sig
        if prev is None or prev == sig:
            continue
        before, after = set(prev[0]), set(sig[0])
        yield (
            basename,
            log_pos,
            tm["schema"],
            tm["table"],
            len(prev[0]),
            len(sig[0]),
            ",".join(sorted(after - before)),
            ",".join(sorted(before - after)),
        )


DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("log_position", T.LongType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("n_cols_before", T.IntegerType()),
        T.StructField("n_cols_after", T.IntegerType()),
        T.StructField("added_cols", T.StringType()),
        T.StructField("removed_cols", T.StringType()),
    ]
)


def read_binlog_schema_drift_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory of binary binlogs -> schema-drift rows (one per
    mid-file TABLE_MAP signature change).  Same distribution shape as
    the other binary readers."""
    import os

    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "mysql-bin.*")
        .load(path)
        .select("path", "content")
    )

    def drift(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    decode_binlog_drift_bytes(
                        os.path.basename(p), bytes(content)
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DRIFT_SCHEMA.fields]
            )

    return files.mapInPandas(drift, schema=DRIFT_SCHEMA)


SKIP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("crc_failed", T.LongType()),
        T.StructField("compressed_tx_skipped", T.LongType()),
    ]
)


def read_binlog_skip_stats_dir(spark: SparkSession, path: str) -> DataFrame:
    """Debug-log channel for the binary source (the SURVEY 2.8
    warn-and-skip contract made queryable): per-file counters of
    events the decoder REFUSED rather than decoded -- CRC32 failures
    and compressed transactions without an importable zstd codec.
    Same distribution shape as the decoders (binaryFile scan, one
    Arrow-batched pass); emits one row per file so a monitoring query
    can alert on skips instead of discovering them in lost rows."""
    import os

    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "mysql-bin.*")
        .load(path)
        .select("path", "content")
    )

    def count(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if not data.startswith(MAGIC):
                    continue
                stats: dict = {}
                for _ in _iter_events(data, stats):
                    pass
                rows.append(
                    (
                        os.path.basename(p),
                        stats.get("crc_failed", 0),
                        stats.get("compressed_tx_skipped", 0),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SKIP_STATS_SCHEMA.fields]
            )

    return files.mapInPandas(count, schema=SKIP_STATS_SCHEMA)


def _decode_metadata_batches(batches):
    """Shared Arrow decode pass for the batch and streaming metadata
    readers: (path, content) pandas batches -> DECODED_SCHEMA frames."""
    import os

    import pandas as pd

    for pdf in batches:
        rows = []
        for p, content in zip(pdf["path"], pdf["content"]):
            rows.extend(
                decode_binlog_bytes(os.path.basename(p), bytes(content))
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in DECODED_SCHEMA.fields]
        )


_CONTRACT_COLS = [
    "event_type",
    "timestamp",
    "immediate_commmit_timestamp",
    "log_position",
    "schema",
    "table",
    "gtid_next",
    "binlog_file",
    "line_no",
]


def read_binlog_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory of ``mysql-bin.*`` binary logs -> the parsed-event
    contract table (same columns as the text path's P1-P9 output).

    binaryFile scan parallelizes across files; each file decodes once
    inside an Arrow-batched mapInPandas (pure struct parsing, no
    Python-per-row UDF).  Only ``path`` and ``content`` are read from
    the source (column pruning keeps the scan to what's used)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "mysql-bin.*")
        .load(path)
        .select("path", "content")
    )
    out = files.mapInPandas(_decode_metadata_batches, schema=DECODED_SCHEMA)
    # contract column order (matches cdc_parse_binlog_text)
    return out.select(*_CONTRACT_COLS)


def stream_binlog_binary_dir(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """STREAMING twin of read_binlog_binary_dir: tail a binlog
    directory as files rotate in (Spark's binaryFile file-stream
    source discovers new ``mysql-bin.*`` files incrementally), decode
    each once through the same Arrow pass, append contract rows.
    Decode is stateless per file, so the stream needs no watermark and
    no state store -- rotation is the natural micro-batch unit,
    mirroring how the reference only ever reads files after `FLUSH
    BINARY LOGS` closes them (README.md:68-73).  Caveat shared with
    every file source: a file is read ONCE at discovery; an
    still-growing segment's later appends are not re-read -- tail only
    rotated-out files."""
    reader = (
        spark.readStream.format("binaryFile")
        # file-stream sources require the schema up front (binaryFile's
        # fixed four columns)
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "mysql-bin.*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    out = files.mapInPandas(_decode_metadata_batches, schema=DECODED_SCHEMA)
    return out.select(*_CONTRACT_COLS)


# --- rotate-chain audit source (r6 verdict item 5) -------------------------

ROTATE_SCHEMA = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("rotate_next", T.StringType()),
        T.StructField("rotate_pos", T.LongType()),
    ]
)


def decode_binlog_rotate(basename: str, data: bytes) -> tuple:
    """One file's bytes -> its rotation row: (binlog_file, rotate_next,
    rotate_pos), where rotate_next is the next-segment name the file's
    final ROTATE_EVENT declares (None = no rotate: the still-active
    tail, or a truncated/foreign file).  Checksum stripping and
    compressed-transaction unwrap ride the shared _iter_events walk, so
    a CRC32-tailed rotate decodes identically to a plain one."""
    nxt, pos = None, None
    if data.startswith(MAGIC):
        for _ts, code, _lp, body in _iter_events(data):
            if code == ROTATE_EVENT and len(body) > 8:
                (p,) = struct.unpack_from("<Q", body, 0)
                nxt = body[8:].decode("utf-8", "replace")
                pos = p
    return basename, nxt, pos


def _decode_rotate_batches(batches):
    import os

    import pandas as pd

    for pdf in batches:
        rows = [
            decode_binlog_rotate(os.path.basename(p), bytes(content))
            for p, content in zip(pdf["path"], pdf["content"])
        ]
        yield pd.DataFrame(rows, columns=[f.name for f in ROTATE_SCHEMA.fields])


def read_binlog_rotate_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory scan -> one rotation row per segment file.  Feeds
    operators.compare.rotate_chain_audit, which asserts the reference's
    implicit `ls -v` contract (comparator.sh:85-100): every closed
    segment's ROTATE must name exactly the next file present -- a
    dropped file between rotations becomes a CHAIN_GAP finding instead
    of silently missing data."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "mysql-bin.*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_decode_rotate_batches, schema=ROTATE_SCHEMA)


def stream_binlog_rotate_dir(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING twin of read_binlog_rotate_dir: as segments rotate in,
    each contributes its rotation row once -- the tail consumer's
    live feed for the chain audit."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "mysql-bin.*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_decode_rotate_batches, schema=ROTATE_SCHEMA)
