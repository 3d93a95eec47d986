"""Binlog parser-text -> binlog_events table (SURVEY.md P1-P9).

The reference's json_parser.go is a line-at-a-time state machine: a
`=== Type ===` header opens an event, k:v lines populate it, the next
header (or EOF) flushes it.  The idiomatic Spark translation makes the
state a *cumulative sum*: ``event_id = sum(is_header) over (file order
by line_no)`` -- every line gets the id of the event it belongs to, and
assembly becomes a groupBy.  (Same trick as gap sessionization.)

Shuffle budget: one window + two groupBys, all partitioned by
(binlog_file[, event_id]) -- the natural partitioning; a file's events
never cross executors.  All parsing is regexp/string built-ins.

Semantics replicated (file:line into /root/reference/json_parser.go):
  P1 header regex ^=== (.+?) ===$         (:29)
  P2 k:v regex    ^([^:]+): (.+)$         (:30)
  P3 blank + '--' lines dropped           (:35-41)
  P4 pre-header k:v lines dropped          (:70-72)
  P5 key normalization lower+underscore    (:77)
  P6 event-type canonicalization, incl. the in-body 'Event type:'
     override                              (:56-66, :124-131)
  P7 best-effort int64 coercion (typed contract cols; dynamic tail
     stays string)                         (:95-100, :133-138)
  P8 'Date' -> RFC3339 string, raw kept on failure (:80-87)
  P9 high-precision timestamps, both layouts, RFC3339Nano output,
     raw kept on failure                   (:102-122)

Precision: Go parses nanoseconds; Spark timestamps are microseconds.
Layout (a) keeps the *original string* (no reformat -- same as Go,
which stores the extracted substring verbatim on success, :108), so no
precision is lost where it matters.  Layout (b) reformats through a
timestamp and truncates ns -> us; under the comparator's 100 ms
tolerance this is invisible (SURVEY.md P9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# (?d) = Java UNIX_LINES: '.' and '$' treat ONLY \n as a line
# terminator, matching Go's RE2 semantics -- without it a value
# containing NEL/U+2028/U+2029 fails the match in Java (dropping the
# kv line) while the reference keeps it.
HEADER_RE = r"(?d)^=== (.+?) ===$"
KV_RE = r"(?d)^([^:]+): (.+)$"

# layout (a): "<epoch> (2006-01-02T15:04:05.123456789Z)"  (json_parser.go:103-112)
PAREN_NANO_RE = r"\(([^)]*Z)\)$"
# layout (b): "2006-01-02 15:04:05.999999999 -0700 MST"    (json_parser.go:113-122)
MST_RE = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d{1,9})?) ([+-]\d{4}) [A-Za-z][A-Za-z0-9/_+-]*$"

_HP_KEYS = ("immediate_commmit_timestamp", "orignal_commmit_timestamp")


def _canon_event_type(c: F.Column) -> F.Column:
    """P6: contains-based canonicalization; otherwise strip ONE trailing
    'Event' (Go strings.TrimSuffix == regexp 'Event$')."""
    return (
        F.when(c.contains("WriteRowsEventV2"), "WriteRowsEventV2")
        .when(c.contains("UpdateRowsEventV2"), "UpdateRowsEventV2")
        .when(c.contains("DeleteRowsEventV2"), "DeleteRowsEventV2")
        .otherwise(F.regexp_replace(c, "Event$", ""))
    )


def _rfc3339nano_trim(ts: F.Column) -> F.Column:
    """Format a timestamp like Go's time.RFC3339Nano: fractional part
    with trailing zeros trimmed, dot dropped when fraction is empty."""
    s = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    s = F.regexp_replace(s, r"0+$", "")
    s = F.regexp_replace(s, r"\.$", "")
    return F.concat(s, F.lit("Z"))


def _parse_hp_timestamp(v: F.Column) -> F.Column:
    """P9: high-precision timestamp value -> RFC3339Nano string, or the
    raw value when neither layout parses (warn-and-keep semantics)."""
    extracted = F.regexp_extract(v, PAREN_NANO_RE, 1)
    # truncate >6 fraction digits for validation (Spark parses us max);
    # the *stored* value is the untouched extracted string, like Go.
    ext_us = F.regexp_replace(
        extracted, r"(\.\d{6})\d+", r"$1"
    )
    ext_valid = F.try_to_timestamp(
        ext_us, F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]'Z'")
    ).isNotNull()

    mst_dt = F.regexp_extract(v, MST_RE, 1)
    mst_off = F.regexp_extract(v, MST_RE, 2)
    mst_us = F.regexp_replace(mst_dt, r"(\.\d{6})\d+", r"$1")
    mst_ts = F.try_to_timestamp(
        F.concat_ws(" ", mst_us, mst_off),
        F.lit("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S] XX"),
    )

    return (
        F.when(v.contains("(") & v.endswith("Z)") & ext_valid, extracted)
        .when(
            v.contains("(") & v.endswith("Z)") & ~ext_valid, v
        )  # extraction failed validation -> keep raw (json_parser.go:110-111)
        .when(mst_ts.isNotNull(), _rfc3339nano_trim(mst_ts))
        .otherwise(v)  # keep raw (:118-120)
    )


def assemble_events(lines: DataFrame) -> DataFrame:
    """P1-P6 structural phase: lines -> one row per event with
    (binlog_file, event_id, event_type, kvs map<norm_key, raw_value>).
    """
    trimmed = lines.withColumn("value", F.trim(F.col("value")))
    # P3: noise filter
    body = trimmed.filter((F.col("value") != "") & (F.col("value") != "--"))
    header = F.regexp_extract(F.col("value"), HEADER_RE, 1)
    body = body.withColumn("header", header).withColumn(
        "is_header", (F.col("header") != "").cast("long")
    )
    # P4: cumulative header count = event id; id 0 == before any header
    w = Window.partitionBy("binlog_file").orderBy("line_no")
    body = body.withColumn("event_id", F.sum("is_header").over(w)).filter(
        F.col("event_id") > 0
    )

    # k:v split (P2) + key normalization (P5)
    kv_key = F.trim(F.regexp_extract(F.col("value"), KV_RE, 1))
    kv_val = F.trim(F.regexp_extract(F.col("value"), KV_RE, 2))

    # ONE aggregation builds both the header and the kv map (this was
    # two groupBys + a join -- three exchanges over the same rows; the
    # merged form is one exchange and one pass, guide 2.4).  Duplicate
    # keys within an event: Go map semantics -> last line wins, done
    # order-explicitly (sort entries by line_no, keep each normalized
    # key's LAST occurrence) -- events are a handful of lines, so the
    # per-row array work is constant-bounded.
    entry = F.when(
        (F.col("is_header") == 0) & (kv_key != ""),
        F.struct(
            F.col("line_no").alias("ord"),
            F.lower(F.regexp_replace(kv_key, " ", "_")).alias("k"),
            kv_val.alias("v"),
        ),
    )
    agg = body.groupBy("binlog_file", "event_id").agg(
        F.min(F.when(F.col("is_header") == 1, F.col("header"))).alias(
            "raw_header"
        ),
        F.reverse(F.array_sort(F.collect_list(entry))).alias("__ents"),
    )
    ents = F.col("__ents")  # line-DESCENDING (ord unique per file)
    last_wins = F.filter(
        ents,
        lambda x, i: ~F.exists(
            F.slice(ents, 1, i), lambda y: y["k"] == x["k"]
        ),
    )
    ev = agg.withColumn(
        "kvs",
        F.map_from_entries(
            F.transform(
                last_wins,
                lambda s: F.struct(s["k"].alias("k"), s["v"].alias("v")),
            )
        ),
    ).drop("__ents")
    # P6: header canonicalization + in-body 'Event type:' override
    header_type = _canon_event_type(F.col("raw_header"))
    body_type = F.col("kvs")["event_type"]
    event_type = (
        F.when(body_type.contains("WriteRowsEventV2"), "WriteRowsEventV2")
        .when(body_type.contains("UpdateRowsEventV2"), "UpdateRowsEventV2")
        .when(body_type.contains("DeleteRowsEventV2"), "DeleteRowsEventV2")
        .otherwise(header_type)
    )
    return ev.select(
        "binlog_file",
        "event_id",
        event_type.alias("event_type"),
        "kvs",
    )


def parse_binlog_text(lines: DataFrame) -> DataFrame:
    """Full P1-P9: lines -> the binlog_events contract table
    (+ ``extra`` map carrying the dynamic tail, P7 keeps it string-typed;
    ``line_no`` = event_id, preserving per-file order for J2)."""
    ev = assemble_events(lines)
    kvs = F.col("kvs")

    date_raw = kvs["date"]
    date_ts = F.try_to_timestamp(date_raw, F.lit("yyyy-MM-dd HH:mm:ss"))
    # P8: RFC3339 on success; raw string kept under `date` in extra on failure
    timestamp = F.when(
        date_ts.isNotNull(), F.date_format(date_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    ).otherwise(F.lit(None).cast("string"))

    def hp(key: str) -> F.Column:
        v = kvs[key]
        return F.when(v.isNotNull(), _parse_hp_timestamp(v))

    return ev.select(
        F.col("event_type"),
        timestamp.alias("timestamp"),
        hp("immediate_commmit_timestamp").alias("immediate_commmit_timestamp"),
        hp("orignal_commmit_timestamp").alias("orignal_commmit_timestamp"),
        # strict ParseInt surface: Spark's bare cast trims control
        # chars Go rejects (see sources/jsonl._int_or_quoted)
        F.coalesce(
            F.when(
                kvs["log_position"].rlike(r"^[+-]?[0-9]+$"),
                kvs["log_position"],
            ).try_cast("long"),
            F.lit(0),
        ).alias("log_position"),
        kvs["table"].alias("table"),
        kvs["schema"].alias("schema"),
        kvs["gtid_next"].alias("gtid_next"),
        F.col("binlog_file"),
        F.col("event_id").alias("line_no"),
        F.col("kvs").alias("extra"),
    )


# the D3 contract keys the downstream consumer declares
# (compare_timestamps.go:13-22); everything else in the open-schema
# tail is drift the operator below surfaces
CONTRACT_KEYS = (
    "date",
    "log_position",
    "schema",
    "table",
    "gtid_next",
    "immediate_commmit_timestamp",
    "orignal_commmit_timestamp",
)


def schema_drift_report(parsed: DataFrame) -> DataFrame:
    """Open-schema drift detection over the parsed binlog events: which
    keys does the feed ACTUALLY carry, per event type, and which of
    them are outside the declared contract (the D3 table is
    map[string]interface{} -- json_parser.go:27 -- so a parser upgrade
    or a new MySQL version can grow the tail silently; this report is
    how an operator notices before a consumer breaks).

    explode(map_keys) -> one map-side-combined aggregate over
    (event_type, key); key cardinality is bounded by the parser's
    vocabulary, so the shuffle is a few hundred rows at any corpus
    size.  Returns (event_type, key, n_events, in_contract)."""
    keys = parsed.select(
        "event_type", F.explode(F.map_keys(F.col("extra"))).alias("key")
    )
    return (
        keys.groupBy("event_type", "key")
        .agg(F.count("*").alias("n_events"))
        .withColumn("in_contract", F.col("key").isin(*CONTRACT_KEYS))
    )
