"""Permissive JSONL readers (SURVEY.md S7/S8) and the avro union
unwrap/wrap projections (R1).

The reference warns-and-skips malformed lines (compare_timestamps.go:
113-116, :171-174).  Spark's PERMISSIVE mode is the same policy with
the error channel as data: corrupt lines land in ``_corrupt_record``
and are counted, not fatal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..schemas import AVRO_JSONL_SCHEMA, BINLOG_EVENT_SCHEMA

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_binlog_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S7: binlog_metadata.json -> typed contract columns + corrupt channel.

    The reference parses into an open map then re-marshals into the
    8-field struct (compare_timestamps.go:130-135); with a declared read
    schema that narrowing (R3) is free -- unknown keys are simply not
    materialized, and the json scan prunes to the declared columns.
    """
    return spark.read.schema(_with_corrupt(BINLOG_EVENT_SCHEMA)).option(
        "mode", "PERMISSIVE"
    ).json(path)


def read_binlog_jsonl_ordered(spark: SparkSession, path: str) -> DataFrame:
    """S7 with line order as data: like read_binlog_jsonl but each row
    carries a ``line_no`` that reproduces the reference's sequential map
    overwrite order (compare_timestamps.go:118,147 -- later lines win).

    A plain json scan cannot supply this: Spark splits files into
    size-binned partitions whose ids do NOT follow file offsets, so
    ``monotonically_increasing_id`` would mis-order lines.  Instead each
    file is read whole (one task per file, the same sequential-unit
    bound as the text parser) and posexplode yields exact per-file line
    positions.  Multi-file input is ordered by file name -- version
    order for rotated logs -- via a broadcast-joined file ordinal, and
    ``line_no = file_ord * 2^40 + position`` keeps the combined ordinal
    a single sortable BIGINT (8M files x 1T lines headroom).

    SIZE CEILING (wholetext): each file materializes as ONE row -- a
    single JVM string (hard ~2 GB value limit; practically keep files
    <= a few hundred MB so the per-task line array fits executor
    memory).  That matches the domain: binlog/CDC logs are rotated at
    fixed sizes (MySQL max_binlog_size caps at 1 GB), and line order is
    only meaningful per rotated file.  For huge UNORDERED inputs use
    read_binlog_jsonl, which is block-splittable; an exact dense line
    ordinal fundamentally requires a sequential pass per file, so the
    ceiling is inherent to "order as data", not an implementation
    accident.
    """
    raw = spark.read.text(path, wholetext=True)
    lines = (
        raw.select(
            F.input_file_name().alias("__fname"),
            F.posexplode(F.split(F.col("value"), "\n")).alias("__idx", "__line"),
        )
        .filter(F.trim(F.col("__line")) != "")
    )
    file_ord = (
        lines.select("__fname")
        .distinct()
        .withColumn("__file_ord", F.row_number().over(Window.orderBy("__fname")))
    )  # one row per FILE -- the global window is over a dimension-sized frame
    parsed = lines.join(F.broadcast(file_ord), on="__fname").select(
        (F.col("__file_ord") * F.lit(1 << 40).cast("long") + F.col("__idx") + 1).alias(
            "line_no"
        ),
        F.from_json(
            F.col("__line"),
            _with_corrupt(BINLOG_EVENT_SCHEMA),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__r"),
    )
    return parsed.select("line_no", "__r.*")


def read_avro_jsonl_ordered(spark: SparkSession, path: str) -> DataFrame:
    """S8 with line order as data: like read_avro_jsonl but each row
    carries ``avro_line_no``, the 1-based per-file line ordinal -- the
    reference's ``lineNum`` (compare_timestamps.go:169) that its console
    report quotes per finding.  Same wholetext+posexplode mechanism as
    read_binlog_jsonl_ordered (one task per file; multi-file ordered by
    file name via a broadcast ordinal) -- including its per-file size
    ceiling (one JVM string per file, ~2 GB hard / few-hundred-MB
    practical; see that docstring).  Use read_avro_jsonl for large
    inputs where line numbers aren't needed."""
    raw = spark.read.text(path, wholetext=True)
    lines = raw.select(
        F.posexplode(F.split(F.col("value"), "\n")).alias("__idx", "__line"),
    ).filter(F.trim(F.col("__line")) != "")
    parsed = lines.select(
        (F.col("__idx") + 1).alias("avro_line_no"),  # file-local, like lineNum
        F.from_json(
            F.col("__line"),
            _with_corrupt(AVRO_JSONL_SCHEMA),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__r"),
    )
    return parsed.select("avro_line_no", "__r.*")


def read_avro_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S8: avro_rows.json (union-wrapped) -> nested typed struct."""
    return spark.read.schema(_with_corrupt(AVRO_JSONL_SCHEMA)).option(
        "mode", "PERMISSIVE"
    ).json(path)


def corrupt_count(df: DataFrame) -> DataFrame:
    """Skipped-records counter for the summary (SURVEY.md section 2.8).

    Spark refuses internal-only queries over ``_corrupt_record`` on an
    uncached JSON scan (the column is populated during parsing, not
    stored), so the input is cached here -- callers typically also want
    the parsed rows, making the cache useful rather than wasted.
    """
    df = df.cache()
    return df.agg(
        F.count("*").alias("total_lines"),
        F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("corrupt_lines"),
    )


def unwrap_avro(df: DataFrame) -> DataFrame:
    """R1 + R2: dissolve the union wrappers and flatten source_metadata
    into the flat probe-side shape the compare operators consume.

    Go zero-values on absent wrappers ("" / 0 / false) are replicated
    with coalesce so F3's null-key semantics match the reference's
    (compare_timestamps.go:176: missing wrapper -> zero value -> skip).
    """
    sm = "source_metadata"
    passthrough = [F.col("avro_line_no")] if "avro_line_no" in df.columns else []
    return df.select(
        *passthrough,
        F.col("source_timestamp"),
        F.col(f"{sm}.database").alias("database"),
        F.col(f"{sm}.table").alias("table"),
        F.coalesce(F.col(f"{sm}.change_type.string"), F.lit("")).alias("change_type"),
        F.coalesce(F.col(f"{sm}.gtid.string"), F.lit("")).alias("gtid"),
        F.coalesce(F.col(f"{sm}.binlog_file.string"), F.lit("")).alias("binlog_file"),
        F.coalesce(F.col(f"{sm}.binlog_position.long"), F.lit(0)).alias("binlog_position"),
        F.coalesce(F.col(f"{sm}.is_deleted.boolean"), F.lit(False)).alias("is_deleted"),
        F.col(f"{sm}.primary_keys").alias("primary_keys"),
    )


def unwrap_avro_payload(df: DataFrame) -> DataFrame:
    """``payload.*`` of the union-wrapped JSONL frame -> the keyed
    stringified payload map ``operators/compare.payload_diff``
    consumes: (binlog_file, binlog_position, payload).

    Unlike the metadata unwrap, absent unions stay NULL (not Go zero
    values): the payload comparison's whole point is distinguishing
    'column absent/null' from 'column disagrees', so a null wrapper
    surfaces as a null map value and becomes an AVRO_NULL /
    BINLOG_NULL finding, never a fabricated zero that would fake a
    MISMATCH.  Values stringify with the same canonical integer
    rendering the binary row-image decoder uses.  The KEY columns keep
    the zero-value coalesce so prepare_avro's F3 drop behaves
    identically to the metadata path."""
    sm, p = "source_metadata", "payload"
    return df.select(
        F.coalesce(F.col(f"{sm}.binlog_file.string"), F.lit("")).alias("binlog_file"),
        F.coalesce(F.col(f"{sm}.binlog_position.long"), F.lit(0)).alias(
            "binlog_position"
        ),
        F.map_from_arrays(
            F.array(
                F.lit("order_id"),
                F.lit("customer_name"),
                F.lit("product_name"),
                F.lit("quantity"),
                F.lit("order_timestamp"),
            ),
            F.array(
                F.col(f"{p}.order_id.int").cast("string"),
                F.col(f"{p}.customer_name.string"),
                F.col(f"{p}.product_name.string"),
                F.col(f"{p}.quantity.int").cast("string"),
                F.col(f"{p}.order_timestamp.long").cast("string"),
            ),
        ).alias("payload"),
    )


def wrap_avro(flat: DataFrame) -> DataFrame:
    """Inverse of unwrap_avro: rebuild the union-wrapped JSONL shape
    (for emitting byte-shaped avro-tools-style JSON, S6/S9)."""

    def w(col: str, key: str) -> F.Column:
        return F.struct(F.col(col).alias(key))

    return flat.select(
        F.col("source_timestamp"),
        F.struct(
            F.col("database"),
            F.col("table"),
            w("change_type", "string").alias("change_type"),
            w("gtid", "string").alias("gtid"),
            w("binlog_file", "string").alias("binlog_file"),
            w("binlog_position", "long").alias("binlog_position"),
            w("is_deleted", "boolean").alias("is_deleted"),
            F.col("primary_keys"),
        ).alias("source_metadata"),
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """S9: JSONL append sink."""
    df.write.mode(mode).json(path)


def _json_quote(col: F.Column) -> F.Column:
    """Render a string column as a Go-``json.Marshal``-byte-exact JSON
    string literal, entirely JVM-side: ``to_json`` of a 1-array handles
    quote/backslash/control escaping, then Go's default HTML-escaping
    (& < > -> \\u00XX, json_parser.go uses plain json.Marshal) and the
    U+2028/U+2029 rule are applied on top."""
    j = F.to_json(F.array(col))
    frag = j.substr(F.lit(2), F.length(j) - F.lit(2))
    # Go control-char forms differ from Jackson's: Go only shorthands
    # \t \n \r and writes every other <0x20 byte as lowercase \u00XX,
    # while Jackson adds \b \f shorthands and uppercases the hex.  The
    # divergent set is finite -- literal replaces, still codegen'd.
    # literal-character replacements first (no escape ambiguity)
    for ch, esc in [
        ("&", "\\u0026"),
        ("<", "\\u003c"),
        (">", "\\u003e"),
        ("\u2028", "\\u2028"),
        ("\u2029", "\\u2029"),
    ]:
        frag = F.replace(frag, F.lit(ch), F.lit(esc))
    # escape-sequence rewrites must only hit REAL escapes: a literal
    # backslash was itself escaped to \\\\, so a naive replace of the
    # two-char sequence \\b would also fire at an escaped-backslash
    # boundary (value 'a\\bc' -> to_json 'a\\\\bc' must stay '\\\\b', not
    # become '\\\\u0008').  The regex requires an EVEN run of preceding
    # backslashes (guarded by a lookbehind), i.e. the b/f/u is the
    # escape itself, matching Go byte-for-byte.
    seq_rewrites = [("b", "u0008"), ("f", "u000c")] + [
        (f"u{c:04X}", f"u{c:04x}")
        for c in range(0x20)
        if f"{c:04X}" != f"{c:04x}"
    ]
    for suffix, repl_suffix in seq_rewrites:
        frag = F.regexp_replace(
            frag,
            r"(?<!\\)((?:\\\\)*)\\" + suffix,
            r"$1\\" + repl_suffix,
        )
    return frag


def _int_or_quoted(v: F.Column) -> F.Column:
    """Go's P7 coercion at EMISSION (json_parser.go:95-101,134-139):
    int64-parseable values print as bare canonical digits, everything
    else as a JSON string.  strconv.ParseInt surface = optional sign +
    base-10 digits ONLY, overflow -> fail; the strict regex guard
    matters because Spark's cast TRIMS whitespace/control characters
    first ("2\x06" would coerce where Go keeps the string -- found by
    the hypothesis byte-parity property)."""
    lv = F.when(v.rlike(r"^[+-]?[0-9]+$"), v).try_cast("long")
    return F.when(lv.isNotNull(), lv.cast("string")).otherwise(_json_quote(v))


def go_json_lines(parsed: DataFrame) -> DataFrame:
    """S9 byte-exact form: render each parsed event exactly as the
    reference's ``json.Marshal(map[string]interface{})`` line
    (json_parser.go:46-51): keys sorted bytewise, P7 ints bare, Date
    success under ``timestamp``/failure raw under ``date``, processed
    high-precision timestamps, canonical event_type (the in-body
    ``Event type:`` kv never emits its own key), ``binlog_file`` last
    -- one string column ``value`` per event, for ``write_jsonl_go``.

    Pure built-in expressions (map transform + sort + concat): emission
    stays in whole-stage codegen, scan-speed at any corpus size."""
    ex = F.col("extra")
    # every key the specials map can emit must be excluded here, or
    # map_concat throws DUPLICATED_MAP_KEY (dedup policy EXCEPTION) on
    # inputs whose kv lines collide with them.  For 'binlog_file' the
    # exclusion is exact Go parity (the flush-time set always overwrites
    # a kv line, json_parser.go:45); for a pathological 'Timestamp:' kv
    # Go's outcome is line-order-dependent map overwrite -- we let the
    # Date-derived value win (documented divergence).
    base = F.transform_values(
        F.map_filter(
            ex,
            lambda k, _: ~k.isin(
                "event_type",
                "date",
                "timestamp",
                "binlog_file",
                "immediate_commmit_timestamp",
                "orignal_commmit_timestamp",
            ),
        ),
        lambda _, v: _int_or_quoted(v),
    )
    specials = F.map_filter(
        F.create_map(
            F.lit("event_type"),
            _json_quote(F.col("event_type")),
            F.lit("binlog_file"),
            _json_quote(F.col("binlog_file")),
            F.lit("timestamp"),
            F.when(F.col("timestamp").isNotNull(), _json_quote(F.col("timestamp"))),
            F.lit("date"),
            F.when(
                F.col("timestamp").isNull() & ex["date"].isNotNull(),
                _json_quote(ex["date"]),
            ),
            F.lit("immediate_commmit_timestamp"),
            F.when(
                F.col("immediate_commmit_timestamp").isNotNull(),
                _json_quote(F.col("immediate_commmit_timestamp")),
            ),
            F.lit("orignal_commmit_timestamp"),
            F.when(
                F.col("orignal_commmit_timestamp").isNotNull(),
                _json_quote(F.col("orignal_commmit_timestamp")),
            ),
        ),
        lambda _, v: v.isNotNull(),
    )
    ents = F.array_sort(F.map_entries(F.map_concat(base, specials)))
    frags = F.transform(
        ents, lambda e: F.concat(_json_quote(e["key"]), F.lit(":"), e["value"])
    )
    return parsed.select(
        F.concat(F.lit("{"), F.array_join(frags, ","), F.lit("}")).alias("value")
    )


def write_jsonl_go(parsed: DataFrame, path: str, mode: str = "append") -> None:
    """S9 with drop-in intermediate-file parity: emits the same bytes
    the reference's parser pipeline appends (comparator.sh:95)."""
    go_json_lines(parsed).write.mode(mode).text(path)


def binlog_events_via_variant(events_frame) -> "DataFrame":
    """The D3 open-schema ingestion re-expressed on Spark 4's VARIANT
    type: each event round-trips through its JSON-lines wire form
    (to_json), lands as ONE semi-structured VARIANT value
    (parse_json), and the downstream contract columns are pulled with
    try_variant_get -- exactly how a 100 TB lake should hold the
    reference's map[string]interface{} tail (json_parser.go:27,53):
    no schema census up front, binary-encoded shredded storage, typed
    extraction at read time, unknown keys preserved instead of
    dropped.  try_* extraction keeps the warn-and-skip contract under
    ANSI mode (a type-mismatched key nulls, never throws).

    Columns mirror the declared reader (jsonl.read_binlog_jsonl), so
    the two ingestion strategies are interchangeable downstream -- the
    oracle reads the same fields straight off the derivation CTE."""
    from pyspark.sql import functions as F

    wire = events_frame.select(
        F.to_json(F.struct(*events_frame.columns)).alias("__line")
    )
    v = wire.select(F.parse_json(F.col("__line")).alias("__v"))
    get = lambda path, typ: F.try_variant_get(  # noqa: E731
        F.col("__v"), f"$.{path}", typ
    )
    return v.select(
        get("event_type", "string").alias("event_type"),
        get("timestamp", "string").alias("timestamp"),
        get("log_position", "long").alias("log_position"),
        get("schema", "string").alias("schema"),
        get("table", "string").alias("table"),
        get("gtid_next", "string").alias("gtid_next"),
        get("binlog_file", "string").alias("binlog_file"),
        get("line_no", "long").alias("line_no"),
        get("event_type", "string").endswith("RowsEventV2").alias("is_dml"),
    )
