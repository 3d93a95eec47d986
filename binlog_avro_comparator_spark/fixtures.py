"""Deterministic CDC fixture derivation.

The reference toolset consumes two inputs: a normalized MySQL-binlog
event table and an Avro CDC record table (SURVEY.md section 1.2,
/root/reference/compare_timestamps.go:13-64).  The test corpus doesn't
ship those, so we derive both -- deterministically and with *only*
SQL-expressible arithmetic -- from the driver-generated ``events``
table.  The same derivation is mirrored literally in ``oracle.py`` as
DuckDB CTEs, which is what makes every compare operator oracle-checkable.

The derivation plants every edge case the reference's semantics care
about (file:line cites into /root/reference/compare_timestamps.go):

  ======================  ===================================================
  event_id % 7   == 0     immediate_commmit_timestamp NULL -> coalesce
                          fallback to the second-precision timestamp (:200-204)
  event_id % 53  == 0     binlog row takes the key of event_id+4 (same file)
                          -> duplicate key, last-write-wins dedup (:147)
  event_id % 211 == 0     log_position = 0 -> dropped, zero-as-null (:137)
  event_id % 223 == 0     binlog_file = '' -> dropped (:137)
  event_id % 13  == 0     no Avro row emitted -> BINLOG_ONLY finding (:254-271)
  event_id % 17  == 5     Avro key offset by +7 -> AVRO_ONLY finding (:187-192)
  event_id % 29  == 1     Avro binlog_position = 0 -> skipped probe row (:176)
  event_id % 11  == 0     Avro ts +250ms -> beyond the 100ms tolerance (:214)
  event_id % 19  == 0     GTID off-by-one -> report-only mismatch (:223-229)
  event_id % 23  == 0     change_type rotated -> report-only mismatch (:231-246)
  ======================  ===================================================

Everything else matches within tolerance (jitter = event_id % 90 ms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Keep in sync with oracle.py's CDC CTEs: the oracle queries themselves
# guard this twin-derivation (every cdc_* entry in scratch/check.py runs
# this fixture through Spark AND the mirrored SQL through DuckDB).
N_BINLOG_FILES = 4
DUP_KEY_MOD = 53
ZERO_POS_MOD = 211
EMPTY_FILE_MOD = 223
NULL_ICT_MOD = 7
AVRO_MISSING_MOD = 13
AVRO_ORPHAN_MOD, AVRO_ORPHAN_REM = 17, 5
AVRO_BADKEY_MOD, AVRO_BADKEY_REM = 29, 1
TS_MISMATCH_MOD = 11
GTID_MISMATCH_MOD = 19
CT_MISMATCH_MOD = 23
TS_JITTER_MOD = 90
TS_MISMATCH_DELTA_MS = 250
TOLERANCE_MS = 100

# --- payload (row-image) edge cases ---------------------------------------
# The reference DECLARES payload columns (compare_timestamps.go:57-63:
# order_id, customer_name, product_name, quantity, order_timestamp) but
# never compares them; the payload tier extends the diff to row images.
# Planted divergences (binlog row image vs avro payload):
#   eid % 43 == 6   binlog customer_name NULL in the row image (null
#                   bitmap exercised) while avro carries the value
#                   -> BINLOG_NULL finding
#   eid % 31 == 2   avro quantity = quantity + 1      -> MISMATCH
#   eid % 37 == 3   avro product_name = 'prod-X'      -> MISMATCH
#   eid % 47 == 7   avro order_timestamp NULL         -> AVRO_NULL
# UPDATE before-images differ deterministically from the after-image
# (quantity + 5, order_timestamp - 1000) so before/after decoding is
# distinguishable byte-level, not just by label.
PAYLOAD_NULL_NAME_MOD, PAYLOAD_NULL_NAME_REM = 43, 6
AVRO_QTY_MISMATCH_MOD, AVRO_QTY_MISMATCH_REM = 31, 2
AVRO_PROD_MISMATCH_MOD, AVRO_PROD_MISMATCH_REM = 37, 3
AVRO_NULL_OTS_MOD, AVRO_NULL_OTS_REM = 47, 7
UPDATE_BEFORE_QTY_DELTA = 5
UPDATE_BEFORE_OTS_DELTA_MS = 1000

# events.event_type -> binlog event_type (json_parser.go:56-66 vocabulary)
EVENT_TYPE_MAP = {
    "click": "WriteRowsEventV2",
    "view": "UpdateRowsEventV2",
    "purchase": "DeleteRowsEventV2",
    "signup": "XID",
    # 'error' and anything else -> 'Query' (irrelevant, filtered by F1)
}

# binlog event_type -> CDC change type (compare_timestamps.go:231-238,
# with quirk Q1 fixed: DeleteRowsEventV2 -> DELETE)
CHANGE_TYPE_MAP = {
    "click": "INSERT",
    "view": "UPDATE",
    "purchase": "DELETE",
}
# injected wrong change types (rotation) for event_id % CT_MISMATCH_MOD == 0
CHANGE_TYPE_ROTATED = {"click": "UPDATE", "view": "DELETE", "purchase": "INSERT"}

DML_SOURCE_TYPES = ("click", "view", "purchase")


def _event_type_col() -> F.Column:
    c = F.col("event_type")
    out = F.lit("Query")
    for src, dst in EVENT_TYPE_MAP.items():
        out = F.when(c == src, dst).otherwise(out)
    return out


def _binlog_file_col() -> F.Column:
    return F.concat(
        F.lit("mysql-bin."),
        F.lpad((F.col("event_id") % N_BINLOG_FILES).cast("string"), 6, "0"),
    )


def _base_pos(eid: F.Column) -> F.Column:
    # end-of-event position; >= 4 like real binlogs (comparator.sh:93 -offset 4)
    return F.lit(100) * F.floor(eid / N_BINLOG_FILES).cast("long") + F.lit(4)


def derive_binlog_events(events: DataFrame) -> DataFrame:
    """events -> the ``binlog_events`` contract table (FIXTURES.md F-1).

    Column spellings with triple-m / 'orignal' are the reference's
    contract (json_parser.go:95,:102 -- quirk Q6); preserved verbatim.
    """
    eid = F.col("event_id")
    return events.select(
        _event_type_col().alias("event_type"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        F.when(eid % NULL_ICT_MOD == 0, F.lit(None).cast("string"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
        .alias("immediate_commmit_timestamp"),
        F.when(eid % ZERO_POS_MOD == 0, F.lit(0).cast("long"))
        .when(eid % DUP_KEY_MOD == 0, _base_pos(eid + F.lit(N_BINLOG_FILES)))
        .otherwise(_base_pos(eid))
        .alias("log_position"),
        F.concat(F.lit("db"), (F.col("user_id") % 2).cast("string")).alias("schema"),
        F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")).alias("table"),
        F.concat(F.lit("uuid-0:"), eid.cast("string")).alias("gtid_next"),
        F.when(eid % EMPTY_FILE_MOD == 0, F.lit("")).otherwise(_binlog_file_col()).alias("binlog_file"),
        eid.alias("line_no"),
    )


def _payload_cols(eid: F.Column) -> list[F.Column]:
    """Ground-truth row payload (the binlog row image's AFTER values) --
    the five columns the reference declares (compare_timestamps.go:57-63),
    derived with only SQL-expressible arithmetic so the DuckDB oracle
    mirrors them verbatim."""
    return [
        (eid % 100000).alias("order_id"),
        F.when(
            eid % PAYLOAD_NULL_NAME_MOD == PAYLOAD_NULL_NAME_REM,
            F.lit(None).cast("string"),
        )
        .otherwise(
            F.concat(F.lit("cust-"), (F.col("user_id") % 1000).cast("string"))
        )
        .alias("customer_name"),
        F.concat(F.lit("prod-"), (eid % 97).cast("string")).alias("product_name"),
        (F.lit(1) + eid % 10).alias("quantity"),
        F.unix_millis(F.col("ts")).alias("order_timestamp"),
    ]


def derive_binlog_events_with_payload(events: DataFrame) -> DataFrame:
    """derive_binlog_events + row-image payload columns for DML events
    (non-DML rows keep NULL payload -- they carry no row image).

    ``before_quantity``/``before_order_timestamp`` are the UPDATE
    before-image values (after - deltas); the encoder writes them into
    the before image so before/after decode is value-distinguishable."""
    eid = F.col("event_id")
    pay = events.filter(F.col("event_type").isin(*DML_SOURCE_TYPES)).select(
        eid.alias("line_no"),
        *_payload_cols(eid),
        (F.lit(1) + eid % 10 + F.lit(UPDATE_BEFORE_QTY_DELTA)).alias(
            "before_quantity"
        ),
        (F.unix_millis(F.col("ts")) - F.lit(UPDATE_BEFORE_OTS_DELTA_MS)).alias(
            "before_order_timestamp"
        ),
    )
    return derive_binlog_events(events).join(pay, "line_no", "left")


# --- typed row-image fixtures (extended column types) ----------------------
# Ground truth for the typed decode tier (sources/binlog_binary.py
# TYPED_COLUMNS): every value is derived as the CANONICAL STRING the
# decoder renders, with only SQL-expressible arithmetic, so the DuckDB
# oracle mirrors it verbatim.  Planted avro-side divergences:
#   eid % 31 == 2   avro t_dec = cents + 1       -> MISMATCH
#   eid % 47 == 7   avro t_dt NULL               -> AVRO_NULL
#   eid % 43 == 6   binlog t_text NULL (bitmap)  -> BINLOG_NULL
#   eid % 13 == 0   no avro row                  -> joins away (inner)
TYPED_NULL_TEXT_MOD, TYPED_NULL_TEXT_REM = 43, 6
TYPED_DEC_MISMATCH_MOD, TYPED_DEC_MISMATCH_REM = 31, 2
TYPED_DT_NULL_MOD, TYPED_DT_NULL_REM = 47, 7


def _typed_value_cols(eid: F.Column) -> dict[str, F.Column]:
    ts = F.col("ts")
    cents = F.lit(1) + (eid * 37) % 9999999
    t_time = F.concat(
        F.when(eid % 5 == 0, F.lit("-")).otherwise(F.lit("")),
        F.lpad((F.lit(1) + eid % 99).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((eid % 60).cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((eid * 7) % 60).cast("string"), 2, "0"),
    )
    t_dec = F.concat(
        F.when(eid % 3 == 0, F.lit("-")).otherwise(F.lit("")),
        F.floor(cents / 100).cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    return {
        "t_id": (eid % 1000000).cast("string"),
        "t_date": F.date_format(ts, "yyyy-MM-dd"),
        "t_year": F.date_format(ts, "yyyy"),
        "t_dt": F.date_format(ts, "yyyy-MM-dd HH:mm:ss.SSS"),
        "t_ts": F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
        "t_time": t_time,
        "t_dec": t_dec,
        "t_text": F.when(
            eid % TYPED_NULL_TEXT_MOD == TYPED_NULL_TEXT_REM,
            F.lit(None).cast("string"),
        ).otherwise(F.concat(F.lit("text-"), eid.cast("string"))),
        "t_char": F.concat(F.lit("c"), (eid % 100).cast("string")),
        "t_enum": (F.lit(1) + eid % 3).cast("string"),
        "t_set": (eid % 8).cast("string"),
        # canonical compact JSON text (the exact _decode_json_blob
        # rendering: insertion-order keys, no spaces)
        "t_json": F.concat(
            F.lit('{"k":'),
            (eid % 50).cast("string"),
            F.lit(',"s":"v-'),
            (eid % 7).cast("string"),
            F.lit('"}'),
        ),
        # unsigned tiers (SIGNEDNESS TLV): values past the sign bit,
        # where a signed misread would go negative
        "t_u8": (F.lit(128) + eid % 128).cast("string"),
        "t_u64": (
            F.expr("CAST('9223372036854775808' AS DECIMAL(20,0))") + eid
        ).cast("string"),
        # POINT with exactly-representable .5/.25 fractions so the
        # decoder's repr() rendering matches the string concat
        "t_geo": F.concat(
            F.lit("SRID=4326;POINT("),
            (eid % 100).cast("string"),
            F.lit(".5 "),
            (eid % 50).cast("string"),
            F.lit(".25)"),
        ),
    }


def derive_typed_rows(events: DataFrame) -> DataFrame:
    """events -> the typed-fixture row table: per DML event one WRITE
    row image over the TYPED_COLUMNS shape (canonical value strings) +
    the file/position/timestamp metadata the encoder needs."""
    eid = F.col("event_id")
    vals = _typed_value_cols(eid)
    return (
        events.filter(F.col("event_type").isin(*DML_SOURCE_TYPES))
        .filter(eid % EMPTY_FILE_MOD != 0)
        .select(
            _binlog_file_col().alias("binlog_file"),
            eid.alias("line_no"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
            _base_pos(eid).alias("log_position"),
            *[c.alias(n) for n, c in vals.items()],
        )
    )


def derive_typed_avro_columns(events: DataFrame) -> DataFrame:
    """The avro twin of the typed row images as a FLAT frame: one
    column per typed name (canonical string, with the planted
    divergences) plus ``t_dt_ms`` -- the epoch-millis long twin of
    t_dt (NULL on the AVRO_NULL rows) that the real ``.avro`` typed
    fixture encodes as a timestamp-millis logical column (registry
    ``_render_avro_typed``).  ``t_dec`` is encoded from this canonical
    string into a decimal(12,2) logical column, so the typed diff
    exercises genuine avro decimal bytes against the binlog
    NEWDECIMAL decode."""
    eid = F.col("event_id")
    vals = _typed_value_cols(eid)
    cents = F.lit(1) + (eid * 37) % 9999999 + 1  # +1 -> MISMATCH rows
    dec_wrong = F.concat(
        F.when(eid % 3 == 0, F.lit("-")).otherwise(F.lit("")),
        F.floor(cents / 100).cast("string"),
        F.lit("."),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    overrides = dict(vals)
    overrides["t_dec"] = F.when(
        eid % TYPED_DEC_MISMATCH_MOD == TYPED_DEC_MISMATCH_REM, dec_wrong
    ).otherwise(vals["t_dec"])
    overrides["t_dt"] = F.when(
        eid % TYPED_DT_NULL_MOD == TYPED_DT_NULL_REM,
        F.lit(None).cast("string"),
    ).otherwise(vals["t_dt"])
    # avro always carries t_text (binlog-side NULLs -> BINLOG_NULL)
    overrides["t_text"] = F.concat(F.lit("text-"), eid.cast("string"))
    t_dt_ms = F.when(
        eid % TYPED_DT_NULL_MOD == TYPED_DT_NULL_REM,
        F.lit(None).cast("long"),
    ).otherwise(F.unix_millis(F.col("ts")))
    return (
        events.filter(F.col("event_type").isin(*DML_SOURCE_TYPES))
        .filter(eid % EMPTY_FILE_MOD != 0)
        .filter(eid % AVRO_MISSING_MOD != 0)
        .select(
            _binlog_file_col().alias("binlog_file"),
            _base_pos(eid).alias("binlog_position"),
            *[overrides[n].alias(n) for n in overrides],
            t_dt_ms.alias("t_dt_ms"),
        )
    )


TYPED_PAYLOAD_NAMES: list[str] = [
    "t_id", "t_date", "t_year", "t_dt", "t_ts", "t_time", "t_dec",
    "t_text", "t_char", "t_enum", "t_set", "t_json", "t_u8", "t_u64",
    "t_geo",
]


def derive_typed_avro_payload(events: DataFrame) -> DataFrame:
    """The avro twin of the typed row images, as (binlog_file,
    binlog_position, payload map<string,string>) with the planted
    divergences -- input to payload_diff's probe side.  Built from
    derive_typed_avro_columns so the in-memory twin and the real
    ``.avro`` fixture can never drift."""
    cols = derive_typed_avro_columns(events)
    return cols.select(
        "binlog_file",
        "binlog_position",
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in TYPED_PAYLOAD_NAMES]),
            F.array(*[F.col(n) for n in TYPED_PAYLOAD_NAMES]),
        ).alias("payload"),
    )


def derive_avro_payload(events: DataFrame) -> DataFrame:
    """The avro side's ``payload.*`` columns keyed by ``avro_line_no``,
    with the planted divergences from the binlog row image (see the
    module docstring's payload table).  Join-compatible with
    derive_avro_rows output on avro_line_no."""
    eid = F.col("event_id")
    base = dict(zip(
        ["order_id", "customer_name", "product_name", "quantity", "order_timestamp"],
        _payload_cols(eid),
    ))
    return (
        events.filter(F.col("event_type").isin(*DML_SOURCE_TYPES))
        .filter(eid % AVRO_MISSING_MOD != 0)
        .select(
            eid.alias("avro_line_no"),
            base["order_id"],
            # avro always carries the name -- binlog-side NULLs surface
            # as BINLOG_NULL findings, never silently agree
            F.concat(
                F.lit("cust-"), (F.col("user_id") % 1000).cast("string")
            ).alias("customer_name"),
            F.when(
                eid % AVRO_PROD_MISMATCH_MOD == AVRO_PROD_MISMATCH_REM,
                F.lit("prod-X"),
            )
            .otherwise(F.concat(F.lit("prod-"), (eid % 97).cast("string")))
            .alias("product_name"),
            F.when(
                eid % AVRO_QTY_MISMATCH_MOD == AVRO_QTY_MISMATCH_REM,
                F.lit(1) + eid % 10 + 1,
            )
            .otherwise(F.lit(1) + eid % 10)
            .alias("quantity"),
            F.when(
                eid % AVRO_NULL_OTS_MOD == AVRO_NULL_OTS_REM,
                F.lit(None).cast("long"),
            )
            .otherwise(F.unix_millis(F.col("ts")))
            .alias("order_timestamp"),
        )
    )


PAYLOAD_COLUMN_NAMES = (
    "order_id", "customer_name", "product_name", "quantity",
    "order_timestamp",
)


def derive_avro_payload_map(events: DataFrame) -> DataFrame:
    """The avro side of the payload diff as one binlog-keyed string
    map: derive_avro_rows x derive_avro_payload, key-filtered (F3) and
    folded to (binlog_file, binlog_position, payload map<string,
    string>).  Shared by the batch DDL-guard fixture and the streaming
    guard's PER-MICRO-BATCH delta derivation -- every column here is
    row-local event arithmetic, so deriving a batch slice equals the
    full derivation restricted to that slice."""
    avro = derive_avro_rows(events).join(
        derive_avro_payload(events), "avro_line_no"
    )
    usable = avro.filter(
        F.col("binlog_file").isNotNull()
        & (F.col("binlog_file") != "")
        & F.col("binlog_position").isNotNull()
        & (F.col("binlog_position") != 0)
    )
    return usable.select(
        "binlog_file",
        "binlog_position",
        F.map_from_arrays(
            F.array(*[F.lit(n) for n in PAYLOAD_COLUMN_NAMES]),
            F.array(
                *[F.col(n).cast("string") for n in PAYLOAD_COLUMN_NAMES]
            ),
        ).alias("payload"),
    )


def generate_parser_text_lines(events: DataFrame) -> DataFrame:
    """Render the derived binlog events as go-binlogparser-style text
    lines (FIXTURES.md F-3 format) -> (binlog_file, line_no, value).

    Exists so the full text-parsing pipeline (operators/parse.py) gets a
    driver-checked roundtrip: generate text from the derivation, parse it
    back with P1-P9, and the oracle computes the expected table directly
    from the same derivation -- two independent paths, one result.
    """
    b = derive_binlog_events(events).filter(F.col("binlog_file") != "")
    header = F.when(
        F.col("event_type").isin("XID", "Query", "GTID"),
        F.concat(F.col("event_type"), F.lit("Event")),
    ).otherwise(F.col("event_type"))
    date_v = F.regexp_replace(
        F.regexp_replace(F.col("timestamp"), "T", " "), "Z$", ""
    )
    lines_arr = F.array(
        F.concat(F.lit("=== "), header, F.lit(" ===")),
        F.concat(F.lit("Date: "), date_v),
        F.concat(F.lit("Log position: "), F.col("log_position").cast("string")),
        F.concat(F.lit("Schema: "), F.col("schema")),
        F.concat(F.lit("Table: "), F.col("table")),
        F.concat(F.lit("GTID_NEXT: "), F.col("gtid_next")),
        # the paren layout of json_parser.go:103; '--' when ict is null
        # (separator lines are parser noise, so the arity stays fixed)
        F.when(
            F.col("immediate_commmit_timestamp").isNotNull(),
            F.concat(
                F.lit("Immediate commmit timestamp: 0 ("),
                F.col("immediate_commmit_timestamp"),
                F.lit(")"),
            ),
        ).otherwise(F.lit("--")),
        F.lit("--"),
    )
    w = Window.partitionBy("binlog_file").orderBy("line_no")
    ordered = b.withColumn("__ord", F.row_number().over(w))
    return ordered.select(
        "binlog_file",
        F.posexplode(lines_arr).alias("idx", "value"),
        (F.col("__ord") * 10).alias("__base"),
    ).select(
        "binlog_file",
        (F.col("__base") + F.col("idx")).alias("line_no"),
        "value",
    )


def ddl_statement_col() -> F.Column:
    """Deterministic DDL strings for Query events, keyed on
    ``line_no`` (= event_id) and the derived schema/table columns --
    all SQL-expressible so the DuckDB oracle derives the identical
    statements.  By event_id % 13:

      0  ADD-COLUMN ALTER carrying the canonical MySQL 8 online-DDL
         options (``, ALGORITHM=INPLACE, LOCK=NONE`` -- must classify
         OPTION_NO_EFFECT so the moved set stays fully known)
      1  qualified CREATE with IF NOT EXISTS; declares (id, order_id,
         quantity) -- order_id/quantity overlap the avro payload's
         field names so the schema-agreement report exercises its
         AGREE arm, id and the clause-family columns exercise
         BINLOG_ONLY, the remaining payload fields LAKE_ONLY
      2  backtick-quoted DROP
      3  sub-split by k = event_id % 5 (coprime with 13, every combo
         occurs): k=0 non-DDL noise (BEGIN -- must be filtered);
         k=1 TRUNCATE (``TABLE`` keyword on even event_id, the bare
         legal form on odd -- a DATA reset: whole-key drift-window
         opener, membership/types carry); k=2 standalone qualified
         CREATE UNIQUE INDEX .. ON (kind INDEX, keyed on the ON
         target); k=3 multi-name ``OPTIMIZE TABLE t, t_r`` (kind
         MAINTENANCE, exploded per name; the second name exercises
         canonical rename threading); k=4 DROP INDEX .. ON
      4  lowercase DROP-COLUMN ALTER (case-insensitive matching)
      5  MULTI-CLAUSE ALTER: ADD COLUMN with a parens-comma type
         (DECIMAL(10,2) -- must not split), DROP COLUMN, ADD INDEX
         (recognized no-column-effect clause)
      6  MODIFY COLUMN retype, parity-split: even event_id widens to
         BIGINT NOT NULL, odd narrows to SMALLINT (the type matrix's
         narrowing plant; shape moves, membership does not)
      7  CHANGE COLUMN old new (rename+retype -- the worst
         mis-pairing case)
      8  ALTER ... RENAME COLUMN old TO new
      9  RENAME TABLE t TO t_r (threaded through the timeline)
     10  ALTER against the RENAMED name (exercises canonical
         threading) whose first clause is OUTSIDE the grammar
         (CONVERT TO CHARACTER SET -- must land on the PARTIAL_PARSE
         channel, and its window must quarantine whole-key)
     11  the gh-ost/pt-osc ATOMIC SWAP on a separate table family
         (``RENAME TABLE s TO s_old, s_new TO s``): both pairs must
         parse and the live name must thread into s_new's history
     12  parenthesized multi-column ADD with online-DDL options
         (``ADD (x INT, y VARCHAR(255)), ALGORITHM=INPLACE,
         LOCK=NONE`` -- per-column explode, moved set fully known)"""
    eid = F.col("line_no")
    m = eid % 13
    k = eid % 5
    four = (eid % 4).cast("string")
    c_col = F.concat(F.lit("c"), four)
    a_col = F.concat(F.lit("a"), four)
    r_col = F.concat(F.lit("r"), four)
    n_col = F.concat(F.lit("n"), four)
    p_col = F.concat(F.lit("p"), four)
    x_col = F.concat(F.lit("x"), four)
    y_col = F.concat(F.lit("y"), four)
    # the swap family: 's' + the table's trailing digit ('t2' -> 's2')
    s_tbl = F.concat(F.lit("s"), F.substring(F.col("table"), 2, 8))
    return (
        F.when(
            m == 0,
            F.concat(
                F.lit("ALTER TABLE "), F.col("table"),
                F.lit(" ADD COLUMN "), c_col,
                F.lit(" INT, ALGORITHM=INPLACE, LOCK=NONE"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("CREATE TABLE IF NOT EXISTS "), F.col("schema"),
                F.lit("."), F.col("table"),
                F.lit(" (id INT PRIMARY KEY, order_id BIGINT, quantity INT)"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("DROP TABLE `"), F.col("schema"), F.lit("`.`"),
                F.col("table"), F.lit("`"),
            ),
        )
        .when(
            (m == 3) & (k == 1),
            F.when(
                eid % 2 == 0,
                F.concat(F.lit("TRUNCATE TABLE "), F.col("table")),
            ).otherwise(F.concat(F.lit("TRUNCATE "), F.col("table"))),
        )
        .when(
            (m == 3) & (k == 2),
            F.concat(
                F.lit("CREATE UNIQUE INDEX ux_c"), four, F.lit(" ON "),
                F.col("schema"), F.lit("."), F.col("table"),
                F.lit(" (c"), four, F.lit(")"),
            ),
        )
        .when(
            (m == 3) & (k == 3),
            F.concat(
                F.lit("OPTIMIZE TABLE "), F.col("table"), F.lit(", "),
                F.col("table"), F.lit("_r"),
            ),
        )
        .when(
            (m == 3) & (k == 4),
            F.concat(
                F.lit("DROP INDEX ix_a"), four, F.lit(" ON "),
                F.col("table"),
            ),
        )
        .when(m == 3, F.lit("BEGIN"))
        .when(
            m == 4,
            F.concat(
                F.lit("alter table "), F.col("table"),
                F.lit(" drop column "), c_col,
            ),
        )
        .when(
            m == 5,
            F.concat(
                F.lit("ALTER TABLE "), F.col("table"),
                F.lit(" ADD COLUMN "), a_col, F.lit(" DECIMAL(10,2)"),
                F.lit(", DROP COLUMN "), c_col,
                F.lit(", ADD INDEX ix_"), a_col,
                F.lit(" ("), a_col, F.lit(")"),
            ),
        )
        .when(
            m == 6,
            F.concat(
                F.lit("ALTER TABLE "), F.col("table"),
                F.lit(" MODIFY COLUMN "), c_col,
                F.when(
                    eid % 2 == 0, F.lit(" BIGINT NOT NULL")
                ).otherwise(F.lit(" SMALLINT")),
            ),
        )
        .when(
            m == 7,
            F.concat(
                F.lit("ALTER TABLE "), F.col("table"),
                F.lit(" CHANGE COLUMN "), c_col, F.lit(" "), r_col,
                F.lit(" BIGINT"),
            ),
        )
        .when(
            m == 8,
            F.concat(
                F.lit("ALTER TABLE `"), F.col("table"),
                F.lit("` RENAME COLUMN "), c_col, F.lit(" TO "), n_col,
            ),
        )
        .when(
            m == 9,
            F.concat(
                F.lit("RENAME TABLE "), F.col("table"),
                F.lit(" TO "), F.col("table"), F.lit("_r"),
            ),
        )
        .when(
            m == 10,
            F.concat(
                F.lit("ALTER TABLE "), F.col("table"), F.lit("_r"),
                F.lit(" CONVERT TO CHARACTER SET utf8mb4, ADD COLUMN "),
                p_col, F.lit(" INT"),
            ),
        )
        .when(
            m == 11,
            F.concat(
                F.lit("RENAME TABLE "), s_tbl, F.lit(" TO "), s_tbl,
                F.lit("_old, "), s_tbl, F.lit("_new TO "), s_tbl,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("ALTER TABLE "), F.col("table"),
                F.lit(" ADD ("), x_col, F.lit(" INT, "), y_col,
                F.lit(" VARCHAR(255)), ALGORITHM=INPLACE, LOCK=NONE"),
            ),
        )
    )


def generate_ddl_text_lines(events: DataFrame) -> DataFrame:
    """Render the derivation's Query events as parser-text lines WITH a
    ``Query: <statement>`` kv carrying a deterministic DDL string --
    the fixture behind the schema-change timeline (operators/ddl.py).
    Same roundtrip design as generate_parser_text_lines: the registered
    query parses these lines through the REAL text pipeline (P1-P9)
    and extracts DDL from ``extra['query']``, while the oracle derives
    the expected timeline from the same event arithmetic directly --
    two independent paths, one result."""
    b = derive_binlog_events(events).filter(
        (F.col("binlog_file") != "") & (F.col("event_type") == "Query")
    )
    date_v = F.regexp_replace(
        F.regexp_replace(F.col("timestamp"), "T", " "), "Z$", ""
    )
    lines_arr = F.array(
        F.lit("=== QueryEvent ==="),
        F.concat(F.lit("Date: "), date_v),
        F.concat(F.lit("Log position: "), F.col("log_position").cast("string")),
        F.concat(F.lit("Schema: "), F.col("schema")),
        F.concat(F.lit("Table: "), F.col("table")),
        F.concat(F.lit("GTID_NEXT: "), F.col("gtid_next")),
        F.concat(F.lit("Query: "), ddl_statement_col()),
        F.lit("--"),
    )
    w = Window.partitionBy("binlog_file").orderBy("line_no")
    ordered = b.withColumn("__ord", F.row_number().over(w))
    return ordered.select(
        "binlog_file",
        F.posexplode(lines_arr).alias("idx", "value"),
        (F.col("__ord") * 10).alias("__base"),
    ).select(
        "binlog_file",
        (F.col("__base") + F.col("idx")).alias("line_no"),
        "value",
    )


def derive_avro_rows(events: DataFrame) -> DataFrame:
    """events -> the flat ``avro_rows`` table (FIXTURES.md F-2, flattened).

    ``source_timestamp`` is epoch-millis (compare_timestamps.go:44,:213),
    generated relative to the *effective* binlog time (which is
    second-truncated when the high-precision timestamp is NULL) so that
    only the deliberately-planted rows exceed the 100 ms tolerance.
    """
    eid = F.col("event_id")
    base_ms = F.when(
        eid % NULL_ICT_MOD == 0,
        F.unix_millis(F.date_trunc("second", F.col("ts"))),
    ).otherwise(F.unix_millis(F.col("ts")))
    delta_ms = F.when(eid % TS_MISMATCH_MOD == 0, F.lit(TS_MISMATCH_DELTA_MS)).otherwise(
        eid % TS_JITTER_MOD
    )
    ct = F.lit(None).cast("string")
    for src in DML_SOURCE_TYPES:
        ct = F.when(
            F.col("event_type") == src,
            F.when(eid % CT_MISMATCH_MOD == 0, CHANGE_TYPE_ROTATED[src]).otherwise(
                F.lit(CHANGE_TYPE_MAP[src])
            ),
        ).otherwise(ct)
    # mixed case exercises the case-insensitive compare (compare_timestamps.go:241)
    ct = F.when(eid % 2 == 0, F.lower(ct)).otherwise(ct)
    gtid_eid = F.when(eid % GTID_MISMATCH_MOD == 0, eid + 1).otherwise(eid)
    pos = F.when(
        (eid % AVRO_BADKEY_MOD) == AVRO_BADKEY_REM, F.lit(0).cast("long")
    ).when(
        (eid % AVRO_ORPHAN_MOD) == AVRO_ORPHAN_REM, _base_pos(eid) + 7
    ).otherwise(_base_pos(eid))
    return (
        events.filter(F.col("event_type").isin(*DML_SOURCE_TYPES))
        .filter(eid % AVRO_MISSING_MOD != 0)
        .select(
            (base_ms + delta_ms).alias("source_timestamp"),
            F.concat(F.lit("db"), (F.col("user_id") % 2).cast("string")).alias("database"),
            F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")).alias("table"),
            ct.alias("change_type"),
            F.concat(F.lit("uuid-0:"), gtid_eid.cast("string")).alias("gtid"),
            _binlog_file_col().alias("binlog_file"),
            pos.alias("binlog_position"),
            (F.col("event_type") == "purchase").alias("is_deleted"),
            eid.alias("avro_line_no"),
        )
    )


def derive_multimaster_changes(events: DataFrame) -> DataFrame:
    """events -> a synthetic MULTI-writer change feed for the conflict
    detector: the single-writer fixture (every GTID under uuid-0) can
    never conflict, so this view assigns ownership in blocks of 64
    events -- ``uuid-(event_id // 64) % 3`` -- modelling a topology
    where masters take turns owning the write path and the hazard is a
    key whose writes straddle an ownership handover.  Derived with only
    SQL-expressible arithmetic so the DuckDB oracle mirrors it
    verbatim (same discipline as every planted divergence above).

    Returns (key, writer, ts_ms, event_id)."""
    eid = F.col("event_id")
    return events.filter(F.col("user_id").isNotNull()).select(
        F.col("user_id").alias("key"),
        F.concat(
            F.lit("uuid-"), (F.floor(eid / 64) % 3).cast("string")
        ).alias("writer"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        eid.alias("event_id"),
    )
