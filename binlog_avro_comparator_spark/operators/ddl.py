"""DDL schema-change timeline from the binlog Query-event stream.

The reference parser faithfully carries the ``Query`` value of Query
events (json_parser.go:95 lists "Query" in the typed-key vocabulary;
the open-schema tail lands it in ``extra``) but nothing downstream ever
reads it -- so the first ``ALTER TABLE`` on a watched table is invisible
to every payload-diff consumer, which will silently mis-pair columns
across the DDL boundary.  This module closes that gap:

  * :func:`parse_ddl_statements` -- pull ``CREATE/ALTER/DROP TABLE``
    out of Query events (backtick quoting, optional ``IF [NOT] EXISTS``,
    optional ``schema.`` qualifier with fallback to the event's session
    default schema -- the ``Schema:`` kv a real MySQL Query event
    carries).  Non-DDL statements (BEGIN, SET, DML) are dropped.
  * :func:`schema_timeline` -- the per-(schema, table) effective-dated
    schema-version table (SCD2 shape: version, valid_from, valid_to,
    is_current), ordered by event time with binlog coordinates as the
    tiebreak.
  * :func:`ddl_drift_windows` -- per table, the coordinate intervals
    [ALTER, next writer-schema refresh) in which row-image payloads may
    no longer line up with the avro writer schema.
  * :func:`schema_column_matrix` -- the effective column set per
    version (CREATE resets, ADD/DROP COLUMN adjust, DROP TABLE
    empties).
  * :func:`payload_diff_ddl_guard` lives in operators/compare.py (it
    composes with payload_diff's join); this module only produces the
    frames it consumes.

Scale shape: Query events are a thin slice of the feed (statement
cardinality, not row cardinality); the timeline window partitions by
(schema_name, table_name) -- table-cardinality parallelism -- and the
boundary frame is table-cardinality, always broadcastable.  All parsing
is regexp built-ins, JVM-side, codegen end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# One pattern, three captures: (1) verb, (2) first identifier,
# (3) identifier after a dot (empty when unqualified).  Backticks
# optional on either part; IF [NOT] EXISTS tolerated.  RE2-compatible
# so the same literal runs in any engine.
DDL_RE = (
    r"(?i)^\s*(create|alter|drop)\s+table\s+"
    r"(?:if\s+(?:not\s+)?exists\s+)?"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?"
)


def parse_ddl_statements(parsed: DataFrame) -> DataFrame:
    """Parsed binlog events (operators/parse.parse_binlog_text shape)
    -> one row per schema-changing statement.

    The statement rides in ``extra['query']`` (the reference's dynamic
    tail keeps it verbatim); the session default schema (``schema``
    column -- json_parser.go carries "Schema" on every Query event)
    resolves unqualified table names, which is MySQL's own rule for
    statements replicated without a qualifier.  Returns (schema_name,
    table_name, ddl_kind, statement, timestamp, binlog_file,
    log_position, line_no)."""
    q = (
        parsed.filter(F.col("event_type") == "Query")
        .select(
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            F.col("schema").alias("__default_schema"),
            F.col("extra")["query"].alias("statement"),
        )
        .filter(F.col("statement").isNotNull())
    )
    kind = F.upper(F.regexp_extract("statement", DDL_RE, 1))
    g2 = F.regexp_extract("statement", DDL_RE, 2)
    g3 = F.regexp_extract("statement", DDL_RE, 3)
    return (
        q.select(
            F.when(g3 != "", g2)
            .otherwise(F.col("__default_schema"))
            .alias("schema_name"),
            F.when(g3 != "", g3).otherwise(g2).alias("table_name"),
            kind.alias("ddl_kind"),
            "statement",
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
        )
        .filter(F.col("ddl_kind") != "")
    )


def schema_timeline(ddl: DataFrame) -> DataFrame:
    """DDL statements -> the effective-dated schema-version table.

    SCD2 shape (same contract as snapshot.scd2_history): per
    (schema_name, table_name), versions numbered in event-time order
    (binlog coordinates break timestamp ties, line_no breaks
    zero-position ties -- the full key is unique, so the window is
    deterministic); ``valid_to`` is the next version's ``valid_from``,
    NULL on the current version.  One window, partitioned by table
    identity: statement-cardinality state, table-cardinality
    parallelism -- this frame is metadata-sized at any feed size."""
    w = Window.partitionBy("schema_name", "table_name").orderBy(
        "timestamp", "binlog_file", "log_position", "line_no"
    )
    return ddl.select(
        "schema_name",
        "table_name",
        F.row_number().over(w).cast("long").alias("version"),
        "ddl_kind",
        "statement",
        F.col("timestamp").alias("valid_from"),
        F.lead("timestamp").over(w).alias("valid_to"),
        F.lead("timestamp").over(w).isNull().alias("is_current"),
        "binlog_file",
        "log_position",
    )


def binlog_coord(file_col: F.Column, pos_col: F.Column) -> F.Column:
    """Total order over binlog coordinates as ONE sortable string:
    ``mysql-bin.NNNNNN:<pos zero-padded to 12>``.  Binlog file names
    zero-pad their sequence number, so lexicographic file order IS
    replication order, and the padded position extends it within a
    file.  A plain string key compares identically in every engine."""
    return F.concat(
        file_col, F.lit(":"), F.lpad(pos_col.cast("string"), 12, "0")
    )


def ddl_drift_windows(ddl: DataFrame) -> DataFrame:
    """Per (schema_name, table_name), the coordinate intervals in which
    row-image payload diffs are UNTRUSTED: each window opens at an
    ``ALTER TABLE`` (row images now decode under a new table shape) and
    closes at the next ``CREATE`` statement for the same table -- the
    writer-schema refresh marker after which producer and binlog agree
    again (reconciling against cdc_avro_schema_census is the lake-side
    equivalent).  A window with no subsequent CREATE stays open
    (``win_to`` NULL).  Zero positions carry no coordinate (the same
    zero-as-null rule as the key compare, SURVEY Q5) and are skipped.

    One window function partitioned by table identity over a
    statement-cardinality frame; output is ALTER-cardinality --
    metadata-sized, always broadcastable.  Returns (schema_name,
    table_name, win_from, win_to) as sortable coordinate strings."""
    d = ddl.filter(F.col("log_position") != 0).select(
        "schema_name",
        "table_name",
        "ddl_kind",
        binlog_coord(F.col("binlog_file"), F.col("log_position")).alias(
            "coord"
        ),
        "line_no",
    )
    # line_no breaks duplicate-coordinate ties so the frame walk is
    # deterministic in any engine
    w = (
        Window.partitionBy("schema_name", "table_name")
        .orderBy("coord", "line_no")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_create = F.min(
        F.when(F.col("ddl_kind") == "CREATE", F.col("coord"))
    ).over(w)
    return (
        d.withColumn("win_to", next_create)
        .filter(F.col("ddl_kind") == "ALTER")
        .select(
            "schema_name",
            "table_name",
            F.col("coord").alias("win_from"),
            "win_to",
        )
        # two ALTERs at one coordinate (the dup-key plant) open the
        # SAME window -- emit it once
        .distinct()
    )


# column-grammar fragments for the effective-column fold
_ADD_COL_RE = r"(?i)\badd\s+column\s+`?([A-Za-z_$][A-Za-z0-9_$]*)`?"
_DROP_COL_RE = r"(?i)\bdrop\s+column\s+`?([A-Za-z_$][A-Za-z0-9_$]*)`?"
# identifiers opening a column def: after '(' start or a comma; type
# arguments like DECIMAL(10,2) never match (digit-led), constraint
# clauses are filtered by keyword below
_CREATE_COL_RE = r"(?:^|,)\s*`?([A-Za-z_$][A-Za-z0-9_$]*)"
_CONSTRAINT_KEYWORDS = (
    "primary", "key", "unique", "constraint", "foreign", "index", "check",
)


def _create_columns(stmt) -> F.Column:
    """Column names declared by a CREATE TABLE's parenthesized list."""
    inner = F.regexp_extract(stmt, r"\((.*)\)\s*$", 1)
    cand = F.regexp_extract_all(inner, F.lit(_CREATE_COL_RE), F.lit(1))
    return F.array_distinct(
        F.filter(
            cand, lambda c: ~F.lower(c).isin(*_CONSTRAINT_KEYWORDS)
        )
    )


def schema_column_matrix(ddl: DataFrame) -> DataFrame:
    """The timeline made ACTIONABLE: for every (schema, table,
    version), the set of columns effectively present -- the inventory
    a payload-diff consumer needs to know WHICH columns can mis-pair
    across a boundary (the timeline says WHEN the shape moved; this
    says WHAT it moved to).

    Fold semantics per column: CREATE resets the table to its declared
    list, ADD COLUMN adds, DROP COLUMN removes, DROP TABLE empties.
    The fold is carry-forward, not a join triangle: a versions x
    touched-columns grid (linear in statements, never statements^2)
    gets a per-(table, column) ``last(effect) ignore nulls`` window --
    one shuffle on table identity, metadata-sized end to end.
    Returns (schema_name, table_name, version, column_name) for
    present columns only."""
    w = Window.partitionBy("schema_name", "table_name").orderBy(
        "timestamp", "binlog_file", "log_position", "line_no"
    )
    empty = F.expr("cast(array() as array<string>)")
    add_col = F.regexp_extract("statement", _ADD_COL_RE, 1)
    drop_col = F.regexp_extract("statement", _DROP_COL_RE, 1)
    create_cols = F.when(
        F.col("ddl_kind") == "CREATE", _create_columns(F.col("statement"))
    ).otherwise(empty)
    d = ddl.select(
        "schema_name",
        "table_name",
        "ddl_kind",
        F.row_number().over(w).cast("long").alias("version"),
        add_col.alias("__add"),
        drop_col.alias("__drop"),
        create_cols.alias("__create_cols"),
    )
    touched = F.array_distinct(
        F.flatten(
            F.array(
                F.col("__create_cols"),
                F.when(F.col("__add") != "", F.array("__add")).otherwise(empty),
                F.when(F.col("__drop") != "", F.array("__drop")).otherwise(empty),
            )
        )
    )
    uni = (
        d.select("schema_name", "table_name", F.explode(touched).alias("column_name"))
        .distinct()
    )
    grid = d.join(uni, ["schema_name", "table_name"])
    effect = (
        F.when(
            F.col("ddl_kind") == "CREATE",
            F.array_contains(F.col("__create_cols"), F.col("column_name")),
        )
        .when(F.col("ddl_kind") == "DROP", F.lit(False))
        .when(F.col("__add") == F.col("column_name"), F.lit(True))
        .when(F.col("__drop") == F.col("column_name"), F.lit(False))
    )
    wp = (
        Window.partitionBy("schema_name", "table_name", "column_name")
        .orderBy("version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pres = grid.select(
        "schema_name",
        "table_name",
        "version",
        "column_name",
        F.last(effect, ignorenulls=True).over(wp).alias("__present"),
    )
    return pres.filter(F.col("__present")).select(
        "schema_name", "table_name", "version", "column_name"
    )


def schema_census_drift(
    timeline: DataFrame, census_versions: DataFrame
) -> DataFrame:
    """Binlog-vs-lake schema drift audit: per (schema_name,
    table_name), how many shape changes the BINLOG has seen (timeline
    versions) vs how many writer-schema versions the avro LAKE has
    shipped (census fingerprints); a table whose binlog version count
    exceeds its lake fingerprint count has a window where payload
    diffs are unsafe (the producer kept writing the old schema past a
    DDL).  Both inputs are metadata-cardinality; the join is a
    broadcast.  ``census_versions``: (schema_name, table_name,
    n_writer_schemas).  Returns (schema_name, table_name,
    n_binlog_versions, n_writer_schemas, drift)."""
    t = timeline.groupBy("schema_name", "table_name").agg(
        F.count("*").alias("n_binlog_versions")
    )
    j = t.join(F.broadcast(census_versions), ["schema_name", "table_name"], "left")
    n_w = F.coalesce(F.col("n_writer_schemas"), F.lit(0)).alias(
        "n_writer_schemas"
    )
    return j.select(
        "schema_name",
        "table_name",
        "n_binlog_versions",
        n_w,
        (F.col("n_binlog_versions") > F.coalesce(F.col("n_writer_schemas"), F.lit(0))).alias(
            "drift"
        ),
    )
