"""DDL schema-change timeline from the binlog Query-event stream.

The reference parser faithfully carries the ``Query`` value of Query
events (json_parser.go:95 lists "Query" in the typed-key vocabulary;
the open-schema tail lands it in ``extra``) but nothing downstream ever
reads it -- so the first ``ALTER TABLE`` on a watched table is invisible
to every payload-diff consumer, which will silently mis-pair columns
across the DDL boundary.  This module closes that gap with a grammar
that covers the DDL a real MySQL 8 shop emits in week one:

  * :func:`parse_ddl_statements` -- pull ``CREATE/ALTER/DROP TABLE``
    and ``RENAME TABLE a TO b`` out of Query events (backtick quoting,
    optional ``IF [NOT] EXISTS``, optional ``schema.`` qualifier with
    fallback to the event's session default schema -- the ``Schema:``
    kv a real MySQL Query event carries).  ``ALTER ... RENAME TO b``
    surfaces its target too.  Non-DDL statements (BEGIN, SET, DML) are
    dropped.
  * :func:`alter_clauses` -- split an ALTER body into its clauses
    (top-level commas found by clause-keyword lookahead, so type args
    like ``DECIMAL(10,2)`` never split) and classify each:
    ``ADD/DROP/MODIFY/CHANGE/RENAME COLUMN``, ``RENAME TO``, index /
    constraint operations (recognized, no column effect), everything
    else ``UNPARSED``.
  * :func:`ddl_parse_anomalies` -- the warn-and-skip channel (SURVEY
    §2.8 discipline): clauses the grammar skips are EMITTED as
    findings, never dropped silently -- a partially-parsed multi-clause
    ALTER must not read as success.
  * :func:`schema_timeline` -- the per-(schema, table) effective-dated
    schema-version table (SCD2 shape), with ``RENAME TABLE`` THREADED
    THROUGH: statements against a renamed name join the original
    table's history (one table, one history) and ``current_name``
    carries the as-of name.
  * :func:`ddl_drift_windows` / :func:`ddl_drift_window_columns` --
    per table, the coordinate intervals [ALTER-or-RENAME, next
    writer-schema refresh) in which row-image payloads may no longer
    line up with the avro writer schema; the ``_columns`` variant adds
    WHICH columns each window's opening statement moved (and whether
    that set is fully known), enabling the column-granular quarantine
    in operators/compare.payload_diff_column_guard.
  * :func:`schema_column_matrix` -- the effective column set per
    version (CREATE resets, ADD/DROP adjust, CHANGE/RENAME COLUMN
    move, DROP TABLE empties).

Scale shape: Query events are a thin slice of the feed (statement
cardinality, not row cardinality); every window partitions by
(schema, table) -- table-cardinality parallelism -- the rename-edge
resolution is a bounded chain of broadcast joins over an
edge-cardinality frame, and all parsing is regexp built-ins, JVM-side,
codegen end-to-end.
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

# RENAME TABLE takes a comma list of ``old TO new`` pairs and MySQL
# executes them left to right -- the gh-ost/pt-osc atomic cut-over
# ``RENAME TABLE t TO _t_old, _t_new TO t`` is the canonical two-pair
# form, and its SECOND pair (the new table taking the live name) is
# the one that re-keys the live feed.  Every well-formed pair explodes
# into its own RENAME row (``pair_no`` keeps the in-statement order);
# fragments outside the pair grammar surface on the PARTIAL_PARSE
# channel, never silently.
_RENAME_VERB_RE = r"(?i)^\s*rename\s+table\s"
_RENAME_BODY_RE = r"(?is)^\s*rename\s+table\s+(.*?)\s*;?\s*$"
# never-silent fallback capture for a RENAME whose every pair fails
# the pair grammar (e.g. a truncated ``RENAME TABLE t TO``): the loose
# leading token keys the fallback frame row
_RENAME_LOOSE_RE = r"(?is)^\s*rename\s+table\s+`?([^`\s.,;]+)"
_RENAME_PAIR_RE = (
    r"(?is)^\s*`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?"
    r"\s+to\s+"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?\s*$"
)
# legacy single-pair form, kept for external consumers of the constant
RENAME_TABLE_RE = (
    r"(?i)^\s*rename\s+table\s+"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?"
    r"\s+to\s+"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?"
)

# ALTER TABLE t ... RENAME [TO|AS] new -- a table rename too.  The
# probe is CLAUSE-ANCHORED (start of the ALTER body or a top-level
# comma) and runs against the statement with single-quoted string
# literals stripped, so ``COMMENT 'rename to x'`` or a DEFAULT value
# can never fabricate a rename target (RENAME COLUMN never matches
# either: the next word is COLUMN, not TO/AS).
_QUOTED_LITERAL_RE = r"'[^']*'"
_ALTER_RENAME_TO_RE = (
    r"(?i)(?:^|,)\s*rename\s+(?:to|as)\s+"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?"
)


def _qualified(g_first, g_second, default_schema):
    """(schema, name) from a two-capture qualified-identifier match:
    ``a.b`` -> (a, b); bare ``b`` -> (default_schema, b)."""
    schema = F.when(g_second != "", g_first).otherwise(default_schema)
    name = F.when(g_second != "", g_second).otherwise(g_first)
    return schema, name


# DROP TABLE takes a comma list of qualified names; the list segment
# (after the verb and optional IF EXISTS, before optional
# CASCADE/RESTRICT) explodes into one DROP row per table
_DROP_LIST_RE = (
    r"(?is)^\s*drop\s+table\s+(?:if\s+exists\s+)?(.*?)"
    r"\s*(?:cascade|restrict)?\s*;?\s*$"
)
_NAME_ONLY_RE = (
    r"^\s*`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?\s*$"
)

# TRUNCATE [TABLE] t -- a DATA-reset statement (membership and types
# are untouched; every row in the table is gone).  MySQL allows the
# bare ``TRUNCATE t`` form and logs the statement as issued.
_TRUNCATE_VERB_RE = r"(?i)^\s*truncate\s"
_TRUNCATE_RE = (
    r"(?is)^\s*truncate\s+(?:table\s+)?"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?\s*;?\s*$"
)
# never-silent fallback capture: the loose leading token after the
# verb (backticks stripped) so a name outside the identifier grammar
# still keys a frame row while the anomaly channel reports it
_TRUNCATE_LOOSE_RE = (
    r"(?is)^\s*truncate\s+(?:table\s+)?`?([^`\s.,;]+)"
)

# standalone index DDL: CREATE [UNIQUE|FULLTEXT|SPATIAL] INDEX i ON t
# and DROP INDEX i ON t -- no column effect (the ALTER-clause INDEX_OP
# twins), but the statement log must SEE them: they are the statements
# online-schema-change tooling interleaves with the ALTERs this
# subsystem guards around
_INDEX_VERB_RE = (
    r"(?is)^\s*(?:create\s+(?:unique\s+|fulltext\s+|spatial\s+)?index"
    r"|drop\s+index)\s"
)
_INDEX_ON_RE = (
    r"(?is)^\s*(?:create\s+(?:unique\s+|fulltext\s+|spatial\s+)?|drop\s+)"
    r"index\s+`?[A-Za-z0-9_$]+`?\s+on\s+"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?"
)
_INDEX_ON_LOOSE_RE = r"(?is)\son\s+`?([^`\s.,;(]+)"

# maintenance statements take a comma list of tables like DROP does:
# OPTIMIZE/ANALYZE/REPAIR [NO_WRITE_TO_BINLOG|LOCAL] TABLE a, b --
# no shape effect, but binlogged and part of every operational
# runbook; the list explodes per name (pair_no keeps order)
_MAINT_VERB_RE = (
    r"(?is)^\s*(?:optimize|analyze|repair)\s+"
    r"(?:no_write_to_binlog\s+|local\s+)?table\s"
)
_MAINT_BODY_RE = (
    r"(?is)^\s*(?:optimize|analyze|repair)\s+"
    r"(?:no_write_to_binlog\s+|local\s+)?table\s+(.*?)\s*;?\s*$"
)


def parse_ddl_statements(parsed: DataFrame) -> DataFrame:
    """Parsed binlog events (operators/parse.parse_binlog_text shape)
    -> one row per schema-changing statement -- and per TABLE for
    multi-name ``DROP TABLE a, b`` and per PAIR for multi-pair
    ``RENAME TABLE a TO b, c TO d`` (MySQL executes rename pairs left
    to right; ``pair_no`` preserves that order, so the gh-ost atomic
    cut-over's second pair -- the new table taking the live name --
    threads the timeline like any other rename).  Fragments that fail
    the name/pair grammar contribute no row here and surface on the
    PARTIAL_PARSE channel instead; a DROP whose EVERY fragment fails
    keeps one fallback row under the statement's leading identifier so
    the statement never vanishes from both the frame and the channel.

    The statement rides in ``extra['query']`` (the reference's dynamic
    tail keeps it verbatim); the session default schema (``schema``
    column -- json_parser.go carries "Schema" on every Query event)
    resolves unqualified table names, which is MySQL's own rule for
    statements replicated without a qualifier.  ``ddl_kind`` is
    CREATE / ALTER / DROP / RENAME / TRUNCATE / INDEX / MAINTENANCE:
    TRUNCATE ([TABLE] optional, bare ``TRUNCATE t`` is legal MySQL) is
    a DATA reset -- membership and types carry forward but downstream
    drift windows open whole-key; standalone ``CREATE/DROP INDEX .. ON
    t`` keys on the ON target; OPTIMIZE/ANALYZE/REPAIR TABLE explodes
    its comma list per table like DROP does.  All three follow the
    never-silent rule: a name outside the strict identifier grammar
    falls back to the loose leading token (the statement keeps a frame
    row) and ddl_parse_anomalies reports the miss.  RENAME rows (and
    ALTERs carrying a
    top-level ``RENAME TO`` clause -- probed with string literals
    stripped so quoted text never fabricates a target) also fill
    ``new_schema_name`` / ``new_table_name``.  Returns (schema_name,
    table_name, ddl_kind, new_schema_name, new_table_name, statement,
    timestamp, binlog_file, log_position, line_no, pair_no)."""
    return _statements_from_query_rows(_query_rows(parsed))


def _query_rows(parsed: DataFrame) -> DataFrame:
    """The narrow Query-event slice the statement grammar consumes:
    (timestamp, binlog_file, log_position, line_no, __default_schema,
    statement).  Split out of parse_ddl_statements so hot callers can
    MATERIALIZE this frame (statement-cardinality -- tiny at any feed
    size) before the verb-family union below, whose eight branches
    would otherwise each carry -- and the analyzer each re-walk -- the
    entire upstream parse pipeline (guide 3.3: wide unions over a heavy
    subtree make planning itself the bottleneck)."""
    return (
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


def _statements_from_query_rows(q: DataFrame) -> DataFrame:
    """parse_ddl_statements' verb-family union over a prepared
    Query-rows frame (see _query_rows)."""
    dflt = F.col("__default_schema")
    kind = F.upper(F.regexp_extract("statement", DDL_RE, 1))
    g2 = F.regexp_extract("statement", DDL_RE, 2)
    g3 = F.regexp_extract("statement", DDL_RE, 3)
    stripped = F.regexp_replace(F.col("statement"), _QUOTED_LITERAL_RE, "''")
    a_body = F.regexp_extract(stripped, _ALTER_BODY_RE, 1)
    a1 = F.regexp_extract(a_body, _ALTER_RENAME_TO_RE, 1)
    a2 = F.regexp_extract(a_body, _ALTER_RENAME_TO_RE, 2)
    t_schema, t_name = _qualified(g2, g3, dflt)
    at_schema, at_name = _qualified(a1, a2, dflt)
    has_art = (kind == "ALTER") & (a1 != "")
    single = q.select(
        t_schema.alias("schema_name"),
        t_name.alias("table_name"),
        kind.alias("ddl_kind"),
        F.when(has_art, at_schema).cast("string").alias("new_schema_name"),
        F.when(has_art, at_name).cast("string").alias("new_table_name"),
        "statement",
        "timestamp",
        "binlog_file",
        "log_position",
        "line_no",
        F.lit(0).alias("pair_no"),
    ).filter(~F.col("ddl_kind").isin("", "DROP"))
    # RENAME TABLE: explode the pair list (one RENAME row per
    # well-formed ``old TO new`` pair, in statement order); bad
    # fragments surface on ddl_parse_anomalies.  A rename whose FIRST
    # pair parses always keeps at least one row, so the anomaly
    # channel (which re-derives fragments from these rows) sees the
    # statement.
    ren_src = q.filter(F.col("statement").rlike(_RENAME_VERB_RE))
    pair = F.posexplode(
        F.split(F.regexp_extract("statement", _RENAME_BODY_RE, 1), ",")
    ).alias("__pair_no", "__frag")
    p1 = F.regexp_extract("__frag", _RENAME_PAIR_RE, 1)
    p2 = F.regexp_extract("__frag", _RENAME_PAIR_RE, 2)
    p3 = F.regexp_extract("__frag", _RENAME_PAIR_RE, 3)
    p4 = F.regexp_extract("__frag", _RENAME_PAIR_RE, 4)
    ps_schema, ps_name = _qualified(p1, p2, F.col("__default_schema"))
    pt_schema, pt_name = _qualified(p3, p4, F.col("__default_schema"))
    renames = (
        ren_src.select(
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            "__default_schema",
            "statement",
            pair,
        )
        .filter(F.col("__frag").rlike(_RENAME_PAIR_RE))
        .select(
            ps_schema.alias("schema_name"),
            ps_name.alias("table_name"),
            F.lit("RENAME").alias("ddl_kind"),
            pt_schema.cast("string").alias("new_schema_name"),
            pt_name.cast("string").alias("new_table_name"),
            "statement",
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            F.col("__pair_no").alias("pair_no"),
        )
    )
    # never-silent fallback: a RENAME whose EVERY pair fails the pair
    # grammar (e.g. a truncated ``RENAME TABLE t TO``) keeps one
    # RENAME row under the loose leading token -- new_* stay NULL (no
    # edge threads), and ddl_parse_anomalies re-derives the bad
    # fragments from this row's statement, so the statement is
    # anomaly-visible instead of vanishing (same discipline as
    # drop_fallback below)
    ren_good = renames.select(
        "binlog_file", "log_position", "line_no"
    ).distinct()
    ren_loose = F.regexp_extract("statement", _RENAME_LOOSE_RE, 1)
    rename_fallback = (
        ren_src.select(
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            "__default_schema",
            "statement",
            ren_loose.alias("__loose"),
        )
        .filter(F.col("__loose") != "")
        .select(
            F.col("__default_schema").alias("schema_name"),
            F.col("__loose").alias("table_name"),
            F.lit("RENAME").alias("ddl_kind"),
            F.lit(None).cast("string").alias("new_schema_name"),
            F.lit(None).cast("string").alias("new_table_name"),
            "statement",
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            F.lit(0).alias("pair_no"),
        )
        .join(ren_good, ["binlog_file", "log_position", "line_no"], "left_anti")
    )
    # DROP: explode the name list (one row per table); fragments that
    # fail the name grammar contribute no row here -- they surface on
    # ddl_parse_anomalies, never silently.  Re-filtered from q (no
    # join): the verb test is the same regexp the base frame used.
    drop_src = q.filter(
        F.upper(F.regexp_extract("statement", DDL_RE, 1)) == "DROP"
    )
    frag = F.posexplode(
        F.split(F.regexp_extract("statement", _DROP_LIST_RE, 1), ",")
    ).alias("__pair_no", "__frag")
    d1 = F.regexp_extract("__frag", _NAME_ONLY_RE, 1)
    d2 = F.regexp_extract("__frag", _NAME_ONLY_RE, 2)
    d_schema, d_name = _qualified(d1, d2, F.col("__default_schema"))
    drop_cols = [
        F.lit("DROP").alias("ddl_kind"),
        F.lit(None).cast("string").alias("new_schema_name"),
        F.lit(None).cast("string").alias("new_table_name"),
        "statement",
        "timestamp",
        "binlog_file",
        "log_position",
        "line_no",
    ]
    drops = (
        drop_src.select(
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            "__default_schema",
            "statement",
            frag,
        )
        .filter(F.col("__frag").rlike(_NAME_ONLY_RE))
        .select(
            d_schema.alias("schema_name"),
            d_name.alias("table_name"),
            *drop_cols,
            F.col("__pair_no").alias("pair_no"),
        )
    )
    # never-silent fallback: a DROP whose every list fragment fails the
    # name grammar (e.g. ``DROP TABLE a b``) keeps one row under the
    # statement's leading identifier (DDL_RE matched it, or kind would
    # be empty) so the anomaly channel can still report its fragments
    good_keys = drops.select(
        "binlog_file", "log_position", "line_no"
    ).distinct()
    drop_fallback = (
        drop_src.select(
            t_schema.alias("schema_name"),
            t_name.alias("table_name"),
            *drop_cols,
            F.lit(0).alias("pair_no"),
        )
        .join(good_keys, ["binlog_file", "log_position", "line_no"], "left_anti")
    )
    # TRUNCATE [TABLE] t: kind TRUNCATE -- a DATA reset (drift-window
    # opener downstream; membership/types carry forward).  The strict
    # identifier grammar keys the row; a name outside it falls back to
    # the loose leading token so the statement NEVER vanishes, and
    # ddl_parse_anomalies reports the strict-grammar miss.
    trunc_src = q.filter(F.col("statement").rlike(_TRUNCATE_VERB_RE))
    tr1 = F.regexp_extract("statement", _TRUNCATE_RE, 1)
    tr2 = F.regexp_extract("statement", _TRUNCATE_RE, 2)
    tr_loose = F.regexp_extract("statement", _TRUNCATE_LOOSE_RE, 1)
    trs, trn = _qualified(tr1, tr2, dflt)
    truncs = trunc_src.filter((tr1 != "") | (tr_loose != "")).select(
        F.when(tr1 != "", trs).otherwise(dflt).alias("schema_name"),
        F.when(tr1 != "", trn).otherwise(tr_loose).alias("table_name"),
        F.lit("TRUNCATE").alias("ddl_kind"),
        F.lit(None).cast("string").alias("new_schema_name"),
        F.lit(None).cast("string").alias("new_table_name"),
        "statement",
        "timestamp",
        "binlog_file",
        "log_position",
        "line_no",
        F.lit(0).alias("pair_no"),
    )
    # standalone CREATE/DROP INDEX ... ON t: kind INDEX, keyed on the
    # ON target (the table whose physical layout moves); same
    # strict-then-loose never-silent discipline
    idx_src = q.filter(F.col("statement").rlike(_INDEX_VERB_RE))
    ix1 = F.regexp_extract("statement", _INDEX_ON_RE, 1)
    ix2 = F.regexp_extract("statement", _INDEX_ON_RE, 2)
    ix_loose = F.regexp_extract("statement", _INDEX_ON_LOOSE_RE, 1)
    ixs, ixn = _qualified(ix1, ix2, dflt)
    idxs = idx_src.filter((ix1 != "") | (ix_loose != "")).select(
        F.when(ix1 != "", ixs).otherwise(dflt).alias("schema_name"),
        F.when(ix1 != "", ixn).otherwise(ix_loose).alias("table_name"),
        F.lit("INDEX").alias("ddl_kind"),
        F.lit(None).cast("string").alias("new_schema_name"),
        F.lit(None).cast("string").alias("new_table_name"),
        "statement",
        "timestamp",
        "binlog_file",
        "log_position",
        "line_no",
        F.lit(0).alias("pair_no"),
    )
    # OPTIMIZE/ANALYZE/REPAIR TABLE a, b: kind MAINTENANCE, exploded
    # per name exactly like DROP (pair_no keeps list order); bad
    # fragments surface on the anomaly channel, and an all-fail list
    # keeps one loose-token fallback row
    maint_src = q.filter(F.col("statement").rlike(_MAINT_VERB_RE))
    m_frag = F.posexplode(
        F.split(F.regexp_extract("statement", _MAINT_BODY_RE, 1), ",")
    ).alias("__pair_no", "__frag")
    m1 = F.regexp_extract("__frag", _NAME_ONLY_RE, 1)
    m2 = F.regexp_extract("__frag", _NAME_ONLY_RE, 2)
    m_schema, m_name = _qualified(m1, m2, F.col("__default_schema"))
    maint_cols = [
        F.lit("MAINTENANCE").alias("ddl_kind"),
        F.lit(None).cast("string").alias("new_schema_name"),
        F.lit(None).cast("string").alias("new_table_name"),
        "statement",
        "timestamp",
        "binlog_file",
        "log_position",
        "line_no",
    ]
    maints = (
        maint_src.select(
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            "__default_schema",
            "statement",
            m_frag,
        )
        .filter(F.col("__frag").rlike(_NAME_ONLY_RE))
        .select(
            m_schema.alias("schema_name"),
            m_name.alias("table_name"),
            *maint_cols,
            F.col("__pair_no").alias("pair_no"),
        )
    )
    maint_good = maints.select(
        "binlog_file", "log_position", "line_no"
    ).distinct()
    maint_fallback = (
        maint_src.select(
            dflt.alias("schema_name"),
            F.regexp_extract(
                F.regexp_extract("statement", _MAINT_BODY_RE, 1),
                r"`?([^`\s.,;]+)",
                1,
            ).alias("table_name"),
            *maint_cols,
            F.lit(0).alias("pair_no"),
        )
        .filter(F.col("table_name") != "")
        .join(
            maint_good, ["binlog_file", "log_position", "line_no"], "left_anti"
        )
    )
    return (
        single.unionByName(renames)
        .unionByName(rename_fallback)
        .unionByName(drops)
        .unionByName(drop_fallback)
        .unionByName(truncs)
        .unionByName(idxs)
        .unionByName(maints)
        .unionByName(maint_fallback)
    )


# ---------------------------------------------------------------------------
# ALTER clause grammar
# ---------------------------------------------------------------------------

# split an ALTER body on top-level commas: a comma is a clause boundary
# only when a clause-opening keyword follows -- type arguments like
# DECIMAL(10,2) or ENUM('a','b') never match the lookahead.  (A column
# literally named after a clause keyword directly after a paren comma
# would split wrongly -- stated heuristic, not a silent one: the
# fragment then lands on the UNPARSED channel.)
_CLAUSE_SPLIT_RE = (
    r"(?i),\s*(?=(?:add|drop|modify|change|rename|alter|convert|engine|"
    r"algorithm|lock|comment|partition|character|default|collate|force|"
    r"order|disable|enable|with|without|auto_increment|row_format|"
    r"charset|stats_persistent|stats_auto_recalc|pack_keys|max_rows|"
    r"min_rows|checksum|delay_key_write|key_block_size|tablespace|"
    r"remove|reorganize|coalesce|truncate|rebuild|optimize|analyze|"
    r"repair|exchange|discard|import)\b)"
)
_ALTER_BODY_RE = (
    r"(?is)^\s*alter\s+table\s+(?:if\s+exists\s+)?"
    r"`?[A-Za-z0-9_$]+`?(?:\s*\.\s*`?[A-Za-z0-9_$]+`?)?\s+(.*)$"
)
_ID_CAP = r"`?([A-Za-z_$][A-Za-z0-9_$]*)`?"
# declared type: family word + optional numeric args -- DECIMAL(10,2),
# VARCHAR(255), BIGINT.  Two captures: family, "(args)".
_TYPE_CAP = r"([A-Za-z]+)\s*(\(\s*[0-9]+(?:\s*,\s*[0-9]+)?\s*\))?"
_ADD_COL_CL = rf"(?i)^add\s+(?:column\s+)?{_ID_CAP}"
_DROP_COL_CL = rf"(?i)^drop\s+(?:column\s+)?{_ID_CAP}"
_MODIFY_COL_CL = rf"(?i)^modify\s+(?:column\s+)?{_ID_CAP}"
_CHANGE_COL_CL = rf"(?i)^change\s+(?:column\s+)?{_ID_CAP}\s+{_ID_CAP}"
_RENAME_COL_CL = rf"(?i)^rename\s+column\s+{_ID_CAP}\s+to\s+{_ID_CAP}"
_RENAME_TO_CL = (
    r"(?i)^rename\s+(?:to\s+|as\s+)?"
    r"`?([A-Za-z0-9_$]+)`?(?:\s*\.\s*`?([A-Za-z0-9_$]+)`?)?\s*$"
)
# typed variants (captures: col[, col_b], type family, type args)
_ADD_COL_TYPED = rf"(?is)^add\s+(?:column\s+)?{_ID_CAP}\s+{_TYPE_CAP}"
_MODIFY_COL_TYPED = rf"(?is)^modify\s+(?:column\s+)?{_ID_CAP}\s+{_TYPE_CAP}"
_CHANGE_COL_TYPED = (
    rf"(?is)^change\s+(?:column\s+)?{_ID_CAP}\s+{_ID_CAP}\s+{_TYPE_CAP}"
)
# parenthesized multi-column ADD: ``ADD (x INT, y VARCHAR(255))`` --
# valid MySQL; the paren list explodes into per-column ADD_COLUMN rows
_ADD_MULTI_CL = r"(?is)^add\s*\((.*)\)\s*$"
# one column def inside the paren list: identifier after start-or-comma
# followed by a type word (type args like DECIMAL(10,2) never open a
# def: the fragment after their inner comma is digit-led)
_PAREN_COL_DEF_RE = (
    r"(?:^|,)\s*`?[A-Za-z_$][A-Za-z0-9_$]*`?"
    r"\s+[A-Za-z]+(?:\s*\(\s*[0-9]+(?:\s*,\s*[0-9]+)?\s*\))?"
)
_PAREN_DEF_NAME = r"^,?\s*`?([A-Za-z_$][A-Za-z0-9_$]*)`?"
_PAREN_DEF_TYPE = (
    r"^,?\s*`?[A-Za-z_$][A-Za-z0-9_$]*`?\s+"
    r"([A-Za-z]+)\s*(\(\s*[0-9]+(?:\s*,\s*[0-9]+)?\s*\))?"
)
# ADD/DROP followed by one of these is an index/constraint operation:
# recognized grammar with NO column-set effect (not a parse failure)
_INDEX_WORDS = (
    "index", "key", "constraint", "primary", "unique", "fulltext",
    "spatial", "foreign", "check", "partition",
)
# clauses opening with one of these words are TABLE OPTIONS with no
# column effect -- the online-DDL options every gh-ost/pt-osc and most
# hand-written MySQL 8 migrations carry (``ALGORITHM=INPLACE,
# LOCK=NONE``) plus the storage/metadata options.  They classify
# OPTION_NO_EFFECT (recognized grammar, NOT a parse failure), so the
# column-granular quarantine's ``moved_known`` stays true.  CONVERT TO
# CHARACTER SET deliberately stays UNPARSED: it retypes every string
# column, which IS a shape move the grammar cannot enumerate.
_OPTION_WORDS = (
    "algorithm", "lock", "engine", "comment", "row_format",
    "auto_increment", "force", "collate", "charset", "stats_persistent",
    "stats_auto_recalc", "pack_keys", "max_rows", "min_rows", "checksum",
    "delay_key_write", "key_block_size", "tablespace",
)


def _norm_type(family: F.Column, args: F.Column) -> F.Column:
    """Normalize a declared type: upper family + arg list with inner
    whitespace removed -- ``decimal ( 10 , 2 )`` -> ``DECIMAL(10,2)``;
    empty family -> NULL (no type declared / not parseable)."""
    t = F.concat(
        F.upper(family),
        F.regexp_replace(F.coalesce(args, F.lit("")), r"\s", ""),
    )
    return F.when(family != "", t).cast("string")

# re-exported for backwards compatibility with round-9 consumers
_ADD_COL_RE = _ADD_COL_CL.replace("^add", r"\badd")
_DROP_COL_RE = _DROP_COL_CL.replace("^drop", r"\bdrop")


def _clause_entry_array(c, i) -> F.Column:
    """Classified entries for ONE trimmed clause fragment ``c`` at
    clause position ``i`` -- the clause grammar as a pure column
    expression: array<struct<clause_no, col_no, clause, clause_kind,
    col_a, col_b, col_type>>, one entry per clause (and per column of
    a parenthesized multi-ADD).  This is the SINGLE definition of the
    grammar: ``alter_clauses`` explodes it and the read-time views
    aggregate it in place (guide 2.4 -- the row-level form removes the
    per-statement explode/groupBy/join round trip those views paid)."""
    w1 = F.lower(F.regexp_extract(c, r"^\s*([A-Za-z_]+)", 1))
    w2 = F.lower(
        F.regexp_extract(c, r"(?i)^\s*[A-Za-z_]+\s+`?([A-Za-z0-9_$]+)", 1)
    )
    add_c = F.regexp_extract(c, _ADD_COL_CL, 1)
    drop_c = F.regexp_extract(c, _DROP_COL_CL, 1)
    mod_c = F.regexp_extract(c, _MODIFY_COL_CL, 1)
    chg_a = F.regexp_extract(c, _CHANGE_COL_CL, 1)
    chg_b = F.regexp_extract(c, _CHANGE_COL_CL, 2)
    ren_a = F.regexp_extract(c, _RENAME_COL_CL, 1)
    ren_b = F.regexp_extract(c, _RENAME_COL_CL, 2)
    rto_1 = F.regexp_extract(c, _RENAME_TO_CL, 1)
    rto_2 = F.regexp_extract(c, _RENAME_TO_CL, 2)
    rto_name = F.when(rto_2 != "", rto_2).otherwise(rto_1)
    # parenthesized multi-column ADD: the paren list's column defs
    # (constraint-keyword-led fragments like PRIMARY KEY(..) filtered)
    multi_inner = F.regexp_extract(c, _ADD_MULTI_CL, 1)
    multi_defs = F.filter(
        F.regexp_extract_all(multi_inner, F.lit(_PAREN_COL_DEF_RE), F.lit(0)),
        lambda e: ~F.lower(
            F.regexp_extract(e, _PAREN_DEF_NAME, 1)
        ).isin(*_CONSTRAINT_KEYWORDS),
    )
    is_multi_add = (
        (w1 == "add") & (multi_inner != "") & (F.size(multi_defs) > 0)
    )
    kind = (
        F.when((w1 == "add") & w2.isin(*_INDEX_WORDS), "INDEX_OP")
        .when((w1 == "add") & (add_c != ""), "ADD_COLUMN")
        .when(is_multi_add, "ADD_COLUMN")
        .when((w1 == "drop") & w2.isin(*_INDEX_WORDS), "INDEX_OP")
        .when((w1 == "drop") & (drop_c != ""), "DROP_COLUMN")
        .when((w1 == "modify") & (mod_c != ""), "MODIFY_COLUMN")
        .when((w1 == "change") & (chg_b != ""), "CHANGE_COLUMN")
        .when((w1 == "rename") & (w2 == "column") & (ren_b != ""),
              "RENAME_COLUMN")
        # RENAME INDEX/KEY old TO new: an index op, no column effect
        .when((w1 == "rename") & w2.isin("index", "key"), "INDEX_OP")
        .when((w1 == "rename") & (w2 != "column") & (rto_1 != ""),
              "RENAME_TO")
        # ALTER COLUMN x SET DEFAULT v / DROP DEFAULT: recognized,
        # default changes never move the column SHAPE (values already
        # written are untouched), so the moved set stays known-empty
        .when(
            (w1 == "alter")
            & c.rlike(
                r"(?is)^alter\s+(?:column\s+)?`?[A-Za-z_$][A-Za-z0-9_$]*`?"
                r"\s+(?:set\s+default|drop\s+default)\b"
            ),
            "COLUMN_DEFAULT",
        )
        .when(w1.isin(*_OPTION_WORDS), "OPTION_NO_EFFECT")
        .when((w1 == "default"), "OPTION_NO_EFFECT")
        .when((w1 == "character") & (w2 == "set"), "OPTION_NO_EFFECT")
        .when((w1 == "enable") & (w2 == "keys"), "OPTION_NO_EFFECT")
        .when((w1 == "disable") & (w2 == "keys"), "OPTION_NO_EFFECT")
        # ORDER BY / partition-maintenance clauses: physical layout,
        # not column shape (ADD/DROP/TRUNCATE/REORGANIZE/COALESCE
        # PARTITION route through the add/drop arms or land here)
        .when((w1 == "order") & (w2 == "by"), "OPTION_NO_EFFECT")
        .when(
            w1.isin(
                "partition", "remove", "reorganize", "coalesce",
                "truncate", "rebuild", "optimize", "analyze", "repair",
                "exchange", "discard", "import",
            )
            & (
                (w2 == "partition")
                | (w1 == "partition")
                | (w1 == "remove") & (w2 == "partitioning")
            ),
            "PARTITION_OP",
        )
        .otherwise("UNPARSED")
    )
    col_a = (
        F.when(kind == "ADD_COLUMN", add_c)
        .when(kind == "DROP_COLUMN", drop_c)
        .when(kind == "MODIFY_COLUMN", mod_c)
        .when(kind == "CHANGE_COLUMN", chg_a)
        .when(kind == "RENAME_COLUMN", ren_a)
        .cast("string")
    )
    col_b = (
        F.when(kind == "CHANGE_COLUMN", chg_b)
        .when(kind == "RENAME_COLUMN", ren_b)
        .when(kind == "RENAME_TO", rto_name)
        .cast("string")
    )
    col_type = (
        F.when(
            kind == "ADD_COLUMN",
            _norm_type(
                F.regexp_extract(c, _ADD_COL_TYPED, 2),
                F.regexp_extract(c, _ADD_COL_TYPED, 3),
            ),
        )
        .when(
            kind == "MODIFY_COLUMN",
            _norm_type(
                F.regexp_extract(c, _MODIFY_COL_TYPED, 2),
                F.regexp_extract(c, _MODIFY_COL_TYPED, 3),
            ),
        )
        .when(
            kind == "CHANGE_COLUMN",
            _norm_type(
                F.regexp_extract(c, _CHANGE_COL_TYPED, 3),
                F.regexp_extract(c, _CHANGE_COL_TYPED, 4),
            ),
        )
        .cast("string")
    )
    ino = i.cast("int")
    single = F.array(
        F.struct(
            ino.alias("clause_no"),
            F.lit(0).alias("col_no"),
            c.alias("clause"),
            kind.alias("clause_kind"),
            col_a.alias("col_a"),
            col_b.alias("col_b"),
            col_type.alias("col_type"),
        )
    )
    multi = F.transform(
        multi_defs,
        lambda e, j: F.struct(
            ino.alias("clause_no"),
            j.cast("int").alias("col_no"),
            c.alias("clause"),
            F.lit("ADD_COLUMN").alias("clause_kind"),
            F.regexp_extract(e, _PAREN_DEF_NAME, 1).cast("string").alias(
                "col_a"
            ),
            F.lit(None).cast("string").alias("col_b"),
            _norm_type(
                F.regexp_extract(e, _PAREN_DEF_TYPE, 1),
                F.regexp_extract(e, _PAREN_DEF_TYPE, 2),
            ).cast("string").alias("col_type"),
        ),
    )
    return F.when(is_multi_add, multi).otherwise(single)


def _classified_clauses(stmt) -> F.Column:
    """The full clause grammar over one ALTER statement, as an array
    expression (see _clause_entry_array): entries ordered by
    (clause_no, col_no) -- the statement's textual clause order, which
    is exactly the 'last clause wins' fold order the views need.
    Empty split fragments keep their clause_no (they are enumerated
    before filtering, matching the exploded form's numbering)."""
    raw = F.split(F.regexp_extract(stmt, _ALTER_BODY_RE, 1), _CLAUSE_SPLIT_RE)
    entries = F.flatten(
        F.transform(raw, lambda frag, i: _clause_entry_array(F.trim(frag), i))
    )
    return F.filter(entries, lambda e: e["clause"] != "")


def alter_clauses(ddl: DataFrame) -> DataFrame:
    """Explode each ALTER statement into classified clauses.

    Returns one row per clause -- and per COLUMN for the
    parenthesized multi-column ``ADD (x INT, y INT)`` form, which
    explodes into per-column ADD_COLUMN rows (``col_no`` is the
    0-based position inside the paren list; 0 elsewhere): the
    statement's identity columns (schema_name, table_name, statement,
    timestamp, binlog_file, log_position, line_no) plus ``clause_no``
    (0-based order inside the statement), ``col_no``, ``clause``
    (verbatim text), ``clause_kind`` in {ADD_COLUMN, DROP_COLUMN,
    MODIFY_COLUMN, CHANGE_COLUMN, RENAME_COLUMN, RENAME_TO, INDEX_OP,
    OPTION_NO_EFFECT, COLUMN_DEFAULT, PARTITION_OP, UNPARSED},
    ``col_a`` / ``col_b`` (the touched
    column / its new name where the kind has one), and ``col_type``
    (the normalized declared type where the clause declares one --
    ADD/MODIFY/CHANGE and paren-list defs; NULL otherwise).  MODIFY
    keeps the column set intact but marks the column as shape-moved;
    CHANGE and RENAME COLUMN drop ``col_a`` and add ``col_b``.
    OPTION_NO_EFFECT covers table options (ALGORITHM=/LOCK=/ENGINE=
    and friends): recognized, no column effect -- so an online-DDL
    ALTER's moved-column set stays fully known.  Anything else
    classifies as UNPARSED and must be surfaced by
    ddl_parse_anomalies -- the warn-and-skip discipline.

    Since r12 the grammar itself is the row-level array expression
    ``_classified_clauses`` (one definition; the views aggregate it
    in place without this explode)."""
    return (
        ddl.filter(F.col("ddl_kind") == "ALTER")
        .select(
            "schema_name",
            "table_name",
            "statement",
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            F.explode(_classified_clauses(F.col("statement"))).alias("__e"),
        )
        .select(
            "schema_name",
            "table_name",
            "statement",
            "timestamp",
            "binlog_file",
            "log_position",
            "line_no",
            F.col("__e.clause_no").alias("clause_no"),
            F.col("__e.col_no").alias("col_no"),
            F.col("__e.clause").alias("clause"),
            F.col("__e.clause_kind").alias("clause_kind"),
            F.col("__e.col_a").alias("col_a"),
            F.col("__e.col_b").alias("col_b"),
            F.col("__e.col_type").alias("col_type"),
        )
    )



def ddl_parse_anomalies(ddl: DataFrame) -> DataFrame:
    """The PARTIAL_PARSE finding channel: every fragment the grammar
    consumed the statement AROUND but could not interpret.  A
    multi-clause ALTER where only some clauses parse would otherwise
    read as success -- the exact silent-failure shape the rest of the
    engine's warn-and-skip channels (§2.8) exist to prevent.

    Three fragment sources: UNPARSED clauses from alter_clauses,
    ``RENAME TABLE`` list fragments outside the ``old TO new`` pair
    grammar (well-formed pairs ALL parse now -- the explode in
    parse_ddl_statements -- so this fires only on genuinely malformed
    fragments, counted STRUCTURALLY by splitting the name list on
    commas, never by scanning for ``to`` tokens), and DROP-list
    fragments outside the name grammar.  Reports the statement's
    WRITTEN table name (the operator's actionable handle), not the
    canonical one.  Statement-cardinality in, at most
    clause-cardinality out.  Known limit, stated: a RENAME TABLE whose
    EVERY pair fails the grammar carries no parseable table name at
    all and contributes no frame row to derive fragments from (DROP
    has a leading-identifier fallback row; RENAME's first identifier
    sits inside the failed pair).  Returns (schema_name, table_name,
    binlog_file, log_position, reason, fragment)."""
    cl = alter_clauses(ddl)
    unparsed = cl.filter(F.col("clause_kind") == "UNPARSED").select(
        "schema_name",
        "table_name",
        "binlog_file",
        "log_position",
        F.lit("UNPARSED_CLAUSE").alias("reason"),
        F.col("clause").alias("fragment"),
    )
    # RENAME list fragments the pair grammar rejected: one statement
    # row per physical statement (the lowest-pair_no surviving row
    # carries the actionable written name), then the same structural
    # split the parser used
    rename_stmts = (
        ddl.filter(F.col("ddl_kind") == "RENAME")
        .groupBy("binlog_file", "log_position", "line_no", "statement")
        .agg(
            F.min_by(
                F.struct("schema_name", "table_name"), F.col("pair_no")
            ).alias("__w")
        )
        .select(
            F.col("__w.schema_name").alias("schema_name"),
            F.col("__w.table_name").alias("table_name"),
            "binlog_file",
            "log_position",
            "statement",
        )
    )
    extra_pairs = (
        rename_stmts.select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.explode(
                F.split(
                    F.regexp_extract("statement", _RENAME_BODY_RE, 1), ","
                )
            ).alias("__frag"),
        )
        .filter(
            (F.trim(F.col("__frag")) != "")
            & ~F.col("__frag").rlike(_RENAME_PAIR_RE)
        )
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.lit("UNPARSED_RENAME_PAIR").alias("reason"),
            F.trim(F.col("__frag")).alias("fragment"),
        )
    )
    # DROP-list fragments outside the name grammar (multi-name DROPs
    # are exploded per good name by parse_ddl_statements; the bad
    # fragments land here)
    drop_stmts = (
        ddl.filter(F.col("ddl_kind") == "DROP")
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            "statement",
        )
        .distinct()
    )
    bad_frags = (
        drop_stmts.select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.explode(
                F.split(
                    F.regexp_extract("statement", _DROP_LIST_RE, 1), ","
                )
            ).alias("__frag"),
        )
        .filter(
            (F.trim(F.col("__frag")) != "")
            & ~F.col("__frag").rlike(_NAME_ONLY_RE)
        )
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.lit("UNPARSED_DROP_NAME").alias("reason"),
            F.trim(F.col("__frag")).alias("fragment"),
        )
    )
    # CREATE without a declared column list (LIKE src / AS SELECT):
    # the column matrix CANNOT know the shape, so it carries the
    # previous set forward and this channel says so out loud
    unresolved_create = (
        ddl.filter(
            (F.col("ddl_kind") == "CREATE")
            & (F.regexp_extract("statement", _CREATE_LIST_RE, 1) == "")
        )
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.lit("UNRESOLVED_CREATE_SHAPE").alias("reason"),
            F.col("statement").alias("fragment"),
        )
    )
    # loose-fallback rows from the r11 statement-vocabulary arms: a
    # TRUNCATE or index statement whose name failed the strict
    # identifier grammar kept a loose-token frame row -- say so here
    trunc_loose = (
        ddl.filter(
            (F.col("ddl_kind") == "TRUNCATE")
            & (F.regexp_extract("statement", _TRUNCATE_RE, 1) == "")
        )
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.lit("UNPARSED_TRUNCATE_NAME").alias("reason"),
            F.col("statement").alias("fragment"),
        )
        .distinct()
    )
    idx_loose = (
        ddl.filter(
            (F.col("ddl_kind") == "INDEX")
            & (F.regexp_extract("statement", _INDEX_ON_RE, 1) == "")
        )
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.lit("UNPARSED_INDEX_TARGET").alias("reason"),
            F.col("statement").alias("fragment"),
        )
        .distinct()
    )
    # maintenance-list fragments outside the name grammar (the same
    # per-fragment derivation as DROP)
    maint_stmts = (
        ddl.filter(F.col("ddl_kind") == "MAINTENANCE")
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            "statement",
        )
        .distinct()
    )
    maint_bad = (
        maint_stmts.select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.explode(
                F.split(
                    F.regexp_extract("statement", _MAINT_BODY_RE, 1), ","
                )
            ).alias("__frag"),
        )
        .filter(
            (F.trim(F.col("__frag")) != "")
            & ~F.col("__frag").rlike(_NAME_ONLY_RE)
        )
        .select(
            "schema_name",
            "table_name",
            "binlog_file",
            "log_position",
            F.lit("UNPARSED_MAINT_NAME").alias("reason"),
            F.trim(F.col("__frag")).alias("fragment"),
        )
    )
    return (
        unparsed.unionByName(extra_pairs)
        .unionByName(bad_frags)
        .unionByName(unresolved_create)
        .unionByName(trunc_loose)
        .unionByName(idx_loose)
        .unionByName(maint_bad)
    )


# ---------------------------------------------------------------------------
# rename threading: one table, one history
# ---------------------------------------------------------------------------


def rename_edges(ddl: DataFrame) -> DataFrame:
    """(new_schema, new_name) -> (old_schema, old_name) edges from
    RENAME TABLE statements and ALTER ... RENAME TO clauses.  When two
    renames land on the same new name (name reuse), the lexicographic
    minimum source wins -- a stated deterministic pick, since
    name-based (not temporally scoped) canonicalization cannot tell
    the reuses apart.  Edge-cardinality: always broadcastable."""
    e = ddl.filter(
        F.col("new_table_name").isNotNull()
        & (
            (F.col("new_schema_name") != F.col("schema_name"))
            | (F.col("new_table_name") != F.col("table_name"))
        )
    ).select(
        F.col("new_schema_name").alias("__n_schema"),
        F.col("new_table_name").alias("__n_name"),
        F.col("schema_name").alias("__o_schema"),
        F.col("table_name").alias("__o_name"),
    )
    return e.groupBy("__n_schema", "__n_name").agg(
        F.min(F.struct("__o_schema", "__o_name")).alias("__o")
    ).select(
        "__n_schema",
        "__n_name",
        F.col("__o.__o_schema").alias("__o_schema"),
        F.col("__o.__o_name").alias("__o_name"),
    )


def canonicalize_tables(ddl: DataFrame, max_hops: int = 4) -> DataFrame:
    """Thread RENAME TABLE through the statement frame: every
    statement's (schema_name, table_name) is rewritten to the
    CANONICAL (pre-rename chain) identity so one table keeps one
    history; the as-written name is preserved in ``written_schema`` /
    ``written_table``.

    Resolution follows rename edges backward up to ``max_hops`` times
    -- a fixed chain of broadcast joins over the edge-cardinality
    frame (no driver action, no iteration-to-fixpoint; chains longer
    than max_hops and rename cycles resolve partially, stated).  Name
    reuse over time is NOT temporally scoped: a table re-created under
    a previously-renamed-away name joins the old history -- the
    conservative direction for drift quarantine."""
    from ..functions.caching import scoped_cache

    # the edge frame is referenced once per hop: cached (edge
    # cardinality -- bytes), or Catalyst re-expands the rename groupBy
    # subtree max_hops+1 times into every consumer's plan
    edges = scoped_cache(rename_edges(ddl))
    m = edges.select(
        F.col("__n_schema").alias("__m_schema"),
        F.col("__n_name").alias("__m_name"),
        F.col("__o_schema").alias("__c_schema"),
        F.col("__o_name").alias("__c_name"),
    )
    for i in range(max_hops - 1):
        e = edges.select(
            F.col("__n_schema").alias(f"__e{i}_s"),
            F.col("__n_name").alias(f"__e{i}_n"),
            F.col("__o_schema").alias(f"__e{i}_os"),
            F.col("__o_name").alias(f"__e{i}_on"),
        )
        m = (
            m.join(
                F.broadcast(e),
                (F.col("__c_schema") == F.col(f"__e{i}_s"))
                & (F.col("__c_name") == F.col(f"__e{i}_n")),
                "left",
            )
            .select(
                "__m_schema",
                "__m_name",
                F.coalesce(F.col(f"__e{i}_os"), F.col("__c_schema")).alias(
                    "__c_schema"
                ),
                F.coalesce(F.col(f"__e{i}_on"), F.col("__c_name")).alias(
                    "__c_name"
                ),
            )
        )
    out = (
        ddl.join(
            F.broadcast(m),
            (F.col("schema_name") == F.col("__m_schema"))
            & (F.col("table_name") == F.col("__m_name")),
            "left",
        )
        .withColumn("written_schema", F.col("schema_name"))
        .withColumn("written_table", F.col("table_name"))
        .withColumn(
            "schema_name", F.coalesce(F.col("__c_schema"), F.col("schema_name"))
        )
        .withColumn(
            "table_name", F.coalesce(F.col("__c_name"), F.col("table_name"))
        )
        .drop("__m_schema", "__m_name", "__c_schema", "__c_name")
    )
    return out


# pair_no is the in-statement rename-pair order: the two rows a
# multi-pair RENAME TABLE explodes into share every physical
# coordinate, and MySQL executes the pairs left to right
_ORDER_COLS = (
    "timestamp", "binlog_file", "log_position", "line_no", "pair_no"
)


def schema_timeline(ddl: DataFrame) -> DataFrame:
    """DDL statements -> the effective-dated schema-version table.

    SCD2 shape (same contract as snapshot.scd2_history): per CANONICAL
    (schema_name, table_name) -- renames threaded so one table keeps
    one history -- versions numbered in event-time order (binlog
    coordinates break timestamp ties, line_no breaks zero-position
    ties; the full key is unique, so the window is deterministic);
    ``valid_to`` is the next version's ``valid_from``, NULL on the
    current version; ``current_name`` is the table's as-of name (the
    last rename target so far, else the canonical name).  One window,
    partitioned by table identity: statement-cardinality state,
    table-cardinality parallelism -- metadata-sized at any feed
    size."""
    c = canonicalize_tables(ddl)
    w = Window.partitionBy("schema_name", "table_name").orderBy(*_ORDER_COLS)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    current_name = F.coalesce(
        F.last(F.col("new_table_name"), ignorenulls=True).over(wc),
        F.col("table_name"),
    )
    return c.select(
        "schema_name",
        "table_name",
        F.row_number().over(w).cast("long").alias("version"),
        "ddl_kind",
        "statement",
        F.col("timestamp").alias("valid_from"),
        F.lead("timestamp").over(w).alias("valid_to"),
        F.lead("timestamp").over(w).isNull().alias("is_current"),
        current_name.alias("current_name"),
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
    """Per canonical (schema_name, table_name), the coordinate
    intervals in which row-image payload diffs are UNTRUSTED: each
    window opens at an ``ALTER TABLE`` (row images now decode under a
    new table shape), a ``RENAME TABLE`` (row events re-key to the
    new name mid-feed -- pairing by name breaks wholesale), or a
    ``TRUNCATE`` (every row is gone on the write side while the lake
    copy drains -- a DATA reset, quarantined whole-key) and closes
    at the next ``CREATE`` statement for the same table -- the
    writer-schema refresh marker after which producer and binlog agree
    again (reconciling against cdc_avro_schema_census is the lake-side
    equivalent).  A window with no subsequent CREATE stays open
    (``win_to`` NULL).  Zero positions carry no coordinate (the same
    zero-as-null rule as the key compare, SURVEY Q5) and are skipped.

    One window function partitioned by table identity over a
    statement-cardinality frame; output is opener-cardinality --
    metadata-sized, always broadcastable.  Returns (schema_name,
    table_name, win_from, win_to) as sortable coordinate strings."""
    c = canonicalize_tables(ddl)
    d = c.filter(F.col("log_position") != 0).select(
        "schema_name",
        "table_name",
        "ddl_kind",
        binlog_coord(F.col("binlog_file"), F.col("log_position")).alias(
            "coord"
        ),
        "line_no",
        "pair_no",
    )
    # line_no breaks duplicate-coordinate ties (pair_no the exploded
    # rename pairs) so the frame walk is deterministic in any engine
    w = (
        Window.partitionBy("schema_name", "table_name")
        .orderBy("coord", "line_no", "pair_no")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_create = F.min(
        F.when(F.col("ddl_kind") == "CREATE", F.col("coord"))
    ).over(w)
    return (
        d.withColumn("win_to", next_create)
        .filter(F.col("ddl_kind").isin("ALTER", "RENAME", "TRUNCATE"))
        .select(
            "schema_name",
            "table_name",
            F.col("coord").alias("win_from"),
            "win_to",
        )
        # two openers at one coordinate (the dup-key plant) open the
        # SAME window -- emit it once
        .distinct()
    )


def ddl_drift_window_columns(ddl: DataFrame) -> DataFrame:
    """Drift windows ANNOTATED with what moved: for each window, the
    set of columns its opening statement(s) touched (``moved_cols``)
    and whether that set is fully known (``moved_known``).  The moved
    set is the clause-level union -- ADD/DROP/MODIFY column names plus
    both sides of CHANGE/RENAME COLUMN (a rename+retype is exactly the
    mis-pairing hazard).  The set is UNKNOWN when the opener is a
    table RENAME (every column re-keys), a TRUNCATE (every column's
    DATA resets -- shape intact, trust gone), or when any clause
    landed on the UNPARSED channel (a partially-parsed ALTER must
    quarantine conservatively, whole-key).

    Same plan as ddl_drift_windows plus one clause-cardinality
    aggregate; output stays opener-cardinality and broadcastable.
    Returns (schema_name, table_name, win_from, win_to, moved_cols
    array<string>, moved_known boolean).

    Shape note (r12): the per-statement touched set and unparsed/
    rename flags come from the row-level clause grammar
    (_classified_clauses) evaluated IN PLACE on the opener rows -- the
    former alter_clauses explode + per-statement groupBy + join-back
    collapsed into a projection (guide 2.4: two shuffles and a join
    removed; the plan is now canonicalize + ONE opener window + ONE
    dup-coordinate aggregate)."""
    from ..functions.caching import scoped_cache

    # the canonicalized statement frame feeds multiple subtrees
    # here: statement-cardinality, cache it once (the r11 clause
    # grammar's richer expressions otherwise re-expand into each
    # arm -- a measured 2x plan blowup at sf0.1)
    c = scoped_cache(canonicalize_tables(ddl))
    d = c.filter(F.col("log_position") != 0)
    coord = binlog_coord(F.col("binlog_file"), F.col("log_position"))
    w = (
        Window.partitionBy("schema_name", "table_name")
        .orderBy("coord", "line_no", "pair_no")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    # the clause grammar, row-level: entries only matter for ALTER
    # openers (non-ALTER statements extract an empty body -> [])
    ent = F.when(
        F.col("ddl_kind") == "ALTER",
        _classified_clauses(F.col("statement")),
    ).otherwise(F.expr(
        "cast(array() as array<struct<clause_no:int,col_no:int,"
        "clause:string,clause_kind:string,col_a:string,col_b:string,"
        "col_type:string>>)"
    ))
    # ONE fold pass computes the touched set and both flags together:
    # the clause grammar is a large lambda expression that codegen's
    # common-subexpression elimination cannot deduplicate, so three
    # separate derived columns would evaluate it three times per row
    # (measured 1.8 -> 5.0 s); a single struct accumulator keeps it at
    # one evaluation (CollapseProject never inlines a non-cheap alias
    # referenced more than once, so the two-step select holds).
    summary = F.aggregate(
        ent,
        F.expr(
            "struct(cast(array() as array<string>) as cols,"
            " false as unp, false as ren)"
        ),
        lambda acc, e: F.struct(
            F.concat(
                acc["cols"], F.array_compact(F.array(e["col_a"], e["col_b"]))
            ).alias("cols"),
            (acc["unp"] | (e["clause_kind"] == "UNPARSED")).alias("unp"),
            (acc["ren"] | (e["clause_kind"] == "RENAME_TO")).alias("ren"),
        ),
    )
    openers = (
        d.select(
            "schema_name",
            "table_name",
            "ddl_kind",
            "binlog_file",
            "log_position",
            "line_no",
            "pair_no",
            coord.alias("coord"),
            summary.alias("__g"),
        )
        .withColumn(
            "win_to",
            F.min(
                F.when(F.col("ddl_kind") == "CREATE", F.col("coord"))
            ).over(w),
        )
        .filter(F.col("ddl_kind").isin("ALTER", "RENAME", "TRUNCATE"))
        .select(
            "*",
            F.array_distinct(F.col("__g.cols")).alias("__cols"),
            F.col("__g.unp").cast("int").alias("__any_unparsed"),
            F.col("__g.ren").cast("int").alias("__any_rename"),
        )
    )
    known = (
        (F.col("ddl_kind") == "ALTER")
        & (F.coalesce(F.col("__any_unparsed"), F.lit(0)) == 0)
        & (F.coalesce(F.col("__any_rename"), F.lit(0)) == 0)
    )
    empty = F.expr("cast(array() as array<string>)")
    per_open = openers.select(
        "schema_name",
        "table_name",
        F.col("coord").alias("win_from"),
        "win_to",
        F.coalesce(F.col("__cols"), empty).alias("__mc"),
        known.cast("int").alias("__known"),
    )
    # dup-coordinate openers (the dup-key plant) merge into ONE window:
    # union their moved sets, AND their known flags
    return per_open.groupBy(
        "schema_name", "table_name", "win_from", "win_to"
    ).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("__mc")))
        ).alias("moved_cols"),
        (F.min("__known") == 1).alias("moved_known"),
    )


# ---------------------------------------------------------------------------
# effective-column fold
# ---------------------------------------------------------------------------

# identifiers opening a column def: after '(' start or a comma; type
# arguments like DECIMAL(10,2) never match (digit-led), constraint
# clauses are filtered by keyword below
_CREATE_COL_RE = r"(?:^|,)\s*`?([A-Za-z_$][A-Za-z0-9_$]*)"
# the declared column list of a CREATE TABLE: (?s) because real CREATE
# statements span lines (shared by _create_columns, schema_column_matrix
# and ddl_parse_anomalies -- one constant, one behavior)
_CREATE_LIST_RE = r"(?s)\((.*)\)\s*$"
_CONSTRAINT_KEYWORDS = (
    "primary", "key", "unique", "constraint", "foreign", "index", "check",
)


def _create_columns(stmt) -> F.Column:
    """Column names declared by a CREATE TABLE's parenthesized list."""
    inner = F.regexp_extract(stmt, _CREATE_LIST_RE, 1)
    cand = F.regexp_extract_all(inner, F.lit(_CREATE_COL_RE), F.lit(1))
    return F.array_distinct(
        F.filter(
            cand, lambda c: ~F.lower(c).isin(*_CONSTRAINT_KEYWORDS)
        )
    )


def schema_column_matrix(ddl: DataFrame) -> DataFrame:
    """The timeline made ACTIONABLE: for every canonical (schema,
    table, version), the set of columns effectively present -- the
    inventory a payload-diff consumer needs to know WHICH columns can
    mis-pair across a boundary (the timeline says WHEN the shape
    moved; this says WHAT it moved to).

    Fold semantics per column: CREATE resets the table to its declared
    list; ADD COLUMN adds; DROP COLUMN removes; CHANGE/RENAME COLUMN
    remove the old name and add the new; MODIFY leaves the set intact
    (shape moved, membership did not); DROP TABLE empties; table
    RENAME carries the set across unchanged.  Within one multi-clause
    statement the LAST clause touching a column wins (adds outrank
    drops at equal clause position, so ``CHANGE c c BIGINT`` keeps c).

    The fold is carry-forward, not a join triangle: a versions x
    touched-columns grid (linear in statements, never statements^2)
    gets a per-(table, column) ``last(effect) ignore nulls`` window --
    one shuffle on table identity, metadata-sized end to end.
    Returns (schema_name, table_name, version, column_name) for
    present columns only."""
    from ..functions.caching import scoped_cache

    # the canonicalized statement frame feeds multiple subtrees
    # here: statement-cardinality, cache it once (the r11 clause
    # grammar's richer expressions otherwise re-expand into each
    # arm -- a measured 2x plan blowup at sf0.1)
    c = scoped_cache(canonicalize_tables(ddl))
    w = Window.partitionBy("schema_name", "table_name").orderBy(*_ORDER_COLS)
    empty = F.expr("cast(array() as array<string>)")
    create_cols = F.when(
        F.col("ddl_kind") == "CREATE", _create_columns(F.col("statement"))
    ).otherwise(empty)
    # per-statement NET set effect from the ROW-LEVEL clause grammar
    # (r12, guide 2.4): the flattened per-kind effect entries are in
    # (clause_no, col_no, within-clause) order by construction, so a
    # left fold with overwrite IS the old max_by tie rule -- 'the last
    # clause touching a column wins, adds over drops at equal
    # position'.  Removes the former explode + per-statement groupBy +
    # grid join-back (two shuffles and a join).
    ent = F.when(
        F.col("ddl_kind") == "ALTER",
        _classified_clauses(F.col("statement")),
    ).otherwise(F.expr(
        "cast(array() as array<struct<clause_no:int,col_no:int,"
        "clause:string,clause_kind:string,col_a:string,col_b:string,"
        "col_type:string>>)"
    ))
    eff_entries = F.flatten(
        F.transform(
            ent,
            lambda e: F.when(
                e["clause_kind"] == "ADD_COLUMN",
                F.array(F.struct(
                    e["col_a"].alias("col"), F.lit(True).alias("eff")
                )),
            )
            .when(
                e["clause_kind"] == "DROP_COLUMN",
                F.array(F.struct(
                    e["col_a"].alias("col"), F.lit(False).alias("eff")
                )),
            )
            .when(
                e["clause_kind"].isin("CHANGE_COLUMN", "RENAME_COLUMN"),
                F.array(
                    F.struct(
                        e["col_a"].alias("col"), F.lit(False).alias("eff")
                    ),
                    F.struct(
                        e["col_b"].alias("col"), F.lit(True).alias("eff")
                    ),
                ),
            )
            .otherwise(F.expr(
                "cast(array() as array<struct<col:string,eff:boolean>>)"
            )),
        )
    )
    effmap = F.aggregate(
        eff_entries,
        F.expr("cast(map() as map<string,boolean>)"),
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, v: k != e["col"]),
            F.create_map(e["col"], e["eff"]),
        ),
    )
    d = c.select(
        "schema_name",
        "table_name",
        "ddl_kind",
        "binlog_file",
        "log_position",
        "line_no",
        F.row_number().over(w).cast("long").alias("version"),
        create_cols.alias("__create_cols"),
        (
            F.regexp_extract("statement", _CREATE_LIST_RE, 1) != ""
        ).alias("__has_list"),
        effmap.alias("__effmap"),
    )
    d = scoped_cache(d)
    # the column universe per canonical table: clause-touched + declared
    uni = (
        d.select(
            "schema_name",
            "table_name",
            F.explode(
                F.array_union(F.map_keys("__effmap"), "__create_cols")
            ).alias("column_name"),
        )
        .distinct()
    )
    grid = d.join(uni, ["schema_name", "table_name"])
    # CREATE with a declared list resets membership; CREATE WITHOUT one
    # (LIKE src / AS SELECT -- shape unknowable statement-locally) is a
    # NULL effect: the fold carries the previous set forward and
    # ddl_parse_anomalies says so on the UNRESOLVED_CREATE_SHAPE channel
    effect = (
        F.when(
            (F.col("ddl_kind") == "CREATE") & F.col("__has_list"),
            F.array_contains(F.col("__create_cols"), F.col("column_name")),
        )
        .when(F.col("ddl_kind") == "DROP", F.lit(False))
        .otherwise(F.element_at(F.col("__effmap"), F.col("column_name")))
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


def _create_column_defs(stmt) -> F.Column:
    """(col, typ) structs declared by a CREATE TABLE's parenthesized
    list -- the typed twin of _create_columns (same fragment grammar
    as the paren-ADD defs; constraint-keyword-led fragments filtered)."""
    inner = F.regexp_extract(stmt, _CREATE_LIST_RE, 1)
    defs = F.filter(
        F.regexp_extract_all(inner, F.lit(_PAREN_COL_DEF_RE), F.lit(0)),
        lambda e: ~F.lower(
            F.regexp_extract(e, _PAREN_DEF_NAME, 1)
        ).isin(*_CONSTRAINT_KEYWORDS),
    )
    return F.transform(
        defs,
        lambda e: F.struct(
            F.regexp_extract(e, _PAREN_DEF_NAME, 1).alias("col"),
            _norm_type(
                F.regexp_extract(e, _PAREN_DEF_TYPE, 1),
                F.regexp_extract(e, _PAREN_DEF_TYPE, 2),
            ).alias("typ"),
        ),
    )


def _int_width(family: F.Column) -> F.Column:
    """MySQL integer-family storage width rank; NULL for non-ints."""
    return (
        F.when(family == "TINYINT", 1)
        .when(family == "SMALLINT", 2)
        .when(family == "MEDIUMINT", 3)
        .when(family.isin("INT", "INTEGER"), 4)
        .when(family == "BIGINT", 5)
        .cast("int")
    )


def _type_narrowing(prev: F.Column, cur: F.Column) -> F.Column:
    """TRUE when ``cur`` is a same-family NARROWING of ``prev`` -- the
    quiet-corruption transitions: integer width shrink
    (bigint -> int), char/varchar length shrink (varchar(255) ->
    varchar(50)), decimal precision or scale loss.  Cross-family
    retypes are a different hazard class and report false here (the
    type strings themselves are in the output for the operator to
    read)."""
    fam_p = F.regexp_extract(prev, r"^([A-Z]+)", 1)
    fam_c = F.regexp_extract(cur, r"^([A-Z]+)", 1)
    n1_p = F.regexp_extract(prev, r"\((\d+)", 1)
    n1_c = F.regexp_extract(cur, r"\((\d+)", 1)
    n2_p = F.regexp_extract(prev, r",(\d+)\)", 1)
    n2_c = F.regexp_extract(cur, r",(\d+)\)", 1)
    w_p, w_c = _int_width(fam_p), _int_width(fam_c)
    int_narrow = w_p.isNotNull() & w_c.isNotNull() & (w_c < w_p)
    # try_cast: the arg captures are '' when absent, and ANSI mode
    # (the driver's session) hard-fails a bare cast on ''
    char_narrow = (
        fam_p.isin("CHAR", "VARCHAR")
        & (fam_c == fam_p)
        & (n1_c.try_cast("int") < n1_p.try_cast("int"))
    )
    dec_narrow = (
        fam_p.isin("DECIMAL", "NUMERIC")
        & (fam_c == fam_p)
        & (
            (n1_c.try_cast("int") < n1_p.try_cast("int"))
            | (
                F.coalesce(n2_c.try_cast("int"), F.lit(0))
                < F.coalesce(n2_p.try_cast("int"), F.lit(0))
            )
        )
    )
    return F.coalesce(int_narrow | char_narrow | dec_narrow, F.lit(False))


def schema_column_types(ddl: DataFrame) -> DataFrame:
    """The column matrix made TYPE-AWARE: per canonical (schema, table,
    version), every present column whose DECLARED type is known, with
    the effective type text and an ``is_narrowing`` flag marking
    same-family shrink transitions vs the previous version -- the
    quiet corruption a membership-stable MODIFY hides
    (``varchar(255) -> varchar(50)``, ``bigint -> int``, decimal
    precision/scale loss).

    Type sources: CREATE column defs, ADD/MODIFY/CHANGE declarations
    (paren multi-ADD included).  DROP COLUMN / CHANGE-away / RENAME
    COLUMN-away and DROP TABLE RESET a column's type (a later re-ADD
    never inherits a stale one).  A RENAME COLUMN's target is present
    but DECLARES no type, so it is absent here until something
    declares one -- membership stays with schema_column_matrix;
    stated, not silent.  Same carry-forward fold shape as the matrix
    (grid linear in statements, one shuffle on table identity,
    metadata-sized end to end).  Returns (schema_name, table_name,
    version, column_name, column_type, is_narrowing)."""
    from ..functions.caching import scoped_cache

    # the canonicalized statement frame feeds multiple subtrees
    # here: statement-cardinality, cache it once (the r11 clause
    # grammar's richer expressions otherwise re-expand into each
    # arm -- a measured 2x plan blowup at sf0.1)
    c = scoped_cache(canonicalize_tables(ddl))
    w = Window.partitionBy("schema_name", "table_name").orderBy(*_ORDER_COLS)
    empty_defs = F.expr(
        "cast(array() as array<struct<col:string,typ:string>>)"
    )
    create_defs = F.when(
        F.col("ddl_kind") == "CREATE", _create_column_defs(F.col("statement"))
    ).otherwise(empty_defs)
    # per-statement NET type action from the ROW-LEVEL clause grammar
    # (r12, same rewrite as schema_column_matrix): entries are in
    # (clause_no, col_no, within-clause) order, so a left fold with
    # overwrite IS the old max_by tie rule.  Actions encode as one
    # string so the fold is a plain last-ignore-nulls: 'T:<type>'
    # declares, 'T:' marks present-but-undeclared, 'X' resets.
    ent = F.when(
        F.col("ddl_kind") == "ALTER",
        _classified_clauses(F.col("statement")),
    ).otherwise(F.expr(
        "cast(array() as array<struct<clause_no:int,col_no:int,"
        "clause:string,clause_kind:string,col_a:string,col_b:string,"
        "col_type:string>>)"
    ))

    def _decl(e):
        return F.concat(F.lit("T:"), F.coalesce(e["col_type"], F.lit("")))

    type_entries = F.flatten(
        F.transform(
            ent,
            lambda e: F.when(
                e["clause_kind"].isin("ADD_COLUMN", "MODIFY_COLUMN"),
                F.array(F.struct(
                    e["col_a"].alias("col"), _decl(e).alias("act")
                )),
            )
            .when(
                e["clause_kind"] == "CHANGE_COLUMN",
                F.array(
                    F.struct(
                        e["col_a"].alias("col"), F.lit("X").alias("act")
                    ),
                    F.struct(e["col_b"].alias("col"), _decl(e).alias("act")),
                ),
            )
            .when(
                e["clause_kind"] == "RENAME_COLUMN",
                F.array(
                    F.struct(
                        e["col_a"].alias("col"), F.lit("X").alias("act")
                    ),
                    F.struct(
                        e["col_b"].alias("col"), F.lit("T:").alias("act")
                    ),
                ),
            )
            .when(
                e["clause_kind"] == "DROP_COLUMN",
                F.array(
                    F.struct(
                        e["col_a"].alias("col"), F.lit("X").alias("act")
                    )
                ),
            )
            .otherwise(
                F.expr("cast(array() as array<struct<col:string,act:string>>)")
            ),
        )
    )
    actmap = F.aggregate(
        type_entries,
        F.expr("cast(map() as map<string,string>)"),
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, v: k != e["col"]),
            F.create_map(e["col"], e["act"]),
        ),
    )
    d = c.select(
        "schema_name",
        "table_name",
        "ddl_kind",
        "binlog_file",
        "log_position",
        "line_no",
        F.row_number().over(w).cast("long").alias("version"),
        create_defs.alias("__create_defs"),
        (
            F.regexp_extract("statement", _CREATE_LIST_RE, 1) != ""
        ).alias("__has_list"),
        actmap.alias("__actmap"),
    )
    d = scoped_cache(d)
    uni = (
        d.select(
            "schema_name",
            "table_name",
            F.explode(
                F.array_union(
                    F.map_keys("__actmap"),
                    F.transform("__create_defs", lambda e: e["col"]),
                )
            ).alias("column_name"),
        )
        .distinct()
    )
    grid = d.join(uni, ["schema_name", "table_name"])
    # CREATE with a declared list resets: declared columns get their
    # def type, everything else 'X'; CREATE without one carries (the
    # UNRESOLVED_CREATE_SHAPE channel reports it); DROP TABLE resets all
    matched = F.filter(
        F.col("__create_defs"),
        lambda e: e["col"] == F.col("column_name"),
    )
    action = (
        F.when(
            (F.col("ddl_kind") == "CREATE") & F.col("__has_list"),
            F.when(
                F.size(matched) > 0,
                F.concat(
                    F.lit("T:"),
                    F.coalesce(F.element_at(matched, 1)["typ"], F.lit("")),
                ),
            ).otherwise(F.lit("X")),
        )
        .when(F.col("ddl_kind") == "DROP", F.lit("X"))
        .otherwise(F.element_at(F.col("__actmap"), F.col("column_name")))
    )
    wp = (
        Window.partitionBy("schema_name", "table_name", "column_name")
        .orderBy("version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    folded = grid.select(
        "schema_name",
        "table_name",
        "version",
        "column_name",
        F.last(action, ignorenulls=True).over(wp).alias("__state"),
    )
    wl = Window.partitionBy(
        "schema_name", "table_name", "column_name"
    ).orderBy("version")
    eff = F.when(
        F.col("__state").startswith("T:") & (F.length("__state") > 2),
        F.substring(F.col("__state"), 3, 2_000_000),
    )
    typed = folded.select(
        "schema_name",
        "table_name",
        "version",
        "column_name",
        eff.alias("column_type"),
        F.lag("__state").over(wl).alias("__prev_state"),
    )
    prev_type = F.when(
        F.col("__prev_state").startswith("T:")
        & (F.length("__prev_state") > 2),
        F.substring(F.col("__prev_state"), 3, 2_000_000),
    )
    return typed.filter(F.col("column_type").isNotNull()).select(
        "schema_name",
        "table_name",
        "version",
        "column_name",
        "column_type",
        _type_narrowing(prev_type, F.col("column_type")).alias(
            "is_narrowing"
        ),
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


def current_columns(ddl: DataFrame) -> DataFrame:
    """The column matrix at each table's LATEST version -- the declared
    shape a consumer should expect the producer to ship TODAY.  The
    latest version is the table's total statement count (versions are
    row_number over the canonical statement log), NOT the matrix's max
    present-row version: a table whose last statement is a DROP has an
    empty current set and must contribute nothing, which a max() over
    present-only rows would silently miss.  Both frames are
    metadata-sized; the count side broadcasts.  Returns (schema_name,
    table_name, column_name)."""
    m = schema_column_matrix(ddl)
    nv = (
        canonicalize_tables(ddl)
        .groupBy("schema_name", "table_name")
        .agg(F.count(F.lit(1)).cast("long").alias("__nv"))
    )
    return (
        m.join(F.broadcast(nv), ["schema_name", "table_name"])
        .filter(F.col("version") == F.col("__nv"))
        .select("schema_name", "table_name", "column_name")
    )


def schema_agreement(
    current_cols: DataFrame, observed: DataFrame
) -> DataFrame:
    """Cross-source schema agreement -- the comparator's loop closed at
    the SHAPE level: per canonical (schema_name, table_name), the full
    outer reconciliation of the binlog-DDL-declared current column set
    (``current_cols``: schema_name, table_name, column_name) against
    the avro lake's OBSERVED field census (``observed``: schema_name,
    table_name, field_name, n_obs).  Status per name:

      AGREE        declared and observed -- the healthy column
      BINLOG_ONLY  declared by DDL, never shipped by the producer
                   (a column added upstream the pipeline silently
                   drops -- the lake is quietly lossy)
      LAKE_ONLY    shipped by the producer, not in the declared shape
                   (a stale producer writing a dropped/renamed column,
                   or lake-side enrichment masquerading as source)

    The reference compares row VALUES and never asks whether the two
    sides even agree on the columns (compare_timestamps.go pairs by
    name unconditionally); this is the audit that says which per-column
    findings are structurally meaningful at all.  Both inputs are
    metadata-to-field cardinality: one broadcastable full-outer join,
    kind-cardinality output.  Returns (schema_name, table_name,
    column_name, status, n_obs -- 0 where never observed)."""
    left = current_cols.select(
        "schema_name",
        "table_name",
        F.col("column_name"),
        F.lit(True).alias("__declared"),
    )
    right = observed.select(
        "schema_name",
        "table_name",
        F.col("field_name").alias("column_name"),
        F.col("n_obs").cast("long").alias("__n_obs"),
    )
    j = left.join(
        right, ["schema_name", "table_name", "column_name"], "full_outer"
    )
    status = (
        F.when(
            F.col("__declared").isNotNull() & F.col("__n_obs").isNotNull(),
            F.lit("AGREE"),
        )
        .when(F.col("__declared").isNotNull(), F.lit("BINLOG_ONLY"))
        .otherwise(F.lit("LAKE_ONLY"))
    )
    return j.select(
        "schema_name",
        "table_name",
        "column_name",
        status.alias("status"),
        F.coalesce(F.col("__n_obs"), F.lit(0).cast("long")).alias("n_obs"),
    )
