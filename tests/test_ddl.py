"""DDL schema-change timeline + payload-diff guard (operators/ddl.py).

The reference parser carries Query-event statements verbatim
(json_parser.go:95) but nothing consumes them; these tests pin the
extraction grammar, the SCD2 timeline shape, the drift-window algebra,
and -- the r8 verdict's named scenario -- an ALTER TABLE landing
mid-stream quarantining the payload diffs after it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from binlog_avro_comparator_spark.operators import compare as C
from binlog_avro_comparator_spark.operators.ddl import (
    ddl_drift_windows,
    parse_ddl_statements,
    schema_timeline,
)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("binlog_file", T.StringType()),
        T.StructField("log_position", T.LongType()),
        T.StructField("line_no", T.LongType()),
        T.StructField("schema", T.StringType()),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _parsed(spark, rows):
    return spark.createDataFrame(rows, PARSED_SCHEMA)


def _q(ts, file, pos, line, default_schema, stmt, etype="Query"):
    return (etype, ts, file, pos, line, default_schema,
            {"query": stmt} if stmt is not None else {})


def test_parse_ddl_statements_grammar(spark):
    rows = [
        # unqualified -> session default schema
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 ADD COLUMN c1 INT"),
        # qualified + IF NOT EXISTS
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "CREATE TABLE IF NOT EXISTS db1.t2 (id INT PRIMARY KEY)"),
        # backticks on both parts
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "DROP TABLE `db1`.`t2`"),
        # lowercase verb
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "alter table t1 drop column c1"),
        # non-DDL statements must drop
        _q("2025-06-01T10:00:04Z", "mysql-bin.000001", 500, 5, "db0", "BEGIN"),
        _q("2025-06-01T10:00:05Z", "mysql-bin.000001", 600, 6, "db0",
           "INSERT INTO t1 VALUES (1)"),
        # Query event with no query kv at all
        _q("2025-06-01T10:00:06Z", "mysql-bin.000001", 700, 7, "db0", None),
        # non-Query events never contribute
        _q("2025-06-01T10:00:07Z", "mysql-bin.000001", 800, 8, "db0",
           "ALTER TABLE t9 ADD COLUMN x INT", etype="WriteRowsEventV2"),
    ]
    out = parse_ddl_statements(_parsed(spark, rows)).orderBy("line_no")
    got = [(r.schema_name, r.table_name, r.ddl_kind) for r in out.collect()]
    assert got == [
        ("db0", "t1", "ALTER"),
        ("db1", "t2", "CREATE"),
        ("db1", "t2", "DROP"),
        ("db0", "t1", "ALTER"),
    ]


def test_schema_timeline_scd2_shape(spark):
    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT)"),
        _q("2025-06-01T10:00:05Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t1 ADD COLUMN c1 INT"),
        _q("2025-06-01T10:00:09Z", "mysql-bin.000002", 100, 1, "db0",
           "DROP TABLE t1"),
        # a second table interleaved -- versions are per-table
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 150, 9, "db0",
           "CREATE TABLE t2 (id INT)"),
    ]
    tl = schema_timeline(parse_ddl_statements(_parsed(spark, rows)))
    t1 = {r.version: r for r in tl.filter(F.col("table_name") == "t1").collect()}
    assert [t1[v].ddl_kind for v in (1, 2, 3)] == ["CREATE", "ALTER", "DROP"]
    # valid_to chains to the next version's valid_from
    assert t1[1].valid_to == t1[2].valid_from
    assert t1[2].valid_to == t1[3].valid_from
    assert t1[3].valid_to is None and t1[3].is_current
    assert not t1[1].is_current
    t2 = tl.filter(F.col("table_name") == "t2").collect()
    assert len(t2) == 1 and t2[0].version == 1 and t2[0].is_current


def test_drift_windows_alter_until_create(spark):
    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 ADD COLUMN c1 INT"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 300, 2, "db0",
           "CREATE TABLE t1 (id INT, c1 INT)"),
        # second ALTER never reconciled -> open window
        _q("2025-06-01T10:00:02Z", "mysql-bin.000002", 100, 3, "db0",
           "alter table t1 drop column c1"),
        # zero position carries no coordinate (Q5) -> skipped entirely
        _q("2025-06-01T10:00:03Z", "mysql-bin.000002", 0, 4, "db0",
           "ALTER TABLE t1 ADD COLUMN zz INT"),
    ]
    win = ddl_drift_windows(parse_ddl_statements(_parsed(spark, rows)))
    got = sorted((r.win_from, r.win_to) for r in win.collect())
    assert got == [
        ("mysql-bin.000001:000000000100", "mysql-bin.000001:000000000300"),
        ("mysql-bin.000002:000000000100", None),
    ]


PAYLOAD_T = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("binlog_position", T.LongType()),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType())),
    ]
)
KT_T = T.StructType(
    [
        T.StructField("binlog_file", T.StringType()),
        T.StructField("binlog_position", T.LongType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
    ]
)
WIN_T = T.StructType(
    [
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("win_from", T.StringType()),
        T.StructField("win_to", T.StringType()),
    ]
)


def test_payload_diff_guard_alter_mid_stream(spark):
    """The r8 verdict's scenario: an ALTER lands mid-stream at position
    500; keys before it keep their column findings, EVERY matched key
    at-or-after it (divergent or falsely agreeing) collapses to one
    DDL_BOUNDARY row, and unmatched keys stay with the metadata diff
    (the guard never invents matches)."""
    f = "mysql-bin.000001"
    bp = spark.createDataFrame(
        [
            (f, 100, {"a": "1", "b": "x"}),    # pre-DDL, clean
            (f, 200, {"a": "1", "b": "x"}),    # pre-DDL, b diverges
            (f, 600, {"a": "2", "b": "y"}),    # post-DDL, diverges
            (f, 700, {"a": "3", "b": "z"}),    # post-DDL, FALSE AGREEMENT
            (f, 800, {"a": "9", "b": "q"}),    # post-DDL, no avro match
        ],
        PAYLOAD_T,
    )
    ap = spark.createDataFrame(
        [
            (f, 100, {"a": "1", "b": "x"}),
            (f, 200, {"a": "1", "b": "DIFFERENT"}),
            (f, 600, {"a": "2", "b": "WRONG"}),
            (f, 700, {"a": "3", "b": "z"}),
        ],
        PAYLOAD_T,
    )
    kt = spark.createDataFrame(
        [(f, p, "db0", "t1") for p in (100, 200, 600, 700, 800)], KT_T
    )
    win = spark.createDataFrame(
        [("db0", "t1", f + ":" + "500".zfill(12), None)], WIN_T
    )
    out = C.payload_diff_ddl_guard(bp, ap, kt, win).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.binlog_position, []).append(r)
    # pre-DDL: agreeing key emits nothing, diverging key keeps MISMATCH
    assert 100 not in by_key
    assert [(r.column, r.status) for r in by_key[200]] == [("b", "MISMATCH")]
    # post-DDL: both matched keys quarantine -- including the false
    # agreement at 700 that the bare diff would stay silent on
    for pos in (600, 700):
        assert [(r.column, r.status) for r in by_key[pos]] == [
            ("*", "DDL_BOUNDARY")
        ]
    # unmatched key: not in the payload diff at all (metadata tier owns it)
    assert 800 not in by_key
    # quarantined keys carry no value columns
    assert by_key[600][0].binlog_value is None


def test_guard_outside_window_is_identity(spark):
    """With no windows, the guard is payload_diff verbatim."""
    f = "mysql-bin.000001"
    bp = spark.createDataFrame([(f, 100, {"a": "1"})], PAYLOAD_T)
    ap = spark.createDataFrame([(f, 100, {"a": "2"})], PAYLOAD_T)
    kt = spark.createDataFrame([(f, 100, "db0", "t1")], KT_T)
    win = spark.createDataFrame([], WIN_T)
    out = C.payload_diff_ddl_guard(bp, ap, kt, win).collect()
    assert [(r.column, r.status) for r in out] == [("a", "MISMATCH")]


def test_schema_census_drift_flags_stale_lake(spark):
    """A table whose binlog saw more shape changes than the lake has
    writer-schema versions is flagged -- the reconciliation that
    CLOSES a drift window (timeline says the shape moved; the census
    says whether the producer caught up)."""
    from binlog_avro_comparator_spark.operators.ddl import schema_census_drift

    tl = schema_timeline(
        parse_ddl_statements(
            _parsed(
                spark,
                [
                    _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1,
                       "db0", "CREATE TABLE t1 (id INT)"),
                    _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2,
                       "db0", "ALTER TABLE t1 ADD COLUMN c1 INT"),
                    _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3,
                       "db0", "CREATE TABLE t2 (id INT)"),
                ],
            )
        )
    )
    census = spark.createDataFrame(
        [("db0", "t1", 2), ("db0", "t2", 1)],
        "schema_name string, table_name string, n_writer_schemas int",
    )
    ok = {
        (r.schema_name, r.table_name): r.drift
        for r in schema_census_drift(tl, census).collect()
    }
    assert ok == {("db0", "t1"): False, ("db0", "t2"): False}
    stale = spark.createDataFrame(
        [("db0", "t1", 1)],  # lake never shipped the post-ALTER schema
        "schema_name string, table_name string, n_writer_schemas int",
    )
    got = {
        (r.schema_name, r.table_name): (r.drift, r.n_writer_schemas)
        for r in schema_census_drift(tl, stale).collect()
    }
    assert got[("db0", "t1")] == (True, 1)
    assert got[("db0", "t2")] == (True, 0)  # absent from the lake entirely


def test_alter_clause_grammar(spark):
    """Multi-clause ALTERs split on top-level commas only (type args
    like DECIMAL(10,2) never split); each clause classifies; index
    operations are recognized no-column-effect, not parse failures;
    unrecognized fragments classify UNPARSED."""
    from binlog_avro_comparator_spark.operators.ddl import alter_clauses

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 ADD COLUMN a1 DECIMAL(10,2), DROP COLUMN c1,"
           " ADD INDEX ix_a1 (a1)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t1 MODIFY COLUMN c2 BIGINT NOT NULL"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1 CHANGE COLUMN old_c new_c BIGINT"),
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "ALTER TABLE `t1` RENAME COLUMN c3 TO n3"),
        _q("2025-06-01T10:00:04Z", "mysql-bin.000001", 500, 5, "db0",
           "ALTER TABLE t1 CONVERT TO CHARACTER SET utf8mb4,"
           " ADD COLUMN p1 INT"),
        _q("2025-06-01T10:00:05Z", "mysql-bin.000001", 600, 6, "db0",
           "ALTER TABLE t1 RENAME TO t1_new"),
        # bare ADD without the COLUMN keyword (MySQL-legal)
        _q("2025-06-01T10:00:06Z", "mysql-bin.000001", 700, 7, "db0",
           "ALTER TABLE t1 ADD bare_col INT"),
    ]
    cl = alter_clauses(
        parse_ddl_statements(_parsed(spark, rows))
    ).orderBy("line_no", "clause_no")
    got = [(r.clause_kind, r.col_a, r.col_b) for r in cl.collect()]
    assert got == [
        ("ADD_COLUMN", "a1", None),
        ("DROP_COLUMN", "c1", None),
        ("INDEX_OP", None, None),
        ("MODIFY_COLUMN", "c2", None),
        ("CHANGE_COLUMN", "old_c", "new_c"),
        ("RENAME_COLUMN", "c3", "n3"),
        ("UNPARSED", None, None),
        ("ADD_COLUMN", "p1", None),
        ("RENAME_TO", None, "t1_new"),
        ("ADD_COLUMN", "bare_col", None),
    ]


def test_parse_anomalies_channel(spark):
    """PARTIAL_PARSE discipline: unparsed clauses and malformed RENAME
    TABLE pair fragments surface as findings; fully-parsed statements
    -- multi-pair renames included (r11: every well-formed pair
    parses) -- emit nothing."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 CONVERT TO CHARACTER SET utf8mb4,"
           " ADD COLUMN p1 INT"),
        # both pairs well-formed: parses fully, contributes NOTHING
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "RENAME TABLE t1 TO t2, t3 TO t4"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1 ADD COLUMN ok INT"),
        # second fragment fails the pair grammar: structural finding
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "RENAME TABLE t5 TO t6, @bad TO"),
    ]
    out = ddl_parse_anomalies(
        parse_ddl_statements(_parsed(spark, rows))
    ).collect()
    by_reason = {r.reason: r for r in out}
    assert len(out) == 2
    assert by_reason["UNPARSED_CLAUSE"].fragment == (
        "CONVERT TO CHARACTER SET utf8mb4"
    )
    assert by_reason["UNPARSED_RENAME_PAIR"].fragment == "@bad TO"
    assert by_reason["UNPARSED_RENAME_PAIR"].table_name == "t5"


def test_multi_pair_rename_explodes_and_threads(spark):
    """The gh-ost/pt-osc atomic cut-over ``RENAME TABLE t TO _t_old,
    _t_new TO t``: BOTH pairs parse (pair_no keeps MySQL's
    left-to-right order), the swap threads one history whose canonical
    identity is the swapped-in table, and current_name ends on the
    LIVE name -- the second pair is the one that re-keys the feed."""
    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "RENAME TABLE t TO _t_old, _t_new TO t"),
        # post-swap DDL against the live name joins the same history
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t ADD COLUMN c1 INT"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    pairs = sorted(
        (r.pair_no, r.table_name, r.new_table_name)
        for r in ddl.filter(F.col("ddl_kind") == "RENAME").collect()
    )
    assert pairs == [(0, "t", "_t_old"), (1, "_t_new", "t")]
    tl = {r.version: r for r in schema_timeline(ddl).collect()}
    # one history under the canonical (swapped-in) identity
    assert all(r.table_name == "_t_new" for r in tl.values())
    assert [tl[v].ddl_kind for v in (1, 2, 3)] == [
        "RENAME", "RENAME", "ALTER"
    ]
    # pair order decides current_name: the live name wins the fold
    assert tl[1].current_name == "_t_old"
    assert tl[2].current_name == "t"
    assert tl[3].current_name == "t"


@pytest.mark.slow
def test_option_clauses_keep_moved_known(spark):
    """The canonical MySQL 8 online-DDL form ``ADD COLUMN a INT,
    ALGORITHM=INPLACE, LOCK=NONE`` classifies its option clauses
    OPTION_NO_EFFECT (recognized, no column effect): the moved set
    stays fully known -- the r10 column-granular guard precision is
    NOT degraded to whole-key -- and the anomaly channel stays quiet.
    CONVERT TO CHARACTER SET stays UNPARSED (it retypes string
    columns)."""
    from binlog_avro_comparator_spark.operators.ddl import (
        alter_clauses,
        ddl_drift_window_columns,
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 ADD COLUMN a INT, ALGORITHM=INPLACE, LOCK=NONE"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t2 ENGINE=InnoDB, ROW_FORMAT=DYNAMIC,"
           " AUTO_INCREMENT=1000, COMMENT='resized', DEFAULT CHARACTER"
           " SET utf8mb4, DISABLE KEYS, FORCE"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t3 CONVERT TO CHARACTER SET utf8mb4"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    cl = alter_clauses(ddl)
    kinds = {
        (r.line_no, r.clause_no): r.clause_kind for r in cl.collect()
    }
    assert kinds[(1, 0)] == "ADD_COLUMN"
    assert kinds[(1, 1)] == kinds[(1, 2)] == "OPTION_NO_EFFECT"
    assert all(
        kinds[(2, i)] == "OPTION_NO_EFFECT" for i in range(7)
    )
    assert kinds[(3, 0)] == "UNPARSED"
    wc = {
        r.table_name: r
        for r in ddl_drift_window_columns(ddl).collect()
    }
    assert wc["t1"].moved_known and wc["t1"].moved_cols == ["a"]
    assert wc["t2"].moved_known and wc["t2"].moved_cols == []
    assert not wc["t3"].moved_known
    anoms = ddl_parse_anomalies(ddl).collect()
    assert [(r.table_name, r.reason) for r in anoms] == [
        ("t3", "UNPARSED_CLAUSE")
    ]


@pytest.mark.slow
def test_maintenance_clauses_classify_no_effect(spark):
    """The rest of the week-one ALTER vocabulary: ALTER COLUMN SET/DROP
    DEFAULT (COLUMN_DEFAULT -- defaults never move the column shape),
    RENAME INDEX (an index op), ORDER BY, and the partition-maintenance
    family -- all RECOGNIZED no-shape-effect grammar, so none of them
    degrades the moved-column set to unknown and none lands on the
    anomaly channel."""
    from binlog_avro_comparator_spark.operators.ddl import (
        alter_clauses,
        ddl_drift_window_columns,
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 ALTER COLUMN c SET DEFAULT 5, ADD COLUMN d INT"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t2 ALTER c DROP DEFAULT"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t3 RENAME INDEX ix_a TO ix_b"),
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "ALTER TABLE t4 ORDER BY c1, ADD COLUMN e INT"),
        _q("2025-06-01T10:00:04Z", "mysql-bin.000001", 500, 5, "db0",
           "ALTER TABLE t5 TRUNCATE PARTITION p0"),
        _q("2025-06-01T10:00:05Z", "mysql-bin.000001", 600, 6, "db0",
           "ALTER TABLE t6 REMOVE PARTITIONING"),
        _q("2025-06-01T10:00:06Z", "mysql-bin.000001", 700, 7, "db0",
           "ALTER TABLE t7 REORGANIZE PARTITION p0 INTO"
           " (PARTITION p1 VALUES LESS THAN (10))"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    kinds = {
        (r.line_no, r.clause_no): r.clause_kind
        for r in alter_clauses(ddl).collect()
    }
    assert kinds[(1, 0)] == "COLUMN_DEFAULT"
    assert kinds[(1, 1)] == "ADD_COLUMN"
    assert kinds[(2, 0)] == "COLUMN_DEFAULT"
    assert kinds[(3, 0)] == "INDEX_OP"
    assert kinds[(4, 0)] == "OPTION_NO_EFFECT"
    assert kinds[(4, 1)] == "ADD_COLUMN"
    assert kinds[(5, 0)] == kinds[(6, 0)] == kinds[(7, 0)] == "PARTITION_OP"
    wc = {r.table_name: r for r in ddl_drift_window_columns(ddl).collect()}
    assert all(w.moved_known for w in wc.values())
    assert wc["t1"].moved_cols == ["d"] and wc["t4"].moved_cols == ["e"]
    assert ddl_parse_anomalies(ddl).count() == 0


@pytest.mark.slow
def test_paren_multi_column_add(spark):
    """``ADD (x INT, y VARCHAR(255))`` -- valid MySQL -- explodes into
    per-column ADD_COLUMN rows with declared types; constraint
    fragments inside the paren list never parse as columns; the moved
    set and the column matrix see every added column."""
    from binlog_avro_comparator_spark.operators.ddl import (
        alter_clauses,
        ddl_drift_window_columns,
        schema_column_matrix,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 ADD (x INT, y VARCHAR(255)), ALGORITHM=INPLACE"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t2 ADD (a DECIMAL(10,2), PRIMARY KEY (a))"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    cl = alter_clauses(ddl).orderBy("line_no", "clause_no", "col_no")
    got = [
        (r.line_no, r.clause_kind, r.col_a, r.col_type)
        for r in cl.collect()
    ]
    assert got == [
        (1, "ADD_COLUMN", "x", "INT"),
        (1, "ADD_COLUMN", "y", "VARCHAR(255)"),
        (1, "OPTION_NO_EFFECT", None, None),
        (2, "ADD_COLUMN", "a", "DECIMAL(10,2)"),
    ]
    wc = {
        r.table_name: r for r in ddl_drift_window_columns(ddl).collect()
    }
    assert wc["t1"].moved_known and wc["t1"].moved_cols == ["x", "y"]
    assert wc["t2"].moved_known and wc["t2"].moved_cols == ["a"]
    m = schema_column_matrix(ddl)
    cols = {
        r.table_name: set()
        for r in m.collect()
    }
    for r in m.collect():
        cols[r.table_name].add(r.column_name)
    assert cols == {"t1": {"x", "y"}, "t2": {"a"}}


def test_schema_column_types_narrowing(spark):
    """Type-aware matrix: declared types fold across versions
    (CREATE/ADD/MODIFY/CHANGE; DROP and CHANGE-away reset), and
    is_narrowing flags exactly the same-family shrink transitions --
    varchar length, int width, decimal precision/scale -- while
    widenings, no-op MODIFYs and cross-family retypes stay false."""
    from binlog_avro_comparator_spark.operators.ddl import (
        schema_column_types,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT, v VARCHAR(255), d DECIMAL(10,2))"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t1 MODIFY COLUMN id BIGINT"),       # widening
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1 MODIFY COLUMN id SMALLINT"),     # NARROWING
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "ALTER TABLE t1 MODIFY COLUMN id SMALLINT"),     # no-op
        _q("2025-06-01T10:00:04Z", "mysql-bin.000001", 500, 5, "db0",
           "ALTER TABLE t1 MODIFY COLUMN v VARCHAR(50)"),   # NARROWING
        _q("2025-06-01T10:00:05Z", "mysql-bin.000001", 600, 6, "db0",
           "ALTER TABLE t1 MODIFY COLUMN d DECIMAL(10,1)"),  # NARROWING
        _q("2025-06-01T10:00:06Z", "mysql-bin.000001", 700, 7, "db0",
           "ALTER TABLE t1 MODIFY COLUMN v TEXT"),  # cross-family
        # drop then re-add: the fresh INT must NOT read as a narrowing
        # of the dropped SMALLINT-era type... it was reset
        _q("2025-06-01T10:00:07Z", "mysql-bin.000001", 800, 8, "db0",
           "ALTER TABLE t1 DROP COLUMN id"),
        _q("2025-06-01T10:00:08Z", "mysql-bin.000001", 900, 9, "db0",
           "ALTER TABLE t1 ADD COLUMN id TINYINT"),
    ]
    t = schema_column_types(parse_ddl_statements(_parsed(spark, rows)))
    by = {
        (r.version, r.column_name): (r.column_type, r.is_narrowing)
        for r in t.collect()
    }
    assert by[(1, "id")] == ("INT", False)
    assert by[(2, "id")] == ("BIGINT", False)
    assert by[(3, "id")] == ("SMALLINT", True)
    assert by[(4, "id")] == ("SMALLINT", False)
    assert by[(5, "v")] == ("VARCHAR(50)", True)
    assert by[(6, "d")] == ("DECIMAL(10,1)", True)
    assert by[(7, "v")] == ("TEXT", False)
    assert (8, "id") not in by            # dropped
    assert by[(9, "id")] == ("TINYINT", False)  # reset, not a narrow


def test_alter_rename_probe_ignores_string_literals(spark):
    """A quoted literal containing 'rename to x' (COMMENT / DEFAULT
    text) must not fabricate a rename target -- the probe strips
    literals and anchors at clause boundaries; a REAL top-level RENAME
    TO clause still threads."""
    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 COMMENT 'rename to bogus', ADD COLUMN c INT"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t2 ADD COLUMN c INT, RENAME TO t2_v2"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    by = {r.table_name: r for r in ddl.collect()}
    assert by["t1"].new_table_name is None
    assert by["t2"].new_table_name == "t2_v2"


def test_drop_all_bad_fragments_never_silent(spark):
    """A DROP whose every list fragment fails the name grammar keeps a
    fallback frame row under its leading identifier, so the anomaly
    channel still reports the fragments -- the statement can't vanish
    from both (ADVICE r10)."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "DROP TABLE a b"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    got = [(r.table_name, r.ddl_kind) for r in ddl.collect()]
    assert got == [("a", "DROP")]
    anom = ddl_parse_anomalies(ddl).collect()
    assert [(r.reason, r.fragment) for r in anom] == [
        ("UNPARSED_DROP_NAME", "a b")
    ]


@pytest.mark.slow
def test_rename_all_bad_pairs_never_silent(spark):
    """A RENAME TABLE whose every pair fails the pair grammar (e.g. a
    truncated ``RENAME TABLE t TO``) keeps a fallback frame row under
    the loose leading token -- new_* NULL, no edge threads -- so the
    anomaly channel still reports the fragments instead of the
    statement vanishing from both (probe r11)."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "RENAME TABLE t9 TO"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    got = [
        (r.table_name, r.ddl_kind, r.new_table_name) for r in ddl.collect()
    ]
    assert got == [("t9", "RENAME", None)]
    anom = ddl_parse_anomalies(ddl).collect()
    assert [(r.reason, r.fragment) for r in anom] == [
        ("UNPARSED_RENAME_PAIR", "t9 TO")
    ]
    # a well-formed rename is untouched by the fallback (anti-joined)
    rows2 = rows + [
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "RENAME TABLE t1 TO t2"),
    ]
    ddl2 = parse_ddl_statements(_parsed(spark, rows2))
    per_stmt = {}
    for r in ddl2.collect():
        per_stmt.setdefault(r.statement, []).append(r)
    assert len(per_stmt["RENAME TABLE t1 TO t2"]) == 1
    assert per_stmt["RENAME TABLE t1 TO t2"][0].new_table_name == "t2"
    assert len(per_stmt["RENAME TABLE t9 TO"]) == 1


def test_rename_table_threads_one_history(spark):
    """RENAME TABLE threaded through the timeline: statements against
    the renamed name join the ORIGINAL table's history (one table, one
    history), versions number across the rename, and current_name
    carries the as-of name."""
    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "RENAME TABLE t1 TO t1_v2"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1_v2 ADD COLUMN c1 INT"),
    ]
    tl = schema_timeline(parse_ddl_statements(_parsed(spark, rows)))
    t1 = {r.version: r for r in tl.collect()}
    assert all(r.table_name == "t1" for r in t1.values())
    assert [t1[v].ddl_kind for v in (1, 2, 3)] == [
        "CREATE", "RENAME", "ALTER"
    ]
    assert t1[1].current_name == "t1"
    assert t1[2].current_name == "t1_v2"
    assert t1[3].current_name == "t1_v2"
    assert t1[3].is_current


def test_column_matrix_change_and_rename_column(spark):
    """CHANGE/RENAME COLUMN move membership (old out, new in); MODIFY
    leaves the set intact; a multi-clause statement applies all its
    clauses at one version."""
    from binlog_avro_comparator_spark.operators.ddl import (
        schema_column_matrix,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT, c1 INT, c2 INT)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t1 CHANGE COLUMN c1 r1 BIGINT"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1 MODIFY COLUMN c2 BIGINT NOT NULL"),
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "ALTER TABLE t1 ADD COLUMN a1 DECIMAL(10,2), DROP COLUMN c2"),
    ]
    m = schema_column_matrix(parse_ddl_statements(_parsed(spark, rows)))
    by_ver = {}
    for r in m.collect():
        by_ver.setdefault(r.version, set()).add(r.column_name)
    assert by_ver[1] == {"id", "c1", "c2"}
    assert by_ver[2] == {"id", "r1", "c2"}  # c1 -> r1
    assert by_ver[3] == {"id", "r1", "c2"}  # MODIFY: membership intact
    assert by_ver[4] == {"id", "r1", "a1"}  # add a1, drop c2, one version


def test_drift_window_columns_moved_sets(spark):
    """Window annotations: a clean ALTER knows exactly what moved; a
    PARTIAL_PARSE opener and a table RENAME are unknown (whole-key
    conservative downstream)."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_drift_window_columns,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 CHANGE COLUMN c1 r1 BIGINT, ADD COLUMN a1 INT"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t2 CONVERT TO CHARACTER SET utf8mb4,"
           " ADD COLUMN p1 INT"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "RENAME TABLE t3 TO t3_x"),
    ]
    wc = {
        r.table_name: r
        for r in ddl_drift_window_columns(
            parse_ddl_statements(_parsed(spark, rows))
        ).collect()
    }
    assert wc["t1"].moved_known and wc["t1"].moved_cols == ["a1", "c1", "r1"]
    assert not wc["t2"].moved_known
    assert not wc["t3"].moved_known


def test_column_guard_recovers_stable_columns(spark):
    """The column-granular quarantine's whole point: inside a drift
    window whose moved set is KNOWN, a STABLE column's real mismatch
    keeps reporting (the whole-key guard goes blind there), moved
    columns emit per-column DDL_BOUNDARY rows for every matched key
    (false agreements included), and unknown-set windows stay
    whole-key conservative."""
    f = "mysql-bin.000001"
    bp = spark.createDataFrame(
        [
            (f, 600, {"a": "2", "b": "y"}),   # in known window: b diverges
            (f, 700, {"a": "3", "b": "z"}),   # in known window: agrees
            (f, 900, {"a": "5", "b": "w"}),   # in UNKNOWN window: diverges
        ],
        PAYLOAD_T,
    )
    ap = spark.createDataFrame(
        [
            (f, 600, {"a": "WRONG", "b": "ALSO-WRONG"}),
            (f, 700, {"a": "3", "b": "z"}),
            (f, 900, {"a": "5", "b": "DIFFERENT"}),
        ],
        PAYLOAD_T,
    )
    kt = spark.createDataFrame(
        [(f, p, "db0", "t1" if p < 800 else "t2") for p in (600, 700, 900)],
        KT_T,
    )
    wc_schema = T.StructType(
        WIN_T.fields
        + [
            T.StructField("moved_cols", T.ArrayType(T.StringType())),
            T.StructField("moved_known", T.BooleanType()),
        ]
    )
    wc = spark.createDataFrame(
        [
            ("db0", "t1", f + ":" + "500".zfill(12), None, ["a"], True),
            ("db0", "t2", f + ":" + "800".zfill(12), None, [], False),
        ],
        wc_schema,
    )
    out = C.payload_diff_column_guard(bp, ap, kt, wc).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.binlog_position, []).append((r.column, r.status))
    # key 600: the moved column 'a' quarantines, the STABLE column 'b'
    # keeps its real MISMATCH -- the recovered coverage
    assert sorted(by_key[600]) == [("a", "DDL_BOUNDARY"), ("b", "MISMATCH")]
    # key 700 agrees everywhere but still gets the moved-column
    # boundary row (the false-agreement case)
    assert by_key[700] == [("a", "DDL_BOUNDARY")]
    # key 900 is under an unknown-set window: whole-key quarantine
    assert by_key[900] == [("*", "DDL_BOUNDARY")]


def test_schema_column_matrix_fold(spark):
    """Effective column sets fold correctly: CREATE resets to the
    declared list (constraint clauses and type args never parse as
    columns), ADD/DROP COLUMN adjust, DROP TABLE empties, and versions
    before a column's first action exclude it."""
    from binlog_avro_comparator_spark.operators.ddl import schema_column_matrix

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT PRIMARY KEY, amount DECIMAL(10,2),"
           " note VARCHAR(40))"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t1 ADD COLUMN c1 INT"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "alter table t1 drop column note"),
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "CREATE TABLE t1 (id INT)"),  # reset: c1/amount gone
        _q("2025-06-01T10:00:04Z", "mysql-bin.000001", 500, 5, "db0",
           "DROP TABLE t1"),
    ]
    m = schema_column_matrix(parse_ddl_statements(_parsed(spark, rows)))
    by_ver = {}
    for r in m.collect():
        by_ver.setdefault(r.version, set()).add(r.column_name)
    assert by_ver[1] == {"id", "amount", "note"}  # DECIMAL(10,2)'s 2 and
    # PRIMARY/KEY never parse as columns
    assert by_ver[2] == {"id", "amount", "note", "c1"}
    assert by_ver[3] == {"id", "amount", "c1"}
    assert by_ver[4] == {"id"}
    assert 5 not in by_ver  # DROP TABLE empties the set


def test_multi_name_drop_explodes_per_table(spark):
    """DROP TABLE a, b.c explodes into one DROP row per table (each
    history sees its drop); a fragment outside the name grammar
    surfaces on the anomaly channel instead of vanishing."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "DROP TABLE t1, db1.t2, `t3`"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "DROP TABLE IF EXISTS t4, @bad@ CASCADE"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    got = sorted(
        (r.schema_name, r.table_name)
        for r in ddl.filter(F.col("ddl_kind") == "DROP").collect()
    )
    assert got == [
        ("db0", "t1"), ("db0", "t3"), ("db0", "t4"), ("db1", "t2"),
    ]
    anom = ddl_parse_anomalies(ddl).collect()
    assert [(r.reason, r.fragment) for r in anom] == [
        ("UNPARSED_DROP_NAME", "@bad@")
    ]


@pytest.mark.slow
def test_create_like_carries_columns_and_flags(spark):
    """CREATE TABLE ... LIKE src (no declared list) cannot reset the
    column set statement-locally: the matrix carries the previous set
    forward and the anomaly channel reports UNRESOLVED_CREATE_SHAPE --
    never a silent empty-set reset."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
        schema_column_matrix,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT, c1 INT)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "CREATE TABLE t1 LIKE template_t"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1 ADD COLUMN c2 INT"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    m = schema_column_matrix(ddl.filter(F.col("table_name") == "t1"))
    by_ver = {}
    for r in m.collect():
        by_ver.setdefault(r.version, set()).add(r.column_name)
    assert by_ver[1] == {"id", "c1"}
    assert by_ver[2] == {"id", "c1"}      # carried, not emptied
    assert by_ver[3] == {"id", "c1", "c2"}
    anom = [
        r
        for r in ddl_parse_anomalies(ddl).collect()
        if r.reason == "UNRESOLVED_CREATE_SHAPE"
    ]
    assert len(anom) == 1 and "LIKE template_t" in anom[0].fragment


@pytest.mark.slow
def test_truncate_index_maintenance_vocabulary(spark):
    """The r11 statement-vocabulary completion: TRUNCATE (both legal
    forms), standalone CREATE/DROP INDEX keyed on the ON target, and
    multi-name OPTIMIZE/ANALYZE maintenance exploded per table -- all
    visible in the statement log, none silent."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_drift_window_columns,
        ddl_parse_anomalies,
        schema_column_matrix,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT, c1 INT)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "TRUNCATE TABLE t1"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "truncate t1"),
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "CREATE UNIQUE INDEX ux ON db1.t2 (a, b)"),
        _q("2025-06-01T10:00:04Z", "mysql-bin.000001", 500, 5, "db0",
           "DROP INDEX ux ON t1"),
        _q("2025-06-01T10:00:05Z", "mysql-bin.000001", 600, 6, "db0",
           "OPTIMIZE TABLE t1, db1.t2"),
        _q("2025-06-01T10:00:06Z", "mysql-bin.000001", 700, 7, "db0",
           "ANALYZE NO_WRITE_TO_BINLOG TABLE t1"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    got = sorted(
        (r.line_no, r.pair_no, r.schema_name, r.table_name, r.ddl_kind)
        for r in ddl.collect()
    )
    assert got == [
        (1, 0, "db0", "t1", "CREATE"),
        (2, 0, "db0", "t1", "TRUNCATE"),
        (3, 0, "db0", "t1", "TRUNCATE"),
        (4, 0, "db1", "t2", "INDEX"),
        (5, 0, "db0", "t1", "INDEX"),
        (6, 0, "db0", "t1", "MAINTENANCE"),
        (6, 1, "db1", "t2", "MAINTENANCE"),
        (7, 0, "db0", "t1", "MAINTENANCE"),
    ]
    # TRUNCATE opens a whole-key drift window; INDEX/MAINTENANCE do not
    wins = ddl_drift_window_columns(
        ddl.filter(F.col("table_name") == "t1")
    ).collect()
    assert len(wins) == 2  # the two TRUNCATEs (positions 200, 300)
    assert all(not w.moved_known and w.moved_cols == [] for w in wins)
    # membership carries through every new kind (data reset, not shape)
    m = schema_column_matrix(ddl.filter(F.col("table_name") == "t1"))
    by_ver = {}
    for r in m.collect():
        by_ver.setdefault(r.version, set()).add(r.column_name)
    assert by_ver[1] == {"id", "c1"}
    assert all(cols == {"id", "c1"} for cols in by_ver.values())
    assert max(by_ver) == 6  # CREATE + 2 TRUNCATE + DROP INDEX + 2 MAINT
    # nothing on the anomaly channel: every statement is well-formed
    assert ddl_parse_anomalies(ddl).count() == 0


def test_new_vocabulary_never_silent_fallbacks(spark):
    """Names outside the strict identifier grammar keep a loose-token
    frame row AND surface on the anomaly channel -- the discipline the
    DROP fallback set (r11 ADVICE)."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "TRUNCATE TABLE `weird name`"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "OPTIMIZE TABLE t1, `bad frag here`"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    by_line = {}
    for r in ddl.collect():
        by_line.setdefault(r.line_no, []).append(r)
    # the truncate kept a loose-token row (never vanished)
    assert [r.ddl_kind for r in by_line[1]] == ["TRUNCATE"]
    assert by_line[1][0].table_name == "weird"
    # the maintenance list kept its good name; the bad fragment dropped
    assert [(r.table_name, r.ddl_kind) for r in by_line[2]] == [
        ("t1", "MAINTENANCE")
    ]
    reasons = {
        (r.reason, r.fragment)
        for r in ddl_parse_anomalies(ddl).collect()
    }
    assert ("UNPARSED_TRUNCATE_NAME", "TRUNCATE TABLE `weird name`") in reasons
    assert ("UNPARSED_MAINT_NAME", "`bad frag here`") in reasons


def test_maintenance_threads_renamed_name(spark):
    """OPTIMIZE against a renamed table canonicalizes into the base
    table's one history (the same threading ALTER gets)."""
    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "RENAME TABLE t1 TO t1_r"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "OPTIMIZE TABLE t1_r"),
    ]
    tl = schema_timeline(parse_ddl_statements(_parsed(spark, rows)))
    rows_out = sorted(
        (r.version, r.ddl_kind, r.table_name, r.current_name)
        for r in tl.collect()
    )
    assert rows_out == [
        (1, "CREATE", "t1", "t1"),
        (2, "RENAME", "t1", "t1_r"),
        (3, "MAINTENANCE", "t1", "t1_r"),
    ]


@pytest.mark.slow
def test_schema_agreement_three_arms(spark):
    """Cross-source schema agreement: declared-current vs observed
    fields -- AGREE / BINLOG_ONLY / LAKE_ONLY, with the current set
    taken at the table's LAST version (a table ending on DROP
    contributes nothing)."""
    from binlog_avro_comparator_spark.operators.ddl import (
        current_columns,
        schema_agreement,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "CREATE TABLE t1 (id INT, order_id BIGINT)"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "ALTER TABLE t1 ADD COLUMN c1 INT"),
        # t2 ends on a DROP: current set must be empty
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "CREATE TABLE t2 (id INT)"),
        _q("2025-06-01T10:00:03Z", "mysql-bin.000001", 400, 4, "db0",
           "DROP TABLE t2"),
    ]
    ddl = parse_ddl_statements(_parsed(spark, rows))
    cur = current_columns(ddl)
    got = {
        (r.table_name, r.column_name) for r in cur.collect()
    }
    assert got == {("t1", "id"), ("t1", "order_id"), ("t1", "c1")}
    observed = spark.createDataFrame(
        [
            ("db0", "t1", "order_id", 7),
            ("db0", "t1", "legacy_col", 7),
            ("db0", "t2", "id", 3),
        ],
        "schema_name string, table_name string, field_name string,"
        " n_obs long",
    )
    ag = {
        (r.table_name, r.column_name): (r.status, r.n_obs)
        for r in schema_agreement(cur, observed).collect()
    }
    assert ag[("t1", "order_id")] == ("AGREE", 7)
    assert ag[("t1", "id")] == ("BINLOG_ONLY", 0)
    assert ag[("t1", "c1")] == ("BINLOG_ONLY", 0)
    assert ag[("t1", "legacy_col")] == ("LAKE_ONLY", 7)
    # the dropped table's observed traffic is ALL lake-only
    assert ag[("t2", "id")] == ("LAKE_ONLY", 3)
