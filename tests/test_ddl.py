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
    """PARTIAL_PARSE discipline: unparsed clauses and extra RENAME
    TABLE pairs surface as findings; fully-parsed statements emit
    nothing."""
    from binlog_avro_comparator_spark.operators.ddl import (
        ddl_parse_anomalies,
    )

    rows = [
        _q("2025-06-01T10:00:00Z", "mysql-bin.000001", 100, 1, "db0",
           "ALTER TABLE t1 CONVERT TO CHARACTER SET utf8mb4,"
           " ADD COLUMN p1 INT"),
        _q("2025-06-01T10:00:01Z", "mysql-bin.000001", 200, 2, "db0",
           "RENAME TABLE t1 TO t2, t3 TO t4"),
        _q("2025-06-01T10:00:02Z", "mysql-bin.000001", 300, 3, "db0",
           "ALTER TABLE t1 ADD COLUMN ok INT"),
    ]
    out = ddl_parse_anomalies(
        parse_ddl_statements(_parsed(spark, rows))
    ).collect()
    by_reason = {r.reason: r for r in out}
    assert len(out) == 2
    assert by_reason["UNPARSED_CLAUSE"].fragment == (
        "CONVERT TO CHARACTER SET utf8mb4"
    )
    assert by_reason["UNPARSED_RENAME_PAIR"].fragment == "t3 TO t4"


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
