"""Adversarial DDL probe: statements the fixture does not plant.
For each, the discipline is NEVER-SILENT: a statement must yield
frame rows, an anomaly row, or (non-DDL) be out of scope."""
import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from pyspark.sql import functions as F, types as T

spark = get_spark("probe")
spark.sparkContext.setLogLevel("ERROR")
from binlog_avro_comparator_spark.operators.ddl import (
    parse_ddl_statements, ddl_parse_anomalies, alter_clauses,
    schema_column_matrix,
)

CASES = [
    # (statement, why)
    ("CREATE TABLE t9 (\n  id INT,\n  name VARCHAR(10)\n)", "multi-line CREATE"),
    ("ALTER TABLE t9 ADD COLUMN c9 INT COMMENT 'rename to x'", "literal bait"),
    ("ALTER TABLE t9 ADD COLUMN IF NOT EXISTS c10 INT", "IF NOT EXISTS col"),
    ("DROP TABLE a b", "dropped garbage list"),
    ("RENAME TABLE t9 TO", "truncated rename"),
    ("ALTER TABLE `weird name` ADD COLUMN x INT", "backtick space name"),
    ("ALTER TABLE t9 PARTITION BY HASH(id) PARTITIONS 4", "repartition"),
    ("TRUNCATE TABLE `a b`", "backtick-space truncate"),
    ("OPTIMIZE NO_WRITE_TO_BINLOG TABLE t9", "maint modifier"),
    ("CREATE TABLE IF NOT EXISTS t10 LIKE t9", "create like"),
    ("ALTER TABLE t9 ADD (p INT, q VARCHAR(3), KEY kx (p))", "paren w/ key"),
    ("alter table t9 rename to t9x, algorithm=inplace", "rename+option"),
    ("ALTER TABLE t9 DROP COLUMN `c9`", "backticked col"),
    ("CREATE INDEX ix ON t9 (id DESC)", "index desc"),
    ("DROP INDEX `ix` ON `t9`", "backticked drop index"),
    ("ALTER TABLE t9 MODIFY c1 DECIMAL(10,2) AFTER c0", "AFTER placement"),
]
rows = [
    (i + 1, "2025-06-01T10:00:%02dZ" % i, "mysql-bin.000001", 100 * (i + 1),
     "db0", s)
    for i, (s, _) in enumerate(CASES)
]
schema = T.StructType([
    T.StructField("line_no", T.LongType()),
    T.StructField("vts", T.StringType()),
    T.StructField("binlog_file", T.StringType()),
    T.StructField("log_position", T.LongType()),
    T.StructField("schema", T.StringType()),
    T.StructField("stmt", T.StringType()),
])
parsed = spark.createDataFrame(rows, schema).select(
    F.lit("Query").alias("event_type"),
    F.to_timestamp("vts").alias("timestamp"),
    "binlog_file", "log_position", "line_no", "schema",
    F.create_map(F.lit("query"), F.col("stmt")).alias("extra"),
)
ddl = parse_ddl_statements(parsed)
anom = ddl_parse_anomalies(ddl)
got_frame = {r.statement for r in ddl.collect()}
got_anom = {r.fragment for r in anom.collect()}
anom_stmts = set()
for r in anom.collect():
    anom_stmts.add((r.reason, r.fragment))
print("=== frame rows ===")
for r in ddl.collect():
    print(f"  {r.ddl_kind:12s} {r.schema_name}.{r.table_name} <- {r.statement[:60]!r}")
print("=== anomalies ===")
for r in sorted(anom_stmts):
    print(f"  {r[0]:24s} {r[1][:60]!r}")
print("=== silence check ===")
silent = []
for s, why in CASES:
    in_frame = any(s == fs for fs in got_frame)
    in_anom = any(s[:25] in str(a) or str(a)[:20] in s for _, a in anom_stmts)
    if not in_frame and not in_anom:
        silent.append((s, why))
for s, why in silent:
    print(f"  SILENT: [{why}] {s!r}")
print("silent count:", len(silent))
