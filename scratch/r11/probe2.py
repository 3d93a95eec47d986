"""Adversarial DDL probe #2 (session continuation): statements the
current grammar may still miss entirely (not even an anomaly)."""
from pyspark.sql import SparkSession, functions as F
from binlog_avro_comparator_spark.operators import ddl as D

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

STMTS = [
    "TRUNCATE TABLE orders",
    "TRUNCATE orders",
    "CREATE INDEX idx_a ON orders (o_custkey)",
    "DROP INDEX idx_a ON orders",
    "CREATE UNIQUE INDEX u1 ON db2.orders (a, b)",
    "ALTER TABLE t ADD COLUMN c INT GENERATED ALWAYS AS (a+b) STORED",
    "ALTER TABLE t ADD COLUMN c INT AS (substr(x,1,3)) VIRTUAL",
    "ALTER TABLE t ADD COLUMN c INT FIRST",
    "ALTER TABLE t ADD COLUMN c INT AFTER b",
    "CREATE TABLE t2 AS SELECT a, b FROM t",
    "ALTER TABLE t ADD CONSTRAINT fk1 FOREIGN KEY (a) REFERENCES p(id)",
    "ALTER TABLE t DROP FOREIGN KEY fk1",
    "ALTER TABLE t DROP PRIMARY KEY",
    "ALTER TABLE t ADD COLUMN `c` DECIMAL(10,2) NOT NULL DEFAULT '0.00', ALGORITHM=INPLACE",
    "OPTIMIZE TABLE orders",
    "ANALYZE TABLE orders",
    "RENAME TABLE a TO b, b2 TO c2",
]

rows = [
    (f"2024-01-01 00:00:{i:02d}", "f1", 100 + i, i, "db1", "Query", {"query": s})
    for i, s in enumerate(STMTS)
]
parsed = spark.createDataFrame(
    rows,
    "timestamp string, binlog_file string, log_position long, line_no long,"
    " schema string, event_type string, extra map<string,string>",
)

d = D.parse_ddl_statements(parsed)
print("== parse_ddl_statements ==")
for r in d.orderBy("line_no", "pair_no").collect():
    print(r["line_no"], r["ddl_kind"], r["schema_name"], r["table_name"],
          "->", r["new_table_name"], "|", (r["statement"] or "")[:60])

print("\n== alter_clauses ==")
for r in D.alter_clauses(d).orderBy("line_no", "clause_no", "col_no").collect():
    print(r["line_no"], r["clause_kind"], r["col_a"], r["col_b"],
          r["col_type"], "|", r["clause"][:60])

print("\n== anomalies ==")
for r in D.ddl_parse_anomalies(d).orderBy("log_position").collect():
    print(r["log_position"], r["reason"], "|", (r["fragment"] or "")[:70])

seen = set(r["line_no"] for r in d.collect())
silent = [i for i in range(len(STMTS)) if i not in seen]
print("\nstatements with NO frame row (check anomaly channel):", silent)
for i in silent:
    print("  ", i, STMTS[i])
spark.stop()
