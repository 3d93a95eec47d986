import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from pyspark.sql import functions as F, types as T
spark = get_spark("probe3")
spark.sparkContext.setLogLevel("ERROR")
from binlog_avro_comparator_spark.operators.ddl import (
    parse_ddl_statements, schema_column_types, alter_clauses,
)
STMTS = [
    "CREATE TABLE t (id INT, c1 SMALLINT)",
    "ALTER TABLE t MODIFY c1 DECIMAL(10,2) AFTER id",
    "ALTER TABLE t ADD COLUMN c2 INT FIRST",
]
rows = [
    (i + 1, "2025-06-01T10:00:%02dZ" % i, "mysql-bin.000001",
     100 * (i + 1), "db0", s)
    for i, s in enumerate(STMTS)
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
print("== clauses ==")
for r in alter_clauses(ddl).collect():
    print(f"  v? {r.clause_kind:14s} a={r.col_a} b={r.col_b} t={r.col_type} clause={r.clause!r}")
print("== type matrix all versions ==")
for r in sorted(schema_column_types(ddl).collect(), key=lambda r: (r.version, r.column_name)):
    print(f"  v{r.version} {r.column_name:4s} {r.column_type!r} narrow={r.is_narrowing}")
