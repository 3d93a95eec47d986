import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from pyspark.sql import functions as F, types as T

spark = get_spark("probe2")
spark.sparkContext.setLogLevel("ERROR")
from binlog_avro_comparator_spark.operators.ddl import (
    parse_ddl_statements, schema_column_types, schema_column_matrix,
    current_columns,
)

STMTS = [
    "CREATE TABLE t (id INT, c1 SMALLINT)",
    "ALTER TABLE t MODIFY c1 DECIMAL(10,2) AFTER id",    # placement
    "ALTER TABLE t ADD COLUMN c2 INT FIRST",             # placement
    "ALTER TABLE t ADD COLUMN c3 VARCHAR(5) AFTER c2",   # placement
    "TRUNCATE TABLE t",                                   # carry
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
print("=== type matrix (last version) ===")
ty = schema_column_types(ddl)
nv = ty.agg(F.max("version")).collect()[0][0]
for r in sorted(ty.filter(F.col("version") == nv).collect(),
                key=lambda r: r.column_name):
    print(f"  {r.column_name:6s} type={r.column_type!r} narrowing={r.is_narrowing}")
print("=== current columns ===")
print(sorted(r.column_name for r in current_columns(ddl).collect()))
