import sys, time, tempfile, os
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.sources import load_table
from binlog_avro_comparator_spark.fixtures import generate_ddl_text_lines
from binlog_avro_comparator_spark.operators.parse import parse_binlog_text
from binlog_avro_comparator_spark.operators.ddl import (
    parse_ddl_statements, schema_timeline, schema_column_matrix,
    schema_column_types, ddl_drift_window_columns, ddl_parse_anomalies)

SF = "/root/testdata/sf0.1"
spark = get_spark("exp")
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
lines = generate_ddl_text_lines(load_table(spark, SF, "events"))
stmts = parse_ddl_statements(parse_binlog_text(lines))
cur = stmts.repartition(8, "schema_name", "table_name").persist()
n = cur.count()
print(f"statements build+persist: {time.time()-t0:.2f}s rows={n}", flush=True)

d = tempfile.mkdtemp()
t0 = time.time()
cur.write.parquet(os.path.join(d, "s"))
trunc = spark.read.parquet(os.path.join(d, "s")).repartition(8, "schema_name", "table_name").persist()
trunc.count()
print(f"parquet roundtrip: {time.time()-t0:.2f}s", flush=True)

views = [("timeline", schema_timeline), ("matrix", schema_column_matrix),
         ("types", schema_column_types), ("window_columns", ddl_drift_window_columns),
         ("anomalies", ddl_parse_anomalies)]
for tag, frame in (("CURRENT(lineage)", cur), ("TRUNCATED(parquet)", trunc)):
    for name, fn in views:
        t0 = time.time()
        fn(frame.select("*")).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        fn(frame.select("*")).write.format("noop").mode("overwrite").save()
        print(f"{tag:20s} {name:15s} run1={t1-t0:6.2f}s run2={time.time()-t1:6.2f}s", flush=True)
spark.stop()
