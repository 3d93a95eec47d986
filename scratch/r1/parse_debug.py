import sys
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("dbg", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
df = spark.createDataFrame([("x",)], "v string")
tests = [
    ("opt-frac full", F.try_to_timestamp(F.lit("2025-06-01T12:00:00.123456Z"), F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]'Z'"))),
    ("opt-frac 3", F.try_to_timestamp(F.lit("2025-06-01T12:00:00.123Z"), F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]'Z'"))),
    ("opt-frac none", F.try_to_timestamp(F.lit("2025-06-01T12:00:00Z"), F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]'Z'"))),
    ("mst", F.try_to_timestamp(F.lit("2025-06-01 12:00:00.123456 +0200"), F.lit("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S] XX"))),
    ("mst nofrac", F.try_to_timestamp(F.lit("2025-06-01 12:00:00 +0000"), F.lit("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S] XX"))),
    ("backref", F.regexp_replace(F.lit("2025-06-01T12:00:00.123456789Z"), r"(\.\d{6})\d+", r"$1")),
    ("emptymap", F.expr("cast(map() as map<string,string>)")),
]
out = df.select(*[t[1].alias(t[0].replace(" ","_")) for t in tests]).collect()[0]
for (name,_), v in zip(tests, out):
    print(f"{name}: {v!r}")
spark.stop()
