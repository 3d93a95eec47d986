from pyspark.sql import SparkSession, functions as F, types as T
# vanilla session: no nanosAsLong
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
p = "/root/testdata/sf0.001/events.parquet"
# attempt 1: explicit schema with LongType for ts
sch = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])
try:
    df = spark.read.schema(sch).parquet(p)
    print("schema-long OK:", df.select(F.max("ts")).collect())
except Exception as e:
    print("schema-long FAIL:", str(e)[:200])
# attempt 2: explicit schema with TimestampType
sch2 = sch.add if False else T.StructType([f if f.name!="ts" else T.StructField("ts", T.TimestampType()) for f in sch.fields])
try:
    df = spark.read.schema(sch2).parquet(p)
    print("schema-ts OK:", df.select(F.max("ts")).collect())
except Exception as e:
    print("schema-ts FAIL:", str(e)[:200])
spark.stop()
