import duckdb
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sf = "/root/testdata/sf0.001"
ev = spark.read.parquet(f"{sf}/events.parquet")

s = (ev.filter(F.col("event_id") < 5)
     .select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("sec"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("micro"),
        F.unix_millis(F.col("ts")).alias("ms"),
        F.expr("event_id div 4").alias("dv"),
        F.lpad((F.col("event_id") % 4).cast("string"), 6, "0").alias("pad"),
     ).orderBy("event_id").collect())
for r in s: print("SPARK", r.asDict())

d = duckdb.connect()
d.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
print(d.sql("""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') sec,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') micro,
       epoch_ms(ts) ms, event_id // 4 dv,
       lpad(CAST(event_id % 4 AS VARCHAR), 6, '0') pad
FROM events WHERE event_id < 5 ORDER BY event_id
""").df().to_string())

# hex -> int conversion in duckdb, md5 parity, list_cosine_similarity availability
print(d.sql("SELECT md5('hello') m, ('0x' || substr(md5('hello'),1,12))::BIGINT h").df().to_string())
try:
    print(d.sql("SELECT list_cosine_similarity([1.0,2.0],[2.0,3.0])").fetchone())
except Exception as e:
    print("no list_cosine_similarity:", e)
try:
    print(d.sql("SELECT list_reduce([1,2,3], (a,b) -> a*31+b)").fetchone())
except Exception as e:
    print("no list_reduce:", e)
print(d.sql("SELECT len(regexp_extract_all('ab 12 c!', '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) n").fetchone())

srow = spark.sql("SELECT md5('hello') m, conv(substr(md5('hello'),1,12),16,10) h, size(regexp_extract_all('ab 12 c!', '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) n").collect()
print("SPARK", srow)
spark.stop()
