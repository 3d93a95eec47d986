"""Round-6 probe: k-means ASSIGNMENT cost vs k for the two engines on
a 100k x 64 synthetic corpus (sf0.1 embeddings are too small to show
scaling).  JVM broadcast-crossJoin expands rows k-fold -> cost grows
~linearly in k; the GEMM path is one matmul per Arrow batch ->
near-flat until k*dim outgrows cache."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators.similarity import kmeans_assignments

spark = get_spark("probe", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.range(100_000).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.sin(F.col("id") * (i + 1) * 0.37),
    ).cast("array<float>").alias("embedding"),
).cache()
emb.count()
for engine, thr in (("jvm", 10**9), ("gemm", 0)):
    for k in (8, 64, 256):
        t0 = time.time()
        n = kmeans_assignments(emb, k=k, n_iter=1, stride=97,
                               gemm_threshold=thr).count()
        print(f"{engine} k={k}: {time.time()-t0:.2f}s ({n} rows)", flush=True)
spark.stop()
