"""Dump .explain('formatted') for named queries to plans/r11/<name>_<tag>.txt
and optionally time them with the noop sink (guide 1.4).

Usage: python scratch/r11opt/snap_plans.py <tag> <q1,q2,...> [--time]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r11"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    do_time = "--time" in sys.argv
    runs = int(os.environ.get("SNAP_RUNS", "3"))
    spark = get_spark("snap_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(f"{OUT}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        line = f"{name}: plan -> {OUT}/{name}_{tag}.txt"
        if do_time:
            spark.sparkContext.setJobDescription(f"noop:{name}")
            # prewarm once (codegen + fixture), then best + median of N
            df.write.format("noop").mode("overwrite").save()
            walls = []
            for _ in range(runs):
                # the fn call is INSIDE the timed region: fold/trainer
                # queries do eager work there (bench times it the same
                # way -- qs[name](spark, sf_dir).count() under one t0)
                t0 = time.time()
                d2 = qs[name](spark, SF_DIR)
                d2.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            walls.sort()
            line += f"  noop best={walls[0]:.3f}s med={walls[len(walls)//2]:.3f}s"
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
