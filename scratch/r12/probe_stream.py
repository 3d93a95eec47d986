"""Isolated bench-methodology walls for the streaming replay tier
(round-12 item 1): prewarm pass (fixture builds / session caches, the
bench discipline) then two measured passes per registered query.
Usage: python scratch/r12/probe_stream.py [names...]"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans import registry

NAMES = sys.argv[1:] or [
    "cdc_schema_timeline_stream",
    "cdc_schema_columns_stream",
    "cdc_schema_types_stream",
    "cdc_payload_diff_guarded_stream",
    "cdc_schema_vs_lake_stream",
    "cdc_schema_vs_lake_live",
    "cdc_schema_timeline_asof",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_stream")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    qs["cdc_summary"](spark, sf_dir).count()  # JVM warm
    out = {}
    for name in NAMES:
        spark.sparkContext.setJobDescription(f"prewarm:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        warm = time.time() - t0
        runs = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"run{i}:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"prewarm": round(warm, 3), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
