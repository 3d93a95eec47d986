"""Bench-methodology probe for the events incremental fold queries:
prewarm once (un-timed), then two timed passes; report first/best.
Usage: python scratch/r12/probe_events_folds.py [label]"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans import registry

NAMES = [
    "cdc_transactions_incremental",
    "events_funnel_incremental",
    "events_lifecycle_incremental",
]

label = sys.argv[1] if len(sys.argv) > 1 else "?"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("bench")
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
qs["cdc_summary"](spark, sf_dir).count()  # session warmup

for name in NAMES:
    qs[name](spark, sf_dir).count()  # prewarm
first, best = {}, {}
for i in range(2):
    for name in NAMES:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        if i == 0:
            first[name] = dt
        best[name] = min(best.get(name, 1e9), dt)
print(f"[{label}] first={first}")
print(f"[{label}] best={best}")
spark.stop()
