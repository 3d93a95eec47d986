"""10x scale probe for the round-6 statistics/drift/IVM tier: warm
wall time at sf0.01 vs sf0.1 in one session (codegen paid first), the
sub-linearity evidence SCALE.md cites."""
import sys, time
sys.path.insert(0, "/root/repo")
from binlog_avro_comparator_spark.session import get_spark
from binlog_avro_comparator_spark.plans.registry import queries

NAMES = [
    "events_ab_test", "events_value_trend", "events_cusum_changepoints",
    "lineitem_basket_pairs", "gdpr_erasure_audit", "cdc_ivm_refresh",
    "customer_360_profile", "events_chi_square", "events_psi_drift",
    "events_ks_drift", "events_mad_anomalies", "events_twap_daily",
    "events_path_trigrams", "events_hll_rolling", "media_arrow_digest",
]

spark = get_spark("probe", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
qs = queries()
for name in NAMES:
    walls = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        qs[name](spark, sf).count()          # warm codegen + IO cache
        t = time.time()
        qs[name](spark, sf).count()
        walls[sf] = time.time() - t
    r = walls["/root/testdata/sf0.1"] / max(walls["/root/testdata/sf0.01"], 1e-9)
    print(f"{name}: {walls['/root/testdata/sf0.01']:.2f}s -> "
          f"{walls['/root/testdata/sf0.1']:.2f}s ratio {r:.1f}x")
