"""Feed-health monitor CLI: run the statistical gate battery over an
events parquet from the shell -- the nightly job a data platform
schedules in front of training/reporting consumers.

  python -m binlog_avro_comparator_spark.monitor \\
      --events /path/events.parquet --cutoff 2024-01-16 \\
      [--psi-alert 0.2] [--ks-alert 0.2] [--cpus 8]

Gates (each an oracle-verified operator):
  psi        population stability index, reference deciles frozen from
             the pre-cutoff slice (analytics.psi_drift_report)
  ks         per-type two-sample KS over the HDR bucket sketch
             (analytics.ks_drift_report)
  anomalies  per-type z-score outlier counts (analytics.value_anomalies)
  bursts     minute-rate spikes (analytics.burst_minutes)
  cusum      per-type level-shift change points
             (analytics.cusum_changepoints)

Prints ONE JSON line per gate plus a final verdict line; exit 0 when
every alert threshold holds, 3 when any gate trips (the comparator
CLI's 0/2 convention, one code up so wrappers can tell the two apart).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="binlog_avro_comparator_spark.monitor")
    p.add_argument("--events", required=True, help="events parquet path")
    p.add_argument("--cutoff", default="2024-01-16", help="reference/current split")
    p.add_argument("--psi-alert", type=float, default=0.2)
    p.add_argument("--ks-alert", type=float, default=0.2)
    p.add_argument("--max-anomaly-rate", type=float, default=0.01)
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.analytics import (
        burst_minutes,
        cusum_changepoints,
        ks_drift_report,
        psi_drift_report,
        value_anomalies,
    )

    own_session = spark is None
    if own_session:
        from .session import get_spark

        spark = get_spark("feed-monitor", cpus=args.cpus)
        spark.sparkContext.setLogLevel("ERROR")
    try:
        ev = spark.read.parquet(args.events)
        tripped = []

        psi = psi_drift_report(ev, cutoff=args.cutoff).collect()
        psi_total = psi[0].psi_total if psi else 0.0
        print(json.dumps({"gate": "psi", "psi_total": psi_total,
                          "alert": psi_total > args.psi_alert}))
        if psi_total > args.psi_alert:
            tripped.append("psi")

        ks = ks_drift_report(ev, cutoff=args.cutoff).collect()
        worst = max((r.ks_stat for r in ks), default=0.0)
        print(json.dumps({"gate": "ks", "worst_ks": worst,
                          "per_type": {r.event_type: r.ks_stat for r in ks},
                          "alert": worst > args.ks_alert}))
        if worst > args.ks_alert:
            tripped.append("ks")

        an = value_anomalies(ev).agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_anomaly").cast("int")).alias("bad"),
        ).collect()[0]
        rate = (an.bad or 0) / an.n if an.n else 0.0
        print(json.dumps({"gate": "anomalies", "n": an.n,
                          "n_anomalies": int(an.bad or 0),
                          "rate": round(rate, 6),
                          "alert": rate > args.max_anomaly_rate}))
        if rate > args.max_anomaly_rate:
            tripped.append("anomalies")

        bursts = burst_minutes(ev).filter(F.col("is_burst")).count()
        print(json.dumps({"gate": "bursts", "n_burst_minutes": bursts,
                          "alert": False}))  # informational

        cps = cusum_changepoints(ev).collect()
        print(json.dumps({"gate": "cusum", "change_points": {
            r.event_type: r.change_minute for r in cps}, "alert": False}))

        print(json.dumps({"verdict": "ALERT" if tripped else "HEALTHY",
                          "tripped": tripped}))
        return 3 if tripped else 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
