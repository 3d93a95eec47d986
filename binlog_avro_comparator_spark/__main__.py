"""CLI entry point -- the engine's equivalent of the reference's
./comparator.sh (E1) and ./compare_timestamps A B (E3).

  python -m binlog_avro_comparator_spark \
      --binlog-text DIR | --binlog-jsonl FILE | --binlog-binary DIR \
      --avro-jsonl FILE [--findings-out DIR] [--strict-parity]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="binlog_avro_comparator_spark",
        description="CDC consistency diff: binlog events vs Avro records",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--binlog-text", help="directory of parser-text binlog dumps")
    src.add_argument("--binlog-jsonl", help="binlog_metadata.json path")
    src.add_argument(
        "--binlog-binary",
        help="directory of raw mysql-bin.* binary logs (native v4 decode, "
        "no external parser binary)",
    )
    p.add_argument("--avro-jsonl", required=True, help="avro_rows.json path")
    p.add_argument("--findings-out", help="optional directory to write findings JSONL")
    p.add_argument(
        "--debug-log",
        help="optional directory for the debug_log.txt twin (the "
        "warn-and-skip channel as text lines, comparator.sh:32 parity)",
    )
    p.add_argument(
        "--payload-findings-out",
        help="binary-binlog path only: directory for column-level "
        "payload findings JSONL (row images vs avro payload.*)",
    )
    p.add_argument(
        "--skip-stats-out",
        help="binary-binlog path only: directory for per-file decoder "
        "skip counters JSONL (crc_failed, compressed_tx_skipped)",
    )
    p.add_argument(
        "--drift-out",
        help="binary-binlog path only: directory for mid-file "
        "TABLE_MAP schema-drift rows JSONL (DDL between transactions)",
    )
    p.add_argument(
        "--print-findings",
        action="store_true",
        help="stream per-discrepancy console lines in the reference's "
        "compare_timestamps output shape (E1 parity)",
    )
    p.add_argument("--tolerance-ms", type=int, default=100)
    p.add_argument(
        "--latency-report",
        action="store_true",
        help="additionally print the per-change-type replication-lag "
        "profile (n/min/max/mean/p50/p90/p99 ms) over matched pairs",
    )
    p.add_argument(
        "--strict-parity",
        action="store_true",
        help="reproduce the reference's dead-DELETE-inference quirk (Q1)",
    )
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)
    if (args.skip_stats_out or args.drift_out) and not args.binlog_binary:
        p.error("--skip-stats-out/--drift-out require --binlog-binary "
                "(decoder-level channels)")

    from .operators.compare import CompareConfig
    from .pipeline import format_report, run_comparison
    from .session import get_spark

    spark = get_spark("cdc-compare-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("WARN")
    try:
        res = run_comparison(
            spark,
            binlog_text_dir=args.binlog_text,
            binlog_jsonl=args.binlog_jsonl,
            binlog_binary_dir=args.binlog_binary,
            avro_jsonl=args.avro_jsonl,
            cfg=CompareConfig(
                tolerance_ms=args.tolerance_ms,
                strict_reference_parity=args.strict_parity,
            ),
        )
        if args.findings_out:
            res.findings.write.mode("overwrite").json(args.findings_out)
        if args.debug_log:
            from .pipeline import write_debug_log

            write_debug_log(res.debug_log, args.debug_log)
        if args.payload_findings_out:
            if res.payload_findings is None:
                p.error("--payload-findings-out requires --binlog-binary "
                        "(row images exist only in binary binlogs)")
            res.payload_findings.write.mode("overwrite").json(
                args.payload_findings_out
            )
        if args.skip_stats_out or args.drift_out:
            from .sources.binlog_binary import (
                read_binlog_schema_drift_dir,
                read_binlog_skip_stats_dir,
            )

            if args.skip_stats_out:
                read_binlog_skip_stats_dir(
                    spark, args.binlog_binary
                ).write.mode("overwrite").json(args.skip_stats_out)
            if args.drift_out:
                read_binlog_schema_drift_dir(
                    spark, args.binlog_binary
                ).write.mode("overwrite").json(args.drift_out)
        if args.print_findings:
            # toLocalIterator streams one sorted partition at a time --
            # the driver never holds the full findings set
            ordered = res.console.orderBy(
                "section", "line_ref", "key_file", "key_pos", "ord"
            )
            binlog_only_seen = False
            for row in ordered.toLocalIterator():
                if row.section == 1 and not binlog_only_seen:
                    print("\n--- Unmatched Binlog DML Events (BINLOG_ONLY) ---")
                    binlog_only_seen = True
                print(row.text)
            if not binlog_only_seen:
                print("\n--- Unmatched Binlog DML Events (BINLOG_ONLY) ---")
                print("No DML binlog events found without a matching Avro record.")
            print()
        if args.latency_report:
            print("--- Replication lag (matched pairs, ms) ---")
            for r in res.latency.orderBy("change_type").collect():
                print(
                    f"{r.change_type or '(none)'}: n={r.n} min={r.min_ms} "
                    f"max={r.max_ms} mean={r.mean_ms} p50={r.p50_ms} "
                    f"p90={r.p90_ms} p99={r.p99_ms}"
                )
            print()
        summary = res.summary.collect()[0]
        print(format_report(res))
        return 0 if summary.consistent else 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
