"""CLI entry point -- the engine's equivalent of the reference's
./comparator.sh (E1) and ./compare_timestamps A B (E3).

  python -m binlog_avro_comparator_spark \
      --binlog-text DIR | --binlog-jsonl FILE \
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
    p.add_argument("--avro-jsonl", required=True, help="avro_rows.json path")
    p.add_argument("--findings-out", help="optional directory to write findings JSONL")
    p.add_argument("--tolerance-ms", type=int, default=100)
    p.add_argument(
        "--strict-parity",
        action="store_true",
        help="reproduce the reference's dead-DELETE-inference quirk (Q1)",
    )
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

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
            avro_jsonl=args.avro_jsonl,
            cfg=CompareConfig(
                tolerance_ms=args.tolerance_ms,
                strict_reference_parity=args.strict_parity,
            ),
        )
        if args.findings_out:
            res.findings.write.mode("overwrite").json(args.findings_out)
        summary = res.summary.collect()[0]
        print(format_report(res))
        return 0 if summary.consistent else 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
