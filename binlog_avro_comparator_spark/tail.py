"""Binlog tail CLI: follow a rotating binlog directory as a structured
stream and append decoded contract rows to a parquet sink -- the
deployment form of the reference's shell loop (comparator.sh:85-100
re-lists and re-parses per run; this tails continuously with exactly-
once offsets).

  python -m binlog_avro_comparator_spark.tail \\
      --dir /var/lib/binlogs --format binary \\
      --out /data/cdc_rows --checkpoint /data/ckpt \\
      [--follow SECONDS] [--cpus 8]

Formats:
  binary  mysql-bin.NNNNNN v4 bytes via the ``binlogbin`` source --
          offset = (segment, event-boundary byte pos, decoder context),
          so a segment the server is still writing is consumed
          incrementally (the reference's `-offset` resume as a
          streaming offset; comparator.sh:93)
  text    parser-text segments via the ``binlogtext`` source --
          offset = (segment, byte pos, line count); emits raw
          (binlog_file, line_no, value) lines for the parse pipeline

Without ``--follow`` the run drains everything currently available
(Trigger.AvailableNow) and exits 0, printing ONE JSON summary line --
the cron-job shape, restart-safe through the checkpoint.  With
``--follow S`` it micro-batches every S seconds until interrupted --
the daemon shape.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="binlog_avro_comparator_spark.tail")
    p.add_argument("--dir", required=True, help="binlog directory to tail")
    p.add_argument("--format", choices=["binary", "text"], default="binary")
    p.add_argument("--out", required=True, help="parquet sink directory")
    p.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    p.add_argument(
        "--follow",
        type=float,
        default=None,
        metavar="SECONDS",
        help="keep tailing with a micro-batch every SECONDS "
        "(default: drain available data once and exit)",
    )
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    own_session = spark is None
    if own_session:
        from .session import get_spark

        spark = get_spark("binlog-tail", cpus=args.cpus)
        spark.sparkContext.setLogLevel("WARN")

    from .sources.pyds import (
        register_binlog_binary_source,
        register_binlog_text_source,
    )

    if args.format == "binary":
        register_binlog_binary_source(spark)
        stream = spark.readStream.format("binlogbin")
    else:
        register_binlog_text_source(spark)
        stream = spark.readStream.format("binlogtext")
    rows = stream.option("path", args.dir).load()

    writer = (
        rows.writeStream.format("parquet")
        .option("path", args.out)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")
    )
    if args.follow is None:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        q.stop()
        n = spark.read.parquet(args.out).count()
        print(
            json.dumps(
                {
                    "tail": args.dir,
                    "format": args.format,
                    "out": args.out,
                    "rows_total": n,
                }
            )
        )
        if own_session:
            spark.stop()
        return 0
    q = writer.trigger(processingTime=f"{args.follow} seconds").start()
    try:
        q.awaitTermination()
    except KeyboardInterrupt:  # clean daemon shutdown
        q.stop()
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
