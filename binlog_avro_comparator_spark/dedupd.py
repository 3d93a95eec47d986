"""Incremental near-dup daemon CLI: tail a growing documents directory
and maintain the MinHash-LSH (and optionally SimHash) index + verified
pair logs -- the deployment form of the corpus near-dup tier, so a
100 TB corpus is LSHed by arrival instead of re-scanned per ingest
(streaming/fold_sinks.maintain_lsh_index / maintain_simhash_index).

  python -m binlog_avro_comparator_spark.dedupd \\
      --dir /data/docs --state /data/dedup_state \\
      --checkpoint /data/dedup_ckpt \\
      [--method minhash|simhash|both] [--bands 4 --rows 4] \\
      [--max-hamming 3] [--compact] [--follow SECONDS] [--cpus 8]

The input directory holds parquet files with the documents contract
(doc_id long, text string, lang string, source string, n_chars long);
new files are new corpus arrivals.  State layout per method (under
``{state}/{method}``): ``bands/`` the banded index log, ``pairs/``
the disjoint per-batch pair logs (plain-union read; SimHash pairs are
hamming-VERIFIED at probe time).  ``--compact`` folds the per-trigger
log dirs into single segments after the drain (crash-safe manifest
protocol, see fold_sinks.compact_log_batches) -- the small-files
hygiene a per-minute trigger needs.

Without ``--follow`` the run drains everything currently available
(Trigger.AvailableNow) and exits 0 printing ONE JSON summary line --
the cron shape, restart-safe through the checkpoint (committed batches
replay as no-ops).  With ``--follow S`` it micro-batches every S
seconds until interrupted -- the daemon shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="binlog_avro_comparator_spark.dedupd")
    p.add_argument("--dir", required=True, help="documents directory to tail")
    p.add_argument("--state", required=True, help="index state directory")
    p.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    p.add_argument(
        "--method", choices=["minhash", "simhash", "both"], default="minhash"
    )
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--rows", type=int, default=4)
    p.add_argument("--max-hamming", type=int, default=3)
    p.add_argument(
        "--compact",
        action="store_true",
        help="fold per-trigger log dirs into single segments after the drain",
    )
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

        spark = get_spark("dedupd", cpus=args.cpus)
        spark.sparkContext.setLogLevel("WARN")

    from .streaming.fold_sinks import (
        commit_lsh_batch,
        commit_simhash_batch,
        compact_log_batches,
        read_lsh_pairs,
        read_simhash_pairs,
    )

    methods = (
        ["minhash", "simhash"] if args.method == "both" else [args.method]
    )

    def fold(batch_df, batch_id: int) -> None:
        # one stream, one checkpoint: both indexes advance from the
        # same micro-batch, so their pair logs stay replay-consistent
        if "minhash" in methods:
            commit_lsh_batch(
                spark,
                os.path.join(args.state, "minhash"),
                batch_df,
                batch_id,
                args.bands,
                args.rows,
            )
        if "simhash" in methods:
            commit_simhash_batch(
                spark,
                os.path.join(args.state, "simhash"),
                batch_df,
                batch_id,
                args.max_hamming,
            )

    stream = spark.readStream.schema(_DOCS_SCHEMA).parquet(args.dir)
    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", args.checkpoint
    )
    if args.follow is not None:
        q = writer.trigger(processingTime=f"{args.follow} seconds").start()
        try:
            q.awaitTermination()
        except KeyboardInterrupt:  # clean daemon shutdown
            q.stop()
        if own_session:
            spark.stop()
        return 0
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    q.stop()
    summary: dict = {"dir": args.dir, "state": args.state, "pairs": {}}
    for m in methods:
        mstate = os.path.join(args.state, m)
        if args.compact:
            for sub in ("bands", "pairs"):
                compact_log_batches(spark, mstate, sub)
        reader = read_lsh_pairs if m == "minhash" else read_simhash_pairs
        summary["pairs"][m] = reader(spark, mstate).count()
    print(json.dumps(summary))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
