"""E2-equivalent CLI: .avro directory -> one union-wrapped JSON-lines
file, replacing the reference's per-file ``avro-tools tojson`` loop
(avro_to_json.sh:52-70) with one distributed scan + coalesced write.

  python -m binlog_avro_comparator_spark.avro2json \\
      --avro-dir DIR --out avro_rows.json [--cpus 8]

Uses whichever avro engine the session has (spark-avro, else the
pure-Python codec); output lines carry the same ["null", X] union
wrappers avro-tools emits, so the file is drop-in input for the
comparator's --avro-jsonl (and for the reference's own Go comparer).
The reference appends per-file sequentially; here the distributed scan
writes part files that are concatenated into the single output the
downstream contract expects (driver-side, streaming copy -- bounded
memory).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="binlog_avro_comparator_spark.avro2json")
    p.add_argument("--avro-dir", required=True, help="directory of .avro files")
    p.add_argument("--out", required=True, help="output JSON-lines file")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from .session import get_spark
    from .sources.avro import read_avro_dir
    from .sources.jsonl import wrap_avro

    owns_session = spark is None
    if owns_session:
        spark = get_spark("avro2json", cpus=args.cpus)
        spark.sparkContext.setLogLevel("WARN")
    try:
        flat = read_avro_dir(spark, args.avro_dir)
        tmp = tempfile.mkdtemp(prefix="avro2json_")
        wrap_avro(flat).write.mode("overwrite").json(tmp)
        n_lines = 0
        with open(args.out, "wb") as out:
            for part in sorted(glob.glob(os.path.join(tmp, "part-*"))):
                with open(part, "rb") as fh:
                    for line in fh:
                        if line.strip():
                            out.write(line)
                            n_lines += 1
        shutil.rmtree(tmp, ignore_errors=True)
        print(json.dumps({"records": n_lines, "out": args.out}))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
