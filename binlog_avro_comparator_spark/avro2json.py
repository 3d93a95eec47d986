"""E2-equivalent CLI: .avro directory -> one union-wrapped JSON-lines
file, replacing the reference's per-file ``avro-tools tojson`` loop
(avro_to_json.sh:52-70).

  python -m binlog_avro_comparator_spark.avro2json \\
      --avro-dir DIR --out avro_rows.json [--cpus 8]

Structural parity with avro-tools' output: null union branches emit as
literal ``null`` (not zero-value wrappers), populated branches as
``{"string": v}`` / ``{"long": v}`` / ``{"boolean": v}``, all ten
source_metadata fields present in schema order, and records appear in
the reference's sequential order -- files by name, records by their
position within each file (the decode itself is distributed; only the
final ordered write streams through the driver, line by line, bounded
memory).  Whitespace differs from avro-tools (compact vs spaced);
every JSON consumer, including the reference's Go comparer, is
whitespace-insensitive.
"""

from __future__ import annotations

import argparse
import json
import sys


def _wrapped_line(F):
    """Union-wrapped JSON object column from the NESTED avro frame --
    null branches stay null (to_json keeps them via ignoreNullFields
    off), so the null-vs-present distinction survives."""

    def w(field: str, key: str):
        c = F.col(f"source_metadata.{field}")
        return F.when(c.isNotNull(), F.struct(c.alias(key))).alias(field)

    obj = F.struct(
        F.col("source_timestamp"),
        F.struct(
            F.col("source_metadata.database").alias("database"),
            F.col("source_metadata.table").alias("table"),
            w("change_type", "string"),
            w("gtid", "string"),
            w("datastream_master_server_uuid", "string"),
            w("datastream_master_server_id", "long"),
            w("binlog_file", "string"),
            w("binlog_position", "long"),
            w("is_deleted", "boolean"),
            F.col("source_metadata.primary_keys").alias("primary_keys"),
        ).alias("source_metadata"),
    )
    return F.to_json(obj, {"ignoreNullFields": "false"})


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="binlog_avro_comparator_spark.avro2json")
    p.add_argument("--avro-dir", required=True, help="directory of .avro files")
    p.add_argument("--out", required=True, help="output JSON-lines file")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .session import get_spark
    from .sources.avro import read_avro_python

    owns_session = spark is None
    if owns_session:
        spark = get_spark("avro2json", cpus=args.cpus)
        spark.sparkContext.setLogLevel("WARN")
    try:
        # the pure-Python engine regardless of spark-avro presence: it
        # is the one that can carry exact (file, position) lineage, and
        # E2's contract is the reference's sequential order
        nested = read_avro_python(spark, args.avro_dir, with_lineage=True)
        lines = nested.select(
            "__file", "__pos", _wrapped_line(F).alias("line")
        ).orderBy("__file", "__pos")
        n_lines = 0
        with open(args.out, "w", encoding="utf-8") as out:
            for row in lines.toLocalIterator():
                out.write(row.line)
                out.write("\n")
                n_lines += 1
        print(json.dumps({"records": n_lines, "out": args.out}))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
