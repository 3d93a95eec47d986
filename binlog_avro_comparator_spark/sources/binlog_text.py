"""Binlog parser-text source (SURVEY.md S1-S4).

The reference iterates `mysql-bin.*` files in version order and pipes
each through the text parser, stamping every record with the source
file's basename (comparator.sh:85-100; json_parser.go:21-24).  Spark
scans are unordered, so BOTH the file identity and the line order must
become data: we read each file whole (``wholetext``), stamp the
basename from ``input_file_name`` (S4), and derive an exact per-file
``line_no`` with ``posexplode`` over the split lines.

Scale note: event assembly (P4) windows over one file at a time, so a
file is inherently a sequential unit -- parallelism is across files,
which wholetext preserves (one task per file).  A 4 GiB text dump per
task is the practical bound; beyond that the right move is splitting
binlogs upstream (MySQL already rotates them), not a smarter reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_parser_text(spark: SparkSession, path: str) -> DataFrame:
    """dir-or-glob -> (binlog_file, line_no, value), line_no 1-based."""
    raw = spark.read.text(path, wholetext=True)
    lines = raw.select(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.txt)?$", 1).alias(
            "binlog_file"
        ),
        F.posexplode(F.split(F.col("value"), "\n")).alias("idx", "value"),
    )
    return lines.select(
        "binlog_file",
        (F.col("idx") + 1).alias("line_no"),
        F.col("value"),
    )
