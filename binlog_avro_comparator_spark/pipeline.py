"""E1/E3-equivalent orchestration (SURVEY.md section 3).

The reference's comparator.sh chains three processes through files;
here the whole flow is one lazy Spark plan: read -> parse -> prepare ->
join -> compare -> findings/summary.  The intermediate JSONL file of
the reference becomes an *optional* materialization (resume point /
debugging), not a requirement.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators import compare as C
from .operators.parse import parse_binlog_text
from .sources.binlog_text import read_parser_text
from .sources.jsonl import (
    read_avro_jsonl,
    read_binlog_jsonl_ordered,
    unwrap_avro,
)


@dataclass
class ComparisonResult:
    findings: DataFrame
    summary: DataFrame


def run_comparison(
    spark: SparkSession,
    *,
    binlog_text_dir: str | None = None,
    binlog_jsonl: str | None = None,
    avro_jsonl: str,
    cfg: C.CompareConfig = C.CompareConfig(),
    materialize_binlog_jsonl: str | None = None,
) -> ComparisonResult:
    """Full pipeline from raw inputs to findings + summary.

    Binlog side comes from either raw parser text (E1: stages S1-S4 +
    P1-P9) or pre-normalized JSONL (E3: S7).  Avro side is the
    union-wrapped JSONL (S8 + R1).
    """
    if (binlog_text_dir is None) == (binlog_jsonl is None):
        raise ValueError("provide exactly one of binlog_text_dir / binlog_jsonl")

    if binlog_text_dir is not None:
        binlog = parse_binlog_text(read_parser_text(spark, binlog_text_dir)).drop(
            "extra", "orignal_commmit_timestamp"
        )
        if materialize_binlog_jsonl:
            binlog.write.mode("overwrite").json(materialize_binlog_jsonl)
            binlog = spark.read.json(materialize_binlog_jsonl)
    else:
        # ordered reader: line_no is a real per-file ordinal, so the
        # last-write-wins dedup resolves duplicate keys to the same row
        # as the reference's sequential map overwrite (go:118,147).
        # (log_position is constant within a (file, position) dedup
        # partition, so it could never order the window.)
        raw = read_binlog_jsonl_ordered(spark, binlog_jsonl)
        binlog = raw.filter(raw["_corrupt_record"].isNull()).drop(
            "_corrupt_record", "orignal_commmit_timestamp"
        )

    araw = read_avro_jsonl(spark, avro_jsonl).cache()
    avro = unwrap_avro(araw.filter(araw["_corrupt_record"].isNull()))

    bp = C.prepare_binlog(binlog)
    ap = C.prepare_avro(avro)
    # summary's total_avro_records counts the RAW input including
    # malformed lines (compare_timestamps.go:169,280 counts every line),
    # hence araw (pre-corrupt-filter), not the unwrapped frame
    return ComparisonResult(
        findings=C.findings_onepass(bp, ap, cfg),
        summary=C.summary_onepass(araw, bp, ap, cfg),
    )


def format_report(result: ComparisonResult) -> str:
    """S10-style console report (the DataFrames remain the real API)."""
    s = result.summary.collect()[0]
    lines = [
        "--- Comparison Summary ---",
        f"Total Avro Records Processed: {s.total_avro_records}",
        f"Total Matched by Binlog Key: {s.matched}",
        f"Total Timestamp Mismatches (within matched set): {s.ts_mismatches}",
        f"Avro Records with no Binlog Event match (by key): {s.avro_only}",
        f"Binlog DML Events with no Avro Record match (by key): {s.binlog_only}",
        "",
        (
            "CONCLUSION: All Avro records have matching binlog events, and "
            "timestamps/metadata are consistent."
            if s.consistent
            else "CONCLUSION: WARNING - There were discrepancies found during comparison."
        ),
    ]
    return "\n".join(lines)
