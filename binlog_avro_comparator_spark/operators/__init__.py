from .compare import (
    CompareConfig,
    prepare_binlog,
    prepare_avro,
    matched_pairs,
    avro_only,
    binlog_only,
    findings,
    summary,
)

__all__ = [
    "CompareConfig",
    "prepare_binlog",
    "prepare_avro",
    "matched_pairs",
    "avro_only",
    "binlog_only",
    "findings",
    "summary",
]
