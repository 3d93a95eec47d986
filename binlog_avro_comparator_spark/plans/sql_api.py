"""Spark-SQL surface: the same engine, reachable with plain SQL.

``register_cdc_views`` materializes the prepared CDC frames as temp
views so analysts can run the diff as SQL; ``FINDINGS_SQL`` /
``SUMMARY_SQL`` are ready-made statements over those views (Spark SQL
dialect -- the DuckDB twins live in oracle.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..fixtures import derive_avro_rows, derive_binlog_events
from ..operators import compare as C
from ..sources import load_table


def register_cdc_views(spark: SparkSession, sf_dir: str) -> None:
    ev = load_table(spark, sf_dir, "events")
    binlog = derive_binlog_events(ev)
    avro = derive_avro_rows(ev)
    C.prepare_binlog(binlog).createOrReplaceTempView("binlog_prepared")
    C.prepare_avro(avro).createOrReplaceTempView("avro_prepared")
    C.diff_joined(
        C.prepare_binlog(binlog), C.prepare_avro(avro)
    ).createOrReplaceTempView("cdc_diff")


FINDINGS_SQL = """
SELECT 'TIMESTAMP_MISMATCH' AS kind, binlog_file, binlog_position,
       concat('avro_ms=', source_timestamp, ' binlog_ms=', binlog_ms) AS detail
FROM cdc_diff
WHERE __has_avro IS NOT NULL AND __has_binlog IS NOT NULL
  AND binlog_ms IS NOT NULL AND ts_mismatch
UNION ALL
SELECT 'AVRO_ONLY_BINLOG_KEY', binlog_file, binlog_position,
       concat('db=', coalesce(database, ''), ' table=', coalesce(table, ''))
FROM cdc_diff WHERE __has_binlog IS NULL
UNION ALL
SELECT 'BINLOG_ONLY_DML', binlog_file, binlog_position,
       concat('event=', event_type)
FROM cdc_diff
WHERE __has_avro IS NULL AND event_type LIKE '%RowsEventV2'
"""

SUMMARY_SQL = """
SELECT
  sum(CASE WHEN __has_avro IS NOT NULL AND __has_binlog IS NOT NULL THEN 1 ELSE 0 END) AS matched,
  sum(CASE WHEN __has_avro IS NOT NULL AND __has_binlog IS NOT NULL AND ts_mismatch THEN 1 ELSE 0 END) AS ts_mismatches,
  sum(CASE WHEN __has_binlog IS NULL THEN 1 ELSE 0 END) AS avro_only,
  sum(CASE WHEN __has_avro IS NULL AND event_type LIKE '%RowsEventV2' THEN 1 ELSE 0 END) AS binlog_only
FROM cdc_diff
"""

LATENCY_SQL = """
SELECT change_type, count(*) AS n,
       min(ts_delta_ms) AS min_ms,
       max(ts_delta_ms) AS max_ms,
       round(CAST(sum(ts_delta_ms) AS DOUBLE) / count(*), 6) AS mean_ms,
       percentile(ts_delta_ms, 0.5) AS p50_ms,
       percentile(ts_delta_ms, 0.9) AS p90_ms,
       percentile(ts_delta_ms, 0.99) AS p99_ms
FROM cdc_diff
WHERE __has_avro IS NOT NULL AND __has_binlog IS NOT NULL
  AND binlog_ms IS NOT NULL
GROUP BY change_type
"""
