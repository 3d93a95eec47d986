"""The Spark-SQL surface produces the same answers as the DataFrame API."""

from __future__ import annotations

from binlog_avro_comparator_spark.plans import registry
from binlog_avro_comparator_spark.plans.sql_api import (
    FINDINGS_SQL,
    SUMMARY_SQL,
    register_cdc_views,
)

SF = "/root/testdata/sf0.001"


def test_sql_summary_matches_dataframe_api(spark):
    register_cdc_views(spark, SF)
    sql_row = spark.sql(SUMMARY_SQL).collect()[0]
    df_row = registry.queries()["cdc_summary"](spark, SF).collect()[0]
    assert sql_row.matched == df_row.matched
    assert sql_row.ts_mismatches == df_row.ts_mismatches
    assert sql_row.avro_only == df_row.avro_only
    assert sql_row.binlog_only == df_row.binlog_only


def test_sql_findings_counts(spark):
    register_cdc_views(spark, SF)
    sql_kinds = {
        r.kind: r.n
        for r in spark.sql(
            f"SELECT kind, count(*) n FROM ({FINDINGS_SQL}) GROUP BY kind"
        ).collect()
    }
    df_kinds = {
        r.kind: r.n
        for r in registry.queries()["cdc_findings"](spark, SF)
        .groupBy("kind")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for kind in ("TIMESTAMP_MISMATCH", "AVRO_ONLY_BINLOG_KEY", "BINLOG_ONLY_DML"):
        assert sql_kinds[kind] == df_kinds[kind], kind
