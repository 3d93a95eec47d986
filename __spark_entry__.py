"""Driver contract for the spark-graft builder (PySpark target).

Delegates to binlog_avro_comparator_spark.plans.registry; see
SURVEY.md section 2 for the operator inventory each query covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binlog_avro_comparator_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC consistency diff (findings DataFrame) on sf0.001."""
    return _registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
