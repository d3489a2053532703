"""Driver contract for the spark-graft builder (PySpark target).

Assembled automatically from the engine's query registry
(roborock_data_pipeline_spark.registry): every operator module
registers its queries + DuckDB oracles there; this file just exposes
them in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from roborock_data_pipeline_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_daily_summary — the reference's declared but
    never-implemented Daily_Summary) on /root/testdata/sf0.001."""
    from roborock_data_pipeline_spark.operators.aggregates import q_daily_summary

    return q_daily_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
