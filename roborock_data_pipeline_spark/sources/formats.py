"""Multi-format source/sink support (SURVEY §2.A breadth).

The reference reads one source (cloud API) and writes one sink
(Sheets). An engine must speak the warehouse formats: parquet is the
default (columnar, predicate pushdown, column pruning); CSV and JSON
are supported for ingest/interchange — always with explicit schemas
(schema inference is a full extra pass over 100 TB, and silently
wrong on empty partitions).

Also here: the date-partitioned writer — the layout that turns the
incremental queries' date predicates into partition pruning at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write a fact table partitioned by event date (`dt=YYYY-MM-DD`
    directories). Readers filtering on `dt` prune whole partitions —
    the plan shows them under PartitionFilters, and unselected days
    are never opened. This is the 100 TB layout for every
    incremental/watermark query in operators/incremental.py."""
    from pyspark.sql import functions as F

    (
        df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
