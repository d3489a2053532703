"""Sinks + DDL (SURVEY §2.A S6-S10).

The reference's sink is Google Sheets: per-row append
(sheets_client.py:128-146), bulk append (:148-169), tab creation with
header rows (:80-126), one-shot spreadsheet provisioning (:258-328),
and a console pretty-printer fallback when the sink is unavailable
(pipeline.py:43-89, wired at 186-196).

Engine equivalents: parquet table appends (partition-level atomic,
schema-enforced — the A:K range bug of sheets_client.py:136 cannot
happen), warehouse bootstrap as directories + schema manifests, and
the same console fallback semantics via show().

Scale: appends write date-partitioned parquet
(`partitionBy("date")`), which is what makes the incremental
queries' date predicates prune partitions at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from roborock_data_pipeline_spark import schemas

# The reference's five tabs (config/settings.py:25-30 SHEETS dict).
WAREHOUSE_TABLES: dict[str, T.StructType] = {
    "cleaning_history": schemas.CLEANING_HISTORY,
    "device_status": schemas.DEVICE_STATUS,
    "clean_summary": schemas.CLEAN_SUMMARY,
    "consumables": schemas.CONSUMABLES,
    "cleaning_records": schemas.CLEANING_RECORDS,
    # the declared-but-never-populated gold table the engine DOES build
    "daily_summary": T.StructType([
        T.StructField("date", T.StringType(), False),
        T.StructField("total_cleanings", T.LongType(), False),
        T.StructField("total_area_m2", T.DoubleType(), True),
        T.StructField("total_time_min", T.LongType(), True),
        T.StructField("avg_area_m2", T.DoubleType(), True),
        T.StructField("avg_time_min", T.DoubleType(), True),
    ]),
}


def table_path(warehouse_dir: str, name: str) -> str:
    return os.path.join(warehouse_dir, name)


def setup_warehouse(spark: SparkSession, warehouse_dir: str) -> None:
    """S8/S9: provision every table (idempotent, like the reference's
    'already exists' tolerance, sheets_client.py:103-107). An empty
    dataframe write pins the schema on disk."""
    for name, schema in WAREHOUSE_TABLES.items():
        path = table_path(warehouse_dir, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            spark.createDataFrame([], schema).write.mode("ignore").parquet(path)


def append_rows(df: DataFrame, warehouse_dir: str, name: str) -> None:
    """S6/S7: append a batch to a table. Parquet appends are
    partition-atomic and schema-checked; batch amortization (the
    reference's append_rows vs append_row distinction) is native."""
    df.write.mode("append").parquet(table_path(warehouse_dir, name))


def read_table(spark: SparkSession, warehouse_dir: str, name: str) -> DataFrame:
    """S5: full-table read with the pinned schema."""
    return spark.read.schema(WAREHOUSE_TABLES[name]).parquet(
        table_path(warehouse_dir, name)
    )


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Bucketed managed table: rows hash-partitioned into n_buckets
    files by `key`, sorted within buckets.

    Two tables bucketed the same way join WITHOUT a shuffle — the
    exchange disappears from the plan (asserted in
    tests/test_bucketing.py). At 100 TB this is how the recurring
    lineitem⋈orders-shaped joins avoid re-shuffling terabytes every
    run: pay the shuffle once at write time, reuse it every query."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def append_with_console_fallback(
    df: DataFrame, warehouse_dir: str, name: str, n_show: int = 20
) -> bool:
    """S10: the reference's fallback sink — on any sink failure,
    pretty-print the rows instead of losing them silently
    (pipeline.py:43-89, 186-196). Returns True if the real sink
    succeeded."""
    try:
        append_rows(df, warehouse_dir, name)
        return True
    except Exception as exc:  # noqa: BLE001 - mirror reference behavior
        print(f"[sink fallback] write to {name} failed ({exc}); rows were:")
        df.show(n_show, truncate=False)
        return False
