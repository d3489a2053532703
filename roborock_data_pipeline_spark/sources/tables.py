"""Table loaders over the driver parquet testdata.

Scan discipline for 100 TB (SURVEY §4): always `spark.read.parquet`
with the pinned schema (no inference, no footer merging), keep
projections/filters on the DataFrame so Catalyst pushes them into the
scan. On a real deployment the same loaders point at date-partitioned
fact tables, enabling partition pruning for the incremental queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roborock_data_pipeline_spark import schemas
from roborock_data_pipeline_spark.session import prepare

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with its pinned schema.

    ``events.ts`` arrives as parquet TIMESTAMP(NANOS); we read it as
    epoch-ns long (legacy.parquet.nanosAsLong) and truncate to µs —
    exactly what DuckDB's ns→µs cast does, so oracle comparisons on
    timestamps agree bit-for-bit.
    """
    prepare(spark)  # idempotent; the driver's session needs these confs
    df = spark.read.schema(schemas.TESTDATA_SCHEMAS[name]).parquet(
        f"{sf_dir}/{name}.parquet"
    )
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition up to cluster parallelism — for
    compute-heavy operators reading small single-row-group files.

    The local testdata is one parquet row group per table, which
    Spark cannot split: every scan is one task no matter what
    maxPartitionBytes says. Operators whose per-row work is heavy
    (shingle hashing, minhash, pairwise verification) repartition
    first so the work uses every core. On a real 100 TB deployment
    inputs arrive as thousands of splits and AQE's partition
    coalescing absorbs the extra exchange."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    # NOTE: deliberately no df.rdd.getNumPartitions() pre-check — that
    # forces a Python->RDD conversion per call; an unconditional
    # round-robin repartition is one exchange Catalyst/AQE can manage.
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
