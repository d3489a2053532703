"""Salted-join equivalence on a pathologically skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from roborock_data_pipeline_spark.functions.skew import salted_count, salted_join


def _skewed(spark):
    # 10k rows for key 0, a handful for keys 1-9
    hot = spark.range(10_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(9).select(
        (F.col("id") + 1).cast("long").alias("k"), F.col("id").alias("v")
    )
    return hot.union(cold)


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(10)], "k long, name string"
    )
    plain = large.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(large, small, "k").groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 salt bucket."""
    large = _skewed(spark)
    n_buckets = (
        large.withColumn(
            "_salt", F.pmod(F.xxhash64(*[c for c in large.columns]), F.lit(8))
        )
        .where(F.col("k") == 0)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_salted_count_matches_plain_count(spark):
    large = _skewed(spark)
    plain = {r.k: r["count"] for r in large.groupBy("k").count().collect()}
    salted = {r.k: r.n for r in salted_count(large, "k").collect()}
    assert plain == salted
