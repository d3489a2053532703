"""Bucketed tables: co-located joins drop the shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from roborock_data_pipeline_spark.plans.inspect import plan_string
from roborock_data_pipeline_spark.sources.sinks import write_bucketed
from roborock_data_pipeline_spark.sources.tables import load


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(od, "od_b", "l_orderkey", 8)
    try:
        a = spark.table("li_b")
        b = spark.table("od_b")
        # disable broadcast so the join must co-locate on the key
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "l_orderkey")
            plan = plan_string(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucketing replaced the shuffle
            # and the result is still correct
            expect = (
                load(spark, sf_dir, "lineitem")
                .join(
                    load(spark, sf_dir, "orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
                .count()
            )
            assert joined.count() == expect
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")
