"""Joins (SURVEY §2.F).

The reference has no joins (single-entity pipeline); its only key
correlation is the dict lookup of prior state (J1, in incremental.py).
These are the engine's scale-out join surface:

- J2 star join: dims are tiny (region=5, nation=25 rows) → broadcast,
  so the fact table never shuffles for the join.
- J3 fact-fact join: both sides large at 100 TB → sort-merge on the
  key; co-partitioning (bucketing) would remove the shuffle entirely
  on a warehouse deployment.
- J5 as-of join: Spark lacks a native one; expressed as last-non-null
  over an event-time window — one shuffle on the key, no range
  explosion (the classic union-and-window as-of technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from roborock_data_pipeline_spark.registry import query
from roborock_data_pipeline_spark.sources.tables import load


@query(
    "q_star_join",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (EXT): star-schema join with explicitly broadcast dims —
    the fact scan streams through three broadcast hash joins with no
    shuffle until the final aggregation."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_fact_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def q_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (EXT): large-large equi-join (lineitem ⋈ orders). Above the
    broadcast threshold Catalyst plans a sort-merge join; the status
    filter pushes below the join to shrink the build side first."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "q_asof_status",
    oracle="""
    SELECT event_id, user_id, ts, last_view_ts
    FROM (
        SELECT event_id, user_id, ts, event_type,
               LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_view_ts
        FROM events
    )
    WHERE event_type = 'purchase'
    """,
)
def q_asof_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (EXT): as-of join — for each purchase, the most recent
    strictly-earlier 'view' by the same user (the reference's
    nearest-status-before-session-start telemetry pattern, S1+S4).

    Implemented as last-non-null over an ordered window instead of a
    range join: linear in events, one shuffle on user_id, immune to
    the quadratic blowup of a naive range self-join."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_view_ts")
    )
