"""Structural invariants of gap-sessionization (beyond oracle parity):
sessions partition the events exactly, intra-session gaps are ≤ the
threshold, inter-session gaps are > the threshold."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

GAP_S = 30 * 60


def test_sessions_partition_events(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.windows import q_sessionize
    from roborock_data_pipeline_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    sessions = q_sessionize(spark, sf_dir)
    assert (
        sessions.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    )  # every event in exactly one session
    # session count per user == 1 + number of >30min gaps
    gaps = (
        ev.withColumn(
            "gap",
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .groupBy("user_id")
        .agg(F.sum((F.col("gap") > GAP_S).cast("int")).alias("n_gaps"))
    )
    expect = {r.user_id: r.n_gaps + 1 for r in gaps.collect()}
    got = {
        r.user_id: r.n
        for r in sessions.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expect


def test_session_bounds_respect_gap(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.windows import q_sessionize

    rows = sorted(
        q_sessionize(spark, sf_dir).collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    for prev, cur in zip(rows, rows[1:]):
        if prev.user_id != cur.user_id:
            continue
        # consecutive sessions of one user are separated by > gap
        between = (cur.session_start - prev.session_end).total_seconds()
        assert between > GAP_S, (prev, cur)
        assert prev.session_end >= prev.session_start
