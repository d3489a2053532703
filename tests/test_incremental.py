"""Incremental-semantics properties (the reference's core invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_partition_is_exact(spark, sf_dir):
    """pre-cutoff rows + incremental new rows == all rows, disjointly
    (no loss, no duplication — the exactly-once fix for T5)."""
    from roborock_data_pipeline_spark.operators.incremental import (
        CUTOFF,
        q_new_records_incremental,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    total = ev.count()
    old = ev.where(F.col("ts") <= F.lit(CUTOFF).cast("timestamp")).count()
    new = q_new_records_incremental(spark, sf_dir).count()
    assert old + new == total


def test_dedup_counter_no_change_no_rows(spark, sf_dir):
    """If state is fully caught up (cutoff = +inf), the change
    detector emits nothing — running the sync twice is a no-op
    (state_manager.py:66-69 semantics)."""
    from roborock_data_pipeline_spark.sources.tables import load

    ev = load(spark, sf_dir, "events")
    state = ev.groupBy("user_id").agg(F.count("*").alias("last_count"))
    current = ev.groupBy("user_id").agg(F.count("*").alias("cur_count"))
    changed = (
        current.join(state, "user_id", "left")
        .where(F.col("cur_count") > F.coalesce(F.col("last_count"), F.lit(0)))
        .count()
    )
    assert changed == 0


def test_session_edges_match_naive(spark, sf_dir):
    """Edge count via window lag == edge count via a pandas replay of
    the reference's dict-based loop (pipeline.py:143-156)."""
    from roborock_data_pipeline_spark.operators.windows import q_session_edges
    from roborock_data_pipeline_spark.sources.tables import load

    got = q_session_edges(spark, sf_dir).count()
    pdf = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    prev: dict = {}
    edges = 0
    for r in pdf.itertuples():
        p = prev.get(r.user_id)
        if p is not None and p != r.event_type:
            edges += 1
        prev[r.user_id] = r.event_type
    assert got == edges
