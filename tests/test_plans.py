"""Physical-plan shape assertions — the scale contract.

Each test pins a plan property that matters at 100 TB; if a refactor
silently turns a broadcast join into a shuffle or stops a filter from
reaching the scan, these fail even though results stay correct.
"""

from __future__ import annotations

from roborock_data_pipeline_spark.plans.inspect import (
    count_occurrences,
    plan_string,
    pushed_filters,
    read_schemas,
)


def test_filters_reach_the_scan(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.filters import q_date_range_filter

    pf = pushed_filters(q_date_range_filter(spark, sf_dir))
    assert "o_orderdate" in pf and "o_orderstatus" in pf


def test_projection_prunes_the_scan(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.projections import q_project_rename

    rs = read_schemas(q_project_rename(spark, sf_dir))
    assert "event_type" in rs
    assert "props" not in rs  # unused column must not be read


def test_q1_scan_prunes_unused_columns(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.aggregates import q_tpch_q1_shape

    rs = read_schemas(q_tpch_q1_shape(spark, sf_dir))
    assert "l_quantity" in rs
    assert "l_partkey" not in rs and "l_suppkey" not in rs


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.joins import q_star_join

    plan = plan_string(q_star_join(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan  # the fact side never shuffles for joins


def test_topk_plans_take_ordered(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.topk import q_recent_n

    assert count_occurrences(q_recent_n(spark, sf_dir), "TakeOrderedAndProject") >= 1


def test_aggregate_is_partial_then_final(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.aggregates import q_tpch_q1_shape

    plan = plan_string(q_tpch_q1_shape(spark, sf_dir))
    assert "partial_" in plan  # map-side combine before the exchange


def test_state_join_is_broadcast(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.incremental import q_state_join

    assert count_occurrences(q_state_join(spark, sf_dir), "BroadcastHashJoin") >= 1


def test_hot_path_has_no_python_udf(spark, sf_dir):
    """§2.J goal: every oracle-checked query is 100% JVM-side —
    BatchEvalPython / ArrowEvalPython / FlatMapsInPandas only appear
    in the explicitly-Python multimodal operator."""
    from roborock_data_pipeline_spark.registry import all_queries

    for name, spec in all_queries().items():
        # q_heavy_hitters' candidate phase is a per-partition
        # SpaceSaving sketch and q_kmeans_clusters' assignment is a
        # BLAS matmul — both the sanctioned Arrow-batch
        # vectorized-kernel pattern (heavy_hitters' exact-recount
        # phase stays JVM-side).
        if name in ("q_multimodal_features", "q_heavy_hitters",
                    "q_kmeans_clusters"):
            continue
        plan = plan_string(spec.fn(spark, sf_dir))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, f"{name} runs Python in the hot path"


def test_whole_stage_codegen_covers_q1(spark, sf_dir):
    from roborock_data_pipeline_spark.operators.aggregates import q_tpch_q1_shape

    # WSCG spans are only visible on the executed (final AQE) plan
    from roborock_data_pipeline_spark.plans.inspect import executed_plan_string

    plan = executed_plan_string(q_tpch_q1_shape(spark, sf_dir))
    # "*(n)" prefixes mark WholeStageCodegen spans in the final plan
    assert "== Final Plan ==" in plan
    assert "*(" in plan.split("== Final Plan ==")[1]
