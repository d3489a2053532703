"""ADVICE r11 (dedup.py persist leak): the audit-kept warm-rerun
persists must be released IN CODE when a different registry query
runs — the clearCache contract can no longer be missed by a
long-lived session. Enforced by registry.query's begin_query wrapper
+ functions.cache_tracking."""

from __future__ import annotations

from roborock_data_pipeline_spark.functions import cache_tracking
from roborock_data_pipeline_spark.registry import all_queries


def _run(qs, name, spark, sf_dir):
    qs[name].fn(spark, sf_dir).count()


def test_cross_query_caches_released(spark, sf_dir):
    qs = all_queries()
    cache_tracking.release_all()
    _run(qs, "q_near_dup_jaccard", spark, sf_dir)
    with cache_tracking._LOCK:
        owned = [
            df
            for owner, df, _h in cache_tracking._CACHES
            if owner == "q_near_dup_jaccard"
        ]
    assert owned, "q_near_dup_jaccard's kept persist must be tracked"
    assert all(df.storageLevel.useMemory for df in owned)
    # a DIFFERENT query releases them (the enforced contract) …
    _run(qs, "q_row_count", spark, sf_dir)
    assert all(not df.storageLevel.useMemory for df in owned)
    assert cache_tracking.tracked_count() == 0  # q_row_count leaks none


def test_same_query_warm_rerun_keeps_cache(spark, sf_dir):
    """The warm-rerun model that justified each kept persist
    (PERSIST_AUDIT.json) must survive the enforcement: re-invoking
    the SAME query does not drop its own caches."""
    qs = all_queries()
    cache_tracking.release_all()
    _run(qs, "q_near_dup_jaccard", spark, sf_dir)
    with cache_tracking._LOCK:
        first = [df for _, df, _h in cache_tracking._CACHES]
    assert first
    _run(qs, "q_near_dup_jaccard", spark, sf_dir)
    assert all(df.storageLevel.useMemory for df in first)
    cache_tracking.release_all()
    assert all(not df.storageLevel.useMemory for df in first)


def test_iterative_queries_track_their_leaks(spark, sf_dir):
    """The iterative family (pagerank, dup_groups) leaks per-iteration
    caches by design — every one must be registered so the next query
    releases it."""
    qs = all_queries()
    cache_tracking.release_all()
    _run(qs, "q_pagerank", spark, sf_dir)
    n_pr = cache_tracking.tracked_count()
    assert n_pr >= 4  # bi + deg + nodes + >=1 in-loop ranks
    _run(qs, "q_dup_groups", spark, sf_dir)
    # pagerank's caches were released when dup_groups began
    with cache_tracking._LOCK:
        owners = {owner for owner, _, _h in cache_tracking._CACHES}
    assert owners <= {"q_dup_groups"}
    assert cache_tracking.release_all() > 0
