"""PageRank properties (q_pagerank also has a full unrolled-CTE
DuckDB oracle — these pin the function on known graphs)."""

from __future__ import annotations

import pytest

from roborock_data_pipeline_spark.operators.graph import pagerank


def _ranks(spark, edges, iters=20):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.v: r.r for r in pagerank(df, iters=iters).collect()}


def test_pagerank_mass_conserved(spark):
    """No dangling nodes (every node has out-edges) ⇒ total rank
    mass stays 1."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"), ("c", "b"), ("a", "c")]
    ranks = _ranks(spark, edges)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_center_dominates(spark):
    """Undirected star: the hub out-ranks every leaf."""
    leaves = ["b", "c", "d", "e"]
    edges = [("a", x) for x in leaves] + [(x, "a") for x in leaves]
    ranks = _ranks(spark, edges)
    assert all(ranks["a"] > ranks[x] for x in leaves)
    # leaves are symmetric ⇒ identical ranks
    leaf_ranks = {round(ranks[x], 12) for x in leaves}
    assert len(leaf_ranks) == 1


def test_pagerank_symmetric_cycle_is_uniform(spark):
    """Directed 4-cycle: perfect symmetry ⇒ uniform 1/N ranks at any
    iteration count."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    ranks = _ranks(spark, edges, iters=3)
    for v in "abcd":
        assert ranks[v] == pytest.approx(0.25, abs=1e-12)
