"""Every registered query matches its DuckDB oracle (the driver's
correctness gate, run locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from roborock_data_pipeline_spark.registry import all_queries
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(name, spark, sf_dir):
    problems = compare(name, spark, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
