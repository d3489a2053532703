"""The driver-facing surface: shape guarantees the harness relies on."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 88
    assert set(oracles) <= set(qs)
    # every callable takes (spark, sf_dir); every oracle is non-empty SQL
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())
    # rows-only set stays the deliberate sketch list
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "q_approx_distinct", "q_approx_percentiles", "q_dedup_minhash",
        "q_dedup_simhash", "q_similarity_lsh", "q_similarity_ivf",
        "q_hll_daily_users", "q_kmeans_clusters",
    }
