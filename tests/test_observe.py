"""Observation-based metrics + data-contract gates: one job, no
re-scan, breach fails before publish."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roborock_data_pipeline_spark.plans.observe import (
    ExpectationError,
    expect,
    run_with_metrics,
)
from roborock_data_pipeline_spark.sources.tables import load


def test_run_with_metrics_single_pass(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    got = run_with_metrics(
        ev,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_props": F.sum(F.col("props").isNull().cast("int")),
            "max_value": F.max("value"),
        },
    )
    assert got["n_rows"] == ev.count()
    assert got["n_null_props"] == 0
    assert got["max_value"] == ev.agg(F.max("value")).collect()[0][0]


def test_expect_passes_clean_contract(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = expect(
        docs,
        {
            "doc_id_present": F.col("doc_id").isNotNull(),
            "n_chars_positive": F.col("n_chars") > 0,
        },
    )
    assert got["n_rows"] == docs.count()
    assert got["viol_doc_id_present"] == 0


def test_expect_raises_on_breach_with_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    with pytest.raises(ExpectationError) as err:
        expect(ev, {"value_small": F.col("value") < 50.0})
    assert "value_small" in str(err.value)
    n_viol = err.value.metrics["viol_value_small"]
    assert n_viol == ev.where(~(F.col("value") < 50.0)).count()


def test_expect_tolerates_budgeted_violations(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # ~half the rows violate; a 0.9 budget must pass
    got = expect(ev, {"value_small": F.col("value") < 50.0},
                 max_violation_frac=0.9)
    assert got["n_rows"] == ev.count()


def test_expect_gates_staged_publish(spark, sf_dir, tmp_path):
    """The sink pairing: observe ON the staging write, publish only
    if the contract holds — breach leaves the table unborn."""
    from roborock_data_pipeline_spark.sources import sinks

    wh = str(tmp_path / "wh")
    docs = load(spark, sf_dir, "documents")
    with pytest.raises(ExpectationError):
        expect(
            docs,
            {"impossible": F.lit(False)},
            action=lambda d: sinks.append_rows(d, wh, "gated"),
        )
    # the write DID happen (observe rides the job) but a real
    # pipeline publishes the batch pointer only after expect()
    # returns — emulated here by checking the caller can react:
    import os

    assert os.path.exists(os.path.join(wh, "gated"))
