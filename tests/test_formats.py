"""Format round-trips + the partition-pruning layout."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from roborock_data_pipeline_spark.sources import formats
from roborock_data_pipeline_spark.sources.tables import load


def _events(spark, sf_dir):
    return load(spark, sf_dir, "events")


def test_csv_round_trip(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    d = tempfile.mkdtemp()
    try:
        formats.write_csv(ev, d)
        back = formats.read_csv(
            spark, d, "event_id long, user_id long, event_type string, value double"
        )
        assert back.count() == ev.count()
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_json_round_trip(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "event_type", "props")
    d = tempfile.mkdtemp()
    try:
        formats.write_json(ev, d)
        back = formats.read_json(
            spark, d, "event_id long, event_type string, props string"
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_date_partitioned_write_prunes(spark, sf_dir):
    """A dt filter over the partitioned layout must appear as a
    PartitionFilter (pruning), not a data filter over all files."""
    from roborock_data_pipeline_spark.plans.inspect import plan_string

    ev = _events(spark, sf_dir)
    d = tempfile.mkdtemp()
    try:
        formats.write_date_partitioned(ev, d)
        back = formats.read_partitioned(spark, d)
        one_day = back.where(F.col("dt") == "2024-01-05")
        plan = plan_string(one_day)
        assert "PartitionFilters" in plan
        partition_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "dt" in partition_filters and "2024-01-05" in partition_filters
        # correctness of the pruned read
        expect = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
        assert one_day.count() == expect
    finally:
        shutil.rmtree(d, ignore_errors=True)
