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


def test_orc_round_trip(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    d = tempfile.mkdtemp()
    try:
        formats.write_orc(ev, d)
        back = formats.read_orc(
            spark, d, "event_id long, user_id long, event_type string, value double"
        )
        assert back.count() == ev.count()
        assert back.schema == ev.schema
        got = back.agg(F.sum("value")).first()[0]
        want = ev.agg(F.sum("value")).first()[0]
        assert abs(got - want) < 1e-6
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_evolution_merge(spark):
    """A batch written before a column existed reads as NULL for it
    under the merged schema; new-batch rows keep their values."""
    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
            "append"
        ).parquet(d)
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, name string, score double"
        ).write.mode("append").parquet(d)
        back = formats.read_evolved(spark, d)
        rows = {r.id: (r.name, r.score) for r in back.collect()}
        assert set(back.schema.fieldNames()) == {"id", "name", "score"}
        assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_corrupt_json_quarantine(spark):
    """2 good lines parse, 1 malformed line is captured whole in
    _corrupt_record — nothing aborts, nothing vanishes."""
    import os

    d = tempfile.mkdtemp()
    try:
        with open(os.path.join(d, "batch.json"), "w") as f:
            f.write('{"id": 1, "v": 2.5}\n')
            f.write('{"id": 2, "v": BROKEN}\n')
            f.write('{"id": 3, "v": 7.5}\n')
        df = formats.read_json_audited(spark, d, "id long, v double").cache()
        good = df.where("_corrupt_record IS NULL")
        bad = df.where("_corrupt_record IS NOT NULL")
        assert {r.id for r in good.collect()} == {1, 3}
        assert bad.count() == 1
        assert "BROKEN" in bad.first()["_corrupt_record"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_register_views_sql_interface(spark, sf_dir):
    """After register_views, raw Spark SQL runs against the same
    table names the oracles use."""
    from roborock_data_pipeline_spark.sources import tables

    tables.register_views(spark, sf_dir)
    got = spark.sql(
        "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name"
    ).count()
    assert got == 5
    joined = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    assert joined.count() == 25
