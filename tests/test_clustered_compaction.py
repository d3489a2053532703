"""Clustered compaction (vacuum_table cluster_by): the merged base is
range-partitioned + sorted on the cluster columns, so its parquet
files carry DISJOINT min/max footer stats there — a later range scan
skips non-matching files at the footer, with zero logical change
(rows, as-of semantics, and the absorbed manifest are untouched).

Pinned here with pyarrow footer inspection, not plan strings: the
physical claim IS the footer stats, and asserting them directly is
engine-independent evidence the layout happened.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from roborock_data_pipeline_spark import schemas
from roborock_data_pipeline_spark.sources import sinks


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp()
    sinks.setup_warehouse(spark, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rec(day, hour, device):
    ts = dt.datetime(2024, 3, day, hour)
    return (ts, device, ts, 30.0, 12.5, "standard", "vacuum", 0, "ok")


def _append_interleaved(spark, warehouse):
    """Three batches whose time ranges interleave — an unclustered
    merge preserves arrival order, so per-file ranges OVERLAP unless
    clustering actually rewrites the layout."""
    for days in ((1, 5, 9), (2, 6, 10), (3, 7, 11)):
        rows = [_rec(d, h, f"robo-{h}") for d in days for h in (6, 12, 18)]
        df = spark.createDataFrame(rows, schemas.CLEANING_RECORDS)
        sinks.append_rows(df, warehouse, "cleaning_records")


def _base_file_ranges(warehouse, column):
    table_dir = sinks.table_path(warehouse, "cleaning_records")
    base = [
        b for b in sinks.list_batches(warehouse, "cleaning_records")
        if b.endswith(sinks.VACUUM_BASE_SUFFIX)
    ][0]
    ranges = []
    base_dir = os.path.join(table_dir, base)
    for f in sorted(os.listdir(base_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(base_dir, f)).metadata
        ix = md.schema.names.index(column)
        lo = min(
            md.row_group(g).column(ix).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(ix).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    return ranges


def test_clustered_vacuum_disjoint_file_stats_and_same_rows(spark, warehouse):
    _append_interleaved(spark, warehouse)
    before = sorted(
        sinks.read_table(spark, warehouse, "cleaning_records").collect()
    )
    n = sinks.vacuum_table(
        spark, warehouse, "cleaning_records", 0,
        cluster_by=["start_time"], cluster_partitions=3,
    )
    assert n == 3
    after = sorted(
        sinks.read_table(spark, warehouse, "cleaning_records").collect()
    )
    assert before == after  # clustering is pure physical layout

    ranges = _base_file_ranges(warehouse, "start_time")
    assert len(ranges) >= 2, "clustering should split the base by range"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} {(lo2, hi2)}"


def test_unclustered_vacuum_overlaps_as_control(spark, warehouse):
    """The control arm: without cluster_by, the interleaved input's
    single-pass merge does NOT yield disjoint ranges — proving the
    disjointness above comes from the clustering, not the data."""
    _append_interleaved(spark, warehouse)
    sinks.vacuum_table(spark, warehouse, "cleaning_records", 0)
    ranges = _base_file_ranges(warehouse, "start_time")
    if len(ranges) < 2:
        pytest.skip("merge produced one file; nothing to overlap")
    ranges.sort()
    assert any(
        hi1 > lo2 for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:])
    )


def test_cluster_by_unknown_column_dies_pre_publish(spark, warehouse):
    _append_interleaved(spark, warehouse)
    with pytest.raises(ValueError, match="cluster_by"):
        sinks.vacuum_table(
            spark, warehouse, "cleaning_records", 0, cluster_by=["nope"]
        )
    # the failed vacuum published nothing: all 3 batches still live
    assert len(sinks.list_batches(warehouse, "cleaning_records")) == 3


def test_clustered_vacuum_keeps_asof_semantics(spark, warehouse):
    _append_interleaved(spark, warehouse)
    batches = sinks.list_batches(warehouse, "cleaning_records")
    newest_ns = int(sinks._batch_ns_prefix(batches[-1]))  # noqa: SLF001
    asof_before = sorted(
        sinks.read_table_as_of(
            spark, warehouse, "cleaning_records", newest_ns
        ).collect()
    )
    sinks.vacuum_table(
        spark, warehouse, "cleaning_records", 0,
        cluster_by=["start_time"], cluster_partitions=3,
    )
    asof_after = sorted(
        sinks.read_table_as_of(
            spark, warehouse, "cleaning_records", newest_ns
        ).collect()
    )
    assert asof_before == asof_after


def test_warehouse_maintenance_threads_cluster_map(spark, warehouse):
    _append_interleaved(spark, warehouse)
    out = sinks.warehouse_maintenance(
        spark,
        warehouse,
        retain_last_n=0,
        cluster_by={"cleaning_records": ["start_time"]},
    )
    assert out["cleaning_records"] == 3
    ranges = sorted(_base_file_ranges(warehouse, "start_time"))
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
