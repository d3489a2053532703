"""Streaming CDC upsert: cross-batch tombstone semantics, atomic
snapshot publish, and replay idempotence (T3/T5 depth)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

NS = 1_000_000_000
BASE = 1_704_067_200 * NS  # 2024-01-01 UTC, epoch ns


def _write_events_file(spark, src_dir: str, fname: str, rows, mtime: int) -> None:
    """One change-batch file in the raw events layout (ts = epoch-ns
    long, same as the driver's TIMESTAMP(NANOS) read under
    nanosAsLong). Distinct mtimes pin the file-source batch order."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    tmp = tempfile.mkdtemp()
    try:
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src_dir, fname)
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp() for k in ("src", "chk", "wh")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _run(spark, d, **kw):
    from roborock_data_pipeline_spark.streaming.cdc_upsert import cdc_upsert_stream

    q = cdc_upsert_stream(spark, d["src"], d["chk"], d["wh"], **kw)
    q.awaitTermination()


def _snapshot(spark, d):
    from roborock_data_pipeline_spark.streaming.cdc_upsert import read_snapshot

    return {
        r.user_id: (r.last_op, r.last_value)
        for r in read_snapshot(spark, d["wh"]).collect()
    }


def test_cdc_upsert_cross_batch_tombstones(spark, dirs):
    """Three micro-batches: insert, delete+update, then a LATE older
    version of the deleted key (must stay dead) plus a fresh key."""
    _write_events_file(spark, dirs["src"], "events-0.parquet", [
        (1, BASE + 100 * NS, 1, "signup", 1.0, None),
        (2, BASE + 100 * NS, 2, "signup", 2.0, None),
    ], mtime=1_700_000_000)
    _write_events_file(spark, dirs["src"], "events-1.parquet", [
        (3, BASE + 200 * NS, 1, "error", 0.0, None),    # delete k1
        (4, BASE + 200 * NS, 2, "click", 2.5, None),    # update k2
    ], mtime=1_700_000_010)
    _write_events_file(spark, dirs["src"], "events-2.parquet", [
        (5, BASE + 150 * NS, 1, "view", 9.9, None),     # late, older than delete
        (6, BASE + 210 * NS, 3, "purchase", 3.0, None),  # new k3
    ], mtime=1_700_000_020)

    _run(spark, dirs, max_files_per_trigger=1)

    snap = _snapshot(spark, dirs)
    assert snap == {2: ("click", 2.5), 3: ("purchase", 3.0)}  # k1 stays deleted


def test_cdc_upsert_rerun_is_idempotent(spark, dirs):
    _write_events_file(spark, dirs["src"], "events-0.parquet", [
        (1, BASE + 100 * NS, 1, "signup", 1.0, None),
    ], mtime=1_700_000_000)
    _run(spark, dirs, max_files_per_trigger=1)
    first = _snapshot(spark, dirs)
    # second run with the same checkpoint: no new files -> no change
    _run(spark, dirs, max_files_per_trigger=1)
    assert _snapshot(spark, dirs) == first == {1: ("signup", 1.0)}


def test_cdc_upsert_matches_batch_twin(spark, dirs):
    """The streamed snapshot equals applying cdc_merge to the full
    change set in one batch (stream/batch parity)."""
    from pyspark.sql import functions as F

    from roborock_data_pipeline_spark.operators.linkage import cdc_merge
    from roborock_data_pipeline_spark.streaming.cdc_upsert import _changes

    rows0 = [(i, BASE + i * NS, i % 5, "signup", float(i), None) for i in range(10)]
    rows1 = [
        (100 + i, BASE + (100 + i) * NS, i % 5,
         "error" if i % 2 == 0 else "click", float(i) + 0.5, None)
        for i in range(10)
    ]
    _write_events_file(spark, dirs["src"], "events-0.parquet", rows0, 1_700_000_000)
    _write_events_file(spark, dirs["src"], "events-1.parquet", rows1, 1_700_000_010)
    _run(spark, dirs, max_files_per_trigger=1)

    all_rows = spark.createDataFrame(
        rows0 + rows1,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    changes = _changes(all_rows)
    twin = cdc_merge(
        changes.limit(0), changes,
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        delete_col="is_delete",
    )
    twin_map = {r.user_id: (r.last_op, r.last_value) for r in twin.collect()}
    assert _snapshot(spark, dirs) == twin_map
