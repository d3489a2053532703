"""Fault injection for every staged-rename publish (VERDICT r4 #8).

The atomic rename is load-bearing for each exactly-once claim in the
engine: warehouse appends, both incremental indexes, and the curation
funnel's batch publish. Two injected faults per surface:

- FAIL BETWEEN stage-write and ``os.replace`` (the publish rename
  itself dies): nothing may become visible, staging must be cleaned,
  and a plain retry must converge to the no-crash result.
- FAIL MID-WRITE (the Spark job writing the staged files dies): same
  postconditions. (sinks.append_rows mid-write is already pinned by
  test_atomic_sink.test_failed_append_publishes_nothing.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roborock_data_pipeline_spark.sources.tables import load



def _record_exists(out, batch_id):
    """Backend-agnostic commit-record probe (the record store is the
    commit seam, which may be the in-memory object store)."""
    from roborock_data_pipeline_spark.operators import funnel_txn
    from roborock_data_pipeline_spark.sources import commit_provider

    return commit_provider.read_pointer(
        funnel_txn.record_path(out, batch_id)
    ) is not None

def _fail_replace_once(monkeypatch, match: str) -> dict:
    """Patch os.replace to raise ONCE for destinations under `match`
    (everything else passes through — Spark's own JVM-side file ops
    never route through Python's os anyway)."""
    real = os.replace
    state = {"fired": False}

    def bomb(src, dst, *a, **k):
        if match in str(dst) and not state["fired"]:
            state["fired"] = True
            raise OSError("injected failure before publish rename")
        return real(src, dst, *a, **k)

    monkeypatch.setattr("os.replace", bomb)
    return state


def _poison(df, col="text"):
    """A DataFrame whose write job always fails (test-only UDF; the
    no-UDF policy covers operators, not fault injection)."""

    @F.udf(T.StringType())
    def boom(x):
        raise RuntimeError("injected mid-write failure")

    return df.withColumn(col, boom(col))


def _segments(idx):
    if not os.path.isdir(idx):
        return []
    return sorted(
        d for d in os.listdir(idx)
        if d.startswith(("batch-", "base-"))
    )


def _staging_empty(root):
    s = os.path.join(root, ".staging")
    return not os.path.isdir(s) or not os.listdir(s)


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_minhash_index_publish_faults(spark, sf_dir, tmp_path, monkeypatch):
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        update_minhash_index,
    )

    docs = load(spark, sf_dir, "documents")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh")
    ctl = str(tmp_path / "mh_ctl")
    update_minhash_index(spark, b1, idx, batch_id="b1")
    update_minhash_index(spark, b1, ctl, batch_id="b1")
    before = _segments(idx)

    # fault 1: crash on the publish rename
    state = _fail_replace_once(monkeypatch, idx)
    with pytest.raises(OSError, match="injected"):
        update_minhash_index(spark, b2, idx, batch_id="b2")
    assert state["fired"]
    assert _segments(idx) == before, "partial batch became visible"
    assert _staging_empty(idx)
    monkeypatch.undo()

    # fault 2: crash mid-write of the staged tables
    with pytest.raises(Exception):
        update_minhash_index(spark, _poison(b2), idx, batch_id="b2")
    assert _segments(idx) == before
    assert _staging_empty(idx)

    # retry converges to the no-crash result
    got = _pairs(update_minhash_index(spark, b2, idx, batch_id="b2"))
    want = _pairs(update_minhash_index(spark, b2, ctl, batch_id="b2"))
    assert got == want and got, "retry diverged from the no-crash control"


def test_semantic_index_publish_faults(spark, sf_dir, tmp_path, monkeypatch):
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        create_semantic_index,
        update_semantic_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    b1 = emb.where(F.col("vec_id") % 2 == 0)
    b2 = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "sem")
    ctl = str(tmp_path / "sem_ctl")
    create_semantic_index(spark, emb, idx)
    create_semantic_index(spark, emb, ctl)
    update_semantic_index(spark, b1, idx, threshold=0.25, batch_id="b1")
    update_semantic_index(spark, b1, ctl, threshold=0.25, batch_id="b1")
    before = _segments(idx)

    state = _fail_replace_once(monkeypatch, idx)
    with pytest.raises(OSError, match="injected"):
        update_semantic_index(spark, b2, idx, threshold=0.25, batch_id="b2")
    assert state["fired"]
    assert _segments(idx) == before, "partial batch became visible"
    assert _staging_empty(idx)
    monkeypatch.undo()

    @F.udf(T.ArrayType(T.FloatType()))
    def boom(x):
        raise RuntimeError("injected mid-write failure")

    with pytest.raises(Exception):
        update_semantic_index(
            spark, b2.withColumn("embedding", boom("embedding")), idx,
            threshold=0.25, batch_id="b2",
        )
    assert _segments(idx) == before
    assert _staging_empty(idx)

    got = _pairs(update_semantic_index(spark, b2, idx, threshold=0.25,
                                       batch_id="b2"))
    want = _pairs(update_semantic_index(spark, b2, ctl, threshold=0.25,
                                        batch_id="b2"))
    assert got == want and got, "retry diverged from the no-crash control"


def test_index_compaction_publish_faults(spark, sf_dir, tmp_path, monkeypatch):
    """A compaction that dies on its base-commit rename must leave the
    pre-compaction segments fully live; the retry compacts cleanly."""
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        compact_minhash_index,
        update_minhash_index,
    )

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh")
    for i in range(2):
        update_minhash_index(
            spark, docs.where(F.col("doc_id") % 2 == i), idx, batch_id=f"b{i}"
        )
    before = _segments(idx)

    state = _fail_replace_once(monkeypatch, idx)
    with pytest.raises(OSError, match="injected"):
        compact_minhash_index(spark, idx)
    assert state["fired"]
    assert _segments(idx) == before, "half-committed base became visible"
    assert _staging_empty(idx)
    monkeypatch.undo()

    assert compact_minhash_index(spark, idx) == 2
    # replay records survived the crashed attempt + the retry
    got = _pairs(update_minhash_index(spark, docs.limit(0), idx,
                                      batch_id="b1"))
    assert got == _pairs(
        update_minhash_index(spark, docs.limit(0), idx, batch_id="b1")
    )


def test_curate_funnel_crash_mid_finalize_rolls_forward(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash DURING the roll-forward renames, after the commit link
    (the former per-surface publish window): the transaction record is
    the truth — the retry's recovery completes the interrupted rename
    and returns the RECORDED counts, equal to the no-crash control's;
    the output converges byte-identically."""
    from roborock_data_pipeline_spark import pipeline
    from roborock_data_pipeline_spark.operators import funnel_txn

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    d1, d2 = docs.where(F.col("doc_id") < 250), docs.where(F.col("doc_id") >= 250)
    state_dir, out = str(tmp_path / "s"), str(tmp_path / "o")
    ctl_state, ctl_out = str(tmp_path / "cs"), str(tmp_path / "co")
    f1 = pipeline.mode_curate_stream(spark, d1, emb, state_dir, out, "b1")
    pipeline.mode_curate_stream(spark, d1, emb, ctl_state, ctl_out, "b1")

    # the curated surface finalizes LAST: the crash leaves the two
    # index segments renamed, the curated rename pending, record live
    state = _fail_replace_once(monkeypatch, os.path.join(out, "batch-b2"))
    with pytest.raises(OSError, match="injected"):
        pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    assert state["fired"]
    monkeypatch.undo()
    assert _record_exists(out, "b2"), (
        "commit record must survive a crashed finalize"
    )
    visible = sorted(d for d in os.listdir(out) if d.startswith("batch-"))
    assert visible == ["batch-b1"], "half-finalized batch leaked"
    assert pipeline.read_curated_stream(spark, out).count() == f1["published"]

    # retry = replay: recovery rolls the rename forward and the
    # RECORDED counts come back (no recompute), equal to the control's
    f2 = pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    ctl2 = pipeline.mode_curate_stream(spark, d2, emb, ctl_state, ctl_out, "b2")
    assert f2 == ctl2
    assert not _record_exists(out, "b2")
    assert _staging_empty(out)
    assert (
        pipeline.read_curated_stream(spark, out).count()
        == f1["published"] + f2["published"]
    )
    kept = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out)
        .select("doc_id").collect()
    )
    kept_ctl = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, ctl_out)
        .select("doc_id").collect()
    )
    assert kept == kept_ctl


def test_curate_funnel_crash_after_commit_link_before_any_rename(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash immediately AFTER the commit link, before ANY surface
    rename: logically committed, physically nothing visible yet. The
    next funnel touch recovers all three surfaces together and the
    replay returns the recorded counts — all-or-nothing at the
    transaction level."""
    from roborock_data_pipeline_spark import pipeline
    from roborock_data_pipeline_spark.operators import funnel_txn

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    d1, d2 = docs.where(F.col("doc_id") < 250), docs.where(F.col("doc_id") >= 250)
    state_dir, out = str(tmp_path / "s"), str(tmp_path / "o")
    ctl_state, ctl_out = str(tmp_path / "cs"), str(tmp_path / "co")
    pipeline.mode_curate_stream(spark, d1, emb, state_dir, out, "b1")
    pipeline.mode_curate_stream(spark, d1, emb, ctl_state, ctl_out, "b1")

    real_finalize = funnel_txn.finalize
    state = {"fired": False}

    def bomb(record):
        if not state["fired"]:
            state["fired"] = True
            raise RuntimeError("injected crash after commit link")
        return real_finalize(record)

    monkeypatch.setattr(funnel_txn, "finalize", bomb)
    with pytest.raises(RuntimeError, match="injected"):
        pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    assert state["fired"]
    monkeypatch.undo()

    # committed but not yet rolled forward: no surface visible
    assert _record_exists(out, "b2")
    for surface in (
        os.path.join(state_dir, "minhash"),
        os.path.join(state_dir, "semantic"),
        out,
    ):
        assert "batch-b2" not in _segments(surface), surface

    # recovery at the next touch makes all three visible TOGETHER and
    # the replay returns the recorded counts
    f2 = pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    ctl2 = pipeline.mode_curate_stream(spark, d2, emb, ctl_state, ctl_out, "b2")
    assert f2 == ctl2
    for surface in (
        os.path.join(state_dir, "minhash"),
        os.path.join(state_dir, "semantic"),
        out,
    ):
        assert "batch-b2" in _segments(surface), surface
    assert not _record_exists(out, "b2")
    assert _staging_empty(out)
    kept = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out)
        .select("doc_id").collect()
    )
    kept_ctl = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, ctl_out)
        .select("doc_id").collect()
    )
    assert kept == kept_ctl


def test_curate_funnel_crash_at_commit_link(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash ON the commit link itself (before the record exists):
    nothing is committed, every staged dir is cleaned, all three
    surfaces untouched; a plain retry recomputes and converges."""
    from roborock_data_pipeline_spark import pipeline
    from roborock_data_pipeline_spark.operators import funnel_txn

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    d1, d2 = docs.where(F.col("doc_id") < 250), docs.where(F.col("doc_id") >= 250)
    state_dir, out = str(tmp_path / "s"), str(tmp_path / "o")
    ctl_state, ctl_out = str(tmp_path / "cs"), str(tmp_path / "co")
    pipeline.mode_curate_stream(spark, d1, emb, state_dir, out, "b1")
    pipeline.mode_curate_stream(spark, d1, emb, ctl_state, ctl_out, "b1")

    state = {"fired": False}

    def bomb(*a, **k):
        state["fired"] = True
        raise OSError("injected crash at commit link")

    monkeypatch.setattr(funnel_txn, "link_commit", bomb)
    with pytest.raises(OSError, match="injected"):
        pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    assert state["fired"]
    monkeypatch.undo()

    assert not _record_exists(out, "b2")
    for surface in (
        os.path.join(state_dir, "minhash"),
        os.path.join(state_dir, "semantic"),
        out,
    ):
        assert "batch-b2" not in _segments(surface), surface
        assert _staging_empty(surface), surface

    f2 = pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    ctl2 = pipeline.mode_curate_stream(spark, d2, emb, ctl_state, ctl_out, "b2")
    assert f2 == ctl2


def test_curate_funnel_crash_between_index_stages(spark, sf_dir, tmp_path,
                                                  monkeypatch):
    """The former mid-batch window, now CLOSED by the single commit
    (VERDICT r6 #6): the MinHash segment is fully staged, the semantic
    staging dies. Before the transaction this left the MinHash index
    COMMITTED ahead of an unpublished batch; now NOTHING is visible on
    any surface — no index segment, no output, no record — and a plain
    retry recomputes everything, matching a no-crash control."""
    from roborock_data_pipeline_spark import pipeline
    from roborock_data_pipeline_spark.operators import (
        funnel_txn,
        incremental_semdedup,
    )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    d1 = docs.where(F.col("doc_id") < 250)
    d2 = docs.where(F.col("doc_id") >= 250)
    state_dir, out = str(tmp_path / "s"), str(tmp_path / "o")
    ctl_state, ctl_out = str(tmp_path / "cs"), str(tmp_path / "co")
    pipeline.mode_curate_stream(spark, d1, emb, state_dir, out, "b1")
    pipeline.mode_curate_stream(spark, d1, emb, ctl_state, ctl_out, "b1")

    real = incremental_semdedup.stage_semantic_update
    state = {"fired": False}

    def bomb(*a, **k):
        if not state["fired"]:
            state["fired"] = True
            raise RuntimeError("injected crash after minhash staging")
        return real(*a, **k)

    # the funnel imports stage_semantic_update inside the call, so the
    # module attribute is the single binding to patch
    monkeypatch.setattr(incremental_semdedup, "stage_semantic_update", bomb)
    with pytest.raises(RuntimeError, match="injected"):
        pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    assert state["fired"]
    # all-or-nothing: NO surface advanced — in particular the MinHash
    # index, which the pre-transaction funnel would have committed
    assert not os.path.isdir(os.path.join(state_dir, "minhash", "batch-b2"))
    assert not os.path.isdir(os.path.join(state_dir, "semantic", "batch-b2"))
    assert not os.path.isdir(os.path.join(out, "batch-b2"))
    assert not _record_exists(out, "b2")
    for surface in (os.path.join(state_dir, "minhash"),
                    os.path.join(state_dir, "semantic"), out):
        assert _staging_empty(surface), surface

    f2 = pipeline.mode_curate_stream(spark, d2, emb, state_dir, out, "b2")
    ctl2 = pipeline.mode_curate_stream(spark, d2, emb, ctl_state, ctl_out,
                                       "b2")
    assert f2 == ctl2
    kept = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out)
        .select("doc_id").collect()
    )
    kept_ctl = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, ctl_out)
        .select("doc_id").collect()
    )
    assert kept == kept_ctl


def test_vacuum_rename_fault_then_retry(spark, tmp_path, monkeypatch):
    """VERDICT r5 #5 chaos: the vacuum's base-publish rename dies →
    the batch log is untouched (every batch dir + every as-of still
    exact), staging clean; the retry vacuums cleanly with identical
    current-state rows."""
    import datetime as dt
    import time

    from roborock_data_pipeline_spark import schemas
    from roborock_data_pipeline_spark.sources import sinks

    wh = str(tmp_path / "wh")
    sinks.setup_warehouse(spark, wh)
    rows = [
        (dt.datetime(2024, 2, 1, 12), "bot1", dt.datetime(2024, 2, 1, 6),
         40.0, 28.1, "vacuum", "auto", None, "completed"),
        (dt.datetime(2024, 2, 1, 12), "bot1", dt.datetime(2024, 2, 1, 9),
         55.0, 33.2, "vacuum", "auto", None, "completed"),
    ]
    for i in range(3):
        sinks.append_rows(
            spark.createDataFrame(rows[i % 2: i % 2 + 1],
                                  schemas.CLEANING_RECORDS),
            wh, "cleaning_records",
        )
    t_all = time.time_ns()
    before_batches = sinks.list_batches(wh, "cleaning_records")
    before_rows = sorted(map(tuple, sinks.read_table(
        spark, wh, "cleaning_records").collect()))

    state = _fail_replace_once(monkeypatch, sinks.VACUUM_BASE_SUFFIX)
    with pytest.raises(OSError, match="injected"):
        sinks.vacuum_table(spark, wh, "cleaning_records", retain_last_n=1)
    assert state["fired"]
    assert sinks.list_batches(wh, "cleaning_records") == before_batches
    assert _staging_empty(wh)
    monkeypatch.undo()

    assert sinks.vacuum_table(spark, wh, "cleaning_records",
                              retain_last_n=1) == 2
    assert sorted(map(tuple, sinks.read_table(
        spark, wh, "cleaning_records").collect())) == before_rows
    assert sorted(map(tuple, sinks.read_table_as_of(
        spark, wh, "cleaning_records", t_all).collect())) == before_rows


def test_append_rows_rename_fault_then_retry(spark, tmp_path, monkeypatch):
    """Warehouse append: rename dies → table byte-identical, staging
    clean; retry lands exactly one batch."""
    import datetime as dt

    from roborock_data_pipeline_spark import schemas
    from roborock_data_pipeline_spark.sources import sinks

    wh = str(tmp_path / "wh")
    sinks.setup_warehouse(spark, wh)
    rows = [
        (dt.datetime(2024, 2, 1, 12), "bot1", dt.datetime(2024, 2, 1, 6),
         40.0, 28.1, "vacuum", "auto", None, "completed"),
    ]
    df = spark.createDataFrame(rows, schemas.CLEANING_RECORDS)

    state = _fail_replace_once(monkeypatch, wh)
    with pytest.raises(OSError, match="injected"):
        sinks.append_rows(df, wh, "cleaning_records")
    assert state["fired"]
    assert sinks.read_table(spark, wh, "cleaning_records").count() == 0
    assert _staging_empty(wh)
    monkeypatch.undo()

    sinks.append_rows(df, wh, "cleaning_records")
    assert sinks.read_table(spark, wh, "cleaning_records").count() == 1


def test_gold_snapshot_swap_fault_rolls_old_back(spark, tmp_path, monkeypatch):
    """Lifetime snapshot publish (r13: one `_current.json` pointer
    commit through the seam): a fault AT the commit point — the exact
    window where the pre-r13 two-rename swap could leave NO table —
    must leave the old snapshot fully serving, and the un-advanced
    in-snapshot watermark makes the retry re-fold the same batches."""
    import datetime as dt

    from roborock_data_pipeline_spark import pipeline, schemas
    from roborock_data_pipeline_spark.sources import commit_provider, sinks
    from roborock_data_pipeline_spark.sources import versioned_dir as vd

    w = str(tmp_path)
    sinks.setup_warehouse(spark, w)
    ts = dt.datetime(2024, 3, 1, 9)
    df = spark.createDataFrame(
        [(ts, "a", ts, 30.0, 10.0, "s", "v", 0, "ok")],
        schemas.CLEANING_RECORDS,
    )
    sinks.append_rows(df, w, "cleaning_records")
    pipeline.refresh_device_lifetime(spark, w)
    before = sorted(pipeline.read_device_lifetime(spark, w).collect())

    ts2 = dt.datetime(2024, 3, 2, 9)
    df2 = spark.createDataFrame(
        [(ts2, "a", ts2, 15.0, 5.5, "s", "v", 0, "ok")],
        schemas.CLEANING_RECORDS,
    )
    sinks.append_rows(df2, w, "cleaning_records")
    # fail exactly the pointer commit for the lifetime table's
    # `_current.json` (the new data dir is already NAMED but not live)
    table_dir = sinks.table_path(w, pipeline.LIFETIME_TABLE)
    pointer = os.path.join(table_dir, vd.CURRENT_POINTER)
    real_swap = commit_provider.BACKEND.swap_pointer
    state = {"fired": False}

    def bomb(path, data):
        if path == pointer and not state["fired"]:
            state["fired"] = True
            raise OSError("injected failure on snapshot publish")
        return real_swap(path, data)

    monkeypatch.setattr(commit_provider.BACKEND, "swap_pointer", bomb)
    with pytest.raises(OSError, match="injected"):
        pipeline.refresh_device_lifetime(spark, w)
    monkeypatch.undo()
    assert state["fired"]
    # old snapshot rolled back: readable, un-advanced
    assert sorted(pipeline.read_device_lifetime(spark, w).collect()) == before
    # retry folds the same batch and converges
    out = pipeline.refresh_device_lifetime(spark, w)
    assert out == {"new_batches": 1, "mode": "delta"}
    got = {r["device_name"]: r["total_clean_count"]
           for r in pipeline.read_device_lifetime(spark, w).collect()}
    assert got == {"a": 2}


def test_overwrite_rows_fault_rolls_old_back(spark, tmp_path, monkeypatch):
    """overwrite_rows (full gold rebuild): same old-or-new contract."""
    from roborock_data_pipeline_spark.sources import sinks

    w = str(tmp_path)
    sinks.setup_warehouse(spark, w)
    one = spark.createDataFrame(
        [("2024-03-01", 1, 10.0, 30, 10.0, 30.0)],
        sinks.WAREHOUSE_TABLES["daily_summary"],
    )
    sinks.overwrite_rows(one, w, "daily_summary")
    table_dir = sinks.table_path(w, "daily_summary")
    real = os.replace
    state = {"fired": False}

    def bomb(src, dst, *a, **k):
        # fires on the publish move of EITHER arm: the legacy
        # table-dir swap (dst == table_dir) or the v2 naming rename
        # of the invisible snapshot batch (dst under table_dir)
        if (
            str(dst).startswith(table_dir)
            and not state["fired"]
            and ".staging" in str(src)
        ):
            state["fired"] = True
            raise OSError("injected failure on overwrite publish")
        return real(src, dst, *a, **k)

    monkeypatch.setattr("os.replace", bomb)
    two = spark.createDataFrame(
        [("2024-03-02", 2, 20.0, 60, 10.0, 30.0)],
        sinks.WAREHOUSE_TABLES["daily_summary"],
    )
    with pytest.raises(OSError, match="injected"):
        sinks.overwrite_rows(two, w, "daily_summary")
    monkeypatch.undo()
    rows = sinks.read_table(spark, w, "daily_summary").collect()
    assert [r["date"] for r in rows] == ["2024-03-01"]  # old rolled back
    sinks.overwrite_rows(two, w, "daily_summary")  # retry converges
    rows = sinks.read_table(spark, w, "daily_summary").collect()
    assert [r["date"] for r in rows] == ["2024-03-02"]


def test_gold_snapshot_lost_put_on_memory_backend(
    spark, tmp_path, monkeypatch
):
    """VERDICT r13 #5: the lifetime gold snapshot's `_current.json`
    commit with an ACKed-BUT-LOST PUT on the RENAME-FREE backend (the
    FaultInjecting twin is FS-based, so this protocol path was only
    exercised rename-full). commit_pointer's verified read-back must
    fail the refresh WHOLE (CommitLostError), the old snapshot must
    keep serving, and the un-advanced in-snapshot watermark makes the
    retry re-fold the same batch and converge."""
    import datetime as dt

    from roborock_data_pipeline_spark import pipeline, schemas
    from roborock_data_pipeline_spark.sources import commit_provider as cp
    from roborock_data_pipeline_spark.sources import sinks
    from roborock_data_pipeline_spark.sources import versioned_dir as vd

    b = cp.InMemoryObjectStoreBackend()
    monkeypatch.setattr(cp, "BACKEND", b)
    monkeypatch.setattr(cp, "_VERIFY_WAIT_S", 0.001)
    w = str(tmp_path)
    sinks.setup_warehouse(spark, w)
    ts = dt.datetime(2024, 3, 1, 9)
    df = spark.createDataFrame(
        [(ts, "a", ts, 30.0, 10.0, "s", "v", 0, "ok")],
        schemas.CLEANING_RECORDS,
    )
    sinks.append_rows(df, w, "cleaning_records")
    pipeline.refresh_device_lifetime(spark, w)
    before = sorted(pipeline.read_device_lifetime(spark, w).collect())

    ts2 = dt.datetime(2024, 3, 2, 9)
    df2 = spark.createDataFrame(
        [(ts2, "a", ts2, 15.0, 5.5, "s", "v", 0, "ok")],
        schemas.CLEANING_RECORDS,
    )
    sinks.append_rows(df2, w, "cleaning_records")
    table_dir = sinks.table_path(w, pipeline.LIFETIME_TABLE)
    pointer = os.path.join(table_dir, vd.CURRENT_POINTER)
    real_swap = b.swap_pointer
    state = {"fired": False}

    def lossy(path, data):
        if path == pointer and not state["fired"]:
            state["fired"] = True
            return  # ACKed, never applied — the lost-PUT mode
        return real_swap(path, data)

    monkeypatch.setattr(b, "swap_pointer", lossy)
    with pytest.raises(cp.CommitLostError):
        pipeline.refresh_device_lifetime(spark, w)
    assert state["fired"]
    # the lost commit failed the refresh WHOLE: old snapshot serving
    assert sorted(pipeline.read_device_lifetime(spark, w).collect()) == before
    # store recovered: the retry folds the same batch and converges
    monkeypatch.setattr(b, "swap_pointer", real_swap)
    out = pipeline.refresh_device_lifetime(spark, w)
    assert out == {"new_batches": 1, "mode": "delta"}
    got = {r["device_name"]: r["total_clean_count"]
           for r in pipeline.read_device_lifetime(spark, w).collect()}
    assert got == {"a": 2}
