"""Index compaction (VERDICT r4 #3): merging committed batches into a
base segment must change NOTHING observable — probe/update results,
replay of pre-compaction batch ids — while collapsing the directory
count to O(1). Plus the ADVICE r4 old-layout fallback."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _entries(idx, prefix):
    return sorted(d for d in os.listdir(idx) if d.startswith(prefix))


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_minhash_compaction_preserves_results(spark, sf_dir, tmp_path):
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        compact_minhash_index,
        update_minhash_index,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    idx_c = str(tmp_path / "mh_compacted")
    idx_u = str(tmp_path / "mh_control")
    replay_sets = {}
    for i in range(3):
        batch = docs.where(F.col("doc_id") % 3 == i)
        got = update_minhash_index(spark, batch, idx_c, batch_id=f"c{i}")
        ctl = update_minhash_index(spark, batch, idx_u, batch_id=f"c{i}")
        assert _pairs(got) == _pairs(ctl)
        replay_sets[f"c{i}"] = _pairs(got)

    assert compact_minhash_index(spark, idx_c) == 3
    # ADVICE r5: GC is deferred — absorbed batch dirs survive until
    # the NEXT maintenance pass (reader grace window), filtered from
    # the live set by the base's manifest meanwhile
    assert len(_entries(idx_c, "batch-")) == 3
    assert len(_entries(idx_c, "base-")) == 1
    # next pass: nothing left to merge, deferred GC runs
    assert compact_minhash_index(spark, idx_c) == 0
    assert _entries(idx_c, "batch-") == []
    assert len(_entries(idx_c, "base-")) == 1

    # replay of every pre-compaction batch id returns its stored pairs
    for bid, want in replay_sets.items():
        got = update_minhash_index(spark, docs.limit(0), idx_c, batch_id=bid)
        assert _pairs(got) == want, f"replay {bid} diverged after compaction"

    # a post-compaction ingest sees the identical index state: shifted
    # copies of existing docs are exact near-dups of the indexed corpus
    fresh = docs.where(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    got4 = _pairs(update_minhash_index(spark, fresh, idx_c, batch_id="c4"))
    ctl4 = _pairs(update_minhash_index(spark, fresh, idx_u, batch_id="c4"))
    assert got4 == ctl4
    assert got4, "shifted duplicates must pair with the index"

    # second compaction folds the new batch into the next-gen base and
    # keeps ALL earlier replay records (old base lingers until the
    # next pass's deferred GC)
    assert compact_minhash_index(spark, idx_c) == 2  # base + c4
    assert len(_entries(idx_c, "base-")) == 2
    assert compact_minhash_index(spark, idx_c) == 0  # deferred GC
    assert len(_entries(idx_c, "base-")) == 1
    for bid, want in {**replay_sets, "c4": got4}.items():
        got = update_minhash_index(spark, docs.limit(0), idx_c, batch_id=bid)
        assert _pairs(got) == want


def test_semantic_compaction_preserves_results(spark, sf_dir, tmp_path):
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        compact_semantic_index,
        create_semantic_index,
        update_semantic_index,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    idx_c = str(tmp_path / "sem_compacted")
    idx_u = str(tmp_path / "sem_control")
    create_semantic_index(spark, emb, idx_c)
    create_semantic_index(spark, emb, idx_u)
    replay_sets = {}
    for i in range(3):
        batch = emb.where(F.col("vec_id") % 3 == i)
        got = update_semantic_index(
            spark, batch, idx_c, threshold=0.25, batch_id=f"s{i}"
        )
        ctl = update_semantic_index(
            spark, batch, idx_u, threshold=0.25, batch_id=f"s{i}"
        )
        assert _pairs(got) == _pairs(ctl)
        replay_sets[f"s{i}"] = _pairs(got)
    assert replay_sets["s1"] or replay_sets["s2"], "need non-empty pairs"

    assert compact_semantic_index(spark, idx_c) == 3
    assert len(_entries(idx_c, "batch-")) == 3  # deferred-GC grace
    assert compact_semantic_index(spark, idx_c) == 0
    assert _entries(idx_c, "batch-") == []
    assert len(_entries(idx_c, "base-")) == 1
    assert os.path.isdir(os.path.join(idx_c, "centroids"))  # untouched

    for bid, want in replay_sets.items():
        got = update_semantic_index(
            spark, emb.limit(0), idx_c, threshold=0.25, batch_id=bid
        )
        assert _pairs(got) == want, f"replay {bid} diverged after compaction"

    fresh = emb.where(F.col("vec_id") < 30).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    got4 = update_semantic_index(
        spark, fresh, idx_c, threshold=0.25, batch_id="s4"
    )
    ctl4 = update_semantic_index(
        spark, fresh, idx_u, threshold=0.25, batch_id="s4"
    )
    assert _pairs(got4) == _pairs(ctl4)
    assert _pairs(got4), "shifted duplicates must pair with the index"


def test_compaction_crash_window_is_consistent(spark, sf_dir, tmp_path,
                                               monkeypatch):
    """Crash between base commit and GC: the new base AND the absorbed
    batch dirs coexist on disk. Readers must not double-count (the
    manifest filters absorbed ids) and the next compact call finishes
    the cleanup."""
    from roborock_data_pipeline_spark.operators import index_segments
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        compact_minhash_index,
        update_minhash_index,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh_crash")
    idx_u = str(tmp_path / "mh_crash_control")
    for i in range(2):
        batch = docs.where(F.col("doc_id") % 2 == i)
        update_minhash_index(spark, batch, idx, batch_id=f"k{i}")
        update_minhash_index(spark, batch, idx_u, batch_id=f"k{i}")

    monkeypatch.setattr(index_segments, "gc_superseded", lambda d: None)
    assert compact_minhash_index(spark, idx) == 2
    monkeypatch.undo()
    # crash window: base committed, absorbed batch dirs still present
    assert len(_entries(idx, "base-")) == 1
    assert len(_entries(idx, "batch-")) == 2

    # an update in the window must see each posting exactly once —
    # identical pairs to the never-compacted control
    fresh = docs.where(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    got = update_minhash_index(spark, fresh, idx, batch_id="k2")
    ctl = update_minhash_index(spark, fresh, idx_u, batch_id="k2")
    assert _pairs(got) == _pairs(ctl)

    # next compact runs the deferred GC at entry (absorbed k0/k1 dirs
    # finally go away) and merges base + k2 into the next generation;
    # the pass after that cleans what THAT commit superseded
    compact_minhash_index(spark, idx)
    assert _entries(idx, "batch-") == ["batch-k2"]
    assert len(_entries(idx, "base-")) == 2
    compact_minhash_index(spark, idx)
    assert _entries(idx, "batch-") == []
    assert len(_entries(idx, "base-")) == 1


def test_concurrent_compactions_exactly_one_wins(spark, sf_dir, tmp_path,
                                                 monkeypatch):
    """VERDICT r5 #4: the single-writer assumption is now a CHECKED
    invariant. Two interleaved compaction writers over the same index:
    the one that commits first wins; the straggler's generation CAS
    raises ConcurrentWriterError, its staging is cleaned up, and the
    index state is exactly the winner's (results identical to a
    never-raced control)."""
    import pytest

    from roborock_data_pipeline_spark.operators import incremental_dedup
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        compact_minhash_index,
        update_minhash_index,
    )
    from roborock_data_pipeline_spark.operators.index_segments import (
        ConcurrentWriterError,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh_race")
    ctl = str(tmp_path / "mh_race_control")
    for i in range(2):
        batch = docs.where(F.col("doc_id") % 2 == i)
        update_minhash_index(spark, batch, idx, batch_id=f"r{i}")
        update_minhash_index(spark, batch, ctl, batch_id=f"r{i}")

    real_carry = incremental_dedup.carry_pairs
    state = {"raced": False}

    def racing_carry(staged, base, batches):
        if not state["raced"]:
            state["raced"] = True
            # the OTHER writer runs a complete compaction inside our
            # stage-to-commit window and commits first
            compact_minhash_index(spark, idx)
        return real_carry(staged, base, batches)

    monkeypatch.setattr(incremental_dedup, "carry_pairs", racing_carry)
    with pytest.raises(ConcurrentWriterError, match="concurrent writer"):
        compact_minhash_index(spark, idx)
    monkeypatch.undo()

    # exactly one base committed (the inner winner's); loser staging gone
    assert len(_entries(idx, "base-")) == 1
    assert not os.listdir(os.path.join(idx, ".staging"))
    # index state is the winner's: fresh near-dups match the control
    fresh = docs.where(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    got = update_minhash_index(spark, fresh, idx, batch_id="r2")
    want = update_minhash_index(spark, fresh, ctl, batch_id="r2")
    assert _pairs(got) == _pairs(want) and _pairs(got)


def test_concurrent_batch_publish_same_id_loses_loudly(spark, sf_dir,
                                                       tmp_path, monkeypatch):
    """Two ingest writers racing the SAME batch id: the second publish
    hits the committed directory and raises ConcurrentWriterError
    (instead of silently interleaving); the committed state is the
    winner's and a plain replay returns its stored pairs."""
    import pytest

    from roborock_data_pipeline_spark.operators import (
        incremental_dedup,
        index_segments,
    )
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        update_minhash_index,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh_batch_race")
    batch = docs.where(F.col("doc_id") < 100)

    real_publish = index_segments.publish_segment
    state = {"raced": False}

    def racing_publish(staged, dest):
        if not state["raced"] and dest.endswith("batch-x"):
            state["raced"] = True
            # the other writer commits the same batch id first
            update_minhash_index(spark, batch, idx, batch_id="x")
        return real_publish(staged, dest)

    monkeypatch.setattr(incremental_dedup, "publish_segment",
                        racing_publish)
    with pytest.raises(index_segments.ConcurrentWriterError,
                       match="concurrent writer"):
        update_minhash_index(spark, batch, idx, batch_id="x")
    monkeypatch.undo()

    # winner's commit stands; replay returns its stored pair set
    assert _entries(idx, "batch-") == ["batch-x"]
    assert not os.listdir(os.path.join(idx, ".staging"))
    replay = update_minhash_index(spark, docs.limit(0), idx, batch_id="x")
    want = update_minhash_index(spark, batch, str(tmp_path / "mh_ctl"),
                                batch_id="x")
    assert _pairs(replay) == _pairs(want)


def test_old_vector_layout_fallback_and_clear_replay_error(
    spark, sf_dir, tmp_path
):
    """ADVICE r4: indexes published before the stored-pairs format
    kept vectors at the batch root. Reading them must still work;
    replaying (or compacting) such a batch fails with a clear rebuild
    message, because its replay record genuinely never existed."""
    import shutil

    import pytest

    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        compact_semantic_index,
        create_semantic_index,
        update_semantic_index,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "sem_old")
    idx_u = str(tmp_path / "sem_old_control")
    create_semantic_index(spark, emb, idx)
    create_semantic_index(spark, emb, idx_u)
    old = emb.where(F.col("vec_id") % 2 == 0)
    update_semantic_index(spark, old, idx, threshold=0.25, batch_id="v1")
    update_semantic_index(spark, old, idx_u, threshold=0.25, batch_id="v1")

    # rewrite batch-v1 to the pre-r4 layout: vectors at root, no pairs
    bdir = os.path.join(idx, "batch-v1")
    vdir = os.path.join(bdir, "vectors")
    for f in os.listdir(vdir):
        os.replace(os.path.join(vdir, f), os.path.join(bdir, f))
    os.rmdir(vdir)
    shutil.rmtree(os.path.join(bdir, "pairs"))

    # new ingest still reads the old-layout vectors
    newer = emb.where(F.col("vec_id") % 2 == 1)
    got = update_semantic_index(spark, newer, idx, threshold=0.25,
                                batch_id="v2")
    ctl = update_semantic_index(spark, newer, idx_u, threshold=0.25,
                                batch_id="v2")
    assert _pairs(got) == _pairs(ctl)

    # replay and compaction both name the rebuild path clearly
    with pytest.raises(ValueError, match="rebuild the index"):
        update_semantic_index(spark, emb.limit(0), idx, threshold=0.25,
                              batch_id="v1")
    with pytest.raises(ValueError, match="rebuild the index"):
        compact_semantic_index(spark, idx)
