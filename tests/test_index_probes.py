"""Read-only probe endpoints + the offline semantic rebuild."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from roborock_data_pipeline_spark.sources.tables import load


def _snapshot(d):
    return sorted(
        os.path.join(r, x)
        for r, _dirs, files in os.walk(d)
        for x in files
    )


def test_probe_minhash_matches_update_new_old_pairs(spark, sf_dir, tmp_path):
    """probe(index, docs) must equal the new↔indexed subset of what an
    update ingesting the same docs would emit — with zero writes."""
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        compact_minhash_index,
        probe_minhash_index,
        update_minhash_index,
    )

    docs = load(spark, sf_dir, "documents")
    evens = docs.where(F.col("doc_id") % 2 == 0)
    odds = docs.where(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh")
    ctl = str(tmp_path / "mh_ctl")
    update_minhash_index(spark, evens, idx, batch_id="b1")
    update_minhash_index(spark, evens, ctl, batch_id="b1")

    before = _snapshot(idx)
    probed = {
        (r.probe_id, r.index_id, r.jaccard)
        for r in probe_minhash_index(spark, odds, idx).collect()
    }
    assert _snapshot(idx) == before, "probe must not write"

    want = {
        (r.doc_id_1 if r.doc_id_1 % 2 == 1 else r.doc_id_2,
         r.doc_id_2 if r.doc_id_1 % 2 == 1 else r.doc_id_1,
         r.jaccard)
        for r in update_minhash_index(spark, odds, ctl, batch_id="b2").collect()
        if (r.doc_id_1 % 2) != (r.doc_id_2 % 2)  # new↔indexed only
    }
    assert probed == want and probed

    # identical through compaction (single-batch index → merge is a
    # no-op; add a second batch to make it real)
    update_minhash_index(spark, odds, idx, batch_id="b2")
    probe3 = docs.where(F.col("doc_id") < 40).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    got_pre = {
        tuple(r) for r in probe_minhash_index(spark, probe3, idx).collect()
    }
    assert compact_minhash_index(spark, idx) == 2
    got_post = {
        tuple(r) for r in probe_minhash_index(spark, probe3, idx).collect()
    }
    assert got_pre == got_post and got_pre


def test_probe_semantic_matches_update_new_old_pairs(spark, sf_dir, tmp_path):
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        create_semantic_index,
        probe_semantic_index,
        update_semantic_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    evens = emb.where(F.col("vec_id") % 2 == 0)
    odds = emb.where(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "sem")
    ctl = str(tmp_path / "sem_ctl")
    create_semantic_index(spark, emb, idx)
    create_semantic_index(spark, emb, ctl)
    update_semantic_index(spark, evens, idx, threshold=0.25, batch_id="b1")
    update_semantic_index(spark, evens, ctl, threshold=0.25, batch_id="b1")

    before = _snapshot(idx)
    probed = {
        (r.probe_id, r.index_id, r.cosine)
        for r in probe_semantic_index(spark, odds, idx,
                                      threshold=0.25).collect()
    }
    assert _snapshot(idx) == before, "probe must not write"

    want = {
        (r.vec_id_1 if r.vec_id_1 % 2 == 1 else r.vec_id_2,
         r.vec_id_2 if r.vec_id_1 % 2 == 1 else r.vec_id_1,
         r.cosine)
        for r in update_semantic_index(
            spark, odds, ctl, threshold=0.25, batch_id="b2"
        ).collect()
        if (r.vec_id_1 % 2) != (r.vec_id_2 % 2)
    }
    assert probed == want and probed


def test_probe_id_collision_still_surfaces_match(spark, sf_dir, tmp_path):
    """ADVICE r5: probe ids are external to the index namespace — a
    probe whose id collides with an indexed id must still surface its
    (here: exact) duplicate, both text and semantic. The old
    id-inequality filter silently suppressed exactly this match."""
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        probe_minhash_index,
        update_minhash_index,
    )
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        create_semantic_index,
        probe_semantic_index,
        update_semantic_index,
    )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    some = docs.where(F.col("doc_id") < 50)
    mh = str(tmp_path / "mh")
    update_minhash_index(spark, some, mh, batch_id="b1")
    # probe the SAME rows (same ids, same text): every probe doc's
    # exact self-duplicate in the index must come back
    hits = probe_minhash_index(spark, some, mh, threshold=0.9)
    self_hits = {
        r.probe_id
        for r in hits.where(F.col("probe_id") == F.col("index_id")).collect()
    }
    want = {r.doc_id for r in some.select("doc_id").collect()}
    assert self_hits == want

    sem = str(tmp_path / "sem")
    some_e = emb.where(F.col("vec_id") < 50)
    create_semantic_index(spark, emb, sem)
    update_semantic_index(spark, some_e, sem, threshold=0.9, batch_id="b1")
    shits = probe_semantic_index(spark, some_e, sem, threshold=0.99)
    sself = {
        r.probe_id
        for r in shits.where(F.col("probe_id") == F.col("index_id")).collect()
    }
    assert sself == {r.vec_id for r in some_e.select("vec_id").collect()}


def test_probe_exclude_self_drops_only_self_rows(spark, sf_dir, tmp_path):
    """VERDICT r7 #5: a caller re-probing docs that are ALREADY in the
    index shares the id namespace — by default every probe doc comes
    back as its own trivial jaccard/cosine-1.0 match. exclude_self
    drops exactly the probe_id == index_id rows and nothing else,
    for both the text and semantic probes."""
    from roborock_data_pipeline_spark.operators.incremental_dedup import (
        probe_minhash_index,
        update_minhash_index,
    )
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        create_semantic_index,
        probe_semantic_index,
        update_semantic_index,
    )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    some = docs.where(F.col("doc_id") < 80)
    mh = str(tmp_path / "mh")
    update_minhash_index(spark, some, mh, batch_id="b1")
    dflt = {
        (r.probe_id, r.index_id)
        for r in probe_minhash_index(spark, some, mh, threshold=0.5).collect()
    }
    noself = {
        (r.probe_id, r.index_id)
        for r in probe_minhash_index(
            spark, some, mh, threshold=0.5, exclude_self=True
        ).collect()
    }
    assert noself == {(p, i) for p, i in dflt if p != i}
    assert all(p != i for p, i in noself)
    assert len(dflt) > len(noself)  # the self rows existed by default

    sem = str(tmp_path / "sem")
    some_e = emb.where(F.col("vec_id") < 80)
    create_semantic_index(spark, emb, sem)
    update_semantic_index(spark, some_e, sem, threshold=0.5, batch_id="b1")
    sdflt = {
        (r.probe_id, r.index_id)
        for r in probe_semantic_index(
            spark, some_e, sem, threshold=0.5
        ).collect()
    }
    snoself = {
        (r.probe_id, r.index_id)
        for r in probe_semantic_index(
            spark, some_e, sem, threshold=0.5, exclude_self=True
        ).collect()
    }
    assert snoself == {(p, i) for p, i in sdflt if p != i}
    assert len(sdflt) > len(snoself)


def test_rebuild_semantic_index_fresh_epoch(spark, sf_dir, tmp_path):
    """Offline rebuild: retrained centroids over the live vectors,
    everything republished as one batch with an empty pair set, fresh
    replay epoch, and the rebuilt index immediately useful for both
    probes and further ingests."""
    from roborock_data_pipeline_spark.operators.incremental_semdedup import (
        create_semantic_index,
        probe_semantic_index,
        rebuild_semantic_index,
        update_semantic_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "sem")
    dest = str(tmp_path / "sem_rebuilt")
    create_semantic_index(spark, emb, idx)
    for i in range(2):
        update_semantic_index(
            spark, emb.where(F.col("vec_id") % 2 == i), idx,
            threshold=0.25, batch_id=f"b{i}",
        )

    n = rebuild_semantic_index(spark, idx, dest)
    assert n == emb.count()
    assert os.path.isdir(os.path.join(dest, "centroids"))
    assert sorted(
        d for d in os.listdir(dest) if d.startswith("batch-")
    ) == ["batch-rebuild"]
    # the rebuild batch's replay record is the empty set
    replay = update_semantic_index(
        spark, emb.limit(0), dest, threshold=0.25, batch_id="rebuild"
    )
    assert replay.count() == 0
    # fresh epoch: an id committed in the OLD index is unknown here, so
    # an update under it computes fresh work (and finds the shifted
    # copies' duplicates against the rebuilt corpus)
    shifted = emb.where(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    pairs = update_semantic_index(
        spark, shifted, dest, threshold=0.9, batch_id="b0"
    )
    assert pairs.count() > 0
    # and the probe endpoint sees the rebuilt corpus too
    probed = probe_semantic_index(
        spark,
        emb.where(F.col("vec_id") < 5).withColumn(
            "vec_id", F.col("vec_id") + 2_000_000
        ),
        dest,
        threshold=0.9,
    )
    assert probed.count() > 0
