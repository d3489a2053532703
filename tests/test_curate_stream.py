"""Streaming curation funnel: both incremental indexes composed into
one ingest path (mode_curate_stream) — dup-free output, keep-first
semantics, exactly-once replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from roborock_data_pipeline_spark import pipeline
from roborock_data_pipeline_spark.operators.incremental_dedup import (
    update_minhash_index,
)
from roborock_data_pipeline_spark.operators.incremental_semdedup import (
    create_semantic_index,
    update_semantic_index,
)
from roborock_data_pipeline_spark.sources.tables import load


@pytest.fixture()
def split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.where(F.col("doc_id") < 250),
        emb.where(F.col("vec_id") < 250),
        docs.where(F.col("doc_id") >= 250),
        emb.where(F.col("vec_id") >= 250),
    )


def _run_two_batches(spark, split, tmp_path):
    d1, e1, d2, e2 = split
    state = str(tmp_path / "state")
    out = str(tmp_path / "curated")
    f1 = pipeline.mode_curate_stream(spark, d1, e1, state, out, "b1")
    f2 = pipeline.mode_curate_stream(spark, d2, e2, state, out, "b2")
    return f1, f2, state, out


def test_curated_stream_output_is_dup_free(spark, split, tmp_path):
    """The core contract: among ALL published docs (across batches),
    no two are near-dups — verified by running both batch detectors
    over the curated output as one fresh batch."""
    f1, f2, state, out = _run_two_batches(spark, split, tmp_path)
    curated = pipeline.read_curated_stream(spark, out)
    n = curated.count()
    assert f1["published"] + f2["published"] == n
    assert f1["input"] == 250 and f2["input"] == 250

    text_pairs = update_minhash_index(
        spark, curated, str(tmp_path / "verify_minhash"), threshold=0.5
    )
    assert text_pairs.count() == 0, text_pairs.collect()[:5]

    cur_emb = split[1].unionByName(split[3]).join(
        curated.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    vdir = str(tmp_path / "verify_sem")
    create_semantic_index(spark, cur_emb, vdir)
    sem_pairs = update_semantic_index(spark, cur_emb, vdir, threshold=0.9)
    assert sem_pairs.count() == 0, sem_pairs.collect()[:5]


def test_curated_stream_accounting_and_gate(spark, split, tmp_path):
    """Gate runs FIRST (rejected docs never reach the indexes), so
    the accounting is exact: published == input - gate_fails -
    dup_losers, and gate_fails matches the shared shingles-based
    bigram expression recomputed independently."""
    from roborock_data_pipeline_spark.functions.text import shingles

    f1, f2, state, out = _run_two_batches(spark, split, tmp_path)
    for fn, batch_docs in ((f1, split[0]), (f2, split[2])):
        bigrams = shingles(F.col("text"), 2)
        frac = 1.0 - F.size(F.array_distinct(bigrams)) / F.size(bigrams).cast(
            "double"
        )
        gate_ok = batch_docs.where(frac <= 0.2).count()
        assert fn["gate_fails"] == fn["input"] - gate_ok
        assert fn["published"] == fn["input"] - fn["gate_fails"] - fn["dup_losers"]


def test_keep_first_apply_distributed_plan_and_semantics(spark):
    """VERDICT r5 #1: the funnel's keep-first apply is fully
    distributed — the survivors' physical plan applies the loser set
    as a BROADCAST ANTI join (no driver-side id set, no isin literal),
    and the per-pair loser rule is exact for all three pair shapes:
    both-new (keep-lowest), new-vs-indexed either way (new loses)."""
    candidates = spark.createDataFrame(
        [(10, "a"), (20, "b"), (30, "c"), (40, "d")], "doc_id long, text string"
    )
    # (10,20) both new -> 20 loses; (30, 5) new-vs-indexed -> 30 loses;
    # (7, 40) indexed-vs-new -> 40 loses; (5, 7) neither new -> no loser.
    pairs = spark.createDataFrame(
        [(10, 20), (30, 5), (7, 40), (5, 7)], "i long, j long"
    )
    losers, survivors = pipeline.keep_first_apply(candidates, pairs)
    assert {r["doc_id"] for r in losers.collect()} == {20, 30, 40}
    assert {r["doc_id"] for r in survivors.collect()} == {10}
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_curate_stream_single_token_doc_survives(spark, tmp_path):
    """r4 review regression: a document with no spaces must pass the
    gate (one joined shingle, frac 0) — the hand-rolled bigram
    expression this replaced crashed element_at on it."""
    d = spark.createDataFrame(
        [(1, "singletoken", "en", "w", 11.0)],
        "doc_id long, text string, lang string, source string, n_chars double",
    )
    e = spark.createDataFrame(
        [(1, [1.0] * 64, 0)], "vec_id long, embedding array<float>, label int"
    )
    f = pipeline.mode_curate_stream(
        spark, d, e, str(tmp_path / "s"), str(tmp_path / "o"), "b1"
    )
    assert f == {"input": 1, "gate_fails": 0, "dup_losers": 0, "published": 1}


def test_curate_stream_replay_is_exactly_once(spark, split, tmp_path):
    """Re-running a committed batch_id returns the recorded counts and
    leaves the curated output byte-identical — the publish dir is the
    commit point."""
    f1, f2, state, out = _run_two_batches(spark, split, tmp_path)
    before = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out).select("doc_id").collect()
    )
    d2, e2 = split[2], split[3]
    f2_replay = pipeline.mode_curate_stream(spark, d2, e2, state, out, "b2")
    assert f2_replay == f2
    after = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out).select("doc_id").collect()
    )
    assert before == after


def test_curated_output_compaction_preserves_replay_and_data(
    spark, split, tmp_path
):
    """The curated corpus grows one publish dir per ingest exactly
    like the indexes did — compact_curated_output merges them into a
    base segment without changing what readers see, what replays
    return, or how the next ingest behaves."""
    import os

    f1, f2, state, out = _run_two_batches(spark, split, tmp_path)

    def ids():
        return sorted(
            r["doc_id"]
            for r in pipeline.read_curated_stream(spark, out)
            .select("doc_id").collect()
        )

    before = ids()
    assert pipeline.compact_curated_output(spark, out) == 2
    assert ids() == before  # grace window: manifest filters absorbed dirs
    assert pipeline.compact_curated_output(spark, out) == 0  # deferred GC
    assert not [d for d in os.listdir(out) if d.startswith("batch-")]
    assert len([d for d in os.listdir(out) if d.startswith("base-")]) == 1
    assert ids() == before

    # replay of a compacted batch id returns the recorded counts and
    # publishes nothing
    f2_replay = pipeline.mode_curate_stream(
        spark, split[2], split[3], state, out, "b2"
    )
    assert f2_replay == f2
    assert ids() == before

    # the next ingest still dedups against everything published: an
    # exact copy of a published doc (new id) must lose
    kept_id = before[0]
    d3 = split[0].where(F.col("doc_id") == kept_id).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    e3 = split[1].where(F.col("vec_id") == kept_id).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    f3 = pipeline.mode_curate_stream(spark, d3, e3, state, out, "b3")
    assert f3["published"] == 0 and f3["dup_losers"] == 1
    # second compaction folds b3's (empty) publish into the next base
    # and keeps every earlier replay record
    assert pipeline.compact_curated_output(spark, out) == 2
    assert pipeline.mode_curate_stream(
        spark, split[2], split[3], state, out, "b2"
    ) == f2
    assert pipeline.mode_curate_stream(spark, d3, e3, state, out, "b3") == f3
    assert ids() == before


def test_funnel_maintenance_compacts_all_three_surfaces(
    spark, split, tmp_path
):
    """One maintenance call compacts indexes + curated output; the
    funnel keeps working identically afterwards (replay + dedup)."""
    import os

    f1, f2, state, out = _run_two_batches(spark, split, tmp_path)
    merged = pipeline.funnel_maintenance(spark, state, out)
    assert merged == {"minhash": 2, "semantic": 2, "curated": 2}
    # second pass: everything already compact; its entry GC removes
    # the batch dirs the first pass's commits superseded (grace window)
    assert pipeline.funnel_maintenance(spark, state, out) == {
        "minhash": 0, "semantic": 0, "curated": 0
    }
    for d in (os.path.join(state, "minhash"),
              os.path.join(state, "semantic"), out):
        assert not [x for x in os.listdir(d) if x.startswith("batch-")]
    # funnel replay and forward progress unaffected
    assert pipeline.mode_curate_stream(
        spark, split[2], split[3], state, out, "b2"
    ) == f2


def _stage_stream_file(df, stream_dir: str, name: str) -> None:
    """Land one parquet FILE (not a directory) in the stream source
    dir — the unit the file source lists and, with
    maxFilesPerTrigger=1, the unit of one micro-batch."""
    import glob
    import os
    import shutil

    tmp = os.path.join(os.path.dirname(stream_dir), f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(stream_dir, exist_ok=True)
    os.replace(part, os.path.join(stream_dir, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def test_funnel_under_real_streaming_engine_with_crash_replay(
    spark, sf_dir, tmp_path
):
    """VERDICT r4 #2: the funnel wired into readStream →
    writeStream.foreachBatch with a checkpoint, driven through ≥2
    micro-batches by the real engine, then killed AFTER a batch's
    publish but BEFORE its checkpoint commit. On restart Spark
    replays that epoch with the same id; the funnel must return the
    recorded counts and publish nothing twice."""
    import os

    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    stream_dir = str(tmp_path / "incoming")
    state, out = str(tmp_path / "state"), str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    _stage_stream_file(docs.where(F.col("doc_id") < 150), stream_dir, "f0")
    _stage_stream_file(
        docs.where((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)),
        stream_dir, "f1",
    )

    calls: list[tuple[str, dict]] = []

    def crash_after_publish(epoch_id: str, counts: dict) -> None:
        calls.append((epoch_id, counts))
        if epoch_id == "1":
            raise RuntimeError("injected crash after publish")

    q = pipeline.run_curate_stream(
        spark, stream_dir, emb, state, out, ckpt,
        max_files_per_trigger=1, on_batch=crash_after_publish,
    )
    try:
        q.awaitTermination()
        raise AssertionError("query should have died on the injected crash")
    except (StreamingQueryException, Py4JJavaError):
        pass

    # both micro-batches ran and PUBLISHED; only epoch 0's checkpoint
    # commit landed — epoch 1 is the publish-but-not-committed window
    assert [e for e, _ in calls] == ["0", "1"]
    assert sorted(f for f in os.listdir(ckpt + "/commits")
                  if not f.startswith(".")) == ["0"]
    assert os.path.isdir(out + "/batch-0") and os.path.isdir(out + "/batch-1")
    published_after_crash = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out).select("doc_id").collect()
    )

    # restart on the same checkpoint: Spark replays epoch 1 verbatim
    calls2: list[tuple[str, dict]] = []
    q2 = pipeline.run_curate_stream(
        spark, stream_dir, emb, state, out, ckpt,
        max_files_per_trigger=1,
        on_batch=lambda e, c: calls2.append((e, c)),
    )
    q2.awaitTermination()
    assert [e for e, _ in calls2] == ["1"], "restart must replay epoch 1 only"
    assert calls2[0][1] == calls[1][1], "replay must return recorded counts"
    published_after_restart = sorted(
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out).select("doc_id").collect()
    )
    assert published_after_restart == published_after_crash, "double publish"
    assert sorted(f for f in os.listdir(ckpt + "/commits")
                  if not f.startswith(".")) == ["0", "1"]

    # the stream keeps going: a third file becomes epoch 2, curated
    # against the indexes the replayed epochs built
    _stage_stream_file(
        docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 450)),
        stream_dir, "f2",
    )
    calls3: list[tuple[str, dict]] = []
    q3 = pipeline.run_curate_stream(
        spark, stream_dir, emb, state, out, ckpt,
        max_files_per_trigger=1,
        on_batch=lambda e, c: calls3.append((e, c)),
    )
    q3.awaitTermination()
    assert [e for e, _ in calls3] == ["2"]
    curated = pipeline.read_curated_stream(spark, out)
    assert curated.count() == sum(c["published"] for c in
                                  [calls[0][1], calls[1][1], calls3[0][1]])
    # dup-free across everything the real engine published
    text_pairs = update_minhash_index(
        spark, curated, str(tmp_path / "verify_mh"), threshold=0.5
    )
    assert text_pairs.count() == 0


def test_streaming_runs_survive_maintenance_between_them(
    spark, sf_dir, tmp_path
):
    """The full ops lifecycle: stream a batch in under the real
    engine, run funnel_maintenance (all three surfaces compact), then
    stream the next batch on the SAME checkpoint. The new batch must
    still dedup against everything published pre-compaction, and a
    forced replay of the compacted epoch must return its recorded
    counts."""
    import os

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    stream_dir = str(tmp_path / "incoming")
    state, out = str(tmp_path / "state"), str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    _stage_stream_file(docs.where(F.col("doc_id") < 200), stream_dir, "f0")
    _stage_stream_file(
        docs.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)),
        stream_dir, "f1",
    )
    calls: list[tuple[str, dict]] = []
    q = pipeline.run_curate_stream(
        spark, stream_dir, emb, state, out, ckpt,
        max_files_per_trigger=1, on_batch=lambda e, c: calls.append((e, c)),
    )
    q.awaitTermination()
    assert [e for e, _ in calls] == ["0", "1"]
    published = pipeline.read_curated_stream(spark, out).count()

    merged = pipeline.funnel_maintenance(spark, state, out)
    assert merged == {"minhash": 2, "semantic": 2, "curated": 2}
    pipeline.funnel_maintenance(spark, state, out)  # deferred GC pass
    assert not [d for d in os.listdir(out) if d.startswith("batch-")]

    # replay of a compacted epoch returns its recorded counts
    assert pipeline.mode_curate_stream(
        spark, docs.limit(0), emb, state, out, "1"
    ) == calls[1][1]

    # next micro-batch: exact copies of already-published docs (new
    # ids) must ALL lose against the compacted indexes
    kept_ids = [
        r["doc_id"]
        for r in pipeline.read_curated_stream(spark, out)
        .select("doc_id").limit(20).collect()
    ]
    dup_docs = docs.where(F.col("doc_id").isin(kept_ids)).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    dup_emb = emb.where(F.col("vec_id").isin(kept_ids)).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    _stage_stream_file(dup_docs, stream_dir, "f2")
    calls3: list[tuple[str, dict]] = []
    q3 = pipeline.run_curate_stream(
        spark, stream_dir, dup_emb.unionByName(emb), state, out, ckpt,
        max_files_per_trigger=1, on_batch=lambda e, c: calls3.append((e, c)),
    )
    q3.awaitTermination()
    assert [e for e, _ in calls3] == ["2"]
    f3 = calls3[0][1]
    assert f3["published"] == 0
    assert f3["dup_losers"] == f3["input"] - f3["gate_fails"]
    assert pipeline.read_curated_stream(spark, out).count() == published


def test_curate_stream_keeps_first_arrival(spark, sf_dir, tmp_path):
    """Keep-first: a later batch's doc that near-dups an already
    published doc is dropped even when its id is LOWER — the
    published doc is never retracted."""
    docs = load(spark, sf_dir, "documents").limit(0)
    schema = "doc_id long, text string, lang string, source string, n_chars double"
    d1 = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta", "en", "w", 45.0)],
        schema,
    )
    d2 = spark.createDataFrame(
        [(5, "alpha beta gamma delta epsilon zeta eta theta", "en", "w", 45.0)],
        schema,
    )
    emb_schema = "vec_id long, embedding array<float>, label int"
    e1 = spark.createDataFrame([(100, [1.0] * 64, 0)], emb_schema)
    e2 = spark.createDataFrame([(5, [0.0] * 32 + [1.0] * 32, 1)], emb_schema)
    state, out = str(tmp_path / "s"), str(tmp_path / "o")
    f1 = pipeline.mode_curate_stream(spark, d1, e1, state, out, "b1")
    f2 = pipeline.mode_curate_stream(spark, d2, e2, state, out, "b2")
    assert f1["published"] == 1
    assert f2["published"] == 0 and f2["dup_losers"] == 1
    kept = [r["doc_id"] for r in pipeline.read_curated_stream(spark, out).collect()]
    assert kept == [100]  # first arrival wins despite the higher id
