"""Persisted incremental BM25 index lifecycle (VERDICT r10 #2).

Pins: incremental update / idempotent replay / probe correctness
(scores equal the ad-hoc oracle-checked q_bm25_search to its 6dp
contract on the same corpus) / compaction equivalence / chaos (a
fault before the atomic publish leaves nothing visible and a retry
converges) / term-pruned probe scan.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from roborock_data_pipeline_spark.operators.incremental_bm25 import (
    compact_bm25_index,
    probe_bm25_index,
    update_bm25_index,
)
from roborock_data_pipeline_spark.operators.text import (
    _BM25_QUERY_TERMS,
    q_bm25_search,
)
from roborock_data_pipeline_spark.functions.text import tokens
from roborock_data_pipeline_spark.sources.tables import load


def _corpus_terms(spark, sf_dir) -> list[str]:
    """The same query terms q_bm25_search auto-derives (top-df)."""
    d = load(spark, sf_dir, "documents")
    rows = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .count()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(_BM25_QUERY_TERMS)
        .collect()
    )
    return [r["term"] for r in rows]


def _scores(df) -> dict[int, float]:
    return {r["doc_id"]: r["bm25"] for r in df.collect()}


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    """Index built from the documents table in THREE ingest batches —
    the incremental path, not a one-shot build."""
    d = str(tmp_path_factory.mktemp("bm25") / "idx")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    for i in range(3):
        update_bm25_index(
            spark, docs.where(F.col("doc_id") % 3 == i), d, batch_id=f"b{i}"
        )
    return d


def test_probe_matches_adhoc_query_6dp(spark, sf_dir, idx):
    """THE equivalence gate: the persisted index's probe returns the
    same top-k docs with the same 6dp scores as the corpus-rescanning
    q_bm25_search on the identical corpus and query terms."""
    expected = _scores(q_bm25_search(spark, sf_dir))
    got = _scores(probe_bm25_index(spark, idx, _corpus_terms(spark, sf_dir)))
    assert got == expected


def test_replay_is_noop(spark, sf_dir, idx):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    res = update_bm25_index(spark, docs.limit(5), idx, batch_id="b1")
    assert res.get("replayed") == 1
    assert sorted(
        d for d in os.listdir(idx) if d.startswith("batch-")
    ) == ["batch-b0", "batch-b1", "batch-b2"]


def test_incremental_equals_rebuilt(spark, sf_dir, idx, tmp_path):
    """Three incremental batches ≡ one-shot ingest of the full
    corpus: identical probe output (BM25 state is mergeable, so the
    split must be invisible)."""
    one = str(tmp_path / "oneshot")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    update_bm25_index(spark, docs, one, batch_id="all")
    terms = _corpus_terms(spark, sf_dir)
    assert _scores(probe_bm25_index(spark, one, terms)) == _scores(
        probe_bm25_index(spark, idx, terms)
    )


def test_compaction_preserves_probe(spark, sf_dir, idx):
    terms = _corpus_terms(spark, sf_dir)
    before = _scores(probe_bm25_index(spark, idx, terms))
    assert compact_bm25_index(spark, idx) == 3
    assert _scores(probe_bm25_index(spark, idx, terms)) == before
    # further ingest on top of the base keeps probing consistently
    assert compact_bm25_index(spark, idx) == 0  # already compact


def test_update_fault_publishes_nothing(spark, sf_dir, tmp_path, monkeypatch):
    import roborock_data_pipeline_spark.operators.incremental_bm25 as m

    d = str(tmp_path / "chaos")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").limit(20)

    def bomb(staged, dest):
        raise OSError("injected failure before publish rename")

    monkeypatch.setattr(m, "publish_segment", bomb)
    with pytest.raises(OSError, match="injected"):
        update_bm25_index(spark, docs, d, batch_id="c1")
    monkeypatch.undo()
    assert not any(
        x.startswith("batch-") for x in os.listdir(d)
    )  # nothing visible
    assert not os.listdir(os.path.join(d, ".staging"))  # staging cleaned
    # retry converges
    res = update_bm25_index(spark, docs, d, batch_id="c1")
    assert res["docs"] == 20
    got = probe_bm25_index(spark, d, _corpus_terms(spark, sf_dir), top_k=5)
    assert got.count() == 5


def test_probe_prunes_postings_scan(spark, sf_dir, idx):
    """The probe's term filter reaches the postings parquet scan
    (PushedFilters In(term, ...)) — the property that makes a probe
    index-metadata-sized instead of corpus-sized at 100 TB."""
    from roborock_data_pipeline_spark.plans.inspect import pushed_filters

    df = probe_bm25_index(spark, idx, ["alpha", "beta"])
    assert "term" in pushed_filters(df)


def test_probe_reads_postings_and_stats_only(spark, sf_dir, idx):
    """r12 layout (VERDICT r11 missing-#2): doc lengths ride ON the
    pruned posting rows, so the probe's executed plan scans NO
    doclens table — the one corpus-sized (n_docs-row) read the r11
    probe still paid. Only term-pruned postings + the
    segments-count-sized stats remain."""
    from roborock_data_pipeline_spark.plans.inspect import plan_string

    df = probe_bm25_index(spark, idx, ["alpha", "beta"])
    plan = plan_string(df)
    assert "doclens" not in plan
    assert "postings" in plan and "stats" in plan


def _legacy_segment(spark, docs, seg_dir):
    """Write an r11-layout segment: 3-column postings + a separate
    doclens table + stats."""
    from roborock_data_pipeline_spark.operators.incremental_bm25 import (
        _doclens,
        _postings,
    )

    post = _postings(docs)
    dl = _doclens(docs)
    post.write.mode("overwrite").parquet(os.path.join(seg_dir, "postings"))
    dl.write.mode("overwrite").parquet(os.path.join(seg_dir, "doclens"))
    dl.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
    ).write.mode("overwrite").parquet(os.path.join(seg_dir, "stats"))


def test_legacy_doclens_segments_probe_and_migrate(
    spark, sf_dir, tmp_path
):
    """An r11 index (doclens-table layout) keeps probing correctly,
    mixed legacy+v2 segments agree with the ad-hoc query, and ONE
    compaction rewrites everything into the denormalized layout."""
    d = str(tmp_path / "legacy")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    os.makedirs(d, exist_ok=True)
    _legacy_segment(
        spark, docs.where(F.col("doc_id") % 2 == 0),
        os.path.join(d, "batch-l0"),
    )
    # v2 ingest lands next to the legacy segment
    update_bm25_index(
        spark, docs.where(F.col("doc_id") % 2 == 1), d, batch_id="v1"
    )
    terms = _corpus_terms(spark, sf_dir)
    expected = _scores(q_bm25_search(spark, sf_dir))
    assert _scores(probe_bm25_index(spark, d, terms)) == expected
    # compaction == migration: doclens gone, probe unchanged, and the
    # compacted probe plan is doclens-free
    assert compact_bm25_index(spark, d) == 2
    from roborock_data_pipeline_spark.operators.index_segments import (
        live_segments,
    )

    base, batches = live_segments(d)
    assert base is not None and not batches
    assert not os.path.isdir(os.path.join(base, "doclens"))
    assert _scores(probe_bm25_index(spark, d, terms)) == expected


def test_single_legacy_base_migrates(spark, sf_dir, tmp_path):
    """A fully-compacted r11 index (one legacy base, nothing else)
    still migrates: compaction is not a no-op while any legacy
    segment remains."""
    d = str(tmp_path / "legacy-only")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    os.makedirs(d, exist_ok=True)
    _legacy_segment(spark, docs, os.path.join(d, "batch-l0"))
    terms = _corpus_terms(spark, sf_dir)
    before = _scores(probe_bm25_index(spark, d, terms))
    assert compact_bm25_index(spark, d) == 1
    assert compact_bm25_index(spark, d) == 0  # now truly compact
    assert _scores(probe_bm25_index(spark, d, terms)) == before
