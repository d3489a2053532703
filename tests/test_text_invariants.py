"""Structural invariants for chunking and interpolation — properties
the oracle diff can't see (it only proves equality with the SQL
twin, not that the semantics are the *right* ones)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Lossless-coverage invariant: first chunk + the non-overlapping
    suffix of every later chunk concatenates back to the original
    document, for every document."""
    from roborock_data_pipeline_spark.operators.text import (
        CHUNK_S,
        CHUNK_W,
        q_doc_chunks,
    )

    chunks = q_doc_chunks(spark, sf_dir)
    # suffix = tokens past the (W - S)-token overlap with the
    # previous chunk; chunk 0 contributes all its tokens
    overlap = CHUNK_W - CHUNK_S
    suffix = F.when(
        F.col("chunk_ix") == 0, F.col("chunk_text")
    ).otherwise(
        F.concat_ws(
            " ",
            F.slice(
                F.split("chunk_text", " "),
                overlap + 1,
                CHUNK_W,
            ),
        )
    )
    rebuilt = (
        chunks.select("doc_id", "chunk_ix", suffix.alias("part"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_ix", "part"))
                    ),
                    lambda s: s["part"],
                ),
            ).alias("rebuilt")
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bad = (
        rebuilt.join(docs, "doc_id")
        .where(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0

    # chunk-size bounds: every chunk ≤ W tokens; every non-final
    # chunk of a document is exactly W tokens
    assert chunks.where(F.col("n_chunk_tokens") > CHUNK_W).count() == 0
    w = chunks.groupBy("doc_id").agg(F.max("chunk_ix").alias("last_ix"))
    nonfinal_short = (
        chunks.join(w, "doc_id")
        .where(
            (F.col("chunk_ix") < F.col("last_ix"))
            & (F.col("n_chunk_tokens") != CHUNK_W)
        )
        .count()
    )
    assert nonfinal_short == 0


def test_interpolate_respects_observations(spark, sf_dir):
    """Interpolation invariants: observed days pass through
    unchanged; filled days lie within [min, max] of their bracketing
    observations; nothing is ever null."""
    from roborock_data_pipeline_spark.operators.timeseries import (
        SPARSE_MOD,
        q_interpolate,
    )
    from roborock_data_pipeline_spark.sources.tables import load

    out = q_interpolate(spark, sf_dir)
    assert out.where(F.col("v_filled").isNull()).count() == 0

    obs = (
        load(spark, sf_dir, "events")
        .where(F.col("event_id") % SPARSE_MOD == 0)
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("d"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    mismatched = (
        out.join(obs, "d")
        .where(
            (F.col("interpolated"))  # observed day must not be flagged
            | (F.col("v_filled") != F.col("v"))
        )
        .count()
    )
    assert mismatched == 0

    lo_hi = obs.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    out_of_range = out.where(
        (F.col("v_filled") < lo_hi.lo) | (F.col("v_filled") > lo_hi.hi)
    ).count()
    assert out_of_range == 0  # lerp never extrapolates beyond the data


def test_source_cap_two_phase_equivalence_on_skew(spark):
    """VERDICT r5 #6: the two-phase cap must equal the exact window
    row-for-row on a deliberately skewed source distribution (one
    mega-domain with heavy quality ties at the cap boundary, one
    under-cap domain, one exactly-at-cap domain), and its physical
    plan must pre-filter on the broadcast threshold BEFORE the window
    exchange — the point of the form is that the mega-domain never
    shuffles wholesale into one window partition."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from roborock_data_pipeline_spark.operators.quality import (
        SOURCE_CAP,
        source_cap_two_phase,
    )

    rng = random.Random(7)
    rows = []
    # mega-domain: 2000 docs, qualities drawn from only 40 distinct
    # values → ~50-way ties, including at the cap boundary
    for i in range(2000):
        rows.append((i, "mega", round(rng.randrange(40) / 40.0, 4)))
    # under-cap domain: fewer docs than the cap → kept wholesale
    for i in range(SOURCE_CAP - 5):
        rows.append((10_000 + i, "tiny", round(rng.random(), 4)))
    # exactly-at-cap domain
    for i in range(SOURCE_CAP):
        rows.append((20_000 + i, "edge", round(rng.random(), 4)))
    dq = spark.createDataFrame(
        rows, "doc_id long, source string, quality double"
    )

    got = source_cap_two_phase(dq)
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    want = (
        dq.withColumn("src_rank", F.row_number().over(w).cast("long"))
        .where(F.col("src_rank") <= SOURCE_CAP)
        .select("doc_id", "source", "src_rank", "quality")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() == 2 * SOURCE_CAP + (SOURCE_CAP - 5)

    # plan: broadcast threshold join + sliver filter sit UPSTREAM of
    # the window's source-hash exchange (printed plans are root-first,
    # so upstream operators appear at larger offsets)
    plan = got._jdf.queryExecution().executedPlan().toString()
    i_window = plan.index("Window")
    i_filter = plan.index("thr_bucket")
    i_bcast = plan.index("BroadcastHashJoin")
    assert i_window < i_filter, plan
    assert i_window < i_bcast, plan


def test_winnowing_guarantee(spark):
    """The MOSS coverage guarantee, property-tested: two documents
    sharing any run of >= w + k - 1 = 6 consecutive words MUST share
    at least one winnowing fingerprint (k=3 shingles, window w=4) —
    for arbitrary generated word sequences."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from roborock_data_pipeline_spark.operators.text import q_winnow_fingerprint

    words = st.sampled_from("alpha beta gamma delta eps zeta eta".split())
    docs_strategy = st.tuples(
        st.lists(words, min_size=1, max_size=20),
        st.lists(words, min_size=1, max_size=20),
        st.lists(words, min_size=6, max_size=9),  # the shared run
    )

    import os
    import tempfile

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(docs_strategy)
    def check(case):
        pre, post, shared = case
        d1 = " ".join(pre + shared)
        d2 = " ".join(shared + post)
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(1, d1, "en", "t", len(d1)), (2, d2, "en", "t", len(d2))],
                "doc_id long, text string, lang string, source string, n_chars long",
            ).write.parquet(os.path.join(td, "documents.parquet"))
            rows = q_winnow_fingerprint(spark, td).collect()
        # recompute fingerprint SETS via the digest inputs: rerun per
        # doc is overkill — instead assert digests-only when equal
        # docs, else assert the queries' n_fingerprints overlap via a
        # direct python winnow
        import hashlib

        def winnow(text):
            w = text.split(" ")
            hs = [
                hashlib.md5(" ".join(w[i:i + 3]).encode()).hexdigest()
                for i in range(max(len(w) - 2, 1))
            ]
            return {
                min(hs[i:i + 4])
                for i in range(max(len(hs) - 3, 1))
            }
        f1, f2 = winnow(d1), winnow(d2)
        assert f1 & f2, "shared 6-word run must share a fingerprint"
        by_id = {r.doc_id: r.n_fingerprints for r in rows}
        assert by_id[1] == len(f1) and by_id[2] == len(f2)

    check()


def test_ngram_novelty_df_cap_zeroes_viral_shingles(spark):
    """r12 K-semantics: a shingle present in more than df_cap docs is
    boilerplate — it contributes 0 novelty even to its first doc,
    while n_shingles still counts it."""
    from roborock_data_pipeline_spark.operators.quality import ngram_novelty

    viral = "the quick brown"  # one 3-shingle, present in every doc
    docs = spark.createDataFrame(
        [
            (1, viral + " alpha beta gamma"),  # viral + 3 fresh shingles
            (2, viral),
            (3, viral),
            (4, viral),
        ],
        "doc_id long, text string",
    )
    # cap=2 < df(viral)=4 → viral shingle is dropped from the
    # first-occurrence table everywhere
    got = {
        r["doc_id"]: (r["n_shingles"], r["novelty"])
        for r in ngram_novelty(docs, df_cap=2).collect()
    }
    # doc 1 has 4 distinct shingles: the viral one (capped out, 0
    # credit despite being first) + 3 fresh ones it owns
    assert got[1] == (4, 0.75)
    assert got[2] == (1, 0.0) and got[3] == (1, 0.0) and got[4] == (1, 0.0)
    # uncapped (default) semantics: doc 1 gets full credit
    full = {
        r["doc_id"]: r["novelty"] for r in ngram_novelty(docs).collect()
    }
    assert full[1] == 1.0
