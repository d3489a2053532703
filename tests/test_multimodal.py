

def test_ahash_collides_on_dups_and_separates_text(spark, tmp_path, sf_dir):
    """aHash semantics: identical blobs share a hash; a small
    perturbation stays within a near-dup hamming radius while
    unrelated text is far."""
    import shutil

    from pyspark.sql import functions as F

    from roborock_data_pipeline_spark.operators.multimodal import q_media_ahash
    from roborock_data_pipeline_spark.sources.tables import load

    base = load(spark, sf_dir, "documents").where(F.col("doc_id") == 1).first()
    text = base["text"]
    perturbed = "zz" + text[2:]  # flip the first two chars
    other = " ".join(reversed(text.split(" ")))  # same chars, new layout
    rows = [
        (1, text, "en", "w", float(len(text))),
        (2, text, "en", "w", float(len(text))),          # exact dup
        (3, perturbed, "en", "w", float(len(perturbed))),
        (4, other, "en", "w", float(len(other))),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars double"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")

    got = {r["doc_id"]: r["ahash"] for r in q_media_ahash(spark, d).collect()}
    assert got[1] == got[2]  # exact dup collides

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert ham(got[1], got[3]) <= 12   # perturbation: near-dup radius
    assert ham(got[1], got[3]) < ham(got[1], got[4])


def test_media_near_dup_finds_perturbed_copy(spark, tmp_path):
    """The banded pair join surfaces an exact copy (hamming 0) and a
    locally-perturbed copy, and does not pair unrelated layouts."""
    from roborock_data_pipeline_spark.operators.multimodal import q_media_near_dup

    text = "spark table scan merge join filter window batch " * 8
    rows = [
        (1, text, "en", "w", float(len(text))),
        (2, text, "en", "w", float(len(text))),        # exact copy
        (3, "qq" + text[2:], "en", "w", float(len(text))),  # local edit
        (4, " ".join(sorted(set(text.split()))) * 9, "en", "w", 100.0),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars double"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    pairs = {
        (r["doc_id_1"], r["doc_id_2"]): r["hamming"]
        for r in q_media_near_dup(spark, d).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 12
    assert not any(4 in p for p in pairs)


def test_banding_recall_guaranteed_and_measured(spark):
    """VERDICT r4 #4: 8×8 banding recall. Pigeonhole guarantees every
    pair at hamming ≤ 7 is found (7 dirty bits cannot touch all 8
    bands); across the advertised 4–12 radius, recall must be ≥95%
    even for the WORST case of uniformly-scattered bit flips (real
    image edits cluster, which bands catch better).

    Media blobs are constructed so each byte sits far from the mean
    (10 vs 200, exactly half each): flipping a byte across the
    threshold flips exactly that aHash bit and no other (the mean
    moves by ≤ 12·190/64 ≈ 36, never crossing either side), so each
    pair's hamming distance is exact by construction."""
    import random

    from roborock_data_pipeline_spark.operators.multimodal import (
        ahash_fingerprints,
        media_near_dup_pairs,
    )

    rng = random.Random(42)
    rows, expected = [], {}
    pid = 0
    for h in range(4, 13):
        for _ in range(40):
            base = [200] * 32 + [10] * 32
            rng.shuffle(base)  # unique base per pair: small band buckets
            pert = list(base)
            for pos in rng.sample(range(64), h):
                pert[pos] = 10 if pert[pos] == 200 else 200
            rows.append((pid, bytearray(base)))
            rows.append((pid + 1, bytearray(pert)))
            expected[(pid, pid + 1)] = h
            pid += 2

    media = spark.createDataFrame(rows, "doc_id long, media binary")
    fp = ahash_fingerprints(media).persist()
    got = {
        (r["doc_id_1"], r["doc_id_2"]): r["hamming"]
        for r in media_near_dup_pairs(fp).collect()
    }
    fp.unpersist()

    found_h, missed = [], []
    for pair, h in expected.items():
        if pair in got:
            assert got[pair] == h  # hamming exact by construction
            found_h.append(h)
        else:
            missed.append(h)
    # guaranteed radius: nothing at hamming <= 7 may ever be missed
    assert all(h > 7 for h in missed), f"guaranteed-radius miss: {missed}"
    recall = len(found_h) / len(expected)
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95 (missed={missed})"
