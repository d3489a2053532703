

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
