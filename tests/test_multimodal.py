

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
