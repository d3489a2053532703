"""ML feature-engineering operators (SURVEY §2.K EXT).

The feature-preparation steps between curated data and model
training: categorical target encoding, the feature-hashing trick for
unbounded vocabularies, and lag autocorrelation for time-series
feature selection. All JVM codegen; every hash is engine-portable
(md5-derived) so the oracles compute identical features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from roborock_data_pipeline_spark.functions.text import tokens
from roborock_data_pipeline_spark.registry import query
from roborock_data_pipeline_spark.sources.tables import load

SMOOTHING_M = 10.0
HASH_DIM = 256


@query(
    "q_target_encode",
    oracle=f"""
    WITH g AS (SELECT AVG(value) AS mu FROM events),
    per AS (
        SELECT event_type, COUNT(*) AS n, SUM(value) AS s
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((s + {SMOOTHING_M} * g.mu) / (n + {SMOOTHING_M}), 6) AS encoded
    FROM per CROSS JOIN g
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed (m-estimate) target encoding of event_type against
    the `value` target: enc = (Σy + m·μ)/(n + m), m=10 — the shrunk
    category mean that rare categories pull toward the global mean.

    Two tiny aggregates (one per-category, one global scalar) off a
    single scan; the output is the category-sized encoding table a
    training job broadcasts into its feature join — the raw rows are
    never joined here, which is the point: encode once, broadcast
    everywhere.
    """
    ev = load(spark, sf_dir, "events")
    g = ev.agg(F.avg("value").alias("mu"))
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        F.round(
            (F.col("s") + SMOOTHING_M * F.col("mu")) / (F.col("n") + SMOOTHING_M), 6
        ).alias("encoded"),
    )


@query(
    "q_feature_hash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    )
    SELECT CAST(CAST(('0x' || substring(md5(term), 1, 8)) AS UBIGINT)
                % {HASH_DIM} AS BIGINT) AS bucket,
           COUNT(*) AS n_terms,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY 1
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: project an unbounded token vocabulary into a
    fixed {HASH_DIM}-dim space via a portable md5-derived hash, with
    corpus-level term and document frequencies per bucket — the
    profile used to size hash dimensions before committing a feature
    pipeline to them.

    Why it matters at 100 TB: feature hashing needs NO vocabulary
    build (no shuffle to collect distinct terms, no broadcast
    dictionary, no OOV handling) — the per-doc vector is a map-side
    expression. The aggregate here shuffles (bucket)-keyed partials
    bounded by {HASH_DIM} rows per task, whatever the corpus size.
    Deliberately md5-based (not xxhash64) so any engine reproduces
    the same buckets.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
        .cast("long") % HASH_DIM
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_terms"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "q_autocorr",
    oracle="""
    WITH seq AS (
        SELECT event_type, value,
               LAG(value) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n_pairs,
           ROUND(CORR(value, prev), 6) AS lag1_autocorr
    FROM seq WHERE prev IS NOT NULL GROUP BY event_type
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of `value` within each event-type stream
    — the feature-selection check for whether lagged values carry
    signal (≈0 here: the fixture is white noise, which is itself the
    useful negative control).

    One key shuffle for the lag window, then corr() as a partial-
    aggregable moment sum. The window holds one previous row per
    stream — no buffering of the series.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", "value", F.lag("value").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("value").alias("n_pairs"),
        F.round(F.corr("value", "prev"), 6).alias("lag1_autocorr"),
    )
