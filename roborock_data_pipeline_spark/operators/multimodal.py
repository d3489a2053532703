"""Multimodal columns (SURVEY §2.K L5 — EXT).

Treatment of image/audio/video at 100 TB: the payload is an opaque
`binary` column travelling next to a typed metadata struct; decode /
feature-extraction runs as Arrow-batched Pandas functions via
`mapInPandas` (per-partition batch iterator — the only part of the
engine allowed off the JVM, because codec work is genuinely Python).

The container has no image/audio codecs, so `decode_media` is a
STUB: real decode raises NotImplementedError; the default is a
deterministic fake (byte-statistics features) so the Spark-side
plumbing — schema, batch iteration, partitioning — is real and
tested end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roborock_data_pipeline_spark.registry import query
from roborock_data_pipeline_spark.sources.tables import load

# Typed metadata carried beside every blob.
MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
    ]), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("format", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feat_mean", T.DoubleType(), False),
    T.StructField("feat_head", T.DoubleType(), False),
])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob table synthesized from documents.text (the stand-in
    payload): binary column + typed metadata struct."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_media(blob: bytes, fmt: str, *, fake: bool = True) -> list[float]:
    """Decode step. `fake=True` (default) produces deterministic
    byte-statistic features so the pipeline is testable without
    codecs. `fake=False` takes the real-codec path, feature-flagged
    behind an import guard: if the codec library is installed
    (PIL for image/*), it decodes for real; otherwise it raises
    NotImplementedError — this container ships no codecs, so the
    raise path is what tests exercise."""
    if not fake:
        if fmt.startswith("image/"):
            try:
                import io

                from PIL import Image  # type: ignore[import-not-found]
            except ImportError as exc:
                raise NotImplementedError(
                    f"no codec for {fmt!r} in this environment — install "
                    "Pillow to enable the real image decode path"
                ) from exc
            px = list(Image.open(io.BytesIO(blob)).convert("L").getdata())
            return [sum(px) / len(px), float(px[0])] if px else [0.0, 0.0]
        raise NotImplementedError(
            f"no codec for {fmt!r} in this environment — plug in the real "
            "decoder here (av.open / soundfile.read)"
        )
    if not blob:
        return [0.0, 0.0]
    return [sum(blob) / len(blob), float(blob[0])]


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """STUB (L5 image op). Real impl: PIL.Image.open(io.BytesIO(blob))
    .resize((width, height)) — codec not present in this container.
    The Spark-side call pattern is mapInPandas over (media, meta)
    batches, identical to _extract_features."""
    raise NotImplementedError("image codec not available in this environment")


def sample_frames(blob: bytes, every_n: int = 30) -> list[bytes]:
    """STUB (L5 video op). Real impl: av.open(io.BytesIO(blob)) and
    keep every Nth decoded frame. Output schema is
    ARRAY<BINARY> + frame metadata struct per row."""
    raise NotImplementedError("video codec not available in this environment")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → feature frame out.

    The fake decode is vectorized with numpy inside the batch (the
    shape real decoders take: batch of blobs in, matrix of features
    out) — not a per-row Python loop."""
    import numpy as np

    for pdf in batches:
        means = np.array(
            [np.frombuffer(m, dtype=np.uint8).mean() if len(m) else 0.0
             for m in pdf["media"]]
        )
        heads = np.array(
            [float(m[0]) if len(m) else 0.0 for m in pdf["media"]]
        )
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "format": pdf["fmt"],
            "n_bytes": pdf["n_bytes"],
            # no rounding: integer-sum / count is bit-identical across
            # engines, while Python round() (banker's) disagrees with
            # SQL ROUND (half-away) on exact ties.
            "feat_mean": means,
            "feat_head": heads,
        })


@query(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id,
           'text/plain' AS format,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           list_aggregate(list_transform(range(1, strlen(text) + 1),
                     i -> CAST(ascii(array_extract(text, i)) AS DOUBLE)), 'sum')
                 / strlen(text) AS feat_mean,
           CAST(ascii(array_extract(text, 1)) AS DOUBLE) AS feat_head
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary-column feature extraction through the real
    mapInPandas plumbing (Arrow batches, pinned output schema). The
    deterministic fake decoder makes this oracle-checkable: byte mean
    == ascii mean for utf-8 text payloads."""
    from roborock_data_pipeline_spark.sources.tables import spread

    media = spread(media_table(spark, sf_dir)).select(
        "doc_id",
        "media",
        F.col("meta.format").alias("fmt"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return media.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


@query(
    "q_media_metadata",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_media,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY lang
    """,
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: metadata-only scan — aggregating the typed struct without
    ever touching the blob. At 100 TB this is the crucial access
    pattern: parquet column pruning means the multi-GB binary column
    is never read."""
    media = media_table(spark, sf_dir)
    return media.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count("*").alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )
