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
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE list_aggregate(list_transform(range(1, strlen(text) + 1),
                          i -> CAST(ascii(array_extract(text, i)) AS DOUBLE)), 'sum')
                     / strlen(text) END AS feat_mean,
           CASE WHEN strlen(text) = 0 THEN 0.0
                ELSE CAST(ascii(array_extract(text, 1)) AS DOUBLE)
           END AS feat_head
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


RESIZE_W, RESIZE_H = 8, 8  # fake-resize target (w*h output bytes)
FRAME_CHUNK = 64  # bytes per synthetic "frame"
FRAME_EVERY_N = 3  # keep every Nth frame


def resize_media(df: DataFrame, width: int, height: int,
                 *, fake: bool = True) -> DataFrame:
    """L5 image-op plumbing, real end to end: Arrow batches of
    (doc_id, media, fmt) in → (doc_id, media, width, height) out,
    with `media` resized to exactly width*height bytes.

    The fake path (codec-free container) is a deterministic strided
    byte resample — index i reads source byte (i*len)//(w*h), the
    nearest-neighbor downsample a real resizer performs per channel —
    so the batch shape, schema, and vectorization are exactly what a
    PIL-backed implementation drops into (see resize_image for the
    gated real path)."""
    import numpy as np

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ])
    n_out = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for m in pdf["media"]:
                if fake:
                    src = np.frombuffer(m, dtype=np.uint8)
                    if len(src) == 0:
                        # nothing to resample from — empty out (ADVICE
                        # r3: zero-filled padding diverged from the
                        # oracle's md5 over an empty selection)
                        out.append(b"")
                        continue
                    idx = (np.arange(n_out, dtype=np.int64) * len(src)) // n_out
                    out.append(src[idx].tobytes())
                else:  # pragma: no cover - codec not in this container
                    out.append(resize_image(bytes(m), width, height))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": out,
                "width": np.full(len(pdf), width, dtype="int32"),
                "height": np.full(len(pdf), height, dtype="int32"),
            })

    return df.select("doc_id", "media").mapInPandas(_resize, schema=out_schema)


def sample_media_frames(df: DataFrame, chunk: int = FRAME_CHUNK,
                        every_n: int = FRAME_EVERY_N,
                        *, fake: bool = True) -> DataFrame:
    """L5 video-op plumbing, real end to end: one input blob explodes
    into multiple frame rows — (doc_id, frame_idx, frame) — keeping
    every Nth fixed-size chunk. This is the row-expanding mapInPandas
    shape a real av-backed frame sampler uses (decode → keep every
    Nth frame); the fake treats the byte stream as the frame sequence
    (frame k = bytes [k*chunk, (k+1)*chunk))."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ])

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                if not fake:  # pragma: no cover - codec not in container
                    for k, fr in enumerate(sample_frames(bytes(m), every_n)):
                        ids.append(doc_id); idxs.append(k); frames.append(fr)
                    continue
                b = bytes(m)
                # empty media → zero frames (a real demuxer yields no
                # frames from an empty stream; ADVICE r3 — the oracle's
                # range(0, ceil(len/chunk)) agrees)
                n_chunks = (len(b) + chunk - 1) // chunk
                for k in range(0, n_chunks, every_n):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(b[k * chunk:(k + 1) * chunk])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("doc_id", "media").mapInPandas(_frames, schema=out_schema)


@query(
    "q_media_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN length(text) = 0 THEN 0
                     ELSE {RESIZE_W * RESIZE_H} END AS BIGINT) AS n_bytes,
           md5(CASE WHEN length(text) = 0 THEN ''
               ELSE array_to_string(list_transform(
                   range(0, {RESIZE_W * RESIZE_H}),
                   i -> array_extract(text,
                        CAST((i * length(text)) // {RESIZE_W * RESIZE_H} AS INT) + 1)
               ), '') END) AS resized_md5
    FROM documents
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: resize through the real mapInPandas plumbing; the
    deterministic nearest-neighbor fake makes it oracle-checkable
    (strided byte selection == strided char selection on ascii
    payloads). Digest + size computed JVM-side on the binary
    output."""
    resized = resize_media(
        media_table(spark, sf_dir), RESIZE_W, RESIZE_H
    )
    return resized.select(
        "doc_id",
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.md5("media").alias("resized_md5"),
    )


@query(
    "q_media_frames",
    oracle=f"""
    WITH k AS (
        SELECT doc_id, text,
               unnest(list_filter(
                   range(0, CAST(ceil(length(text) / {FRAME_CHUNK}.0) AS INT)),
                   k -> k % {FRAME_EVERY_N} = 0)) AS frame_idx
        FROM documents
    )
    SELECT doc_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(length(substring(text, frame_idx * {FRAME_CHUNK} + 1,
                                 {FRAME_CHUNK})) AS BIGINT) AS frame_len,
           md5(substring(text, frame_idx * {FRAME_CHUNK} + 1, {FRAME_CHUNK}))
               AS frame_md5
    FROM k
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: frame sampling through the real row-expanding mapInPandas
    plumbing (every 3rd 64-byte chunk); digests JVM-side. At 100 TB
    the frame explosion is map-only — no shuffle until a downstream
    aggregate — and the blob column never leaves the stage."""
    frames = sample_media_frames(media_table(spark, sf_dir))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").cast("long").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


@query(
    "q_media_ahash",
    oracle="""
    WITH r AS (
        SELECT doc_id, string_split(text, '') AS cs, strlen(text) AS n
        FROM documents WHERE strlen(text) > 0
    ),
    v AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63),
                              i -> ascii(cs[CAST((i * n) // 64 AS INT) + 1]))
                   AS vals
        FROM r
    ),
    h AS (
        SELECT doc_id, vals,
               list_aggregate(vals, 'sum') / 64.0 AS mu
        FROM v
    ),
    a AS (
        SELECT doc_id,
               array_to_string(list_transform(vals,
                   x -> CASE WHEN x > mu THEN '1' ELSE '0' END), '') AS ahash
        FROM h
    )
    SELECT doc_id, ahash,
           substr(ahash, 1, 16) AS band0,
           substr(ahash, 17, 16) AS band1,
           substr(ahash, 33, 16) AS band2,
           substr(ahash, 49, 16) AS band3,
           COUNT(*) OVER (PARTITION BY ahash) AS n_same_hash
    FROM a
    """,
)
def q_media_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 media dedup: 64-bit average-hash (aHash) fingerprint per
    blob — the image-dedup primitive. Real aHash grayscales and
    resizes to 8×8 then thresholds each pixel against the mean; here
    the resize is the engine's fake-codec strided resample (the same
    mapInPandas slot a PIL grayscale+resize drops into), and the
    threshold/bit-packing runs JVM-side on the 64 resized bytes.

    The fingerprint ships with its four 16-bit bands — the SimHash
    banding trick applied to media: exact dedup groups by the full
    hash (`n_same_hash` counts the group inline); near-dup candidates
    (hamming ≤ 12 across 4 bands) block on any matching band and
    verify hamming inside the block, never all-pairs. One window
    exchange on the 64-char hash; everything before it is map-side."""
    from pyspark.sql import Window as W

    resized = resize_media(media_table(spark, sf_dir), RESIZE_W, RESIZE_H)
    vals = F.transform(
        F.split(F.decode(F.col("media"), "UTF-8"), ""),
        lambda c: F.ascii(c),
    )
    mu = (
        F.aggregate(vals, F.lit(0), lambda acc, x: acc + x).cast("double")
        / 64.0
    )
    withbits = (
        resized.where(F.length("media") > 0)
        .withColumn("vals", vals)
        .withColumn("mu", mu)
        .withColumn(
            "ahash",
            F.array_join(
                F.transform(
                    F.col("vals"),
                    lambda x: F.when(x > F.col("mu"), "1").otherwise("0"),
                ),
                "",
            ),
        )
    )
    return withbits.select(
        "doc_id",
        "ahash",
        F.substring("ahash", 1, 16).alias("band0"),
        F.substring("ahash", 17, 16).alias("band1"),
        F.substring("ahash", 33, 16).alias("band2"),
        F.substring("ahash", 49, 16).alias("band3"),
        F.count("*").over(W.partitionBy("ahash")).alias("n_same_hash"),
    )


@query(
    "q_media_near_dup",
    oracle="""
    WITH r AS (
        SELECT doc_id, string_split(text, '') AS cs, strlen(text) AS n
        FROM documents WHERE strlen(text) > 0
    ),
    v AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63),
                              i -> ascii(cs[CAST((i * n) // 64 AS INT) + 1]))
                   AS vals
        FROM r
    ),
    h AS (
        SELECT doc_id, vals, list_aggregate(vals, 'sum') / 64.0 AS mu FROM v
    ),
    a AS (
        SELECT doc_id,
               list_transform(vals, x -> CASE WHEN x > mu THEN 1 ELSE 0 END)
                   AS bits
        FROM h
    ),
    bands AS (
        SELECT doc_id, bits, i AS band_idx, bits[i * 16 + 1 : i * 16 + 16] AS band
        FROM a, UNNEST(generate_series(0, 3)) AS t(i)
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
               x.bits AS bits1, y.bits AS bits2
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band = y.band
         AND x.doc_id < y.doc_id
    )
    SELECT doc_id_1, doc_id_2,
           CAST(list_aggregate(list_transform(
                    list_zip(bits1, bits2),
                    p -> CASE WHEN p[1] <> p[2] THEN 1 ELSE 0 END),
                'sum') AS BIGINT) AS hamming
    FROM cand
    WHERE list_aggregate(list_transform(list_zip(bits1, bits2),
              p -> CASE WHEN p[1] <> p[2] THEN 1 ELSE 0 END), 'sum') <= 12
    """,
)
def q_media_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 media near-dup pairs: aHash fingerprints blocked on their
    four 16-bit bands, then exact hamming ≤ 12 verified inside the
    candidate set. Banding recall is GUARANTEED only below the band
    count (pigeonhole: ≤3 differing bits cannot dirty all 4 bands);
    at radius 12 it is probabilistic, counting on difference
    clustering — which is exactly how local image edits (crop edge,
    watermark, re-encode artifact) perturb an aHash, as opposed to
    spreading uniformly. The SimHash banding discipline applied to
    media: candidate work is Σ|band-bucket|², never corpus² — the
    same scale geometry as q_dedup_simhash.

    On THIS corpus the result is deliberately empty: synthetic word
    soup gives near-uniform 64-bit hashes (pairwise hamming ~32), so
    zero pairs pass — verified empty-vs-empty against the oracle; the
    property test (test_multimodal.py) pins non-empty behavior on
    actual perturbed duplicates. Candidate dedup happens BEFORE the
    hamming verify (one verify per unordered pair)."""
    fp = q_media_ahash(spark, sf_dir).select("doc_id", "ahash")
    bits = F.transform(F.split("ahash", ""), lambda c: (c == "1").cast("int"))
    banded = fp.select(
        "doc_id",
        bits.alias("bits"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.slice(bits, i * 16 + 1, 16),
            )
        ).alias("band_idx", "band"),
    )
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band") == F.col("y.band"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_id_1"),
            F.col("y.doc_id").alias("doc_id_2"),
            F.col("x.bits").alias("bits1"),
            F.col("y.bits").alias("bits2"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("bits1"), F.col("bits2"), lambda p, q: (p != q).cast("int")
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= 12)
        .select("doc_id_1", "doc_id_2", "hamming")
    )
