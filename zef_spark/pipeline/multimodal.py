"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata structs, processed via Arrow-batched
``mapInPandas`` — the only sane shape at 100 TB (bytes never leave the
executor; Python sees Arrow record batches, not rows).

The actual codec step (PIL/ffmpeg/librosa) is NOT available in this
container, so `decode` is stubbed behind a deterministic fake (marked
STUB) — the Spark-side contract (schemas, batch iteration, partition
sizing, UDF signatures) is real and tested. Swap `_decode_stub` for a
real decoder to productionize.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),  # image|audio|video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = ("media_id LONG, media_type STRING, n_bytes INT, "
                  "digest STRING, feature ARRAY<FLOAT>")


def _decode_stub(content: bytes, media_type: str, dim: int) -> list[float]:
    """STUB decode/feature-extract: deterministic pseudo-features from
    the content digest (real impl: PIL/torchvision/librosa here).
    Raises on None content like a real decoder would."""
    if content is None:
        raise ValueError("cannot decode empty media content")
    h = hashlib.sha256(content).digest()
    return [(h[i % 32] / 255.0) * 2 - 1 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 16,
                     batch_rows: int = 512) -> DataFrame:
    """media rows → feature vectors via mapInPandas (Arrow batches).
    Partition note: media blobs are large — upstream should
    repartition so a partition holds ~128 MB of content, not N rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats, digests, sizes = [], [], []
                for content, mtype in zip(chunk["content"],
                                          chunk["media_type"]):
                    raw = bytes(content) if content is not None else None
                    if raw is None:
                        feats.append(None)
                        digests.append(None)
                        sizes.append(0)
                    else:
                        feats.append(_decode_stub(raw, mtype, dim))
                        digests.append(hashlib.sha256(raw).hexdigest())
                        sizes.append(len(raw))
                yield pd.DataFrame({
                    "media_id": chunk["media_id"],
                    "media_type": chunk["media_type"],
                    "n_bytes": pd.Series(sizes, index=chunk.index,
                                         dtype="int32"),
                    "digest": digests,
                    "feature": feats,
                })

    return df.select("media_id", "media_type", "content") \
        .mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media, frame
    timestamp) — the explode happens JVM-side from metadata, so the
    decoder UDF downstream only touches sampled offsets. STUB decode."""
    n_frames = F.greatest(
        F.floor(F.col("meta.duration_ms") / every_ms), F.lit(1)).cast("int")
    return (df.where(F.col("media_type") == "video")
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0), n_frames - 1)))
            .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
            .select("media_id", "frame_idx", "frame_ts_ms", "content",
                    "meta"))


def resize_meta(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize *bookkeeping* computed JVM-side (target dims, scale);
    the pixel work would live in the decode UDF. Keeps planning
    (filtering no-op resizes) out of Python."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / F.greatest(w, h), F.lit(1.0))
    return df.withColumn("resize_scale", F.round(scale, 6)) \
        .withColumn("target_w", F.ceil(w * scale).cast("int")) \
        .withColumn("target_h", F.ceil(h * scale).cast("int"))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (content = seeded
    bytes; metadata plausible)."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        content = hashlib.sha256(str(i).encode()).digest() * 4
        meta = {"width": 640 + (i % 4) * 160 if mtype == "image" else None,
                "height": 480 + (i % 3) * 120 if mtype == "image" else None,
                "duration_ms": 3000 + i * 100 if mtype != "image" else None,
                "codec": {"image": "png", "audio": "opus",
                          "video": "h264"}[mtype]}
        rows.append((i, mtype, bytearray(content),
                     (meta["width"], meta["height"], meta["duration_ms"],
                      meta["codec"])))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
