"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata structs, processed via Arrow-batched
``mapInPandas`` — the only sane shape at 100 TB (bytes never leave the
executor; Python sees Arrow record batches, not rows).

r11/r12: decode is REAL for the container-supportable formats — PPM
(P6), BMP (24-bit), WAV (PCM16) and, since r12, PNG (8-bit
gray/RGB/gray+alpha/RGBA, stdlib zlib inflate + per-scanline
unfilter incl. Paeth; interlace/palette rejected) parse to actual
pixels/samples via the dependency-free ``pipeline.codecs`` module,
and features are genuine content statistics (per-channel means,
extrema, RMS, zero-crossing rate) computed on numpy views of the
decoded bytes. r12 adds baseline JPEG (JFIF/SOF0, standard huffman +
quant tables, 4:4:4 and 4:2:0, gray or YCbCr — numpy IDCT, stdlib
everything else), so the only remaining stub formats are the ones
with no feasible dependency-free decoder in this container
(opus/h264): those still fall back to the deterministic digest STUB,
clearly marked in the output's ``codec`` field as 'stub'. Swap
`_decode_stub` for ffmpeg/librosa to productionize those.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .codecs import (decode_bmp, decode_jpeg, decode_png, decode_ppm,
                     decode_wav, sniff_codec)

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

FEATURE_SCHEMA = ("media_id LONG, media_type STRING, codec STRING, "
                  "n_bytes INT, digest STRING, feature ARRAY<DOUBLE>")


def _decode_stub(content: bytes, media_type: str, dim: int) -> list[float]:
    """STUB decode/feature-extract for codecs the container cannot
    parse (compressed formats — no PIL/ffmpeg/librosa here):
    deterministic pseudo-features from the content digest.
    Raises on None content like a real decoder would."""
    if content is None:
        raise ValueError("cannot decode empty media content")
    h = hashlib.sha256(content).digest()
    return [(h[i % 32] / 255.0) * 2 - 1 for i in range(dim)]


def _pad(vals: list[float], dim: int) -> list[float]:
    vals = [float(v) for v in vals[:dim]]
    return vals + [0.0] * (dim - len(vals))


def _image_features(width: int, height: int, rgb: bytes,
                    dim: int) -> list[float]:
    """[w, h, channels, mean_r, mean_g, mean_b, min, max, std_lum] —
    integer pixel sums in int64 (exact), single final divisions, so
    the values are engine-reproducible from the generating formula."""
    px = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
    n = width * height
    ch = px.reshape(n, 3)
    means = ch.sum(axis=0, dtype=np.int64) / n
    lum = ch.sum(axis=1, dtype=np.int64)  # 3x luminance, exact ints
    var = float((lum * lum).sum(dtype=np.int64)) / n \
        - (float(lum.sum(dtype=np.int64)) / n) ** 2
    return _pad([width, height, 3.0, means[0], means[1], means[2],
                 float(px.min()), float(px.max()),
                 float(np.sqrt(max(var, 0.0)) / 3.0)], dim)


def _audio_features(sr: int, nch: int, samples: list[int],
                    dim: int) -> list[float]:
    """[sr, nch, n, mean, rms, min, max, zcr] — exact int sums."""
    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    if n == 0:
        return _pad([sr, nch, 0.0], dim)
    mean = float(s.sum(dtype=np.int64)) / n
    rms = float(np.sqrt(float((s * s).sum(dtype=np.int64)) / n))
    sgn = np.sign(s)
    zc = int(((sgn[1:] * sgn[:-1]) < 0).sum()) if n > 1 else 0
    return _pad([sr, nch, n, mean, rms, float(s.min()), float(s.max()),
                 zc / max(n - 1, 1)], dim)


def decode_media(content: bytes, media_type: str,
                 dim: int) -> tuple[str, list[float]]:
    """(codec, features) — real decode for PPM/BMP/WAV/PNG/JPEG via
    magic-byte sniffing; anything else routes to the digest stub
    ('stub')."""
    codec = sniff_codec(content)
    if codec == "jpeg":
        return codec, _image_features(*decode_jpeg(content), dim)
    if codec == "png":
        return codec, _image_features(*decode_png(content), dim)
    if codec == "ppm":
        return codec, _image_features(*decode_ppm(content), dim)
    if codec == "bmp":
        return codec, _image_features(*decode_bmp(content), dim)
    if codec == "wav":
        return codec, _audio_features(*decode_wav(content), dim)
    return "stub", _decode_stub(content, media_type, dim)


def extract_features(df: DataFrame, dim: int = 16,
                     batch_rows: int = 512) -> DataFrame:
    """media rows → feature vectors via mapInPandas (Arrow batches).
    Partition note: media blobs are large — upstream should
    repartition so a partition holds ~128 MB of content, not N rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats, digests, sizes, codecs = [], [], [], []
                for content, mtype in zip(chunk["content"],
                                          chunk["media_type"]):
                    raw = bytes(content) if content is not None else None
                    if raw is None:
                        feats.append(None)
                        digests.append(None)
                        sizes.append(0)
                        codecs.append(None)
                    else:
                        codec, vec = decode_media(raw, mtype, dim)
                        feats.append(vec)
                        codecs.append(codec)
                        digests.append(hashlib.sha256(raw).hexdigest())
                        sizes.append(len(raw))
                yield pd.DataFrame({
                    "media_id": chunk["media_id"],
                    "media_type": chunk["media_type"],
                    "codec": codecs,
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
    decoder UDF downstream only touches sampled offsets. Video decode
    itself stays stubbed (no AV container parser is dependency-free)."""
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
    """Deterministic REAL media table for tests (r11): images are
    8×6 PPM / BMP with formula pixels ((i·7 + idx·13) % 256), audio
    is 64-sample PCM16 WAV with samples ((i·13 + idx·7) % 2003 −
    1001); video keeps seeded opaque bytes (stub fallback path)."""
    from .codecs import encode_bmp, encode_ppm, encode_wav
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if mtype == "image":
            w, h = 8, 6
            rgb = bytes((i * 7 + j * 13) % 256 for j in range(w * h * 3))
            content = (encode_ppm(w, h, rgb) if i % 2 == 0
                       else encode_bmp(w, h, rgb))
            codec = "ppm" if i % 2 == 0 else "bmp"
            meta = (w, h, None, codec)
        elif mtype == "audio":
            samples = [(i * 13 + j * 7) % 2003 - 1001 for j in range(64)]
            content = encode_wav(samples, sample_rate=16000)
            meta = (None, None, 64 * 1000 // 16000 or 4, "wav")
        else:
            content = hashlib.sha256(str(i).encode()).digest() * 4
            meta = (None, None, 3000 + i * 100, "h264")
        rows.append((i, mtype, bytearray(content), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
