"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBS (the sandbox has no image/audio
libraries): `deterministic=True` routes to a seeded fake decoder so the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and fully tested; `deterministic=False` raises
NotImplementedError where a real libjpeg/ffmpeg call would go. Swapping in
real decoders changes only the marked kernel bodies.

Design for 100 TB of media:
  * binary payloads never pass through Python row-at-a-time — mapInPandas
    receives Arrow record batches; per-batch NumPy work only.
  * metadata (width/height/sample rate/duration) lives in a typed struct
    column so Catalyst can filter/prune WITHOUT touching payload bytes
    (e.g. `WHERE meta.width >= 64` is a parquet-pushdown-able predicate on
    a scalar column, while `content` stays unread until after the filter).
  * feature extraction emits fixed-size float arrays -> the ANN operators
    (operators/ann.py) consume them directly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

IMAGE_FEAT_DIM = 64
AUDIO_FEAT_DIM = 32


def _seeded_floats(key: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector from content bytes (md5-seeded)."""
    seed = int.from_bytes(hashlib.md5(key).digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal(dim).astype(np.float32)


def feature_fingerprint(vec) -> str:
    """Canonical scalar fingerprint of a feature vector: md5 of the
    comma-joined 6-decimal rendering. Array columns are unhashable for
    driver-side canonicalization (sort/factorize), so entries surface
    features through this scalar; the same function generates the literal
    oracle rows."""
    vals = np.round(np.asarray(vec, dtype=np.float64), 6)
    s = ",".join(f"{v:.6f}" for v in vals)
    return hashlib.md5(s.encode()).hexdigest()


def _decode_image_stub(content: bytes, deterministic: bool) -> np.ndarray:
    if not deterministic:
        # REAL IMPLEMENTATION SITE: PIL.Image.open(io.BytesIO(content))
        raise NotImplementedError("image decoding needs PIL/libjpeg")
    return _seeded_floats(content, IMAGE_FEAT_DIM)


def _decode_audio_stub(content: bytes, deterministic: bool) -> np.ndarray:
    if not deterministic:
        # REAL IMPLEMENTATION SITE: soundfile/ffmpeg decode + log-mel
        raise NotImplementedError("audio decoding needs soundfile/ffmpeg")
    return _seeded_floats(content, AUDIO_FEAT_DIM)


def extract_features(
    media: DataFrame, kind: str = "image", deterministic: bool = True
) -> DataFrame:
    """(media_id, kind, content, meta) -> (media_id, feature array<float>).

    Arrow-batched mapInPandas; the payload column is projected only here,
    after any metadata predicates upstream."""
    dim = IMAGE_FEAT_DIM if kind == "image" else AUDIO_FEAT_DIM
    decode = _decode_image_stub if kind == "image" else _decode_audio_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                decode(bytes(c), deterministic).tolist() for c in b["content"]
            ]
            yield pd.DataFrame(
                {"media_id": b["media_id"], "feature": feats}
            )

    return media.where(F.col("kind") == kind).mapInPandas(
        run, schema=f"media_id long, feature array<float>"
    )


def extract_feature_fps(
    media: DataFrame, kind: str = "image", deterministic: bool = True
) -> DataFrame:
    """(media_id, kind, content, meta) -> (media_id, feat_dim, feature_fp).

    Same decode path as extract_features, but the feature surfaces as a
    scalar fingerprint — hashable for order-insensitive result compares."""
    dim = IMAGE_FEAT_DIM if kind == "image" else AUDIO_FEAT_DIM
    decode = _decode_image_stub if kind == "image" else _decode_audio_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fps = [
                feature_fingerprint(decode(bytes(c), deterministic))
                for c in b["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "feat_dim": np.full(len(b), dim, dtype=np.int32),
                    "feature_fp": fps,
                }
            )

    return media.where(F.col("kind") == kind).mapInPandas(
        run, schema="media_id long, feat_dim int, feature_fp string"
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per frame to decode —
    (media_id, frame_ts_ms). Pure JVM (sequence/explode over metadata);
    the actual frame decode is the stubbed kernel above. This is how a
    100 TB video pipeline parallelizes: the plan explodes cheaply and
    repartitions BEFORE any payload decode."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic fake media rows (pure Python — reused by the literal
    DuckDB oracle so both sides derive from one generator)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes(rng.integers(0, 256, size=128, dtype=np.uint8))
        meta = {
            "width": int(rng.integers(16, 512)) if kind == "image" else None,
            "height": int(rng.integers(16, 512)) if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": int(rng.integers(1000, 10000))
            if kind != "image"
            else None,
        }
        rows.append((i, kind, content, meta))
    return rows


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the full schema."""
    return spark.createDataFrame(synthetic_media_rows(n, seed), MEDIA_SCHEMA)
