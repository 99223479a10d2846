"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels over mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): decoding
is behind `set_decoder(...)`; the default decoder is a deterministic fake
that derives pixel/sample features from the binary content hash, so the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is fully real and testable.  Swap in a real decoder (PIL/ffmpeg)
via set_decoder in production.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def _fake_decode(content: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decoder: sha256(content) seeds a small float
    array standing in for decoded pixels/samples.  REPLACE via set_decoder."""
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(64).astype(np.float32)


_DECODER: Callable[[bytes, str], np.ndarray] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    global _DECODER
    _DECODER = fn


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                content,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame, feat_dim: int = 64) -> DataFrame:
    """(media_id, kind, features: array<float>) via Arrow-batched decode +
    featurize.  The batch shape is the production contract: each pandas
    batch decodes independently; binary payloads never hit the driver."""
    dim = feat_dim

    def kernel(batches):
        for pdf in batches:
            feats = [
                _DECODER(bytes(c), k)[:dim].tolist()
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(kernel, "media_id long, kind string, features array<float>")


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize plumbing: filters to images, routes through the decode
    kernel, emits metadata for the resized payload.  The actual pixel
    resample raises NotImplementedError unless a real decoder is installed —
    the plan/schema/partitioning are the tested surface."""
    imgs = media.where(F.col("kind") == "image")
    w, h = width, height

    def kernel(batches):
        for pdf in batches:
            if _DECODER is _fake_decode:
                # stub: deterministic fake "resized" payload = content hash
                payload = [
                    hashlib.sha256(bytes(c) + f"{w}x{h}".encode()).digest()
                    for c in pdf["content"]
                ]
            else:  # pragma: no cover - real decoder path
                raise NotImplementedError("install a real image decoder via set_decoder")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": payload,
                    "width": [w] * len(pdf),
                    "height": [h] * len(pdf),
                }
            )

    return imgs.mapInPandas(kernel, "media_id long, content binary, width int, height int")


def sample_frames(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (frame payloads stubbed as content-hash bytes)."""
    vids = media.where(F.col("kind") == "video").withColumn(
        "frame_ts",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))),
    )

    def kernel(batches):
        for pdf in batches:
            payload = [
                hashlib.sha256(bytes(c) + int(t).to_bytes(4, "little")).digest()
                for c, t in zip(pdf["content"], pdf["frame_ts"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts": pdf["frame_ts"],
                    "frame": payload,
                }
            )

    return vids.mapInPandas(kernel, "media_id long, frame_ts int, frame binary")
