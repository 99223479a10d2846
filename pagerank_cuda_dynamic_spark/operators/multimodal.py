"""Multimodal columns — image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched kernels over mapInPandas.

Decoding is REAL for the container-friendly formats:
  image/bmp  — 24-bit uncompressed BI_RGB, decoded/encoded in pure numpy
  image/x-portable-pixmap — PPM P6, pure numpy
  audio/wav  — 16-bit PCM via the stdlib `wave` module
and resize is a real area-mean resample (numpy).  Formats that genuinely
need external codecs (JPEG/PNG/MP4) route through `set_decoder(...)`; the
built-in fallback for them is a deterministic content-hash feature vector,
clearly marked `decoded=False` in the output so downstream can filter.
Video frame sampling emits real per-timestamp rows; the frame payload for
mp4 is the container-slice stub until a real codec is installed.

The Spark-side contract is the production shape either way: per-batch Arrow
columnar decode, binary payloads never on the driver, one output row per
media item (or per sampled frame)."""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


# ---------------------------------------------------------------------------
# real codecs (no external libs)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24-bit BI_RGB BMP bytes."""
    h, w, _ = img.shape
    row_size = (3 * w + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up, BGR
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → HxWx3 uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={compression}")
    flip = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR → RGB
    return img[::-1] if flip else img


def decode_ppm(data: bytes) -> np.ndarray:
    """PPM P6 bytes → HxWx3 uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        fields.append(int(data[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D int16 PCM samples → WAV bytes (mono)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples in [-1,1] — first channel, sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        n, rate, width, ch = wf.getnframes(), wf.getframerate(), wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(n)
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got {8 * width}-bit")
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)[:, 0]
    return samples.astype(np.float32) / 32768.0, rate


def resample_area_mean(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Real resize: area-mean resample (box filter) via bucketed indices."""
    h, w, c = img.shape
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    yi2 = np.minimum((np.arange(1, height + 1) * h + height - 1) // height, h)
    xi2 = np.minimum((np.arange(1, width + 1) * w + width - 1) // width, w)
    out = np.empty((height, width, c), dtype=np.uint8)
    csum = np.cumsum(np.cumsum(img.astype(np.float64), axis=0), axis=1)
    csum = np.pad(csum, ((1, 0), (1, 0), (0, 0)))
    for ch in range(c):  # 3 iterations, vectorized inside
        s = (
            csum[yi2][:, xi2, ch]
            - csum[yi][:, xi2, ch]
            - csum[yi2][:, xi, ch]
            + csum[yi][:, xi, ch]
        )
        area = (yi2 - yi)[:, None] * (xi2 - xi)[None, :]
        out[:, :, ch] = np.clip(s / area, 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# decode dispatch
# ---------------------------------------------------------------------------

def _builtin_decode(content: bytes, kind: str, mime: str | None):
    """Returns (decoded_object, True) for natively supported formats, else
    (hash features, False).  decoded_object: image → HxWx3 uint8;
    audio → (float32 samples, rate)."""
    try:
        if content[:2] == b"BM":
            return decode_bmp(content), True
        if content[:2] == b"P6":
            return decode_ppm(content), True
        if content[:4] == b"RIFF":
            return decode_wav(content), True
    except Exception:
        pass
    return _content_hash_features(content), False


def _content_hash_features(content: bytes, dim: int = 64) -> np.ndarray:
    """Deterministic fallback for undecodable formats (JPEG/PNG/MP4 need
    external codecs): sha256-seeded pseudo-features, flagged decoded=False."""
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


_DECODER: Callable | None = None


def set_decoder(fn: Callable) -> None:
    """Install an external decoder fn(content, kind, mime) -> decoded object
    (image array or (samples, rate)) for formats the built-ins can't parse."""
    global _DECODER
    _DECODER = fn


def _decode(content: bytes, kind: str, mime: str | None):
    if _DECODER is not None:
        try:
            return _DECODER(content, kind, mime), True
        except Exception:
            pass
    return _builtin_decode(content, kind, mime)


# ---------------------------------------------------------------------------
# synthetic fixtures (real payloads for image/audio; stub mp4 for video)
# ---------------------------------------------------------------------------

def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table matching MEDIA_SCHEMA: REAL 64x48 BMP
    gradient images, REAL 16-bit PCM WAV sine tones, and stub mp4 video
    payloads (no container codec in this sandbox)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            x = np.arange(64, dtype=np.float64)[None, :]
            y = np.arange(48, dtype=np.float64)[:, None]
            phase = float(rng.uniform(0, 2 * np.pi))
            img = np.stack(
                [
                    (127 + 120 * np.sin(x / 9.0 + phase)) * np.ones_like(y),
                    (127 + 120 * np.cos(y / 7.0 + phase)) * np.ones_like(x),
                    np.full((48, 64), float(rng.integers(0, 255))),
                ],
                axis=2,
            ).astype(np.uint8)
            content, mime, w, h, dur = encode_bmp(img), "image/bmp", 64, 48, None
        elif kind == "audio":
            t = np.arange(1600, dtype=np.float64) / 16000.0
            freq = float(rng.uniform(100, 2000))
            samples = (12000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
            content, mime, w, h, dur = encode_wav(samples), "audio/wav", None, None, 100
        else:
            content = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
            mime, w, h, dur = "video/mp4", 64, 48, 1000
        rows.append((i, kind, content, mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def _featurize(decoded, ok: bool, kind: str, dim: int) -> np.ndarray:
    """Fixed-size feature vector from a decoded object: image → per-channel
    mean/std + 4x4 gray thumbnail + edge energy; audio → RMS, zero-crossing
    rate, log-spaced FFT band energies.  Undecoded → hash features."""
    if not ok:
        return decoded[:dim]
    out = np.zeros(dim, dtype=np.float32)
    if isinstance(decoded, tuple):  # audio: (samples, rate)
        s, rate = decoded
        if s.size == 0:
            return out
        out[0] = float(np.sqrt(np.mean(s**2)))
        out[1] = float(np.mean(np.abs(np.diff(np.sign(s))) > 0))
        spec = np.abs(np.fft.rfft(s))
        bands = np.array_split(spec, min(16, spec.size))
        be = np.array([float(np.log1p(b.sum())) for b in bands], dtype=np.float32)
        out[2 : 2 + be.size] = be
        out[31] = float(rate) / 48000.0
    else:  # image: HxWx3 uint8
        img = decoded.astype(np.float32) / 255.0
        out[0:3] = img.mean(axis=(0, 1))
        out[3:6] = img.std(axis=(0, 1))
        gray = img.mean(axis=2)
        thumb = resample_area_mean(
            (gray[..., None] * 255).astype(np.uint8).repeat(3, axis=2), 4, 4
        )[:, :, 0].astype(np.float32) / 255.0
        out[6:22] = thumb.ravel()
        out[22] = float(np.abs(np.diff(gray, axis=0)).mean())
        out[23] = float(np.abs(np.diff(gray, axis=1)).mean())
    return out


def extract_features(media: DataFrame, feat_dim: int = 64) -> DataFrame:
    """(media_id, kind, decoded, features: array<float>) via Arrow-batched
    decode + featurize.  Real pixel/sample statistics for BMP/PPM/WAV;
    `decoded=false` rows carry the deterministic hash fallback."""
    if feat_dim < 32:
        # _featurize writes fixed slots up to index 31 (audio rate, image
        # edge energy); a narrower vector would IndexError inside the Arrow
        # kernel at runtime — fail fast on the driver instead
        raise ValueError(f"feat_dim must be >= 32, got {feat_dim}")
    dim = feat_dim

    def kernel(batches):
        for pdf in batches:
            feats, oks = [], []
            for c, k, mm in zip(pdf["content"], pdf["kind"], pdf["mime"]):
                decoded, ok = _decode(bytes(c), k, mm)
                feats.append(_featurize(decoded, ok, k, dim).tolist())
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "decoded": oks,
                    "features": feats,
                }
            )

    return media.mapInPandas(
        kernel, "media_id long, kind string, decoded boolean, features array<float>"
    )


def perceptual_hash_64(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image: decode → grayscale → 8×8
    area-mean thumbnail → bit i set iff pixel i > thumbnail mean.  Robust
    to resizing/re-encoding/brightness scaling — the canonical image
    near-dup key.  Undecodable payloads get a deterministic sha256-derived
    hash with decoded=false (flagged, never silently mixed).  Returns
    (media_id, phash: long, decoded: boolean)."""
    imgs = media.where(F.col("kind") == "image")

    def kernel(batches):
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for pdf in batches:
            hashes, decs = [], []
            for c, k, mm in zip(pdf["content"], pdf["kind"], pdf["mime"]):
                decoded, ok = _decode(bytes(c), k, mm)
                if ok and not isinstance(decoded, tuple):
                    gray = decoded.astype(np.float32).mean(axis=2)
                    thumb = resample_area_mean(
                        (gray[..., None]).astype(np.uint8).repeat(3, axis=2), 8, 8
                    )[:, :, 0].astype(np.float32)
                    bits = (thumb.ravel() > thumb.mean()).astype(np.uint64)
                    h = np.uint64((bits * weights).sum())
                    decs.append(True)
                else:
                    digest = hashlib.sha256(bytes(c)).digest()
                    h = np.frombuffer(digest[:8], dtype=np.uint64)[0]
                    decs.append(False)
                hashes.append(np.int64(h))  # two's-complement into Spark long
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": np.array(hashes, dtype=np.int64),
                    "decoded": decs,
                }
            )

    return imgs.mapInPandas(kernel, "media_id long, phash long, decoded boolean")


def image_near_duplicates(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs with hamming(aHash) ≤ max_hamming, found with
    the same pigeonhole banding as the text SimHash path
    (dedup._band_exprs, max_hamming+1 chunks): ≤h differing bits ⇒ ≥1
    identical chunk, so candidates come from an equi-join on (chunk, key)
    — never a cross join — and are verified with bit_count; recall is
    exact for ANY max_hamming.  Composes with dedup.dedup_clusters for
    transitive keeper selection."""
    from .dedup import _band_exprs

    ph = perceptual_hash_64(media).persist()
    chunks = ph.select(
        "media_id",
        "phash",
        _band_exprs("phash", max_hamming + 1).alias("cc"),
    ).select("media_id", "phash", "cc.chunk", "cc.ckey")
    a = chunks.select(
        F.col("media_id").alias("id_a"), F.col("phash").alias("ph_a"), "chunk", "ckey"
    )
    b = chunks.select(
        F.col("media_id").alias("id_b"), F.col("phash").alias("ph_b"), "chunk", "ckey"
    )
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    out = materialize(
        a.join(b, ["chunk", "ckey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    ph.unpersist()
    return out


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Real image resize: decode (BMP/PPM) → area-mean resample → re-encode
    BMP.  Undecodable image formats raise — installing a codec via
    set_decoder is the documented extension point."""
    imgs = media.where(F.col("kind") == "image")
    w, h = width, height

    def kernel(batches):
        for pdf in batches:
            payload = []
            for c, k, mm in zip(pdf["content"], pdf["kind"], pdf["mime"]):
                decoded, ok = _decode(bytes(c), k, mm)
                if not ok:
                    raise NotImplementedError(
                        f"no codec for {mm}; install one via set_decoder"
                    )
                payload.append(encode_bmp(resample_area_mean(decoded, w, h)))
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
    """Video frame-sampling: one output row per sampled timestamp.  The
    sampling grid (explode over sequence) is the real distributed plan; the
    mp4 frame payload is a deterministic container-slice STUB until a real
    video codec is installed via set_decoder."""
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


# Python workers deserialize kernels BEFORE any code can amend their
# sys.path, so when the driver put the repo on sys.path at runtime (no
# --py-files) the default by-reference pickling of this module's codec
# helpers dies in the worker with ModuleNotFoundError.  Registering the
# module for BY-VALUE pickling makes every kernel closure self-contained
# (the helpers travel inside the serialized task, a few KB) regardless of
# how the driver was launched.
import sys as _sys  # noqa: E402

try:
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover — older pyspark without the API
    pass
