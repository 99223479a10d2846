"""Real multimodal codecs: BMP/PPM/WAV roundtrips, area-mean resize, and
feature extraction producing genuine pixel/sample statistics (no Spark —
these kernels run inside mapInPandas batches; the plumbing test lives in
test_pipeline_ops.py)."""

from __future__ import annotations

import numpy as np

from pagerank_cuda_dynamic_spark.operators.multimodal import (
    _decode,
    _featurize,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_wav,
    resample_area_mean,
)


def test_bmp_roundtrip_odd_width():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (7, 13, 3), dtype=np.uint8)  # rows need padding
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_decode_with_comment():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)


def test_wav_roundtrip():
    t = np.arange(800)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, rate=16000))
    assert rate == 16000
    assert np.allclose(out * 32768.0, samples, atol=1.0)


def test_resize_area_mean_exact():
    # 4x4 blocks of constant color → 2x2 resize recovers block colors
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 10
    img[:2, 2:] = 20
    img[2:, :2] = 30
    img[2:, 2:] = 40
    small = resample_area_mean(img, 2, 2)
    assert np.array_equal(small[:, :, 0], np.array([[10, 20], [30, 40]]))


def test_features_are_real_pixel_stats():
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    img[:, :, 0] = 255  # red-heavy
    decoded, ok = _decode(encode_bmp(img), "image", "image/bmp")
    assert ok
    feats = _featurize(decoded, ok, "image", 64)
    assert abs(feats[0] - 1.0) < 1e-6  # mean(R)=255/255
    assert abs(feats[1] - 128 / 255) < 1e-6  # mean(G)
    assert feats[3] < 1e-6  # std(R)=0


def test_audio_features_real():
    t = np.arange(1600)
    samples = (16000 * np.sin(2 * np.pi * 200 * t / 16000)).astype(np.int16)
    decoded, ok = _decode(encode_wav(samples), "audio", "audio/wav")
    assert ok
    feats = _featurize(decoded, ok, "audio", 64)
    # RMS of a sine with amplitude ~0.49 is ~0.345
    assert abs(feats[0] - 16000 / 32768 / np.sqrt(2)) < 0.01


def test_undecodable_flagged():
    decoded, ok = _decode(b"\x00\x01\x02mp4junk", "video", "video/mp4")
    assert not ok
    feats = _featurize(decoded, ok, "video", 64)
    assert feats.shape == (64,)


def test_perceptual_hash_near_duplicates(spark):
    """A re-encoded resized copy of an image pairs with the original at
    small hamming distance; a structurally different image does not."""
    import pandas as pd

    from pagerank_cuda_dynamic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        image_near_duplicates,
        perceptual_hash_64,
        resample_area_mean,
    )

    rng = np.random.default_rng(9)
    base = (rng.random((48, 64, 3)) * 80).astype(np.uint8)
    base[:, :32, :] += 120  # strong left/right structure for stable bits
    near = resample_area_mean(base, 32, 24)  # resized copy, re-encoded
    other = np.flip(base, axis=1).copy()  # mirrored: different structure
    rows = [
        (0, "image", bytearray(encode_bmp(base)), "image/bmp", 64, 48, None),
        (1, "image", bytearray(encode_bmp(near)), "image/bmp", 32, 24, None),
        (2, "image", bytearray(encode_bmp(other)), "image/bmp", 64, 48, None),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "media_id", "kind", "content", "mime", "width", "height", "duration_ms",
            ],
        ),
        MEDIA_SCHEMA,
    )
    ph = {r["media_id"]: r for r in perceptual_hash_64(media).collect()}
    assert all(ph[i]["decoded"] for i in (0, 1, 2))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(media, max_hamming=3).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs
