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


def test_image_near_duplicates_releases_storage(spark):
    """The internal phash persist must be freed once the candidate join
    materializes (same storage-leak class fixed in components.py):
    after the call the SQL cache manager holds no cached plans."""
    import pandas as pd

    from pagerank_cuda_dynamic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_near_duplicates,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, "image", bytearray(encode_bmp((rng.random((8, 8, 3)) * 255).astype(np.uint8))),
         "image/bmp", 8, 8, None)
        for i in range(4)
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
    spark.catalog.clearCache()
    image_near_duplicates(media, max_hamming=3).collect()
    # DataFrame.persist registers in the cache manager; localCheckpoint
    # barriers do not — so emptiness == every operator persist was freed.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ---------------------------------------------------------------------------
# set_decoder end-to-end with a real external codec (minimal pure-python PNG)
# ---------------------------------------------------------------------------

def _png_encode(img):
    """Minimal PNG writer: 8-bit RGB, non-interlaced, filter 0 rows."""
    import struct
    import zlib
    from binascii import crc32

    h, w = img.shape[:2]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_decode(content, kind, mime):
    """Minimal PNG reader (the 'external codec' a user would plug in via
    set_decoder): 8-bit RGB, non-interlaced, filter-0 rows only — raises
    on anything else so the stub fallback stays honest."""
    import struct
    import zlib

    assert content[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, ihdr, idat = 8, None, b""
    while pos < len(content):
        (ln,) = struct.unpack(">I", content[pos : pos + 4])
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        pos += 12 + ln
    w, h, depth, ctype, _, _, interlace = ihdr
    assert depth == 8 and ctype == 2 and interlace == 0, "unsupported PNG"
    raw = zlib.decompress(idat)
    stride = 1 + 3 * w
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0, "only filter 0 supported"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def test_set_decoder_real_png_codec_end_to_end(spark):
    """A real (pure-python) PNG codec installed via set_decoder must flow
    decoded=true through extract_features AND produce the same perceptual
    hash as the identical pixels encoded as BMP — codec independence."""
    from pagerank_cuda_dynamic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        extract_features,
        perceptual_hash_64,
        set_decoder,
        synthesize_media,
    )

    rng = np.random.default_rng(17)
    imgs = [
        (rng.integers(0, 256, (48, 64, 3))).astype(np.uint8) for _ in range(4)
    ]
    # roundtrip sanity of the test codec itself
    assert np.array_equal(_png_decode(_png_encode(imgs[0]), "image", None), imgs[0])

    rows = []
    for i, img in enumerate(imgs):
        rows.append((2 * i, "image", bytearray(_png_encode(img)), "image/png", 64, 48, None))
        rows.append((2 * i + 1, "image", bytearray(encode_bmp(img)), "image/bmp", 64, 48, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    set_decoder(_png_decode)
    try:
        feats = extract_features(media).toPandas()
        assert bool(feats["decoded"].all())  # PNGs decoded by the plugin
        ph = perceptual_hash_64(media).toPandas().set_index("media_id")
        assert bool(ph["decoded"].all())
        for i in range(4):  # same pixels -> same aHash regardless of codec
            assert ph.loc[2 * i, "phash"] == ph.loc[2 * i + 1, "phash"]
    finally:
        set_decoder(None)

    # with the codec removed, PNG payloads fall back to the flagged stub
    stub = perceptual_hash_64(media).toPandas()
    png_rows = stub[stub["media_id"] % 2 == 0]
    assert not bool(png_rows["decoded"].any())
