"""Property-based tests (hypothesis) for the pure vectorized kernels —
codec roundtrips and the CSR slice-gather primitives the BSP loop rests on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pagerank_cuda_dynamic_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resample_area_mean,
)
from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import _ragged_take


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 23),
    w=st.integers(1, 23),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_shape(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 20), w=st.integers(1, 20),
    oh=st.integers(1, 20), ow=st.integers(1, 20),
    val=st.integers(0, 255),
)
def test_resize_constant_stays_constant(h, w, oh, ow, val):
    img = np.full((h, w, 3), val, dtype=np.uint8)
    out = resample_area_mean(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    assert (out == val).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    samples = np.random.default_rng(seed).integers(-32768, 32767, n).astype(np.int16)
    out, got_rate = decode_wav(encode_wav(samples, rate=rate))
    assert got_rate == rate
    assert np.allclose(out * 32768.0, samples, atol=1.0)


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_ragged_take_equals_naive(data):
    k = data.draw(st.integers(1, 40))
    starts = np.array(
        data.draw(st.lists(st.integers(0, 500), min_size=k, max_size=k)),
        dtype=np.int64,
    )
    lens = np.array(
        data.draw(st.lists(st.integers(1, 20), min_size=k, max_size=k)),
        dtype=np.int64,
    )
    got = _ragged_take(starts, lens)
    want = np.concatenate([np.arange(s, s + l) for s, l in zip(starts, lens)])
    assert np.array_equal(got, want)


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120
    ),
    inject=st.integers(0, 4),
)
def test_pii_scrub_idempotent(text, inject):
    """Applying the PII replacement chain twice equals once for arbitrary
    printable text with injected PII-ish fragments — placeholders must
    never re-match and replacements must never juxtapose new matches.
    Python `re` is the model; the patterns are shared verbatim with the
    Spark (Java) and DuckDB (RE2) implementations by design."""
    import re

    from pagerank_cuda_dynamic_spark.operators.text import PII_PATTERNS

    samples = ["a.b@c.de", "10.1.2.3", "123-45-6789", "+1 555 123 4567", ""]
    t = text + " " + samples[inject] + " " + text

    def scrub(s):
        for pat, repl in PII_PATTERNS:
            s = re.sub(pat, repl, s)
        return re.sub(r"\s+", " ", s).strip()

    once = scrub(t)
    assert scrub(once) == once
