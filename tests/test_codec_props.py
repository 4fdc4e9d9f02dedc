"""Property tests for the round-12 codec family (hermetic — no Spark,
no codec library): every drawn shape/quality/parameter combination
must round-trip without raising, with exact container geometry and
bounded loss. These sweep the corners example tests can't enumerate —
1-pixel frames, prime dimensions, extreme qualities, restart
intervals landing mid-block."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_jpeg_bytes,
    decode_png_bytes,
    decode_wav_bytes,
    encode_adpcm_wav,
    encode_jpeg,
    encode_png,
)


def _image(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).random((h, w))


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    quality=st.integers(1, 100),
    ri=st.integers(0, 3),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_roundtrip_total(seed, h, w, quality, ri):
    """encode→decode never raises, preserves geometry, stays in
    [0, 1], is deterministic, and even at quality=1 the error is
    bounded by the dynamic range (a wrong zigzag/Huffman/EXTEND
    produces garbage far outside these bounds)."""
    img = _image(seed, h, w)
    payload = encode_jpeg(img, quality=quality, restart_interval=ri)
    out = decode_jpeg_bytes(payload)
    assert out.shape == (h, w)
    assert out.dtype == np.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    assert payload == encode_jpeg(img, quality=quality, restart_interval=ri)
    err = float(np.abs(out - img).max())
    # at very low quality the quant table saturates at 255 and random
    # noise legitimately flattens toward its block means (err → the
    # dynamic range); the bound is meaningful from mid quality up
    if quality >= 50:
        assert err <= 0.35
    elif quality >= 25:
        assert err <= 0.75


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_is_quantization_exact(seed, h, w):
    img = _image(seed, h, w)
    out = decode_png_bytes(encode_png(img))
    assert out.shape == (h, w)
    assert float(np.abs(out - img).max()) <= 1.0 / 255 + 1e-6


@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 3000),
    block_align=st.sampled_from([32, 64, 256, 1024]),
    amp=st.floats(0.01, 1.0),
)
@settings(max_examples=60, deadline=None)
def test_adpcm_roundtrip_geometry_and_range(seed, n, block_align, amp):
    """Any length (including shorter than one block and exact block
    multiples) comes back EXACTLY that length via the fact chunk;
    output stays in [-1, 1]; the codec is deterministic."""
    rng = np.random.default_rng(seed)
    sig = np.clip(amp * np.cumsum(rng.standard_normal(n)) / 20.0, -1, 1)
    payload = encode_adpcm_wav(sig, block_align=block_align)
    out, rate = decode_wav_bytes(payload)
    assert rate == 16_000
    assert out.shape == (n,)
    assert float(np.abs(out).max()) <= 1.0
    assert payload == encode_adpcm_wav(sig, block_align=block_align)


@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(2, 2000),
)
@settings(max_examples=40, deadline=None)
def test_adpcm_tracks_slew_limited_signals(seed, n):
    """For signals whose per-sample slope stays inside the quantizer's
    reach, reconstruction error stays small EVERYWHERE (not just in
    aggregate) — the adaptive step ladder must follow the signal."""
    rng = np.random.default_rng(seed)
    # slew-limited: steps of at most ~0.02 full-scale per sample
    sig = np.clip(np.cumsum(rng.uniform(-0.02, 0.02, n)), -0.95, 0.95)
    out, _ = decode_wav_bytes(encode_adpcm_wav(sig))
    assert float(np.abs(out.astype(np.float64) - sig).max()) < 0.08
