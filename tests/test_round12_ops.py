"""Round-12 operator additions: categorical drift (chi-square + PSI)
folded into drift_report's single stacked scan, hand-computed against
the textbook formulas (the closed forms in the implementation are
algebraic rearrangements — these tests pin the equivalence)."""

from __future__ import annotations

import math

import pytest

from gbif_filter_python_spark.operators.profile import drift_report


def _chi2_2xk(ca: dict, cb: dict) -> float:
    """Textbook sum (o-e)^2/e over the 2 x k contingency table."""
    levels = sorted(set(ca) | set(cb))
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb
    out = 0.0
    for l in levels:
        t = ca.get(l, 0) + cb.get(l, 0)
        for o, row in ((ca.get(l, 0), na), (cb.get(l, 0), nb)):
            e = row * t / n
            out += (o - e) ** 2 / e
    return out


def _psi(ca: dict, cb: dict, eps: float = 0.5) -> float:
    levels = sorted(set(ca) | set(cb))
    na, nb, k = sum(ca.values()), sum(cb.values()), len(levels)
    out = 0.0
    for l in levels:
        p = (ca.get(l, 0) + eps) / (na + eps * k)
        q = (cb.get(l, 0) + eps) / (nb + eps * k)
        out += (p - q) * math.log(p / q)
    return out


def test_drift_report_categorical_hand_computed(spark):
    ca = {"x": 5, "y": 3, "z": 2}
    cb = {"x": 2, "y": 6, "z": 2}
    rows = [("a", l) for l, c in ca.items() for _ in range(c)] + [
        ("b", l) for l, c in cb.items() for _ in range(c)
    ]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    out = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }
    s = out["s"]
    assert s["kind"] == "categorical"
    assert s["n_a"] == 10 and s["n_b"] == 10 and s["n_levels"] == 3
    assert s["chi2"] == pytest.approx(_chi2_2xk(ca, cb), abs=1e-5)
    assert s["psi"] == pytest.approx(_psi(ca, cb), abs=1e-5)
    assert s["ks_d"] is None and s["w1_distance"] is None
    assert s["mean_a"] is None and s["mean_b"] is None
    v = out["v"]
    assert v["kind"] == "numeric"
    assert v["chi2"] is None and v["psi"] is None
    assert v["ks_d"] == pytest.approx(0.0)


def test_drift_report_cat_level_absent_in_one_cohort(spark):
    # a level seen only in cohort b must stay finite via smoothing
    rows = [("a", "x"), ("a", "x"), ("b", "x"), ("b", "zz")]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    s = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }["s"]
    ca, cb = {"x": 2}, {"x": 1, "zz": 1}
    assert s["psi"] == pytest.approx(_psi(ca, cb), abs=1e-5)
    assert s["chi2"] == pytest.approx(_chi2_2xk(ca, cb), abs=1e-5)
    assert math.isfinite(s["psi"]) and math.isfinite(s["chi2"])


def test_drift_report_cat_empty_cohort_nulls(spark):
    rows = [("a", "x"), ("a", "y")]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    s = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }["s"]
    assert s["chi2"] is None and s["psi"] is None
    assert s["n_a"] == 2 and s["n_b"] == 0


def test_drift_report_rejects_overlapping_cols(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "x"])
    with pytest.raises(ValueError):
        drift_report(df, "g", ["x"], "a", "b", cat_cols=["x"])


def test_drift_report_cat_null_levels_excluded(spark):
    rows = [("a", "x"), ("a", None), ("b", "x")]
    df = spark.createDataFrame(rows, ["g", "s"]).withColumn(
        "v", __import__("pyspark").sql.functions.lit(1.0)
    )
    s = {
        r["column"]: r
        for r in drift_report(
            df, "g", ["v"], "a", "b", cat_cols=["s"]
        ).collect()
    }["s"]
    assert s["n_a"] == 1 and s["n_b"] == 1 and s["n_levels"] == 1


# ---------------------------------------------------------------------------
# PNG codec (stdlib zlib — the first compressed media format)
# ---------------------------------------------------------------------------

import struct
import zlib

import numpy as np

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_png_bytes,
    encode_png,
)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _build_png(px: np.ndarray, ctype: int, filters: list) -> bytes:
    """Hand-filter an (h, w, ch) uint8 array per PNG spec §9 and wrap
    it in a minimal PNG container — the forward transform the decoder
    must invert, written independently of the encoder under test."""
    h, w, ch = px.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = filters[y]
        raw.append(f)
        for x in range(w * ch):
            left = int(line[x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - left
            elif f == 2:
                v = line[x] - up
            elif f == 3:
                v = line[x] - (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                v = line[x] - pred
            raw.append(v & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_roundtrip_gray():
    rng = np.random.default_rng(7)
    img = rng.random((13, 9))
    got = decode_png_bytes(encode_png(img))
    assert got.shape == (13, 9)
    assert np.abs(got - img).max() <= 1.0 / 255 + 1e-6


def test_png_all_filter_types_unfilter_exactly():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 7, 1), dtype=np.uint8)
    payload = _build_png(px, ctype=0, filters=[0, 1, 2, 3, 4])
    got = decode_png_bytes(payload)
    assert np.array_equal(
        np.rint(got * 255).astype(np.uint8), px[:, :, 0]
    )


def test_png_rgb_and_rgba_collapse_to_rec601_luma():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    want = (
        rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    ) / 255.0
    got = decode_png_bytes(_build_png(rgb, ctype=2, filters=[4, 3, 1, 2]))
    assert np.abs(got - want).max() < 1e-6
    rgba = np.concatenate(
        [rgb, np.full((4, 6, 1), 200, dtype=np.uint8)], axis=2
    )
    got4 = decode_png_bytes(_build_png(rgba, ctype=6, filters=[0, 4, 2, 1]))
    assert np.abs(got4 - want).max() < 1e-6


def test_png_gray_alpha_drops_alpha():
    rng = np.random.default_rng(5)
    ga = rng.integers(0, 256, size=(3, 3, 2), dtype=np.uint8)
    got = decode_png_bytes(_build_png(ga, ctype=4, filters=[1, 4, 3]))
    assert np.array_equal(
        np.rint(got * 255).astype(np.uint8), ga[:, :, 0]
    )


def test_png_named_rejections():
    img = np.zeros((2, 2, 1), dtype=np.uint8)
    ok = _build_png(img, 0, [0, 0])
    with pytest.raises(ValueError, match="signature"):
        decode_png_bytes(b"BM" + ok)
    # 16-bit depth: rebuilt with a valid container, not CRC-poked
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    p16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png_bytes(p16)
    # palette PNG WITHOUT a PLTE chunk: named refusal (with a PLTE it
    # decodes — see test_png_palette_decodes_via_plte_lookup)
    ihdr_pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    ppal = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr_pal)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_bytes(ppal)
    # Adam7 decodes as of round 14 (tests/test_round14_ops.py); a 2x2
    # interlaced image needs 7 pass bytes, so this 6-byte stream is
    # short one byte and must fail with the NAMED pass-truncation
    # error rather than the old blanket interlace fence
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    pi = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr_i)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="Adam7 pass data truncated"):
        decode_png_bytes(pi)


def test_png_palette_decodes_via_plte_lookup():
    """Color type 3: scanlines carry 8-bit PLTE indices; the decode
    must look them up and collapse the palette RGB via Rec.601 —
    checked against a hand-computed expectation, with Paeth/Sub
    filters on the index plane to prove unfiltering happens BEFORE
    the lookup."""
    rng = np.random.default_rng(13)
    plte_rgb = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, size=(4, 6, 1), dtype=np.uint8)
    body = _build_png(idx, ctype=3, filters=[0, 1, 4, 2])
    # splice a PLTE chunk in front of IDAT (after IHDR)
    ihdr_end = body.index(b"IDAT") - 4
    payload = (
        body[:ihdr_end]
        + _png_chunk(b"PLTE", plte_rgb.tobytes())
        + body[ihdr_end:]
    )
    want = (
        plte_rgb[idx[:, :, 0]].astype(np.float64) @ [0.299, 0.587, 0.114]
    ) / 255.0
    got = decode_png_bytes(payload)
    assert np.abs(got - want).max() < 1e-6
    # out-of-range index: loud, not a wrap-around
    bad_plte = _png_chunk(b"PLTE", plte_rgb[:3].tobytes())
    bad = body[:ihdr_end] + bad_plte + body[ihdr_end:]
    with pytest.raises(ValueError, match="index out of range"):
        decode_png_bytes(bad)


def test_decode_images_png_distributed_matches_direct(spark):
    from gbif_filter_python_spark.multimodal.binary_ops import (
        _fake_pixels,
        decode_images,
    )

    imgs = {
        i: _fake_pixels(str(i).encode(), 6 + i) for i in range(1, 4)
    }
    media = spark.createDataFrame(
        [(i, bytearray(encode_png(a))) for i, a in imgs.items()],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in decode_images(media, codec="png").collect()
    }
    for i, a in imgs.items():
        r = out[i]
        assert (r.height, r.width) == a.shape
        got = np.array(r.pixels, dtype=np.float64).reshape(a.shape)
        assert np.abs(got - a).max() <= 1.0 / 255 + 1e-6


# ---------------------------------------------------------------------------
# Baseline JPEG codec (the "a real 100 TB multimodal corpus is
# JPEG-first" gap named by the round-11 review): own Huffman + DCT,
# no codec library. The decoder is validated three independent ways —
# against the repo's own encoder (round-trip / fixed-point), against
# hand-built bitstream variations (restart markers), and against the
# JVM's javax.imageio codec (test_jpeg_jvm_crossval.py), a fully
# independent implementation that ships inside the Spark runtime.
# ---------------------------------------------------------------------------

from gbif_filter_python_spark.multimodal.binary_ops import (  # noqa: E402
    decode_jpeg_bytes,
    encode_jpeg,
)


def test_jpeg_roundtrip_shapes_and_quality_ladder():
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (16, 24), (9, 13), (1, 1), (31, 17)]:
        img = rng.random(shape)
        prev_err = None
        for q in (50, 85, 95):
            got = decode_jpeg_bytes(encode_jpeg(img, quality=q))
            assert got.shape == shape
            err = float(np.abs(got - img).max())
            # lossy, but bounded and (up to per-image rounding luck
            # at already-tiny errors) improving with q
            assert err < 0.35
            if prev_err is not None:
                assert err <= prev_err + 2e-3
            prev_err = err


def test_jpeg_smooth_image_reconstructs_closely():
    y, x = np.mgrid[0:64, 0:64]
    smooth = (np.sin(x / 10) + np.cos(y / 13) + 2) / 4
    got = decode_jpeg_bytes(encode_jpeg(smooth, quality=95))
    assert float(np.abs(got - smooth).max()) < 0.02


def test_jpeg_recompression_is_near_stationary():
    """Re-encoding decoded pixels at the same quality must leave them
    (almost) unchanged: the decoded blocks sit at reconstruction
    points of the same quantizer, so the only drift is the uint8
    re-rounding of the continuous IDCT output nudging a borderline
    coefficient by one step — bounded well under one gray level of
    additional error per generation. Any real error in either
    direction (DCT scaling, zigzag, Huffman tables, EXTEND) blows
    this bound up immediately."""
    rng = np.random.default_rng(3)
    img = rng.random((24, 40))
    d1 = decode_jpeg_bytes(encode_jpeg(img, quality=85))
    d2 = decode_jpeg_bytes(encode_jpeg(d1, quality=85))
    assert float(np.abs(d2 - d1).max()) <= 2.0 / 255
    # and on DCT-sparse content the fixed point is exact
    y, x = np.mgrid[0:32, 0:32]
    smooth = (np.sin(x / 10) + np.cos(y / 13) + 2) / 4
    s1 = decode_jpeg_bytes(encode_jpeg(smooth, quality=85))
    s2 = decode_jpeg_bytes(encode_jpeg(s1, quality=85))
    assert np.array_equal(s1, s2)


def test_jpeg_restart_markers_change_bytes_not_pixels():
    """restart_interval re-chunks the entropy stream (byte-aligned
    RSTn every N MCUs, DC predictor reset) without touching the
    coefficients — so payload bytes differ, decoded pixels are
    IDENTICAL arrays, and the DRI path in the decoder is exercised."""
    rng = np.random.default_rng(5)
    img = rng.random((16, 32))  # 2x4 = 8 MCUs
    plain = encode_jpeg(img, quality=85)
    restarted = encode_jpeg(img, quality=85, restart_interval=2)
    assert plain != restarted
    assert b"\xff\xdd" in restarted and b"\xff\xd0" in restarted
    assert np.array_equal(
        decode_jpeg_bytes(plain), decode_jpeg_bytes(restarted)
    )


def test_jpeg_entropy_stream_byte_stuffing_is_exercised():
    """0xFF bytes inside the entropy stream must be stuffed with 0x00
    on encode and unstuffed on decode. Scan a pool of payloads for a
    stuffed pair between SOS and EOI to prove the path actually ran
    (random 64x64 noise makes one effectively certain), then round-trip
    that payload."""
    rng = np.random.default_rng(11)
    for _ in range(8):
        img = rng.random((64, 64))
        payload = encode_jpeg(img, quality=95)
        sos = payload.index(b"\xff\xda")
        if b"\xff\x00" in payload[sos:-2]:
            got = decode_jpeg_bytes(payload)
            assert got.shape == (64, 64)
            assert float(np.abs(got - img).max()) < 0.35
            return
    raise AssertionError("no payload exercised byte stuffing")


def test_jpeg_named_rejections():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"\x89PNG\r\n\x1a\n")
    rng = np.random.default_rng(9)
    ok = encode_jpeg(rng.random((16, 32)), quality=95)
    # flip SOF0 -> SOF2: progressive DECODES now (r12), but a
    # sequential scan header (Se=63) inside a progressive frame is
    # malformed and must fail loudly, not decode as garbage
    sof = ok.index(b"\xff\xc0")
    prog = ok[:sof] + b"\xff\xc2" + ok[sof + 2 :]
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg_bytes(prog)
    # arithmetic coding (SOF9): named refusal
    arith = ok[:sof] + b"\xff\xc9" + ok[sof + 2 :]
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg_bytes(arith)
    # 12-bit precision: named refusal
    deep = bytearray(ok)
    deep[sof + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg_bytes(bytes(deep))
    # truncated entropy stream: loud, not a silent partial image
    with pytest.raises(ValueError, match="exhausted|MCUs"):
        decode_jpeg_bytes(ok[:-20])


def test_decode_images_jpeg_distributed_matches_direct(spark):
    from gbif_filter_python_spark.multimodal.binary_ops import (
        _fake_pixels,
        decode_images,
    )

    imgs = {
        i: _fake_pixels(str(i).encode(), 8 + i) for i in range(1, 4)
    }
    payloads = {
        i: encode_jpeg(a, quality=90, restart_interval=i % 2)
        for i, a in imgs.items()
    }
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()],
        "media_id long, payload binary",
    )
    out = {
        r.media_id: r
        for r in decode_images(media, codec="jpeg").collect()
    }
    for i, a in imgs.items():
        r = out[i]
        assert (r.height, r.width) == a.shape
        got = np.array(r.pixels, dtype=np.float32).reshape(a.shape)
        want = decode_jpeg_bytes(payloads[i])
        assert np.array_equal(got, want)  # distributed == direct, exact


# ---------------------------------------------------------------------------
# Compressed WAV codecs (r12): IMA ADPCM (format 0x11) encode+decode,
# G.711 A-law / µ-law (formats 6/7) decode. The G.711 expansions are
# pinned against the spec's extreme codewords; ADPCM against its own
# mirror (encoder embeds the decoder's reconstruction arithmetic) plus
# quality/length/compression invariants.
# ---------------------------------------------------------------------------

from gbif_filter_python_spark.multimodal.binary_ops import (  # noqa: E402
    decode_wav_bytes,
    encode_adpcm_wav,
    encode_wav,
)


def _wav_container(fmt_tag: int, codes: bytes, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate, 1, 8)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(codes), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(codes))
        + codes
    )


def test_mulaw_decode_matches_g711_reference_codewords():
    # 0xFF → 0, 0x80 → +32124 (max), 0x00 → -32124, 0x7F → -0
    x, rate = decode_wav_bytes(_wav_container(7, bytes([0xFF, 0x80, 0x00, 0x7F])))
    assert rate == 8000
    assert [round(float(v) * 32768) for v in x] == [0, 32124, -32124, 0]


def test_alaw_decode_matches_g711_reference_codewords():
    # 0xD5 → +8 (min), 0x55 → -8, 0xAA → +32256 (max), 0x2A → -32256
    x, _ = decode_wav_bytes(_wav_container(6, bytes([0xD5, 0x55, 0xAA, 0x2A])))
    assert [round(float(v) * 32768) for v in x] == [8, -8, 32256, -32256]


def test_adpcm_roundtrip_quality_length_and_compression():
    t = np.arange(4000) / 16000.0
    sine = 0.6 * np.sin(2 * np.pi * 440 * t)
    payload = encode_adpcm_wav(sine, sample_rate=16000)
    dec, rate = decode_wav_bytes(payload)
    assert rate == 16000
    # fact chunk strips final-block padding: EXACT length back
    assert dec.shape == (4000,)
    err = dec.astype(np.float64) - sine
    snr = 10 * np.log10(np.mean(sine**2) / np.mean(err**2))
    assert snr > 30.0  # 4-bit ADPCM on a tone: mid-30s dB typical
    assert float(np.abs(err).max()) < 0.05
    # ~4:1 vs PCM16 (block headers cost a little)
    ratio = len(encode_wav(sine)) / len(payload)
    assert 3.5 < ratio < 4.1
    # deterministic both directions
    assert payload == encode_adpcm_wav(sine, sample_rate=16000)
    assert np.array_equal(dec, decode_wav_bytes(payload)[0])


def test_adpcm_multiblock_state_carries_across_blocks():
    # > 1 block (spb=505 at block_align=256): step index carries over,
    # so a loud signal stays locked after the block boundary
    rng = np.random.default_rng(23)
    sig = np.clip(
        np.cumsum(rng.standard_normal(1600)) / 40.0, -0.9, 0.9
    )
    dec, _ = decode_wav_bytes(encode_adpcm_wav(sig))
    assert dec.shape == (1600,)
    # random-walk signal: RMS error a small fraction of signal RMS
    err = dec.astype(np.float64) - sig
    assert np.sqrt(np.mean(err**2)) < 0.05 * max(np.sqrt(np.mean(sig**2)), 0.1)


def test_adpcm_named_errors():
    with pytest.raises(ValueError, match="empty"):
        encode_adpcm_wav(np.array([]))
    # stereo ADPCM: named refusal (channel de-interleave not implemented)
    mono = encode_adpcm_wav(np.zeros(32))
    fmt_at = mono.index(b"fmt ") + 8
    stereo = bytearray(mono)
    stereo[fmt_at + 2] = 2  # nChannels
    with pytest.raises(ValueError, match="channels"):
        decode_wav_bytes(bytes(stereo))
