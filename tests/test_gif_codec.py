"""GIF89a codec tests: LZW roundtrips (incl. table-reset and
interlace paths), animation compositing, the named-error contract on
malformed input, truncation fuzz, and byte-exact cross-validation
against the JVM's javax.imageio GIF plugin (an independent codec that
ships inside the Spark runtime — zero shared lines with ours)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_gif_bytes,
    decode_gif_frames,
    decode_images,
    detect_codec_bytes,
    encode_gif,
)


def _q(a: np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(a) * 255.0) / 255.0


class TestGifRoundtrip:
    @pytest.mark.parametrize(
        "shape", [(8, 8), (33, 17), (1, 1), (128, 128)]
    )
    def test_random(self, shape):
        """128x128 random pixels force the 4096-entry LZW table past
        full, exercising the mid-stream CLEAR/reset path."""
        img = np.random.default_rng(sum(shape)).random(shape)
        got = decode_gif_bytes(encode_gif(img))
        assert got.shape == shape
        assert np.allclose(got, _q(img), atol=1 / 255 + 1e-6)

    def test_interlaced(self):
        rng = np.random.default_rng(5)
        img = rng.random((37, 23))
        got = decode_gif_bytes(encode_gif(img, interlace=True))
        assert np.allclose(got, _q(img), atol=1 / 255 + 1e-6)
        # interlace must actually change the on-wire row order
        assert encode_gif(img, interlace=True) != encode_gif(img)

    def test_animation(self):
        rng = np.random.default_rng(6)
        frames = [rng.random((16, 16)) for _ in range(4)]
        dec = decode_gif_frames(encode_gif(frames))
        assert len(dec) == 4
        for f, d in zip(frames, dec):
            assert np.allclose(d, _q(f), atol=1 / 255 + 1e-6)

    def test_gradient_long_runs(self):
        img = np.tile(np.linspace(0, 1, 64), (64, 1))
        got = decode_gif_bytes(encode_gif(img))
        assert np.allclose(got, _q(img), atol=1 / 255 + 1e-6)

    def test_partial_frame_composites_onto_canvas(self):
        """Hand-build a GIF whose second frame covers only a 2x2 tile
        at (1,1): untouched canvas pixels must keep frame-1 values."""
        base = encode_gif(np.zeros((4, 4)))
        tile = encode_gif(np.ones((2, 2)))
        # splice: take base up to (but not incl.) its trailer, then
        # the tile's image block with left=top=1, then the trailer
        import struct

        blk_off = 13 + 768  # header + LSD + 256-entry global palette
        assert tile[blk_off] == 0x2C
        patched = bytearray(tile[blk_off:-1])
        struct.pack_into("<HH", patched, 1, 1, 1)  # left=1, top=1
        frames = decode_gif_frames(base[:-1] + bytes(patched) + b"\x3b")
        assert len(frames) == 2
        want = np.zeros((4, 4), dtype=np.float32)
        want[1:3, 1:3] = 1.0
        assert np.array_equal(frames[1], want)

    def test_encode_contract(self):
        with pytest.raises(ValueError, match="at least one frame"):
            encode_gif([])
        with pytest.raises(ValueError, match="one \\(h, w\\) gray shape"):
            encode_gif([np.zeros((4, 4)), np.zeros((5, 4))])
        with pytest.raises(ValueError, match="one \\(h, w\\) gray shape"):
            encode_gif(np.zeros((4, 4, 3)))

    def test_detect_and_decode_images_routing(self):
        img = np.random.default_rng(3).random((8, 8))
        assert detect_codec_bytes(encode_gif(img)) == "gif"
        # decode_images routes codec='gif' but still refuses to sniff
        with pytest.raises(ValueError, match="'gif'"):
            decode_images(None, codec="webp")


class TestGifNamedErrors:
    def test_rejections(self):
        p = encode_gif(np.random.default_rng(1).random((9, 7)))
        with pytest.raises(ValueError, match="missing GIF87a/89a"):
            decode_gif_bytes(b"NOTG" + p)
        with pytest.raises(ValueError, match="screen descriptor"):
            decode_gif_bytes(p[:10])
        with pytest.raises(ValueError, match="no image blocks"):
            decode_gif_bytes(p[:13] + p[13 : 13 + 768] + b"\x3b")
        with pytest.raises(ValueError, match="unknown GIF block"):
            decode_gif_bytes(
                p[:781] + b"\x55" + p[782:]
            )  # corrupt the image-separator byte
        with pytest.raises(ValueError, match="without a trailer"):
            decode_gif_bytes(p[:-1])

    def test_disposal_and_gce(self):
        frames = [np.zeros((4, 4)), np.ones((4, 4))]
        p = bytearray(encode_gif(frames))
        i = p.index(b"\x21\xf9")
        p[i + 3] = 0x08  # disposal method 2 (restore background)
        with pytest.raises(ValueError, match="disposal method"):
            decode_gif_frames(bytes(p))

    def test_lzw_stream_truncated(self):
        p = encode_gif(np.random.default_rng(2).random((16, 16)))
        # chop inside the LZW sub-block chain
        with pytest.raises(ValueError, match="truncated|overruns"):
            decode_gif_bytes(p[: len(p) - 30])

    @settings(max_examples=150, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=900))
    def test_truncation_fuzz_always_named(self, cut):
        """EVERY truncation point raises ValueError — never
        IndexError/KeyError/struct.error (the round-13 ADVICE
        contract, applied to the new decoder from day one)."""
        p = encode_gif(
            [
                np.random.default_rng(9).random((12, 11)),
                np.random.default_rng(10).random((12, 11)),
            ]
        )
        if cut >= len(p):
            return
        with pytest.raises(ValueError):
            decode_gif_frames(p[:cut])

    @settings(max_examples=80, deadline=None)
    @given(
        pos=st.integers(min_value=6, max_value=500),
        val=st.integers(min_value=0, max_value=255),
    )
    def test_mutation_fuzz_named_or_decodes(self, pos, val):
        """Single-byte corruption anywhere either still decodes (a
        palette/pixel byte) or raises ValueError — never a raw
        non-ValueError exception."""
        p = encode_gif(np.random.default_rng(11).random((10, 10)))
        if pos >= len(p):
            return
        b = bytearray(p)
        b[pos] = val
        try:
            frames = decode_gif_frames(bytes(b))
            # corrupt byte may legitimately change dims/pixels; the
            # contract under test is "named error or clean frames"
            assert all(isinstance(f, np.ndarray) for f in frames)
        except ValueError:
            pass


class TestGifJvmCrossval:
    """javax.imageio GIF plugin as the independent codec oracle."""

    def _jvm_decode_gray(self, spark, payload: bytes) -> np.ndarray:
        jvm = spark._jvm
        bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        img = jvm.javax.imageio.ImageIO.read(bis)
        w, h = img.getWidth(), img.getHeight()
        argb = np.array(
            img.getRGB(0, 0, w, h, None, 0, w), dtype=np.int64
        ).reshape(h, w)
        r = (argb >> 16) & 0xFF
        assert np.array_equal(r, (argb >> 8) & 0xFF)
        assert np.array_equal(r, argb & 0xFF)
        return r.astype(np.float64)

    def _jvm_encode(self, spark, arr_u8: np.ndarray) -> bytes:
        jvm = spark._jvm
        h, w = arr_u8.shape
        img = jvm.java.awt.image.BufferedImage(w, h, 10)  # BYTE_GRAY
        img.getRaster().setDataElements(
            0, 0, w, h, bytearray(arr_u8.tobytes())
        )
        bos = jvm.java.io.ByteArrayOutputStream()
        assert jvm.javax.imageio.ImageIO.write(img, "gif", bos)
        return bytes(bos.toByteArray())

    def test_ours_to_jvm_exact(self, spark):
        rng = np.random.default_rng(7)
        for shape, interlace in [((16, 16), False), ((31, 45), True),
                                 ((64, 64), False)]:
            f = rng.random(shape)
            jv = self._jvm_decode_gray(
                spark, encode_gif(f, interlace=interlace)
            )
            assert np.array_equal(jv, np.rint(f * 255.0))

    def test_jvm_to_ours_exact(self, spark):
        rng = np.random.default_rng(8)
        for shape in [(16, 16), (40, 27), (64, 64)]:
            u8 = (rng.random(shape) * 255).astype(np.uint8)
            ours = decode_gif_bytes(self._jvm_encode(spark, u8)) * 255.0
            assert np.allclose(ours, u8, atol=0.51)
