"""TIFF 6.0 codec tests: strip/endian/multi-page roundtrips, the IFD
metadata walk, named errors on malformed or out-of-scope payloads,
truncation fuzz, and byte-exact cross-validation against the JVM's
javax.imageio TIFF plugin (raw raster reads — getRGB would apply the
gray ICC→sRGB gamma and is deliberately avoided)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_tiff_bytes,
    decode_tiff_frames,
    detect_codec_bytes,
    encode_tiff,
    parse_tiff_metadata,
)


def _q(a: np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(a) * 255.0) / 255.0


class TestTiffRoundtrip:
    @pytest.mark.parametrize("endian", ["<", ">"])
    @pytest.mark.parametrize("shape", [(8, 8), (33, 17), (1, 1)])
    def test_single_page(self, endian, shape):
        img = np.random.default_rng(sum(shape)).random(shape)
        p = encode_tiff(img, endian=endian)
        assert np.allclose(decode_tiff_bytes(p), _q(img), atol=1e-6)
        m = parse_tiff_metadata(p)[0]
        assert (m["width"], m["height"]) == (shape[1], shape[0])
        assert m["endian"] == ("little" if endian == "<" else "big")
        assert m["compression"] == 1 and m["bits_per_sample"] == 8

    def test_multi_strip_multi_page(self):
        rng = np.random.default_rng(4)
        frames = [rng.random((23, 9)) for _ in range(3)]
        p = encode_tiff(frames, rows_per_strip=4)
        metas = parse_tiff_metadata(p)
        assert [m["n_strips"] for m in metas] == [6, 6, 6]
        dec = decode_tiff_frames(p)
        assert len(dec) == 3
        for f, d in zip(frames, dec):
            assert np.allclose(d, _q(f), atol=1e-6)

    def test_white_is_zero_inverts(self):
        img = np.random.default_rng(5).random((6, 6))
        p = bytearray(encode_tiff(img, endian="<"))
        # photometric tag (262) value: flip BlackIsZero→WhiteIsZero
        i = p.index(b"\x06\x01\x03\x00")
        assert p[i + 8] == 1
        p[i + 8] = 0
        got = decode_tiff_bytes(bytes(p))
        assert np.allclose(got, 1.0 - _q(img), atol=1e-6)

    def test_detect(self):
        img = np.zeros((4, 4))
        assert detect_codec_bytes(encode_tiff(img, endian="<")) == "tiff"
        assert detect_codec_bytes(encode_tiff(img, endian=">")) == "tiff"

    def test_encode_contract(self):
        with pytest.raises(ValueError, match="at least one frame"):
            encode_tiff([])
        with pytest.raises(ValueError, match="endian"):
            encode_tiff(np.zeros((4, 4)), endian="=")
        with pytest.raises(ValueError, match="gray frames"):
            encode_tiff(np.zeros((4, 4, 3)))


class TestTiffCompression:
    @pytest.mark.parametrize(
        "comp,pred",
        [
            ("lzw", 1),
            ("lzw", 2),
            ("zlib", 1),
            ("zlib", 2),
            ("packbits", 1),
        ],
    )
    def test_roundtrip(self, comp, pred):
        rng = np.random.default_rng(hash((comp, pred)) % 2**32)
        for shape in [(8, 8), (33, 17), (64, 64)]:
            img = rng.random(shape)
            p = encode_tiff(
                img,
                rows_per_strip=7,
                compression=comp,
                predictor=pred,
            )
            assert np.allclose(
                decode_tiff_bytes(p), _q(img), atol=1e-6
            ), (comp, pred, shape)
            m = parse_tiff_metadata(p)[0]
            assert m["predictor"] == pred

    def test_lzw_table_reset(self):
        """128x128 random pixels push the 4096-entry LZW table past
        full — exercising the mid-stream clear path."""
        img = np.random.default_rng(12).random((128, 128))
        p = encode_tiff(img, compression="lzw", predictor=2)
        assert np.allclose(decode_tiff_bytes(p), _q(img), atol=1e-6)

    def test_compression_actually_compresses(self):
        img = np.full((40, 40), 0.5)
        for comp in ("lzw", "zlib", "packbits"):
            p = encode_tiff(img, compression=comp)
            assert len(p) < 40 * 40, comp
            assert np.allclose(
                decode_tiff_bytes(p), _q(img), atol=1e-6
            )

    def test_packbits_unit(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            _tiff_packbits_decode,
            _tiff_packbits_encode,
        )

        for data in [
            b"",
            b"a",
            b"aaaa",
            b"abcabc",
            b"ab" + b"c" * 200 + b"de",
            bytes(range(256)) * 2,
            b"x" * 500,
        ]:
            enc = _tiff_packbits_encode(data)
            assert _tiff_packbits_decode(enc, len(data)) == data
        # noop byte (0x80) is skipped
        assert _tiff_packbits_decode(b"\x80\x00a", 1) == b"a"
        with pytest.raises(ValueError, match="overruns the strip"):
            _tiff_packbits_decode(b"\x05ab", 6)
        with pytest.raises(ValueError, match="missing its byte"):
            _tiff_packbits_decode(b"\xfe", 3)

    def test_named_stream_errors(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            _tiff_lzw_decode,
            _tiff_lzw_encode,
        )

        enc = _tiff_lzw_encode(b"hello world hello world")
        assert _tiff_lzw_decode(enc, 23) == b"hello world hello world"
        with pytest.raises(ValueError, match="truncated before its EOI"):
            _tiff_lzw_decode(enc[:3], 23)
        with pytest.raises(ValueError, match="expected"):
            _tiff_lzw_decode(enc, 24)
        with pytest.raises(ValueError, match="decodes past"):
            _tiff_lzw_decode(enc, 4)

    def test_predictor_contract(self):
        with pytest.raises(ValueError, match="requires compression"):
            encode_tiff(np.zeros((4, 4)), compression="packbits",
                        predictor=2)
        with pytest.raises(ValueError, match="requires compression"):
            encode_tiff(np.zeros((4, 4)), predictor=2)
        with pytest.raises(ValueError, match="compression must be"):
            encode_tiff(np.zeros((4, 4)), compression="jpeg")


class TestTiffNamedErrors:
    def test_structural(self):
        p = encode_tiff(np.random.default_rng(1).random((9, 7)))
        with pytest.raises(ValueError, match="byte-order magic"):
            decode_tiff_bytes(b"XX" + p[2:])
        with pytest.raises(ValueError, match="overruns payload"):
            decode_tiff_bytes(p[:20])
        # IFD self-loop: patch next-IFD pointer back to the IFD
        import struct

        b = bytearray(p)
        (ifd_off,) = struct.unpack_from("<I", b, 4)
        (n,) = struct.unpack_from("<H", b, ifd_off)
        struct.pack_into("<I", b, ifd_off + 2 + 12 * n, ifd_off)
        with pytest.raises(ValueError, match="chain loops"):
            decode_tiff_bytes(bytes(b))

    def test_scope_fences_are_named(self):
        p = bytearray(encode_tiff(np.zeros((5, 5)), endian="<"))
        i = p.index(b"\x03\x01\x03\x00")  # compression tag 259
        p[i + 8] = 7  # JPEG-in-TIFF
        with pytest.raises(ValueError, match="compressed TIFF .code 7."):
            decode_tiff_bytes(bytes(p))
        # metadata walk still reports the code instead of raising
        assert parse_tiff_metadata(bytes(p))[0]["compression"] == 7
        p[i + 8] = 1
        j = p.index(b"\x02\x01\x03\x00")  # bits-per-sample tag 258
        p[j + 8] = 16
        with pytest.raises(ValueError, match="bit depth"):
            decode_tiff_bytes(bytes(p))

    @settings(max_examples=150, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=700))
    def test_truncation_fuzz_always_named(self, cut):
        p = encode_tiff(
            [np.random.default_rng(9).random((12, 11))] * 2,
            rows_per_strip=5,
        )
        if cut >= len(p):
            return
        with pytest.raises(ValueError):
            decode_tiff_frames(p[:cut])

    @settings(max_examples=80, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=400),
        val=st.integers(min_value=0, max_value=255),
    )
    def test_mutation_fuzz_named_or_decodes(self, pos, val):
        p = encode_tiff(np.random.default_rng(11).random((10, 10)))
        if pos >= len(p):
            return
        b = bytearray(p)
        b[pos] = val
        try:
            frames = decode_tiff_frames(bytes(b))
            assert all(isinstance(f, np.ndarray) for f in frames)
        except ValueError:
            pass


class TestTiffJvmCrossval:
    """javax.imageio TIFF plugin (JDK ≥9) as the independent codec."""

    def _jvm_decode_raw(self, spark, payload: bytes) -> np.ndarray:
        jvm = spark._jvm
        bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        img = jvm.javax.imageio.ImageIO.read(bis)
        assert img is not None, "ImageIO could not read our TIFF"
        w, h = img.getWidth(), img.getHeight()
        obj = img.getRaster().getDataElements(0, 0, w, h, None)
        arr = np.frombuffer(bytes(obj), dtype=np.uint8)
        return arr.reshape(h, w, arr.size // (w * h))[:, :, 0].astype(
            np.float64
        )

    def _jvm_encode(
        self, spark, arr_u8: np.ndarray, ctype: str | None = None
    ) -> bytes:
        jvm = spark._jvm
        h, w = arr_u8.shape
        img = jvm.java.awt.image.BufferedImage(w, h, 10)  # BYTE_GRAY
        img.getRaster().setDataElements(
            0, 0, w, h, bytearray(arr_u8.tobytes())
        )
        bos = jvm.java.io.ByteArrayOutputStream()
        if ctype is None:
            assert jvm.javax.imageio.ImageIO.write(img, "tiff", bos)
            return bytes(bos.toByteArray())
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "tiff"
        ).next()
        param = writer.getDefaultWriteParam()
        param.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
        )
        param.setCompressionType(ctype)
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(
            None, jvm.javax.imageio.IIOImage(img, None, None), param
        )
        ios.flush()
        writer.dispose()
        return bytes(bos.toByteArray())

    def test_ours_to_jvm_exact(self, spark):
        rng = np.random.default_rng(7)
        for endian in ("<", ">"):
            for shape in [(16, 16), (31, 45)]:
                f = rng.random(shape)
                jv = self._jvm_decode_raw(
                    spark, encode_tiff(f, endian=endian, rows_per_strip=7)
                )
                assert np.array_equal(jv, np.rint(f * 255.0))

    def test_jvm_to_ours_exact(self, spark):
        rng = np.random.default_rng(8)
        for shape in [(16, 16), (40, 27)]:
            u8 = (rng.random(shape) * 255).astype(np.uint8)
            p = self._jvm_encode(spark, u8)
            m = parse_tiff_metadata(p)[0]
            assert (m["width"], m["height"]) == (shape[1], shape[0])
            ours = decode_tiff_bytes(p) * 255.0
            assert np.allclose(ours, u8, atol=0.51)

    def test_compressed_ours_to_jvm_exact(self, spark):
        rng = np.random.default_rng(9)
        for comp, pred in [("lzw", 1), ("lzw", 2), ("zlib", 1),
                           ("zlib", 2), ("packbits", 1)]:
            f = rng.random((33, 29))
            p = encode_tiff(
                f, compression=comp, predictor=pred, rows_per_strip=6
            )
            jv = self._jvm_decode_raw(spark, p)
            assert np.array_equal(jv, np.rint(f * 255.0)), (comp, pred)

    def test_compressed_jvm_to_ours_exact(self, spark):
        rng = np.random.default_rng(10)
        for ctype in ("LZW", "PackBits", "ZLib", "Deflate"):
            u8 = (rng.random((45, 37)) * 255).astype(np.uint8)
            p = self._jvm_encode(spark, u8, ctype)
            ours = np.rint(decode_tiff_bytes(p) * 255.0).astype(
                np.uint8
            )
            assert np.array_equal(ours, u8), ctype
