"""Round-14 operator tests: JPEG truncation error contract (ADVICE
r13), lineage_ancestors registry query, MP3 frame-header metadata."""

from __future__ import annotations

import numpy as np
import pytest

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_jpeg_bytes,
    encode_jpeg,
)


class TestJpegTruncationNamedErrors:
    """ADVICE r13: the fast entropy walk checks ``bp`` once per
    block, so a garbage block could previously run the 4-byte window
    padding off the end and surface a raw IndexError on SOME
    truncation points (which error you got was truncation-point
    dependent). The window runway is now sized to the worst-case
    per-block overshoot: EVERY truncation point must raise a NAMED
    ValueError, never IndexError."""

    def _payload(self, seed: int, shape=(64, 64), quality=90) -> bytes:
        rng = np.random.default_rng(seed)
        return encode_jpeg(rng.random(shape), quality=quality)

    def test_advice_repro_70pct_cut(self):
        payload = self._payload(11)
        with pytest.raises(ValueError):
            decode_jpeg_bytes(payload[: int(len(payload) * 0.7)])

    def test_every_truncation_point_is_named(self):
        # sweep cuts across the whole entropy stream (and headers):
        # each must be a named ValueError -- IndexError would escape
        # the pytest.raises and fail the test loudly
        payload = self._payload(7)
        sos = payload.index(b"\xff\xda")
        cuts = sorted(
            {
                int(len(payload) * f)
                for f in np.linspace(0.3, 0.999, 60)
            }
            | set(range(sos + 2, min(sos + 40, len(payload) - 1)))
        )
        for cut in cuts:
            if cut >= len(payload):
                continue
            try:
                decode_jpeg_bytes(payload[:cut])
            except ValueError:
                continue  # named rejection: the contract
            except IndexError as exc:  # pragma: no cover
                raise AssertionError(
                    f"raw IndexError at cut={cut}: {exc}"
                ) from exc
            # some header-only cuts can't even reach the walk; a
            # successful decode of a truncated payload is the only
            # other unacceptable outcome
            raise AssertionError(f"truncated payload decoded at cut={cut}")

    def test_corrupt_entropy_bytes_named(self):
        # corruption (not truncation): flip entropy bytes so the walk
        # decodes garbage blocks -- still must end in ValueError
        payload = self._payload(23)
        sos = payload.index(b"\xff\xda")
        body = bytearray(payload)
        rng = np.random.default_rng(5)
        changed = False
        for i in range(sos + 14, len(body) - 2, 7):
            if body[i] != 0xFF and body[i - 1] != 0xFF:
                body[i] = int(rng.integers(0, 255))
                changed = True
        assert changed
        # corrupted bits decode to garbage coefficients or a named
        # rejection -- the contract is ONLY that no raw IndexError
        # escapes; pytest surfaces one as a test error automatically
        for frac in (0.6, 0.8, 1.0):
            try:
                out = decode_jpeg_bytes(bytes(body[: int(len(body) * frac)]))
                assert out.shape == (64, 64)
            except ValueError:
                pass

    def test_intact_payload_still_decodes(self):
        rng = np.random.default_rng(3)
        img = rng.random((48, 80))
        got = decode_jpeg_bytes(encode_jpeg(img, quality=95))
        assert got.shape == (48, 80)
        assert float(np.abs(got - img).max()) < 0.35


class TestMp3Metadata:
    """r13 verdict ask 6: MPEG-1 Layer III frame-header walk (no
    audio decode) against the in-repo header synthesizer."""

    def test_cbr_roundtrip(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            parse_mp3_metadata,
            synthesize_mp3,
        )

        m = parse_mp3_metadata(
            synthesize_mp3(25, 192, 32000, channel_mode=2, seed=7)
        )
        assert m == {
            "n_frames": 25,
            "sample_rate": 32000,
            "bitrate_kbps_min": 192,
            "bitrate_kbps_max": 192,
            "is_vbr": False,
            "channel_mode": 2,
            "duration_ms": 25 * 1152 * 1000 // 32000,
            "id3v2_bytes": 0,
        }

    def test_vbr_id3v2_and_trailing_tag(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            parse_mp3_metadata,
            synthesize_mp3,
        )

        p = synthesize_mp3(
            12, [64, 160, 320], 48000, id3_payload=99, seed=3
        )
        m = parse_mp3_metadata(p)
        assert (m["is_vbr"], m["bitrate_kbps_min"], m["bitrate_kbps_max"]) \
            == (True, 64, 320)
        assert m["id3v2_bytes"] == 109  # 10-byte header + payload
        # ID3v1 trailer is tolerated and invisible in the metadata
        assert parse_mp3_metadata(p + b"TAG" + bytes(125)) == m

    def test_named_rejections(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            parse_mp3_metadata,
            synthesize_mp3,
        )

        p = synthesize_mp3(6, 128, seed=1)
        with pytest.raises(ValueError, match="truncated mid-frame"):
            parse_mp3_metadata(p[:-5])
        with pytest.raises(ValueError, match="sync lost"):
            parse_mp3_metadata(b"\x00" * 64)
        with pytest.raises(ValueError, match="no MPEG-1"):
            parse_mp3_metadata(b"")
        # MPEG-2 version bits: named refusal, not garbage metadata
        b = bytearray(p)
        b[1] = 0xF3  # version bits 10 (MPEG-2), layer III
        with pytest.raises(ValueError, match="only MPEG-1 Layer III"):
            parse_mp3_metadata(bytes(b))
        # Layer I: named refusal
        b = bytearray(p)
        b[1] = 0xFF  # layer bits 11 (Layer I)
        with pytest.raises(ValueError, match="only MPEG-1 Layer III"):
            parse_mp3_metadata(bytes(b))
        # free-format bitrate: named refusal
        b = bytearray(p)
        b[2] = b[2] & 0x0F
        with pytest.raises(ValueError, match="free-format"):
            parse_mp3_metadata(bytes(b))
        # sync lost mid-stream (first frame intact, then garbage)
        first_len = (144 * 128 * 1000) // 44100
        with pytest.raises(ValueError, match="sync lost at byte"):
            parse_mp3_metadata(p[:first_len] + b"\x01\x02\x03\x04" * 40)

    def test_mp4_box_roundtrip(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            parse_mp4_metadata,
            synthesize_mp4,
        )

        m = parse_mp4_metadata(
            synthesize_mp4(36000, 600, 2, 1, brand="mp42", seed=3)
        )
        assert m == {
            "brand": "mp42",
            "timescale": 600,
            "duration_ms": 60000,
            "n_tracks": 3,
            "n_video_tracks": 2,
            "n_audio_tracks": 1,
            "has_mdat": True,
        }
        # zero-track moov parses; exact integer ms at 90kHz timescale
        m0 = parse_mp4_metadata(synthesize_mp4(90001, 90000, 0, 0))
        assert m0["n_tracks"] == 0 and m0["duration_ms"] == 1000

    def test_mp4_named_rejections(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            parse_mp4_metadata,
            synthesize_mp4,
        )

        p = synthesize_mp4(600, 600, 1, 1)
        with pytest.raises(ValueError, match="overruns"):
            parse_mp4_metadata(p[:30])
        with pytest.raises(ValueError, match="truncated box header"):
            parse_mp4_metadata(p[:7])
        with pytest.raises(ValueError, match="ftyp"):
            parse_mp4_metadata(b"\x00\x00\x00\x08free")
        # version-1 mvhd (64-bit): named refusal, not misparse
        i = p.index(b"mvhd") + 4
        b = bytearray(p)
        b[i] = 1
        with pytest.raises(ValueError, match="version-0"):
            parse_mp4_metadata(bytes(b))
        # zero timescale: named
        b = bytearray(p)
        b[i + 12 : i + 16] = b"\x00\x00\x00\x00"
        with pytest.raises(ValueError, match="timescale is zero"):
            parse_mp4_metadata(bytes(b))

    def test_mp4_distributed_matches_direct(self, spark):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            mp4_metadata,
            parse_mp4_metadata,
            synthesize_mp4,
        )

        payloads = {
            i: synthesize_mp4(
                1000 * i, [600, 90000][i % 2], i % 3, i % 2,
                brand=["isom", "avc1"][i % 2], seed=i,
            )
            for i in range(1, 7)
        }
        df = spark.createDataFrame(
            [(i, p) for i, p in payloads.items()],
            "media_id long, payload binary",
        ).repartition(3)
        got = {r["media_id"]: r.asDict() for r in mp4_metadata(df).collect()}
        for i, p in payloads.items():
            want = parse_mp4_metadata(p)
            for k, v in want.items():
                assert got[i][k] == v, (i, k, got[i][k], v)

    def test_detect_codec_positive_and_adversarial(self):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            detect_codec_bytes,
            encode_avi,
            encode_bmp,
            encode_jpeg,
            encode_png,
            encode_wav,
            synthesize_mp3,
        )

        rng = np.random.default_rng(4)
        img = rng.random((8, 8))
        wave = (rng.random(64) * 2 - 1).astype(np.float32)
        assert detect_codec_bytes(encode_bmp(img)) == "bmp"
        assert detect_codec_bytes(encode_png(img)) == "png"
        assert detect_codec_bytes(encode_jpeg(img, quality=90)) == "jpeg"
        assert detect_codec_bytes(encode_wav(wave, 16_000)) == "wav"
        assert detect_codec_bytes(encode_avi([img, img], fps=5)) == "avi"
        assert detect_codec_bytes(synthesize_mp3(3, 128)) == "mp3"
        assert (
            detect_codec_bytes(synthesize_mp3(3, 128, id3_payload=9))
            == "mp3"
        )
        from gbif_filter_python_spark.multimodal.binary_ops import (
            synthesize_mp4,
        )

        assert detect_codec_bytes(synthesize_mp4(600, 600)) == "mp4"
        # bare 'ftyp' 4CC with an implausible leading size: unknown
        assert (
            detect_codec_bytes(b"\x00\x00\x00\x04ftypisom") == "unknown"
        )
        # adversarial: magic prefixes with broken structure stay unknown
        assert detect_codec_bytes(b"") == "unknown"
        assert detect_codec_bytes(b"RIFF\x10\x00\x00\x00JUNK") == "unknown"
        assert detect_codec_bytes(b"BM" + b"\x00" * 4 + b"\x00" * 4
                                  + (5).to_bytes(4, "little")) == "unknown"
        # MPEG sync with free-format bitrate: not claimed as mp3
        assert detect_codec_bytes(b"\xff\xfb\x04\x00" + bytes(32)) == "unknown"
        # MPEG-2 version bits: out of parse scope, stays unknown
        assert detect_codec_bytes(b"\xff\xf3\x94\x00" + bytes(32)) == "unknown"

    def test_km_granularity_contract(self, spark):
        """r13 verdict ask 5: sub-second timestamps must NOT inflate
        the Kaplan-Meier curve table — datediff truncates lifetimes
        to whole days, and granularity_days coarsens further."""
        from gbif_filter_python_spark.operators.profile import (
            kaplan_meier,
        )

        # 200 keys, lifetimes spread over 0-19 days with RANDOM
        # sub-second first/last offsets: continuous timestamps, but
        # the distinct-lifetime table must stay <= 20 rows
        rng = np.random.default_rng(8)
        rows = []
        for k in range(200):
            days = int(k % 20)
            f_us = int(rng.integers(0, 86_400_000_000))
            l_us = int(rng.integers(0, 86_400_000_000))
            rows.append((k, f"2024-01-01 00:00:00.{f_us % 999_999:06d}"))
            rows.append(
                (
                    k,
                    f"2024-01-{1 + days:02d} "
                    f"00:00:00.{l_us % 999_999:06d}",
                )
            )
        df = spark.createDataFrame(
            rows, "k int, s string"
        ).selectExpr("k", "CAST(s AS TIMESTAMP) AS ts")
        curve = kaplan_meier(df, "k", "ts", churn_days=5).collect()
        assert 0 < len(curve) <= 20
        assert all(r["t_days"] == int(r["t_days"]) for r in curve)
        # weekly bucketing: lifetimes land on multiples of 7 only
        weekly = kaplan_meier(
            df, "k", "ts", churn_days=5, granularity_days=7
        ).collect()
        assert 0 < len(weekly) <= 3
        assert all(r["t_days"] % 7 == 0 for r in weekly)
        # key counts survive the bucketing: total d+censored == keys
        assert sum(r["d"] + r["censored"] for r in weekly) == 200
        with pytest.raises(ValueError, match="granularity_days"):
            kaplan_meier(df, "k", "ts", granularity_days=0)

    def test_distributed_matches_direct(self, spark):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            mp3_metadata,
            parse_mp3_metadata,
            synthesize_mp3,
        )

        payloads = {
            i: synthesize_mp3(
                5 + i,
                [64, 128] if i % 2 else 256,
                [44100, 48000, 32000][i % 3],
                channel_mode=i % 4,
                id3_payload=7 * i,
                seed=i,
            )
            for i in range(1, 9)
        }
        df = spark.createDataFrame(
            [(i, p) for i, p in payloads.items()],
            "media_id long, payload binary",
        ).repartition(4)
        got = {
            r["media_id"]: r.asDict()
            for r in mp3_metadata(df).collect()
        }
        assert set(got) == set(payloads)
        for i, p in payloads.items():
            want = parse_mp3_metadata(p)
            row = got[i]
            for k, v in want.items():
                assert row[k] == v, (i, k, row[k], v)


class TestPngAdam7:
    """Adam7 interlaced PNG — the round-14 closure of the decoder's
    last named fence: seven independently-filtered sub-images,
    scattered back per spec §8.2, cross-validated against
    javax.imageio's PNG plugin (whose writer picks adaptive filters
    per pass, so the full unfilter set is exercised across passes)."""

    def test_roundtrip_all_shapes(self):
        import numpy as np

        from gbif_filter_python_spark.multimodal.binary_ops import (
            decode_png_bytes,
            encode_png,
        )

        rng = np.random.default_rng(0)
        # 1x1 and 7x3 leave several Adam7 passes empty
        for shape in [(8, 8), (33, 17), (1, 1), (7, 3), (9, 16)]:
            img = rng.random(shape)
            q = np.rint(img * 255) / 255.0
            got = decode_png_bytes(encode_png(img, interlace=True))
            assert got.shape == shape
            assert np.allclose(got, q, atol=1e-6), shape

    def test_truncated_pass_named(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from gbif_filter_python_spark.multimodal.binary_ops import (
            decode_png_bytes,
            encode_png,
        )

        p = encode_png(np.random.default_rng(1).random((16, 16)),
                       interlace=True)
        # rebuild with the deflate stream cut mid-pass
        sig_ihdr = p[: 8 + 25]
        (ilen,) = struct.unpack_from(">I", p, 33)
        raw = zlib.decompress(p[41 : 41 + ilen])
        cut = zlib.compress(raw[: len(raw) // 2])

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        bad = sig_ihdr + chunk(b"IDAT", cut) + chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="Adam7 pass data truncated"):
            decode_png_bytes(bad)

    def test_jvm_crossval_both_directions(self, spark):
        import numpy as np

        from gbif_filter_python_spark.multimodal.binary_ops import (
            decode_png_bytes,
            encode_png,
        )

        jvm = spark._jvm
        rng = np.random.default_rng(7)

        def jvm_decode_raw(payload):
            bis = jvm.java.io.ByteArrayInputStream(bytearray(payload))
            img = jvm.javax.imageio.ImageIO.read(bis)
            assert img is not None
            w, h = img.getWidth(), img.getHeight()
            obj = img.getRaster().getDataElements(0, 0, w, h, None)
            arr = np.frombuffer(bytes(obj), dtype=np.uint8)
            return arr.reshape(h, w, arr.size // (w * h))[:, :, 0]

        def jvm_encode_adam7(arr_u8):
            h, w = arr_u8.shape
            img = jvm.java.awt.image.BufferedImage(w, h, 10)
            img.getRaster().setDataElements(
                0, 0, w, h, bytearray(arr_u8.tobytes())
            )
            bos = jvm.java.io.ByteArrayOutputStream()
            writer = (
                jvm.javax.imageio.ImageIO
                .getImageWritersByFormatName("png").next()
            )
            param = writer.getDefaultWriteParam()
            param.setProgressiveMode(
                jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
            )
            ios = jvm.javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.write(
                None, jvm.javax.imageio.IIOImage(img, None, None), param
            )
            ios.flush()
            writer.dispose()
            return bytes(bos.toByteArray())

        for shape in [(16, 16), (31, 45)]:
            f = rng.random(shape)
            jv = jvm_decode_raw(encode_png(f, interlace=True))
            assert np.array_equal(jv, np.rint(f * 255.0)), shape

        for shape in [(16, 16), (40, 27)]:
            u8 = (rng.random(shape) * 255).astype(np.uint8)
            p = jvm_encode_adam7(u8)
            assert p[28] == 1, "JVM did not write Adam7"
            ours = np.rint(decode_png_bytes(p) * 255.0).astype(np.uint8)
            assert np.array_equal(ours, u8), shape
