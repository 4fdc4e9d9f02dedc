"""FLAC codec tests: rice-stream roundtrips across every subframe
type, stereo decorrelation mode, rice partition order and the escape
path; the verification chain (CRC-8 header, CRC-16 frame, STREAMINFO
MD5) proven to actually fire; truncation/mutation fuzz to the
named-ValueError contract. FLAC has no independent codec in this
container (javax.sound handles only WAV/AIFF/AU), so the honesty
load is carried by the bit-exact spec checks here plus the closed-form
flac_audio oracle — the same posture as ADPCM/G.711."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.multimodal.binary_ops import (
    decode_flac_bytes,
    decode_flac_samples,
    detect_codec_bytes,
    encode_flac,
)


def _q(x: np.ndarray) -> np.ndarray:
    return (
        np.clip(np.rint(np.asarray(x) * 32767.0), -32768, 32767)
        / 32767.0
    )


def _sine(n: int, f: float = 100.0) -> np.ndarray:
    t = np.arange(n) / 16000.0
    return 0.5 * np.sin(2 * np.pi * f * t)


class TestFlacRoundtrip:
    @pytest.mark.parametrize("mode", ["fixed", "verbatim", "lpc"])
    @pytest.mark.parametrize(
        "wave",
        [
            _sine(5000),
            np.random.default_rng(1).uniform(-1, 1, 3000),
            np.zeros(500),
        ],
        ids=["sine", "noise", "silence"],
    )
    def test_mono(self, mode, wave):
        p = encode_flac(wave, 16000, block_size=1024, mode=mode)
        got, rate = decode_flac_bytes(p)
        assert rate == 16000 and got.shape == (len(wave),)
        assert np.allclose(got, _q(wave), atol=1 / 32767 + 1e-7)

    def test_constant_subframe(self):
        p = encode_flac(np.full(300, 0.25), mode="constant")
        got, _ = decode_flac_bytes(p)
        assert np.allclose(got, _q(np.full(300, 0.25)), atol=1e-6)
        with pytest.raises(ValueError, match="constant signal"):
            encode_flac(_sine(100), mode="constant")

    @pytest.mark.parametrize(
        "cm", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_stereo_decorrelation(self, cm):
        st_wave = np.stack(
            [_sine(3000), 0.3 * _sine(3000, 220.0)], axis=1
        )
        p = encode_flac(
            st_wave, 44100, block_size=512, channel_mode=cm
        )
        got, rate = decode_flac_samples(p)
        assert rate == 44100 and got.shape == (3000, 2)
        assert np.allclose(got, _q(st_wave), atol=1 / 32767 + 1e-7)
        # mono downmix shape
        mono, _ = decode_flac_bytes(p)
        assert mono.shape == (3000,)

    @pytest.mark.parametrize("po", [0, 1, 3])
    def test_rice_partition_orders(self, po):
        sig = _sine(4096)
        p = encode_flac(
            sig, 16000, block_size=1024, rice_partition_order=po
        )
        got, _ = decode_flac_bytes(p)
        assert np.allclose(got, _q(sig), atol=1 / 32767 + 1e-7)

    def test_escape_partitions(self):
        """Sparse spikes → tiny rice parameter but huge max residual
        → the writer takes the param-15 verbatim escape; the decode
        must come back exact through that path."""
        spiky = np.zeros(2048)
        spiky[::97] = 0.9
        spiky[50::311] = -0.8
        p = encode_flac(
            spiky, 16000, block_size=512, rice_partition_order=2
        )
        got, _ = decode_flac_bytes(p)
        assert np.allclose(got, _q(spiky), atol=1 / 32767 + 1e-7)

    def test_compression_on_smooth_signal(self):
        sig = _sine(8192)
        assert len(encode_flac(sig, 16000, mode="fixed")) < 0.75 * len(
            encode_flac(sig, 16000, mode="verbatim")
        )

    def test_detect_and_contract(self):
        p = encode_flac(_sine(64), 16000)
        assert detect_codec_bytes(p) == "flac"
        with pytest.raises(ValueError, match="mono or"):
            encode_flac(np.zeros((10, 3)))
        with pytest.raises(ValueError, match="block_size"):
            encode_flac(_sine(100), block_size=8)
        with pytest.raises(ValueError, match="16-bit header range"):
            encode_flac(_sine(100), sample_rate=96000)
        with pytest.raises(ValueError, match="channel_mode"):
            encode_flac(_sine(100), channel_mode="dual")
        with pytest.raises(ValueError, match="decorrelation needs"):
            encode_flac(_sine(100), channel_mode="mid_side")


class TestFlacVerificationChain:
    def _payload(self) -> bytes:
        return encode_flac(_sine(2000), 16000, block_size=512)

    def test_crc8_fires(self):
        p = bytearray(self._payload())
        # first frame starts right after the 4+4+34-byte header block
        frame = 42
        assert p[frame] == 0xFF
        p[frame + 4] ^= 0x40  # poke a header byte past the sync
        with pytest.raises(ValueError, match="CRC-8"):
            decode_flac_bytes(bytes(p))

    def test_crc16_and_md5_fire(self):
        p = bytearray(self._payload())
        p[120] ^= 0x01  # poke mid-frame (residual bits)
        with pytest.raises(ValueError, match="CRC-16|CRC-8|reserved|exhausted|MD5"):
            decode_flac_bytes(bytes(p))
        # poke the stored MD5 itself: frames pass, the final check fires
        p = bytearray(self._payload())
        p[8 + 18] ^= 0xFF  # STREAMINFO md5[0]
        with pytest.raises(ValueError, match="MD5"):
            decode_flac_bytes(bytes(p))

    def test_structural_named_errors(self):
        p = self._payload()
        with pytest.raises(ValueError, match="fLaC magic"):
            decode_flac_bytes(b"RIFF" + p[4:])
        with pytest.raises(ValueError, match="truncated|overruns"):
            decode_flac_bytes(p[:20])
        with pytest.raises(ValueError, match="ended at"):
            decode_flac_bytes(p[:42])
        with pytest.raises(ValueError, match="sync lost"):
            decode_flac_bytes(p[:42] + b"\x00" * 60)

    @settings(max_examples=120, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=2000))
    def test_truncation_fuzz_always_named(self, cut):
        p = self._payload()
        if cut >= len(p):
            return
        with pytest.raises(ValueError):
            decode_flac_bytes(p[:cut])

    @settings(max_examples=80, deadline=None)
    @given(
        pos=st.integers(min_value=4, max_value=1500),
        bit=st.integers(min_value=0, max_value=7),
    )
    def test_mutation_fuzz_named_or_detected(self, pos, bit):
        """Any single-bit flip in a VERIFIED byte must be CAUGHT
        (named ValueError from a CRC/MD5/structure/cross-check) —
        with three verification layers a silent wrong decode would
        require a triple collision. STREAMINFO bytes 8-17 (min/max
        blocksize and framesize) are informational per spec — no
        decoder behavior depends on them — and are excluded from the
        claim; rate/bps/total/md5 ARE covered (frame-header
        cross-checks)."""
        if 8 <= pos <= 17:
            return
        p = bytearray(self._payload())
        if pos >= len(p):
            return
        p[pos] ^= 1 << bit
        with pytest.raises(ValueError):
            decode_flac_bytes(bytes(p))

    def test_every_single_bit_flip_caught_exhaustive(self):
        """Deterministic companion to the fuzz: EVERY single-bit flip
        of every verified byte of a real two-frame stream raises a
        named ValueError — including the 36-bit total-samples field,
        whose high bits must hit the allocation plausibility guard
        rather than attempt a 100-GiB ndarray."""
        p = bytearray(
            encode_flac(
                0.5 * np.sin(np.arange(800) / 10.0),
                16000,
                block_size=256,
            )
        )
        misses = []
        for pos in range(4, len(p)):
            if 8 <= pos <= 17:  # informational STREAMINFO bytes
                continue
            for bit in range(8):
                p[pos] ^= 1 << bit
                try:
                    decode_flac_bytes(bytes(p))
                    misses.append((pos, bit))
                except ValueError:
                    pass
                finally:
                    p[pos] ^= 1 << bit
        assert not misses, misses[:10]


class TestFlacDistributed:
    def test_decode_audio_route(self, spark):
        from gbif_filter_python_spark.multimodal.binary_ops import (
            decode_audio,
        )

        waves = {
            i: _sine(400 + 100 * i, 100.0 * (i + 1)) for i in range(1, 5)
        }
        df = spark.createDataFrame(
            [
                (i, encode_flac(w, 16000, block_size=256))
                for i, w in waves.items()
            ],
            "media_id long, payload binary",
        ).repartition(2)
        got = {
            r["media_id"]: r
            for r in decode_audio(df, codec="flac").collect()
        }
        for i, w in waves.items():
            assert got[i]["sample_rate"] == 16000
            assert np.allclose(
                got[i]["samples"], _q(w), atol=1 / 32767 + 1e-6
            )
        with pytest.raises(ValueError, match="'flac'"):
            decode_audio(df, codec="ogg")
