"""Round-14 crawl-ingest tests: WARC record walk + compressed-text
payloads (multimodal/archive_ops.py) — roundtrips, the named-error
contract on malformed input (the ADVICE r13 lesson: NEVER a raw
IndexError/KeyError from a parser), sniff adversarial cases, and
distributed-vs-direct parity."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_filter_python_spark.multimodal.archive_ops import (
    COMPRESSION_CODECS,
    compress_bytes,
    decompress_bytes,
    decompress_text,
    detect_compression,
    detect_compression_bytes,
    parse_warc,
    synthesize_warc,
    warc_records,
)


def _recs(n: int = 3) -> list[dict]:
    out = [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "payload": b"software: synth-warc/1.0",
        }
    ]
    for i in range(n):
        out.append(
            {
                "warc_type": "response",
                "target_uri": f"https://crawl.example/p/{i}",
                "content_type": "text/plain; charset=utf-8",
                "payload": f"body {i} éü".encode(),
            }
        )
    return out


class TestWarc:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, gz):
        recs = _recs(3)
        got = parse_warc(synthesize_warc(recs, gzip_members=gz, seed=7))
        assert len(got) == 4
        for want, have in zip(recs, got):
            assert have["warc_type"] == want["warc_type"]
            assert have["target_uri"] == want.get("target_uri")
            assert have["content_type"] == want["content_type"]
            assert have["payload"] == want["payload"]
            assert have["content_length"] == len(want["payload"])
            assert have["record_id"].startswith("<urn:uuid:")

    def test_empty_payload_record(self):
        got = parse_warc(
            synthesize_warc(
                [{"warc_type": "request", "payload": b""}]
            )
        )
        assert got[0]["content_length"] == 0
        assert got[0]["payload"] == b""

    def test_named_rejections(self):
        p = synthesize_warc(_recs(1))
        with pytest.raises(ValueError, match="no terminating blank"):
            parse_warc(p[:40])
        with pytest.raises(ValueError, match="missing version line"):
            parse_warc(b"HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n")
        with pytest.raises(ValueError, match="missing Content-Length"):
            parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n")
        with pytest.raises(ValueError, match="missing WARC-Type"):
            parse_warc(b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
        with pytest.raises(ValueError, match="not an integer"):
            parse_warc(
                b"WARC/1.0\r\nWARC-Type: x\r\n"
                b"Content-Length: ten\r\n\r\n\r\n\r\n"
            )
        with pytest.raises(ValueError, match="without colon"):
            parse_warc(
                b"WARC/1.0\r\nWARC-Type: x\r\nbogus line\r\n"
                b"Content-Length: 0\r\n\r\n\r\n\r\n"
            )
        # declared length overruns the archive: named, not a slice
        # of garbage
        with pytest.raises(ValueError, match="overruns the archive"):
            parse_warc(
                b"WARC/1.0\r\nWARC-Type: x\r\n"
                b"Content-Length: 99\r\n\r\nshort\r\n\r\n"
            )
        # payload present but terminator corrupted
        with pytest.raises(ValueError, match="two-CRLF terminator"):
            parse_warc(
                b"WARC/1.0\r\nWARC-Type: x\r\n"
                b"Content-Length: 2\r\n\r\nhiXXXX"
            )

    def test_gzip_member_truncation_named(self):
        p = synthesize_warc(_recs(2), gzip_members=True)
        with pytest.raises(ValueError, match="truncated mid-stream"):
            parse_warc(p[: len(p) - 10])
        with pytest.raises(ValueError, match="gzip member corrupt"):
            parse_warc(p[:2] + b"\x00\x00" + p[4:])

    @settings(max_examples=120, deadline=None)
    @given(
        cut=st.integers(min_value=0, max_value=400),
        gz=st.booleans(),
    )
    def test_truncation_fuzz_always_named(self, cut, gz):
        """EVERY truncation point either parses a prefix of the
        records or raises ValueError — never IndexError/KeyError/
        zlib.error (the round-13 ADVICE contract, applied to the new
        parser from day one)."""
        p = synthesize_warc(_recs(2), gzip_members=gz, seed=1)
        try:
            got = parse_warc(p[: min(cut, len(p))])
        except ValueError:
            return
        assert len(got) <= 3

    def test_distributed_matches_direct(self, spark):
        payloads = {
            i: synthesize_warc(_recs(i % 3 + 1), gzip_members=i % 2 == 0,
                               seed=i)
            for i in range(1, 6)
        }
        df = spark.createDataFrame(
            [(i, p) for i, p in payloads.items()],
            "media_id long, payload binary",
        ).repartition(3)
        got = warc_records(df).collect()
        by_id: dict[int, list] = {}
        for r in sorted(got, key=lambda r: (r["media_id"], r["rec_idx"])):
            by_id.setdefault(r["media_id"], []).append(r)
        for i, p in payloads.items():
            want = parse_warc(p)
            assert len(by_id[i]) == len(want)
            for w, h in zip(want, by_id[i]):
                assert h["warc_type"] == w["warc_type"]
                assert h["content_length"] == w["content_length"]
                ctype = w["content_type"] or ""
                if ctype.startswith("text/"):
                    assert h["payload_text"] == w["payload"].decode()
                else:
                    assert h["payload_text"] is None


class TestCompression:
    @pytest.mark.parametrize("codec", COMPRESSION_CODECS)
    def test_roundtrip_and_sniff(self, codec):
        data = b"the quick brown fox " * 40
        blob = compress_bytes(data, codec)
        assert decompress_bytes(blob, codec) == data
        assert detect_compression_bytes(blob) == codec

    def test_gzip_multimember(self):
        blob = compress_bytes(b"part one|", "gzip") + compress_bytes(
            b"part two", "gzip"
        )
        assert decompress_bytes(blob, "gzip") == b"part one|part two"

    def test_named_errors(self):
        with pytest.raises(ValueError, match="unknown compression"):
            compress_bytes(b"x", "zstd")
        with pytest.raises(ValueError, match="unknown compression"):
            decompress_bytes(b"x", "zstd")
        # wrong codec / corrupt payload: named, carries the codec
        blob = compress_bytes(b"data", "gzip")
        with pytest.raises(ValueError, match="bz2 payload corrupt"):
            decompress_bytes(blob, "bz2")
        with pytest.raises(ValueError, match="xz payload corrupt"):
            decompress_bytes(b"\x00" * 16, "xz")
        with pytest.raises(ValueError, match="truncated mid-stream"):
            decompress_bytes(blob[:-4], "gzip")

    def test_sniff_adversarial(self):
        assert detect_compression_bytes(b"") == "none"
        assert detect_compression_bytes(b"plain text") == "none"
        # 0x78 lead whose two-byte header fails the mod-31 check
        assert detect_compression_bytes(b"\x78\x02rest") == "none"
        # zlib levels: 0x9c and 0xda both pass
        assert detect_compression_bytes(b"\x78\x9c") == "zlib"
        assert detect_compression_bytes(b"\x78\xda") == "zlib"
        # gzip magic with a non-deflate method byte
        assert detect_compression_bytes(b"\x1f\x8b\x07") == "none"
        # BZh without a block-size digit
        assert detect_compression_bytes(b"BZhX") == "none"

    def test_decompress_text_contract(self, spark):
        df = spark.createDataFrame(
            [(1, compress_bytes(b"x", "gzip"))],
            "media_id long, payload binary",
        )
        with pytest.raises(ValueError, match="exactly one"):
            decompress_text(df)
        with pytest.raises(ValueError, match="exactly one"):
            decompress_text(df, codec="gzip", codec_col="codec")
        with pytest.raises(ValueError, match="unknown compression"):
            decompress_text(df, codec="zstd")

    def test_distributed_decompress_and_sniff(self, spark):
        texts = {
            i: f"doc {i} body é " + "pad " * i for i in range(8)
        }
        rows = [
            (
                i,
                COMPRESSION_CODECS[i % 4],
                compress_bytes(
                    texts[i].encode(), COMPRESSION_CODECS[i % 4]
                ),
            )
            for i in range(8)
        ]
        df = spark.createDataFrame(
            rows, "media_id long, codec string, payload binary"
        ).repartition(3)
        out = {
            r["media_id"]: r
            for r in decompress_text(df, codec_col="codec").collect()
        }
        for i, t in texts.items():
            assert out[i]["text"] == t
            assert out[i]["codec"] == COMPRESSION_CODECS[i % 4]
            assert out[i]["text_bytes"] == len(t.encode())
            assert out[i]["compressed_bytes"] > 0
        sniffed = {
            r["media_id"]: r["codec"]
            for r in detect_compression(df).collect()
        }
        assert sniffed == {i: COMPRESSION_CODECS[i % 4] for i in range(8)}


class TestZip:
    def _members(self, n=4):
        return [
            (f"dir/f{i}.txt", (f"content {i} " * (i + 1)).encode())
            for i in range(n)
        ]

    def test_roundtrip_stored_and_deflate(self):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_zip,
            extract_zip_member,
            parse_zip,
        )

        members = self._members()
        z = build_zip(members)
        es = parse_zip(z)
        assert [e["name"] for e in es] == [m[0] for m in members]
        assert [e["method"] for e in es] == [0, 8, 0, 8]
        for e, (_, data) in zip(es, members):
            assert e["uncompressed_size"] == len(data)
            assert extract_zip_member(z, e) == data

    def test_empty_archive(self):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_zip,
            parse_zip,
        )

        assert parse_zip(build_zip([])) == []

    def test_named_errors(self):
        import struct

        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_zip,
            extract_zip_member,
            parse_zip,
        )

        z = build_zip(self._members(2))
        with pytest.raises(ValueError, match="no end-of-central"):
            parse_zip(z[: z.rfind(b"PK\x05\x06")])
        # encrypted flag on the first central header
        b = bytearray(z)
        cd = b.index(b"PK\x01\x02")
        flags_off = cd + 8
        struct.pack_into("<H", b, flags_off, 0x0001)
        with pytest.raises(ValueError, match="encrypted"):
            parse_zip(bytes(b))
        # zip64 sentinel in the entry count
        b = bytearray(z)
        eocd = b.rindex(b"PK\x05\x06")
        struct.pack_into("<H", b, eocd + 10, 0xFFFF)
        with pytest.raises(ValueError, match="zip64"):
            parse_zip(bytes(b))
        # CRC poked: extraction must fail loudly
        es = parse_zip(z)
        bad = dict(es[0], crc32=es[0]["crc32"] ^ 0xDEAD)
        with pytest.raises(ValueError, match="CRC-32"):
            extract_zip_member(z, bad)
        # unknown method
        bad = dict(es[0], method=14)  # lzma-in-zip
        with pytest.raises(ValueError, match="method 14"):
            extract_zip_member(z, bad)

    @settings(max_examples=100, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=600))
    def test_truncation_fuzz_always_named(self, cut):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_zip,
            extract_zip_member,
            parse_zip,
        )

        z = build_zip(self._members(3))
        if cut >= len(z):
            return
        try:
            for e in parse_zip(z[:cut]):
                extract_zip_member(z[:cut], e)
        except ValueError:
            pass

    def test_distributed(self, spark):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_zip,
            zip_members,
        )

        rows = [
            (i, build_zip(self._members(i % 3 + 1)))
            for i in range(1, 6)
        ]
        df = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).repartition(2)
        got = zip_members(df).collect()
        assert len(got) == sum(i % 3 + 1 for i in range(1, 6))
        for r in got:
            assert r["crc_ok"] == "ok"
            assert r["text"].startswith(f"content {r['member_idx']} ")
        # triage-only mode never inflates
        listed = zip_members(df, extract_text=False).collect()
        assert all(r["text"] is None for r in listed)
        assert all(r["crc_ok"] == "unchecked" for r in listed)


class TestTar:
    def _members(self, n=3):
        return [
            (f"d/f{i}.txt", (f"alpha {i} " * (i + 1)).encode())
            for i in range(n)
        ]

    def test_roundtrip(self):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_tar,
            parse_tar,
        )

        members = self._members()
        ms = parse_tar(build_tar(members))
        assert [(m["name"], m["payload"]) for m in ms] == members
        assert all(m["typeflag"] == "0" for m in ms)

    def test_named_errors(self):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_tar,
            parse_tar,
        )

        t = build_tar(self._members(2))
        with pytest.raises(ValueError, match="multiple of"):
            parse_tar(t[:700])
        with pytest.raises(ValueError, match="ustar magic"):
            parse_tar(b"\x01" * 512)
        # poke a content byte's header checksum
        b = bytearray(t)
        b[0] = ord("X")
        with pytest.raises(ValueError, match="fails its checksum"):
            parse_tar(bytes(b))
        # declared size overrunning the archive
        b = bytearray(t[:512])  # header only, no content blocks
        with pytest.raises(ValueError, match="overruns the payload"):
            parse_tar(bytes(b))

    @settings(max_examples=60, deadline=None)
    @given(
        pos=st.integers(min_value=0, max_value=511),
        val=st.integers(min_value=0, max_value=255),
    )
    def test_header_mutation_fuzz(self, pos, val):
        """Any single-byte header corruption either keeps a valid
        walk or raises ValueError — the checksum catches nearly all
        of them; none may escape as a raw exception."""
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_tar,
            parse_tar,
        )

        t = build_tar(self._members(2))
        b = bytearray(t)
        if b[pos] == val:
            return
        b[pos] = val
        try:
            parse_tar(bytes(b))
        except ValueError:
            pass

    def test_distributed_with_gzip_layer(self, spark):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_tar,
            compress_bytes,
            tar_members,
        )

        rows = []
        for i in range(1, 6):
            blob = build_tar(self._members(i % 3 + 1))
            if i % 2:
                blob = compress_bytes(blob, "gzip")
            rows.append((i, blob))
        df = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).repartition(2)
        got = tar_members(df).collect()
        assert len(got) == sum(i % 3 + 1 for i in range(1, 6))
        for r in got:
            assert r["text"].startswith(f"alpha {r['member_idx']} ")


class TestCheckpointTriage:
    def test_safetensors_roundtrip_and_invariants(self):
        import numpy as np

        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_safetensors,
            parse_safetensors,
        )

        st = build_safetensors(
            {
                "model.embed": np.zeros((10, 4), dtype=np.float32),
                "model.norm": np.ones(4, dtype=np.float16),
                "counts": np.arange(6, dtype=np.int64).reshape(2, 3),
                "flag": np.array([True], dtype=bool),
            }
        )
        ts = parse_safetensors(st)
        by_name = {t["name"]: t for t in ts}
        assert by_name["model.embed"]["n_bytes"] == 160
        assert by_name["model.norm"]["dtype"] == "F16"
        assert by_name["counts"]["shape"] == [2, 3]
        assert by_name["flag"]["n_bytes"] == 1
        # sorted-name order (sort_keys=True serialization)
        assert [t["name"] for t in ts] == sorted(by_name)

    def test_safetensors_named_errors(self):
        import json

        import numpy as np

        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_safetensors,
            parse_safetensors,
        )

        st = build_safetensors({"w": np.zeros(4, dtype=np.float32)})
        with pytest.raises(ValueError, match="length prefix"):
            parse_safetensors(st[:4])
        with pytest.raises(ValueError, match="overruns"):
            parse_safetensors(
                (10**9).to_bytes(8, "little") + st[8:]
            )
        with pytest.raises(ValueError, match="not valid JSON"):
            parse_safetensors(
                (4).to_bytes(8, "little") + b"nope" + b"\x00" * 8
            )
        # dtype x shape inconsistent with offsets
        hdr = json.dumps(
            {"w": {"dtype": "F32", "shape": [4],
                   "data_offsets": [0, 12]}}
        ).encode()
        bad = len(hdr).to_bytes(8, "little") + hdr + b"\x00" * 12
        with pytest.raises(ValueError, match="dtype x shape"):
            parse_safetensors(bad)
        hdr = json.dumps(
            {"w": {"dtype": "F4", "shape": [4],
                   "data_offsets": [0, 2]}}
        ).encode()
        bad = len(hdr).to_bytes(8, "little") + hdr + b"\x00" * 2
        with pytest.raises(ValueError, match="unknown dtype"):
            parse_safetensors(bad)

    def test_gguf_roundtrip_and_named_errors(self):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_gguf,
            parse_gguf,
        )

        g = build_gguf(
            {
                "general.architecture": "llama",
                "llama.block_count": 4,
                "rope.scale": 1.5,
                "tied": False,
                "dims": [7, 8],
            },
            [
                ("tok_embd.weight", [4096, 32000], 12),
                ("output_norm.weight", [4096], 0),
            ],
        )
        m = parse_gguf(g)
        assert m["version"] == 3
        assert m["metadata"]["llama.block_count"] == 4
        assert m["metadata"]["rope.scale"] == 1.5
        assert m["metadata"]["tied"] is False
        assert m["metadata"]["dims"] == [7, 8]
        assert m["tensors"][0]["type"] == "q4_k"
        assert m["tensors"][0]["n_elements"] == 4096 * 32000
        with pytest.raises(ValueError, match="GGUF magic"):
            parse_gguf(b"GGML" + g[4:])
        with pytest.raises(ValueError, match="truncated"):
            parse_gguf(g[: len(g) - 7])
        b = bytearray(g)
        b[4] = 9  # version
        with pytest.raises(ValueError, match="version 9"):
            parse_gguf(bytes(b))

    @settings(max_examples=100, deadline=None)
    @given(cut=st.integers(min_value=0, max_value=400))
    def test_gguf_truncation_fuzz(self, cut):
        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_gguf,
            parse_gguf,
        )

        g = build_gguf(
            {"k": "v", "n": 3, "arr": [1, 2, 3]},
            [("a.w", [4, 4], 0), ("b.w", [2], 1)],
        )
        if cut >= len(g):
            return
        with pytest.raises(ValueError):
            parse_gguf(g[:cut])

    def test_distributed_mixed_formats(self, spark):
        import numpy as np

        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_gguf,
            build_safetensors,
            checkpoint_tensors,
        )

        rows = []
        for i in range(1, 7):
            if i % 2:
                rows.append(
                    (i, build_gguf({"i": i}, [(f"t{i}", [i, 2], 0)]))
                )
            else:
                rows.append(
                    (
                        i,
                        build_safetensors(
                            {f"w{i}": np.zeros(i, dtype=np.float32)}
                        ),
                    )
                )
        df = spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).repartition(3)
        got = {r["media_id"]: r for r in checkpoint_tensors(df).collect()}
        for i in range(1, 7):
            r = got[i]
            if i % 2:
                assert r["fmt"] == "gguf" and r["shape"] == f"{i}x2"
            else:
                assert r["fmt"] == "safetensors"
                assert r["n_elements"] == i


class TestZipAdversarialBounds:
    def test_lying_entry_count_and_truncated_headers_named(self):
        import struct

        from gbif_filter_python_spark.multimodal.archive_ops import (
            build_zip,
            extract_zip_member,
            parse_zip,
        )

        z = build_zip([("a.txt", b"hello")])
        cd = z.index(b"PK\x01\x02")
        # archive cut right after the central-header signature, with
        # a fresh EOCD claiming one full entry lives there
        eocd = b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 1, 1, 4, cd, 0
        )
        with pytest.raises(ValueError, match="truncated at byte"):
            parse_zip(z[: cd + 4] + eocd)
        # local-header offset pointing at the archive tail
        e = dict(parse_zip(z)[0], local_header_offset=len(z) - 10)
        with pytest.raises(ValueError, match="missing at byte"):
            extract_zip_member(z, e)


def test_warc_negative_content_length_named():
    with pytest.raises(ValueError, match="negative"):
        parse_warc(
            b"WARC/1.0\r\nWARC-Type: x\r\n"
            b"Content-Length: -4\r\n\r\nhi\r\n\r\n"
        )
