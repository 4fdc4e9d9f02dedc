"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Beyond-reference block (SURVEY.md §2 final row). The container has no
image/audio codecs, so the DECODE step is stubbed (deterministic fake
behind ``fake=True``, ``NotImplementedError`` otherwise) — but the
Spark-side plumbing is real and tested: schemas, ``mapInPandas``
batching, Arrow-friendly dtypes, and partition-size control, which is
what actually matters at 100 TB (codec CPU is pluggable; the data
motion pattern is not).

Design for scale:
* media bytes stay in ONE binary column; metadata is a separate struct
  so metadata-only queries never deserialize payloads (Parquet reads
  only the projected column chunks);
* decode/feature-extract run via ``mapInPandas`` so one task processes
  an Arrow batch of payloads at a time; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` against executor
  memory;
* outputs are fixed-width float arrays → downstream joins/ANN reuse
  the similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata carried next to every binary media column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image/audio/video
        StructField("format", StringType()),       # jpeg/png/wav/mp4...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("size_bytes", LongType()),
    ]
)


def attach_media_meta(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image"
) -> DataFrame:
    """Derive cheap metadata (size, declared type) without decoding."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )


def _fake_pixels(payload: bytes, side: int) -> np.ndarray:
    """Deterministic stand-in decoder: payload hash → pseudo-pixels.

    Keeps tests hermetic and reproducible; swap for PIL/libvips in a
    real deployment (same signature, same batch shape).
    """
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random((side, side), dtype=np.float32)


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    side: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Decode → resize to (side, side) grayscale → flat float array.

    mapInPandas: one Arrow batch of payloads per invocation; output
    schema is fixed so downstream plans bind statically.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/libvips, not present in this "
            "container; call with fake=True for the deterministic stub"
        )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("pixels", ArrayType(FloatType())),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    cols = [id_col, payload_col]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = [
                _fake_pixels(p, side).ravel().tolist() for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "pixels": pixels,
                    "width": side,
                    "height": side,
                }
            )

    return df.select(*cols).mapInPandas(_decode, schema=out_schema)


def extract_features(
    decoded: DataFrame, id_col: str = "media_id", n_features: int = 16
) -> DataFrame:
    """Pixel array → fixed-width feature vector (mean-pooled chunks).

    Pure Column expression over the decoded arrays — the expensive
    decode already happened; pooling is JVM-side.
    """
    px = F.col("pixels")
    n = F.size(px)
    chunk = (n / n_features).cast("int")
    feats = F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda i: F.aggregate(
            F.slice(px, i * chunk + 1, chunk),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / chunk.cast("double"),
    )
    return decoded.select(F.col(id_col), feats.alias("features"))


def resize_pixels(
    decoded: DataFrame,
    out_side: int,
    id_col: str = "media_id",
) -> DataFrame:
    """Block-mean downsample decoded (side, side) pixel arrays.

    NOT a stub: resize operates on the already-decoded float arrays,
    so no codec is involved — one NumPy reshape+mean per Arrow batch
    (the vectorized Pandas path the brief prescribes for multimodal
    transforms). Requires in_side % out_side == 0; emits the same
    (id, pixels, width, height) shape as ``decode_images`` so resize
    stages compose/chain.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("pixels", ArrayType(FloatType())),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"]):
                if w % out_side or h % out_side:
                    raise ValueError(
                        f"resize {w}x{h} -> {out_side}x{out_side}: "
                        "side must divide evenly (block-mean pooling)"
                    )
                a = np.asarray(px, dtype=np.float32).reshape(h, w)
                bh, bw = h // out_side, w // out_side
                pooled = a.reshape(out_side, bh, out_side, bw).mean(
                    axis=(1, 3), dtype=np.float64
                )
                out.append(pooled.astype(np.float32).ravel().tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "pixels": out,
                    "width": out_side,
                    "height": out_side,
                }
            )

    cols = [id_col, "pixels", "width", "height"]
    return decoded.select(*cols).mapInPandas(_resize, schema=out_schema)


def _fake_waveform(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in audio decoder (hash-seeded waveform in
    [-1, 1)); swap for soundfile/ffmpeg in a real deployment."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[8:16], "big")
    rng = np.random.default_rng(seed)
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    sample_rate: int = 16_000,
    n_samples: int = 256,
    fake: bool = True,
) -> DataFrame:
    """Audio payloads → (id, samples array<float>, sample_rate).

    Same contract as ``decode_images``: the codec is stubbed
    (deterministic fake), the Arrow-batched mapInPandas plumbing and
    fixed output schema are real.
    """
    if not fake:
        raise NotImplementedError(
            "real audio decoding needs soundfile/ffmpeg, not present in "
            "this container; call with fake=True for the deterministic stub"
        )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("samples", ArrayType(FloatType())),
            StructField("sample_rate", IntegerType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            samples = [
                _fake_waveform(p, n_samples).tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "samples": samples,
                    "sample_rate": sample_rate,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, schema=out_schema)


def audio_features(
    decoded: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Waveform → (rms, zero-crossing rate, peak) — JVM-side Columns.

    Like ``extract_features``: the Python boundary was crossed once at
    decode; the per-sample math runs as higher-order functions inside
    codegen, so feature extraction adds no second Python hop.
    """
    s = F.col("samples")
    n = F.size(s).cast("double")
    rms = F.sqrt(
        F.aggregate(s, F.lit(0.0), lambda a, v: a + v * v) / n
    )
    crossings = F.size(
        F.filter(
            F.zip_with(
                F.slice(s, 1, F.size(s) - 1),
                F.slice(s, 2, F.size(s) - 1),
                lambda a, b: (a * b) < 0,
            ),
            lambda x: x,
        )
    )
    peak = F.aggregate(
        s, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v.cast("double")))
    )
    return decoded.select(
        F.col(id_col),
        F.round(rms, 6).alias("rms"),
        (crossings / (n - 1)).alias("zcr"),
        F.round(peak, 6).alias("peak"),
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Video → n_frames evenly-spaced frame payloads (exploded rows).

    Stubbed like decode: the fake splits the payload bytes into
    n_frames deterministic slices, preserving the (id, frame_idx,
    frame_payload) row shape a real ffmpeg-backed sampler emits.
    """
    if not fake:
        raise NotImplementedError("real frame sampling needs ffmpeg")
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_payload", StringType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                p = p or b""
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.md5(p[i * step:(i + 1) * step]).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_payload": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, schema=out_schema)
