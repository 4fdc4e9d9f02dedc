"""Multimodal (image/audio/video) column plumbing."""

from gbif_filter_python_spark.multimodal.binary_ops import (
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_bmp_bytes,
    decode_images,
    decode_wav_bytes,
    encode_bmp,
    encode_wav,
    extract_features,
    sample_frames,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "decode_bmp_bytes",
    "decode_images",
    "decode_wav_bytes",
    "encode_bmp",
    "encode_wav",
    "extract_features",
    "sample_frames",
]
