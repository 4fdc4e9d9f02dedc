"""Multimodal (image/audio/video) column plumbing."""

from gbif_filter_python_spark.multimodal.binary_ops import (
    MEDIA_META_SCHEMA,
    attach_media_meta,
    decode_images,
    extract_features,
    sample_frames,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "decode_images",
    "extract_features",
    "sample_frames",
]
