"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched pandas UDFs over
mapInPandas. The decode kernels are STUBS in this container (no
image/audio libraries are installed) — deterministic fakes behind the
same signatures, with the Spark-side contract (schema, batching,
partitioning) fully real and tested. Swap ``_decode_image_bytes`` et
al. for Pillow/torchaudio kernels in a real deployment; nothing else
changes.
"""

from cdc_2025_spark.multimodal.media import (
    MEDIA_SCHEMA,
    extract_audio_chunk_features,
    extract_image_features,
    make_synthetic_media,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "extract_audio_chunk_features",
    "extract_image_features",
    "make_synthetic_media",
    "sample_video_frames",
]
