"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched pandas UDFs over
mapInPandas. Two payload classes:

- REAL kernels, dependency-free: uncompressed 24-bit BMP decode
  (``decode_bmp``), PNG decode via stdlib zlib inflate + per-scanline
  unfilter (``decode_png``), RIFF/WAVE PCM-16 decode (``decode_wav``),
  and nearest-neighbor image resize (``resize_images``) — genuine
  bytes-to-pixels/samples paths exercised end to end.
- STUB kernels for compressed codecs (no image/audio libraries are
  installed in this container): deterministic fakes behind the same
  signatures, raising loudly on real JPEG magic bytes. Swap in
  Pillow/torchaudio kernels in a real deployment; the Spark-side
  contract (schema, batching, partitioning) is identical.
"""

from cdc_2025_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_bmp,
    decode_png,
    decode_wav,
    extract_audio_chunk_features,
    extract_image_features,
    make_bmp,
    make_real_media,
    make_png,
    make_synthetic_media,
    make_wav,
    resize_images,
    sample_video_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_bmp",
    "decode_png",
    "decode_wav",
    "extract_audio_chunk_features",
    "extract_image_features",
    "make_bmp",
    "make_real_media",
    "make_png",
    "make_synthetic_media",
    "make_wav",
    "resize_images",
    "sample_video_frames",
]
