"""Driver-visible multimodal query: runs the image/audio/video stub
kernels (multimodal/media.py) end to end under the driver.

Rows-only by design — the decode stages are mapInPandas kernels, not
SQL — but fully deterministic: synthetic payloads are sha256-seeded,
and every output metric is an order-insensitive aggregate, so the
driver's repeated runs hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_2025_spark.multimodal.media import (
    extract_audio_chunk_features,
    extract_image_features,
    make_real_media,
    make_synthetic_media,
    resize_images,
    sample_video_frames,
)
from cdc_2025_spark.queries.registry import query


@query("multimodal_feature_rollup")
def multimodal_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind rollup over all three media pipelines (image features,
    audio chunk loudness, video frame samples): one row per kind with
    scalar aggregate metrics.

    Exercises the real distributed plumbing — Arrow-batched
    mapInPandas decode, JVM-side explode for chunk/frame cardinality —
    over BOTH payload classes: deterministic synthetic payloads
    through the stub kernels (image/audio/video rows) AND real
    decodable payloads through the non-stub kernels (image_bmp: 24-bit
    BMP pixel decode; audio_wav: RIFF PCM-16 sample decode —
    multimodal/media.py decode_bmp / decode_wav), plus image_png:
    stdlib-zlib PNG inflate + unfilter carrying the SAME pixel
    patterns as image_bmp, so those two rows' avg/max metrics must
    agree exactly (pinned in test_multimodal.py), plus image_jpeg:
    real baseline-JPEG entropy decode + IDCT (multimodal/jpeg.py)
    over the same patterns, tolerance-close to image_bmp. ``sf_dir``
    is unused: media rows are generated, not read, since the testdata
    lake has no media table.
    """
    images = make_synthetic_media(spark, n=64, kind="image")
    audio = make_synthetic_media(spark, n=32, kind="audio")
    video = make_synthetic_media(spark, n=16, kind="video")
    real = make_real_media(spark, n_images=8, n_audio=8)
    real_png = make_real_media(spark, n_images=0, n_audio=0, n_png=8)
    real_jpeg = make_real_media(spark, n_images=0, n_audio=0, n_jpeg=8)

    img = extract_image_features(images).agg(
        F.lit("image").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.element_at("features", 1)), 4).alias("avg_metric"),
        F.max("n_bytes").cast("double").alias("max_metric"),
    )
    aud = extract_audio_chunk_features(audio, chunk_ms=1000).agg(
        F.lit("audio").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg("rms"), 4).alias("avg_metric"),
        F.round(F.max("peak"), 4).alias("max_metric"),
    )
    vid = sample_video_frames(video, every_ms=500).agg(
        F.lit("video").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg("frame_idx"), 4).alias("avg_metric"),
        F.count_distinct("frame_sha256").cast("double").alias("max_metric"),
    )
    # real-kernel paths: BMP mean-gray spread and WAV sine RMS are
    # closed-form checkable (test_multimodal.py pins both)
    bmp = extract_image_features(real).agg(
        F.lit("image_bmp").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.element_at("features", 6)), 4).alias("avg_metric"),
        F.round(F.max(F.element_at("features", 8)), 4).alias("max_metric"),
    )
    png = extract_image_features(real_png).agg(
        F.lit("image_png").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.element_at("features", 6)), 4).alias("avg_metric"),
        F.round(F.max(F.element_at("features", 8)), 4).alias("max_metric"),
    )
    # baseline JPEG kernel (multimodal/jpeg.py: Huffman entropy decode
    # + dequant + IDCT, alternating 4:4:4 / 4:2:0): same pixel
    # patterns as image_bmp, so its metrics sit tolerance-close to
    # that row's (DCT quantization is lossy; parity pinned in
    # test_multimodal.py, determinism makes the driver hash stable)
    jpeg = extract_image_features(real_jpeg).agg(
        F.lit("image_jpeg").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.element_at("features", 6)), 4).alias("avg_metric"),
        F.round(F.max(F.element_at("features", 8)), 4).alias("max_metric"),
    )
    # resize stage: decode -> nearest-neighbor 16x12 -> re-encode ->
    # re-decode via the feature kernel; avg_metric is the mean width
    # (must be exactly 16 for all rows), max_metric the max gray
    resized = extract_image_features(resize_images(real, 16, 12)).agg(
        F.lit("image_resized").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg(F.element_at("features", 1)), 4).alias("avg_metric"),
        F.round(F.max(F.element_at("features", 8)), 4).alias("max_metric"),
    )
    wav = extract_audio_chunk_features(real, chunk_ms=500).agg(
        F.lit("audio_wav").alias("kind"),
        F.count("*").alias("n_rows"),
        F.round(F.avg("rms"), 4).alias("avg_metric"),
        F.round(F.max("peak"), 4).alias("max_metric"),
    )
    return (
        img.unionByName(aud)
        .unionByName(vid)
        .unionByName(bmp)
        .unionByName(png)
        .unionByName(jpeg)
        .unionByName(resized)
        .unionByName(wav)
    )
