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

# media_id offsets that keep the three real-container frames' ids
# disjoint inside the kind-tagged union (each make_real_media call
# numbers its rows from 0)
_PNG_BAND = 1000
_JPEG_BAND = 2000


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
    # coalesce(2): createDataFrame spreads these few-dozen-row local
    # frames over defaultParallelism partitions, so every mapInPandas
    # branch otherwise launches 32 (mostly empty) Python-worker tasks
    # — at 6 branches that is the rollup's measured fixed cost, not
    # the kernels (<0.1 s of decode). Two partitions keep a branch
    # pair of workers busy while preserving cross-branch concurrency.
    # At real corpus sizes the inputs arrive pre-partitioned and no
    # coalesce applies.
    images = make_synthetic_media(spark, n=64, kind="image").coalesce(2)
    audio = make_synthetic_media(spark, n=32, kind="audio").coalesce(2)
    video = make_synthetic_media(spark, n=16, kind="video").coalesce(2)
    real = make_real_media(spark, n_images=8, n_audio=8).coalesce(2)
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
    # real-kernel container paths (BMP / PNG / baseline JPEG): the
    # decode kernel dispatches per-row on magic bytes, and all three
    # rows aggregate the SAME feature indices (gray-std avg, gray-max
    # max — closed-form checkable, and JPEG tolerance-close to BMP
    # over the same patterns; both pinned in test_multimodal.py), so
    # the three per-container branches fold into ONE kind-tagged
    # union -> ONE mapInPandas stage -> groupBy(kind): 2 fewer
    # Python-worker stage setups, the rollup's measured fixed cost.
    # Tag by disjoint media_id bands (each make_real_media call
    # numbers from 0, so ids collide across calls).
    containers = (
        real.filter(F.col("kind") == "image")
        .unionByName(
            real_png.withColumn("media_id", F.col("media_id") + _PNG_BAND)
        )
        .unionByName(
            real_jpeg.withColumn("media_id", F.col("media_id") + _JPEG_BAND)
        )
        # spread the 24 container payloads across 24 tasks so the
        # pure-Python baseline-JPEG decode (the documented slow path)
        # keeps per-image parallelism — coalescing this union was
        # measured to serialize the JPEGs onto one straggler task
        # (~5 s slower). Round-robin is APPROXIMATE isolation: each
        # input partition starts at its own offset, so a task can
        # carry 2-4 rows while others sit empty. The exact
        # alternative (repartitionByRange(24, "media_id"), perfect
        # 1-row-per-task) was tried and measured SLOWER steady-state
        # (3.0 -> 5.5 s): its range-boundary sampling pass
        # re-evaluates the payload-encode union per action, costing
        # more than the collisions it removes at this row count.
        .repartition(24)
    )
    per_container = (
        extract_image_features(containers)
        .groupBy(
            F.when(F.col("media_id") >= _JPEG_BAND, "image_jpeg")
            .when(F.col("media_id") >= _PNG_BAND, "image_png")
            .otherwise("image_bmp")
            .alias("kind")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.avg(F.element_at("features", 6)), 4).alias(
                "avg_metric"
            ),
            F.round(F.max(F.element_at("features", 8)), 4).alias(
                "max_metric"
            ),
        )
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
        .unionByName(per_container)
        .unionByName(resized)
        .unionByName(wav)
    )
