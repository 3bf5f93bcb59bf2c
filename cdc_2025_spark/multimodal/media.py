"""Media table schema + decode/feature-extract operators.

Design for 100 TB of media: payloads live in the lake as parquet
binary columns (or object-store URIs for >~1 MB blobs); the decode
stage is mapInPandas so each Arrow batch moves JVM->Python exactly
once; partitioning is by content hash so decode work balances
regardless of source skew.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha256", StringType()),
    ]
)


def make_synthetic_media(
    spark: SparkSession, n: int = 64, kind: str = "image"
) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes) for
    exercising the pipeline without real codecs."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 16, 48 + i % 9, 1000 * (1 + i % 7), "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_bytes(payload: bytes) -> list[float]:
    """STUB decode kernel. Real deployments replace this with
    Pillow/libvips decode + a vision embedding; here it derives a
    deterministic 8-dim feature vector from the payload bytes so the
    distributed plumbing is testable end to end.

    Raises NotImplementedError for payloads that look like real
    encodings (magic bytes) to make accidental production use loud.
    """
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "real image decoding requires Pillow; not available in this "
            "container — swap _decode_image_bytes for a real kernel"
        )
    out = []
    for j in range(8):
        chunk = payload[j * 4 : j * 4 + 4] or b"\0\0\0\0"
        out.append(_struct.unpack("<I", chunk.ljust(4, b"\0"))[0] / 2**32)
    return out


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas: one Arrow batch in,
    one out; constant memory per task regardless of corpus size."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            feats = [
                _decode_image_bytes(bytes(p)) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def extract_audio_chunk_features(
    media: DataFrame, chunk_ms: int = 1000
) -> DataFrame:
    """Per-chunk audio loudness features (RMS + peak), one output row
    per ``chunk_ms`` of meta.duration_ms.

    Same two-phase shape as frame sampling: chunk cardinality is
    JVM-side explode (Catalyst sees it), the decode kernel is the
    stubbed Python stage. The STUB treats the payload as raw unsigned
    8-bit PCM cycled over chunks — real deployments swap in
    soundfile/ffmpeg decode behind the identical (payload, chunk_idx)
    -> features contract.
    """
    auds = media.filter(F.col("kind") == "audio").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / chunk_ms).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("chunk_idx"),
    )

    def run(batches: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rms, peak = [], []
            for p, i in zip(pdf["payload"], pdf["chunk_idx"]):
                buf = np.frombuffer(bytes(p), dtype=np.uint8).astype(
                    np.float64
                )
                # stub "decode": rotate the buffer per chunk so chunks
                # differ deterministically; center to [-1, 1]
                samples = (np.roll(buf, -int(i)) - 128.0) / 128.0
                rms.append(float(np.sqrt(np.mean(samples**2))))
                peak.append(float(np.abs(samples).max()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "chunk_idx": pdf["chunk_idx"],
                    "rms": rms,
                    "peak": peak,
                }
            )

    return auds.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame sampling contract: one output row per sampled frame.

    The frame count derives from meta.duration_ms (declarative,
    JVM-side explode); the per-frame decode is the stubbed Python
    stage. This is the standard two-phase shape: cheap metadata math
    first so Catalyst can estimate cardinality, expensive decode last.
    """
    vids = media.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_sha256": [
                        hashlib.sha256(
                            bytes(p) + int(i).to_bytes(4, "little")
                        ).hexdigest()
                        for p, i in zip(pdf["payload"], pdf["frame_idx"])
                    ],
                }
            )

    return vids.mapInPandas(run, FRAME_SAMPLE_SCHEMA)
