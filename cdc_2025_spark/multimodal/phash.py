"""Perceptual image hashing (aHash / average hash, the classic
64-bit fingerprint: 8x8 block-mean grayscale thresholded at its own
mean) over decoded image payloads — the image twin of text simhash,
feeding the same pigeonhole Hamming pairing
(dedup/simhash.py:hamming_pairs).

Kernel contract mirrors the other media kernels (multimodal/media.py):
Arrow-batched mapInPandas, per-row container dispatch on magic bytes
(BMP + PNG — the two dependency-free real decoders), deterministic
output. At 100 TB the hash stage is a map-only scan (64 bits out per
image); all pairwise work happens downstream on the 8-byte
fingerprints, never on pixels.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from cdc_2025_spark.multimodal.media import _PNG_SIG, decode_bmp, decode_png

_HASH_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("fp", LongType()),
    ]
)


def ahash64_from_rgb(rgb) -> int:
    """64-bit average hash of an (h, w, 3) uint8 RGB array: grayscale
    by channel mean, trim to 8x8 block multiples, per-block means,
    bit i (row-major) set iff block mean >= the global block mean.
    Pure numpy; deterministic."""
    import numpy as np  # noqa: PLC0415

    g = rgb.astype(np.float64).mean(axis=2)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError(f"image too small for 8x8 aHash: {h}x{w}")
    g = g[: bh * 8, : bw * 8]
    blocks = g.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks >= blocks.mean()).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # keep the int64 domain Spark expects (bit 63 -> sign bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_rgb(payload: bytes):
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "aHash supports the dependency-free decoders (BMP, PNG); "
        f"got magic {bytes(payload[:4])!r}"
    )


def perceptual_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, fp): 64-bit aHash per image row — Arrow-batched
    mapInPandas, one Python stage, 8 bytes out per image."""
    import pandas as pd  # noqa: PLC0415

    src = media.select(id_col, payload_col)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(mid))
                fps.append(ahash64_from_rgb(_decode_rgb(bytes(payload))))
            yield pd.DataFrame({"id": ids, "fp": fps})

    return src.mapInPandas(run, schema=_HASH_SCHEMA)


def perturb_bmp(payload: bytes, n_bytes: int = 60, seed: int = 1) -> bytes:
    """Deterministically bump ``n_bytes`` random pixel bytes of a BMP
    payload (header untouched) — the near-duplicate fixture: block
    means barely move, so the aHash lands within a few bits of the
    original while remaining byte-distinct."""
    import numpy as np  # noqa: PLC0415

    rng = np.random.RandomState(seed)
    b = bytearray(payload)
    for _ in range(n_bytes):
        off = 54 + int(rng.randint(0, len(b) - 54))
        b[off] = (b[off] + int(rng.randint(1, 30))) % 256
    return bytes(b)


VIDEO_HASH_SCHEMA = "media_id long, frame_no int, ahash long"


def video_frame_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, frame_no, ahash): 64-bit aHash of every DECODED
    container frame of each video row — the video leg of the
    perceptual-hash family. Dispatches on magic bytes: RIFF/AVI
    payloads through multimodal/avi.py (MJPEG / DIB frame decode),
    GIF payloads through multimodal/gif.py (LZW frames — animated
    GIFs are videos too). One Arrow-batched mapInPandas stage;
    12 bytes out per frame, pixels never leave the task."""
    import pandas as pd  # noqa: PLC0415

    from cdc_2025_spark.multimodal.avi import (  # noqa: PLC0415
        decode_avi_frame,
        parse_avi,
    )
    from cdc_2025_spark.multimodal.gif import decode_gif  # noqa: PLC0415

    src = media.select(id_col, payload_col)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, nos, hs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if raw[:6] in (b"GIF89a", b"GIF87a"):
                    for f, frame in enumerate(
                        decode_gif(raw)["frames"]
                    ):
                        ids.append(int(mid))
                        nos.append(f)
                        hs.append(ahash64_from_rgb(frame))
                    continue
                meta = parse_avi(raw)
                for f in range(meta["n_frames"]):
                    ids.append(int(mid))
                    nos.append(f)
                    hs.append(
                        ahash64_from_rgb(decode_avi_frame(meta, f))
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "ahash": hs}
            )

    return src.mapInPandas(run, schema=VIDEO_HASH_SCHEMA)


def video_neardup_pairs(
    frame_hashes: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """(id_a, id_b, n_shared, containment): video pairs whose DISTINCT
    frame-hash sets overlap in at least ``threshold`` of the smaller
    set — near-dup across re-encodes, truncations, and shared-prefix
    edits (a video sharing most of a shorter video's frames is its
    near-dup regardless of extra tail content; the containment
    convention the text dedup family uses).

    Scale shape: everything runs on the (media_id, ahash) frame —
    one distinct, one equi-join on the 8-byte hash, grouped counts.
    Frames never pair across DIFFERENT hashes (no all-pairs stage);
    a hash shared by many videos fans out exactly like a shared
    shingle in the text containment query."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(
            f"threshold must be in (0, 1], got {threshold}"
        )
    d = frame_hashes.select("media_id", "ahash").distinct()
    sizes = d.groupBy("media_id").agg(F.count("*").alias("n"))
    a = d.select(F.col("media_id").alias("id_a"), "ahash")
    b = d.select(F.col("media_id").alias("id_b"), "ahash")
    shared = (
        a.join(b, "ahash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("media_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("media_id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("n_a", "n_b"), 4
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
