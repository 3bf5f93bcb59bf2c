"""Audio perceptual fingerprinting — the audio leg of the near-dup
family (images: 64-bit aHash in phash.py; videos: per-frame aHash;
this: per-frame spectral band-energy sign hashes in the style of
Haitsma & Kalker, "A Highly Robust Audio Fingerprint System",
ISMIR 2002).

Per non-overlapping ``frame_ms`` window: FFT power spectrum, summed
into ``n_bands`` log-spaced bands; bit(t, b) = 1 iff the band-energy
difference E(t,b) - E(t,b+1) grew since the previous frame — the
sign of a time-and-frequency derivative, which is invariant to any
positive rescaling of the signal (volume, bit-depth widening by a
power of two) and robust to small noise wherever the derivative has
real margin. Each frame packs to an (n_bands - 1)-bit integer; a
clip is its SET of frame hashes, and near-dup pairing is the same
distinct-hash containment equi-join the video family uses
(phash.video_neardup_pairs consumes this kernel's output verbatim).

Deterministic end to end: the decode is the exact WAV/FLAC sample
path, the FFT is numpy's on float64, and the sign rule is strict
``>``. Lossless container twins (WAV vs FLAC of the same samples)
fingerprint IDENTICALLY by construction; a x2^k amplified 24-bit
re-encode of a 16-bit clip fingerprints identically because
power-of-two scaling is exact in float64 (pinned in tests).

Scale shape: one Arrow-batched mapInPandas stage, ~10 bytes out per
frame; samples never leave the task. Pairing runs entirely on the
(media_id, hash) frame — no all-pairs stage at any corpus size.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

AFP_SCHEMA = "media_id long, frame_no int, ahash long"


def _decode_audio(raw: bytes):
    """(mono float64 samples, rate) — the shared audio dispatch
    (media.decode_audio_payload), so this kernel and the
    chunk-feature kernel can never decode the same payload
    differently."""
    from cdc_2025_spark.multimodal.media import (  # noqa: PLC0415
        decode_audio_payload,
    )

    return decode_audio_payload(raw)


def fingerprint_samples(
    samples,
    rate: int,
    frame_ms: int = 64,
    n_bands: int = 9,
    f_lo: float = 300.0,
) -> list[int]:
    """Frame hashes of one clip. ``n_bands`` log-spaced bands from
    ``f_lo`` to 90% of Nyquist; each hash packs the n_bands-1 sign
    bits of the time-delta of adjacent-band energy differences.
    Frames shorter than the window (the tail) are dropped; the first
    frame has no predecessor and emits no hash."""
    import numpy as np  # noqa: PLC0415

    if not 2 <= n_bands <= 64:
        raise ValueError(
            f"need 2 <= n_bands <= 64, got {n_bands}"
        )
    f_hi = 0.45 * rate  # 90% of Nyquist
    if f_lo >= f_hi:
        # descending band edges would yield all-empty bands and an
        # all-zero fingerprint that pairs unrelated clips — refuse
        raise ValueError(
            f"f_lo {f_lo} >= 0.45 * rate ({f_hi}); sample rate too "
            "low for the requested band floor"
        )
    x = np.asarray(samples, dtype=np.float64)
    frame_len = max(int(rate * frame_ms) // 1000, 2)
    n_frames = len(x) // frame_len
    if n_frames < 2:
        return []
    frames = x[: n_frames * frame_len].reshape(n_frames, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame_len, d=1.0 / rate)
    edges = np.geomspace(f_lo, f_hi, n_bands + 1)
    # band b sums bins in [edges[b], edges[b+1])
    e = np.zeros((n_frames, n_bands))
    for b in range(n_bands):
        mask = (freqs >= edges[b]) & (freqs < edges[b + 1])
        e[:, b] = spec[:, mask].sum(axis=1)
    d = e[:, :-1] - e[:, 1:]  # adjacent-band differences
    dd = d[1:] - d[:-1]  # time derivative
    bits = dd > 0.0
    weights = 1 << np.arange(n_bands - 2, -1, -1, dtype=np.int64)
    return [int(v) for v in bits @ weights]


def audio_fingerprints(
    media: DataFrame,
    frame_ms: int = 64,
    n_bands: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id, frame_no, ahash) for every WAV/FLAC payload row —
    column-compatible with phash.video_neardup_pairs, so audio
    near-dup pairing is the same distinct-hash containment join the
    video family uses."""
    import pandas as pd  # noqa: PLC0415

    src = media.select(id_col, payload_col)

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, nos, hs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = _decode_audio(bytes(payload))
                for i, h in enumerate(
                    fingerprint_samples(
                        samples, rate, frame_ms=frame_ms,
                        n_bands=n_bands,
                    )
                ):
                    ids.append(int(mid))
                    nos.append(i)
                    hs.append(h)
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "ahash": hs}
            )

    return src.mapInPandas(run, schema=AFP_SCHEMA)
