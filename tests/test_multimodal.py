"""Multimodal plumbing tests: schema, Arrow batching, deterministic
stub kernels, frame-sampling cardinality."""

from __future__ import annotations

import hashlib

import pytest

from cdc_2025_spark.multimodal import (
    extract_audio_chunk_features,
    extract_image_features,
    make_synthetic_media,
    sample_video_frames,
)


def test_image_features_deterministic(spark):
    media = make_synthetic_media(spark, n=32, kind="image")
    out = extract_image_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 32
    for mid, r in rows.items():
        payload = hashlib.sha256(f"media-image-{mid}".encode()).digest() * 8
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        assert r["n_bytes"] == 256
        assert len(r["features"]) == 8
        assert all(0.0 <= f < 1.0 for f in r["features"])
    # determinism across runs
    again = {r["media_id"]: r["features"] for r in out.collect()}
    assert all(again[m] == rows[m]["features"] for m in rows)


def test_real_codec_payload_raises(spark):
    import pandas as pd
    from cdc_2025_spark.multimodal.media import _decode_image_bytes

    with pytest.raises(NotImplementedError):
        _decode_image_bytes(b"\xff\xd8\xff" + b"\x00" * 61)


def test_audio_chunk_features(spark):
    import numpy as np

    media = make_synthetic_media(spark, n=10, kind="audio")
    out = extract_audio_chunk_features(media, chunk_ms=1000)
    rows = out.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        # duration_ms = 1000*(1 + mid%7) -> chunks = duration/1000
        assert sorted(r["chunk_idx"] for r in rs) == list(
            range(1 + mid % 7)
        ), mid
        for r in rs:
            assert 0.0 <= r["rms"] <= 1.0
            assert r["rms"] <= r["peak"] <= 1.0
    # cross-check one chunk against a local numpy recompute
    r0 = next(r for r in rows if r["media_id"] == 3 and r["chunk_idx"] == 1)
    payload = hashlib.sha256(b"media-audio-3").digest() * 8
    buf = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    samples = (np.roll(buf, -1) - 128.0) / 128.0
    assert abs(r0["rms"] - float(np.sqrt(np.mean(samples**2)))) < 1e-12
    assert abs(r0["peak"] - float(np.abs(samples).max())) < 1e-12


def test_video_frame_sampling_cardinality(spark):
    media = make_synthetic_media(spark, n=14, kind="video")
    frames = sample_video_frames(media, every_ms=500)
    rows = frames.collect()
    # duration_ms = 1000*(1 + i%7) -> frames = duration/500
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        want_frames = (1000 * (1 + mid % 7)) // 500
        assert sorted(idxs) == list(range(want_frames)), mid
    # frame hashes unique per (media, idx)
    assert len({(r["media_id"], r["frame_sha256"]) for r in rows}) == len(rows)
