"""AU (Sun/NeXT .snd) and AIFF containers (multimodal/media.py):
cross-container twin equality is the oracle — the same samples
through AU/AIFF decode IDENTICALLY to their WAV twins (PCM exact;
G.711 via the same ITU expansion), the AIFF 80-bit extended
sample-rate field round-trips integers exactly, stereo downmixes
to the channel mean, and malformed headers fail loud."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cdc_2025_spark.multimodal.media import (
    _f80_pack,
    _f80_unpack,
    decode_aiff,
    decode_au,
    decode_audio_payload,
    encode_aiff,
    encode_au,
    encode_wav_g711,
    encode_wav_pcm16,
)

RATE = 8000


def _tone(freq=440.0, n=2000, amp=9000):
    return [
        int(amp * math.sin(2 * math.pi * freq * i / RATE))
        for i in range(n)
    ]


def test_cross_container_twins_sample_exact():
    xs = _tone()
    wav, wr = decode_audio_payload(
        bytearray(encode_wav_pcm16(xs, RATE))
    )
    au, ar = decode_audio_payload(encode_au(xs, RATE, encoding=3))
    assert ar == wr == RATE and np.array_equal(au, wav)
    aif, fr = decode_audio_payload(encode_aiff(xs, RATE))
    assert fr == RATE and np.array_equal(aif, wav)
    # G.711 twins decode through the same ITU expansion
    for enc, law in ((1, "mulaw"), (27, "alaw")):
        a, _ = decode_audio_payload(encode_au(xs, RATE, encoding=enc))
        w, _ = decode_audio_payload(
            bytearray(encode_wav_g711(xs, RATE, law))
        )
        assert np.array_equal(a, w), law
    # AIFF's 8-bit convention is SIGNED — equal to AU pcm8 (same
    # high-byte truncation), and NOT the WAV unsigned convention
    a8, _ = decode_au(encode_au(xs, RATE, encoding=2))
    f8, _ = decode_aiff(encode_aiff(xs, RATE, bits=8))
    assert np.array_equal(a8, f8)


def test_f80_sample_rates_roundtrip_exact():
    for r in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 7, 1):
        assert _f80_unpack(_f80_pack(r)) == r, r
    with pytest.raises(ValueError, match="positive"):
        _f80_pack(0)
    with pytest.raises(ValueError, match="negative"):
        _f80_unpack(b"\xff\xff" + b"\x00" * 8)


def test_stereo_downmix_channel_mean():
    left, right = _tone(440), _tone(660.0)
    inter = [v for pair in zip(left, right) for v in pair]
    exp = (
        np.asarray(left, float) + np.asarray(right, float)
    ) / (2 * 32768.0)
    au, _ = decode_au(encode_au(inter, RATE, encoding=3, channels=2))
    ai, _ = decode_aiff(encode_aiff(inter, RATE, channels=2))
    assert np.allclose(au, exp) and np.allclose(ai, exp)


def test_refusals_fail_loud():
    import struct

    xs = _tone(n=100)
    with pytest.raises(NotImplementedError, match="AU encoding"):
        encode_au(xs, RATE, encoding=6)
    with pytest.raises(NotImplementedError, match="sample size"):
        encode_aiff(xs, RATE, bits=24)
    with pytest.raises(ValueError, match="interleave"):
        encode_au(xs + [1], RATE, channels=2)
    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"RIFFxxxx")
    with pytest.raises(NotImplementedError, match="AIFC"):
        decode_aiff(b"FORM\x00\x00\x00\x04AIFC")
    # header promising more data than present fails loud
    p = bytearray(encode_au(xs, RATE, encoding=3))
    struct.pack_into(">I", p, 8, 10_000_000)
    with pytest.raises(ValueError, match="promises"):
        decode_au(bytes(p))
    # unknown encoding in an otherwise-valid header refuses
    p = bytearray(encode_au(xs, RATE, encoding=3))
    struct.pack_into(">I", p, 12, 23)  # 4-bit G.721 ADPCM
    with pytest.raises(NotImplementedError, match="AU encoding 23"):
        decode_au(bytes(p))
    # AIFF frame-count overpromise fails loud
    a = bytearray(encode_aiff(xs, RATE))
    at = bytes(a).find(b"COMM") + 8 + 2
    struct.pack_into(">I", a, at, 10_000)
    with pytest.raises(ValueError, match="frames"):
        decode_aiff(bytes(a))


def test_chunk_kernel_routes_au_and_aiff(spark):
    """Lake integration: the audio chunk-feature kernel dispatches
    .snd and FORM payloads beside RIFF/fLaC, and the AU/AIFF twins
    of a WAV corpus yield IDENTICAL per-chunk features (lossless
    PCM16 containers)."""
    from cdc_2025_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_audio_chunk_features,
    )

    xs = _tone(330, n=RATE)  # 1 s
    rows = [
        (0, "audio", bytearray(encode_wav_pcm16(xs, RATE)),
         (0, 0, 1000, "pcm_s16le")),
        (1, "audio", bytearray(encode_au(xs, RATE, encoding=3)),
         (0, 0, 1000, "au_pcm16")),
        (2, "audio", bytearray(encode_aiff(xs, RATE)),
         (0, 0, 1000, "aiff_pcm16")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        (r["media_id"], r["chunk_idx"]): (r["rms"], r["peak"])
        for r in extract_audio_chunk_features(
            df, chunk_ms=500
        ).collect()
    }
    for (mid, ci), v in feats.items():
        if mid:
            assert v == feats[(0, ci)], (mid, ci)
