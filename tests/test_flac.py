"""FLAC codec (multimodal/flac.py): losslessness is structural, so
every round-trip is BIT-EXACT — the audio twin of the progressive-
JPEG exact-equality oracle. Plus the container-twin story (FLAC and
WAV of the same sine decode sample-identically), CRC fail-loud
behavior, and the lake integration through the chunk-feature kernel.
"""

from __future__ import annotations

import math
import random

import pytest

from cdc_2025_spark.multimodal.flac import (
    decode_flac,
    encode_flac,
    make_flac,
)


def _sine(n, freq=440.0, rate=8000, amp=0.5):
    return [
        int(amp * 32767 * math.sin(2 * math.pi * freq * i / rate))
        for i in range(n)
    ]


_WAVES = {
    "sine": _sine(8000),
    "constant": [1234] * 5000,
    "ramp": [((i * 3) % 20000) - 10000 for i in range(3000)],
    "noise": [random.Random(7).randint(-32768, 32767) for _ in range(2500)],
    "tiny": [5, -3, 7],
    "extremes": [32767, -32768] * 600,
    "quiet": [random.Random(3).randint(-4, 4) for _ in range(4096 * 2 + 17)],
}


@pytest.mark.parametrize("predictor", ["fixed", "lpc", "verbatim"])
@pytest.mark.parametrize("name", sorted(_WAVES))
def test_roundtrip_bit_exact(name, predictor):
    xs = _WAVES[name]
    enc = encode_flac(xs, sample_rate=8000, predictor=predictor)
    dec, sr = decode_flac(enc)
    assert sr == 8000
    assert dec == xs


@pytest.mark.parametrize("block_size", [192, 1152, 333, 4096])
def test_roundtrip_across_block_sizes(block_size):
    """Coded and literal block-size headers, plus the short last
    block, all reverse exactly."""
    xs = _WAVES["sine"]
    enc = encode_flac(xs, sample_rate=8000, block_size=block_size)
    dec, _ = decode_flac(enc)
    assert dec == xs


def test_compresses_predictable_signals():
    """FIXED prediction must actually compress: a ramp is near-free
    (order-2 residuals are constant), a sine well under half raw
    size; incompressible noise stays ~raw (Rice escape keeps it
    bounded)."""
    raw = lambda xs: 2 * len(xs)  # noqa: E731
    assert len(encode_flac(_WAVES["ramp"])) < 0.1 * raw(_WAVES["ramp"])
    assert len(encode_flac(_WAVES["sine"])) < 0.7 * raw(_WAVES["sine"])
    assert len(encode_flac(_WAVES["noise"])) < 1.1 * raw(_WAVES["noise"])


def test_lpc_beats_fixed_where_it_should():
    """The Levinson-Durbin LPC path must pay for itself where it
    should: a mid-band sine is an AR(2) process whose second
    differences are still large, so quantized LPC residuals code
    much tighter than the best FIXED order (measured 5928 vs 9682
    bytes at 440 Hz). On slowly-varying signals FIXED wins (second
    differences near zero beat LPC's coefficient-quantization
    noise) and the ``lpc`` mode must FALL BACK to it — pinned by
    never coding larger than fixed."""
    mid = _sine(8000, freq=440.0)
    n_lpc = len(encode_flac(mid, predictor="lpc"))
    n_fixed = len(encode_flac(mid, predictor="fixed"))
    assert n_lpc < 0.75 * n_fixed, (n_lpc, n_fixed)
    for name, xs in _WAVES.items():
        a = len(encode_flac(xs, predictor="lpc"))
        b = len(encode_flac(xs, predictor="fixed"))
        assert a <= b + 8, (name, a, b)  # +8: header-size slack


def test_wav_flac_twins_sample_exact():
    """make_flac is the lossless payload twin of media.make_wav: the
    same sine decodes to IDENTICAL samples from both containers —
    what makes cross-container audio dedup testable."""
    import numpy as np

    from cdc_2025_spark.multimodal.media import decode_wav, make_wav

    for pred in ("fixed", "lpc"):
        fl, fr = decode_flac(make_flac(8000, 500, 330.0, predictor=pred))
        wv, wr = decode_wav(make_wav(8000, 500, 330.0))
        raw = [int(v) for v in (np.asarray(wv) * 32768.0).round()]
        assert fr == wr == 8000
        assert fl == raw


def test_corruption_fails_loud():
    """Bit flips in the frame payload, the header, and the sample
    stream surface as CRC/MD5 errors — never silent wrong samples."""
    enc = bytearray(encode_flac(_WAVES["sine"], 8000))
    flipped = enc.copy()
    flipped[len(flipped) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(flipped))


def test_input_validation():
    with pytest.raises(ValueError, match="empty"):
        encode_flac([])
    with pytest.raises(ValueError, match="s16 range"):
        encode_flac([40000])
    with pytest.raises(ValueError, match="predictor"):
        encode_flac([1, 2], predictor="cnn")
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx")


def test_chunk_kernel_routes_flac(spark):
    """Lake integration: the audio chunk-feature kernel dispatches
    b"fLaC" payloads to the real decoder, and the FLAC twin of a WAV
    corpus yields IDENTICAL per-chunk features (lossless)."""
    from cdc_2025_spark.multimodal.media import (
        extract_audio_chunk_features,
        make_real_media,
    )

    wav = make_real_media(spark, n_images=0, n_audio=4)
    flac = make_real_media(spark, n_images=0, n_audio=0, n_flac=4)
    fw = {
        (r["media_id"], r["chunk_idx"]): (r["rms"], r["peak"])
        for r in extract_audio_chunk_features(wav, chunk_ms=500).collect()
    }
    # flac media_ids start at 0 too (n_images=n_audio=0 in its call)
    ff = {
        (r["media_id"], r["chunk_idx"]): (r["rms"], r["peak"])
        for r in extract_audio_chunk_features(flac, chunk_ms=500).collect()
    }
    assert set(fw) == set(ff)
    for k in fw:
        assert fw[k] == pytest.approx(ff[k], abs=1e-12), k


def test_non_table_sample_rates_roundtrip():
    """r10 self-review: the frame header's 16-bit-rate escape path
    (spec code 13) used to promise the rate bytes but never write
    them — every non-table rate (11025, 12000, ...) produced an
    undecodable stream. Pin the escape path AND the table path."""
    xs = _sine(2000, rate=11025)
    for rate in (11025, 12000, 7000, 44100, 8000):
        enc = encode_flac(xs, sample_rate=rate)
        dec, sr = decode_flac(enc)
        assert dec == xs
        assert sr == rate, rate


# ---------------------------------------------------------------------------
# Stereo + 24-bit (round-11: the r10 guards narrowed to real decode)
# ---------------------------------------------------------------------------

from cdc_2025_spark.multimodal.flac import decode_flac_info  # noqa: E402


def _interleave(left, right):
    return [v for pair in zip(left, right) for v in pair]


_ST_MODES = ["independent", "left-side", "right-side", "mid-side", "auto"]


@pytest.mark.parametrize("mode", _ST_MODES)
@pytest.mark.parametrize("bits", [16, 24])
def test_stereo_roundtrip_bit_exact(mode, bits):
    """Every channel assignment x bit depth round-trips BIT-EXACTLY,
    including STREAMINFO MD5 verification over the interleaved
    little-endian samples (decode_flac verifies by default)."""
    scale = 1 if bits == 16 else 1 << 8
    left = [v * scale for v in _sine(3000)]
    rng = random.Random(11)
    right = [
        v * scale + rng.randint(-40 * scale, 40 * scale)
        for v in _sine(3000, freq=660.0)
    ]
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    right = [min(max(v, lo), hi) for v in right]
    xs = _interleave(left, right)
    enc = encode_flac(
        xs, channels=2, bits=bits, predictor="lpc", stereo_mode=mode
    )
    info = decode_flac_info(enc)
    assert info["samples"] == xs
    assert info["channels"] == 2 and info["bits"] == bits


def test_stereo_extreme_samples_mid_side():
    """Full-scale anti-phase extremes: the side channel needs its
    spec-mandated EXTRA bit (|side| up to 2^bits - 1) — round-trip
    pins the width handling at both depths."""
    for bits in (16, 24):
        hi = (1 << (bits - 1)) - 1
        lo = -(1 << (bits - 1))
        left = [hi, lo] * 300
        right = [lo, hi] * 300
        for mode in ("mid-side", "left-side", "right-side"):
            enc = encode_flac(
                _interleave(left, right),
                channels=2,
                bits=bits,
                stereo_mode=mode,
            )
            assert decode_flac(enc)[0] == _interleave(left, right)


def test_mono_24bit_roundtrip():
    xs = [v << 8 for v in _WAVES["ramp"]]
    for predictor in ("fixed", "lpc", "verbatim"):
        enc = encode_flac(xs, bits=24, predictor=predictor)
        dec, sr = decode_flac(enc)
        assert dec == xs
        info = decode_flac_info(enc)
        assert info["bits"] == 24 and info["channels"] == 1


def test_decorrelation_actually_compresses():
    """On a stereo pair whose side channel is near-silent, auto's
    decorrelated frame must beat the independent encoding (the reason
    the feature exists) — and still round-trip exactly."""
    left = _sine(6000)
    rng = random.Random(5)
    right = [v + rng.randint(-2, 2) for v in left]
    xs = _interleave(left, right)
    ind = encode_flac(
        xs, channels=2, predictor="lpc", stereo_mode="independent"
    )
    auto = encode_flac(
        xs, channels=2, predictor="lpc", stereo_mode="auto"
    )
    assert len(auto) < len(ind)
    assert decode_flac(auto)[0] == xs


def test_stereo_of_mono_pattern_features_identical(spark):
    """A stereo FLAC carrying the SAME sine on both channels yields
    chunk features IDENTICAL to the mono FLAC of that sine: the
    kernel downmixes by channel mean, and mean(x, x) == x. The
    container-twin story extended across channel count."""
    from cdc_2025_spark.multimodal.media import (
        extract_audio_chunk_features,
    )

    mono = make_flac(duration_ms=1000, predictor="lpc")
    n = 8000
    xs = _sine(n)
    stereo = encode_flac(
        _interleave(xs, xs), channels=2, predictor="lpc"
    )
    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(mono), (0, 0, 1000, "flac")),
            (1, "audio", bytearray(stereo), (0, 0, 1000, "flac")),
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,codec:string>",
    )
    feats = {
        (r["media_id"], r["chunk_idx"]): (r["rms"], r["peak"])
        for r in extract_audio_chunk_features(media, chunk_ms=500).collect()
    }
    for (mid, ci), v in feats.items():
        if mid == 1:
            assert v == pytest.approx(feats[(0, ci)], abs=1e-12)


def test_unsupported_depths_and_channels_still_fail_loud():
    """The guards NARROWED, they didn't vanish: >8 channels and
    other bit depths refuse loudly at encode and decode (3-8
    channels are now a real independent-coding path —
    TestMultichannel)."""
    with pytest.raises(NotImplementedError, match="channels"):
        encode_flac([1, 2, 3], channels=9)
    with pytest.raises(NotImplementedError, match="bits"):
        encode_flac([1, 2], bits=28)  # 8/12/16/20/24/32 real paths
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac([1, 2], channels=2, stereo_mode="surround")
    with pytest.raises(ValueError, match="interleave"):
        encode_flac([1, 2, 3], channels=2)
    with pytest.raises(ValueError, match="s24 range"):
        encode_flac([1 << 23], bits=24)
    # a 28-bit STREAMINFO (hand-packed) must refuse at decode
    # (32 decodes since round 15 — RFC 9639 sample-size code 0b111)
    enc = bytearray(encode_flac([1, 2, 3, 4] * 100))
    # STREAMINFO tail starts at byte 8 (4 fLaC + 4 block header) + 10
    tail = int.from_bytes(enc[18:26], "big")
    tail = (tail & ~(0x1F << 36)) | ((28 - 1) << 36)
    enc[18:26] = tail.to_bytes(8, "big")
    with pytest.raises(NotImplementedError, match="depths"):
        decode_flac(bytes(enc))


# ---------------------------------------------------------------------------
# Multichannel (3-8, independent coding)
# ---------------------------------------------------------------------------


class TestMultichannel:
    def test_roundtrip_all_channel_counts_and_depths(self):
        """1-8 channels x 16/24-bit round-trip bit-exactly (STREAMINFO
        MD5 over interleaved samples verified inside decode)."""
        from cdc_2025_spark.multimodal.flac import (
            decode_flac_info,
            make_flac,
        )

        for nch in (1, 2, 3, 4, 6, 8):
            for bits in (16, 24):
                p = make_flac(
                    8000, 500, 220.0, 0.3, channels=nch, bits=bits,
                    predictor="lpc" if nch % 2 else "fixed",
                )
                info = decode_flac_info(p)
                assert info["channels"] == nch
                assert info["bits"] == bits
                assert len(info["samples"]) == 4000 * nch

    def test_each_channel_equals_its_mono_twin(self):
        """Independent coding is verifiable channel-for-channel: the
        6-channel stream's channel c equals the mono encode of the
        same harmonic, sample-exact."""
        from cdc_2025_spark.multimodal.flac import (
            decode_flac_info,
            make_flac,
        )

        s6 = decode_flac_info(
            make_flac(
                8000, 250, 220.0, 0.3, channels=6, bits=16,
                predictor="fixed",
            )
        )["samples"]
        for c in range(6):
            mono = decode_flac_info(
                make_flac(
                    8000, 250, 220.0 * (1 + c / 2.0), 0.3,
                    channels=1, bits=16, predictor="fixed",
                )
            )["samples"]
            assert s6[c::6] == mono, c

    def test_channel_count_bounds(self):
        import pytest

        from cdc_2025_spark.multimodal.flac import encode_flac

        with pytest.raises(NotImplementedError, match="1-8"):
            encode_flac([0] * 18, channels=9)
        with pytest.raises(NotImplementedError, match="1-8"):
            encode_flac([0] * 18, channels=0)

    def test_audio_kernel_downmixes_multichannel(self, spark):
        """The chunk-feature kernel scores the channel-mean downmix of
        a 4-channel FLAC without touching the stub path."""
        from pyspark.sql import functions as F  # noqa: F401

        from cdc_2025_spark.multimodal import (
            extract_audio_chunk_features,
        )
        from cdc_2025_spark.multimodal.flac import make_flac

        p = make_flac(8000, 1000, 220.0, 0.3, channels=4, bits=16)
        media = spark.createDataFrame(
            [(0, "audio", bytearray(p), (0, 0, 1000, "flac"))],
            "media_id long, kind string, payload binary, "
            "meta struct<width:int,height:int,duration_ms:int,"
            "codec:string>",
        )
        rows = extract_audio_chunk_features(media, chunk_ms=500).collect()
        assert len(rows) == 2
        for r in rows:
            assert 0.0 < r["rms"] <= r["peak"] <= 1.0


def test_32bit_roundtrip_all_modes():
    """32-bit depth (RFC 9639 sample-size code 0b111, reserved in
    the classic spec): full-scale mono round-trips under every
    predictor, stereo under every channel assignment — the side
    channel there carries 33-bit values, exercising the arbitrary-
    width signed reader/writer — and a smooth ramp still
    compresses below raw."""
    import numpy as np

    from cdc_2025_spark.multimodal.flac import (
        decode_flac_info,
        encode_flac,
    )

    rng = np.random.default_rng(11)
    lo, hi = -(1 << 31), (1 << 31) - 1
    mono = [int(v) for v in rng.integers(lo, hi, 300, np.int64)]
    mono += [lo, hi, 0, -1, 1]
    for pred in ("fixed", "lpc", "verbatim"):
        info = decode_flac_info(
            encode_flac(mono, bits=32, predictor=pred)
        )
        assert info["bits"] == 32 and info["samples"] == mono, pred
    st = [int(v) for v in rng.integers(lo, hi, 400, np.int64)]
    st[:4] = [lo, hi, hi, lo]  # max-magnitude side values
    for mode in (
        "independent", "mid-side", "left-side", "right-side", "auto"
    ):
        info = decode_flac_info(
            encode_flac(st, bits=32, channels=2, stereo_mode=mode)
        )
        assert info["samples"] == st, mode
    ramp = [1_000_000 * i + 500 * (i % 7) for i in range(2000)]
    assert len(encode_flac(ramp, bits=32)) < 2000 * 4
    with pytest.raises(ValueError, match="range"):
        encode_flac([1 << 31], bits=32)
