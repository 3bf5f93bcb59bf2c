"""Audio perceptual fingerprint (multimodal/afp.py): Haitsma-Kalker
band-energy sign hashes. Pins: lossless container twins fingerprint
identically, power-of-two amplification is EXACTLY invariant,
truncations pair at containment 1.0 through the shared containment
join, distinct melodies never pair, and the Spark kernel equals the
local model."""

from __future__ import annotations

import math

import pytest

from cdc_2025_spark.multimodal.afp import (
    _decode_audio,
    audio_fingerprints,
    fingerprint_samples,
)
from cdc_2025_spark.multimodal.flac import encode_flac
from cdc_2025_spark.multimodal.media import make_wav

RATE = 8000


def _melody_samples(notes, ms_per_note=200, amplitude=0.25, full=32767):
    """Deterministic integer melody: one sine segment per note —
    strong band-energy transitions at every boundary, the structure
    the fingerprint keys on (a steady tone has none)."""
    xs = []
    n = RATE * ms_per_note // 1000
    for f in notes:
        for i in range(n):
            xs.append(
                int(amplitude * full * math.sin(2 * math.pi * f * i / RATE))
            )
    return xs


MELODY_A = (220.0, 440.0, 330.0, 550.0, 275.0)
MELODY_B = (620.0, 180.0, 740.0, 390.0, 880.0)


def test_wav_flac_lossless_twins_identical():
    """The same sine through WAV and FLAC decodes to identical
    samples, so the fingerprints are identical by construction."""
    wav = make_wav(RATE, 1000, 440.0, 0.5)
    s_w, r_w = _decode_audio(wav)
    flac = encode_flac(
        [int(v * 32768) for v in s_w], sample_rate=RATE
    )
    s_f, r_f = _decode_audio(flac)
    assert r_w == r_f
    fw = fingerprint_samples(s_w, r_w)
    ff = fingerprint_samples(s_f, r_f)
    assert fw == ff and len(fw) > 5


def test_power_of_two_amplification_invariant():
    """x -> 128x re-encoded at 24-bit: decoded samples are EXACTLY
    1/... proportional by a power of two, float64 scaling is exact,
    so every sign bit — and the whole fingerprint — is identical."""
    xs = _melody_samples(MELODY_A)
    p16 = encode_flac(xs, sample_rate=RATE, bits=16)
    p24 = encode_flac(
        [v * 128 for v in xs], sample_rate=RATE, bits=24
    )
    s16, _ = _decode_audio(p16)
    s24, _ = _decode_audio(p24)
    f16 = fingerprint_samples(s16, RATE)
    f24 = fingerprint_samples(s24, RATE)
    assert f16 == f24 and len(f16) > 10


def test_melody_fingerprints_are_informative():
    xs = _melody_samples(MELODY_A)
    s, _ = _decode_audio(encode_flac(xs, sample_rate=RATE))
    f = fingerprint_samples(s, RATE)
    # transitions produce multiple distinct hashes, not a constant
    assert len(set(f)) > 3
    fb = fingerprint_samples(
        _decode_audio(
            encode_flac(_melody_samples(MELODY_B), sample_rate=RATE)
        )[0],
        RATE,
    )
    assert set(f) != set(fb)


def test_spark_kernel_and_containment_pairing(spark):
    """Spark fingerprints == local model; a truncated prefix pairs
    with its full clip at containment 1.0 via the SAME containment
    join the video family uses; distinct melodies never pair."""
    from cdc_2025_spark.multimodal.phash import video_neardup_pairs

    full_a = encode_flac(_melody_samples(MELODY_A), sample_rate=RATE)
    prefix_a = encode_flac(
        _melody_samples(MELODY_A[:3]), sample_rate=RATE
    )
    full_b = encode_flac(_melody_samples(MELODY_B), sample_rate=RATE)
    media = spark.createDataFrame(
        [
            (0, bytearray(full_a)),
            (1, bytearray(prefix_a)),
            (2, bytearray(full_b)),
        ],
        "media_id long, payload binary",
    ).repartition(3)
    fh = audio_fingerprints(media)
    rows = fh.collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(
            (r["frame_no"], r["ahash"])
        )
    for mid, payload in ((0, full_a), (1, prefix_a), (2, full_b)):
        s, rate = _decode_audio(payload)
        want = fingerprint_samples(s, rate)
        assert sorted(got[mid]) == list(enumerate(want)), mid
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in video_neardup_pairs(fh, threshold=0.5).collect()
    }
    assert pairs.get((0, 1)) == 1.0  # prefix's hash set is contained
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_validates_band_count():
    import pytest

    with pytest.raises(ValueError, match="n_bands"):
        fingerprint_samples([0.0] * 4000, RATE, n_bands=1)


def test_validates_rate_and_band_bounds():
    import pytest

    # sample rate too low for the band floor: descending edges would
    # make an all-zero fingerprint that pairs unrelated clips
    with pytest.raises(ValueError, match="sample rate too low"):
        fingerprint_samples([0.0] * 4000, 600)
    with pytest.raises(ValueError, match="n_bands"):
        fingerprint_samples([0.0] * 4000, RATE, n_bands=65)


def test_registered_audio_neardup_matches_set_model(spark):
    """The registered multimodal_audio_neardup query: engine pairs ==
    a python set model over the same fingerprints — the 5 planted
    duplicate classes at containment 1.0 (prefix truncation x2, exact
    byte dup, WAV container twin, x128 24-bit re-encode) plus the r13
    adversarial controls: the mild-noise positive pairs with its base
    and the base's prefix, the pitched negative pairs with NOTHING
    while carrying the corpus's tightest sub-threshold containment
    (0.364 vs its own base) — the invariance claims are bounded on
    both sides, not just demonstrated."""
    from cdc_2025_spark.multimodal.flac import encode_flac as ef
    from cdc_2025_spark.multimodal.media import encode_wav_pcm16
    from cdc_2025_spark.queries.multimodal import (
        AUDIO_NEARDUP_MELODIES,
        _lcg_dither,
        multimodal_audio_neardup,
    )
    import math as m

    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["containment"])
        for r in multimodal_audio_neardup(spark, "unused").collect()
    }

    rate = 8000

    def melody(notes, ms=200, amp=0.25):
        n = rate * ms // 1000
        return [
            int(amp * 32767 * m.sin(2 * m.pi * f * i / rate))
            for f in notes
            for i in range(n)
        ]

    clips = {
        i: ef(melody(mel), sample_rate=rate)
        for i, mel in enumerate(AUDIO_NEARDUP_MELODIES)
    }
    clips[6] = ef(melody(AUDIO_NEARDUP_MELODIES[0][:3]), sample_rate=rate)
    clips[7] = ef(melody(AUDIO_NEARDUP_MELODIES[1][:3]), sample_rate=rate)
    clips[8] = clips[2]
    clips[9] = encode_wav_pcm16(melody(AUDIO_NEARDUP_MELODIES[3]), rate)
    clips[10] = ef(
        [v * 128 for v in melody(AUDIO_NEARDUP_MELODIES[4])],
        sample_rate=rate,
        bits=24,
    )
    clips[11] = ef(
        melody(
            tuple(f * 1.059463 for f in AUDIO_NEARDUP_MELODIES[5])
        ),
        sample_rate=rate,
    )
    clips[12] = ef(
        _lcg_dither(melody(AUDIO_NEARDUP_MELODIES[1])),
        sample_rate=rate,
    )
    sets = {}
    for i, p in clips.items():
        s, r = _decode_audio(p)
        sets[i] = set(fingerprint_samples(s, r, n_bands=17))
    want = {}
    spurious = {}
    for a in range(13):
        for b in range(a + 1, 13):
            small = min(len(sets[a]), len(sets[b]))
            shared = len(sets[a] & sets[b])
            c = shared / small if small else 0.0
            if c >= 0.5:
                # the engine emits containment rounded 4dp
                want[(a, b)] = (shared, round(c, 4))
            else:
                spurious[(a, b)] = c
    assert got == want
    assert set(want) == {
        (0, 6), (1, 7), (2, 8), (3, 9), (4, 10), (1, 12), (7, 12),
    }
    exact = {k: c for k, (_, c) in want.items() if k[1] <= 10}
    assert all(c == 1.0 for c in exact.values())
    # the noisy positive survives at measured, pinned containments
    assert want[(1, 12)][1] == pytest.approx(10 / 12, abs=1e-4)
    assert want[(7, 12)][1] == pytest.approx(5 / 7, abs=1e-4)
    # the pitched negative: pairs with nothing, and its containment
    # against its own base is the corpus's tightest margin — the
    # adversarial bound on the threshold, pinned
    assert not any(11 in k for k in want)
    pitch_c = spurious[(5, 11)]
    assert pitch_c == max(spurious.values())
    assert 0.3 < pitch_c < 0.5
