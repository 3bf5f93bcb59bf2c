"""Microsoft ADPCM (WAVE format 2, multimodal/media.py): the
second classic 4-bit WAV codec — second-order prediction over the
seven published coefficient pairs with multiplicative delta
adaptation. Block-exact python-model pin (an independent decoder
written from the format tables), SNR/compression floors, stereo
interleave, fact-chunk truncation, and the fail-loud set."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from cdc_2025_spark.multimodal.media import (
    _MS_ADAPT,
    _MS_COEF1,
    _MS_COEF2,
    decode_wav,
    encode_wav_ms_adpcm,
)

RATE = 8000


def _tone(freq=440.0, n=3000, amp=9000):
    return [
        int(amp * math.sin(2 * math.pi * freq * i / RATE))
        for i in range(n)
    ]


def _model_decode(payload):
    """Independent reference decoder straight from the format
    tables — parses fmt/fact/data itself and never touches the
    library's decode path."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, fmt_body, data, fact = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)
    tag, nch, _sr, _br, balign, bits = struct.unpack_from(
        "<HHIIHH", fmt_body, 0
    )
    assert tag == 2 and bits == 4
    spb, ncoef = struct.unpack_from("<HH", fmt_body, 18)
    c1, c2 = [], []
    for i in range(ncoef):
        a, b = struct.unpack_from("<hh", fmt_body, 22 + 4 * i)
        c1.append(a)
        c2.append(b)
    chans = [[] for _ in range(nch)]
    for b0 in range(0, len(data) - 7 * nch + 1, balign):
        blk = data[b0 : b0 + balign]
        pr = list(blk[:nch])
        off = nch
        dl = [
            struct.unpack_from("<h", blk, off + 2 * c)[0]
            for c in range(nch)
        ]
        off += 2 * nch
        s1 = [
            struct.unpack_from("<h", blk, off + 2 * c)[0]
            for c in range(nch)
        ]
        off += 2 * nch
        s2 = [
            struct.unpack_from("<h", blk, off + 2 * c)[0]
            for c in range(nch)
        ]
        off += 2 * nch
        for c in range(nch):
            chans[c] += [s2[c], s1[c]]
        done, ch = 2, 0
        for byte in blk[off:]:
            for n in (byte >> 4, byte & 0xF):
                if done >= spb and ch == 0:
                    break
                c = ch
                sn = n - 16 if n >= 8 else n
                pred = (s1[c] * c1[pr[c]] + s2[c] * c2[pr[c]]) >> 8
                rec = max(-32768, min(32767, pred + sn * dl[c]))
                chans[c].append(rec)
                dl[c] = max(16, (_MS_ADAPT[n] * dl[c]) >> 8)
                s2[c], s1[c] = s1[c], rec
                ch += 1
                if ch == nch:
                    ch, done = 0, done + 1
    if fact is not None:
        chans = [c[:fact] for c in chans]
    return chans


def test_block_exact_python_model_pin():
    """The library decode equals an independent python model of the
    published format, sample for sample — mono and stereo, across
    block boundaries and the padded final block."""
    xs = _tone(440, n=1234)
    p = encode_wav_ms_adpcm(xs, RATE, block_samples=500)
    got, sr = decode_wav(p)
    model = _model_decode(p)
    assert sr == RATE
    assert np.allclose(
        got, np.asarray(model[0], float) / 32768.0
    )
    l, r = _tone(440, n=777), _tone(660, n=777)
    p2 = encode_wav_ms_adpcm(l, RATE, block_samples=100, right=r)
    got2, _ = decode_wav(p2)
    m = _model_decode(p2)
    exp = (
        np.asarray(m[0], float) + np.asarray(m[1], float)
    ) / (2 * 32768.0)
    assert np.allclose(got2, exp)
    assert len(m[0]) == len(m[1]) == 777


def test_snr_and_compression():
    """>25 dB SNR at ~4:1 on a voice-band tone — the codec must
    actually work, not just frame bytes; the 7-pair predictor
    search must beat the always-pair-0 encode on AR(2) content."""
    xs = _tone(440)
    p = encode_wav_ms_adpcm(xs, RATE)
    got, _ = decode_wav(p)
    sig = np.asarray(xs, float) / 32768.0
    err = got - sig
    snr = 10 * math.log10(
        float((sig**2).mean()) / max(float((err**2).mean()), 1e-20)
    )
    assert snr > 25, snr
    assert len(p) < 0.35 * (2 * len(xs))


def test_lengths_and_edges():
    for n in (2, 3, 499, 500, 501, 1001):
        got, _ = decode_wav(
            encode_wav_ms_adpcm(_tone(300, n=n), RATE)
        )
        assert len(got) == n, n
    for xs in ([0] * 100, [32767, -32768] * 50):
        got, _ = decode_wav(encode_wav_ms_adpcm(xs, RATE))
        assert len(got) == len(xs)


def test_refusals_fail_loud():
    xs = _tone(440, n=100)
    with pytest.raises(ValueError, match="even"):
        encode_wav_ms_adpcm(xs, RATE, block_samples=7)
    with pytest.raises(ValueError, match="at least 2"):
        encode_wav_ms_adpcm([5], RATE)
    with pytest.raises(ValueError, match="equal length"):
        encode_wav_ms_adpcm(xs, RATE, right=xs[:-1])
    p = bytearray(encode_wav_ms_adpcm(xs, RATE))
    # wrong bit width refuses
    t = bytearray(p)
    struct.pack_into("<H", t, 12 + 8 + 14, 8)
    with pytest.raises(NotImplementedError, match="4-bit"):
        decode_wav(bytes(t))
    # >2 channels refuses
    t = bytearray(p)
    struct.pack_into("<H", t, 12 + 8 + 2, 3)
    with pytest.raises(NotImplementedError, match="mono/stereo"):
        decode_wav(bytes(t))
    # out-of-range predictor index fails loud (corrupt block)
    t = bytearray(p)
    # data chunk starts after fmt(8+50) + fact(12) at offset 12
    data_at = bytes(t).find(b"data") + 8
    t[data_at] = 9
    with pytest.raises(ValueError, match="predictor index"):
        decode_wav(bytes(t))
    # standard coefficient table is the published one
    assert _MS_COEF1 == [256, 512, 0, 192, 240, 460, 392]
    assert _MS_COEF2 == [0, -256, 0, 64, 0, -208, -232]


def test_chunk_kernel_routes_ms_adpcm(spark):
    """Lake integration: the audio chunk-feature kernel accepts
    format-2 payloads through decode_wav and produces per-chunk
    features matching the PCM twin within the codec's error."""
    from cdc_2025_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_wav_pcm16,
        extract_audio_chunk_features,
    )

    xs = _tone(330, n=RATE)  # 1 s
    rows = [
        (0, "audio", bytearray(encode_wav_pcm16(xs, RATE)),
         (0, 0, 1000, "pcm_s16le")),
        (1, "audio", bytearray(encode_wav_ms_adpcm(xs, RATE)),
         (0, 0, 1000, "ms_adpcm")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        (r["media_id"], r["chunk_idx"]): (r["rms"], r["peak"])
        for r in extract_audio_chunk_features(
            df, chunk_ms=500
        ).collect()
    }
    for k in feats:
        if k[0] == 1:
            rms_pcm, _ = feats[(0, k[1])]
            rms_adp, _ = feats[k]
            assert rms_adp == pytest.approx(rms_pcm, rel=0.05)
