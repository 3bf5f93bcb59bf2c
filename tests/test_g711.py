"""G.711 mu-law / A-law WAV support (multimodal/media.py): the ITU
segment expansion decodes formats 7/6, the encoders are exact
inverses on the code points, and the decode dispatch feeds the
shared audio pipeline."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cdc_2025_spark.multimodal.media import (
    _alaw_decode_np,
    _alaw_encode_np,
    _mulaw_decode_np,
    _mulaw_encode_np,
    decode_audio_payload,
    decode_wav,
    encode_wav_g711,
)


def test_alaw_all_codes_roundtrip():
    """encode(decode(c)) == c for every A-law code byte — G.711 is
    idempotent on its own code points."""
    codes = np.arange(256, dtype=np.uint8)
    lin = _alaw_decode_np(codes)
    assert int(np.abs(lin).max()) == 32256  # ITU A-law max
    assert (_alaw_encode_np(lin) == codes).all()


def test_mulaw_codes_roundtrip_with_negative_zero_collapse():
    """Every mu-law code round-trips except the ITU-documented
    degeneracy: 0x7F (negative zero) and 0xFF (positive zero) both
    decode to 0, and encode(0) is the positive-zero code 0xFF."""
    codes = np.arange(256, dtype=np.uint8)
    lin = _mulaw_decode_np(codes)
    assert int(np.abs(lin).max()) == 32124  # ITU mu-law max
    re = _mulaw_encode_np(lin)
    bad = [c for c in range(256) if re[c] != c]
    assert bad == [0x7F]
    assert lin[0x7F] == 0 and lin[0xFF] == 0 and re[0x7F] == 0xFF


@pytest.mark.parametrize("law,fmt", [("mulaw", 7), ("alaw", 6)])
def test_wav_g711_roundtrip_quantization(law, fmt):
    """A sine through encode_wav_g711 -> decode_wav comes back
    within G.711's segment quantization (<1% of full scale at these
    amplitudes), at the right rate, with the right format code."""
    import struct

    xs = [
        int(0.4 * 32767 * math.sin(2 * math.pi * 440 * i / 8000))
        for i in range(800)
    ]
    wav = encode_wav_g711(xs, 8000, law)
    (code,) = struct.unpack_from("<H", wav, 20)
    assert code == fmt
    s, rate = decode_wav(wav)
    assert rate == 8000 and len(s) == len(xs)
    err = max(abs(s[i] * 32768 - xs[i]) for i in range(len(xs)))
    assert err < 330  # largest G.711 step at this amplitude


def test_g711_feeds_shared_audio_dispatch():
    """decode_audio_payload handles a G.711 payload (so chunk
    features and fingerprints run on telephony corpora unchanged),
    and the decoded samples approximate the PCM original closely
    enough for the band-energy sign structure to survive."""
    from cdc_2025_spark.multimodal.afp import fingerprint_samples

    xs = []
    for f in (320.0, 640.0, 480.0):
        xs += [
            int(0.35 * 32767 * math.sin(2 * math.pi * f * i / 8000))
            for i in range(1600)
        ]
    s, rate = decode_audio_payload(encode_wav_g711(xs, 8000, "mulaw"))
    assert rate == 8000 and len(s) == len(xs)
    fp = fingerprint_samples(s, rate, n_bands=17)
    assert len(fp) > 5 and len(set(fp)) > 2


def test_g711_rejects_wrong_bits():
    import struct

    wav = bytearray(encode_wav_g711([0] * 100, 8000, "mulaw"))
    struct.pack_into("<H", wav, 34, 16)  # claim 16-bit G.711
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_wav(bytes(wav))


def test_encode_wav_g711_validates_law():
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711([0], 8000, "ulaw2")
