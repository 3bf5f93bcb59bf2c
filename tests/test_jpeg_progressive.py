"""Progressive JPEG (spectral selection): the entropy layer is
lossless, so a progressive and a baseline encoding of the SAME
quantized coefficient grid must decode to IDENTICAL pixels — the
exact-equality oracle, across sizes (incl. MCU-pad shapes),
subsampling modes, and EOB-run-heavy content. Plus the documented
guards (successive approximation, wrong-decoder dispatch) and the
dedup integration story: progressive/baseline twins of one image
hash identically."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_2025_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
from cdc_2025_spark.multimodal.jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _image(w, h, seed):
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return np.stack(
        [
            (x * 13 + y * 17 + seed * 3) % 256,
            (x * 5 + y * 11 + seed * 2) % 256,
            (x * 7 + y * 3 + seed) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("dc_interleaved", [True, False])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize(
    ("w", "h"), [(8, 8), (16, 16), (24, 17), (25, 31), (40, 8)]
)
def test_progressive_equals_baseline_exactly(w, h, sub, dc_interleaved):
    """Both spec-valid DC scan forms: interleaved MCU order and one
    single-component scan per component walking its own ceil-dim grid
    (the T.81 B.2.3 path a marker-flipped fake can't exercise)."""
    rgb = _image(w, h, seed=w + h)
    base = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            rgb, subsampling=sub, dc_interleaved=dc_interleaved
        )
    )
    assert prog.shape == base.shape == (h, w, 3)
    assert np.array_equal(prog, base)


def test_progressive_dispatches_through_decode_jpeg():
    """decode_jpeg must route SOF2 to the progressive kernel instead
    of raising — the guarded stub this module closes."""
    rgb = _image(16, 16, seed=3)
    payload = encode_jpeg_progressive(rgb)
    assert payload[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in payload  # SOF2 frame
    out = decode_jpeg(payload)
    assert out.shape == (16, 16, 3)


def test_eobrun_heavy_content_roundtrips():
    """A constant image makes every block's AC band empty — the
    encoder must fold all of them into EOB runs (payload shrinks vs
    per-block EOBs) and the decoder must replay the run lengths."""
    rgb = np.full((48, 48, 3), 77, dtype=np.uint8)
    prog = encode_jpeg_progressive(rgb, subsampling="4:4:4")
    base = decode_jpeg(encode_jpeg(rgb, subsampling="4:4:4"))
    assert np.array_equal(decode_jpeg(prog), base)
    # constant image: decoded pixels are constant too
    assert len(np.unique(decode_jpeg(prog).reshape(-1, 3), axis=0)) == 1


def test_successive_approximation_raises():
    """Patch the first AC scan header's Ah/Al byte: the decoder must
    refuse bitplane refinement loudly instead of decoding wrongly."""
    rgb = _image(16, 16, seed=1)
    payload = bytearray(encode_jpeg_progressive(rgb))
    # single-component SOS: FF DA 00 08 01 cid tids Ss Se AhAl
    probe = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01])
    i = payload.index(probe)
    ahal_off = i + 9
    assert payload[ahal_off] == 0x00
    payload[ahal_off] = 0x01  # Al = 1
    with pytest.raises(NotImplementedError, match="successive"):
        decode_jpeg(bytes(payload))


def test_wrong_decoder_rejects_baseline():
    rgb = _image(8, 8, seed=0)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg_progressive(encode_jpeg(rgb))


def test_progressive_baseline_twins_share_ahash():
    """The dedup story: the same image shipped progressive and
    baseline decodes identically, so the perceptual hash pipeline
    collapses the pair — cross-CODING twins, the JPEG analogue of the
    BMP/PNG cross-container twins the pHash family already catches."""
    from cdc_2025_spark.multimodal.phash import ahash64_from_rgb

    rgb = _image(32, 32, seed=9)
    h_base = ahash64_from_rgb(decode_jpeg(encode_jpeg(rgb)))
    h_prog = ahash64_from_rgb(
        decode_jpeg(encode_jpeg_progressive(rgb))
    )
    assert h_base == h_prog
