"""Lossless JPEG (SOF3, multimodal/jpeg_lossless.py): losslessness
is structural, so every round-trip is BIT-EXACT across the full
predictor x precision x shape grid — the still-image twin of the
FLAC exact-equality oracle — plus the point-transform semantics,
the SSSS=16 modulo-difference edge, the decode_jpeg dispatch, and
the fail-loud refusal set."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_2025_spark.multimodal.jpeg_lossless import (
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)


@pytest.mark.parametrize("precision", [2, 8, 12, 16])
@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_bit_exact_full_range(precision, predictor):
    """Full-range random samples (the adversarial content for a
    predictive coder: every difference magnitude occurs, including
    the modulo wrap) round-trip bit-exactly at every predictor,
    including degenerate 1x1 / single-row / single-column shapes
    where the boundary rules are the whole recurrence."""
    rng = np.random.default_rng(precision * 10 + predictor)
    hi = 1 << precision
    for shape in [(13, 17), (1, 9), (9, 1), (1, 1), (24, 24)]:
        img = rng.integers(0, hi, shape, dtype=np.int64)
        out, prec, pt = decode_jpeg_lossless(
            encode_jpeg_lossless(
                img, precision=precision, predictor=predictor
            )
        )
        assert prec == precision and pt == 0
        assert np.array_equal(
            out[:, :, 0].astype(np.int64), img
        ), shape


def test_multicomponent_and_ssss16_edge():
    rng = np.random.default_rng(5)
    for nc in (2, 3, 4):
        img = rng.integers(0, 256, (11, 13, nc), dtype=np.int64)
        out, prec, pt = decode_jpeg_lossless(
            encode_jpeg_lossless(img, predictor=4)
        )
        assert np.array_equal(out.astype(np.int64), img)
    # first sample 0 at P=16 differs from the 2^15 default by
    # exactly -32768 = 32768 mod 2^16: the SSSS=16 no-bits code
    img = np.array([[0, 65535], [32768, 1]], dtype=np.int64)
    out, _, _ = decode_jpeg_lossless(
        encode_jpeg_lossless(img, precision=16)
    )
    assert np.array_equal(out[:, :, 0].astype(np.int64), img)


def test_point_transform_semantics():
    """Pt (Al) drops the low bits before prediction; the decoder
    scales back by 2^Pt — reconstruction is (x >> Pt) << Pt."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 4096, (15, 11), dtype=np.int64)
    out, prec, pt = decode_jpeg_lossless(
        encode_jpeg_lossless(
            img, precision=12, predictor=7, point_transform=3
        )
    )
    assert prec == 12 and pt == 3
    assert np.array_equal(
        out[:, :, 0].astype(np.int64), (img >> 3) << 3
    )


def test_prediction_compresses_smooth_content():
    smooth = (
        100
        + 40 * np.sin(np.arange(64) / 6.0)[None, :]
        + 30 * np.cos(np.arange(64) / 5.0)[:, None]
    ).astype(np.int64)
    raw = smooth.size  # 1 byte/sample at 8-bit
    n4 = len(encode_jpeg_lossless(smooth, predictor=4))
    assert n4 < 0.5 * raw, n4
    # and the 2D predictor must beat pure-left on 2D structure
    n1 = len(encode_jpeg_lossless(smooth, predictor=1))
    assert n4 < n1


def test_decode_jpeg_dispatch():
    """decode_jpeg routes SOF3 payloads to this kernel: 8-bit gray
    comes back pixel-EXACT on the RGB contract, 12-bit maps through
    the (v + half) >> shift rule, components without an RGB meaning
    refuse with a pointer to the native API."""
    from cdc_2025_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, (17, 23), dtype=np.int64)
    out = decode_jpeg(encode_jpeg_lossless(g))
    assert out.dtype == np.uint8 and out.shape == (17, 23, 3)
    assert np.array_equal(out[:, :, 0].astype(np.int64), g)
    assert (out[:, :, 0] == out[:, :, 2]).all()
    g12 = rng.integers(0, 4096, (9, 7), dtype=np.int64)
    out = decode_jpeg(encode_jpeg_lossless(g12, precision=12))
    assert np.array_equal(
        out[:, :, 0].astype(np.int64),
        np.minimum((g12 + 8) >> 4, 255),
    )
    c = rng.integers(0, 256, (11, 13, 3), dtype=np.int64)
    out = decode_jpeg(encode_jpeg_lossless(c, predictor=5))
    assert np.array_equal(out.astype(np.int64), c)
    with pytest.raises(NotImplementedError,
                       match="decode_jpeg_lossless"):
        decode_jpeg(
            encode_jpeg_lossless(
                rng.integers(0, 256, (5, 5, 2), dtype=np.int64)
            )
        )


def test_refusals_fail_loud():
    import struct

    g = np.zeros((4, 4), dtype=np.int64)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(g, precision=17)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(g, predictor=8)
    with pytest.raises(ValueError, match="point_transform"):
        encode_jpeg_lossless(g, precision=8, point_transform=8)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless(g + 300, precision=8)
    ok = encode_jpeg_lossless(
        np.arange(16, dtype=np.int64).reshape(4, 4)
    )
    # truncated entropy data fails loud
    with pytest.raises(ValueError):
        decode_jpeg_lossless(ok[:-6])
    # a DRI segment refuses
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 8)
    with_dri = ok[:2] + dri + ok[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_lossless(with_dri)
    # non-1:1 sampling refuses: patch the SOF3 sampling byte
    t = bytearray(ok)
    sof_at = t.find(b"\xff\xc3")
    # SOF3 body: len(2) P(1) h(2) w(2) nc(1) then (id, samp, tq)
    t[sof_at + 2 + 2 + 5 + 1 + 1] = 0x22
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg_lossless(bytes(t))
