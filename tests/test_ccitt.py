"""CCITT Group 4 (T.6 MMR) codec (multimodal/ccitt.py) and its TIFF
compression-4 integration: spec-pinned code words, exact round
trips on every structural shape (line art, noise, chained-makeup
long runs, zero-length white openings), and refusal edges."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_2025_spark.multimodal.ccitt import (
    _BLACK_TERM,
    _EOL,
    _MODE_H,
    _MODE_P,
    _MODE_V0,
    _MODE_VL,
    _MODE_VR,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    decode_g4,
    encode_g4,
)
from cdc_2025_spark.multimodal.tiff import decode_tiff, encode_tiff


def test_spec_pinned_code_words():
    """Spot values straight from the public T.4/T.6 tables — the
    guard against a transcription error that a shared-table round
    trip could never catch."""
    assert _WHITE_TERM[0] == "00110101"
    assert _WHITE_TERM[1] == "000111"
    assert _WHITE_TERM[63] == "00110100"
    assert _BLACK_TERM[0] == "0000110111"
    assert _BLACK_TERM[1] == "010"
    assert _BLACK_TERM[2] == "11"
    assert _BLACK_TERM[63] == "000001100111"
    assert _WHITE_MAKEUP[0] == "11011"  # run 64
    assert _WHITE_MAKEUP[26] == "010011011"  # run 1728
    assert _MODE_V0 == "1"
    assert _MODE_VR[1] == "011"
    assert _MODE_VL[1] == "010"
    assert _MODE_H == "001"
    assert _MODE_P == "0001"
    assert _EOL == "000000000001"


def _lcg_bits(h, w, seed=123456789):
    x = seed
    out = np.zeros((h, w), np.uint8)
    for i in range(h):
        for j in range(w):
            x = (1103515245 * x + 12345) % (1 << 31)
            out[i, j] = (x >> 7) & 1
    return out


@pytest.mark.parametrize(
    "name,arr",
    [
        ("all_white", np.zeros((10, 40), np.uint8)),
        ("all_black", np.ones((10, 40), np.uint8)),
        (
            "checker",
            (np.indices((12, 33)).sum(0) % 2).astype(np.uint8),
        ),
        ("rand_w1", _lcg_bits(23, 1)),
        ("rand_w7", _lcg_bits(23, 7)),
        ("rand_w64", _lcg_bits(23, 64)),
        ("rand_w129", _lcg_bits(23, 129)),
    ],
)
def test_g4_roundtrip_exact(name, arr):
    enc = encode_g4(arr)
    assert (decode_g4(enc, arr.shape[1], arr.shape[0]) == arr).all()


def test_g4_black_opening_and_vertical_tracking():
    """A line opening in black exercises the zero-length-white-run
    convention; a drifting vertical edge exercises every V code."""
    arr = np.zeros((16, 30), np.uint8)
    arr[:, 0] = 1  # every line opens black
    for i in range(16):
        c = 5 + [0, 1, 2, 3, 2, 1, 0, -1][i % 8]
        arr[i, c : c + 4] = 1
    enc = encode_g4(arr)
    assert (decode_g4(enc, 30, 16) == arr).all()


def test_g4_chained_makeup_long_runs():
    """Runs beyond 2623 need chained 2560-makeups (T.4 extension)."""
    arr = np.zeros((3, 6000), np.uint8)
    arr[1, 100:5900] = 1
    enc = encode_g4(arr)
    assert (decode_g4(enc, 6000, 3) == arr).all()
    # and the whole 3-line block fits in a handful of bytes
    assert len(enc) < 40


def test_g4_line_art_beats_raw():
    """The codec's reason to exist: document-like content comes out
    far smaller than the packed raster."""
    arr = np.zeros((64, 512), np.uint8)
    arr[10:12, :] = 1
    arr[:, 100:103] = 1
    arr[30:50, 200:210] = 1
    raw = 64 * ((512 + 7) // 8)
    assert len(encode_g4(arr)) < raw / 8


def test_g4_decode_refusals():
    arr = np.zeros((4, 16), np.uint8)
    arr[1, 3:9] = 1
    enc = encode_g4(arr)
    with pytest.raises(ValueError, match="truncated"):
        decode_g4(enc[:2], 16, 4)
    with pytest.raises(ValueError):
        decode_g4(enc, 16, 40)  # more lines than the stream holds
    with pytest.raises(ValueError, match="0/1"):
        encode_g4(np.full((2, 2), 7, np.uint8))
    with pytest.raises(ValueError, match="\\(h, w\\)"):
        encode_g4(np.zeros(5, np.uint8))


def _doc(h=40, w=73):
    doc = np.ones((h, w), np.uint8)  # 1 = white at depth 1
    for i in range(h):
        for j in range(w):
            if (i * 5 + j * 11) % 29 < 3:
                doc[i, j] = 0  # ink
    return doc


@pytest.mark.parametrize("rps", [None, 7])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_g4_decodes_identical_to_uncompressed(rps, big_endian):
    """compression 4 composes with strip layout and byte order, and
    the decoded pixels equal the uncompressed encoding's exactly."""
    doc = _doc()
    t4 = encode_tiff(
        gray=doc,
        bits=1,
        compression=4,
        white_is_zero=True,
        rows_per_strip=rps,
        big_endian=big_endian,
    )
    t1 = encode_tiff(
        gray=doc, bits=1, compression=1, white_is_zero=True
    )
    assert (decode_tiff(t4) == decode_tiff(t1)).all()


def test_tiff_g4_refusals():
    doc = _doc(8, 8)
    with pytest.raises(ValueError, match="1-bit gray"):
        encode_tiff(gray=doc, bits=4, compression=4)
    with pytest.raises(ValueError, match="1-bit gray"):
        encode_tiff(
            rgb=np.zeros((4, 4, 3), np.uint8), compression=4
        )
    # tiled G4 works since round 15 — pixel-identical to strips
    tiled = decode_tiff(
        encode_tiff(gray=doc, bits=1, compression=4,
                    tile_size=(8, 8))
    )
    strip = decode_tiff(encode_tiff(gray=doc, bits=1, compression=4))
    assert np.array_equal(tiled, strip)


def test_mh_roundtrip_and_tiff_compression2():
    """The 1D modified-Huffman flavor (TIFF compression 2):
    byte-aligned rows of alternating runs starting white; decodes
    pixel-identical to the uncompressed encoding."""
    from cdc_2025_spark.multimodal.ccitt import decode_mh, encode_mh

    for arr in (
        np.zeros((5, 33), np.uint8),
        np.ones((5, 33), np.uint8),
        (np.indices((7, 20)).sum(0) % 2).astype(np.uint8),
        _lcg_bits(11, 61, seed=99),
    ):
        enc = encode_mh(arr)
        assert (
            decode_mh(enc, arr.shape[1], arr.shape[0]) == arr
        ).all()
    # black opening = zero-length white run
    b = np.zeros((3, 9), np.uint8)
    b[:, 0] = 1
    assert (decode_mh(encode_mh(b), 9, 3) == b).all()
    doc = _doc()
    t2 = encode_tiff(
        gray=doc,
        bits=1,
        compression=2,
        white_is_zero=True,
        rows_per_strip=11,
    )
    t1 = encode_tiff(
        gray=doc, bits=1, compression=1, white_is_zero=True
    )
    assert (decode_tiff(t2) == decode_tiff(t1)).all()


def test_g4_corrupt_stream_never_stalls():
    """Adversarial bytes must raise, not loop: an all-VL1 stream
    (code '010' repeated) makes a1 <= a0 immediately, and an
    all-zero-run horizontal stream never advances — both are
    invalid-code or stall territory and must fail loud."""
    # '010' x many = 0b0100 1001 0010 0100 ... craft 8 bytes
    stalling_vertical = bytes([0b01001001, 0b00100100] * 4)
    with pytest.raises(ValueError):
        decode_g4(stalling_vertical, 16, 4)
    # horizontal mode '001' + white-0 '00110101' + black-0
    # '0000110111' repeated: zero-advance after the line opening
    bits = ("001" + "00110101" + "0000110111") * 8
    pad = (-len(bits)) % 8
    data = bytes(
        int((bits + "0" * pad)[i : i + 8], 2)
        for i in range(0, len(bits + "0" * pad), 8)
    )
    with pytest.raises(ValueError):
        decode_g4(data, 16, 4)


@pytest.mark.parametrize("two_d", [False, True])
@pytest.mark.parametrize(
    "name, arr",
    [
        ("all_white", np.zeros((10, 40), np.uint8)),
        ("all_black", np.ones((10, 40), np.uint8)),
        (
            "checker",
            (np.indices((12, 33)).sum(0) % 2).astype(np.uint8),
        ),
        ("rand_w1", _lcg_bits(23, 1)),
        ("rand_w7", _lcg_bits(23, 7)),
        ("rand_w64", _lcg_bits(23, 64)),
        ("rand_w129", _lcg_bits(23, 129)),
        ("rand_w2600", _lcg_bits(4, 2600)),  # extended makeups
    ],
)
def test_g3_roundtrip_exact(two_d, name, arr):
    from cdc_2025_spark.multimodal.ccitt import decode_g3, encode_g3

    enc = encode_g3(arr, two_d=two_d)
    got = decode_g3(enc, arr.shape[1], arr.shape[0], two_d=two_d)
    assert (got == arr).all()


def test_g3_k_parameter_roundtrips():
    from cdc_2025_spark.multimodal.ccitt import decode_g3, encode_g3

    arr = _lcg_bits(12, 50)
    for k in (1, 2, 4, 12):
        enc = encode_g3(arr, two_d=True, k=k)
        assert (decode_g3(enc, 50, 12, two_d=True) == arr).all()


def test_g3_fill_bits_before_eol_tolerated():
    """T4Options bit 2 writers pad zeros before each EOL so it lands
    byte-aligned; the decoder must absorb any number of leading
    zeros (they just extend the >= 11-zero run)."""
    from cdc_2025_spark.multimodal.ccitt import decode_g3, encode_g3

    arr = _lcg_bits(6, 31)
    enc = encode_g3(arr)
    # a leading zero byte acts as 8 fill bits before the first EOL
    assert (decode_g3(b"\x00" + enc, 31, 6) == arr).all()


def test_g3_decode_refusals():
    from cdc_2025_spark.multimodal.ccitt import decode_g3, encode_g3

    arr = np.zeros((4, 16), np.uint8)
    arr[1, 3:9] = 1
    enc = encode_g3(arr)
    with pytest.raises(ValueError, match="truncated"):
        decode_g3(enc[:1], 16, 4)
    with pytest.raises(ValueError):
        decode_g3(enc, 16, 40)  # more lines than the stream holds
    # a stream that opens with data instead of an EOL: flip the
    # leading EOL's terminating 1 into run data
    with pytest.raises(ValueError, match="EOL"):
        decode_g3(b"\xff" + enc, 16, 4)
    with pytest.raises(ValueError, match="0/1"):
        encode_g3(np.full((2, 2), 7, np.uint8))
    with pytest.raises(ValueError, match="k must be"):
        encode_g3(arr, two_d=True, k=0)


def test_g3_1d_flavor_has_no_tag_bits():
    """The 1D stream must not be decodable as 2D and vice versa on a
    line whose coding differs — the flavors are distinct bit
    layouts, so the T4Options dispatch in the TIFF reader matters."""
    from cdc_2025_spark.multimodal.ccitt import decode_g3, encode_g3

    arr = _lcg_bits(9, 40)
    enc1 = encode_g3(arr, two_d=False)
    enc2 = encode_g3(arr, two_d=True)
    assert enc1 != enc2


@pytest.mark.parametrize("two_d", [False, True])
@pytest.mark.parametrize("rps", [None, 7])
def test_tiff_g3_decodes_identical_to_uncompressed(two_d, rps):
    from cdc_2025_spark.multimodal.tiff import decode_tiff, encode_tiff

    doc = _doc()
    plain = decode_tiff(
        encode_tiff(gray=doc, bits=1, rows_per_strip=rps)
    )
    g3 = decode_tiff(
        encode_tiff(
            gray=doc,
            bits=1,
            compression=3,
            t4_two_d=two_d,
            rows_per_strip=rps,
        )
    )
    assert np.array_equal(np.asarray(plain), np.asarray(g3))


def test_tiff_g3_uncompressed_mode_refused():
    import struct

    from cdc_2025_spark.multimodal.tiff import decode_tiff, encode_tiff

    t = bytearray(encode_tiff(gray=_doc(), bits=1, compression=3))
    off = struct.unpack_from("<I", t, 4)[0]
    n = struct.unpack_from("<H", t, off)[0]
    for i in range(n):
        e = off + 2 + 12 * i
        if struct.unpack_from("<H", t, e)[0] == 292:
            struct.pack_into("<I", t, e + 8, 2)  # bit 1: uncompressed
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_tiff(bytes(t))
