"""TIFF codec (multimodal/tiff.py): PackBits round-trips, pixel-exact
decodes against the shared pattern formulas through BOTH byte orders,
both compressions, and multi-strip layouts, cross-container twins
(gray==PNG, RGB==BMP, palette==GIF), WhiteIsZero inversion, fail-loud
refusals, and the lake integration through the image feature kernel."""

from __future__ import annotations

import random

import numpy as np
import pytest

from cdc_2025_spark.multimodal.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
    make_tiff,
)


def test_packbits_roundtrip_mixed_content():
    rng = random.Random(3)
    for _ in range(30):
        data = bytes(
            rng.choice([rng.randrange(256), 7])
            for _ in range(rng.randrange(1, 3000))
        )
        assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_packbits_compresses_runs():
    flat = bytes([42]) * 4000
    assert len(_packbits_encode(flat)) < 100


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", [1, 32773])
@pytest.mark.parametrize("rps", [None, 5])
def test_cross_container_twins(big_endian, compression, rps):
    """gray TIFF == gray PNG, RGB TIFF == BMP, palette TIFF == GIF —
    pixel-exact through every byte-order x compression x strip
    layout combination."""
    from cdc_2025_spark.multimodal.gif import make_gif, decode_gif
    from cdc_2025_spark.multimodal.media import (
        decode_bmp,
        decode_png,
        make_bmp,
        make_png_variant,
    )

    kw = dict(
        compression=compression, rows_per_strip=rps, big_endian=big_endian
    )
    t = decode_tiff(make_tiff(37, 23, seed=5, mode="gray", **kw))
    p = decode_png(make_png_variant(37, 23, seed=5, color_type=0, depth=8))
    assert (t == p).all()
    t = decode_tiff(make_tiff(37, 23, seed=5, mode="rgb", **kw))
    b = decode_bmp(make_bmp(37, 23, seed=5))
    assert (t == b).all()
    t = decode_tiff(make_tiff(37, 23, seed=5, mode="palette", **kw))
    g = decode_gif(make_gif(37, 23, seed=5))["frames"][0]
    assert (t == g).all()


def test_white_is_zero_inverts():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = decode_tiff(encode_tiff(gray=g, white_is_zero=True))
    assert (t[:, :, 0] == g).all() and (t[:, :, 1] == g).all()


def test_refusals_fail_loud():
    import struct

    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PNG....")
    with pytest.raises(ValueError, match="exactly one"):
        encode_tiff(
            gray=np.zeros((2, 2), np.uint8),
            rgb=np.zeros((2, 2, 3), np.uint8),
        )
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(gray=np.zeros((2, 2), np.uint8), compression=6)
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(
            gray=np.zeros((2, 2), np.uint8),
            compression=8,
            predictor=3,
        )
    with pytest.raises(ValueError, match="pairs with"):
        encode_tiff(gray=np.zeros((2, 2), np.uint8), predictor=2)
    # unknown compression refuses at decode: flip the tag value
    # (7 decodes since round 15 — use JBIG, 34661)
    t = bytearray(make_tiff(8, 8, seed=1, mode="gray"))
    # find the compression entry (tag 259, II order)
    for i in range(8, len(t) - 12):
        tag, typ = struct.unpack_from("<HH", t, i)
        if tag == 259 and typ == 3:
            struct.pack_into("<H", t, i + 8, 34661)
            break
    with pytest.raises(NotImplementedError, match="compression 34661"):
        decode_tiff(bytes(t))
    # truncated strip fails loud
    whole = make_tiff(16, 16, seed=2, mode="rgb")
    with pytest.raises(ValueError, match="strip"):
        decode_tiff(whole[:-40])


@pytest.mark.parametrize("compression", [5, 8])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("big_endian", [False, True])
def test_lzw_deflate_roundtrip_all_modes(
    compression, predictor, big_endian
):
    """LZW (MSB-first, EarlyChange) and Deflate strips, with and
    without the horizontal-differencing predictor, both byte orders,
    decode pixel-identical to their uncompressed twins in every
    photometric mode and in multi-strip layout."""
    for mode in ("gray", "rgb", "palette"):
        base = decode_tiff(make_tiff(37, 23, seed=5, mode=mode))
        for rps in (None, 7):
            got = decode_tiff(
                make_tiff(
                    37,
                    23,
                    seed=5,
                    mode=mode,
                    compression=compression,
                    rows_per_strip=rps,
                    big_endian=big_endian,
                    predictor=predictor,
                )
            )
            assert np.array_equal(got, base), (mode, rps)


def test_tiff_lzw_kernel_exact_across_width_bumps():
    """The raw TIFF-LZW pair round-trips byte streams that cross
    every code-width boundary (9->10->11->12) and the table-reset
    mark — the EarlyChange alignment this kernel exists for — and
    actually compresses structured rows."""
    import random

    from cdc_2025_spark.multimodal.tiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
    )

    rng = random.Random(7)
    incompressible = bytes(rng.randrange(256) for _ in range(60000))
    assert (
        _lzw_decode_tiff(
            _lzw_encode_tiff(incompressible), len(incompressible)
        )
        == incompressible
    )
    runs = bytes([1, 2, 3, 4] * 30000)  # deep table + reset
    assert _lzw_decode_tiff(_lzw_encode_tiff(runs), len(runs)) == runs
    g = np.fromfunction(
        lambda y, x: (x * 13 + y * 17) % 256, (64, 64)
    ).astype(np.uint8)
    plain = encode_tiff(gray=g)
    lzw = encode_tiff(gray=g, compression=5, predictor=2)
    assert len(lzw) < len(plain) / 4


def test_predictor2_requires_declared_tag():
    """A predictor-2 payload decoded while IGNORING the tag would be
    garbage — pin that the tag is honored by comparing against the
    no-predictor encode of the same pixels (different bytes, equal
    decode)."""
    g = np.fromfunction(
        lambda y, x: (x * 3 + y * 7) % 256, (11, 19)
    ).astype(np.uint8)
    a = encode_tiff(gray=g, compression=8)
    b = encode_tiff(gray=g, compression=8, predictor=2)
    assert a != b
    assert np.array_equal(decode_tiff(a), decode_tiff(b))


def test_image_feature_kernel_routes_tiff(spark):
    """Lake integration: the image feature kernel dispatches TIFF
    payloads (both byte orders) to the real decoder, and the TIFF
    twin of a BMP corpus yields IDENTICAL features."""
    from cdc_2025_spark.multimodal.media import (
        extract_image_features,
        make_bmp,
    )

    schema = "media_id long, kind string, payload binary"
    rows_tiff = [
        (
            i,
            "image",
            bytearray(
                make_tiff(
                    24 + i,
                    16 + i,
                    seed=i,
                    mode="rgb",
                    compression=32773 if i % 2 else 1,
                    big_endian=bool(i % 2),
                )
            ),
        )
        for i in range(4)
    ]
    rows_bmp = [
        (i, "image", bytearray(make_bmp(24 + i, 16 + i, seed=i)))
        for i in range(4)
    ]
    ft = {
        r["media_id"]: r["features"]
        for r in extract_image_features(
            spark.createDataFrame(rows_tiff, schema)
        ).collect()
    }
    fb = {
        r["media_id"]: r["features"]
        for r in extract_image_features(
            spark.createDataFrame(rows_bmp, schema)
        ).collect()
    }
    assert set(ft) == set(fb) == {0, 1, 2, 3}
    for k in ft:
        assert ft[k] == pytest.approx(fb[k], abs=1e-12), k


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_16bit_x257_twin_decodes_identical(compression, big_endian):
    """A 16-bit TIFF built by x257-widening an 8-bit image decodes
    pixel-identical to the 8-bit original (65535 = 257 * 255, the
    PNG 16-bit twin law), for gray and RGB, every compression, both
    byte orders."""
    g8 = np.fromfunction(
        lambda y, x: (x * 13 + y * 17) % 256, (21, 33)
    ).astype(np.uint16)
    a = decode_tiff(
        encode_tiff(gray=g8.astype(np.uint8), compression=compression,
                    big_endian=big_endian)
    )
    b = decode_tiff(
        encode_tiff(gray=g8 * 257, bits=16, compression=compression,
                    big_endian=big_endian)
    )
    assert np.array_equal(a, b)
    rgb8 = np.stack(
        [(g8 * k) % 256 for k in (1, 5, 7)], axis=2
    ).astype(np.uint16)
    a = decode_tiff(
        encode_tiff(rgb=rgb8.astype(np.uint8),
                    compression=compression, big_endian=big_endian)
    )
    b = decode_tiff(
        encode_tiff(rgb=rgb8 * 257, bits=16,
                    compression=compression, big_endian=big_endian)
    )
    assert np.array_equal(a, b)


@pytest.mark.parametrize("bits", [1, 2, 4])
@pytest.mark.parametrize("compression", [1, 32773, 5])
def test_subbyte_gray_scaling_and_padding(bits, compression):
    """1/2/4-bit grayscale: MSB-first packing with per-row byte
    padding round-trips through decode at the exact 255/(2^d - 1)
    display scaling — at an ODD width that forces pad bits — and
    WhiteIsZero inverts in the depth domain."""
    full = (1 << bits) - 1
    w, h = 13, 7  # odd width: every row carries pad bits
    plane = np.fromfunction(
        lambda y, x: (x + y) % (full + 1), (h, w)
    ).astype(np.uint8)
    got = decode_tiff(
        encode_tiff(gray=plane, bits=bits, compression=compression)
    )
    scale = 255 // full
    want = np.repeat(
        (plane * scale)[:, :, None], 3, axis=2
    ).astype(np.uint8)
    assert np.array_equal(got, want)
    # WhiteIsZero is a STORAGE convention: the encoder stores
    # (max - v), the decoder re-inverts — display output identical
    inv = decode_tiff(
        encode_tiff(gray=plane, bits=bits, compression=compression,
                    white_is_zero=True)
    )
    assert np.array_equal(inv, want)


def test_bilevel_fax_style_checkerboard():
    """The classic scanned-document shape: 1-bit checkerboard,
    PackBits, multi-strip — decodes to exact 0/255 pixels."""
    w, h = 40, 16
    board = np.fromfunction(
        lambda y, x: ((x // 4 + y // 4) % 2), (h, w)
    ).astype(np.uint8)
    got = decode_tiff(
        encode_tiff(
            gray=board, bits=1, compression=32773, rows_per_strip=5
        )
    )
    assert set(np.unique(got)) <= {0, 255}
    assert np.array_equal(got[:, :, 0], board * 255)


def test_4bit_palette_twin_of_8bit_palette():
    """4-bit palette indices decode identical to the 8-bit palette
    encode of the same indices (and thus to the GIF/PNG twins the
    8-bit form is already pinned against)."""
    plte = [
        ((i * 16 + 3) % 256, (i * 31 + 7) % 256, (i * 5 + 11) % 256)
        for i in range(16)
    ]
    idx = np.fromfunction(
        lambda y, x: (x + y + 5) % 16, (11, 19)
    ).astype(np.uint8)
    a = decode_tiff(encode_tiff(palette=plte, indices=idx))
    b = decode_tiff(encode_tiff(palette=plte, indices=idx, bits=4))
    assert np.array_equal(a, b)


def test_depth_refusals():
    g = np.zeros((2, 2), np.uint8)
    with pytest.raises(ValueError, match="bits must be"):
        encode_tiff(gray=g, bits=12)
    with pytest.raises(ValueError, match="8-bit samples only"):
        encode_tiff(gray=g, bits=16, compression=5, predictor=2)
    with pytest.raises(ValueError, match="at most 8-bit"):
        encode_tiff(palette=[(0, 0, 0), (1, 1, 1)],
                    indices=g, bits=16)
    with pytest.raises(ValueError, match="8/16-bit"):
        encode_tiff(rgb=np.zeros((2, 2, 3), np.uint8), bits=4)
    with pytest.raises(ValueError, match="out of range"):
        encode_tiff(gray=np.full((2, 2), 9, np.uint8), bits=2)


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("bits", [1, 4, 8, 16])
def test_tiled_layout_decodes_identical_to_strips(compression, bits):
    """The TILED layout (tags 322-325, zero-padded edge tiles)
    decodes pixel-identical to the strip encode of the same image —
    at a tile size that does NOT divide the image, every depth,
    every compression."""
    full = (1 << bits) - 1 if bits < 8 else 255
    g = np.fromfunction(
        lambda y, x: (x * 3 + y * 7) % (full + 1), (21, 29)
    ).astype(np.uint16 if bits == 16 else np.uint8)
    if bits == 16:
        g = g * 257
    a = decode_tiff(encode_tiff(gray=g, bits=bits,
                                compression=compression))
    b = decode_tiff(
        encode_tiff(gray=g, bits=bits, compression=compression,
                    tile_size=(8, 6))
    )
    assert np.array_equal(a, b)


def test_tiled_rgb_with_predictor():
    rgb = np.fromfunction(
        lambda y, x, c: (x * 13 + y * 17 + c * 31) % 256, (19, 23, 3)
    ).astype(np.uint8)
    a = decode_tiff(encode_tiff(rgb=rgb))
    b = decode_tiff(
        encode_tiff(rgb=rgb, compression=5, predictor=2,
                    tile_size=(16, 16))
    )
    assert np.array_equal(a, b)
    assert np.array_equal(a, rgb)


@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
@pytest.mark.parametrize("bits", [8, 16])
def test_planar2_decodes_identical_to_chunky(compression, bits):
    """PlanarConfiguration 2 (one strip sequence per sample) decodes
    pixel-identical to the chunky encode — multi-strip, both
    depths, every compression, both byte orders."""
    rgb = np.fromfunction(
        lambda y, x, c: (x * 5 + y * 11 + c * 77) % 256, (17, 13, 3)
    ).astype(np.uint16 if bits == 16 else np.uint8)
    if bits == 16:
        rgb = rgb * 257
    for be in (False, True):
        a = decode_tiff(
            encode_tiff(rgb=rgb, bits=bits, compression=compression,
                        big_endian=be)
        )
        b = decode_tiff(
            encode_tiff(rgb=rgb, bits=bits, compression=compression,
                        big_endian=be, planar=2, rows_per_strip=5)
        )
        assert np.array_equal(a, b), (compression, bits, be)


def test_tile_planar_validation():
    g = np.zeros((4, 4), np.uint8)
    rgb = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="not both"):
        encode_tiff(gray=g, tile_size=(2, 2), rows_per_strip=2)
    with pytest.raises(ValueError, match="tiled \\+ planar"):
        encode_tiff(rgb=rgb, tile_size=(2, 2), planar=2)
    with pytest.raises(ValueError, match="multi-sample"):
        encode_tiff(gray=g, planar=2)
    with pytest.raises(ValueError, match="positive"):
        encode_tiff(gray=g, tile_size=(0, 2))
    # decode-side geometry checks fail loud on a truncated tile list
    import struct

    t = bytearray(
        encode_tiff(gray=np.zeros((20, 20), np.uint8),
                    tile_size=(8, 8))
    )
    # shrink TileWidth 8 -> 4 so geometry expects more tiles
    for i in range(8, len(t) - 12):
        tag, typ = struct.unpack_from("<HH", t, i)
        if tag == 322 and typ == 4:
            struct.pack_into("<I", t, i + 8, 4)
            break
    with pytest.raises(ValueError, match="geometry"):
        decode_tiff(bytes(t))


@pytest.mark.parametrize("compression", [2, 3, 4])
def test_tiled_ccitt_decodes_identical_to_strips(compression):
    """Tiled CCITT (round 15): each tile is an independent fax
    bitstream at TILE geometry with its own all-white reference —
    MH/G3/G4 tile layouts decode pixel-identical to the strip twin
    at a tile size that does NOT divide the image, including a
    tile narrower than a byte-row multiple."""
    g = np.full((45, 75), 1, np.uint8)
    for r in range(3, 45, 7):
        g[r, 2:70] = 0
    g[:, 25] = 0
    g[20:24, :] = 0
    strip = decode_tiff(
        encode_tiff(gray=g, bits=1, compression=compression)
    )
    for ts in [(32, 16), (17, 23), (80, 64)]:
        tiled = decode_tiff(
            encode_tiff(gray=g, bits=1, compression=compression,
                        tile_size=ts)
        )
        assert np.array_equal(strip, tiled), (compression, ts)
    if compression == 3:
        two_d = decode_tiff(
            encode_tiff(gray=g, bits=1, compression=3,
                        tile_size=(17, 23), t4_two_d=True)
        )
        assert np.array_equal(strip, two_d)


def _jpeg_ref(block):
    from cdc_2025_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    return decode_jpeg(
        encode_jpeg(block, subsampling="4:4:4", quality=88)
    )


def test_jpeg_in_tiff_strip_parity():
    """New-style JPEG-in-TIFF (compression 7): each strip is an
    independent JPEG stream — the decoded grid equals decode_jpeg
    of the per-strip encodes, single- and multi-strip."""
    rng = np.random.default_rng(3)
    rgb = (
        np.fromfunction(
            lambda y, x, c: (x * 5 + y * 9 + c * 40) % 256,
            (37, 53, 3),
        )
        + rng.integers(0, 30, (37, 53, 3))
    ).astype(np.uint8)
    one = decode_tiff(encode_tiff(rgb=rgb, compression=7))
    assert np.array_equal(one, _jpeg_ref(rgb))
    multi = decode_tiff(
        encode_tiff(rgb=rgb, compression=7, rows_per_strip=10)
    )
    exp = np.vstack(
        [_jpeg_ref(rgb[y : y + 10]) for y in range(0, 37, 10)]
    )
    assert np.array_equal(multi, exp)


def test_jpeg_in_tiff_jpegtables_and_tiles():
    """The abbreviated JPEGTables (tag 347) layout decodes
    identical to inline tables and is smaller; the tiled layout
    assembles per-tile JPEG decodes with zero-padded edge tiles
    cropped away."""
    rng = np.random.default_rng(5)
    rgb = (
        np.fromfunction(
            lambda y, x, c: (x * 7 + y * 3 + c * 55) % 256,
            (37, 53, 3),
        )
        + rng.integers(0, 25, (37, 53, 3))
    ).astype(np.uint8)
    inline = encode_tiff(rgb=rgb, compression=7, rows_per_strip=10)
    hoisted = encode_tiff(
        rgb=rgb, compression=7, rows_per_strip=10, jpeg_tables=True
    )
    assert len(hoisted) < len(inline)
    assert np.array_equal(decode_tiff(hoisted), decode_tiff(inline))

    tiled = decode_tiff(
        encode_tiff(rgb=rgb, compression=7, tile_size=(16, 16))
    )
    pad = np.zeros((48, 64, 3), np.uint8)
    pad[:37, :53] = rgb
    exp = np.zeros((48, 64, 3), np.uint8)
    for ty in range(3):
        for tx in range(4):
            blk = pad[
                ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16
            ]
            exp[
                ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16
            ] = _jpeg_ref(blk)
    assert np.array_equal(tiled, exp[:37, :53])


def test_jpeg_in_tiff_gray_and_refusals():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (29, 31)).astype(np.uint8)
    for wiz in (False, True):
        out = decode_tiff(
            encode_tiff(gray=g, compression=7, white_is_zero=wiz)
        )
        assert (out[:, :, 0] == out[:, :, 1]).all()
        err = np.abs(
            out[:, :, 0].astype(int) - g.astype(int)
        ).mean()
        assert err < 6.0, (wiz, err)
    with pytest.raises(ValueError, match="8-bit chunky"):
        encode_tiff(gray=g, compression=7, bits=4)
    with pytest.raises(ValueError, match="8-bit chunky"):
        encode_tiff(
            palette=[(0, 0, 0), (9, 9, 9)],
            indices=np.zeros((4, 4), np.uint8),
            compression=7,
        )
    with pytest.raises(ValueError, match="compression 7 only"):
        encode_tiff(gray=g, jpeg_tables=True)
    # old-style JPEG (6) keeps refusing loudly
    import struct

    t = bytearray(encode_tiff(gray=g, compression=7))
    for i in range(8, len(t) - 12):
        tag, typ = struct.unpack_from("<HH", t, i)
        if tag == 259 and typ == 3:
            struct.pack_into("<H", t, i + 8, 6)
            break
    with pytest.raises(NotImplementedError, match="old-style"):
        decode_tiff(bytes(t))


def test_float_tiff_samples_and_predictor3():
    """Float TIFF (SampleFormat 3, round 15): 32-bit IEEE samples
    across both byte orders, uncompressed/LZW/Deflate, strips and
    tiles, and the floating-point predictor 3 (TechNote 3 byte-
    plane shuffle + differencing). Display mapping is the linear
    [0, 1] clamp x 255, so a v/255-quantized image inverts
    EXACTLY; out-of-range values clamp; predictor 3 must earn its
    keep on smooth data."""
    rng = np.random.default_rng(6)
    gf = rng.random((23, 31)).astype(np.float32)
    rf = rng.random((19, 27, 3)).astype(np.float32)

    def disp(a):
        return np.round(
            np.clip(a.astype(np.float64), 0, 1) * 255
        ).astype(np.uint8)

    for be in (False, True):
        for comp, pred in [(1, 1), (5, 1), (8, 1), (5, 3), (8, 3)]:
            g = decode_tiff(
                encode_tiff(gray=gf, bits=32, sample_format=3,
                            compression=comp, predictor=pred,
                            big_endian=be, rows_per_strip=7)
            )
            assert np.array_equal(
                g, np.repeat(disp(gf)[:, :, None], 3, axis=2)
            ), ("gray", be, comp, pred)
            r = decode_tiff(
                encode_tiff(rgb=rf, bits=32, sample_format=3,
                            compression=comp, predictor=pred,
                            big_endian=be)
            )
            assert np.array_equal(r, disp(rf)), (be, comp, pred)
    tiled = decode_tiff(
        encode_tiff(rgb=rf, bits=32, sample_format=3, compression=8,
                    predictor=3, tile_size=(8, 8))
    )
    assert np.array_equal(tiled, disp(rf))
    g2 = gf.copy()
    g2[0, 0], g2[0, 1] = 2.5, -1.0
    out = decode_tiff(
        encode_tiff(gray=g2, bits=32, sample_format=3)
    )
    assert out[0, 0, 0] == 255 and out[0, 1, 0] == 0
    grad = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(
        64, 64
    )
    plain = len(encode_tiff(gray=grad, bits=32, sample_format=3,
                            compression=8))
    pred = len(encode_tiff(gray=grad, bits=32, sample_format=3,
                           compression=8, predictor=3))
    assert pred < 0.5 * plain, (plain, pred)
    q = rng.integers(0, 256, (11, 13)).astype(np.float32) / 255.0
    out = decode_tiff(
        encode_tiff(gray=q, bits=32, sample_format=3,
                    compression=5, predictor=3)
    )
    assert np.array_equal(
        out[:, :, 0].astype(np.float64),
        np.round(q.astype(np.float64) * 255),
    )
    # refusals: float needs bits=32+sample_format=3 together,
    # predictor 3 needs float under LZW/Deflate, signed ints refuse
    with pytest.raises(ValueError, match="sample_format=3"):
        encode_tiff(gray=gf, bits=32)
    with pytest.raises(ValueError, match="sample_format=3"):
        encode_tiff(gray=np.zeros((2, 2), np.uint8),
                    sample_format=3)
    with pytest.raises(ValueError, match="predictor 3"):
        encode_tiff(gray=gf, bits=32, sample_format=3,
                    compression=1, predictor=3)
    import struct

    t = bytearray(encode_tiff(gray=gf, bits=32, sample_format=3))
    for i in range(8, len(t) - 12):
        tag, typ = struct.unpack_from("<HH", t, i)
        if tag == 339 and typ == 3:
            struct.pack_into("<H", t, i + 8, 2)  # signed int
            break
    with pytest.raises(NotImplementedError, match="SampleFormat 2"):
        decode_tiff(bytes(t))
