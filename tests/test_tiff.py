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
    # JPEG-compressed TIFF refuses at decode: flip the tag value
    t = bytearray(make_tiff(8, 8, seed=1, mode="gray"))
    # find the compression entry (tag 259, II order) and set value 7
    for i in range(8, len(t) - 12):
        tag, typ = struct.unpack_from("<HH", t, i)
        if tag == 259 and typ == 3:
            struct.pack_into("<H", t, i + 8, 7)
            break
    with pytest.raises(NotImplementedError, match="compression 7"):
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
