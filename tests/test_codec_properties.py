"""Property-based codec round-trips (hypothesis): random shapes and
random pixel/sample content through every encoder/decoder pair the
media kernels own — the generator-formula twins in the unit tests
pin known patterns; these pin ARBITRARY content, odd dimensions
(1xN, Nx1, padding-heavy widths), and cross-container identities."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

dims = st.tuples(
    st.integers(min_value=1, max_value=21),
    st.integers(min_value=1, max_value=13),
)


def _rand_rgb(w: int, h: int, seed: int):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@SETTINGS
@given(wh=dims, seed=st.integers(0, 2**31 - 1))
def test_png_16bit_roundtrip_of_x257(wh, seed):
    """Any 8-bit image widened x257 to 16-bit PNG decodes back to
    itself exactly (the scaling maps uint8 <-> uint16 losslessly)."""
    import struct
    import zlib

    from cdc_2025_spark.multimodal.media import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    w, h = wh
    rgb = _rand_rgb(w, h, seed)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        for x in range(w):
            for v in rgb[y, x]:
                raw += bytes((int(v), int(v)))  # v*257 big-endian
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), rgb)


@SETTINGS
@given(wh=dims, seed=st.integers(0, 2**31 - 1),
       top_down=st.booleans())
def test_bmp32_roundtrip_arbitrary_pixels(wh, seed, top_down):
    """encode arbitrary pixels as 32-bit BMP by hand and decode —
    alpha (random) must be dropped, both row orders."""
    import struct

    from cdc_2025_spark.multimodal.media import decode_bmp

    w, h = wh
    rgb = _rand_rgb(w, h, seed)
    rng = np.random.default_rng(seed + 1)
    alpha = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    row_bytes = w * 4
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + row_bytes * h, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 32, 0,
        row_bytes * h, 2835, 2835, 0, 0,
    )
    rows = []
    ys = range(h) if top_down else reversed(range(h))
    for y in ys:
        row = bytearray()
        for x in range(w):
            r, g, b = (int(v) for v in rgb[y, x])
            row += bytes((b, g, r, int(alpha[y, x])))
        rows.append(bytes(row))
    assert np.array_equal(
        decode_bmp(header + b"".join(rows)), rgb
    )


@SETTINGS
@given(wh=dims, seed=st.integers(0, 2**31 - 1))
def test_dib_avi_roundtrip_arbitrary_frames(wh, seed):
    """encode_dib_avi of arbitrary frames decodes back exactly
    (lossless), any shape incl. padding-heavy widths."""
    from cdc_2025_spark.multimodal.avi import (
        decode_avi_frame,
        encode_dib_avi,
        parse_avi,
    )

    w, h = wh
    frames = [_rand_rgb(w, h, seed + i) for i in range(3)]
    meta = parse_avi(encode_dib_avi(frames, fps=4))
    assert meta["n_frames"] == 3
    for i, fr in enumerate(frames):
        assert np.array_equal(decode_avi_frame(meta, i), fr), i


@SETTINGS
@given(
    n=st.integers(min_value=1, max_value=400),
    seed=st.integers(0, 2**31 - 1),
    bits=st.sampled_from([16, 24]),
    ext=st.booleans(),
)
def test_wav_pcm_roundtrip_bounds(n, seed, bits, ext):
    """Arbitrary-amplitude sines at any length survive the PCM
    round-trip within one quantization step (and never clip past
    full scale)."""
    from cdc_2025_spark.multimodal.media import decode_wav, make_wav

    amp = (seed % 90) / 100.0 + 0.05
    dur = max(n * 1000 // 8000, 1)
    p = make_wav(8000, dur, 440.0, amp, bits=bits, extensible=ext)
    s, sr = decode_wav(p)
    assert sr == 8000
    step = 1.0 / (32767 if bits == 16 else 8388607)
    assert float(np.abs(s).max()) <= amp + step


@given(
    wh=st.tuples(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=25),
    ),
    seed=st.integers(min_value=0, max_value=1000),
    depth=st.sampled_from([1, 2, 4]),
    ctype=st.sampled_from([0, 3]),
)
@settings(max_examples=25, deadline=None)
def test_png_subbyte_decodes_exact(wh, seed, depth, ctype):
    """1/2/4-bit gray and palette PNGs decode pixel-exact against
    the pattern formula at ARBITRARY widths (bit rows pad to byte
    boundaries — the off-by-one surface)."""
    import numpy as np

    from cdc_2025_spark.multimodal.media import (
        decode_png,
        make_png_variant,
    )

    w, h = wh
    img = decode_png(
        make_png_variant(w, h, seed=seed, color_type=ctype, depth=depth)
    )
    assert img.shape == (h, w, 3)
    if ctype == 0:
        scale = 255 // ((1 << depth) - 1)
        want = np.array(
            [
                [
                    (((x * 13 + y * 17 + seed * 3) % 256) >> (8 - depth))
                    * scale
                    for x in range(w)
                ]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        assert (img == want[:, :, None]).all()
    else:
        plte = [
            [(i * 16 + 3) % 256, (i * 31 + 7) % 256, (i * 5 + 11) % 256]
            for i in range(1 << depth)
        ]
        want = np.array(
            [
                [plte[(x + y + seed) % (1 << depth)] for x in range(w)]
                for y in range(h)
            ],
            dtype=np.uint8,
        )
        assert (img == want).all()


def test_png_subbyte_adam7_scatter():
    """A hand-packed Adam7-interlaced 4-bit gray PNG decodes
    identically to its non-interlaced twin — each reduced image's
    bit rows pad independently, the sub-byte analogue of the 8-bit
    interlace pin."""
    import struct
    import zlib

    import numpy as np

    from cdc_2025_spark.multimodal.media import (
        _adam7_passes,
        _png_chunk,
        _PNG_SIG,
        decode_png,
        make_png_variant,
    )

    w, h, seed, depth = 13, 9, 4, 4

    def sample(x, y):
        return ((x * 13 + y * 17 + seed * 3) % 256) >> (8 - depth)

    raw = bytearray()
    for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
        for ry in range(ph):
            raw.append(0)  # filter 0
            bits = []
            for rx in range(pw):
                s = sample(x0 + rx * dx, y0 + ry * dy)
                bits += [(s >> (depth - 1 - k)) & 1 for k in range(depth)]
            while len(bits) % 8:
                bits.append(0)
            for i in range(0, len(bits), 8):
                b = 0
                for bit in bits[i : i + 8]:
                    b = (b << 1) | bit
                raw.append(b)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png(png)
    want = decode_png(
        make_png_variant(w, h, seed=seed, color_type=0, depth=depth)
    )
    assert (got == want).all()


@given(
    wh=st.tuples(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=16),
    ),
    seed=st.integers(min_value=0, max_value=500),
    ctype=st.sampled_from([4, 6]),
)
@settings(max_examples=12, deadline=None)
def test_png_16bit_alpha_types_equal_alpha_free_twins(wh, seed, ctype):
    """16-bit gray+alpha / RGBA decode pixel-identical to their
    alpha-free twins (alpha dropped, samples x257 map back exactly)."""
    from cdc_2025_spark.multimodal.media import (
        decode_png,
        make_png_variant,
    )

    w, h = wh
    base_ct = 0 if ctype == 4 else 2
    base = decode_png(
        make_png_variant(w, h, seed=seed, color_type=base_ct, depth=16)
    )
    with_alpha = decode_png(
        make_png_variant(w, h, seed=seed, color_type=ctype, depth=16)
    )
    assert (base == with_alpha).all()


@given(
    bits=st.sampled_from([8, 12, 16, 20, 24]),
    stereo=st.booleans(),
    seed=st.integers(min_value=0, max_value=300),
)
@settings(max_examples=10, deadline=None)
def test_flac_all_depths_roundtrip_md5(bits, stereo, seed):
    """FLAC encode->decode is bit-exact with a verified STREAMINFO
    MD5 at every spec sample depth the encoder writes (8/12/16/20/24),
    mono and stereo (auto per-frame channel assignment); the MD5
    packing is ceil(bits/8)-byte LSB-aligned per spec."""
    import math

    from cdc_2025_spark.multimodal.flac import (
        decode_flac_info,
        encode_flac,
    )

    full = (1 << (bits - 1)) - 1
    n = 600
    if stereo:
        xs = []
        for i in range(n):
            xs.append(
                int(0.3 * full * math.sin(2 * math.pi * (300 + seed) * i / 8000))
            )
            xs.append(
                int(0.3 * full * math.sin(2 * math.pi * (450 + seed) * i / 8000))
            )
        p = encode_flac(
            xs, sample_rate=8000, bits=bits, channels=2,
            stereo_mode="auto",
        )
    else:
        xs = [
            int(0.4 * full * math.sin(2 * math.pi * (220 + seed) * i / 8000))
            for i in range(n)
        ]
        p = encode_flac(xs, sample_rate=8000, bits=bits)
    info = decode_flac_info(p)
    assert info["samples"] == xs
    assert info["bits"] == bits
