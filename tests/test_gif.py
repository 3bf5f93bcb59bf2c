"""GIF codec (multimodal/gif.py): LZW round-trips including
table-reset regimes, pixel-exact frame decodes against the pattern
formula, interlace, animation delays, the palette-PNG
cross-container twin, and the lake integration through both the
image-feature and video-frame-hash kernels."""

from __future__ import annotations

import random

import numpy as np
import pytest

from cdc_2025_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    make_gif,
)

_PLTE16 = [
    ((i * 16 + 3) % 256, (i * 31 + 7) % 256, (i * 5 + 11) % 256)
    for i in range(16)
]


def _pattern(w, h, seed, n_colors=16):
    return np.array(
        [
            [_PLTE16[(x + y + seed) % n_colors] for x in range(w)]
            for y in range(h)
        ],
        dtype=np.uint8,
    )


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_with_table_resets(mcs):
    """20k random symbols force multiple 4096-entry table fills, so
    the mid-stream CLEAR/reset path is exercised, not just the happy
    path."""
    rng = random.Random(5)
    px = [rng.randrange(1 << mcs) for _ in range(20000)]
    assert _lzw_decode(_lzw_encode(px, mcs), mcs) == px


def test_lzw_kwkwk_case():
    """The code-equals-next-entry (KwKwK) case decodes per spec."""
    px = [1, 1, 1, 1, 1, 1, 1]  # forces cScSc immediately
    assert _lzw_decode(_lzw_encode(px, 2), 2) == px


def test_single_frame_pixel_exact():
    info = decode_gif(make_gif(37, 23, seed=5))
    assert (info["width"], info["height"]) == (37, 23)
    assert len(info["frames"]) == 1
    assert (info["frames"][0] == _pattern(37, 23, 5)).all()


def test_interlaced_equals_progressive():
    a = decode_gif(make_gif(37, 23, seed=5))["frames"][0]
    b = decode_gif(make_gif(37, 23, seed=5, interlace=True))["frames"][0]
    assert (a == b).all()


def test_animation_frames_and_delays():
    info = decode_gif(make_gif(20, 14, n_frames=5, seed=2))
    assert len(info["frames"]) == 5
    assert info["delays_cs"] == [4] * 5
    for f, frame in enumerate(info["frames"]):
        assert (frame == _pattern(20, 14, 2 + f)).all(), f


def test_gif_equals_palette_png_twin():
    """The same palette pattern through GIF and palette-PNG decodes
    pixel-identically — the cross-container twin every perceptual
    pipeline relies on (byte dedup can never pair these)."""
    from cdc_2025_spark.multimodal.media import (
        decode_png,
        make_png_variant,
    )

    g = decode_gif(make_gif(37, 23, seed=5))["frames"][0]
    p = decode_png(make_png_variant(37, 23, seed=5, color_type=3, depth=8))
    assert (g == p).all()


def test_refusals_fail_loud():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG...")
    with pytest.raises(ValueError, match="palette"):
        encode_gif([[0]], [(0, 0, 0)] * 300, 1, 1)
    with pytest.raises(ValueError, match="pixels"):
        encode_gif([[0, 1]], _PLTE16, 1, 1)
    # r13: a partial-screen frame now COMPOSITES (rect painted on
    # the background canvas) instead of refusing
    g = bytearray(make_gif(10, 10, seed=1))
    at = g.index(b"\x2c")
    g[at + 5 : at + 7] = (6).to_bytes(2, "little")  # fw 10 -> 6
    out = decode_gif(bytes(g))
    assert out["frames"][0].shape == (10, 10, 3)
    # a rect that leaves the logical screen still fails loudly
    g2 = bytearray(make_gif(10, 10, seed=1))
    at = g2.index(b"\x2c")
    g2[at + 1 : at + 3] = (8).to_bytes(2, "little")  # x0 = 8, fw 10
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif(bytes(g2))


def test_image_feature_kernel_routes_gif(spark):
    """Lake integration: the image feature kernel dispatches GIF
    payloads to the real decoder, and the GIF twin of a palette-PNG
    corpus yields IDENTICAL features."""
    from cdc_2025_spark.multimodal.media import (
        extract_image_features,
        make_png_variant,
    )

    rows_gif = [
        (i, "image", bytearray(make_gif(24 + i, 16 + i, seed=i)))
        for i in range(4)
    ]
    rows_png = [
        (
            i,
            "image",
            bytearray(
                make_png_variant(
                    24 + i, 16 + i, seed=i, color_type=3, depth=8
                )
            ),
        )
        for i in range(4)
    ]
    schema = "media_id long, kind string, payload binary"
    fg = {
        r["media_id"]: r["features"]
        for r in extract_image_features(
            spark.createDataFrame(rows_gif, schema)
        ).collect()
    }
    fp = {
        r["media_id"]: r["features"]
        for r in extract_image_features(
            spark.createDataFrame(rows_png, schema)
        ).collect()
    }
    assert set(fg) == set(fp) == {0, 1, 2, 3}
    for k in fg:
        assert fg[k] == pytest.approx(fp[k], abs=1e-12), k


def test_video_hash_kernel_routes_gif_and_pairs(spark):
    """Animated GIFs ride the video near-dup leg: frame hashes equal
    the python model, and a prefix-truncated animation pairs with
    its full clip at containment 1.0 through the SAME containment
    join the AVI/audio legs use."""
    from cdc_2025_spark.multimodal.phash import (
        ahash64_from_rgb,
        video_frame_hashes,
        video_neardup_pairs,
    )

    full = make_gif(24, 18, n_frames=6, seed=3)
    prefix = make_gif(24, 18, n_frames=3, seed=3)
    other = make_gif(24, 18, n_frames=6, seed=9)
    media = spark.createDataFrame(
        [
            (0, bytearray(full)),
            (1, bytearray(prefix)),
            (2, bytearray(other)),
        ],
        "media_id long, payload binary",
    ).repartition(3)
    fh = video_frame_hashes(media)
    rows = fh.collect()
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(
            (r["frame_no"], r["ahash"])
        )
    for mid, payload in ((0, full), (1, prefix), (2, other)):
        frames = decode_gif(payload)["frames"]
        want = [(f, ahash64_from_rgb(fr)) for f, fr in enumerate(frames)]
        assert sorted(got[mid]) == want, mid
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in video_neardup_pairs(fh, threshold=0.5).collect()
    }
    assert pairs.get((0, 1)) == 1.0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def _canvas_model(width, height, palette, steps, bg_idx=0):
    """Plain-python compositing reference: steps are (frame_pixels,
    rect, disposal, transparent_idx)."""
    bg = np.array(palette[bg_idx], dtype=np.uint8)
    canvas = np.tile(bg, (height, width, 1))
    out = []
    for fr, rect, disp, tr in steps:
        x0, y0, fw, fh = rect or (0, 0, width, height)
        before = canvas.copy()
        grid = np.asarray(fr, dtype=np.int32).reshape(fh, fw)
        rgb = np.asarray(palette, dtype=np.uint8)[grid]
        region = canvas[y0 : y0 + fh, x0 : x0 + fw]
        if tr is not None:
            m = grid != tr
            region[m] = rgb[m]
        else:
            region[:, :] = rgb
        out.append(canvas.copy())
        if disp == 2:
            canvas[y0 : y0 + fh, x0 : x0 + fw] = bg
        elif disp == 3:
            canvas = before
    return out


def test_partial_frame_compositing_matches_model():
    """Delta-frame animation (full base + offset patches) decodes to
    canvas snapshots equal to the python compositing model —
    including the area the patches never touch persisting from the
    base frame."""
    w, h = 12, 9
    base = [(x + y) % 16 for y in range(h) for x in range(w)]
    patch1 = [(x + 1) % 16 for _ in range(3) for x in range(4)]
    patch2 = [(x + 7) % 16 for _ in range(2) for x in range(5)]
    payload = encode_gif(
        [base, patch1, patch2],
        _PLTE16,
        w,
        h,
        rects=[None, (5, 3, 4, 3), (0, 7, 5, 2)],
    )
    got = decode_gif(payload)
    want = _canvas_model(
        w, h, _PLTE16,
        [
            (base, None, 0, None),
            (patch1, (5, 3, 4, 3), 0, None),
            (patch2, (0, 7, 5, 2), 0, None),
        ],
    )
    assert len(got["frames"]) == 3
    for g, wf in zip(got["frames"], want):
        assert np.array_equal(g, wf)
    # the patch area really changed and the rest really persisted
    assert not np.array_equal(got["frames"][0], got["frames"][1])
    assert np.array_equal(
        got["frames"][1][:3, :, :], got["frames"][0][:3, :, :]
    )


def test_transparent_index_leaves_canvas_pixels():
    """A frame using a transparent index paints only its opaque
    pixels; covered transparent positions keep the previous frame's
    colors."""
    w, h = 8, 6
    base = [3] * (w * h)
    # checkerboard of transparent (15) and color 7
    over = [15 if (x + y) % 2 else 7 for y in range(h) for x in range(w)]
    payload = encode_gif(
        [base, over], _PLTE16, w, h, transparent_idx=15
    )
    got = decode_gif(payload)["frames"]
    want = _canvas_model(
        w, h, _PLTE16,
        [(base, None, 0, None), (over, None, 0, 15)],
    )
    assert np.array_equal(got[1], want[1])
    c3 = np.array(_PLTE16[3], dtype=np.uint8)
    c7 = np.array(_PLTE16[7], dtype=np.uint8)
    assert np.array_equal(got[1][0, 0], c7)  # opaque cell painted
    assert np.array_equal(got[1][0, 1], c3)  # transparent kept base


def test_disposal_background_and_previous():
    """Disposal 2 clears the frame's rect to the background color
    before the next frame; disposal 3 restores the pre-frame canvas
    — both pinned against the model."""
    w, h = 10, 8
    base = [1] * (w * h)
    flash = [9] * 12  # 4x3 patch
    after = [2] * 15  # 5x3 patch
    for disp in (2, 3):
        payload = encode_gif(
            [base, flash, after],
            _PLTE16,
            w,
            h,
            rects=[None, (2, 2, 4, 3), (4, 4, 5, 3)],
            disposals=[0, disp, 0],
        )
        got = decode_gif(payload)["frames"]
        want = _canvas_model(
            w, h, _PLTE16,
            [
                (base, None, 0, None),
                (flash, (2, 2, 4, 3), disp, None),
                (after, (4, 4, 5, 3), 0, None),
            ],
        )
        for g, wf in zip(got, want):
            assert np.array_equal(g, wf), disp
    # disposal 2: the flash rect (minus what frame 3 repaints) shows
    # the BACKGROUND color (palette[0]); disposal 3 restores base 1
    p2 = decode_gif(
        encode_gif(
            [base, flash, after], _PLTE16, w, h,
            rects=[None, (2, 2, 4, 3), (4, 4, 5, 3)],
            disposals=[0, 2, 0],
        )
    )["frames"][2]
    p3 = decode_gif(
        encode_gif(
            [base, flash, after], _PLTE16, w, h,
            rects=[None, (2, 2, 4, 3), (4, 4, 5, 3)],
            disposals=[0, 3, 0],
        )
    )["frames"][2]
    assert np.array_equal(p2[2, 2], np.array(_PLTE16[0], np.uint8))
    assert np.array_equal(p3[2, 2], np.array(_PLTE16[1], np.uint8))


def test_first_partial_frame_sits_on_background_canvas():
    """With no full base frame, uncovered canvas shows the logical
    screen's background color (the screen-descriptor index into the
    global table — encode_gif pins index 0)."""
    w, h = 7, 5
    patch = [5] * 6  # 3x2
    got = decode_gif(
        encode_gif([patch], _PLTE16, w, h, rects=[(2, 1, 3, 2)])
    )["frames"][0]
    assert np.array_equal(got[0, 0], np.array(_PLTE16[0], np.uint8))
    assert np.array_equal(got[1, 2], np.array(_PLTE16[5], np.uint8))


def test_encoder_rect_validation():
    with pytest.raises(ValueError, match="exceeds"):
        encode_gif([[0] * 6], _PLTE16, 4, 4, rects=[(2, 2, 3, 2)])
    with pytest.raises(ValueError, match="match frames"):
        encode_gif([[0]], _PLTE16, 1, 1, rects=[])
