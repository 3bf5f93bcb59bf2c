"""MJPEG-AVI container kernel (multimodal/avi.py): round-trip frame
equality with the still-JPEG encoder, structural validation, the
fail-loud set, time->frame sampling math, and the Spark-side real
frame-sampling path + rollup row."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from cdc_2025_spark.multimodal.avi import (
    AVI_DEFAULT_FPS,
    decode_avi_frame,
    frame_number_at,
    make_mjpeg_avi,
    parse_avi,
)
from cdc_2025_spark.multimodal.jpeg import decode_jpeg, make_jpeg

W, H, N, FPS = 40, 32, 5, 4


def test_roundtrip_frames_equal_still_jpegs():
    """Frame f of the container is BYTE-identical to the still JPEG
    at seed*31 + f (same encoder, same pattern), and decodes to the
    same pixels."""
    payload = make_mjpeg_avi(W, H, n_frames=N, fps=FPS, seed=3)
    meta = parse_avi(payload)
    assert (meta["width"], meta["height"]) == (W, H)
    assert (meta["rate"], meta["scale"]) == (FPS, 1)
    assert meta["n_frames"] == N
    for f in range(N):
        still = make_jpeg(W, H, seed=3 * 31 + f, subsampling="4:4:4")
        assert meta["frames"][f] == still
        rgb = decode_avi_frame(meta, f)
        assert rgb.shape == (H, W, 3)
        assert np.array_equal(rgb, decode_jpeg(still))


def test_determinism_and_distinct_frames():
    a = make_mjpeg_avi(W, H, n_frames=N, seed=7)
    b = make_mjpeg_avi(W, H, n_frames=N, seed=7)
    assert a == b
    frames = parse_avi(a)["frames"]
    assert len({bytes(f) for f in frames}) == N  # all frames distinct


def test_frame_number_at_timing():
    meta = {"rate": 4, "scale": 1, "n_frames": 8}
    # 4 fps -> frame changes every 250 ms; floor rule, clamped
    assert frame_number_at(meta, 0) == 0
    assert frame_number_at(meta, 249) == 0
    assert frame_number_at(meta, 250) == 1
    assert frame_number_at(meta, 1999) == 7
    assert frame_number_at(meta, 99999) == 7  # clamp to last frame
    # non-unit scale: 30000/1001-style rational rates stay exact
    ntsc = {"rate": 30000, "scale": 1001, "n_frames": 1000}
    assert frame_number_at(ntsc, 1001) == 30
    assert frame_number_at(ntsc, 1000) == 29


def test_fail_loud_set():
    payload = bytearray(make_mjpeg_avi(W, H, n_frames=2))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"JUNK" + bytes(payload[4:]))
    with pytest.raises(ValueError, match="overruns"):
        parse_avi(bytes(payload[: len(payload) // 2]))
    # foreign codec: patch both fccHandler and biCompression
    foreign = bytearray(payload)
    i = foreign.find(b"MJPG")
    while i != -1:
        foreign[i : i + 4] = b"cvid"
        i = foreign.find(b"MJPG")
    with pytest.raises(NotImplementedError, match="cvid"):
        parse_avi(bytes(foreign))
    # audio stream type
    astream = bytearray(payload)
    astream[astream.find(b"vids") :][:4] = b"auds"
    i = astream.find(b"vids")
    astream[i : i + 4] = b"auds"
    with pytest.raises(NotImplementedError, match="auds"):
        parse_avi(bytes(astream))


def test_idx1_consistency_check():
    payload = bytearray(make_mjpeg_avi(W, H, n_frames=3))
    # corrupt the last idx1 entry's length field
    i = payload.rfind(b"00dc")  # last idx1 entry (idx1 is the tail)
    (ln,) = struct.unpack_from("<I", payload, i + 12)
    struct.pack_into("<I", payload, i + 12, ln + 2)
    with pytest.raises(ValueError, match="idx1"):
        parse_avi(bytes(payload))


def test_header_frame_count_check():
    payload = bytearray(make_mjpeg_avi(W, H, n_frames=3))
    i = payload.find(b"avih")
    # dwTotalFrames is the 5th u32 of the avih payload
    struct.pack_into("<I", payload, i + 8 + 16, 99)
    with pytest.raises(ValueError, match="declares 99 frames"):
        parse_avi(bytes(payload))


def test_spark_sampling_real_path(spark):
    """sample_video_frames over real AVI rows: sampled shas equal
    direct container decodes at the exact time->frame mapping, and
    synthetic stub rows still ride the hash path unchanged."""
    from pyspark.sql import functions as F

    from cdc_2025_spark.multimodal.media import (
        make_real_media,
        sample_video_frames,
    )

    real = make_real_media(spark, n_images=0, n_audio=0, n_avi=4)
    out = (
        sample_video_frames(real, every_ms=250)
        .orderBy("media_id", "frame_idx")
        .collect()
    )
    metas = {
        r["media_id"]: parse_avi(bytes(r["payload"]))
        for r in real.select("media_id", "payload").collect()
    }
    durs = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in real.select("media_id", "meta").collect()
    }
    assert out, "no sampled frames"
    for r in out:
        meta = metas[r["media_id"]]
        fno = frame_number_at(meta, r["frame_idx"] * 250)
        want = hashlib.sha256(
            decode_avi_frame(meta, fno).tobytes()
        ).hexdigest()
        assert r["frame_sha256"] == want
    # row count per video = duration_ms / every_ms (the JVM explode)
    from collections import Counter

    per = Counter(r["media_id"] for r in out)
    for mid, n in per.items():
        assert n == max(durs[mid] // 250, 1)
    # a 4 fps stream sampled every 250 ms hits every frame exactly
    # once -> distinct shas per video == n_frames
    assert AVI_DEFAULT_FPS == 4
    shas = {}
    for r in out:
        shas.setdefault(r["media_id"], set()).add(r["frame_sha256"])
    for mid, s in shas.items():
        assert len(s) == metas[mid]["n_frames"]


def test_rollup_gains_video_mjpeg_row(spark):
    from cdc_2025_spark.queries.multimodal import (
        multimodal_feature_rollup,
    )

    rows = {
        r["kind"]: r
        for r in multimodal_feature_rollup(spark, "unused").collect()
    }
    assert "video_mjpeg" in rows
    r = rows["video_mjpeg"]
    # 6 videos, 2 + i%4 frames each at 4 fps sampled every 250 ms ->
    # one row per frame: sum(2,3,4,5,2,3) = 19
    assert r["n_rows"] == 19
    # every decoded frame is distinct across all 6 videos
    assert r["max_metric"] == 19.0


def test_video_neardup_shared_prefix(spark):
    """Video near-dup via frame-hash containment: B is A's 4-frame
    prefix (same seed, shorter) -> containment 1.0; C is a disjoint
    seed -> no pair. The engine's n_shared/containment must equal a
    python set model over the SAME frame hashes."""
    from pyspark.sql import functions as F  # noqa: F401

    from cdc_2025_spark.multimodal.phash import (
        video_frame_hashes,
        video_neardup_pairs,
    )

    vids = spark.createDataFrame(
        [
            (0, bytearray(make_mjpeg_avi(40, 32, n_frames=6, seed=1))),
            (1, bytearray(make_mjpeg_avi(40, 32, n_frames=4, seed=1))),
            (2, bytearray(make_mjpeg_avi(40, 32, n_frames=4, seed=9))),
        ],
        "media_id long, payload binary",
    ).repartition(3)
    fh = video_frame_hashes(vids)
    rows = fh.collect()
    # python model: distinct hash sets per video
    sets = {}
    for r in rows:
        sets.setdefault(r["media_id"], set()).add(r["ahash"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["containment"])
        for r in video_neardup_pairs(fh, threshold=0.5).collect()
    }
    import itertools

    want = {}
    for x, y in itertools.combinations(sorted(sets), 2):
        shared = len(sets[x] & sets[y])
        cont = round(shared / min(len(sets[x]), len(sets[y])), 4)
        if shared and cont >= 0.5:
            want[(x, y)] = (shared, cont)
    assert got == want
    assert (0, 1) in got and got[(0, 1)][1] == 1.0  # prefix twin
    assert (0, 2) not in got and (1, 2) not in got  # disjoint seed
    # frame counts: one hash row per container frame
    from collections import Counter

    per = Counter(r["media_id"] for r in rows)
    assert per == {0: 6, 1: 4, 2: 4}


def test_video_neardup_threshold_validated():
    import pytest as _pytest

    from cdc_2025_spark.multimodal.phash import video_neardup_pairs

    with _pytest.raises(ValueError, match="threshold"):
        video_neardup_pairs(None, threshold=0.0)


def test_idx1_partial_entry_fails_loud():
    """An idx1 whose length is not a multiple of the 16-byte entry
    size is truncated/malformed; parsing must raise the module's
    ValueError, never unpack past the chunk payload into the
    neighboring bytes."""
    payload = bytearray(make_mjpeg_avi(W, H, n_frames=3))
    i = payload.rfind(b"idx1")
    (ln,) = struct.unpack_from("<I", payload, i + 4)
    assert ln % 16 == 0
    # shave 12 bytes off the file tail and the idx1 + RIFF lengths so
    # every OTHER size check stays consistent; ln % 16 becomes 4
    struct.pack_into("<I", payload, i + 4, ln - 12)
    (riff_ln,) = struct.unpack_from("<I", payload, 4)
    struct.pack_into("<I", payload, 4, riff_ln - 12)
    with pytest.raises(ValueError, match="multiple of 16"):
        parse_avi(bytes(payload[:-12]))


def test_registered_video_neardup_query(spark):
    """The driver-registered query must produce exactly its documented
    pairs: the 3 prefix truncations, 2 exact duplicates, the
    cross-codec DIB re-encode of video 0 (pairing with the original
    AND the original's prefix truncation), and the cross-FAMILY GIF
    trio (animated GIF / its prefix / a DIB-AVI of its decoded
    frames — RIFF and LZW containers pairing on pixel-identical
    frames), each at containment 1.0, and nothing else (distinct
    base seeds never pair; GIF patterns never pair with MJPEG
    patterns)."""
    from cdc_2025_spark.queries.multimodal import (
        multimodal_video_neardup,
    )

    rows = sorted(
        (r["id_a"], r["id_b"], r["containment"])
        for r in multimodal_video_neardup(spark, "unused").collect()
    )
    assert rows == [
        (0, 8, 1.0),
        (0, 13, 1.0),
        (1, 9, 1.0),
        (2, 10, 1.0),
        (3, 11, 1.0),
        (4, 12, 1.0),
        (8, 13, 1.0),
        (14, 15, 1.0),
        (14, 16, 1.0),
        (15, 16, 1.0),
    ]


# ---------------------------------------------------------------------------
# Uncompressed DIB (BI_RGB) AVI
# ---------------------------------------------------------------------------


def test_dib_frames_equal_bmp_twins():
    """DIB is lossless: decoded frame f == the BMP still of the same
    seeded pattern, exactly, including 4-byte row padding widths."""
    import numpy as np

    from cdc_2025_spark.multimodal.avi import (
        decode_avi_frame,
        make_dib_avi,
        parse_avi,
    )
    from cdc_2025_spark.multimodal.media import decode_bmp, make_bmp

    m = parse_avi(make_dib_avi(33, 7, n_frames=3, seed=4))
    assert m["codec"] == "dib" and not m["top_down"]
    for f in range(3):
        want = decode_bmp(make_bmp(33, 7, seed=4 * 31 + f))
        assert np.array_equal(decode_avi_frame(m, f), want), f


def test_dib_top_down_equals_bottom_up():
    import numpy as np

    from cdc_2025_spark.multimodal.avi import (
        decode_avi_frame,
        make_dib_avi,
        parse_avi,
    )

    up = parse_avi(make_dib_avi(20, 10, n_frames=2, seed=9))
    dn = parse_avi(
        make_dib_avi(20, 10, n_frames=2, seed=9, top_down=True)
    )
    assert dn["top_down"]
    for f in range(2):
        assert np.array_equal(
            decode_avi_frame(up, f), decode_avi_frame(dn, f)
        )


def test_dib_reencode_of_mjpeg_is_pixel_identical():
    """The cross-codec near-dup scenario: storing an MJPEG video's
    DECODED frames as raw DIB yields a byte-different container whose
    frames decode AND hash identically."""
    import numpy as np

    from cdc_2025_spark.multimodal.avi import (
        decode_avi_frame,
        encode_dib_avi,
        make_mjpeg_avi,
        parse_avi,
    )
    from cdc_2025_spark.multimodal.phash import ahash64_from_rgb

    src = make_mjpeg_avi(40, 32, n_frames=4, seed=7)
    mm = parse_avi(src)
    dec = [decode_avi_frame(mm, f) for f in range(4)]
    re = encode_dib_avi(dec, fps=4)
    assert re != src
    mr = parse_avi(re)
    assert mr["codec"] == "dib" and mr["n_frames"] == 4
    for f in range(4):
        assert np.array_equal(decode_avi_frame(mr, f), dec[f])
        assert ahash64_from_rgb(decode_avi_frame(mr, f)) == (
            ahash64_from_rgb(dec[f])
        )


def test_dib_fail_loud_set():
    import struct

    import pytest

    from cdc_2025_spark.multimodal.avi import make_dib_avi, parse_avi

    p = bytearray(make_dib_avi(16, 8, n_frames=2, seed=1))
    # 16-bit DIB refuses: patch biBitCount in strf
    i = bytes(p).index(b"strf")
    bits_off = i + 8 + 14  # strf header + biSize/biWidth/biHeight/biPlanes
    bad = bytearray(p)
    struct.pack_into("<H", bad, bits_off, 16)
    with pytest.raises(NotImplementedError):
        parse_avi(bytes(bad))
    # a truncated DIB frame (frame length != rowsize*h) refuses: halve
    # the first 00db chunk's declared length keeps RIFF consistent
    # only if we rebuild — easier: corrupt the strf width so lengths
    # mismatch
    bad2 = bytearray(p)
    struct.pack_into("<i", bad2, i + 8 + 4, 17)  # biWidth 16 -> 17
    with pytest.raises(ValueError):
        parse_avi(bytes(bad2))
    # unknown codec handler still refuses
    bad3 = bytes(p).replace(b"DIB ", b"cvid").replace(
        b"\x00\x00\x00\x00", b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError):
        parse_avi(bad3)


def test_encode_dib_avi_validates():
    import numpy as np
    import pytest

    from cdc_2025_spark.multimodal.avi import encode_dib_avi

    with pytest.raises(ValueError):
        encode_dib_avi([])
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    b = np.zeros((4, 5, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_dib_avi([a, b])
    with pytest.raises(ValueError):
        encode_dib_avi([a], fps=0)
