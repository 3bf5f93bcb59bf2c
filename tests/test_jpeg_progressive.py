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


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize(
    ("w", "h"), [(8, 8), (16, 16), (24, 17), (25, 31), (40, 8)]
)
def test_successive_approximation_equals_baseline(w, h, sub):
    """The full successive-approximation script (DC first at Al=1,
    AC first at Al=1, DC refinement, AC refinement with correction
    bits and refinement EOB runs) transports the same coefficients —
    decode must equal the baseline EXACTLY."""
    from cdc_2025_spark.multimodal.jpeg_progressive import (
        encode_jpeg_progressive_sa,
    )

    rgb = _image(w, h, seed=2 * w + h)
    base = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
    sa = decode_jpeg(encode_jpeg_progressive_sa(rgb, subsampling=sub))
    assert np.array_equal(sa, base)


def test_sa_constant_image_roundtrips():
    """All-AC-zero content under successive approximation: first and
    refinement scans are pure EOB runs (incl. buffered-correction
    bookkeeping across blocks) — must still match baseline."""
    from cdc_2025_spark.multimodal.jpeg_progressive import (
        encode_jpeg_progressive_sa,
    )

    rgb = np.full((40, 24, 3), 133, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(rgb, subsampling="4:4:4"))
    sa = decode_jpeg(
        encode_jpeg_progressive_sa(rgb, subsampling="4:4:4")
    )
    assert np.array_equal(sa, base)


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


def test_ac_refine_unit_roundtrip_randomized():
    """Deterministic-seeded coefficient blocks through the refinement
    writer and reader in isolation: every block must reconstruct
    exactly. This unit harness is what exposed the two encoder
    synchronization bugs (segment-vs-run bit pools; ZRL emission on
    arrival at any nonzero) — keep it tight."""
    from cdc_2025_spark.multimodal.jpeg import (
        _BitReader,
        _BitWriter,
        _extend,
        _huff_codes,
        _huff_decode_map,
        _read_symbol,
    )
    from cdc_2025_spark.multimodal.jpeg_progressive import (
        _PROG_AC,
        _AcRefineWriter,
        _decode_ac_refine_block,
        _encode_ac_band,
        _EobRun,
        _point_transform,
    )

    codes = _huff_codes(*_PROG_AC)
    table = _huff_decode_map(*_PROG_AC)
    AL = 1
    for seed in range(6):
        rng = np.random.RandomState(seed)
        blocks = []
        for _ in range(8):
            v = np.zeros(64, dtype=np.int64)
            nnz = rng.randint(0, 20)
            idx = rng.choice(range(1, 64), size=nnz, replace=False)
            v[idx] = rng.randint(-300, 301, size=nnz)
            blocks.append(v)
        # first pass
        bw = _BitWriter()
        eob = _EobRun(bw, codes)
        for v in blocks:
            _encode_ac_band(
                _point_transform(v, AL), 1, 63, codes, bw, eob
            )
        eob.flush()
        br = _BitReader(bw.flush() + b"\xff\xd9", 0)
        state = [np.zeros(64, dtype=np.int64) for _ in blocks]
        eobrun = 0
        for blk in state:
            if eobrun > 0:
                eobrun -= 1
                continue
            i = 1
            while i <= 63:
                sym = _read_symbol(br, table)
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run == 15:
                        i += 16
                        continue
                    eobrun = (1 << run) + (br.bits(run) if run else 0)
                    eobrun -= 1
                    break
                i += run
                blk[i] = _extend(br.bits(size), size) << AL
                i += 1
        # refinement
        bw = _BitWriter()
        wr = _AcRefineWriter(bw, codes)
        for v in blocks:
            wr.block(v, 0, 1, 63)
        wr.flush_eobrun()
        br = _BitReader(bw.flush() + b"\xff\xd9", 0)
        eobrun = 0
        for blk in state:
            eobrun = _decode_ac_refine_block(
                br, table, blk, 1, 63, 0, eobrun
            )
        for s, v in zip(state, blocks):
            assert np.array_equal(s[1:], v[1:]), seed


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_restart_interval_roundtrips_progressive(sub, ri):
    """Round-10: DRI/RSTn support. A progressive encode with restart
    markers decodes pixel-identically to the no-DRI encode — for the
    spectral-selection script, the successive-approximation script
    (covers restart on all four scan kinds: DC/AC x first/refine),
    and the non-interleaved-DC B.2.3 path."""
    from cdc_2025_spark.multimodal.jpeg_progressive import (
        encode_jpeg_progressive_sa,
    )

    rgb = _image(41, 27, 5)
    for enc in (encode_jpeg_progressive, encode_jpeg_progressive_sa):
        base = decode_jpeg(enc(rgb, subsampling=sub, quality=90))
        got = decode_jpeg(
            enc(rgb, subsampling=sub, quality=90, restart_interval=ri)
        )
        assert np.array_equal(base, got), (enc.__name__, ri)
    base = decode_jpeg(
        encode_jpeg_progressive(
            rgb, subsampling=sub, quality=90, dc_interleaved=False
        )
    )
    got = decode_jpeg(
        encode_jpeg_progressive(
            rgb,
            subsampling=sub,
            quality=90,
            dc_interleaved=False,
            restart_interval=ri,
        )
    )
    assert np.array_equal(base, got)


def test_restart_marker_sequence_validated_progressive():
    """A corrupted RSTn cycle number fails loudly, never decodes
    wrongly."""
    rgb = _image(32, 32, 1)
    enc = bytearray(
        encode_jpeg_progressive(rgb, restart_interval=1)
    )
    i = enc.find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD4
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(enc))


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: runs of 0xFF fill bytes may precede any marker
    (r9 ADVICE: the scan terminator used to misparse them). Inject
    fills before SOS and before EOI; decode must be unchanged."""
    rgb = _image(24, 16, 2)
    enc = encode_jpeg_progressive(rgb, restart_interval=2)
    i = enc.find(b"\xff\xda")
    patched = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert np.array_equal(decode_jpeg(enc), decode_jpeg(patched))
    j = patched.rfind(b"\xff\xd9")
    patched2 = patched[:j] + b"\xff\xff" + patched[j:]
    assert np.array_equal(decode_jpeg(enc), decode_jpeg(patched2))


def test_fill_bytes_before_restart_marker_inside_scan():
    """r10 self-review: a spec-legal fill run IMMEDIATELY BEFORE an
    RSTn inside entropy data must stay inside the scan —
    _entropy_end looking only AT the run (not through it) truncated
    the scan and the marker walker misparsed the length-less RST."""
    rgb = _image(32, 24, 3)
    enc = encode_jpeg_progressive(rgb, restart_interval=1)
    base = decode_jpeg(enc)
    i = enc.find(b"\xff\xd0")
    assert i > 0
    patched = enc[:i] + b"\xff\xff" + enc[i:]  # fill run before RST0
    assert np.array_equal(base, decode_jpeg(patched))
