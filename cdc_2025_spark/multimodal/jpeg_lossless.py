"""Lossless JPEG (ITU-T T.81 Annex H, SOF3) — the Huffman
predictive process raw-photo (DNG) and medical (DICOM) containers
actually use. Real, dependency-free encode + decode kernels:

- seven spec predictors (H.1.2.1): 1 Ra, 2 Rb, 3 Rc, 4 Ra+Rb-Rc,
  5 Ra+((Rb-Rc)>>1), 6 Rb+((Ra-Rc)>>1), 7 (Ra+Rb)>>1 — arithmetic
  right shift on the signed intermediate, per the reference
  implementations;
- boundary rules (H.1.2.2): the scan's first sample predicts
  2^(P-Pt-1), the rest of the first line predicts Ra, the first
  sample of every other line predicts Rb;
- differences coded modulo 2^16 (H.1.2.3) through the DC-style
  Huffman category coding — SSSS 0-16, category 16 meaning 32768
  with NO additional magnitude bits;
- sample precision P = 2..16, point transform Pt (Al in the scan
  header) shifting samples down before prediction and the decoder
  scaling reconstructions back by 2^Pt;
- 1-4 components, interleaved one-sample-per-component MCUs at
  1:1 sampling (the layout our encoder writes and raw containers
  use; other sampling factors refuse loudly).

Losslessness is structural: the decoder reverses the exact integer
pipeline, so ``decode(encode(x)) == x`` BIT-EXACTLY at every
predictor x precision x point-transform combination — pinned in
tests/test_jpeg_lossless.py, the still-image twin of the FLAC
exact-equality oracle. Decode vectorizes the reconstruction where
the recurrence allows it (predictors 1/2/3/4 and 5's row
telescoping collapse to cumulative sums mod 2^16; 6 and 7 carry
Ra inside a shift and stay sequential per row).

Entropy machinery (0xFF-stuffed bit IO, canonical Huffman
maps, EXTEND) is shared with the sequential kernel in
``multimodal/jpeg.py``. ``decode_jpeg`` dispatches SOF3 payloads
here, mapping 1/3-component results onto its RGB contract.

Cites (public spec surface only): ITU-T T.81 Annexes H and K;
reference layout cross-checked against the documented libjpeg
lossless process. Reference repo parity: the cdc-2025 reference
(src/features/resilience.py:1-83) has no media surface — this
module belongs to the engine's training-data-lake extension.
"""

from __future__ import annotations

import struct as _struct

# one shared DC-style table covering categories 0..16: the Annex K
# DC-luminance prefix extended with one code per length for the
# 12..16 tail (Kraft sum 2^-2 + 5*2^-3 + sum_{l=4..14} 2^-l < 1)
_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
_L_VALS = list(range(17))


def _predict_grid(x, predictor: int, default: int):
    """Vectorized per-sample predictions for ENCODE, from the true
    shifted samples (h, w) int64 — decode reconstructs these exact
    values, so encoder-side vectorization is sound."""
    import numpy as np  # noqa: PLC0415

    h, w = x.shape
    px = np.empty_like(x)
    px[0, 0] = default
    if w > 1:
        px[0, 1:] = x[0, :-1]  # first line: Ra regardless
    if h > 1:
        px[1:, 0] = x[:-1, 0]  # first column: Rb regardless
        if w > 1:
            ra = x[1:, :-1]
            rb = x[:-1, 1:]
            rc = x[:-1, :-1]
            if predictor == 1:
                px[1:, 1:] = ra
            elif predictor == 2:
                px[1:, 1:] = rb
            elif predictor == 3:
                px[1:, 1:] = rc
            elif predictor == 4:
                px[1:, 1:] = ra + rb - rc
            elif predictor == 5:
                px[1:, 1:] = ra + ((rb - rc) >> 1)
            elif predictor == 6:
                px[1:, 1:] = rb + ((ra - rc) >> 1)
            else:  # 7
                px[1:, 1:] = (ra + rb) >> 1
    return px


def encode_jpeg_lossless(
    samples,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
) -> bytes:
    """(h, w) or (h, w, nc<=4) unsigned ints in [0, 2^precision) ->
    lossless JPEG (SOF3) bytes. ``point_transform`` = Al: samples
    shift down Pt bits before prediction and the decoder returns
    reconstructions scaled back by 2^Pt (low Pt bits zero — the
    spec's lossy-by-shift mode; Pt=0 is fully lossless)."""
    import numpy as np  # noqa: PLC0415

    from cdc_2025_spark.multimodal.jpeg import (  # noqa: PLC0415
        _BitWriter,
        _huff_codes,
        _magnitude,
    )

    arr = np.asarray(samples)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or not 1 <= arr.shape[2] <= 4:
        raise ValueError(
            "samples must be (h, w) or (h, w, 1..4 components)"
        )
    if not 2 <= precision <= 16:
        raise ValueError(f"precision must be 2..16, got {precision}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    if not 0 <= point_transform < precision:
        raise ValueError(
            f"point_transform must be 0..{precision - 1}"
        )
    h, w, nc = arr.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    a = arr.astype(np.int64)
    if a.min() < 0 or a.max() >= (1 << precision):
        raise ValueError(
            f"samples out of range for {precision}-bit precision"
        )
    pt = point_transform
    default = 1 << (precision - pt - 1)
    x = a >> pt
    diffs = np.empty_like(x)
    for c in range(nc):
        diffs[:, :, c] = (
            x[:, :, c] - _predict_grid(x[:, :, c], predictor, default)
        ) & 0xFFFF

    codes = _huff_codes(_L_BITS, _L_VALS)
    bw = _BitWriter()
    flat = diffs.reshape(-1)  # row-major: (y, x, component)
    for u in flat.tolist():
        if u == 32768:  # SSSS 16, no magnitude bits (H.1.2.3)
            code, length = codes[16]
            bw.put(code, length)
            continue
        d = u - 65536 if u > 32768 else u
        s, bits = _magnitude(d)
        code, length = codes[s]
        bw.put(code, length)
        if s:
            bw.put(bits, s)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(body) + 2) + body

    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_L_BITS) + bytes(_L_VALS),
    )
    sof_body = _struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sof_body += bytes([c + 1, 0x11, 0])
    sof = seg(0xFFC3, sof_body)
    sos_body = bytes([nc])
    for c in range(nc):
        sos_body += bytes([c + 1, 0x00])
    sos_body += bytes([predictor, 0, pt])  # Ss=pred, Se=0, Ah:Al
    sos = seg(0xFFDA, sos_body)
    return (
        b"\xff\xd8" + dht + sof + sos + entropy + b"\xff\xd9"
    )


def _reconstruct_plane(d, predictor: int, default: int):
    """Inverse of the prediction recurrence for one component:
    (h, w) signed diffs -> (h, w) shifted samples, all arithmetic
    mod 2^16. Predictors 1-5 vectorize (cumulative sums / row
    telescoping); 6-7 carry Ra inside a shift and run per-sample."""
    import numpy as np  # noqa: PLC0415

    h, w = d.shape
    x = np.zeros((h, w), dtype=np.int64)
    x[0, 0] = (default + d[0, 0]) & 0xFFFF
    if w > 1:  # first line is an Ra chain for every predictor
        x[0, 1:] = (x[0, 0] + np.cumsum(d[0, 1:])) & 0xFFFF
    if h == 1:
        return x
    if predictor == 2:
        # whole grid below line 0 is a column cumsum (Rb), and the
        # first-column rule coincides with it
        x[1:, :] = (x[0, :] + np.cumsum(d[1:, :], axis=0)) & 0xFFFF
        return x
    x[1:, 0] = (x[0, 0] + np.cumsum(d[1:, 0])) & 0xFFFF
    for i in range(1, h):
        if w == 1:
            continue
        if predictor == 1:
            x[i, 1:] = (x[i, 0] + np.cumsum(d[i, 1:])) & 0xFFFF
        elif predictor == 3:
            x[i, 1:] = (x[i - 1, :-1] + d[i, 1:]) & 0xFFFF
        elif predictor == 4:
            # x[i,j] - x[i-1,j] telescopes to a row cumsum
            x[i, :] = (
                x[i - 1, :] + np.cumsum(d[i, :])
            ) & 0xFFFF
        elif predictor == 5:
            # x[i,j] - x[i,j-1] = d + ((Rb-Rc)>>1): previous-row
            # shift terms are known, so the row telescopes too
            t = d[i, 1:] + ((x[i - 1, 1:] - x[i - 1, :-1]) >> 1)
            x[i, 1:] = (x[i, 0] + np.cumsum(t)) & 0xFFFF
        else:  # 6, 7: Ra sits inside the shift — sequential
            row_prev = x[i - 1]
            ra = int(x[i, 0])
            drow = d[i]
            if predictor == 6:
                for j in range(1, w):
                    ra = (
                        int(row_prev[j])
                        + ((ra - int(row_prev[j - 1])) >> 1)
                        + int(drow[j])
                    ) & 0xFFFF
                    x[i, j] = ra
            else:
                for j in range(1, w):
                    ra = (
                        ((ra + int(row_prev[j])) >> 1) + int(drow[j])
                    ) & 0xFFFF
                    x[i, j] = ra
    return x


def decode_jpeg_lossless(payload: bytes):
    """Lossless JPEG (SOF3) bytes -> ((h, w, nc) uint16 array of
    reconstructed samples scaled back by the point transform,
    precision, point_transform). Refuses restart intervals,
    non-1:1 sampling, and per-scan predictor changes loudly."""
    import numpy as np  # noqa: PLC0415

    from cdc_2025_spark.multimodal.jpeg import (  # noqa: PLC0415
        _BitReader,
        _extend,
        _huff_decode_map,
        _read_symbol,
    )

    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    htabs: dict[int, dict] = {}
    sof = None
    prec = 8
    comps: list[tuple[int, int]] = []  # (id, dc table id)
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:
            break
        (length,) = _struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                if cls == 0:
                    htabs[tid] = _huff_decode_map(bits, vals)
                off += 17 + n
        elif marker == 0xC3:
            prec, h, w, nc = _struct.unpack_from(">BHHB", body, 0)
            ids = []
            for i in range(nc):
                cid, samp, _tq = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with sampling factors other "
                        f"than 1:1 not supported (0x{samp:02X})"
                    )
                ids.append(cid)
            sof = (h, w, nc, ids)
        elif marker == 0xDD:
            raise NotImplementedError(
                "restart intervals in lossless JPEG not supported"
            )
        elif marker == 0xDA:
            ns = body[0]
            comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4)
                for i in range(ns)
            ]
            predictor = body[1 + 2 * ns]
            pt = body[3 + 2 * ns] & 0xF
            scan = (pos + 2 + length, predictor, pt)
            break
        pos += 2 + length
    if sof is None or scan is None:
        raise ValueError("missing SOF3/SOS segment")
    h, w, nc, ids = sof
    if [c for c, _ in comps] != ids:
        raise NotImplementedError(
            "lossless JPEG with partial/reordered scans "
            "not supported"
        )
    start, predictor, pt = scan
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid predictor {predictor}")
    if pt >= prec:
        raise ValueError(
            f"point transform {pt} >= precision {prec}"
        )
    br = _BitReader(payload, start)
    tables = [htabs[t] for _, t in comps]
    d = np.empty((h, w, nc), dtype=np.int64)
    flat = d.reshape(-1, nc)
    for k in range(h * w):
        for c in range(nc):
            s = _read_symbol(br, tables[c])
            if s == 16:
                flat[k, c] = 32768
            elif s:
                flat[k, c] = _extend(br.bits(s), s)
            else:
                flat[k, c] = 0
    default = 1 << (prec - pt - 1)
    out = np.empty((h, w, nc), dtype=np.uint16)
    for c in range(nc):
        plane = _reconstruct_plane(d[:, :, c], predictor, default)
        hi = 1 << (prec - pt)
        if plane.min() < 0 or plane.max() >= hi:
            raise ValueError(
                "lossless JPEG reconstruction out of sample range "
                "(corrupt stream)"
            )
        out[:, :, c] = (plane << pt).astype(np.uint16)
    return out, prec, pt
