"""Progressive JPEG (ITU-T T.81 SOF2): spectral selection AND
successive approximation.

Closes the guarded ``NotImplementedError`` that baseline
``jpeg.decode_jpeg`` raises on SOF2 payloads. The decoder handles
any number of scans: DC scans (interleaved MCU order or
single-component ceil-dim order), single-component AC band scans
with EOB-run coding, DC bitplane refinement, and AC bitplane
refinement (newly-significant run/1 symbols, inline correction bits,
refinement EOB runs). Two encoders exist so every decode path has an
EXACT oracle — a progressive and a baseline encoding of the SAME
quantized coefficient grid must decode to IDENTICAL pixels (the
entropy layer is lossless; only coefficient transport order
differs), pinned across sizes/subsampling in
tests/test_jpeg_progressive.py:

- ``encode_jpeg_progressive``: pure spectral selection (one DC scan,
  per-component full-band AC scans);
- ``encode_jpeg_progressive_sa``: the libjpeg-style successive-
  approximation script (DC/AC first passes at Al=1, then DC/AC
  refinement scans).

Format facts used (all public spec):

- SOF2 frame header is byte-identical in layout to SOF0.
- A DC scan (Ss = Se = 0) codes DC diffs exactly like baseline,
  interleaved in MCU order when it lists several components.
- An AC scan (1 <= Ss <= Se <= 63) must list exactly ONE component;
  its data units walk the component's OWN block grid row-major with
  ceil(comp_dim/8) blocks per side — NOT the MCU-padded grid, so
  4:2:0 luma pad blocks carry DC (from the interleaved scan) but no
  AC, which only ever affects cropped pixels.
- AC symbols: (run << 4) | size with size > 0 is a baseline-style
  coefficient; size == 0, run == 15 is ZRL (16 zeros); size == 0,
  run < 15 starts an EOB RUN of (1 << run) + run-extra-bits blocks
  (including the current one) whose remaining coefficients in the
  band are all zero.
"""

from __future__ import annotations

import struct as _struct

from cdc_2025_spark.multimodal.jpeg import (
    _DC_CHROM,
    _DC_LUM,
    _QUANT_CHROM,
    _QUANT_LUM,
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _extend,
    _huff_codes,
    _huff_decode_map,
    _magnitude,
    _pad_edge,
    _quantized_blocks,
    _read_symbol,
    _reconstruct,
    _rgb_to_ycbcr,
    _scaled_quant,
)

_EOBRUN_MAX = 32767  # largest codable EOB run: (1 << 14) + 14 bits

# AC Huffman table for the PROGRESSIVE scans: Annex K's baseline AC
# tables carry no EOBn symbols (only EOB0/ZRL) and their canonical
# code space has a single free 16-bit slot, so EOB-run symbols cannot
# be appended — progressive encoders ship their own tables. This one
# is deliberately flat (every symbol 8 bits — valid canonical table:
# 240 leaves of 256, the all-ones code unused): EOBn for n=0..14,
# ZRL, and run/size up to size 14. Suboptimal compression, exact
# correctness; the decoder reads whatever DHT the file declares.
_PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]           # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 15)],
)


class _EobRun:
    """Encoder-side EOB-run accumulator for one AC scan: blocks whose
    band ends early join the pending run; `flush` emits EOBn + extra
    bits (T.81 G.1.2.2)."""

    def __init__(self, bw: _BitWriter, ac_codes) -> None:
        self.bw = bw
        self.ac = ac_codes
        self.n = 0

    def add(self) -> None:
        self.n += 1
        if self.n == _EOBRUN_MAX:
            self.flush()

    def flush(self) -> None:
        n = self.n
        if not n:
            return
        r = n.bit_length() - 1
        code, length = self.ac[r << 4]
        self.bw.put(code, length)
        if r:
            self.bw.put(n - (1 << r), r)
        self.n = 0


def _encode_ac_band(zz, ss: int, se: int, ac_codes, bw, eob: _EobRun):
    """One block's AC coefficients in [ss, se] — baseline run/size
    coding, with the block's trailing zeros routed into the scan's
    EOB-run accumulator."""
    last_nz = 0
    for i in range(se, ss - 1, -1):
        if zz[i]:
            last_nz = i
            break
    if last_nz < ss:
        eob.add()
        return
    eob.flush()
    run = 0
    for i in range(ss, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.put(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(bits, s)
        run = 0
    if last_nz != se:
        eob.add()


def encode_jpeg_progressive(
    rgb,
    subsampling: str = "4:2:0",
    quality: int = 88,
    dc_interleaved: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF bytes, spectral
    selection: a DC scan (interleaved MCU order by default;
    ``dc_interleaved=False`` emits one single-component DC scan per
    component walking its own ceil-dim grid — both spec-valid, and
    the non-interleaved form exercises the decoder's B.2.3 path),
    then one full-band AC scan per component (Ss=1, Se=63, Ah=Al=0)
    — the same quantized coefficients `encode_jpeg` transports
    sequentially.

    ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many decode units per scan (MCUs when interleaved, blocks
    otherwise); DC predictors reset and EOB runs terminate at each
    restart, per T.81."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if restart_interval < 0:
        raise ValueError(
            f"restart_interval must be >= 0, got {restart_interval}"
        )
    sub = subsampling == "4:2:0"
    h, w = rgb.shape[:2]
    qlum = _scaled_quant(_QUANT_LUM, quality)
    qchrom = _scaled_quant(_QUANT_CHROM, quality)

    yp, cb, cr = _rgb_to_ycbcr(rgb)
    if sub:
        yp = _pad_edge(yp, 16, 16)
        cb = _pad_edge(cb, 16, 16)
        cr = _pad_edge(cr, 16, 16)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
    else:
        yp = _pad_edge(yp, 8, 8)
        cb = _pad_edge(cb, 8, 8)
        cr = _pad_edge(cr, 8, 8)
    zz = {
        1: _quantized_blocks(yp, qlum),
        2: _quantized_blocks(cb, qchrom),
        3: _quantized_blocks(cr, qchrom),
    }
    dc_codes = {1: _huff_codes(*_DC_LUM), 2: _huff_codes(*_DC_CHROM),
                3: _huff_codes(*_DC_CHROM)}
    prog_ac = _huff_codes(*_PROG_AC)
    ac_codes = {1: prog_ac, 2: prog_ac, 3: prog_ac}

    mcus_y, mcus_x = zz[2].shape[0], zz[2].shape[1]
    samp = {1: (2, 2) if sub else (1, 1), 2: (1, 1), 3: (1, 1)}
    comp_dims = {
        1: (h, w),
        2: (((h + 1) // 2, (w + 1) // 2) if sub else (h, w)),
        3: (((h + 1) // 2, (w + 1) // 2) if sub else (h, w)),
    }

    def _put_dc(bw, cid, blk, pred):
        diff = int(blk[0]) - pred[cid]
        pred[cid] = int(blk[0])
        s, bits = _magnitude(diff)
        code, length = dc_codes[cid][s]
        bw.put(code, length)
        if s:
            bw.put(bits, s)

    def _rst_due(unit: int) -> bool:
        return bool(
            restart_interval and unit and unit % restart_interval == 0
        )

    def _rst_marker(unit: int) -> int:
        return 0xD0 + (unit // restart_interval - 1) % 8

    # ---- DC: one interleaved scan (MCU order) or one scan per
    # component (its own ceil-dim grid; predictor resets per scan) ----
    dc_scans: list[bytes] = []
    if dc_interleaved:
        bw = _BitWriter()
        pred = {1: 0, 2: 0, 3: 0}
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if _rst_due(unit):
                    bw.put_marker(_rst_marker(unit))
                    pred = {1: 0, 2: 0, 3: 0}
                unit += 1
                for cid in (1, 2, 3):
                    ch, cv = samp[cid]
                    for dy in range(cv):
                        for dx in range(ch):
                            _put_dc(
                                bw,
                                cid,
                                zz[cid][my * cv + dy, mx * ch + dx],
                                pred,
                            )
        dc_scans.append(bw.flush())
    else:
        for cid in (1, 2, 3):
            bw = _BitWriter()
            pred = {cid: 0}
            cbh = (comp_dims[cid][0] + 7) // 8
            cbw = (comp_dims[cid][1] + 7) // 8
            unit = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if _rst_due(unit):
                        bw.put_marker(_rst_marker(unit))
                        pred = {cid: 0}
                    unit += 1
                    _put_dc(bw, cid, zz[cid][by, bx], pred)
            dc_scans.append(bw.flush())

    # ---- AC: per-component band 1..63 (non-interleaved: the
    # component's ceil-dim block grid, row-major) ----
    ac_scans = {}
    for cid in (1, 2, 3):
        bw = _BitWriter()
        eob = _EobRun(bw, ac_codes[cid])
        cbh = (comp_dims[cid][0] + 7) // 8
        cbw = (comp_dims[cid][1] + 7) // 8
        unit = 0
        for by in range(cbh):
            for bx in range(cbw):
                if _rst_due(unit):
                    # EOB runs terminate at restart boundaries
                    eob.flush()
                    bw.put_marker(_rst_marker(unit))
                unit += 1
                _encode_ac_band(
                    zz[cid][by, bx], 1, 63, ac_codes[cid], bw, eob
                )
        eob.flush()
        ac_scans[cid] = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, tab: list[int]) -> bytes:
        z = bytes(tab[_ZIGZAG[i]] for i in range(64))
        return seg(0xFFDB, bytes([tid]) + z)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    samp_y = 0x22 if sub else 0x11
    sof2 = seg(
        0xFFC2,
        _struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dc_tid = {1: 0x00, 2: 0x10, 3: 0x10}  # DC table in the HIGH nibble
    if dc_interleaved:
        dc_part = (
            seg(
                0xFFDA,
                bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x00]),
            )
            + dc_scans[0]
        )
    else:
        dc_part = b"".join(
            seg(0xFFDA, bytes([1, cid, dc_tid[cid], 0, 0, 0x00])) + data
            for cid, data in zip((1, 2, 3), dc_scans)
        )
    # all AC scans share the progressive table (class 1, id 0); the
    # DC nibble is unused in AC scans (zero per convention)
    sos_ac = {
        cid: seg(0xFFDA, bytes([1, cid, 0x00, 1, 63, 0x00]))
        for cid in (1, 2, 3)
    }
    app0 = seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + _struct.pack(">HHBB", 1, 1, 0, 0)
    )
    dri = (
        seg(0xFFDD, _struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qlum)
        + dqt(1, qchrom)
        + sof2
        + dht(0, 0, *_DC_LUM)
        + dht(0, 1, *_DC_CHROM)
        + dht(1, 0, *_PROG_AC)
        + dri
        + dc_part
        + sos_ac[1]
        + ac_scans[1]
        + sos_ac[2]
        + ac_scans[2]
        + sos_ac[3]
        + ac_scans[3]
        + b"\xff\xd9"
    )


def _refine_bit(br: _BitReader, blk, k: int, al: int) -> None:
    """Apply one correction bit to an already-nonzero coefficient:
    bit 1 moves the magnitude up by one step at the current
    precision, away from zero (T.81 G.1.2.3)."""
    if br.bit():
        v = int(blk[k])
        blk[k] = v + (1 << al) if v > 0 else v - (1 << al)


def _decode_ac_refine_block(
    br: _BitReader, tab, blk, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of an AC refinement scan (Ah != 0): newly
    significant coefficients arrive as run/1 symbols (run counts
    ZERO-HISTORY positions only) with a sign bit; every nonzero-
    history coefficient passed on the way — and, inside an EOB run,
    every nonzero-history coefficient in the band — consumes one
    correction bit. Returns the remaining EOB run. (The public
    libjpeg decode_mcu_AC_refine algorithm, restated.)"""
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(br, tab)
            run, size = sym >> 4, sym & 0xF
            newval = 0
            if size == 0:
                if run != 15:
                    eobrun = (1 << run) + (br.bits(run) if run else 0)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError(
                        "AC refinement symbol with size != 1"
                    )
                newval = (1 << al) if br.bit() else -(1 << al)
            while k <= se:
                if blk[k] != 0:
                    _refine_bit(br, blk, k, al)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                _refine_bit(br, blk, k, al)
            k += 1
        eobrun -= 1
    return eobrun


class _AcRefineWriter:
    """Encoder-side state for one AC refinement scan — a restatement
    of the public libjpeg encode_mcu_AC_refine discipline, whose two
    load-bearing details are easy to get wrong:

    - correction bits split into TWO FIFO pools: ``run_bits`` (owned
      by the pending EOB run — flushed with the EOBn symbol) and
      ``seg_bits`` (buffered since the last emitted symbol — flushed
      right AFTER each symbol, where the decoder's position walk
      consumes them). Flushing the segment pool with the EOBn would
      hand the decoder the current block's pre-symbol bits before it
      has read the symbol that starts their walk.
    - ZRLs are emitted on ARRIVAL at any nonzero coefficient (not
      only at newly-significant ones), which maintains the invariant
      r <= 15 whenever a correction bit is buffered — so a flushed
      segment never contains bits from beyond the decoder's 16-zero
      ZRL window."""

    def __init__(self, bw: _BitWriter, ac_codes) -> None:
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.run_bits: list[int] = []
        self.seg_bits: list[int] = []

    def _flush_seg(self) -> None:
        for b in self.seg_bits:
            self.bw.put(b, 1)
        self.seg_bits = []

    def flush_eobrun(self) -> None:
        n = self.eobrun
        if n:
            r = n.bit_length() - 1
            code, length = self.ac[r << 4]
            self.bw.put(code, length)
            if r:
                self.bw.put(n - (1 << r), r)
            self.eobrun = 0
            for b in self.run_bits:
                self.bw.put(b, 1)
            self.run_bits = []

    def block(self, band, al: int, ss: int, se: int) -> None:
        absv = [abs(int(band[k])) >> al for k in range(64)]
        eob_k = ss - 1
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob_k = k
        r = 0
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_k:
                self.flush_eobrun()
                code, length = self.ac[0xF0]
                self.bw.put(code, length)
                self._flush_seg()
                r -= 16
            if t > 1:
                self.seg_bits.append(t & 1)
                continue
            self.flush_eobrun()
            code, length = self.ac[(r << 4) | 1]
            self.bw.put(code, length)
            self.bw.put(1 if int(band[k]) > 0 else 0, 1)
            self._flush_seg()
            r = 0
        if r > 0 or self.seg_bits:
            # the band's tail joins the EOB run; its correction bits
            # transfer to the run's pool
            self.eobrun += 1
            self.run_bits += self.seg_bits
            self.seg_bits = []
            if self.eobrun == _EOBRUN_MAX:
                self.flush_eobrun()


def _point_transform(zz_grid, al: int):
    """AC point transform: magnitude divided by 2^al, toward zero
    (T.81 G.1.2.2 — NOT an arithmetic shift, which would round
    negative values away from zero)."""
    import numpy as np  # noqa: PLC0415

    return np.sign(zz_grid) * (np.abs(zz_grid) >> al)


def encode_jpeg_progressive_sa(
    rgb,
    subsampling: str = "4:2:0",
    quality: int = 88,
    restart_interval: int = 0,
) -> bytes:
    """Progressive SOF2 with SUCCESSIVE APPROXIMATION — the libjpeg-
    style script: interleaved DC first at Al=1, per-component
    full-band AC first at Al=1, DC refinement (Ah=1, Al=0), then
    per-component AC refinement (Ah=1, Al=0). Transports the same
    quantized coefficients as encode_jpeg, so decode equality with
    the baseline is exact — the oracle in
    tests/test_jpeg_progressive.py.

    ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many decode units per scan (MCUs in the interleaved DC scans,
    blocks in the AC scans); DC predictors reset and EOB runs
    terminate at each restart — covering restart decode on all four
    progressive scan kinds (DC/AC x first/refine)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if restart_interval < 0:
        raise ValueError(
            f"restart_interval must be >= 0, got {restart_interval}"
        )
    sub = subsampling == "4:2:0"
    h, w = rgb.shape[:2]
    qlum = _scaled_quant(_QUANT_LUM, quality)
    qchrom = _scaled_quant(_QUANT_CHROM, quality)
    yp, cb, cr = _rgb_to_ycbcr(rgb)
    if sub:
        yp = _pad_edge(yp, 16, 16)
        cb = _pad_edge(cb, 16, 16)
        cr = _pad_edge(cr, 16, 16)
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
    else:
        yp = _pad_edge(yp, 8, 8)
        cb = _pad_edge(cb, 8, 8)
        cr = _pad_edge(cr, 8, 8)
    zz = {
        1: _quantized_blocks(yp, qlum),
        2: _quantized_blocks(cb, qchrom),
        3: _quantized_blocks(cr, qchrom),
    }
    dc_codes = {1: _huff_codes(*_DC_LUM), 2: _huff_codes(*_DC_CHROM),
                3: _huff_codes(*_DC_CHROM)}
    prog_ac = _huff_codes(*_PROG_AC)
    mcus_y, mcus_x = zz[2].shape[0], zz[2].shape[1]
    samp = {1: (2, 2) if sub else (1, 1), 2: (1, 1), 3: (1, 1)}
    comp_dims = {
        1: (h, w),
        2: (((h + 1) // 2, (w + 1) // 2) if sub else (h, w)),
        3: (((h + 1) // 2, (w + 1) // 2) if sub else (h, w)),
    }
    AL = 1

    def _rst_due(unit: int) -> bool:
        return bool(
            restart_interval and unit and unit % restart_interval == 0
        )

    def _rst_marker(unit: int) -> int:
        return 0xD0 + (unit // restart_interval - 1) % 8

    def mcu_walk(fn, on_mcu=None):
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if on_mcu is not None:
                    on_mcu(unit)
                unit += 1
                for cid in (1, 2, 3):
                    ch, cv = samp[cid]
                    for dy in range(cv):
                        for dx in range(ch):
                            fn(cid, my * cv + dy, mx * ch + dx)

    # scan 1: DC first at Al=1 (diffs of the SHIFTED values)
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}

    def dc_first(cid, by, bx):
        t = int(zz[cid][by, bx][0]) >> AL  # DC transform IS a shift
        diff = t - pred[cid]
        pred[cid] = t
        s, bits = _magnitude(diff)
        code, length = dc_codes[cid][s]
        bw.put(code, length)
        if s:
            bw.put(bits, s)

    def dc_first_restart(unit):
        if _rst_due(unit):
            bw.put_marker(_rst_marker(unit))
            pred.update({1: 0, 2: 0, 3: 0})

    mcu_walk(dc_first, on_mcu=dc_first_restart)
    dc_first_scan = bw.flush()

    # scans 2-4: AC first at Al=1 per component
    ac_first = {}
    for cid in (1, 2, 3):
        bw = _BitWriter()
        eob = _EobRun(bw, prog_ac)
        cbh = (comp_dims[cid][0] + 7) // 8
        cbw = (comp_dims[cid][1] + 7) // 8
        tz = _point_transform(zz[cid], AL)
        unit = 0
        for by in range(cbh):
            for bx in range(cbw):
                if _rst_due(unit):
                    eob.flush()
                    bw.put_marker(_rst_marker(unit))
                unit += 1
                _encode_ac_band(tz[by, bx], 1, 63, prog_ac, bw, eob)
        eob.flush()
        ac_first[cid] = bw.flush()

    # scan 5: DC refinement (bit 0 of every DC, MCU order)
    bw = _BitWriter()
    mcu_walk(
        lambda cid, by, bx: bw.put(int(zz[cid][by, bx][0]) & 1, 1),
        on_mcu=lambda unit: (
            bw.put_marker(_rst_marker(unit)) if _rst_due(unit) else None
        ),
    )
    dc_refine_scan = bw.flush()

    # scans 6-8: AC refinement per component
    ac_refine = {}
    for cid in (1, 2, 3):
        bw = _BitWriter()
        wr = _AcRefineWriter(bw, prog_ac)
        cbh = (comp_dims[cid][0] + 7) // 8
        cbw = (comp_dims[cid][1] + 7) // 8
        unit = 0
        for by in range(cbh):
            for bx in range(cbw):
                if _rst_due(unit):
                    wr.flush_eobrun()
                    bw.put_marker(_rst_marker(unit))
                unit += 1
                wr.block(zz[cid][by, bx], 0, 1, 63)
        wr.flush_eobrun()
        ac_refine[cid] = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, tab: list[int]) -> bytes:
        z = bytes(tab[_ZIGZAG[i]] for i in range(64))
        return seg(0xFFDB, bytes([tid]) + z)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    samp_y = 0x22 if sub else 0x11
    sof2 = seg(
        0xFFC2,
        _struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    app0 = seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + _struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def sos(comp_specs: bytes, ss: int, se: int, ah: int, al: int) -> bytes:
        n = len(comp_specs) // 2
        return seg(
            0xFFDA,
            bytes([n]) + comp_specs + bytes([ss, se, (ah << 4) | al]),
        )

    dc_specs = bytes([1, 0x00, 2, 0x10, 3, 0x10])
    dri = (
        seg(0xFFDD, _struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    out = (
        b"\xff\xd8"
        + app0
        + dqt(0, qlum)
        + dqt(1, qchrom)
        + sof2
        + dht(0, 0, *_DC_LUM)
        + dht(0, 1, *_DC_CHROM)
        + dht(1, 0, *_PROG_AC)
        + dri
        + sos(dc_specs, 0, 0, 0, AL)
        + dc_first_scan
    )
    for cid in (1, 2, 3):
        out += sos(bytes([cid, 0x00]), 1, 63, 0, AL) + ac_first[cid]
    out += sos(dc_specs, 0, 0, AL, 0) + dc_refine_scan
    for cid in (1, 2, 3):
        out += sos(bytes([cid, 0x00]), 1, 63, AL, 0) + ac_refine[cid]
    return out + b"\xff\xd9"


def _entropy_end(payload: bytes, pos: int) -> int:
    """First byte past the entropy-coded data starting at ``pos``.
    The scan continues through stuffed 0x00 bytes and RSTn markers;
    a run of 0xFF fill bytes (spec-legal padding before ANY marker,
    B.1.1.2) is resolved by what FOLLOWS the run: a fill run before
    an RSTn is still INSIDE the scan (restarts are scan-interior
    markers), while a fill run before any other marker belongs to
    the next segment — the scan ends at the run's first byte. (r9
    ADVICE fixed the naive 0xFF 0xFF terminator; the run must also
    be looked THROUGH, not just at, or a padded restart truncates
    the scan and the marker walker misparses the length-less RST.)"""
    i = pos
    n = len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            i += 1
            continue
        # advance j to the LAST 0xFF of the run starting at i
        j = i
        while j < n - 1 and payload[j + 1] == 0xFF:
            j += 1
        if j >= n - 1:
            return i  # trailing fill run at EOF
        nxt = payload[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2  # stuffed data / restart marker: inside scan
        else:
            return i  # real marker (after optional fill): scan ends
    return n


def decode_jpeg_progressive(payload: bytes):
    """SOF2 decode (spectral selection + successive approximation):
    accumulate every scan's coefficients into per-component zigzag
    grids — first passes shifted by the point transform, refinement
    passes OR-ing DC bits / stepping AC magnitudes via correction
    bits — then one vectorized dequantize + IDCT + upsample + color
    convert shared with the baseline decoder."""
    import numpy as np  # noqa: PLC0415

    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    comps: list[tuple[int, int, int, int]] = []
    restart_interval = 0
    scans: list[
        tuple[list[tuple[int, int, int]], int, int, int, int, int, int]
    ] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte(s) before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:
            break
        (length,) = _struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                from cdc_2025_spark.multimodal.jpeg import (  # noqa: PLC0415
                    _parse_dqt_entries,
                )

                pq, tq = body[off] >> 4, body[off] & 0xF
                z, off = _parse_dqt_entries(body, off, pq)
                nat = [0] * 64
                for i in range(64):
                    nat[_ZIGZAG[i]] = z[i]
                qtabs[tq] = nat
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htabs[(cls, tid)] = _huff_decode_map(bits, vals)
                off += 17 + n
        elif marker == 0xC2:
            prec, h, w, nc = _struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            sof = (h, w, nc)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_jpeg_progressive expects an SOF2 frame; use "
                "decode_jpeg for baseline payloads"
            )
        elif marker == 0xDD:
            # DRI can change between scans; each scan records the
            # interval in force at its SOS
            (restart_interval,) = _struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            sc = []
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                sc.append((cid, tids >> 4, tids & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            data_start = pos + 2 + length
            data_end = _entropy_end(payload, data_start)
            scans.append(
                (
                    sc,
                    ss,
                    se,
                    ahal >> 4,
                    ahal & 0xF,
                    data_start,
                    restart_interval,
                )
            )
            pos = data_end
            continue
        pos += 2 + length
    if sof is None or not scans:
        raise ValueError("missing SOF2/SOS segment")
    height, width, _ = sof

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    by_id = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
    coefs = {
        cid: np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
        for cid, ch, cv, _ in comps
    }

    for sc, ss, se, ah, al, data_start, ri in scans:
        # DC prediction resets at every scan start (T.81 F.2.1.3.1)
        pred = dict.fromkeys(coefs, 0)
        br = _BitReader(payload, data_start)

        def _restart_due(unit: int, br=br, ri=ri) -> bool:
            """Consume + validate an RSTn at every ``ri`` decode
            units (MCUs when interleaved, blocks otherwise);
            restart resets the DC predictors and terminates any
            EOB run (T.81 F.2.1.3.1 / E.2.4)."""
            if not ri or unit == 0 or unit % ri:
                return False
            got = br.restart()
            want = (unit // ri - 1) % 8
            if got != want:
                raise ValueError(
                    f"restart marker out of sequence: RST{got}, "
                    f"expected RST{want}"
                )
            return True
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se = 0")
            if len(sc) == 1:
                # T.81 B.2.3: a single-component scan — DC included —
                # walks the COMPONENT'S row-major ceil-dim block
                # grid, never the MCU-interleaved order (which would
                # both scramble the diff chain and expect pad data
                # units the stream does not contain)
                cid, dc_tid, _ac_tid = sc[0]
                ch, cv, _tq = by_id[cid]
                tab = htabs[(0, dc_tid)]
                cw = (width * ch + 8 * hmax - 1) // (8 * hmax)
                chh = (height * cv + 8 * vmax - 1) // (8 * vmax)
                unit = 0
                for by in range(chh):
                    for bx in range(cw):
                        if _restart_due(unit):
                            pred = dict.fromkeys(coefs, 0)
                        unit += 1
                        if ah == 0:
                            s = _read_symbol(br, tab)
                            diff = _extend(br.bits(s), s) if s else 0
                            pred[cid] += diff
                            coefs[cid][by, bx, 0] = pred[cid] << al
                        elif br.bit():
                            # DC refinement: one bit per data unit
                            coefs[cid][by, bx, 0] = int(
                                coefs[cid][by, bx, 0]
                            ) | (1 << al)
            else:
                unit = 0
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if _restart_due(unit):
                            pred = dict.fromkeys(coefs, 0)
                        unit += 1
                        for cid, dc_tid, _ac_tid in sc:
                            ch, cv, _tq = by_id[cid]
                            tab = htabs[(0, dc_tid)]
                            for dy in range(cv):
                                for dx in range(ch):
                                    if ah == 0:
                                        s = _read_symbol(br, tab)
                                        diff = (
                                            _extend(br.bits(s), s)
                                            if s
                                            else 0
                                        )
                                        pred[cid] += diff
                                        coefs[cid][
                                            my * cv + dy,
                                            mx * ch + dx,
                                            0,
                                        ] = pred[cid] << al
                                    elif br.bit():
                                        coefs[cid][
                                            my * cv + dy,
                                            mx * ch + dx,
                                            0,
                                        ] = int(
                                            coefs[cid][
                                                my * cv + dy,
                                                mx * ch + dx,
                                                0,
                                            ]
                                        ) | (1 << al)
        else:
            if len(sc) != 1:
                raise ValueError(
                    "AC scans must carry exactly one component"
                )
            cid, _dc_tid, ac_tid = sc[0]
            ch, cv, _tq = by_id[cid]
            tab = htabs[(1, ac_tid)]
            # component's own block grid (ceil of its scaled dims)
            cw = (width * ch + 8 * hmax - 1) // (8 * hmax)
            chh = (height * cv + 8 * vmax - 1) // (8 * vmax)
            eobrun = 0
            unit = 0
            for by in range(chh):
                for bx in range(cw):
                    if _restart_due(unit):
                        eobrun = 0
                    unit += 1
                    blk = coefs[cid][by, bx]
                    if ah != 0:
                        eobrun = _decode_ac_refine_block(
                            br, tab, blk, ss, se, al, eobrun
                        )
                        continue
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    i = ss
                    while i <= se:
                        sym = _read_symbol(br, tab)
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run == 15:
                                # ZRL: 16 zeros, and a coefficient
                                # must still fit inside the band
                                i += 16
                                if i > se:
                                    raise ValueError(
                                        "ZRL past band end"
                                    )
                                continue
                            eobrun = (1 << run) + (
                                br.bits(run) if run else 0
                            )
                            eobrun -= 1  # includes this block
                            break
                        i += run
                        if i > se:
                            raise ValueError("AC run past band end")
                        blk[i] = _extend(br.bits(size), size) << al
                        i += 1

    # ---- reconstruction: the tail shared with the baseline decoder
    # (jpeg._reconstruct) so every rounding decision is one code path
    return _reconstruct(
        coefs,
        qtabs,
        by_id,
        [cid for cid, _, _, _ in comps],
        height,
        width,
        mcus_x,
        mcus_y,
        hmax,
        vmax,
    )
