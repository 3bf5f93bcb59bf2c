"""GIF (GIF89a) — real, dependency-free encode + decode kernels for
the lake subset: single- and multi-frame (animation) streams with
graphic-control delays, 4-pass row interlacing, and the
variable-width LSB-first LZW codec the format is built on (Welch
1984; GIF89a spec app. F), including mid-stream CLEAR resets when
the code table fills.

Round 13 closed the r12 compositing refusal: the decoder now keeps
the FULL GIF89a compositing state — partial-screen frames paint
their rect onto a persistent canvas initialized to the screen
background color, a declared transparent index leaves covered
canvas pixels untouched, and the disposal methods run per spec
(leave / restore-to-background / restore-to-previous) — and the
encoder writes the matching delta-frame form (per-frame rects,
disposal, transparent index: how optimized animations are actually
written). Decoded frames are canvas SNAPSHOTS, so downstream
feature/near-dup kernels see what a viewer shows. Local color
tables and sort flags are handled, 87a headers accepted; rects
outside the logical screen fail loudly.

Scale posture: like every media kernel here, decode runs inside
Arrow-batched ``mapInPandas`` tasks — payload bytes never shuffle;
downstream pairing (animated-GIF near-dup) rides the SAME
(media_id, frame hash) containment join the video/audio legs use.
"""

from __future__ import annotations

import struct as _struct

_GIF_HEADERS = (b"GIF89a", b"GIF87a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF LZW decompress of one image's concatenated sub-block
    bytes. Exact spec behavior: codes are read LSB-first; CLEAR
    resets the table and code width; the width grows AFTER the code
    that fills the current range is assigned; the deferred-clear
    convention (table stays at 4096 until an explicit CLEAR) is
    honored."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return out  # truncated stream: emit what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError(f"LZW: bad first code {code}")
            entry = table[code]
        elif code < len(table) and (table[code] or code < clear):
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"LZW: code {code} out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    # unreachable


def _lzw_encode(pixels: list[int], min_code_size: int) -> bytes:
    """GIF LZW compress (the exact inverse construction): emits
    CLEAR, codes greedily against a prefix dict, resets at 4096,
    ends with EOI. Bit packing is LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for px in pixels:
        wk = w + (px,)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            # width grows when the NEXT code to assign would not fit
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        w = (px,)
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

# 4-pass GIF row interlace: (start_row, step) per pass
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def encode_gif(
    frames,
    palette,
    width: int,
    height: int,
    delay_cs: int = 4,
    interlace: bool = False,
    rects=None,
    disposals=None,
    transparent_idx: int | None = None,
) -> bytes:
    """Build a GIF89a: ``frames`` is a list of row-major palette-
    index lists; ``palette`` is a list of (r, g, b). Multi-frame
    streams get a NETSCAPE loop block and per-frame graphic-control
    delays — a REAL animated GIF any viewer plays.

    Delta-frame form (how optimized animations are actually written):
    ``rects`` gives each frame its descriptor (x0, y0, fw, fh) —
    None entries mean full screen, and that frame's list holds
    fw*fh pixels; ``disposals`` gives each frame its disposal method
    (0/1 leave, 2 restore-to-background, 3 restore-to-previous);
    ``transparent_idx`` marks one palette index as see-through
    (those pixels leave the compositing canvas untouched)."""
    if not frames:
        raise ValueError("empty frame list")
    if rects is None:
        rects = [None] * len(frames)
    if disposals is None:
        disposals = [0] * len(frames)
    if len(rects) != len(frames) or len(disposals) != len(frames):
        raise ValueError("rects/disposals must match frames")
    n_colors = len(palette)
    if not 2 <= n_colors <= 256:
        raise ValueError(f"palette must hold 2..256 colors, got {n_colors}")
    depth = max((n_colors - 1).bit_length(), 1)
    table_size = 1 << depth
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, depth bits
    out += _struct.pack(
        "<HHBBB", width, height, 0x80 | ((depth - 1) << 4) | (depth - 1),
        0, 0,
    )
    for i in range(table_size):
        r, g, b = palette[i] if i < n_colors else (0, 0, 0)
        out += bytes((r, g, b))
    if len(frames) > 1:
        # NETSCAPE2.0 infinite-loop application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(depth, 2)
    for fr, rect, disp in zip(frames, rects, disposals):
        x0, y0, fw, fh = rect or (0, 0, width, height)
        if x0 + fw > width or y0 + fh > height:
            raise ValueError("frame rect exceeds the logical screen")
        if len(fr) != fw * fh:
            raise ValueError(
                f"frame holds {len(fr)} pixels, need {fw * fh}"
            )
        if max(fr) >= n_colors:
            raise ValueError("palette index out of range")
        need_gce = (
            len(frames) > 1
            or transparent_idx is not None
            or disp != 0
        )
        if need_gce:
            gflags = (disp & 7) << 2
            tidx = 0
            if transparent_idx is not None:
                gflags |= 1
                tidx = transparent_idx
            out += b"\x21\xf9\x04" + _struct.pack(
                "<BHB", gflags, delay_cs, tidx
            ) + b"\x00"
        flags = 0x40 if interlace else 0
        out += b"\x2c" + _struct.pack(
            "<HHHHB", x0, y0, fw, fh, flags
        )
        px = fr
        if interlace:
            px = []
            for start, step in _GIF_INTERLACE:
                for y in range(start, fh, step):
                    px.extend(fr[y * fw : (y + 1) * fw])
        out.append(min_code)
        data = _lzw_encode(px, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode every frame of a GIF into (height, width, 3) uint8 RGB
    CANVAS SNAPSHOTS; returns {"frames": [ndarray, ...],
    "delays_cs": [...], "width": w, "height": h}. Full GIF89a
    compositing (r13 — the r12 refusal edge closed): partial-screen
    frames paint their rect onto the persistent canvas, a declared
    transparent index leaves covered canvas pixels untouched, and
    the graphic-control disposal methods run per spec — 0/1 leave
    the frame in place, 2 restores the rect to the background color,
    3 restores the whole canvas to its pre-frame state. The canvas
    initializes to the logical screen's background color (the
    screen-descriptor index into the global table; black without
    one). Interlaced frames are de-interlaced; local color tables
    override the global one per spec; rects outside the screen, bad
    palette indices and short pixel streams fail loudly."""
    import numpy as np  # noqa: PLC0415

    if payload[:6] not in _GIF_HEADERS:
        raise ValueError("not a GIF payload")
    width, height, flags, bg_idx, _ar = _struct.unpack_from(
        "<HHBBB", payload, 6
    )
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    bg_rgb = (
        global_table[bg_idx]
        if global_table is not None and bg_idx < len(global_table)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.tile(
        np.asarray(bg_rgb, dtype=np.uint8), (height, width, 1)
    )
    frames, delays = [], []
    delay = 0
    transparent = None
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags, delay, tidx = _struct.unpack_from(
                    "<BHB", payload, pos + 1
                )
                transparent = tidx if (gflags & 1) else None
                disposal = (gflags >> 2) & 7
                pos += 1 + size
            # skip (remaining) sub-blocks
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, fw, fh, iflags = _struct.unpack_from(
            "<HHHHB", payload, pos + 1
        )
        pos += 10
        if x0 + fw > width or y0 + fh > height:
            raise ValueError(
                f"GIF frame rect {x0},{y0} {fw}x{fh} exceeds the "
                f"{width}x{height} logical screen"
            )
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame without a color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        px = _lzw_decode(bytes(data), min_code)
        if len(px) < fw * fh:
            raise ValueError(
                f"GIF frame decoded {len(px)} of {fw * fh} pixels"
            )
        idx = np.asarray(px[: fw * fh], dtype=np.int32)
        if int(idx.max()) >= len(table):
            raise ValueError(
                f"GIF palette index {int(idx.max())} out of range "
                f"({len(table)} entries)"
            )
        grid = idx.reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            de = np.zeros_like(grid)
            src_row = 0
            for start, step in _GIF_INTERLACE:
                for y in range(start, fh, step):
                    de[y] = grid[src_row]
                    src_row += 1
            grid = de
        before = canvas.copy() if disposal == 3 else None
        rgb = table[grid].astype(np.uint8)
        region = canvas[y0 : y0 + fh, x0 : x0 + fw]
        if transparent is not None:
            opaque = grid != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        # disposal prepares the canvas for the NEXT frame
        if disposal == 2:
            canvas[y0 : y0 + fh, x0 : x0 + fw] = bg_rgb
        elif disposal == 3:
            canvas = before
        delay = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF carries no image blocks")
    return {
        "frames": frames,
        "delays_cs": delays,
        "width": width,
        "height": height,
    }


def make_gif(
    width: int,
    height: int,
    n_frames: int = 1,
    seed: int = 0,
    n_colors: int = 16,
    interlace: bool = False,
) -> bytes:
    """Deterministic seeded-pattern GIF: frame f has palette index
    (x + y + seed + f) % n_colors over the PNG-palette color formula
    — the same cross-container twin story the other builders use
    (a GIF and a palette-PNG of the same pattern decode
    pixel-identically; pinned in tests)."""
    palette = [
        ((i * 16 + 3) % 256, (i * 31 + 7) % 256, (i * 5 + 11) % 256)
        for i in range(n_colors)
    ]
    frames = [
        [
            (x + y + seed + f) % n_colors
            for y in range(height)
            for x in range(width)
        ]
        for f in range(n_frames)
    ]
    return encode_gif(
        frames, palette, width, height, interlace=interlace
    )
