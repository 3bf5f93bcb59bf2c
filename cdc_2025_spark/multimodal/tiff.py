"""TIFF (baseline TIFF 6.0) — real, dependency-free encode + decode
kernels for the lake subset: both byte orders (II little / MM big),
8-bit grayscale (BlackIsZero AND WhiteIsZero), 8-bit RGB, and 8-bit
palette images, uncompressed or PackBits (the spec's RLE), assembled
from any strip layout. The scanned-document format: archives and
document dumps are full of single-strip uncompressed TIFFs and
multi-strip PackBits faxes re-saved at 8 bits.

Round 13 added the two most common non-baseline compressions as
real kernels — LZW (compression 5 — TIFF's MSB-first bit order and
the spec's EarlyChange code-width rule, NOT the GIF variant) and
Deflate (8 / legacy 32946, stdlib zlib), both composing with the
horizontal-differencing Predictor 2 (tag 317) real LZW writers
almost always set — plus the full depth ladder: 1/2/4-bit
(MSB-first packed, byte-padded rows — the fax/scan depths; exact
255/(2^d - 1) display scaling) for gray and palette, and 16-bit
gray/RGB in file byte order (round(v*255/65535) display scaling —
a x257-widened twin decodes pixel-identical to its 8-bit
original).

The tiled layout (tags 322-325, zero-padded edge tiles) and
PlanarConfiguration 2 (one strip sequence per sample) decode AND
encode, composing with every depth/compression — both pinned
pixel-identical to their strip/chunky twins.

Round 14 added CCITT Group 4 (compression 4 — the T.6 MMR fax
coding scanned-document archives actually use) and CCITT modified
Huffman (compression 2 — the byte-aligned 1D RLE flavor) as real
encode+decode kernels for 1-bit single-sample images, per strip
with the spec's fresh all-white reference line
(multimodal/ccitt.py; spec-pinned code words + exact round trips
in test_ccitt.py).

CCITT Group 3 (compression 3, T.4 with EOLs — 1D and 2D flavors
via T4Options bit 0, fill bits tolerated) decodes and encodes too
(round 15; uncompressed-mode T4Options bit 1 refuses). All three
fax codings also compose with the TILED layout (each tile is an
independent fax bitstream at tile geometry with its own all-white
reference, per TIFF §15 / T.6-in-TIFF practice) — pinned
pixel-identical to the strip twin in tests.

New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2) decodes
and encodes (round 15): every strip/tile is an independent
complete-or-abbreviated JPEG stream handed to the in-repo T.81
kernel (multimodal/jpeg.py), with the JPEGTables tag (347) table-
specification stream spliced in front of abbreviated streams;
``jpeg_tables=True`` writes that hoisted layout, photometric 6
(YCbCr) is recorded for color per libtiff practice. Decoded pixels
are pinned identical to decode_jpeg of the same per-segment
streams in tests.

Float TIFF (SampleFormat 3, 32-bit IEEE samples — the
scientific/HDR layout) decodes and encodes (round 15), composing
with uncompressed/LZW/Deflate, strips and tiles, and the
floating-point horizontal-differencing predictor 3 (TIFF TechNote
3 / libtiff fpDiff: per row, big-endian float bytes regrouped into
four significance planes then byte-differenced). Display mapping
is the linear [0, 1] clamp times 255 — a v/255-quantized image
inverts exactly, pinned in tests.

Deliberate refusals (fail loud, never decode wrongly):
old-style JPEG-in-TIFF (compression 6 — the deprecated TIFF 6.0
§22 layout), T.4 uncompressed mode, signed-integer SampleFormat 2,
mixed per-sample depths or formats, sub-byte multi-sample, 16-bit
palette, 32-bit integer samples, JPEG or float with
palette/planar-2 layouts, and tiled+planar-2 combinations — each
raises with the offending tag value.

Scale posture: like every media kernel here, decode runs inside
Arrow-batched ``mapInPandas`` tasks; payload bytes never shuffle.
"""

from __future__ import annotations

import struct as _struct

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_COLORMAP = 320
_T_TILE_W = 322
_T_TILE_L = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325

_T_PREDICTOR = 317
_T_T4OPTIONS = 292

_T_SAMPLEFORMAT = 339
_T_JPEGTABLES = 347
_T_YCBCR_SUB = 530

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


def _lzw_decode_tiff(data: bytes, expect: int) -> bytes:
    """TIFF LZW decompress (TIFF 6.0 §13) of one strip. Two spec'd
    differences from the GIF variant (gif.py:_lzw_decode): codes are
    packed MSB-FIRST, and the code width grows ONE CODE EARLY
    (EarlyChange — the width bumps when the NEXT code to be assigned
    is the last that fits, i.e. at table sizes 510/1022/2046+2).
    Fixed 8-bit symbols: CLEAR = 256, EOI = 257."""
    clear, eoi = 256, 257
    code_size = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos, n = 0, len(data)
    while len(out) < expect:
        while nbits < code_size:
            if pos >= n:
                if len(out) < expect:
                    raise ValueError(
                        f"TIFF LZW strip decoded {len(out)} of "
                        f"{expect} bytes"
                    )
                return bytes(out[:expect])
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            code_size = 9
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code > 255:
                raise ValueError(f"TIFF LZW: bad first code {code}")
            entry = table[code]
        elif code < len(table) and (table[code] or code < clear):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"TIFF LZW: code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EarlyChange: bump when ONE slot is left at this width
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out[:expect])


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF LZW compress — the exact inverse construction (MSB-first
    packing, EarlyChange width rule, reset at the 4094-entry mark
    per the spec's early convention)."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    code_size = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # EarlyChange mirror, shifted one code: the decoder learns
        # the entry assigned at emission i only at code i+1 (it
        # cannot pair the first code), so its table runs one entry
        # behind this counter — it hits the (2^w - 1) early-change
        # mark exactly when next_code reaches 2^w here
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4094:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(256)}
            code_size = 9
            next_code = eoi + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _undo_predictor2(raw: bytes, rows: int, width: int, spp: int) -> bytes:
    """Horizontal differencing predictor (TIFF 6.0 §14): each sample
    was stored as the delta to the same sample one pixel left;
    invert with a per-row per-channel cumulative sum mod 256."""
    import numpy as np  # noqa: PLC0415

    a = np.frombuffer(raw, dtype=np.uint8).reshape(rows, width, spp)
    return (
        np.cumsum(a, axis=1, dtype=np.uint32) % 256
    ).astype(np.uint8).tobytes()


def _apply_predictor2(raw: bytes, rows: int, width: int, spp: int) -> bytes:
    import numpy as np  # noqa: PLC0415

    a = (
        np.frombuffer(raw, dtype=np.uint8)
        .reshape(rows, width, spp)
        .astype(np.int16)
    )
    d = a.copy()
    d[:, 1:, :] = a[:, 1:, :] - a[:, :-1, :]
    return (d % 256).astype(np.uint8).tobytes()


def _apply_predictor3(raw: bytes, rows: int, width: int, spp: int,
                      e: str) -> bytes:
    """Floating-point horizontal differencing (predictor 3, TIFF
    TechNote 3, libtiff's fpDiff): per row, the float32 samples are
    rewritten as BIG-ENDIAN bytes split into four significance
    planes (all MSBs first, then the next byte, ...), then the
    whole rearranged row is byte-differenced like predictor 2.
    ``raw`` holds file-byte-order (``e``) float32 samples."""
    import numpy as np  # noqa: PLC0415

    n = width * spp
    vals = np.frombuffer(
        raw, dtype=np.dtype(e + "f4"), count=rows * n
    ).reshape(rows, n)
    be = np.ascontiguousarray(
        vals.astype(">f4")
    ).view(np.uint8).reshape(rows, n, 4)
    shuffled = be.transpose(0, 2, 1).reshape(rows, 4 * n)
    out = shuffled.copy()
    out[:, 1:] = (
        shuffled[:, 1:].astype(np.int16)
        - shuffled[:, :-1].astype(np.int16)
    ).astype(np.uint8)
    return out.tobytes()


def _undo_predictor3(raw: bytes, rows: int, width: int, spp: int,
                     e: str) -> bytes:
    """Inverse of :func:`_apply_predictor3`: byte-accumulate each
    row, regroup the four significance planes into big-endian
    float32s, and return file-byte-order (``e``) sample bytes."""
    import numpy as np  # noqa: PLC0415

    n = width * spp
    b = np.frombuffer(
        raw, dtype=np.uint8, count=rows * 4 * n
    ).reshape(rows, 4 * n)
    acc = np.cumsum(b.astype(np.uint64), axis=1).astype(np.uint8)
    be = acc.reshape(rows, 4, n).transpose(0, 2, 1)
    vals = np.ascontiguousarray(be).reshape(rows, n, 4).view(
        ">f4"
    )[:, :, 0]
    return vals.astype(np.dtype(e + "f4")).tobytes()


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): n in 0..127 -> copy n+1
    literal bytes; n in -127..-1 -> repeat next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError(
            f"PackBits strip decoded {len(out)} of {expect} bytes"
        )
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encode: runs of >= 3 equal bytes as replicate
    packets, everything else as literal packets (both capped at
    128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal: until the next >=3 run or 128 bytes
        j = i
        while j < n and j - i < 128:
            if (
                j + 2 < n
                and data[j] == data[j + 1] == data[j + 2]
            ):
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _split_jpeg_tables(stream: bytes):
    """Split a complete JPEG stream into (tables, abbreviated): the
    DQT/DHT segments move into a standalone table-specification
    stream (SOI + tables + EOI — the TIFF JPEGTables tag 347
    payload, TIFF TechNote 2) and the abbreviated image stream keeps
    everything else. Entropy-coded data from SOS onward is copied
    verbatim."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    rest = bytearray(stream[:2])
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynced")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows verbatim
            rest += stream[pos:]
            break
        (seglen,) = _struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seglen
    else:
        raise ValueError("JPEG stream ended before SOS")
    return (
        b"\xff\xd8" + bytes(tables) + b"\xff\xd9",
        bytes(rest),
    )


def _decode_tiff_jpeg(payload: bytes, tags: dict, width: int,
                      height: int):
    """Decode a new-style JPEG-in-TIFF (compression 7) pixel grid:
    each strip/tile is an independent complete-or-abbreviated JPEG
    stream; an abbreviated stream is spliced with the JPEGTables
    (tag 347) table-specification stream before decode. Returns the
    assembled (height, width, 3) uint8 RGB array (photometric
    inversion is the caller's)."""
    import numpy as np  # noqa: PLC0415

    from cdc_2025_spark.multimodal.jpeg import (  # noqa: PLC0415
        decode_jpeg,
    )

    tb = None
    if _T_JPEGTABLES in tags:
        tb = bytes(tags[_T_JPEGTABLES])
        if (len(tb) < 4 or tb[:2] != b"\xff\xd8"
                or tb[-2:] != b"\xff\xd9"):
            raise ValueError(
                "JPEGTables stream missing SOI/EOI framing"
            )

    def seg(chunk: bytes, rows: int, cols: int, label: str):
        if chunk[:2] != b"\xff\xd8":
            raise ValueError(f"{label} is not a JPEG stream")
        if tb is not None:
            chunk = chunk[:2] + tb[2:-2] + chunk[2:]
        px = decode_jpeg(chunk)
        if px.shape[0] != rows or px.shape[1] != cols:
            raise ValueError(
                f"{label} JPEG decodes {px.shape[1]}x{px.shape[0]}"
                f", geometry needs {cols}x{rows}"
            )
        return px

    if _T_TILE_OFFSETS in tags:
        tw = tags[_T_TILE_W][0]
        tl = tags[_T_TILE_L][0]
        offsets = tags[_T_TILE_OFFSETS]
        counts = tags.get(_T_TILE_COUNTS)
        across, down = -(-width // tw), -(-height // tl)
        if not counts or len(offsets) != len(counts):
            raise ValueError("TIFF tile offsets/counts uneven")
        if len(offsets) != across * down:
            raise ValueError(
                f"TIFF holds {len(offsets)} tiles, geometry needs "
                f"{across * down}"
            )
        grid = np.zeros((down * tl, across * tw, 3), np.uint8)
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(t, across)
            grid[
                ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw
            ] = seg(payload[off : off + cnt], tl, tw, f"tile {t}")
        return grid[:height, :width].copy()
    offsets = tags.get(_T_STRIP_OFFSETS)
    counts = tags.get(_T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or uneven")
    rps = tags.get(_T_ROWS_PER_STRIP, [height])[0]
    if len(offsets) != -(-height // rps):
        raise ValueError(
            f"TIFF holds {len(offsets)} strips, geometry needs "
            f"{-(-height // rps)}"
        )
    grid = np.zeros((height, width, 3), np.uint8)
    rows_left = height
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, rows_left)
        grid[si * rps : si * rps + rows] = seg(
            payload[off : off + cnt], rows, width, f"strip {si}"
        )
        rows_left -= rows
    return grid


def decode_tiff(payload: bytes):
    """Decode the FIRST IFD of a TIFF into an (height, width, 3)
    uint8 RGB array. Handles II and MM byte orders, photometric 0
    (WhiteIsZero — inverted per spec), 1 (BlackIsZero), 2 (RGB) and
    3 (palette via ColorMap's 16-bit channels >> 8), compression 1
    (none) and 32773 (PackBits), any strip layout (RowsPerStrip
    defaults to the full image), inline and offset tag values.
    Everything else refuses loudly."""
    import numpy as np  # noqa: PLC0415

    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = _struct.unpack_from(e + "I", payload, 4)
    (n_tags,) = _struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = _struct.unpack_from(e + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * cnt
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = _struct.unpack_from(e + "I", payload, base + 8)
        if typ == 3:
            vals = list(
                _struct.unpack_from(e + f"{cnt}H", payload, voff)
            )
        elif typ == 4:
            vals = list(
                _struct.unpack_from(e + f"{cnt}I", payload, voff)
            )
        elif typ in (1, 2, 7):
            vals = list(payload[voff : voff + cnt])
        else:  # RATIONAL: numerators only (unused here)
            vals = [
                _struct.unpack_from(e + "I", payload, voff + 8 * k)[0]
                for k in range(cnt)
            ]
        tags[tag] = vals

    def one(tag: int, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is not None:
            return default
        raise ValueError(f"TIFF missing required tag {tag}")

    width, height = one(_T_WIDTH), one(_T_HEIGHT)
    spp = one(_T_SPP, default=1)
    bits = tags.get(_T_BITS, [8])
    comp = one(_T_COMPRESSION, default=1)
    photo = one(_T_PHOTOMETRIC)
    planar = one(_T_PLANAR, default=1)
    if len(set(bits)) != 1:
        raise NotImplementedError(
            f"mixed BitsPerSample {bits} not supported"
        )
    depth = bits[0]
    sfmts = tags.get(_T_SAMPLEFORMAT, [1])
    if len(set(sfmts)) != 1:
        raise NotImplementedError(
            f"mixed SampleFormat {sfmts} not supported"
        )
    sfmt = sfmts[0]
    if sfmt not in (1, 3):
        raise NotImplementedError(
            f"SampleFormat {sfmt} not supported (1 unsigned / "
            "3 IEEE float only)"
        )
    if sfmt == 3 and depth != 32:
        raise NotImplementedError(
            f"float SampleFormat supports 32-bit samples "
            f"(depth={depth})"
        )
    if sfmt == 1 and depth == 32:
        raise NotImplementedError(
            "32-bit integer samples not supported (float32 via "
            "SampleFormat 3 is)"
        )
    if depth not in (1, 2, 4, 8, 16, 32):
        raise NotImplementedError(
            f"BitsPerSample {depth} not supported (1/2/4/8/16, "
            "32 float)"
        )
    if depth in (1, 2, 4) and spp != 1:
        raise NotImplementedError(
            "sub-byte depths support a single sample per pixel "
            f"(spp={spp})"
        )
    if depth == 16 and photo == 3:
        raise NotImplementedError(
            "16-bit palette indices not supported"
        )
    if comp == 6:
        raise NotImplementedError(
            "old-style JPEG-in-TIFF (compression 6) not supported "
            "— the deprecated TIFF 6.0 §22 layout; new-style "
            "(compression 7) decodes"
        )
    if comp not in (1, 2, 3, 4, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"unsupported TIFF compression {comp}; supported: "
            "1 (none), 2 (CCITT MH), 3 (CCITT G3), 4 (CCITT G4), "
            "5 (LZW), 7 (JPEG), 8/32946 (Deflate), 32773 (PackBits)"
        )
    if comp in (2, 3, 4) and (depth != 1 or spp != 1):
        raise NotImplementedError(
            f"CCITT compression {comp} applies to 1-bit "
            f"single-sample images (depth={depth}, spp={spp})"
        )
    t4opts = one(_T_T4OPTIONS, default=0)
    if comp == 3 and t4opts & 2:
        raise NotImplementedError(
            "T.4 uncompressed mode (T4Options bit 1) not supported"
        )
    predictor = one(_T_PREDICTOR, default=1)
    if predictor not in (1, 2, 3):
        raise NotImplementedError(
            f"TIFF predictor {predictor} not supported (1/2/3 only)"
        )
    if predictor == 2 and comp in (1, 32773):
        raise ValueError(
            "predictor 2 with uncompressed/PackBits data is not a "
            "layout this writer emits — refusing a likely-corrupt IFD"
        )
    if predictor == 2 and depth != 8:
        raise NotImplementedError(
            "predictor 2 implemented for 8-bit samples only"
        )
    if predictor == 3 and sfmt != 3:
        raise ValueError(
            "predictor 3 (floating-point differencing) applies to "
            "SampleFormat 3 data only"
        )
    if sfmt == 3:
        if comp not in (1, 5, 8, 32946):
            raise NotImplementedError(
                f"float TIFF with compression {comp} not supported "
                "(1/5/8/32946 only)"
            )
        if planar == 2 or photo == 3:
            raise NotImplementedError(
                "float TIFF with planar-2/palette layouts "
                "not supported"
            )
    tiled = _T_TILE_OFFSETS in tags
    if planar not in (1, 2):
        raise NotImplementedError(
            f"planar configuration {planar} not supported"
        )
    if planar == 2 and (depth not in (8, 16) or spp < 2):
        raise NotImplementedError(
            "planar configuration 2 supported for multi-sample "
            "8/16-bit images only"
        )
    if planar == 2 and tiled:
        raise NotImplementedError(
            "tiled + planar-2 TIFF not supported"
        )
    # tiled CCITT (comp 2/3/4): each tile is an independent fax
    # bitstream at TILE geometry — decompress() takes per-chunk cols
    if photo == 6 and comp != 7:
        raise NotImplementedError(
            "photometric 6 (YCbCr) supported only under JPEG "
            "compression (7)"
        )
    if photo not in (0, 1, 2, 3, 6):
        raise NotImplementedError(
            f"photometric {photo} not supported (0/1/2/3/6 only)"
        )
    if photo == 2 and spp < 3:
        raise ValueError("RGB photometric with SamplesPerPixel < 3")
    if comp == 7:
        if depth != 8:
            raise NotImplementedError(
                f"JPEG-in-TIFF supports 8-bit samples (depth={depth})"
            )
        if planar == 2 or photo == 3 or predictor != 1:
            raise NotImplementedError(
                "JPEG-in-TIFF with planar-2 / palette / predictor "
                "layouts not supported"
            )
        rgb = _decode_tiff_jpeg(payload, tags, width, height)
        return (255 - rgb) if photo == 0 else rgb
    def decompress(
        chunk: bytes, expect: int, label: str, cols: int | None = None
    ) -> bytes:
        # cols: coded row width of THIS chunk (tile width for tiled
        # layouts; defaults to the image width for strips)
        if cols is None:
            cols = width
        if comp in (2, 3, 4):
            from cdc_2025_spark.multimodal.ccitt import (  # noqa: PLC0415
                decode_g3,
                decode_g4,
                decode_mh,
            )

            rb = (cols + 7) // 8
            if expect % rb:
                raise ValueError(
                    f"CCITT {label} expects {expect} bytes, not a "
                    f"multiple of the {rb}-byte row"
                )
            rows = expect // rb
            if comp == 3:
                bits_arr = decode_g3(
                    bytes(chunk), cols, rows,
                    two_d=bool(t4opts & 1),
                )
            else:
                dec = decode_g4 if comp == 4 else decode_mh
                bits_arr = dec(bytes(chunk), cols, rows)
            return np.packbits(bits_arr, axis=1).tobytes()
        if comp == 32773:
            return _packbits_decode(chunk, expect)
        if comp == 5:
            return _lzw_decode_tiff(chunk, expect)
        if comp in (8, 32946):
            import zlib  # noqa: PLC0415

            out = zlib.decompress(chunk)
            if len(out) < expect:
                raise ValueError(
                    f"Deflate {label} decoded {len(out)} of "
                    f"{expect} bytes"
                )
            return out[:expect]
        if len(chunk) < expect:
            raise ValueError(
                f"{label} holds {len(chunk)} of {expect} bytes"
            )
        return chunk[:expect]

    def unpack(raw: bytes, rows: int, cols: int, nspp: int):
        """Bytes -> (rows, cols, nspp) NATIVE-domain sample grid
        (uint8 for depths <= 8, uint16 for 16)."""
        if depth == 8:
            return np.frombuffer(
                raw, dtype=np.uint8, count=rows * cols * nspp
            ).reshape(rows, cols, nspp)
        if depth == 16:
            return np.frombuffer(
                raw,
                dtype=np.dtype(e + "u2"),
                count=rows * cols * nspp,
            ).reshape(rows, cols, nspp)
        if depth == 32:  # float32 (SampleFormat 3, guarded above)
            return np.frombuffer(
                raw,
                dtype=np.dtype(e + "f4"),
                count=rows * cols * nspp,
            ).reshape(rows, cols, nspp)
        rb = (cols * depth + 7) // 8
        b = np.frombuffer(
            raw, dtype=np.uint8, count=rows * rb
        ).reshape(rows, rb)
        shifts = np.arange(8 - depth, -1, -depth)
        vals = (b[:, :, None] >> shifts[None, None, :]) & (
            (1 << depth) - 1
        )
        return (
            vals.reshape(rows, -1)[:, :cols]
            .astype(np.uint8)
            .reshape(rows, cols, 1)
        )

    if tiled:
        tw = one(_T_TILE_W)
        tl = one(_T_TILE_L)
        offsets = tags.get(_T_TILE_OFFSETS)
        counts = tags.get(_T_TILE_COUNTS)
        across = -(-width // tw)
        down = -(-height // tl)
        if not counts or len(offsets) != len(counts):
            raise ValueError("TIFF tile offsets/counts uneven")
        if len(offsets) != across * down:
            raise ValueError(
                f"TIFF holds {len(offsets)} tiles, geometry needs "
                f"{across * down}"
            )
        # tiles are FULL tw x tl even at edges (padded per spec)
        tile_bytes = tl * ((tw * spp * depth + 7) // 8)
        grid = np.zeros(
            (down * tl, across * tw, spp),
            dtype=np.float32
            if depth == 32
            else (np.uint16 if depth == 16 else np.uint8),
        )
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = decompress(
                payload[off : off + cnt],
                tile_bytes,
                f"tile {t}",
                cols=tw,
            )
            if predictor == 2:
                raw = _undo_predictor2(raw, tl, tw, spp)
            elif predictor == 3:
                raw = _undo_predictor3(raw, tl, tw, spp, e)
            ty, tx = divmod(t, across)
            grid[
                ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw
            ] = unpack(raw, tl, tw, spp)
        samples = grid[:height, :width]
    else:
        offsets = tags.get(_T_STRIP_OFFSETS)
        counts = tags.get(_T_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError(
                "TIFF strip offsets/counts missing or uneven"
            )
        rps = one(_T_ROWS_PER_STRIP, default=height)
        strips_per_plane = -(-height // rps)
        n_planes = spp if planar == 2 else 1
        plane_spp = 1 if planar == 2 else spp
        if planar == 2 and len(offsets) != strips_per_plane * spp:
            raise ValueError(
                f"planar-2 TIFF holds {len(offsets)} strips, "
                f"geometry needs {strips_per_plane * spp}"
            )
        # rows pack MSB-first and pad to a byte boundary (§4)
        row_bytes = (width * plane_spp * depth + 7) // 8
        planes = []
        for pl in range(n_planes):
            raw = bytearray()
            rows_left = height
            base = pl * strips_per_plane if planar == 2 else 0
            n_strips = (
                strips_per_plane if planar == 2 else len(offsets)
            )
            for si in range(n_strips):
                off = offsets[base + si]
                cnt = counts[base + si]
                strip_rows = min(rps, rows_left)
                rows_left -= strip_rows
                expect = strip_rows * row_bytes
                strip = decompress(
                    payload[off : off + cnt],
                    expect,
                    f"strip {base + si}",
                )
                if predictor == 2:
                    strip = _undo_predictor2(
                        strip, strip_rows, width, plane_spp
                    )
                elif predictor == 3:
                    strip = _undo_predictor3(
                        strip, strip_rows, width, plane_spp, e
                    )
                raw += strip
            planes.append(
                unpack(bytes(raw), height, width, plane_spp)
            )
        samples = (
            np.concatenate(planes, axis=2)
            if planar == 2
            else planes[0]
        )
    if depth == 32:
        # float display convention: linear [0, 1] clamp -> 8-bit
        # (the HDR-preview mapping; round(v * 255) inverts a v/255
        # quantized image exactly)
        px = np.round(
            np.clip(samples.astype(np.float64), 0.0, 1.0) * 255.0
        ).astype(np.uint8)
    elif depth == 16:
        # display scaling, the PNG 16-bit twin formula: round
        # (v * 255 / 65535) — a x257-widened 8-bit image inverts
        # exactly (65535 = 257 * 255)
        px = np.round(
            samples.astype(np.float64) * 255.0 / 65535.0
        ).astype(np.uint8)
    elif depth in (1, 2, 4) and photo != 3:
        # exact display scaling: 255 / (2^d - 1) is integral
        px = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        px = samples.astype(np.uint8)
    if photo == 2:
        return px[:, :, :3].copy()  # extra samples (alpha) dropped
    idx = px[:, :, 0]
    if photo == 3:
        cmap = tags.get(_T_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF without a ColorMap")
        n = len(cmap) // 3
        if int(idx.max()) >= n:
            raise ValueError(
                f"palette index {int(idx.max())} out of range ({n})"
            )
        table = (
            np.asarray(cmap, dtype=np.uint32)
            .reshape(3, n)
            .T
            >> 8
        ).astype(np.uint8)  # 16-bit channels -> 8-bit per spec
        return table[idx].copy()
    g = (255 - idx) if photo == 0 else idx  # WhiteIsZero inverts
    return np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8).copy()


def encode_tiff(
    rgb=None,
    gray=None,
    palette=None,
    indices=None,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    white_is_zero: bool = False,
    predictor: int = 1,
    bits: int = 8,
    tile_size: tuple[int, int] | None = None,
    planar: int = 1,
    t4_two_d: bool = False,
    jpeg_quality: int = 88,
    jpeg_tables: bool = False,
    sample_format: int = 1,
) -> bytes:
    """Build a TIFF: pass exactly one of ``rgb`` ((h, w, 3) ints),
    ``gray`` ((h, w) ints), or ``palette`` (list of (r,g,b)) +
    ``indices`` ((h, w) ints). ``compression``: 1 (none), 2
    (CCITT MH 1D RLE), 3 (CCITT G3/T.4 with EOLs; ``t4_two_d``
    selects the 2D flavor, recorded in T4Options) or 4 (CCITT G4
    2D) — all 1-bit gray only,
    the fax/scanned-document codings — 5 (LZW), 8 (Deflate) or
    32773 (PackBits); ``predictor=2`` adds horizontal
    differencing before LZW/Deflate (8-bit samples only — the layout
    real LZW writers emit). ``bits``: 1/2/4/8 for gray (values in
    0..2^bits-1, MSB-first packed, rows byte-padded — the fax/scan
    depths) and palette indices, 8/16 for gray/RGB (16-bit samples
    in file byte order — the studio depth). Multi-strip when
    ``rows_per_strip`` is set — the layout archival scanners emit.
    ``tile_size=(tw, tl)`` writes the TILED layout (tags 322-325;
    edge tiles zero-padded to full size per spec) instead of
    strips; ``planar=2`` stores each sample in its own strip
    sequence (PlanarConfiguration 2, multi-sample 8/16-bit only)."""
    import numpy as np  # noqa: PLC0415

    e = ">" if big_endian else "<"
    modes = sum(x is not None for x in (rgb, gray, palette))
    if modes != 1:
        raise ValueError("pass exactly one of rgb / gray / palette")
    if compression not in (1, 2, 3, 4, 5, 7, 8, 32773):
        raise ValueError(
            f"compression must be 1/2/3/4/5/7/8/32773, "
            f"got {compression}"
        )
    if compression in (2, 3, 4) and (bits != 1 or gray is None):
        raise ValueError(
            f"CCITT compression {compression} applies to 1-bit "
            "gray images"
        )
    if compression == 7 and (bits != 8 or palette is not None
                             or planar != 1):
        raise ValueError(
            "JPEG compression (7) applies to 8-bit chunky "
            "gray/RGB images"
        )
    if jpeg_tables and compression != 7:
        raise ValueError("jpeg_tables applies to compression 7 only")
    if t4_two_d and compression != 3:
        raise ValueError("t4_two_d applies to compression 3 only")
    if predictor not in (1, 2, 3):
        raise ValueError(
            f"predictor must be 1, 2 or 3, got {predictor}"
        )
    if predictor == 2 and compression not in (5, 8):
        raise ValueError("predictor 2 pairs with LZW/Deflate only")
    if predictor == 2 and bits != 8:
        raise ValueError("predictor 2 pairs with 8-bit samples only")
    if sample_format not in (1, 3):
        raise ValueError(
            f"sample_format must be 1 (unsigned) or 3 (IEEE "
            f"float), got {sample_format}"
        )
    if (sample_format == 3) != (bits == 32):
        raise ValueError(
            "float samples are 32-bit: pass sample_format=3 with "
            "bits=32 (and only then)"
        )
    if sample_format == 3 and (
        palette is not None or planar != 1 or white_is_zero
        or compression not in (1, 5, 8)
    ):
        raise ValueError(
            "float TIFF supports chunky gray/RGB with "
            "uncompressed/LZW/Deflate only"
        )
    if predictor == 3 and (
        sample_format != 3 or compression not in (5, 8)
    ):
        raise ValueError(
            "predictor 3 pairs with float samples under "
            "LZW/Deflate only"
        )
    if bits not in (1, 2, 4, 8, 16, 32):
        raise ValueError(f"bits must be 1/2/4/8/16/32, got {bits}")
    if tile_size is not None and rows_per_strip is not None:
        raise ValueError("pass tile_size OR rows_per_strip, not both")
    if tile_size is not None and planar != 1:
        raise ValueError("tiled + planar-2 not supported")
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    if planar == 2 and (rgb is None or bits not in (8, 16)):
        raise ValueError(
            "planar 2 applies to multi-sample 8/16-bit images"
        )

    def _pack_plane(plane: "np.ndarray") -> bytes:
        """Pack an (h, w) integer plane at ``bits`` depth: MSB-first
        within a byte, each row padded to a byte boundary."""
        if bits == 8:
            return plane.astype(np.uint8).tobytes()
        if bits == 16:
            return plane.astype(np.dtype(e + "u2")).tobytes()
        if int(plane.max(initial=0)) >= (1 << bits):
            raise ValueError(
                f"sample {int(plane.max())} out of range for "
                f"{bits}-bit depth"
            )
        hh, ww = plane.shape
        per_byte = 8 // bits
        padded_w = -(-ww // per_byte) * per_byte
        padded = np.zeros((hh, padded_w), dtype=np.uint8)
        padded[:, :ww] = plane
        shifts = np.arange(8 - bits, -1, -bits)
        groups = padded.reshape(hh, -1, per_byte)
        return (
            (groups << shifts[None, None, :]).sum(axis=2)
            .astype(np.uint8)
            .tobytes()
        )

    if rgb is not None:
        if bits not in (8, 16, 32):
            raise ValueError(
                "RGB supports 8/16-bit (or 32-bit float) samples"
            )
        arr = np.asarray(rgb)
        h, w, spp = arr.shape
        photo = 2
        sample_arr = arr
    elif gray is not None:
        arr = np.asarray(gray)
        h, w = arr.shape
        spp = 1
        photo = 0 if white_is_zero else 1
        full = 255 if bits == 8 else (1 << bits) - 1
        sample_arr = ((full - arr) if white_is_zero else arr)[
            :, :, None
        ]
    else:
        if indices is None:
            raise ValueError("palette mode needs indices")
        if bits == 16:
            raise ValueError("palette indices are at most 8-bit")
        arr = np.asarray(indices)
        h, w = arr.shape
        spp = 1
        photo = 3
        if not 2 <= len(palette) <= 256:
            raise ValueError("palette must hold 2..256 colors")
        if int(arr.max()) >= min(len(palette), 1 << bits):
            raise ValueError("palette index out of range")
        sample_arr = arr[:, :, None]

    def pack_rows(block) -> bytes:
        """(rows, cols, nspp) native-domain block -> packed bytes
        (row-interleaved samples; sub-byte MSB-first padded rows)."""
        if bits == 8:
            return np.ascontiguousarray(block).astype(
                np.uint8
            ).tobytes()
        if bits == 16:
            return np.ascontiguousarray(block).astype(
                np.dtype(e + "u2")
            ).tobytes()
        if bits == 32:  # float32 (sample_format 3, guarded above)
            return np.ascontiguousarray(block).astype(
                np.dtype(e + "f4")
            ).tobytes()
        return _pack_plane(np.ascontiguousarray(block[:, :, 0]))

    def compress_segment(raw: bytes, rows: int, cols: int, nspp: int,
                         block=None):
        if compression == 7:
            from cdc_2025_spark.multimodal.jpeg import (  # noqa: PLC0415
                encode_jpeg,
            )

            px = np.ascontiguousarray(block).astype(np.uint8)
            if px.shape[2] == 1:  # gray -> replicated RGB, Y == gray
                px = np.repeat(px, 3, axis=2)
            return encode_jpeg(
                px, subsampling="4:4:4", quality=jpeg_quality
            )
        if predictor == 2:
            raw = _apply_predictor2(raw, rows, cols, nspp)
        elif predictor == 3:
            raw = _apply_predictor3(raw, rows, cols, nspp, e)
        if compression in (2, 3, 4):
            from cdc_2025_spark.multimodal.ccitt import (  # noqa: PLC0415
                encode_g3,
                encode_g4,
                encode_mh,
            )

            rb = (cols + 7) // 8
            b = np.frombuffer(
                raw, dtype=np.uint8, count=rows * rb
            ).reshape(rows, rb)
            bits_arr = np.unpackbits(b, axis=1)[:, :cols]
            if compression == 3:
                return encode_g3(bits_arr, two_d=t4_two_d)
            enc = encode_g4 if compression == 4 else encode_mh
            return enc(bits_arr)
        if compression == 32773:
            return _packbits_encode(raw)
        if compression == 5:
            return _lzw_encode_tiff(raw)
        if compression == 8:
            import zlib  # noqa: PLC0415

            return zlib.compress(raw, 6)
        return raw

    strips = []
    if tile_size is not None:
        tw, tl = tile_size
        if tw <= 0 or tl <= 0:
            raise ValueError("tile dimensions must be positive")
        across, down = -(-w // tw), -(-h // tl)
        padded = np.zeros(
            (down * tl, across * tw, spp), dtype=sample_arr.dtype
        )
        padded[:h, :w] = sample_arr
        for ty in range(down):
            for tx in range(across):
                block = padded[
                    ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw
                ]
                strips.append(
                    compress_segment(
                        pack_rows(block), tl, tw, spp, block=block
                    )
                )
    elif planar == 2:
        rps = rows_per_strip or h
        for c in range(spp):
            for y0 in range(0, h, rps):
                y1 = min(y0 + rps, h)
                block = sample_arr[y0:y1, :, c : c + 1]
                strips.append(
                    compress_segment(
                        pack_rows(block), y1 - y0, w, 1, block=block
                    )
                )
    else:
        rps = rows_per_strip or h
        for y0 in range(0, h, rps):
            y1 = min(y0 + rps, h)
            block = sample_arr[y0:y1]
            strips.append(
                compress_segment(pack_rows(block), y1 - y0, w, spp,
                                 block=block)
            )

    jpegtables_stream = None
    if jpeg_tables:
        # abbreviated layout (TechNote 2): hoist the shared DQT/DHT
        # segments into one JPEGTables stream, strips keep the rest
        abbrs = []
        for s in strips:
            t, a = _split_jpeg_tables(s)
            if jpegtables_stream is None:
                jpegtables_stream = t
            elif t != jpegtables_stream:
                raise ValueError("per-segment JPEG tables diverge")
            abbrs.append(a)
        strips = abbrs
    if compression == 7 and photo == 2:
        photo = 6  # encode_jpeg codes YCbCr (JFIF) — record it

    entries = []  # (tag, type, count, values)
    entries.append((_T_WIDTH, 4, 1, [w]))
    entries.append((_T_HEIGHT, 4, 1, [h]))
    entries.append((_T_BITS, 3, spp, [bits] * spp))
    entries.append((_T_COMPRESSION, 3, 1, [compression]))
    if compression == 3:
        entries.append(
            (_T_T4OPTIONS, 4, 1, [1 if t4_two_d else 0])
        )
    entries.append((_T_PHOTOMETRIC, 3, 1, [photo]))
    entries.append((_T_SPP, 3, 1, [spp]))
    if photo == 6:
        entries.append((_T_YCBCR_SUB, 3, 2, [1, 1]))  # 4:4:4
    if jpegtables_stream is not None:
        entries.append(
            (_T_JPEGTABLES, 7, len(jpegtables_stream),
             list(jpegtables_stream))
        )
    if tile_size is not None:
        offsets_tag = _T_TILE_OFFSETS
        entries.append((_T_TILE_W, 4, 1, [tw]))
        entries.append((_T_TILE_L, 4, 1, [tl]))
        entries.append((offsets_tag, 4, len(strips), None))
        entries.append(
            (_T_TILE_COUNTS, 4, len(strips), [len(s) for s in strips])
        )
    else:
        offsets_tag = _T_STRIP_OFFSETS
        entries.append((offsets_tag, 4, len(strips), None))
        entries.append((_T_ROWS_PER_STRIP, 4, 1, [rps]))
        entries.append(
            (_T_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips])
        )
    if planar == 2:
        entries.append((_T_PLANAR, 3, 1, [2]))
    if predictor in (2, 3):
        entries.append((_T_PREDICTOR, 3, 1, [predictor]))
    if sample_format == 3:
        entries.append((_T_SAMPLEFORMAT, 3, spp, [3] * spp))
    cmap_vals = None
    if photo == 3:
        n = len(palette)
        cmap_vals = (
            [r << 8 for r, _, _ in palette] + [0] * (0)
            + [g << 8 for _, g, _ in palette]
            + [b << 8 for _, _, b in palette]
        )
        entries.append((_T_COLORMAP, 3, 3 * n, cmap_vals))
    entries.sort(key=lambda t: t[0])

    # layout: header(8) + IFD + overflow values + strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_bytes(typ, vals):
        if typ == 7:
            return bytes(vals)
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(_struct.pack(e + fmt, v) for v in vals)

    # first pass: compute overflow sizes (strip offsets resolved after)
    sizes = {}
    for tag, typ, cnt, vals in entries:
        sizes[tag] = _TYPE_SIZES[typ] * cnt
    data_off = overflow_off + sum(s for s in sizes.values() if s > 4)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    ifd = bytearray()
    ifd += _struct.pack(e + "H", len(entries))
    for tag, typ, cnt, vals in entries:
        if tag == offsets_tag:
            vals = strip_offsets
        vb = value_bytes(typ, vals)
        ifd += _struct.pack(e + "HHI", tag, typ, cnt)
        if len(vb) <= 4:
            ifd += vb.ljust(4, b"\x00")
        else:
            ifd += _struct.pack(e + "I", overflow_off + len(overflow))
            overflow += vb
    ifd += _struct.pack(e + "I", 0)  # no next IFD

    header = (b"MM\x00*" if big_endian else b"II*\x00") + _struct.pack(
        e + "I", ifd_off
    )
    return header + bytes(ifd) + bytes(overflow) + b"".join(strips)


def make_tiff(
    width: int,
    height: int,
    seed: int = 0,
    mode: str = "gray",
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    predictor: int = 1,
) -> bytes:
    """Deterministic seeded-pattern TIFF twins of the other builders:
    ``gray`` uses the PNG gray formula (decodes equal to the gray-PNG
    twin), ``rgb`` the BMP pattern (decodes equal to the BMP twin),
    ``palette`` the shared 16-entry table + (x+y+seed)%16 indices
    (decodes equal to the palette-PNG/GIF twins)."""
    import numpy as np  # noqa: PLC0415

    if mode == "gray":
        g = np.fromfunction(
            lambda y, x: (x * 13 + y * 17 + seed * 3) % 256,
            (height, width),
        ).astype(np.uint8)
        return encode_tiff(
            gray=g,
            compression=compression,
            rows_per_strip=rows_per_strip,
            big_endian=big_endian,
            predictor=predictor,
        )
    if mode == "rgb":
        r = np.fromfunction(
            lambda y, x: (x * 13 + y * 17 + seed * 3) % 256,
            (height, width),
        )
        g = np.fromfunction(
            lambda y, x: (x * 5 + y * 11 + seed * 2) % 256,
            (height, width),
        )
        b = np.fromfunction(
            lambda y, x: (x * 7 + y * 3 + seed) % 256,
            (height, width),
        )
        return encode_tiff(
            rgb=np.stack([r, g, b], axis=2).astype(np.uint8),
            compression=compression,
            rows_per_strip=rows_per_strip,
            big_endian=big_endian,
            predictor=predictor,
        )
    if mode == "palette":
        plte = [
            ((i * 16 + 3) % 256, (i * 31 + 7) % 256, (i * 5 + 11) % 256)
            for i in range(16)
        ]
        idx = np.fromfunction(
            lambda y, x: (x + y + seed) % 16, (height, width)
        ).astype(np.uint8)
        return encode_tiff(
            palette=plte,
            indices=idx,
            compression=compression,
            rows_per_strip=rows_per_strip,
            big_endian=big_endian,
            predictor=predictor,
        )
    raise ValueError(f"unknown mode {mode!r}")
