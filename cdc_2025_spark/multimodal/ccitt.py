"""CCITT Group 4 (ITU-T T.6 MMR) codec for 1-bit TIFF strips — the
fax/scanned-document compression (TIFF compression tag 4).

Spec-derived from the public ITU-T T.4/T.6 recommendations (the
modified-Huffman run tables are T.4 Tables 1-3; the 2D vertical /
horizontal / pass mode codes are T.6 §2.2.4): every line is coded
against the previous (reference) line — an imaginary all-white line
above the first — via three modes:

- VERTICAL  (|a1 - b1| <= 3): one short code per edge that nearly
  aligns with an edge above — the mode that makes text/line art tiny;
- HORIZONTAL ("001" + MH(run) + MH(run)): two modified-Huffman run
  lengths where the line diverges from the reference;
- PASS ("0001"): the reference has an excursion the coding line
  skips entirely.

Pure MMR (no EOL-per-line, the TIFF flavor); an EOFB terminates the
strip. Works in the FILE bit domain: bit 0 opens each line's runs
(the fax "white"), bit 1 is ink — photometric display mapping is the
container's job, not the codec's.

The run tables are validated at import: prefix-freeness of every
(mode + white + black) code set is asserted, so a transcription
collision is an import error, not a silent mis-decode; spec-pinned
spot values (white 0 = 00110101, black 1 = 010, EOL =
000000000001, ...) are additionally asserted in test_ccitt.py.
"""

from __future__ import annotations

# T.4 Table 1: white terminating codes (run 0..63)
_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110",
    "1111", "10011", "10100", "00111", "01000", "001000", "000011",
    "110100", "110101", "101010", "101011", "0100111", "0001100",
    "0001000", "0010111", "0000011", "0000100", "0101000", "0101011",
    "0010011", "0100100", "0011000", "00000010", "00000011",
    "00011010", "00011011", "00010010", "00010011", "00010100",
    "00010101", "00010110", "00010111", "00101000", "00101001",
    "00101010", "00101011", "00101100", "00101101", "00000100",
    "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000",
    "01011001", "01011010", "01011011", "01001010", "01001011",
    "00110010", "00110011", "00110100",
]

# T.4 Table 2: white makeup codes (run 64..1728 step 64)
_WHITE_MAKEUP = [
    "11011", "10010", "010111", "0110111", "00110110", "00110111",
    "01100100", "01100101", "01101000", "01100111", "011001100",
    "011001101", "011010010", "011010011", "011010100", "011010101",
    "011010110", "011010111", "011011000", "011011001", "011011010",
    "011011011", "010011000", "010011001", "010011010", "011000",
    "010011011",
]

# T.4 Table 1: black terminating codes (run 0..63)
_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000",
    "0000001000", "00001100111", "00001101000", "00001101100",
    "00000110111", "00000101000", "00000010111", "00000011000",
    "000011001010", "000011001011", "000011001100", "000011001101",
    "000001101000", "000001101001", "000001101010", "000001101011",
    "000011010010", "000011010011", "000011010100", "000011010101",
    "000011010110", "000011010111", "000001101100", "000001101101",
    "000011011010", "000011011011", "000001010100", "000001010101",
    "000001010110", "000001010111", "000001100100", "000001100101",
    "000001010010", "000001010011", "000000100100", "000000110111",
    "000000111000", "000000100111", "000000101000", "000001011000",
    "000001011001", "000000101011", "000000101100", "000001011010",
    "000001100110", "000001100111",
]

# T.4 Table 2: black makeup codes (run 64..1728 step 64)
_BLACK_MAKEUP = [
    "0000001111", "000011001000", "000011001001", "000001011011",
    "000000110011", "000000110100", "000000110101", "0000001101100",
    "0000001101101", "0000001001010", "0000001001011",
    "0000001001100", "0000001001101", "0000001110010",
    "0000001110011", "0000001110100", "0000001110101",
    "0000001110110", "0000001110111", "0000001010010",
    "0000001010011", "0000001010100", "0000001010101",
    "0000001011010", "0000001011011", "0000001100100",
    "0000001100101",
]

# T.4 Table 3: extended makeup codes shared by both colors
# (run 1792..2560 step 64)
_EXT_MAKEUP = [
    "00000001000", "00000001100", "00000001101", "000000010010",
    "000000010011", "000000010100", "000000010101", "000000010110",
    "000000010111", "000000011100", "000000011101", "000000011110",
    "000000011111",
]

# T.6 §2.2.4 two-dimensional mode codes
_MODE_V0 = "1"
_MODE_VR = {1: "011", 2: "000011", 3: "0000011"}
_MODE_VL = {1: "010", 2: "000010", 3: "0000010"}
_MODE_H = "001"
_MODE_P = "0001"
_EOL = "000000000001"

# encode maps: run -> code, per color (0 = white, 1 = black)
_TERM = {0: _WHITE_TERM, 1: _BLACK_TERM}
_MAKEUP = {
    0: {64 * (i + 1): c for i, c in enumerate(_WHITE_MAKEUP)},
    1: {64 * (i + 1): c for i, c in enumerate(_BLACK_MAKEUP)},
}
for _i, _c in enumerate(_EXT_MAKEUP):
    _MAKEUP[0][1792 + 64 * _i] = _c
    _MAKEUP[1][1792 + 64 * _i] = _c

# decode maps: code -> run
_RUN_DEC = {
    0: {c: r for r, c in enumerate(_WHITE_TERM)},
    1: {c: r for r, c in enumerate(_BLACK_TERM)},
}
for _color in (0, 1):
    for _run, _code in _MAKEUP[_color].items():
        _RUN_DEC[_color][_code] = _run

_MODE_DEC = {
    _MODE_V0: ("v", 0),
    _MODE_VR[1]: ("v", 1),
    _MODE_VR[2]: ("v", 2),
    _MODE_VR[3]: ("v", 3),
    _MODE_VL[1]: ("v", -1),
    _MODE_VL[2]: ("v", -2),
    _MODE_VL[3]: ("v", -3),
    _MODE_H: ("h", 0),
    _MODE_P: ("p", 0),
    _EOL: ("eol", 0),
}


def _assert_prefix_free(codes) -> None:
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        if b.startswith(a):
            raise AssertionError(f"prefix collision {a} / {b}")


_assert_prefix_free(list(_MODE_DEC))
_assert_prefix_free(list(_RUN_DEC[0]))
_assert_prefix_free(list(_RUN_DEC[1]))
# horizontal-mode run codes are read AFTER the mode code, so the two
# namespaces never mix; each must only be prefix-free on its own.


class _BitWriter:
    def __init__(self) -> None:
        self._bits: list[str] = []

    def write(self, code: str) -> None:
        self._bits.append(code)

    def tobytes(self) -> bytes:
        s = "".join(self._bits)
        pad = (-len(s)) % 8
        s += "0" * pad
        return bytes(
            int(s[i : i + 8], 2) for i in range(0, len(s), 8)
        )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._n = len(data) * 8

    def exhausted(self) -> bool:
        return self._pos >= self._n

    def align_byte(self) -> None:
        self._pos = (self._pos + 7) & ~7

    def next_bit(self) -> str:
        if self._pos >= self._n:
            raise ValueError("CCITT G4 stream truncated")
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return "1" if bit else "0"

    def read_code(self, table: dict, what: str):
        acc = ""
        for _ in range(14):  # longest code is 13 bits
            acc += self.next_bit()
            if acc in table:
                return table[acc]
        raise ValueError(f"invalid CCITT G4 {what} code {acc!r}")


def _emit_run(w: _BitWriter, run: int, color: int) -> None:
    if run < 0:
        raise ValueError(f"negative run {run}")
    while run > 2560 + 63:
        w.write(_MAKEUP[color][2560])
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        w.write(_MAKEUP[color][makeup])
        run -= makeup
    w.write(_TERM[color][run])


def _read_run(r: _BitReader, color: int) -> int:
    """makeup* + terminating: accumulate until a code < 64 closes
    the run (T.4 allows chained makeups for runs beyond 2623)."""
    total = 0
    while True:
        v = r.read_code(_RUN_DEC[color], "run")
        total += v
        if v < 64:
            return total


def _changes(row) -> list[int]:
    """Positions where the bit flips, sentinel-padded with width."""
    import numpy as np  # noqa: PLC0415

    w = len(row)
    idx = (np.flatnonzero(row[1:] != row[:-1]) + 1).tolist()
    if len(row) and row[0] != 0:
        idx = [0, *idx]  # line opening in black = zero-length white
    return [*idx, w, w, w]


def _b1_b2(ref: list[int], a0: int, color: int, w: int):
    """b1: first reference transition right of a0 whose NEW color is
    opposite to the coding color; b2: the next one after it."""
    # ref transitions alternate starting with white->black, so the
    # transition at ref[i] flips TO black when i is even
    i = 0
    while ref[i] <= a0 or (i & 1) != color:
        if ref[i] >= w:
            break
        i += 1
    while (i & 1) != color:
        i += 1  # parity fix when we broke at the sentinel
    b1 = ref[i] if i < len(ref) else w
    b2 = ref[i + 1] if i + 1 < len(ref) else w
    return min(b1, w), min(b2, w)


def _code_line_2d(out: _BitWriter, cur, ref, w: int) -> None:
    """Emit one line's T.4/T.6 two-dimensional coding (vertical /
    horizontal / pass modes) of transition list ``cur`` against
    reference transitions ``ref`` — shared by G4 (every line) and
    G3-2D (lines whose tag bit says 2D)."""
    a0, color, ci = -1, 0, 0
    while a0 < w:
        # a1: first coding transition right of a0 flipping to
        # the opposite of the current color
        while cur[ci] <= a0 or (ci & 1) != color:
            if cur[ci] >= w:
                break
            ci += 1
        while (ci & 1) != color:
            ci += 1
        a1 = min(cur[ci], w)
        a2 = min(cur[ci + 1], w) if ci + 1 < len(cur) else w
        b1, b2 = _b1_b2(ref, a0, color, w)
        if b2 < a1:
            out.write(_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            if d == 0:
                out.write(_MODE_V0)
            elif d > 0:
                out.write(_MODE_VR[d])
            else:
                out.write(_MODE_VL[-d])
            a0 = a1
            color ^= 1
        else:
            out.write(_MODE_H)
            a0s = a0 if a0 > 0 else 0
            _emit_run(out, a1 - a0s, color)
            _emit_run(out, a2 - a1, color ^ 1)
            a0 = a2


def _code_line_1d(out: _BitWriter, cur, w: int) -> None:
    """Emit one line as alternating white/black MH runs starting
    white (the T.4 one-dimensional coding; no byte alignment —
    that is the TIFF compression-2 flavor's addition)."""
    pos, color, ci = 0, 0, 0
    while pos < w:
        nxt = min(cur[ci], w) if ci < len(cur) else w
        _emit_run(out, nxt - pos, color)
        pos = nxt
        color ^= 1
        ci += 1


def encode_g4(bits, width: int | None = None) -> bytes:
    """Encode an (h, w) 0/1 array as a CCITT G4 (T.6 MMR) block:
    pure 2D coding, EOFB-terminated, zero-padded to a byte."""
    import numpy as np  # noqa: PLC0415

    arr = np.asarray(bits, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_g4 wants an (h, w) bit array")
    if ((arr != 0) & (arr != 1)).any():
        raise ValueError("encode_g4 wants 0/1 samples")
    h, w = arr.shape
    if width is not None and width != w:
        raise ValueError(f"width {width} != array width {w}")
    out = _BitWriter()
    ref = [w, w, w]  # imaginary all-white reference line
    for y in range(h):
        cur = _changes(arr[y])
        _code_line_2d(out, cur, ref, w)
        ref = cur
    out.write(_EOL)
    out.write(_EOL)  # EOFB
    return out.tobytes()


def _decode_line_2d(r: _BitReader, ref, width: int, y: int, what: str):
    """Decode one two-dimensionally-coded line against reference
    transitions ``ref`` into a uint8 row — shared by G4 and G3-2D.
    An EOL mid-line is a stream error (G4 sees it only as EOFB; G3
    emits EOLs only BEFORE lines)."""
    import numpy as np  # noqa: PLC0415

    trans: list[int] = []
    a0, color = -1, 0
    while a0 < width:
        kind, d = r.read_code(_MODE_DEC, "mode")
        if kind == "eol":
            raise ValueError(
                f"premature EOL inside {what} line {y}"
            )
        if kind == "p":
            _b1, b2 = _b1_b2(ref, a0, color, width)
            a0 = b2
        elif kind == "v":
            b1, _b2 = _b1_b2(ref, a0, color, width)
            a1 = b1 + d
            if a1 < 0 or a1 > width or a1 <= a0:
                # a1 <= a0 never occurs in a valid stream and
                # would stall the line loop forever
                raise ValueError(f"{what} vertical out of range")
            trans.append(a1)
            a0 = a1
            color ^= 1
        else:  # horizontal
            a0s = a0 if a0 > 0 else 0
            run1 = _read_run(r, color)
            run2 = _read_run(r, color ^ 1)
            a1 = a0s + run1
            a2 = a1 + run2
            if a2 > width or (a0 >= 0 and a2 <= a0):
                # zero-advance horizontals (both runs 0 past the
                # line opening) would stall the loop forever
                raise ValueError(
                    f"{what} horizontal runs exceed width "
                    "or fail to advance"
                )
            trans.extend((a1, a2))
            a0 = a2
    trans = [t for t in trans if t < width]
    row = np.zeros(width, dtype=np.uint8)
    for i in range(0, len(trans), 2):
        start = trans[i]
        end = trans[i + 1] if i + 1 < len(trans) else width
        row[start:end] = 1
    return row


def _decode_line_1d(r: _BitReader, width: int, y: int, what: str):
    """Decode one one-dimensionally-coded line (alternating MH runs
    starting white) into a uint8 row."""
    import numpy as np  # noqa: PLC0415

    row = np.zeros(width, dtype=np.uint8)
    pos, color = 0, 0
    while pos < width:
        run = _read_run(r, color)
        if pos + run > width:
            raise ValueError(
                f"{what} run overflows row width at line {y}"
            )
        if color:
            row[pos : pos + run] = 1
        pos += run
        color ^= 1
    return row


def decode_g4(data: bytes, width: int, height: int):
    """Decode a CCITT G4 (T.6 MMR) block into an (height, width)
    uint8 0/1 array. Stops after ``height`` lines; trailing EOFB /
    padding is ignored; truncation or invalid codes raise."""
    import numpy as np  # noqa: PLC0415

    r = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    ref = [width, width, width]
    for y in range(height):
        row = _decode_line_2d(r, ref, width, y, "CCITT G4 strip")
        out[y] = row
        ref = _changes(row)
    return out


def encode_mh(bits) -> bytes:
    """TIFF compression 2 (CCITT "modified Huffman" RLE): each row
    coded independently as alternating white/black MH run lengths
    starting white, BYTE-ALIGNED at the start of every row (the
    TIFF flavor: no EOL codes, no 2D modes)."""
    import numpy as np  # noqa: PLC0415

    arr = np.asarray(bits, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_mh wants an (h, w) bit array")
    if ((arr != 0) & (arr != 1)).any():
        raise ValueError("encode_mh wants 0/1 samples")
    h, w = arr.shape
    out = bytearray()
    for y in range(h):
        row_w = _BitWriter()
        pos, color = 0, 0
        changes = _changes(arr[y])
        ci = 0
        while pos < w:
            nxt = changes[ci] if ci < len(changes) else w
            nxt = min(nxt, w)
            _emit_run(row_w, nxt - pos, color)
            pos = nxt
            color ^= 1
            ci += 1
        out += row_w.tobytes()  # byte-aligns each row
    return bytes(out)


def _expect_eol(r: _BitReader, y: int) -> None:
    """Consume one T.4 EOL (eleven-plus zeros then a one). Fill bits
    are extra leading zeros, so any number >= 11 is accepted; a one
    arriving earlier means the stream is not at an EOL boundary."""
    zeros = 0
    while True:
        if r.exhausted():
            raise ValueError(
                f"CCITT G3 stream truncated before line {y}'s EOL"
            )
        if r.next_bit() == "1":
            break
        zeros += 1
    if zeros < 11:
        raise ValueError(
            f"CCITT G3 expected EOL before line {y}, saw a 1 after "
            f"{zeros} zeros"
        )


def encode_g3(bits, two_d: bool = False, k: int = 2) -> bytes:
    """Encode an (h, w) 0/1 array as CCITT Group 3 (ITU-T T.4, TIFF
    compression 3): an EOL precedes every line, lines are MH
    one-dimensional by default; ``two_d=True`` writes the T.4 2D
    flavor (T4Options bit 0) — each EOL carries a tag bit, every
    ``k``-th line is coded 1D and the rest two-dimensionally against
    the previous line (K=2 is the standard-resolution fax rule).
    Ends with an RTC (six EOLs)."""
    import numpy as np  # noqa: PLC0415

    arr = np.asarray(bits, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError("encode_g3 wants an (h, w) bit array")
    if ((arr != 0) & (arr != 1)).any():
        raise ValueError("encode_g3 wants 0/1 samples")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h, w = arr.shape
    out = _BitWriter()
    ref = None
    for y in range(h):
        out.write(_EOL)
        one_d = (not two_d) or (y % k == 0)
        if two_d:
            out.write("1" if one_d else "0")
        cur = _changes(arr[y])
        if one_d:
            _code_line_1d(out, cur, w)
        else:
            _code_line_2d(out, cur, ref, w)
        ref = cur
    for _ in range(6):  # RTC
        out.write(_EOL)
        if two_d:
            out.write("1")
    return out.tobytes()


def decode_g3(
    data: bytes, width: int, height: int, two_d: bool = False
):
    """Decode a CCITT Group 3 (T.4) block into an (height, width)
    uint8 0/1 array: each line opens with an EOL (arbitrary zero
    fill bits tolerated before it); in the 2D flavor the EOL's tag
    bit selects 1D or 2D coding for the following line. Stops after
    ``height`` lines (the RTC is not required); truncation or
    invalid codes raise."""
    import numpy as np  # noqa: PLC0415

    r = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    ref = [width, width, width]
    for y in range(height):
        _expect_eol(r, y)
        one_d = True
        if two_d:
            one_d = r.next_bit() == "1"
        if one_d:
            row = _decode_line_1d(r, width, y, "CCITT G3 1D")
        else:
            row = _decode_line_2d(r, ref, width, y, "CCITT G3 2D")
        out[y] = row
        ref = _changes(row)
    return out


def decode_mh(data: bytes, width: int, height: int):
    """Decode TIFF compression-2 (MH RLE) data: byte-aligned rows of
    alternating white/black runs starting white."""
    import numpy as np  # noqa: PLC0415

    out = np.zeros((height, width), dtype=np.uint8)
    r = _BitReader(data)
    for y in range(height):
        r.align_byte()  # rows are byte-aligned: skip fill bits
        pos, color = 0, 0
        while pos < width:
            run = _read_run(r, color)
            if pos + run > width:
                raise ValueError(
                    f"MH run overflows row width at line {y}"
                )
            if color:
                out[y, pos : pos + run] = 1
            pos += run
            color ^= 1
    return out
