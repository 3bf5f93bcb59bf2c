"""FLAC (Free Lossless Audio Codec) — real, dependency-free encode +
decode kernels for the subset a training-data lake actually stores:
8/12/16/20/24/32-bit mono and stereo streams (independent, left/side,
right/side, and mid/side channel decorrelation — the side channel
carrying its spec-mandated extra sample bit), CONSTANT / VERBATIM /
FIXED(0-4) / LPC subframes, Rice-coded residuals with partitioning,
CRC-8 frame headers, CRC-16 frame footers, and the STREAMINFO MD5 of
the unencoded interleaved samples.

Everything here derives from the public format specification
(RFC 9639 / the xiph.org FLAC format document; reference behavior
cross-checked against the documented libFLAC bitstream layout):

- frame sync 0b11111111111110, blocking-strategy bit, block-size /
  sample-rate / channel / sample-size codes, UTF-8-style coded frame
  number, CRC-8 (poly 0x07) over the header;
- subframe types: 0 CONSTANT, 1 VERBATIM, 0b001ooo FIXED order o,
  0b1ooooo LPC order o+1 (4-bit precision-1, 5-bit signed shift,
  signed quantized coefficients), optional wasted-bits unary field;
- residual: 2-bit method (Rice 4-bit / Rice2 5-bit parameters),
  4-bit partition order, per-partition Rice parameter with the
  0b1111 (0b11111) escape to verbatim fixed-width residuals; Rice
  code = quotient in unary (q 0-bits then a 1) + low param bits;
  zigzag signed mapping (2n / -2n-1);
- frame footer CRC-16 (poly 0x8005) over the whole frame.

The encoder picks the best FIXED order per block by total residual
magnitude (the classic estimate), or a real LPC fit
(autocorrelation + Levinson-Durbin, quantized to the coded
precision/shift) when asked; losslessness is structural — the
decoder reverses the exact integer pipeline, so round-trips are
BIT-EXACT and pinned that way in tests/test_flac.py (the audio twin
of the progressive-JPEG exact-equality oracle).

Lake integration: multimodal/media.py routes b"fLaC" payloads to
decode_flac inside the Arrow-batched chunk-feature kernels, beside
the RIFF/WAVE real path; make_flac builds payload twins of make_wav
(same sine -> IDENTICAL samples after decode, the BMP/PNG twin story
for audio, which also makes cross-container dedup testable).
"""

from __future__ import annotations

import hashlib
import struct as _struct

# ---------------------------------------------------------------------------
# CRCs (spec polynomials, initial value 0)
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------------
# Bit I/O (big-endian/MSB-first, the FLAC byte order)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0, "unaligned"
        return bytes(self.out)


class _BitReader:
    """Buffered MSB-first reader: whole bytes accumulate into an int
    window, so fixed-width reads are one shift/mask and unary reads
    scan by bit_length instead of per-bit loops (~6x over the naive
    reader on Rice-dense streams — the decode hot path)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # next unread BYTE
        self.acc = 0
        self.n = 0  # buffered bit count

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8

    def read(self, bits: int) -> int:
        if bits == 0:
            return 0
        self._fill(bits)
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.n == 0:
                self._fill(8)
            if self.acc == 0:
                q += self.n  # every buffered bit is a zero
                self.n = 0
                continue
            top = self.acc.bit_length()
            q += self.n - top  # leading zeros in the window
            self.n = top - 1  # consume them plus the 1 bit
            self.acc &= (1 << self.n) - 1
            return q

    def align(self) -> None:
        drop = self.n % 8
        if drop:
            self.n -= drop
            self.acc &= (1 << self.n) - 1

    def byte_pos(self) -> int:
        """Byte offset of the next unconsumed bit (call after
        align(): buffered bits are then whole bytes)."""
        return self.pos - self.n // 8


# ---------------------------------------------------------------------------
# Rice residual coding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else (-(n << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def _best_rice_param(residual, max_param: int) -> int:
    """Smallest total-bits Rice parameter for a residual slice (exact
    cost scan — partitions are small, and the encoder is a test/twin
    surface, not the hot path)."""
    best_p, best_cost = 0, None
    zz = [_zigzag(int(r)) for r in residual]
    for p in range(max_param + 1):
        cost = sum((u >> p) + 1 + p for u in zz)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p


def _write_residual(bw: _BitWriter, residual, order: int) -> None:
    """Partition order 0 (one partition) — the simplest spec-legal
    layout; decoders must (and ours does) accept any partition order.
    Rice method 0 (4-bit parameters) when the best parameter fits;
    Rice2 (5-bit) when 24-bit-depth residuals want a larger one — a
    small parameter on wide residuals explodes the unary quotients."""
    p = _best_rice_param(residual, 30)
    if p <= 14:
        bw.write(0, 2)  # coding method: Rice, 4-bit params
        bw.write(0, 4)  # partition order 0 -> one partition
        bw.write(p, 4)
    else:
        bw.write(1, 2)  # coding method: Rice2, 5-bit params
        bw.write(0, 4)
        bw.write(p, 5)
    for r in residual:
        u = _zigzag(int(r))
        bw.write_unary(u >> p)
        bw.write(u & ((1 << p) - 1), p)


def _read_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("partition count does not divide block size")
    out: list[int] = []
    for part in range(n_parts):
        n = block_size // n_parts - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        p = br.read(pbits)
        if p == escape:
            width = br.read(5)
            out.extend(br.read_signed(width) if width else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << p) | (br.read(p) if p else 0)
                out.append(_unzigzag(u))
    return out


# ---------------------------------------------------------------------------
# Predictors
# ---------------------------------------------------------------------------

# FIXED predictor residual: r[i] = x[i] - sum(coef * past)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x, order: int) -> list[int]:
    c = _FIXED_COEFS[order]
    return [
        int(x[i]) - sum(c[j] * int(x[i - 1 - j]) for j in range(order))
        for i in range(order, len(x))
    ]


def _lpc_fit(x, order: int, precision: int = 12):
    """Autocorrelation + Levinson-Durbin, then coefficient
    quantization to (precision, shift) — the standard public LPC
    recipe. Returns (coefs, shift) or None when the block is too
    degenerate to fit (constant/near-silent)."""
    n = len(x)
    if n <= order:
        return None
    fx = [float(v) for v in x]
    ac = [
        sum(fx[i] * fx[i + lag] for i in range(n - lag))
        for lag in range(order + 1)
    ]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= lpc[j] * ac[i - j]
        k = acc / err
        prev = lpc[:i]
        for j in range(i):
            lpc[j] = prev[j] - k * prev[i - 1 - j]
        lpc[i] = k
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = max(abs(c) for c in lpc)
    if cmax == 0.0:
        return None
    # shift so the largest coefficient fills the coded precision;
    # clamp to the 5-bit non-negative field our decoder enforces
    import math

    shift = precision - 2 - int(math.floor(math.log2(cmax)))
    shift = max(1, min(15, shift))
    qmax = (1 << (precision - 1)) - 1
    qmin = -(1 << (precision - 1))
    coefs = []
    e = 0.0
    for c in lpc:
        v = c * (1 << shift) + e
        q = int(round(v))
        q = max(qmin, min(qmax, q))
        e = v - q
        coefs.append(q)
    return coefs, shift


def _lpc_residual(x, coefs, shift: int) -> list[int]:
    order = len(coefs)
    return [
        int(x[i])
        - (
            sum(coefs[j] * int(x[i - 1 - j]) for j in range(order))
            >> shift
        )
        for i in range(order, len(x))
    ]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

_BLOCK_SIZE = 4096
_BITS = 16


def _utf8_coded_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding — identical to standard
    UTF-8 for the values a frame index takes here (< 0xD800), so the
    stdlib encoder is exact; the decoder skips by continuation
    count, which covers the full 36-bit extension too."""
    if n < 0x80:
        return bytes([n])
    if n >= 0xD800:
        raise ValueError(f"frame number {n} beyond the encoder's range")
    return chr(n).encode("utf-8")


def _pack_sample(v: int, bits: int) -> bytes:
    """Little-endian signed sample bytes — the layout FLAC's
    STREAMINFO MD5 is defined over (ceil(bits/8) bytes per sample,
    LSB-aligned, channels interleaved)."""
    return v.to_bytes((bits + 7) // 8, "little", signed=True)


# frame-header channel-assignment codes (spec table)
_CH_INDEPENDENT_2 = 1
_CH_LEFT_SIDE = 8
_CH_RIGHT_SIDE = 9
_CH_MID_SIDE = 10

# 0b111 = 32-bit: reserved in the classic spec, defined by RFC 9639
_SS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
             32: 0b111}
_SS_BITS = {c: b for b, c in _SS_CODES.items()}


def encode_flac(
    samples,
    sample_rate: int = 8000,
    block_size: int = _BLOCK_SIZE,
    predictor: str = "fixed",
    lpc_order: int = 4,
    channels: int = 1,
    bits: int = 16,
    stereo_mode: str = "auto",
) -> bytes:
    """Integer PCM samples -> FLAC bytes. 1-8 channels (``samples``
    interleaved L,R,L,R for ``channels=2``, ch0..chN round-robin
    above that — the WAV data-chunk layout; >2 channels always code
    INDEPENDENTLY, the only assignment the spec defines for them),
    16- or 24-bit. ``predictor``: ``fixed`` picks the best
    FIXED order 0-4 per block by total residual magnitude; ``lpc``
    fits real LPC coefficients (Levinson-Durbin) with FIXED as the
    per-block fallback when the fit degenerates; ``verbatim`` forces
    uncompressed subframes (layout coverage).

    ``stereo_mode``: ``independent`` codes L and R as-is;
    ``mid-side`` / ``left-side`` / ``right-side`` code the spec's
    decorrelated pairs (the difference channel carries one extra
    sample bit, per spec); ``auto`` encodes each frame all FOUR ways
    and keeps the smallest — the per-frame decision real encoders
    make. Lossless by construction — decode_flac round-trips
    bit-exactly at every mode/depth."""
    if predictor not in ("fixed", "lpc", "verbatim"):
        raise ValueError(f"unknown predictor {predictor!r}")
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block_size out of range: {block_size}")
    if not 1 <= channels <= 8:
        raise NotImplementedError(
            f"FLAC allows 1-8 channels (channels={channels}); >2 "
            "channels code independently per spec"
        )
    if bits not in _SS_CODES:
        raise NotImplementedError(
            f"supported encode depths: {sorted(_SS_CODES)} "
            f"(bits={bits})"
        )
    if stereo_mode not in (
        "auto", "independent", "mid-side", "left-side", "right-side"
    ):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    xs = [int(v) for v in samples]
    if not xs:
        raise ValueError("empty sample stream")
    if len(xs) % channels:
        raise ValueError(
            f"{len(xs)} samples do not interleave {channels} channels"
        )
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    for v in xs:
        if not lo <= v <= hi:
            raise ValueError(f"sample {v} outside s{bits} range")
    md5 = hashlib.md5()
    md5.update(b"".join(_pack_sample(v, bits) for v in xs))

    frames = bytearray()
    total = len(xs) // channels  # interchannel samples
    n_blocks = (total + block_size - 1) // block_size
    for fi in range(n_blocks):
        lo_i = fi * block_size * channels
        blk = xs[lo_i : lo_i + block_size * channels]
        frames += _encode_frame(
            blk, fi, sample_rate, predictor, lpc_order,
            channels, bits, stereo_mode,
        )

    streaminfo = (
        _struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + _pack_streaminfo_tail(sample_rate, total, channels, bits)
        + md5.digest()
    )
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    return header + streaminfo + bytes(frames)


def _pack_streaminfo_tail(
    sample_rate: int, total: int, channels: int, bits: int
) -> bytes:
    """20-bit rate | 3-bit channels-1 | 5-bit bits-1 | 36-bit total
    (total counts INTERCHANNEL samples, per spec)."""
    v = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total
    )
    return v.to_bytes(8, "big")


# block-size codes the encoder can emit exactly
_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
             256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
             8192: 13, 16384: 14, 32768: 15}
_SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
             22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
             96000: 11}


def _stereo_candidates(left, right, mode: str):
    """(ch_code, [(channel samples, extra width bit), ...]) candidate
    list for one stereo frame. The side (difference) channel needs
    bits+1 sample bits, per spec; mid is the floored average whose
    dropped low bit the decoder recovers from side's parity."""
    side = [a - b for a, b in zip(left, right)]
    mid = [(a + b) >> 1 for a, b in zip(left, right)]
    by_mode = {
        "independent": (_CH_INDEPENDENT_2, [(left, 0), (right, 0)]),
        "left-side": (_CH_LEFT_SIDE, [(left, 0), (side, 1)]),
        "right-side": (_CH_RIGHT_SIDE, [(side, 1), (right, 0)]),
        "mid-side": (_CH_MID_SIDE, [(mid, 0), (side, 1)]),
    }
    if mode == "auto":
        # all four spec assignments, smallest frame wins — e.g. a
        # clean channel plus a noisy copy compresses best as
        # left/side (mid inherits half the noise), which a
        # two-candidate independent-vs-mid-side pick would miss
        return list(by_mode.values())
    return [by_mode[mode]]


def _encode_frame(
    blk, frame_no: int, sample_rate: int,
    predictor: str, lpc_order: int,
    channels: int = 1, bits: int = 16, stereo_mode: str = "auto",
) -> bytes:
    n = len(blk) // channels
    bs_code = _BS_CODES.get(n)
    if bs_code is None:
        bs_code = 7  # 16-bit block size - 1 follows header
    sr_code = _SR_CODES.get(sample_rate)
    if sr_code is None:
        sr_code = 13  # 16-bit rate in Hz follows (spec code 13)
        if not 0 < sample_rate <= 65535:
            raise ValueError(f"sample rate {sample_rate} not codable")

    if channels == 1:
        candidates = [(0, [(blk, 0)])]
    elif channels == 2:
        left, right = blk[0::2], blk[1::2]
        candidates = _stereo_candidates(left, right, stereo_mode)
    else:
        # >2 channels: independent coding only (ch_code = channels-1)
        candidates = [
            (
                channels - 1,
                [(blk[i::channels], 0) for i in range(channels)],
            )
        ]

    best = None
    for ch_code, subchannels in candidates:
        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])  # sync + reserved0 + fixed blocking
        hdr.append((bs_code << 4) | sr_code)
        hdr.append((ch_code << 4) | (_SS_CODES[bits] << 1))
        hdr += _utf8_coded_number(frame_no)
        if bs_code == 7:
            hdr += _struct.pack(">H", n - 1)
        if sr_code == 13:  # the 16-bit-Hz-follows code set above
            hdr += _struct.pack(">H", sample_rate)
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitWriter()
        for sub, extra in subchannels:
            _encode_subframe(bw, sub, predictor, lpc_order, bits + extra)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        frame += _struct.pack(">H", _crc16(frame))
        if best is None or len(frame) < len(best):
            best = frame
    return best


def _encode_subframe(
    bw: _BitWriter, blk, predictor: str, lpc_order: int,
    width: int = _BITS,
) -> None:
    n = len(blk)
    if predictor == "verbatim":
        bw.write(0, 1)
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for v in blk:
            bw.write_signed(v, width)
        return
    if all(v == blk[0] for v in blk):
        bw.write(0, 1)
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(blk[0], width)
        return
    # FIXED: best order by total |residual| (the classic estimate)
    best_order, best_res, best_cost = 0, None, None
    for order in range(min(4, n - 1) + 1):
        res = _fixed_residual(blk, order)
        cost = sum(abs(r) for r in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if predictor == "lpc" and n > lpc_order:
        fit = _lpc_fit(blk, lpc_order)
        if fit is not None:
            coefs, shift = fit
            res = _lpc_residual(blk, coefs, shift)
            # pick LPC only when its residual mass actually beats the
            # best FIXED order's (quantized-coefficient noise makes
            # FIXED the better code on slowly-varying blocks, where
            # second differences are already near zero)
            if sum(abs(r) for r in res) < best_cost:
                bw.write(0, 1)
                bw.write(0b100000 | (lpc_order - 1), 6)
                bw.write(0, 1)
                for v in blk[:lpc_order]:
                    bw.write_signed(v, width)
                bw.write(12 - 1, 4)  # precision-1
                bw.write_signed(shift, 5)
                for c in coefs:
                    bw.write_signed(c, 12)
                _write_residual(bw, res, lpc_order)
                return
    bw.write(0, 1)
    bw.write(0b001000 | best_order, 6)
    bw.write(0, 1)
    for v in blk[:best_order]:
        bw.write_signed(v, width)
    _write_residual(bw, best_res, best_order)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BS_FROM_CODE = {v: k for k, v in _BS_CODES.items()}
_SR_FROM_CODE = {v: k for k, v in _SR_CODES.items()}


def decode_flac(payload: bytes, verify_md5: bool = True):
    """FLAC bytes -> (list of int sample values, sample_rate); stereo
    comes back channel-INTERLEAVED (L,R,L,R — the WAV layout). See
    decode_flac_info for the (channels, bits) metadata."""
    info = decode_flac_info(payload, verify_md5=verify_md5)
    return info["samples"], info["sample_rate"]


def decode_flac_info(payload: bytes, verify_md5: bool = True) -> dict:
    """FLAC bytes -> dict(samples, sample_rate, channels, bits).
    Supports the lake subset: 8/12/16/20/24/32-bit (32 per RFC 9639's
    0b111 sample-size code), mono + stereo (independent,
    left/side, right/side, mid/side channel assignments), CONSTANT /
    VERBATIM / FIXED(0-4) / LPC subframes, both Rice methods, any
    partition order, wasted bits, CRC-8/CRC-16 verification,
    STREAMINFO MD5 verification (``verify_md5=False`` to skip on
    truncated streams). Reserved channel assignments and other bit
    depths raise
    NotImplementedError — fail loud, never decode wrongly."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    tail = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = tail >> 44
    channels = ((tail >> 41) & 0x7) + 1
    bits = ((tail >> 36) & 0x1F) + 1
    total = tail & ((1 << 36) - 1)  # interchannel samples
    md5_expect = streaminfo[18:34]
    if not 1 <= channels <= 8 or bits not in _SS_CODES:
        raise NotImplementedError(
            f"supported: 1-8 channels at depths "
            f"{sorted(_SS_CODES)} (channels={channels}, bits={bits})"
        )

    out: list[int] = []
    want = total * channels
    while pos + 2 <= len(payload) and (total == 0 or len(out) < want):
        blk, n_read, sr = _decode_frame(
            payload, pos, sample_rate, channels, bits
        )
        out.extend(blk)
        pos += n_read
    if total and len(out) > want:
        out = out[:want]
    if verify_md5 and md5_expect != b"\x00" * 16:
        md5 = hashlib.md5()
        md5.update(b"".join(_pack_sample(v, bits) for v in out))
        if md5.digest() != md5_expect:
            raise ValueError("STREAMINFO MD5 mismatch (corrupt stream)")
    return {
        "samples": out,
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
    }


def _decode_frame(
    payload: bytes, pos: int, si_rate: int,
    si_channels: int = 1, si_bits: int = 16,
):
    start = pos
    if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
        raise ValueError(f"bad frame sync at {pos}")
    b2, b3 = payload[pos + 2], payload[pos + 3]
    bs_code, sr_code = b2 >> 4, b2 & 0xF
    ch_code, ss_code = b3 >> 4, (b3 >> 1) & 0x7
    if ch_code <= 7:  # 1-8 independent channels (code = n-1)
        n_ch = ch_code + 1
    elif ch_code in (_CH_LEFT_SIDE, _CH_RIGHT_SIDE, _CH_MID_SIDE):
        n_ch = 2
    else:
        raise NotImplementedError(
            f"channel assignment {ch_code} is reserved"
        )
    if n_ch != si_channels:
        raise ValueError(
            f"frame channel count {n_ch} contradicts STREAMINFO "
            f"{si_channels}"
        )
    if ss_code not in _SS_BITS:
        raise NotImplementedError(
            f"sample-size code {ss_code:#05b} not supported"
        )
    bits = _SS_BITS[ss_code]
    if bits != si_bits:
        raise ValueError(
            f"frame bit depth {bits} contradicts STREAMINFO {si_bits}"
        )
    pos += 4
    # UTF-8-coded frame number: skip per its length
    first = payload[pos]
    if first < 0x80:
        pos += 1
    else:
        n_cont = 0
        m = first
        while m & 0x40:
            n_cont += 1
            m <<= 1
        pos += 1 + n_cont
    if bs_code == 0 or bs_code == 7 and pos + 2 > len(payload):
        raise ValueError("reserved/truncated block size")
    if bs_code == 6:
        block_size = payload[pos] + 1
        pos += 1
    elif bs_code == 7:
        block_size = _struct.unpack_from(">H", payload, pos)[0] + 1
        pos += 2
    else:
        block_size = _BS_FROM_CODE[bs_code]
    if sr_code == 12:
        rate = payload[pos] * 1000  # kHz
        pos += 1
    elif sr_code == 13:
        rate = _struct.unpack_from(">H", payload, pos)[0]  # Hz
        pos += 2
    elif sr_code == 14:
        rate = _struct.unpack_from(">H", payload, pos)[0] * 10  # daHz
        pos += 2
    elif sr_code == 0:
        rate = si_rate
    elif sr_code == 15:
        raise ValueError("invalid sample-rate code")
    else:
        rate = _SR_FROM_CODE[sr_code]
    crc_got = payload[pos]
    if _crc8(payload[start:pos]) != crc_got:
        raise ValueError("frame header CRC-8 mismatch")
    pos += 1

    br = _BitReader(payload, pos)
    # side (difference) subframes carry one extra sample bit, per spec
    extra = {
        _CH_LEFT_SIDE: (0, 1),
        _CH_RIGHT_SIDE: (1, 0),
        _CH_MID_SIDE: (0, 1),
    }.get(ch_code, (0,) * n_ch)
    subs = [
        _decode_subframe(br, block_size, bits + extra[c])
        for c in range(n_ch)
    ]
    br.align()
    frame_end = br.byte_pos()
    crc16_got = _struct.unpack_from(">H", payload, frame_end)[0]
    if _crc16(payload[start:frame_end]) != crc16_got:
        raise ValueError("frame CRC-16 mismatch")

    if n_ch == 1:
        blk = subs[0]
    elif ch_code <= 7:  # independent channels: plain interleave
        blk = [v for tup in zip(*subs) for v in tup]
    else:
        if ch_code == _CH_LEFT_SIDE:
            left = subs[0]
            right = [a - s for a, s in zip(left, subs[1])]
        elif ch_code == _CH_RIGHT_SIDE:
            right = subs[1]
            left = [b + s for b, s in zip(right, subs[0])]
        else:  # mid/side: recover mid's dropped low bit from side's parity
            mid, side = subs
            m2 = [(m << 1) | (s & 1) for m, s in zip(mid, side)]
            left = [(m + s) >> 1 for m, s in zip(m2, side)]
            right = [(m - s) >> 1 for m, s in zip(m2, side)]
        blk = [v for pair in zip(left, right) for v in pair]
    return blk, frame_end + 2 - start, rate


def _decode_subframe(
    br: _BitReader, block_size: int, bits: int = _BITS
) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    width = bits - wasted
    if stype == 0b000000:  # CONSTANT
        v = br.read_signed(width)
        return [v << wasted] * block_size
    if stype == 0b000001:  # VERBATIM
        return [br.read_signed(width) << wasted for _ in range(block_size)]
    if 0b001000 <= stype <= 0b001100:  # FIXED
        order = stype & 0x7
        warm = [br.read_signed(width) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        c = _FIXED_COEFS[order]
        x = list(warm)
        for r in res:
            pred = sum(c[j] * x[-1 - j] for j in range(order))
            x.append(r + pred)
        return [v << wasted for v in x]
    if stype & 0b100000:  # LPC
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(width) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        x = list(warm)
        for r in res:
            pred = sum(coefs[j] * x[-1 - j] for j in range(order)) >> shift
            x.append(r + pred)
        return [v << wasted for v in x]
    raise ValueError(f"reserved subframe type {stype:#08b}")


def make_flac(
    sample_rate: int = 8000,
    duration_ms: int = 1000,
    freq_hz: float = 440.0,
    amplitude: float = 0.5,
    predictor: str = "lpc",
    channels: int = 1,
    bits: int = 16,
    stereo_mode: str = "auto",
) -> bytes:
    """Payload twin of media.make_wav: the SAME deterministic sine
    encoded as FLAC — decode_flac(make_flac(...)) equals
    decode_wav(make_wav(...)) sample-for-sample (pinned in tests), so
    cross-container audio dedup is testable the way the BMP/PNG twins
    make image dedup testable. ``channels=2`` puts the sine on the
    left and the same sine a musical fifth up (freq*1.5) on the
    right — correlated enough that mid/side wins frames, distinct
    enough that reconstruction errors can't cancel; ``channels>2``
    stacks harmonics freq*(1 + c/2) per channel c (independent
    coding, the only >2-channel assignment the spec defines)."""
    import math

    n = sample_rate * duration_ms // 1000
    full = (1 << (bits - 1)) - 1

    def sine(f: float, i: int) -> int:
        return int(
            amplitude * full * math.sin(2 * math.pi * f * i / sample_rate)
        )

    if channels == 1:
        xs = [sine(freq_hz, i) for i in range(n)]
    elif channels == 2:
        xs = []
        for i in range(n):
            xs.append(sine(freq_hz, i))
            xs.append(sine(freq_hz * 1.5, i))
    else:
        xs = []
        for i in range(n):
            for c in range(channels):
                xs.append(sine(freq_hz * (1 + c / 2.0), i))
    return encode_flac(
        xs,
        sample_rate=sample_rate,
        predictor=predictor,
        channels=channels,
        bits=bits,
        stereo_mode=stereo_mode,
    )
