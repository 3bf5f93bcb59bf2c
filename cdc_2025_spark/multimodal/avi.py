"""MJPEG-in-AVI video container: dependency-free RIFF writer/parser
whose frames are real baseline JPEGs (multimodal/jpeg.py), completing
the image/audio/video modality triad with a REAL video decode path
(BMP/PNG/JPEG images, WAV/FLAC audio, MJPEG-AVI video).

Reference surface: the reference repo has no media pipeline at all
(112 lines of pandas/Streamlit) — this implements the builder brief's
multimodal requirement (opaque binary columns + typed metadata +
real Spark-side plumbing) with an actual working codec rather than a
stub, the jpeg.py/flac.py posture.

Format notes (OpenDML/AVI 1.0, the subset every MJPEG camera emits):
RIFF('AVI ') -> LIST('hdrl')[avih + LIST('strl')[strh('vids'/'MJPG')
+ strf(BITMAPINFOHEADER, biCompression='MJPG')]] + LIST('movi')
['00dc' JPEG frames] + 'idx1'. All integers little-endian; chunks pad
to even length. Frame f of ``make_mjpeg_avi(seed=s)`` carries the
SAME seeded-gradient pattern as ``make_jpeg(seed=s * 31 + f)``, so
sampled-frame pixels are bit-identical to the corresponding still
image — the BMP/PNG/FLAC container-twin story extended to video.

Uncompressed BI_RGB 'DIB' video (raw bottom-up or top-down 24-bit
BGR pixel arrays in '00db' chunks — the second codec every AVI
toolchain emits) decodes through the same parser; a DIB frame of the
seeded pattern is pixel-IDENTICAL to its BMP/PNG still twin, so a
DIB re-encode of an MJPEG video is the cross-codec near-duplicate
the frame-hash pairing catches.

Fail-loud set (real kernels beside, never silent wrong answers):
other video codecs (cvid, ...), non-24-bit DIB, audio/other streams,
AVIX/OpenDML extension lists, and structurally broken files all
raise.
"""

from __future__ import annotations

import struct

AVI_DEFAULT_FPS = 4


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def make_mjpeg_avi(
    width: int,
    height: int,
    n_frames: int,
    fps: int = AVI_DEFAULT_FPS,
    seed: int = 0,
    subsampling: str = "4:4:4",
    quality: int = 88,
) -> bytes:
    """Deterministic MJPEG AVI: ``n_frames`` baseline JPEGs of the
    seeded-gradient test pattern (frame f == make_jpeg's pattern at
    seed*31 + f), ``fps`` frames/second, with a spec-shaped header
    pair (avih + strh/strf) and a keyframe idx1 index."""
    if n_frames < 1:
        raise ValueError(f"need n_frames >= 1, got {n_frames}")
    if fps < 1:
        raise ValueError(f"need fps >= 1, got {fps}")
    from cdc_2025_spark.multimodal.jpeg import make_jpeg  # noqa: PLC0415

    frames = [
        make_jpeg(
            width,
            height,
            seed=seed * 31 + f,
            subsampling=subsampling,
            quality=quality,
        )
        for f in range(n_frames)
    ]
    max_frame = max(len(f) for f in frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            max_frame * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # dwFlags: AVIF_HASINDEX
            n_frames,  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_frame,  # dwSuggestedBufferSize
            width,
            height,
            0,
            0,
            0,
            0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n_frames,  # dwLength (in frames)
            max_frame,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = varying)
            0,
            0,
            width,
            height,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            width,
            height,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG",  # biCompression
            width * height * 3,  # biSizeImage (uncompressed estimate)
            0,
            0,
            0,
            0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_children = b""
    idx_entries = []
    for fr in frames:
        # idx1 offsets are conventionally relative to the 'movi'
        # fourcc; the first chunk id sits 4 bytes past it
        idx_entries.append((4 + len(movi_children), len(fr)))
        movi_children += _chunk(b"00dc", fr)
    movi = _list(b"movi", movi_children)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_dib_avi(
    width: int,
    height: int,
    n_frames: int,
    fps: int = AVI_DEFAULT_FPS,
    seed: int = 0,
    top_down: bool = False,
) -> bytes:
    """Deterministic UNCOMPRESSED (BI_RGB 'DIB') AVI of the seeded
    test pattern: frame f carries EXACTLY the make_bmp pattern at
    seed seed*31 + f — lossless, so sampled frames are
    pixel-identical to the BMP/PNG stills."""
    rgb_frames = []
    for f in range(max(n_frames, 0)):
        s = seed * 31 + f
        frame = bytearray()
        for y in range(height):
            for x in range(width):
                frame += bytes(
                    (
                        (x * 13 + y * 17 + s * 3) % 256,  # R
                        (x * 5 + y * 11 + s * 2) % 256,   # G
                        (x * 7 + y * 3 + s) % 256,        # B
                    )
                )
        rgb_frames.append((height, width, bytes(frame)))
    return encode_dib_avi(rgb_frames, fps=fps, top_down=top_down)


def encode_dib_avi(
    frames,
    fps: int = AVI_DEFAULT_FPS,
    top_down: bool = False,
) -> bytes:
    """Encode RGB frames as an UNCOMPRESSED (BI_RGB 'DIB') AVI: the
    same container as make_mjpeg_avi but each '00db' chunk is a raw
    bottom-up 24-bit BGR pixel array with 4-byte row padding (the BMP
    pixel-array convention; ``top_down=True`` writes negative
    biHeight and unflipped rows, the same dual the BMP decoder
    handles). ``frames`` are (h, w, 3) uint8 numpy arrays or
    (h, w, rgb_bytes) triples, all the same shape. Losslessness makes
    this the re-encode sink of the video family: storing an MJPEG
    video's DECODED frames through it yields a byte-different
    container whose frame hashes are IDENTICAL — the cross-codec
    near-duplicate the frame-hash pairing catches."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps < 1:
        raise ValueError(f"need fps >= 1, got {fps}")
    norm = []
    for fr in frames:
        if isinstance(fr, tuple):
            h, w, data = fr
        else:  # numpy (h, w, 3)
            h, w = fr.shape[:2]
            data = fr.tobytes()
        norm.append((h, w, data))
    height, width = norm[0][0], norm[0][1]
    if any((h, w) != (height, width) for h, w, _ in norm):
        raise ValueError("all frames must share one (h, w)")
    import numpy as np  # noqa: PLC0415

    n_frames = len(norm)
    row_size = (width * 3 + 3) // 4 * 4
    frames_raw = []
    for h, w, data in norm:
        rgb = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
        bgr = rgb[:, :, ::-1].reshape(h, w * 3)
        rows = np.zeros((h, row_size), dtype=np.uint8)
        rows[:, : w * 3] = bgr
        if not top_down:
            rows = rows[::-1]  # bottom-up storage
        frames_raw.append(rows.tobytes())
    frames = frames_raw
    frame_len = row_size * height
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,
            frame_len * fps,
            0,
            0x10,
            n_frames,
            0,
            1,
            frame_len,
            width,
            height,
            0, 0, 0, 0,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,
            1,
            fps,
            0,
            n_frames,
            frame_len,
            0xFFFFFFFF,
            frame_len,  # dwSampleSize: fixed-size samples
            0, 0, width, height,
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,
            width,
            -height if top_down else height,
            1,
            24,
            b"\x00\x00\x00\x00",  # biCompression = 0 = BI_RGB
            frame_len,
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_children = b""
    idx_entries = []
    for fr in frames:
        idx_entries.append((4 + len(movi_children), len(fr)))
        movi_children += _chunk(b"00db", fr)
    movi = _list(b"movi", movi_children)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<III", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for each chunk in
    [start, end); validates sizes against the enclosing bound."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError(
                f"AVI: truncated chunk header at offset {i}"
            )
        fourcc = buf[i : i + 4]
        (ln,) = struct.unpack_from("<I", buf, i + 4)
        if i + 8 + ln > end:
            raise ValueError(
                f"AVI: chunk {fourcc!r} at {i} overruns its parent "
                f"({ln} bytes, {end - i - 8} available)"
            )
        yield fourcc, i + 8, ln
        i += 8 + ln + (ln % 2)


def parse_avi(payload: bytes) -> dict:
    """Parse an MJPEG or uncompressed-DIB AVI into ``{codec, width,
    height, top_down, rate, scale, n_frames, frames: list[bytes]}``.

    Strict by design: validates the RIFF envelope, requires exactly
    one 'vids' stream whose codec is MJPG (Huffman/DCT frames) or
    BI_RGB 'DIB' 24-bit (raw BGR pixel arrays, positive or negative
    biHeight — anything else: cvid, 16-bit DIB, audio streams,
    OpenDML 'AVIX' extensions — raises NotImplementedError: those
    need codec tables this kernel deliberately does not fake), and
    cross-checks idx1 offsets and sizes against the movi chunks
    actually found."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("AVI: not a RIFF/AVI payload")
    (riff_len,) = struct.unpack_from("<I", buf, 4)
    end = 8 + riff_len
    if end > len(buf):
        raise ValueError(
            f"AVI: RIFF length {riff_len} overruns payload "
            f"({len(buf)} bytes)"
        )
    width = height = rate = scale = None
    n_frames_declared = None
    frames: list[bytes] = []
    idx1: list[tuple[int, int]] = []
    movi_payload_start = None
    saw_vids = False
    codec = None
    top_down = False
    for fourcc, p, ln in _walk(buf, 12, end):
        if fourcc == b"LIST":
            ltype = buf[p : p + 4]
            if ltype == b"hdrl":
                for c4, cp, cln in _walk(buf, p + 4, p + ln):
                    if c4 == b"avih":
                        vals = struct.unpack_from("<14I", buf, cp)
                        n_frames_declared = vals[4]
                        if vals[6] != 1:
                            raise NotImplementedError(
                                f"AVI: {vals[6]} streams — only "
                                "single-stream MJPEG decodes"
                            )
                    elif c4 == b"LIST" and buf[cp : cp + 4] == b"strl":
                        for s4, sp, sln in _walk(
                            buf, cp + 4, cp + cln
                        ):
                            if s4 == b"strh":
                                fcc_type = buf[sp : sp + 4]
                                handler = buf[sp + 4 : sp + 8]
                                if fcc_type != b"vids":
                                    raise NotImplementedError(
                                        f"AVI: stream type "
                                        f"{fcc_type!r} — only video "
                                        "streams decode"
                                    )
                                if handler not in (
                                    b"MJPG",
                                    b"mjpg",
                                    b"DIB ",
                                    b"\x00\x00\x00\x00",
                                ):
                                    raise NotImplementedError(
                                        f"AVI: codec {handler!r} — "
                                        "only MJPG and uncompressed "
                                        "DIB decode (others need "
                                        "real codec tables)"
                                    )
                                saw_vids = True
                                (scale, rate) = struct.unpack_from(
                                    "<II", buf, sp + 20
                                )
                            elif s4 == b"strf":
                                (
                                    _bisize,
                                    width,
                                    height,
                                    _planes,
                                    bits,
                                    comp,
                                ) = struct.unpack_from(
                                    "<iiiHH4s", buf, sp
                                )
                                if comp in (b"MJPG", b"mjpg"):
                                    codec = "mjpeg"
                                elif comp == b"\x00\x00\x00\x00":
                                    # BI_RGB: raw DIB pixel arrays
                                    if bits != 24:
                                        raise NotImplementedError(
                                            f"AVI: {bits}-bit DIB — "
                                            "only 24-bit BI_RGB "
                                            "decodes"
                                        )
                                    codec = "dib"
                                else:
                                    raise NotImplementedError(
                                        f"AVI: biCompression {comp!r}"
                                        " — only MJPG and BI_RGB DIB "
                                        "decode"
                                    )
                                if height < 0:  # top-down rows
                                    top_down = True
                                    height = -height
            elif ltype == b"movi":
                movi_payload_start = p
                for c4, cp, cln in _walk(buf, p + 4, p + ln):
                    if c4 in (b"00dc", b"00db"):
                        frames.append(buf[cp : cp + cln])
                    elif c4[2:] in (b"dc", b"db", b"wb", b"tx"):
                        raise NotImplementedError(
                            f"AVI: chunk {c4!r} — only stream-00 "
                            "video chunks decode"
                        )
            elif ltype == b"AVIX":
                raise NotImplementedError(
                    "AVI: OpenDML AVIX extension lists are not "
                    "supported"
                )
        elif fourcc == b"idx1":
            # idx1 is a packed array of 16-byte entries; a trailing
            # partial entry means a truncated/malformed index, and
            # unpacking past ln would read the adjacent chunk's bytes.
            if ln % 16 != 0:
                raise ValueError(
                    f"AVI: idx1 length {ln} is not a multiple of 16 "
                    "— truncated or malformed index"
                )
            for off in range(0, ln, 16):
                ckid = buf[p + off : p + off + 4]
                _flags, coff, cln = struct.unpack_from(
                    "<III", buf, p + off + 4
                )
                if ckid in (b"00dc", b"00db"):
                    idx1.append((coff, cln))
    if not saw_vids or width is None or codec is None:
        raise ValueError("AVI: no supported video stream header found")
    if not frames:
        raise ValueError("AVI: movi list holds no video frames")
    if codec == "dib":
        frame_len = (width * 3 + 3) // 4 * 4 * height
        for k, fr in enumerate(frames):
            if len(fr) != frame_len:
                raise ValueError(
                    f"AVI: DIB frame {k} holds {len(fr)} bytes, "
                    f"expected {frame_len} for {width}x{height}x24"
                )
    if n_frames_declared is not None and n_frames_declared != len(
        frames
    ):
        raise ValueError(
            f"AVI: header declares {n_frames_declared} frames, movi "
            f"holds {len(frames)}"
        )
    if idx1:
        if len(idx1) != len(frames):
            raise ValueError(
                f"AVI: idx1 holds {len(idx1)} video entries for "
                f"{len(frames)} frames"
            )
        # cross-check offsets/sizes against the movi walk
        pos = 4
        for k, ((coff, cln), fr) in enumerate(zip(idx1, frames)):
            if cln != len(fr) or coff != pos:
                raise ValueError(
                    f"AVI: idx1 entry {k} ({coff}, {cln}) does not "
                    f"match movi chunk at {pos} ({len(fr)} bytes)"
                )
            pos += 8 + len(fr) + (len(fr) % 2)
    return {
        "codec": codec,
        "width": width,
        "height": height,
        "top_down": top_down,
        "rate": rate,
        "scale": scale,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_avi_frame(meta: dict, frame_idx: int):
    """(h, w, 3) uint8 RGB of frame ``frame_idx``: baseline-JPEG
    decode of the movi chunk for MJPEG (multimodal/jpeg.py); for
    uncompressed DIB, the raw BGR row unpack (4-byte row padding,
    bottom-up unless the header's negative biHeight said top-down) —
    the same pixel-array convention the BMP decoder handles."""
    if meta["codec"] == "mjpeg":
        from cdc_2025_spark.multimodal.jpeg import (  # noqa: PLC0415
            decode_jpeg,
        )

        return decode_jpeg(meta["frames"][frame_idx])
    import numpy as np  # noqa: PLC0415

    w, h = meta["width"], meta["height"]
    row_size = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(meta["frames"][frame_idx], dtype=np.uint8)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not meta["top_down"]:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def frame_number_at(meta: dict, t_ms: int) -> int:
    """Container frame number shown at time ``t_ms`` (integer-exact:
    floor(t * rate / (scale * 1000)), clamped to the last frame) —
    the sampling rule sample_video_frames uses for real containers."""
    n = t_ms * meta["rate"] // (meta["scale"] * 1000)
    return min(int(n), meta["n_frames"] - 1)
