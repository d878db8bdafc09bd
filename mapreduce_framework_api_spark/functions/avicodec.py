"""Minimal stdlib-only uncompressed RIFF/AVI (DIB/RGB24) codec.

The video sibling of ``wavcodec.py``/``pngcodec.py``: exists so the
multimodal operators' video lane has a REAL, executed ``fake=False``
demux path in this container (no ffmpeg/PyAV available). An AVI file is
the same RIFF chunk grammar as WAV — a 12-byte header plus tagged
chunks, with ``LIST`` chunks nesting — and uncompressed 24-bit DIB
video (``biCompression = BI_RGB``) needs no compression library, so
encode/decode is pure ``struct`` plus the genuine DIB frame framing:
bottom-up row order, BGR channel order, rows padded to 4-byte
boundaries. The operators stay codec-agnostic — a production build
swaps these functions for an ffmpeg/PyAV demuxer with the identical
dataframe contract.

Scope: encode always writes one ``vids/DIB `` stream of RGB24 frames
(``00db`` chunks) plus a standard ``idx1`` index; decode accepts only
that canonical shape — anything else (compressed fourccs, non-24-bit
DIBs, truncated chunks, frame chunks whose size disagrees with the
declared geometry, non-RIFF bytes) raises ValueError, which the
operators map to dropped/null rows (a 100 TB media corpus always
contains undecodable payloads; they must not kill the job).

Reference parity note: the reference engine treats record payloads as
opaque bytes end to end (``mapreduce.h:99`` ``struct kvpair``); this
codec exists on the Spark side purely so the declared video query can
put real container framing under the differential value hash.
"""

from __future__ import annotations

import struct

_AVIH_FLAGS_HASINDEX = 0x00000010


def _stride(width: int) -> int:
    """DIB rows are padded to 4-byte boundaries."""
    return (width * 3 + 3) // 4 * 4


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB24 pixel bytes -> bottom-up padded BGR DIB bytes."""
    stride = _stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # RGB -> BGR per pixel
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    return b"".join(rows)


def _dib_to_rgb(width: int, height: int, dib: bytes) -> bytes:
    """Bottom-up padded BGR DIB bytes -> top-down RGB24 pixel bytes."""
    stride = _stride(width)
    rows = []
    for y in range(height - 1, -1, -1):
        row = dib[y * stride : y * stride + width * 3]
        rgb = bytearray(len(row))
        rgb[0::3] = row[2::3]
        rgb[1::3] = row[1::3]
        rgb[2::3] = row[0::3]
        rows.append(bytes(rgb))
    return b"".join(rows)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    """A RIFF chunk: tag + size + payload, word-aligned like WAV chunks."""
    return tag + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")


def encode_avi(width: int, height: int, fps: int, frames: list[bytes]) -> bytes:
    """Top-down RGB24 frames -> uncompressed RIFF/AVI bytes.

    Each element of ``frames`` must be exactly ``width*height*3`` bytes
    (row-major, top-down, RGB channel order). Writes the canonical
    hdrl(avih + strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) /
    movi(00db...) / idx1 layout.
    """
    if width <= 0 or height <= 0 or fps <= 0:
        raise ValueError("width, height and fps must be positive")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame byte length disagrees with geometry")
    frame_size = _stride(width) * height
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIH_FLAGS_HASINDEX,  # dwFlags
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            len(frames),  # dwLength
            frame_size,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1: default)
            0,  # dwSampleSize (0: variable / per-frame)
            0,  # rcFrame packed as one reserved dword pair start
        )
        + struct.pack("<HH", width, height)  # rcFrame right/bottom
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        width,
        height,  # positive: bottom-up DIB
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        frame_size,  # biSizeImage
        0, 0, 0, 0,  # pels-per-meter, clr used/important
    )
    strl = b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
    hdrl = b"hdrl" + _chunk(b"avih", avih) + _chunk(b"LIST", strl)
    payloads = [_rgb_to_dib(width, height, f) for f in frames]
    movi_items = [_chunk(b"00db", p) for p in payloads]
    movi = b"movi" + b"".join(movi_items)
    # idx1: one entry per frame — offset is relative to the 'movi' tag.
    # The size field records the TRUE payload size (stride*height), taken
    # from the payload itself, never derived back from the padded chunk:
    # un-padding padded length is wrong for odd payloads (DIB payloads
    # are always even — stride is a multiple of 4 — but the index format
    # should not depend on that invariant; round-11 advice).
    idx_entries, off = [], 4
    for payload, f_chunk in zip(payloads, movi_items):
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(payload))
        )
        off += len(f_chunk)
    body = (
        b"AVI "
        + _chunk(b"LIST", hdrl)
        + _chunk(b"LIST", movi)
        + _chunk(b"idx1", b"".join(idx_entries))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_size) over a chunk run,
    enforcing word alignment and refusing truncated chunks."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError("truncated chunk")
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Uncompressed RIFF/AVI bytes -> (width, height, fps, RGB24 frames).

    Only the canonical single-'vids'-stream 24-bit BI_RGB shape is
    accepted; everything else raises ValueError.
    """
    if not isinstance(data, (bytes, bytearray)) or len(data) < 12:
        raise ValueError("not a RIFF file")
    if data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = fps = None
    bitcount = compression = None
    frames_dib: list[bytes] = []
    for tag, start, size in _walk_chunks(data, 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])):
        if tag != b"LIST":
            continue
        list_kind = data[start : start + 4]
        if list_kind == b"hdrl":
            for t2, s2, z2 in _walk_chunks(data, start + 4, start + size):
                if t2 == b"avih":
                    if z2 < 56:
                        raise ValueError("short avih chunk")
                    fields = struct.unpack("<14I", data[s2 : s2 + 56])
                    width, height = fields[8], fields[9]
                elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for t3, s3, z3 in _walk_chunks(data, s2 + 4, s2 + z2):
                        if t3 == b"strh":
                            if z3 < 48 or data[s3 : s3 + 4] != b"vids":
                                raise ValueError("first stream is not canonical vids")
                            scale, rate = struct.unpack("<II", data[s3 + 20 : s3 + 28])
                            if scale == 0 or rate % scale:
                                raise ValueError("non-integral frame rate")
                            fps = rate // scale
                        elif t3 == b"strf":
                            if z3 < 40:
                                raise ValueError("short strf chunk")
                            (_, bw, bh, _, bitcount, compression) = struct.unpack(
                                "<IiiHHI", data[s3 : s3 + 20]
                            )
                            if width is None:
                                width, height = bw, abs(bh)
        elif list_kind == b"movi":
            for t2, s2, z2 in _walk_chunks(data, start + 4, start + size):
                if t2 in (b"00db", b"00dc"):
                    frames_dib.append(data[s2 : s2 + z2])
    if width is None or height is None or fps is None:
        raise ValueError("missing avih/strh header")
    if bitcount != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB DIB frames are supported")
    if width <= 0 or height <= 0 or fps <= 0:
        raise ValueError("non-positive geometry")
    expect = _stride(width) * height
    for dib in frames_dib:
        if len(dib) != expect:
            raise ValueError("frame chunk size disagrees with geometry")
    return width, height, fps, [_dib_to_rgb(width, height, d) for d in frames_dib]
