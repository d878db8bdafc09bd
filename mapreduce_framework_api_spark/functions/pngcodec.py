"""Minimal stdlib-only PNG codec (8-bit truecolor RGB).

Exists so the multimodal operators' ``fake=False`` branch has a REAL,
executed codec path in this container (no PIL/ffmpeg available): PNG is
just zlib (stdlib) plus 44 lines of chunk framing and scanline filters.
The operators stay codec-agnostic — a production build swaps these three
functions for PIL/libvips calls with the identical dataframe contract.

Scope: encode always writes filter-0 scanlines; decode accepts any of the
five standard PNG filter types (None/Sub/Up/Average/Paeth) but only the
8-bit/RGB/non-interlaced layout it targets — anything else raises
ValueError, which the operators map to null feature rows (a 100 TB media
corpus always contains undecodable payloads; they must not kill the job).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (row-major, 3 bytes/pixel) as a PNG."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit RGB non-interlaced PNG → (width, height, rgb bytes)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, width, height = 8, [], None, None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth} color={ctype} "
                    f"interlace={interlace}); this codec handles 8-bit RGB only"
                )
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        filt = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if filt == 1:  # Sub
            for x in range(3, stride):
                row[x] = (row[x] + row[x - 3]) & 0xFF
        elif filt == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif filt == 3:  # Average
            for x in range(stride):
                left = row[x - 3] if x >= 3 else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(stride):
                a = row[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif filt != 0:
            raise ValueError(f"unknown PNG filter type {filt}")
        out += row
        prev = row
    return width, height, bytes(out)


def resize_rgb_nearest(
    width: int, height: int, rgb: bytes, new_width: int, new_height: int
) -> bytes:
    """Nearest-neighbor resample of raw RGB bytes (deterministic, no FP)."""
    import numpy as np

    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return img[ys][:, xs].tobytes()
