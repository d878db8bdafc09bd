"""Minimal stdlib-only WAV (RIFF/PCM16) codec.

The audio sibling of ``pngcodec.py``: exists so the multimodal operators'
audio lane has a REAL, executed ``fake=False`` codec path in this container
(no soundfile/ffmpeg available). A RIFF/WAVE file is a 12-byte header plus
tagged chunks; 16-bit integer PCM needs no compression library at all, so
encode/decode is pure ``struct``. The operators stay codec-agnostic — a
production build swaps these functions for soundfile/torchaudio calls with
the identical dataframe contract.

Scope: encode always writes 16-bit little-endian PCM; decode accepts only
the canonical fmt (PCM, 16-bit) but any channel count / sample rate —
anything else (float WAV, ADPCM, truncated chunks, non-RIFF bytes) raises
ValueError, which the operators map to null feature rows (a 100 TB media
corpus always contains undecodable payloads; they must not kill the job).
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, n_channels: int, samples: list[int]) -> bytes:
    """Interleaved 16-bit PCM samples -> RIFF/WAVE bytes.

    ``samples`` is the flat interleaved frame stream; its length must be a
    multiple of ``n_channels``.
    """
    if n_channels <= 0 or sample_rate <= 0:
        raise ValueError("sample_rate and n_channels must be positive")
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE bytes -> (sample_rate, n_channels, interleaved samples).

    Only canonical PCM16 is accepted; everything else raises ValueError.
    """
    if not isinstance(data, (bytes, bytearray)) or len(data) < 12:
        raise ValueError("not a RIFF file")
    if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            pcm = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit integer PCM is supported")
    if n_channels <= 0 or len(pcm) % (2 * n_channels):
        raise ValueError("PCM byte length not frame-aligned")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return sample_rate, n_channels, samples


def pcm_stats(samples: list[int], n_channels: int, sample_rate: int):
    """Integer stats over an interleaved PCM16 stream: (n_frames,
    duration_ms, peak_abs, energy) — all exact int64-range arithmetic
    (32767² per sample, so corpora of hours stay far under 2⁶³)."""
    n_frames = len(samples) // n_channels
    duration_ms = n_frames * 1000 // sample_rate if sample_rate else 0
    peak = max((abs(s) for s in samples), default=0)
    energy = sum(s * s for s in samples)
    return n_frames, duration_ms, peak, energy
