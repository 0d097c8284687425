"""Real (pure-stdlib) image/audio codecs for the multimodal operators.

The container has no PIL/libav, but PNG and WAV are simple enough to
encode AND decode with the stdlib alone — so the decode step in
``mm_decode_image`` / ``mm_decode_audio`` is a genuine codec, not a stub:

- PNG: full spec-compliant writer (IHDR/IDAT/IEND, zlib-deflated
  scanlines, CRC-32 per chunk) and a strict reader (signature check,
  chunk walk with CRC verification, inflate, per-scanline filter
  reversal for filter types 0/1/2). 8-bit grayscale, any size.
- WAV: PCM16 mono via the stdlib ``wave`` module both ways.

Every byte produced here is a valid file — ``file``/PIL/soundfile would
open them — and every decode re-derives width/height/pixels (or
rate/frames/samples) from the bytes, never from side-channel metadata.

Reference parity note: the reference app (brianbirir/data-ingestor-web-app)
has no multimodal surface; this is a north-star LLM-pipeline addition per
the build brief.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from binascii import crc32

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc32(tag + body))


def png_encode_gray(width: int, height: int, pixel_fn) -> bytes:
    """Encode an 8-bit grayscale PNG; pixel_fn(x, y) -> 0..255."""
    if width <= 0 or height <= 0:
        raise ValueError("png dimensions must be positive")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # bit depth 8, gray
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None) per scanline
        for x in range(width):
            raw.append(pixel_fn(x, y) & 0xFF)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Strict PNG decode → (width, height, pixels row-major).

    Verifies the signature and every chunk CRC, walks chunks in order,
    inflates the concatenated IDAT stream, and reverses scanline filters
    (None/Sub/Up — the subset a grayscale encoder emits). Raises
    ValueError on any structural corruption."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = -1
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != crc32(tag + body):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("decoder supports 8-bit non-interlaced grayscale only")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("decompressed size mismatch")
    pixels = bytearray()
    prev = bytearray(width)
    for y in range(height):
        line = bytearray(raw[y * stride : (y + 1) * stride])
        ftype, row = line[0], line[1:]
        if ftype == 1:  # Sub
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported filter type {ftype}")
        pixels += row
        prev = row
    return width, height, bytes(pixels)


def wav_encode_pcm16(rate: int, samples: list[int]) -> bytes:
    """Encode PCM16 mono WAV via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode_pcm16(data: bytes) -> tuple[int, int, list[int]]:
    """Decode PCM16 mono WAV → (rate, n_frames, samples)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("decoder supports PCM16 mono only")
        rate = w.getframerate()
        n = w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    return rate, n, samples
