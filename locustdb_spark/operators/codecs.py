"""Pure-stdlib media codecs for the multimodal operators.

The build environment has no image/audio libraries (no PIL, no
ffmpeg), but two ubiquitous formats decode with nothing beyond the
standard library: PNG (zlib inflate + the five scanline filters from
the public PNG spec, RFC 2083) and WAV (the stdlib `wave` module).
These make the multimodal pipeline's decode step REAL for real bytes —
width/height/pixels out of an actual PNG, channels/rate/duration out
of an actual WAV — while `multimodal.py`'s deterministic stubs remain
for formats this environment cannot decode (JPEG, MP4) and for the
SQL-oracle-checkable entries.

Scanline unfiltering is row-sequential by construction (filters
reference the row above), so the loop is per-row with numpy vector ops
inside — fine for the thumbnail-scale work a metadata/feature pass
does; swap in PIL via `multimodal.real_decoders_available()` for bulk
pixel crunching.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth, non-interlaced)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(data: bytes) -> str:
    """Cheap container sniff: 'png', 'jpeg', 'wav', or 'unknown'."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def jpeg_decode(data: bytes):
    """Baseline JFIF decode (pure Python + numpy IDCT, jpeg.py);
    same (width, height, channels, pixels) contract as png_decode."""
    from .jpeg import jpeg_decode as _dec

    return _dec(data)


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    from .jpeg import jpeg_encode as _enc

    return _enc(pixels, quality)


def png_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an 8-bit, non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA). Returns (width, height, channels, uint8 array of shape
    (height, width, channels))."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.intp)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left scan
            cur = np.zeros(stride, dtype=np.intp)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return width, height, channels, out.reshape(height, width, channels)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode a uint8 (h, w, channels) array as a filter-0 PNG."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: None
        raw += pixels[y].tobytes()

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def png_resize_nearest(pixels: np.ndarray, width: int,
                       height: int) -> np.ndarray:
    """Nearest-neighbor resize of a (h, w, ch) uint8 array."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


def wav_decode(data: bytes) -> tuple[int, int, int, float]:
    """(channels, sample_rate, n_frames, duration_s) of a WAV blob."""
    with wave.open(io.BytesIO(data)) as wf:
        ch = wf.getnchannels()
        rate = wf.getframerate()
        n = wf.getnframes()
        return ch, rate, n, n / rate if rate else 0.0
