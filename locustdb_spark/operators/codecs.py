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
    """Cheap container sniff: 'png', 'jpeg', 'wav', 'mp4', or
    'unknown'."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 12 and data[4:8] in (b"ftyp", b"moov", b"mdat"):
        return "mp4"
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


# ---------------------------------------------------------------------
# MP4 / ISO-BMFF container probe (ISO 14496-12, public spec)
# ---------------------------------------------------------------------

def mp4_probe(data: bytes) -> dict:
    """Parse the ISO-BMFF box tree for container METADATA — an
    ffprobe-lite: movie duration/timescale plus per-track handler,
    codec fourcc, dimensions, sample and keyframe counts. No codec
    payload is decoded (H.264 et al. need real codec libraries); this
    is the part of video handling a corpus pipeline needs for
    filtering/stats, and it works on real files.

    Returns {duration_s, timescale, brand, tracks: [{handler, codec,
    width, height, n_samples, n_keyframes, duration_s}]}.
    """
    out = {"duration_s": None, "timescale": None, "brand": None,
           "tracks": []}

    def boxes(buf, start, end):
        pos = start
        while pos + 8 <= end:
            size, btype = struct.unpack_from(">I4s", buf, pos)
            hdr = 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError(
                    f"mp4: bad box size {size} at {pos}")
            yield btype, pos + hdr, pos + size
            pos += size

    def full(buf, start):
        version = buf[start]
        return version, start + 4

    def parse_trak(start, end):
        t = {"handler": None, "codec": None, "width": None,
             "height": None, "n_samples": 0, "n_keyframes": None,
             "duration_s": None}

        def parse_stbl(s, e):
            for bt, bs, be in boxes(data, s, e):
                if bt == b"stsd":
                    _v, p = full(data, bs)
                    (n,) = struct.unpack_from(">I", data, p)
                    if n >= 1:
                        t["codec"] = data[p + 8:p + 12].decode(
                            "ascii", "replace")
                elif bt == b"stts":
                    _v, p = full(data, bs)
                    (n,) = struct.unpack_from(">I", data, p)
                    total = 0
                    for i in range(n):
                        cnt, _delta = struct.unpack_from(
                            ">II", data, p + 4 + 8 * i)
                        total += cnt
                    t["n_samples"] = total
                elif bt == b"stss":
                    _v, p = full(data, bs)
                    (n,) = struct.unpack_from(">I", data, p)
                    t["n_keyframes"] = n

        def parse_minf(s, e):
            for bt, bs, be in boxes(data, s, e):
                if bt == b"stbl":
                    parse_stbl(bs, be)

        def parse_mdia(s, e):
            for bt, bs, be in boxes(data, s, e):
                if bt == b"mdhd":
                    v, p = full(data, bs)
                    if v == 1:
                        ts, dur = struct.unpack_from(
                            ">IQ", data, p + 16)
                    else:
                        ts, dur = struct.unpack_from(
                            ">II", data, p + 8)
                    if ts:
                        t["duration_s"] = dur / ts
                elif bt == b"hdlr":
                    _v, p = full(data, bs)
                    t["handler"] = data[p + 4:p + 8].decode(
                        "ascii", "replace")
                elif bt == b"minf":
                    parse_minf(bs, be)

        for bt, bs, be in boxes(data, start, end):
            if bt == b"tkhd":
                v, p = full(data, bs)
                # width/height: 16.16 fixed, last 8 bytes of the box
                w16, h16 = struct.unpack_from(">II", data, be - 8)
                t["width"] = w16 >> 16 or None
                t["height"] = h16 >> 16 or None
            elif bt == b"mdia":
                parse_mdia(bs, be)
        out["tracks"].append(t)

    for btype, bstart, bend in boxes(data, 0, len(data)):
        if btype == b"ftyp":
            out["brand"] = data[bstart:bstart + 4].decode(
                "ascii", "replace")
        elif btype == b"moov":
            for bt, bs, be in boxes(data, bstart, bend):
                if bt == b"mvhd":
                    v, p = full(data, bs)
                    if v == 1:
                        ts, dur = struct.unpack_from(
                            ">IQ", data, p + 16)
                    else:
                        ts, dur = struct.unpack_from(
                            ">II", data, p + 8)
                    out["timescale"] = ts
                    out["duration_s"] = (dur / ts) if ts else None
                elif bt == b"trak":
                    parse_trak(bs, be)
    if out["brand"] is None and not out["tracks"]:
        raise ValueError("mp4: no ftyp or moov box found")
    return out
