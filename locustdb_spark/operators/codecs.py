"""Pure-stdlib media codecs for the multimodal operators.

The build environment has no image/audio libraries (no PIL, no
ffmpeg), but two ubiquitous formats decode with nothing beyond the
standard library: PNG (zlib inflate + the five scanline filters from
the public PNG spec, RFC 2083) and WAV (the stdlib `wave` module).
These make the multimodal pipeline's decode step REAL for real bytes —
width/height/pixels out of an actual PNG, channels/rate/duration out
of an actual WAV, frames out of an actual MP4 (sample-table walker +
muxer below; JPEG lives in operators/jpeg.py) — while
`multimodal.py`'s deterministic stubs remain for codecs this
environment cannot decode (H.264 payloads) and for the
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
    """Sequential/progressive JFIF decode (pure Python + numpy IDCT,
    jpeg.py — Huffman AND arithmetic entropy layers); same (width,
    height, channels, pixels) contract as png_decode, except 12-bit
    files return uint16 pixels (png_encode rejects those rather than
    wrap them — rescale explicitly)."""
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


def png_encode(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 (h, w, channels) array as a PNG. `filter_type`
    0 (None), 1 (Sub: delta vs the pixel `channels` bytes left) or
    2 (Up: delta vs the previous scanline) — the spec's §9 filter
    functions, byte-exact inverses of png_decode's unfiltering, so
    fixtures built here put the decoder's filter paths under test."""
    if pixels.dtype != np.uint8:
        # r8: jpeg_decode now returns uint16 for 12-bit files; a
        # silent astype would wrap 256..4095 mod 256 into valid-
        # looking garbage. Raising keeps the caller's degrade path
        # (flagged row) intact, as it was when 12-bit failed earlier.
        raise ValueError(
            f"png_encode takes uint8 pixels, got {pixels.dtype} "
            "(12-bit sources must be rescaled explicitly)")
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filter_type not in (0, 1, 2):
        raise ValueError(f"unsupported encode filter {filter_type}")
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        raw.append(filter_type)
        line = pixels[y].reshape(-1).astype(np.int16)
        if filter_type == 0:
            enc = line
        elif filter_type == 1:  # Sub
            left = np.concatenate(
                [np.zeros(ch, dtype=np.int16), line[:-ch]])
            enc = (line - left) & 0xFF
        else:  # Up
            enc = (line - prev) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prev = line

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


# ---------------------------------------------------------------------------
# MP4 sample extraction + muxing (ISO/IEC 14496-12 sample tables)
# ---------------------------------------------------------------------------

def _mp4_boxes(buf: bytes, start: int, end: int):
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
            raise ValueError(f"mp4: bad box size {size} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def mp4_sample_tables(data: bytes) -> list[dict]:
    """Parse each track's stbl into a flat sample map (the part of
    ISO-BMFF the round-3 probe skipped): stsz sizes, stsc
    sample-to-chunk runs, stco/co64 chunk offsets, stss sync set.
    Returns per track {handler, codec, samples: [(offset, size,
    is_key)]} with absolute file offsets, bounds-checked."""
    tracks: list[dict] = []

    def full(start):
        return data[start], start + 4

    def parse_stbl(s, e, t):
        sizes: list[int] = []
        stsc: list[tuple[int, int]] = []  # (first_chunk, per_chunk)
        offsets: list[int] = []
        sync: set[int] | None = None
        for bt, bs, be in _mp4_boxes(data, s, e):
            if bt == b"stsd":
                _v, p = full(bs)
                (n,) = struct.unpack_from(">I", data, p)
                if n >= 1:
                    t["codec"] = data[p + 8:p + 12].decode(
                        "ascii", "replace")
            elif bt == b"stsz":
                _v, p = full(bs)
                uniform, count = struct.unpack_from(">II", data, p)
                if uniform:
                    sizes = [uniform] * count
                else:
                    sizes = list(struct.unpack_from(
                        f">{count}I", data, p + 8))
            elif bt == b"stsc":
                _v, p = full(bs)
                (n,) = struct.unpack_from(">I", data, p)
                for i in range(n):
                    first, per, _desc = struct.unpack_from(
                        ">III", data, p + 4 + 12 * i)
                    stsc.append((first, per))
            elif bt in (b"stco", b"co64"):
                _v, p = full(bs)
                (n,) = struct.unpack_from(">I", data, p)
                fmt = ">I" if bt == b"stco" else ">Q"
                w = 4 if bt == b"stco" else 8
                offsets = [struct.unpack_from(fmt, data, p + 4 + w * i)[0]
                           for i in range(n)]
            elif bt == b"stss":
                _v, p = full(bs)
                (n,) = struct.unpack_from(">I", data, p)
                sync = {struct.unpack_from(">I", data, p + 4 + 4 * i)[0]
                        for i in range(n)}
        # expand sample-to-chunk runs into per-sample file offsets
        samples: list[tuple[int, int, bool]] = []
        si = 0
        for ci in range(1, len(offsets) + 1):
            per = 0
            for first, per_chunk in stsc:
                if first <= ci:
                    per = per_chunk
                else:
                    break
            pos = offsets[ci - 1]
            for _ in range(per):
                if si >= len(sizes):
                    break
                size = sizes[si]
                if pos + size > len(data):
                    raise ValueError(
                        f"mp4: sample {si + 1} overruns file "
                        f"({pos}+{size} > {len(data)})")
                is_key = sync is None or (si + 1) in sync
                samples.append((pos, size, is_key))
                pos += size
                si += 1
        t["samples"] = samples

    def parse_trak(start, end, t):
        for bt, bs, be in _mp4_boxes(data, start, end):
            if bt == b"mdia":
                for bt2, bs2, be2 in _mp4_boxes(data, bs, be):
                    if bt2 == b"hdlr":
                        _v, p = full(bs2)
                        t["handler"] = data[p + 4:p + 8].decode(
                            "ascii", "replace")
                    elif bt2 == b"minf":
                        for bt3, bs3, be3 in _mp4_boxes(data, bs2, be2):
                            if bt3 == b"stbl":
                                parse_stbl(bs3, be3, t)

    for btype, bstart, bend in _mp4_boxes(data, 0, len(data)):
        if btype == b"moov":
            for bt, bs, be in _mp4_boxes(data, bstart, bend):
                if bt == b"trak":
                    t = {"handler": None, "codec": None, "samples": []}
                    parse_trak(bs, be, t)
                    tracks.append(t)
    if not tracks:
        raise ValueError("mp4: no trak with a sample table found")
    return tracks


def mp4_extract_samples(
    data: bytes,
    handler: str = "vide",
    keyframes_only: bool = False,
    max_samples: int | None = None,
) -> list[tuple[int, bytes, bool]]:
    """Extract (sample_index, payload_bytes, is_keyframe) from the
    first matching track — real frame bytes out of a real container.
    For intra-only codecs (MJPEG-in-MP4, fourcc 'jpeg') each payload
    is a decodable JPEG; inter-coded codecs (H.264...) come out as raw
    access units for a downstream decoder."""
    tracks = [t for t in mp4_sample_tables(data)
              if handler is None or t["handler"] == handler]
    if not tracks:
        raise ValueError(f"mp4: no {handler!r} track")
    out = []
    for i, (pos, size, is_key) in enumerate(tracks[0]["samples"]):
        if keyframes_only and not is_key:
            continue
        out.append((i, data[pos:pos + size], is_key))
        if max_samples is not None and len(out) >= max_samples:
            break
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _full_box(btype: bytes, version: int, flags: int,
              body: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + body)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)


def mp4_encode(
    samples: list[bytes],
    width: int = 0,
    height: int = 0,
    codec: bytes = b"jpeg",
    fps: int = 25,
    samples_per_chunk: int = 2,
    keyframe_every: int = 1,
) -> bytes:
    """Minimal ISO-BMFF muxer: one video track whose samples are the
    given byte strings (MJPEG when they are JPEGs — fourcc 'jpeg' —
    but any payload muxes, which is what lets the oracle-checked gate
    entry push SQL-reproducible bytes through a real container).
    Writes real stts/stsc/stsz/stco tables (chunked, so the reader's
    sample-to-chunk expansion is exercised) and an stss box when
    keyframe_every > 1. The writer-as-fixture-source for
    mp4_extract_samples, same as refdir's writer."""
    n = len(samples)
    if n == 0:
        raise ValueError("mp4_encode: need at least one sample")
    timescale = 1000
    dur = (n * timescale) // fps

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2mp41")
    # mdat payload; chunk = samples_per_chunk consecutive samples
    mdat_body = b"".join(samples)
    mdat_off = len(ftyp) + 8  # absolute offset of first sample
    chunk_offsets = []
    pos = mdat_off
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(len(s) for s in samples[i:i + samples_per_chunk])

    # stsc runs: uniform chunks, plus a short final chunk if needed.
    # When the FIRST chunk is also the last (single short chunk), emit
    # only that entry — two entries sharing first_chunk=1 would
    # violate ISO 14496-12's strictly-increasing first_chunk, and an
    # external parser could take the stale per_chunk and over-read.
    n_chunks = len(chunk_offsets)
    last = n - samples_per_chunk * (n_chunks - 1)
    if n_chunks == 1:
        stsc_entries = [(1, last, 1)]
    else:
        stsc_entries = [(1, samples_per_chunk, 1)]
        if last != samples_per_chunk:
            stsc_entries.append((n_chunks, last, 1))

    entry = (b"\x00" * 6 + struct.pack(">H", 1)       # data_ref_idx
             + b"\x00" * 16                            # predefined
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)      # frame_count
             + b"\x00" * 32                            # compressorname
             + struct.pack(">Hh", 0x18, -1))
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1)
                     + _box(codec, entry))
    stts = _full_box(b"stts", 0, 0, struct.pack(
        ">III", 1, n, timescale // fps))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                     + b"".join(struct.pack(">III", *e)
                                for e in stsc_entries))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(s))
                                for s in samples))
    stco = _full_box(b"stco", 0, 0, struct.pack(">I", n_chunks)
                     + b"".join(struct.pack(">I", o)
                                for o in chunk_offsets))
    stbl = stsd + stts + stsc + stsz + stco
    if keyframe_every > 1:
        keys = list(range(1, n + 1, keyframe_every))
        stbl += _full_box(b"stss", 0, 0, struct.pack(">I", len(keys))
                          + b"".join(struct.pack(">I", k)
                                     for k in keys))
    stbl = _box(b"stbl", stbl)
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full_box(b"url ", 0, 1, b""))
    minf = _box(b"minf",
                _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                + _box(b"dinf", dref) + stbl)
    hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                     + b"\x00" * 12 + b"frames\x00")
    mdhd = _full_box(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full_box(b"tkhd", 0, 3, struct.pack(">III", 0, 0, 1)
                     + b"\x00" * 4 + struct.pack(">I", dur)
                     + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                     + _MATRIX
                     + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full_box(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov
