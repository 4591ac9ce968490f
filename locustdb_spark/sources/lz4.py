"""Pure-Python LZ4 block + frame codec.

The reference persists column data sections through lz4_flex's FRAME
format (reference src/mem_store/lz4.rs: FrameEncoder/FrameDecoder) and
metastore string blobs through the size-prepended BLOCK format
(src/disk_store/meta_store.rs: decompress_size_prepended). Both are
the public LZ4 formats (lz4.org spec); this module implements enough
of each to read a reference data directory and to write frames the
reference can read back:

- block decompress (with optional history for linked frame blocks)
- block compress (greedy hash-chain; valid spec output, used by the
  writer and for round-trip tests)
- frame decompress (all FLG variants: linked/independent blocks,
  content size, checksums present are skipped)
- frame compress (independent 64 KiB blocks, no checksums, correct
  xxhash32 header checksum so strict decoders accept it)

No external lz4 library exists in the build environment, so the codec
is stdlib-only; throughput is migration-tool grade, not query-path
grade (the query path never touches LZ4 — Parquet handles scan
compression).
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_MIN_MATCH = 4
_LAST_LITERALS = 5
_MFLIMIT = 12  # no match may start within this many bytes of block end


# ---------------------------------------------------------------------------
# xxhash32 (public algorithm; needed for the frame header checksum)
# ---------------------------------------------------------------------------

_P1, _P2, _P3, _P4, _P5 = (2654435761, 2246822519, 3266489917,
                           668265263, 374761393)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            a, b, c, d = struct.unpack_from("<4I", data, i)
            v1 = (_rotl32((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + d * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------------

def decompress_block(src: bytes, out: bytearray | None = None,
                     max_output: int | None = None) -> bytearray:
    """Decode one LZ4 block. `out` may hold history (linked blocks):
    new bytes are appended and matches may reach into it. Returns
    `out`."""
    if out is None:
        out = bytearray()
    i, n = 0, len(src)
    limit = None if max_output is None else len(out) + max_output
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if lit_len:
            if i + lit_len > n:
                raise ValueError("lz4: literal run past end of block")
            out += src[i:i + lit_len]
            i += lit_len
        if i >= n:
            break  # last sequence has no match
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0xF)
        if match_len == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += _MIN_MATCH
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: match offset before start of data")
        if offset >= match_len:
            out += out[start:start + match_len]
        else:  # overlapping match: byte-wise semantics, chunked copy
            remaining = match_len
            while remaining > 0:
                chunk = out[start:start + min(offset, remaining)]
                out += chunk
                remaining -= len(chunk)
                offset = len(out) - start  # period grows as we append
        if limit is not None and len(out) > limit:
            raise ValueError("lz4: output exceeds declared size")
    return out


def decompress_size_prepended(src: bytes) -> bytes:
    """lz4_flex block::decompress_size_prepended: u32-LE decompressed
    size, then one block (meta_store.rs compressed strings)."""
    (size,) = struct.unpack_from("<I", src, 0)
    out = decompress_block(src[4:], max_output=size)
    if len(out) != size:
        raise ValueError(
            f"lz4: declared {size} bytes, decoded {len(out)}")
    return bytes(out)


def _write_len(extra: int, buf: bytearray) -> None:
    while extra >= 255:
        buf.append(255)
        extra -= 255
    buf.append(extra)


def compress_block(src: bytes) -> bytes:
    """Greedy single-probe hash-table compressor (spec-valid; favors
    simplicity over ratio). Always emits a closing literal run."""
    n = len(src)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    match_limit = n - _LAST_LITERALS
    while i + _MFLIMIT <= n:
        key = src[i:i + 4]
        cand = table.get(key)  # type: ignore[arg-type]
        table[key] = i  # type: ignore[index]
        if cand is None or i - cand > 0xFFFF or src[cand:cand + 4] != key:
            i += 1
            continue
        # extend the match forward (stop before the last-5 limit)
        m = i + 4
        c = cand + 4
        while m < match_limit and src[m] == src[c]:
            m += 1
            c += 1
        lit_len = i - anchor
        match_len = m - i - _MIN_MATCH
        token = (min(lit_len, 15) << 4) | min(match_len, 15)
        out.append(token)
        if lit_len >= 15:
            _write_len(lit_len - 15, out)
        out += src[anchor:i]
        out += struct.pack("<H", i - cand)
        if match_len >= 15:
            _write_len(match_len - 15, out)
        anchor = m
        i = m
    lit_len = n - anchor
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        _write_len(lit_len - 15, out)
    out += src[anchor:]
    return bytes(out)


# ---------------------------------------------------------------------------
# frame format
# ---------------------------------------------------------------------------

def decompress_frame(src: bytes) -> bytes:
    """Decode an LZ4 frame (the format lz4_flex FrameEncoder writes).
    Handles linked and independent block modes; checksums are parsed
    past, not verified (the enclosing blob already carries a sha256)."""
    (magic,) = struct.unpack_from("<I", src, 0)
    if magic != _MAGIC:
        raise ValueError(f"lz4: bad frame magic {magic:#x}")
    flg = src[4]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    block_checksum = bool(flg & 0x10)
    content_size_flag = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    i = 6  # past FLG + BD
    if content_size_flag:
        i += 8
    if dict_id:
        # matches may reference preset-dictionary history this
        # decoder does not have — corrupt output with no error is
        # worse than refusing
        raise ValueError("lz4: preset-dictionary frames unsupported")
    i += 1  # header checksum byte
    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<I", src, i)
        i += 4
        if bsize == 0:
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = src[i:i + bsize]
        if len(block) != bsize:
            raise ValueError("lz4: truncated frame block")
        i += bsize
        if uncompressed:
            out += block
        else:
            decompress_block(block, out)
        if block_checksum:
            i += 4
    if content_checksum:
        i += 4
    return bytes(out)


def compress_frame(data: bytes, block_size: int = 1 << 16) -> bytes:
    """Encode an LZ4 frame with independent blocks and no checksums —
    readable by any spec decoder including lz4_flex FrameDecoder."""
    flg = 0x40 | 0x20  # version 01, block independence
    bd = 0x40  # max block size 64 KiB
    header = bytes([flg, bd])
    hc = (xxh32(header) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + header + bytes([hc]))
    for start in range(0, len(data), block_size):
        chunk = data[start:start + block_size]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # end mark
    return bytes(out)
