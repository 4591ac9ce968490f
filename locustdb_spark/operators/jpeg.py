"""Pure-Python baseline JPEG codec (ITU-T T.81 / JFIF, public spec).

Decoder: baseline sequential DCT, 8-bit, Huffman-coded — the format
~all JFIF files in a web corpus use. Handles grayscale and YCbCr with
4:4:4 / 4:2:2 / 4:2:0 subsampling, restart markers, and byte
stuffing. The Huffman/bitstream walk is per-symbol Python (fine for
the thumbnail/metadata pass multimodal feature extraction does); the
IDCT runs as one batched numpy einsum over every block of a
component, so pixel math is vectorized.

Encoder: 4:4:4 / grayscale with the Annex K quantization tables
(quality-scaled, IJG curve) and Annex K typical Huffman tables —
enough to round-trip the decoder in tests and to emit files any
standard decoder opens.

Progressive, arithmetic-coded, 12-bit, and hierarchical modes are out
of scope and raise ValueError with the mode named.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: zz order -> (row, col) linear position
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU T.81 Annex K.1 — luminance / chrominance quantization tables
_K_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_K_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples
    (still centered on 0)."""
    return np.einsum("ux,nuv,vy->nxy", _A, coeffs, _A, optimize=True)


def _dct_blocks(samples: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _A, samples, _A, optimize=True)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """(length, code) -> symbol, canonical assignment (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    return {sym: (length, code)
            for (length, code), sym in
            _build_decode_table(bits, huffval).items()}


class _BitReader:
    """Entropy-segment reader: 0xFF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_symbol(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to the next byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip to the marker if we stopped early
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def jpeg_decode(data: bytes,
                max_pixels: int = 64 << 20) -> tuple[int, int, int,
                                                     np.ndarray]:
    """Decode a baseline JFIF. Returns (width, height, channels,
    uint8 array (height, width, channels)); channels is 1 (gray) or
    3 (RGB). `max_pixels` bounds work/memory against decompression
    bombs (a corrupt SOF claiming 65535x65535 must fail fast, not
    spin the executor)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = []  # (id, h, v, tq)
    width = height = None
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: fill bytes before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                table = np.zeros(64)
                table[_ZZ] = np.frombuffer(body[i:i + 64], np.uint8)
                qt[tq] = table.reshape(8, 8)
                i += 64
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0)
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0})")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cid, tdta >> 4, tdta & 15))
            pos += seglen
            break
        pos += seglen
    if width is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    if len(scan) != len(comps):
        # spec-valid but rare: one scan per component
        # (non-interleaved); decoding it as interleaved would return
        # plausible-shaped garbage — refuse instead
        raise ValueError(
            f"non-interleaved multi-scan JPEG unsupported "
            f"({len(scan)} of {len(comps)} components in first scan)")
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is non-interleaved — the
        # MCU is one 8x8 block and the declared sampling factors do
        # not apply (grayscale files often keep the source's 2x2
        # luma sampling in SOF)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    if width * height > max_pixels:
        raise ValueError(
            f"image {width}x{height} exceeds max_pixels={max_pixels}")
    if not comps or any(c[1] < 1 or c[2] < 1 or c[1] > 4 or c[2] > 4
                        for c in comps):
        raise ValueError("invalid component sampling factors")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(data + b"\xff\xd9", pos)

    by_id = {c[0]: c for c in comps}
    blocks: dict[int, list] = {c[0]: [] for c in comps}
    pred: dict[int, int] = {c[0]: 0 for c in comps}
    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                for cid in pred:
                    pred[cid] = 0
            mcu_count += 1
            for cid, td, ta in scan:
                _, h, v, _tq = by_id[cid]
                for _ in range(h * v):
                    zz = np.zeros(64)
                    t = reader.decode_symbol(huff_dc[td])
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(huff_ac[ta])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    blocks[cid].append(zz)

    planes: dict[int, np.ndarray] = {}
    for cid, h, v, tq in comps:
        bl = np.stack(blocks[cid]) if blocks[cid] else \
            np.zeros((0, 64))
        coeff = np.zeros((len(bl), 64))
        coeff[:, _ZZ] = bl
        coeff = coeff.reshape(-1, 8, 8) * qt[tq][None, :, :]
        pix = _idct_blocks(coeff) + 128.0
        # reassemble: blocks are emitted MCU by MCU, h*v per MCU
        cw, ch = mcux * h * 8, mcuy * v * 8
        plane = np.zeros((ch, cw))
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for bv in range(v):
                    for bh in range(h):
                        y0 = (my * v + bv) * 8
                        x0 = (mx * h + bh) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = pix[i]
                        i += 1
        # upsample to full resolution
        if h != hmax or v != vmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0),
                              hmax // h, axis=1)
        planes[cid] = plane[:height, :width]

    if len(comps) == 1:
        gray = np.clip(planes[comps[0][0]], 0, 255) \
            .round().astype(np.uint8)
        return width, height, 1, gray[:, :, None]
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    y, cb, cr = (planes[comps[i][0]] for i in range(3))
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)
    return width, height, 3, rgb


# ---------------------------------------------------------------------------
# encoder (4:4:4 / grayscale; Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = np.floor((table * scale + 50) / 100)
    return np.clip(out, 1, 255)


def _encode_magnitude(v: int) -> tuple[int, int]:
    """(bit-length t, t-bit magnitude code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 1|3) uint8 pixels as baseline JFIF (4:4:4)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    if ch == 3:
        rf, gf, bf = (pixels[:, :, i].astype(np.float64)
                      for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [y, cb, cr]
    elif ch == 1:
        planes = [pixels[:, :, 0].astype(np.float64)]
    else:
        raise ValueError("1- or 3-channel input only")

    qluma = _quality_scale(_K_LUMA, quality)
    qchroma = _quality_scale(_K_CHROMA, quality)
    qts = [qluma.reshape(8, 8)] + \
        ([qchroma.reshape(8, 8)] * 2 if ch == 3 else [])

    out = bytearray(b"\xff\xd8")
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, tab in ((0, qluma), (1, qchroma))[:1 if ch == 1 else 2]:
        zzvals = tab.reshape(64)[_ZZ]  # DQT stores zigzag order
        body = bytes([tq]) + bytes(int(v) for v in zzvals)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if ch == 1 else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0 if c == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    tables = [(0, 0, _K_DC_LUMA), (1, 0, _K_AC_LUMA)]
    if ch == 3:
        tables += [(0, 1, _K_DC_CHROMA), (1, 1, _K_AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    enc_dc = [_build_encode_table(*_K_DC_LUMA)]
    enc_ac = [_build_encode_table(*_K_AC_LUMA)]
    if ch == 3:
        enc_dc += [_build_encode_table(*_K_DC_CHROMA)] * 2
        enc_ac += [_build_encode_table(*_K_AC_CHROMA)] * 2

    bw = _BitWriter()
    mcux, mcuy = (w + 7) // 8, (h + 7) // 8
    # pad planes to block multiples with edge replication
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, mcuy * 8 - h), (0, mcux * 8 - w)),
                    mode="edge")
        padded.append(pp)
    # quantized coefficient blocks per component, in MCU order
    qblocks = []
    for ci, p in enumerate(padded):
        bl = (p.reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8)) - 128.0
        coeff = _dct_blocks(bl) / qts[ci][None, :, :]
        qb = np.round(coeff).astype(np.int64).reshape(-1, 64)[:, _ZZ]
        qblocks.append(qb)
    pred = [0] * ncomp
    for b in range(mcux * mcuy):
        for ci in range(ncomp):
            zz = qblocks[ci][b]
            dc = int(zz[0])
            t, code = _encode_magnitude(dc - pred[ci])
            pred[ci] = dc
            ln, c2 = enc_dc[ci][t]
            bw.write(ln, c2)
            if t:
                bw.write(t, code)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) \
                if np.any(zz[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, c2 = enc_ac[ci][0xF0]
                    bw.write(ln, c2)
                    run -= 16
                t, code = _encode_magnitude(v)
                ln, c2 = enc_ac[ci][(run << 4) | t]
                bw.write(ln, c2)
                bw.write(t, code)
                run = 0
            if last_nz < 63:
                ln, c2 = enc_ac[ci][0x00]
                bw.write(ln, c2)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
