"""Pure-Python JPEG codec (ITU-T T.81 / JFIF, public spec).

Decoder: sequential baseline (SOF0) AND progressive (SOF2), 8-bit,
Huffman-coded — together the formats ~all JFIF files in a web corpus
use. Handles grayscale and YCbCr with 4:4:4 / 4:2:2 / 4:2:0
subsampling, restart markers, byte stuffing, non-interleaved
(one-component-per-scan) sequential files, and the full progressive
feature set: spectral selection bands, successive approximation (DC
and AC first + refinement passes, T.81 G.2), and EOB runs. All scan
types fill one per-component coefficient store; dequantization, the
batched-einsum IDCT, and upsampling run once at the end, so the
pixel math stays vectorized while the entropy walk is per-symbol
Python (fine for the thumbnail/metadata pass multimodal feature
extraction does).

Encoders: baseline 4:4:4 / grayscale (`jpeg_encode`) and progressive
(`jpeg_encode_progressive`, spectral-selection + successive-
approximation scan script) with the Annex K quantization tables
(quality-scaled, IJG curve) and Annex K typical Huffman tables.
Both entropy layers are lossless over the same quantized
coefficients, so progressive and baseline encodes of one image must
decode bit-identically — which is exactly what the tests pin.

12-bit extended sequential (SOF1) and 12-bit progressive decode for
real since r8: precision comes from the SOF, the level shift/clip
and YCbCr offsets follow 2^(P-1), 16-bit quantization tables (DQT
Pq=1) parse, and the output array is uint16 for P=12 (uint8 for
P=8, unchanged). `jpeg_encode(..., precision=12)` emits SOF1 with
16x-scaled quantization tables — the scaling keeps every Huffman
magnitude category inside the Annex K code books (T.81 limits
12-bit DC diffs to category 15 and AC to 14; with q >= 160 the
encoder never exceeds 8), so the standard tables stay valid.

Arithmetic-coded sequential (SOF9) decodes AND encodes for real since
r8 through operators/jpeg_arith.py (T.81 Annex D QM-coder + Annex F
decision models; `jpeg_encode(..., arithmetic=True)`), dispatched
behind the same jpeg_decode(). Progressive-arithmetic (SOF10),
lossless, and hierarchical modes remain out of scope and raise
ValueError with the mode named.
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

    def tail_pos(self) -> int:
        """Byte offset of the next real marker after the entropy data
        this reader just consumed (pad bits skipped, stuffed 0xFF00
        ignored). _fill never advances past a marker, so if one was
        hit it is still at self.pos; otherwise scan forward."""
        if self.marker is not None:
            return self.pos
        d, p = self.data, self.pos
        while p < len(d) - 1:
            if d[p] == 0xFF and d[p + 1] != 0x00:
                return p
            p += 2 if d[p] == 0xFF else 1
        return len(d)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _decode_block_baseline(reader, block, dc_tab, ac_tab, pred, cid):
    """Sequential-DCT block: DC diff + full AC band (T.81 F.2)."""
    t = reader.decode_symbol(dc_tab)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    block[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        block[k] = _extend(reader.read_bits(s), s)
        k += 1


def _decode_block_progressive(reader, block, dc_tab, ac_tab, ss, se,
                              ah, al, pred, cid, state):
    """One block's worth of one progressive scan (T.81 G.2): DC
    first/refinement, AC first with EOB runs, AC refinement with
    correction bits."""
    if ss == 0:
        if ah == 0:  # DC first: baseline DC diff, point-transformed
            t = reader.decode_symbol(dc_tab)
            diff = _extend(reader.read_bits(t), t) if t else 0
            pred[cid] += diff
            block[0] = pred[cid] << al
        else:  # DC refinement: one raw bit per block
            if reader.read_bit():
                block[0] |= 1 << al
        return
    if ah == 0:  # AC first scan over the band [ss, se]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + \
                    (reader.read_bits(r) if r else 0)
                return
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            block[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return
    # AC refinement (T.81 G.1.2.3 decode side): newly-significant
    # coefficients carry a sign bit; already-significant ones passed
    # over collect correction bits
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) + \
                        (reader.read_bits(r) if r else 0)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "invalid magnitude in AC refinement scan")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if block[k] != 0:
                    if reader.read_bit() and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0:
                if k > se:
                    raise ValueError("refinement run past band end")
                block[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if block[k] != 0:
                if reader.read_bit() and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] > 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_scan(reader, scan, ss, se, ah, al, progressive,
                 restart_interval, huff_dc, huff_ac, coef, by_id,
                 hmax, vmax, mcux, mcuy, width, height):
    """Decode one SOS's entropy segment into the coefficient store.

    Interleaved scans (>1 component) walk the padded MCU grid;
    single-component scans are non-interleaved per T.81 A.2 (the MCU
    is one block and only the component's own ceil-divided grid is
    coded). Restart markers reset DC predictors and the EOB run."""
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scan) != 1:
            raise ValueError(
                "progressive AC scan must be single-component")
        if ss > se or se > 63:
            raise ValueError("invalid spectral band")
    elif (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("sequential scan with progressive parameters")

    pred = {cid: 0 for cid, _, _ in scan}
    state = {"eobrun": 0}
    need_dc, need_ac = ss == 0, (se > 0 or not progressive)

    def tables(td, ta):
        if need_dc and td not in huff_dc:
            raise ValueError(f"missing DC Huffman table {td}")
        if need_ac and ta not in huff_ac:
            raise ValueError(f"missing AC Huffman table {ta}")
        return huff_dc.get(td), huff_ac.get(ta)

    def block_fn(block, dc_tab, ac_tab, cid):
        if progressive:
            _decode_block_progressive(reader, block, dc_tab, ac_tab,
                                      ss, se, ah, al, pred, cid, state)
        else:
            _decode_block_baseline(reader, block, dc_tab, ac_tab,
                                   pred, cid)

    unit = 0

    def check_restart():
        nonlocal unit
        if restart_interval and unit and unit % restart_interval == 0:
            reader.sync_restart()
            for c in pred:
                pred[c] = 0
            state["eobrun"] = 0
        unit += 1

    if len(scan) > 1:  # interleaved: full padded MCU grid
        tabs = {cid: tables(td, ta) for cid, td, ta in scan}
        for my in range(mcuy):
            for mx in range(mcux):
                check_restart()
                for cid, _td, _ta in scan:
                    _, h, v, _tq = by_id[cid]
                    dc_tab, ac_tab = tabs[cid]
                    for bv in range(v):
                        for bh in range(h):
                            block_fn(coef[cid][my * v + bv,
                                               mx * h + bh],
                                     dc_tab, ac_tab, cid)
    else:  # non-interleaved: the component's own block grid
        cid, td, ta = scan[0]
        _, h, v, _tq = by_id[cid]
        dc_tab, ac_tab = tables(td, ta)
        cbw = _ceil_div(_ceil_div(width * h, hmax), 8)
        cbh = _ceil_div(_ceil_div(height * v, vmax), 8)
        for by in range(cbh):
            for bx in range(cbw):
                check_restart()
                block_fn(coef[cid][by, bx], dc_tab, ac_tab, cid)


def jpeg_decode(data: bytes,
                max_pixels: int = 64 << 20) -> tuple[int, int, int,
                                                     np.ndarray]:
    """Decode a baseline (SOF0) or progressive (SOF2) JFIF. Returns
    (width, height, channels, uint8 array (height, width, channels));
    channels is 1 (gray) or 3 (RGB). `max_pixels` bounds work/memory
    against decompression bombs (a corrupt SOF claiming 65535x65535
    must fail fast, not spin the executor). Every scan fills one
    per-component coefficient store; dequantization + IDCT run once
    after the last scan, so truncated progressive files decode to
    their coarse approximation rather than failing."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    buf = data + b"\xff\xd9"  # sentinel for entropy readers
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = []  # (id, h, v, tq)
    width = height = None
    restart_interval = 0
    progressive = False
    arithmetic = False
    precision = 8
    dc_cond: dict[int, tuple] = {}
    ac_cond: dict[int, int] = {}
    coef: dict[int, np.ndarray] | None = None
    by_id: dict[int, tuple] = {}
    hmax = vmax = mcux = mcuy = 0
    nscans = 0
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
        if marker == 0xDB:  # DQT (Pq=1 -> 16-bit values, 12-bit files)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                table = np.zeros(64)
                if pq == 0:
                    table[_ZZ] = np.frombuffer(body[i:i + 64],
                                               np.uint8)
                    i += 64
                elif pq == 1:
                    table[_ZZ] = np.frombuffer(
                        body[i:i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    raise ValueError(f"invalid DQT precision {pq}")
                qt[tq] = table.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0 baseline / SOF1 extended sequential (8- or 12-bit)
            # / SOF2 progressive / SOF9 extended sequential ARITHMETIC
            if comps:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            arithmetic = marker == 0xC9
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0)
            if precision not in (8, 12) or \
                    (precision == 12 and marker == 0xC0):
                raise ValueError(
                    f"SOF{marker - 0xC0} with {precision}-bit "
                    "samples unsupported")
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            if len(comps) == 1:
                # T.81 A.2: a single-component image is always decoded
                # non-interleaved — the declared sampling factors do
                # not apply (grayscale files often keep the source's
                # 2x2 luma sampling in SOF)
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            if width * height > max_pixels:
                raise ValueError(
                    f"image {width}x{height} exceeds "
                    f"max_pixels={max_pixels}")
            if not comps or any(c[1] < 1 or c[2] < 1 or c[1] > 4
                                or c[2] > 4 for c in comps):
                raise ValueError("invalid component sampling factors")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = _ceil_div(width, 8 * hmax)
            mcuy = _ceil_div(height, 8 * vmax)
            by_id = {c[0]: c for c in comps}
            # zigzag-order coefficient store over the padded MCU grid
            coef = {c[0]: np.zeros((mcuy * c[2], mcux * c[1], 64),
                                   np.int64) for c in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0})")
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            i = 0
            while i < len(body):
                tc, tb = body[i] >> 4, body[i] & 15
                cs = body[i + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs                  # Kx
                i += 2
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
        elif marker == 0xDA:  # SOS — decode this scan's entropy data
            if coef is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tdta = body[1 + 2 * c], body[2 + 2 * c]
                if cid not in by_id:
                    raise ValueError(f"scan references unknown "
                                     f"component {cid}")
                scan.append((cid, tdta >> 4, tdta & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            pos += seglen
            if arithmetic:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError(
                        "progressive parameters in an arithmetic "
                        "sequential scan")
                from .jpeg_arith import decode_scan_arith
                pos = decode_scan_arith(
                    buf, pos, scan, dc_cond, ac_cond, coef, by_id,
                    hmax, vmax, mcux, mcuy, width, height,
                    restart_interval)
            else:
                reader = _BitReader(buf, pos)
                _decode_scan(reader, scan, ss, se, ah, al,
                             progressive, restart_interval, huff_dc,
                             huff_ac, coef, by_id, hmax, vmax, mcux,
                             mcuy, width, height)
                pos = reader.tail_pos()
            nscans += 1
            continue
        pos += seglen
    if width is None or nscans == 0:
        raise ValueError("missing SOF/SOS")

    mid = float(1 << (precision - 1))     # level shift (T.81 A.3.1)
    peak = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    planes: dict[int, np.ndarray] = {}
    for cid, h, v, tq in comps:
        if tq not in qt:
            raise ValueError(f"missing quantization table {tq}")
        arr = coef[cid]
        rows, cols = arr.shape[:2]
        dez = np.zeros((rows * cols, 64))
        dez[:, _ZZ] = arr.reshape(-1, 64)
        pix = _idct_blocks(
            dez.reshape(-1, 8, 8) * qt[tq][None, :, :]) + mid
        plane = (pix.reshape(rows, cols, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8))
        # upsample to full resolution
        if h != hmax or v != vmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0),
                              hmax // h, axis=1)
        planes[cid] = plane[:height, :width]

    if len(comps) == 1:
        gray = np.clip(planes[comps[0][0]], 0, peak) \
            .round().astype(dtype)
        return width, height, 1, gray[:, :, None]
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    y, cb, cr = (planes[comps[i][0]] for i in range(3))
    cb = cb - mid
    cr = cr - mid
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, peak) \
        .round().astype(dtype)
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


def jpeg_encode(pixels: np.ndarray, quality: int = 90,
                precision: int = 8, arithmetic: bool = False) -> bytes:
    """Encode (h, w, 1|3) pixels as sequential JFIF (4:4:4).
    precision=8 emits baseline SOF0 over uint8 samples (unchanged
    path); precision=12 emits extended sequential SOF1 over samples
    in [0, 4095] with 16x-scaled quantization tables in a 16-bit DQT
    — the scaling bounds every Huffman magnitude category inside the
    Annex K code books (module docstring), so the standard tables
    serve both precisions. arithmetic=True swaps the Huffman entropy
    layer for the T.81 QM-coder (SOF9, operators/jpeg_arith.py):
    same quantized coefficients, so Huffman and arithmetic encodes of
    one image decode bit-identically — pinned by tests."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    mid = float(1 << (precision - 1))
    peak = (1 << precision) - 1
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if int(pixels.max(initial=0)) > peak:
        raise ValueError(f"sample exceeds {precision}-bit range")
    h, w, ch = pixels.shape
    if ch == 3:
        rf, gf, bf = (pixels[:, :, i].astype(np.float64)
                      for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + mid
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + mid
        planes = [y, cb, cr]
    elif ch == 1:
        planes = [pixels[:, :, 0].astype(np.float64)]
    else:
        raise ValueError("1- or 3-channel input only")

    qscale = 1 if precision == 8 else 16
    qluma = _quality_scale(_K_LUMA, quality)
    qchroma = _quality_scale(_K_CHROMA, quality)
    if precision == 12:
        # Clamp the base table to >= 2 (effective quant >= 32) so the
        # worst-case 12-bit coefficient (|DCT| <= 8 * 2048 = 16384)
        # quantizes to <= 512 and DC diffs to <= 1024 — magnitude
        # categories 10 / 11, inside the Annex K code books. Without
        # the clamp, quality >= 96 drives the scaled DC quant to 16
        # and a full-range image needs category 12, which the K.3 DC
        # table lacks (found by review: KeyError at quality 96+).
        qluma = np.maximum(qluma, 2)
        qchroma = np.maximum(qchroma, 2)
    qluma = qluma * qscale
    qchroma = qchroma * qscale
    qts = [qluma.reshape(8, 8)] + \
        ([qchroma.reshape(8, 8)] * 2 if ch == 3 else [])

    out = bytearray(b"\xff\xd8")
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, tab in ((0, qluma), (1, qchroma))[:1 if ch == 1 else 2]:
        zzvals = tab.reshape(64)[_ZZ]  # DQT stores zigzag order
        if precision == 12:  # Pq=1: 16-bit big-endian values
            body = bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", int(v)) for v in zzvals)
        else:
            body = bytes([tq]) + bytes(int(v) for v in zzvals)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if ch == 1 else 3
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0 if c == 0 else 1)
    if arithmetic:
        sof_marker = b"\xff\xc9"
    else:
        sof_marker = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(">H", len(sof) + 2) + sof
    if arithmetic:
        # DAC: write the defaults explicitly (DC L=0/U=1, AC Kx=5)
        dac = b""
        for th in range(1 if ch == 1 else 2):
            dac += bytes([th, 0x10])          # Tc=0: U<<4 | L
            dac += bytes([0x10 | th, 5])      # Tc=1: Kx
        out += b"\xff\xcc" + struct.pack(">H", len(dac) + 2) + dac
    else:
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
              .reshape(-1, 8, 8)) - mid
        coeff = _dct_blocks(bl) / qts[ci][None, :, :]
        qb = np.round(coeff).astype(np.int64).reshape(-1, 64)[:, _ZZ]
        qblocks.append(qb)
    if arithmetic:
        from .jpeg_arith import encode_scan_arith
        out += encode_scan_arith(qblocks, ncomp, mcux * mcuy)
        out += b"\xff\xd9"
        return bytes(out)
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


# ---------------------------------------------------------------------------
# progressive encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------

def _flush_eobrun(bw, ac_enc, st) -> None:
    """Emit a pending EOBn symbol (run length in the symbol's high
    nibble exponent + extension bits) followed by the correction bits
    buffered behind the run (refinement scans only).

    This encoder only ever accumulates runs of 1 (EOB1 == symbol
    0x00): the EOBn>1 symbols 0x10..0xE0 do not exist in the Annex K
    baseline Huffman tables — real progressive encoders ship custom
    per-scan DHTs to use them. The generic emission below stays
    correct for any future custom-table path; the decoder handles
    EOBn up to 14 regardless (pinned by a hand-built stream test)."""
    n = st["eobrun"]
    if n > 0:
        nb = n.bit_length() - 1
        ln, c = ac_enc[nb << 4]
        bw.write(ln, c)
        if nb:
            bw.write(nb, n - (1 << nb))
        st["eobrun"] = 0
    for b in st["pend"]:
        bw.write(1, b)
    st["pend"] = []


def _emit_ac_first_block(bw, ac_enc, zz, ss, se, al, st) -> None:
    """AC first scan for one block: band [ss, se] point-transformed by
    Al (truncation toward zero), zero runs + EOB-run folding."""
    band = [(abs(int(zz[k])) >> al) * (1 if zz[k] > 0 else -1)
            for k in range(ss, se + 1)]
    last_nz = -1
    for i, v in enumerate(band):
        if v != 0:
            last_nz = i
    if last_nz < 0:
        st["eobrun"] += 1
        _flush_eobrun(bw, ac_enc, st)  # EOB1: Annex K tables lack EOBn>1
        return
    _flush_eobrun(bw, ac_enc, st)
    r = 0
    for i in range(last_nz + 1):
        v = band[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            ln, c = ac_enc[0xF0]
            bw.write(ln, c)
            r -= 16
        t, code = _encode_magnitude(v)
        ln, c = ac_enc[(r << 4) | t]
        bw.write(ln, c)
        bw.write(t, code)
        r = 0
    if last_nz < len(band) - 1:
        st["eobrun"] += 1
        _flush_eobrun(bw, ac_enc, st)  # EOB1: Annex K tables lack EOBn>1


def _emit_ac_refine_block(bw, ac_enc, zz, ss, se, al, st) -> None:
    """AC refinement scan for one block (T.81 G.1.2.3 encode side):
    newly-significant coefficients (|v| >> Al == 1) emit run+sign;
    already-significant ones buffer one correction bit each, emitted
    after the next symbol (or behind the EOB run)."""
    band = [int(zz[k]) for k in range(ss, se + 1)]
    tvals = [abs(v) >> al for v in band]
    eobi = -1
    for i, t in enumerate(tvals):
        if t == 1:
            eobi = i
    r = 0
    br: list[int] = []
    for i, t in enumerate(tvals):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eobi:
            _flush_eobrun(bw, ac_enc, st)
            ln, c = ac_enc[0xF0]
            bw.write(ln, c)
            r -= 16
            for b in br:
                bw.write(1, b)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _flush_eobrun(bw, ac_enc, st)
        ln, c = ac_enc[(r << 4) | 1]
        bw.write(ln, c)
        bw.write(1, 1 if band[i] > 0 else 0)
        for b in br:
            bw.write(1, b)
        br = []
        r = 0
    if r > 0 or br:
        st["eobrun"] += 1
        st["pend"].extend(br)
        _flush_eobrun(bw, ac_enc, st)  # EOB1: Annex K tables lack EOBn>1


def jpeg_encode_progressive(pixels: np.ndarray,
                            quality: int = 90) -> bytes:
    """Encode (h, w, 1|3) uint8 pixels as a progressive JFIF (SOF2,
    4:4:4) with a jpegtran-style scan script: DC first at Al=1, AC
    bands first at Al=2/1, then AC and DC refinement passes down to
    full precision. The quantized coefficients are identical to
    `jpeg_encode`'s at the same quality — the progressive entropy
    layer is lossless over them — so decoding this file must produce
    bit-identical pixels to decoding the baseline encode (pinned in
    tests)."""
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
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, tab in ((0, qluma), (1, qchroma))[:1 if ch == 1 else 2]:
        zzvals = tab.reshape(64)[_ZZ]
        body = bytes([tq]) + bytes(int(v) for v in zzvals)
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0 if c == 0 else 1)
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    tables = [(0, 0, _K_DC_LUMA), (1, 0, _K_AC_LUMA)]
    if ch == 3:
        tables += [(0, 1, _K_DC_CHROMA), (1, 1, _K_AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    enc_dc = [_build_encode_table(*_K_DC_LUMA)] + \
        [_build_encode_table(*_K_DC_CHROMA)] * (2 if ch == 3 else 0)
    enc_ac = [_build_encode_table(*_K_AC_LUMA)] + \
        [_build_encode_table(*_K_AC_CHROMA)] * (2 if ch == 3 else 0)

    mcux, mcuy = (w + 7) // 8, (h + 7) // 8
    qblocks = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, mcuy * 8 - h), (0, mcux * 8 - w)),
                    mode="edge")
        bl = (pp.reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8)) - 128.0
        coeff = _dct_blocks(bl) / qts[ci][None, :, :]
        qblocks.append(
            np.round(coeff).astype(np.int64).reshape(-1, 64)[:, _ZZ])
    nblocks = mcux * mcuy

    # scan script: (component list, Ss, Se, Ah, Al)
    if ncomp == 3:
        script = [
            (list(range(3)), 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            (list(range(3)), 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]

    for comps_in_scan, ss, se, ah, al in script:
        sos = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        bw = _BitWriter()
        st = {"eobrun": 0, "pend": []}
        if ss == 0:  # DC scan (interleaved over comps_in_scan)
            if ah == 0:
                pred = {ci: 0 for ci in comps_in_scan}
                for b in range(nblocks):
                    for ci in comps_in_scan:
                        dc = int(qblocks[ci][b][0]) >> al
                        t, code = _encode_magnitude(dc - pred[ci])
                        pred[ci] = dc
                        ln, c2 = enc_dc[ci][t]
                        bw.write(ln, c2)
                        if t:
                            bw.write(t, code)
            else:
                for b in range(nblocks):
                    for ci in comps_in_scan:
                        bw.write(1, (int(qblocks[ci][b][0]) >> al) & 1)
        else:  # AC scan: single component, non-interleaved
            (ci,) = comps_in_scan
            for b in range(nblocks):
                if ah == 0:
                    _emit_ac_first_block(bw, enc_ac[ci], qblocks[ci][b],
                                         ss, se, al, st)
                else:
                    _emit_ac_refine_block(bw, enc_ac[ci], qblocks[ci][b],
                                          ss, se, al, st)
            _flush_eobrun(bw, enc_ac[ci], st)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
