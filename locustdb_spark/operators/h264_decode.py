"""H.264 / AVC baseline-profile INTRA pixel decode (I slices, CAVLC),
pure Python + numpy against the public ITU-T H.264 (08/2021) spec —
the pixel layer the syntax module (operators/h264.py) deliberately
stopped short of: CAVLC residual decode (§9.2), Intra_4x4 /
Intra_16x16 / chroma prediction (§8.3), dequantization and the 4x4
integer inverse transform with the luma-DC Hadamard and chroma-DC
paths (§8.5), macroblock-layer parsing (§7.3.5), and I_PCM. Plus the
matching ENCODER (entropy coder + golden-stream builder) so every
decoded stream in tests and oracles is spec-derived, never captured.

Reference parity note: the reference engine stores video as opaque
blobs (SURVEY §2.3) — this module is "beyond the reference" training-
data-pipeline capability, the decode step behind the multimodal
column plumbing (operators/multimodal.py). P-slice inter decode
(P_L0_16x16 + P_Skip, quarter-sample motion compensation) lives in
operators/h264_inter.py on top of this layer; B slices, sub-16x16
partitions, CABAC, and deblocking remain out of scope and raise
named errors.

Offline-spec discipline (same as sources/pco.py and operators/
jpeg.py): no conformance bitstreams exist in this environment, so
the CAVLC VLC tables (Tables 9-2, 9-4, 9-7/9-8/9-9, 9-10) are
reconstructed from the public spec. Confidence notes:
- HIGH: the Exp-Golomb layer, level_prefix/suffix algorithm
  (§9.2.2.1-2), run_before (Table 9-10), total_zeros for
  TotalCoeff=1, chroma-DC tables, coeff_token for nC<2 at small
  TotalCoeff, the nC>=8 fixed-length form, mb_type Table 7-11
  derivations, the transforms (§8.5 white-paper-verified identities),
  and intra prediction equations.
- MODERATE: the long tails of coeff_token (nC in [2,8)), total_zeros
  for TotalCoeff in [2,15], and the CBP me(v) mapping (Table 9-4)
  beyond codeNums 0-3. Every table is pinned prefix-free by pytest,
  encoder and decoder share ONLY the tables (reconstruction logic is
  implemented twice — scalar decoder vs numpy reference), and the
  oracle-gated entry (multimodal_h264_pixels) restricts itself to
  the HIGH-confidence subset: DC-only residuals (TotalCoeff=1,
  total_zeros=0), cbp in {0,15,31,47} (codeNums 3,2,1,0), QP=28.

Layout decisions from the spec:
- §7.3.5 macroblock_layer: mb_type ue(v); I_PCM byte-aligned raw
  samples; I_4x4 per-block prev_intra4x4_pred_mode_flag/rem;
  intra_chroma_pred_mode ue(v); coded_block_pattern me(v);
  mb_qp_delta se(v); residual() ordering per §7.3.5.3.
- §6.4.3 / §6.4.11.4: 4x4 luma block Z-scan ordering and neighbor
  derivation (left = blkIdx at (bx-1,by), top = (bx,by-1), across
  macroblock edges when inside the picture).
- §9.2.1: nC = (nA + nB + 1) >> 1 both available / single / 0; -1
  selects the chroma-DC coeff_token table (4:2:0).
- §8.5.12: dequant folded as c * V[qp%6][pos] << (qp//6) — exact for
  every QP (the spec's small-QP rounding term is provably a no-op
  because LevelScale is 16*V); inverse transform rows/columns with
  the d1>>1 / d3>>1 taps and final (x + 32) >> 6.
- §8.5.10 / §8.5.11: luma-DC 4x4 Hadamard and chroma-DC 2x2
  transforms with their distinct scaling paths.
- §8.3.1-8.3.4: all nine Intra_4x4 modes, four Intra_16x16 modes,
  four chroma modes, with the spec availability substitutions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .h264 import (BitReader, BitWriter, H264ParseError,
                   add_emulation_prevention, build_sps, parse_sps,
                   split_nal_units, strip_emulation_prevention)

# ---------------------------------------------------------------------
# scan orders and quantization tables
# ---------------------------------------------------------------------

# §8.5.6 zig-zag scan, frame coding: scan idx -> (row, col)
ZIGZAG_4X4 = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3),
              (1, 2), (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3),
              (3, 2), (3, 3)]

# §8.5.12.1 dequant weights V (the spec's LevelScale4x4 = 16 * V for
# flat scaling lists). Position classes: (0,0),(0,2),(2,0),(2,2) -> v0;
# (1,1),(1,3),(3,1),(3,3) -> v1; others -> v2.
_V0 = [10, 11, 13, 14, 16, 18]
_V1 = [16, 18, 20, 23, 25, 29]
_V2 = [13, 14, 16, 18, 20, 23]


def dequant_weight(qp_mod6: int, row: int, col: int) -> int:
    if row % 2 == 0 and col % 2 == 0:
        return _V0[qp_mod6]
    if row % 2 == 1 and col % 2 == 1:
        return _V1[qp_mod6]
    return _V2[qp_mod6]


# §8.4.4.5 / Table 8-15: chroma QP from luma QP (qPi = qp +
# chroma_qp_index_offset; identity through 29, then compresses)
_QPC_TABLE = {30: 29, 31: 30, 32: 31, 33: 32, 34: 32, 35: 33, 36: 34,
              37: 34, 38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37,
              44: 37, 45: 38, 46: 38, 47: 38, 48: 39, 49: 39, 50: 39,
              51: 39}


def chroma_qp(qp: int, offset: int = 0) -> int:
    qpi = max(0, min(51, qp + offset))
    return _QPC_TABLE.get(qpi, qpi)


# ---------------------------------------------------------------------
# CAVLC VLC tables (reconstructed — see module docstring confidence)
# ---------------------------------------------------------------------

# Table 9-2 coeff_token, keyed (TrailingOnes, TotalCoeff) -> bitstring.
# Context 0 <= nC < 2:
COEFF_TOKEN_NC0 = {
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110",
    (2, 6): "0000000101", (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110",
    (2, 7): "00000000101", (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
    (0, 11): "000000000001111", (1, 11): "000000000001110",
    (2, 11): "00000000001001", (3, 11): "00000000001100",
    (0, 12): "000000000001011", (1, 12): "000000000001010",
    (2, 12): "000000000001101", (3, 12): "00000000001000",
    (0, 13): "0000000000001111", (1, 13): "000000000000001",
    (2, 13): "000000000001001", (3, 13): "000000000001100",
    (0, 14): "0000000000001011", (1, 14): "0000000000001110",
    (2, 14): "0000000000001101", (3, 14): "000000000001000",
    (0, 15): "0000000000000111", (1, 15): "0000000000001010",
    (2, 15): "0000000000001001", (3, 15): "0000000000001100",
    (0, 16): "0000000000000100", (1, 16): "0000000000000110",
    (2, 16): "0000000000000101", (3, 16): "0000000000001000",
}

# Context 2 <= nC < 4:
COEFF_TOKEN_NC2 = {
    (0, 0): "11",
    (0, 1): "001011", (1, 1): "10",
    (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
    (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001",
    (3, 3): "0101",
    (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101",
    (3, 4): "0100",
    (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101",
    (3, 5): "00110",
    (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101",
    (3, 6): "001000",
    (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101",
    (3, 7): "000100",
    (0, 8): "00000001011", (1, 8): "00000001110",
    (2, 8): "00000001101", (3, 8): "0000100",
    (0, 9): "000000001111", (1, 9): "00000001010",
    (2, 9): "00000001001", (3, 9): "000000100",
    (0, 10): "000000001011", (1, 10): "000000001110",
    (2, 10): "000000001101", (3, 10): "00000001100",
    (0, 11): "000000001000", (1, 11): "000000001010",
    (2, 11): "000000001001", (3, 11): "00000001000",
    (0, 12): "0000000001111", (1, 12): "0000000001110",
    (2, 12): "0000000001101", (3, 12): "000000001100",
    (0, 13): "0000000001011", (1, 13): "0000000001010",
    (2, 13): "0000000001001", (3, 13): "0000000001100",
    (0, 14): "0000000000111", (1, 14): "00000000001011",
    (2, 14): "0000000000110", (3, 14): "0000000001000",
    (0, 15): "00000000001001", (1, 15): "00000000001000",
    (2, 15): "00000000001010", (3, 15): "0000000000001",
    (0, 16): "00000000000111", (1, 16): "00000000000110",
    (2, 16): "00000000000101", (3, 16): "00000000000100",
}

# Context 4 <= nC < 8:
COEFF_TOKEN_NC4 = {
    (0, 0): "1111",
    (0, 1): "001111", (1, 1): "1110",
    (0, 2): "001011", (1, 2): "01111", (2, 2): "1101",
    (0, 3): "001000", (1, 3): "01100", (2, 3): "01110", (3, 3): "1100",
    (0, 4): "0001111", (1, 4): "01010", (2, 4): "01011", (3, 4): "1011",
    (0, 5): "0001011", (1, 5): "01000", (2, 5): "01001", (3, 5): "1010",
    (0, 6): "0001001", (1, 6): "001110", (2, 6): "001101",
    (3, 6): "1001",
    (0, 7): "0001000", (1, 7): "001010", (2, 7): "001001", (3, 7): "1000",
    (0, 8): "00001111", (1, 8): "0001110", (2, 8): "0001101",
    (3, 8): "01101",
    (0, 9): "00001011", (1, 9): "00001110", (2, 9): "0001010",
    (3, 9): "001100",
    (0, 10): "000001111", (1, 10): "00001010", (2, 10): "00001101",
    (3, 10): "0001100",
    (0, 11): "000001011", (1, 11): "000001110", (2, 11): "00001001",
    (3, 11): "00001100",
    (0, 12): "000001000", (1, 12): "000001010", (2, 12): "000001101",
    (3, 12): "00001000",
    (0, 13): "0000001101", (1, 13): "000000111", (2, 13): "000001001",
    (3, 13): "000001100",
    (0, 14): "0000001001", (1, 14): "0000001100", (2, 14): "0000001011",
    (3, 14): "0000001010",
    (0, 15): "0000000101", (1, 15): "0000001000", (2, 15): "0000000111",
    (3, 15): "0000000110",
    (0, 16): "0000000001", (1, 16): "0000000100", (2, 16): "0000000011",
    (3, 16): "0000000010",
}

# Context nC == -1 (chroma DC, 4:2:0 — 4 coeffs max):
COEFF_TOKEN_CHROMA_DC = {
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010",
    (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}

# Tables 9-7 / 9-8 total_zeros for 4x4 blocks, [TotalCoeff][total_zeros]
TOTAL_ZEROS_4X4 = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010",
        "000011", "000010", "0000011", "0000010", "00000011",
        "00000010", "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011",
        "0010", "00011", "00010", "000011", "000010", "000001",
        "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011",
        "0010", "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011",
        "011", "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011",
        "0010", "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010",
        "0001", "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001",
        "001", "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001",
        "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# Table 9-9(a) total_zeros for chroma DC 2x2 (4:2:0)
TOTAL_ZEROS_CHROMA_DC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# Table 9-10 run_before, [min(zerosLeft, 7)][run_before]
RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001",
        "00001", "000001", "0000001", "00000001", "000000001",
        "0000000001", "00000000001"],
}

# Table 9-4 coded_block_pattern me(v), INTRA column: codeNum -> cbp.
# codeNums 0-3 (cbp 47/31/15/0) are HIGH confidence and the only ones
# the encoder emits; the tail is reconstructed for decode coverage.
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43,
             45, 46, 16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42,
             44, 1, 2, 4, 8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33,
             34, 36, 40, 38, 41]
CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(CBP_INTRA)}


def _build_trie(table) -> dict:
    """bitstring table -> decode trie {bit: subtrie, "": value}.
    Build-time validation: duplicate codes AND prefix violations
    raise here (a reconstructed-table error must fail loudly, not
    resolve arbitrarily at decode time)."""
    root: dict = {}
    items = (table.items() if isinstance(table, dict)
             else enumerate(table))
    for value, code in items:
        node = root
        for b in code:
            if "" in node:
                raise ValueError(
                    f"code for {node['']} is a prefix of {code}")
            node = node.setdefault(b, {})
        if node:
            raise ValueError(f"{code} is a prefix of another code")
        node[""] = value
    return root


_TRIES = {
    "ct0": _build_trie(COEFF_TOKEN_NC0),
    "ct2": _build_trie(COEFF_TOKEN_NC2),
    "ct4": _build_trie(COEFF_TOKEN_NC4),
    "ctc": _build_trie(COEFF_TOKEN_CHROMA_DC),
    "tz": {tc: _build_trie(codes)
           for tc, codes in TOTAL_ZEROS_4X4.items()},
    "tzc": {tc: _build_trie(codes)
            for tc, codes in TOTAL_ZEROS_CHROMA_DC.items()},
    "rb": {zl: _build_trie(codes) for zl, codes in RUN_BEFORE.items()},
}


def _read_vlc(r: BitReader, trie: dict, what: str):
    node = trie
    for _ in range(32):
        if "" in node and len(node) == 1:
            return node[""]
        b = str(r.u(1))
        if b not in node:
            if "" in node:
                raise H264ParseError(f"ambiguous {what} VLC")
            raise H264ParseError(f"invalid {what} code")
        node = node[b]
    if "" in node and len(node) == 1:
        return node[""]
    raise H264ParseError(f"{what} VLC too long")


# ---------------------------------------------------------------------
# CAVLC residual block codec (§9.2)
# ---------------------------------------------------------------------

def decode_residual_block(r: BitReader, nC: int,
                          max_coeff: int) -> list[int]:
    """§9.2: one residual block -> `max_coeff` coefficient levels in
    scan order (zig-zag for 4x4, raster for the 2x2 chroma DC)."""
    if nC == -1:
        trie = _TRIES["ctc"]
    elif nC < 2:
        trie = _TRIES["ct0"]
    elif nC < 4:
        trie = _TRIES["ct2"]
    elif nC < 8:
        trie = _TRIES["ct4"]
    else:
        # nC >= 8: 6-bit FLC; 000011 is TotalCoeff = 0 (§9.2.1)
        v = r.u(6)
        if v == 3:
            t1s, tc = 0, 0
        else:
            t1s, tc = v & 3, (v >> 2) + 1
        return _decode_levels_runs(r, t1s, tc, max_coeff)
    t1s, tc = _read_vlc(r, trie, "coeff_token")
    return _decode_levels_runs(r, t1s, tc, max_coeff)


def _decode_levels_runs(r: BitReader, t1s: int, tc: int,
                        max_coeff: int) -> list[int]:
    if tc > max_coeff:
        raise H264ParseError(f"TotalCoeff {tc} > {max_coeff}")
    coeffs = [0] * max_coeff
    if tc == 0:
        return coeffs
    # §9.2.2: levels, highest scan position first
    levels: list[int] = []
    suffix_len = 1 if (tc > 10 and t1s < 3) else 0
    for i in range(tc):
        if i < t1s:
            levels.append(1 - 2 * r.u(1))
            continue
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 31:
                raise H264ParseError("level_prefix overrun")
        suffix_size = suffix_len
        if prefix == 14 and suffix_len == 0:
            suffix_size = 4
        elif prefix >= 15:
            suffix_size = prefix - 3
        level_code = min(15, prefix) << suffix_len
        if suffix_size:
            level_code += r.u(suffix_size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == t1s and t1s < 3:
            level_code += 2
        if level_code % 2 == 0:
            level = (level_code + 2) >> 1
        else:
            level = (-level_code - 1) >> 1
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # §9.2.3: total_zeros + run_before
    if tc < max_coeff:
        if max_coeff == 4:  # chroma DC
            total_zeros = _read_vlc(r, _TRIES["tzc"][tc],
                                    "total_zeros_chroma")
        else:
            total_zeros = _read_vlc(r, _TRIES["tz"][tc], "total_zeros")
    else:
        total_zeros = 0
    if tc + total_zeros > max_coeff:
        raise H264ParseError("total_zeros overruns block")
    runs = [0] * tc
    zeros_left = total_zeros
    for i in range(tc - 1):
        if zeros_left > 0:
            rb = _read_vlc(r, _TRIES["rb"][min(zeros_left, 7)],
                           "run_before")
            if rb > zeros_left:
                raise H264ParseError("run_before > zerosLeft")
        else:
            rb = 0
        runs[i] = rb
        zeros_left -= rb
    runs[tc - 1] = zeros_left
    pos = -1
    for i in range(tc - 1, -1, -1):
        pos += runs[i] + 1
        coeffs[pos] = levels[i]
    return coeffs


def encode_residual_block(w: BitWriter, coeffs: list[int],
                          nC: int) -> int:
    """Inverse of decode_residual_block. Returns TotalCoeff (the
    caller records it for neighbor nC derivation). Levels are capped
    at the one-escape range (|level| <= 2064 at suffix_len 0) — the
    builder asserts, real content never needs more here."""
    max_coeff = len(coeffs)
    nz = [i for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    t1s = 0
    for i in reversed(nz):
        if abs(coeffs[i]) == 1 and t1s < 3:
            t1s += 1
        else:
            break
    if nC == -1:
        table = COEFF_TOKEN_CHROMA_DC
    elif nC < 2:
        table = COEFF_TOKEN_NC0
    elif nC < 4:
        table = COEFF_TOKEN_NC2
    elif nC < 8:
        table = COEFF_TOKEN_NC4
    else:
        v = 3 if tc == 0 else ((tc - 1) << 2) | t1s
        w.u(v, 6)
        table = None
    if table is not None:
        code = table.get((t1s, tc))
        if code is None:
            raise H264ParseError(
                f"no coeff_token for T1s={t1s} TC={tc}")
        w.u(int(code, 2) if set(code) != {"0"} else 0, len(code))
    if tc == 0:
        return 0
    levels = [coeffs[i] for i in reversed(nz)]
    suffix_len = 1 if (tc > 10 and t1s < 3) else 0
    for i, level in enumerate(levels):
        if i < t1s:
            w.u(0 if level == 1 else 1, 1)
            continue
        if level > 0:
            level_code = (level << 1) - 2
        else:
            level_code = -(level << 1) - 1
        if i == t1s and t1s < 3:
            level_code -= 2
        if suffix_len == 0:
            if level_code < 14:
                w.u(1, level_code + 1)          # unary: zeros then 1
            elif level_code < 30:
                w.u(1, 15)                      # prefix 14
                w.u(level_code - 14, 4)
            else:
                if level_code - 30 >= (1 << 12):
                    raise H264ParseError("level too large to encode")
                w.u(1, 16)                      # prefix 15
                w.u(level_code - 30, 12)
        else:
            prefix = level_code >> suffix_len
            if prefix < 15:
                w.u(1, prefix + 1)
                w.u(level_code & ((1 << suffix_len) - 1), suffix_len)
            else:
                rem = level_code - (15 << suffix_len)
                if rem >= (1 << 12):
                    raise H264ParseError("level too large to encode")
                w.u(1, 16)
                w.u(rem, 12)
        level = levels[i]
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = nz[-1] + 1 - tc
    if tc < max_coeff:
        codes = (TOTAL_ZEROS_CHROMA_DC[tc] if max_coeff == 4
                 else TOTAL_ZEROS_4X4[tc])
        code = codes[total_zeros]
        w.u(int(code, 2) if set(code) != {"0"} else 0, len(code))
    zeros_left = total_zeros
    for i in range(tc - 1, 0, -1):
        if zeros_left == 0:
            break
        run = nz[i] - nz[i - 1] - 1
        code = RUN_BEFORE[min(zeros_left, 7)][run]
        w.u(int(code, 2) if set(code) != {"0"} else 0, len(code))
        zeros_left -= run
    return tc

# ---------------------------------------------------------------------
# transforms (§8.5) — scalar decoder path
# ---------------------------------------------------------------------

def dequant_4x4(coeffs: list[int], qp: int,
                skip_dc: bool = False) -> list[list[int]]:
    """Scan-order levels -> dequantized 4x4 (spec §8.5.12.1, folded
    to c * V[qp%6][pos] << (qp//6), exact at every QP — see module
    docstring). `skip_dc` leaves (0,0) untouched (the I_16x16 /
    chroma paths install their separately-scaled DC afterwards)."""
    m, e = qp % 6, qp // 6
    out = [[0] * 4 for _ in range(4)]
    for idx, (row, col) in enumerate(ZIGZAG_4X4):
        c = coeffs[idx]
        if c == 0 or (skip_dc and idx == 0):
            continue
        out[row][col] = (c * dequant_weight(m, row, col)) << e
    return out


def idct_4x4(d: list[list[int]]) -> list[list[int]]:
    """§8.5.12.2 inverse core transform: rows then columns with the
    >>1 taps, final (x + 32) >> 6. Bit-exact integer arithmetic."""
    f = [[0] * 4 for _ in range(4)]
    for i in range(4):
        d0, d1, d2, d3 = d[i]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        f[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    r = [[0] * 4 for _ in range(4)]
    for j in range(4):
        d0, d1, d2, d3 = f[0][j], f[1][j], f[2][j], f[3][j]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        col = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
        for i in range(4):
            r[i][j] = (col[i] + 32) >> 6
    return r


def hadamard_4x4(c: list[list[int]]) -> list[list[int]]:
    """§8.5.10 luma DC: f = H c H with H rows of +-1 (self-inverse up
    to scale; the spec folds the scale into the quant path)."""
    h = [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]]
    t = [[sum(h[i][k] * c[k][j] for k in range(4)) for j in range(4)]
         for i in range(4)]
    return [[sum(t[i][k] * h[j][k] for k in range(4))
             for j in range(4)] for i in range(4)]


def dequant_luma_dc(f: list[list[int]], qp: int) -> list[list[int]]:
    """§8.5.10 eq 8-268/8-269 with LevelScale = 16 * V folded in."""
    ls = 16 * dequant_weight(qp % 6, 0, 0)
    e = qp // 6
    if e >= 6:
        return [[(v * ls) << (e - 6) for v in row] for row in f]
    shift, rnd = 6 - e, 1 << (5 - e)
    return [[(v * ls + rnd) >> shift for v in row] for row in f]


def dequant_chroma_dc(f: list[list[int]], qpc: int) -> list[list[int]]:
    """§8.5.11: dcC = ((f * LevelScale) << (qPc//6)) >> 5."""
    ls = 16 * dequant_weight(qpc % 6, 0, 0)
    e = qpc // 6
    return [[((v * ls) << e) >> 5 for v in row] for row in f]


def hadamard_2x2(c: list[list[int]]) -> list[list[int]]:
    """§8.5.11 chroma DC 2x2 transform."""
    a, b = c[0]
    cc, d = c[1]
    return [[a + b + cc + d, a - b + cc - d],
            [a + b - cc - d, a - b - cc + d]]


def _clip1(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


# ---------------------------------------------------------------------
# intra prediction (§8.3) — scalar decoder path over the picture
# ---------------------------------------------------------------------

def predict_4x4(plane: np.ndarray, x0: int, y0: int, mode: int,
                right_avail: bool) -> list[list[int]]:
    """§8.3.1.2 Intra_4x4 prediction at picture offset (x0, y0).
    Availability: samples exist iff inside the picture AND already
    decoded (left/top in raster MB + Z-block order — the caller's
    invariant). `right_avail` says whether the 4 above-right samples
    are decoded (§8.3.1.2: when absent they are substituted with the
    rightmost above sample for modes that need them)."""
    h, w = plane.shape
    left_avail = x0 > 0
    top_avail = y0 > 0
    left = [int(plane[y0 + i, x0 - 1]) for i in range(4)] \
        if left_avail else None
    top = [int(plane[y0 - 1, x0 + j]) for j in range(4)] \
        if top_avail else None
    tl = int(plane[y0 - 1, x0 - 1]) if (left_avail and top_avail) \
        else None
    if top_avail:
        if right_avail and x0 + 8 <= w:
            tr = [int(plane[y0 - 1, x0 + 4 + j]) for j in range(4)]
        else:
            tr = [top[3]] * 4
    else:
        tr = None

    def need(*conds):
        if not all(conds):
            raise H264ParseError(
                f"intra4x4 mode {mode} needs unavailable samples")

    p = [[0] * 4 for _ in range(4)]
    if mode == 0:        # Vertical
        need(top_avail)
        for i in range(4):
            p[i] = list(top)
    elif mode == 1:      # Horizontal
        need(left_avail)
        for i in range(4):
            p[i] = [left[i]] * 4
    elif mode == 2:      # DC with availability fallbacks
        if left_avail and top_avail:
            v = (sum(left) + sum(top) + 4) >> 3
        elif left_avail:
            v = (sum(left) + 2) >> 2
        elif top_avail:
            v = (sum(top) + 2) >> 2
        else:
            v = 128
        p = [[v] * 4 for _ in range(4)]
    elif mode == 3:      # Diagonal-Down-Left
        need(top_avail)
        t = top + tr
        for i in range(4):
            for j in range(4):
                if i == 3 and j == 3:
                    p[i][j] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    k = i + j
                    p[i][j] = (t[k] + 2 * t[k + 1] + t[k + 2] + 2) >> 2
    elif mode == 4:      # Diagonal-Down-Right (§8.3.1.2.5)
        need(left_avail, top_avail)
        # unified edge array e[k]: e[-4..-1] = left (bottom-up at the
        # negative side), e[0] = top-left, e[1..4] = top
        e = {-(i + 1): left[i] for i in range(4)}
        e[0] = tl
        for j in range(4):
            e[j + 1] = top[j]
        for i in range(4):
            for j in range(4):
                k = j - i   # |k| <= 3, so e[k-1..k+1] always exists
                p[i][j] = (e[k - 1] + 2 * e[k] + e[k + 1] + 2) >> 2
    elif mode == 5:      # Vertical-Right (§8.3.1.2.6)
        need(left_avail, top_avail)
        for i in range(4):
            for j in range(4):
                z = 2 * j - i
                idx = j - (i >> 1)
                if z >= 0 and z % 2 == 0:
                    a = top[idx - 1] if idx - 1 >= 0 else tl
                    p[i][j] = (a + top[idx] + 1) >> 1
                elif z >= 0:
                    a = top[idx - 2] if idx - 2 >= 0 else tl
                    b = top[idx - 1] if idx - 1 >= 0 else tl
                    p[i][j] = (a + 2 * b + top[idx] + 2) >> 2
                elif z == -1:
                    p[i][j] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:    # z == -2 or -3 -> (0, 2) / (0, 3)
                    a = left[i - 1]
                    b = left[i - 2] if i - 2 >= 0 else tl
                    c = left[i - 3] if i - 3 >= 0 else tl
                    p[i][j] = (a + 2 * b + c + 2) >> 2
    elif mode == 6:      # Horizontal-Down (§8.3.1.2.7 — mode 5 mirrored)
        need(left_avail, top_avail)
        for i in range(4):
            for j in range(4):
                z = 2 * i - j
                idx = i - (j >> 1)
                if z >= 0 and z % 2 == 0:
                    a = left[idx - 1] if idx - 1 >= 0 else tl
                    p[i][j] = (a + left[idx] + 1) >> 1
                elif z >= 0:
                    a = left[idx - 2] if idx - 2 >= 0 else tl
                    b = left[idx - 1] if idx - 1 >= 0 else tl
                    p[i][j] = (a + 2 * b + left[idx] + 2) >> 2
                elif z == -1:
                    p[i][j] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:    # z == -2 or -3 -> (2, 0) / (3, 0) transposed
                    a = top[j - 1]
                    b = top[j - 2] if j - 2 >= 0 else tl
                    c = top[j - 3] if j - 3 >= 0 else tl
                    p[i][j] = (a + 2 * b + c + 2) >> 2
    elif mode == 7:      # Vertical-Left (§8.3.1.2.8)
        need(top_avail)
        t = top + tr
        for i in range(4):
            for j in range(4):
                k = j + (i >> 1)
                if i % 2 == 0:
                    p[i][j] = (t[k] + t[k + 1] + 1) >> 1
                else:
                    p[i][j] = (t[k] + 2 * t[k + 1] + t[k + 2] + 2) >> 2
    elif mode == 8:      # Horizontal-Up (§8.3.1.2.9)
        need(left_avail)
        for i in range(4):
            for j in range(4):
                z = j + 2 * i   # zHU
                k = i + (j >> 1)
                if z > 5:
                    p[i][j] = left[3]
                elif z == 5:
                    p[i][j] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    p[i][j] = (left[k] + left[k + 1] + 1) >> 1
                else:
                    p[i][j] = (left[k] + 2 * left[k + 1] +
                               left[k + 2] + 2) >> 2
    else:
        raise H264ParseError(f"intra4x4 mode {mode} out of range")
    return p


def predict_16x16(plane: np.ndarray, x0: int, y0: int,
                  mode: int) -> np.ndarray:
    """§8.3.3 Intra_16x16: 0=V, 1=H, 2=DC, 3=Plane."""
    left_avail, top_avail = x0 > 0, y0 > 0
    p = np.zeros((16, 16), dtype=np.int64)
    if mode == 0:
        if not top_avail:
            raise H264ParseError("I16x16 V needs top row")
        p[:, :] = plane[y0 - 1, x0:x0 + 16].astype(np.int64)
    elif mode == 1:
        if not left_avail:
            raise H264ParseError("I16x16 H needs left column")
        p[:, :] = plane[y0:y0 + 16, x0 - 1].astype(np.int64)[:, None]
    elif mode == 2:
        if left_avail and top_avail:
            v = (int(plane[y0:y0 + 16, x0 - 1].sum()) +
                 int(plane[y0 - 1, x0:x0 + 16].sum()) + 16) >> 5
        elif left_avail:
            v = (int(plane[y0:y0 + 16, x0 - 1].sum()) + 8) >> 4
        elif top_avail:
            v = (int(plane[y0 - 1, x0:x0 + 16].sum()) + 8) >> 4
        else:
            v = 128
        p[:, :] = v
    elif mode == 3:
        if not (left_avail and top_avail):
            raise H264ParseError("I16x16 Plane needs both edges")
        hsum = sum((j + 1) * (int(plane[y0 - 1, x0 + 8 + j]) -
                              int(plane[y0 - 1, x0 + 6 - j]))
                   for j in range(8))
        vsum = sum((i + 1) * (int(plane[y0 + 8 + i, x0 - 1]) -
                              int(plane[y0 + 6 - i, x0 - 1]))
                   for i in range(8))
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
        a = 16 * (int(plane[y0 - 1, x0 + 15]) +
                  int(plane[y0 + 15, x0 - 1]))
        for i in range(16):
            for j in range(16):
                p[i, j] = _clip1((a + b * (j - 7) + c * (i - 7) + 16)
                                 >> 5)
    else:
        raise H264ParseError(f"intra16x16 mode {mode} out of range")
    return p


def predict_chroma(plane: np.ndarray, x0: int, y0: int,
                   mode: int) -> np.ndarray:
    """§8.3.4 chroma prediction (8x8, 4:2:0): 0=DC (per-4x4-quadrant
    availability rules), 1=H, 2=V, 3=Plane."""
    left_avail, top_avail = x0 > 0, y0 > 0
    p = np.zeros((8, 8), dtype=np.int64)
    if mode == 0:
        for qy in (0, 4):
            for qx in (0, 4):
                ls = [int(plane[y0 + qy + i, x0 - 1])
                      for i in range(4)] if left_avail else None
                ts = [int(plane[y0 - 1, x0 + qx + j])
                      for j in range(4)] if top_avail else None
                # corner quadrants prefer both; off-corner quadrants
                # prefer the edge they touch (§8.3.4.1)
                if qx == 0 and qy == 0:
                    if ts and ls:
                        v = (sum(ts) + sum(ls) + 4) >> 3
                    elif ts:
                        v = (sum(ts) + 2) >> 2
                    elif ls:
                        v = (sum(ls) + 2) >> 2
                    else:
                        v = 128
                elif qx == 4 and qy == 0:
                    if ts:
                        v = (sum(ts) + 2) >> 2
                    elif ls:
                        v = (sum(ls) + 2) >> 2
                    else:
                        v = 128
                elif qx == 0 and qy == 4:
                    if ls:
                        v = (sum(ls) + 2) >> 2
                    elif ts:
                        v = (sum(ts) + 2) >> 2
                    else:
                        v = 128
                else:
                    if ts and ls:
                        v = (sum(ts) + sum(ls) + 4) >> 3
                    elif ts:
                        v = (sum(ts) + 2) >> 2
                    elif ls:
                        v = (sum(ls) + 2) >> 2
                    else:
                        v = 128
                p[qy:qy + 4, qx:qx + 4] = v
    elif mode == 1:
        if not left_avail:
            raise H264ParseError("chroma H needs left column")
        p[:, :] = plane[y0:y0 + 8, x0 - 1].astype(np.int64)[:, None]
    elif mode == 2:
        if not top_avail:
            raise H264ParseError("chroma V needs top row")
        p[:, :] = plane[y0 - 1, x0:x0 + 8].astype(np.int64)
    elif mode == 3:
        if not (left_avail and top_avail):
            raise H264ParseError("chroma Plane needs both edges")
        hsum = sum((j + 1) * (int(plane[y0 - 1, x0 + 4 + j]) -
                              int(plane[y0 - 1, x0 + 2 - j]))
                   for j in range(4))
        vsum = sum((i + 1) * (int(plane[y0 + 4 + i, x0 - 1]) -
                              int(plane[y0 + 2 - i, x0 - 1]))
                   for i in range(4))
        b = (17 * hsum + 16) >> 5
        c = (17 * vsum + 16) >> 5
        a = 16 * (int(plane[y0 - 1, x0 + 7]) +
                  int(plane[y0 + 7, x0 - 1]))
        for i in range(8):
            for j in range(8):
                p[i, j] = _clip1((a + b * (j - 3) + c * (i - 3) + 16)
                                 >> 5)
    else:
        raise H264ParseError(f"chroma mode {mode} out of range")
    return p

# ---------------------------------------------------------------------
# parameter sets (decode-depth parse) and slice header (§7.3.2-7.3.3)
# ---------------------------------------------------------------------

class H264UnsupportedError(H264ParseError):
    """Stream uses a feature outside the intra/CAVLC decode scope
    (CABAC, slice groups, in-loop deblocking, inter slices) — named
    so pipelines can count 'undecodable here' separately from
    'corrupt'."""


@dataclass
class FullPPS:
    pps_id: int
    sps_id: int
    cabac: bool
    pic_init_qp: int
    chroma_qp_index_offset: int
    deblocking_control_present: bool
    constrained_intra: bool
    redundant_pic_cnt_present: bool
    weighted_pred: bool = False


def parse_pps_full(rbsp: bytes) -> FullPPS:
    """§7.3.2.2 through redundant_pic_cnt_present_flag (everything
    the intra + inter decode paths consume)."""
    r = BitReader(rbsp)
    pps_id, sps_id = r.ue(), r.ue()
    cabac = bool(r.u(1))
    r.u(1)  # bottom_field_pic_order_in_frame_present_flag
    if r.ue() != 0:  # num_slice_groups_minus1
        raise H264UnsupportedError("slice groups (FMO) not supported")
    r.ue()
    r.ue()  # num_ref_idx_l0/l1_default_active_minus1
    weighted = bool(r.u(1))  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    pic_init_qp = 26 + r.se()
    r.se()  # pic_init_qs_minus26
    chroma_qp_off = r.se()
    deblock = bool(r.u(1))
    constrained = bool(r.u(1))
    redundant = bool(r.u(1))
    return FullPPS(pps_id, sps_id, cabac, pic_init_qp, chroma_qp_off,
                   deblock, constrained, redundant, weighted)


@dataclass
class _SliceStart:
    first_mb: int
    qp: int
    reader: BitReader


def _parse_i_slice_header(rbsp: bytes, nal_type: int,
                          nal_ref_idc: int, sps, pps: FullPPS,
                          ) -> _SliceStart:
    """§7.3.3 for I slices under the supported toolset. Returns the
    reader positioned at the first bit of slice_data."""
    if pps.cabac:
        raise H264UnsupportedError("CABAC entropy not supported")
    r = BitReader(rbsp)
    first_mb = r.ue()
    st = r.ue()
    if st % 5 != 2:
        raise H264UnsupportedError(
            f"slice_type {st}: only I slices are pixel-decoded")
    r.ue()  # pps_id (single-PPS streams; id consistency not enforced)
    r.u(sps.log2_max_frame_num)  # frame_num
    if nal_type == 5:
        r.ue()  # idr_pic_id
    if sps.pic_order_cnt_type == 0:
        r.u(sps.log2_max_poc_lsb)  # pic_order_cnt_lsb
    elif sps.pic_order_cnt_type == 1:
        raise H264UnsupportedError("poc_type 1 slice headers")
    if pps.redundant_pic_cnt_present:
        # a redundant_pic_cnt ue(v) would sit here and shift every
        # following field — reject by name, never misparse
        raise H264UnsupportedError("redundant pictures not supported")
    if nal_ref_idc != 0:
        if nal_type == 5:
            r.u(2)  # no_output_of_prior_pics + long_term_reference
        else:
            if r.u(1):  # adaptive_ref_pic_marking_mode_flag
                raise H264UnsupportedError(
                    "adaptive ref pic marking")
    qp = pps.pic_init_qp + r.se()
    if pps.deblocking_control_present:
        if r.ue() != 1:  # disable_deblocking_filter_idc
            raise H264UnsupportedError(
                "in-loop deblocking not implemented; streams must "
                "set disable_deblocking_filter_idc = 1")
    else:
        raise H264UnsupportedError(
            "PPS leaves the deblocking filter on (control flag 0); "
            "pixel-exact decode here requires it disabled")
    return _SliceStart(first_mb, qp, r)


# §6.4.3: luma4x4BlkIdx Z-scan -> (bx, by) in 4x4-block units
BLK_ZSCAN = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1),
             (3, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2),
             (2, 3), (3, 3)]
_ZSCAN_POS = {bc: i for i, bc in enumerate(BLK_ZSCAN)}
# chroma 4x4 blocks: raster within the 8x8 (§6.4.7)
CHROMA_BLKS = [(0, 0), (1, 0), (0, 1), (1, 1)]


@dataclass
class DecodedFrame:
    width: int
    height: int
    y: np.ndarray            # (height, width) uint8
    cb: np.ndarray           # (height//2, width//2) uint8
    cr: np.ndarray
    mb_types: list[str] = field(default_factory=list)


class _IntraDecoder:
    """One picture's decode state: reconstruction planes plus the
    per-4x4-block TotalCoeff / prediction-mode bookkeeping that CAVLC
    nC contexts (§9.2.1) and predIntra4x4PredMode (§8.3.1.1) read."""

    def __init__(self, sps, pps: FullPPS):
        if sps.chroma_format_idc != 1:
            raise H264UnsupportedError("only 4:2:0 chroma")
        if not sps.frame_mbs_only:
            raise H264UnsupportedError("field/MBAFF coding")
        if sps.bit_depth_luma != 8 or sps.bit_depth_chroma != 8:
            # review finding: High-10 intra streams passed every other
            # guard and decoded with 8-bit clip/QP math as
            # valid-looking garbage — reject by name instead
            raise H264UnsupportedError(
                f"{sps.bit_depth_luma}/{sps.bit_depth_chroma}-bit "
                "samples: only 8-bit decode is implemented")
        self.sps, self.pps = sps, pps
        self.mbs_w = (sps.width + 15) // 16
        self.mbs_h = (sps.height + 15) // 16
        self.y = np.zeros((self.mbs_h * 16, self.mbs_w * 16),
                          dtype=np.uint8)
        self.cb = np.zeros((self.mbs_h * 8, self.mbs_w * 8),
                           dtype=np.uint8)
        self.cr = np.zeros_like(self.cb)
        self.luma_tc: dict[tuple[int, int], int] = {}
        self.chroma_tc = [{}, {}]
        self.i4x4_mode: dict[tuple[int, int], int] = {}
        self.mb_kind: dict[tuple[int, int], str] = {}
        self.mb_types: list[str] = []

    # -- nC context (§9.2.1) ------------------------------------------
    def _nc(self, table: dict, gbx: int, gby: int) -> int:
        na = table.get((gbx - 1, gby)) if gbx > 0 else None
        nb = table.get((gbx, gby - 1)) if gby > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    # -- per-macroblock decode ----------------------------------------
    def decode_mb(self, r: BitReader, mbx: int, mby: int, qp: int,
                  ) -> int:
        mb_type = r.ue()
        if mb_type == 25:
            self._decode_pcm(r, mbx, mby)
            self.mb_types.append("pcm")
            return qp
        if mb_type == 0:
            qp = self._decode_i4x4(r, mbx, mby, qp)
            self.mb_types.append("i4x4")
            return qp
        if 1 <= mb_type <= 24:
            qp = self._decode_i16x16(r, mbx, mby, qp, mb_type)
            self.mb_types.append("i16x16")
            return qp
        raise H264UnsupportedError(
            f"mb_type {mb_type} is not an I-macroblock")

    def _decode_pcm(self, r: BitReader, mbx: int, mby: int) -> None:
        while r._pos % 8:
            if r.u(1):
                raise H264ParseError("pcm_alignment bit not zero")
        y0, x0 = mby * 16, mbx * 16
        for i in range(16):
            for j in range(16):
                self.y[y0 + i, x0 + j] = r.u(8)
        for plane in (self.cb, self.cr):
            for i in range(8):
                for j in range(8):
                    plane[mby * 8 + i, mbx * 8 + j] = r.u(8)
        for bx, by in BLK_ZSCAN:  # §9.2.1: PCM blocks count as 16
            self.luma_tc[(mbx * 4 + bx, mby * 4 + by)] = 16
            self.i4x4_mode[(mbx * 4 + bx, mby * 4 + by)] = 2
        for comp in (0, 1):
            for bx, by in CHROMA_BLKS:
                self.chroma_tc[comp][(mbx * 2 + bx, mby * 2 + by)] = 16
        self.mb_kind[(mbx, mby)] = "pcm"

    def _pred_mode_4x4(self, gbx: int, gby: int) -> int:
        """§8.3.1.1: predIntra4x4PredMode = min(A, B), DC (2) when a
        neighbor is unavailable or not Intra_4x4-coded."""
        ma = self.i4x4_mode.get((gbx - 1, gby), 2) if gbx > 0 else 2
        mb = self.i4x4_mode.get((gbx, gby - 1), 2) if gby > 0 else 2
        if gbx > 0 and self.mb_kind.get(
                ((gbx - 1) // 4, gby // 4)) not in ("i4x4",):
            ma = 2
        if gby > 0 and self.mb_kind.get(
                (gbx // 4, (gby - 1) // 4)) not in ("i4x4",):
            mb = 2
        return min(ma, mb)

    def _decode_i4x4(self, r: BitReader, mbx: int, mby: int,
                     qp: int) -> int:
        modes: list[int] = []
        for blk in range(16):
            bx, by = BLK_ZSCAN[blk]
            gbx, gby = mbx * 4 + bx, mby * 4 + by
            pred = self._pred_mode_4x4(gbx, gby)
            if r.u(1):  # prev_intra4x4_pred_mode_flag
                mode = pred
            else:
                rem = r.u(3)
                mode = rem if rem < pred else rem + 1
            modes.append(mode)
            self.i4x4_mode[(gbx, gby)] = mode
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise H264ParseError("intra_chroma_pred_mode out of range")
        code_num = r.ue()
        if code_num >= len(CBP_INTRA):
            raise H264ParseError("coded_block_pattern out of range")
        cbp = CBP_INTRA[code_num]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp > 0:
            qp = (qp + r.se() + 52) % 52
        # parse luma residual (all 16 blocks, Z order)
        luma_coeffs: list[list[int]] = []
        for blk in range(16):
            bx, by = BLK_ZSCAN[blk]
            gbx, gby = mbx * 4 + bx, mby * 4 + by
            if cbp_luma & (1 << (blk >> 2)):
                nc = self._nc(self.luma_tc, gbx, gby)
                coeffs = decode_residual_block(r, nc, 16)
                tc = sum(1 for c in coeffs if c)
            else:
                coeffs, tc = [0] * 16, 0
            luma_coeffs.append(coeffs)
            self.luma_tc[(gbx, gby)] = tc
        chroma = self._parse_chroma_residual(r, mbx, mby, cbp_chroma)
        self.mb_kind[(mbx, mby)] = "i4x4"
        # reconstruct luma block-by-block in Z order (prediction reads
        # previously reconstructed samples)
        for blk in range(16):
            bx, by = BLK_ZSCAN[blk]
            x0, y0 = mbx * 16 + bx * 4, mby * 16 + by * 4
            right = self._top_right_decoded(mbx, mby, bx, by)
            pred = predict_4x4(self.y, x0, y0, modes[blk], right)
            res = idct_4x4(dequant_4x4(luma_coeffs[blk], qp)) \
                if any(luma_coeffs[blk]) else None
            for i in range(4):
                for j in range(4):
                    v = pred[i][j] + (res[i][j] if res else 0)
                    self.y[y0 + i, x0 + j] = _clip1(v)
        self._reconstruct_chroma(mbx, mby, chroma_mode, chroma, qp)
        return qp

    def _decode_i16x16(self, r: BitReader, mbx: int, mby: int,
                       qp: int, mb_type: int) -> int:
        t = mb_type - 1
        pred_mode = t % 4
        cbp_chroma = (t // 4) % 3
        cbp_luma = 15 if t >= 12 else 0
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise H264ParseError("intra_chroma_pred_mode out of range")
        qp = (qp + r.se() + 52) % 52
        # DC block: nC as for luma blk 0 (§9.2.1)
        nc = self._nc(self.luma_tc, mbx * 4, mby * 4)
        dc_scan = decode_residual_block(r, nc, 16)
        ac_coeffs: list[list[int]] = []
        for blk in range(16):
            bx, by = BLK_ZSCAN[blk]
            gbx, gby = mbx * 4 + bx, mby * 4 + by
            if cbp_luma:
                nc = self._nc(self.luma_tc, gbx, gby)
                coeffs = decode_residual_block(r, nc, 15)
                tc = sum(1 for c in coeffs if c)
            else:
                coeffs, tc = [0] * 15, 0
            ac_coeffs.append(coeffs)
            self.luma_tc[(gbx, gby)] = tc
            self.i4x4_mode[(gbx, gby)] = 2
        chroma = self._parse_chroma_residual(r, mbx, mby, cbp_chroma)
        self.mb_kind[(mbx, mby)] = "i16x16"
        # reconstruct: prediction + (Hadamard DC | AC) residual
        x0, y0 = mbx * 16, mby * 16
        pred = predict_16x16(self.y, x0, y0, pred_mode)
        dc_grid = [[0] * 4 for _ in range(4)]
        for idx, (row, col) in enumerate(ZIGZAG_4X4):
            dc_grid[row][col] = dc_scan[idx]
        dc = dequant_luma_dc(hadamard_4x4(dc_grid), qp)
        for by in range(4):
            for bx in range(4):
                blk = _ZSCAN_POS[(bx, by)]
                d = dequant_4x4([0] + ac_coeffs[blk], qp, skip_dc=True)
                d[0][0] = dc[by][bx]
                res = idct_4x4(d)
                for i in range(4):
                    for j in range(4):
                        v = int(pred[by * 4 + i, bx * 4 + j]) \
                            + res[i][j]
                        self.y[y0 + by * 4 + i, x0 + bx * 4 + j] = \
                            _clip1(v)
        self._reconstruct_chroma(mbx, mby, chroma_mode, chroma, qp)
        return qp

    def _parse_chroma_residual(self, r: BitReader, mbx: int,
                               mby: int, cbp_chroma: int):
        """§7.3.5.3 residual ordering: both DC blocks (cb then cr),
        then cb's four AC blocks, then cr's."""
        dc = [[0] * 4, [0] * 4]
        ac = [[[0] * 15 for _ in range(4)] for _ in range(2)]
        if cbp_chroma:
            for comp in (0, 1):
                dc[comp] = decode_residual_block(r, -1, 4)
        for comp in (0, 1):
            for b, (bx, by) in enumerate(CHROMA_BLKS):
                gbx, gby = mbx * 2 + bx, mby * 2 + by
                if cbp_chroma == 2:
                    nc = self._nc(self.chroma_tc[comp], gbx, gby)
                    ac[comp][b] = decode_residual_block(r, nc, 15)
                    tc = sum(1 for c in ac[comp][b] if c)
                else:
                    tc = 0
                self.chroma_tc[comp][(gbx, gby)] = tc
        return dc, ac

    def _reconstruct_chroma(self, mbx: int, mby: int, mode: int,
                            chroma, qp: int) -> None:
        dc_scan, ac = chroma
        qpc = chroma_qp(qp, self.pps.chroma_qp_index_offset)
        x0, y0 = mbx * 8, mby * 8
        for comp, plane in ((0, self.cb), (1, self.cr)):
            pred = predict_chroma(plane, x0, y0, mode)
            # raster 2x2 DC from the 4-coeff scan
            f = hadamard_2x2([[dc_scan[comp][0], dc_scan[comp][1]],
                              [dc_scan[comp][2], dc_scan[comp][3]]])
            dc = dequant_chroma_dc(f, qpc)
            for b, (bx, by) in enumerate(CHROMA_BLKS):
                d = dequant_4x4([0] + ac[comp][b], qpc, skip_dc=True)
                d[0][0] = dc[by][bx]
                if any(ac[comp][b]) or d[0][0]:
                    res = idct_4x4(d)
                else:
                    res = None
                for i in range(4):
                    for j in range(4):
                        v = int(pred[by * 4 + i, bx * 4 + j]) + \
                            (res[i][j] if res else 0)
                        plane[y0 + by * 4 + i, x0 + bx * 4 + j] = \
                            _clip1(v)

    def _top_right_decoded(self, mbx: int, mby: int, bx: int,
                           by: int) -> bool:
        """Are the above-right 4 samples of block (bx,by) decoded?
        (§8.3.1.2 availability in raster MB + Z block order.)"""
        gbx, gby = mbx * 4 + bx + 1, mby * 4 + by - 1
        if gby < 0 or gbx >= self.mbs_w * 4:
            return False
        tr_mbx, tr_mby = gbx // 4, gby // 4
        if tr_mby < mby:
            return True
        if tr_mby > mby:
            return False
        if tr_mbx < mbx:
            return True
        if tr_mbx > mbx:
            return False
        return _ZSCAN_POS[(gbx % 4, gby % 4)] < _ZSCAN_POS[(bx, by)]


def decode_i_frame(payload: bytes,
                   length_size: int | None = None) -> DecodedFrame:
    """Decode the FIRST coded picture of an intra-only stream: SPS +
    PPS + one or more I/IDR slices (CAVLC). Returns the cropped
    reconstruction planes. Raises H264ParseError on corrupt input and
    H264UnsupportedError on out-of-scope features (the mapInPandas
    operator catches both per row)."""
    nals = split_nal_units(payload, length_size)
    sps = None
    pps = None
    slices: list[tuple[int, int, bytes]] = []
    for nal in nals:
        if not nal:
            continue
        if nal[0] & 0x80:
            raise H264ParseError("forbidden_zero_bit set")
        ntype = nal[0] & 0x1F
        ref_idc = (nal[0] >> 5) & 3
        body = strip_emulation_prevention(nal[1:])
        if ntype == 7:
            sps = parse_sps(body)
        elif ntype == 8:
            pps = parse_pps_full(body)
        elif ntype in (1, 5):
            slices.append((ntype, ref_idc, body))
    if sps is None or pps is None or not slices:
        raise H264ParseError("stream lacks SPS/PPS/slice")
    dec = _IntraDecoder(sps, pps)
    n_mbs = dec.mbs_w * dec.mbs_h
    decoded = 0
    for ntype, ref_idc, body in slices:
        start = _parse_i_slice_header(body, ntype, ref_idc, sps, pps)
        addr, qp = start.first_mb, start.qp
        r = start.reader
        while decoded < n_mbs and addr < n_mbs:
            qp = dec.decode_mb(r, addr % dec.mbs_w, addr // dec.mbs_w,
                               qp)
            addr += 1
            decoded += 1
            if not _more_rbsp_data(r):
                break
        if decoded >= n_mbs:
            break
    if decoded < n_mbs:
        raise H264ParseError(
            f"picture truncated: {decoded}/{n_mbs} macroblocks")
    return DecodedFrame(sps.width, sps.height,
                        dec.y[:sps.height, :sps.width],
                        dec.cb[:(sps.height + 1) // 2,
                               :(sps.width + 1) // 2],
                        dec.cr[:(sps.height + 1) // 2,
                               :(sps.width + 1) // 2],
                        dec.mb_types)


def _more_rbsp_data(r: BitReader) -> bool:
    """§7.2: data remains iff bits beyond the current position hold
    anything besides the rbsp_stop_one_bit + zero padding."""
    total = len(r._d) * 8
    if r._pos >= total:
        return False
    # find the last set bit (the stop bit)
    last = -1
    for i in range(total - 1, -1, -1):
        if (r._d[i >> 3] >> (7 - (i & 7))) & 1:
            last = i
            break
    return r._pos < last

# ---------------------------------------------------------------------
# encoder: entropy-code explicit coefficient levels into a conforming
# intra stream (golden-stream builder for tests and oracles)
# ---------------------------------------------------------------------
#
# MbSpec (one dict per macroblock, raster order):
#   {"kind": "i4x4", "modes": [16 pred modes in Z order],
#    "luma": [16 lists of 16 zig-zag levels],
#    "chroma_mode": 0..3, "cbp_chroma": 0|1|2,
#    "chroma_dc": [[4 levels], [4]], "chroma_ac": [[4x[15]], [4x[15]]]}
#   {"kind": "i16x16", "mode": 0..3, "dc": [16], "ac": [16x[15]]|None,
#    "chroma_mode": ..., "cbp_chroma": ..., "chroma_dc", "chroma_ac"}
#   {"kind": "pcm", "y": bytes(256), "cb": bytes(64), "cr": bytes(64)}
#
# The encoder takes LEVELS, not pixels: what is under test/oracle is
# the entropy layer + reconstruction, not rate-distortion search.


def build_pps_pixels() -> bytes:
    """PPS for pixel streams: CAVLC, deblocking control PRESENT so
    slices can disable the loop filter (decode here is filter-free)."""
    w = BitWriter()
    w.ue(0).ue(0)          # pps_id, sps_id
    w.u(0, 1)              # entropy_coding_mode_flag = CAVLC
    w.u(0, 1)              # bottom_field_pic_order_in_frame_present
    w.ue(0)                # num_slice_groups_minus1
    w.ue(0).ue(0)          # num_ref_idx defaults
    w.u(0, 3)              # weighted_pred + weighted_bipred_idc
    w.se(0).se(0).se(0)    # pic_init_qp/qs (26), chroma_qp_offset 0
    w.u(1, 1)              # deblocking_filter_control_present_flag
    w.u(0, 1)              # constrained_intra_pred_flag
    w.u(0, 1)              # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return bytes([0x68]) + add_emulation_prevention(w.bytes())


class _IntraEncoder:
    """Mirror of _IntraDecoder's bookkeeping, writing bits. Shares
    only the VLC tables and mode-prediction rule with the decoder."""

    def __init__(self, width_mbs: int, height_mbs: int):
        self.mbs_w, self.mbs_h = width_mbs, height_mbs
        self.luma_tc: dict[tuple[int, int], int] = {}
        self.chroma_tc = [{}, {}]
        self.i4x4_mode: dict[tuple[int, int], int] = {}
        self.mb_kind: dict[tuple[int, int], str] = {}

    def _nc(self, table, gbx, gby):
        na = table.get((gbx - 1, gby)) if gbx > 0 else None
        nb = table.get((gbx, gby - 1)) if gby > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        return na if na is not None else (nb if nb is not None else 0)

    def _pred_mode_4x4(self, gbx, gby):
        ma = self.i4x4_mode.get((gbx - 1, gby), 2) if gbx > 0 else 2
        mb = self.i4x4_mode.get((gbx, gby - 1), 2) if gby > 0 else 2
        if gbx > 0 and self.mb_kind.get(
                ((gbx - 1) // 4, gby // 4)) not in ("i4x4",):
            ma = 2
        if gby > 0 and self.mb_kind.get(
                (gbx // 4, (gby - 1) // 4)) not in ("i4x4",):
            mb = 2
        return min(ma, mb)

    def encode_mb(self, w: BitWriter, spec: dict, mbx: int, mby: int,
                  cur_qp: int, target_qp: int) -> int:
        kind = spec["kind"]
        if kind == "pcm":
            w.ue(25)
            while len(w._bits) % 8:
                w.u(0, 1)
            for b in spec["y"]:
                w.u(b, 8)
            for b in spec["cb"]:
                w.u(b, 8)
            for b in spec["cr"]:
                w.u(b, 8)
            for bx, by in BLK_ZSCAN:
                self.luma_tc[(mbx * 4 + bx, mby * 4 + by)] = 16
                self.i4x4_mode[(mbx * 4 + bx, mby * 4 + by)] = 2
            for comp in (0, 1):
                for bx, by in CHROMA_BLKS:
                    self.chroma_tc[comp][(mbx * 2 + bx,
                                          mby * 2 + by)] = 16
            self.mb_kind[(mbx, mby)] = "pcm"
            return cur_qp
        cbp_chroma = spec.get("cbp_chroma", 0)
        if kind == "i16x16":
            cbp_luma = 15 if spec.get("ac") else 0
            mb_type = 1 + spec["mode"] + 4 * cbp_chroma + \
                12 * (1 if cbp_luma else 0)
            w.ue(mb_type)
            w.ue(spec.get("chroma_mode", 0))
            w.se(target_qp - cur_qp)
            cur_qp = target_qp
            nc = self._nc(self.luma_tc, mbx * 4, mby * 4)
            encode_residual_block(w, spec["dc"], nc)
            for blk in range(16):
                bx, by = BLK_ZSCAN[blk]
                gbx, gby = mbx * 4 + bx, mby * 4 + by
                if cbp_luma:
                    nc = self._nc(self.luma_tc, gbx, gby)
                    tc = encode_residual_block(w, spec["ac"][blk], nc)
                else:
                    tc = 0
                self.luma_tc[(gbx, gby)] = tc
                self.i4x4_mode[(gbx, gby)] = 2
            self.mb_kind[(mbx, mby)] = "i16x16"
            self._encode_chroma(w, spec, mbx, mby, cbp_chroma)
            return cur_qp
        # i4x4
        w.ue(0)
        modes = spec["modes"]
        for blk in range(16):
            bx, by = BLK_ZSCAN[blk]
            gbx, gby = mbx * 4 + bx, mby * 4 + by
            pred = self._pred_mode_4x4(gbx, gby)
            mode = modes[blk]
            if mode == pred:
                w.u(1, 1)
            else:
                w.u(0, 1)
                w.u(mode if mode < pred else mode - 1, 3)
            self.i4x4_mode[(gbx, gby)] = mode
        w.ue(spec.get("chroma_mode", 0))
        cbp_luma = 15 if any(any(b) for b in spec["luma"]) else 0
        cbp = cbp_luma | (cbp_chroma << 4)
        if cbp not in CBP_INTRA_INV:
            raise H264ParseError(f"unencodable cbp {cbp}")
        w.ue(CBP_INTRA_INV[cbp])
        if cbp > 0:
            w.se(target_qp - cur_qp)
            cur_qp = target_qp
        self.mb_kind[(mbx, mby)] = "i4x4"
        for blk in range(16):
            bx, by = BLK_ZSCAN[blk]
            gbx, gby = mbx * 4 + bx, mby * 4 + by
            if cbp_luma:
                nc = self._nc(self.luma_tc, gbx, gby)
                tc = encode_residual_block(w, spec["luma"][blk], nc)
            else:
                tc = 0
            self.luma_tc[(gbx, gby)] = tc
        self._encode_chroma(w, spec, mbx, mby, cbp_chroma)
        return cur_qp

    def _encode_chroma(self, w, spec, mbx, mby, cbp_chroma):
        if cbp_chroma:
            for comp in (0, 1):
                encode_residual_block(
                    w, spec.get("chroma_dc",
                                [[0] * 4, [0] * 4])[comp], -1)
        for comp in (0, 1):
            for b, (bx, by) in enumerate(CHROMA_BLKS):
                gbx, gby = mbx * 2 + bx, mby * 2 + by
                if cbp_chroma == 2:
                    nc = self._nc(self.chroma_tc[comp], gbx, gby)
                    tc = encode_residual_block(
                        w, spec["chroma_ac"][comp][b], nc)
                else:
                    tc = 0
                self.chroma_tc[comp][(gbx, gby)] = tc


def encode_i_frame(mbs: list[dict], width_mbs: int, height_mbs: int,
                   qp: int = 28) -> bytes:
    """Assemble a complete Annex B intra stream (SPS + PPS + one IDR
    slice) whose slice data entropy-codes the given MbSpecs. The
    slice disables the deblocking filter so decode_i_frame is
    pixel-exact."""
    if len(mbs) != width_mbs * height_mbs:
        raise ValueError("MbSpec count != macroblock count")
    sps = build_sps(width_mbs, height_mbs)
    pps = build_pps_pixels()
    w = BitWriter()
    w.ue(0)            # first_mb_in_slice
    w.ue(7)            # slice_type: I (all-picture variant)
    w.ue(0)            # pps_id
    w.u(0, 4)          # frame_num (log2_max_frame_num = 4)
    w.ue(0)            # idr_pic_id
    w.u(0, 4)          # pic_order_cnt_lsb (poc_type 0, log2 = 4)
    w.u(0, 2)          # no_output_of_prior_pics + long_term_ref
    w.se(0)            # slice_qp_delta (QP carried by mb_qp_delta)
    w.ue(1)            # disable_deblocking_filter_idc = 1 (off)
    enc = _IntraEncoder(width_mbs, height_mbs)
    cur_qp = 26
    for addr, spec in enumerate(mbs):
        cur_qp = enc.encode_mb(w, spec, addr % width_mbs,
                               addr // width_mbs, cur_qp, qp)
    w.rbsp_trailing()
    slice_nal = bytes([0x65]) + add_emulation_prevention(w.bytes())
    return b"".join(b"\x00\x00\x00\x01" + n
                    for n in (sps, pps, slice_nal))


def reference_reconstruction(mbs: list[dict], width_mbs: int,
                             height_mbs: int, qp: int = 28,
                             ) -> tuple[np.ndarray, np.ndarray,
                                        np.ndarray]:
    """Spec-side expected planes for encode_i_frame's output,
    computed WITHOUT parsing any bits: drives the shared prediction/
    transform primitives directly from the MbSpecs in decode order.
    The encode->decode->compare tests hold the bit layer (CAVLC, MB
    syntax, nC bookkeeping) accountable to this."""
    y = np.zeros((height_mbs * 16, width_mbs * 16), dtype=np.uint8)
    cb = np.zeros((height_mbs * 8, width_mbs * 8), dtype=np.uint8)
    cr = np.zeros_like(cb)
    for addr, spec in enumerate(mbs):
        mbx, mby = addr % width_mbs, addr // width_mbs
        if spec["kind"] == "pcm":
            y[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16] = \
                np.frombuffer(bytes(spec["y"]),
                              dtype=np.uint8).reshape(16, 16)
            cb[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = \
                np.frombuffer(bytes(spec["cb"]),
                              dtype=np.uint8).reshape(8, 8)
            cr[mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8] = \
                np.frombuffer(bytes(spec["cr"]),
                              dtype=np.uint8).reshape(8, 8)
            continue
        if spec["kind"] == "i16x16":
            x0, y0 = mbx * 16, mby * 16
            pred = predict_16x16(y, x0, y0, spec["mode"])
            dc_grid = [[0] * 4 for _ in range(4)]
            for idx, (row, col) in enumerate(ZIGZAG_4X4):
                dc_grid[row][col] = spec["dc"][idx]
            dc = dequant_luma_dc(hadamard_4x4(dc_grid), qp)
            for by in range(4):
                for bx in range(4):
                    blk = _ZSCAN_POS[(bx, by)]
                    ac = spec["ac"][blk] if spec.get("ac") \
                        else [0] * 15
                    d = dequant_4x4([0] + ac, qp, skip_dc=True)
                    d[0][0] = dc[by][bx]
                    res = idct_4x4(d)
                    for i in range(4):
                        for j in range(4):
                            y[y0 + by * 4 + i, x0 + bx * 4 + j] = \
                                _clip1(int(pred[by * 4 + i,
                                                bx * 4 + j])
                                       + res[i][j])
        else:  # i4x4 — Z-order reconstruction with top-right rule
            for blk in range(16):
                bx, by = BLK_ZSCAN[blk]
                x0 = mbx * 16 + bx * 4
                y0 = mby * 16 + by * 4
                gbx, gby = mbx * 4 + bx + 1, mby * 4 + by - 1
                right = False
                if gby >= 0 and gbx < width_mbs * 4:
                    tmx, tmy = gbx // 4, gby // 4
                    right = (tmy < mby or
                             (tmy == mby and tmx < mbx) or
                             (tmy == mby and tmx == mbx and
                              _ZSCAN_POS[(gbx % 4, gby % 4)] < blk))
                pred = predict_4x4(y, x0, y0, spec["modes"][blk],
                                   right)
                levels = spec["luma"][blk]
                res = idct_4x4(dequant_4x4(levels, qp)) \
                    if any(levels) else None
                for i in range(4):
                    for j in range(4):
                        v = pred[i][j] + (res[i][j] if res else 0)
                        y[y0 + i, x0 + j] = _clip1(v)
        # chroma (shared by i4x4 / i16x16 specs)
        cbp_chroma = spec.get("cbp_chroma", 0)
        qpc = chroma_qp(qp)
        cx0, cy0 = mbx * 8, mby * 8
        for comp, plane in ((0, cb), (1, cr)):
            pred = predict_chroma(plane, cx0, cy0,
                                  spec.get("chroma_mode", 0))
            dcl = spec.get("chroma_dc", [[0] * 4, [0] * 4])[comp] \
                if cbp_chroma else [0] * 4
            f = hadamard_2x2([[dcl[0], dcl[1]], [dcl[2], dcl[3]]])
            dc = dequant_chroma_dc(f, qpc)
            for b, (bx, by) in enumerate(CHROMA_BLKS):
                ac = spec["chroma_ac"][comp][b] \
                    if cbp_chroma == 2 else [0] * 15
                d = dequant_4x4([0] + ac, qpc, skip_dc=True)
                d[0][0] = dc[by][bx]
                res = idct_4x4(d) if (any(ac) or d[0][0]) else None
                for i in range(4):
                    for j in range(4):
                        v = int(pred[by * 4 + i, bx * 4 + j]) + \
                            (res[i][j] if res else 0)
                        plane[cy0 + by * 4 + i, cx0 + bx * 4 + j] = \
                            _clip1(v)
    return y, cb, cr
