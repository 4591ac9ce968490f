"""XOR-float (Gorilla-style) codec for f64 result columns.

Re-expresses the reference's wire codec for `/multi_query_cols` binary
responses (reference locustdb-compression-utils/src/xor_float/double.rs,
bit layout; NULL sentinel NaN 0x7ffa_aaaa_aaaa_aaaa from
locustdb-compression-utils/src/xor_float/mod.rs and
src/engine/data_types/types.rs:6-10):

- header: row count (64 bits), first value raw (64 bits)
- per subsequent value, XOR with the previous value:
  * all-zero XOR          -> control bit 0
  * fits previous window  -> control bits 10 + xor >> trailing, using the
    previous (leading, significant) window, while accumulated "regret"
    (wasted width) stays under ``max_regret``
  * new window            -> control bits 11 + 5-bit leading-zero count
    (capped at 31) + 6-bit (significant-1) + the significant XOR bits
- optional ``mantissa`` quantization keeps only the top N mantissa bits
  (lossy; masks the XOR exactly like the reference).

Bit order is LSB-first within each byte (the reference uses the
bitbuffer crate's LittleEndian mode). This is a wire/result codec for
the HTTP facade — result sets, not the 100 TB scan path — so a clear
scalar implementation is the right trade-off; columns are result-sized.
"""

from __future__ import annotations

import struct

# NULLs travel as this exact non-canonical NaN bit pattern
NULL_BITS = 0x7FFA_AAAA_AAAA_AAAA
NULL = struct.unpack("<d", struct.pack("<Q", NULL_BITS))[0]

_U64 = (1 << 64) - 1


def _to_bits(f: float | None) -> int:
    if f is None:
        return NULL_BITS
    return struct.unpack("<Q", struct.pack("<d", f))[0]


def _from_bits(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b))[0]


def _leading_zeros(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _trailing_zeros(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


class _BitWriter:
    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc |= (value & ((1 << bits) - 1)) << self.nbits
        self.nbits += bits

    def bytes(self) -> bytes:
        return self.acc.to_bytes((self.nbits + 7) // 8, "little")


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.acc = int.from_bytes(data, "little")
        self.pos = 0
        self.total = len(data) * 8

    def read(self, bits: int) -> int:
        if self.pos + bits > self.total:
            raise EOFError("xor_float: truncated stream")
        v = (self.acc >> self.pos) & ((1 << bits) - 1)
        self.pos += bits
        return v


def encode(
    floats: list[float | None],
    max_regret: int = 100,
    mantissa: int | None = None,
) -> bytes:
    """Encode a float column (None -> NULL sentinel NaN)."""
    w = _BitWriter()
    w.write(len(floats), 64)
    if not floats:
        return w.bytes()
    mask = _U64
    if mantissa is not None:
        if mantissa > 52:
            raise ValueError("f64 has at most 52 bits of mantissa")
        mask = (_U64 - ((1 << (52 - mantissa)) - 1)) & _U64

    first = _to_bits(floats[0])
    w.write(first, 64)
    last = first
    last_leading = 65
    last_trailing = 65
    last_significant = 0
    regret = 0
    for f in floats[1:]:
        bits = _to_bits(f)
        xor = (bits ^ last) & mask
        leading = min(_leading_zeros(xor), 31)
        trailing = _trailing_zeros(xor)
        if trailing == 64:
            w.write(0, 1)
        else:
            significant = 64 - leading - trailing
            if (leading >= last_leading and trailing >= last_trailing
                    and (regret < max_regret
                         or significant == last_significant)):
                # control 10: LSB-first, so emit 0b01
                w.write(0b01, 2)
                w.write(xor >> last_trailing, last_significant)
                regret += last_significant - significant
            else:
                last_leading, last_trailing = leading, trailing
                last_significant = significant
                regret = 0
                w.write(0b11, 2)
                w.write(leading, 5)
                w.write(significant - 1, 6)
                w.write(xor >> trailing, significant)
        last = bits
    return w.bytes()


def decode(data: bytes, nulls_as_none: bool = True) -> list[float | None]:
    """Decode an encoded column; the NULL sentinel comes back as None
    unless ``nulls_as_none`` is False."""
    r = _BitReader(data)
    length = r.read(64)
    out: list[float | None] = []
    if length == 0:
        return out
    last = r.read(64)
    last_trailing = 65
    last_significant = 0
    out.append(None if nulls_as_none and last == NULL_BITS
               else _from_bits(last))
    for _ in range(length - 1):
        if r.read(1) == 0:
            pass  # identical to previous
        else:
            if r.read(1) == 1:
                leading = r.read(5)
                last_significant = r.read(6) + 1
                last_trailing = 64 - leading - last_significant
            xor = r.read(last_significant)
            last ^= (xor << last_trailing) & _U64
        out.append(None if nulls_as_none and last == NULL_BITS
                   else _from_bits(last))
    return out
