"""Cap'n Proto `EventBuffer` wire format — the reference's binary
ingestion payload for ``POST /insert_bin``, implemented from scratch in
pure Python so existing LocustDB logging clients can ingest without any
re-encoding.

What's on the wire (reference ``EventBuffer::serialize``,
locustdb-serialization/src/event_buffer.rs:212-221): a Cap'n Proto
message in the *packed* stream encoding whose root struct is
``TableSegmentList`` from the public schema
locustdb-serialization/schemas/wal_segment.capnp:

    TableSegmentList { data: List(TableSegment) }
    TableSegment     { name: Text, len: UInt64, columns: List(Column) }
    Column           { name: Text, data: union {
                         f64: List(Float64)            # tag 0
                         sparseF64 { indices: List(UInt64),
                                     values: List(Float64) }  # tag 1
                         i64: List(Int64)              # tag 2
                         string: List(Text)            # tag 3
                         empty: Void                   # tag 4
                         sparseI64 { indices, values } # tag 5
                         mixed: List(AnyVal)           # tag 6
                       } }
    AnyVal           { value: union { f64|i64|string|null } }

Struct layouts (confirmed against the capnpc-generated reference code,
locustdb-serialization/src/wal_segment_capnp.rs):

    TableSegmentList  data 0 words, ptrs 1   (data      -> ptr 0)
    TableSegment      data 1, ptrs 2         (len u64 @ data word 0,
                                              name -> ptr 0,
                                              columns -> ptr 1)
    Column            data 1, ptrs 3         (union tag u16 @ byte 0,
                                              name -> ptr 0, payload ->
                                              ptr 1 [+ values -> ptr 2
                                              for the sparse groups])
    AnyVal            data 2, ptrs 1         (f64/i64 @ data word 0,
                                              union tag u16 @ byte 8,
                                              string -> ptr 0;
                                              tags f64=0 i64=1
                                              string=2 null=3)

The encoding itself (pointer words, segment framing, packing) follows
the public Cap'n Proto spec (capnproto.org/encoding.html): this module
implements exactly the subset those four structs need — struct
pointers, list pointers for element sizes 2 (bytes/Text), 5 (8-byte
scalars), 6 (pointers) and 7 (composite), far/double-far pointers in
the reader (the Rust builder emits multi-segment messages once a
buffer outgrows its first segment), and the packed codec.

Nothing here touches Spark: the server decodes to columnar Python data
and feeds the same row-ingestion path the JSON body uses.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any

# ---------------------------------------------------------------------------
# packed stream codec (capnproto.org/encoding.html#packing)
# ---------------------------------------------------------------------------


def pack(data: bytes) -> bytes:
    """Packed encoding of a word-aligned byte string: per 8-byte word a
    tag byte flags the nonzero bytes, which follow; tag 0x00 is followed
    by the count of ADDITIONAL all-zero words, tag 0xff by the literal
    word and then a count of following words stored verbatim.

    This is the numpy-vectorized encoder (a 64 MB logging-client flush
    must not spend 15s packing): every word is emitted independently
    with run counts of 0 — a VALID packing any conformant reader
    (including the reference's Rust capnp) accepts, trading a byte per
    all-zero/all-dense word for fully vectorized assembly. The
    spec-maximal encoder `_pack_py` is kept as the readable reference;
    property tests pin `unpack(pack(x)) == x` for both."""
    if len(data) % 8:
        raise ValueError("packed input must be a multiple of 8 bytes")
    if not data:
        return b""
    import numpy as np

    a = np.frombuffer(data, np.uint8).reshape(-1, 8)
    nzmask = a != 0
    tags = np.zeros(len(a), np.uint8)
    for b in range(8):
        tags |= nzmask[:, b].astype(np.uint8) << b
    counts = nzmask.sum(1, dtype=np.int64)
    # emit length per word: tag + nonzero bytes, +1 count byte (always
    # zero) for the 0x00 and 0xff special tags
    lens = 1 + counts + (tags == 0) + (tags == 0xFF)
    off = np.empty(len(a), np.int64)
    off[0] = 0
    np.cumsum(lens[:-1], out=off[1:])
    out = np.zeros(int(off[-1] + lens[-1]), np.uint8)
    out[off] = tags
    ri, ci = np.nonzero(nzmask)
    # rank of each flagged byte within its word, without an (n,8)
    # cumsum: np.nonzero is row-major, so rank = flat position minus
    # the row's first flat position
    row_starts = np.empty(len(a), np.int64)
    row_starts[0] = 0
    np.cumsum(counts[:-1], out=row_starts[1:])
    ranks = np.arange(len(ri), dtype=np.int64) - row_starts[ri]
    out[off[ri] + 1 + ranks] = a[ri, ci]
    return out.tobytes()


def _pack_py(data: bytes) -> bytes:
    """Reference encoder with maximal run compression (zero-word runs
    collapse, dense runs go verbatim after one 0xff tag)."""
    if len(data) % 8:
        raise ValueError("packed input must be a multiple of 8 bytes")
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        word = data[i:i + 8]
        i += 8
        tag = 0
        nz = bytearray()
        for b, byte in enumerate(word):
            if byte:
                tag |= 1 << b
                nz.append(byte)
        out.append(tag)
        out += nz
        if tag == 0x00:
            run = 0
            while run < 255 and i < n and data[i:i + 8] == b"\x00" * 8:
                run += 1
                i += 8
            out.append(run)
        elif tag == 0xFF:
            # greedily extend with words that don't compress (>= 6
            # nonzero bytes, the spec's suggested heuristic)
            start = i
            run = 0
            while run < 255 and i < n:
                w = data[i:i + 8]
                if sum(1 for byte in w if byte) >= 6:
                    run += 1
                    i += 8
                else:
                    break
            out.append(run)
            out += data[start:i]
    return bytes(out)


_POPCNT = [bin(t).count("1") for t in range(256)]


def unpack(data: bytes) -> bytes:
    """Inverse of :func:`pack` — accepts ANY valid packing (runs
    included). Two passes: a sequential structure scan (tag positions
    depend on every previous length, so this part cannot vectorize)
    recording where each word's payload bytes sit, then one vectorized
    scatter placing all flagged bytes at once. Raises ValueError on
    truncation. `_unpack_py` is the readable single-pass reference;
    property tests pin both against each other."""
    if not data:
        return b""
    import numpy as np

    src = np.frombuffer(data, np.uint8)
    n = len(data)
    tags: list[int] = []
    in_offs: list[int] = []
    out_words: list[int] = []
    verbatim: list[tuple[int, int, int]] = []
    ow = 0
    i = 0
    while i < n:
        t = data[i]
        i += 1
        if t == 0x00:
            if i >= n:
                raise ValueError("truncated zero-run count")
            ow += data[i] + 1
            i += 1
        elif t == 0xFF:
            if i + 9 > n:
                raise ValueError("truncated literal word")
            verbatim.append((ow, i, 1))
            ow += 1
            i += 8
            cnt = data[i]
            i += 1
            if i + 8 * cnt > n:
                raise ValueError("truncated verbatim run")
            if cnt:
                verbatim.append((ow, i, cnt))
                ow += cnt
                i += 8 * cnt
        else:
            c = _POPCNT[t]
            if i + c > n:
                raise ValueError("truncated word")
            tags.append(t)
            in_offs.append(i)
            out_words.append(ow)
            ow += 1
            i += c
    out = np.zeros(ow * 8, np.uint8)
    if tags:
        t_arr = np.array(tags, np.uint8)
        nz = np.unpackbits(
            t_arr[:, None], axis=1, bitorder="little").astype(bool)
        counts = nz.sum(1, dtype=np.int64)
        ri, ci = np.nonzero(nz)
        row_starts = np.empty(len(t_arr), np.int64)
        row_starts[0] = 0
        np.cumsum(counts[:-1], out=row_starts[1:])
        ranks = np.arange(len(ri), dtype=np.int64) - row_starts[ri]
        src_idx = np.asarray(in_offs, np.int64)[ri] + ranks
        dst = np.asarray(out_words, np.int64)[ri] * 8 + ci
        out[dst] = src[src_idx]
    for ow0, ioff, cnt in verbatim:
        out[ow0 * 8:(ow0 + cnt) * 8] = src[ioff:ioff + 8 * cnt]
    return out.tobytes()


def _unpack_py(data: bytes) -> bytes:
    """Single-pass reference decoder."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        tag = data[i]
        i += 1
        if tag == 0x00:
            if i >= n:
                raise ValueError("truncated zero-run count")
            out += b"\x00" * (8 * (data[i] + 1))
            i += 1
        elif tag == 0xFF:
            if i + 9 > n:
                raise ValueError("truncated literal word")
            out += data[i:i + 8]
            i += 8
            count = data[i]
            i += 1
            if i + 8 * count > n:
                raise ValueError("truncated verbatim run")
            out += data[i:i + 8 * count]
            i += 8 * count
        else:
            word = bytearray(8)
            for b in range(8):
                if tag & (1 << b):
                    if i >= n:
                        raise ValueError("truncated word")
                    word[b] = data[i]
                    i += 1
            out += word
    return bytes(out)


# ---------------------------------------------------------------------------
# message framing
# ---------------------------------------------------------------------------


def _frame(segments: list[bytes]) -> bytes:
    """Standard (unpacked) message framing: u32 segment-count-1, u32
    word-size per segment, zero-pad to a word boundary, segment data."""
    head = struct.pack("<I", len(segments) - 1)
    for s in segments:
        head += struct.pack("<I", len(s) // 8)
    if len(head) % 8:
        head += b"\x00" * (8 - len(head) % 8)
    return head + b"".join(segments)


def _unframe(data: bytes) -> list[bytes]:
    if len(data) < 8:
        raise ValueError("message too short for segment table")
    nseg = struct.unpack_from("<I", data, 0)[0] + 1
    if nseg > 512:
        raise ValueError(f"implausible segment count {nseg}")
    sizes = [struct.unpack_from("<I", data, 4 + 4 * i)[0]
             for i in range(nseg)]
    off = 4 + 4 * nseg
    if off % 8:
        off += 8 - off % 8
    segs = []
    for words in sizes:
        end = off + 8 * words
        if end > len(data):
            raise ValueError("segment extends past end of message")
        segs.append(data[off:end])
        off = end
    return segs


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _sign30(v: int) -> int:
    return v - (1 << 30) if v & (1 << 29) else v


class _Reader:
    """Minimal traversal over an unpacked capnp message. Every pointer
    is bounds-checked; far and double-far pointers are followed so
    multi-segment messages from the Rust builder decode correctly."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments

    def word(self, seg: int, w: int) -> int:
        s = self.segs[seg]
        if w < 0 or 8 * w + 8 > len(s):
            raise ValueError(f"word {w} out of bounds in segment {seg}")
        return struct.unpack_from("<Q", s, 8 * w)[0]

    def resolve(self, seg: int, w: int, depth: int = 0):
        """Follow the pointer at (seg, word) to its object. Returns
        None for a null pointer, ('struct', seg, target, data_words,
        ptr_words) or ('list', seg, target, size_code, count)."""
        if depth > 4:
            raise ValueError("pointer chain too deep")
        val = self.word(seg, w)
        if val == 0:
            return None
        kind = val & 3
        if kind == 0:  # struct
            off = _sign30((val >> 2) & 0x3FFFFFFF)
            return ("struct", seg, w + 1 + off,
                    (val >> 32) & 0xFFFF, (val >> 48) & 0xFFFF)
        if kind == 1:  # list
            off = _sign30((val >> 2) & 0x3FFFFFFF)
            return ("list", seg, w + 1 + off,
                    (val >> 32) & 7, val >> 35)
        if kind == 2:  # far
            tseg = val >> 32
            pad = (val >> 3) & 0x1FFFFFFF
            if tseg >= len(self.segs):
                raise ValueError(f"far pointer to missing segment {tseg}")
            if not (val >> 2) & 1:  # single-far: pad is the real pointer
                return self.resolve(tseg, pad, depth + 1)
            # double-far: pad word 0 is a far pointer to the object
            # START; pad word 1 is a tag describing it (offset 0)
            far2 = self.word(tseg, pad)
            if far2 & 3 != 2 or (far2 >> 2) & 1:
                raise ValueError("malformed double-far landing pad")
            oseg = far2 >> 32
            oword = (far2 >> 3) & 0x1FFFFFFF
            tag = self.word(tseg, pad + 1)
            if tag & 3 == 0:
                return ("struct", oseg, oword,
                        (tag >> 32) & 0xFFFF, (tag >> 48) & 0xFFFF)
            if tag & 3 == 1:
                return ("list", oseg, oword, (tag >> 32) & 7, tag >> 35)
            raise ValueError("double-far tag is not struct/list")
        raise ValueError("capability pointers are not supported")

    # -- typed accessors -------------------------------------------------

    def text(self, seg: int, w: int) -> str:
        r = self.resolve(seg, w)
        if r is None:
            return ""
        kind, tseg, target, code, count = r
        if kind != "list" or code != 2:
            raise ValueError("expected Text (byte list)")
        s = self.segs[tseg]
        if 8 * target + count > len(s):
            raise ValueError("text out of bounds")
        raw = bytes(s[8 * target:8 * target + count])
        return raw[:-1].decode("utf-8") if raw.endswith(b"\x00") \
            else raw.decode("utf-8")

    def scalar_list(self, seg: int, w: int, fmt: str) -> list:
        r = self.resolve(seg, w)
        if r is None:
            return []
        kind, tseg, target, code, count = r
        if kind != "list" or code != 5:
            raise ValueError("expected 8-byte scalar list")
        s = self.segs[tseg]
        if 8 * (target + count) > len(s):
            raise ValueError("scalar list out of bounds")
        return list(struct.unpack_from(f"<{count}{fmt}", s, 8 * target))

    def text_list(self, seg: int, w: int) -> list[str]:
        r = self.resolve(seg, w)
        if r is None:
            return []
        kind, tseg, target, code, count = r
        if kind != "list" or code != 6:
            raise ValueError("expected pointer list")
        # fast path: decode all element pointers in one numpy pass
        # (per-element resolve costs ~4 calls per string); falls back
        # to the general reader when any pointer is far/null/unusual
        import numpy as np

        s = self.segs[tseg]
        if 8 * (target + count) <= len(s):
            ptrs = np.frombuffer(s, np.uint64, count=count,
                                 offset=8 * target).astype(np.int64)
            if count and bool(((ptrs & 3) == 1).all()) and \
                    bool((((ptrs >> 32) & 7) == 2).all()):
                offs = (ptrs >> 2) & 0x3FFFFFFF
                offs = np.where(offs & (1 << 29), offs - (1 << 30), offs)
                starts = 8 * (target + np.arange(count) + 1 + offs)
                lens = (ptrs >> 35) & 0x1FFFFFFF
                ends = starts + lens
                if bool((starts >= 0).all()) and \
                        bool((ends <= len(s)).all()):
                    out = []
                    sl, el = starts.tolist(), ends.tolist()
                    for st, en in zip(sl, el):
                        raw = s[st:en]
                        out.append(
                            raw[:-1].decode("utf-8")
                            if raw.endswith(b"\x00")
                            else raw.decode("utf-8"))
                    return out
        return [self.text(tseg, target + i) for i in range(count)]

    def composite(self, seg: int, w: int):
        """Yield (seg, body_word, data_words, ptr_words) per element of
        a composite (size-code-7) list."""
        r = self.resolve(seg, w)
        if r is None:
            return
        kind, tseg, target, code, words = r
        if kind != "list" or code != 7:
            raise ValueError("expected composite list")
        tag = self.word(tseg, target)
        if tag & 3 != 0:
            raise ValueError("composite tag is not a struct pointer")
        n = (tag >> 2) & 0x3FFFFFFF
        dw = (tag >> 32) & 0xFFFF
        pw = (tag >> 48) & 0xFFFF
        if n * (dw + pw) > words:
            raise ValueError("composite elements exceed list size")
        for i in range(n):
            yield tseg, target + 1 + i * (dw + pw), dw, pw


# ---------------------------------------------------------------------------
# builder (single segment — always a valid message; the READER handles
# the multi-segment messages other builders may produce)
# ---------------------------------------------------------------------------


class _Builder:
    def __init__(self):
        self.buf = bytearray(8)  # word 0 = root pointer

    def alloc(self, nwords: int) -> int:
        off = len(self.buf) // 8
        self.buf += bytes(8 * nwords)
        return off

    def put_u64(self, word: int, val: int) -> None:
        struct.pack_into("<Q", self.buf, 8 * word, val & 0xFFFFFFFFFFFFFFFF)

    def put_i64(self, word: int, val: int) -> None:
        struct.pack_into("<q", self.buf, 8 * word, val)

    def put_f64(self, word: int, val: float) -> None:
        struct.pack_into("<d", self.buf, 8 * word, val)

    def put_u16(self, word: int, byte: int, val: int) -> None:
        struct.pack_into("<H", self.buf, 8 * word + byte, val)

    def struct_ptr(self, ptr_word: int, target: int,
                   data_words: int, ptr_words: int) -> None:
        off = target - (ptr_word + 1)
        self.put_u64(ptr_word, ((off & 0x3FFFFFFF) << 2)
                     | (data_words << 32) | (ptr_words << 48))

    def list_ptr(self, ptr_word: int, target: int,
                 size_code: int, count: int) -> None:
        off = target - (ptr_word + 1)
        self.put_u64(ptr_word, 1 | ((off & 0x3FFFFFFF) << 2)
                     | (size_code << 32) | (count << 35))

    def write_text(self, ptr_word: int, s: str) -> None:
        raw = s.encode("utf-8") + b"\x00"
        target = self.alloc((len(raw) + 7) // 8)
        self.buf[8 * target:8 * target + len(raw)] = raw
        self.list_ptr(ptr_word, target, 2, len(raw))

    def write_scalars(self, ptr_word: int, vals: list, fmt: str) -> None:
        target = self.alloc(len(vals))
        struct.pack_into(f"<{len(vals)}{fmt}", self.buf, 8 * target, *vals)
        self.list_ptr(ptr_word, target, 5, len(vals))

    def write_text_list(self, ptr_word: int, vals: list[str]) -> None:
        """Bulk text-list writer: one allocation for all bodies and a
        single vectorized write of the n pointer words (a per-element
        write_text costs 5 calls per string — real money at 200k
        strings per flush)."""
        import numpy as np

        n = len(vals)
        target = self.alloc(n)
        self.list_ptr(ptr_word, target, 6, n)
        if not n:
            return
        raws = [s.encode("utf-8") + b"\x00" for s in vals]
        words = np.fromiter((len(r) + 7 >> 3 for r in raws),
                            np.int64, count=n)
        base = len(self.buf) // 8
        self.buf += bytes(8 * int(words.sum()))
        offs = np.empty(n, np.int64)
        offs[0] = base
        np.cumsum(words[:-1], out=offs[1:])
        offs[1:] += base
        lens = np.fromiter((len(r) for r in raws), np.int64, count=n)
        ptr_words_idx = target + np.arange(n, dtype=np.int64)
        ptrs = (1 | (((offs - (ptr_words_idx + 1)) & 0x3FFFFFFF) << 2)
                | (2 << 32) | (lens << 35)).astype(np.uint64)
        self.buf[8 * target:8 * (target + n)] = ptrs.tobytes()
        buf = self.buf
        for off, r in zip(offs.tolist(), raws):
            buf[8 * off:8 * off + len(r)] = r

    def init_composite(self, ptr_word: int, n: int,
                       data_words: int, ptr_words: int) -> int:
        """Allocate a composite list (tag + n elements); returns the
        word of element 0's body."""
        elem = data_words + ptr_words
        target = self.alloc(1 + n * elem)
        self.list_ptr(ptr_word, target, 7, n * elem)
        self.put_u64(target, ((n & 0x3FFFFFFF) << 2)
                     | (data_words << 32) | (ptr_words << 48))
        return target + 1

    def message(self) -> bytes:
        return _frame([bytes(self.buf)])


# ---------------------------------------------------------------------------
# EventBuffer model (reference event_buffer.rs:8-101)
# ---------------------------------------------------------------------------

# Column.data union tags, in schema ordinal order
_F64, _SPARSE_F64, _I64, _STRING, _EMPTY, _SPARSE_I64, _MIXED = range(7)
# AnyVal.value union tags
_AV_F64, _AV_I64, _AV_STR, _AV_NULL = range(4)


@dataclass
class ColumnData:
    """One column buffer: `kind` in {'empty','f64','sparse_f64','i64',
    'sparse_i64','string','mixed'}. Sparse kinds carry (indices,
    values) parallel lists; mixed carries int/float/str/None values."""
    kind: str = "empty"
    values: list = field(default_factory=list)
    indices: list = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.values)

    # -- reference ColumnBuffer::push promotion semantics
    # (event_buffer.rs:131-209): dense becomes sparse when rows were
    # missed, i64 promotes to f64 when a float arrives, strings must
    # stay dense.
    def push(self, value: Any, existing_len: int) -> None:
        if value is None:
            return
        if isinstance(value, bool):
            value = int(value)
        if self.kind == "empty":
            if isinstance(value, float):
                if existing_len == 0:
                    self.kind, self.values = "f64", [value]
                else:
                    self.kind = "sparse_f64"
                    self.indices, self.values = [existing_len], [value]
            elif isinstance(value, int):
                if existing_len == 0:
                    self.kind, self.values = "i64", [value]
                else:
                    self.kind = "sparse_i64"
                    self.indices, self.values = [existing_len], [value]
            elif isinstance(value, str):
                if existing_len != 0:
                    raise ValueError(
                        "sparse string columns are not supported")
                self.kind, self.values = "string", [value]
            else:
                raise TypeError(f"cannot log value {value!r}")
            return
        if self.kind == "f64":
            if isinstance(value, (int, float)) and not isinstance(value, str):
                if len(self.values) == existing_len:
                    self.values.append(float(value))
                else:
                    self.kind = "sparse_f64"
                    self.indices = list(range(len(self.values)))
                    self.indices.append(existing_len)
                    self.values.append(float(value))
                return
        elif self.kind == "sparse_f64":
            if isinstance(value, (int, float)) and not isinstance(value, str):
                self.indices.append(existing_len)
                self.values.append(float(value))
                return
        elif self.kind == "i64":
            if isinstance(value, int):
                if len(self.values) == existing_len:
                    self.values.append(value)
                else:
                    self.kind = "sparse_i64"
                    self.indices = list(range(len(self.values)))
                    self.indices.append(existing_len)
                    self.values.append(value)
                return
            if isinstance(value, float):
                self.kind = "f64"
                self.values = [float(v) for v in self.values]
                self.push(value, existing_len)
                return
        elif self.kind == "sparse_i64":
            if isinstance(value, int):
                self.indices.append(existing_len)
                self.values.append(value)
                return
            if isinstance(value, float):
                self.kind = "sparse_f64"
                self.values = [float(v) for v in self.values]
                self.push(value, existing_len)
                return
        elif self.kind == "string":
            if isinstance(value, str):
                if len(self.values) != existing_len:
                    raise ValueError(
                        "sparse string columns are not supported")
                self.values.append(value)
                return
        elif self.kind == "mixed":
            self.values.append(value)
            return
        raise TypeError(
            f"cannot log {value!r} to a {self.kind} column")

    def dense(self, length: int) -> list:
        """Materialize as a row-aligned list of `length` values with
        None for absent rows (ingestion shape)."""
        if self.kind == "empty":
            return [None] * length
        if self.kind in ("sparse_f64", "sparse_i64"):
            out: list = [None] * length
            for i, v in zip(self.indices, self.values):
                if i < length:
                    out[int(i)] = v
            return out
        out = list(self.values[:length])
        out += [None] * (length - len(out))
        return out


@dataclass
class TableBuffer:
    len: int = 0
    columns: dict[str, ColumnData] = field(default_factory=dict)

    def push_row(self, row: dict[str, Any]) -> None:
        """Append one event (reference push_row_and_timestamp minus the
        implicit timestamp — the client layer decides that policy)."""
        for name, value in row.items():
            self.columns.setdefault(name, ColumnData()).push(
                value, self.len)
        self.len += 1


@dataclass
class EventBuffer:
    tables: dict[str, TableBuffer] = field(default_factory=dict)

    # -- wire format -----------------------------------------------------

    def serialize(self) -> bytes:
        """Packed capnp message, byte-compatible with the reference's
        ``EventBuffer::serialize`` modulo segment strategy (we always
        emit one segment; any conformant reader accepts that)."""
        b = _Builder()
        self._serialize_into(b, 0)
        return pack(b.message())

    def _serialize_into(self, b: _Builder, ptr_word: int) -> None:
        """Write this buffer as a TableSegmentList struct pointed to by
        `ptr_word` (shared by EventBuffer roots and WalSegment.data)."""
        root = b.alloc(1)  # TableSegmentList: 0 data + 1 ptr
        b.struct_ptr(ptr_word, root, 0, 1)
        items = list(self.tables.items())
        body = b.init_composite(root, len(items), 1, 2)
        for t, (name, table) in enumerate(items):
            tw = body + 3 * t
            b.put_u64(tw, table.len)
            b.write_text(tw + 1, name)
            cols = list(table.columns.items())
            cbody = b.init_composite(tw + 2, len(cols), 1, 3)
            for c, (cname, col) in enumerate(cols):
                cw = cbody + 4 * c
                b.write_text(cw + 1, cname)
                if col.kind == "empty":
                    b.put_u16(cw, 0, _EMPTY)
                elif col.kind == "f64":
                    b.put_u16(cw, 0, _F64)
                    b.write_scalars(cw + 2, [float(v) for v in col.values],
                                    "d")
                elif col.kind == "i64":
                    b.put_u16(cw, 0, _I64)
                    b.write_scalars(cw + 2, col.values, "q")
                elif col.kind == "sparse_f64":
                    b.put_u16(cw, 0, _SPARSE_F64)
                    b.write_scalars(cw + 2, col.indices, "Q")
                    b.write_scalars(cw + 3,
                                    [float(v) for v in col.values], "d")
                elif col.kind == "sparse_i64":
                    b.put_u16(cw, 0, _SPARSE_I64)
                    b.write_scalars(cw + 2, col.indices, "Q")
                    b.write_scalars(cw + 3, col.values, "q")
                elif col.kind == "string":
                    b.put_u16(cw, 0, _STRING)
                    b.write_text_list(cw + 2, col.values)
                elif col.kind == "mixed":
                    b.put_u16(cw, 0, _MIXED)
                    mbody = b.init_composite(cw + 2, len(col.values), 2, 1)
                    for m, v in enumerate(col.values):
                        mw = mbody + 3 * m
                        if v is None:
                            b.put_u16(mw + 1, 0, _AV_NULL)
                        elif isinstance(v, bool):
                            b.put_u16(mw + 1, 0, _AV_I64)
                            b.put_i64(mw, int(v))
                        elif isinstance(v, int):
                            b.put_u16(mw + 1, 0, _AV_I64)
                            b.put_i64(mw, v)
                        elif isinstance(v, float):
                            b.put_u16(mw + 1, 0, _AV_F64)
                            b.put_f64(mw, v)
                        elif isinstance(v, str):
                            b.put_u16(mw + 1, 0, _AV_STR)
                            b.write_text(mw + 2, v)
                        else:
                            raise TypeError(f"mixed value {v!r}")
                else:
                    raise ValueError(f"unknown column kind {col.kind}")

    @classmethod
    def deserialize(cls, data: bytes) -> "EventBuffer":
        r = _Reader(_unframe(unpack(data)))
        root = r.resolve(0, 0)
        if root is None:
            return cls()
        kind, seg, target, dw, pw = root
        if kind != "struct" or pw < 1:
            raise ValueError("root is not a TableSegmentList")
        return cls(tables=cls._read_tables(r, seg, target, dw))

    @classmethod
    def _read_tables(cls, r: _Reader, seg: int, target: int,
                     dw: int) -> dict[str, TableBuffer]:
        """Read a TableSegmentList struct body (shared by EventBuffer
        roots and WalSegment.data)."""
        tables: dict[str, TableBuffer] = {}
        for tseg, tw, tdw, tpw in r.composite(seg, target + dw):
            name = r.text(tseg, tw + tdw)
            tlen = r.word(tseg, tw) if tdw >= 1 else 0
            columns: dict[str, ColumnData] = {}
            for cseg, cw, cdw, cpw in r.composite(tseg, tw + tdw + 1):
                cname = r.text(cseg, cw + cdw)
                tag = r.word(cseg, cw) & 0xFFFF if cdw >= 1 else _EMPTY
                p1, p2 = cw + cdw + 1, cw + cdw + 2
                if tag == _F64:
                    col = ColumnData("f64", r.scalar_list(cseg, p1, "d"))
                elif tag == _SPARSE_F64:
                    col = ColumnData("sparse_f64",
                                     r.scalar_list(cseg, p2, "d"),
                                     r.scalar_list(cseg, p1, "Q"))
                elif tag == _I64:
                    col = ColumnData("i64", r.scalar_list(cseg, p1, "q"))
                elif tag == _SPARSE_I64:
                    col = ColumnData("sparse_i64",
                                     r.scalar_list(cseg, p2, "q"),
                                     r.scalar_list(cseg, p1, "Q"))
                elif tag == _STRING:
                    col = ColumnData("string", r.text_list(cseg, p1))
                elif tag == _EMPTY:
                    col = ColumnData("empty")
                elif tag == _MIXED:
                    vals: list = []
                    for mseg, mw, mdw, mpw in r.composite(cseg, p1):
                        vtag = (r.word(mseg, mw + 1) & 0xFFFF) \
                            if mdw >= 2 else _AV_NULL
                        if vtag == _AV_F64:
                            vals.append(struct.unpack_from(
                                "<d", r.segs[mseg], 8 * mw)[0])
                        elif vtag == _AV_I64:
                            vals.append(struct.unpack_from(
                                "<q", r.segs[mseg], 8 * mw)[0])
                        elif vtag == _AV_STR:
                            vals.append(r.text(mseg, mw + mdw))
                        else:
                            vals.append(None)
                    col = ColumnData("mixed", vals)
                else:
                    raise ValueError(f"unknown Column.data tag {tag}")
                columns[cname] = col
            tables[name] = TableBuffer(len=tlen, columns=columns)
        return tables

    # -- ingestion shape ---------------------------------------------------

    def to_rows(self) -> dict[str, list[dict[str, Any]]]:
        """Row-major view per table (the engine's ingest() shape):
        sparse columns contribute None on absent rows."""
        out: dict[str, list[dict[str, Any]]] = {}
        for name, table in self.tables.items():
            length = int(table.len) or max(
                (len(c) for c in table.columns.values()), default=0)
            dense = {c: col.dense(length)
                     for c, col in table.columns.items()}
            out[name] = [
                {c: vals[i] for c, vals in dense.items()}
                for i in range(length)
            ]
        return out


@dataclass
class WalSegment:
    """The reference's on-disk WAL file format (src/disk_store/
    wal_segment.rs:12-35): a packed-capnp ``WalSegment { id: UInt64,
    data: TableSegmentList }`` — i.e. an EventBuffer plus a monotonic
    segment id. With this, a Spark pipeline can ingest the wal/
    directory of a real LocustDB instance directly (see
    ``LocustDB.ingest_wal_segment``)."""

    id: int = 0
    data: EventBuffer = field(default_factory=EventBuffer)

    def serialize(self) -> bytes:
        b = _Builder()
        body = b.alloc(2)  # WalSegment: data 1 word (id) + 1 ptr
        b.struct_ptr(0, body, 1, 1)
        b.put_u64(body, self.id)
        self.data._serialize_into(b, body + 1)
        return pack(b.message())

    @classmethod
    def deserialize(cls, data: bytes) -> "WalSegment":
        # On-disk wal files carry the VersionedChecksummedBlobWriter
        # header (file_writer.rs:27-100) — strip it when present so
        # both raw serializations and real wal/ files deserialize.
        from .refdir import maybe_unwrap_blob

        r = _Reader(_unframe(unpack(maybe_unwrap_blob(data))))
        root = r.resolve(0, 0)
        if root is None:
            return cls()
        kind, seg, target, dw, pw = root
        if kind != "struct" or dw < 1 or pw < 1:
            raise ValueError("root is not a WalSegment")
        seg_id = r.word(seg, target)
        tsl = r.resolve(seg, target + dw)
        if tsl is None:
            return cls(id=seg_id)
        tkind, tseg, ttarget, tdw, tpw = tsl
        if tkind != "struct":
            raise ValueError("WalSegment.data is not a struct")
        return cls(id=seg_id, data=EventBuffer(
            tables=EventBuffer._read_tables(r, tseg, ttarget, tdw)))
