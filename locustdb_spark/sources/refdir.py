"""Read (and write) a reference-LocustDB persisted data directory.

Layout (reference src/disk_store/storage.rs:49-230):

    <root>/meta                      — packed-capnp DBMeta blob
    <root>/wal/<id>.wal              — packed-capnp WalSegment blobs
    <root>/tables/<table>/<id:05>_<key>.part
                                     — packed-capnp PartitionSegment blobs

Every file is wrapped by VersionedChecksummedBlobWriter
(src/disk_store/file_writer.rs:27-100): u64-BE version (0), u64-BE
payload length, 32-byte sha256, payload.

DBMeta / PartitionSegment layouts follow the public capnp schemas
(locustdb-serialization/schemas/{dbmeta,partition_segment}.capnp) and
the generated struct sizes in locustdb-serialization/src/*_capnp.rs;
column materialization interprets the reference's codec-op stack
machine (src/mem_store/codec.rs:145-208) with the operator semantics
of src/engine/operators/{delta_decode,dict_lookup,unpack_strings,
unhexpack_strings,lz4_decode}.rs and the LSB-first present bitvec of
src/bitvec.rs.

Scope: every codec op decodes, including Pco — sources/pco.py is a
pure-Python implementation of the published pcodec format (the crate
the reference pins, column.rs:116-126; see pco.py's docstring for the
spec-reconstruction confidence notes, since this offline environment
has no crate-produced bytes to conformance-test against). A Pco
payload that fails the format's structural invariants raises
:class:`PcoUnsupportedError` naming the table/column, or degrades to
an all-NULL column with ``on_pco="null"`` so the rest of a directory
can still migrate. WAL segments (the in-flight half) are fully
supported via sources/event_buffer.py.

The writer half exports tables back INTO the reference's format
(plain + lz4-frame sections, nullable masks, packed strings), which
both round-trips our reader in tests and gives reference users a
migration path in either direction.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct
from dataclasses import dataclass, field

import numpy as np

from .event_buffer import _Builder, _Reader, _unframe, pack, unpack
from .lz4 import compress_frame, decompress_frame, \
    decompress_size_prepended


class PcoUnsupportedError(NotImplementedError):
    """A Pco (pcodec) column section failed to decode — the payload
    violates the format's structural invariants (or uses a variant
    the pure-Python decoder in sources/pco.py does not cover).
    Re-run with on_pco='null' to migrate the rest of the directory."""


# ---------------------------------------------------------------------------
# checksummed blob wrapper (file_writer.rs VersionedChecksummedBlobWriter)
# ---------------------------------------------------------------------------

def unwrap_blob(data: bytes) -> bytes:
    if len(data) < 48:
        raise ValueError(f"blob too short: {len(data)} bytes")
    version = int.from_bytes(data[0:8], "big")
    if version != 0:
        raise ValueError(f"unsupported blob version {version}")
    length = int.from_bytes(data[8:16], "big")
    if len(data) != 48 + length:
        raise ValueError(
            f"blob length mismatch: header {length}, actual "
            f"{len(data) - 48}")
    payload = data[48:]
    if hashlib.sha256(payload).digest() != data[16:48]:
        raise ValueError("blob sha256 checksum mismatch")
    return payload


def wrap_blob(payload: bytes) -> bytes:
    return (b"\x00" * 8 + len(payload).to_bytes(8, "big")
            + hashlib.sha256(payload).digest() + payload)


def maybe_unwrap_blob(data: bytes) -> bytes:
    """Unwrap if the bytes carry the checksummed header; pass through
    raw payloads (lets tools accept both on-disk and in-memory
    serializations)."""
    if len(data) >= 48 and data[0:8] == b"\x00" * 8 \
            and int.from_bytes(data[8:16], "big") == len(data) - 48:
        return unwrap_blob(data)
    return data


# ---------------------------------------------------------------------------
# capnp scalar-list helpers (sizes the event_buffer _Reader lacks)
# ---------------------------------------------------------------------------

_SIZE_CODE_BYTES = {2: 1, 3: 2, 4: 4, 5: 8}



def _resolve_struct(r: _Reader, seg: int, w: int, what: str):
    """Resolve a pointer that must be a struct, with bounds checks —
    a corrupt negative offset would otherwise wrap Python indexing to
    the segment tail and read garbage silently."""
    res = r.resolve(seg, w)
    if res is None or res[0] != "struct":
        raise ValueError(f"{what}: missing struct")
    _, tseg, target, dw, pw = res
    if target < 0 or 8 * (target + dw + pw) > len(r.segs[tseg]):
        raise ValueError(f"{what}: struct out of bounds")
    return tseg, target, dw, pw


def _read_bytes_list(r: _Reader, seg: int, w: int) -> bytes:
    res = r.resolve(seg, w)
    if res is None:
        return b""
    kind, tseg, target, code, count = res
    if kind != "list" or code != 2:
        raise ValueError(f"expected byte list, got {kind}/{code}")
    s = r.segs[tseg]
    if 8 * target + count > len(s):
        raise ValueError("byte list out of bounds")
    return bytes(s[8 * target:8 * target + count])


def _read_scalar_np(r: _Reader, seg: int, w: int, dtype: str) -> np.ndarray:
    """Read a primitive list into numpy. dtype gives the FINAL
    interpretation; the stored element width comes from the list's
    size code."""
    res = r.resolve(seg, w)
    if res is None:
        return np.empty(0, dtype)
    kind, tseg, target, code, count = res
    if kind != "list" or code not in _SIZE_CODE_BYTES:
        raise ValueError(f"expected scalar list, got {kind}/{code}")
    width = _SIZE_CODE_BYTES[code]
    s = r.segs[tseg]
    if 8 * target + width * count > len(s):
        raise ValueError("scalar list out of bounds")
    stored = {1: "u1", 2: "<u2", 4: "<u4", 8: "<u8"}[width]
    if dtype in ("<i8", "i8") and width == 8:
        stored = "<i8"
    if dtype in ("<f8", "f8") and width == 8:
        stored = "<f8"
    arr = np.frombuffer(s, stored, count=count, offset=8 * target)
    return arr.copy()


def _read_u16_scalar_list(r: _Reader, seg: int, w: int) -> list[int]:
    return _read_scalar_np(r, seg, w, "u2").tolist()


# ---------------------------------------------------------------------------
# dbmeta (schemas/dbmeta.capnp; layouts from dbmeta_capnp.rs:
# DBMeta data 1 ptrs 4; PartitionMetadata data 3 ptrs 2;
# SubpartitionMetadata data 1 ptrs 5)
# ---------------------------------------------------------------------------

@dataclass
class RefSubpartition:
    size_bytes: int
    key: str
    last_column: str


@dataclass
class RefPartition:
    id: int
    table: str
    offset: int
    len: int
    subpartitions: list[RefSubpartition] = field(default_factory=list)


@dataclass
class RefMeta:
    next_wal_id: int = 0
    partitions: list[RefPartition] = field(default_factory=list)

    def tables(self) -> list[str]:
        return sorted({p.table for p in self.partitions})

    def for_table(self, table: str) -> list[RefPartition]:
        return sorted((p for p in self.partitions if p.table == table),
                      key=lambda p: (p.offset, p.id))


def parse_dbmeta(data: bytes) -> RefMeta:
    r = _Reader(_unframe(unpack(maybe_unwrap_blob(data))))
    root = r.resolve(0, 0)
    if root is None:
        return RefMeta()
    kind, seg, target, dw, pw = root
    if kind != "struct":
        raise ValueError("DBMeta root is not a struct")
    meta = RefMeta(next_wal_id=r.word(seg, target) if dw >= 1 else 0)
    ptr0 = target + dw

    # interned strings: v1 plain list (ptr1) + v2 lz4 block (ptr2/ptr3)
    strings: list[str] = []
    if pw >= 2:
        strings.extend(r.text_list(seg, ptr0 + 1))
    if pw >= 4:
        compressed = _read_bytes_list(r, seg, ptr0 + 2)
        if compressed:
            blob = decompress_size_prepended(compressed)
            i = 0
            for ln in _read_u16_scalar_list(r, seg, ptr0 + 3):
                strings.append(blob[i:i + ln].decode("utf-8"))
                i += ln

    for pseg, pw0, pdw, ppw in r.composite(seg, ptr0):
        part = RefPartition(
            id=r.word(pseg, pw0) if pdw >= 1 else 0,
            table=r.text(pseg, pw0 + pdw) if ppw >= 1 else "",
            offset=r.word(pseg, pw0 + 1) if pdw >= 2 else 0,
            len=r.word(pseg, pw0 + 2) if pdw >= 3 else 0,
        )
        if ppw >= 2:
            for sseg, sw0, sdw, spw in r.composite(pseg, pw0 + pdw + 1):
                sp = RefSubpartition(
                    size_bytes=r.word(sseg, sw0) if sdw >= 1 else 0,
                    key=r.text(sseg, sw0 + sdw) if spw >= 1 else "",
                    last_column="",
                )
                # v3 explicit last column (ptr4)
                if spw >= 5:
                    sp.last_column = r.text(sseg, sw0 + sdw + 4)
                if not sp.last_column:
                    last = ""
                    if spw >= 2:  # v0 full column list
                        for c in r.text_list(sseg, sw0 + sdw + 1):
                            last = max(last, c)
                    if spw >= 3:  # v1 interned ids
                        for cid in _read_scalar_np(
                                r, sseg, sw0 + sdw + 2, "u8").tolist():
                            last = max(last, strings[cid])
                    if spw >= 4 and _read_bytes_list(
                            r, sseg, sw0 + sdw + 3):
                        raise PcoUnsupportedError(
                            "dbmeta v2 compressedInternedColumns uses "
                            "Pco; regenerate the meta store with a "
                            "v3 reference build")
                    sp.last_column = last
                part.subpartitions.append(sp)
        meta.partitions.append(part)
    return meta


def serialize_dbmeta(meta: RefMeta) -> bytes:
    b = _Builder()
    root = b.alloc(5)  # data 1 + ptrs 4
    b.struct_ptr(0, root, 1, 4)
    b.put_u64(root, meta.next_wal_id)
    elem = b.init_composite(root + 1, len(meta.partitions), 3, 2)
    for i, p in enumerate(meta.partitions):
        w = elem + i * 5
        b.put_u64(w, p.id)
        b.put_u64(w + 1, p.offset)
        b.put_u64(w + 2, p.len)
        b.write_text(w + 3, p.table)
        sub = b.init_composite(w + 4, len(p.subpartitions), 1, 5)
        for j, sp in enumerate(p.subpartitions):
            sw = sub + j * 6
            b.put_u64(sw, sp.size_bytes)
            b.write_text(sw + 1, sp.key)
            b.write_text(sw + 5, sp.last_column)
    return pack(b.message())


# ---------------------------------------------------------------------------
# partition segments (schemas/partition_segment.capnp; layouts from
# partition_segment_capnp.rs: Column data 2 ptrs 4, CodecOp data 2
# ptrs 1 disc@u16[0], DataSection data 3 ptrs 1 disc@u16[0])
# ---------------------------------------------------------------------------

_ENC = ["u8", "u16", "u32", "u64", "i64", "null", "f64", "bitvec"]
_ENC_NP = {"u8": "u1", "u16": "<u2", "u32": "<u4", "u64": "<u8",
           "i64": "<i8", "f64": "<f8", "bitvec": "u1"}


@dataclass
class RefColumn:
    name: str
    len: int
    range: tuple[int, int] | None
    codec: list[tuple]           # (op, *args)
    sections: list[tuple]        # (kind, payload)


def parse_partition_segment(data: bytes) -> list[RefColumn]:
    r = _Reader(_unframe(unpack(maybe_unwrap_blob(data))))
    root = r.resolve(0, 0)
    if root is None:
        return []
    kind, seg, target, dw, pw = root
    if kind != "struct" or pw < 1:
        raise ValueError("PartitionSegment root is not a struct")
    cols = []
    for cseg, cw, cdw, cpw in r.composite(seg, target + dw):
        name = r.text(cseg, cw + cdw)
        length = r.word(cseg, cw)
        rng = None
        disc = struct.unpack_from("<H", r.segs[cseg], 8 * cw + 8)[0]
        if disc == 0 and cpw >= 2:
            rres = r.resolve(cseg, cw + cdw + 1)
            if rres is not None:
                rseg, rw, rdw, _ = _resolve_struct(
                    r, cseg, cw + cdw + 1, "column range")
                if rdw >= 2:
                    s = struct.unpack_from("<q", r.segs[rseg], 8 * rw)[0]
                    e = struct.unpack_from(
                        "<q", r.segs[rseg], 8 * rw + 8)[0]
                    rng = (s, e)
        codec = []
        for oseg, ow, odw, opw in r.composite(cseg, cw + cdw + 2):
            odisc = struct.unpack_from("<H", r.segs[oseg], 8 * ow)[0]
            if odisc == 0:  # add -> Add struct via ptr0
                aseg, aw, adw, _ = _resolve_struct(
                    r, oseg, ow + odw, "codec op Add")
                t = struct.unpack_from("<H", r.segs[aseg], 8 * aw)[0]
                amount = struct.unpack_from(
                    "<q", r.segs[aseg], 8 * aw + 8)[0]
                codec.append(("add", _ENC[t], amount))
            elif odisc == 1:
                codec.append(("delta",))
            elif odisc == 2:
                codec.append(("to_i64",))
            elif odisc == 3:
                codec.append(("push_section",
                              r.word(oseg, ow + 1) if odw >= 2 else 0))
            elif odisc == 4:
                codec.append(("dict_lookup",))
            elif odisc == 5:  # lz4 -> LZ4 struct
                lseg, lw, ldw, _ = _resolve_struct(
                    r, oseg, ow + odw, "codec op LZ4")
                t = struct.unpack_from("<H", r.segs[lseg], 8 * lw)[0]
                n = struct.unpack_from("<Q", r.segs[lseg], 8 * lw + 8)[0]
                codec.append(("lz4", _ENC[t], n))
            elif odisc == 6:
                codec.append(("unpack_strings",))
            elif odisc == 7:  # unhexpack
                useg, uw, udw, _ = _resolve_struct(
                    r, oseg, ow + odw, "codec op Unhexpack")
                upper = bool(r.segs[useg][8 * uw] & 1)
                total = struct.unpack_from(
                    "<Q", r.segs[useg], 8 * uw + 8)[0]
                codec.append(("unhexpack_strings", upper, total))
            elif odisc == 8:
                codec.append(("nullable",))
            elif odisc == 9:  # pco -> Pco struct
                pseg2, pw2, pdw2, _ = _resolve_struct(
                    r, oseg, ow + odw, "codec op Pco")
                t = struct.unpack_from("<H", r.segs[pseg2], 8 * pw2)[0]
                n = struct.unpack_from(
                    "<Q", r.segs[pseg2], 8 * pw2 + 8)[0]
                fp32 = bool(r.segs[pseg2][8 * pw2 + 2] & 1)
                codec.append(("pco", _ENC[t], n, fp32))
            else:
                raise ValueError(f"unknown codec op discriminant {odisc}")
        sections = []
        for dseg, dw2, ddw, dpw in r.composite(cseg, cw + cdw + 3):
            sdisc = struct.unpack_from("<H", r.segs[dseg], 8 * dw2)[0]
            if sdisc in (0, 7):  # u8 / bitvec
                sections.append((
                    "bitvec" if sdisc == 7 else "u8",
                    np.frombuffer(
                        _read_bytes_list(r, dseg, dw2 + ddw), "u1")))
            elif sdisc == 1:
                sections.append(
                    ("u16", _read_scalar_np(r, dseg, dw2 + ddw, "u2")))
            elif sdisc == 2:
                sections.append(
                    ("u32", _read_scalar_np(r, dseg, dw2 + ddw, "u4")))
            elif sdisc == 3:
                sections.append(
                    ("u64", _read_scalar_np(r, dseg, dw2 + ddw, "u8")))
            elif sdisc == 4:
                sections.append(
                    ("i64", _read_scalar_np(r, dseg, dw2 + ddw, "i8")))
            elif sdisc == 5:  # null count in data word 1
                sections.append(("null", int(r.word(dseg, dw2 + 1))))
            elif sdisc == 6:
                sections.append(
                    ("f64", _read_scalar_np(r, dseg, dw2 + ddw, "f8")))
            elif sdisc == 8:  # lz4 group
                sections.append(("lz4", {
                    "decoded_bytes": int(r.word(dseg, dw2 + 1)),
                    "bytes_per_element": int(r.word(dseg, dw2 + 2)),
                    "data": _read_bytes_list(r, dseg, dw2 + ddw),
                }))
            elif sdisc == 9:  # pco group
                fp32 = bool(r.segs[dseg][8 * dw2 + 2] & 1)
                sections.append(("pco", {
                    "decoded_bytes": int(r.word(dseg, dw2 + 1)),
                    "bytes_per_element": int(r.word(dseg, dw2 + 2)),
                    "is_fp32": fp32,
                    "data": _read_bytes_list(r, dseg, dw2 + ddw),
                }))
            else:
                raise ValueError(
                    f"unknown data section discriminant {sdisc}")
        cols.append(RefColumn(name, length, rng, codec, sections))
    return cols


# ---------------------------------------------------------------------------
# codec interpreter (codec.rs decode_ops stack machine)
# ---------------------------------------------------------------------------

def _iter_packed(data: np.ndarray):
    """StringPacker framing (stringpack.rs:59-113): length with
    255-continuation bytes, then the payload bytes."""
    buf = data.tobytes()
    i, n = 0, len(buf)
    while i < n:
        ln = 0
        while buf[i] == 255:
            ln += 255
            i += 1
        ln += buf[i]
        i += 1
        yield buf[i:i + ln]
        i += ln


def _section_value(section: tuple, column: str):
    kind, payload = section
    if kind == "null":
        return ("nullsec", payload)
    if kind == "pco":
        # like lz4: the codec's pco op does the decode; push raw bytes
        return np.frombuffer(payload["data"], "u1")
    if kind == "lz4":
        # pre-wrapped section: the codec's lz4 op does the decode;
        # push the raw frame bytes
        return np.frombuffer(payload["data"], "u1")
    return payload


def _pco_decode_section(blob: bytes, enc: str, n: int, fp32: bool,
                        column: str) -> np.ndarray:
    """Decode a Pco data section with sources/pco.py and apply the
    reference's post-decode casts (column.rs:465-505 pco_decode):
    u8/u16 columns are stored as pco-u32 and downcast; f64 columns
    flagged is_fp32 are stored as pco-f32 and widened."""
    from . import pco as _pco

    try:
        arr = _pco.simple_decompress(blob)
    except _pco.PcoFormatError as e:
        raise PcoUnsupportedError(
            f"column {column!r}: Pco payload did not parse ({e}); "
            "re-run with on_pco='null' to degrade this column") from e
    if len(arr) != n:
        raise PcoUnsupportedError(
            f"column {column!r}: Pco decoded {len(arr)} values, "
            f"expected {n}")
    if enc == "u8":
        return arr.astype("u1")
    if enc == "u16":
        return arr.astype("<u2")
    if enc in ("u32", "u64", "i64"):
        return arr.astype(_ENC_NP[enc])
    if enc == "f64":
        if fp32 and arr.dtype != np.float32:
            raise PcoUnsupportedError(
                f"column {column!r}: is_fp32 set but payload is "
                f"{arr.dtype}")
        return arr.astype("<f8")
    raise PcoUnsupportedError(
        f"column {column!r}: unexpected Pco target type {enc!r}")


def materialize_column(col: RefColumn, on_pco: str = "error"):
    """Run the codec stack machine; returns (values, mask) where
    values is a numpy array or list of str and mask is a bool numpy
    array (True = present) or None."""
    try:
        return _materialize(col)
    except PcoUnsupportedError:
        if on_pco == "null":
            return ("allnull", col.len), None
        raise


def _materialize(col: RefColumn):
    if not col.sections:
        return ("allnull", col.len), None
    stack: list = [_section_value(col.sections[0], col.name)]
    mask = None
    for op in col.codec:
        name = op[0]
        if name == "push_section":
            stack.append(_section_value(col.sections[op[1]], col.name))
        elif name == "nullable":
            present = stack.pop()
            data = stack.pop()
            bits = np.unpackbits(
                np.asarray(present, "u1"), bitorder="little")
            m = np.zeros(col.len, bool)
            usable = min(col.len, len(bits))
            m[:usable] = bits[:usable].astype(bool)
            if isinstance(data, tuple) and data[0] == "nullsec":
                data = np.zeros(col.len, "i8")
            mask = m
            stack.append(data)
        elif name == "add":
            stack.append(stack.pop().astype("i8") + op[2])
        elif name == "delta":
            stack.append(np.cumsum(stack.pop().astype("i8")))
        elif name == "to_i64":
            stack.append(stack.pop().astype("i8"))
        elif name == "lz4":
            raw = stack.pop()
            blob = decompress_frame(raw.tobytes())
            want = op[2] * np.dtype(_ENC_NP[op[1]]).itemsize
            if len(blob) < want:
                raise ValueError(
                    f"column {col.name!r}: lz4 decoded {len(blob)} "
                    f"bytes, expected {want}")
            stack.append(np.frombuffer(blob[:want], _ENC_NP[op[1]]))
        elif name == "pco":
            raw = stack.pop()
            stack.append(_pco_decode_section(
                raw.tobytes(), op[1], op[2], op[3], col.name))
        elif name == "dict_lookup":
            dict_data = stack.pop()
            dict_indices = stack.pop()
            indices = stack.pop()
            blob = dict_data.tobytes()
            offs = (dict_indices >> np.uint64(24)).astype("i8")
            lens = (dict_indices & np.uint64(0xFFFFFF)).astype("i8")
            idx = indices.astype("i8")
            so = offs[idx].tolist()
            sl = lens[idx].tolist()
            stack.append([blob[o:o + ln].decode("utf-8")
                          for o, ln in zip(so, sl)])
        elif name == "unpack_strings":
            raw = stack.pop()
            stack.append([b.decode("utf-8") for b in _iter_packed(raw)])
        elif name == "unhexpack_strings":
            raw = stack.pop()
            enc = (bytes.hex(b).upper() if op[1] else bytes.hex(b)
                   for b in _iter_packed(raw))
            stack.append(list(enc))
        else:
            raise ValueError(f"unknown codec op {name}")
    if len(stack) != 1:
        raise ValueError(
            f"column {col.name!r}: codec left {len(stack)} values")
    values = stack[0]
    if isinstance(values, tuple) and values[0] == "nullsec":
        return ("allnull", values[1]), None
    # Pco sanity cross-check (the format has no checksum, and the
    # decoder is an offline spec reconstruction — a wrong layout
    # decision could map symbols to the wrong bins while every
    # structural invariant still passes). The column's persisted range
    # covers every STORED value incl. null fills (column_buffer.rs
    # IntColBuffer::push folds each pushed element into min/max before
    # finalize), and every codec op chain ends at the stored values,
    # so any decoded integer outside [min, max] proves a mis-decode.
    if (col.range is not None
            and any(op[0] == "pco" for op in col.codec)
            and isinstance(values, np.ndarray)
            and values.dtype.kind in "iu" and len(values)):
        lo, hi = int(values.min()), int(values.max())
        if lo < col.range[0] or hi > col.range[1]:
            raise PcoUnsupportedError(
                f"column {col.name!r}: pco-decoded values span "
                f"[{lo}, {hi}], outside the column's persisted range "
                f"{col.range} — the payload decoded structurally but "
                "the values are wrong (likely a pcodec layout "
                "mismatch); re-run with on_pco='null' to degrade")
    return values, mask


# ---------------------------------------------------------------------------
# directory reader
# ---------------------------------------------------------------------------

def sanitize_table_name(name: str) -> str:
    """storage.rs:523-540 sanitize_table_name."""
    out = name.lower()
    out = "".join(c for c in out
                  if c.isascii() and (c.isalnum() or c in "_-."))
    out = out.lstrip("-.")
    if len(out) > 189:
        out = out[:189]
    if out != name:
        digest = hashlib.sha256(name.encode("utf-8")).hexdigest()
        out = f"-{out}-{digest}"
    return out


def partition_filename(pid: int, key: str) -> str:
    return f"{pid:05d}_{key}.part"


class ReferenceDirReader:
    """Open a reference data directory and materialize its tables.

    Decode runs driver-side: a reference instance is single-node by
    construction, so its directory is at most one machine's data; the
    per-partition streaming decode keeps memory at one partition, and
    `restore_into` lands everything in Spark tables (parquet-backed)
    where the cluster takes over.
    """

    def __init__(self, root: str, on_pco: str = "error"):
        self.root = root
        self.on_pco = on_pco
        meta_path = os.path.join(root, "meta")
        if os.path.exists(meta_path):
            with open(meta_path, "rb") as fh:
                self.meta = parse_dbmeta(fh.read())
        else:
            self.meta = RefMeta()

    def tables(self) -> list[str]:
        return self.meta.tables()

    def wal_files(self, unflushed_only: bool = True) -> list[str]:
        wal_dir = os.path.join(self.root, "wal")
        if not os.path.isdir(wal_dir):
            return []
        out = []
        for f in os.listdir(wal_dir):
            m = re.fullmatch(r"(\d+)\.wal", f)
            if not m:
                continue
            if unflushed_only and int(m.group(1)) < self.meta.next_wal_id:
                continue  # already flushed into partitions
            out.append(os.path.join(wal_dir, f))
        return sorted(
            out, key=lambda p: int(os.path.basename(p).split(".")[0]))

    def _partition_columns(self, table: str, part: RefPartition):
        tdir = os.path.join(self.root, "tables",
                            sanitize_table_name(table))
        cols: dict[str, RefColumn] = {}
        for sp in part.subpartitions:
            path = os.path.join(tdir, partition_filename(part.id, sp.key))
            with open(path, "rb") as fh:
                for c in parse_partition_segment(fh.read()):
                    cols[c.name] = c
        return cols

    def read_table(self, table: str):
        """Materialize one table as a pyarrow Table (row order =
        partition offsets, i.e. reference insertion order)."""
        import pyarrow as pa

        batches = []
        all_names: list[str] = []
        for part in self.meta.for_table(table):
            cols = self._partition_columns(table, part)
            arrays = {}
            for name, col in cols.items():
                values, mask = materialize_column(col, self.on_pco)
                arrays[name] = _to_arrow(values, mask, part.len)
                if name not in all_names:
                    all_names.append(name)
            batches.append((part.len, arrays))
        fields = {}
        for _, arrays in batches:
            for name, arr in arrays.items():
                prev = fields.get(name)
                fields[name] = _promote(prev, arr.type)
        tables = []
        for nrows, arrays in batches:
            cols_out = []
            for name in all_names:
                arr = arrays.get(name)
                typ = fields[name]
                if arr is None:
                    arr = pa.nulls(nrows, typ)
                elif arr.type != typ:
                    arr = arr.cast(typ)
                cols_out.append(arr)
            tables.append(
                pa.table(dict(zip(all_names, cols_out))))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    def _work_df(self, spark, table: str):
        import pandas as pd

        tdir = os.path.join(self.root, "tables",
                            sanitize_table_name(table))
        work = []
        for part in self.meta.for_table(table):
            paths = [os.path.join(
                tdir, partition_filename(part.id, sp.key))
                for sp in part.subpartitions]
            work.append((part.offset, part.len, "\x00".join(paths)))
        wdf = spark.createDataFrame(
            pd.DataFrame(work, columns=["offset", "len", "paths"]),
            schema="offset long, len long, paths string")
        # one decode task per reference partition
        return wdf.repartition(max(len(work), 1)), len(work)

    def read_table_df(self, spark, table: str):
        """Distributed variant of :meth:`read_table`: partition
        segments decode on the EXECUTORS via mapInPandas, one task per
        reference partition, so a multi-hundred-GB directory on a
        shared filesystem migrates at cluster parallelism instead of
        through the driver.

        The format has no footer, so the unified schema comes from a
        distributed pre-scan pass (parse names + type kinds per
        segment, tiny result collected to the driver) followed by the
        decode pass casting every partition to the promoted schema
        with NULL fill for absent columns. Two reads of the data, both
        cluster-parallel; the driver never holds more than the name
        list. Row order is reconstructed from partition offsets
        (`_ref_offset` sort), matching :meth:`read_table`.
        """
        from pyspark.sql.types import (DoubleType, LongType,
                                       StringType, StructField,
                                       StructType)

        workdf, nparts = self._work_df(spark, table)
        if nparts == 0:
            return spark.createDataFrame([], "x int").drop("x")

        def scan(iterator):
            import pandas as pd

            for pdf in iterator:
                rows = []
                for paths in pdf["paths"]:
                    for path in paths.split("\x00"):
                        with open(path, "rb") as fh:
                            for c in parse_partition_segment(fh.read()):
                                rows.append((c.name, _column_kind(c)))
                yield pd.DataFrame(rows, columns=["name", "kind"])

        scanned = (workdf.mapInPandas(scan, "name string, kind string")
                   .collect())
        col_types: dict[str, str] = {}
        order: list[str] = []
        for row in scanned:
            col_types[row.name] = _promote_kind(
                col_types.get(row.name), row.kind)
            if row.name not in order:
                order.append(row.name)
        order.sort()  # deterministic regardless of scan task order

        spark_types = {"str": StringType(), "float": DoubleType(),
                       "int": LongType()}
        fields = [StructField("_ref_offset", LongType(), False)]
        fields += [StructField(n, spark_types[col_types[n]], True)
                   for n in order]
        schema = StructType(fields)
        on_pco = self.on_pco
        names = list(order)
        types = dict(col_types)

        def decode(iterator):
            import pandas as pd

            for pdf in iterator:
                for offset, length, paths in zip(
                        pdf["offset"], pdf["len"], pdf["paths"]):
                    cols: dict[str, RefColumn] = {}
                    for path in paths.split("\x00"):
                        with open(path, "rb") as fh:
                            for c in parse_partition_segment(fh.read()):
                                cols[c.name] = c
                    n = int(length)
                    out = {"_ref_offset": np.arange(n) + int(offset)}
                    for name in names:
                        col = cols.get(name)
                        if col is None:
                            out[name] = pd.Series([None] * n,
                                                  dtype=object)
                            continue
                        values, mask = materialize_column(col, on_pco)
                        out[name] = _to_pandas_col(
                            values, mask, n, types[name])
                    yield pd.DataFrame(out)

        return (workdf.mapInPandas(decode, schema)
                .orderBy("_ref_offset").drop("_ref_offset"))

    def restore_into(self, db, include_wal: bool = True) -> dict[str, int]:
        """Load every table (flushed partitions + optionally the
        unflushed WAL tail) into a LocustDB engine. Returns rows per
        table. Tables decode through the distributed path
        (:meth:`read_table_df`) so the driver never materializes a
        table — segment bytes flow executor-side straight into the
        engine's parquet append."""
        counts: dict[str, int] = {}
        for table in self.tables():
            # row count comes from the metastore (sum of partition
            # lens) so the distributed decode runs exactly ONCE — a
            # df.count() here would re-execute the whole segment
            # decode before the ingest did it again
            n = sum(p.len for p in self.meta.for_table(table))
            if n:
                db.ingest_df(table, self.read_table_df(db.spark, table))
                counts[table] = counts.get(table, 0) + n
        if include_wal:
            for path in self.wal_files(unflushed_only=True):
                n = db.ingest_wal_segment(path)
                counts["<wal>"] = counts.get("<wal>", 0) + n
        return counts


def _column_kind(col: RefColumn) -> str:
    """Decoded type family without materializing: strings if any
    string-producing op is in the codec; float if the value section
    is f64; int otherwise (null-only columns report int and surface
    as all-NULL)."""
    for op in col.codec:
        if op[0] in ("dict_lookup", "unpack_strings",
                     "unhexpack_strings"):
            return "str"
    for op in col.codec:
        if op[0] in ("lz4", "pco") and op[1] == "f64":
            return "float"
    if col.sections and col.sections[0][0] == "f64":
        return "float"
    return "int"


def _promote_kind(prev: str | None, new: str) -> str:
    if prev is None or prev == new:
        return new
    if {prev, new} == {"int", "float"}:
        return "float"
    return "str"


def _to_pandas_col(values, mask, nrows: int, kind: str):
    """Shape one materialized column for a mapInPandas output frame
    under the promoted `kind` (Arrow casts the rest)."""
    import pandas as pd

    if isinstance(values, tuple) and values[0] == "allnull":
        return pd.Series([None] * nrows, dtype=object)
    if kind == "str":
        vals = [v if isinstance(v, str) else str(v)
                for v in (values if isinstance(values, list)
                          else np.asarray(values).tolist())]
        if mask is not None:
            vals = [v if m else None
                    for v, m in zip(vals, mask.tolist())]
        return pd.Series(vals, dtype=object)
    arr = np.asarray(values).astype("f8" if kind == "float" else "i8")
    if mask is None:
        return pd.Series(arr)
    out = pd.Series(arr.astype(object))
    out[~mask] = None
    return out


def _to_arrow(values, mask, nrows: int):
    import pyarrow as pa

    if isinstance(values, tuple) and values[0] == "allnull":
        return pa.nulls(nrows)
    if isinstance(values, list):  # strings
        if mask is not None:
            vals = [v if m else None
                    for v, m in zip(values, mask.tolist())]
            return pa.array(vals, pa.string())
        return pa.array(values, pa.string())
    arr = np.asarray(values)
    if arr.dtype.kind == "f":
        typ = pa.float64()
        arr = arr.astype("f8")
    else:
        typ = pa.int64()
        arr = arr.astype("i8")
    if mask is not None:
        return pa.array(arr, typ, mask=~mask)
    return pa.array(arr, typ)


def _promote(prev, new):
    import pyarrow as pa

    if prev is None or prev == new:
        return new
    if pa.types.is_null(prev):
        return new
    if pa.types.is_null(new):
        return prev
    numeric = {pa.int64(), pa.float64()}
    if prev in numeric and new in numeric:
        return pa.float64()
    return pa.string()


# ---------------------------------------------------------------------------
# directory writer (migration OUT: export Spark tables into the
# reference's on-disk format, also the reader's round-trip fixture)
# ---------------------------------------------------------------------------

def _pack_strings(strings: list[str | None]) -> bytes:
    out = bytearray()
    for s in strings:
        b = (s or "").encode("utf-8")
        ln = len(b)
        while ln > 254:
            out.append(255)
            ln -= 255
        out.append(ln)
        out += b
    return bytes(out)


def _bitvec(mask: np.ndarray) -> np.ndarray:
    return np.packbits(mask.astype("u1"), bitorder="little")


def build_column(name: str, values, try_lz4: bool = True,
                 try_pco: bool = False) -> RefColumn:
    """Encode one column the way the reference's flush does for the
    common shapes: i64/f64 sections, packed strings, optional present
    bitvec (PushDataSection+Nullable), and the trial compression of
    section 0 (column.rs lz4_or_pco_encode:116-126): lz4 wins when its
    ratio beats pco's and 0.9, else pco wins below 0.9. Pco payload
    types mirror column.rs pco_encode:316-380 — u8 widens to pco-u32,
    f64 narrows to pco-f32 when every value survives the f32 round
    trip (NaNs don't, matching the reference's == test).

    ``try_pco`` defaults to OFF on this writer path: the pco encoder
    (sources/pco.py) is a spec reconstruction whose bytes have not
    been conformance-tested against the real pcodec crate, and a real
    reference binary pco-decodes with .unwrap() (column.rs) — a wrong
    byte would panic it with no degrade path. lz4 IS
    conformance-proven, so compat-mode output (lz4-only) is guaranteed
    readable by the real engine. Opt in with try_pco=True once crate
    golden fixtures validate the encoder (see docs/PCO_NOTES)."""
    import pandas as pd

    s = pd.Series(values)
    n = len(s)
    mask = ~s.isna().to_numpy()
    has_null = not mask.all()
    codec: list[tuple] = []
    sections: list[tuple] = []
    rng = None
    if n == 0 or (~mask).all():
        return RefColumn(name, n, None, [], [("null", n)])
    non_null = s.dropna()
    is_str = any(isinstance(v, str) for v in non_null)
    is_int = (not is_str) and (
        pd.api.types.is_integer_dtype(s.dtype)
        or all(isinstance(v, (int, np.integer)) for v in non_null))
    if is_str:
        packed = np.frombuffer(
            _pack_strings([None if not m else str(v)
                           for v, m in zip(s.tolist(), mask.tolist())]),
            "u1")
        sections.append(("u8", packed))
        codec.append(("unpack_strings",))
        if has_null:
            sections.append(("bitvec", _bitvec(mask)))
            codec.append(("push_section", 1))
            codec.append(("nullable",))
    else:
        if is_int:
            filled = s.fillna(0).to_numpy().astype("i8")
            sections.append(("i64", filled))
            rng = (int(filled.min()), int(filled.max()))
        else:
            filled = s.fillna(0.0).to_numpy().astype("f8")
            sections.append(("f64", filled))
        if has_null:
            sections.append(("bitvec", _bitvec(mask)))
            codec.append(("push_section", 1))
            codec.append(("nullable",))
    if try_lz4 or try_pco:
        kind, payload = sections[0]
        if kind != "null":
            raw = payload.tobytes()
            count = (len(payload) if kind in ("u8", "bitvec")
                     else payload.size)
            enc = {"uint8": "u8", "uint16": "u16", "uint32": "u32",
                   "uint64": "u64", "int64": "i64",
                   "float64": "f64"}[payload.dtype.name]
            comp = compress_frame(raw) if try_lz4 else None
            lz4_ratio = len(comp) / len(raw) if comp else float("inf")
            pco_blob, pco_fp32, pco_ratio = None, False, float("inf")
            if try_pco and count:
                from . import pco as _pco

                arr = np.asarray(payload)
                if enc in ("u8", "u16", "u32"):
                    pvals, pdt = arr.astype("u8").tolist(), "u32"
                elif enc == "u64":
                    pvals, pdt = arr.tolist(), "u64"
                elif enc == "i64":
                    pvals, pdt = arr.tolist(), "i64"
                else:  # f64: narrow when lossless (== fails on NaN,
                    # matching column.rs:349)
                    narrowed = arr.astype("f4").astype("f8")
                    if bool(np.all(narrowed == arr)):
                        pvals, pdt, pco_fp32 = \
                            arr.astype("f4").tolist(), "f32", True
                    else:
                        pvals, pdt = arr.tolist(), "f64"
                pco_blob = _pco.simpler_compress(pvals, pdt)
                pco_ratio = len(pco_blob) / len(raw)
            if comp is not None and lz4_ratio < pco_ratio \
                    and lz4_ratio < 0.9:
                sections[0] = ("lz4", {
                    "decoded_bytes": len(raw),
                    "bytes_per_element": payload.dtype.itemsize,
                    "data": comp,
                })
                codec.insert(0, ("lz4", enc, count))
            elif pco_blob is not None and pco_ratio < 0.9:
                sections[0] = ("pco", {
                    "decoded_bytes": len(raw),
                    "bytes_per_element": payload.dtype.itemsize,
                    "is_fp32": pco_fp32,
                    "data": pco_blob,
                })
                codec.insert(0, ("pco", enc, count, pco_fp32))
    return RefColumn(name, n, rng, codec, sections)


_ENC_IDX = {e: i for i, e in enumerate(_ENC)}


def serialize_partition_segment(cols: list[RefColumn]) -> bytes:
    b = _Builder()
    root = b.alloc(1)
    b.struct_ptr(0, root, 0, 1)
    elem = b.init_composite(root, len(cols), 2, 4)
    for i, col in enumerate(cols):
        w = elem + i * 6
        b.put_u64(w, col.len)
        if col.range is None:
            b.put_u16(w + 1, 0, 1)  # union: empty
        else:
            b.put_u16(w + 1, 0, 0)
            rw = b.alloc(2)
            b.struct_ptr(w + 3, rw, 2, 0)
            b.put_i64(rw, col.range[0])
            b.put_i64(rw + 1, col.range[1])
        b.write_text(w + 2, col.name)
        ops = b.init_composite(w + 4, len(col.codec), 2, 1)
        for j, op in enumerate(col.codec):
            ow = ops + j * 3
            kind = op[0]
            if kind == "add":
                b.put_u16(ow, 0, 0)
                aw = b.alloc(2)
                b.struct_ptr(ow + 2, aw, 2, 0)
                b.put_u16(aw, 0, _ENC_IDX[op[1]])
                b.put_i64(aw + 1, op[2])
            elif kind == "delta":
                b.put_u16(ow, 0, 1)
                b.put_u16(ow, 2, _ENC_IDX["i64"])
            elif kind == "to_i64":
                b.put_u16(ow, 0, 2)
                b.put_u16(ow, 2, _ENC_IDX["i64"])
            elif kind == "push_section":
                b.put_u16(ow, 0, 3)
                b.put_u64(ow + 1, op[1])
            elif kind == "dict_lookup":
                b.put_u16(ow, 0, 4)
                b.put_u16(ow, 2, _ENC_IDX["u32"])
            elif kind == "lz4":
                b.put_u16(ow, 0, 5)
                lw = b.alloc(2)
                b.struct_ptr(ow + 2, lw, 2, 0)
                b.put_u16(lw, 0, _ENC_IDX[op[1]])
                b.put_u64(lw + 1, op[2])
            elif kind == "unpack_strings":
                b.put_u16(ow, 0, 6)
            elif kind == "unhexpack_strings":
                b.put_u16(ow, 0, 7)
                uw = b.alloc(2)
                b.struct_ptr(ow + 2, uw, 2, 0)
                b.buf[8 * uw] |= 1 if op[1] else 0
                b.put_u64(uw + 1, op[2])
            elif kind == "nullable":
                b.put_u16(ow, 0, 8)
            elif kind == "pco":
                b.put_u16(ow, 0, 9)
                pw = b.alloc(2)
                b.struct_ptr(ow + 2, pw, 2, 0)
                b.put_u16(pw, 0, _ENC_IDX[op[1]])
                if op[3]:
                    b.buf[8 * pw + 2] |= 1
                b.put_u64(pw + 1, op[2])
            else:
                raise ValueError(f"cannot serialize codec op {kind}")
        secs = b.init_composite(w + 5, len(col.sections), 3, 1)
        for j, (kind, payload) in enumerate(col.sections):
            sw = secs + j * 4
            if kind in ("u8", "bitvec"):
                b.put_u16(sw, 0, 0 if kind == "u8" else 7)
                raw = np.asarray(payload, "u1").tobytes()
                target = b.alloc((len(raw) + 7) // 8)
                b.buf[8 * target:8 * target + len(raw)] = raw
                b.list_ptr(sw + 3, target, 2, len(raw))
            elif kind in ("u16", "u32"):
                code = 3 if kind == "u16" else 4
                b.put_u16(sw, 0, 1 if kind == "u16" else 2)
                arr = np.asarray(payload)
                raw = arr.astype("<u2" if kind == "u16" else "<u4") \
                    .tobytes()
                target = b.alloc((len(raw) + 7) // 8)
                b.buf[8 * target:8 * target + len(raw)] = raw
                b.list_ptr(sw + 3, target, code, arr.size)
            elif kind in ("u64", "i64", "f64"):
                arr = np.asarray(payload)
                fmt = {"u64": "<u8", "i64": "<i8", "f64": "<f8"}[kind]
                raw = arr.astype(fmt).tobytes()
                target = b.alloc((len(raw) + 7) // 8)
                b.buf[8 * target:8 * target + len(raw)] = raw
                b.list_ptr(sw + 3, target, 5, arr.size)
                b.put_u16(sw, 0, {"u64": 3, "i64": 4, "f64": 6}[kind])
            elif kind == "null":
                b.put_u16(sw, 0, 5)
                b.put_u64(sw + 1, payload)
            elif kind == "lz4":
                b.put_u16(sw, 0, 8)
                b.put_u64(sw + 1, payload["decoded_bytes"])
                b.put_u64(sw + 2, payload["bytes_per_element"])
                raw = payload["data"]
                target = b.alloc((len(raw) + 7) // 8)
                b.buf[8 * target:8 * target + len(raw)] = raw
                b.list_ptr(sw + 3, target, 2, len(raw))
            elif kind == "pco":
                b.put_u16(sw, 0, 9)
                b.put_u64(sw + 1, payload["decoded_bytes"])
                b.put_u64(sw + 2, payload["bytes_per_element"])
                if payload["is_fp32"]:
                    b.buf[8 * sw + 2] |= 1
                raw = payload["data"]
                target = b.alloc((len(raw) + 7) // 8)
                b.buf[8 * target:8 * target + len(raw)] = raw
                b.list_ptr(sw + 3, target, 2, len(raw))
            else:
                raise ValueError(f"cannot serialize section {kind}")
    return pack(b.message())


def write_reference_dir(root: str, tables: dict[str, "object"],
                        rows_per_partition: int = 1 << 20,
                        pco: bool = False) -> None:
    """Write pandas DataFrames as a reference data directory (meta +
    partition segments, empty wal/). The output opens in both this
    reader and a reference instance. A table value may be a callable
    returning the frame (lazy supplier — one table in memory at a
    time).

    ``pco=False`` (default, compat mode) restricts the per-section
    trial compression to lz4, whose bytes are conformance-proven
    against the reference — exported directories are guaranteed
    readable by the real engine even if the offline pco spec
    reconstruction has a wrong layout decision. ``pco=True`` enables
    the pco trial (better ratios on smooth numeric data; only use
    once crate fixtures have validated sources/pco.py)."""
    os.makedirs(os.path.join(root, "wal"), exist_ok=True)
    meta = RefMeta(next_wal_id=0)
    pid = 0
    for table, df in tables.items():
        if callable(df):
            df = df()
        tdir = os.path.join(root, "tables", sanitize_table_name(table))
        os.makedirs(tdir, exist_ok=True)
        offset = 0
        n = len(df)
        for start in range(0, max(n, 1), rows_per_partition):
            chunk = df.iloc[start:start + rows_per_partition]
            cols = [build_column(name, chunk[name], try_pco=pco)
                    for name in sorted(chunk.columns)]
            blob = wrap_blob(serialize_partition_segment(cols))
            key = "all"
            with open(os.path.join(
                    tdir, partition_filename(pid, key)), "wb") as fh:
                fh.write(blob)
            meta.partitions.append(RefPartition(
                id=pid, table=table, offset=offset, len=len(chunk),
                subpartitions=[RefSubpartition(
                    size_bytes=len(blob), key=key,
                    last_column=max(chunk.columns) if len(
                        chunk.columns) else "")],
            ))
            pid += 1
            offset += len(chunk)
    with open(os.path.join(root, "meta"), "wb") as fh:
        fh.write(wrap_blob(serialize_dbmeta(meta)))
