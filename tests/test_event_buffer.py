"""Cap'n Proto EventBuffer wire format
(locustdb_spark/sources/event_buffer.py) — the reference's binary
/insert_bin payload (locustdb-serialization/src/event_buffer.rs:92-221,
schema schemas/wal_segment.capnp). Pure-Python codec, no Spark needed
for most tests."""

import struct

import pytest

from locustdb_spark.sources.event_buffer import (
    ColumnData, EventBuffer, TableBuffer, _frame, _pack_py, _Reader,
    _unframe, _unpack_py, pack, unpack)

# ---------------------------------------------------------------------------
# packed codec
# ---------------------------------------------------------------------------


def test_pack_matches_spec_example():
    """The worked example from the public encoding spec
    (capnproto.org/encoding.html#packing) must reproduce byte-for-byte
    — from BOTH encoders (no special tags involved)."""
    unpacked = bytes.fromhex("0800000003000200" "19000000aa010000")
    packed = bytes.fromhex("51080302" "3119aa01")
    assert pack(unpacked) == packed
    assert _pack_py(unpacked) == packed
    assert unpack(packed) == unpacked
    assert _unpack_py(packed) == unpacked


def test_pack_zero_run_and_literal_run():
    # reference encoder: two all-zero words -> tag 0x00 + count 1
    assert _pack_py(b"\x00" * 16) == bytes([0x00, 0x01])
    assert unpack(bytes([0x00, 0x01])) == b"\x00" * 16
    # reference encoder: two dense words -> 0xff + word + count 1 + word
    dense = bytes([0x8A] * 16)
    packed = _pack_py(dense)
    assert packed == bytes([0xFF]) + b"\x8a" * 8 + bytes([0x01]) + b"\x8a" * 8
    assert unpack(packed) == dense
    # vectorized encoder: zero-count blocks, still valid and invertible
    assert pack(b"\x00" * 16) == bytes([0x00, 0x00, 0x00, 0x00])
    assert unpack(pack(b"\x00" * 16)) == b"\x00" * 16
    assert pack(dense) == (bytes([0xFF]) + b"\x8a" * 8 + bytes([0x00])) * 2
    assert unpack(pack(dense)) == dense
    assert _unpack_py(pack(dense)) == dense


def test_pack_roundtrip_random_words():
    import random

    rng = random.Random(42)
    for _ in range(50):
        nwords = rng.randrange(0, 40)
        data = bytearray()
        for _ in range(nwords):
            kind = rng.randrange(3)
            if kind == 0:
                data += b"\x00" * 8
            elif kind == 1:
                data += bytes(rng.randrange(256) for _ in range(8))
            else:
                w = bytearray(8)
                for b in rng.sample(range(8), rng.randrange(1, 4)):
                    w[b] = rng.randrange(1, 256)
                data += w
        assert unpack(pack(bytes(data))) == bytes(data)


def test_unpack_rejects_truncation():
    with pytest.raises(ValueError):
        unpack(bytes([0x00]))  # zero tag without run count
    with pytest.raises(ValueError):
        unpack(bytes([0xFF, 1, 2, 3]))  # literal word cut short
    with pytest.raises(ValueError):
        unpack(bytes([0x51, 0x08]))  # 3 flagged bytes, 1 present


# ---------------------------------------------------------------------------
# golden wire layout: the full message for a minimal buffer, derived by
# hand from the public encoding spec + the generated reference layouts
# (wal_segment_capnp.rs struct sizes / field offsets)
# ---------------------------------------------------------------------------


def test_serialize_golden_single_i64_column():
    buf = EventBuffer(tables={
        "t": TableBuffer(len=2, columns={"a": ColumnData("i64", [1, 2])}),
    })
    words = [
        0x0001000000000000,  # root: struct ptr, off 0, data 0, ptrs 1
        0x0000001F00000001,  # data: composite list, 3 words
        0x0002000100000004,  # tag: 1 elem, TableSegment {1, 2}
        2,                   # TableSegment.len
        0x0000001200000005,  # name ptr -> "t\0" (byte list, count 2)
        0x0000002700000005,  # columns ptr: composite, 4 words
        0x0000000000000074,  # "t\0" padded
        0x0003000100000004,  # tag: 1 elem, Column {1, 3}
        2,                   # union discriminant: i64
        0x0000001200000009,  # column name ptr -> "a\0"
        0x0000001500000009,  # i64 list ptr, size code 5, count 2
        0,                   # unused ptr slot 2
        0x0000000000000061,  # "a\0" padded
        1, 2,                # the values
    ]
    seg = b"".join(struct.pack("<Q", w) for w in words)
    expected = struct.pack("<II", 0, len(words)) + seg
    assert unpack(buf.serialize()) == expected
    # and it reads back
    rt = EventBuffer.deserialize(buf.serialize())
    assert rt.tables["t"].len == 2
    assert rt.tables["t"].columns["a"] == ColumnData("i64", [1, 2])


# ---------------------------------------------------------------------------
# round trips over every column kind
# ---------------------------------------------------------------------------


def _roundtrip(buf: EventBuffer) -> EventBuffer:
    return EventBuffer.deserialize(buf.serialize())


def test_roundtrip_all_column_kinds():
    buf = EventBuffer(tables={
        "events": TableBuffer(len=4, columns={
            "dense_f": ColumnData("f64", [0.5, -1.25, 3.5, 0.0]),
            "dense_i": ColumnData("i64", [1, -2, 3, 2**62]),
            "strs": ColumnData("string", ["a", "", "naïve", "d"]),
            "sparse_f": ColumnData("sparse_f64", [9.5, 8.25], [1, 3]),
            "sparse_i": ColumnData("sparse_i64", [-7, 7], [0, 2]),
            "mixed": ColumnData("mixed", [1, 2.5, "x", None]),
            "nothing": ColumnData("empty"),
        }),
        "other": TableBuffer(len=1, columns={
            "v": ColumnData("f64", [42.0]),
        }),
    })
    rt = _roundtrip(buf)
    assert rt == buf


def test_roundtrip_empty_buffer_and_empty_lists():
    assert _roundtrip(EventBuffer()) == EventBuffer()
    buf = EventBuffer(tables={
        "t": TableBuffer(len=0, columns={
            "a": ColumnData("i64", []),
            "s": ColumnData("string", []),
        }),
    })
    assert _roundtrip(buf) == buf


def test_roundtrip_large_buffer():
    n = 5000
    buf = EventBuffer(tables={
        "big": TableBuffer(len=n, columns={
            "x": ColumnData("f64", [i / 7 for i in range(n)]),
            "y": ColumnData("i64", list(range(n))),
            "s": ColumnData("string", [f"row{i}" for i in range(n)]),
        }),
    })
    assert _roundtrip(buf) == buf


def test_reader_follows_far_pointers():
    """The Rust builder splits big messages into several segments with
    far pointers at the boundaries; our reader must follow them. Build
    a two-segment message by hand: segment 0 holds only a far pointer
    whose landing pad (segment 1, word 0) is the real root pointer."""
    inner = EventBuffer(tables={
        "t": TableBuffer(len=1, columns={"a": ColumnData("i64", [5])}),
    })
    single = _unframe(unpack(inner.serialize()))[0]
    # segment 1 = the original segment (its word 0 is already a struct
    # pointer relative to its own position — a valid landing pad)
    far = 2 | (0 << 3) | (1 << 32)  # single-far, pad word 0, segment 1
    msg = _frame([struct.pack("<Q", far), single])
    r = _Reader(_unframe(msg))
    kind, seg, target, dw, pw = r.resolve(0, 0)
    assert (kind, seg, dw, pw) == ("struct", 1, 0, 1)
    rt = EventBuffer.deserialize(pack(msg))
    assert rt == inner


def test_reader_rejects_out_of_bounds_pointer():
    # a root struct pointer pointing past the end of the segment
    bogus = _frame([struct.pack("<Q", ((100 & 0x3FFFFFFF) << 2)
                                | (1 << 32))])
    with pytest.raises((ValueError, IndexError)):
        EventBuffer.deserialize(pack(bogus))


# ---------------------------------------------------------------------------
# ColumnBuffer::push promotion semantics (event_buffer.rs:131-209)
# ---------------------------------------------------------------------------


def test_push_dense_then_gap_goes_sparse():
    col = ColumnData()
    col.push(1.0, 0)
    col.push(2.0, 1)
    col.push(3.0, 4)  # rows 2-3 missed
    assert col.kind == "sparse_f64"
    assert col.indices == [0, 1, 4]
    assert col.values == [1.0, 2.0, 3.0]
    assert col.dense(5) == [1.0, 2.0, None, None, 3.0]


def test_push_i64_promotes_to_f64_on_float():
    col = ColumnData()
    col.push(1, 0)
    col.push(2, 1)
    col.push(2.5, 2)
    assert col.kind == "f64"
    assert col.values == [1.0, 2.0, 2.5]


def test_push_sparse_i64_promotes_to_sparse_f64():
    col = ColumnData()
    col.push(1, 1)  # first value at row 1 -> sparse from the start
    assert col.kind == "sparse_i64"
    col.push(0.5, 3)
    assert col.kind == "sparse_f64"
    assert col.indices == [1, 3]
    assert col.values == [1.0, 0.5]


def test_push_int_into_f64_column_coerces():
    col = ColumnData()
    col.push(0.5, 0)
    col.push(2, 1)
    assert col.kind == "f64"
    assert col.values == [0.5, 2.0]


def test_push_string_gap_raises():
    col = ColumnData()
    with pytest.raises(ValueError):
        col.push("late", 3)
    col2 = ColumnData()
    col2.push("a", 0)
    with pytest.raises(ValueError):
        col2.push("c", 2)


def test_table_buffer_push_row_and_to_rows():
    t = TableBuffer()
    t.push_row({"a": 1, "b": "x"})
    t.push_row({"a": 2, "c": 0.5})
    buf = EventBuffer(tables={"t": t})
    rows = _roundtrip(buf).to_rows()["t"]
    assert rows == [
        {"a": 1, "b": "x", "c": None},
        {"a": 2, "b": None, "c": 0.5},
    ]


# ---------------------------------------------------------------------------
# property tests: arbitrary buffers round-trip; arbitrary words pack/unpack
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:
    _name = st.text(
        alphabet=st.characters(whitelist_categories=("L", "N")),
        min_size=1, max_size=12)
    _f64 = st.floats(allow_nan=False, width=64)
    _i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    def _column(draw):
        kind = draw(st.sampled_from(
            ["empty", "f64", "i64", "string", "sparse_f64",
             "sparse_i64", "mixed"]))
        if kind == "empty":
            return ColumnData("empty")
        n = draw(st.integers(min_value=0, max_value=8))
        if kind == "f64":
            return ColumnData("f64", draw(
                st.lists(_f64, min_size=n, max_size=n)))
        if kind == "i64":
            return ColumnData("i64", draw(
                st.lists(_i64, min_size=n, max_size=n)))
        if kind == "string":
            return ColumnData("string", draw(
                st.lists(st.text(max_size=20), min_size=n, max_size=n)))
        if kind == "mixed":
            return ColumnData("mixed", draw(st.lists(
                st.one_of(st.none(), _i64, _f64, st.text(max_size=10)),
                min_size=n, max_size=n)))
        idx = sorted(draw(st.sets(
            st.integers(min_value=0, max_value=63),
            min_size=n, max_size=n)))
        vals = draw(st.lists(
            _f64 if kind == "sparse_f64" else _i64,
            min_size=len(idx), max_size=len(idx)))
        return ColumnData(kind, vals, list(idx))

    @st.composite
    def _buffers(draw):
        tables = {}
        for tname in draw(st.lists(_name, max_size=3, unique=True)):
            cols = {}
            for cname in draw(st.lists(_name, max_size=4, unique=True)):
                cols[cname] = _column(draw)
            tables[tname] = TableBuffer(
                len=draw(st.integers(min_value=0, max_value=64)),
                columns=cols)
        return EventBuffer(tables=tables)

    @settings(max_examples=60, deadline=None)
    @given(_buffers())
    def test_property_event_buffer_roundtrip(buf):
        assert EventBuffer.deserialize(buf.serialize()) == buf

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=400).map(
        lambda b: b + b"\x00" * ((8 - len(b) % 8) % 8)))
    def test_property_pack_unpack_roundtrip(data):
        # both encoders invert under both decoders (the vectorized and
        # the reference implementations must be interchangeable)
        for enc in (pack, _pack_py):
            blob = enc(data)
            assert unpack(blob) == data
            assert _unpack_py(blob) == data


def test_wal_segment_roundtrip():
    """WalSegment (the reference's on-disk WAL file format,
    wal_segment.rs:12-35): id + EventBuffer round-trip."""
    from locustdb_spark.sources.event_buffer import WalSegment

    buf = EventBuffer(tables={
        "t": TableBuffer(len=3, columns={
            "a": ColumnData("i64", [1, 2, 3]),
            "s": ColumnData("string", ["x", "y", "z"]),
        }),
    })
    seg = WalSegment(id=42, data=buf)
    rt = WalSegment.deserialize(seg.serialize())
    assert rt.id == 42 and rt.data == buf
    assert WalSegment.deserialize(WalSegment().serialize()) == WalSegment()
