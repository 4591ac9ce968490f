"""Reference persisted-data-directory reader/writer.

Formats under test (all public): the checksummed blob wrapper
(reference src/disk_store/file_writer.rs:27-100), DBMeta and
PartitionSegment packed capnp (locustdb-serialization/schemas/
{dbmeta,partition_segment}.capnp), the codec-op stack machine
(src/mem_store/codec.rs:145-208) and its operators (delta_decode.rs,
dict_lookup.rs, unpack_strings.rs, unhexpack_strings.rs, bitvec.rs),
and LZ4 block+frame (lz4.org spec; mem_store/lz4.rs uses frames,
meta_store.rs uses size-prepended blocks).

The writer is the fixture source: it emits the same codec shapes the
reference's flush produces, so reader tests double as wire-parity
round trips. Codec stacks the writer does NOT emit (dict lookup,
delta, add, to_i64, unhexpack — integers.rs:102-112, strings.rs:
120-138) are hand-built RefColumns pinning the interpreter alone.
"""

import hashlib
import struct

import numpy as np
import pandas as pd
import pytest

from locustdb_spark.sources.lz4 import (
    compress_block, compress_frame, decompress_block,
    decompress_frame, decompress_size_prepended, xxh32)
from locustdb_spark.sources.refdir import (
    PcoUnsupportedError, RefColumn, RefMeta, RefPartition,
    RefSubpartition, ReferenceDirReader, build_column,
    materialize_column, parse_dbmeta, parse_partition_segment,
    sanitize_table_name, serialize_dbmeta,
    serialize_partition_segment, unwrap_blob, wrap_blob,
    write_reference_dir)


# ---------------------------------------------------------------- lz4

def test_xxh32_known_vectors():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


def test_lz4_block_golden_bytes():
    """Hand-assembled block per the public spec: 4 literals 'abcd',
    match offset 4 len 8 (overlapping x2 replication), closing
    literals 'XYZWV'."""
    blk = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) \
        + bytes([0x50]) + b"XYZWV"
    assert bytes(decompress_block(blk)) == b"abcd" + b"abcd" * 2 + b"XYZWV"


def test_lz4_roundtrips():
    import random

    random.seed(3)
    cases = [b"", b"q", b"the quick brown fox " * 200,
             bytes(random.randbytes(50_000)),
             bytes(random.choices(b"xyz", k=9_000))]
    for d in cases:
        assert bytes(decompress_block(compress_block(d))) == d
        assert decompress_frame(compress_frame(d)) == d
        assert decompress_size_prepended(
            struct.pack("<I", len(d)) + compress_block(d)) == d


def test_lz4_frame_header_variants():
    """Decoder must handle content-size and checksum flags (parse
    past, not verify)."""
    payload = b"hello world " * 100
    comp = compress_block(payload)
    # FLG: version 01 + B.Indep + B.Checksum + C.Size + C.Checksum
    flg = 0x40 | 0x20 | 0x10 | 0x08 | 0x04
    header = bytes([flg, 0x40]) + struct.pack("<Q", len(payload))
    hc = (xxh32(header) >> 8) & 0xFF
    frame = (struct.pack("<I", 0x184D2204) + header + bytes([hc])
             + struct.pack("<I", len(comp)) + comp
             + b"\x00\x00\x00\x00"          # block checksum (skipped)
             + struct.pack("<I", 0)          # end mark
             + b"\x00\x00\x00\x00")          # content checksum
    assert decompress_frame(frame) == payload


# ----------------------------------------------------------- wrapper

def test_blob_wrapper_roundtrip_and_tamper():
    payload = b"some payload bytes"
    blob = wrap_blob(payload)
    assert blob[:8] == b"\x00" * 8
    assert int.from_bytes(blob[8:16], "big") == len(payload)
    assert blob[16:48] == hashlib.sha256(payload).digest()
    assert unwrap_blob(blob) == payload
    bad = bytearray(blob)
    bad[-1] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        unwrap_blob(bytes(bad))


def test_sanitize_table_name():
    assert sanitize_table_name("events") == "events"
    assert sanitize_table_name("my_table-1.2") == "my_table-1.2"
    out = sanitize_table_name("Weird Name!")
    digest = hashlib.sha256(b"Weird Name!").hexdigest()
    assert out == f"-weirdname-{digest}"
    assert sanitize_table_name("..dots") == f"-dots-" + \
        hashlib.sha256(b"..dots").hexdigest()


# --------------------------------------------- codec interpreter pins

def _mat(col):
    return materialize_column(col)


def test_codec_add_offset():
    """integers.rs (false,false) no-null: [Add(t, offset)]."""
    col = RefColumn("c", 4, (100, 104), [("add", "u8", 100)],
                    [("u8", np.array([0, 1, 2, 3], "u1"))])
    vals, mask = _mat(col)
    assert vals.tolist() == [100, 101, 102, 103] and mask is None


def test_codec_delta_decode():
    """integers.rs (false,true): [Add, Delta] — prefix sum after
    offset (delta_decode.rs: running previous starts at 0)."""
    col = RefColumn("c", 4, None,
                    [("add", "i64", 5), ("delta",)],
                    [("i64", np.array([10, 1, -2, 3], "i8"))])
    vals, _ = _mat(col)
    # add 5 -> [15, 6, 3, 8]; cumsum -> [15, 21, 24, 32]
    assert vals.tolist() == [15, 21, 24, 32]


def test_codec_nullable_orders():
    """integers.rs:103 (true,false): [Push(1), Nullable, ToI64] —
    mask attaches BEFORE the cast; and :102 [Delta, Push(1),
    Nullable] — mask attaches after the sum."""
    col = RefColumn("c", 3, None,
                    [("push_section", 1), ("nullable",), ("to_i64",)],
                    [("u16", np.array([7, 0, 9], "u2")),
                     ("bitvec", np.array([0b101], "u1"))])
    vals, mask = _mat(col)
    assert vals.tolist() == [7, 0, 9]
    assert mask.tolist() == [True, False, True]

    col2 = RefColumn("c", 3, None,
                     [("delta",), ("push_section", 1), ("nullable",)],
                     [("u8", np.array([5, 2, 1], "u1")),
                      ("bitvec", np.array([0b011], "u1"))])
    vals2, mask2 = _mat(col2)
    assert vals2.tolist() == [5, 7, 8]
    assert mask2.tolist() == [True, True, False]


def test_codec_dict_lookup():
    """strings.rs:131-133 dict codec: indices -> (offset<<24|len)
    pairs -> packed dict bytes (dict_lookup.rs:20-25)."""
    dict_data = b"aabbbcc"
    entries = [(0, 2), (2, 3), (5, 2)]  # aa, bbb, cc
    dict_indices = np.array([(o << 24) | ln for o, ln in entries], "u8")
    col = RefColumn(
        "s", 5, None,
        [("push_section", 1), ("push_section", 2), ("dict_lookup",)],
        [("u16", np.array([2, 0, 1, 1, 0], "u2")),
         ("u64", dict_indices),
         ("u8", np.frombuffer(dict_data, "u1"))])
    vals, mask = _mat(col)
    assert vals == ["cc", "aa", "bbb", "bbb", "aa"] and mask is None


def test_codec_nullable_dict_lookup():
    """strings.rs:120-121: [Push(3), Nullable, Push(1), Push(2),
    DictLookup] — null mask rides through the lookup."""
    dict_data = b"xy"
    dict_indices = np.array([(0 << 24) | 1, (1 << 24) | 1], "u8")
    col = RefColumn(
        "s", 3, None,
        [("push_section", 3), ("nullable",),
         ("push_section", 1), ("push_section", 2), ("dict_lookup",)],
        [("u8", np.array([0, 0, 1], "u1")),
         ("u64", dict_indices),
         ("u8", np.frombuffer(dict_data, "u1")),
         ("bitvec", np.array([0b101], "u1"))])
    vals, mask = _mat(col)
    assert vals == ["x", "x", "y"]
    assert mask.tolist() == [True, False, True]


def test_codec_unpack_strings():
    packed = bytes([3]) + b"foo" + bytes([0]) + bytes([2]) + b"hi"
    col = RefColumn("s", 3, None, [("unpack_strings",)],
                    [("u8", np.frombuffer(packed, "u1"))])
    vals, _ = _mat(col)
    assert vals == ["foo", "", "hi"]


def test_codec_unpack_long_string():
    """255-continuation length framing (stringpack.rs:59-67)."""
    long = b"z" * 300
    packed = bytes([255, 45]) + long
    col = RefColumn("s", 1, None, [("unpack_strings",)],
                    [("u8", np.frombuffer(packed, "u1"))])
    vals, _ = _mat(col)
    assert vals == ["z" * 300]


def test_codec_unhexpack_strings():
    packed = bytes([2]) + b"\xab\xcd" + bytes([1]) + b"\x0f"
    col = RefColumn("s", 2, None,
                    [("unhexpack_strings", False, 6)],
                    [("u8", np.frombuffer(packed, "u1"))])
    vals, _ = _mat(col)
    assert vals == ["abcd", "0f"]
    col_u = RefColumn("s", 2, None,
                      [("unhexpack_strings", True, 6)],
                      [("u8", np.frombuffer(packed, "u1"))])
    vals_u, _ = _mat(col_u)
    assert vals_u == ["ABCD", "0F"]


def test_codec_lz4_section():
    raw = np.arange(100, dtype="<i8")
    frame = compress_frame(raw.tobytes())
    col = RefColumn(
        "c", 100, None, [("lz4", "i64", 100)],
        [("lz4", {"decoded_bytes": 800, "bytes_per_element": 8,
                  "data": frame})])
    vals, _ = _mat(col)
    assert vals.tolist() == list(range(100))


def test_codec_pco_garbage_raises_and_degrades():
    """A Pco payload that is not a pco file still gets the named
    error / on_pco='null' degrade path."""
    col = RefColumn(
        "c", 5, None, [("pco", "i64", 5, False)],
        [("pco", {"decoded_bytes": 40, "bytes_per_element": 8,
                  "is_fp32": False, "data": b"\x00"})])
    with pytest.raises(PcoUnsupportedError, match="'c'"):
        materialize_column(col, on_pco="error")
    vals, mask = materialize_column(col, on_pco="null")
    assert vals == ("allnull", 5) and mask is None


def test_codec_pco_section_decodes():
    """Pco sections decode (sources/pco.py) with column.rs:465-505's
    post-decode casts: i64 passthrough, u8-as-pco-u32 downcast,
    is_fp32 widening to f64."""
    from locustdb_spark.sources.pco import simpler_compress

    ints = [10**9 + 7 * i for i in range(500)]
    blob = simpler_compress(ints, "i64")
    col = RefColumn(
        "c", 500, None, [("pco", "i64", 500, False)],
        [("pco", {"decoded_bytes": 4000, "bytes_per_element": 8,
                  "is_fp32": False, "data": blob})])
    vals, mask = materialize_column(col, on_pco="error")
    assert mask is None and vals.tolist() == ints

    bytevals = [i % 251 for i in range(300)]
    blob8 = simpler_compress(bytevals, "u32")  # column.rs:318 widens
    col8 = RefColumn(
        "b", 300, None, [("pco", "u8", 300, False)],
        [("pco", {"decoded_bytes": 300, "bytes_per_element": 1,
                  "is_fp32": False, "data": blob8})])
    vals8, _ = materialize_column(col8, on_pco="error")
    assert vals8.dtype == np.uint8 and vals8.tolist() == bytevals

    f32s = [float(np.float32(0.5 * i)) for i in range(400)]
    blobf = simpler_compress(f32s, "f32")
    colf = RefColumn(
        "f", 400, None, [("pco", "f64", 400, True)],
        [("pco", {"decoded_bytes": 3200, "bytes_per_element": 8,
                  "is_fp32": True, "data": blobf})])
    valsf, _ = materialize_column(colf, on_pco="error")
    assert valsf.dtype == np.float64 and valsf.tolist() == f32s


def test_codec_pco_length_mismatch_raises():
    from locustdb_spark.sources.pco import simpler_compress

    blob = simpler_compress([1, 2, 3], "i64")
    col = RefColumn(
        "c", 5, None, [("pco", "i64", 5, False)],
        [("pco", {"decoded_bytes": 40, "bytes_per_element": 8,
                  "is_fp32": False, "data": blob})])
    with pytest.raises(PcoUnsupportedError, match="expected 5"):
        materialize_column(col, on_pco="error")


def test_codec_pco_range_cross_check():
    """A pco payload whose decoded integers land outside the column's
    persisted range is rejected (the format has no checksum; the range
    is the only independent witness a mis-decode can trip), and
    on_pco='null' degrades it like any other pco failure. In-range
    payloads and lz4 columns are untouched."""
    from locustdb_spark.sources.pco import simpler_compress

    vals = [100, 150, 90_000, 120]  # 90_000 breaches the range below
    blob = simpler_compress(vals, "i64")

    def col(rng):
        return RefColumn(
            "c", 4, rng, [("pco", "i64", 4, False)],
            [("pco", {"decoded_bytes": 32, "bytes_per_element": 8,
                      "is_fp32": False, "data": blob})])

    with pytest.raises(PcoUnsupportedError, match="persisted range"):
        materialize_column(col((90, 1000)), on_pco="error")
    degraded, mask = materialize_column(col((90, 1000)), on_pco="null")
    assert degraded == ("allnull", 4) and mask is None
    # honest range: passes untouched
    ok, _ = materialize_column(col((90, 90_000)), on_pco="error")
    assert ok.tolist() == vals
    # no range metadata: no basis to cross-check
    ok2, _ = materialize_column(col(None), on_pco="error")
    assert ok2.tolist() == vals


def test_write_reference_dir_compat_mode_has_no_pco(tmp_path):
    """Default (pco=False) export must never emit a pco section — the
    encoder is an unverified spec reconstruction and the real engine
    pco-decodes with .unwrap(); compat output sticks to the
    conformance-proven codecs and still round-trips exactly."""
    import glob
    import os

    root = str(tmp_path / "compatdir")
    df = pd.DataFrame({
        # smooth sequences: exactly the shape the pco trial would win
        "ts": [1_600_000_000 + 60 * i for i in range(3000)],
        "reading": np.round(np.linspace(0.0, 30.0, 3000), 3),
    })
    write_reference_dir(root, {"sensor": df}, rows_per_partition=1000)
    for seg in glob.glob(os.path.join(root, "tables", "sensor", "*")):
        with open(seg, "rb") as fh:
            cols = parse_partition_segment(unwrap_blob(fh.read()))
        for c in cols:
            assert all(s[0] != "pco" for s in c.sections), c.name
            assert all(op[0] != "pco" for op in c.codec), c.name
    rd = ReferenceDirReader(root, on_pco="error")
    out = rd.read_table("sensor").to_pandas().sort_values("ts") \
        .reset_index(drop=True)
    assert out["ts"].tolist() == df["ts"].tolist()
    assert out["reading"].tolist() == df["reading"].tolist()


def test_pco_bearing_directory_restores_without_on_pco_firing(tmp_path):
    """The round-4 gate: a directory whose numeric columns ARE
    Pco-compressed (build_column's trial picks pco for smooth numeric
    data, mirroring column.rs:116-126) restores end to end with
    on_pco='error' — the error path never fires."""
    root = str(tmp_path / "pcodir")
    df = pd.DataFrame({
        "ts": [1_600_000_000 + 60 * i for i in range(3000)],
        "reading": np.round(np.linspace(0.0, 30.0, 3000), 3),
        "tag": [f"t{i % 4}" for i in range(3000)],
        "gaps": pd.Series([float(i) if i % 9 else None
                           for i in range(3000)]),
    })
    write_reference_dir(root, {"sensor": df}, rows_per_partition=1000,
                        pco=True)

    rd = ReferenceDirReader(root, on_pco="error")
    # the fixture must actually exercise the pco path: re-parse one
    # segment directly and require a pco section in it
    import glob
    import os

    seg_files = glob.glob(os.path.join(root, "tables", "sensor", "*"))
    assert seg_files
    with open(seg_files[0], "rb") as fh:
        cols = parse_partition_segment(unwrap_blob(fh.read()))
    kinds = {c.name: [s[0] for s in c.sections] for c in cols}
    assert any("pco" in ks for ks in kinds.values()), kinds

    out = rd.read_table("sensor").to_pandas().sort_values("ts") \
        .reset_index(drop=True)
    assert out["ts"].tolist() == df["ts"].tolist()
    assert out["reading"].tolist() == df["reading"].tolist()
    assert out["tag"].tolist() == df["tag"].tolist()
    got = out["gaps"].tolist()
    exp = df["gaps"].tolist()
    assert all((pd.isna(a) and pd.isna(b)) or a == b
               for a, b in zip(exp, got))


# ------------------------------------------------- segment round trip

def test_partition_segment_roundtrip_all_shapes():
    rng = np.random.default_rng(11)
    series = {
        "ints": pd.Series(rng.integers(-10**6, 10**6, 400)),
        "ints_null": pd.Series([7, None, -3] * 100, dtype="Int64"),
        "floats": pd.Series(rng.normal(size=400)),
        "floats_null": pd.Series([2.5, None] * 200),
        "strs": pd.Series([f"val_{i % 13}" for i in range(400)]),
        "strs_null": pd.Series(
            [None if i % 5 == 0 else f"s{i % 9}" for i in range(400)]),
        "constant": pd.Series([123] * 400),
    }
    cols = [build_column(k, v) for k, v in series.items()]
    parsed = parse_partition_segment(serialize_partition_segment(cols))
    assert [c.name for c in parsed] == list(series)
    for col, (name, s) in zip(parsed, series.items()):
        vals, mask = materialize_column(col)
        for i, e in enumerate(s.tolist()):
            if pd.isna(e):
                assert not mask[i], (name, i)
            elif isinstance(e, str):
                assert vals[i] == e, (name, i)
            elif isinstance(e, float):
                assert abs(vals[i] - e) < 1e-12, (name, i)
            else:
                assert int(vals[i]) == int(e), (name, i)


def test_dbmeta_roundtrip():
    meta = RefMeta(next_wal_id=17, partitions=[
        RefPartition(id=3, table="events", offset=0, len=1000,
                     subpartitions=[RefSubpartition(10, "all", "ts")]),
        RefPartition(id=4, table="events", offset=1000, len=500,
                     subpartitions=[
                         RefSubpartition(5, "aaa", "aaa"),
                         RefSubpartition(6, "zzz", "zzz")]),
        RefPartition(id=0, table="other", offset=0, len=2),
    ])
    out = parse_dbmeta(wrap_blob(serialize_dbmeta(meta)))
    assert out.next_wal_id == 17
    assert out.tables() == ["events", "other"]
    parts = out.for_table("events")
    assert [(p.id, p.offset, p.len) for p in parts] == \
        [(3, 0, 1000), (4, 1000, 500)]
    assert [s.key for s in parts[1].subpartitions] == ["aaa", "zzz"]
    assert parts[0].subpartitions[0].last_column == "ts"


# ------------------------------------------------------ directory e2e

def test_directory_roundtrip_multi_partition(tmp_path):
    root = str(tmp_path / "refdir")
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(250),
        "grp": [f"g{i % 4}" for i in range(250)],
        "val": rng.normal(size=250),
    })
    write_reference_dir(root, {"metrics": df}, rows_per_partition=64)
    rd = ReferenceDirReader(root)
    assert rd.tables() == ["metrics"]
    assert len(rd.meta.for_table("metrics")) == 4  # ceil(250/64)
    out = rd.read_table("metrics").to_pandas()
    assert out["id"].tolist() == list(range(250))  # offset order
    assert out["grp"].tolist() == df["grp"].tolist()
    assert np.allclose(out["val"], df["val"])


def test_directory_schema_evolution(tmp_path):
    """A column present in only one partition reads as NULL in the
    others (the reference adds columns per-partition)."""
    root = str(tmp_path / "evo")
    write_reference_dir(root, {"t": pd.DataFrame({"a": [1, 2]})})
    # hand-append a second partition with an extra column
    from locustdb_spark.sources.refdir import (
        RefPartition as RP, RefSubpartition as RS, partition_filename)
    import os

    rd0 = ReferenceDirReader(root)
    meta = rd0.meta
    cols = [build_column("a", pd.Series([3, 4])),
            build_column("b", pd.Series(["x", "y"]))]
    blob = wrap_blob(serialize_partition_segment(cols))
    tdir = os.path.join(root, "tables", "t")
    with open(os.path.join(tdir, partition_filename(1, "all")), "wb") as fh:
        fh.write(blob)
    meta.partitions.append(RP(id=1, table="t", offset=2, len=2,
                              subpartitions=[RS(len(blob), "all", "b")]))
    with open(os.path.join(root, "meta"), "wb") as fh:
        fh.write(wrap_blob(serialize_dbmeta(meta)))

    out = ReferenceDirReader(root).read_table("t").to_pandas()
    assert out["a"].tolist() == [1, 2, 3, 4]
    assert out["b"].tolist() == [None, None, "x", "y"]


def test_restore_into_engine_with_wal(spark, tmp_path):
    """Full migration: flushed partitions + an unflushed WAL segment
    both land as queryable rows; a flushed (pre-checkpoint) WAL
    segment is NOT replayed twice."""
    from locustdb_spark import LocustDB
    from locustdb_spark.sources.event_buffer import (
        EventBuffer, TableBuffer, WalSegment)
    from locustdb_spark.sources.refdir import wrap_blob as wrap
    import os

    root = str(tmp_path / "mig")
    df = pd.DataFrame({"host": ["a", "b", "c"], "cpu": [0.1, 0.2, 0.3]})
    write_reference_dir(root, {"metrics": df})

    seg_old = WalSegment(id=0, data=EventBuffer())
    seg_new = WalSegment(id=1, data=EventBuffer())
    for seg, host in ((seg_old, "stale"), (seg_new, "d")):
        tb = TableBuffer()
        tb.push_row({"host": host, "cpu": 0.9})
        seg.data.tables["metrics"] = tb
    os.makedirs(os.path.join(root, "wal"), exist_ok=True)
    for seg in (seg_old, seg_new):
        with open(os.path.join(root, "wal", f"{seg.id}.wal"), "wb") as fh:
            fh.write(wrap(seg.serialize()))
    # checkpoint: wal id 0 already flushed, id 1 pending
    rd = ReferenceDirReader(root)
    rd.meta.next_wal_id = 1
    with open(os.path.join(root, "meta"), "wb") as fh:
        fh.write(wrap(serialize_dbmeta(rd.meta)))

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    counts = db.restore_reference_dir(root)
    assert counts["metrics"] == 3
    assert counts["<wal>"] == 1
    res = db.run_query("SELECT host FROM metrics")
    hosts = sorted(r[0] for r in res["rows"])
    assert hosts == ["a", "b", "c", "d"]  # 'stale' NOT replayed


def test_export_reference_dir_roundtrip(spark, tmp_path):
    from locustdb_spark import LocustDB

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.ingest("m", [{"k": i, "v": f"s{i % 3}"} for i in range(20)])
    db.force_flush()
    out = str(tmp_path / "export")
    db.export_reference_dir(out)
    rd = ReferenceDirReader(out)
    assert "m" in rd.tables()
    t = rd.read_table("m").to_pandas().sort_values("k")
    assert t["k"].tolist() == list(range(20))
    assert t["v"].tolist() == [f"s{i % 3}" for i in range(20)]


# ------------------------------------------------- property round trip

from hypothesis import given, settings, strategies as st  # noqa: E402

_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_cell, min_size=1, max_size=60), st.booleans())
def test_refdir_column_roundtrip_property(values, try_lz4):
    """Any single-typed-or-promotable column round-trips through the
    reference segment format bit-exactly (strings win mixed columns,
    matching the engine's promotion lattice)."""
    s = pd.Series(values, dtype=object)
    col = build_column("c", s, try_lz4=try_lz4)
    [col2] = parse_partition_segment(serialize_partition_segment([col]))
    vals, mask = materialize_column(col2)
    if isinstance(vals, tuple):
        assert vals[0] == "allnull"
        assert all(v is None for v in values)
        return
    non_null = [v for v in values if v is not None]
    any_str = any(isinstance(v, str) for v in non_null)
    all_int = (not any_str) and all(
        isinstance(v, int) for v in non_null)
    for i, e in enumerate(values):
        if e is None:
            assert mask is not None and not mask[i]
            continue
        if mask is not None:
            assert mask[i]
        g = vals[i]
        if any_str:
            assert g == str(e)
        elif all_int:
            assert int(g) == e
        else:
            assert g == float(e) or (
                abs(g - float(e)) <= 1e-9 * max(1.0, abs(float(e))))


def test_read_table_df_distributed(spark, tmp_path):
    """read_table_df (executor-side mapInPandas decode) returns the
    same rows as the driver-side read_table, including promoted types
    and NULL fill for a column absent from early partitions."""
    import os

    root = str(tmp_path / "dist")
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(150),
        "v": rng.normal(size=150),
        "tag": [f"t{i % 3}" for i in range(150)],
    })
    write_reference_dir(root, {"big": df}, rows_per_partition=40)
    # add a partition with an extra int column and v as int (promote)
    rd0 = ReferenceDirReader(root)
    from locustdb_spark.sources.refdir import (
        RefPartition as RP, RefSubpartition as RS, partition_filename)
    extra = pd.DataFrame({"id": [150, 151], "v": [1, 2],
                          "tag": ["x", "y"], "new": [7, 8]})
    cols = [build_column(c, extra[c]) for c in sorted(extra.columns)]
    blob = wrap_blob(serialize_partition_segment(cols))
    tdir = os.path.join(root, "tables", "big")
    with open(os.path.join(tdir, partition_filename(99, "all")), "wb") as fh:
        fh.write(blob)
    rd0.meta.partitions.append(
        RP(id=99, table="big", offset=150, len=2,
           subpartitions=[RS(len(blob), "all", "v")]))
    with open(os.path.join(root, "meta"), "wb") as fh:
        fh.write(wrap_blob(serialize_dbmeta(rd0.meta)))

    rd = ReferenceDirReader(root)
    via_driver = rd.read_table("big").to_pandas()
    via_spark = rd.read_table_df(spark, "big").toPandas()
    assert len(via_spark) == 152
    assert dict(rd.read_table_df(spark, "big").dtypes)["v"] == "double"
    assert via_spark["id"].tolist() == via_driver["id"].tolist()
    assert np.allclose(via_spark["v"], via_driver["v"].astype(float))
    assert via_spark["tag"].tolist() == via_driver["tag"].tolist()
    got_new = via_spark["new"].tolist()
    assert got_new[:150] == [None] * 150 or \
        all(pd.isna(x) for x in got_new[:150])
    assert got_new[150:] == [7, 8]


# ------------------------------------------------------- error paths

def test_truncated_blob_rejected():
    blob = wrap_blob(b"payload")
    with pytest.raises(ValueError, match="length mismatch"):
        unwrap_blob(blob[:-3])
    with pytest.raises(ValueError, match="too short"):
        unwrap_blob(b"\x00" * 20)


def test_corrupt_segment_names_the_problem(tmp_path):
    """A segment whose payload is garbage fails with a parse error,
    not a silent wrong answer; the blob checksum catches bit rot
    first."""
    root = str(tmp_path / "bad")
    df = pd.DataFrame({"a": [1, 2, 3]})
    write_reference_dir(root, {"t": df})
    import os

    seg = os.path.join(root, "tables", "t", "00000_all.part")
    data = bytearray(open(seg, "rb").read())
    data[60] ^= 0xFF  # flip a payload byte -> checksum mismatch
    open(seg, "wb").write(bytes(data))
    rd = ReferenceDirReader(root)
    with pytest.raises(ValueError, match="checksum"):
        rd.read_table("t")


def test_unknown_codec_discriminant_rejected():
    from locustdb_spark.sources.event_buffer import pack
    # craft a minimal segment with an out-of-range codec op disc
    col = build_column("c", pd.Series([1, 2, 3]), try_lz4=False)
    blob = serialize_partition_segment([col])
    # corrupt the codec list is fiddly; instead check the dispatch
    # path directly
    bad = RefColumn("c", 3, None, [("mystery",)],
                    [("i64", np.array([1, 2, 3], "i8"))])
    with pytest.raises(ValueError, match="unknown codec op"):
        materialize_column(bad)


def test_missing_meta_is_empty_dir(tmp_path):
    rd = ReferenceDirReader(str(tmp_path / "nothing"))
    assert rd.tables() == []
    assert rd.wal_files() == []


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_lz4_decompress_never_hangs_or_crashes(data):
    """Adversarial block bytes either decode or raise cleanly
    (ValueError/IndexError) — no hangs, no unbounded memory (output
    capped via max_output)."""
    try:
        out = decompress_block(data, max_output=1 << 16)
        assert len(out) <= (1 << 16) + 0xFFFF + 264  # one overshoot max
    except (ValueError, IndexError):
        pass


def test_u16_u32_section_discriminants_roundtrip():
    """Regression (r3 review): the serializer wrote u16/u32 sections
    with the union discriminant left at 0 (u8), which the parser then
    rejected. Round-trip a dict column whose index section is u16 and
    whose dict_indices are u64, plus a raw u32 section."""
    dict_data = b"xyzz"
    entries = [(0, 1), (1, 1), (2, 2)]  # x, y, zz
    col = RefColumn(
        "s", 4, None,
        [("push_section", 1), ("push_section", 2), ("dict_lookup",)],
        [("u16", np.array([2, 0, 1, 2], "u2")),
         ("u64", np.array([(o << 24) | ln for o, ln in entries], "u8")),
         ("u8", np.frombuffer(dict_data, "u1"))])
    col32 = RefColumn(
        "c", 3, None, [("to_i64",)],
        [("u32", np.array([7, 8, 9], "u4"))])
    blob = serialize_partition_segment([col, col32])
    parsed = parse_partition_segment(blob)
    vals, _ = materialize_column(parsed[0])
    assert vals == ["zz", "x", "y", "zz"]
    vals32, _ = materialize_column(parsed[1])
    assert vals32.tolist() == [7, 8, 9]


def test_strip_file_uri_variants():
    from locustdb_spark.storage import strip_file_uri

    assert strip_file_uri("/plain/path") == "/plain/path"
    assert strip_file_uri("file:/a/b") == "/a/b"
    assert strip_file_uri("file:///a/b") == "/a/b"
    assert strip_file_uri("file://localhost/a/b") == "/a/b"
    with pytest.raises(ValueError, match="remote authority"):
        strip_file_uri("file://otherhost/a/b")


def test_lz4_dict_frame_rejected():
    import struct as _s

    from locustdb_spark.sources.lz4 import xxh32 as _x

    flg = 0x40 | 0x20 | 0x01  # version + indep + dictID
    header = bytes([flg, 0x40]) + _s.pack("<I", 1234)
    hc = (_x(header) >> 8) & 0xFF
    frame = _s.pack("<I", 0x184D2204) + header + bytes([hc]) \
        + _s.pack("<I", 0)
    with pytest.raises(ValueError, match="dictionary"):
        decompress_frame(frame)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_segment_parser_never_hangs_on_garbage(data):
    """Adversarial segment bytes parse or raise cleanly — the
    migration path must survive hostile/corrupt files."""
    try:
        parse_partition_segment(data)
    except (ValueError, IndexError, struct.error, KeyError):
        pass


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=10**6), st.binary(max_size=60))
def test_segment_parser_survives_bit_flips(seed, junk):
    """A valid segment with flipped bytes never hangs or returns
    silently-wrong column counts without SOME signal (either an
    exception or a parse; the blob sha256 layer above catches the
    rest)."""
    import random as _r

    col = build_column("c", pd.Series([1, 2, 3, None, 5], dtype="Int64"))
    blob = bytearray(serialize_partition_segment([col]))
    rng = _r.Random(seed)
    for _ in range(3):
        blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
    try:
        cols = parse_partition_segment(bytes(blob))
        for c in cols:
            try:
                materialize_column(c)
            except (ValueError, IndexError, KeyError):
                pass
    except (ValueError, IndexError, struct.error, KeyError):
        pass
