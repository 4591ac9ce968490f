"""Pco (pcodec) pure-Python codec tests (sources/pco.py).

No crate-produced bytes exist in this offline environment, so these
tests pin the reconstruction the way test_refdir.py pins the other
reference formats: the writer is the fixture source (encoder<->decoder
round trips over every dtype, mode, delta order, and batch-boundary
shape), plus hand-assembled golden vectors for the bit-level
primitives whose layout is independent of the reconstruction
(LSB-first bit packing, ULEB128, contiguous-spread tANS tables).
"""

import struct

import numpy as np
import pytest

from locustdb_spark.sources import pco
from locustdb_spark.sources.pco import (
    AnsSpec, BitReader, BitWriter, PcoFormatError, _read_uleb,
    _write_uleb, simple_decompress, simpler_compress)


# ------------------------------------------------------------- bit IO

def test_bitio_lsb_first_golden():
    w = BitWriter()
    w.write(0b101, 3)
    w.write(0b01, 2)
    w.write(0b111, 3)
    assert w.getvalue() == bytes([0b11101101])
    r = BitReader(bytes([0b11101101]))
    assert r.read(3) == 0b101
    assert r.read(2) == 0b01
    assert r.read(3) == 0b111


def test_bitio_cross_byte_and_align():
    w = BitWriter()
    w.write(0x1ABC, 13)
    w.align()
    w.write(1, 1)
    data = w.getvalue()
    r = BitReader(data)
    assert r.read(13) == 0x1ABC
    r.align()
    assert r.read(1) == 1


def test_bitio_64bit_values():
    for v in (0, 1, (1 << 64) - 1, 0x8000000000000001):
        w = BitWriter()
        w.write(v, 64)
        assert BitReader(w.getvalue()).read(64) == v


def test_bitreader_truncation_raises():
    r = BitReader(b"\x01")
    with pytest.raises(PcoFormatError):
        r.read(9)


def test_uleb_roundtrip():
    for v in (0, 1, 127, 128, 300, 1 << 40):
        buf = bytearray()
        _write_uleb(buf, v)
        got, pos = _read_uleb(bytes(buf), 0)
        assert (got, pos) == (v, len(buf))


# ------------------------------------------------------------- ANS

def test_ans_contiguous_table_golden():
    spec = AnsSpec(2, [2, 1, 1])
    assert spec.dec_sym.tolist() == [0, 0, 1, 2]
    # bin 0 (w=2): states have x_base 2,3 -> refill 1 bit each
    # bins 1,2 (w=1): x_base 1 -> refill 2 bits
    assert spec.dec_bits.tolist() == [1, 1, 2, 2]


def test_ans_encode_decode_sequence():
    spec = AnsSpec(3, [4, 2, 1, 1])
    syms = [0, 1, 0, 2, 3, 0, 1, 0, 0, 2, 1, 3] * 5
    states = [0] * pco.ANS_LANES
    chunks = spec.encode_batch(list(syms), states)
    w = BitWriter()
    for val, nb in chunks:
        w.write(val, nb)
    r = BitReader(w.getvalue())
    out = spec.decode_batch(r, list(states), len(syms))
    assert list(out) == syms


def test_ans_bad_weights_raise():
    with pytest.raises(PcoFormatError):
        AnsSpec(2, [2, 1])  # sums to 3, table is 4
    with pytest.raises(PcoFormatError):
        AnsSpec(1, [2, 0])


# ------------------------------------------------------- round trips

def _assert_rt(values, dtype_name, **kw):
    blob = simpler_compress(values, dtype_name, **kw)
    out = simple_decompress(blob)
    exp = np.asarray(values, dtype=out.dtype) if len(values) else out
    assert len(out) == len(values)
    if np.issubdtype(out.dtype, np.floating):
        # bit-exact, including NaN payloads and -0.0
        assert exp.tobytes() == out.tobytes()
    else:
        assert np.array_equal(exp, out)
    return blob


@pytest.mark.parametrize("dt", ["u16", "u32", "u64", "i16", "i32",
                                "i64", "f32", "f64"])
def test_roundtrip_ramps_all_dtypes(dt):
    vals = list(range(1, 700)) if dt[0] != "f" else \
        [0.25 * i for i in range(700)]
    if dt[0] == "i":
        vals = [v - 350 for v in range(700)]
    _assert_rt(vals, dt)


def test_roundtrip_random_extremes():
    rng = np.random.default_rng(11)
    _assert_rt(rng.integers(-2**62, 2**62, 4000).tolist(), "i64")
    _assert_rt(rng.integers(0, 2**64, 4000, dtype=np.uint64).tolist(),
               "u64")
    _assert_rt([0, (1 << 64) - 1, 1, (1 << 63)], "u64")
    _assert_rt([-(1 << 63), (1 << 63) - 1, 0, -1], "i64")
    _assert_rt(rng.normal(0, 1e6, 4000).tolist(), "f64")


def test_roundtrip_float_specials_bit_exact():
    vals = [0.0, -0.0, float("nan"), float("inf"), -float("inf"),
            5e-324, -5e-324, 1.7976931348623157e308]
    _assert_rt(vals, "f64")
    _assert_rt([0.0, -0.0, float("nan"), float("inf")], "f32")


def test_roundtrip_batch_boundaries():
    # exactly one batch, one short, one long, several batches
    for n in (1, 2, 255, 256, 257, 511, 512, 1025):
        _assert_rt(list(range(n)), "u32")


def test_roundtrip_constant_and_empty():
    blob = _assert_rt([42] * 1000, "i64")
    # a constant column must compress to near nothing
    assert len(blob) < 60
    _assert_rt([], "f64")


@pytest.mark.parametrize("order", [1, 2, 3])
def test_roundtrip_delta_orders(order):
    base = [1_000_000 + 37 * i + (i * i if order > 1 else 0)
            for i in range(900)]
    blob = _assert_rt(base, "i64", delta_order=order)
    raw = _assert_rt(base, "i64", delta_order=0)
    if order <= 2:
        assert len(blob) < len(raw)  # delta must actually help


def test_auto_delta_picks_up_smooth_series():
    smooth = [10**12 + 5 * i for i in range(3000)]
    auto = simpler_compress(smooth, "i64")
    flat = simpler_compress(smooth, "i64", delta_order=0)
    assert len(auto) < len(flat) / 4
    assert np.array_equal(simple_decompress(auto),
                          np.array(smooth, dtype=np.int64))


def test_roundtrip_int_mult_mode():
    vals = [100 * i for i in range(-300, 300)]
    blob = _assert_rt(vals, "i64", mode=pco.MODE_INT_MULT,
                      mode_base=100, delta_order=0)
    assert np.array_equal(simple_decompress(blob),
                          np.array(vals, dtype=np.int64))


def test_roundtrip_float_mult_mode():
    vals = [round(0.01 * i, 2) for i in range(-500, 500)]
    _assert_rt(vals, "f64", mode=pco.MODE_FLOAT_MULT,
               mode_base=0.01, delta_order=0)
    # values NOT on the grid still survive via the ULP adjustment
    vals2 = [0.01 * i + 1e-13 for i in range(200)]
    _assert_rt(vals2, "f64", mode=pco.MODE_FLOAT_MULT,
               mode_base=0.01, delta_order=0)


def test_roundtrip_float_quant_mode():
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 800).astype(np.float32) \
        .astype(np.float64).tolist()
    blob = _assert_rt(vals, "f64", mode=pco.MODE_FLOAT_QUANT,
                      quant_k=29, delta_order=0)
    # the quantized low bits are constant, so this must beat classic
    classic = simpler_compress(vals, "f64", delta_order=0)
    assert len(blob) < len(classic)


def test_roundtrip_secondary_uses_delta():
    vals = [100 * i + (i % 3) for i in range(600)]
    _assert_rt(vals, "i64", mode=pco.MODE_INT_MULT, mode_base=100,
               delta_order=1, secondary_uses_delta=True)


def test_multi_chunk_file(monkeypatch):
    monkeypatch.setattr(pco, "MAX_CHUNK_N", 1000)
    vals = list(range(2500))
    blob = simpler_compress(vals, "u32")
    assert np.array_equal(simple_decompress(blob),
                          np.array(vals, dtype=np.uint32))


# ------------------------------------------------------- container

def test_header_no_hint_variant_accepted():
    vals = [3, 1, 4, 1, 5]
    blob = simpler_compress(vals, "u32")
    # rebuild the container without the ULEB count hint (layout B)
    hint_len = 0
    pos = 5
    while blob[pos + hint_len] & 0x80:
        hint_len += 1
    hint_len += 1
    variant = blob[:5] + blob[5 + hint_len:]
    assert np.array_equal(simple_decompress(variant),
                          np.array(vals, dtype=np.uint32))


def test_bad_magic_and_truncations():
    blob = simpler_compress([1, 2, 3], "u32")
    with pytest.raises(PcoFormatError):
        simple_decompress(b"nope" + blob[4:])
    with pytest.raises(PcoFormatError):
        simple_decompress(blob[:-2])  # missing termination/short body
    with pytest.raises(PcoFormatError):
        simple_decompress(blob[:6])


def test_unknown_dtype_byte_rejected():
    blob = bytearray(simpler_compress([1, 2, 3], "u32"))
    # the dtype byte follows the header; find it as the first byte
    # after the parsed header
    from locustdb_spark.sources.pco import _parse_header
    pos, _, _ = _parse_header(bytes(blob))[0]
    blob[pos] = 200
    with pytest.raises(PcoFormatError):
        simple_decompress(bytes(blob))


def test_fuzz_corruption_never_hangs(tmp_path):
    """Byte flips either raise a PcoFormatError/ValueError or decode
    to some array — never crash the interpreter or loop forever."""
    rng = np.random.default_rng(9)
    blob = bytearray(simpler_compress(
        rng.integers(0, 10**6, 500).tolist(), "i64"))
    for trial in range(120):
        mutated = bytearray(blob)
        for _ in range(rng.integers(1, 4)):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        try:
            out = simple_decompress(bytes(mutated))
            assert len(out) <= 2 * 500 + 16
        except (PcoFormatError, ValueError, OverflowError):
            pass


def test_compression_actually_compresses():
    """Sanity on ratio for the shapes the reference feeds this codec
    (column.rs only keeps pco when ratio < 0.9)."""
    smooth = [10**9 + 13 * i for i in range(20000)]
    blob = simpler_compress(smooth, "i64")
    assert len(blob) < 0.1 * 8 * len(smooth)
    near_const = ([7] * 9000) + ([8] * 1000)
    blob2 = simpler_compress(near_const, "i64", delta_order=0)
    assert len(blob2) < 0.05 * 8 * len(near_const)


def test_dtype_bytes_stable():
    """The standalone dtype bytes are part of the on-disk contract
    (DTYPES keys must not drift once directories exist)."""
    assert {k: v[0] for k, v in pco.DTYPES.items()} == {
        1: "u32", 2: "u64", 3: "i32", 4: "i64",
        5: "f32", 6: "f64", 7: "u16", 8: "i16"}
    header = simpler_compress([1.5], "f64")[:4]
    assert header == b"pco!"


def test_f32_decodes_as_f32_dtype():
    blob = simpler_compress([1.5, -2.25, 3.75], "f32")
    out = simple_decompress(blob)
    assert out.dtype == np.float32
    assert struct.pack("<3f", 1.5, -2.25, 3.75) == out.tobytes()


# ------------------------------------------------------- property

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=0, max_size=400))
def test_property_i64_roundtrip(vals):
    blob = simpler_compress(vals, "i64")
    out = simple_decompress(blob)
    assert out.tolist() == vals if vals else len(out) == 0


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(width=64, allow_nan=True, allow_infinity=True),
                min_size=1, max_size=300))
def test_property_f64_roundtrip_bit_exact(vals):
    blob = simpler_compress(vals, "f64")
    out = simple_decompress(blob)
    assert np.asarray(vals, dtype=np.float64).tobytes() == out.tobytes()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=300),
       st.integers(min_value=0, max_value=3))
def test_property_u64_delta_roundtrip(vals, order):
    blob = simpler_compress(vals, "u64", delta_order=order)
    out = simple_decompress(blob)
    assert [int(v) for v in out] == vals
