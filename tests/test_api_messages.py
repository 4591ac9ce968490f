"""Binary query-response wire format (sources/api_messages.py) — the
reference's packed-capnp MultiQueryResponse (api.capnp,
locustdb-serialization/src/api.rs:106-270) with its integer
delta/double-delta/range compression selection."""

import pytest

from locustdb_spark.sources.api_messages import (
    _pick_int_encoding, deserialize_multi_query_response, encode_values,
    serialize_multi_query_response)

_D8, _D16, _D32 = 6, 7, 8
_DD8, _DD16, _DD32 = 9, 10, 11
_RANGE, _I64, _F64, _STRING, _MIXED, _NULL, _XOR = 12, 1, 0, 2, 3, 4, 5


def _rt(responses, opts=None):
    return deserialize_multi_query_response(
        serialize_multi_query_response(responses, opts))


def test_int_encoding_selection_mirrors_reference():
    """api.rs:190-270 selection order: range, d8, dd8, d16, dd16, d32,
    dd32, plain — chosen by delta / delta-delta bounds."""
    assert _pick_int_encoding([5, 8, 11, 14])[0] == _RANGE      # const delta
    assert _pick_int_encoding([7])[0] == _I64                   # len < 2
    assert _pick_int_encoding([0, 100])[0] == _RANGE            # len 2
    assert _pick_int_encoding([0, 100, 150, 130])[0] == _D8     # deltas fit i8
    # deltas too wide for i8 but accelerating smoothly -> dd8
    assert _pick_int_encoding([0, 1000, 2001, 3003])[0] == _DD8
    assert _pick_int_encoding([0, 30000, 29000, 58000])[0] == _D16
    assert _pick_int_encoding(
        [0, 10**6, 2 * 10**6 + 30000, 3 * 10**6 + 60000])[0] == _DD16
    assert _pick_int_encoding([0, 2 * 10**9, 10**9, 3 * 10**9])[0] == _D32
    big = [0, 10**13, 2 * 10**13 + 10**9, 3 * 10**13 + 2 * 10**9]
    assert _pick_int_encoding(big)[0] == _DD32
    assert _pick_int_encoding([0, 10**18, -10**18, 10**18])[0] == _I64


@pytest.mark.parametrize("xs", [
    [5, 8, 11, 14],                       # range
    [7],                                  # single
    [],                                   # empty
    [0, 100, 150, 130],                   # d8
    [0, 1000, 2001, 3003],                # dd8
    [0, 30000, 29000, 58000],             # d16
    [0, 10**6, 2 * 10**6 + 30000, 3 * 10**6 + 60000],  # dd16
    [0, 2 * 10**9, 10**9, 3 * 10**9],     # d32
    [0, 10**13, 2 * 10**13 + 10**9, 3 * 10**13 + 2 * 10**9],  # dd32
    [0, 10**18, -10**18, 10**18],         # plain
    [-(2**62), 2**62, 0, -5],             # extremes
])
def test_int_columns_roundtrip_all_encodings(xs):
    out = _rt([{"c": xs}])
    assert out == [{"c": xs}]


def test_column_kinds_roundtrip():
    responses = [
        {"f": [0.5, -1.25, 3.0],
         "s": ["a", "", "naïve"],
         "n": [None, None],
         "m": [1, "x", None, 2.5]},
        {"empty_floats": []},
    ]
    assert _rt(responses) == responses


def test_xor_float_compression_roundtrip_and_nulls():
    vals = [0.5, None, 1.5, 2.25, None]
    out = _rt([{"cpu": vals}],
              {"xor_float_compression": True})
    assert out == [{"cpu": vals}]


def test_mantissa_quantization_and_full_precision_exemption():
    import math

    vals = [math.pi, math.e * 100]
    lossy = _rt([{"a": vals, "b": vals}],
                {"xor_float_compression": True, "mantissa": 10,
                 "full_precision_cols": ["b"]})[0]
    assert lossy["b"] == vals                       # exempt column exact
    assert lossy["a"] != vals                       # quantized
    assert all(abs(x - y) / abs(y) < 1e-2
               for x, y in zip(lossy["a"], vals))   # but close


def test_int_float_mix_stays_mixed_like_reference():
    """server/mod.rs:481-553: only type signatures 8 and 12 take the
    float path; an int+float column stays Mixed (AnyVal-typed)."""
    tag, payload = encode_values([1, 2.5], None)
    assert tag == _MIXED
    assert _rt([{"m": [1, 2.5]}]) == [{"m": [1, 2.5]}]


def test_all_null_column_is_count_only():
    tag, payload = encode_values([None] * 7, None)
    assert (tag, payload) == (_NULL, 7)
    assert _rt([{"n": [None] * 7}]) == [{"n": [None] * 7}]
