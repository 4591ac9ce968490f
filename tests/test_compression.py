"""xor-float codec tests (locustdb_spark/compression.py — the
capability of reference locustdb-compression-utils/src/xor_float/
double.rs: lossless roundtrip at any max_regret, NULL sentinel NaN,
lossy mantissa quantization, and real compression on smooth series)."""

import math
import random
import struct

import pytest

from locustdb_spark.compression import NULL_BITS, decode, encode


def roundtrip(vals, **kw):
    return decode(encode(vals, **kw))


def test_empty_and_single():
    assert roundtrip([]) == []
    assert roundtrip([3.14]) == [3.14]
    assert roundtrip([0.0]) == [0.0]


def test_exact_roundtrip_random():
    rng = random.Random(7)
    vals = [rng.uniform(-1e12, 1e12) for _ in range(500)]
    for max_regret in (0, 30, 100, 1000):
        assert roundtrip(vals, max_regret=max_regret) == vals


def test_roundtrip_repeats_and_steps():
    vals = [1.0] * 50 + [2.0] * 50 + list(range(100)) * 2
    vals = [float(v) for v in vals]
    assert roundtrip(vals) == vals


def test_special_values():
    vals = [0.0, -0.0, float("inf"), float("-inf"), 1e-308, -1e308, 5.5]
    out = roundtrip(vals)
    assert out[:4] == vals[:4] or (
        out[0] == 0.0 and math.copysign(1, out[1]) == -1.0)
    assert out[2] == float("inf") and out[3] == float("-inf")
    assert out[4:] == vals[4:]


def test_nan_roundtrip():
    out = roundtrip([1.0, float("nan"), 2.0], )
    assert out[0] == 1.0 and math.isnan(out[1]) and out[2] == 2.0


def test_null_sentinel():
    vals = [1.5, None, None, 2.5, None]
    assert roundtrip(vals) == vals
    # without None mapping the sentinel NaN bit pattern comes through
    raw = decode(encode(vals), nulls_as_none=False)
    assert struct.unpack("<Q", struct.pack("<d", raw[1]))[0] == NULL_BITS


def test_mantissa_quantization_lossy_but_close():
    rng = random.Random(11)
    vals = [rng.uniform(0.5, 2.0) for _ in range(200)]
    out = roundtrip(vals, mantissa=20)
    for a, b in zip(vals, out):
        assert b == pytest.approx(a, rel=2 ** -19)
    # quantized stream must be smaller than the exact stream
    assert len(encode(vals, mantissa=20)) < len(encode(vals))


def test_compresses_smooth_series():
    # slowly-varying series: the window reuse path must beat 8 B/value
    vals = [1000.0 + 0.25 * i for i in range(4096)]
    blob = encode(vals)
    assert len(blob) < 8 * len(vals) * 0.5


def test_truncated_stream_raises():
    blob = encode([1.0, 2.0, 3.0])
    with pytest.raises(EOFError):
        decode(blob[: len(blob) - 2] if len(blob) > 10 else blob[:9])


def test_server_round_trip_with_encoding_opts(spark, tmp_path):
    from locustdb_spark.client import LoggingClient
    from locustdb_spark.engine import LocustDB
    from locustdb_spark.server import LocustServer

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.ingest("m", [{"host": "a", "cpu": 0.5}, {"host": "b", "cpu": 0.75},
                    {"host": "a", "cpu": 0.25}])
    server = LocustServer(db)
    port = server.start()
    try:
        client = LoggingClient(f"http://127.0.0.1:{port}",
                               flush_interval=30.0)
        plain = client.multi_query(["SELECT host, cpu FROM m"])
        packed = client.multi_query(
            ["SELECT host, cpu FROM m"],
            encoding_opts={"xor_float_compression": True})
        assert packed[0]["cols"]["cpu"] == plain[0]["cols"]["cpu"]
        assert packed[0]["cols"]["host"] == plain[0]["cols"]["host"]
        # full_precision_cols exempts a column from mantissa quantization
        lossy = client.multi_query(
            ["SELECT host, cpu FROM m"],
            encoding_opts={"xor_float_compression": True, "mantissa": 10,
                           "full_precision_cols": ["cpu"]})
        assert lossy[0]["cols"]["cpu"] == plain[0]["cols"]["cpu"]
        client.close()
    finally:
        server.stop()
