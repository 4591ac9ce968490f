"""MP4/ISO-BMFF container probe (operators/codecs.py mp4_probe).

The golden file is assembled box-by-box from the public ISO 14496-12
layouts — independent of the parser's own code paths — with one video
track (90x60, 30 samples, 3 keyframes) and an mvhd duration of 2.5s
at timescale 1000.
"""

import struct

import numpy as np
import pytest

from locustdb_spark.operators.codecs import mp4_probe, sniff


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), btype) + body


def _full(version: int, flags: int, body: bytes) -> bytes:
    return bytes([version]) + flags.to_bytes(3, "big") + body


def _golden_mp4() -> bytes:
    ftyp = _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isomiso2")
    # mvhd v0: ctime, mtime, timescale=1000, duration=2500
    mvhd = _box(b"mvhd", _full(0, 0,
                struct.pack(">IIII", 0, 0, 1000, 2500) + b"\x00" * 80))
    # tkhd v0: ctime mtime trackid reserved duration .. width/height
    tkhd_body = struct.pack(">IIIII", 0, 0, 1, 0, 2500) + b"\x00" * 52 \
        + struct.pack(">II", 90 << 16, 60 << 16)
    tkhd = _box(b"tkhd", _full(0, 3, tkhd_body))
    mdhd = _box(b"mdhd", _full(0, 0,
                struct.pack(">IIIIHH", 0, 0, 600, 1500, 0x55C4, 0)))
    hdlr = _box(b"hdlr", _full(0, 0,
                b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"Video\x00"))
    stsd = _box(b"stsd", _full(0, 0,
                struct.pack(">I", 1)
                + _box(b"avc1", b"\x00" * 78)))
    # stts: 2 entries -> 10 samples @ delta 100, 20 samples @ delta 50
    stts = _box(b"stts", _full(0, 0,
                struct.pack(">IIIII", 2, 10, 100, 20, 50)))
    stss = _box(b"stss", _full(0, 0,
                struct.pack(">IIII", 3, 1, 11, 21)))
    stbl = _box(b"stbl", stsd + stts + stss)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def test_golden_probe():
    blob = _golden_mp4()
    assert sniff(blob) == "mp4"
    info = mp4_probe(blob)
    assert info["brand"] == "isom"
    assert info["timescale"] == 1000
    assert info["duration_s"] == pytest.approx(2.5)
    assert len(info["tracks"]) == 1
    t = info["tracks"][0]
    assert t["handler"] == "vide"
    assert t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (90, 60)
    assert t["n_samples"] == 30
    assert t["n_keyframes"] == 3
    assert t["duration_s"] == pytest.approx(1500 / 600)


def test_largesize_box_and_garbage():
    body = _golden_mp4()
    # wrap the whole thing after a 64-bit-size ftyp clone
    big = struct.pack(">I4sQ", 1, b"free", 16) + b"\x00" * 0 + body
    info = mp4_probe(big[16:])  # skip the free box: still parses
    assert info["brand"] == "isom"
    with pytest.raises(ValueError):
        mp4_probe(b"\x00\x00\x00\x09nope\x00")


def test_decode_media_mp4(spark):
    from locustdb_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, bytearray(_golden_mp4()))], "doc_id long, payload binary")
    [r] = decode_media(df).collect()
    assert r.format == "mp4"
    assert r.duration_s == pytest.approx(2.5)
    assert (r.width, r.height) == (90, 60)
