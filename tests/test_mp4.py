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


# ----------------------------------------------- sample extraction (r4)

def test_mux_demux_identity_and_chunking():
    """mp4_encode writes real stsc/stsz/stco tables; extraction must
    return the exact sample payloads across uneven chunk runs."""
    from locustdb_spark.operators.codecs import (
        mp4_encode, mp4_extract_samples, mp4_probe)

    frames = [bytes([i]) * (10 + 7 * i) for i in range(5)]  # odd count
    blob = mp4_encode(frames, width=4, height=4, samples_per_chunk=2)
    got = mp4_extract_samples(blob)
    assert [g[1] for g in got] == frames
    assert all(g[2] for g in got)  # no stss box -> every sample sync
    info = mp4_probe(blob)
    assert info["tracks"][0]["n_samples"] == 5
    assert info["tracks"][0]["codec"] == "jpeg"


def test_single_short_chunk_stsc_is_well_formed():
    """One sample with samples_per_chunk=2: the sole chunk is short,
    and the stsc must hold exactly one entry (ISO 14496-12 requires
    strictly increasing first_chunk — a duplicate first_chunk=1 pair
    would make an external parser over-read the sample table)."""
    import struct

    from locustdb_spark.operators.codecs import (
        mp4_encode, mp4_extract_samples)

    blob = mp4_encode([b"hello"], samples_per_chunk=2)
    i = blob.find(b"stsc")
    cnt = struct.unpack_from(">I", blob, i + 8)[0]
    entries = [struct.unpack_from(">III", blob, i + 12 + 12 * j)
               for j in range(cnt)]
    assert entries == [(1, 1, 1)]
    assert [g[1] for g in mp4_extract_samples(blob)] == [b"hello"]


def test_keyframe_only_extraction_uses_stss():
    from locustdb_spark.operators.codecs import (
        mp4_encode, mp4_extract_samples)

    frames = [b"F%d" % i for i in range(9)]
    blob = mp4_encode(frames, keyframe_every=3)
    keys = mp4_extract_samples(blob, keyframes_only=True)
    assert [(k[0], k[1]) for k in keys] == [
        (0, b"F0"), (3, b"F3"), (6, b"F6")]
    allf = mp4_extract_samples(blob)
    assert [f[2] for f in allf] == [True, False, False] * 3
    capped = mp4_extract_samples(blob, max_samples=4)
    assert len(capped) == 4


def test_mjpeg_in_mp4_real_pixel_roundtrip():
    """The full real-video path: encode solid-color frames with the
    baseline JPEG codec (operators/jpeg.py), mux as MJPEG-in-MP4,
    extract keyframes from the sample tables, decode each back to
    pixels — frame bytes AND pixel values survive the container."""
    from locustdb_spark.operators.codecs import (
        jpeg_decode, jpeg_encode, mp4_encode, mp4_extract_samples)

    colors = [(200, 30, 30), (30, 200, 30), (30, 30, 200)]
    jpegs = []
    for c in colors:
        px = np.zeros((16, 16, 3), dtype=np.uint8)
        px[:, :] = c
        jpegs.append(jpeg_encode(px, quality=90))
    blob = mp4_encode(jpegs, width=16, height=16)
    got = mp4_extract_samples(blob, keyframes_only=True)
    assert [g[1] for g in got] == jpegs  # bit-exact payloads
    for (idx, payload, _), c in zip(got, colors):
        w, h, ch, px = jpeg_decode(payload)
        assert (w, h, ch) == (16, 16, 3)
        center = px[8, 8].astype(int)
        assert np.abs(center - np.array(c)).max() <= 12  # JPEG loss


def test_extract_rejects_overrunning_sample_table():
    from locustdb_spark.operators.codecs import (
        mp4_encode, mp4_extract_samples)

    blob = bytearray(mp4_encode([b"abcdef" * 10]))
    # corrupt stsz's (only) sample size to overrun the file
    # fourcc at i: [ver/flags 4][uniform 4][count 4][size entries...]
    i = blob.find(b"stsz")
    blob[i + 16:i + 20] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError, match="overruns"):
        mp4_extract_samples(bytes(blob))


def test_sample_frames_mp4_operator(spark):
    """Distributed demux: mux per-doc slices, extract via
    mapInPandas, md5s line up with the source slices; a corrupt
    payload degrades to one flagged row instead of failing the
    stage."""
    import hashlib

    from locustdb_spark.operators.codecs import mp4_encode
    from locustdb_spark.operators.multimodal import sample_frames_mp4

    doc = b"x" * 300 + b"y" * 300
    good = mp4_encode([doc[:256], doc[256:512], doc[512:]])
    rows = [(1, bytearray(good)), (2, bytearray(b"not an mp4"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sorted(sample_frames_mp4(df).collect(),
                 key=lambda r: (r.doc_id, r.frame_id))
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.frame_md5 for r in by_doc[1]] == [
        hashlib.md5(doc[i:i + 256]).hexdigest()
        for i in range(0, 600, 256)]
    assert [r.frame_len for r in by_doc[1]] == [256, 256, 88]
    assert by_doc[2][0].frame_id == -1
    assert by_doc[2][0].frame_md5 is None
