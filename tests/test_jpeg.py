"""Baseline JPEG codec (operators/jpeg.py, ITU-T T.81 public spec).

Validation strategy without any image library in the environment:
1. a GOLDEN file assembled byte-by-byte from the spec (manual Huffman
   codes from the Annex K canonical assignment, DC-only block whose
   IDCT is computable by hand) — pins the decoder against the spec,
   not against our own encoder;
2. encoder->decoder round trips at high quality (RMSE bounds);
3. marker-level checks of the encoder's output (any strict parser's
   view: segment lengths, table ordering, byte stuffing).
"""

import struct

import numpy as np
import pytest

from locustdb_spark.operators.jpeg import (
    _K_AC_LUMA, _K_DC_LUMA, jpeg_decode, jpeg_encode)


def _golden_dc_only() -> bytes:
    """8x8 grayscale, quant table all ones, one DC coefficient = 40,
    no AC. Hand-derived entropy bits:

    - DC symbol 6 (6 magnitude bits): Annex K DC-luma canonical codes
      give length-4 code 0b1110 (lengths: one 2-bit for sym 0, five
      3-bit for syms 1-5, then sym 6 first at 4 bits).
    - magnitude 40 positive -> 6 bits 101000.
    - AC EOB (sym 0x00): K AC-luma canonical -> 4-bit code 0b1010
      (two 2-bit, one 3-bit, then 0x00 first at 4 bits).
    - 14 bits total, padded with two 1-bits: 11101010 00101011 =
      0xEA 0x2B.

    Expected pixels: DC-only IDCT is flat value dc/8; dequantized
    dc = 40 (qt=1), so every sample = 40/8 + 128 = 133.
    """
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in ((0, _K_DC_LUMA), (1, _K_AC_LUMA)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes([0xEA, 0x2B])
    out += b"\xff\xd9"
    return bytes(out)


def test_golden_dc_only_block():
    w, h, c, px = jpeg_decode(_golden_dc_only())
    assert (w, h, c) == (8, 8, 1)
    assert px.shape == (8, 8, 1)
    assert np.all(px == 133), np.unique(px)


def test_roundtrip_gradient_rgb():
    hh, ww = 40, 56
    yy, xx = np.mgrid[0:hh, 0:ww]
    img = np.stack([xx * 255 // ww, yy * 255 // hh,
                    (xx + yy) * 255 // (hh + ww)],
                   axis=-1).astype(np.uint8)
    _, _, c, dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert c == 3
    err = dec.astype(float) - img.astype(float)
    assert np.sqrt((err ** 2).mean()) < 2.0
    assert np.abs(err).max() <= 8


def test_roundtrip_gray_odd_size():
    hh, ww = 41, 53
    yy, xx = np.mgrid[0:hh, 0:ww]
    g = ((np.sin(xx / 5) * np.cos(yy / 7) * 100) + 128) \
        .astype(np.uint8)[:, :, None]
    w, h, c, dec = jpeg_decode(jpeg_encode(g, quality=95))
    assert (w, h, c) == (ww, hh, 1)
    err = dec.astype(float) - g.astype(float)
    assert np.sqrt((err ** 2).mean()) < 2.5


def test_roundtrip_noise_q100():
    rng = np.random.default_rng(0)
    n = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    _, _, _, dec = jpeg_decode(jpeg_encode(n, quality=100))
    # q=100 still quantizes chroma coarsely after color transform;
    # bound the per-channel error rather than expecting losslessness
    assert np.abs(dec.astype(float) - n.astype(float)).max() <= 16


def test_encoder_emits_stuffed_bytes_and_valid_markers():
    img = np.full((8, 8, 1), 255, np.uint8)  # all-white -> 0xFF bytes
    blob = jpeg_encode(img, quality=50)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # walk markers; entropy data must not contain bare 0xFF + non-00
    pos = 2
    seen = []
    while pos < len(blob) - 2:
        assert blob[pos] == 0xFF, f"expected marker at {pos}"
        marker = blob[pos + 1]
        seen.append(marker)
        (ln,) = struct.unpack_from(">H", blob, pos + 2)
        pos += 2 + ln
        if marker == 0xDA:
            break
    for m in (0xDB, 0xC0, 0xC4, 0xDA):
        assert m in seen
    entropy = blob[pos:-2]
    i = 0
    while i < len(entropy):
        if entropy[i] == 0xFF:
            assert entropy[i + 1] == 0x00, "unstuffed 0xFF in entropy"
            i += 2
        else:
            i += 1


def test_progressive_rejected():
    bad = bytearray(_golden_dc_only())
    idx = bad.index(b"\xff\xc0")
    bad[idx + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(ValueError, match="SOF2"):
        jpeg_decode(bytes(bad))


def test_multimodal_dispatch_includes_jpeg(spark):
    """decode_media and resize_image handle JPEG payloads end to end
    through the Arrow-batched plumbing."""
    from locustdb_spark.operators import codecs
    from locustdb_spark.operators.multimodal import (
        decode_media, resize_image)

    hh, ww = 16, 24
    yy, xx = np.mgrid[0:hh, 0:ww]
    img = np.stack([xx * 10, yy * 10, xx + yy], -1).astype(np.uint8)
    blob = jpeg_encode(img, quality=90)
    assert codecs.sniff(blob) == "jpeg"
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"\xff\xd8garbage"))],
        "doc_id long, payload binary")
    rows = {r.doc_id: r for r in decode_media(df).collect()}
    assert rows[1].format == "jpeg"
    assert (rows[1].width, rows[1].height, rows[1].channels) == (24, 16, 3)
    assert rows[2].format == "corrupt"

    rs = {r.doc_id: r for r in resize_image(df, 8, 8).collect()}
    assert rs[1].resized is not None
    w2, h2, c2, _ = codecs.png_decode(bytes(rs[1].resized))
    assert (w2, h2, c2) == (8, 8, 3)
    assert rs[2].resized is None


def test_bomb_and_fuzz_rejected_quickly():
    """Corrupt SOF dimensions fail fast (max_pixels), and random
    garbage after SOI raises instead of hanging."""
    import time

    bad = bytearray(_golden_dc_only())
    idx = bad.index(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2): claim 65535x65535
    struct.pack_into(">HH", bad, idx + 5, 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="max_pixels"):
        jpeg_decode(bytes(bad))

    rng = np.random.default_rng(4)
    t0 = time.time()
    for _ in range(60):
        blob = b"\xff\xd8" + rng.bytes(300)
        try:
            jpeg_decode(blob)
        except (ValueError, struct.error, IndexError, KeyError):
            pass
    assert time.time() - t0 < 30


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker."""
    blob = _golden_dc_only()
    # inject fill bytes before the DQT marker
    idx = blob.index(b"\xff\xdb")
    padded = blob[:idx] + b"\xff\xff\xff" + blob[idx:]
    w, h, c, px = jpeg_decode(padded)
    assert (w, h, c) == (8, 8, 1) and np.all(px == 133)


def test_grayscale_with_subsampled_sof_decodes_per_spec():
    """T.81 A.2: a single-component scan is non-interleaved — the MCU
    is one block and SOF sampling factors do not apply. Encode 4:1:1-
    style gray (sampling byte 0x22 in SOF) by patching our encoder
    output; the stream itself is one block per MCU either way."""
    g = np.full((8, 8, 1), 90, np.uint8)
    blob = bytearray(jpeg_encode(g, quality=90))
    idx = bytes(blob).index(b"\xff\xc0")
    assert blob[idx + 11] == 0x11  # component sampling h=v=1
    blob[idx + 11] = 0x22  # claim 2x2 sampling, stream unchanged
    w, h, c, px = jpeg_decode(bytes(blob))
    assert (w, h, c) == (8, 8, 1)
    assert abs(int(px.mean()) - 90) <= 2
