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
    _K_AC_LUMA, _K_DC_LUMA, jpeg_decode, jpeg_encode,
    jpeg_encode_progressive)


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


def _golden_progressive_sa() -> bytes:
    """8x8 grayscale, quant all ones, DC=40, zero AC — encoded as FOUR
    progressive scans exercising successive approximation, each scan's
    bits hand-derived from the Annex K canonical codes:

    1. DC first, Al=1: sends 40>>1 = 20 -> DC sym 5 (len-3 code 110)
       + 5 magnitude bits 10100 = exactly 0xD4.
    2. DC refinement, Ah=1 Al=0: one raw bit (40 & 1) = 0, padded
       with seven 1s = 0x7F.
    3. AC first, band 1-63, Al=1: all zero -> EOB1 (AC sym 0x00,
       len-4 code 1010), padded = 0xAF.
    4. AC refinement, band 1-63, Ah=1 Al=0: EOB1 again = 0xAF (the
       decoder must treat eobrun=1 as 'this block, nothing to
       refine').

    Expected pixels: flat 40/8 + 128 = 133 — identical to the
    baseline golden, proving the four-scan reassembly is lossless."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in ((0, _K_DC_LUMA), (1, _K_AC_LUMA)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    for sos_tail, entropy in (
        (bytes([0, 0, 0x01]), bytes([0xD4])),   # DC first Al=1
        (bytes([0, 0, 0x10]), bytes([0x7F])),   # DC refine
        (bytes([1, 63, 0x01]), bytes([0xAF])),  # AC first Al=1
        (bytes([1, 63, 0x10]), bytes([0xAF])),  # AC refine
    ):
        sos = bytes([1, 1, 0x00]) + sos_tail
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_golden_progressive_successive_approximation():
    w, h, c, px = jpeg_decode(_golden_progressive_sa())
    assert (w, h, c) == (8, 8, 1)
    assert np.all(px == 133), np.unique(px)


def test_progressive_truncated_decodes_coarse():
    """A progressive file cut after the DC scans must still decode
    (to the DC approximation), not raise — that is the point of the
    format."""
    blob = _golden_progressive_sa()
    # keep SOI..end of second scan (0x7F byte), then EOI
    cut = blob.index(bytes([0x7F])) + 1
    w, h, c, px = jpeg_decode(blob[:cut] + b"\xff\xd9")
    assert (w, h, c) == (8, 8, 1)
    assert np.all(px == 133)  # AC was zero anyway; DC fully refined


def test_progressive_equals_baseline_exactly():
    """The progressive entropy layer is lossless over the same
    quantized coefficients: progressive and baseline encodes of one
    image must decode BIT-IDENTICALLY (not just within RMSE). This
    cross-checks spectral selection, successive approximation (DC+AC
    first/refine), EOB runs, and the multi-scan coefficient store
    against the independently-tested baseline path."""
    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (40, 56, 3)).astype(np.uint8), 90),
        (rng.integers(0, 256, (41, 53, 1)).astype(np.uint8), 75),
        (rng.integers(0, 256, (17, 9, 3)).astype(np.uint8), 100),
        (rng.integers(0, 256, (64, 64, 1)).astype(np.uint8), 30),
    ]
    yy, xx = np.mgrid[0:48, 0:48]
    cases.append((np.stack([xx * 4, yy * 4, (xx + yy) * 2], -1)
                  .astype(np.uint8), 85))  # smooth: EOB-heavy scans
    cases.append((np.full((16, 16, 1), 77, np.uint8), 90))  # flat
    for img, q in cases:
        a = jpeg_decode(jpeg_encode(img, quality=q))
        b = jpeg_decode(jpeg_encode_progressive(img, quality=q))
        assert a[:3] == b[:3]
        assert np.array_equal(a[3], b[3]), (img.shape, q)


def test_progressive_eobrun_gt1_and_zrl_decode():
    """EOBn>1 symbols (absent from the Annex K tables, so our encoder
    never emits them) and ZRL-within-band must decode: hand-build a
    16x8 progressive stream with a custom AC Huffman table containing
    EOB2 (0x10), ZRL (0xF0), 0x32 and 0x00, place one AC coefficient
    at zigzag index 20 of block 1, and cover both blocks' remainders
    with a single EOB2."""
    from locustdb_spark.operators.jpeg import (
        _ZZ, _BitWriter, _build_encode_table, _idct_blocks)

    # custom AC table: syms 0x00,0x10,0xF0,0x32 at lengths 2,2,2,3
    ac_bits = [0, 3, 1] + [0] * 13
    ac_vals = [0x00, 0x10, 0xF0, 0x32]
    enc = _build_encode_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    body = bytes([0x00]) + bytes(_K_DC_LUMA[0]) + bytes(_K_DC_LUMA[1])
    out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    body = bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    # scan 1: DC first Al=0, both blocks DC=40 (diff 40 then 0)
    sos = bytes([1, 1, 0x00, 0, 0, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    bw.write(4, 0b1110)        # DC sym 6
    bw.write(6, 0b101000)      # +40
    bw.write(2, 0b00)          # DC sym 0 (diff 0)
    bw.flush()
    out += bw.out

    # scan 2: AC first band 1-63 Al=0: block1 = ZRL + 3-run sym 0x32
    # value +2 at k=20, then EOB2 covering block1's tail and block2
    sos = bytes([1, 1, 0x00, 1, 63, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    ln, c = enc[0xF0]; bw.write(ln, c)        # skip 16 -> k=17
    ln, c = enc[0x32]; bw.write(ln, c)        # run 3 -> k=20, s=2
    bw.write(2, 0b10)                          # magnitude +2
    ln, c = enc[0x10]; bw.write(ln, c)        # EOB2
    bw.write(1, 0)                             # extension: 2+0
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"

    w, h, c, px = jpeg_decode(bytes(out))
    assert (w, h, c) == (16, 8, 1)
    # expected: block2 flat 133; block1 = IDCT of DC=40 + coef 2 at
    # zigzag 20, computed with the module's own (golden-pinned) IDCT
    coefs = np.zeros(64)
    coefs[_ZZ[0]] = 40
    coefs[_ZZ[20]] = 2
    exp1 = np.clip(_idct_blocks(coefs.reshape(1, 8, 8))[0] + 128,
                   0, 255).round().astype(np.uint8)
    assert np.array_equal(px[:, 8:, 0], np.full((8, 8), 133))
    assert np.array_equal(px[:, :8, 0], exp1)


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


def test_multimodal_dispatch_decodes_progressive_jpeg(spark):
    """A progressive (SOF2) payload flows through decode_media like a
    baseline one — no 'corrupt' degrade — and decodes to the same
    pixels a baseline encode of the same image would."""
    from locustdb_spark.operators import codecs
    from locustdb_spark.operators.multimodal import decode_media

    hh, ww = 16, 24
    yy, xx = np.mgrid[0:hh, 0:ww]
    img = np.stack([xx * 10, yy * 10, xx + yy], -1).astype(np.uint8)
    blob = jpeg_encode_progressive(img, quality=90)
    assert codecs.sniff(blob) == "jpeg"
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary")
    (row,) = decode_media(df).collect()
    assert row.format == "jpeg"
    assert (row.width, row.height, row.channels) == (ww, hh, 3)


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


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    quality=st.integers(5, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_progressive_equals_baseline(w, h, ch, quality, seed):
    """For ANY image size/content/quality, the progressive and
    baseline encodes decode bit-identically — the two entropy layers
    are lossless over the same quantized coefficients, so a single
    differing pixel means a refinement/EOB/band bug."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    a = jpeg_decode(jpeg_encode(img, quality=quality))
    b = jpeg_decode(jpeg_encode_progressive(img, quality=quality))
    assert a[:3] == b[:3]
    assert np.array_equal(a[3], b[3]), (w, h, ch, quality, seed)


def test_progressive_fuzz_rejected_quickly():
    """Byte-mutations of a valid progressive stream must raise a
    clean error or decode, never hang or crash the worker — the
    degrade contract decode_media relies on."""
    import time

    base = bytearray(_golden_progressive_sa())
    rng = np.random.default_rng(11)
    t0 = time.time()
    for _ in range(80):
        bad = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            bad[rng.integers(2, len(bad))] = rng.integers(0, 256)
        try:
            jpeg_decode(bytes(bad))
        except (ValueError, struct.error, IndexError, KeyError,
                ZeroDivisionError):
            pass
    assert time.time() - t0 < 30


def test_12bit_grayscale_roundtrip():
    """SOF1 12-bit extended sequential (r8): smooth 12-bit content
    round-trips within the 16x-scaled quantization error, output
    dtype uint16, full [0, 4095] range reachable."""
    import numpy as np

    from locustdb_spark.operators.jpeg import jpeg_decode, jpeg_encode

    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img = ((xx * 40 + yy * 25) % 4096).astype(np.uint16)[:, :, None]
    data = jpeg_encode(img, quality=95, precision=12)
    assert b"\xff\xc1" in data and b"\xff\xc0" not in data[2:]
    w, h, ch, out = jpeg_decode(data)
    assert (w, h, ch) == (48, 40, 1)
    assert out.dtype == np.uint16
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 32, err.max()  # quant step 48 -> +-24 worst


def test_12bit_rgb_and_extremes():
    import numpy as np

    from locustdb_spark.operators.jpeg import jpeg_decode, jpeg_encode

    sm = np.random.default_rng(5).integers(
        0, 4096, (24, 32, 3)).astype(float)
    for _ in range(4):
        sm[1:-1, 1:-1] = (sm[:-2, 1:-1] + sm[2:, 1:-1]
                          + sm[1:-1, :-2] + sm[1:-1, 2:]) / 4
    img = sm.astype(np.uint16)
    w, h, ch, out = jpeg_decode(jpeg_encode(img, quality=95,
                                            precision=12))
    assert (w, h, ch, out.dtype) == (32, 24, 3, np.dtype(np.uint16))
    # flat extremes land within one DC quantization step
    for v in (0, 4095):
        flat = np.full((8, 8, 1), v, np.uint16)
        _, _, _, o = jpeg_decode(jpeg_encode(flat, precision=12))
        assert abs(int(o[0, 0, 0]) - v) <= 3
    # checkerboard 0/4095 maximizes AC magnitude categories: must
    # stay inside the Annex K code books at any quality
    chk = (np.indices((16, 16)).sum(axis=0) % 2 * 4095) \
        .astype(np.uint16)[:, :, None]
    for q in (1, 50, 100):
        _, _, _, o = jpeg_decode(jpeg_encode(chk, quality=q,
                                             precision=12))
        assert o.dtype == np.uint16
    # out-of-range samples rejected
    import pytest
    with pytest.raises(ValueError, match="range"):
        jpeg_encode(np.full((8, 8, 1), 4096, np.uint16),
                    precision=12)
    with pytest.raises(ValueError, match="range"):
        jpeg_encode(np.full((8, 8, 1), 256, np.uint16), precision=8)
    with pytest.raises(ValueError, match="precision"):
        jpeg_encode(np.zeros((8, 8, 1), np.uint8), precision=10)


def test_12bit_baseline_sof0_rejected():
    """12-bit is only legal in extended sequential / progressive:
    a hand-corrupted SOF0 claiming 12-bit precision must raise."""
    import numpy as np
    import pytest

    from locustdb_spark.operators.jpeg import jpeg_decode, jpeg_encode

    img = np.zeros((8, 8, 1), np.uint16)
    data = bytearray(jpeg_encode(img, precision=12))
    i = data.find(b"\xff\xc1")
    data[i + 1] = 0xC0  # lie: baseline marker with precision byte 12
    with pytest.raises(ValueError, match="SOF0.*12"):
        jpeg_decode(bytes(data))


def test_16bit_dqt_parses_with_8bit_samples():
    """DQT Pq=1 is independent of sample precision: an 8-bit file
    carrying 16-bit quant values decodes (T.81 B.2.4.1)."""
    import struct

    import numpy as np

    from locustdb_spark.operators.jpeg import jpeg_decode, jpeg_encode

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3)[:, :, None]
    data = bytearray(jpeg_encode(img, quality=90))
    i = data.find(b"\xff\xdb")
    (ln,) = struct.unpack_from(">H", data, i + 2)
    tq = data[i + 4] & 15
    vals = list(data[i + 5:i + 5 + 64])
    wide = bytes([0x10 | tq]) + b"".join(
        struct.pack(">H", v) for v in vals)
    new = data[:i + 2] + struct.pack(">H", len(wide) + 2) + wide + \
        data[i + 2 + ln:]
    w, h, ch, out = jpeg_decode(bytes(new))
    _, _, _, ref = jpeg_decode(bytes(data))
    assert np.array_equal(out, ref)


def test_12bit_full_range_survives_all_qualities():
    """Review regression: quality >= 96 used to drive the scaled DC
    quant to 16, pushing a full-range DC diff to category 12 — past
    the Annex K DC table — and raising a raw KeyError. The 12-bit
    base-table clamp keeps every magnitude category in range."""
    import numpy as np

    from locustdb_spark.operators.jpeg import jpeg_decode, jpeg_encode

    chk = (np.indices((16, 16)).sum(axis=0) % 2 * 4095) \
        .astype(np.uint16)[:, :, None]
    flat_hi = np.full((16, 16, 1), 4095, np.uint16)
    for q in (95, 96, 97, 100):
        for img in (chk, flat_hi):
            _, _, _, out = jpeg_decode(jpeg_encode(img, quality=q,
                                                   precision=12))
            assert out.dtype == np.uint16


def test_png_encode_rejects_non_uint8():
    """Review regression: a 12-bit jpeg_decode result fed to
    png_encode must raise, not wrap 256..4095 modulo 256 into a
    structurally valid garbage PNG."""
    import numpy as np
    import pytest

    from locustdb_spark.operators.codecs import png_encode

    with pytest.raises(ValueError, match="uint8"):
        png_encode(np.full((4, 4, 1), 4095, np.uint16))
