"""H.264 inter (P slice) layer: encode->decode->reference equality,
an INDEPENDENT scalar reimplementation of the §8.4.2.2 interpolators,
MV-prediction/P_Skip unit cases, and adversarial bitstreams.
(operators/h264_inter.py; the intra layer it extends is covered by
test_h264_decode.py)."""

import numpy as np
import pytest

from locustdb_spark.operators.h264 import H264ParseError
from locustdb_spark.operators.h264_decode import (BLK_ZSCAN,
                                                  H264UnsupportedError)
from locustdb_spark.operators.h264_inter import (
    CBP_INTER, CBP_INTER_INV, decode_gop, encode_gop,
    interpolate_chroma, interpolate_luma, predict_mv_16x16,
    reference_gop_reconstruction, skip_mv)


def _i_mb(dc: int) -> dict:
    return {"kind": "i16x16", "mode": 2, "dc": [dc] + [0] * 15,
            "ac": None, "chroma_mode": 0, "cbp_chroma": 0}


def _textured_idr(w_mbs: int, h_mbs: int, seed: int = 3) -> list[dict]:
    """Intra_4x4 DC-only MbSpecs with per-block variation — a
    non-flat reference picture for motion tests."""
    rng = np.random.RandomState(seed)
    mbs = []
    for _ in range(w_mbs * h_mbs):
        luma = []
        for blk in range(16):
            lv = [0] * 16
            lv[0] = int(rng.randint(-4, 5))
            luma.append(lv)
        mbs.append({"kind": "i4x4", "modes": [2] * 16, "luma": luma,
                    "chroma_mode": 0, "cbp_chroma": 0})
    return mbs


# ---------------------------------------------------------------------
# independent interpolation reference (scalar, straight from §8.4.2.2)
# ---------------------------------------------------------------------

def _luma_sample_ref(ref: np.ndarray, px: int, py: int) -> int:
    """One quarter-sample luma value at quarter-resolution coords
    (px, py), written independently of interpolate_luma: per-sample
    edge clamping, scalar 6-tap halves, (v+16)>>5 / (v+512)>>10
    rounding, quarter averaging."""
    H_, W_ = ref.shape

    def at(x, y):
        return int(ref[min(max(y, 0), H_ - 1), min(max(x, 0), W_ - 1)])

    xi, yi = px >> 2, py >> 2
    xf, yf = px & 3, py & 3

    def clip(v):
        return min(max(v, 0), 255)

    def half_h(x, y):  # b at (x+1/2, y), un-rounded
        return (at(x - 2, y) - 5 * at(x - 1, y) + 20 * at(x, y)
                + 20 * at(x + 1, y) - 5 * at(x + 2, y) + at(x + 3, y))

    def half_v(x, y):  # h at (x, y+1/2), un-rounded
        return (at(x, y - 2) - 5 * at(x, y - 1) + 20 * at(x, y)
                + 20 * at(x, y + 1) - 5 * at(x, y + 2) + at(x, y + 3))

    def b(x, y):
        return clip((half_h(x, y) + 16) >> 5)

    def h(x, y):
        return clip((half_v(x, y) + 16) >> 5)

    def j(x, y):  # center: 6-tap vertically over un-rounded b1
        acc = (half_h(x, y - 2) - 5 * half_h(x, y - 1)
               + 20 * half_h(x, y) + 20 * half_h(x, y + 1)
               - 5 * half_h(x, y + 2) + half_h(x, y + 3))
        return clip((acc + 512) >> 10)

    G = at(xi, yi)
    table = {
        (0, 0): lambda: G,
        (1, 0): lambda: (G + b(xi, yi) + 1) >> 1,
        (2, 0): lambda: b(xi, yi),
        (3, 0): lambda: (b(xi, yi) + at(xi + 1, yi) + 1) >> 1,
        (0, 1): lambda: (G + h(xi, yi) + 1) >> 1,
        (1, 1): lambda: (b(xi, yi) + h(xi, yi) + 1) >> 1,
        (2, 1): lambda: (b(xi, yi) + j(xi, yi) + 1) >> 1,
        (3, 1): lambda: (b(xi, yi) + h(xi + 1, yi) + 1) >> 1,
        (0, 2): lambda: h(xi, yi),
        (1, 2): lambda: (h(xi, yi) + j(xi, yi) + 1) >> 1,
        (2, 2): lambda: j(xi, yi),
        (3, 2): lambda: (j(xi, yi) + h(xi + 1, yi) + 1) >> 1,
        (0, 3): lambda: (h(xi, yi) + at(xi, yi + 1) + 1) >> 1,
        (1, 3): lambda: (h(xi, yi) + b(xi, yi + 1) + 1) >> 1,
        (2, 3): lambda: (j(xi, yi) + b(xi, yi + 1) + 1) >> 1,
        (3, 3): lambda: (h(xi + 1, yi) + b(xi, yi + 1) + 1) >> 1,
    }
    return table[(xf, yf)]()


def test_interpolate_luma_matches_independent_scalar_reference():
    """All 16 fractional positions, including windows clamped past
    every picture edge, against the scalar spec transcription above
    — two implementations written separately must agree exactly."""
    rng = np.random.RandomState(11)
    ref = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    for xf in range(4):
        for yf in range(4):
            for (x0, y0, mvi_x, mvi_y) in [(8, 4, 3, 2), (0, 0, -7, -9),
                                           (32, 12, 9, 11),
                                           (36, 20, 2, 1)]:
                mv = (mvi_x * 4 + xf, mvi_y * 4 + yf)
                got = interpolate_luma(ref, x0, y0, mv[0], mv[1], 4)
                exp = np.array([[_luma_sample_ref(
                    ref, (x0 + dx) * 4 + mv[0], (y0 + dy) * 4 + mv[1])
                    for dx in range(4)] for dy in range(4)])
                assert np.array_equal(got, exp), (xf, yf, x0, y0)


def test_interpolate_chroma_matches_independent_scalar_reference():
    rng = np.random.RandomState(12)
    ref = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    Hc, Wc = ref.shape

    def at(x, y):
        return int(ref[min(max(y, 0), Hc - 1), min(max(x, 0), Wc - 1)])

    for mvx in (-13, -3, 0, 5, 21):
        for mvy in (-9, 0, 7, 18):
            got = interpolate_chroma(ref, 4, 4, mvx, mvy, 8)
            xf, yf = mvx & 7, mvy & 7
            exp = np.array([[
                ((8 - xf) * (8 - yf)
                 * at(4 + dx + (mvx >> 3), 4 + dy + (mvy >> 3))
                 + xf * (8 - yf)
                 * at(5 + dx + (mvx >> 3), 4 + dy + (mvy >> 3))
                 + (8 - xf) * yf
                 * at(4 + dx + (mvx >> 3), 5 + dy + (mvy >> 3))
                 + xf * yf
                 * at(5 + dx + (mvx >> 3), 5 + dy + (mvy >> 3))
                 + 32) >> 6
                for dx in range(8)] for dy in range(8)])
            assert np.array_equal(got, exp), (mvx, mvy)


# ---------------------------------------------------------------------
# MV prediction unit cases (§8.4.1)
# ---------------------------------------------------------------------

def test_predict_mv_median_single_match_and_a_only():
    # median: A, B, C all inter ref 0 -> component-wise median
    ref = {(0, 0): 0, (1, 0): 0, (2, 0): 0, (0, 1): 0}
    mv = {(0, 0): (4, 40), (1, 0): (8, 8), (2, 0): (2, 12),
          (0, 1): (16, -4)}
    # predicting (1,1): A=(0,1) (16,-4), B=(1,0) (8,8), C=(2,0) (2,12)
    assert predict_mv_16x16(ref, mv, 1, 1, 3) == (8, 8)
    # single matching refIdx: make B and C intra
    ref2 = {(0, 1): 0, (1, 0): -1, (2, 0): -1}
    mv2 = {(0, 1): (16, -4), (1, 0): (0, 0), (2, 0): (0, 0)}
    assert predict_mv_16x16(ref2, mv2, 1, 1, 3) == (16, -4)
    # A-only fallback: first row, A available (even intra A counts as
    # available, giving mv 0)
    ref3 = {(0, 0): 0}
    mv3 = {(0, 0): (-8, 4)}
    assert predict_mv_16x16(ref3, mv3, 1, 0, 3) == (-8, 4)
    ref4 = {(0, 0): -1}
    assert predict_mv_16x16(ref4, {}, 1, 0, 3) == (0, 0)


def test_skip_mv_zero_conditions():
    # A unavailable (left edge) -> 0
    assert skip_mv({(0, 0): 0}, {(0, 0): (8, 8)}, 0, 1, 3) == (0, 0)
    # B unavailable (top row) -> 0
    assert skip_mv({(0, 0): 0}, {(0, 0): (8, 8)}, 1, 0, 3) == (0, 0)
    # A inter with zero mv and ref 0 -> 0
    ref = {(0, 1): 0, (1, 0): 0, (2, 0): 0}
    mv = {(0, 1): (0, 0), (1, 0): (8, 8), (2, 0): (8, 8)}
    assert skip_mv(ref, mv, 1, 1, 3) == (0, 0)
    # neither zero-condition -> the 16x16 predictor
    mv2 = {(0, 1): (4, 4), (1, 0): (8, 8), (2, 0): (6, 2)}
    assert skip_mv(ref, mv2, 1, 1, 3) == \
        predict_mv_16x16(ref, mv2, 1, 1, 3)


# ---------------------------------------------------------------------
# GOP round trips
# ---------------------------------------------------------------------

def test_gop_all_skip_copies_the_idr():
    idr = [_i_mb(5 + i) for i in range(6)]
    gop = [("idr", idr), ("p", [{"kind": "skip"}] * 6)]
    frames = decode_gop(encode_gop(gop, 3, 2))
    assert len(frames) == 2
    assert frames[1].mb_types == ["skip"] * 6
    for plane in ("y", "cb", "cr"):
        assert np.array_equal(getattr(frames[0], plane),
                              getattr(frames[1], plane))


def test_gop_integer_mv_is_exact_clamped_shift():
    idr = _textured_idr(3, 2)
    mv = (4 * 4, 2 * 4)  # full-pel (4, 2)
    p = [{"kind": "p16x16", "mv": mv, "luma": None,
          "cbp_chroma": 0}] * 6
    frames = decode_gop(encode_gop([("idr", idr), ("p", p)], 3, 2))
    ref = frames[0].y.astype(int)
    ys = np.clip(np.arange(32) + 2, 0, 31)
    xs = np.clip(np.arange(48) + 4, 0, 47)
    assert np.array_equal(frames[1].y, ref[np.ix_(ys, xs)])


def test_gop_fractional_mv_residual_and_chain_match_reference():
    """Random fractional vectors + sparse residuals across a 3-frame
    chain: the bit layer (skip runs, mvd, inter CBP, nC carry-over)
    must reproduce the spec-side reference planes exactly."""
    rng = np.random.RandomState(7)
    idr = _textured_idr(3, 2, seed=5)
    p1 = []
    for _ in range(6):
        luma = [[0] * 16 for _ in range(16)]
        luma[rng.randint(16)][0] = int(rng.randint(-4, 5)) or 2
        p1.append({"kind": "p16x16",
                   "mv": (int(rng.randint(-9, 10)),
                          int(rng.randint(-9, 10))),
                   "luma": luma, "cbp_chroma": 1,
                   "chroma_dc": [[1, 0, 0, 0], [-1, 0, 0, 0]]})
    p2 = [{"kind": "skip"}, {"kind": "skip"},
          {"kind": "p16x16", "mv": (5, -6), "luma": None,
           "cbp_chroma": 0},
          {"kind": "skip"},
          {"kind": "p16x16", "mv": (-3, 7), "luma": None,
           "cbp_chroma": 0},
          {"kind": "skip"}]
    gop = [("idr", idr), ("p", p1), ("p", p2)]
    frames = decode_gop(encode_gop(gop, 3, 2))
    ref = reference_gop_reconstruction(gop, 3, 2)
    for fi in range(3):
        assert np.array_equal(frames[fi].y, ref[fi][0]), f"luma f{fi}"
        assert np.array_equal(frames[fi].cb, ref[fi][1]), f"cb f{fi}"
        assert np.array_equal(frames[fi].cr, ref[fi][2]), f"cr f{fi}"


def test_gop_intra_mb_inside_p_slice():
    idr = [_i_mb(4 + i) for i in range(6)]
    p = [{"kind": "skip"}] * 6
    p[2] = _i_mb(9)
    p[3] = {"kind": "p16x16", "mv": (0, 4), "luma": None,
            "cbp_chroma": 0}
    i4 = _textured_idr(1, 1, seed=9)[0]
    p[4] = i4
    frames = decode_gop(encode_gop([("idr", idr), ("p", p)], 3, 2))
    assert frames[1].mb_types == ["skip", "skip", "i16x16", "p16x16",
                                  "i4x4", "skip"]
    # skipped MBs (0, 1 top-left; 5 bottom-right) copy the IDR exactly
    assert np.array_equal(frames[1].y[:16, :32], frames[0].y[:16, :32])
    assert np.array_equal(frames[1].y[16:, 32:], frames[0].y[16:, 32:])


def test_gop_residual_only_p_mb_round_trip():
    """cbp_luma=15 + cbp_chroma=2 on a zero-mv P macroblock: the
    inter CBP path and chroma AC parse in P context."""
    idr = [_i_mb(6)]
    luma = [[3, -1, 0, 1] + [0] * 12 for _ in range(16)]
    p = [{"kind": "p16x16", "mv": (0, 0), "luma": luma,
          "cbp_chroma": 2,
          "chroma_dc": [[2, 0, 0, 0], [0, 0, 0, 0]],
          "chroma_ac": [[[1] + [0] * 14 for _ in range(4)],
                        [[0] * 15 for _ in range(4)]]}]
    gop = [("idr", idr), ("p", p)]
    frames = decode_gop(encode_gop(gop, 1, 1))
    ref = reference_gop_reconstruction(gop, 1, 1)
    assert np.array_equal(frames[1].y, ref[1][0])
    assert np.array_equal(frames[1].cb, ref[1][1])
    assert np.array_equal(frames[1].cr, ref[1][2])


def test_cbp_inter_table_is_a_permutation():
    assert sorted(CBP_INTER) == list(range(48))
    assert all(CBP_INTER[CBP_INTER_INV[c]] == c for c in range(48))


# ---------------------------------------------------------------------
# adversarial bitstreams / API misuse
# ---------------------------------------------------------------------

def test_p_picture_without_reference_rejected():
    idr = [_i_mb(5)]
    p = [{"kind": "skip"}]
    gop_bytes = encode_gop([("idr", idr), ("p", p)], 1, 1)
    # drop the IDR slice NAL (the third NAL: SPS, PPS, IDR, P)
    nals = gop_bytes.split(b"\x00\x00\x00\x01")[1:]
    crippled = b"".join(b"\x00\x00\x00\x01" + n
                        for n in (nals[0], nals[1], nals[3]))
    with pytest.raises(H264ParseError, match="without a reference"):
        decode_gop(crippled)


def test_truncated_p_picture_rejected():
    idr = [_i_mb(5 + i) for i in range(4)]
    p = [{"kind": "p16x16", "mv": (8, 8), "luma": None,
          "cbp_chroma": 0}] * 4
    blob = encode_gop([("idr", idr), ("p", p)], 2, 2)
    with pytest.raises(H264ParseError):
        decode_gop(blob[:-3])


def test_unsupported_p_partitions_raise_by_name():
    """A hand-built P slice declaring P_L0_L0_16x8 (mb_type 1) must
    raise H264UnsupportedError, not mis-decode."""
    from locustdb_spark.operators.h264 import (BitWriter,
                                               add_emulation_prevention,
                                               build_sps)
    from locustdb_spark.operators.h264_decode import build_pps_pixels
    from locustdb_spark.operators.h264_inter import _InterEncoder

    idr = [_i_mb(5)]
    head = encode_gop([("idr", idr)], 1, 1)
    w = BitWriter()
    w.ue(0).ue(5).ue(0)     # first_mb, slice_type P, pps_id
    w.u(1, 4).u(2, 4)       # frame_num, poc_lsb
    w.u(0, 1).u(0, 1).u(0, 1)  # overrides/modification/marking
    w.se(0)                 # slice_qp_delta
    w.ue(1)                 # deblocking off
    w.ue(0)                 # mb_skip_run
    w.ue(1)                 # mb_type P_L0_L0_16x8 — unsupported
    w.u(0, 20)
    w.rbsp_trailing()
    nal = bytes([0x21]) + add_emulation_prevention(w.bytes())
    with pytest.raises(H264UnsupportedError, match="P mb_type"):
        decode_gop(head + b"\x00\x00\x00\x01" + nal)


def test_out_of_scope_pps_features_raise_by_name():
    """weighted_pred / redundant_pic_cnt / constrained_intra PPS
    flags put unread fields in (or change the semantics of) P slice
    headers — the decoder must reject by name, never misparse
    (review finding: the weighted_pred bits would otherwise be read
    as marking/QP fields and decode valid-looking garbage)."""
    from locustdb_spark.operators.h264 import (BitWriter,
                                               add_emulation_prevention)
    from locustdb_spark.operators.h264_decode import parse_pps_full

    def pps_with(weighted=0, redundant=0, constrained=0):
        w = BitWriter()
        w.ue(0).ue(0)
        w.u(0, 1)              # CAVLC
        w.u(0, 1)
        w.ue(0)
        w.ue(0).ue(0)
        w.u(weighted, 1)       # weighted_pred_flag
        w.u(0, 2)
        w.se(0).se(0).se(0)
        w.u(1, 1)              # deblocking control present
        w.u(constrained, 1)
        w.u(redundant, 1)
        w.rbsp_trailing()
        return bytes([0x68]) + add_emulation_prevention(w.bytes())

    assert parse_pps_full(pps_with(weighted=1)[1:]).weighted_pred
    idr = [_i_mb(5)]
    base = encode_gop([("idr", idr), ("p", [{"kind": "skip"}])], 1, 1)
    nals = base.split(b"\x00\x00\x00\x01")[1:]  # SPS, PPS, IDR, P
    for kwargs, msg in [({"weighted": 1}, "weighted"),
                        ({"redundant": 1}, "redundant"),
                        ({"constrained": 1}, "constrained")]:
        swapped = b"".join(
            b"\x00\x00\x00\x01" + (pps_with(**kwargs)
                                   if i == 1 else n)
            for i, n in enumerate(nals))
        with pytest.raises(H264UnsupportedError, match=msg):
            decode_gop(swapped)


def test_multi_reference_override_raises():
    from locustdb_spark.operators.h264 import (BitWriter,
                                               add_emulation_prevention)

    idr = [_i_mb(5)]
    head = encode_gop([("idr", idr)], 1, 1)
    w = BitWriter()
    w.ue(0).ue(5).ue(0)
    w.u(1, 4).u(2, 4)
    w.u(1, 1)   # num_ref_idx_active_override_flag = 1
    w.ue(1)     # num_ref_idx_l0_active_minus1 = 1 (two refs)
    w.u(0, 1).u(0, 1)
    w.se(0)
    w.ue(1)
    w.rbsp_trailing()
    nal = bytes([0x21]) + add_emulation_prevention(w.bytes())
    with pytest.raises(H264UnsupportedError, match="reference"):
        decode_gop(head + b"\x00\x00\x00\x01" + nal)


def test_encode_gop_rejects_bad_shapes():
    idr = [_i_mb(5)]
    with pytest.raises(ValueError, match="IDR"):
        encode_gop([("p", [{"kind": "skip"}])], 1, 1)
    with pytest.raises(ValueError, match="count"):
        encode_gop([("idr", idr * 2)], 1, 1)
    with pytest.raises(ValueError, match="pcm"):
        encode_gop([("idr", idr),
                    ("p", [{"kind": "pcm", "y": bytes(256),
                            "cb": bytes(64), "cr": bytes(64)}])],
                   1, 1)


def test_gop_operator_fixture_round_trip(spark):
    """The multimodal GOP fixture decodes to valid per-frame stats,
    P3 (all-skip) equals P2, and corrupt payloads degrade to
    valid=false rows (operators/multimodal.py)."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.multimodal import (
        h264_gop_stats, with_h264_gop_payload)

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    payloads = with_h264_gop_payload(docs)
    out = h264_gop_stats(payloads).collect()
    assert len(out) == 48 and all(r.valid for r in out)
    by_frame = {(r.doc_id, r.frame_id): (r.y_sum, r.y_weighted)
                for r in out}
    for i in range(12):
        assert by_frame[(i, 2)] == by_frame[(i, 3)]  # skip == copy
    corrupt = payloads.withColumn(
        "payload", F.expr("substring(payload, 1, 40)"))
    bad = h264_gop_stats(corrupt).collect()
    assert all(not r.valid for r in bad)
