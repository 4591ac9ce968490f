"""H.264 intra pixel decode (operators/h264_decode.py): table
hygiene, spec-golden spot checks, encode->decode->reference-
reconstruction equality across all macroblock kinds / prediction
modes / QPs, the DC-only closed form the oracle entry rides, and
adversarial bitstreams. The encoder and decoder share only the VLC
tables and the mode-prediction rule; reconstruction is implemented
twice (scalar parse-driven vs spec-driven), so a roundtrip match is
evidence the bit layer round-trips, not a tautology."""

from __future__ import annotations

import random

import numpy as np
import pytest

from locustdb_spark.operators.h264 import BitReader, H264ParseError
from locustdb_spark.operators import h264_decode as hd


# ---------------------------------------------------------------------
# table hygiene: every VLC table prefix-free and collision-free
# ---------------------------------------------------------------------

def _codes(table):
    if isinstance(table, dict):
        return list(table.values())
    return list(table)


@pytest.mark.parametrize("name,table", [
    ("coeff_token_nc0", hd.COEFF_TOKEN_NC0),
    ("coeff_token_nc2", hd.COEFF_TOKEN_NC2),
    ("coeff_token_nc4", hd.COEFF_TOKEN_NC4),
    ("coeff_token_chroma_dc", hd.COEFF_TOKEN_CHROMA_DC),
    *[(f"total_zeros_tc{tc}", codes)
      for tc, codes in hd.TOTAL_ZEROS_4X4.items()],
    *[(f"total_zeros_chroma_tc{tc}", codes)
      for tc, codes in hd.TOTAL_ZEROS_CHROMA_DC.items()],
    *[(f"run_before_zl{zl}", codes)
      for zl, codes in hd.RUN_BEFORE.items()],
])
def test_vlc_table_prefix_free(name, table):
    codes = _codes(table)
    assert len(set(codes)) == len(codes), f"{name}: duplicate codes"
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        assert not b.startswith(a), f"{name}: {a} is a prefix of {b}"


def test_cbp_intra_table_is_permutation():
    assert sorted(hd.CBP_INTRA) == list(range(48))
    # the encoder-emitted subset (HIGH confidence, Table 9-4)
    assert hd.CBP_INTRA[:4] == [47, 31, 15, 0]


# ---------------------------------------------------------------------
# spec-golden spot checks (hand-derivable bit patterns)
# ---------------------------------------------------------------------

def _bits(s: str) -> BitReader:
    padded = s + "0" * (-len(s) % 8)
    return BitReader(bytes(int(padded[i:i + 8], 2)
                           for i in range(0, len(padded), 8)))


def test_cavlc_empty_block_is_single_bit():
    # Table 9-2, nC<2: TotalCoeff=0 is the 1-bit code "1"
    r = _bits("1")
    assert hd.decode_residual_block(r, 0, 16) == [0] * 16
    assert r._pos == 1


def test_cavlc_single_trailing_one():
    # coeff_token (T1=1, TC=1) = "01"; sign bit 0 -> +1 at scan 0;
    # total_zeros (TC=1) = "1" -> 0
    r = _bits("01" + "0" + "1")
    coeffs = hd.decode_residual_block(r, 0, 16)
    assert coeffs[0] == 1 and sum(map(abs, coeffs)) == 1


def test_cavlc_dc_level_2():
    # (T1=0, TC=1) = "000101"; level_prefix 2 ("001") suffixLen 0 ->
    # levelCode 2 (+2 first-coeff adjust -> 4) -> level +3?? No:
    # levelCode = 2 + 2 = 4 -> even -> (4+2)>>1 = 3. Verify via the
    # encoder (the hand-derivation is the point of this test).
    from locustdb_spark.operators.h264 import BitWriter
    w = BitWriter()
    hd.encode_residual_block(w, [3] + [0] * 15, 0)
    r = BitReader(w.bytes())
    got = hd.decode_residual_block(r, 0, 16)
    assert got[0] == 3


def test_idct_dc_only_is_4d_at_qp28():
    # the oracle identity: lone DC level d at QP 28 -> constant 4*d
    for d in range(-8, 9):
        block = hd.idct_4x4(hd.dequant_4x4([d] + [0] * 15, 28))
        assert all(v == 4 * d for row in block for v in row), (d, block)


def test_dequant_weight_classes():
    # §8.5.12.1 position classes at qp%6 = 4: 16 / 25 / 20
    assert hd.dequant_weight(4, 0, 0) == 16
    assert hd.dequant_weight(4, 1, 1) == 25
    assert hd.dequant_weight(4, 0, 1) == 20


def test_hadamard_involution_scale():
    # H (H c H) H = 16 c — the 4x4 Hadamard is self-inverse up to 16
    rng = random.Random(1)
    c = [[rng.randint(-9, 9) for _ in range(4)] for _ in range(4)]
    twice = hd.hadamard_4x4(hd.hadamard_4x4(c))
    assert all(twice[i][j] == 16 * c[i][j]
               for i in range(4) for j in range(4))


def test_chroma_qp_mapping():
    assert hd.chroma_qp(28) == 28      # identity through 29
    assert hd.chroma_qp(30) == 29      # Table 8-15 compression
    assert hd.chroma_qp(51) == 39


# ---------------------------------------------------------------------
# roundtrips: encode -> decode == reference reconstruction
# ---------------------------------------------------------------------

def _rand_block(rng, n, density, mag):
    b = [0] * n
    for i in range(n):
        if rng.random() < density:
            v = rng.randint(1, mag)
            b[i] = v if rng.random() < 0.5 else -v
    return b


def _rand_mb(rng, mbx, mby):
    kind = rng.choice(["i4x4", "i16x16", "pcm"])
    if kind == "pcm":
        return {"kind": "pcm",
                "y": bytes(rng.randint(0, 255) for _ in range(256)),
                "cb": bytes(rng.randint(0, 255) for _ in range(64)),
                "cr": bytes(rng.randint(0, 255) for _ in range(64))}
    cbp_chroma = rng.choice([0, 1, 2])
    chroma_mode = rng.choice([0, 1, 2, 3]) if (mbx and mby) else 0
    chroma = {
        "chroma_mode": chroma_mode, "cbp_chroma": cbp_chroma,
        "chroma_dc": [_rand_block(rng, 4, 0.5, 4) for _ in range(2)],
        "chroma_ac": [[_rand_block(rng, 15, 0.3, 3) for _ in range(4)]
                      for _ in range(2)]}
    if kind == "i16x16":
        mode = 2
        if mbx and mby:
            mode = rng.choice([0, 1, 2, 3])
        elif mby:
            mode = rng.choice([0, 2])
        elif mbx:
            mode = rng.choice([1, 2])
        return {"kind": "i16x16", "mode": mode,
                "dc": _rand_block(rng, 16, 0.5, 5),
                "ac": ([_rand_block(rng, 15, 0.3, 4)
                        for _ in range(16)]
                       if rng.random() < 0.7 else None),
                **chroma}
    modes = []
    for blk in range(16):
        bx, by = hd.BLK_ZSCAN[blk]
        gx, gy = mbx * 4 + bx, mby * 4 + by
        cand = [2]
        if gy > 0:
            cand += [0, 3, 7]
        if gx > 0:
            cand += [1, 8]
        if gx > 0 and gy > 0:
            cand += [4, 5, 6]
        modes.append(rng.choice(cand))
    return {"kind": "i4x4", "modes": modes,
            "luma": [_rand_block(rng, 16, 0.35, 6) for _ in range(16)],
            **chroma}


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_randomized(seed):
    """Randomized multi-MB frames across kinds, every prediction
    mode, dense multi-coefficient residuals, and a QP spread: the
    decoded planes must equal the spec-driven reconstruction
    bit-for-bit."""
    rng = random.Random(1000 + seed)
    w_mbs, h_mbs = rng.choice([(1, 1), (2, 1), (2, 2), (3, 2), (4, 3)])
    mbs = [_rand_mb(rng, a % w_mbs, a // w_mbs)
           for a in range(w_mbs * h_mbs)]
    qp = rng.choice([16, 20, 24, 26, 28, 32, 36, 40, 44])
    stream = hd.encode_i_frame(mbs, w_mbs, h_mbs, qp=qp)
    fr = hd.decode_i_frame(stream)
    ry, rcb, rcr = hd.reference_reconstruction(mbs, w_mbs, h_mbs,
                                               qp=qp)
    assert np.array_equal(fr.y, ry)
    assert np.array_equal(fr.cb, rcb)
    assert np.array_equal(fr.cr, rcr)
    assert fr.mb_types == [m["kind"] for m in mbs]


def test_roundtrip_pcm_exact():
    """I_PCM is lossless: decoded pixels ARE the payload bytes."""
    y = bytes(range(256))
    cb = bytes(range(64))
    cr = bytes(reversed(range(64)))
    fr = hd.decode_i_frame(hd.encode_i_frame(
        [{"kind": "pcm", "y": y, "cb": cb, "cr": cr}], 1, 1))
    assert bytes(fr.y.flatten()) == y
    assert bytes(fr.cb.flatten()) == cb
    assert bytes(fr.cr.flatten()) == cr


def test_roundtrip_max_coefficients():
    """A fully dense 16-coefficient block exercises the deep
    coeff_token rows, suffix-length adaptation, and every run."""
    rng = random.Random(7)
    luma = []
    for _ in range(16):
        b = [rng.choice([-1, 1]) * rng.randint(1, 9)
             for _ in range(16)]
        luma.append(b)
    mbs = [{"kind": "i4x4", "modes": [2] * 16, "luma": luma,
            "chroma_mode": 0, "cbp_chroma": 2,
            "chroma_dc": [[1, -2, 3, -1], [2, 0, -4, 1]],
            "chroma_ac": [[[1] * 15 for _ in range(4)]
                          for _ in range(2)]}]
    stream = hd.encode_i_frame(mbs, 1, 1, qp=30)
    fr = hd.decode_i_frame(stream)
    ry, rcb, rcr = hd.reference_reconstruction(mbs, 1, 1, qp=30)
    assert np.array_equal(fr.y, ry)
    assert np.array_equal(fr.cb, rcb)
    assert np.array_equal(fr.cr, rcr)


def test_oracle_dc_closed_form():
    """The exact identity the multimodal_h264_pixels oracle rides:
    per-block DC levels d -> constant blocks following the DC
    prediction recurrence with residual 4*d, never clipping."""
    for doc_id in (0, 1, 7, 123, 4999):
        d = [((doc_id * 7 + 5 * k) % 9) - 4 for k in range(16)]
        luma = []
        for blk in range(16):
            bx, by = hd.BLK_ZSCAN[blk]
            lv = [0] * 16
            lv[0] = d[by * 4 + bx]
            luma.append(lv)
        fr = hd.decode_i_frame(hd.encode_i_frame(
            [{"kind": "i4x4", "modes": [2] * 16, "luma": luma,
              "chroma_mode": 0, "cbp_chroma": 0}], 1, 1, qp=28))
        c = {}
        for by in range(4):
            for bx in range(4):
                if bx == 0 and by == 0:
                    pred = 128
                elif by == 0:
                    pred = c[(by, bx - 1)]
                elif bx == 0:
                    pred = c[(by - 1, bx)]
                else:
                    pred = (c[(by, bx - 1)] + c[(by - 1, bx)] + 1) >> 1
                c[(by, bx)] = pred + 4 * d[by * 4 + bx]
                blockpix = fr.y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                assert (blockpix == c[(by, bx)]).all()
                assert 16 <= c[(by, bx)] <= 240  # no clipping ever
        assert (fr.cb == 128).all() and (fr.cr == 128).all()


# ---------------------------------------------------------------------
# adversarial / degrade paths
# ---------------------------------------------------------------------

def _golden_stream():
    return hd.encode_i_frame(
        [{"kind": "i4x4", "modes": [2] * 16,
          "luma": [[1] + [0] * 15 for _ in range(16)],
          "chroma_mode": 0, "cbp_chroma": 0}], 1, 1)


def test_truncated_stream_raises():
    s = _golden_stream()
    with pytest.raises(H264ParseError):
        hd.decode_i_frame(s[:len(s) - 6])


def test_cabac_stream_rejected_with_named_error():
    from locustdb_spark.operators import h264
    nals = [h264.build_sps(1, 1), h264.build_pps(cabac=True),
            h264.build_slice()]
    with pytest.raises(hd.H264UnsupportedError, match="CABAC"):
        hd.decode_i_frame(h264.build_annexb_stream(nals))


def test_deblocking_on_rejected_with_named_error():
    from locustdb_spark.operators import h264
    # a FULL slice header against the syntax module's PPS (deblocking
    # control absent -> the loop filter would be active -> out of
    # pixel-exact scope; build_slice itself writes only the prefix
    # header, so hand-assemble the complete one here)
    w = h264.BitWriter()
    w.ue(0).ue(7).ue(0)      # first_mb, slice_type I, pps_id
    w.u(0, 4)                # frame_num
    w.ue(0)                  # idr_pic_id
    w.u(0, 4)                # pic_order_cnt_lsb
    w.u(0, 2)                # dec_ref_pic_marking (IDR)
    w.se(0)                  # slice_qp_delta
    w.rbsp_trailing()
    sl = bytes([0x65]) + h264.add_emulation_prevention(w.bytes())
    nals = [h264.build_sps(1, 1), h264.build_pps(cabac=False), sl]
    with pytest.raises(hd.H264UnsupportedError, match="deblocking"):
        hd.decode_i_frame(h264.build_annexb_stream(nals))


def test_garbage_payload_raises():
    with pytest.raises(H264ParseError):
        hd.decode_i_frame(b"\x00\x01\x02\x03" * 10)


def test_missing_sps_raises():
    from locustdb_spark.operators import h264
    with pytest.raises(H264ParseError, match="lacks"):
        hd.decode_i_frame(h264.build_annexb_stream(
            [h264.build_pps()]))


def test_emulation_prevention_roundtrip():
    """PCM bytes chosen to force 00 00 0x runs through the EPB
    escape: the stream survives NAL framing intact."""
    y = bytes([0, 0, 1, 0, 0, 2, 0, 0, 3] * 28 + [0] * 4)
    mb = {"kind": "pcm", "y": y, "cb": bytes(64), "cr": bytes(64)}
    fr = hd.decode_i_frame(hd.encode_i_frame([mb], 1, 1))
    assert bytes(fr.y.flatten()) == y


# ---------------------------------------------------------------------
# Spark operator plumbing
# ---------------------------------------------------------------------

def test_h264_pixel_stats_operator(spark):
    """mapInPandas plumbing: payload build + decode + stats for a
    slice of doc_ids, checked against the closed form; a corrupt
    payload degrades to valid=false without failing the batch."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.multimodal import (
        h264_pixel_stats, with_h264_pixel_payload)

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    out = h264_pixel_stats(with_h264_pixel_payload(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 40
    for doc_id in (0, 13, 39):
        d = [((doc_id * 7 + 5 * k) % 9) - 4 for k in range(16)]
        c, ysum = {}, 0
        for by in range(4):
            for bx in range(4):
                if bx == 0 and by == 0:
                    pred = 128
                elif by == 0:
                    pred = c[(by, bx - 1)]
                elif bx == 0:
                    pred = c[(by - 1, bx)]
                else:
                    pred = (c[(by, bx - 1)] + c[(by - 1, bx)] + 1) >> 1
                c[(by, bx)] = pred + 4 * d[by * 4 + bx]
                ysum += 16 * c[(by, bx)]
        r = rows[doc_id]
        assert (r.width, r.height) == (16, 16)
        assert r.y_sum == ysum
        assert r.cb_sum == r.cr_sum == 128 * 64
        assert r.valid
    # corrupt payload degrades per row
    bad = spark.createDataFrame([(999, bytearray(b"nope"))],
                                "doc_id long, payload binary")
    row = h264_pixel_stats(bad).collect()[0]
    assert not row.valid and row.y_sum == 0


def test_high_bit_depth_rejected_with_named_error():
    """Review regression: a High-10 intra SPS (bit depths 10/10)
    passed every guard and decoded with 8-bit math as valid-looking
    garbage; it must raise the named unsupported error instead."""
    from locustdb_spark.operators import h264

    w = h264.BitWriter()
    w.u(110, 8).u(0, 8).u(30, 8)   # High 10 profile
    w.ue(0)                         # sps_id
    w.ue(1)                         # chroma_format_idc 4:2:0
    w.ue(2).ue(2)                   # bit_depth_luma/chroma = 10
    w.u(0, 1)                       # transform bypass
    w.u(0, 1)                       # no scaling matrix
    w.ue(0)                         # log2_max_frame_num_minus4
    w.ue(0)                         # poc_type 0
    w.ue(0)                         # log2_max_poc_lsb_minus4
    w.ue(1)                         # max_num_ref_frames
    w.u(0, 1)                       # gaps allowed
    w.ue(0).ue(0)                   # 1x1 macroblocks
    w.u(1, 1)                       # frame_mbs_only
    w.u(0, 1)                       # direct_8x8
    w.u(0, 1)                       # no crop
    w.u(0, 1)                       # no vui
    w.rbsp_trailing()
    sps = bytes([0x67]) + h264.add_emulation_prevention(w.bytes())
    golden = _golden_stream()
    nals = hd.split_nal_units(golden)
    stream = h264.build_annexb_stream([sps] + nals[1:])
    with pytest.raises(hd.H264UnsupportedError, match="10.*bit"):
        hd.decode_i_frame(stream)


def test_build_trie_rejects_prefix_violations():
    """Review regression: _build_trie's conflict check was dead code;
    prefix collisions in a reconstructed VLC table must fail at
    build time, not resolve arbitrarily at decode time."""
    with pytest.raises(ValueError, match="prefix"):
        hd._build_trie({(0, 0): "01", (0, 1): "010"})
    with pytest.raises(ValueError, match="prefix"):
        hd._build_trie({(0, 0): "010", (0, 1): "01"})


def test_h264_keyframe_pixels_operator(spark):
    """Container -> codec composition: only stss-marked keyframes
    decode (even sample indices), their pixels match the frame-salted
    closed form, and corrupt containers / undecodable keyframes
    degrade per row."""
    from pyspark.sql import functions as F

    from locustdb_spark.operators.multimodal import (
        h264_keyframe_pixels, with_h264_mp4_payload)

    docs = spark.range(0, 9).select(F.col("id").alias("doc_id"))
    out = h264_keyframe_pixels(with_h264_mp4_payload(docs)).collect()
    rows = {(r.doc_id, r.frame_id): r for r in out}
    for doc_id in range(9):
        nf = 2 + doc_id % 3
        want_frames = [f for f in range(nf) if f % 2 == 0]
        got_frames = sorted(f for d, f in rows if d == doc_id)
        assert got_frames == want_frames, (doc_id, got_frames)
        for f in want_frames:
            d = [((doc_id * 7 + f * 13 + 5 * k) % 9) - 4
                 for k in range(16)]
            c, ysum = {}, 0
            for by in range(4):
                for bx in range(4):
                    if bx == 0 and by == 0:
                        pred = 128
                    elif by == 0:
                        pred = c[(by, bx - 1)]
                    elif bx == 0:
                        pred = c[(by - 1, bx)]
                    else:
                        pred = (c[(by, bx - 1)]
                                + c[(by - 1, bx)] + 1) >> 1
                    c[(by, bx)] = pred + 4 * d[by * 4 + bx]
                    ysum += 16 * c[(by, bx)]
            r = rows[(doc_id, f)]
            assert r.valid and r.y_sum == ysum, (doc_id, f)
    # corrupt container degrades to one flagged row
    bad = spark.createDataFrame([(99, bytearray(b"not an mp4"))],
                                "doc_id long, payload binary")
    row = h264_keyframe_pixels(bad).collect()[0]
    assert row.frame_id == -1 and not row.valid
