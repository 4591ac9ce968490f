"""H.264 bitstream-structure parser tests (operators/h264.py, r6):
golden streams are hand-encoded by the module's spec-derived
BitWriter, so every expectation traces to ITU-T H.264 field math —
plus adversarial cases the golden loop can't cover (emulation
prevention runs, high-profile SPS branches, interlace, truncation,
corrupt framing, both NAL framings)."""

import pytest

from locustdb_spark.operators import h264 as h


def _rbsp(nal: bytes) -> bytes:
    return h.strip_emulation_prevention(nal[1:])


def test_sps_roundtrip_and_crop_units():
    sps = h.parse_sps(_rbsp(h.build_sps(width_mbs=8, height_mbs=6)))
    assert (sps.width, sps.height) == (128, 96)
    assert sps.profile_idc == 66 and sps.chroma_format_idc == 1
    # 4:2:0 crop units are 2px horizontally AND vertically for
    # frame_mbs_only streams (SubWidthC=SubHeightC=2, §7.4.2.1.1)
    c = h.parse_sps(_rbsp(h.build_sps(8, 6, crop=(1, 2, 0, 1))))
    assert (c.width, c.height) == (128 - 6, 96 - 2)


def test_sps_high_profile_branch():
    """profile_idc=100 adds chroma/bit-depth/scaling fields before
    log2_max_frame_num — hand-encode one with 4:2:2 chroma and
    10-bit luma and check the parser walks the extra block."""
    w = h.BitWriter()
    w.u(100, 8).u(0, 8).u(31, 8)
    w.ue(0)        # sps_id
    w.ue(2)        # chroma_format_idc = 4:2:2
    w.ue(2)        # bit_depth_luma_minus8 = 2 -> 10 bit
    w.ue(0)        # bit_depth_chroma_minus8
    w.u(0, 1)      # qpprime bypass
    w.u(0, 1)      # no scaling matrix
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(0)        # poc type 0
    w.ue(0)        # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)        # max_num_ref_frames
    w.u(0, 1)
    w.ue(9)        # width mbs - 1 -> 160
    w.ue(4)        # height -> 80
    w.u(1, 1)      # frame_mbs_only
    w.u(0, 1)      # direct_8x8
    w.u(1, 1)      # crop: 4:2:2 -> SubWidthC 2, SubHeightC 1
    w.ue(1)
    w.ue(0)
    w.ue(0)
    w.ue(3)
    w.u(0, 1)      # no vui
    w.rbsp_trailing()
    sps = h.parse_sps(w.bytes())
    assert sps.profile_idc == 100 and sps.chroma_format_idc == 2
    assert sps.bit_depth_luma == 10 and sps.bit_depth_chroma == 8
    # width 160 - 1*2, height 80 - 3*1 (SubHeightC=1 at 4:2:2)
    assert (sps.width, sps.height) == (158, 77)


def test_sps_interlaced_doubles_height():
    w = h.BitWriter()
    w.u(66, 8).u(0, 8).u(30, 8)
    w.ue(0); w.ue(0); w.ue(0); w.ue(0); w.ue(1); w.u(0, 1)
    w.ue(7)        # 8 mbs wide
    w.ue(2)        # 3 map units tall
    w.u(0, 1)      # frame_mbs_only = 0 (interlaced)
    w.u(0, 1)      # mb_adaptive_frame_field_flag
    w.u(0, 1)      # direct_8x8
    w.u(0, 1)      # no crop
    w.u(0, 1)      # no vui
    w.rbsp_trailing()
    sps = h.parse_sps(w.bytes())
    assert (sps.width, sps.height) == (128, 96)  # 3 * 16 * 2
    assert not sps.frame_mbs_only


def test_emulation_prevention_roundtrip_and_parse():
    raw = b"\x00\x00\x00\x00\x01\x00\x00\x02\x00\x00\x03\x00\x00"
    enc = h.add_emulation_prevention(raw)
    assert b"\x00\x00\x00" not in enc and b"\x00\x00\x01" not in enc
    assert h.strip_emulation_prevention(enc) == raw
    # a stream whose SPS requires EPB still parses: width_mbs=257
    # makes ue(256) emit long zero runs into the byte stream
    sps = h.build_sps(width_mbs=257, height_mbs=2)
    parsed = h.parse_sps(_rbsp(sps))
    assert parsed.width == 257 * 16


def test_slice_header_types_and_all_type_variants():
    for st, letter in [(0, "P"), (1, "B"), (2, "I"), (5, "P"),
                       (7, "I")]:
        nal = h.build_slice(slice_type=st, idr=False, frame_num=3)
        sh = h.parse_slice_header(_rbsp(nal), nal[0] & 0x1F)
        assert sh.slice_type == letter and sh.frame_num == 3
    with pytest.raises(h.H264ParseError, match="slice_type"):
        w = h.BitWriter()
        w.ue(0); w.ue(10); w.ue(0); w.u(0, 4); w.rbsp_trailing()
        h.parse_slice_header(w.bytes(), 1)


def test_nal_framing_avcc_and_annexb():
    nals = [h.build_sps(4, 3), h.build_pps(), h.build_slice()]
    for ls in (1, 2, 4):
        got = h.split_nal_units(h.build_avcc_sample(nals, ls), ls)
        assert got == nals
    # auto-detect: Annex B with mixed 3- and 4-byte start codes
    stream = (b"\x00\x00\x01" + nals[0] + b"\x00\x00\x00\x01"
              + nals[1] + b"\x00\x00\x01" + nals[2])
    assert h.split_nal_units(stream) == nals
    with pytest.raises(h.H264ParseError):
        h.split_nal_units(b"\x00\x00\xff\x41\x00", 4)


def test_parse_stream_summary_and_degrade():
    nals = [h.build_sps(8, 6), h.build_pps(cabac=True),
            h.build_slice(2, True, 0), h.build_slice(0, False, 1),
            h.build_slice(0, False, 2)]
    si = h.parse_stream(h.build_avcc_sample(nals))
    assert si.valid and (si.width, si.height) == (128, 96)
    assert si.n_idr == 1 and si.n_slices == 3
    assert si.slice_types == "I:1,P:2"
    assert si.entropy_mode == "cabac" and si.n_nals == 5
    # corrupt framing degrades, never raises
    bad = h.parse_stream(b"\xde\xad\xbe\xef" * 4)
    assert not bad.valid and bad.error
    # truncated SPS degrades with the error recorded
    trunc = h.build_avcc_sample([h.build_sps(8, 6)[:4]])
    ti = h.parse_stream(trunc)
    assert not ti.valid and "truncated" in (ti.error or "")


def test_forbidden_zero_bit_flagged():
    nal = bytes([0x80 | 0x07]) + h.build_sps(4, 3)[1:]
    si = h.parse_stream(h.build_avcc_sample([nal]))
    assert not si.valid and "forbidden" in si.error


def test_spark_h264_info_matches_field_formulas(spark):
    """The end-to-end Spark op over the real corpus: every parsed
    value equals the formula the SQL oracle uses (the same loop the
    driver gate closes at sf0.01)."""
    from locustdb_spark.operators.multimodal import (
        h264_stream_info, with_h264_payload)

    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "n_chars").limit(120))
    got = {r.doc_id: r for r in
           h264_stream_info(with_h264_payload(docs)).collect()}
    rows = docs.collect()
    assert len(got) == len(rows)
    for d in rows:
        r = got[d.doc_id]
        crop = 2 if d.doc_id % 3 == 0 else 0
        assert r.width == 16 * (1 + d.doc_id % 40) - crop
        assert r.height == 16 * (1 + d.doc_id % 23) - crop
        assert r.entropy_mode == ("cabac" if d.doc_id % 2 else "cavlc")
        assert r.n_slices == 1 + d.n_chars % 5
        assert r.n_idr == 1 and r.valid


def test_h264_roundtrip_property():
    """Property fuzz: any (dims, crop, cabac, slice mix) the builders
    can express must parse back to exactly the encoded values —
    including dimension combinations whose Exp-Golomb encodings spill
    emulation-prevention sequences into the byte stream."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        wm=st.integers(1, 300),
        hm=st.integers(1, 300),
        crop=st.one_of(st.none(), st.tuples(
            st.integers(0, 3), st.integers(0, 3),
            st.integers(0, 3), st.integers(0, 3))),
        cabac=st.booleans(),
        n_p=st.integers(0, 6),
        length_size=st.sampled_from([2, 4]),
        annexb=st.booleans(),
    )
    def check(wm, hm, crop, cabac, n_p, length_size, annexb):
        nals = [h.build_sps(wm, hm, crop=crop), h.build_pps(cabac),
                h.build_slice(2, True, 0)]
        for k in range(n_p):
            nals.append(h.build_slice(0, False, (k + 1) % 16))
        if annexb:
            si = h.parse_stream(h.build_annexb_stream(nals))
        else:
            si = h.parse_stream(
                h.build_avcc_sample(nals, length_size), length_size)
        exp_w = wm * 16 - (crop[0] + crop[1]) * 2 if crop else wm * 16
        exp_h = hm * 16 - (crop[2] + crop[3]) * 2 if crop else hm * 16
        assert si.valid and si.n_nals == 3 + n_p
        assert (si.width, si.height) == (exp_w, exp_h)
        assert si.entropy_mode == ("cabac" if cabac else "cavlc")
        assert si.n_idr == 1 and si.n_slices == 1 + n_p
        assert si.slice_types == ("I:1" if n_p == 0
                                  else f"I:1,P:{n_p}")

    check()
