"""H.264 / AVC bitstream STRUCTURE parsing, pure Python against the
public ITU-T H.264 (08/2021) spec — NAL unit framing (Annex B start
codes AND AVCC length prefixes), emulation-prevention-byte removal
(§7.4.1.1), Exp-Golomb bit reading (§9.1), and the parameter-set /
slice-header fields a data pipeline actually needs: resolution,
profile/level, chroma format, entropy mode, slice types, IDR
detection.

Scope (documented, deliberate): this parses the SYNTAX layer only —
no macroblock decode, no CAVLC/CABAC residuals, no pixels. Reference
parity note: the reference engine stores video as opaque blobs
(SURVEY §2.3 multimodal columns); pixel decode of inter-coded video
needs a real codec library and stays behind the documented stub
(operators/multimodal.py). What THIS module makes real is everything
a 100 TB video-curation pipeline filters and groups on before any
decode: per-stream resolution/profile from the SPS, keyframe (IDR)
structure, slice-type mix, corruption detection — all from a few
header bytes per NAL, never touching the payload body.

Layout decisions all come from the spec:
- §B.1.1 byte stream NAL unit syntax (00 00 01 / 00 00 00 01 start
  codes); ISO 14496-15 AVCC sample framing (big-endian length
  prefixes, 1/2/4-byte) for MP4 `mdat` samples.
- §7.4.1.1: 00 00 03 -> 00 00 within NAL payloads (the 03 is an
  emulation prevention byte and must be stripped before parsing).
- §9.1: ue(v) Exp-Golomb = countl_zero-style prefix of leadingZeroBits
  zeros, then 1, then leadingZeroBits info bits; se(v) maps k ->
  (-1)^(k+1) * ceil(k/2).
- §7.3.2.1.1 seq_parameter_set_data: the field order parsed here,
  including the high-profile chroma/bit-depth/scaling-list block
  (profiles 100/110/122/244/44/83/86/118/128/138/139/134/135) and
  frame cropping with the §7.4.2.1.1 SubWidthC/SubHeightC crop units.
- §7.3.2.2 / §7.3.3: the PPS and slice-header prefixes up to the
  fields we report (entropy mode; first_mb_in_slice, slice_type,
  pps_id, frame_num).
"""

from __future__ import annotations

from dataclasses import dataclass

NAL_TYPE_NAMES = {
    1: "slice",  # non-IDR coded slice
    2: "dpa", 3: "dpb", 4: "dpc",
    5: "idr",  # IDR coded slice
    6: "sei", 7: "sps", 8: "pps", 9: "aud",
    10: "end_seq", 11: "end_stream", 12: "filler",
    13: "sps_ext", 14: "prefix", 15: "subset_sps",
    19: "aux_slice", 20: "slice_ext",
}

# slice_type % 5 -> letter (§7.4.3 Table 7-6; values 5-9 are the
# "all slices in this picture have this type" variants)
SLICE_TYPES = {0: "P", 1: "B", 2: "I", 3: "SP", 4: "SI"}

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                  139, 134, 135}


class H264ParseError(ValueError):
    """Malformed NAL/RBSP — named error, callers degrade per-row."""


def strip_emulation_prevention(data: bytes) -> bytes:
    """§7.4.1.1: remove the 0x03 in every 00 00 03 run (the encoder
    inserts it so payloads never contain start codes)."""
    if b"\x00\x00\x03" not in data:
        return data
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 \
                and data[i + 2] == 3:
            out += data[i:i + 2]
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


class BitReader:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb (§9.1)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        end = self._pos + n
        if end > len(self._d) * 8:
            raise H264ParseError("bitstream truncated")
        v = 0
        for i in range(self._pos, end):
            v = (v << 1) | ((self._d[i >> 3] >> (7 - (i & 7))) & 1)
        self._pos = end
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise H264ParseError("ue(v) prefix too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def split_nal_units(payload: bytes, length_size: int | None = None,
                    ) -> list[bytes]:
    """Split a payload into NAL units. `length_size` given -> AVCC
    (big-endian length prefixes, the MP4 sample framing); None ->
    auto: Annex B start codes if present, else try 4-byte AVCC.
    Raises H264ParseError when neither framing fits."""
    if length_size is None:
        if payload[:3] == b"\x00\x00\x01" or \
                payload[:4] == b"\x00\x00\x00\x01":
            return _split_annexb(payload)
        length_size = 4
    out = []
    i, n = 0, len(payload)
    while i + length_size <= n:
        ln = int.from_bytes(payload[i:i + length_size], "big")
        i += length_size
        if ln == 0 or i + ln > n:
            raise H264ParseError(
                f"AVCC length {ln} overruns payload at offset {i}")
        out.append(payload[i:i + ln])
        i += ln
    if i != n or not out:
        raise H264ParseError("trailing bytes after last AVCC NAL")
    return out


def _split_annexb(payload: bytes) -> list[bytes]:
    out = []
    i, n = 0, len(payload)
    starts = []
    while i < n - 2:
        if payload[i] == 0 and payload[i + 1] == 0 \
                and payload[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise H264ParseError("no Annex B start code")
    for j, s in enumerate(starts):
        e = (starts[j + 1] - 3) if j + 1 < len(starts) else n
        # a 4-byte start code's leading zero belongs to the previous
        # unit's trailing range — strip trailing zeros conservatively
        while e > s and payload[e - 1] == 0:
            e -= 1
        if e > s:
            out.append(payload[s:e])
    return out


@dataclass
class SPS:
    profile_idc: int
    level_idc: int
    sps_id: int
    chroma_format_idc: int
    bit_depth_luma: int
    bit_depth_chroma: int
    log2_max_frame_num: int
    pic_order_cnt_type: int
    num_ref_frames: int
    width: int
    height: int
    frame_mbs_only: bool
    # retained for slice-header decode (pixel layer, h264_decode.py):
    # pic_order_cnt_lsb's bit width when pic_order_cnt_type == 0
    log2_max_poc_lsb: int = 4


def parse_sps(rbsp: bytes) -> SPS:
    """§7.3.2.1.1 seq_parameter_set_data, through frame cropping.
    `rbsp` is the NAL payload AFTER the 1-byte header, emulation
    bytes already stripped."""
    r = BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1  # default 4:2:0 for non-high profiles
    bit_depth_luma = bit_depth_chroma = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        bit_depth_luma = r.ue() + 8
        bit_depth_chroma = r.ue() + 8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 4
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = bool(r.u(1))
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    width = pic_width_in_mbs * 16
    height = pic_height_in_map_units * 16 * (1 if frame_mbs_only else 2)
    if r.u(1):  # frame_cropping_flag (§7.4.2.1.1 crop units)
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        if chroma_format_idc == 0:
            cw, ch = 1, 2 - int(frame_mbs_only)
        else:
            sub_w = 2 if chroma_format_idc in (1, 2) else 1
            sub_h = 2 if chroma_format_idc == 1 else 1
            cw = sub_w
            ch = sub_h * (2 - int(frame_mbs_only))
        width -= (left + right) * cw
        height -= (top + bottom) * ch
    return SPS(profile_idc, level_idc, sps_id, chroma_format_idc,
               bit_depth_luma, bit_depth_chroma, log2_max_frame_num,
               poc_type, num_ref_frames, width, height,
               frame_mbs_only, log2_max_poc_lsb)


def _skip_scaling_list(r: BitReader, size: int) -> None:
    """§7.3.2.1.1.1 scaling_list: only the delta stream length
    matters here."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = nxt if nxt else last


@dataclass
class PPS:
    pps_id: int
    sps_id: int
    entropy_mode: str  # "cavlc" | "cabac"


def parse_pps(rbsp: bytes) -> PPS:
    """§7.3.2.2 pic_parameter_set_rbsp prefix."""
    r = BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy = "cabac" if r.u(1) else "cavlc"
    return PPS(pps_id, sps_id, entropy)


@dataclass
class SliceHeader:
    first_mb_in_slice: int
    slice_type: str  # "I"/"P"/"B"/"SP"/"SI"
    pps_id: int
    frame_num: int
    is_idr: bool


def parse_slice_header(rbsp: bytes, nal_type: int,
                       log2_max_frame_num: int = 4 + 0) -> SliceHeader:
    """§7.3.3 slice_header prefix: first_mb / slice_type / pps_id /
    frame_num. frame_num's width comes from the active SPS
    (log2_max_frame_num); pass the parsed SPS value for exact
    frame_num, or leave the default when only type info is needed."""
    r = BitReader(rbsp)
    first_mb = r.ue()
    st = r.ue()
    if st > 9:
        raise H264ParseError(f"slice_type {st} out of range")
    pps_id = r.ue()
    frame_num = r.u(log2_max_frame_num)
    return SliceHeader(first_mb, SLICE_TYPES[st % 5], pps_id,
                       frame_num, nal_type == 5)


@dataclass
class StreamInfo:
    """Per-payload summary a curation pipeline filters/groups on."""
    n_nals: int
    width: int | None
    height: int | None
    profile_idc: int | None
    level_idc: int | None
    chroma_format_idc: int | None
    entropy_mode: str | None
    n_idr: int
    n_slices: int
    slice_types: str  # e.g. "I:1,P:29" — deterministic ordering
    valid: bool
    error: str | None


def parse_stream(payload: bytes, length_size: int | None = None,
                 ) -> StreamInfo:
    """Parse one elementary-stream payload (one MP4 sample, or a whole
    Annex B stream) into a StreamInfo. Never raises: corrupt input
    returns valid=False with the error named, so mapInPandas batches
    degrade per row."""
    try:
        nals = split_nal_units(payload, length_size)
    except (H264ParseError, IndexError) as e:
        return StreamInfo(0, None, None, None, None, None, None,
                          0, 0, "", False, str(e)[:120])
    sps: SPS | None = None
    pps: PPS | None = None
    n_idr = n_slices = 0
    counts: dict[str, int] = {}
    err = None
    for nal in nals:
        if not nal:
            continue
        hdr = nal[0]
        if hdr & 0x80:  # forbidden_zero_bit
            err = "forbidden_zero_bit set"
            continue
        ntype = hdr & 0x1F
        body = strip_emulation_prevention(nal[1:])
        try:
            if ntype == 7:
                sps = parse_sps(body)
            elif ntype == 8:
                pps = parse_pps(body)
            elif ntype in (1, 5, 19):
                sh = parse_slice_header(
                    body, ntype,
                    sps.log2_max_frame_num if sps else 4)
                n_slices += 1
                n_idr += int(ntype == 5)
                counts[sh.slice_type] = counts.get(sh.slice_type,
                                                   0) + 1
        except H264ParseError as e:
            err = str(e)[:120]
    types = ",".join(f"{t}:{counts[t]}"
                     for t in sorted(counts))
    return StreamInfo(
        len(nals),
        sps.width if sps else None,
        sps.height if sps else None,
        sps.profile_idc if sps else None,
        sps.level_idc if sps else None,
        sps.chroma_format_idc if sps else None,
        pps.entropy_mode if pps else None,
        n_idr, n_slices, types,
        err is None and (sps is not None or n_slices > 0), err)


# ---------------------------------------------------------------------
# golden-stream builders (tests + fixtures): hand-encode the same
# syntax the parser reads, so goldens are spec-derived, not captured
# ---------------------------------------------------------------------

class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def u(self, v: int, n: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)
        return self

    def ue(self, v: int) -> "BitWriter":
        k = v + 1
        n = k.bit_length()
        return self.u(0, n - 1).u(k, n)

    def se(self, v: int) -> "BitWriter":
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> "BitWriter":
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)
        return self

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i:i + 8]:
                b = (b << 1) | bit
            rem = 8 - len(self._bits[i:i + 8])
            out.append(b << rem)
        return bytes(out)


def add_emulation_prevention(data: bytes) -> bytes:
    """Inverse of strip_emulation_prevention (§7.4.1.1 encoder side)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def build_sps(width_mbs: int = 8, height_mbs: int = 6,
              profile_idc: int = 66, level_idc: int = 30,
              crop: tuple[int, int, int, int] | None = None) -> bytes:
    """Encode a baseline-profile SPS NAL (header byte included) whose
    decoded width/height are width_mbs*16 / height_mbs*16 minus crop."""
    w = BitWriter()
    w.u(profile_idc, 8).u(0, 8).u(level_idc, 8)
    w.ue(0)            # sps_id
    w.ue(0)            # log2_max_frame_num_minus4
    w.ue(0)            # pic_order_cnt_type
    w.ue(0)            # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)            # max_num_ref_frames
    w.u(0, 1)          # gaps_in_frame_num_value_allowed
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)          # frame_mbs_only_flag
    w.u(0, 1)          # direct_8x8_inference_flag
    if crop:
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)          # vui_parameters_present_flag
    w.rbsp_trailing()
    return bytes([0x67]) + add_emulation_prevention(w.bytes())


def build_pps(cabac: bool = False) -> bytes:
    w = BitWriter()
    w.ue(0).ue(0)          # pps_id, sps_id
    w.u(1 if cabac else 0, 1)
    w.u(0, 1)              # bottom_field_pic_order_in_frame_present
    w.ue(0)                # num_slice_groups_minus1
    w.ue(0).ue(0)          # num_ref_idx_l0/l1_default_active_minus1
    w.u(0, 3)              # weighted_pred_flag + weighted_bipred_idc
    w.se(0).se(0).se(0)    # pic_init_qp/qs, chroma_qp_index_offset
    w.u(0, 3)              # deblocking/constrained_intra/redundant
    w.rbsp_trailing()
    return bytes([0x68]) + add_emulation_prevention(w.bytes())


def build_slice(slice_type: int = 2, idr: bool = True,
                frame_num: int = 0) -> bytes:
    """Encode just the slice-header prefix this module parses (the
    body would be entropy-coded macroblocks; a few stuffing bits stand
    in — parse_slice_header never reads past frame_num)."""
    w = BitWriter()
    w.ue(0)            # first_mb_in_slice
    w.ue(slice_type)
    w.ue(0)            # pps_id
    w.u(frame_num, 4)  # frame_num (log2_max_frame_num = 4)
    if idr:
        w.ue(0)        # idr_pic_id
    w.rbsp_trailing()
    hdr = 0x65 if idr else 0x41
    return bytes([hdr]) + add_emulation_prevention(w.bytes())


def build_avcc_sample(nals: list[bytes], length_size: int = 4) -> bytes:
    return b"".join(len(n).to_bytes(length_size, "big") + n
                    for n in nals)


def build_annexb_stream(nals: list[bytes]) -> bytes:
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)
