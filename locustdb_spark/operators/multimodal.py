"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Two tiers:

- REAL decode (`decode_media`, `resize_image`): PNG and WAV payloads
  decode for real through pure-stdlib codecs (operators/codecs.py —
  zlib inflate + PNG scanline unfiltering; the wave module), no
  external libraries needed. Corrupt/unsupported blobs degrade to a
  flagged row, never a failed stage.
- STUBBED decode (`decode_image_stub` etc.): deterministic fake
  metadata from md5(payload), kept because it is reproducible in SQL —
  these are the oracle-checkable entries — and because formats like
  JPEG/MP4 have no decoder in this environment. Swap `_decode_one`
  for a PIL/ffmpeg call where those libraries exist
  (`real_decoders_available`).

Scale design: mapInPandas streams Arrow batches, so a 100 TB binary
corpus is processed one batch at a time per task with constant memory;
no row-at-a-time Python, no collect. Feature extraction keeps only
small derived columns, so downstream shuffles never move the blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spread import spread_small_scan

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pack a text column into an opaque binary payload column
    (stand-in for real image/audio bytes) plus metadata."""
    # r12 (guide §2.5): spread a one-split gate-scale scan across
    # cores — the payload build and every decoder downstream of it
    # inherit this partitioning, and a 6 MB documents table would
    # otherwise pin the whole codec pipeline to 1-2 tasks
    # (measured: multimodal_h264_gop 226.9 s at sf1 vs ~14 s of
    # spread CPU). No-op at scale — see spread_small_scan.
    df = spread_small_scan(df)
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("payload_bytes"),
    )


def _decode_one(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode: deterministic pseudo-metadata from md5(payload).
    Replace with a real decoder (PIL.Image.open etc.) in production."""
    h = hashlib.md5(payload).hexdigest()
    width = int(h[:4], 16) % 1024 + 1
    height = int(h[4:8], 16) % 1024 + 1
    return len(payload), width, height, "fake/rgb"


def decode_image_stub(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode over binary payloads via mapInPandas."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [m[0] for m in meta],
                    "width": [m[1] for m in meta],
                    "height": [m[2] for m in meta],
                    "format": [m[3] for m in meta],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FEATURES_SCHEMA = "doc_id long, features array<double>"


def extract_features_stub(
    df: DataFrame,
    dim: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    STUB compute: feature_j = md5(payload || ':' || j) first 8 hex
    digits as a fraction of 2^32, rounded to 6 places — deterministic
    and reproducible in SQL, so the full Arrow-batch plumbing is
    oracle-checkable. Replace the inner loop with a real encoder
    (CLIP/wav2vec) in production; the schema, batching, and partition
    behavior don't change.

    Scale: output is (id, small fixed-dim vector) — the blobs never
    leave the scan stage, so any downstream shuffle moves ~dim*8 bytes
    per row, not the payload.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                # h/2^32 with h < 2^32 is exact in a double, so the
                # SQL oracle reproduces it bit-for-bit (no rounding)
                out.append(
                    [
                        int(
                            hashlib.md5(
                                bytes(p) + b":%d" % j
                            ).hexdigest()[:8],
                            16,
                        )
                        / 4294967296.0
                        for j in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].values, "features": out}
            )

    return df.mapInPandas(feats, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, resized_md5 string"
)


def resize_image_stub(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize-to-fixed-dims over binary payloads via mapInPandas.

    STUB transform: the "resized image" is identified by
    md5(payload || '@{w}x{h}') and sized w*h*3 (RGB), so the
    binary-in/binary-out pipeline shape is real while the pixel math
    is faked deterministically. A real implementation swaps the body
    for PIL `Image.resize` and yields the actual bytes.
    """
    tag = b"@%dx%d" % (width, height)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": width,
                    "height": height,
                    "n_bytes": width * height * 3,
                    "resized_md5": [
                        hashlib.md5(bytes(p) + tag).hexdigest()
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_id int, frame_len int, frame_md5 string"


def sample_frames_stub(
    df: DataFrame,
    frame_bytes: int = 256,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling from video-like payloads via mapInPandas — the
    one multimodal op whose batch SHAPE changes (1 input row → up to
    `max_frames` output rows), exercising mapInPandas's row-explosion
    path.

    STUB decode: "frames" are consecutive `frame_bytes` slices of the
    payload, identified by md5. A real implementation swaps the slicer
    for ffmpeg keyframe extraction; the fan-out plumbing is identical.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, lens, hashes = [], [], [], []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                b = bytes(p)
                n = min(max_frames, max(1, -(-len(b) // frame_bytes)))
                for f in range(n):
                    chunk = b[f * frame_bytes : (f + 1) * frame_bytes]
                    ids.append(i)
                    fids.append(f)
                    lens.append(len(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_id": fids,
                    "frame_len": lens,
                    "frame_md5": hashes,
                }
            )

    return df.mapInPandas(frames, schema=FRAMES_SCHEMA)


MEDIA_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "channels int, sample_rate int, duration_s double"
)


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """REAL decode over binary payloads via mapInPandas: PNG headers +
    pixels through the pure-stdlib inflate/unfilter codec and WAV
    through the stdlib wave module (operators/codecs.py) — no external
    image/audio libraries needed. Unsupported containers (JPEG, MP4 in
    this environment) land with format='unknown' and NULL media fields
    rather than failing the batch, the posture a 100 TB crawl needs
    (a corrupt blob must never kill the stage).

    Output keeps only small metadata columns, so downstream shuffles
    never move the blobs."""
    from . import codecs

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                b = bytes(p)
                kind = codecs.sniff(b)
                row = {"doc_id": i, "n_bytes": len(b), "format": kind,
                       "width": None, "height": None, "channels": None,
                       "sample_rate": None, "duration_s": None}
                try:
                    if kind == "png":
                        w, h, ch, _px = codecs.png_decode(b)
                        row.update(width=w, height=h, channels=ch)
                    elif kind == "jpeg":
                        w, h, ch, _px = codecs.jpeg_decode(b)
                        row.update(width=w, height=h, channels=ch)
                    elif kind == "wav":
                        ch, rate, n, dur = codecs.wav_decode(b)
                        row.update(channels=ch, sample_rate=rate,
                                   duration_s=dur)
                    elif kind == "mp4":
                        info = codecs.mp4_probe(b)
                        vids = [t for t in info["tracks"]
                                if t["handler"] == "vide"]
                        row.update(
                            duration_s=info["duration_s"],
                            width=vids[0]["width"] if vids else None,
                            height=vids[0]["height"] if vids else None)
                except Exception:  # noqa: BLE001 — corrupt blob
                    row["format"] = "corrupt"
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(decode, schema=MEDIA_SCHEMA)


REAL_RESIZE_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, resized binary"
)


def resize_image(df: DataFrame, width: int = 64, height: int = 64,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """REAL nearest-neighbor resize for PNG payloads: decode, resample,
    re-encode as PNG bytes (operators/codecs.py). Non-PNG payloads
    yield a NULL `resized` column. Binary-in/binary-out, Arrow-batched,
    constant memory per task."""
    from . import codecs

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, sizes = [], [], []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                b = bytes(p)
                blob = None
                try:
                    kind = codecs.sniff(b)
                    if kind in ("png", "jpeg"):
                        decode = (codecs.png_decode if kind == "png"
                                  else codecs.jpeg_decode)
                        _w, _h, _c, px = decode(b)
                        blob = codecs.png_encode(
                            codecs.png_resize_nearest(px, width, height))
                except Exception:  # noqa: BLE001 — corrupt blob
                    blob = None
                ids.append(i)
                outs.append(blob)
                sizes.append(len(blob) if blob is not None else None)
            yield pd.DataFrame({
                "doc_id": ids, "width": width, "height": height,
                "n_bytes": pd.array(sizes, dtype="Int64"),
                "resized": outs,
            })

    return df.mapInPandas(resize, schema=REAL_RESIZE_SCHEMA)


def real_decoders_available(fmt: str = "png") -> bool:
    """True when `fmt` can actually be decoded here. PNG, baseline
    JPEG and WAV are always decodable (pure-Python codecs.py /
    jpeg.py); other formats require PIL, which this environment may
    not have."""
    if fmt in ("png", "jpeg", "wav"):
        return True
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


MP4_FRAMES_SCHEMA = ("doc_id long, frame_id int, is_key boolean, "
                     "frame_len int, frame_md5 string")


def pack_frames_as_mp4(
    df: DataFrame,
    frame_bytes: int = 256,
    max_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Mux each payload's consecutive `frame_bytes` slices as the
    samples of a real ISO-BMFF file (codecs.mp4_encode) — the
    synthetic-video builder for pipelines with no real footage. The
    sample bytes ARE the slices, so a mux→demux round trip is
    SQL-reproducible (md5 of substrings), which is what puts the real
    container path under the value-hash oracle gate."""

    def mux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            ids, blobs = [], []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                b = bytes(p)
                n = min(max_frames, max(1, -(-len(b) // frame_bytes)))
                frames = [b[f * frame_bytes:(f + 1) * frame_bytes]
                          for f in range(n)]
                ids.append(i)
                blobs.append(codecs.mp4_encode(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(mux, schema="doc_id long, payload binary")


def sample_frames_mp4(
    df: DataFrame,
    keyframes_only: bool = False,
    max_frames: int | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame sampling from MP4 payloads: walk the container's
    stsc/stsz/stco(+stss) sample tables (codecs.mp4_extract_samples)
    and emit one row per extracted sample — the real-decode sibling
    the PNG/WAV/JPEG ops got in r2/r3, replacing sample_frames_stub's
    byte slicing for actual ISO-BMFF inputs. Corrupt containers
    degrade to a single flagged row (frame_id=-1) instead of failing
    the batch. Only small metadata leaves the stage; the blobs never
    shuffle."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            ids, fids, keys, lens, hashes = [], [], [], [], []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                try:
                    got = codecs.mp4_extract_samples(
                        bytes(p), keyframes_only=keyframes_only,
                        max_samples=max_frames)
                except Exception:  # noqa: BLE001 — corrupt blob
                    ids.append(i)
                    fids.append(-1)
                    keys.append(False)
                    lens.append(0)
                    hashes.append(None)
                    continue
                for idx, payload, is_key in got:
                    ids.append(i)
                    fids.append(idx)
                    keys.append(bool(is_key))
                    lens.append(len(payload))
                    hashes.append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_id": pd.array(fids, dtype="int32"),
                    "is_key": keys,
                    "frame_len": pd.array(lens, dtype="int32"),
                    "frame_md5": hashes,
                }
            )

    return df.mapInPandas(frames, schema=MP4_FRAMES_SCHEMA)


H264_INFO_SCHEMA = (
    "doc_id long, n_nals int, width int, height int, profile_idc int, "
    "level_idc int, chroma_format_idc int, entropy_mode string, "
    "n_idr int, n_slices int, slice_types string, valid boolean"
)


def with_h264_payload(
    df: DataFrame, id_col: str = "doc_id", chars_col: str = "n_chars"
) -> DataFrame:
    """Deterministic GOLDEN H.264 elementary streams derived from doc
    fields (the fixture side of the `multimodal_h264_info` oracle
    loop): an AVCC sample of [SPS, PPS, IDR slice, k non-IDR slices]
    hand-encoded by operators/h264.py's spec-derived BitWriter. Every
    stream property is a pure function of (doc_id, n_chars), so an
    independent SQL engine can recompute what the PARSER must read
    back out of the bits:

      width  = 16 * (1 + doc_id % 40)  - (2 if doc_id % 3 == 0)
      height = 16 * (1 + doc_id % 23)  - (2 if doc_id % 3 == 0)
      entropy = cabac if doc_id odd else cavlc
      n_slices = 1 + n_chars % 5 (one IDR + P slices), n_nals = 2 + n_slices

    (crop is 1 unit right+bottom at 4:2:0 => 2px each, §7.4.2.1.1)."""

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the payload build — the decoders downstream inherit the
    # partitioning; no-op at scale (see spread_small_scan)
    df = spread_small_scan(df)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import h264

        for pdf in batches:
            ids, blobs = [], []
            for i, nch in zip(pdf[id_col].values,
                              pdf[chars_col].values):
                i, nch = int(i), int(nch)
                crop = (0, 1, 0, 1) if i % 3 == 0 else None
                nals = [
                    h264.build_sps(width_mbs=1 + i % 40,
                                   height_mbs=1 + i % 23,
                                   crop=crop),
                    h264.build_pps(cabac=bool(i % 2)),
                    h264.build_slice(slice_type=2, idr=True,
                                     frame_num=0),
                ]
                for k in range(nch % 5):
                    nals.append(h264.build_slice(
                        slice_type=0, idr=False,
                        frame_num=(k + 1) % 16))
                ids.append(i)
                blobs.append(h264.build_avcc_sample(nals))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(build, schema="doc_id long, payload binary")


def h264_stream_info(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    length_size: int | None = None,
) -> DataFrame:
    """REAL H.264 bitstream-structure parse per payload
    (operators/h264.py: NAL framing, emulation-prevention removal,
    Exp-Golomb SPS/PPS/slice headers — ITU-T H.264 §7.3): resolution,
    profile/level, entropy mode, IDR/slice-type structure. This is
    the metadata a 100 TB video-curation pipeline filters and groups
    on BEFORE any pixel decode (which, for inter-coded video, stays
    behind the documented stub). Corrupt payloads degrade to a
    valid=false row, never fail the batch; blobs never shuffle —
    only the few-column summary leaves the stage."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import h264

        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                info = h264.parse_stream(bytes(p), length_size)
                rows.append((int(i), info.n_nals, info.width,
                             info.height, info.profile_idc,
                             info.level_idc, info.chroma_format_idc,
                             info.entropy_mode, info.n_idr,
                             info.n_slices, info.slice_types,
                             info.valid))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_nals", "width", "height", "profile_idc",
                "level_idc", "chroma_format_idc", "entropy_mode",
                "n_idr", "n_slices", "slice_types", "valid"])

    return df.mapInPandas(parse, schema=H264_INFO_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, channels int, "
    "sum_sq long, peak int, n_clipped int, zero_crossings int, valid boolean"
)


def with_wav_payload(
    df: DataFrame, id_col: str = "doc_id", chars_col: str = "n_chars",
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic REAL 16-bit PCM mono WAV per document (the
    fixture side of the `multimodal_audio_features` oracle loop):
    sample[t] = ((doc_id + 1) * (t + 1)) % 65536 - 32768 for
    t in [0, 200 + n_chars % 100) — all-integer, so an independent
    SQL engine regenerates the exact samples with generate_series and
    recomputes every feature the DECODER+ANALYZER must read back out
    of the actual RIFF bytes."""

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the payload build — the decoders downstream inherit the
    # partitioning; no-op at scale (see spread_small_scan)
    df = spread_small_scan(df)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for i, nch in zip(pdf[id_col].values,
                              pdf[chars_col].values):
                i, nch = int(i), int(nch)
                n = 200 + nch % 100
                t = np.arange(1, n + 1, dtype=np.int64)
                s = (((i + 1) * t) % 65536 - 32768).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sample_rate)
                    wf.writeframes(s.tobytes())
                ids.append(i)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(build, schema="doc_id long, payload binary")


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL audio-sample analysis over WAV payloads: decode the PCM
    through the stdlib wave module, then vectorized numpy features —
    exact integer energy (sum of squares, the RMS numerator), peak
    amplitude, clipped-sample count (|s| >= 32767), and zero-crossing
    count (sign(s[t]) != sign(s[t-1]) with 0 counted non-negative) —
    the silence/clipping/noisiness signals an audio-curation pipeline
    filters on. Multi-channel audio analyzes channel 0 (frames are
    interleaved). Non-WAV / corrupt payloads degrade to a
    valid=false row; only the small feature columns leave the stage,
    the blobs never shuffle. All features are integers, so the op is
    value-hash oracle-checkable (`multimodal_audio_features`)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                try:
                    with wave.open(io.BytesIO(bytes(p))) as wf:
                        ch = wf.getnchannels()
                        rate = wf.getframerate()
                        width = wf.getsampwidth()
                        n = wf.getnframes()
                        raw = wf.readframes(n)
                    if width != 2:
                        raise ValueError(f"sampwidth {width} != 2")
                    s = np.frombuffer(raw, dtype="<i2")
                    if ch > 1:
                        s = s[::ch]  # channel 0 of interleaved frames
                    s64 = s.astype(np.int64)
                    nonneg = s >= 0
                    rows.append((
                        int(i), len(s), rate, ch,
                        int((s64 * s64).sum()),
                        int(np.abs(s64).max()) if len(s) else 0,
                        int((np.abs(s64) >= 32767).sum()),
                        int((nonneg[1:] != nonneg[:-1]).sum()),
                        True))
                except Exception:  # noqa: BLE001 — corrupt blob
                    rows.append((int(i), 0, 0, 0, 0, 0, 0, 0, False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "sample_rate", "channels",
                "sum_sq", "peak", "n_clipped", "zero_crossings",
                "valid"])

    return df.mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, channels int, px_sum long, "
    "px_min int, px_max int, n_zero int, weighted_sum long, valid boolean"
)


def with_png_payload(
    df: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic REAL PNG per document (the fixture side of the
    `multimodal_image_stats` oracle loop): a grayscale image of
    w = 16 + doc_id % 17, h = 16 + doc_id % 13 whose pixel at (x, y)
    is (doc_id + 3x + 7y) % 256, encoded through codecs.png_encode
    with filter doc_id % 3 (None / Sub / Up) — so the oracle sweep
    exercises the decoder's inflate AND three unfilter paths, and an
    independent SQL engine regenerates every pixel by formula."""

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the payload build — the decoders downstream inherit the
    # partitioning; no-op at scale (see spread_small_scan)
    df = spread_small_scan(df)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import codecs

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col].values:
                i = int(i)
                w, h = 16 + i % 17, 16 + i % 13
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((i + 3 * x + 7 * y) % 256).astype(np.uint8)
                blob = codecs.png_encode(px[:, :, None],
                                         filter_type=i % 3)
                ids.append(i)
                blobs.append(blob)
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(build, schema="doc_id long, payload binary")


def image_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL pixel statistics over PNG payloads: decode through the
    pure-stdlib inflate+unfilter codec (codecs.png_decode), then
    vectorized integer stats over the actual pixel array — sum, min,
    max, zero-pixel count, and a position-weighted checksum
    (sum of v * (1 + (y*w + x) % 97), channel 0) that catches any
    pixel landing at the wrong coordinate, which plain sums cannot.
    The image-curation analog of audio_features: brightness/contrast/
    blank-image signals computed before any expensive model sees the
    bytes. Corrupt/non-PNG payloads degrade to valid=false rows; the
    blobs never shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import codecs

        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                try:
                    w, h, ch, px = codecs.png_decode(bytes(p))
                    v = px[:, :, 0].astype(np.int64)
                    idx = (np.arange(h, dtype=np.int64)[:, None] * w
                           + np.arange(w, dtype=np.int64)[None, :])
                    rows.append((
                        int(i), w, h, ch, int(v.sum()),
                        int(v.min()), int(v.max()),
                        int((v == 0).sum()),
                        int((v * (1 + idx % 97)).sum()), True))
                except Exception:  # noqa: BLE001 — corrupt blob
                    rows.append((int(i), 0, 0, 0, 0, 0, 0, 0, 0,
                                 False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "channels", "px_sum",
                "px_min", "px_max", "n_zero", "weighted_sum", "valid"])

    return df.mapInPandas(stats, schema=IMAGE_STATS_SCHEMA)


H264_PIXEL_STATS_SCHEMA = (
    "doc_id long, width int, height int, y_sum long, y_min int, "
    "y_max int, y_weighted long, cb_sum long, cr_sum long, "
    "valid boolean"
)


def with_h264_pixel_payload(
    df: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic golden INTRA H.264 streams whose DECODED PIXELS
    are a closed-form function of doc_id (the fixture side of the
    `multimodal_h264_pixels` oracle loop — operators/h264_decode.py).

    Each doc becomes a one-macroblock (16x16) Annex B stream: SPS +
    PPS + IDR slice holding a single Intra_4x4 macroblock, every 4x4
    block DC-predicted (mode 2) with a DC-ONLY residual level

        d[k] = ((doc_id * 7 + 5 * k) % 9) - 4,   k = 4*by + bx

    at QP 28, where dequant+IDCT of a lone DC level is EXACTLY 4*d
    per pixel ((256*d + 32) >> 6 — §8.5.12 arithmetic). So the
    reconstruction follows the spec's DC-prediction recurrence in
    closed form, SQL-recomputable with no decoder on the oracle side:

        c[0][0]       = 128            + 4*d[0]
        c[0][x]       = c[0][x-1]      + 4*d[..]          (top row)
        c[y][0]       = c[y-1][0]      + 4*d[..]          (left col)
        c[y][x] = (c[y][x-1] + c[y-1][x] + 1)//2 + 4*d[..]

    d in [-4, 4] keeps every value inside [16, 240]: no clipping, so
    the closed form is exact. Chroma carries no residual and no
    neighbors -> flat 128, which the decoder must still produce via
    the real chroma DC prediction path. The bits in between are real
    CAVLC (coeff_token, level, total_zeros), real Exp-Golomb MB
    syntax, and real Z-scan/nC bookkeeping — a decoder that gets ANY
    of it wrong lands on different pixels."""

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the payload build — the decoders downstream inherit the
    # partitioning; no-op at scale (see spread_small_scan)
    df = spread_small_scan(df)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .h264_decode import BLK_ZSCAN, encode_i_frame

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col].values:
                i = int(i)
                luma = []
                for blk in range(16):
                    bx, by = BLK_ZSCAN[blk]
                    lv = [0] * 16
                    lv[0] = ((i * 7 + 5 * (4 * by + bx)) % 9) - 4
                    luma.append(lv)
                spec = {"kind": "i4x4", "modes": [2] * 16,
                        "luma": luma, "chroma_mode": 0,
                        "cbp_chroma": 0}
                ids.append(i)
                blobs.append(encode_i_frame([spec], 1, 1, qp=28))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(build, schema="doc_id long, payload binary")


def h264_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL H.264 intra pixel decode per payload (operators/
    h264_decode.py: CAVLC residuals, intra prediction, dequant/IDCT)
    followed by integer pixel statistics — the video analog of
    image_stats, with the same position-weighted checksum
    (sum of y * (1 + (row*w + col) % 97)) that catches misplaced
    pixels. Corrupt or out-of-scope payloads (CABAC, inter slices)
    degrade to valid=false rows, never fail the batch; the blobs
    never shuffle — only this few-column summary leaves the stage."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .h264_decode import decode_i_frame

        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                try:
                    fr = decode_i_frame(bytes(p))
                    y = fr.y.astype(np.int64)
                    h, w = y.shape
                    idx = (np.arange(h, dtype=np.int64)[:, None] * w
                           + np.arange(w, dtype=np.int64)[None, :])
                    rows.append((
                        int(i), w, h, int(y.sum()), int(y.min()),
                        int(y.max()),
                        int((y * (1 + idx % 97)).sum()),
                        int(fr.cb.astype(np.int64).sum()),
                        int(fr.cr.astype(np.int64).sum()), True))
                except Exception:  # noqa: BLE001 — corrupt blob
                    rows.append((int(i), 0, 0, 0, 0, 0, 0, 0, 0,
                                 False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "y_sum", "y_min",
                "y_max", "y_weighted", "cb_sum", "cr_sum", "valid"])

    return df.mapInPandas(stats, schema=H264_PIXEL_STATS_SCHEMA)


H264_KEYFRAME_SCHEMA = (
    "doc_id long, frame_id int, width int, height int, y_sum long, "
    "y_min int, y_max int, y_weighted long, valid boolean"
)


def with_h264_mp4_payload(
    df: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic MP4 containers holding H.264 intra KEYFRAMES
    (the container-to-codec composition fixture, r8): each doc muxes
    `2 + doc_id % 3` samples with keyframe_every=2, so even sample
    indices are stss-marked sync samples whose bytes are complete
    Annex B intra streams (operators/h264_decode.py, the same
    DC-only closed form as with_h264_pixel_payload but salted by the
    frame index: d = ((doc_id*7 + frame_id*13 + 5k) % 9) - 4), and
    odd indices carry opaque stand-in bytes for the inter frames a
    real camera stream would put there — exactly the shape a
    keyframe-sampling curation pipeline sees."""

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the payload build — the decoders downstream inherit the
    # partitioning; no-op at scale (see spread_small_scan)
    df = spread_small_scan(df)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs
        from .h264_decode import BLK_ZSCAN, encode_i_frame

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col].values:
                i = int(i)
                nf = 2 + i % 3
                samples = []
                for f in range(nf):
                    if f % 2 == 0:  # keyframe: decodable intra stream
                        luma = []
                        for blk in range(16):
                            bx, by = BLK_ZSCAN[blk]
                            lv = [0] * 16
                            lv[0] = ((i * 7 + f * 13
                                      + 5 * (4 * by + bx)) % 9) - 4
                            luma.append(lv)
                        samples.append(encode_i_frame(
                            [{"kind": "i4x4", "modes": [2] * 16,
                              "luma": luma, "chroma_mode": 0,
                              "cbp_chroma": 0}], 1, 1, qp=28))
                    else:           # inter stand-in: opaque bytes
                        samples.append(
                            f"p-frame:{i}:{f}".encode() * 8)
                ids.append(i)
                blobs.append(codecs.mp4_encode(
                    samples, width=16, height=16, codec=b"avc1",
                    keyframe_every=2))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(build, schema="doc_id long, payload binary")


def h264_keyframe_pixels(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Container -> codec -> pixels, end to end: walk the MP4 sample
    tables for stss-marked keyframes (codecs.mp4_extract_samples) and
    pixel-decode each one as an H.264 intra stream
    (h264_decode.decode_i_frame) — the real shape of keyframe
    sampling over camera/video corpora, where only sync samples are
    standalone-decodable. One row per (doc, keyframe) with integer
    luma stats and the position-weighted checksum; corrupt containers
    degrade to a flagged frame_id=-1 row, undecodable keyframes to
    valid=false rows. Blobs never shuffle."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import codecs
        from .h264_decode import decode_i_frame

        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                try:
                    got = codecs.mp4_extract_samples(
                        bytes(p), keyframes_only=True)
                except Exception:  # noqa: BLE001 — corrupt container
                    rows.append((int(i), -1, 0, 0, 0, 0, 0, 0, False))
                    continue
                for idx, payload, _k in got:
                    try:
                        fr = decode_i_frame(payload)
                        y = fr.y.astype(np.int64)
                        h, w = y.shape
                        pos = (np.arange(h, dtype=np.int64)[:, None]
                               * w + np.arange(w, dtype=np.int64))
                        rows.append((
                            int(i), idx, w, h, int(y.sum()),
                            int(y.min()), int(y.max()),
                            int((y * (1 + pos % 97)).sum()), True))
                    except Exception:  # noqa: BLE001 — bad keyframe
                        rows.append((int(i), idx, 0, 0, 0, 0, 0, 0,
                                     False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_id", "width", "height", "y_sum",
                "y_min", "y_max", "y_weighted", "valid"])

    return df.mapInPandas(frames, schema=H264_KEYFRAME_SCHEMA)


H264_GOP_SCHEMA = (
    "doc_id long, frame_id int, width int, height int, y_sum long, "
    "y_min int, y_max int, y_weighted long, cb_sum long, cr_sum long, "
    "valid boolean"
)


def _gop_mvs(doc_id: int) -> tuple[tuple[int, int], tuple[int, int]]:
    """Doc-derived FULL-PEL motion vectors for the two moving P
    frames of the GOP fixture (components in [-3, 3], so edge
    clamping is exercised on every border)."""
    return (((doc_id % 7) - 3, (doc_id // 7 % 7) - 3),
            (((doc_id * 3 + 1) % 7) - 3, ((doc_id * 5 + 2) % 7) - 3))


def with_h264_gop_payload(
    df: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic golden H.264 GOPs whose decoded pixels are a
    closed-form function of doc_id (the fixture side of the
    `multimodal_h264_gop` oracle loop — operators/h264_inter.py).

    Each doc becomes a 2x2-macroblock (32x32) four-picture GOP:

    - IDR: four Intra_4x4 DC-predicted macroblocks with DC-only
      levels d = ((doc_id*7 + m*11 + k*3) % 5) - 2 (m = MB index,
      k = 4x4 block index), QP 28 — the same flat-block recurrence as
      with_h264_pixel_payload but over the GLOBAL 8x8 block grid
      (prediction crosses macroblock edges), with |d| <= 2 keeping
      every value in [8, 248]: no clipping, closed form exact.
    - P1, P2: every MB P_L0_16x16 with the doc-derived FULL-PEL
      vector from _gop_mvs and zero residual (inter cbp 0, the
      HIGH-confidence codeNum 0), so decoded pixels are exactly
      ref[clip(y+mvy), clip(x+mvx)] — SQL-recomputable. Uniform mvs
      still put the mvd/mvp chain in the bits: MB0 codes the full
      vector, MB1-3 code zero differentials against real predictors.
    - P3: all P_Skip — one trailing mb_skip_run covers the picture
      and the skip-mv derivation must land on (0,0), i.e. a copy of
      P2. The bits in between are real skip runs, signed Exp-Golomb
      mvds, inter CBP and CAVLC — a decoder wrong about ANY of it
      lands on different pixels."""

    # r12 (guide §2.5): spread a starved gate-scale scan across cores
    # before the payload build — the decoders downstream inherit the
    # partitioning; no-op at scale (see spread_small_scan)
    df = spread_small_scan(df)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .h264_decode import BLK_ZSCAN
        from .h264_inter import encode_gop

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col].values:
                i = int(i)
                idr = []
                for m in range(4):
                    luma = []
                    for blk in range(16):
                        bx, by = BLK_ZSCAN[blk]
                        lv = [0] * 16
                        lv[0] = ((i * 7 + m * 11
                                  + (4 * by + bx) * 3) % 5) - 2
                        luma.append(lv)
                    idr.append({"kind": "i4x4", "modes": [2] * 16,
                                "luma": luma, "chroma_mode": 0,
                                "cbp_chroma": 0})
                mv1, mv2 = _gop_mvs(i)
                p1 = [{"kind": "p16x16",
                       "mv": (mv1[0] * 4, mv1[1] * 4),
                       "luma": None, "cbp_chroma": 0}] * 4
                p2 = [{"kind": "p16x16",
                       "mv": (mv2[0] * 4, mv2[1] * 4),
                       "luma": None, "cbp_chroma": 0}] * 4
                p3 = [{"kind": "skip"}] * 4
                ids.append(i)
                blobs.append(encode_gop(
                    [("idr", idr), ("p", p1), ("p", p2), ("p", p3)],
                    2, 2, qp=28))
            yield pd.DataFrame({"doc_id": ids, "payload": blobs})

    return df.mapInPandas(build, schema="doc_id long, payload binary")


def h264_gop_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """REAL H.264 GOP pixel decode per payload (operators/
    h264_inter.py: P slice headers, skip runs, mvd/mvp chains,
    quarter-sample motion compensation, inter CBP, on top of the
    intra layer) — one row per (doc, frame) with integer pixel stats
    and the position-weighted checksum. Corrupt or out-of-scope
    payloads degrade to a flagged valid=false row, never fail the
    batch; the blobs never shuffle — only this summary leaves the
    stage."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .h264_inter import decode_gop

        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                try:
                    frames = decode_gop(bytes(p))
                except Exception:  # noqa: BLE001 — corrupt blob
                    rows.append((int(i), -1, 0, 0, 0, 0, 0, 0, 0, 0,
                                 False))
                    continue
                for f, fr in enumerate(frames):
                    y = fr.y.astype(np.int64)
                    h, w = y.shape
                    pos = (np.arange(h, dtype=np.int64)[:, None] * w
                           + np.arange(w, dtype=np.int64)[None, :])
                    rows.append((
                        int(i), f, w, h, int(y.sum()), int(y.min()),
                        int(y.max()),
                        int((y * (1 + pos % 97)).sum()),
                        int(fr.cb.astype(np.int64).sum()),
                        int(fr.cr.astype(np.int64).sum()), True))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_id", "width", "height", "y_sum",
                "y_min", "y_max", "y_weighted", "cb_sum", "cr_sum",
                "valid"])

    return df.mapInPandas(stats, schema=H264_GOP_SCHEMA)
