"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (no image/audio libraries in this
environment): `decode_image_stub` derives deterministic fake
width/height from the payload's md5, so the full Spark-side plumbing —
binary schema, mapInPandas batch iteration, output schema, partition
behavior — is real and testable (and oracle-checkable, since the fake
decode is reproducible in SQL). Swap `_decode_one` for a PIL/ffmpeg
call in a real deployment.

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

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pack a text column into an opaque binary payload column
    (stand-in for real image/audio bytes) plus metadata."""
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


def real_decoders_available() -> bool:
    """True when an actual image library is importable."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False
