"""Multimodal column handling (north-star X5).

Design: media live as opaque `binary` columns with typed metadata
alongside (the reference's value model — all cells are byte blobs,
/root/reference/README.md:39 — generalized).  Decode / feature-extract
runs as Arrow-batched `mapInPandas` so each task streams record batches
without materializing the whole partition; at 100 TB the binary column
rides the same parquet scan and never passes through the driver.

The container has no image/audio codecs, so `decode_image_stub` is a
clearly-marked STUB: it produces deterministic fake features from the
bytes.  The Spark-side plumbing — schema, batch iteration, partitioning —
is real and tested; swap `_fake_decode` for a real codec in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, n_frames int, features array<double>"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary payload column plus
    typed metadata (the shape a real image/audio table would have)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(payload).alias("byte_len"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
        F.lower(F.hex(F.substring(payload, 1, 8))).alias("magic_hex"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decoder: deterministic pseudo-decode of a media blob.

    Real implementation would call PIL/ffmpeg here (NotImplementedError in
    this container).  The fake derives (width, height, n_frames, features)
    from the bytes so tests exercise the full batch path deterministically.
    """
    if not payload:
        return 0, 0, 0, []
    arr = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.float64)
    width = int(arr[0]) + 1 if len(arr) > 0 else 0
    height = int(arr[-1]) + 1 if len(arr) > 0 else 0
    n_frames = max(1, len(payload) // 1024)
    feats = (arr[:8] / 255.0).tolist()
    return width, height, n_frames, feats


def decode_image_stub(binary_df: DataFrame) -> DataFrame:
    """X5 decode/feature-extract over mapInPandas (Arrow batch iterator).

    Input: DataFrame with (doc_id, payload binary, byte_len).  Output:
    FEATURE_SCHEMA.  The iterator shape keeps peak memory at one Arrow
    batch per task regardless of partition size.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "byte_len": pdf["byte_len"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return binary_df.select("doc_id", "payload", "byte_len").mapInPandas(
        decode_batches, FEATURE_SCHEMA
    )
