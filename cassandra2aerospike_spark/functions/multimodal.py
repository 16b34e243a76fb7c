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


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "scale_x double, scale_y double, thumb binary"
)


def resize_stub(binary_df: DataFrame, dst_w: int = 32, dst_h: int = 32) -> DataFrame:
    """X5 resize over mapInPandas (STUB: real impl would call PIL here).

    The fake 'thumbnail' is the payload truncated/cycled to dst_w*dst_h
    bytes — deterministic, size-correct, exercises binary-out columns
    through Arrow.  Source dims come from the stub decoder."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, _ = _fake_decode(payload)
                n = dst_w * dst_h
                reps = -(-n // max(1, len(payload))) if payload else 1
                thumb = ((bytes(payload) * reps)[:n]) if payload else b""
                rows.append(
                    (
                        doc_id, w, h, dst_w, dst_h,
                        dst_w / w if w else 0.0,
                        dst_h / h if h else 0.0,
                        thumb,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_w", "src_h", "dst_w", "dst_h",
                    "scale_x", "scale_y", "thumb",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        resize_batches, RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def frame_sample_stub(binary_df: DataFrame, every_n: int = 4) -> DataFrame:
    """X5 video frame sampling over mapInPandas: one OUTPUT ROW PER
    SAMPLED FRAME (the cardinality-expanding flatMap shape).  Frame count
    is the stub decoder's byte_len // 1024 rule; the per-frame 'content
    hash' is md5(doc_id:frame_idx) — both SQL-expressible on purpose, so
    this Python path has an exact DuckDB oracle."""
    import hashlib

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_md5 = [], [], []
            for doc_id, blen in zip(pdf["doc_id"], pdf["byte_len"]):
                n_frames = max(1, int(blen) // 1024)
                for idx in range(0, n_frames, every_n):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_md5.append(
                        hashlib.md5(f"{doc_id}:{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return binary_df.select("doc_id", "byte_len").mapInPandas(
        sample_batches, FRAME_SCHEMA
    )
