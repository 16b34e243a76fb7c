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


# ---------------------------------------------------------------------
# REAL media-container header probe (round 5): no codec libraries exist
# in this container, but container HEADERS are plain binary layouts — so
# metadata extraction (the corrupt-media filter every 100 TB multimodal
# pipeline runs before decode) is implemented for real: PNG IHDR, GIF
# logical screen, JPEG SOFn scan, and WAV fmt-chunk parsing from bytes.
# Only pixel/sample DECODE remains stubbed (decode_image_stub above).

PROBE_SCHEMA = (
    "doc_id long, kind string, width int, height int, "
    "sample_rate int, channels int"
)


def probe_media_header(payload: bytes) -> tuple[str, int | None, int | None, int | None, int | None]:
    """Parse (kind, width, height, sample_rate, channels) from a media
    blob's container header.  Pure binary parsing — PNG spec §5.2/11.2.2,
    GIF89a spec §17-18, JPEG JFIF SOFn segments, RIFF/WAVE fmt chunk."""
    import struct as _struct

    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = _struct.unpack_from(">II", payload, 16)
        return "png", w, h, None, None
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _struct.unpack_from("<HH", payload, 6)
        return "gif", w, h, None, None
    if n >= 2 and payload[:2] == b"\xff\xd8":
        # walk JFIF segments to the first SOFn (baseline/progressive)
        off = 2
        while off + 4 <= n:
            if payload[off] != 0xFF:
                break
            marker = payload[off + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                off += 2
                continue
            (seg_len,) = _struct.unpack_from(">H", payload, off + 2)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if off + 9 <= n:
                    h, w = _struct.unpack_from(">HH", payload, off + 5)
                    return "jpeg", w, h, None, None
                break
            off += 2 + seg_len
        return "jpeg", None, None, None, None
    if n >= 36 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        off = 12
        while off + 8 <= n:
            cid = payload[off : off + 4]
            (clen,) = _struct.unpack_from("<I", payload, off + 4)
            if cid == b"fmt " and off + 16 <= n:
                channels, rate = _struct.unpack_from("<HI", payload, off + 10)
                return "wav", None, None, rate, channels
            off += 8 + clen + (clen & 1)
        return "wav", None, None, None, None
    return "unknown", None, None, None, None


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: build VALID container headers deterministically
    from doc_id (kind = doc_id % 3 over png/gif/wav; dimensions/rates are
    fixed arithmetic on doc_id) with the doc text as trailing payload.
    The arithmetic is SQL-expressible on purpose: synthesize -> probe is
    a real binary round trip whose oracle is pure CASE arithmetic."""
    import struct as _struct
    import zlib as _zlib

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                w = 16 + d % 624
                h = 16 + (d * 7) % 464
                body = str(text).encode("utf-8")
                if d % 3 == 0:  # PNG with a correct IHDR (incl. CRC)
                    ihdr = b"IHDR" + _struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
                    blob = (
                        b"\x89PNG\r\n\x1a\n"
                        + _struct.pack(">I", 13)
                        + ihdr
                        + _struct.pack(">I", _zlib.crc32(ihdr) & 0xFFFFFFFF)
                        + body
                    )
                elif d % 3 == 1:  # GIF89a logical screen descriptor
                    blob = b"GIF89a" + _struct.pack("<HHBBB", w, h, 0, 0, 0) + body
                else:  # RIFF/WAVE with a 16-byte PCM fmt chunk
                    rate = 8000 + (d % 5) * 8000
                    ch = 1 + d % 2
                    fmt = _struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
                    blob = (
                        b"RIFF"
                        + _struct.pack("<I", 4 + 8 + len(fmt) + len(body))
                        + b"WAVE"
                        + b"fmt "
                        + _struct.pack("<I", len(fmt))
                        + fmt
                        + body
                    )
                payloads.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        synth_batches, "doc_id long, payload binary"
    )


def probe_media(media_df: DataFrame) -> DataFrame:
    """X5 metadata extraction over mapInPandas: parse container headers
    of a (doc_id, payload) frame into PROBE_SCHEMA — zero shuffles, the
    probe rides the scan."""

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_media_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[3] for r in rows], dtype="Int32"),
                    "channels": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return media_df.mapInPandas(probe_batches, PROBE_SCHEMA)
