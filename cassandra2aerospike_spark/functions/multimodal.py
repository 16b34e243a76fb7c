"""Multimodal column handling (north-star X5).

Design: media live as opaque `binary` columns with typed metadata
alongside (the reference's value model — all cells are byte blobs,
/root/reference/README.md:39 — generalized).  Decode / feature-extract
runs as Arrow-batched `mapInPandas` so each task streams record batches
without materializing the whole partition; at 100 TB the binary column
rides the same parquet scan and never passes through the driver.

Decode coverage is split by what pure Python + numpy can express:

  REAL     container-header metadata probe (PNG/GIF/JPEG/WAV,
           `probe_media_header`), WAV-PCM sample decode with audio
           features (`decode_wav_pcm`), uncompressed 24-bit BMP pixel
           decode with channel stats (`decode_bmp`), and full PNG
           pixel decode — chunk CRCs, zlib inflate, all five scanline
           filters — via stdlib zlib (`decode_png`, with `encode_png`
           emitting spec-valid PNGs for the fixture path)
           plus baseline JPEG (pure-numpy Huffman+DCT, `jpeg_py`) and
           GIF incl. animated LZW (`gif_py`)
  STUBBED  `decode_image_stub` / `resize_stub` / `frame_sample_stub`
           remain ONLY as deterministic unit-test baselines for the
           mapInPandas plumbing (schema, batch iteration, flatMap
           cardinality — tests/test_extensions.py); since round 6 they
           back no registry query — the real decoders (`mm_real_*`)
           own that surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# r18 (guide §2.5 input parallelism / §4): every synthesize_* adapter
# feeds a CPU-heavy pure-Python mapInPandas chain (codec encode + real
# byte decode) that runs entirely within the scan's partitioning — for
# the single-small-file documents fixture that was ONE serial task
# (profiled: mm_video_fp_dedup spent 4.8 s wall in one task at 0.1 s
# JVM CPU while 31 cores idled).  spread_scan round-robins the tiny
# (doc_id[, text]) rows across cores first, and is a structural no-op
# whenever the scan already has >= cores splits (the 100 TB case) or
# the input is a derived frame.
from ..sources.tables import spread_scan

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

    return spread_scan(docs.select("doc_id", "text"), min_bytes_per_core=0).mapInPandas(
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


# ---------------------------------------------------------------------
# REAL sample/pixel decode (round 5): WAV-PCM and BMP are pure binary
# layouts decodable with numpy alone, and PNG needs only stdlib zlib
# (inflate + the five scanline filters) — so for these three formats
# the X5 decode path is REAL end to end: bytes -> samples/pixels ->
# features.  Only JPEG (which needs a DCT codec) remains the
# documented stub above.

DECODE_SCHEMA = (
    "doc_id long, kind string, n_samples int, rms double, peak int, "
    "zero_crossings int, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def wav_pcm_samples(payload: bytes) -> np.ndarray:
    """REAL audio decode, sample half: RIFF/WAVE 16-bit PCM -> the
    (channel-downmixed) sample array.  The chunk walk is the format
    contract; features and fingerprints both build on this.  Raises
    ValueError on non-PCM16 or truncated chunks."""
    import struct as _struct

    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE blob")
    off = 12
    channels = None
    samples = None
    while off + 8 <= n:
        cid = payload[off : off + 4]
        (clen,) = _struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + clen]
        if len(body) < clen:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("wav: truncated fmt chunk")
            fmt_code, channels = _struct.unpack_from("<HH", body, 0)
            (bits,) = _struct.unpack_from("<H", body, 14)
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"wav: only PCM16 supported, got fmt={fmt_code} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
        off += 8 + clen + (clen & 1)
    if channels is None or samples is None:
        raise ValueError("wav: missing fmt/data chunk")
    if channels > 1:  # downmix interleaved channels for the features
        usable = len(samples) - len(samples) % channels
        samples = samples[:usable].reshape(-1, channels).mean(axis=1)
    return samples


def decode_wav_pcm(payload: bytes):
    """REAL audio decode: RIFF/WAVE 16-bit PCM -> int16 sample array ->
    (n_samples, rms, peak, zero_crossings).  Raises ValueError on
    non-PCM16 or truncated chunks."""
    x = wav_pcm_samples(payload).astype(np.float64)
    n_samples = len(x)
    if n_samples == 0:
        return 0, 0.0, 0, 0
    rms = float(np.sqrt(np.mean(x * x)))
    peak = int(np.max(np.abs(x)))
    zcr = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return n_samples, rms, peak, zcr


def decode_bmp(payload: bytes):
    """REAL image decode: uncompressed 24-bit BI_RGB BMP -> (h, w, 3)
    uint8 pixel array (RGB order; BMP stores BGR bottom-up with 4-byte
    row padding).  Raises ValueError on other BMP variants."""
    import struct as _struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("bmp: not a BM blob")
    (data_off,) = _struct.unpack_from("<I", payload, 10)
    w, h = _struct.unpack_from("<ii", payload, 18)
    (bpp,) = _struct.unpack_from("<H", payload, 28)
    (compression,) = _struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"bmp: only 24-bit BI_RGB supported, got bpp={bpp} comp={compression}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if w <= 0 or h <= 0 or len(payload) < need:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    return img[:, :, ::-1]  # BGR -> RGB


def encode_png(img: np.ndarray) -> bytes:
    """REAL PNG encode (stdlib zlib only): (h, w, 3) uint8 RGB -> a
    spec-valid 8-bit truecolor PNG — IHDR/IDAT/IEND with correct CRC32s,
    filter type 0 per scanline, zlib-deflate stream.  Any conforming PNG
    reader decodes it; used by the fixture synthesizer so decode_png is
    exercised on real bytes."""
    import struct as _struct
    import zlib as _zlib

    h, w, nch = img.shape
    if nch != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png: expects (h, w, 3) uint8 RGB")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            _struct.pack(">I", len(body))
            + ctype
            + body
            + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode (stdlib zlib only — no codec library): 8-bit
    truecolor (color type 2) and truecolor+alpha (type 6), interlace 0.
    Verifies every chunk CRC32, inflates the concatenated IDAT stream,
    checks the exact decompressed length, and un-applies all five
    scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) -> (h, w,
    3) uint8 RGB (alpha dropped).  Palette/16-bit/Adam7 raise ValueError
    — same uniform-rejection discipline as the snappy/lz4 decoders.

    The Sub/Average/Paeth recurrences are per-byte Python loops (they
    are sequential by definition); Up and None are vectorized.  Cost is
    bounded by image size, and the fixture path encodes with filter 0."""
    import struct as _struct
    import zlib as _zlib

    n = len(payload)
    if n < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("png: bad signature")
    off = 8
    ihdr = None
    idat: list[bytes] = []
    saw_end = False
    while off + 12 <= n:
        (clen,) = _struct.unpack_from(">I", payload, off)
        if off + 12 + clen > n:
            raise ValueError("png: truncated chunk")
        ctype = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + clen]
        (crc,) = _struct.unpack_from(">I", payload, off + 8 + clen)
        if _zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError("png: chunk crc mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = _struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0 or inter != 0:
                raise ValueError(
                    f"png: unsupported image (depth={depth} color={color} interlace={inter})"
                )
            ihdr = (w, h, 3 if color == 2 else 4)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            saw_end = True
            break
        off += 12 + clen
    if ihdr is None or not idat or not saw_end:
        raise ValueError("png: missing IHDR/IDAT/IEND")
    w, h, nch = ihdr
    stride = w * nch
    expected = (stride + 1) * h
    try:
        # decompressobj with max_length caps inflation at the declared
        # image size (+1 to detect overrun), so a crafted deflate bomb
        # in IDAT cannot allocate beyond the IHDR-declared dimensions
        dec = _zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected + 1)
    except _zlib.error as e:
        raise ValueError(f"png: bad IDAT stream ({e})") from e
    if len(raw) != expected or not dec.eof or stride == 0 or h == 0:
        raise ValueError("png: decompressed size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(lines[y, 0])
        line = lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) & 0xFF
        elif ftype == 1:
            cur = line.copy()
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif ftype == 3:
            cur = line.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"png: bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, nch)[:, :, :3]


def decode_media(media_df: DataFrame) -> DataFrame:
    """X5 REAL decode over mapInPandas: dispatch by container magic —
    RIFF/WAVE blobs through the PCM decoder (audio features: rms, peak,
    zero-crossing count); BM, PNG, baseline-JPEG and GIF blobs through
    their pixel decoders (channel means) — BMP via numpy row math, PNG
    via zlib inflate + scanline unfilter, JPEG via the full huffman/DCT
    path (jpeg_py), GIF via variable-width LZW (gif_py).  Zero
    shuffles; the decode rides the scan."""

    from .gif_py import decode_gif
    from .jpeg_py import decode_jpeg_baseline

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                img = None
                if p[:4] == b"RIFF":
                    n_s, rms, peak, zcr = decode_wav_pcm(p)
                    rows.append((doc_id, "wav", n_s, rms, peak, zcr,
                                 None, None, None, None, None))
                    continue
                elif p[:2] == b"BM":
                    kind, img = "bmp", decode_bmp(p)
                elif p[:8] == b"\x89PNG\r\n\x1a\n":
                    kind, img = "png", decode_png(p)
                elif p[:2] == b"\xff\xd8":
                    kind, img = "jpeg", decode_jpeg_baseline(p)
                elif p[:6] in (b"GIF87a", b"GIF89a"):
                    kind, img = "gif", decode_gif(p)
                if img is not None:
                    means = img.reshape(-1, 3).mean(axis=0)
                    rows.append((doc_id, kind, None, None, None, None,
                                 img.shape[1], img.shape[0],
                                 float(means[0]), float(means[1]), float(means[2])))
                else:
                    rows.append((doc_id, "unknown", None, None, None, None,
                                 None, None, None, None, None))
            pdf_out = pd.DataFrame(
                rows,
                columns=["doc_id", "kind", "n_samples", "rms", "peak",
                         "zero_crossings", "width", "height",
                         "mean_r", "mean_g", "mean_b"],
            )
            for c in ("n_samples", "peak", "zero_crossings", "width", "height"):
                pdf_out[c] = pdf_out[c].astype("Int32")
            yield pdf_out

    return media_df.select("doc_id", "payload").mapInPandas(
        decode_batches, DECODE_SCHEMA
    )


def synthesize_av_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter for the REAL decode path: deterministic WAV-PCM
    square waves (doc_id % 5 == 0: amplitude 1000 + d%100, n = 400 +
    d%50 samples, mono 8 kHz — RMS and peak are EXACTLY the amplitude,
    and a square wave alternating every sample has n-1 zero crossings),
    solid-color 24-bit BMPs (doc_id % 5 == 1: w = 8 + d%16, h = 4 +
    d%8, RGB = (d%256, 3d%256, 7d%256)), solid-color REAL PNGs
    (doc_id % 5 == 2: same dims, RGB = (5d%256, 11d%256, 13d%256),
    through encode_png — spec-valid chunks, CRCs and deflate stream),
    solid-color REAL baseline JPEGs (doc_id % 5 == 3: same dims,
    RGB = (17d%256, 23d%256, 29d%256), quant=1 through
    encode_jpeg_baseline — with flat unit quant tables a constant block
    is DC-only and decodes EXACTLY to the YCbCr-roundtripped color, so
    even the lossy format has a closed-form oracle) and REAL LZW GIFs
    (doc_id % 5 == 4: same dims, RGB = (31d%256, 37d%256, 41d%256),
    through encode_gif — palette-exact, so decode returns the color).
    All features are deterministic arithmetic on doc_id."""
    import struct as _struct

    from .gif_py import encode_gif
    from .jpeg_py import encode_jpeg_baseline

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 5 == 0:  # WAV: ±amp alternating square wave
                    amp = 1000 + d % 100
                    n = 400 + d % 50
                    x = np.empty(n, dtype="<i2")
                    x[0::2] = amp
                    x[1::2] = -amp
                    body = x.tobytes()
                    fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                    blob = (
                        b"RIFF"
                        + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
                        + b"WAVE"
                        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                        + b"data" + _struct.pack("<I", len(body)) + body
                    )
                elif d % 5 == 1:  # BMP: solid color, bottom-up, padded rows
                    w = 8 + d % 16
                    h = 4 + d % 8
                    r, g, b = d % 256, (3 * d) % 256, (7 * d) % 256
                    stride = (w * 3 + 3) & ~3
                    row = (bytes((b, g, r)) * w).ljust(stride, b"\x00")
                    pixels = row * h
                    blob = (
                        b"BM"
                        + _struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
                        + _struct.pack("<IiiHHIIiiII",
                                       40, w, h, 1, 24, 0, len(pixels),
                                       2835, 2835, 0, 0)
                        + pixels
                    )
                elif d % 5 == 2:  # PNG: solid color through the real encoder
                    w = 8 + d % 16
                    h = 4 + d % 8
                    color = ((5 * d) % 256, (11 * d) % 256, (13 * d) % 256)
                    img = np.full((h, w, 3), color, dtype=np.uint8)
                    blob = encode_png(img)
                elif d % 5 == 3:  # JPEG: solid color, unit quant (DC-exact)
                    w = 8 + d % 16
                    h = 4 + d % 8
                    color = ((17 * d) % 256, (23 * d) % 256, (29 * d) % 256)
                    img = np.full((h, w, 3), color, dtype=np.uint8)
                    blob = encode_jpeg_baseline(img, quant=1)
                else:  # GIF: solid color through the real LZW encoder
                    w = 8 + d % 16
                    h = 4 + d % 8
                    color = ((31 * d) % 256, (37 * d) % 256, (41 * d) % 256)
                    img = np.full((h, w, 3), color, dtype=np.uint8)
                    blob = encode_gif(img)
                payloads.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "doc_id long, payload binary"
    )


def probe_mp4(payload: bytes) -> tuple[str, int, int, int]:
    """REAL MP4/ISO-BMFF container probe (video metadata without a
    codec): walks the top-level box tree (32-bit and 64-bit `largesize`
    boxes), reads the `ftyp` major brand, descends into `moov` for the
    `mvhd` header and returns (brand, timescale, duration, n_top_boxes)
    — version 0 and 1 mvhd layouts (ISO/IEC 14496-12 §8.2.2).  Raises
    ValueError on truncation or a missing ftyp/moov/mvhd."""
    import struct as _struct

    n = len(payload)

    def walk(lo: int, hi: int):
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("mp4: truncated box header")
            (size,) = _struct.unpack_from(">I", payload, pos)
            btype = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    raise ValueError("mp4: truncated largesize")
                (size,) = _struct.unpack_from(">Q", payload, pos + 8)
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            if size < body - pos or pos + size > hi:
                raise ValueError("mp4: box size out of bounds")
            yield btype, body, pos + size
            pos += size

    brand = None
    timescale = duration = None
    n_top = 0
    for btype, body, end in walk(0, n):
        n_top += 1
        if btype == b"ftyp":
            if end - body < 8:
                raise ValueError("mp4: truncated ftyp")
            brand = payload[body : body + 4].decode("latin-1")
        elif btype == b"moov":
            for ctype, cbody, cend in walk(body, end):
                if ctype != b"mvhd":
                    continue
                if cend - cbody < 4:
                    raise ValueError("mp4: truncated mvhd")
                version = payload[cbody]
                if version == 0:
                    if cend - cbody < 20:
                        raise ValueError("mp4: truncated mvhd v0")
                    timescale, duration = _struct.unpack_from(
                        ">II", payload, cbody + 12
                    )
                elif version == 1:
                    if cend - cbody < 32:
                        raise ValueError("mp4: truncated mvhd v1")
                    (timescale,) = _struct.unpack_from(">I", payload, cbody + 20)
                    (duration,) = _struct.unpack_from(">Q", payload, cbody + 24)
                else:
                    raise ValueError(f"mp4: mvhd version {version} unsupported")
    if brand is None or timescale is None:
        raise ValueError("mp4: missing ftyp/moov/mvhd")
    if timescale == 0:  # uniform rejection, never a ZeroDivisionError later
        raise ValueError("mp4: zero mvhd timescale")
    return brand, timescale, duration, n_top


def synthesize_mp4(docs: DataFrame) -> DataFrame:
    """Fixture adapter for the MP4 probe: spec-valid ISO-BMFF box trees
    deterministically from doc_id — ftyp(brand isom) + moov{mvhd v0,
    timescale = 1000 * (1 + d%5), duration = 1000 + (777*d) % 100000} +
    an mdat carrying the doc text.  Every 7th doc uses an mvhd VERSION 1
    (64-bit times) so both layouts are exercised."""
    import struct as _struct

    def box(btype: bytes, body: bytes) -> bytes:
        return _struct.pack(">I", 8 + len(body)) + btype + body

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                ts = 1000 * (1 + d % 5)
                dur = 1000 + (777 * d) % 100000
                if d % 7 == 0:  # version 1: 64-bit create/modify/duration
                    mvhd = (
                        b"\x01\x00\x00\x00"
                        + _struct.pack(">QQIQ", 0, 0, ts, dur)
                        + bytes(80)
                    )
                else:
                    mvhd = (
                        b"\x00\x00\x00\x00"
                        + _struct.pack(">IIII", 0, 0, ts, dur)
                        + bytes(80)
                    )
                blob = (
                    box(b"ftyp", b"isom" + _struct.pack(">I", 512) + b"isommp41")
                    + box(b"moov", box(b"mvhd", mvhd))
                    + box(b"mdat", str(text).encode())
                )
                payloads.append(blob)
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    return spread_scan(docs.select("doc_id", "text"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "doc_id long, payload binary"
    )


def probe_mp4_media(media_df: DataFrame) -> DataFrame:
    """X5 video-container probe over mapInPandas: real box-tree walk per
    blob -> (brand, timescale, duration, duration_ms).  Zero shuffles."""

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                brand, ts, dur, n_top = probe_mp4(bytes(p))
                rows.append((doc_id, brand, ts, dur, n_top,
                             1000 * dur // ts))
            pdf_out = pd.DataFrame(
                rows,
                columns=["doc_id", "brand", "timescale", "duration",
                         "n_boxes", "duration_ms"],
            )
            pdf_out["n_boxes"] = pdf_out["n_boxes"].astype("Int32")
            yield pdf_out

    return media_df.select("doc_id", "payload").mapInPandas(
        probe_batches,
        "doc_id long, brand string, timescale long, duration long, "
        "n_boxes int, duration_ms long",
    )


FRAME_SAMPLE_REAL_SCHEMA = (
    "doc_id long, frame_no int, n_frames int, "
    "f_mean_r double, f_mean_g double, f_mean_b double"
)


def synthesize_animations(docs: DataFrame) -> DataFrame:
    """Fixture adapter for REAL frame sampling: deterministic animated
    GIFs (the container standing in for video — n_frames = 2 + d%4
    full-size frames, frame f solid RGB = ((31d+7f)%256, (37d+11f)%256,
    (41d+13f)%256), dims w = 8 + d%16, h = 4 + d%8) through
    encode_gif_animation — real GIF89a with graphic-control extensions
    and per-frame LZW streams, so decode_gif_frames walks actual
    multi-image GIF structure."""
    from .gif_py import encode_gif_animation

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 16, 4 + d % 8
                frames = [
                    np.full(
                        (h, w, 3),
                        ((31 * d + 7 * f) % 256, (37 * d + 11 * f) % 256,
                         (41 * d + 13 * f) % 256),
                        dtype=np.uint8,
                    )
                    for f in range(2 + d % 4)
                ]
                payloads.append(encode_gif_animation(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "doc_id long, payload binary"
    )


def frame_sample_real(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """X5 REAL frame sampling — the video-pipeline op, on real bytes:
    decode EVERY frame of each animated GIF (gif_py.decode_gif_frames),
    keep every `every_n`-th, emit per-frame channel means.  The
    flatMap-over-frames shape video feature extraction needs; zero
    shuffles, rides the scan."""
    from .gif_py import decode_gif_frames

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(p))
                for f, img in enumerate(frames):
                    if f % every_n:
                        continue
                    means = img.reshape(-1, 3).mean(axis=0)
                    rows.append((doc_id, f, len(frames),
                                 float(means[0]), float(means[1]), float(means[2])))
            pdf_out = pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "n_frames",
                         "f_mean_r", "f_mean_g", "f_mean_b"],
            )
            for c in ("frame_no", "n_frames"):
                pdf_out[c] = pdf_out[c].astype("Int32")
            yield pdf_out

    return media_df.select("doc_id", "payload").mapInPandas(
        sample_batches, FRAME_SAMPLE_REAL_SCHEMA
    )


RESIZE_REAL_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "thumb_len int, t_mean_r double, t_mean_g double, t_mean_b double"
)


def resize_nn(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """REAL nearest-neighbor resize: source index floor(i * src / dst)
    per axis via numpy fancy indexing — the standard NN sampling grid."""
    h, w, _c = img.shape
    ys = (np.arange(dst_h) * h) // dst_h
    xs = (np.arange(dst_w) * w) // dst_w
    return img[ys][:, xs]


def resize_media_real(
    media_df: DataFrame, dst_w: int = 16, dst_h: int = 12
) -> DataFrame:
    """X5 REAL image resize over mapInPandas: BMP, PNG, baseline-JPEG
    and GIF payloads are pixel-decoded (decode_bmp / decode_png /
    decode_jpeg_baseline / decode_gif), nearest-neighbor resampled to
    (dst_w, dst_h), and re-emitted with the real thumbnail's byte
    length and channel means.  Non-image payloads emit no row (the
    filtering flatMap shape).  Zero shuffles; the resize rides the
    scan."""
    from .gif_py import decode_gif
    from .jpeg_py import decode_jpeg_baseline

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                if p[:2] == b"BM":
                    img = decode_bmp(p)
                elif p[:8] == b"\x89PNG\r\n\x1a\n":
                    img = decode_png(p)
                elif p[:2] == b"\xff\xd8":
                    img = decode_jpeg_baseline(p)
                elif p[:6] in (b"GIF87a", b"GIF89a"):
                    img = decode_gif(p)
                else:
                    continue
                thumb = resize_nn(img, dst_w, dst_h)
                means = thumb.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (doc_id, img.shape[1], img.shape[0], dst_w, dst_h,
                     thumb.size, float(means[0]), float(means[1]), float(means[2]))
                )
            pdf_out = pd.DataFrame(
                rows,
                columns=["doc_id", "src_w", "src_h", "dst_w", "dst_h",
                         "thumb_len", "t_mean_r", "t_mean_g", "t_mean_b"],
            )
            for c in ("src_w", "src_h", "dst_w", "dst_h", "thumb_len"):
                pdf_out[c] = pdf_out[c].astype("Int32")
            yield pdf_out

    return media_df.select("doc_id", "payload").mapInPandas(
        resize_batches, RESIZE_REAL_SCHEMA
    )


def synthesize_gradient_images(docs: DataFrame, plant_every: int = 7) -> DataFrame:
    """Fixture adapter for the X2 x X5 perceptual-hash dedup bridge
    (round 15): one 9x8 GRAYSCALE-GRADIENT 24-bit BMP per document —
    pixel v(d, r, c) = (m1 + m2*(r+1)^2 + m3*(c+1)^2 + m4*(r+1)*(c+1))
    % 250 with the per-doc mixers m1 = (d*2654435761) % 1000003,
    m2 = (d*40503 + 17) % 997, m3 = (d*69621 + 31) % 983,
    m4 = (d*48271 + 7) % 991 (Knuth/Lehmer multipliers: measured dHash
    bit mean 0.497 over the fixture, so LSH buckets stay O(1)) — plus a
    PLANTED NEAR-DUPLICATE for every doc_id % plant_every == 0:
    img_id = doc_id + 1_000_000, every pixel shifted by +1 + d%2
    (base < 250, shift <= 2: no 8-bit wrap, so the shift preserves
    every dHash gradient comparison exactly while leaving an integer
    pixel distance of 72 or 144 for the verifier).

    CROSS-FORMAT: sources alternate container by parity (doc_id % 2 ==
    0 -> 24-bit BMP, == 1 -> real 8-bit truecolor PNG through
    encode_png — spec-valid chunks, CRCs, deflate), and every planted
    copy is stored in the OPPOSITE container from its source, so the
    near-dup pairs the pipeline must catch are BMP <-> PNG — the
    format-invariance a real image dedup needs (the same picture
    re-encoded must still dedup).  Both containers are lossless, so
    the decoded pixels — and the closed-form integer oracle — are
    identical either way.  The synthesize -> decode -> hash round trip
    keeps the byte-level decode REAL while every downstream stage has
    an exact oracle."""
    import struct as _struct

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = 9, 8
        stride = (w * 3 + 3) & ~3
        rr = np.arange(h, dtype=np.int64)[:, None] + 1
        cc = np.arange(w, dtype=np.int64)[None, :] + 1
        hdr = (
            b"BM"
            + _struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
            + _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                2835, 2835, 0, 0,
            )
        )

        def gray(d: int, delta: int) -> np.ndarray:
            m1 = (d * 2654435761) % 1000003
            m2 = (d * 40503 + 17) % 997
            m3 = (d * 69621 + 31) % 983
            m4 = (d * 48271 + 7) % 991
            return ((m1 + m2 * rr * rr + m3 * cc * cc + m4 * rr * cc) % 250
                    + delta).astype(np.uint8)

        def blob_of(d: int, delta: int, as_png: bool) -> bytes:
            v = gray(d, delta)
            if as_png:
                return encode_png(np.repeat(v[:, :, None], 3, axis=2))
            rows = []
            for y in range(h - 1, -1, -1):  # bottom-up, grayscale r=g=b=v
                row = np.repeat(v[y], 3).tobytes()
                rows.append(row.ljust(stride, b"\x00"))
            return hdr + b"".join(rows)

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(d)
                payloads.append(blob_of(d, 0, as_png=bool(d % 2)))
                if d % plant_every == 0:
                    # the near-dup lives in the OTHER container
                    ids.append(d + 1_000_000)
                    payloads.append(
                        blob_of(d, 1 + d % 2, as_png=not (d % 2))
                    )
            yield pd.DataFrame({"img_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "img_id long, payload binary"
    )


def decode_gray_pixels(media_df: DataFrame) -> DataFrame:
    """REAL pixel decode for the perceptual-hash path: each payload
    byte-decoded by its magic — BMP (decode_bmp: stride padding,
    bottom-up flip, BGR->RGB) or PNG (decode_png: chunk walk, zlib
    inflate, per-scanline unfilter) — and flattened to the row-major
    grayscale pixel array (channel 0; the gradient fixture stores
    r=g=b).  Zero shuffles; rides the scan."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pxs = [], [], [], []
            for img_id, p in zip(pdf["img_id"], pdf["payload"]):
                p = bytes(p)
                img = (
                    decode_png(p)
                    if p[:8] == b"\x89PNG\r\n\x1a\n"
                    else decode_bmp(p)
                )
                ids.append(int(img_id))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                pxs.append([int(x) for x in img[:, :, 0].reshape(-1)])
            out = pd.DataFrame({"img_id": ids, "w": ws, "h": hs, "px": pxs})
            out["w"] = out["w"].astype("Int32")
            out["h"] = out["h"].astype("Int32")
            yield out

    return media_df.select("img_id", "payload").mapInPandas(
        decode_batches, "img_id long, w int, h int, px array<int>"
    )


def synthesize_doc_images(docs: DataFrame, alias_every: int = 7) -> DataFrame:
    """Fixture adapter for the MULTIMODAL corpus-prep capstone (round
    15): ONE image per document, keyed by the document id itself —
    the corpus where an image near-dup decision must gate the same
    keep-list as the text decisions.  Every doc_id % alias_every == 0
    (and >= 1) displays the PREVIOUS document's gradient, pixel-shifted
    by +1 + d%2 — so (d-1, d) are image near-duplicates and the
    dedup's drop-the-larger rule must drop doc d.  d-1 is never itself
    aliased (d % 7 == 0 -> (d-1) % 7 == 6), so the pair's smaller side
    always shows its own gradient; and d-1/d have opposite parity, so
    every near-dup pair crosses the BMP <-> PNG container boundary
    like the planted mm_phash_dedup pairs.  Same pixel arithmetic as
    synthesize_gradient_images -> same closed-form oracle."""
    import struct as _struct

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = 9, 8
        stride = (w * 3 + 3) & ~3
        rr = np.arange(h, dtype=np.int64)[:, None] + 1
        cc = np.arange(w, dtype=np.int64)[None, :] + 1
        hdr = (
            b"BM"
            + _struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
            + _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                2835, 2835, 0, 0,
            )
        )

        def gray(d: int, delta: int) -> np.ndarray:
            m1 = (d * 2654435761) % 1000003
            m2 = (d * 40503 + 17) % 997
            m3 = (d * 69621 + 31) % 983
            m4 = (d * 48271 + 7) % 991
            return ((m1 + m2 * rr * rr + m3 * cc * cc + m4 * rr * cc) % 250
                    + delta).astype(np.uint8)

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                aliased = d % alias_every == 0 and d >= 1
                v = gray(d - 1 if aliased else d, (1 + d % 2) if aliased else 0)
                if d % 2:  # container by parity: aliased pairs cross formats
                    blob = encode_png(np.repeat(v[:, :, None], 3, axis=2))
                else:
                    rows = []
                    for y in range(h - 1, -1, -1):
                        row = np.repeat(v[y], 3).tobytes()
                        rows.append(row.ljust(stride, b"\x00"))
                    blob = hdr + b"".join(rows)
                ids.append(d)
                payloads.append(blob)
            yield pd.DataFrame({"img_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "img_id long, payload binary"
    )


def synthesize_audio_clips(docs: DataFrame, alias_every: int = 9) -> DataFrame:
    """Fixture adapter for AUDIO near-dup dedup (round 15): one mono
    PCM16 WAV per document, keyed by the document id — sample
    s(d, i) = ((m1 + m2*(i+1) + m3*(i+1)^2) % 2001) - 1000 over
    n = 96 + d%32 samples (same Knuth/Lehmer mixers as the image
    fixture; measured delta-sign bit mean 0.5005, max 16-bit-band
    bucket 17 at 5k docs).  Every doc_id % alias_every == 0 (and >= 1)
    stores the PREVIOUS document's samples SCALED x2 — the
    loudness-changed re-encode that a robust audio fingerprint must
    still catch: positive scaling preserves every delta sign and every
    zero crossing while changing every byte.  |sample| <= 2000 keeps
    the scaled copy inside int16.  d-1 is never itself aliased, so the
    pair's smaller side is always an original."""
    import struct as _struct

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)

        def samples(d: int, scale: int) -> np.ndarray:
            n = 96 + d % 32
            i = np.arange(n, dtype=np.int64) + 1
            m1 = (d * 2654435761) % 1000003
            m2 = (d * 40503 + 17) % 997
            m3 = (d * 69621 + 31) % 983
            v = ((m1 + m2 * i + m3 * i * i) % 2001) - 1000
            return (v * scale).astype("<i2")

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                aliased = d % alias_every == 0 and d >= 1
                body = samples(d - 1 if aliased else d, 2 if aliased else 1).tobytes()
                blob = (
                    b"RIFF"
                    + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
                    + b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"data" + _struct.pack("<I", len(body)) + body
                )
                ids.append(d)
                payloads.append(blob)
            yield pd.DataFrame({"clip_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "clip_id long, payload binary"
    )


def decode_pcm_samples(media_df: DataFrame, head: int = 65) -> DataFrame:
    """REAL sample decode for the audio-fingerprint path: each WAV
    payload byte-decoded (wav_pcm_samples — the RIFF chunk walk) and
    projected to (n_samples, the first `head` samples as ints) — the
    fingerprint window.  Zero shuffles; rides the scan."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, heads = [], [], []
            for clip_id, p in zip(pdf["clip_id"], pdf["payload"]):
                x = wav_pcm_samples(bytes(p))
                ids.append(int(clip_id))
                ns.append(len(x))
                heads.append([int(s) for s in x[:head]])
            out = pd.DataFrame({"clip_id": ids, "n_samples": ns, "s": heads})
            out["n_samples"] = out["n_samples"].astype("Int32")
            yield out

    return media_df.select("clip_id", "payload").mapInPandas(
        decode_batches, "clip_id long, n_samples int, s array<int>"
    )


def synthesize_video_clips(docs: DataFrame, alias_every: int = 11) -> DataFrame:
    """Fixture adapter for VIDEO near-dup dedup (round 16, the last X2
    modality): one animated GIF per document — 4 full-size 9x8
    grayscale frames, frame content cf drawn from the same
    Knuth/Lehmer gradient family as the image fixture but with
    per-FRAME mixers (cf folded into every multiplier), so each frame
    of each clip is an independent ~0.5-bit-mean dHash and LSH buckets
    stay O(1).  Every doc_id % alias_every == 0 plants a NEAR-DUPLICATE
    clip (clip_id = doc_id + 1_000_000) that is both RE-ENCODED and
    TEMPORALLY OFFSET: its 4 frames show the source's content frames
    1..4 (head-trimmed by one — frame 4 is content the source never
    displays) with every pixel shifted by +1 + d%2 (no 8-bit wrap), so
    exactly 3 of its frames match a source frame at Hamming 0 /
    pixel distance 72 or 144, and a clip-level threshold of >= 3
    verified frame pairs catches every planted pair by construction.
    pixel v(d, cf, r, c) =
      ((d*2654435761 + cf*1315423911) % 1000003
       + ((d*40503   + cf*2246822519 + 17) % 997) * (r+1)^2
       + ((d*69621   + cf*3266489917 + 31) % 983) * (c+1)^2
       + ((d*48271   + cf*668265263  +  7) % 991) * (r+1)*(c+1)) % 250
      + delta
    Values stay < 252, so the shared GIF palette (<= 256 grays across
    all frames) always fits and the container round trip is lossless —
    the closed-form integer oracle survives the REAL encode/decode."""
    from .gif_py import encode_gif_animation

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = 9, 8
        rr = np.arange(h, dtype=np.int64)[:, None] + 1
        cc = np.arange(w, dtype=np.int64)[None, :] + 1

        def gray(d: int, cf: int, delta: int) -> np.ndarray:
            m1 = (d * 2654435761 + cf * 1315423911) % 1000003
            m2 = (d * 40503 + cf * 2246822519 + 17) % 997
            m3 = (d * 69621 + cf * 3266489917 + 31) % 983
            m4 = (d * 48271 + cf * 668265263 + 7) % 991
            return ((m1 + m2 * rr * rr + m3 * cc * cc + m4 * rr * cc) % 250
                    + delta).astype(np.uint8)

        def clip_of(d: int, f_off: int, delta: int) -> bytes:
            frames = [
                np.repeat(gray(d, g + f_off, delta)[:, :, None], 3, axis=2)
                for g in range(4)
            ]
            return encode_gif_animation(frames)

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ids.append(d)
                payloads.append(clip_of(d, 0, 0))
                if d % alias_every == 0:
                    ids.append(d + 1_000_000)
                    payloads.append(clip_of(d, 1, 1 + d % 2))
            yield pd.DataFrame({"clip_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "clip_id long, payload binary"
    )


def decode_gray_frame_pixels(media_df: DataFrame) -> DataFrame:
    """REAL per-frame pixel decode for the video-fingerprint path:
    every frame of each animated GIF byte-decoded (gif_py.
    decode_gif_frames — the full multi-image LZW walk) and flattened
    to (clip_id, fidx, n_frames, row-major grayscale pixel array) —
    the flatMap-over-frames shape the image dHash machinery then
    consumes per frame.  Zero shuffles; rides the scan."""
    from .gif_py import decode_gif_frames

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fis, nfs, pxs = [], [], [], []
            for clip_id, p in zip(pdf["clip_id"], pdf["payload"]):
                frames = decode_gif_frames(bytes(p))
                for fi, img in enumerate(frames):
                    ids.append(int(clip_id))
                    fis.append(fi)
                    nfs.append(len(frames))
                    pxs.append([int(x) for x in img[:, :, 0].reshape(-1)])
            out = pd.DataFrame(
                {"clip_id": ids, "fidx": fis, "n_frames": nfs, "px": pxs}
            )
            out["fidx"] = out["fidx"].astype("Int32")
            out["n_frames"] = out["n_frames"].astype("Int32")
            yield out

    return media_df.select("clip_id", "payload").mapInPandas(
        decode_batches, "clip_id long, fidx int, n_frames int, px array<int>"
    )


def synthesize_doc_videos(docs: DataFrame, alias_every: int = 13) -> DataFrame:
    """Fixture adapter for the ALL-MODALITY corpus-prep capstone
    (round 16): ONE 4-frame animated GIF per document, keyed by the
    document id itself.  Every doc_id % alias_every == 0 (and >= 1)
    shows the PREVIOUS document's clip RE-ENCODED (every pixel
    +1 + d%2) and TEMPORALLY OFFSET (content frames 1..4 — head-
    trimmed by one), so (d-1, d) are clip near-duplicates matching on
    exactly 3 of 4 frames and the dedup's drop-the-larger rule must
    drop doc d.  d-1 is never itself aliased (d % 13 == 0 ->
    (d-1) % 13 == 12).  Same per-frame gradient arithmetic as
    synthesize_video_clips -> same closed-form oracle."""
    from .gif_py import encode_gif_animation

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = 9, 8
        rr = np.arange(h, dtype=np.int64)[:, None] + 1
        cc = np.arange(w, dtype=np.int64)[None, :] + 1

        def gray(d: int, cf: int, delta: int) -> np.ndarray:
            m1 = (d * 2654435761 + cf * 1315423911) % 1000003
            m2 = (d * 40503 + cf * 2246822519 + 17) % 997
            m3 = (d * 69621 + cf * 3266489917 + 31) % 983
            m4 = (d * 48271 + cf * 668265263 + 7) % 991
            return ((m1 + m2 * rr * rr + m3 * cc * cc + m4 * rr * cc) % 250
                    + delta).astype(np.uint8)

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                aliased = d % alias_every == 0 and d >= 1
                src, f_off, delta = (
                    (d - 1, 1, 1 + d % 2) if aliased else (d, 0, 0)
                )
                frames = [
                    np.repeat(gray(src, g + f_off, delta)[:, :, None], 3, axis=2)
                    for g in range(4)
                ]
                ids.append(d)
                payloads.append(encode_gif_animation(frames))
            yield pd.DataFrame({"clip_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "clip_id long, payload binary"
    )


def synthesize_image_batch(docs: DataFrame) -> DataFrame:
    """Fixture adapter for INCREMENTAL image near-dup dedup (round 16):
    the NEW-ARRIVALS batch checked against an already-fingerprinted
    corpus.  One image per document, img_id = 2_000_000 + doc_id:

      * doc_id % 5 == 0 — the CORPUS document's own gradient (content
        key d) re-encoded in the OPPOSITE container and pixel-shifted
        +1 + d%2: a near-duplicate of corpus image d that the
        fingerprint store must catch WITHOUT re-decoding the corpus;
      * doc_id % 5 == 1 — the gradient of content key 600_000 + d + 1,
        shifted: a near-duplicate of its own BATCH-MATE
        2_000_000 + d + 1 (whose content key is 600_000 + d + 1),
        so in-batch pairs exist alongside corpus hits;
      * otherwise — a fresh gradient (content key 600_000 + d, a key
        range no corpus image uses), delta 0.

    Same pixel arithmetic as synthesize_gradient_images -> same
    closed-form oracle; dup rows live in the opposite container from
    the batch originals so every pair still crosses BMP <-> PNG."""
    import struct as _struct

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = 9, 8
        stride = (w * 3 + 3) & ~3
        rr = np.arange(h, dtype=np.int64)[:, None] + 1
        cc = np.arange(w, dtype=np.int64)[None, :] + 1
        hdr = (
            b"BM"
            + _struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
            + _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                2835, 2835, 0, 0,
            )
        )

        def gray(k: int, delta: int) -> np.ndarray:
            m1 = (k * 2654435761) % 1000003
            m2 = (k * 40503 + 17) % 997
            m3 = (k * 69621 + 31) % 983
            m4 = (k * 48271 + 7) % 991
            return ((m1 + m2 * rr * rr + m3 * cc * cc + m4 * rr * cc) % 250
                    + delta).astype(np.uint8)

        def blob_of(k: int, delta: int, as_png: bool) -> bytes:
            v = gray(k, delta)
            if as_png:
                return encode_png(np.repeat(v[:, :, None], 3, axis=2))
            rows = []
            for y in range(h - 1, -1, -1):
                row = np.repeat(v[y], 3).tobytes()
                rows.append(row.ljust(stride, b"\x00"))
            return hdr + b"".join(rows)

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 5 == 0:
                    key, delta, as_png = d, 1 + d % 2, not (d % 2)
                elif d % 5 == 1:
                    key, delta, as_png = 600_000 + d + 1, 1 + d % 2, not (d % 2)
                else:
                    key, delta, as_png = 600_000 + d, 0, bool(d % 2)
                ids.append(2_000_000 + d)
                payloads.append(blob_of(key, delta, as_png))
            yield pd.DataFrame({"img_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "img_id long, payload binary"
    )


def synthesize_audio_batch(docs: DataFrame) -> DataFrame:
    """Fixture adapter for INCREMENTAL audio near-dup dedup (round 16):
    the new-arrivals clip batch checked against an already-
    fingerprinted corpus.  One mono PCM16 WAV per document,
    clip_id = 2_000_000 + doc_id:

      * doc_id % 5 == 0 — the CORPUS document's own samples SCALED x2
        (the loudness-changed re-encode: every byte differs, every
        delta sign and zero crossing survives) — a near-duplicate of
        corpus clip d the fingerprint store must catch;
      * doc_id % 5 == 1 — content key 600_000 + d + 1 scaled x2: a
        near-duplicate of its own batch-mate 2_000_000 + d + 1;
      * otherwise — a fresh clip (content key 600_000 + d, scale 1).

    Same sample arithmetic as synthesize_audio_clips -> same
    closed-form oracle."""
    import struct as _struct

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fmt = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)

        def samples(k: int, scale: int) -> np.ndarray:
            n = 96 + k % 32
            i = np.arange(n, dtype=np.int64) + 1
            m1 = (k * 2654435761) % 1000003
            m2 = (k * 40503 + 17) % 997
            m3 = (k * 69621 + 31) % 983
            v = ((m1 + m2 * i + m3 * i * i) % 2001) - 1000
            return (v * scale).astype("<i2")

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 5 == 0:
                    key, scale = d, 2
                elif d % 5 == 1:
                    key, scale = 600_000 + d + 1, 2
                else:
                    key, scale = 600_000 + d, 1
                body = samples(key, scale).tobytes()
                blob = (
                    b"RIFF"
                    + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
                    + b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"data" + _struct.pack("<I", len(body)) + body
                )
                ids.append(2_000_000 + d)
                payloads.append(blob)
            yield pd.DataFrame({"clip_id": ids, "payload": payloads})

    return spread_scan(docs.select("doc_id"), min_bytes_per_core=0).mapInPandas(
        synth_batches, "clip_id long, payload binary"
    )
