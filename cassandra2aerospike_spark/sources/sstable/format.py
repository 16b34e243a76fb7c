"""An SSTable-style sorted-run file format, and its reader/writer.

Design goals mirror the reference's storage layer behavior (SURVEY.md §2.1
S3-S10) without being byte-compatible with Cassandra — this is an
*inspired-by* format defined here, built only on public format concepts:

  - a run = immutable `<gen>-Data.db` sorted by (token, key), with sidecars
    `<gen>-Statistics.db` (schema + minima for delta decoding + token
    range), `<gen>-Index.db` (key -> logical offset), `<gen>-Summary.db`
    (sampled index for seek), `<gen>-CompressionInfo.db` (chunk table)
    — the same five-file shape as CassandraParser.cpp:83-175 discovers;
  - block compression with per-chunk CRC32 verified BEFORE decompression
    (Buffer.cpp:274-295, 297-371): Data.db is a sequence of
    deflate-compressed chunks of a logical byte stream;
  - per-cell flag byte (deleted / expiring / range-tombstone / use-row-ts:
    SSTable.hpp:86-94, 112-127), vint-delta timestamps and TTLs against
    per-run minima from Statistics.db (SSTable.cpp:585-598, 655-679),
    column names referenced by schema index (the column-subset idea of
    SSTable.cpp:505-717 §S9);
  - indexed seek: Summary binary search -> Index scan -> chunk-aligned
    Data seek (SSTable.cpp:58-87, 122-180 — operator O2).

Cell records decode to the engine's EAV cell model (SURVEY.md §1.3):
(key bytes, col_name, value bytes, ts µs, ttl s?, expiration s?, deleted,
range_tombstone, row_tomb_ts?).
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib
from dataclasses import dataclass, field

from . import codec as C

MAGIC = b"SGR1"  # spark-graft run, format 1 (schema-indexed names, delta ts)
MAGIC_V0 = b"SGR0"  # format 0: per-cell EMBEDDED names, absolute ts — the
# "old generation" analog of the reference's ["jb","ma") SSTables
# (SSTable.cpp:337-457 reads embedded names; 505-717 the schema-indexed
# new format; create_table dispatches on version, SSTable.cpp:45-55)
MAGIC_VA = b"SGRA"  # "ancient generation": SGR0 cell layout, but the
# pre-"jb" checksum discipline (see CHECKSUM_SPEC below)
FORMATS = (MAGIC, MAGIC_V0, MAGIC_VA)
DEFAULT_CHUNK = 64 * 1024
SUMMARY_INTERVAL = 16  # every Nth index entry sampled into Summary.db

# ---- per-format-version checksum discipline (S5).  The reference derives
# BOTH the checksum algorithm and whether it covers the compressed or the
# decompressed bytes from the SSTable format version (SSTable.cpp:102-105:
# ADLER32 for ["jb","ma"), CRC32 otherwise; checksum-before-decompression
# iff version >= "jb"; Buffer.cpp:346-364 verifies either side).  Mapped
# onto our three generations:
#   SGRA (ancient, pre-"jb" analog): CRC32 over the DECOMPRESSED chunk,
#        verified AFTER decompression;
#   SGR0 (old, ["jb","ma") analog): Adler32 over the compressed chunk,
#        verified BEFORE decompression;
#   SGR1 (modern, >= "ma" analog):  CRC32 over the compressed chunk,
#        verified BEFORE decompression.
CHECKSUM_SPEC: dict[bytes, tuple[str, bool]] = {
    MAGIC_VA: ("crc32", False),
    MAGIC_V0: ("adler32", True),
    MAGIC: ("crc32", True),
}


def chunk_checksum(alg: str, data: bytes) -> int:
    """CRC32 / Adler32 over one chunk (Buffer.cpp:274-295's two zlib
    families; both start from the algorithm's canonical seed)."""
    if alg == "crc32":
        return zlib.crc32(data)
    if alg == "adler32":
        return zlib.adler32(data)
    raise ValueError(f"unknown checksum algorithm {alg!r}")


# ---- chunk codec registry (S5 analog of Buffer.cpp:243-272's
# LZ4/Snappy/Deflate dispatch — the reference tries LZ4 FIRST; it is
# modern Cassandra's default compressor).  zlib is stdlib; Snappy and LZ4
# are local pure-Python block codecs (snappy_py, lz4_py — the packages
# are not installable here, so the formats themselves are implemented).
# If the real lz4 package IS importable it is preferred for speed; its
# store_size=True framing is byte-compatible with lz4_py.
try:  # pragma: no cover - environment-dependent
    import lz4.block as _lz4block
except ImportError:
    _lz4block = None

from . import lz4_py as _lz4py
from . import snappy_py as _snappy
from . import zstd_py as _zstd


def compress_chunk(codec: str, raw: bytes) -> bytes:
    if codec == "deflate":
        return zlib.compress(raw, 6)
    if codec == "snappy":
        return _snappy.compress(raw)
    if codec == "lz4":
        if _lz4block is not None:
            return _lz4block.compress(raw, store_size=True)
        return _lz4py.compress(raw)
    if codec == "zstd":
        # round 11: Cassandra 4.x/5.0 ZstdCompressor chunks are raw zstd
        # frames (no extra framing — the frame header carries the size);
        # zstd_py implements the public RFC 8878 format, cross-validated
        # both ways against zstd-jni in tests/test_zstd.py
        return _zstd.compress(raw)
    if codec == "none":
        return raw
    raise ValueError(f"unknown codec {codec!r}")


def decompress_chunk(codec: str, comp: bytes) -> bytes:
    if codec == "deflate":
        return zlib.decompress(comp)
    if codec == "snappy":
        return _snappy.decompress(comp)
    if codec == "lz4":
        if _lz4block is not None:
            return _lz4block.decompress(comp)
        return _lz4py.decompress(comp)
    if codec == "zstd":
        return _zstd.decompress(comp)
    if codec == "none":
        return comp
    raise ValueError(f"unknown codec {codec!r}")


def encode_composite(elems: list[bytes]) -> bytes:
    """Composite cell-name encoding: each path element is a 2-byte
    big-endian length, the element bytes, and one end-of-component byte
    (the layout SSTable.cpp:399-412 walks)."""
    out = bytearray()
    for e in elems:
        out += struct.pack(">H", len(e)) + e + b"\x00"
    return bytes(out)


def decode_composite(name: bytes) -> list[bytes]:
    """Exact inverse of encode_composite: the component list of a
    composite-encoded clustering prefix.  Raises on any trailing or
    malformed bytes — callers use it only on values this module's
    encode_composite produced (multi-clustering-column ck prefixes)."""
    comps: list[bytes] = []
    off = 0
    while off < len(name):
        if off + 2 > len(name):
            raise ValueError("composite: truncated length")
        ln = (name[off] << 8) | name[off + 1]
        if off + 3 + ln > len(name):
            raise ValueError("composite: truncated component")
        comps.append(name[off + 2 : off + 2 + ln])
        off += 3 + ln
    return comps


def unwrap_composite(name: bytes) -> bytes:
    """S8 composite-path unwrap — the exact reference loop
    (SSTable.cpp:399-412): walk length-prefixed components; if the whole
    name parses as a composite, the cell name becomes the LAST component's
    bytes; any parse mismatch leaves the name untouched (flat embedded
    names — whose first two bytes read as a huge big-endian length —
    fall out of the loop on the first probe)."""
    buffer_len = len(name)
    while buffer_len >= 2:
        advanced = len(name) - buffer_len
        ln = (name[advanced] << 8) | name[advanced + 1]
        if buffer_len > ln + 3:
            buffer_len -= ln + 3
        else:
            if buffer_len == ln + 3:
                name = name[advanced + 2 : advanced + 2 + ln]
            break
    return name

# cell flag bits (analog of SSTable.hpp:86-94 masks)
F_DELETED = 0x01
F_EXPIRING = 0x02
F_RANGE_TOMB = 0x04

SIDECARS = ("Data", "Index", "Summary", "Statistics", "CompressionInfo")


def token_of(key: bytes) -> int:
    """64-bit token: first 8 bytes of md5(key), big-endian, as signed —
    the partitioner role (Partitioners.cpp:28-75's MD5 family; we keep
    md5 so tokens are reproducible in any engine, cf. functions/tokens.py)."""
    h = hashlib.md5(key).digest()
    t = int.from_bytes(h[:8], "big", signed=True)
    return t


@dataclass
class RunStats:
    partitioner: str
    min_ts: int
    min_ttl: int
    columns: list[str]
    n_partitions: int
    token_lo: int
    token_hi: int


@dataclass
class Cell:
    col_name: str
    value: bytes = b""
    ts: int = 0
    ttl: int | None = None
    expiration: int | None = None
    deleted: bool = False
    range_tomb: bool = False
    # clustering-key prefix of the cell's row (real ma format; None for
    # non-clustered tables and every SGR path).  A capability FIX over
    # the reference, which skips clustering values and knowingly merges
    # such rows wrongly (reference README.md:30-36)
    ck: bytes | None = None
    # CellPath of a COMPLEX (multi-cell collection) column's cell (real
    # ma format, round 7): the map key / set element / list position
    # this cell addresses.  None for every simple cell.  The reference
    # declares HAS_COMPLEX_DELETION (SSTable.hpp:120) but never reads
    # it — a 3.x table with a collection column misparses there.
    path: bytes | None = None


@dataclass
class RangeTomb:
    """Clustering-scoped range tombstone (real ma format markers,
    SSTable.cpp:541-572): covers cells whose ck lies inside
    [start, end] per the inclusivity flags, written at `ts`.  A None
    bound is unbounded on that side.  SGR runs never carry these (the
    analog format's range tombstones are column-NAME-bounded cells,
    the pre-ma RANGE_TOMBSTONE_MASK semantics)."""

    start: bytes | None
    start_incl: bool
    end: bytes | None
    end_incl: bool
    ts: int


@dataclass
class Partition:
    key: bytes
    row_tomb_ts: int | None = None
    cells: list[Cell] = field(default_factory=list)
    # real ma format only: clustering-bounded range tombstones (markers
    # with a non-empty clustering prefix) and ck-scoped row deletions
    # (HAS_DELETION on a clustered row).  Both cover (key, ck) scopes,
    # narrower than row_tomb_ts — the capability the reference refuses
    # to model (its read_marker widens EVERY marker to
    # row_marked_for_deletion, SSTable.cpp:553).
    range_tombs: list[RangeTomb] = field(default_factory=list)
    ck_tombs: list[tuple[bytes, int]] = field(default_factory=list)
    # real ma format only: a STATIC-row deletion (HAS_DELETION on the
    # IS_STATIC row) — covers exactly the partition's static cells,
    # narrower than row_tomb_ts and disjoint from every ck scope.  The
    # round-6 reader refused these; now both sides carry them.
    static_tomb_ts: int | None = None
    # real ma format only: COMPLEX-column deletions — (ck, col_name, ts)
    # clearing every cell of one collection column in one row that is
    # older than ts (the per-column DeletionTime the HAS_COMPLEX_DELETION
    # row flag introduces).  ck None = the non-clustered/static row.
    complex_tombs: list[tuple[bytes | None, str, int]] = field(
        default_factory=list
    )

    @property
    def token(self) -> int:
        return token_of(self.key)


# ---------------------------------------------------------------- writer

class RunWriter:
    """Writes one sorted run.  Partitions must be appended in (token, key)
    order — enforced, mirroring the reference's DEBUG order assertions
    (CassandraParser.cpp:424-432)."""

    def __init__(self, directory: str, gen: int, codec: str = "deflate",
                 chunk_size: int = DEFAULT_CHUNK, fmt: bytes = MAGIC,
                 composite_path: tuple[str, ...] = (),
                 partitioner: str = "md5"):
        if fmt not in FORMATS:
            raise ValueError(f"unknown run format {fmt!r}")
        if composite_path and fmt == MAGIC:
            # composite cell paths are an old-generation feature: the new
            # format references names by schema index (SSTable.cpp:505+)
            raise ValueError("composite_path requires an old-format run")
        self.dir = directory
        self.gen = gen
        self.fmt = fmt
        self.codec = codec
        self.composite_path = tuple(e.encode("utf-8") for e in composite_path)
        self.partitioner = partitioner
        self.chunk_size = chunk_size
        self.data = bytearray()
        self.index = bytearray()
        self.summary = bytearray()
        self.n_parts = 0
        self.last = None
        self.columns: list[str] = []
        self.col_ids: dict[str, int] = {}
        self.min_ts: int | None = None
        self.min_ttl: int | None = None
        self.token_lo: int | None = None
        self.token_hi: int | None = None
        self._staged: list[Partition] = []

    def path(self, component: str) -> str:
        return os.path.join(self.dir, f"{self.gen}-{component}.db")

    def add(self, part: Partition) -> None:
        key = (part.token, part.key)
        if self.last is not None and key <= self.last:
            raise ValueError(f"out-of-order partition {key!r} after {self.last!r}")
        self.last = key
        self._staged.append(part)
        def see_ts(t: int) -> None:
            self.min_ts = t if self.min_ts is None else min(self.min_ts, t)

        if part.row_tomb_ts is not None:
            see_ts(part.row_tomb_ts)
        for c in part.cells:
            if c.col_name not in self.col_ids:
                self.col_ids[c.col_name] = len(self.columns)
                self.columns.append(c.col_name)
            see_ts(c.ts)
            if c.ttl is not None:
                self.min_ttl = c.ttl if self.min_ttl is None else min(self.min_ttl, c.ttl)
        t = part.token
        self.token_lo = t if self.token_lo is None else min(self.token_lo, t)
        self.token_hi = t if self.token_hi is None else max(self.token_hi, t)
        self.n_parts += 1

    def _encode_partition(self, p: Partition) -> bytes:
        old = self.fmt != MAGIC
        out = bytearray()
        out += C.enc_i64(p.token)
        out += C.enc_u16(len(p.key)) + p.key
        flags = 0x01 if p.row_tomb_ts is not None else 0x00
        out.append(flags)
        if p.row_tomb_ts is not None:
            # old format: absolute timestamps (no Statistics minima to
            # delta against — SSTable.cpp:354 reads them raw)
            out += C.enc_vint(p.row_tomb_ts if old else p.row_tomb_ts - self.min_ts)
        out += C.enc_uvint(len(p.cells))
        for c in p.cells:
            f = (
                (F_DELETED if c.deleted else 0)
                | (F_EXPIRING if c.ttl is not None else 0)
                | (F_RANGE_TOMB if c.range_tomb else 0)
            )
            out.append(f)
            if old:
                # per-cell EMBEDDED column name (SSTable.cpp:392's
                # name-per-cell layout) — self-describing, no schema.
                # With a composite path the name is wrapped as a
                # length-prefixed component sequence ending with the cell
                # name itself; readers unwrap it (SSTable.cpp:399-412).
                name_b = c.col_name.encode("utf-8")
                if self.composite_path:
                    name_b = encode_composite([*self.composite_path, name_b])
                out += C.enc_vblob(name_b)
                out += C.enc_vint(c.ts)
            else:
                out += C.enc_uvint(self.col_ids[c.col_name])
                out += C.enc_vint(c.ts - self.min_ts)
            if c.ttl is not None:
                out += C.enc_vint(c.ttl if old else c.ttl - self.min_ttl)
                out += C.enc_vint((c.expiration or 0))
            if not c.deleted:
                out += C.enc_vblob(c.value)
        return bytes(out)

    def finish(self) -> None:
        os.makedirs(self.dir, exist_ok=True)
        self.min_ts = self.min_ts or 0
        self.min_ttl = self.min_ttl or 0
        # encode partitions now that minima are known
        for i, p in enumerate(self._staged):
            logical_off = len(self.data)
            entry = C.enc_i64(p.token) + C.enc_u16(len(p.key)) + p.key + C.enc_u64(logical_off)
            if i % SUMMARY_INTERVAL == 0:
                self.summary += C.enc_i64(p.token) + C.enc_u64(len(self.index))
            self.index += entry
            self.data += self._encode_partition(p)

        # --- Data.db: chunked + compressed + per-chunk checksum table.
        # The checksum algorithm AND which side of the codec it covers are
        # format-version properties (CHECKSUM_SPEC; SSTable.cpp:102-105).
        alg, before = CHECKSUM_SPEC[self.fmt]
        chunks = []
        blob = bytes(self.data)
        comp_stream = bytearray()
        for off in range(0, max(len(blob), 1), self.chunk_size):
            raw = blob[off : off + self.chunk_size]
            comp = compress_chunk(self.codec, raw)
            chk = chunk_checksum(alg, comp if before else raw)
            chunks.append((len(comp_stream), len(comp), chk, len(raw)))
            comp_stream += comp
        with open(self.path("Data"), "wb") as fh:
            fh.write(bytes(comp_stream))

        ci = bytearray()
        ci += self.fmt
        ci += C.enc_vstr(self.codec)
        ci += C.enc_u32(self.chunk_size)
        ci += C.enc_uvint(len(chunks))
        for coff, clen, crc, rawlen in chunks:
            ci += C.enc_u64(coff) + C.enc_u32(clen) + C.enc_u32(crc) + C.enc_u32(rawlen)
        with open(self.path("CompressionInfo"), "wb") as fh:
            fh.write(bytes(ci))

        st = bytearray()
        st += self.fmt
        st += C.enc_vstr(self.partitioner)  # partitioner name (P4 registry analog)
        if self.fmt == MAGIC:
            # new format only: decode minima + schema-indexed column list
            # (the old format is self-describing — names embedded per
            # cell, timestamps absolute; its Statistics carries no schema,
            # like pre-"ka" files have no HEADER component)
            st += C.enc_vint(self.min_ts)
            st += C.enc_vint(self.min_ttl)
            st += C.enc_uvint(len(self.columns))
            for name in self.columns:
                st += C.enc_vstr(name)
        st += C.enc_uvint(self.n_parts)
        st += C.enc_i64(self.token_lo or 0)
        st += C.enc_i64(self.token_hi or 0)
        with open(self.path("Statistics"), "wb") as fh:
            fh.write(bytes(st))

        with open(self.path("Index"), "wb") as fh:
            fh.write(bytes(self.index))
        with open(self.path("Summary"), "wb") as fh:
            fh.write(bytes(self.summary))


# ---------------------------------------------------------------- reader

class RunReader:
    """Reads one run with lazy chunk decompression + CRC verification and
    indexed seek (operators S3-S10, O2)."""

    def __init__(self, directory: str, gen: int, verify_checksums: bool = True):
        self.dir = directory
        self.gen = gen
        self.verify = verify_checksums
        self._read_compression_info()
        self._read_statistics()

    def path(self, component: str) -> str:
        return os.path.join(self.dir, f"{self.gen}-{component}.db")

    def _read_compression_info(self) -> None:
        buf = open(self.path("CompressionInfo"), "rb").read()
        if buf[:4] not in FORMATS:
            raise ValueError("bad CompressionInfo magic")
        self.fmt = bytes(buf[:4])
        off = 4
        self.codec, off = C.dec_vstr(buf, off)
        self.chunk_size, off = C.dec_u32(buf, off)
        n, off = C.dec_uvint(buf, off)
        self.chunks = []
        for _ in range(n):
            coff, off = C.dec_u64(buf, off)
            clen, off = C.dec_u32(buf, off)
            crc, off = C.dec_u32(buf, off)
            rawlen, off = C.dec_u32(buf, off)
            self.chunks.append((coff, clen, crc, rawlen))

    def _read_statistics(self) -> None:
        """Format-version dispatch (S3 analog of SSTable.cpp:45-55): the
        Statistics magic picks the decode layout — SGR1 carries minima +
        schema, SGR0 (old generation) is self-describing."""
        buf = open(self.path("Statistics"), "rb").read()
        if buf[:4] not in FORMATS:
            raise ValueError("bad Statistics magic")
        if bytes(buf[:4]) != self.fmt:
            raise ValueError(
                f"Statistics magic {bytes(buf[:4])!r} != CompressionInfo {self.fmt!r}"
            )
        off = 4
        partitioner, off = C.dec_vstr(buf, off)
        min_ts = min_ttl = 0
        cols: list[str] = []
        if self.fmt == MAGIC:
            min_ts, off = C.dec_vint(buf, off)
            min_ttl, off = C.dec_vint(buf, off)
            ncols, off = C.dec_uvint(buf, off)
            for _ in range(ncols):
                name, off = C.dec_vstr(buf, off)
                cols.append(name)
        nparts, off = C.dec_uvint(buf, off)
        tlo, off = C.dec_i64(buf, off)
        thi, off = C.dec_i64(buf, off)
        self.stats = RunStats(partitioner, min_ts, min_ttl, cols, nparts, tlo, thi)

    # --- logical data stream, chunk at a time -------------------------
    def _logical_data(self, start_chunk: int = 0):
        """Yield decompressed chunks from `start_chunk`, verifying the
        format-version checksum discipline (CHECKSUM_SPEC): modern/old
        formats check the compressed bytes BEFORE decompressing, the
        ancient format checks the decompressed bytes AFTER
        (Buffer.cpp:346-364's two verify_checksum call sites)."""
        alg, before = CHECKSUM_SPEC[self.fmt]
        with open(self.path("Data"), "rb") as fh:
            for coff, clen, crc, rawlen in self.chunks[start_chunk:]:
                fh.seek(coff)
                comp = fh.read(clen)
                if self.verify and before and chunk_checksum(alg, comp) != crc:
                    raise IOError(
                        f"chunk {alg} mismatch in {self.path('Data')} @{coff}"
                    )
                try:
                    raw = decompress_chunk(self.codec, comp)
                except Exception as e:
                    # the ancient format checksums the DECOMPRESSED side, so
                    # corrupt compressed bytes can fail inside the codec
                    # first; surface it as the same I/O failure class
                    raise IOError(
                        f"chunk decompress failure in {self.path('Data')} "
                        f"@{coff}: {e}"
                    ) from e
                if self.verify and not before and chunk_checksum(alg, raw) != crc:
                    raise IOError(
                        f"chunk {alg} mismatch in {self.path('Data')} @{coff}"
                    )
                yield raw

    def _buffer_from(self, logical_off: int) -> bytes:
        """Decompressed logical stream from logical_off to EOF (eager —
        kept for tests/tools; the scan path decodes incrementally via
        partitions())."""
        chunk_idx = logical_off // self.chunk_size
        skip = logical_off - chunk_idx * self.chunk_size
        parts = []
        for raw in self._logical_data(chunk_idx):
            parts.append(raw)
        blob = b"".join(parts)
        return blob[skip:]

    # --- seek (O2) ----------------------------------------------------
    def seek_offset(self, start_token: int) -> int | None:
        """Summary binary search -> Index linear scan: logical Data offset
        of the first partition with token >= start_token; None if the run
        is exhausted before it (CassandraParser.cpp:196-216 contract)."""
        summary = open(self.path("Summary"), "rb").read()
        entry = 16  # i64 token + u64 index offset
        n = len(summary) // entry
        lo, hi = 0, n
        while lo < hi:  # last summary entry with token STRICTLY below start
            mid = (lo + hi) // 2
            tok, _ = C.dec_i64(summary, mid * entry)
            # strict <: a sample with token == start must not be skipped —
            # partitions between the previous sample and it share the token
            # boundary and belong to the >= start result
            if tok < start_token:
                lo = mid + 1
            else:
                hi = mid
        idx_start = 0
        if lo > 0:
            _, o = C.dec_i64(summary, (lo - 1) * entry)
            idx_start, _ = C.dec_u64(summary, (lo - 1) * entry + 8)
        index = open(self.path("Index"), "rb").read()
        off = idx_start
        while off < len(index):
            tok, off = C.dec_i64(index, off)
            klen, off = C.dec_u16(index, off)
            off += klen
            data_off, off = C.dec_u64(index, off)
            if tok >= start_token:
                return data_off
        return None

    # --- scan (S8/S9) -------------------------------------------------
    def _decode_partition(self, buf, off: int):
        """Decode one partition at off; returns (Partition, new_off).
        Raises IndexError/struct.error on byte-level underflow; callers
        must also reject new_off > len(buf) (silent short slices)."""
        st = self.stats
        old = self.fmt != MAGIC
        token, off = C.dec_i64(buf, off)
        klen, off = C.dec_u16(buf, off)
        key = bytes(buf[off : off + klen]); off += klen
        flags = buf[off]; off += 1
        row_tomb = None
        if flags & 0x01:
            v, off = C.dec_vint(buf, off)
            row_tomb = v if old else st.min_ts + v
        ncells, off = C.dec_uvint(buf, off)
        cells = []
        for _ in range(ncells):
            f = buf[off]; off += 1
            if old:
                # old generation (SGR0/SGRA): embedded name, absolute ts —
                # the SSTable.cpp:337-457 read path shape.  The name may be
                # a composite path; unwrap takes the final component and
                # leaves flat names untouched (SSTable.cpp:399-412)
                name_b, off = C.dec_vblob(buf, off)
                col_name = unwrap_composite(name_b).decode("utf-8")
                ts, off = C.dec_vint(buf, off)
            else:
                cid, off = C.dec_uvint(buf, off)
                col_name = st.columns[cid]
                tsd, off = C.dec_vint(buf, off)
                ts = st.min_ts + tsd
            ttl = expiration = None
            if f & F_EXPIRING:
                ttld, off = C.dec_vint(buf, off)
                ttl = ttld if old else st.min_ttl + ttld
                expiration, off = C.dec_vint(buf, off)
            value = b""
            if not (f & F_DELETED):
                value, off = C.dec_vblob(buf, off)
            cells.append(
                Cell(
                    col_name=col_name,
                    value=value,
                    ts=ts,
                    ttl=ttl,
                    expiration=expiration,
                    deleted=bool(f & F_DELETED),
                    range_tomb=bool(f & F_RANGE_TOMB),
                )
            )
        return Partition(key=key, row_tomb_ts=row_tomb, cells=cells), off

    def partitions(
        self, start_token: int | None = None, end_token: int | None = None
    ):
        """Iterate Partition objects in (token, key) order, optionally
        seeking to start_token first and stopping at end_token (exclusive).

        INCREMENTAL: chunks are pulled (and decompressed, and
        CRC-verified) one at a time, only as the decoder needs bytes, and
        the consumed prefix is dropped — peak memory is O(chunk + one
        partition) and an end-bounded slice never decompresses past its
        boundary.  This is what makes splits_per_run genuinely parallel
        instead of k tasks each decompressing the run tail."""
        if start_token is None:
            logical = 0
        else:
            logical = self.seek_offset(start_token)
            if logical is None:
                return
        chunk_idx = logical // self.chunk_size
        skip = logical - chunk_idx * self.chunk_size
        chunks = self._logical_data(chunk_idx)
        buf = bytearray()
        exhausted = False
        off = skip
        while True:
            try:
                p, new_off = self._decode_partition(buf, off)
                if new_off > len(buf):
                    raise IndexError("short partition")
            except (IndexError, struct.error):
                if exhausted:
                    if off == len(buf):
                        return  # clean EOF
                    raise IOError(
                        f"truncated run {self.path('Data')} @logical {off}"
                    )
                try:
                    buf += next(chunks)
                except StopIteration:
                    exhausted = True
                continue
            if end_token is not None and p.token >= end_token:
                return
            yield p
            # drop the consumed prefix to bound memory
            del buf[:new_off]
            off = 0


def discover_runs(directory: str) -> list[int]:
    """Directory scan for `<gen>-Data.db` runs (CassandraParser::open,
    CassandraParser.cpp:83-175)."""
    gens = []
    for name in os.listdir(directory):
        if name.endswith("-Data.db"):
            gens.append(int(name.split("-")[0]))
    return sorted(gens)
