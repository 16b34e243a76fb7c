"""Real Cassandra pre-``ma`` ("big" old-era) SSTable reader — plus a
golden-fixture writer — closing the "version < MA" half of the real
on-disk-format gap (the >= MA half landed as ma_format.py).

Everything here derives from PUBLIC sources: the reference reader's
old-format grammar (SSTable.cpp:337-452 OldSStable, SSTable.cpp:26-38 the
version lattice, SSTable.cpp:190-225 filename version parse,
SSTable.cpp:228-267 keyspace/table extraction, SSTable.cpp:275-333
read_metadata's per-era Statistics walk, Buffer.cpp:183-424 the chunked
compressed buffer and its per-era checksum discipline) and the Apache
Cassandra 2.x on-disk format those mirror.  Supported versions:

  ja   (Cassandra 2.0 beta)  CRC32 of the UNCOMPRESSED chunk, verified
                             AFTER decompression (SSTable.cpp:102 CRC32
                             branch, Buffer.cpp:358-366 post-check)
  jb   (Cassandra 2.0)       Adler32 of the COMPRESSED chunk, verified
                             BEFORE decompression (SSTable.cpp:102-105)
  ka   (Cassandra 2.1)       as jb; Statistics gains the ka+ TOC
                             (SSTable.cpp:277-309), Summary the ka+
                             8-byte header (SSTable.cpp:135-136)
  la   (Cassandra 2.2)       as ka; filenames drop the keyspace-table
                             prefix (SSTable.cpp:190-199, 244-267)

Two filename eras (SSTable.cpp:190-225):

  <keyspace>-<table>-<vv>-<gen>-Data.db     ka and below (flat naming;
                                            keyspace/table FROM the name)
  <vv>-<gen>-big-Data.db                    la and above (keyspace/table
                                            from the directory path)

Data.db logical grammar for >= ja (OldSStable::read_row/read_column,
SSTable.cpp:337-452):

  partition := key(short-len) localDeletion(be32) markedForDeleteAt(be64)
               column* terminator(short-len 0)
  column    := name(short-len) flags(byte) body
  body      := RANGE_TOMBSTONE: endName(short-len) localDeletion(be32)
                                ts(be64)
             | [COUNTER: counterTs(be64)]
               [EXPIRATION: ttl(be32) expiration(be32)]
               ts(be64) value(be32-len bytes)

Cell names may be composite paths (2-byte-BE-length components with an
end-of-component byte); the reader unwraps to the final component
exactly as the reference does (SSTable.cpp:399-412, format.py's
unwrap_composite).  Deleted cells carry their localDeletionTime as a
4-byte value which — like the reference — the reader discards.
"""

from __future__ import annotations

import os
import re
import struct
import zlib

from .format import Cell, Partition, encode_composite, unwrap_composite
from .ma_format import (
    DEFAULT_CHUNK,
    LIVE_LOCAL_DELETION,
    LIVE_MARKED_FOR_DELETE,
    META_DATA_VALIDATION,
    MURMUR3_CLASS,
    SUMMARY_INTERVAL,
    _compress_chunk,
    chunk_checksum,
    _dec_str16,
    _decompress_chunk,
    _enc_str16,
    murmur3_token,
)

# ------------------------------------------------------------ versions
# VERSION_STRING_TO_VERSION (SSTable.cpp:26): two lowercase letters to an
# ordinal; the lattice drives every per-era branch below.


def version_code(vs: str) -> int:
    if len(vs) != 2 or not ("a" <= vs[0] <= "z" and "a" <= vs[1] <= "z"):
        raise ValueError(f"bad sstable version string {vs!r}")
    return (ord(vs[0]) - ord("a")) * 26 + (ord(vs[1]) - ord("a"))


V_JA = version_code("ja")
V_JB = version_code("jb")
V_KA = version_code("ka")
V_LA = version_code("la")
V_MA = version_code("ma")

# cell flag masks (SSTable.hpp:86-94)
DELETION_MASK = 0x01
EXPIRATION_MASK = 0x02
COUNTER_MASK = 0x04
COUNTER_UPDATE_MASK = 0x08
RANGE_TOMBSTONE_MASK = 0x10

_LA_RE = re.compile(r"^([a-z][a-z])-(\d+)-big-Data\.db$")
_OLD_RE = re.compile(r"^([^-]+)-([^-]+)-([a-z][a-z])-(\d+)-Data\.db$")


def parse_data_filename(name: str) -> tuple[int, int, str] | None:
    """(version_code, generation, component_prefix) for a Data.db file in
    either naming era, or None when the name carries no version — the
    getVersionFromFilename walk (SSTable.cpp:190-225).  component_prefix
    is the filename minus '-Data.db': sidecars are prefix + '-Index.db'
    etc (SSTable.cpp:40-43 suffix constants)."""
    m = _LA_RE.match(name)
    if m and m.group(1)[0] >= "l":
        return version_code(m.group(1)), int(m.group(2)), name[: -len("-Data.db")]
    m = _OLD_RE.match(name)
    if m:
        return version_code(m.group(3)), int(m.group(4)), name[: -len("-Data.db")]
    return None


def checksum_spec(vcode: int) -> tuple[str, bool]:
    """(algorithm, verify_before_decompression) per version: Adler32 of
    the compressed chunk for jb..lz, CRC32 otherwise; pre-decompression
    verification from jb on (SSTable.cpp:102-105)."""
    if V_JB <= vcode < V_MA:
        return "adler32", True
    return "crc32", vcode >= V_JB




def old_keyspace_and_table(vcode: int, name: str, table_dir: str) -> tuple[str, str]:
    """extractKeyspaceAndTable (SSTable.cpp:228-267): from the filename
    below la, from the directory path at la and above."""
    if vcode < V_LA:
        m = _OLD_RE.match(name)
        if not m:
            raise ValueError(f"cannot extract keyspace/table from {name!r}")
        return m.group(1), m.group(2)
    norm = os.path.normpath(os.path.abspath(table_dir))
    parts = norm.split(os.sep)
    if len(parts) < 2:
        raise ValueError(f"cannot extract keyspace/table from {table_dir!r}")
    return parts[-2], parts[-1]


# ---------------------------------------------------------- statistics


def write_statistics(path: str, vcode: int, partitioner: str) -> None:
    """Per-era Statistics.db with just enough for read_metadata
    (SSTable.cpp:275-333): ka+ = the TOC with a VALIDATION component;
    ja/jb = two (empty) histograms, the 5*8+2*4 fixed block, then the
    partitioner class string."""
    st = bytearray()
    if vcode >= V_KA:
        toc_len = 4 + 1 * 8
        st += struct.pack(">i", 1)
        st += struct.pack(">ii", META_DATA_VALIDATION, toc_len)
        st += _enc_str16(partitioner.encode())
    else:
        st += struct.pack(">i", 0)  # estimatedRowSize histogram: 0 buckets
        st += struct.pack(">i", 0)  # estimatedColumnCount histogram
        st += bytes(5 * 8 + 2 * 4)  # replay position + gen stats block
        st += _enc_str16(partitioner.encode())
    with open(path, "wb") as f:
        f.write(st)


def read_partitioner(path: str, vcode: int) -> str:
    """Uniform error surface discipline (mirrors the ma corruption
    matrix): any truncated/garbage Statistics.db raises ValueError —
    never struct.error/IndexError — and no field may send an offset
    backwards (negative counts read as corruption, not as Python
    end-relative indexing)."""
    buf = open(path, "rb").read()
    if vcode >= V_KA:
        if len(buf) < 4:
            raise ValueError("old: truncated Statistics.db TOC")
        (n,) = struct.unpack_from(">i", buf, 0)
        if n < 0 or 4 + 8 * n > len(buf):
            raise ValueError("old: corrupt Statistics.db TOC count")
        for i in range(n):
            typ, off = struct.unpack_from(">ii", buf, 4 + 8 * i)
            if typ == META_DATA_VALIDATION:
                if off < 0 or off > len(buf):
                    raise ValueError("old: corrupt Statistics.db TOC offset")
                try:
                    name, _ = _dec_str16(buf, off)
                except ValueError:
                    raise ValueError("old: truncated Statistics.db validation")
                return name.decode()
        raise ValueError("old: Statistics.db missing validation component")
    off = 0
    for _ in range(2):  # skip_histogram (SSTable.cpp:269-273)
        if off + 4 > len(buf):
            raise ValueError("old: truncated Statistics.db")
        (n_buckets,) = struct.unpack_from(">i", buf, off)
        if n_buckets < 0 or off + 4 + n_buckets * 16 > len(buf):
            raise ValueError("old: corrupt Statistics.db histogram")
        off += 4 + n_buckets * 16
    off += 5 * 8 + 2 * 4
    if off > len(buf):
        raise ValueError("old: truncated Statistics.db")
    try:
        name, _ = _dec_str16(buf, off)
    except ValueError:
        raise ValueError("old: truncated Statistics.db partitioner")
    return name.decode()


# --------------------------------------------------------------- writer


class OldWriter:
    """Golden-fixture writer for one pre-ma sstable.  Fixture-side
    tooling (like MaWriter): the product path is OldReader; this writer
    exists so the reader is pinned against files whose byte layout was
    derived independently from the reference's reader grammar.

    `composite_path`: wrap every cell name in a composite path whose
    last component is the column name (the S8 unwrap must recover it).
    `counter_cols`: columns encoded as counter cells (COUNTER_MASK +
    counterTs, SSTable.cpp:433-437)."""

    def __init__(
        self,
        table_dir: str,
        gen: int,
        version: str = "la",
        codec_class: str = "LZ4Compressor",
        chunk_size: int = DEFAULT_CHUNK,
        partitioner: str = MURMUR3_CLASS,
        keyspace: str = "tmx",
        table: str = "events",
        composite_path: tuple[str, ...] = (),
        counter_cols: frozenset[str] = frozenset(),
        promoted_threshold: int = 64 * 1024,
    ):
        self.vcode = version_code(version)
        if not V_JA <= self.vcode < V_MA:
            raise ValueError(f"OldWriter supports ja..lz, not {version!r}")
        os.makedirs(table_dir, exist_ok=True)
        self.table_dir = table_dir
        self.gen = gen
        self.version = version
        self.codec_class = codec_class
        self.chunk_size = chunk_size
        self.partitioner = partitioner
        self.keyspace = keyspace
        self.table = table
        self.composite_path = composite_path
        self.counter_cols = counter_cols
        # WIDE-partition promoted index (round 9, the old-era twin of
        # MaWriter's): partitions whose cell area exceeds this write
        # real 2.x IndexInfo entries (firstName/lastName/offset/width
        # after the entry DeletionTime) into their Index.db entry —
        # the bytes the reference reads the be32 size of and skips
        # (SSTable.cpp:76-84).  0/None disables.
        self.promoted_threshold = promoted_threshold
        self._parts: list[tuple[int, Partition]] = []

    def path(self, component: str) -> str:
        if self.vcode >= V_LA:
            name = f"{self.version}-{self.gen}-big-{component}.db"
        else:
            name = f"{self.keyspace}-{self.table}-{self.version}-{self.gen}-{component}.db"
        return os.path.join(self.table_dir, name)

    def data_filename(self) -> str:
        return os.path.basename(self.path("Data"))

    def add(self, p: Partition) -> None:
        self._parts.append((murmur3_token(p.key), p))

    def _name_bytes(self, col_name: str) -> bytes:
        nb = col_name.encode()
        if self.composite_path:
            return encode_composite(
                [e.encode() for e in self.composite_path] + [nb]
            )
        return nb

    def _encode_cell(self, c: Cell) -> bytes:
        out = bytearray()
        out += _enc_str16(self._name_bytes(c.col_name))
        if c.range_tomb:
            # name is the range start; data the end.  The engine's range
            # semantics bound only the end (covering_tombstone_ts), so
            # the fixture writes start == end and the reader keeps the
            # end bound, exactly the fields the reference keeps
            # (SSTable.cpp:416-423).
            out.append(RANGE_TOMBSTONE_MASK)
            out += _enc_str16(self._name_bytes(c.col_name))
            out += struct.pack(">i", c.ts // 1_000_000)
            out += struct.pack(">q", c.ts)
            return bytes(out)
        flags = 0
        if c.deleted:
            flags |= DELETION_MASK
        elif c.col_name in self.counter_cols:
            flags |= COUNTER_MASK
        elif c.ttl is not None:
            flags |= EXPIRATION_MASK
        out.append(flags)
        if flags & COUNTER_MASK:
            out += struct.pack(">q", c.ts)  # counter timestamp
        elif flags & EXPIRATION_MASK:
            out += struct.pack(">i", c.ttl)
            out += struct.pack(">i", int(c.expiration))
        out += struct.pack(">q", c.ts)
        # value: be32 length + bytes; a deleted cell's value is its
        # 4-byte localDeletionTime (discarded on read, like the reference)
        value = struct.pack(">i", c.ts // 1_000_000) if c.deleted else c.value
        out += struct.pack(">i", len(value)) + value
        return bytes(out)

    def _encode_partition(self, p: Partition) -> tuple[bytes, list[tuple[int, bytes]]]:
        """Partition body + cell marks [(offset_rel_to_partition_start,
        on-disk cell name)] — the marks feed the promoted-index block
        sweep (block boundaries must fall on cell starts)."""
        out = bytearray()
        out += _enc_str16(p.key)
        if p.row_tomb_ts is not None:
            out += struct.pack(">i", p.row_tomb_ts // 1_000_000)
            out += struct.pack(">q", p.row_tomb_ts)
        else:
            out += struct.pack(">i", LIVE_LOCAL_DELETION)
            out += struct.pack(">q", LIVE_MARKED_FOR_DELETE)
        marks: list[tuple[int, bytes]] = []
        for c in p.cells:
            marks.append((len(out), self._name_bytes(c.col_name)))
            out += self._encode_cell(c)
        out += struct.pack(">H", 0)  # empty name terminates (>= ja)
        return bytes(out), marks

    def _promoted_index(self, p: Partition, body: bytes,
                        marks: list[tuple[int, bytes]]) -> bytes | None:
        """Real 2.x-era promoted index for a WIDE partition: the entry
        DeletionTime (localDeletionTime be32 + markedForDeleteAt be64 —
        RowIndexEntry carries it so a block reader never re-reads the
        partition header), a be32 IndexInfo count, then per block
        firstName (str16), lastName (str16), offset (be64, relative to
        the partition start), width (be64).  The reference reads the
        be32 size of these bytes and skips them (SSTable.cpp:76-84);
        this engine fans the blocks out as InputPartitions instead."""
        thr = self.promoted_threshold
        if not thr or len(body) <= thr or len(marks) < 2:
            return None
        # block sweep: boundaries on cell starts, >= thr bytes apart
        blocks: list[int] = [0]  # indexes into marks
        for i in range(1, len(marks)):
            if marks[i][0] - marks[blocks[-1]][0] >= thr:
                blocks.append(i)
        if len(blocks) < 2:
            return None
        end_of_cells = len(body) - 2  # the 2-byte terminator
        if p.row_tomb_ts is not None:
            ldt, marked = p.row_tomb_ts // 1_000_000, p.row_tomb_ts
        else:
            ldt, marked = LIVE_LOCAL_DELETION, LIVE_MARKED_FOR_DELETE
        out = bytearray()
        out += struct.pack(">i", ldt) + struct.pack(">q", marked)
        out += struct.pack(">i", len(blocks))
        for j, bi in enumerate(blocks):
            lo = marks[bi][0]
            hi = marks[blocks[j + 1]][0] if j + 1 < len(blocks) else end_of_cells
            last = marks[blocks[j + 1] - 1][1] if j + 1 < len(blocks) else marks[-1][1]
            out += _enc_str16(marks[bi][1])  # firstName
            out += _enc_str16(last)  # lastName
            out += struct.pack(">q", lo)
            out += struct.pack(">q", hi - lo)
        return bytes(out)

    def finish(self) -> None:
        self._parts.sort(key=lambda t: (t[0], t[1].key))
        data = bytearray()
        index = bytearray()
        offsets_of_keys: list[tuple[bytes, int]] = []
        for _tok, p in self._parts:
            offsets_of_keys.append((p.key, len(index)))
            index += _enc_str16(p.key)
            index += struct.pack(">q", len(data))  # old: be64 position
            body, marks = self._encode_partition(p)
            promoted = self._promoted_index(p, body, marks)
            if promoted is None:
                index += struct.pack(">i", 0)  # promoted-index size to skip
            else:
                index += struct.pack(">i", len(promoted)) + promoted
            data += body

        alg, before = checksum_spec(self.vcode)
        chunk_offsets: list[int] = []
        data_file = bytearray()
        for i in range(0, max(len(data), 1), self.chunk_size):
            raw = bytes(data[i : i + self.chunk_size])
            chunk_offsets.append(len(data_file))
            comp = _compress_chunk(self.codec_class, raw)
            data_file += comp
            checksummed = comp if before else raw
            data_file += struct.pack(">I", chunk_checksum(alg, checksummed))
        with open(self.path("Data"), "wb") as f:
            f.write(data_file)

        ci = bytearray()
        ci += _enc_str16(self.codec_class.encode())
        ci += struct.pack(">i", 0)
        ci += struct.pack(">i", self.chunk_size)
        ci += struct.pack(">q", len(data))
        ci += struct.pack(">i", len(chunk_offsets))
        for o in chunk_offsets:
            ci += struct.pack(">q", o)
        with open(self.path("CompressionInfo"), "wb") as f:
            f.write(ci)

        write_statistics(self.path("Statistics"), self.vcode, self.partitioner)

        with open(self.path("Index"), "wb") as f:
            f.write(index)

        # Summary: identical native-endian toc shape to ma; the ka+
        # 8-byte extra header only from ka on (SSTable.cpp:135-136)
        sampled = offsets_of_keys[::SUMMARY_INTERVAL]
        entries = [k + struct.pack("=q", off) for k, off in sampled]
        toc = bytearray()
        pos = 4 * len(sampled)
        for e in entries:
            toc += struct.pack("=i", pos)
            pos += len(e)
        for e in entries:
            toc += e
        sm = bytearray()
        sm += struct.pack(">i", 128)
        sm += struct.pack(">i", len(sampled))
        sm += struct.pack(">q", len(toc))
        if self.vcode >= V_KA:
            sm += struct.pack(">q", 0)
        sm += toc
        with open(self.path("Summary"), "wb") as f:
            f.write(sm)

        # Filter.db: bloom over the partition keys (same engine
        # serializer as the ma era — see OldReader.might_contain_key
        # for why the OLD-era read side is tolerant, not fail-loud)
        from .bloom import BloomFilter

        bf = BloomFilter.sized_for(len(offsets_of_keys), 0.01)
        for k, _off in offsets_of_keys:
            bf.add(k)
        with open(self.path("Filter"), "wb") as f:
            f.write(bf.serialize())


# --------------------------------------------------------------- reader


def _need(buf: bytes, off: int, n: int) -> int:
    """Bounds check: truncated/corrupt input fails as a uniform
    ValueError, never IndexError/struct.error."""
    if off + n > len(buf):
        raise ValueError("old: truncated stream")
    return off


class OldReader:
    """Reads one pre-ma sstable back into (token, Partition) pairs."""

    def __init__(self, table_dir: str, data_name: str, verify_checksums: bool = True):
        parsed = parse_data_filename(data_name)
        if parsed is None:
            raise ValueError(f"not a versioned Data.db name: {data_name!r}")
        self.vcode, self.gen, self._prefix = parsed
        if not V_JA <= self.vcode < V_MA:
            raise ValueError(
                f"OldReader supports ja..lz, got version {self.vcode} "
                f"from {data_name!r}"
            )
        self.table_dir = table_dir
        self.verify = verify_checksums
        self.partitioner = read_partitioner(self.path("Statistics"), self.vcode)
        self._bloom = None  # lazy: loaded on first might_contain_key

    def path(self, component: str) -> str:
        return os.path.join(self.table_dir, f"{self._prefix}-{component}.db")

    def might_contain_key(self, key: bytes) -> bool:
        """Filter.db membership probe, OLD-era semantics: True when the
        filter admits the key, the sidecar is absent, OR it does not
        parse as the engine serialization.  Unlike the ma side (which
        raises on a malformed filter), the old era is TOLERANT by
        design: real pre-3.0 deployments shipped several bloom
        serializations across ja..la, so an unparseable Filter.db here
        most likely means a REAL old-era filter, not corruption — and
        admitting is always safe (pruning is an optimization; a misread
        filter must never hide data)."""
        if self._bloom is None:
            from .bloom import BloomFilter

            try:
                self._bloom = BloomFilter.load(self.path("Filter"))
            except (OSError, ValueError):
                self._bloom = False  # absent or foreign-format: no pruning
        if self._bloom is False:
            return True
        return self._bloom.might_contain(key)

    def _logical_window(
        self, start_off: int, end_off: int | None
    ) -> tuple[bytes, int]:
        from .ma_format import read_chunked_window, read_compression_info

        alg, before = checksum_spec(self.vcode)
        return read_chunked_window(
            self.path("Data"),
            read_compression_info(self.path("CompressionInfo"), "old"),
            start_off,
            end_off,
            self.verify,
            alg,
            before,
            "old",
        )

    def _logical_data(self) -> bytes:
        buf, _base = self._logical_window(0, None)
        return buf

    def _index_entries(self, start_from: int = 0):
        """(key, data_offset) pairs from the old-era Index.db: key,
        be64 position, be32 promoted-index size to skip
        (SSTable.cpp:76-84, pre-ma branches)."""
        buf = open(self.path("Index"), "rb").read()
        off = start_from
        while off < len(buf):
            key, off = _dec_str16(buf, off)
            (pos,) = struct.unpack_from(">q", buf, _need(buf, off, 12))
            (skip,) = struct.unpack_from(">i", buf, off + 8)
            off = _need(buf, off + 12, skip) + skip
            yield key, pos

    def index_entries_full(self):
        """(key, data_offset, promoted) triples, where `promoted` is
        None for ordinary partitions and (row_tomb_ts | None,
        [block_offsets]) for WIDE partitions — the 2.x-era promoted
        index the reference only skips (SSTable.cpp:76-84): entry
        DeletionTime, be32 IndexInfo count, then per block firstName /
        lastName (str16), offset (be64, partition-start-relative),
        width (be64).  Same return shape as MaReader.index_entries_full
        so the planner fans both eras out identically."""
        buf = open(self.path("Index"), "rb").read()
        off = 0
        while off < len(buf):
            key, off = _dec_str16(buf, off)
            (pos,) = struct.unpack_from(">q", buf, _need(buf, off, 12))
            (psize,) = struct.unpack_from(">i", buf, off + 8)
            off = _need(buf, off + 12, psize)
            promoted = None
            if psize > 0:
                end = off + psize
                o2 = _need(buf, off, 12)
                (marked,) = struct.unpack_from(">q", buf, o2 + 4)
                o2 += 12
                (nblocks,) = struct.unpack_from(">i", buf, _need(buf, o2, 4))
                o2 += 4
                blocks = []
                for _ in range(nblocks):
                    _first, o2 = _dec_str16(buf, o2)
                    _last, o2 = _dec_str16(buf, o2)
                    o2 = _need(buf, o2, 16)
                    (boff,) = struct.unpack_from(">q", buf, o2)
                    o2 += 16  # offset + width
                    blocks.append(boff)
                if o2 != end:
                    raise ValueError("old: promoted index size mismatch")
                promoted = (
                    None if marked == LIVE_MARKED_FOR_DELETE else marked,
                    blocks,
                )
                off = end
            yield key, pos, promoted

    def logical_length(self) -> int:
        """Total uncompressed Data.db length (CompressionInfo header)."""
        from .ma_format import read_compression_info

        _codec, _chunk, total, _offs = read_compression_info(
            self.path("CompressionInfo"), "old"
        )
        return total

    def _slice_offsets(
        self, start_token: int | None, end_token: int | None
    ) -> tuple[int, int | None] | None:
        from .ma_format import slice_offsets_via_index, summary_seek_below

        return slice_offsets_via_index(
            self._index_entries,
            lambda t: summary_seek_below(
                self.path("Summary"), self.vcode >= V_KA, t
            ),
            start_token,
            end_token,
        )

    def partitions(
        self, start_token: int | None = None, end_token: int | None = None
    ):
        """(token, Partition) pairs, optionally restricted to the token
        range [start_token, end_token) via Summary seek + Index scan
        into a chunk-bounded window (the same O2 sub-split discipline as
        MaReader; bounds only meaningful under Murmur3)."""
        if start_token is None and end_token is None:
            buf, n = self._logical_data(), None
        else:
            window = self._slice_offsets(start_token, end_token)
            if window is None:
                return
            start_off, end_off = window
            buf, base = self._logical_window(start_off, end_off)
            buf = buf[start_off - base :]
            n = None if end_off is None else end_off - start_off
        if n is None:
            n = len(buf)
        yield from self._partitions_in(buf, 0, n)

    def _partitions_in(self, buf: bytes, off: int, n: int):
        while off < n:
            key, off = _dec_str16(buf, off)
            off = _need(buf, off, 12)
            # partition localDeletion: read and discard (SSTable.cpp:351)
            (marked,) = struct.unpack_from(">q", buf, off + 4)
            off += 12
            row_tomb = None if marked == LIVE_MARKED_FOR_DELETE else marked
            cells, off = self._scan_cells(buf, off, n)
            yield murmur3_token(key), Partition(
                key=key, row_tomb_ts=row_tomb, cells=cells
            )

    def _scan_cells(self, buf: bytes, off: int, n: int) -> tuple[list[Cell], int]:
        """Cells from `off` up to the empty-name row terminator or `n`
        (a promoted BLOCK window ends on a cell boundary, not the
        terminator — both stops are legal)."""
        cells: list[Cell] = []
        while off < n:
            name, off = _dec_str16(buf, off)
            if not name:
                break  # >= ja: empty column name terminates the row
            name = unwrap_composite(name)
            flags = buf[_need(buf, off, 1)]
            off += 1
            if flags & RANGE_TOMBSTONE_MASK:
                end_name, off = _dec_str16(buf, off)
                off = _need(buf, off, 12)
                (ts,) = struct.unpack_from(">q", buf, off + 4)
                off += 12
                cells.append(
                    Cell(
                        col_name=unwrap_composite(end_name).decode(),
                        ts=ts,
                        range_tomb=True,
                    )
                )
                continue
            ttl = expiration = None
            if flags & COUNTER_MASK:
                off = _need(buf, off, 8) + 8  # counterTs: parse + drop
            elif flags & EXPIRATION_MASK:
                off = _need(buf, off, 8)
                ttl, expiration = struct.unpack_from(">ii", buf, off)
                off += 8
            (ts,) = struct.unpack_from(">q", buf, _need(buf, off, 8))
            off += 8
            (vlen,) = struct.unpack_from(">i", buf, _need(buf, off, 4))
            off += 4
            if vlen < 0:
                raise ValueError("old: negative value length")
            off = _need(buf, off, vlen)
            value = buf[off : off + vlen]
            off += vlen
            deleted = bool(flags & DELETION_MASK)
            cells.append(
                Cell(
                    col_name=name.decode(),
                    value=b"" if deleted else value,
                    ts=ts,
                    ttl=ttl,
                    expiration=expiration,
                    deleted=deleted,
                )
            )
        return cells, off

    def partitions_between(self, lo: int, hi: int | None):
        """(token, Partition) pairs from the explicit LOGICAL offset
        range [lo, hi) — the planner's offset-granular slicing around
        wide partitions, the old-era twin of MaReader.partitions_between
        (`lo`/`hi` always fall on partition starts: they come from
        Index.db positions)."""
        buf, base = self._logical_window(lo, hi)
        off = lo - base
        n = len(buf) if hi is None else hi - base
        yield from self._partitions_in(buf, off, n)

    def partition_window(self, key: bytes, row_tomb: int | None,
                         lo: int, hi: int | None):
        """ONE BLOCK of a wide partition: cells in logical [lo, hi) —
        promoted IndexInfo offsets always fall on cell starts — scanned
        WITHOUT the partition header (key and the header deletion come
        from the Index.db promoted entry, the RowIndexEntry design).
        Returns (token, Partition) holding just this block's cells."""
        buf, base = self._logical_window(lo, hi)
        off = lo - base
        n = len(buf) if hi is None else hi - base
        cells, _off = self._scan_cells(buf, off, n)
        return murmur3_token(key), Partition(
            key=key, row_tomb_ts=row_tomb, cells=cells
        )


def discover_cassandra_sstables(table_dir: str) -> list[tuple[int, int, str]]:
    """All real-format sstables (any era) in a table directory as
    (version_code, generation, data_filename), generation-ordered — the
    *-Data.db walk of CassandraParser.cpp:108-135 with the per-file
    version parse of SSTable.cpp:190-225."""
    found = []
    for name in os.listdir(table_dir):
        if not name.endswith("-Data.db"):
            continue
        parsed = parse_data_filename(name)
        if parsed is not None:
            found.append((parsed[0], parsed[1], name))
    return sorted(found, key=lambda t: (t[1], t[0]))
