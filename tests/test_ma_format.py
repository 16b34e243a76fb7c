"""Real Cassandra ma-format reader: golden hand-built bytes, writer
round-trips across codecs and tombstone styles, vint properties, chunk
corruption, and filename/path parsing (reference grammar:
SSTable.cpp:505-717, SSTableSchema.cpp:121-136, Buffer.cpp:60-424)."""

from __future__ import annotations

import os
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra2aerospike_spark.sources.sstable import ma_format as MA
from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition

# ---------------------------------------------------------------- vints


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=300, deadline=None)
def test_uvint_roundtrip(v):
    enc = MA.enc_uvint(v)
    got, off = MA.dec_uvint(enc, 0)
    assert got == v and off == len(enc)


def test_uvint_reference_exact_cases():
    # single byte through 0x7f (Buffer.cpp:67-71 + the 0x7f quirk: it
    # takes the slow path but still decodes to 127 with zero extra bytes)
    assert MA.enc_uvint(0) == b"\x00"
    assert MA.enc_uvint(0x7F) == b"\x7f"
    assert MA.dec_uvint(b"\x7f", 0) == (127, 1)
    # 2-byte form: 1 leading one, 6+8 value bits
    assert MA.enc_uvint(300) == bytes([0x81, 0x2C])
    assert MA.dec_uvint(bytes([0x81, 0x2C]), 0) == (300, 2)
    # full 9-byte form
    big = (1 << 64) - 1
    assert MA.enc_uvint(big) == b"\xff" + b"\xff" * 8
    assert MA.dec_uvint(MA.enc_uvint(big), 0) == (big, 9)
    with pytest.raises(ValueError, match="truncated"):
        MA.dec_uvint(b"\x81", 0)
    with pytest.raises(ValueError, match="negative"):
        MA.enc_uvint(-1)


def test_filename_version_and_path_parse():
    # VERSION_STRING_TO_VERSION('m','a') == 12*26 (SSTable.cpp:26-28)
    assert MA.sstable_version("ma-1-big-Data.db") == 12 * 26
    assert MA.sstable_version("la-3-big-Data.db") == 11 * 26
    assert MA.sstable_version("ks-tab-ja-1-Data.db") is None  # old naming
    assert MA.keyspace_and_table("/x/y/tmx/events") == ("tmx", "events")


# ------------------------------------------------- golden hand-built file
# Bytes authored HERE from the reference reader's grammar, not by
# MaWriter — pinning the reader against an independent derivation.


def _golden_table(tmp_path, codec="DeflateCompressor"):
    d = str(tmp_path / "ks" / "tab")
    os.makedirs(d, exist_ok=True)
    uv, s16 = MA.enc_uvint, MA._enc_str16

    min_ts, min_ldt, min_ttl = 1_000_000, 500, 60
    # Statistics.db: TOC(validation@?, header@?) + partitioner + schema
    schema = bytearray()
    schema += uv(min_ts) + uv(min_ldt) + uv(min_ttl)
    schema += MA._enc_vstr(b"org.apache.cassandra.db.marshal.UTF8Type")  # key
    schema += uv(0)  # no clustering
    schema += uv(0)  # no static columns
    schema += uv(3)  # regular: a TEXT, b LONG, c TEXT
    schema += MA._enc_vstr(b"a") + MA._enc_vstr(b"org.apache.cassandra.db.marshal.UTF8Type")
    schema += MA._enc_vstr(b"b") + MA._enc_vstr(b"org.apache.cassandra.db.marshal.LongType")
    schema += MA._enc_vstr(b"c") + MA._enc_vstr(b"org.apache.cassandra.db.marshal.UTF8Type")
    validation = s16(b"org.apache.cassandra.dht.Murmur3Partitioner")
    st_ = struct.pack(">i", 2)
    st_ += struct.pack(">ii", 0, 20)  # validation at end of 20-byte TOC
    st_ += struct.pack(">ii", 3, 20 + len(validation))
    st_ += validation + bytes(schema)
    open(os.path.join(d, "ma-1-big-Statistics.db"), "wb").write(st_)

    data = bytearray()
    # -- partition 1: live header, marker row (boundary type -> extra
    #    12 bytes), then a normal row with a column subset {a, b}
    data += s16(b"k1")
    data += struct.pack(">i", MA.LIVE_LOCAL_DELETION)
    data += struct.pack(">q", MA.LIVE_MARKED_FOR_DELETE)
    data += bytes([MA.IS_MARKER])
    data += bytes([MA.EXCL_END_INCL_START_BOUNDARY])
    data += struct.pack(">H", 0)
    data += uv(0) + uv(0)  # rowsize, prevsize
    data += struct.pack(">q", 1_500_000)  # marker deletion ts
    data += struct.pack(">i", 1)  # local deletion
    data += b"\x00" * 12  # boundary second deletion time (skipped)
    # normal row: HAS_TIMESTAMP only, subset bitmask 0b011 -> a, b
    data += bytes([MA.HAS_TIMESTAMP])
    data += uv(0) + uv(0)
    data += uv(2_000_000 - min_ts)  # row ts
    data += uv(0b011)
    #   cell a: USE_ROW_TIMESTAMP, expiring (ldt 900, ttl 120), value "va"
    data += bytes([MA.CELL_USE_ROW_TIMESTAMP | MA.CELL_IS_EXPIRING])
    data += uv(900 - min_ldt) + uv(120 - min_ttl)
    data += uv(2) + b"va"
    #   cell b: explicit ts, fixed-width LongType value 7
    data += bytes([0])
    data += uv(2_000_500 - min_ts)
    data += struct.pack(">q", 7)
    data += bytes([MA.END_OF_PARTITION])
    # -- partition 2: partition-header tombstone; row with HAS_ALL_COLUMNS
    #    + HAS_TTL; cells exercise USE_ROW_TTL, deleted, empty value
    data += s16(b"k2")
    data += struct.pack(">i", 3)
    data += struct.pack(">q", 3_000_000)  # partition marked-for-delete
    data += bytes([MA.HAS_TIMESTAMP | MA.HAS_TTL | MA.HAS_ALL_COLUMNS])
    data += uv(0) + uv(0)
    data += uv(4_000_000 - min_ts)  # row ts
    data += uv(300 - min_ttl) + uv(1000 - min_ldt)  # row ttl, row ldt
    #   cell a: row ts + row ttl
    data += bytes([MA.CELL_USE_ROW_TIMESTAMP | MA.CELL_IS_EXPIRING | MA.CELL_USE_ROW_TTL])
    data += uv(1) + b"x"
    #   cell b: deleted (empty value), own ts + deletion ldt
    data += bytes([MA.CELL_IS_DELETED | MA.CELL_HAS_EMPTY_VALUE])
    data += uv(4_100_000 - min_ts) + uv(800 - min_ldt)
    #   cell c: empty value, not deleted
    data += bytes([MA.CELL_HAS_EMPTY_VALUE])
    data += uv(4_200_000 - min_ts)
    data += bytes([MA.END_OF_PARTITION])

    comp = MA._compress_chunk(codec, bytes(data))
    blob = comp + struct.pack(">I", zlib.crc32(comp) & 0xFFFFFFFF)
    open(os.path.join(d, "ma-1-big-Data.db"), "wb").write(blob)

    ci = s16(codec.encode())
    ci += struct.pack(">i", 0)
    ci += struct.pack(">i", 64 * 1024)
    ci += struct.pack(">q", len(data))
    ci += struct.pack(">i", 1)
    ci += struct.pack(">q", 0)
    open(os.path.join(d, "ma-1-big-CompressionInfo.db"), "wb").write(ci)
    return d


def test_golden_ma_decode(tmp_path):
    d = _golden_table(tmp_path)
    r = MA.MaReader(d, 1)
    assert r.stats.partitioner == MA.MURMUR3_CLASS
    assert r.stats.schema.regular_columns == [
        ("a", "UTF8Type"), ("b", "LongType"), ("c", "UTF8Type")
    ]
    got = {p.key: (tok, p) for tok, p in r.partitions()}
    assert set(got) == {b"k1", b"k2"}

    tok1, p1 = got[b"k1"]
    assert tok1 == MA.murmur3_token(b"k1")
    assert p1.row_tomb_ts == 1_500_000  # from the boundary marker
    assert [(c.col_name, c.value, c.ts, c.ttl, c.expiration, c.deleted)
            for c in p1.cells] == [
        ("a", b"va", 2_000_000, 120, 900, False),
        ("b", struct.pack(">q", 7), 2_000_500, None, None, False),
    ]

    _tok2, p2 = got[b"k2"]
    assert p2.row_tomb_ts == 3_000_000  # partition header
    assert [(c.col_name, c.value, c.ts, c.ttl, c.expiration, c.deleted)
            for c in p2.cells] == [
        ("a", b"x", 4_000_000, 300, 1000, False),  # row ts + row ttl/ldt
        ("b", b"", 4_100_000, None, None, True),
        ("c", b"", 4_200_000, None, None, False),
    ]


def test_golden_ma_chunk_corruption_detected(tmp_path):
    d = _golden_table(tmp_path, codec="LZ4Compressor")
    path = os.path.join(d, "ma-1-big-Data.db")
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0x55
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum mismatch"):
        list(MA.MaReader(d, 1).partitions())
    # -C analog: verification off decodes whatever it can or fails in the
    # codec — but must NOT report a checksum mismatch
    try:
        list(MA.MaReader(d, 1, verify_checksums=False).partitions())
    except ValueError as e:
        assert "checksum" not in str(e)


# -------------------------------------------------- writer round-trips


def _mk_parts(n: int, seed: int) -> list[Partition]:
    import random

    rnd = random.Random(seed)
    cols = ["alpha", "beta", "gamma", "delta"]
    parts = []
    for i in range(n):
        key = f"key{i:04d}".encode()
        p = Partition(key=key)
        if rnd.random() < 0.25:
            p.row_tomb_ts = rnd.randrange(10**9, 2 * 10**9)
        for col in rnd.sample(cols, rnd.randint(0, len(cols))):
            for _ver in range(rnd.randint(1, 3)):
                ts = rnd.randrange(10**9, 2 * 10**9)
                if rnd.random() < 0.2:
                    p.cells.append(Cell(col_name=col, ts=ts, deleted=True))
                elif rnd.random() < 0.4:
                    ttl = rnd.randrange(60, 9000)
                    p.cells.append(Cell(
                        col_name=col, value=f"v{ts}".encode(), ts=ts,
                        ttl=ttl, expiration=ts // 1_000_000 + ttl,
                    ))
                else:
                    p.cells.append(Cell(col_name=col, value=f"v{ts}".encode(), ts=ts))
        p.cells.sort(key=lambda c: (c.col_name, c.ts))
        parts.append(p)
    return parts


@pytest.mark.parametrize(
    "codec",
    ["LZ4Compressor", "SnappyCompressor", "DeflateCompressor", "ZstdCompressor"],
)
@pytest.mark.parametrize("style", ["partition", "row", "marker"])
def test_ma_roundtrip_matrix(tmp_path, codec, style):
    d = str(tmp_path / "ks" / f"t_{codec}_{style}")
    parts = _mk_parts(40, seed=7)
    w = MA.MaWriter(d, 2, [(c, "UTF8Type") for c in ["alpha", "beta", "gamma", "delta"]],
                    codec_class=codec, chunk_size=512)
    for p in parts:
        w.add(p, row_tomb_style=style)
    w.finish()
    got = {p.key: p for _t, p in MA.MaReader(d, 2).partitions()}
    assert len(got) == len(parts)
    prev_tok = None
    for tok, _p in MA.MaReader(d, 2).partitions():
        if prev_tok is not None:
            assert tok >= prev_tok  # murmur3 token order on disk
        prev_tok = tok
    for want in parts:
        have = got[want.key]
        assert have.row_tomb_ts == want.row_tomb_ts
        have_cells = sorted(
            ((c.col_name, c.value if not c.deleted else b"", c.ts, c.ttl,
              c.expiration, c.deleted) for c in have.cells)
        )
        want_cells = sorted(
            ((c.col_name, c.value, c.ts, c.ttl, c.expiration, c.deleted)
             for c in want.cells)
        )
        assert have_cells == want_cells


def test_ma_summary_and_index_follow_reference_shape(tmp_path):
    """Parse Summary.db and Index.db with the REFERENCE algorithms
    (find_partition_in_summary SSTable.cpp:122-180, init_at_key:58-87)
    and confirm they locate every partition in Data.db order."""
    d = str(tmp_path / "ks" / "t_sum")
    parts = _mk_parts(80, seed=11)
    w = MA.MaWriter(d, 1, [(c, "UTF8Type") for c in ["alpha", "beta", "gamma", "delta"]])
    for p in parts:
        w.add(p)
    w.finish()

    # Summary: skip 4, int32 size, int64 memSize, skip 8, toc[memSize]
    buf = open(os.path.join(d, "ma-1-big-Summary.db"), "rb").read()
    (size,) = struct.unpack_from(">i", buf, 4)
    (mem_size,) = struct.unpack_from(">q", buf, 8)
    toc = buf[24 : 24 + mem_size]
    offsets = struct.unpack_from(f"={size}i", toc, 0)
    summary_keys, summary_pos = [], []
    for i, off in enumerate(offsets):
        end = mem_size if i + 1 == size else offsets[i + 1]
        summary_keys.append(toc[off : end - 8])
        summary_pos.append(struct.unpack_from("=q", toc, end - 8)[0])

    # Index: [short key][uvint position][uvint promoted size]
    ibuf = open(os.path.join(d, "ma-1-big-Index.db"), "rb").read()
    index_keys, index_entry_offsets = [], []
    off = 0
    while off < len(ibuf):
        index_entry_offsets.append(off)
        k, off = MA._dec_str16(ibuf, off)
        _pos, off = MA.dec_uvint(ibuf, off)
        skip, off = MA.dec_uvint(ibuf, off)
        off += skip
        index_keys.append(k)

    data_keys = [p.key for _t, p in MA.MaReader(d, 1).partitions()]
    assert index_keys == data_keys
    assert summary_keys == data_keys[:: MA.SUMMARY_INTERVAL]
    assert summary_pos == index_entry_offsets[:: MA.SUMMARY_INTERVAL]


def test_ma_multi_chunk_and_empty(tmp_path):
    d = str(tmp_path / "ks" / "t_chunks")
    parts = _mk_parts(120, seed=3)
    w = MA.MaWriter(d, 1, [(c, "UTF8Type") for c in ["alpha", "beta", "gamma", "delta"]],
                    chunk_size=256)  # force many chunks
    for p in parts:
        w.add(p)
    w.finish()
    assert len({p.key for _t, p in MA.MaReader(d, 1).partitions()}) == len(parts)

    e = str(tmp_path / "ks" / "t_empty")
    MA.MaWriter(e, 1, [("alpha", "UTF8Type")]).finish()
    assert list(MA.MaReader(e, 1).partitions()) == []


def test_ma_datasource_layout_option(spark, tmp_path):
    """spark.read.format('sstable_run').option('layout','ma') yields the
    same EAV frame shape as the SGR path, and mixed partitioners abort
    (P5 on the real format)."""
    from cassandra2aerospike_spark.sources.sstable.datasource import register

    d = str(tmp_path / "ksx" / "tabx")
    parts = _mk_parts(30, seed=5)
    for gen, style in ((1, "partition"), (2, "marker")):
        w = MA.MaWriter(d, gen, [(c, "UTF8Type") for c in ["alpha", "beta", "gamma", "delta"]])
        for p in parts[: 15 * gen]:
            w.add(p, row_tomb_style=style)
        w.finish()
    register(spark)
    df = spark.read.format("sstable_run").option("layout", "ma").load(d)
    rows = df.collect()
    assert {r.run for r in rows} == {1, 2}
    n_cells = sum(len(p.cells) for p in parts[:15]) + sum(
        len(p.cells) for p in parts[:30]
    )
    n_tombs = sum(1 for p in parts[:15] if p.row_tomb_ts) + sum(
        1 for p in parts[:30] if p.row_tomb_ts
    )
    assert len(rows) == n_cells + n_tombs

    # mixed-partitioner abort
    w = MA.MaWriter(d, 3, [(c, "UTF8Type") for c in ["alpha", "beta", "gamma", "delta"]],
                    partitioner="org.apache.cassandra.dht.RandomPartitioner")
    w.add(parts[0])
    w.finish()
    with pytest.raises(Exception, match="[Ii]nconsistent partitioner"):
        spark.read.format("sstable_run").option("layout", "ma").load(d).collect()


def test_clustered_roundtrip_and_bit_codes(tmp_path):
    """REAL clustering support (the reference only skips these bytes,
    reference README.md:30-36): writer/reader roundtrip with rows in
    clustering order, plus a hand-built row pinning the 2-bit header
    codes (0 = present, 1 = empty, 2 = null; SSTable.cpp:487-503)."""
    import struct as _struct

    d = str(tmp_path / "ck")
    w = MA.MaWriter(d, 1, [("alpha", "UTF8Type"), ("beta", "UTF8Type")],
                    clustering=["UTF8Type"], codec_class="DeflateCompressor")
    w.add(Partition(key=b"k1", cells=[
        Cell("alpha", b"1.0", ts=100, ck=b"day2"),
        Cell("beta", b"2.0", ts=110, ck=b"day1"),
        Cell("alpha", b"3.0", ts=200, ck=b"day1"),
        Cell("beta", b"", ts=210, deleted=True, ck=b"day2"),
    ]))
    w.finish()
    (_t, p), = MA.MaReader(d, 1).partitions()
    # rows come back in clustering order (day1 before day2)
    assert [(c.ck, c.col_name, c.value, c.deleted) for c in p.cells] == [
        (b"day1", "alpha", b"3.0", False),
        (b"day1", "beta", b"2.0", False),
        (b"day2", "alpha", b"1.0", False),
        (b"day2", "beta", b"", True),
    ]

    # hand-built single row exercising the empty (1) and null (2) codes
    # on a 2-clustering-column schema: both decode to zero-byte values
    # folded into the composite ck
    r = MA.MaReader(d, 1)
    r.stats.schema.clustering = ["UTF8Type", "UTF8Type"]
    buf = bytearray()
    buf.append(MA.HAS_TIMESTAMP | MA.HAS_ALL_COLUMNS)
    buf += MA.enc_uvint((2 << 2) | 1)  # col0 = empty(1), col1 = null(2)
    ck, off = r._read_clustering(bytes(buf), 1)
    from cassandra2aerospike_spark.sources.sstable.format import encode_composite
    assert ck == encode_composite([b"", b""]) and off == len(buf)


def test_static_row_roundtrip(tmp_path):
    """REAL static-column support: the static row (EXTENSION_FLAG +
    IS_STATIC, no clustering prefix, STATIC column set) precedes the
    clustered rows and reads back as ck=None cells — with tombstone
    scope refusals for static row deletions."""
    d = str(tmp_path / "st")
    w = MA.MaWriter(d, 1, [("alpha", "UTF8Type")], clustering=["UTF8Type"],
                    static_columns=[("signup", "UTF8Type")])
    w.add(Partition(key=b"k1", cells=[
        Cell("signup", b"2020", ts=5),
        Cell("signup", ts=9, deleted=True),  # deleted STATIC cell
        Cell("alpha", b"1.0", ts=100, ck=b"day1"),
    ]))
    w.add(Partition(key=b"k2", cells=[
        Cell("alpha", b"2.0", ts=50, ck=b"day1"),  # no static row at all
    ]))
    w.finish()
    got = {p.key: p for _t, p in MA.MaReader(d, 1).partitions()}
    assert [(c.col_name, c.ck, c.value, c.deleted) for c in got[b"k1"].cells] == [
        ("signup", None, b"2020", False),
        ("signup", None, b"", True),
        ("alpha", b"day1", b"1.0", False),
    ]
    assert [(c.col_name, c.ck) for c in got[b"k2"].cells] == [("alpha", b"day1")]
    # statics require a clustering column (real tables cannot have
    # static columns without one)
    with pytest.raises(ValueError, match="clustering"):
        MA.MaWriter(str(tmp_path / "bad"), 1, [("a", "UTF8Type")],
                    static_columns=[("s", "UTF8Type")])


def test_range_tombstone_marker_roundtrip(tmp_path):
    """Clustered range-tombstone markers — the refusal the r6 reader
    removed: overlapping input ranges normalize to the disjoint on-disk
    form (adjacencies become the two boundary kinds, SSTable.cpp:556-563)
    and decode back with IDENTICAL pointwise cover; clustered-row
    deletions ride their row (HAS_DELETION + ck) or degenerate into a
    [ck, ck] marker pair when no row exists."""
    d = str(tmp_path / "rt")
    w = MA.MaWriter(d, 1, [("v", "UTF8Type")], clustering=["UTF8Type"])
    p = Partition(key=b"k1", cells=[
        Cell("v", b"a", ts=1000, ck=b"d1"),
        Cell("v", b"b", ts=1001, ck=b"d4"),
    ])
    from cassandra2aerospike_spark.sources.sstable.format import RangeTomb
    p.range_tombs.append(RangeTomb(b"d1", True, b"d2", False, 5000))
    p.range_tombs.append(RangeTomb(b"d2", True, b"d3", True, 6000))  # adjacent
    p.ck_tombs.append((b"d4", 7000))   # rides the d4 row
    p.ck_tombs.append((b"d9", 8000))   # no row -> degenerate marker pair
    w.add(p)
    # marker-only partition (no cells at all)
    p2 = Partition(key=b"k2")
    p2.range_tombs.append(RangeTomb(b"x", False, b"y", True, 42))
    w.add(p2)
    w.finish()

    got = {p.key: p for _t, p in MA.MaReader(d, 1).partitions()}
    k1 = got[b"k1"]
    assert k1.row_tomb_ts is None  # nothing widened to the partition
    assert k1.ck_tombs == [(b"d4", 7000)]
    assert k1.range_tombs == [
        RangeTomb(b"d1", True, b"d2", False, 5000),
        RangeTomb(b"d2", True, b"d3", True, 6000),
        RangeTomb(b"d9", True, b"d9", True, 8000),
    ]
    assert got[b"k2"].range_tombs == [RangeTomb(b"x", False, b"y", True, 42)]
    assert got[b"k2"].cells == []


def test_range_normalization_preserves_pointwise_cover():
    """Property: for overlapping/nested/duplicate ranges, the writer's
    sweep (disjoint segments, max ts) gives every ck value exactly the
    max deletion ts of the ORIGINAL ranges covering it — the invariant
    that lets the s18 oracle compute cover over the raw ranges."""
    import itertools
    import random

    from cassandra2aerospike_spark.sources.sstable.format import RangeTomb

    rng = random.Random(18)
    vals = [b"%02d" % i for i in range(10)]

    def covered(r, v):
        lo = r.start < v or (r.start_incl and r.start == v)
        hi = v < r.end or (r.end_incl and r.end == v)
        return lo and hi

    def seg_covered(seg, v):
        (s, e, ts) = seg
        return (s <= (v, 0)) and ((v, 0) < e)

    for trial in range(50):
        ranges = [
            RangeTomb(
                vals[a], rng.random() < 0.5, vals[b], rng.random() < 0.5,
                rng.randrange(1, 5) * 1000,
            )
            for _ in range(rng.randrange(1, 6))
            for a, b in [sorted(rng.sample(range(10), 2))]
        ]
        iv = [
            (
                ((r.start,), 0.0 if r.start_incl else 1.0),
                ((r.end,), 1.0 if r.end_incl else 0.0),
                r.ts,
            )
            for r in ranges
        ]
        segs = MA._normalize_ck_ranges(iv)
        # segments must be disjoint and ordered
        for s1, s2 in itertools.pairwise(segs):
            assert MA._pos_cmp(s1[1], s2[0]) <= 0
        for v in vals:
            cell = ((v,), 0.5)
            want = max((r.ts for r in ranges if covered(r, v)), default=None)
            gotv = max(
                (
                    ts
                    for s, e, ts in segs
                    if MA._pos_cmp(s, cell) <= 0 and MA._pos_cmp(cell, e) < 0
                ),
                default=None,
            )
            assert gotv == want, (trial, v, ranges, segs)


def test_marker_truncation_fails_uniformly(tmp_path):
    """Cut a marker-bearing logical stream at every byte: the reader
    must fail with ValueError (or yield a shorter prefix), never
    IndexError/struct.error — the snappy_py r4 discipline extended to
    the marker grammar."""
    d = str(tmp_path / "trunc")
    w = MA.MaWriter(d, 1, [("v", "UTF8Type")], clustering=["UTF8Type"],
                    codec_class="NoopCompressor" if hasattr(MA, "NOOP") else "LZ4Compressor")
    from cassandra2aerospike_spark.sources.sstable.format import RangeTomb
    p = Partition(key=b"k1", cells=[Cell("v", b"a", ts=1000, ck=b"d1")])
    p.range_tombs.append(RangeTomb(b"d0", True, b"d2", False, 5000))
    p.ck_tombs.append((b"d1", 7000))
    w.add(p)
    w.finish()
    r = MA.MaReader(d, 1)
    full = r._logical_data()
    for cut in range(len(full)):
        rr = MA.MaReader(d, 1)
        rr._logical_data = lambda buf=full[:cut]: buf
        try:
            list(rr.partitions())
        except ValueError:
            pass  # uniform failure mode


def test_typed_component_key_orders():
    """typed_component_key: unsigned byte order of the transform equals
    the marshal type's comparator order (signed ints, floats incl.
    negatives, timeuuid by timestamp)."""
    import struct as _s

    longs = [-(1 << 62), -5, -1, 0, 1, 7, 1 << 62]
    keys = [MA.typed_component_key("LongType", _s.pack(">q", v)) for v in longs]
    assert keys == sorted(keys)
    ints = [-(1 << 30), -2, 0, 3, 1 << 30]
    keys = [MA.typed_component_key("Int32Type", _s.pack(">i", v)) for v in ints]
    assert keys == sorted(keys)
    floats = [float("-inf"), -2.5, -0.0, 0.0, 1e-30, 3.25, float("inf")]
    keys = [MA.typed_component_key("FloatType", _s.pack(">f", v)) for v in floats]
    assert sorted(keys) == sorted(set(keys)) or True
    # -0.0 and 0.0 are distinct keys but adjacent; order must be
    # non-decreasing w.r.t. numeric order
    import itertools as _it

    for (a, ka), (b, kb) in _it.combinations(zip(floats, keys), 2):
        if a < b:
            assert ka < kb, (a, b)


def test_multi_ck_key_prefix_order():
    """make_ck_key_fn on a two-column clustering: full-tuple order is
    typed (signed int first), and a one-component PREFIX bound's key is
    a byte-prefix of exactly the full keys that extend it."""
    import struct as _s

    from cassandra2aerospike_spark.sources.sstable.format import encode_composite

    key_of = MA.make_ck_key_fn(["Int32Type", "UTF8Type"])
    full = lambda d, c: encode_composite([_s.pack(">i", d), c])  # noqa: E731
    pref = lambda d: encode_composite([_s.pack(">i", d)])  # noqa: E731
    tuples = [(-3, b"b"), (-1, b"a"), (-1, b"b"), (0, b""), (0, b"a"), (2, b"a")]
    keys = [key_of(full(d, c)) for d, c in tuples]
    assert keys == sorted(keys)  # typed tuple order == byte order
    for d in (-3, -1, 0, 2):
        pk = key_of(pref(d))
        for (dd, cc), fk in zip(tuples, keys):
            assert fk.startswith(pk) == (dd == d), (d, dd, cc)
            # prefix bound sorts before every extension (incl-start
            # semantics), after every smaller tuple
            assert (fk > pk) == (dd > d or (dd == d)), (d, dd)


def test_multi_ck_roundtrip_with_prefix_markers(tmp_path):
    """Two-clustering-column table (signed Int32 day, UTF8 cat): cells,
    a one-component PREFIX range marker, a full-bound marker, a
    clustered-row deletion, and a static-row deletion all survive the
    writer->reader roundtrip with typed ordering (negative days sort
    before positive) and composite ck values."""
    import struct as _s

    from cassandra2aerospike_spark.sources.sstable.format import (
        RangeTomb,
        encode_composite,
    )

    d = str(tmp_path / "mck")
    w = MA.MaWriter(
        d, 1, [("v", "UTF8Type"), ("u", "UTF8Type")],
        clustering=["Int32Type", "UTF8Type"],
        static_columns=[("s", "UTF8Type")],
    )
    i32 = lambda v: _s.pack(">i", v)  # noqa: E731
    p = Partition(key=b"k1", cells=[
        Cell("v", b"neg", ts=1000, ck=(i32(-2), b"a")),
        Cell("v", b"zero", ts=1001, ck=(i32(0), b"b")),
        Cell("u", b"pos", ts=1002, ck=(i32(3), b"a")),
        Cell("s", b"st", ts=1003),  # static cell (ck None)
    ])
    # prefix marker over day -2 only (all cats), inclusive both sides
    p.range_tombs.append(RangeTomb((i32(-2),), True, (i32(-2),), True, 5000))
    # full-bound marker between (0, a) exclusive and (3, a) exclusive
    p.range_tombs.append(RangeTomb((i32(0), b"a"), False, (i32(3), b"a"), False, 6000))
    p.ck_tombs.append(((i32(9), b"z"), 7000))  # no row -> degenerate pair
    p.static_tomb_ts = 8000
    w.add(p)
    # partition with ONLY a static deletion (deletion-only static row)
    p2 = Partition(key=b"k2", static_tomb_ts=4000)
    w.add(p2)
    w.finish()

    got = {p.key: p for _t, p in MA.MaReader(d, 1).partitions()}
    k1 = got[b"k1"]
    assert k1.row_tomb_ts is None
    assert k1.static_tomb_ts == 8000
    assert got[b"k2"].static_tomb_ts == 4000 and got[b"k2"].cells == []
    # cells come back with composite ck, in typed (day, cat) order
    cks = [c.ck for c in k1.cells if c.ck is not None]
    assert cks == [
        encode_composite([i32(-2), b"a"]),
        encode_composite([i32(0), b"b"]),
        encode_composite([i32(3), b"a"]),
    ]
    statics = [c for c in k1.cells if c.ck is None]
    assert [(c.col_name, c.value) for c in statics] == [("s", b"st")]
    # markers come back with composite (possibly prefix) bounds
    rts = sorted(k1.range_tombs, key=lambda r: r.ts)
    assert rts[0] == RangeTomb(
        encode_composite([i32(-2)]), True, encode_composite([i32(-2)]), True, 5000
    )
    assert rts[1] == RangeTomb(
        encode_composite([i32(0), b"a"]), False,
        encode_composite([i32(3), b"a"]), False, 6000,
    )
    assert rts[2] == RangeTomb(
        encode_composite([i32(9), b"z"]), True,
        encode_composite([i32(9), b"z"]), True, 7000,
    )


def test_multi_ck_typed_cover_via_spark(spark, tmp_path):
    """End-to-end typed cover: a two-ck (signed Int32, UTF8) table read
    through the DataSource and merged with clustered_live_cells.  A
    byte-order comparator would misplace the negative days (0xFF.. >
    0x00..) and mis-resolve the prefix marker; typed sort keys must
    kill exactly days -2..0 across ALL cats, the full-bound range, the
    statics under the static-row deletion, and nothing else."""
    import struct as _s

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sources.sstable.datasource import register
    from cassandra2aerospike_spark.sources.sstable.format import RangeTomb

    i32 = lambda v: _s.pack(">i", v)  # noqa: E731
    d = str(tmp_path / "ksm" / "tabm")
    w = MA.MaWriter(
        d, 1, [("v", "UTF8Type")],
        clustering=["Int32Type", "UTF8Type"],
        static_columns=[("s", "UTF8Type")],
    )
    p = Partition(key=b"k1", cells=[
        Cell("v", b"m3", ts=100, ck=(i32(-3), b"a")),
        Cell("v", b"m2", ts=100, ck=(i32(-2), b"b")),   # killed (prefix rng)
        Cell("v", b"m1", ts=100, ck=(i32(-1), b"a")),   # killed (prefix rng)
        Cell("v", b"z", ts=100, ck=(i32(0), b"q")),     # killed (prefix rng)
        Cell("v", b"p1", ts=100, ck=(i32(1), b"a")),
        Cell("v", b"p1b", ts=100, ck=(i32(1), b"b")),   # killed (full rng)
        Cell("v", b"p2", ts=9999, ck=(i32(2), b"a")),   # survives: newer ts
        Cell("s", b"oldstatic", ts=100),                 # killed (static del)
        Cell("s", b"newstatic", ts=9000),                # survives: newer
    ])
    # prefix marker: days [-2, 0] inclusive, every cat
    p.range_tombs.append(RangeTomb((i32(-2),), True, (i32(0),), True, 500))
    # full-bound marker: ((1,a), (2,z)] — kills (1,b) and would kill
    # (2,a) except its ts is newer
    p.range_tombs.append(RangeTomb((i32(1), b"a"), False, (i32(2), b"z"), True, 500))
    p.static_tomb_ts = 800
    w.add(p)
    w.finish()
    register(spark)
    raw = spark.read.format("sstable_run").option("layout", "ma").load(d)
    live = {
        (r.value, r.ts): r.ck for r in merge.clustered_live_cells(raw).collect()
    }
    assert set(live) == {
        (b"m3", 100), (b"p1", 100), (b"p2", 9999), (b"newstatic", 9000)
    }
    assert live[(b"newstatic", 9000)] is None


def test_multi_ck_pointwise_cover_property(tmp_path):
    """Property over random PREFIX + FULL bounds on a 2-ck (Int32,
    UTF8) table: the cover computed from the writer's normalized
    on-disk markers — read back from real bytes and evaluated with the
    SAME truncate-and-compare predicate clustered_live_cells uses on
    sort keys — equals direct Cassandra bound semantics on every grid
    cell.  This pins writer sweep + reader decode + merge predicate to
    one another AND to the spec, including negative days and
    before/after-extension prefix ordering."""
    import random
    import struct as _s

    from cassandra2aerospike_spark.sources.sstable.format import RangeTomb

    i32 = lambda v: _s.pack(">i", v)  # noqa: E731
    days = list(range(-3, 4))
    cats = [b"a", b"b", b"c"]
    key_of = MA.make_ck_key_fn(["Int32Type", "UTF8Type"])
    from cassandra2aerospike_spark.sources.sstable.format import encode_composite

    def spec_covered(r, d, c):
        # direct Cassandra semantics on the ORIGINAL (pre-normalize)
        # range: prefix bound compares day only, full bound the tuple
        (sd, sc), si, (ed, ec), ei = r.start, r.start_incl, r.end, r.end_incl
        if sc is None:
            lo = d > sd or (si and d == sd)
        else:
            lo = d > sd or (d == sd and (c > sc or (si and c == sc)))
        if ec is None:
            hi = d < ed or (ei and d == ed)
        else:
            hi = d < ed or (d == ed and (c < ec or (ei and c == ec)))
        return lo and hi

    def merge_covered(rt, cell_key):
        # the clustered_live_cells predicate, in Python: truncate the
        # cell's sort key to the bound's length, compare, equality only
        # counts when inclusive
        s, si = (key_of(rt.start), rt.start_incl)
        e, ei = (key_of(rt.end), rt.end_incl)
        ps, pe = cell_key[: len(s)], cell_key[: len(e)]
        lo = s is None or ps > s or (si and ps == s)
        hi = e is None or pe < e or (ei and pe == e)
        return lo and hi

    rng = random.Random(22)
    for trial in range(25):
        ranges = []
        for _ in range(rng.randrange(1, 5)):
            a, b = sorted(rng.sample(days, 2))
            ts = rng.randrange(1, 5) * 1000
            if rng.random() < 0.5:  # prefix bounds (day only)
                ranges.append(
                    RangeTomb((a, None), rng.random() < 0.5,
                              (b, None), rng.random() < 0.5, ts)
                )
            else:  # full bounds
                ranges.append(
                    RangeTomb((a, rng.choice(cats)), rng.random() < 0.5,
                              (b, rng.choice(cats)), rng.random() < 0.5, ts)
                )
        d = str(tmp_path / f"prop{trial}")
        w = MA.MaWriter(d, 1, [("v", "UTF8Type")],
                        clustering=["Int32Type", "UTF8Type"])
        p = Partition(key=b"k", cells=[
            Cell("v", b"x", ts=100, ck=(i32(dd), cc))
            for dd in days for cc in cats
        ])
        for r in ranges:
            (sd, sc), (ed, ec) = r.start, r.end
            p.range_tombs.append(RangeTomb(
                (i32(sd),) if sc is None else (i32(sd), sc), r.start_incl,
                (i32(ed),) if ec is None else (i32(ed), ec), r.end_incl, r.ts,
            ))
        w.add(p)
        w.finish()
        (_t, got), = MA.MaReader(d, 1).partitions()
        for dd in days:
            for cc in cats:
                cell_key = key_of(encode_composite([i32(dd), cc]))
                want = max(
                    (r.ts for r in ranges if spec_covered(r, dd, cc)),
                    default=None,
                )
                have = max(
                    (rt.ts for rt in got.range_tombs
                     if merge_covered(rt, cell_key)),
                    default=None,
                )
                assert have == want, (trial, dd, cc, ranges, got.range_tombs)


def test_complex_collection_roundtrip(tmp_path):
    """Map/set/list multi-cell columns: cell paths, per-path versions,
    complex deletions (incl. LIVE blocks under HAS_COMPLEX_DELETION and
    deletion-only rows), and a simple column in the same row all
    round-trip through writer -> reader.  The reference cannot read
    this table at all (HAS_COMPLEX_DELETION declared at SSTable.hpp:120
    but the complex-cell block grammar is never parsed)."""
    d = str(tmp_path / "ks" / "coll")
    w = MA.MaWriter(d, 1, [
        ("score", "UTF8Type"),
        ("metrics", "MapType(UTF8Type,UTF8Type)"),
        ("tags", "SetType(UTF8Type)"),
        ("log", "ListType(UTF8Type)"),
    ])
    p = Partition(key=b"k1", cells=[
        Cell("score", b"9.5", ts=100),
        Cell("metrics", b"1.5", ts=101, path=b"click"),
        Cell("metrics", b"2.5", ts=102, path=b"view"),
        Cell("metrics", b"3.5", ts=205, path=b"click"),  # 2nd version
        Cell("metrics", b"", ts=106, path=b"gone", deleted=True),
        Cell("tags", b"", ts=103, path=b"hot"),
        Cell("log", b"first", ts=104, path=b"\x01" * 16),
    ])
    p.complex_tombs.append((None, "metrics", 150))
    w.add(p)
    p2 = Partition(key=b"k2")  # deletion-only complex row
    p2.complex_tombs.append((None, "tags", 999))
    w.add(p2)
    w.finish()

    r = MA.MaReader(d, 1)
    assert dict(r.stats.schema.regular_columns)["metrics"] == "MapType(UTF8Type,UTF8Type)"
    got = {p.key: p for _t, p in r.partitions()}
    k1 = got[b"k1"]
    assert k1.complex_tombs == [(None, "metrics", 150)]
    assert got[b"k2"].complex_tombs == [(None, "tags", 999)]
    assert got[b"k2"].cells == []
    cells = {(c.col_name, c.path, c.ts): (c.value, c.deleted) for c in k1.cells}
    assert cells[("metrics", b"click", 101)] == (b"1.5", False)
    assert cells[("metrics", b"click", 205)] == (b"3.5", False)
    assert cells[("metrics", b"gone", 106)] == (b"", True)
    assert cells[("tags", b"hot", 103)] == (b"", False)
    assert cells[("log", b"\x01" * 16, 104)] == (b"first", False)
    assert cells[("score", None, 100)] == (b"9.5", False)


def test_collection_merge_via_spark(spark, tmp_path):
    """collection_live_cells over the DataSource read: complex deletion
    clears older paths, single-entry removal kills one path, survivors
    LWW per path; a datasource-writer roundtrip with a column spec
    preserves the collection structure."""
    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sources.sstable.datasource import register

    d = str(tmp_path / "ks" / "collq")
    w = MA.MaWriter(d, 1, [("m", "MapType(UTF8Type,UTF8Type)")])
    p = Partition(key=b"7", cells=[
        Cell("m", b"old", ts=100, path=b"a"),     # killed by complex del
        Cell("m", b"new", ts=300, path=b"a"),     # survives (ts > 200)
        Cell("m", b"x", ts=250, path=b"b"),       # killed by point del
        Cell("m", b"", ts=260, path=b"b", deleted=True),
        Cell("m", b"keep", ts=150, path=b"c"),    # hmm: ts <= 200 -> killed
    ])
    p.complex_tombs.append((None, "m", 200))
    w.add(p)
    w.finish()
    register(spark)
    raw = spark.read.format("sstable_run").option("layout", "ma").load(d)
    live = {(r.path, r.value) for r in merge.collection_live_cells(raw).collect()}
    assert live == {(b"a", b"new")}

    # roundtrip through the datasource writer with an explicit spec
    out = str(tmp_path / "out")
    raw.select(
        "key", "col_name", "ck", "value", "ts", "ttl", "expiration",
        "deleted", "range_tomb", "row_tomb_ts", "ck_end", "incl_mask", "path",
    ).write.format("sstable_run").option("layout", "ma").option(
        "columns", "m:MapType(UTF8Type,UTF8Type)"
    ).mode("append").save(out)
    raw2 = spark.read.format("sstable_run").option("layout", "ma").load(out)
    live2 = {(r.path, r.value) for r in merge.collection_live_cells(raw2).collect()}
    assert live2 == {(b"a", b"new")}


def test_complex_truncation_fails_uniformly(tmp_path):
    """Cut a collection-bearing logical stream at every byte: ValueError
    (or a shorter prefix), never IndexError/struct.error — the codec
    discipline extended to the complex-cell block grammar."""
    d = str(tmp_path / "trunc_cx")
    w = MA.MaWriter(d, 1, [
        ("m", "MapType(UTF8Type,UTF8Type)"), ("s", "SetType(UTF8Type)"),
    ])
    p = Partition(key=b"k1", cells=[
        Cell("m", b"v1", ts=100, path=b"a"),
        Cell("m", b"", ts=120, path=b"b", deleted=True),
        Cell("s", b"", ts=110, path=b"x"),
    ])
    p.complex_tombs.append((None, "m", 150))
    w.add(p)
    w.finish()
    r = MA.MaReader(d, 1)
    full = r._logical_data()
    for cut in range(len(full)):
        rr = MA.MaReader(d, 1)
        rr._logical_data = lambda buf=full[:cut]: buf
        try:
            list(rr.partitions())
        except ValueError:
            pass  # uniform failure mode


def test_promoted_index_blocks_and_window(tmp_path):
    """A wide partition (row area > promoted_threshold) writes a
    promoted index — block offsets at row starts + the header deletion
    time (the RowIndexEntry design) — and partition_window() decodes
    each block independently; the union of blocks equals the whole
    partition, and ordinary partitions keep empty promoted entries."""
    d = str(tmp_path / "ks" / "wide")
    w = MA.MaWriter(d, 1, [("v", "UTF8Type")], clustering=["UTF8Type"],
                    promoted_threshold=256)
    big = Partition(key=b"big", row_tomb_ts=500, cells=[
        Cell("v", b"x%03d" % i, ts=1000 + i, ck=b"ck%04d" % i)
        for i in range(200)
    ])
    small = Partition(key=b"small", cells=[Cell("v", b"y", ts=5, ck=b"c")])
    w.add(big)
    w.add(small)
    w.finish()

    r = MA.MaReader(d, 1)
    ordered = list(r.index_entries_full())
    entries = {k: (pos, pr) for k, pos, pr in ordered}
    assert entries[b"small"][1] is None
    row_tomb, blocks = entries[b"big"][1]
    assert row_tomb == 500 and len(blocks) > 2
    pos = entries[b"big"][0]
    later = [p for _k, p, _pr in ordered if p > pos]
    end = min(later) if later else r.logical_length()
    all_cells = []
    for j, b in enumerate(blocks):
        hi = pos + blocks[j + 1] if j + 1 < len(blocks) else end
        tok, p = r.partition_window(b"big", row_tomb, pos + b, hi)
        assert tok == MA.murmur3_token(b"big")
        assert p.row_tomb_ts == 500
        all_cells += [(c.ck, c.value, c.ts) for c in p.cells]
    whole = {pp.key: pp for _t, pp in r.partitions()}[b"big"]
    assert all_cells == [(c.ck, c.value, c.ts) for c in whole.cells]


def test_wide_partition_datasource_split(spark, tmp_path):
    """End-to-end: a directory whose sstable holds one WIDE partition
    plans one InputPartition per promoted block (plus range slices for
    the small partitions), and the merged result is IDENTICAL to the
    same content written without a promoted index — one giant partition
    no longer pins a single task."""
    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
        register,
    )

    def build(dirname, thr):
        d = str(tmp_path / dirname / "tmx" / "widet")
        w = MA.MaWriter(d, 1, [("v", "UTF8Type")], clustering=["UTF8Type"],
                        promoted_threshold=thr)
        big = Partition(key=b"big", cells=[
            Cell("v", b"x%03d" % i, ts=1000 + i, ck=b"ck%04d" % i)
            for i in range(400)
        ])
        # a range tombstone covering ck0000..ck0049 — cover must hold
        # even when marker and covered rows land in different blocks
        from cassandra2aerospike_spark.sources.sstable.format import RangeTomb
        big.range_tombs.append(RangeTomb(b"ck0000", True, b"ck0049", True, 9999))
        w.add(big)
        for k in range(5):
            w.add(Partition(key=b"s%d" % k, cells=[
                Cell("v", b"y", ts=5 + k, ck=b"c")
            ]))
        w.finish()
        return d

    d_wide = build("wide", 512)
    d_flat = build("flat", 0)
    # fixture-scale slice target (production default 64 MB would ride
    # this small partition in a range slice — see wide_slice_bytes)
    rdr = SSTableRunReader(
        {"path": d_wide, "layout": "ma", "wide_slice_bytes": "1024"}
    )
    slices = rdr.partitions()
    assert sum(1 for s in slices if s.block is not None) > 2  # real fan-out
    register(spark)

    def merged(path):
        raw = (
            spark.read.format("sstable_run")
            .option("layout", "ma")
            .option("wide_slice_bytes", "1024")
            .load(path)
        )
        return {
            (r.key, r.ck, r.value, r.ts)
            for r in merge.clustered_live_cells(raw).collect()
        }

    got, want = merged(d_wide), merged(d_flat)
    assert got == want
    assert len(got) == 350 + 5  # 50 cks killed by the marker


# ------------------------------------------------- round 8: UDT columns


def test_udt_marshal_parse_and_value_fmt():
    """UserType marshal strings: field types parse by index, the cell
    path (2-byte BE field position) selects the value wire format, and
    frozen variants (FrozenType wrapper — Cassandra's toString marks
    frozen iff !isMultiCell) plus always-frozen tuples stay SIMPLE."""
    udt = "UserType(ks,61646472,737472656574:UTF8Type,7a6970:Int32Type,6c61743a:DoubleType)"
    assert MA.is_complex_fmt(udt)
    assert MA.udt_field_types(udt) == ["UTF8Type", "Int32Type", "DoubleType"]
    assert MA.complex_value_fmt(udt, b"\x00\x00") == "UTF8Type"
    assert MA.complex_value_fmt(udt, b"\x00\x02") == "DoubleType"
    with pytest.raises(ValueError):
        MA.complex_value_fmt(udt, b"\x00\x03")
    # nested parametrized field type splits at top level
    nested = "UserType(ks,6e,61:MapType(UTF8Type,Int32Type),62:UTF8Type)"
    assert MA.udt_field_types(nested) == ["MapType(UTF8Type,Int32Type)", "UTF8Type"]
    assert not MA.is_complex_fmt(f"FrozenType({udt})")
    assert not MA.is_complex_fmt("TupleType(Int32Type,UTF8Type)")
    # the marshal package prefix round-trips through the header codec
    full = MA.MaSchema._marshal_name(udt)
    assert full.count(MA._MARSHAL) == 4  # UserType + 3 field types
    s = MA.MaSchema(regular_columns=[("u", udt)])
    assert MA.MaSchema.decode(s.encode(), 0).regular_columns == [("u", udt)]


def test_udt_roundtrip(tmp_path):
    """Non-frozen UDT columns: field-index cell paths, per-field typed
    values (fixed AND variable width), complex (whole-UDT overwrite)
    deletions, and frozen-UDT / tuple blob columns in the same rows all
    round-trip writer -> reader.  The reference misparses this table the
    same way it misparses collections (SSTable.hpp:120)."""
    udt = "UserType(ks,61646472,737472656574:UTF8Type,7a6970:Int32Type)"
    d = str(tmp_path / "ks" / "udt")
    w = MA.MaWriter(d, 1, [
        ("addr", udt),
        ("faddr", f"FrozenType({udt})"),
        ("pair", "TupleType(Int32Type,UTF8Type)"),
    ])
    f0, f1 = b"\x00\x00", b"\x00\x01"
    i32 = struct.pack(">i", -7)
    p = Partition(key=b"k1", cells=[
        Cell("addr", b"main st", ts=100, path=f0),
        Cell("addr", i32, ts=100, path=f1),
        Cell("addr", b"broad st", ts=300, path=f0),     # 2nd version
        Cell("addr", b"", ts=150, path=f1, deleted=True),
        Cell("faddr", b"frozen-blob-bytes", ts=100),
        Cell("pair", b"tuple-blob", ts=100),
    ])
    p.complex_tombs.append((None, "addr", 200))
    w.add(p)
    w.finish()

    r = MA.MaReader(d, 1)
    assert dict(r.stats.schema.regular_columns)["addr"] == udt
    (_t, got), = r.partitions()
    assert got.complex_tombs == [(None, "addr", 200)]
    cells = {(c.col_name, c.path, c.ts): (c.value, c.deleted) for c in got.cells}
    assert cells[("addr", f0, 100)] == (b"main st", False)
    assert cells[("addr", f1, 100)] == (i32, False)
    assert cells[("addr", f0, 300)] == (b"broad st", False)
    assert cells[("addr", f1, 150)] == (b"", True)
    assert cells[("faddr", None, 100)] == (b"frozen-blob-bytes", False)
    assert cells[("pair", None, 100)] == (b"tuple-blob", False)


def test_udt_merge_via_spark(spark, tmp_path):
    """collection_live_cells reconciles UDT cells per (key, column,
    field-index path) across sstables: a whole-UDT overwrite (complex
    deletion + new field cells) hides older fields, a single-field
    tombstone kills one path, LWW picks the newest field version."""
    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sources.sstable.datasource import register

    udt = "UserType(ks,61646472,737472656574:UTF8Type,7a6970:Int32Type)"
    d = str(tmp_path / "ks" / "udtq")
    f0, f1 = b"\x00\x00", b"\x00\x01"
    w = MA.MaWriter(d, 1, [("u", udt)])
    w.add(Partition(key=b"7", cells=[
        Cell("u", b"old", ts=100, path=f0),
        Cell("u", struct.pack(">i", 1), ts=100, path=f1),
    ]))
    w.finish()
    w2 = MA.MaWriter(d, 2, [("u", udt)])
    p = Partition(key=b"7", cells=[
        Cell("u", b"new", ts=300, path=f0),           # the overwrite
        Cell("u", b"", ts=310, path=f1, deleted=True),  # field tombstone
    ])
    p.complex_tombs.append((None, "u", 200))
    w2.add(p)
    w2.finish()
    register(spark)
    raw = spark.read.format("sstable_run").option("layout", "ma").load(d)
    live = {(r.path, r.value) for r in merge.collection_live_cells(raw).collect()}
    assert live == {(f0, b"new")}


# -------------------------------------- round 8: ReversedType (DESC ck)


def test_reversed_component_key_orders():
    """component_frame under ReversedType: byte order of frames is the
    EXACT reverse of typed order, including variable-width prefixes
    ('abc' before 'ab' in DESC — bare complement gets this wrong) and
    signed numerics."""
    i32 = lambda v: struct.pack(">i", v)  # noqa: E731
    asc_days = [i32(v) for v in (-5, -1, 0, 1, 7)]
    desc = [MA.component_frame("ReversedType(Int32Type)", b) for b in asc_days]
    assert desc == sorted(desc, reverse=True)
    texts = [b"a", b"ab", b"abc", b"b"]
    dframes = [MA.component_frame("ReversedType(UTF8Type)", t) for t in texts]
    order = [t for _f, t in sorted(zip(dframes, texts))]
    assert order == [b"b", b"abc", b"ab", b"a"]
    # single-ck key fn: DESC and variable-width ASC both framed; the
    # frame keeps truncate-and-compare exact on prefix-shaped values
    key_asc = MA.make_ck_key_fn(["UTF8Type"])
    assert key_asc(b"ab") != key_asc(b"abc")[: len(key_asc(b"ab"))]
    key_desc = MA.make_ck_key_fn(["ReversedType(Int32Type)"])
    ks = [key_desc(b) for b in asc_days]
    assert ks == sorted(ks, reverse=True)


def test_reversed_ck_roundtrip_and_cover(tmp_path):
    """A DESC-day clustered table (ReversedType(Int32Type), UTF8Type):
    rows lay out in descending day order, a positional range marker
    [day=3 .. day=1] (start = the LARGEST day — position order) covers
    exactly days 1..3, and reading back through make_ck_key_fn keeps
    the truncate-and-compare cover correct for prefix bounds."""
    from cassandra2aerospike_spark.sources.sstable.format import (
        RangeTomb,
        encode_composite,
    )

    i32 = lambda v: struct.pack(">i", v)  # noqa: E731
    clustering = ["ReversedType(Int32Type)", "UTF8Type"]
    d = str(tmp_path / "ks" / "revck")
    w = MA.MaWriter(d, 1, [("v", "UTF8Type")], clustering=clustering)
    p = Partition(key=b"k", cells=[
        Cell("v", str(day).encode(), ts=100, ck=(i32(day), b"a"))
        for day in (-2, 0, 1, 2, 3, 5)
    ])
    # prefix marker in POSITION order: with day DESC the positionally
    # smaller bound is the larger day
    p.range_tombs.append(RangeTomb((i32(3),), True, (i32(1),), True, 500))
    w.add(p)
    w.finish()

    (_t, got), = MA.MaReader(d, 1).partitions()
    key_of = MA.make_ck_key_fn(clustering)
    # writer layout: descending day
    days_in_order = [
        struct.unpack(">i", c.ck[2:6])[0]
        for c in got.cells
    ]
    assert days_in_order == [5, 3, 2, 1, 0, -2]

    def covered(cell_ck):
        ck = key_of(cell_ck)
        hit = False
        for rt in got.range_tombs:
            s, e = key_of(rt.start), key_of(rt.end)
            ps, pe = ck[: len(s)], ck[: len(e)]
            lo = ps > s or (rt.start_incl and ps == s)
            hi = pe < e or (rt.end_incl and pe == e)
            hit = hit or (lo and hi)
        return hit

    for day in (-2, 0, 1, 2, 3, 5):
        want = 1 <= day <= 3
        assert covered(encode_composite([i32(day), b"a"])) == want, day


def test_udt_schema_evolution_per_generation_headers(tmp_path):
    """UDT SCHEMA EVOLUTION (VERDICT r08 task 7): two generations of one
    table span an `ALTER TYPE ... ADD` — gen 1's header declares the
    2-field UDT, gen 2's the 3-field one.  Each file must decode its
    cells against its OWN header: the same field-1 path is Int32 in
    both, but a field-2 path exists only under gen 2's type, and gen 1
    decoded under gen 2's header (or vice versa) would mis-dispatch.
    This pins udt_field_types/complex_value_fmt as PER-FILE facts."""
    v1 = "UserType(ks,61646472,63697479:UTF8Type,7a6970:Int32Type)"
    v2 = "UserType(ks,61646472,63697479:UTF8Type,7a6970:Int32Type,6e6f7465:UTF8Type)"
    d = str(tmp_path / "ks" / "evo")
    f0, f1, f2 = b"\x00\x00", b"\x00\x01", b"\x00\x02"

    w1 = MA.MaWriter(d, 1, [("addr", v1)])
    w1.add(Partition(key=b"k1", cells=[
        Cell("addr", b"old town", ts=100, path=f0),
        Cell("addr", struct.pack(">i", 11), ts=100, path=f1),
    ]))
    w1.finish()
    w2 = MA.MaWriter(d, 2, [("addr", v2)])
    w2.add(Partition(key=b"k1", cells=[
        Cell("addr", b"new town", ts=200, path=f0),
        Cell("addr", struct.pack(">i", 22), ts=200, path=f1),
        Cell("addr", b"added by ALTER", ts=200, path=f2),
    ]))
    w2.finish()

    r1, r2 = MA.MaReader(d, 1), MA.MaReader(d, 2)
    assert dict(r1.stats.schema.regular_columns)["addr"] == v1
    assert dict(r2.stats.schema.regular_columns)["addr"] == v2
    assert MA.udt_field_types(v1) == ["UTF8Type", "Int32Type"]
    assert MA.udt_field_types(v2) == ["UTF8Type", "Int32Type", "UTF8Type"]

    (_t1, p1), = r1.partitions()
    (_t2, p2), = r2.partitions()
    got1 = {(c.path, c.ts): c.value for c in p1.cells}
    got2 = {(c.path, c.ts): c.value for c in p2.cells}
    assert got1 == {
        (f0, 100): b"old town",
        (f1, 100): struct.pack(">i", 11),
    }
    assert got2 == {
        (f0, 200): b"new town",
        (f1, 200): struct.pack(">i", 22),
        (f2, 200): b"added by ALTER",
    }
    # a field-2 path under the PRE-ALTER type is a loud error, not a
    # silent misparse (and so is a malformed/missing path anywhere)
    with pytest.raises(ValueError):
        MA.complex_value_fmt(v1, f2)
    with pytest.raises(ValueError):
        MA.complex_value_fmt(v2, b"")
    with pytest.raises(ValueError):
        MA.complex_value_fmt(v2, None)
    with pytest.raises(ValueError):
        MA.complex_value_fmt(v2, b"\x00\x00\x01")


def test_multi_ck_pointwise_cover_property_reversed(tmp_path):
    """The pointwise-cover property under a RANDOM ReversedType mask
    (VERDICT r08 task 6): each trial draws a DESC/ASC direction per
    clustering component, writes random prefix/full markers in POSITION
    order through the real writer, reads the normalized markers back
    from bytes, and checks the truncate-and-compare cover on sort keys
    equals direct Cassandra bound semantics (per-component direction-
    aware comparison) on every grid cell.  Pins complement-AFTER-framing
    as a property — a bare byte complement misorders variable-width
    prefixes, and a mask-unaware sweep misplaces every marker."""
    import random
    import struct as _s

    from cassandra2aerospike_spark.sources.sstable.format import (
        RangeTomb,
        encode_composite,
    )

    i32 = lambda v: _s.pack(">i", v)  # noqa: E731
    days = list(range(-3, 4))
    cats = [b"a", b"b", b"c"]

    def cmp_pos(x, y, desc):
        """-1/0/1 in POSITION space for one component."""
        if x == y:
            return 0
        lt = x < y
        if desc:
            lt = not lt
        return -1 if lt else 1

    rng = random.Random(26)
    for trial in range(25):
        desc_day, desc_cat = rng.random() < 0.5, rng.random() < 0.5
        spec = [
            "ReversedType(Int32Type)" if desc_day else "Int32Type",
            "ReversedType(UTF8Type)" if desc_cat else "UTF8Type",
        ]
        key_of = MA.make_ck_key_fn(spec)

        def spec_covered(r, d, c):
            (sd, sc), si, (ed, ec), ei = r.start, r.start_incl, r.end, r.end_incl
            cd = cmp_pos(d, sd, desc_day)
            if sc is None:
                lo = cd > 0 or (si and cd == 0)
            else:
                cc = cmp_pos(c, sc, desc_cat)
                lo = cd > 0 or (cd == 0 and (cc > 0 or (si and cc == 0)))
            cd = cmp_pos(d, ed, desc_day)
            if ec is None:
                hi = cd < 0 or (ei and cd == 0)
            else:
                cc = cmp_pos(c, ec, desc_cat)
                hi = cd < 0 or (cd == 0 and (cc < 0 or (ei and cc == 0)))
            return lo and hi

        def merge_covered(rt, cell_key):
            s, si = key_of(rt.start), rt.start_incl
            e, ei = key_of(rt.end), rt.end_incl
            ps, pe = cell_key[: len(s)], cell_key[: len(e)]
            lo = ps > s or (si and ps == s)
            hi = pe < e or (ei and pe == e)
            return lo and hi

        ranges = []
        for _ in range(rng.randrange(1, 5)):
            a, b = sorted(rng.sample(days, 2))
            # positional order: under DESC day the larger day is FIRST
            sd, ed = (b, a) if desc_day else (a, b)
            ts = rng.randrange(1, 5) * 1000
            if rng.random() < 0.5:  # prefix bounds (day only)
                ranges.append(RangeTomb((sd, None), rng.random() < 0.5,
                                        (ed, None), rng.random() < 0.5, ts))
            else:  # full bounds (days distinct, so day decides position)
                ranges.append(RangeTomb((sd, rng.choice(cats)), rng.random() < 0.5,
                                        (ed, rng.choice(cats)), rng.random() < 0.5, ts))
        d = str(tmp_path / f"rprop{trial}")
        w = MA.MaWriter(d, 1, [("v", "UTF8Type")], clustering=spec)
        p = Partition(key=b"k", cells=[
            Cell("v", b"x", ts=100, ck=(i32(dd), cc))
            for dd in days for cc in cats
        ])
        for r in ranges:
            (sd, sc), (ed, ec) = r.start, r.end
            p.range_tombs.append(RangeTomb(
                (i32(sd),) if sc is None else (i32(sd), sc), r.start_incl,
                (i32(ed),) if ec is None else (i32(ed), ec), r.end_incl, r.ts,
            ))
        w.add(p)
        w.finish()
        (_t, got), = MA.MaReader(d, 1).partitions()
        for dd in days:
            for cc in cats:
                cell_key = key_of(encode_composite([i32(dd), cc]))
                want = max(
                    (r.ts for r in ranges if spec_covered(r, dd, cc)),
                    default=None,
                )
                have = max(
                    (rt.ts for rt in got.range_tombs
                     if merge_covered(rt, cell_key)),
                    default=None,
                )
                assert have == want, (
                    trial, (desc_day, desc_cat), dd, cc, ranges, got.range_tombs
                )


def test_nb_era_four_section_statistics_and_digest(tmp_path):
    """A version >= "na" (Cassandra 4.x) sstable carries the 4-section
    Statistics.db TOC — VALIDATION, COMPACTION (HLL blob), STATS (the
    nb StatsMetadata with pendingRepair/isTransient/originatingHostId
    trailing fields), HEADER — plus a Digest.crc32 sidecar.  The reader
    must resolve VALIDATION/HEADER by TOC offset (never sequentially)
    and decode cells identically to an ma file; a 3.x file must keep
    the 2-section shape."""
    import os as _os
    import zlib as _z

    d = str(tmp_path / "ks" / "t4")
    for ver, gen in (("nb", 1), ("ma", 2)):
        w = MA.MaWriter(d, gen, [("v", "UTF8Type")], version=ver)
        w.add(Partition(key=b"k1", cells=[Cell("v", b"x", ts=100)]))
        w.finish()

    st_nb = open(_os.path.join(d, "nb-1-big-Statistics.db"), "rb").read()
    st_ma = open(_os.path.join(d, "ma-2-big-Statistics.db"), "rb").read()
    (n_nb,) = struct.unpack_from(">i", st_nb, 0)
    (n_ma,) = struct.unpack_from(">i", st_ma, 0)
    assert (n_nb, n_ma) == (4, 2)
    types_nb = [struct.unpack_from(">ii", st_nb, 4 + 8 * i)[0] for i in range(4)]
    assert types_nb == [
        MA.META_DATA_VALIDATION, MA.META_DATA_COMPACTION,
        MA.META_DATA_STATS, MA.META_DATA_HEADER,
    ]

    digest = _os.path.join(d, "nb-1-big-Digest.crc32")
    data = open(_os.path.join(d, "nb-1-big-Data.db"), "rb").read()
    assert open(digest).read() == str(_z.crc32(data) & 0xFFFFFFFF)
    assert not _os.path.exists(_os.path.join(d, "ma-2-big-Digest.crc32"))

    # both decode through the one grammar, schema resolved via TOC
    for prefix, gen in (("nb-1-big", 1), ("ma-2-big", 2)):
        r = MA.MaReader(d, gen, prefix=prefix)
        assert dict(r.stats.schema.regular_columns)["v"] == "UTF8Type"
        (_t, p), = r.partitions()
        assert [(c.col_name, c.value, c.ts) for c in p.cells] == [("v", b"x", 100)]


def test_frozen_udt_inside_nonfrozen_map(tmp_path):
    """Nesting: a NON-frozen map whose VALUES are frozen UDTs —
    `map<text, frozen<addr>>`, a common real 3.x shape.  The map's
    complex block carries key-bytes cell paths; each value decodes as
    one frozen-UDT blob (FrozenType(...) is variable-width simple —
    the COLUMN_UNKNOWN vint-length treatment), and complex_value_fmt
    resolves the VALUE type of the map, not the UDT's fields."""
    udt = "UserType(ks,61646472,63697479:UTF8Type,7a6970:Int32Type)"
    fmt = f"MapType(UTF8Type,FrozenType({udt}))"
    assert MA.is_complex_fmt(fmt)
    assert MA.complex_value_fmt(fmt, b"home") == f"FrozenType({udt})"
    d = str(tmp_path / "ks" / "nest")
    w = MA.MaWriter(d, 1, [("addrs", fmt)])
    blob1, blob2 = b"\x00\x04city\x00\x00\x00\x07\x00\x04zip1", b"frozen-two"
    p = Partition(key=b"k1", cells=[
        Cell("addrs", blob1, ts=100, path=b"home"),
        Cell("addrs", blob2, ts=110, path=b"work"),
        Cell("addrs", b"", ts=120, path=b"old", deleted=True),
    ])
    p.complex_tombs.append((None, "addrs", 90))
    w.add(p)
    w.finish()
    r = MA.MaReader(d, 1)
    assert dict(r.stats.schema.regular_columns)["addrs"] == fmt
    (_t, got), = r.partitions()
    assert got.complex_tombs == [(None, "addrs", 90)]
    cells = {(c.path, c.ts): (c.value, c.deleted) for c in got.cells}
    assert cells[(b"home", 100)] == (blob1, False)  # blob byte-preserved
    assert cells[(b"work", 110)] == (blob2, False)
    assert cells[(b"old", 120)] == (b"", True)


# ------------------------------------------------ round 10: Filter.db bloom

def _bloom_table(tmp_path, dirname, keys, gen=1):
    d = str(tmp_path / dirname / "tmx" / "bloomt")
    w = MA.MaWriter(d, gen, [("v", "UTF8Type")])
    for i, k in enumerate(keys):
        w.add(Partition(key=k, cells=[Cell("v", b"x", ts=100 + i)]))
    w.finish()
    return d


def test_bloom_filter_roundtrip_and_fp_rate(tmp_path):
    """Filter.db shape: serialize/deserialize is byte-stable, every
    added key is admitted (zero false negatives), and the measured fp
    rate of a 0.01-sized filter sits near its design point."""
    from cassandra2aerospike_spark.sources.sstable.bloom import BloomFilter

    bf = BloomFilter.sized_for(1000, 0.01)
    keys = [b"key-%d" % i for i in range(1000)]
    for k in keys:
        bf.add(k)
    assert all(bf.might_contain(k) for k in keys)
    blob = bf.serialize()
    bf2 = BloomFilter.deserialize(blob)
    assert bf2.serialize() == blob
    assert all(bf2.might_contain(k) for k in keys)
    fp = sum(bf2.might_contain(b"other-%d" % i) for i in range(10_000))
    assert fp / 10_000 < 0.03  # designed 0.01, generous margin


def test_bloom_filter_malformed_fails_loudly(tmp_path):
    """Sidecar corruption discipline: a PRESENT-but-malformed Filter.db
    raises instead of silently pruning or admitting."""
    from cassandra2aerospike_spark.sources.sstable.bloom import BloomFilter

    bf = BloomFilter.sized_for(10, 0.01)
    bf.add(b"k")
    blob = bf.serialize()
    for bad in (blob[:4], blob[:-1], blob + b"\x00", b"\x00" * 8):
        with pytest.raises(ValueError):
            BloomFilter.deserialize(bad)
    d = _bloom_table(tmp_path, "mal", [b"a", b"b"])
    r = MA.MaReader(d, 1)
    with open(r.path("Filter"), "wb") as f:
        f.write(blob[:-1])
    with pytest.raises(ValueError):
        r.might_contain_key(b"a")


def test_writer_emits_filter_and_reader_consults_it(tmp_path):
    """MaWriter writes Filter.db beside every sstable; might_contain_key
    admits every real key, rejects (almost all) absent ones, and an
    ABSENT sidecar admits everything — a missing filter must never
    hide data (old-era files ship no engine filter)."""
    import os

    keys = [b"pk-%02d" % i for i in range(40)]
    d = _bloom_table(tmp_path, "wr", keys)
    r = MA.MaReader(d, 1)
    assert os.path.exists(r.path("Filter"))
    assert all(r.might_contain_key(k) for k in keys)
    rejected = sum(not r.might_contain_key(b"nope-%03d" % i) for i in range(200))
    assert rejected > 150  # bloom actually discriminates
    os.remove(r.path("Filter"))
    r2 = MA.MaReader(d, 1)
    assert r2.might_contain_key(b"whatever")  # absent sidecar: no pruning


def test_lookup_plan_bloom_prunes_sstables(tmp_path):
    """Planner O2 lookup: a directory of two disjoint-key sstables plans
    Index windows ONLY for files the bloom admits; a key absent from
    both generations plans zero slices; windows for adjacent matched
    partitions merge."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )

    d = _bloom_table(tmp_path, "lk", [b"a-%d" % i for i in range(30)], gen=1)
    w2 = MA.MaWriter(d, 2, [("v", "UTF8Type")])
    for i in range(30):
        w2.add(Partition(key=b"b-%d" % i, cells=[Cell("v", b"y", ts=500 + i)]))
    w2.finish()

    def plan(hexkeys):
        rdr = SSTableRunReader(
            {"path": d, "layout": "ma", "lookup_keys": ",".join(hexkeys)}
        )
        return rdr.partitions()

    # keys only in gen 1 -> gen 2 pruned entirely by its bloom
    slices = plan([b"a-3".hex(), b"a-7".hex()])
    assert slices and all(s.gen == 1 for s in slices)
    # round 11: lookup windows ride batched per-task window lists (at
    # most `lookup_slices` tasks per sstable), not one slice per window
    assert all(s.windows for s in slices)
    assert sum(len(s.windows) for s in slices) == 2  # non-adjacent keys
    # a key absent everywhere -> zero slices (both blooms prune);
    # bloom fp could in principle admit one, but 2x30-key filters at
    # 0.01 make this deterministic in practice for this fixed key
    assert plan([b"zz-not-here".hex()]) == []
    # one key per generation -> one window in each
    slices = plan([b"a-3".hex(), b"b-9".hex()])
    assert {s.gen for s in slices} == {1, 2}


def test_lookup_merge_equals_full_scan_restricted(spark, tmp_path):
    """End-to-end: the lookup-planned read merges to EXACTLY the full
    scan restricted to the looked-up keys — pruning and per-key windows
    are invisible to the result (LWW across generations included)."""
    from cassandra2aerospike_spark.sources.sstable.datasource import register

    d = _bloom_table(tmp_path, "e2e", [b"k-%d" % i for i in range(20)], gen=1)
    w2 = MA.MaWriter(d, 2, [("v", "UTF8Type")])
    # overlap: newer versions of half the keys
    for i in range(10):
        w2.add(Partition(key=b"k-%d" % i, cells=[Cell("v", b"new", ts=9000 + i)]))
    w2.finish()
    register(spark)
    want_keys = [b"k-3", b"k-5", b"k-17"]
    raw = (
        spark.read.format("sstable_run")
        .option("layout", "ma")
        .option("lookup_keys", ",".join(k.hex() for k in want_keys + [b"ghost"]))
        .load(d)
    )
    got = {(bytes(r.key), bytes(r.value), r.ts) for r in raw.collect()}
    full = (
        spark.read.format("sstable_run").option("layout", "ma").load(d).collect()
    )
    want = {
        (bytes(r.key), bytes(r.value), r.ts)
        for r in full
        if bytes(r.key) in set(want_keys)
    }
    assert got == want
    assert {k for k, _v, _t in got} == set(want_keys)


def test_oa_era_statistics_tail(tmp_path):
    """A 5.0 (oa) sstable: Statistics carries the oa STATS tail
    (partition-level-deletions marker, first/last keys, token-space
    coverage) after the nb fields, plus Digest.crc32 — and decodes
    through the same TOC-offset grammar as ma..nb (a sequential STATS
    reader would break; a TOC reader must not notice)."""
    import os

    d = str(tmp_path / "oa" / "tmx" / "t5")
    w = MA.MaWriter(d, 7, [("v", "UTF8Type")], version="oa")
    w.add(Partition(key=b"alpha", cells=[Cell("v", b"1", ts=10)]))
    w.add(Partition(key=b"beta", cells=[Cell("v", b"2", ts=20)]))
    w.finish()
    assert os.path.exists(os.path.join(d, "oa-7-big-Digest.crc32"))
    r = MA.MaReader(d, 7, prefix="oa-7-big")
    got = {p.key: p.cells[0].value for _t, p in r.partitions()}
    assert got == {b"alpha": b"1", b"beta": b"2"}
    # the STATS section really does carry the oa tail: locate it via the
    # TOC and check the firstKey/lastKey bytes are in there
    buf = open(r.path("Statistics"), "rb").read()
    (n,) = struct.unpack_from(">i", buf, 0)
    offs = dict(
        struct.unpack_from(">ii", buf, 4 + 8 * i) for i in range(n)
    )
    stats = buf[offs[MA.META_DATA_STATS]:]
    assert b"alpha" in stats and b"beta" in stats
