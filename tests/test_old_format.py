"""Real pre-``ma`` (Cassandra 2.x "big" old-era) SSTable format: golden
hand-built file, writer/reader roundtrips per version and codec, per-era
checksum disciplines, truncation/corruption uniformity, filename parsing
for both naming eras, and mixed-era directory dispatch (reference
grammar: SSTable.cpp:337-452 OldSStable, :26-38 version lattice,
:190-267 names, :275-333 Statistics; Buffer.cpp:183-424 chunk layer)."""

from __future__ import annotations

import os
import struct
import zlib

import pytest

from cassandra2aerospike_spark.sources.sstable import old_format as OLD
from cassandra2aerospike_spark.sources.sstable.format import (
    Cell,
    Partition,
    encode_composite,
)
from cassandra2aerospike_spark.sources.sstable.ma_format import (
    MaWriter,
    _enc_str16,
)

COLS = ["alpha", "beta", "gamma", "delta"]


def test_filename_parse_both_eras():
    # la+ naming: version leads (SSTable.cpp:190-199)
    assert OLD.parse_data_filename("la-3-big-Data.db") == (11 * 26, 3, "la-3-big")
    assert OLD.parse_data_filename("ma-1-big-Data.db") == (12 * 26, 1, "ma-1-big")
    # old naming: version in the third hyphen field (SSTable.cpp:202-218)
    assert OLD.parse_data_filename("tmx-events-ka-2-Data.db") == (
        10 * 26,
        2,
        "tmx-events-ka-2",
    )
    assert OLD.parse_data_filename("tmx-events-jb-7-Data.db") == (
        9 * 26 + 1,
        7,
        "tmx-events-jb-7",
    )
    # not versioned / not Data.db
    assert OLD.parse_data_filename("la-3-big-Index.db") is None
    assert OLD.parse_data_filename("whatever.db") is None
    # keyspace/table: from the NAME below la, from the PATH at la+
    assert OLD.old_keyspace_and_table(
        OLD.V_KA, "tmx-events-ka-2-Data.db", "/ignored"
    ) == ("tmx", "events")
    assert OLD.old_keyspace_and_table(OLD.V_LA, "la-3-big-Data.db", "/x/tmx/events") == (
        "tmx",
        "events",
    )


def test_checksum_spec_lattice():
    # SSTable.cpp:102-105: Adler32 jb..lz; pre-decompression check from jb
    assert OLD.checksum_spec(OLD.V_JA) == ("crc32", False)
    assert OLD.checksum_spec(OLD.V_JB) == ("adler32", True)
    assert OLD.checksum_spec(OLD.V_KA) == ("adler32", True)
    assert OLD.checksum_spec(OLD.V_LA) == ("adler32", True)


# ------------------------------------------------- golden hand-built file
# Bytes authored HERE from the reference reader's grammar (not by
# OldWriter) — pinning the reader against an independent derivation.


def _golden_ka_table(tmp_path) -> str:
    d = str(tmp_path / "golden")
    os.makedirs(d, exist_ok=True)

    def cell(name: bytes, flags: int, body: bytes) -> bytes:
        return _enc_str16(name) + bytes([flags]) + body

    def value(v: bytes) -> bytes:
        return struct.pack(">i", len(v)) + v

    data = bytearray()
    # -- partition k1: live, expiring, deleted, counter, composite, range
    data += _enc_str16(b"k1")
    data += struct.pack(">i", OLD.LIVE_LOCAL_DELETION)
    data += struct.pack(">q", OLD.LIVE_MARKED_FOR_DELETE)
    data += cell(b"a", 0x00, struct.pack(">q", 2_000_000) + value(b"va"))
    data += cell(
        b"b",
        OLD.EXPIRATION_MASK,
        struct.pack(">i", 120)  # ttl
        + struct.pack(">i", 900)  # expiration instant
        + struct.pack(">q", 2_000_500)
        + value(b"vb"),
    )
    data += cell(
        b"c",
        OLD.DELETION_MASK,
        struct.pack(">q", 2_001_000) + value(struct.pack(">i", 2)),
    )
    data += cell(
        b"d",
        OLD.COUNTER_MASK,
        struct.pack(">q", 77)  # counter timestamp (parsed, dropped)
        + struct.pack(">q", 2_002_000)
        + value(struct.pack(">q", 5)),
    )
    # composite path: unwrap must keep the LAST component
    data += cell(
        encode_composite([b"tmx", b"cols", b"e"]),
        0x00,
        struct.pack(">q", 2_003_000) + value(b"ve"),
    )
    # range tombstone: end name + localDeletion + ts (SSTable.cpp:416-423)
    data += cell(
        b"f",
        OLD.RANGE_TOMBSTONE_MASK,
        _enc_str16(b"g") + struct.pack(">i", 3) + struct.pack(">q", 2_004_000),
    )
    data += struct.pack(">H", 0)  # empty name terminates (>= ja)
    # -- partition k2: row tombstone, no cells
    data += _enc_str16(b"k2")
    data += struct.pack(">i", 3)
    data += struct.pack(">q", 3_000_000)
    data += struct.pack(">H", 0)

    # chunk layer: one Deflate chunk, Adler32 of the COMPRESSED bytes (ka)
    comp = zlib.compress(bytes(data), 6)
    blob = comp + struct.pack(">I", zlib.adler32(comp) & 0xFFFFFFFF)
    with open(os.path.join(d, "tmx-events-ka-1-Data.db"), "wb") as f:
        f.write(blob)
    ci = bytearray()
    ci += _enc_str16(b"DeflateCompressor")
    ci += struct.pack(">i", 0)
    ci += struct.pack(">i", 64 * 1024)
    ci += struct.pack(">q", len(data))
    ci += struct.pack(">i", 1)
    ci += struct.pack(">q", 0)
    with open(os.path.join(d, "tmx-events-ka-1-CompressionInfo.db"), "wb") as f:
        f.write(bytes(ci))
    # ka Statistics: TOC with a VALIDATION component (SSTable.cpp:277-309)
    st = bytearray()
    st += struct.pack(">i", 1)
    st += struct.pack(">ii", 0, 12)
    st += _enc_str16(OLD.MURMUR3_CLASS.encode())
    with open(os.path.join(d, "tmx-events-ka-1-Statistics.db"), "wb") as f:
        f.write(bytes(st))
    return d


def test_golden_ka_file_decodes(tmp_path):
    d = _golden_ka_table(tmp_path)
    r = OLD.OldReader(d, "tmx-events-ka-1-Data.db")
    assert r.partitioner == OLD.MURMUR3_CLASS
    got = {p.key: (t, p) for t, p in r.partitions()}
    assert set(got) == {b"k1", b"k2"}

    _t1, p1 = got[b"k1"]
    assert p1.row_tomb_ts is None
    assert [
        (c.col_name, c.value, c.ts, c.ttl, c.expiration, c.deleted, c.range_tomb)
        for c in p1.cells
    ] == [
        ("a", b"va", 2_000_000, None, None, False, False),
        ("b", b"vb", 2_000_500, 120, 900, False, False),
        ("c", b"", 2_001_000, None, None, True, False),  # ldt value dropped
        ("d", struct.pack(">q", 5), 2_002_000, None, None, False, False),
        ("e", b"ve", 2_003_000, None, None, False, False),  # composite unwrap
        ("g", b"", 2_004_000, None, None, False, True),  # end bound kept
    ]
    _t2, p2 = got[b"k2"]
    assert p2.row_tomb_ts == 3_000_000 and p2.cells == []


# -------------------------------------------------- writer round-trips


def _mk_parts() -> list[Partition]:
    parts = [
        Partition(
            key=b"alpha",
            cells=[
                Cell("alpha", b"1.5", ts=100),
                Cell("beta", b"7", ts=150),
                Cell("gamma", ts=120_000_000, deleted=True),
                Cell("delta", b"2.5", ts=130, ttl=3600, expiration=4000),
                Cell("beta", ts=140, range_tomb=True),
            ],
        ),
        Partition(key=b"bravo", row_tomb_ts=999_000_000, cells=[Cell("beta", b"9", ts=50)]),
        Partition(key=b"tomb-only", row_tomb_ts=123_000_000),
    ]
    return parts


@pytest.mark.parametrize(
    "version,codec",
    [
        ("ja", "DeflateCompressor"),
        ("jb", "LZ4Compressor"),
        ("ka", "SnappyCompressor"),
        ("la", "LZ4Compressor"),
    ],
)
def test_roundtrip_versions_and_codecs(tmp_path, version, codec):
    d = str(tmp_path / version)
    w = OLD.OldWriter(d, 3, version=version, codec_class=codec, chunk_size=64)
    for p in _mk_parts():
        w.add(p)
    w.finish()
    # component naming per era
    if version == "la":
        assert os.path.exists(os.path.join(d, "la-3-big-Index.db"))
    else:
        assert os.path.exists(os.path.join(d, f"tmx-events-{version}-3-Index.db"))
    r = OLD.OldReader(d, w.data_filename())
    got = {p.key: p for _t, p in r.partitions()}
    want = {p.key: p for p in _mk_parts()}
    assert set(got) == set(want)
    for key, wp in want.items():
        gp = got[key]
        assert gp.row_tomb_ts == wp.row_tomb_ts
        assert [
            (c.col_name, b"" if c.deleted else c.value, c.ts, c.ttl,
             c.expiration, c.deleted, c.range_tomb)
            for c in wp.cells
        ] == [
            (c.col_name, c.value, c.ts, c.ttl, c.expiration, c.deleted, c.range_tomb)
            for c in gp.cells
        ]


def test_roundtrip_composite_and_counter(tmp_path):
    d = str(tmp_path / "cc")
    w = OLD.OldWriter(
        d, 1, version="ka", codec_class="DeflateCompressor",
        composite_path=("tmx", "cols"), counter_cols=frozenset({"beta"}),
    )
    w.add(Partition(key=b"k", cells=[
        Cell("alpha", b"x", ts=10),
        Cell("beta", struct.pack(">q", 3), ts=20),
        Cell("gamma", ts=30, range_tomb=True),
    ]))
    w.finish()
    (_t, p), = OLD.OldReader(d, w.data_filename()).partitions()
    # composite names unwrap to the flat column name; the counter cell
    # reads back as a plain cell (counterTs parsed + dropped, like the
    # reference); the range bound unwraps too
    assert [(c.col_name, c.value, c.range_tomb) for c in p.cells] == [
        ("alpha", b"x", False),
        ("beta", struct.pack(">q", 3), False),
        ("gamma", b"", True),
    ]


def test_chunk_corruption_detected_per_discipline(tmp_path):
    # jb+ (Adler32 of compressed, BEFORE decompress): flip a data byte
    d = str(tmp_path / "ka")
    w = OLD.OldWriter(d, 1, version="ka", codec_class="LZ4Compressor")
    for p in _mk_parts():
        w.add(p)
    w.finish()
    path = w.path("Data")
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0x55
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="adler32 checksum mismatch"):
        list(OLD.OldReader(d, w.data_filename()).partitions())
    # verification off: decodes whatever it can or fails in the codec —
    # but never reports a checksum mismatch
    try:
        list(OLD.OldReader(d, w.data_filename(), verify_checksums=False).partitions())
    except ValueError as e:
        assert "mismatch" not in str(e)

    # ja (CRC32 of the UNCOMPRESSED chunk, AFTER decompress): flip a
    # stored-checksum byte so decompression succeeds and only the
    # post-decompression check can catch it (Buffer.cpp:358-366)
    d2 = str(tmp_path / "ja")
    w2 = OLD.OldWriter(d2, 1, version="ja", codec_class="DeflateCompressor")
    for p in _mk_parts():
        w2.add(p)
    w2.finish()
    path2 = w2.path("Data")
    blob2 = bytearray(open(path2, "rb").read())
    blob2[-1] ^= 0xFF  # last 4 bytes are the final chunk's checksum
    open(path2, "wb").write(bytes(blob2))
    with pytest.raises(ValueError, match="crc32 checksum mismatch"):
        list(OLD.OldReader(d2, w2.data_filename()).partitions())
    assert (
        len(list(OLD.OldReader(d2, w2.data_filename(), verify_checksums=False).partitions()))
        == 3
    )


def test_truncation_fails_uniformly(tmp_path):
    d = str(tmp_path / "trunc")
    w = OLD.OldWriter(d, 1, version="la", codec_class="DeflateCompressor")
    for p in _mk_parts():
        w.add(p)
    w.finish()
    blob = open(w.path("Data"), "rb").read()
    for cut in range(0, len(blob), max(1, len(blob) // 23)):
        open(w.path("Data"), "wb").write(blob[:cut])
        with pytest.raises((ValueError, zlib.error)):
            list(OLD.OldReader(d, w.data_filename()).partitions())
    open(w.path("Data"), "wb").write(blob)
    assert len(list(OLD.OldReader(d, w.data_filename()).partitions())) == 3


@pytest.mark.parametrize("version", ["ja", "jb", "ka", "la"])
def test_statistics_corruption_fails_uniformly(tmp_path, version):
    """Negative corpus for the OLD-era Statistics.db walk (the ma
    corruption matrix's missing twin): every truncation point, garbage
    fill, and negative count/offset must surface ValueError from
    OldReader construction — never struct.error/IndexError — and must
    never be silently accepted by Python's end-relative indexing."""
    import struct as _struct

    d = str(tmp_path / f"stcorrupt_{version}")
    w = OLD.OldWriter(d, 1, version=version, codec_class="DeflateCompressor")
    for p in _mk_parts():
        w.add(p)
    w.finish()
    st_path = w.path("Statistics")
    blob = open(st_path, "rb").read()

    def expect_failure_or_valid():
        try:
            rd = OLD.OldReader(d, w.data_filename())
        except ValueError:
            return
        # a corruption that happens to still parse must yield a sane
        # partitioner string, not garbage control bytes
        assert isinstance(rd.partitioner, str)

    # every truncation point
    for cut in range(len(blob)):
        open(st_path, "wb").write(blob[:cut])
        with pytest.raises(ValueError):
            OLD.OldReader(d, w.data_filename())
    # garbage files
    for junk in (b"", b"\xff" * 64, b"\x00" * 3, bytes(range(256))):
        open(st_path, "wb").write(junk)
        expect_failure_or_valid()
    # negative leading count (TOC count for ka+, histogram buckets below)
    open(st_path, "wb").write(_struct.pack(">i", -5) + blob[4:])
    with pytest.raises(ValueError):
        OLD.OldReader(d, w.data_filename())
    # absurdly large leading count
    open(st_path, "wb").write(_struct.pack(">i", 1 << 30) + blob[4:])
    with pytest.raises(ValueError):
        OLD.OldReader(d, w.data_filename())
    # restore: the pristine file still reads
    open(st_path, "wb").write(blob)
    assert isinstance(OLD.OldReader(d, w.data_filename()).partitioner, str)


def test_ja_statistics_histogram_walk(tmp_path):
    # pre-ka Statistics: two histograms + fixed block + partitioner
    # (SSTable.cpp:310-316); non-empty histograms must be skipped right
    d = str(tmp_path / "st")
    os.makedirs(d, exist_ok=True)
    st = bytearray()
    st += struct.pack(">i", 2) + bytes(2 * 16)  # rowSize histogram, 2 buckets
    st += struct.pack(">i", 1) + bytes(1 * 16)  # columnCount histogram
    st += bytes(5 * 8 + 2 * 4)
    st += _enc_str16(b"org.apache.cassandra.dht.RandomPartitioner")
    p = os.path.join(d, "tmx-events-jb-1-Statistics.db")
    open(p, "wb").write(bytes(st))
    assert OLD.read_partitioner(p, OLD.V_JB).endswith("RandomPartitioner")


def test_discovery_mixed_era_and_dispatch(tmp_path):
    d = str(tmp_path / "mixed")
    os.makedirs(d, exist_ok=True)
    w_old = OLD.OldWriter(d, 1, version="ka", codec_class="SnappyCompressor")
    w_old.add(Partition(key=b"k1", cells=[Cell("alpha", b"old", ts=10)]))
    w_old.finish()
    w_la = OLD.OldWriter(d, 2, version="la", codec_class="DeflateCompressor")
    w_la.add(Partition(key=b"k1", cells=[Cell("alpha", b"mid", ts=20)]))
    w_la.finish()
    w_ma = MaWriter(d, 3, [("alpha", "UTF8Type")], codec_class="LZ4Compressor")
    w_ma.add(Partition(key=b"k1", cells=[Cell("alpha", b"new", ts=30)]))
    w_ma.finish()
    found = OLD.discover_cassandra_sstables(d)
    assert [(g, n) for _v, g, n in found] == [
        (1, "tmx-events-ka-1-Data.db"),
        (2, "la-2-big-Data.db"),
        (3, "ma-3-big-Data.db"),
    ]
    assert [v for v, _g, _n in found] == [OLD.V_KA, OLD.V_LA, OLD.V_MA]


def test_datasource_partitioner_mismatch_aborts(tmp_path):
    # P5 across ERAS: an old sstable under RandomPartitioner cannot merge
    # with an ma sstable under Murmur3 (CassandraParser.cpp:144-153)
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )

    d = str(tmp_path / "clash")
    os.makedirs(d, exist_ok=True)
    w_old = OLD.OldWriter(
        d, 1, version="la",
        partitioner="org.apache.cassandra.dht.RandomPartitioner",
    )
    w_old.add(Partition(key=b"k", cells=[Cell("alpha", b"x", ts=1)]))
    w_old.finish()
    w_ma = MaWriter(d, 2, [("alpha", "UTF8Type")])
    w_ma.add(Partition(key=b"k", cells=[Cell("alpha", b"y", ts=2)]))
    w_ma.finish()
    rd = SSTableRunReader({"path": d, "layout": "ma"})
    with pytest.raises(ValueError, match="inconsistent partitioners"):
        rd.partitions()


def test_cli_reads_real_mixed_era_directory(spark, sf_dir, capsys):
    """The CLI pointed at a REAL mixed-era Cassandra table directory
    (ka + la + ma files) auto-detects the real-format layout and dry-runs
    the merge — the reference binary's headline usage."""
    from cassandra2aerospike_spark.__main__ import main
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_mixed_era_table_from_events,
        default_runs_dir,
    )

    table_dir = build_mixed_era_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_mixed_era"
    )
    assert main(["-i", table_dir, "-D", "--limit", "5", "--now", "1719792000"]) == 0
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[-1].startswith("# dry run: showed 5")
    assert sum(1 for l in lines if l.startswith("key=")) == 5


# ------------------------------------------- token-range sub-splitting


def _many_parts(n: int):
    import random

    rnd = random.Random(7)
    out = []
    for i in range(n):
        key = f"user-{i:05d}".encode()
        cells = [
            Cell("alpha", str(rnd.random()).encode(), ts=1000 + i),
            Cell("beta", str(i).encode(), ts=2000 + i),
        ]
        out.append(Partition(key=key, cells=cells))
    return out


def _slice_union(reader, bounds):
    got = []
    edges = [None, *bounds, None]
    for s, e in zip(edges[:-1], edges[1:]):
        got.extend(reader.partitions(s, e))
    return got


def test_ma_token_slices_union_equals_whole(tmp_path):
    from cassandra2aerospike_spark.sources.sstable.ma_format import (
        MaReader,
        murmur3_token,
        read_summary,
    )

    d = str(tmp_path / "ma")
    w = MaWriter(d, 1, [("alpha", "UTF8Type"), ("beta", "UTF8Type")],
                 codec_class="LZ4Compressor", chunk_size=512)
    for p in _many_parts(200):
        w.add(p)
    w.finish()
    r = MaReader(d, 1)
    whole = [(t, p.key, len(p.cells)) for t, p in r.partitions()]
    assert len(whole) == 200
    samples = [murmur3_token(k) for k, _ in
               read_summary(os.path.join(d, "ma-1-big-Summary.db"), True)]
    assert len(samples) >= 8  # 200/16 samples
    bounds = samples[3::3]
    sliced = [(t, p.key, len(p.cells))
              for t, p in _slice_union(r, bounds)]
    assert sliced == whole  # no dup, no miss, order preserved per slice


def test_old_token_slices_union_equals_whole(tmp_path):
    d = str(tmp_path / "la")
    w = OLD.OldWriter(d, 1, version="la", codec_class="DeflateCompressor",
                      chunk_size=512)
    for p in _many_parts(200):
        w.add(p)
    w.finish()
    r = OLD.OldReader(d, w.data_filename())
    whole = [(t, p.key, len(p.cells)) for t, p in r.partitions()]
    assert len(whole) == 200
    from cassandra2aerospike_spark.sources.sstable.ma_format import (
        murmur3_token,
        read_summary,
    )

    samples = [murmur3_token(k) for k, _ in
               read_summary(r.path("Summary"), True)]
    bounds = samples[2::4]
    sliced = [(t, p.key, len(p.cells)) for t, p in _slice_union(r, bounds)]
    assert sliced == whole


def test_datasource_subsplits_real_sstables(tmp_path):
    """splits_per_run > 1 must fan one real sstable out into multiple
    token-range InputPartitions whose union is exactly the file."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )

    d = str(tmp_path / "t")
    w = MaWriter(d, 1, [("alpha", "UTF8Type"), ("beta", "UTF8Type")],
                 codec_class="DeflateCompressor", chunk_size=512)
    for p in _many_parts(150):
        w.add(p)
    w.finish()
    rd = SSTableRunReader({"path": d, "layout": "ma", "splits_per_run": "6"})
    parts = rd.partitions()
    assert len(parts) > 1  # actually sub-split
    rows = []
    for part in parts:
        for batch in rd.read(part):
            rows.extend(batch.to_pylist())
    keys = sorted(r["key"] for r in rows if r["col_name"] == "alpha")
    assert keys == sorted(f"user-{i:05d}".encode() for i in range(150))
    assert len(rows) == 300  # 2 cells per partition, once each


def test_datasource_ma_write_roundtrip_and_errors(spark, tmp_path):
    """layout=ma WRITE path: EAV rows out as a real ma sstable, append
    generation numbering, and range-tombstone rejection."""
    import pyspark.sql.functions as F

    from cassandra2aerospike_spark.sources.sstable.datasource import register
    from cassandra2aerospike_spark.sources.sstable.ma_format import MaReader

    register(spark)
    out = str(tmp_path / "ma_out")
    rows = [
        ("k1", "alpha", bytearray(b"1.5"), 100, None, None, False, False, None),
        ("k1", "beta", bytearray(b"2.5"), 200, 3600, 4000, False, False, None),
        ("k2", None, None, 500, None, None, False, False, 500),  # row tomb
        ("k3", "alpha", bytearray(b"9"), 300, None, None, True, False, None),
    ]
    schema = ("key string, col_name string, value binary, ts long, ttl int, "
              "expiration long, deleted boolean, range_tomb boolean, row_tomb_ts long")
    df = spark.createDataFrame(rows, schema).coalesce(1)
    df.write.format("sstable_run").option("layout", "ma").mode("append").save(out)
    # a real, readable ma sstable landed
    got = {p.key: p for _t, p in MaReader(out, 1).partitions()}
    assert set(got) == {b"k1", b"k2", b"k3"}
    assert got[b"k2"].row_tomb_ts == 500 and got[b"k2"].cells == []
    assert {c.col_name for c in got[b"k1"].cells} == {"alpha", "beta"}
    assert got[b"k3"].cells[0].deleted
    # append mode: next write lands as generation 2
    df.limit(1).write.format("sstable_run").option("layout", "ma").mode(
        "append"
    ).save(out)
    import os

    assert os.path.exists(os.path.join(out, "ma-2-big-Data.db"))
    # range tombstones cannot be expressed in ma
    bad = spark.createDataFrame(
        [("k1", "a", bytearray(b""), 1, None, None, False, True, None)], schema
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="range"):
        bad.write.format("sstable_run").option("layout", "ma").mode("append").save(out)


def test_ma_truncated_data_file_fails_uniformly(tmp_path):
    """The review-found gap: a truncated ma Data.db must fail as the
    uniform ValueError (shared read_chunked_window guard), never
    struct.error."""
    from cassandra2aerospike_spark.sources.sstable.ma_format import MaReader

    d = str(tmp_path / "ma")
    w = MaWriter(d, 1, [("alpha", "UTF8Type")], codec_class="DeflateCompressor")
    w.add(Partition(key=b"k", cells=[Cell("alpha", b"v", ts=1)]))
    w.finish()
    blob = open(w.path("Data"), "rb").read()
    for cut in (0, 1, 3, len(blob) // 2, len(blob) - 1):
        open(w.path("Data"), "wb").write(blob[:cut])
        with pytest.raises((ValueError, zlib.error)):
            list(MaReader(d, 1).partitions())


def test_cli_keyed_resume_uses_input_token_space(spark, sf_dir, capsys):
    """-s over a REAL Cassandra directory must hash the key with the
    directory's own partitioner (Murmur3), matching --token of the same
    key's murmur3 value; mixed real+SGR inputs refuse a keyed resume."""
    from cassandra2aerospike_spark.__main__ import main
    from cassandra2aerospike_spark.functions.tokens import murmur3_128_h1
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_mixed_era_table_from_events,
        build_runs_from_events,
        default_runs_dir,
    )

    table_dir = build_mixed_era_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_mixed_era"
    )
    now = ["--now", "1719792000"]
    key = "77"
    assert main(["-i", table_dir, "-D", "--limit", "1000", "-s", key] + now) == 0
    via_key = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("key=")
    ]
    tok = murmur3_128_h1(key.encode())
    assert main(
        ["-i", table_dir, "-D", "--limit", "1000", "--token", str(tok)] + now
    ) == 0
    via_token = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("key=")
    ]
    assert via_key == via_token and 0 < len(via_key)

    sgr_dir = build_runs_from_events(spark, sf_dir, default_runs_dir(sf_dir))
    with pytest.raises(SystemExit):
        main(["-i", table_dir, "-i", sgr_dir, "-D", "-s", key] + now)


def test_streaming_real_format_directory(spark, tmp_path):
    """Streaming over a REAL Cassandra table directory (layout=ma): each
    newly-landed sstable — any era — arrives as a microbatch, the
    continuous-ingest contract over actual Cassandra data files."""
    from cassandra2aerospike_spark.sources.sstable import register

    d = str(tmp_path / "table")
    os.makedirs(d)

    def write_ma(gen, keys):
        w = MaWriter(d, gen, [("c", "UTF8Type")])
        for k in keys:
            w.add(Partition(key=str(k).encode(),
                            cells=[Cell("c", str(k).encode(), ts=k)]))
        w.finish()

    write_ma(1, range(0, 10))
    # an OLD-era sstable in the same stream: version dispatch per file
    w_old = OLD.OldWriter(d, 2, version="la", codec_class="DeflateCompressor")
    for k in range(10, 15):
        w_old.add(Partition(key=str(k).encode(),
                            cells=[Cell("c", str(k).encode(), ts=k)]))
    w_old.finish()

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("sstable_run").option("layout", "ma").load(d)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("real_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("real_stream").count() == 15
        write_ma(3, range(100, 104))
        q.processAllAvailable()
        got = spark.table("real_stream")
        assert got.count() == 19  # only the new sstable arrived
        assert got.filter("run = 3").count() == 4
        assert got.filter("run = 2").count() == 5  # the la-era sstable
    finally:
        q.stop()


def test_old_era_sstable_arrives_mid_stream(spark, tmp_path):
    """The post-upgrade FLUSH case: a stream is already running over a
    3.x directory when an OLD-era (ka, flat naming, composite cells)
    sstable lands — e.g. a lagging node replaying a pre-upgrade
    commitlog segment.  The new generation must arrive as its own
    microbatch through the per-file version dispatch, and a later ma
    flush must keep streaming after it (the era switch is per file,
    not sticky per stream)."""
    from cassandra2aerospike_spark.sources.sstable import register

    d = str(tmp_path / "table")
    os.makedirs(d)
    w = MaWriter(d, 1, [("c", "UTF8Type")])
    for k in range(5):
        w.add(Partition(key=str(k).encode(),
                        cells=[Cell("c", str(k).encode(), ts=k)]))
    w.finish()

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("sstable_run").option("layout", "ma").load(d)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("upgrade_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("upgrade_stream").count() == 5
        # mid-stream: a ka-era sstable (old flat naming) lands
        w_old = OLD.OldWriter(d, 2, version="ka", codec_class="SnappyCompressor")
        for k in range(100, 103):
            w_old.add(Partition(key=str(k).encode(),
                                cells=[Cell("c", str(k).encode(), ts=k)]))
        w_old.finish()
        q.processAllAvailable()
        got = spark.table("upgrade_stream")
        assert got.filter("run = 2").count() == 3
        assert {bytes(r.key).decode() for r in got.filter("run = 2").collect()} == {
            "100", "101", "102"
        }
        # and the stream keeps going on a subsequent ma flush
        w3 = MaWriter(d, 3, [("c", "UTF8Type")])
        w3.add(Partition(key=b"z", cells=[Cell("c", b"zz", ts=9)]))
        w3.finish()
        q.processAllAvailable()
        assert spark.table("upgrade_stream").filter("run = 3").count() == 1
        assert spark.table("upgrade_stream").count() == 9
    finally:
        q.stop()


@pytest.mark.parametrize("ver", ["mc", "nb", "oa"])
def test_post_ma_versions_read_through_ma_grammar(tmp_path, ver):
    """Every post-ma version string — 3.x (mc, md), 4.x (na, nb), 5.x
    (oa) — decodes through the same grammar: create_table treats every
    version >= ma uniformly (SSTable.cpp:45-55); the reader must use the
    file's REAL component prefix, not a hardcoded 'ma-'."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )

    d = str(tmp_path / "t")
    w = MaWriter(d, 5, [("c", "UTF8Type")])
    w.add(Partition(key=b"k", cells=[Cell("c", b"v", ts=1)]))
    w.finish()
    for comp in ("Data", "Index", "Summary", "Statistics", "CompressionInfo"):
        os.rename(
            os.path.join(d, f"ma-5-big-{comp}.db"),
            os.path.join(d, f"{ver}-5-big-{comp}.db"),
        )
    rd = SSTableRunReader({"path": d, "layout": "ma", "splits_per_run": "1"})
    rows = [r for part in rd.partitions() for b in rd.read(part) for r in b.to_pylist()]
    assert [(r["key"], r["value"]) for r in rows] == [(b"k", b"v")]


def test_stream_gen_collision_across_eras(tmp_path):
    """Two eras colliding on one generation number (ka-1 and ma-1) must
    BOTH stream — the offset is per generation, the partitions per file."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunStreamReader,
    )

    d = str(tmp_path / "t")
    w_old = OLD.OldWriter(d, 1, version="ka")
    w_old.add(Partition(key=b"k1", cells=[Cell("c", b"old", ts=1)]))
    w_old.finish()
    w_ma = MaWriter(d, 1, [("c", "UTF8Type")])
    w_ma.add(Partition(key=b"k2", cells=[Cell("c", b"new", ts=2)]))
    w_ma.finish()
    rd = SSTableRunStreamReader({"path": d, "layout": "ma"})
    end = rd.latestOffset()
    parts = rd.partitions(rd.initialOffset(), end)
    assert len(parts) == 2  # one InputPartition per FILE, not per gen
    rows = [r for part in parts for b in rd.read(part) for r in b.to_pylist()]
    assert sorted((r["key"], r["value"]) for r in rows) == [
        (b"k1", b"old"),
        (b"k2", b"new"),
    ]


def test_real_format_min_token_prunes_slices(tmp_path):
    """O2 on real files: a pushed token lower bound must drop whole
    slices below it and seek within the rest — the union of surviving
    slices is exactly the >= bound subset."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )
    from cassandra2aerospike_spark.sources.sstable.ma_format import (
        murmur3_token,
    )

    d = str(tmp_path / "t")
    w = MaWriter(d, 1, [("alpha", "UTF8Type"), ("beta", "UTF8Type")],
                 codec_class="LZ4Compressor", chunk_size=512)
    parts = _many_parts(200)
    for p in parts:
        w.add(p)
    w.finish()
    toks = sorted(murmur3_token(p.key) for p in parts)
    bound = toks[120]  # prune the lower 60%
    rd = SSTableRunReader({"path": d, "layout": "ma", "splits_per_run": "6"})
    rd.min_token = bound
    slices = rd.partitions()
    rows = [r for part in slices for b in rd.read(part) for r in b.to_pylist()]
    got = sorted({r["token"] for r in rows})
    assert got == [t for t in toks if t >= bound]
    # every surviving slice starts at or above the bound (the pushdown
    # seeds the first edge), and the first starts exactly AT it
    assert all(s.start_token is not None and s.start_token >= bound for s in slices)
    assert any(s.start_token == bound for s in slices)


def test_generic_merge_over_clustered_table_stays_row_scoped(spark, tmp_path):
    """Review finding: ck-unaware consumers (classified_from_ma -> the
    generic merge) must NOT collapse clustering rows.  The classified
    mapping qualifies columns with their ck prefix, so a point tombstone
    in day2 cannot kill day1's value — the exact wrong-merge the
    reference documents for clustered tables."""
    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        classified_from_ma,
    )

    d = str(tmp_path / "tbl")
    w = MaWriter(d, 1, [("alpha", "UTF8Type")], clustering=["UTF8Type"])
    w.add(Partition(key=b"7", cells=[
        Cell("alpha", b"1.5", ts=10, ck=b"day1"),
        Cell("alpha", b"2.5", ts=20, ck=b"day2"),
        Cell("alpha", ts=30, deleted=True, ck=b"day2"),  # kills day2 only
    ]))
    w.finish()
    classified = classified_from_ma(spark, d)
    live = merge.live_cells_from_classified(classified)
    got = {(r.col_name, float(r.value)) for r in live.collect()}
    assert got == {("day1:alpha", 1.5)}  # day1 survives, day2 tombstoned


def test_old_promoted_index_blocks_and_window(tmp_path):
    """Old-era (2.x) WIDE partition: the writer emits the real ka/la
    promoted index — entry DeletionTime, then IndexInfo entries
    (firstName/lastName/offset/width) the reference only skips
    (SSTable.cpp:76-84) — and partition_window() decodes each block
    independently; the union of blocks equals the whole partition, and
    ordinary partitions keep a zero promoted size (VERDICT r08 task 5)."""
    d = str(tmp_path / "wideold")
    w = OLD.OldWriter(d, 1, version="la", promoted_threshold=256)
    big = Partition(key=b"big", row_tomb_ts=500, cells=[
        Cell("c%04d" % i, b"x%03d" % i, ts=1000 + i) for i in range(200)
    ])
    w.add(big)
    w.add(Partition(key=b"small", cells=[Cell("c", b"y", ts=5)]))
    w.finish()

    # the raw Index.db entry for 'big' carries a nonzero be32 size the
    # reference-style skip walk steps over cleanly
    r = OLD.OldReader(d, "la-1-big-Data.db")
    plain = dict(r._index_entries())
    full = list(r.index_entries_full())
    entries = {k: (pos, pr) for k, pos, pr in full}
    assert set(plain) == set(entries)  # skip walk sees the same keys
    assert entries[b"small"][1] is None
    row_tomb, blocks = entries[b"big"][1]
    assert row_tomb == 500 and len(blocks) > 2
    assert blocks[0] == len(b"big") + 2 + 12  # first cell, after header

    pos = entries[b"big"][0]
    later = [p for _k, p, _pr in full if p > pos]
    end = min(later) if later else r.logical_length()
    all_cells = []
    for j, b in enumerate(blocks):
        hi = pos + blocks[j + 1] if j + 1 < len(blocks) else end
        tok, p = r.partition_window(b"big", row_tomb, pos + b, hi)
        assert tok == OLD.murmur3_token(b"big")
        assert p.row_tomb_ts == 500
        all_cells += [(c.col_name, c.value, c.ts) for c in p.cells]
    whole = {pp.key: pp for _t, pp in r.partitions()}[b"big"]
    assert all_cells == [(c.col_name, c.value, c.ts) for c in whole.cells]


def test_old_wide_partition_datasource_split(spark, tmp_path):
    """End-to-end old-era twin of the ma wide-partition split: a 2.x
    directory whose la sstable holds one WIDE partition plans one
    InputPartition per promoted block (>1 task for the one partition
    — the slope evidence the r08 verdict asked for), plus range slices
    for the small partitions, and the raw read equals the same content
    written without a promoted index."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
        register,
    )

    def build(dirname, thr):
        d = str(tmp_path / dirname / "tmx" / "events")
        w = OLD.OldWriter(d, 1, version="la", promoted_threshold=thr)
        big = Partition(key=b"big", cells=[
            Cell("c%04d" % i, b"x%03d" % i, ts=1000 + i) for i in range(400)
        ])
        # deletions must survive the block fan-out: a point tombstone
        # and a range-tombstone cell land in (likely) different blocks
        big.cells.append(Cell("c0000", ts=9999, deleted=True))
        w.add(big)
        for k in range(5):
            w.add(Partition(key=b"s%d" % k, cells=[Cell("c", b"y", ts=5 + k)]))
        w.finish()
        return d

    d_wide = build("wide", 512)
    d_flat = build("flat", 0)
    # fixture-scale slice target: at the 64 MB production default this
    # small partition would (correctly) ride a range slice
    rdr = SSTableRunReader(
        {"path": d_wide, "layout": "ma", "wide_slice_bytes": "1024"}
    )
    slices = rdr.partitions()
    n_blocks = sum(1 for s in slices if s.block is not None)
    assert n_blocks > 2  # ONE partition fans out across >1 task
    register(spark)

    def raw(path):
        df = (
            spark.read.format("sstable_run")
            .option("layout", "ma")
            .option("wide_slice_bytes", "1024")
            .load(path)
        )
        return {
            (r.key, r.col_name, r.value, r.ts, r.deleted)
            for r in df.collect()
        }

    got, want = raw(d_wide), raw(d_flat)
    assert got == want
    assert len(want) == 400 + 1 + 5


def test_s27_fixture_actually_fans_out_blocks(spark, sf_dir):
    """The s27 driver row is only evidence if its fixture really takes
    the promoted-index path: at the query's wide_slice_bytes the
    planner yields BLOCK-group slices for the staged old-wide table,
    both la generations carry promoted entries, and — the slice-target
    contract — at the production 64 MB default the same fixture plans
    NO block slices (these partitions ride range slices; block
    granularity must never dictate task granularity)."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_old_wide_table_from_events,
        default_runs_dir,
    )

    d = build_old_wide_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_old_wide"
    )
    # 1 KB target here (the sf0.001 partitions are ~2 KB); the s27
    # query itself uses 4096, which engages from the driver's sf0.01 up
    slices = SSTableRunReader(
        {"path": d, "layout": "ma", "wide_slice_bytes": "1024"}
    ).partitions()
    n_blocks = sum(1 for s in slices if s.block is not None)
    assert n_blocks > 2
    for gen in (1, 2):
        r = OLD.OldReader(d, f"la-{gen}-big-Data.db")
        assert any(pr is not None for _k, _p, pr in r.index_entries_full())
    default_slices = SSTableRunReader({"path": d, "layout": "ma"}).partitions()
    assert sum(1 for s in default_slices if s.block is not None) == 0
    assert len(default_slices) < len(slices)


def test_wide_slice_target_groups_blocks(tmp_path):
    """The wide-partition planner slices by TARGET BYTES, not by block:
    with a small target every block is its own slice; with a larger one
    consecutive blocks group into ~target windows (contiguous, ordered,
    covering exactly the same byte span); and when no partition exceeds
    the target the planner falls through to the Summary token-split
    path (returns no offset plan at all)."""
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )

    d = str(tmp_path / "tmx" / "events")
    w = OLD.OldWriter(d, 1, version="la", promoted_threshold=256)
    w.add(Partition(key=b"giant", cells=[
        Cell("c%05d" % i, b"x%04d" % i, ts=100 + i) for i in range(600)
    ]))
    w.add(Partition(key=b"tiny", cells=[Cell("c", b"y", ts=1)]))
    w.finish()

    def plan(target):
        return SSTableRunReader(
            {"path": d, "layout": "ma", "wide_slice_bytes": str(target)}
        ).partitions()

    per_block = [s for s in plan(1) if s.block is not None]
    grouped = [s for s in plan(2048) if s.block is not None]
    assert len(grouped) >= 2  # still fans out
    assert len(grouped) < len(per_block)  # but coalesced
    # groups tile the identical byte span, in order, each full group
    # >= target except the last
    pb = sorted((s.block[2], s.block[3]) for s in per_block)
    gp = sorted((s.block[2], s.block[3]) for s in grouped)
    assert gp[0][0] == pb[0][0] and gp[-1][1] == pb[-1][1]
    for (lo, hi), (nlo, _nhi) in zip(gp, gp[1:]):
        assert hi == nlo  # contiguous
    assert all(hi - lo >= 2048 for lo, hi in gp[:-1])
    # production-default target: nothing here exceeds 64 MB -> no
    # offset plan; the Summary token-split path owns the file
    default_plan = SSTableRunReader({"path": d, "layout": "ma"}).partitions()
    assert all(s.block is None and s.data_lo is None for s in default_plan)


# ------------------------------------------------ round 10: Filter.db bloom

def test_old_era_filter_written_and_lookup_plans_both_eras(tmp_path):
    """OldWriter ships a Filter.db; the lookup planner consults it for
    old-era files too, and a FOREIGN (unparseable) old-era filter is
    tolerated — admit, never prune (real pre-3.0 filter layouts vary),
    in contrast to the ma era's fail-loud contract."""
    from cassandra2aerospike_spark.sources.sstable import ma_format as MA
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
    )
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition

    d = str(tmp_path / "mix")
    ow = OLD.OldWriter(d, 1, version="ka")
    for i in range(20):
        ow.add(Partition(key=b"old-%d" % i, cells=[Cell("v", b"x", ts=10 + i)]))
    ow.finish()
    mw = MA.MaWriter(d, 2, [("v", "UTF8Type")])
    for i in range(20):
        mw.add(Partition(key=b"new-%d" % i, cells=[Cell("v", b"y", ts=50 + i)]))
    mw.finish()
    assert os.path.exists(os.path.join(d, ow.data_filename()[: -len("Data.db")] + "Filter.db"))

    def plan(keys):
        return SSTableRunReader(
            {"path": d, "layout": "ma",
             "lookup_keys": ",".join(k.hex() for k in keys)}
        ).partitions()

    # an old-era key: the ma sstable's bloom prunes gen 2 entirely
    slices = plan([b"old-7"])
    assert slices and all(s.gen == 1 for s in slices)
    # an ma-era key: the old bloom prunes gen 1
    slices = plan([b"new-3"])
    assert slices and all(s.gen == 2 for s in slices)
    # foreign/unparseable OLD filter -> admit (plan the Index window);
    # the same bytes under the ma contract raise instead
    with open(os.path.join(d, ow.data_filename()[: -len("Data.db")] + "Filter.db"), "wb") as f:
        f.write(b"\x00\x01\x02")
    slices = plan([b"old-7"])
    assert slices and all(s.gen == 1 for s in slices)
    rd = OLD.OldReader(d, ow.data_filename())
    assert rd.might_contain_key(b"anything")
