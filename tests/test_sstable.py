"""Tests for the SSTable-style run source (SURVEY.md §2.1 S3-S10, O2):
codec properties, writer/reader round-trip, indexed seek, checksum
verification, Spark DataSource integration, and merge parity through the
binary format.
"""

from __future__ import annotations

import os
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra2aerospike_spark.sources.sstable import (
    Cell,
    Partition,
    RunReader,
    RunWriter,
    discover_runs,
    register,
    token_of,
)
from cassandra2aerospike_spark.sources.sstable import codec as C

# ---------------------------------------------------------------- codecs


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_uvint_roundtrip(v):
    buf = C.enc_uvint(v)
    got, off = C.dec_uvint(buf, 0)
    assert got == v and off == len(buf)


@given(st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1))
def test_vint_zigzag_roundtrip(v):
    buf = C.enc_vint(v)
    got, off = C.dec_vint(buf, 0)
    assert got == v and off == len(buf)


def test_uvint_is_compact():
    assert len(C.enc_uvint(0)) == 1
    assert len(C.enc_uvint(127)) == 1
    assert len(C.enc_uvint(128)) == 2
    assert len(C.enc_uvint((1 << 14) - 1)) == 2
    assert len(C.enc_uvint(1 << 62)) == 9


@given(st.text(max_size=300))
def test_vstr_roundtrip(s):
    got, off = C.dec_vstr(C.enc_vstr(s), 0)
    assert got == s


@given(st.binary(max_size=300))
def test_vblob_roundtrip(b):
    got, off = C.dec_vblob(C.enc_vblob(b), 0)
    assert got == b


# ---------------------------------------------------------------- run files


def _mk_parts(n=200, seed=3):
    rng = random.Random(seed)
    parts = []
    for i in range(n):
        key = f"key{i:05d}".encode()
        cells = [
            Cell(
                col_name=f"c{j}",
                value=bytes(rng.randbytes(rng.randint(0, 32))),
                ts=1_700_000_000_000_000 + rng.randint(0, 10**9),
                ttl=3600 if j % 3 == 0 else None,
                expiration=1_719_795_600 if j % 3 == 0 else None,
                deleted=j % 5 == 4,
                range_tomb=j % 7 == 6,
            )
            for j in range(rng.randint(1, 5))
        ]
        parts.append(
            Partition(
                key=key,
                row_tomb_ts=1_700_000_000_000_123 if i % 11 == 0 else None,
                cells=cells,
            )
        )
    parts.sort(key=lambda p: (p.token, p.key))
    return parts


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("runs"))
    parts = _mk_parts()
    w = RunWriter(d, 1, chunk_size=4096)  # small chunks -> many CRC checks
    for p in parts:
        w.add(p)
    w.finish()
    return d, parts


def test_roundtrip(run_dir):
    d, parts = run_dir
    got = list(RunReader(d, 1).partitions())
    assert len(got) == len(parts)
    for a, b in zip(parts, got):
        assert (a.key, a.row_tomb_ts) == (b.key, b.row_tomb_ts)
        for ca, cb in zip(a.cells, b.cells):
            assert (
                ca.col_name,
                ca.ts,
                ca.ttl,
                ca.expiration,
                ca.deleted,
                ca.range_tomb,
            ) == (cb.col_name, cb.ts, cb.ttl, cb.expiration, cb.deleted, cb.range_tomb)
            assert (b"" if ca.deleted else ca.value) == cb.value


def test_seek_matches_full_scan(run_dir):
    """O2: seek result == filter of full scan, at several cut points."""
    d, parts = run_dir
    rr = RunReader(d, 1)
    toks = [p.token for p in parts]
    for cut in [toks[0], toks[37], toks[len(toks) // 2], toks[-1], toks[-1] + 1]:
        got = [p.key for p in rr.partitions(start_token=cut)]
        want = [p.key for p in parts if p.token >= cut]
        assert got == want


def test_oldformat_roundtrip_and_seek(tmp_path):
    """S8: the SGR0 old format (embedded names, absolute timestamps)
    roundtrips byte-exactly and seeks like the new format."""
    from cassandra2aerospike_spark.sources.sstable.format import MAGIC_V0

    d = str(tmp_path)
    parts = _mk_parts(120, seed=5)
    w = RunWriter(d, 1, chunk_size=4096, fmt=MAGIC_V0)
    for p in parts:
        w.add(p)
    w.finish()
    rr = RunReader(d, 1)
    assert rr.fmt == MAGIC_V0
    assert rr.stats.columns == []  # self-describing: no schema sidecar
    got = list(rr.partitions())
    assert len(got) == len(parts)
    for a, b in zip(parts, got):
        assert (a.key, a.row_tomb_ts) == (b.key, b.row_tomb_ts)
        for ca, cb in zip(a.cells, b.cells):
            assert (ca.col_name, ca.ts, ca.ttl, ca.deleted) == (
                cb.col_name, cb.ts, cb.ttl, cb.deleted,
            )
    cut = parts[40].token
    assert [p.key for p in rr.partitions(start_token=cut)] == [
        p.key for p in parts if p.token >= cut
    ]


def test_mixed_format_directory_reads_identically(spark, tmp_path):
    """S3 version dispatch: one directory holding an SGR0 run and an SGR1
    run decodes both in one DataSource scan (the reference's old+new
    generation coexistence, SSTable.cpp:45-55)."""
    from cassandra2aerospike_spark.sources.sstable.format import MAGIC, MAGIC_V0

    d = str(tmp_path)
    parts = _mk_parts(100, seed=11)
    halves = (parts[0::2], parts[1::2])
    for gen, (ps, fmt) in enumerate(zip(halves, (MAGIC_V0, MAGIC)), start=1):
        w = RunWriter(d, gen, fmt=fmt)
        for p in ps:
            w.add(p)
        w.finish()
    register(spark)
    df = spark.read.format("sstable_run").load(d)
    n_cells = sum(len(p.cells) for p in parts)
    n_markers = sum(1 for p in parts if p.row_tomb_ts is not None)
    assert df.count() == n_cells + n_markers
    names = {r.col_name for r in df.select("col_name").distinct().collect()}
    assert {f"c{j}" for j in range(5)} <= names | {None}


def test_mixed_partitioners_abort(spark, tmp_path):
    """P5: runs with different partitioners in one table directory must
    abort planning (CassandraParser.cpp:144-153)."""
    d = str(tmp_path)
    parts = _mk_parts(40, seed=13)
    for gen, ps in ((1, parts[0::2]), (2, parts[1::2])):
        w = RunWriter(d, gen)
        for p in ps:
            w.add(p)
        w.finish()
    # binary-patch run 2's Statistics partitioner name ("md5" -> "xd5")
    stats_path = os.path.join(d, "2-Statistics.db")
    blob = open(stats_path, "rb").read()
    open(stats_path, "wb").write(blob.replace(b"md5", b"xd5", 1))
    from cassandra2aerospike_spark.sources.sstable.datasource import SSTableRunReader

    rdr = SSTableRunReader({"path": d})
    with pytest.raises(ValueError, match="inconsistent partitioners"):
        rdr.partitions()


def test_stream_admission_control_one_gen_per_batch(spark, multi_run_dir, tmp_path):
    """max_gens_per_batch=1: a 3-run backlog drains as 3 microbatches in
    gen order (admission control — the maxFilesPerTrigger analog), with
    the same total row count as an uncapped read."""
    import tempfile
    import uuid

    d, parts = multi_run_dir
    register(spark)
    name = "adm_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.format("sstable_run")
        .option("max_gens_per_batch", "1")
        .load(d)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_adm_"))
        .start()
    )
    try:
        q.processAllAvailable()
        data_batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    n_cells = sum(len(p.cells) for p in parts)
    n_markers = sum(1 for p in parts if p.row_tomb_ts is not None)
    assert spark.table(name).count() == n_cells + n_markers
    assert len(data_batches) == 3, [p["numInputRows"] for p in q.recentProgress]


def test_out_of_order_rejected(tmp_path):
    w = RunWriter(str(tmp_path), 1)
    ps = _mk_parts(10)  # sorted by (token, key)
    w.add(ps[5])
    with pytest.raises(ValueError, match="out-of-order"):
        w.add(ps[4])


def test_checksum_detects_corruption(run_dir, tmp_path):
    d, _ = run_dir
    import shutil

    dd = str(tmp_path / "corrupt")
    shutil.copytree(d, dd)
    path = os.path.join(dd, "1-Data.db")
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(IOError, match="mismatch"):
        list(RunReader(dd, 1).partitions())
    # verification off -> reference's -C flag (Buffer.hpp:103-106): no raise
    # (decode may still produce garbage; only the check is skipped)
    try:
        list(RunReader(dd, 1, verify_checksums=False).partitions())
    except IOError as e:
        assert "mismatch" not in str(e)
    except Exception:
        pass  # garbage decode is acceptable without verification


# ---------------------------------------------------------------- DataSource


@pytest.fixture(scope="module")
def multi_run_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("multiruns"))
    parts = _mk_parts(300, seed=9)
    buckets = {1: [], 2: [], 3: []}
    for i, p in enumerate(parts):
        buckets[1 + i % 3].append(p)
    for gen, ps in buckets.items():
        w = RunWriter(d, gen)
        for p in ps:
            w.add(p)
        w.finish()
    return d, parts


def test_discover_runs(multi_run_dir):
    d, _ = multi_run_dir
    assert discover_runs(d) == [1, 2, 3]


def test_datasource_reads_all_cells(spark, multi_run_dir):
    d, parts = multi_run_dir
    register(spark)
    df = spark.read.format("sstable_run").option("splits_per_run", "3").load(d)
    n_cells = sum(len(p.cells) for p in parts)
    n_markers = sum(1 for p in parts if p.row_tomb_ts is not None)
    assert df.count() == n_cells + n_markers
    assert df.rdd.getNumPartitions() > 3  # splits within runs


def test_datasource_token_pushdown_counts(spark, multi_run_dir):
    from pyspark.sql import functions as F

    d, parts = multi_run_dir
    register(spark)
    df = spark.read.format("sstable_run").load(d)
    cut = sorted(p.token for p in parts)[150]
    got = df.filter(F.col("token") >= cut).count()
    want = sum(
        len(p.cells) + (1 if p.row_tomb_ts is not None else 0)
        for p in parts
        if p.token >= cut
    )
    assert got == want


def test_reader_prunes_runs_by_token_range(multi_run_dir):
    """Unit-level pushdown check: a lower bound above a run's token_hi
    drops that run from partitions()."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    from cassandra2aerospike_spark.sources.sstable.datasource import SSTableRunReader

    d, parts = multi_run_dir
    hi = max(p.token for p in parts)
    reader = SSTableRunReader({"path": d, "splits_per_run": "2"})
    unhandled = list(reader.pushFilters([GreaterThanOrEqual(("token",), hi + 1)]))
    assert len(unhandled) == 1  # filter returned for Spark to re-apply
    assert reader.partitions() == []


# ---------------------------------------------------------------- merge parity


def test_merge_over_sstable_source_equals_parquet(spark, sf_dir, tmp_path):
    """The flagship parity statement: the full merge over the binary
    multi-run source equals the merge over parquet events."""
    import __spark_entry__ as entrymod
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_runs_from_events,
        classified_from_runs,
    )
    from cassandra2aerospike_spark.operators import merge as M
    from cassandra2aerospike_spark.sources import load_table

    runs_dir = build_runs_from_events(spark, sf_dir, str(tmp_path / "runs"))
    classified = classified_from_runs(spark, runs_dir)
    via_sstable = M.lww_latest(M.live_cells_from_classified(classified))
    via_parquet = M.merged_latest_cells(load_table(spark, sf_dir, "events"))
    a = sorted(map(tuple, via_sstable.collect()))
    b = sorted(map(tuple, via_parquet.collect()))
    assert a == b and len(a) > 0


def test_compaction_roundtrip(spark, sf_dir, tmp_path):
    """Major compaction parity: merge N runs -> write single tombstone-free
    run (distributed foreachPartition write) -> read back -> the cell set
    is exactly the merged LWW survivors, and re-merging is a no-op."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.operators.merge import (
        live_cells_from_classified,
        lww_latest,
    )
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_runs_from_events,
        classified_from_runs,
        compact_runs,
        default_runs_dir,
    )

    runs_dir = build_runs_from_events(spark, sf_dir, default_runs_dir(sf_dir))
    out = compact_runs(spark, runs_dir, str(tmp_path / "compacted"), n_runs_out=2)

    def cellset(df):
        return {
            (r.key, r.col_name, r.value, r.ts, r.ttl, r.expiration)
            for r in df.collect()
        }

    merged = lww_latest(live_cells_from_classified(classified_from_runs(spark, runs_dir)))
    readback = classified_from_runs(spark, out)
    assert set(r.kind for r in readback.select("kind").distinct().collect()) == {"cell"}
    got = readback.select("key", "col_name", "value", "ts", "ttl", "expiration")
    assert cellset(got) == cellset(merged) and len(cellset(merged)) > 0
    # idempotence: compacting the compacted run changes nothing
    remerged = lww_latest(live_cells_from_classified(readback))
    assert cellset(remerged) == cellset(merged)


def test_streaming_source_ingests_new_runs(spark, tmp_path):
    """Streaming run source: each new run generation arrives as a
    microbatch; checkpointed offsets make reprocessing exactly-once per
    run (the continuous-operation contract of the reference)."""
    import time as _time

    from cassandra2aerospike_spark.sources.sstable import register
    from cassandra2aerospike_spark.sources.sstable.format import (
        Cell,
        Partition,
        RunWriter,
    )

    runs_dir = str(tmp_path / "runs")
    import os

    os.makedirs(runs_dir)

    def write_run(gen, keys):
        w = RunWriter(runs_dir, gen)
        parts = [
            Partition(
                key=str(k).encode(),
                cells=[Cell(col_name="c", value=str(k).encode(), ts=k)],
            )
            for k in keys
        ]
        for p in sorted(parts, key=lambda p: (p.token, p.key)):
            w.add(p)
        w.finish()

    write_run(1, range(0, 10))
    write_run(2, range(5, 15))

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.format("sstable_run").load(runs_dir)
    q = (
        stream.writeStream.format("memory")
        .queryName("sst_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.table("sst_stream").count()
        assert n1 == 20  # both initial runs ingested

        write_run(3, range(100, 104))
        q.processAllAvailable()
        got = spark.table("sst_stream")
        assert got.count() == 24  # only the new run arrived (no reprocess)
        assert got.filter("run = 3").count() == 4
    finally:
        q.stop()


def test_datasource_write_roundtrip(spark, tmp_path):
    """df.write.format('sstable_run'): tasks write temp runs, the commit
    renames them into place (abort-safe).  Read-back must equal the input
    cell set."""
    import os

    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.sources.sstable import register

    register(spark)
    out = str(tmp_path / "written")
    os.makedirs(out)
    cells = spark.createDataFrame(
        [(str(k), "c%d" % (k % 3), str(k).encode(), 1000 + k, None, None, False, False, None)
         for k in range(200)],
        "key string, col_name string, value binary, ts long, ttl int, "
        "expiration long, deleted boolean, range_tomb boolean, row_tomb_ts long",
    )
    cells.repartition(3).write.format("sstable_run").mode("append").save(out)

    back = spark.read.format("sstable_run").load(out)
    assert back.count() == 200
    got = {(r.key.decode(), r.col_name, bytes(r.value).decode(), r.ts) for r in back.collect()}
    want = {(str(k), "c%d" % (k % 3), str(k), 1000 + k) for k in range(200)}
    assert got == want
    # multiple runs were produced (one per non-empty task)
    assert back.select("run").distinct().count() >= 2


def test_datasource_ma_write_carries_range_tombstones(spark, tmp_path):
    """layout=ma write path serializes ck-bounded range tombstones (the
    r05 read/write asymmetry): a frame holding clustered cells, an
    overlapping pair of range tombstones, a ck-row deletion and a
    partition tombstone writes to real ma files and reads back with the
    tombstones intact — ranges in the writer's normalized disjoint form
    with pointwise-identical cover, nothing widened to the partition."""
    import os

    from cassandra2aerospike_spark.sources.sstable import register

    register(spark)
    out = str(tmp_path / "ma_rt_written")
    os.makedirs(out)
    schema = (
        "key string, col_name string, ck binary, value binary, ts long, "
        "ttl int, expiration long, deleted boolean, range_tomb boolean, "
        "row_tomb_ts long, ck_end binary, incl_mask int"
    )
    rows = [
        # clustered cells on k1
        ("k1", "v", b"d1", b"a", 1000, None, None, False, False, None, None, None),
        ("k1", "v", b"d5", b"b", 1001, None, None, False, False, None, None, None),
        # overlapping range tombstones [d1,d3) ts=5000 and [d2,d4] ts=6000
        ("k1", None, b"d1", None, 5000, None, None, False, True, None, b"d3", 1),
        ("k1", None, b"d2", None, 6000, None, None, False, True, None, b"d4", 3),
        # ck-row deletion at d5 (degenerate [d5,d5] both-inclusive)
        ("k1", None, b"d5", None, 7000, None, None, False, True, None, b"d5", 3),
        # k2: partition tombstone only
        ("k2", None, None, None, 9000, None, None, False, False, None, None, None),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.format(
        "sstable_run"
    ).option("layout", "ma").mode("append").save(out)

    back = spark.read.format("sstable_run").option("layout", "ma").load(out)
    rts = sorted(
        (bytes(r.ck), bytes(r.ck_end), r.incl_mask, r.ts)
        for r in back.filter("range_tomb AND col_name IS NULL AND key = CAST('k1' AS BINARY)").collect()
    )
    # normalized sweep: [d1,d2) keeps ts 5000, [d2,d4] takes 6000; the
    # d5 deletion rides its row (ck_tombs -> degenerate range on emit)
    assert (b"d1", b"d2", rts[0][2], 5000) == (rts[0][0], rts[0][1], rts[0][2], rts[0][3])
    assert (b"d2", b"d4", 6000) == (rts[1][0], rts[1][1], rts[1][3])
    assert (b"d5", b"d5", 3, 7000) in rts
    # partition tombstone survives on k2, nothing widened on k1
    k1_rows = back.filter("key = CAST('k1' AS BINARY)").collect()
    assert all(r.row_tomb_ts is None for r in k1_rows)
    k2 = back.filter("key = CAST('k2' AS BINARY)").collect()
    assert any(r.row_tomb_ts == 9000 for r in k2)
    # both cells present with their values
    cells = {
        (bytes(r.ck), bytes(r.value))
        for r in back.filter("col_name = 'v' AND NOT range_tomb").collect()
    }
    assert cells == {(b"d1", b"a"), (b"d5", b"b")}


def test_streaming_write_roundtrip(spark, tmp_path):
    """writeStream.format('sstable_run'): the stream reader's microbatches
    flow through a transform and land as new sorted runs — continuous
    ingest -> continuous run output, the 4th quadrant of the source."""
    import os

    from cassandra2aerospike_spark.sources.sstable import register
    from cassandra2aerospike_spark.sources.sstable.format import (
        Cell,
        Partition,
        RunWriter,
    )

    register(spark)
    src = str(tmp_path / "src"); os.makedirs(src)
    dst = str(tmp_path / "dst"); os.makedirs(dst)

    def write_run(gen, keys):
        w = RunWriter(src, gen)
        parts = [
            Partition(key=str(k).encode(), cells=[Cell(col_name="c", value=str(k).encode(), ts=k)])
            for k in keys
        ]
        for p in sorted(parts, key=lambda p: (p.token, p.key)):
            w.add(p)
        w.finish()

    write_run(1, range(0, 30))
    stream = spark.readStream.format("sstable_run").load(src)
    q = (
        stream.select("key", "col_name", "value", "ts", "ttl", "expiration",
                      "deleted", "range_tomb", "row_tomb_ts")
        .withColumn("key", stream.key.cast("string"))
        .writeStream.format("sstable_run")
        .option("path", dst)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        write_run(2, range(100, 120))
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.format("sstable_run").load(dst)
    assert back.count() == 50
    keys = {int(bytes(r.key).decode()) for r in back.select("key").collect()}
    assert keys == set(range(0, 30)) | set(range(100, 120))


def test_datasource_write_append_no_clobber(spark, tmp_path):
    """Second append write must land AFTER existing generations, never
    renaming over the first write's runs."""
    import os

    from cassandra2aerospike_spark.sources.sstable import register
    from cassandra2aerospike_spark.sources.sstable.format import discover_runs

    register(spark)
    out = str(tmp_path / "w"); os.makedirs(out)
    schema = ("key string, col_name string, value binary, ts long, ttl int, "
              "expiration long, deleted boolean, range_tomb boolean, row_tomb_ts long")

    def write(keys):
        df = spark.createDataFrame(
            [(str(k), "c", str(k).encode(), k, None, None, False, False, None) for k in keys],
            schema,
        )
        df.coalesce(1).write.format("sstable_run").mode("append").save(out)

    write(range(0, 50))
    gens1 = discover_runs(out)
    write(range(100, 150))
    gens2 = discover_runs(out)
    assert set(gens1) < set(gens2) and len(gens2) == len(gens1) + 1
    back = spark.read.format("sstable_run").load(out)
    keys = {int(bytes(r.key).decode()) for r in back.select("key").collect()}
    assert keys == set(range(0, 50)) | set(range(100, 150))


def test_tiny_chunks_stress_incremental_decode(tmp_path):
    """Chunk boundaries mid-partition everywhere: 64-byte chunks force the
    incremental decoder through its pull-more-bytes path on nearly every
    partition; full scan, bounded scan, and seek must all agree."""
    from cassandra2aerospike_spark.sources.sstable.format import (
        Cell,
        Partition,
        RunReader,
        RunWriter,
        token_of,
    )

    d = str(tmp_path)
    w = RunWriter(d, 1, chunk_size=64)
    parts = [
        Partition(
            key=str(k).encode(),
            cells=[
                Cell(col_name=f"c{j}", value=(str(k) * (j + 1)).encode(), ts=1000 + k + j)
                for j in range(3)
            ],
        )
        for k in range(50)
    ]
    parts.sort(key=lambda p: (p.token, p.key))
    for p in parts:
        w.add(p)
    w.finish()

    rr = RunReader(d, 1)
    full = list(rr.partitions())
    assert [p.key for p in full] == [p.key for p in parts]
    assert all(
        [c.value for c in a.cells] == [c.value for c in b.cells]
        for a, b in zip(full, parts)
    )
    # seek + end bound: middle third only
    toks = [p.token for p in parts]
    lo, hi = toks[15], toks[35]
    mid = list(RunReader(d, 1).partitions(start_token=lo, end_token=hi))
    assert [p.token for p in mid] == [t for t in toks if lo <= t < hi]


from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_cells = _st.lists(
    _st.tuples(
        _st.sampled_from(["a", "b", "c", "dd", "e1"]),          # col_name
        _st.binary(min_size=0, max_size=40),                     # value
        _st.integers(min_value=0, max_value=2**50),              # ts
        _st.one_of(_st.none(), _st.integers(min_value=0, max_value=10**6)),  # ttl
        _st.booleans(),                                          # deleted
        _st.booleans(),                                          # range_tomb
    ),
    max_size=6,
)

_parts = _st.dictionaries(
    _st.binary(min_size=1, max_size=24),                         # key
    _st.tuples(_st.one_of(_st.none(), _st.integers(min_value=0, max_value=2**50)), _cells),
    min_size=1,
    max_size=25,
)


from cassandra2aerospike_spark.sources.sstable.format import MAGIC as _MAGIC
from cassandra2aerospike_spark.sources.sstable.format import MAGIC_V0 as _MAGIC_V0
_codecs = ["deflate", "none", "snappy", "lz4"]


@_settings(max_examples=25, deadline=None, suppress_health_check=[_HC.too_slow])
@_given(
    data=_parts,
    chunk=_st.sampled_from([48, 256, 65536]),
    fmt=_st.sampled_from([_MAGIC, _MAGIC_V0]),
    codec=_st.sampled_from(_codecs),
)
def test_run_roundtrip_property(tmp_path_factory, data, chunk, fmt, codec):
    """Hypothesis roundtrip of the full run format: random keys, cells,
    tombstones, TTLs, chunk sizes, BOTH format generations and every
    importable chunk codec survive write -> read bit-exactly, in
    (token, key) order."""
    from cassandra2aerospike_spark.sources.sstable.format import (
        Cell,
        Partition,
        RunReader,
        RunWriter,
    )

    d = str(tmp_path_factory.mktemp("runs"))
    parts = []
    for key, (row_tomb, cells) in data.items():
        cs = [
            Cell(col_name=c, value=v, ts=ts, ttl=ttl,
                 expiration=(ts // 1000 + ttl) if ttl is not None else None,
                 deleted=dl, range_tomb=rt)
            for (c, v, ts, ttl, dl, rt) in cells
        ]
        parts.append(Partition(key=key, row_tomb_ts=row_tomb, cells=cs))
    parts.sort(key=lambda p: (p.token, p.key))
    w = RunWriter(d, 1, chunk_size=chunk, fmt=fmt, codec=codec)
    for p in parts:
        w.add(p)
    w.finish()

    got = list(RunReader(d, 1).partitions())
    assert [p.key for p in got] == [p.key for p in parts]
    for a, b in zip(got, parts):
        assert a.row_tomb_ts == b.row_tomb_ts
        assert len(a.cells) == len(b.cells)
        for ca, cb in zip(a.cells, b.cells):
            assert (ca.col_name, ca.ts, ca.ttl, ca.deleted, ca.range_tomb) == (
                cb.col_name, cb.ts, cb.ttl, cb.deleted, cb.range_tomb)
            if not cb.deleted:
                assert ca.value == cb.value
            assert ca.expiration == (cb.expiration if cb.ttl is not None else None)


# ------------------------------------------------- S5 codecs + checksums


from cassandra2aerospike_spark.sources.sstable import snappy_py
from cassandra2aerospike_spark.sources.sstable.format import (
    CHECKSUM_SPEC,
    FORMATS,
    MAGIC,
    MAGIC_V0,
    MAGIC_VA,
    encode_composite,
    unwrap_composite,
)


@given(st.binary(max_size=5000))
@settings(max_examples=200, deadline=None)
def test_snappy_roundtrip(b):
    assert snappy_py.decompress(snappy_py.compress(b)) == b


def test_snappy_compresses_repetition():
    raw = b"the quick brown fox " * 2000
    comp = snappy_py.compress(raw)
    assert len(comp) < len(raw) // 10
    assert snappy_py.decompress(comp) == raw


def test_snappy_overlapping_copy_and_one_byte_offset():
    # hand-built streams exercise the decoder paths our compressor does
    # not emit: overlapping copy (RLE) and the 1-byte / 4-byte offset forms
    rle = snappy_py._uvarint_enc(9) + bytes([0, ord("a")]) \
        + bytes([((8 - 1) << 2) | 2]) + (1).to_bytes(2, "little")
    assert snappy_py.decompress(rle) == b"a" * 9
    one = snappy_py._uvarint_enc(8) + bytes([3 << 2]) + b"abcd" \
        + bytes([1 | ((4 - 4) << 2)]) + bytes([4])  # copy1: len=4, off=4
    assert snappy_py.decompress(one) == b"abcdabcd"
    four = snappy_py._uvarint_enc(8) + bytes([3 << 2]) + b"abcd" \
        + bytes([3 | ((4 - 1) << 2)]) + (4).to_bytes(4, "little")
    assert snappy_py.decompress(four) == b"abcdabcd"


def test_snappy_rejects_bad_offset():
    bad = snappy_py._uvarint_enc(4) + bytes([((4 - 1) << 2) | 2]) + (9).to_bytes(2, "little")
    with pytest.raises(ValueError, match="offset"):
        snappy_py.decompress(bad)


def test_snappy_rejects_truncation_uniformly():
    """Every multi-byte read is bounds-checked: chopping a valid stream at
    ANY byte raises ValueError('snappy: ...'), never IndexError and never
    a silent short-value decode (the ADVICE r4 hazard)."""
    raw = b"abcdabcdabcdabcd truncation probe " * 8
    comp = snappy_py.compress(raw)
    for cut in range(len(comp)):
        with pytest.raises(ValueError, match="snappy"):
            snappy_py.decompress(comp[:cut])
    # extended-length literal with missing length bytes
    ext = snappy_py._uvarint_enc(300) + bytes([60 << 2])  # tag says 1 length byte
    with pytest.raises(ValueError, match="snappy"):
        snappy_py.decompress(ext)


# ------------------------------------------------------- S5 codec: LZ4


from cassandra2aerospike_spark.sources.sstable import lz4_py
from cassandra2aerospike_spark.sources.sstable.format import _lz4block


@given(st.binary(max_size=5000))
@settings(max_examples=200, deadline=None)
def test_lz4_roundtrip(b):
    assert lz4_py.decompress(lz4_py.compress(b)) == b


@given(st.binary(min_size=1, max_size=64).flatmap(
    lambda unit: st.integers(min_value=1, max_value=400).map(lambda k: unit * k)))
@settings(max_examples=60, deadline=None)
def test_lz4_roundtrip_repetitive(b):
    """Highly repetitive inputs force long matches, extended match-length
    bytes (low nibble 15 + 255-runs) and overlapping copies."""
    assert lz4_py.decompress(lz4_py.compress(b)) == b


def test_lz4_compresses_repetition():
    raw = b"the quick brown fox " * 2000
    comp = lz4_py.compress(raw)
    assert len(comp) < len(raw) // 10
    assert lz4_py.decompress(comp) == raw


def test_lz4_handbuilt_streams():
    # overlapping copy (RLE): 1 literal 'a', then match len 8 offset 1
    rle = (9).to_bytes(4, "little") + bytes([(1 << 4) | (8 - 4)]) + b"a" \
        + (1).to_bytes(2, "little")
    assert lz4_py.decompress(rle) == b"a" * 9
    # extended literal length: 16 literals needs 15 + ext byte 1
    lit = b"0123456789abcdef"
    ext = (16).to_bytes(4, "little") + bytes([0xF0, 1]) + lit
    assert lz4_py.decompress(ext) == lit
    # extended match length: 4 literals + match of 19 (15+4 -> ext 0)
    m = (23).to_bytes(4, "little") + bytes([(4 << 4) | 15]) + b"abcd" \
        + (4).to_bytes(2, "little") + bytes([0])
    assert lz4_py.decompress(m) == b"abcd" + b"abcd" * 4 + b"abc"
    # empty block
    assert lz4_py.decompress((0).to_bytes(4, "little") + b"\x00") == b""
    assert lz4_py.compress(b"") == (0).to_bytes(4, "little") + b"\x00"


def test_lz4_rejects_malformed():
    with pytest.raises(ValueError, match="lz4"):
        lz4_py.decompress(b"\x01\x00")  # truncated size prefix
    # zero offset
    bad = (8).to_bytes(4, "little") + bytes([(4 << 4) | 0]) + b"abcd" \
        + (0).to_bytes(2, "little")
    with pytest.raises(ValueError, match="offset"):
        lz4_py.decompress(bad)
    # offset beyond produced output
    far = (8).to_bytes(4, "little") + bytes([(4 << 4) | 0]) + b"abcd" \
        + (9).to_bytes(2, "little")
    with pytest.raises(ValueError, match="offset"):
        lz4_py.decompress(far)
    # length mismatch vs size prefix
    short = (99).to_bytes(4, "little") + bytes([4 << 4]) + b"abcd"
    with pytest.raises(ValueError, match="mismatch"):
        lz4_py.decompress(short)


def test_lz4_rejects_truncation_uniformly():
    raw = b"abcdabcdabcdabcd truncation probe " * 8
    comp = lz4_py.compress(raw)
    for cut in range(4, len(comp)):
        try:
            got = lz4_py.decompress(comp[:cut])
        except ValueError as e:
            assert "lz4" in str(e)
        else:
            pytest.fail(f"cut at {cut} decoded to {len(got)} bytes")


@pytest.mark.skipif(_lz4block is None, reason="real lz4 package not importable")
def test_lz4_interop_with_real_package():  # pragma: no cover - env-dependent
    """lz4_py's framing matches lz4.block store_size=True byte semantics:
    each decodes the other's output."""
    raw = b"interop " * 500 + bytes(range(256))
    assert _lz4block.decompress(lz4_py.compress(raw)) == raw
    assert lz4_py.decompress(_lz4block.compress(raw, store_size=True)) == raw


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("codec", ["deflate", "snappy", "lz4", "none"])
def test_format_codec_matrix_roundtrip_and_corruption(tmp_path, fmt, codec):
    """Every (format-era, codec) pair round-trips, and a flipped byte in
    Data.db is caught under that era's checksum discipline
    (SSTable.cpp:102-105: SGRA = CRC32-of-decompressed after, SGR0 =
    Adler32 before, SGR1 = CRC32 before)."""
    d = str(tmp_path / f"{fmt.decode()}_{codec}")
    parts = _mk_parts(60, seed=11)
    w = RunWriter(d, 1, chunk_size=2048, fmt=fmt, codec=codec)
    for p in parts:
        w.add(p)
    w.finish()
    got = list(RunReader(d, 1).partitions())
    assert [p.key for p in got] == [p.key for p in parts]
    assert all(
        [c.col_name for c in a.cells] == [c.col_name for c in b.cells]
        for a, b in zip(got, parts)
    )
    path = os.path.join(d, "1-Data.db")
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 3] ^= 0x55
    open(path, "wb").write(bytes(blob))
    _alg, before = CHECKSUM_SPEC[fmt]
    try:
        list(RunReader(d, 1).partitions())
    except (IOError, ValueError) as e:
        if before or codec == "none":
            # checksum of the corrupt side runs first: must be a mismatch
            assert "mismatch" in str(e), e
        else:
            # after-decompress discipline: the codec may reject the
            # corrupt bytes before the checksum gets to run
            assert "mismatch" in str(e) or "decompress failure" in str(e), e
    else:
        pytest.fail("corruption not detected")


def test_composite_unwrap_reference_semantics():
    # well-formed composite -> LAST component
    name = encode_composite([b"tmx", b"cols", b"price"])
    assert unwrap_composite(name) == b"price"
    assert unwrap_composite(encode_composite([b"x"])) == b"x"
    # flat ASCII names parse as a huge first length -> untouched
    for flat in (b"price", b"ab", b"c1", b"a"):
        assert unwrap_composite(flat) == flat
    # partial/malformed composite (trailing garbage) -> untouched
    partial = encode_composite([b"tmx"]) + b"\x00\x01"
    assert unwrap_composite(partial) == partial
    assert unwrap_composite(b"") == b""


@pytest.mark.parametrize("fmt", [MAGIC_VA, MAGIC_V0])
def test_composite_names_roundtrip(tmp_path, fmt):
    d = str(tmp_path / "comp")
    parts = _mk_parts(40, seed=13)
    w = RunWriter(d, 1, fmt=fmt, codec="snappy", composite_path=("ks", "tab"))
    for p in parts:
        w.add(p)
    w.finish()
    got = list(RunReader(d, 1).partitions())
    for a, b in zip(got, parts):
        assert [c.col_name for c in a.cells] == [c.col_name for c in b.cells]


def test_composite_path_rejected_for_new_format(tmp_path):
    with pytest.raises(ValueError, match="old-format"):
        RunWriter(str(tmp_path), 1, fmt=MAGIC, composite_path=("ks",))


def test_partitioner_name_in_statistics(tmp_path):
    d = str(tmp_path / "pn")
    w = RunWriter(d, 1, partitioner="byteordered")
    for p in _mk_parts(5, seed=17):
        w.add(p)
    w.finish()
    assert RunReader(d, 1).stats.partitioner == "byteordered"


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_unwrap_composite_total(b):
    """unwrap never crashes on arbitrary bytes and returns a slice of the
    input (either the whole name or one component's bytes)."""
    out = unwrap_composite(b)
    assert isinstance(out, bytes)
    assert out == b or out in b


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_snappy_decompress_never_hangs_on_garbage(b):
    """Arbitrary bytes either decode or raise cleanly (ValueError /
    IndexError from truncation) — no hangs, no silent wrong lengths."""
    try:
        out = snappy_py.decompress(b)
    except (ValueError, IndexError):
        return
    # if it decoded, the declared length matched
    n, _ = snappy_py._uvarint_dec(b, 0)
    assert len(out) == n


def test_stage_parquet_concurrency_and_idempotence(spark, tmp_path):
    """stage_parquet publishes via write-to-tmp + atomic rename: a
    repeat call reuses the winner's output (no rewrite — mtimes prove
    it); a loser racing a completed winner returns immediately; a
    crashed-winner dir (present, no marker) fails loudly with the
    remediation hint instead of serving partial data."""
    import os
    import time

    import pytest

    from cassandra2aerospike_spark.functions.dedup import stage_parquet

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "ck" / "stage1")
    out1 = stage_parquet(df, path)
    assert out1.count() == 100
    files = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    assert "_GRAFT_DONE" in files
    time.sleep(0.05)
    out2 = stage_parquet(df, path)  # idempotent reuse, no rewrite
    assert out2.count() == 100
    files2 = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    assert files == files2

    # crashed writer: dir exists without the marker -> loud timeout,
    # not silent partial reads (the wait loop's clock is monkeypatched
    # to advance 200s per call so the 300s deadline passes quickly)
    os.remove(os.path.join(path, "_GRAFT_DONE"))
    real_time = time.time
    t0 = real_time()
    state = {"n": 0}

    def advancing():  # each call jumps 200s: the 300s deadline passes fast
        state["n"] += 1
        return t0 + state["n"] * 200

    try:
        time.time = advancing
        with pytest.raises(TimeoutError, match="remove it to retry"):
            stage_parquet(df, path)
    finally:
        time.time = real_time


def test_staged_dir_concurrency_and_idempotence(tmp_path):
    """fixtures.staged_dir (the shared _DONE cache primitive behind
    every on-disk fixture, r08's unification of the four cache sites)
    under an actual two-builder race on ONE cache key: exactly one
    build publishes, the loser discards its tree and serves the
    winner's bytes, a repeat call never rebuilds, and no temp debris
    survives.  Clone of the stage_parquet twin the r07 verdict asked
    for (VERDICT r08 item 9)."""
    import os
    import threading
    import time

    from cassandra2aerospike_spark.sources.sstable.fixtures import staged_dir

    final = str(tmp_path / "cache" / "key1")
    built, results = [], {}
    barrier = threading.Barrier(2)

    def make_build(tag):
        def build(tmp_dir):
            barrier.wait(timeout=10)  # both builders inside build() at once
            built.append(tag)
            time.sleep(0.05)  # widen the publish race window
            with open(os.path.join(tmp_dir, "payload.txt"), "w") as fh:
                fh.write(tag)
        return build

    def run(tag):
        results[tag] = staged_dir(final, make_build(tag))

    threads = [threading.Thread(target=run, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert results == {"a": final, "b": final}
    assert sorted(built) == ["a", "b"]  # both built; only one published
    payload = open(os.path.join(final, "payload.txt")).read()
    assert payload in ("a", "b")  # one winner's bytes, never interleaved
    assert os.path.exists(os.path.join(final, "_DONE"))
    # no temp debris in the parent
    parent = os.path.dirname(final)
    assert os.listdir(parent) == ["key1"]

    # idempotent reuse: a third call must NOT invoke build again
    def must_not_run(tmp_dir):
        raise AssertionError("build ran on a completed cache key")

    assert staged_dir(final, must_not_run) == final
    assert open(os.path.join(final, "payload.txt")).read() == payload

    # loser arriving while the winner is mid-write AWAITS the marker
    # rather than reading a partial tree: start a slow winner, then a
    # fast loser 25ms later; the loser must return only after _DONE.
    final2 = str(tmp_path / "cache" / "key2")
    order = []

    def slow_build(tmp_dir):
        time.sleep(0.3)
        with open(os.path.join(tmp_dir, "payload.txt"), "w") as fh:
            fh.write("slow")
        order.append("winner-done")

    def fast_build(tmp_dir):
        with open(os.path.join(tmp_dir, "payload.txt"), "w") as fh:
            fh.write("fast")

    w = threading.Thread(target=lambda: staged_dir(final2, slow_build))
    w.start()
    time.sleep(0.025)

    def loser():
        staged_dir(final2, fast_build)
        order.append("loser-returned")

    l = threading.Thread(target=loser)
    l.start()
    w.join(timeout=30)
    l.join(timeout=30)
    assert os.path.exists(os.path.join(final2, "_DONE"))
    # whichever built, the published payload is a complete single write
    assert open(os.path.join(final2, "payload.txt")).read() in ("slow", "fast")
    assert "loser-returned" in order


def test_stream_cdc_incremental_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """The streaming answer to the reference's seek-to-key resume (O3):
    run the incremental stateful CDC over a table holding only
    generation 1, STOP, land generations 2-3, and restart against the
    SAME checkpoint.  The recovered per-key GroupState must continue
    the fold exactly — the union of both runs' emissions equals a
    single uninterrupted run over the full directory."""
    import os
    import shutil

    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )
    from cassandra2aerospike_spark.streaming import stream_cdc_incremental

    full_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    part_dir = str(tmp_path / "table")
    os.makedirs(part_dir)
    ckpt = str(tmp_path / "ckpt")

    def land(gen: int) -> None:
        for f in os.listdir(full_dir):
            if f.startswith(f"ma-{gen}-big-"):
                shutil.copy(os.path.join(full_dir, f), os.path.join(part_dir, f))

    def rows(df):
        # collect as a LIST first: the emission log must be duplicate-
        # free on its own (per-batch idempotent overwrite subdirs, the
        # round-11 advice fix) — a set here would mask replay dupes
        got = [(r.key, r.version, r.cols_str, r.expiry) for r in df.collect()]
        assert len(got) == len(set(got)), "duplicate emissions in the log"
        return set(got)

    land(1)
    first = rows(stream_cdc_incremental(spark, sf_dir, part_dir, ckpt))
    assert first and all(v == 1 for (_, v, _, _) in first)

    land(2)
    land(3)
    # same ckpt: the restarted query recovers the GroupState store and
    # folds only the NEW generations; the parquet emission log now holds
    # run 1 + run 2
    accumulated = rows(stream_cdc_incremental(spark, sf_dir, part_dir, ckpt))
    new_emissions = accumulated - first
    assert new_emissions and all(v in (2, 3) for (_, v, _, _) in new_emissions)

    uninterrupted = rows(stream_cdc_incremental(spark, sf_dir))
    assert accumulated == uninterrupted


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),       # column
            st.sampled_from(["cell", "point", "range", "row"]),
            st.integers(min_value=0, max_value=50),       # ts
            st.integers(min_value=0, max_value=99),       # value
        ),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),                # batch count
)
@settings(max_examples=120, deadline=None)
def test_cdc_prune_state_equivalence_and_bound(events, n_batches):
    """Round 11 (VERDICT r10 task 6): folding WITH per-batch pruning
    yields the same live record as the unpruned fold after every batch,
    and the pruned state is MINIMAL — ranges form the strict staircase
    (ends ascending => tombstone ts strictly descending, all above
    row_ts), every point sits above its residual coverage, every
    retained cell is live against coverage."""
    from cassandra2aerospike_spark.streaming.stream_queries import (
        cdc_fold_rows,
        cdc_live_record,
        cdc_prune_state,
    )

    eternal, now_floor = 4294967295, 0  # no expiry pressure in this model
    full = {"cells": {}, "points": {}, "ranges": {}, "row_ts": -(1 << 62)}
    pruned = {"cells": {}, "points": {}, "ranges": {}, "row_ts": -(1 << 62)}
    per_batch = [events[i::n_batches] for i in range(n_batches)]
    for batch in per_batch:
        rows = [(c, float(v), ts, None, k) for c, k, ts, v in batch]
        for st_ in (full, pruned):
            st_["row_ts"] = cdc_fold_rows(
                st_["cells"], st_["points"], st_["ranges"], st_["row_ts"], rows
            )
        cdc_prune_state(
            pruned["cells"], pruned["points"], pruned["ranges"], pruned["row_ts"]
        )
        want = cdc_live_record(
            full["cells"], full["points"], full["ranges"], full["row_ts"],
            eternal, now_floor,
        )
        got = cdc_live_record(
            pruned["cells"], pruned["points"], pruned["ranges"],
            pruned["row_ts"], eternal, now_floor,
        )
        assert got == want
        # staircase bound: ends ascending -> ts strictly descending,
        # all above row_ts
        ends = sorted(pruned["ranges"])
        rts = [pruned["ranges"][e] for e in ends]
        assert all(t > pruned["row_ts"] for t in rts)
        assert all(rts[i] > rts[i + 1] for i in range(len(rts) - 1))

        def cover(col):
            c = pruned["row_ts"]
            for ce, rt in pruned["ranges"].items():
                if ce >= col and rt > c:
                    c = rt
            return c

        assert all(ts > cover(c) for c, ts in pruned["points"].items())
        assert all(
            ts > max(cover(c), pruned["points"].get(c, -(1 << 62)))
            for c, (ts, _v, _e) in pruned["cells"].items()
        )
        # size bound: pruned holds no more than the distinct live steps
        assert len(pruned["ranges"]) <= len(set(full["ranges"].values()))


def test_stream_cdc_gc_grace_evicts_dead_state(spark, tmp_path):
    """gc-grace eviction end-to-end: a fully-dead key arms the
    processing-time timeout; after it fires (next run past the grace),
    the key's GroupState is GONE — proven by Cassandra's own observable
    for the contract: a write OLDER than the original tombstone landing
    after eviction RESURRECTS the record (with live state it would stay
    dead)."""
    import os
    import time

    from cassandra2aerospike_spark.sources.sstable.ma_format import MaWriter
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition
    from cassandra2aerospike_spark.streaming import stream_cdc_incremental

    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    cols = [("colA", "UTF8Type")]

    def write_gen(gen, parts):
        w = MaWriter(table, gen, cols, codec_class="LZ4Compressor")
        for p in parts:
            w.add(p)
        w.finish()

    def rows(df):
        return {(r.key, r.version, r.cols_str) for r in df.collect()}

    # gen 1: key 77 written then row-tombstoned at ts 500 (dead);
    # key 88 alive
    write_gen(1, [
        Partition(key=b"77", row_tomb_ts=500,
                  cells=[Cell("colA", b"1.0", ts=100)]),
        Partition(key=b"88", cells=[Cell("colA", b"8.0", ts=100)]),
    ])
    r1 = rows(stream_cdc_incremental(spark, "unused", table, ckpt, gc_grace_ms=1))
    assert (77, 1, None) in r1 and (88, 1, "colA=8.00") in r1

    time.sleep(0.2)  # let the 1 ms grace elapse in wall-clock time
    # gen 2: unrelated write; its batch fires 77's expired timer -> evict
    write_gen(2, [Partition(key=b"88", cells=[Cell("colA", b"9.0", ts=200)])])
    r2 = rows(stream_cdc_incremental(spark, "unused", table, ckpt, gc_grace_ms=1))
    new2 = r2 - r1
    assert new2 == {(88, 2, "colA=9.00")}  # no emission for evicted 77

    # gen 3: a write OLDER than the original tombstone (ts 300 < 500):
    # with the tombstone evicted it must RESURRECT
    write_gen(3, [Partition(key=b"77", cells=[Cell("colA", b"3.0", ts=300)])])
    r3 = rows(stream_cdc_incremental(spark, "unused", table, ckpt, gc_grace_ms=1))
    assert (77, 1, "colA=3.00") in r3 - r2


def test_stream_cdc_wire_apply_updates_and_deletes(spark, tmp_path):
    """Continuous CDC -> wire sync (round 11): REPLACE puts land
    updates, a record tombstoned in a later generation is DELETED from
    the server over the wire — the final store equals the full merge's
    live records (here: key 77 gone, key 88 at its newest value)."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import WireClient, WireServer
    from cassandra2aerospike_spark.sources.sstable import register
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition
    from cassandra2aerospike_spark.sources.sstable.ma_format import MaWriter
    from cassandra2aerospike_spark.streaming.stream_queries import (
        _cdc_incremental_result,
    )
    import tempfile

    table = str(tmp_path / "tbl")
    cols = [("colA", "UTF8Type")]
    w = MaWriter(table, 1, cols)
    w.add(Partition(key=b"77", cells=[Cell("colA", b"1.0", ts=100)]))
    w.add(Partition(key=b"88", cells=[Cell("colA", b"8.0", ts=100)]))
    w.finish()
    w = MaWriter(table, 2, cols)
    w.add(Partition(key=b"77", row_tomb_ts=500))
    w.add(Partition(key=b"88", cells=[Cell("colA", b"9.5", ts=200)]))
    w.finish()

    register(spark)
    res = _cdc_incremental_result(spark, table)
    srv = WireServer()
    host, port = srv.host, srv.port

    def apply_batch(batch_df, _bid):
        def part(rows):
            c = None
            hs = []
            for r in rows:
                if c is None:
                    c = WireClient(host, port, "t", "cdc")
                key = str(r["key"]).encode()
                if r["cols_str"] is None:
                    hs.append(c.delete(key))
                else:
                    bins = {
                        kv.split("=", 1)[0]: kv.split("=", 1)[1].encode()
                        for kv in r["cols_str"].split(",")
                    }
                    hs.append(c.put(key, bins, 0xFFFFFFFF, create_only=False))
            if c is not None:
                for h in hs:
                    assert c.wait(h) in ("ok", "not_found")
                c.close()

        batch_df.foreachPartition(part)

    q = (
        res.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_cwa_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    store = srv.records()
    srv.close()
    got = {
        digest.hex(): {n: v for n, v in bins.items()}
        for (_ns, _st, digest), (bins, _ttl) in store.items()
    }
    from cassandra2aerospike_spark.sinks.aerospike_wire import key_digest

    assert key_digest("cdc", b"77").hex() not in got  # deleted over the wire
    assert got == {key_digest("cdc", b"88").hex(): {"colA": b"9.50"}}
