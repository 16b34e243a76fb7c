"""Counter-context codec + reconciliation semantics (pure Python; the
Spark path is driver-checked by a7_counter_reconcile).  Layout per the
public Cassandra CounterContext design; the reference stops at the
counter timestamp (SSTable.cpp:433-437) and never opens the blob."""

from __future__ import annotations

import struct

import pytest

from cassandra2aerospike_spark.functions.counters import (
    decode_counter_context_py,
    encode_counter_context,
)


def _cid(i: int) -> bytes:
    return struct.pack(">IIII", 0, 0, 0, i)


def test_roundtrip_sorted_and_header():
    shards = [(_cid(3), 100, 7), (_cid(1), 50, -2)]
    blob = encode_counter_context(shards, header=(0, -1))
    # header is skipped, shards come back id-sorted
    assert decode_counter_context_py(blob) == [
        (_cid(1), 50, -2),
        (_cid(3), 100, 7),
    ]


def test_empty_context():
    assert decode_counter_context_py(encode_counter_context([])) == []


def test_truncation_fails_uniformly():
    blob = encode_counter_context([(_cid(1), 50, 2)], header=(4,))
    for cut in range(len(blob)):
        if cut in (2 + 2,):  # header-only prefix of exact shard multiple?
            pass
        try:
            decode_counter_context_py(blob[:cut])
        except ValueError:
            continue
        # a cut is only decodable if it lands exactly on a shard
        # boundary after the header
        assert cut >= 4 and (cut - 4) % 32 == 0
    with pytest.raises(ValueError, match="negative"):
        decode_counter_context_py(struct.pack(">h", -1))
    with pytest.raises(ValueError, match="counter_id"):
        encode_counter_context([(b"short", 1, 1)])


def test_reconcile_matches_brute_force():
    """The (max clock, then max count) shard rule, replayed over every
    context version: sum of surviving shard counts."""
    versions = [
        [(_cid(1), 10, 5), (_cid(2), 10, 3)],
        [(_cid(1), 20, 9)],                      # newer clock wins
        [(_cid(2), 10, 4)],                      # clock tie: higher count
        [(_cid(3), 1, 100)],
    ]
    best: dict[bytes, tuple[int, int]] = {}
    for ctx in versions:
        for cid, clock, count in decode_counter_context_py(
            encode_counter_context(ctx)
        ):
            if cid not in best or (clock, count) > best[cid]:
                best[cid] = (clock, count)
    assert sum(c for _cl, c in best.values()) == 9 + 4 + 100


def test_ma_era_counter_table_roundtrip(tmp_path):
    """A Cassandra 3.x counter table (CounterColumnType in the
    serialization header, context blobs as vint-length cell values)
    writes and reads through the ma path; TTL on a counter cell is
    refused (counters never expire)."""
    import pytest

    from cassandra2aerospike_spark.functions.counters import (
        decode_counter_context_py,
        encode_counter_context,
    )
    from cassandra2aerospike_spark.sources.sstable import ma_format as MA
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        struct_pack_counter_id,
    )
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition

    d = str(tmp_path / "ctr_ma")
    w = MA.MaWriter(d, 1, [("hits", "CounterColumnType")])
    ctx1 = encode_counter_context([(struct_pack_counter_id(0), 10, 5)])
    ctx2 = encode_counter_context(
        [(struct_pack_counter_id(0), 12, 7), (struct_pack_counter_id(1), 3, 2)]
    )
    w.add(Partition(key=b"k1", cells=[
        Cell("hits", ctx1, ts=100), Cell("hits", ctx2, ts=200),
    ]))
    w.finish()
    r = MA.MaReader(d, 1)
    assert r.stats.schema.regular_columns == [("hits", "CounterColumnType")]
    (_t, p), = r.partitions()
    assert [c.value for c in p.cells] == [ctx1, ctx2]
    # contexts decode back shard-exact
    assert decode_counter_context_py(ctx2) == [
        (struct_pack_counter_id(0), 12, 7), (struct_pack_counter_id(1), 3, 2)
    ]
    # counters never expire: a TTL'd counter cell is refused at encode
    w2 = MA.MaWriter(str(tmp_path / "bad"), 1, [("hits", "CounterColumnType")])
    w2.add(Partition(key=b"k", cells=[
        Cell("hits", ctx1, ts=1, ttl=60, expiration=100)
    ]))
    with pytest.raises(ValueError, match="TTL"):
        w2.finish()
