"""Unit tests for the merge-semantics core on hand-built cell frames —
tombstone coverage, LWW tie behavior, expiry folding (SURVEY.md §2.2/2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra2aerospike_spark.operators import merge


def _mk_events(spark, rows):
    """rows: (event_id, user_id, event_type, value, ts_us)"""
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts_us long"
    )
    return df.withColumn("ts_ns", F.col("ts_us") * 1000)


def test_point_tombstone_kills_older_cell_only(spark):
    # event_id 10 => point tombstone on (1, 'a') at ts 500
    ev = _mk_events(
        spark,
        [
            (1, 1, "a", 1.0, 400),   # dead: ts 400 <= tomb 500
            (2, 1, "a", 2.0, 600),   # live: ts 600 > tomb 500
            (3, 1, "b", 3.0, 100),   # live: different column
            (10, 1, "a", 0.0, 500),  # the tombstone
        ],
    )
    live = merge.live_cells(ev).orderBy("col_name", "ts").collect()
    assert [(r.col_name, r.value) for r in live] == [("a", 2.0), ("b", 3.0)]


def test_cell_at_tombstone_ts_dies(spark):
    # reference survival is strict ts > tomb_ts (CassandraParser.cpp:481)
    ev = _mk_events(spark, [(1, 1, "a", 1.0, 500), (10, 1, "a", 0.0, 500)])
    assert merge.live_cells(ev).count() == 0


def test_row_tombstone_kills_all_columns(spark):
    # event_id 97 => row tombstone on key 1 at ts 1000
    ev = _mk_events(
        spark,
        [
            (1, 1, "a", 1.0, 900),    # dead
            (2, 1, "b", 2.0, 999),    # dead
            (3, 1, "c", 3.0, 1001),   # live (written after row deletion)
            (4, 2, "a", 4.0, 500),    # live (other key)
            (97, 1, "zz", 0.0, 1000), # the row tombstone
        ],
    )
    live = merge.live_cells(ev).orderBy("key", "col_name").collect()
    assert [(r.key, r.col_name) for r in live] == [(1, "c"), (2, "a")]


def test_range_tombstone_covers_prefix(spark):
    # event_id 13 => range tombstone: kills cols <= 'b' on key 1 at ts 1000
    ev = _mk_events(
        spark,
        [
            (1, 1, "a", 1.0, 900),    # dead: 'a' <= 'b', ts < 1000
            (2, 1, "b", 2.0, 900),    # dead: 'b' <= 'b'
            (3, 1, "c", 3.0, 900),    # live: 'c' > 'b'
            (4, 1, "a", 4.0, 1100),   # live: written after
            (13, 1, "b", 0.0, 1000),  # the range tombstone (col_end='b')
        ],
    )
    live = merge.live_cells(ev).orderBy("col_name", "ts").collect()
    assert [(r.col_name, r.value) for r in live] == [("a", 4.0), ("c", 3.0)]


def test_ghost_row_eliminated(spark):
    # all of key 1's cells dead -> key absent from merged output (F2)
    ev = _mk_events(
        spark,
        [
            (1, 1, "a", 1.0, 400),
            (10, 1, "a", 0.0, 500),
            (2, 2, "a", 2.0, 400),
        ],
    )
    recs = merge.merge_records(ev).collect()
    assert [r.key for r in recs] == [2]


def test_lww_picks_max_ts(spark):
    ev = _mk_events(
        spark,
        [(1, 1, "a", 1.0, 100), (2, 1, "a", 2.0, 300), (3, 1, "a", 3.0, 200)],
    )
    latest = merge.lww_latest(merge.live_cells(ev)).collect()
    assert len(latest) == 1 and latest[0].value == 2.0 and latest[0].ts == 300


def test_expiry_fold_modes(spark):
    # event_id 7, 14 => expiring cells (ttl 3600); 1 => eternal cell
    ev = _mk_events(
        spark,
        [
            (7, 1, "a", 1.0, 100_000_000),   # expiration 3700
            (14, 1, "b", 2.0, 200_000_000),  # expiration 3800
            (1, 1, "c", 3.0, 100),           # non-TTL
            (7 * 31, 2, "a", 4.0, 100_000_000),  # only expiring cells on key 2
        ],
    )
    last = {r.key: r.expiry for r in merge.fold_expiry(
        merge.lww_latest(merge.live_cells(ev))).collect()}
    first = {r.key: r.expiry for r in merge.fold_expiry(
        merge.lww_latest(merge.live_cells(ev)), first_expiring=True).collect()}
    # key 1: non-TTL cell forces ETERNAL in last mode; min expiration in first
    assert last[1] == merge.ETERNAL and first[1] == 3700
    # key 2: all expiring -> max in last mode
    assert last[2] == 3700 and first[2] == 3700


def test_filter_expired(spark):
    rows = [(1, 100, 1), (2, merge.ETERNAL, 1), (3, merge.NOW_EPOCH_S + 10, 1)]
    recs = spark.createDataFrame(rows, "key long, expiry long, n_cols long")
    kept = sorted(r.key for r in merge.filter_expired(recs).collect())
    assert kept == [2, 3]
