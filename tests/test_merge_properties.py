"""Property-based tests (SURVEY.md §5) for the merge semantics: a pure
Python model of the reference's contract (classify -> tombstone cover ->
strict-ts liveness -> LWW) is checked against the Spark pipeline on
hypothesis-generated cell streams, including order-invariance (the
declarative analog of the reference's DEBUG merge-order assertions,
CassandraParser.cpp:424-432).
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra2aerospike_spark.operators import merge as M


# ---------------------------------------------------------------- model


def classify(eid: int) -> str:
    if eid % 97 == 0:
        return "row"
    if eid % 13 == 0:
        return "range"
    if eid % 10 == 0:
        return "point"
    return "cell"


def model_merge(events: list[dict]) -> dict:
    """Reference model: {(key, col): (value, ts)} of surviving LWW winners."""
    row_tomb: dict = {}
    range_tombs: dict = {}
    point_tomb: dict = {}
    cells: dict = {}
    for e in events:
        k, c, ts = e["user_id"], e["event_type"], e["ts_us"]
        kind = classify(e["event_id"])
        if kind == "row":
            row_tomb[k] = max(row_tomb.get(k, ts), ts)
        elif kind == "range":
            range_tombs.setdefault(k, []).append((c, ts))
        elif kind == "point":
            point_tomb[(k, c)] = max(point_tomb.get((k, c), ts), ts)
        else:
            cells.setdefault((k, c), []).append((ts, e["value"]))
    out = {}
    for (k, c), versions in cells.items():
        cover = [-1]
        if k in row_tomb:
            cover.append(row_tomb[k])
        if (k, c) in point_tomb:
            cover.append(point_tomb[(k, c)])
        for end, ts in range_tombs.get(k, []):
            if c <= end:
                cover.append(ts)
        tomb = max(cover)
        ts, value = max(versions)  # unique ts by construction
        if ts > tomb:
            out[(k, c)] = (value, ts)
    return out


# ------------------------------------------------------------- strategies

# small key/col spaces force collisions (versions, tombstone overlap);
# unique ts avoids LWW tie nondeterminism (documented divergence:
# SURVEY.md §7 "hard parts")
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),  # event_id -> kind mix
        st.integers(min_value=1, max_value=5),  # user_id
        st.sampled_from(["a", "b", "c", "d"]),  # event_type
        st.integers(min_value=0, max_value=999),  # value (int-valued double)
    ),
    min_size=1,
    max_size=60,
).map(
    lambda rows: [
        {
            "event_id": eid,
            "user_id": uid,
            "event_type": et,
            "value": float(v),
            "ts_us": 1_700_000_000_000_000 + i,  # unique, increasing
        }
        for i, (eid, uid, et, v) in enumerate(rows)
    ]
)


def _spark_merge(spark, events: list[dict]) -> dict:
    df = spark.createDataFrame(
        [(e["event_id"], e["user_id"], e["event_type"], e["value"], e["ts_us"]) for e in events],
        "event_id long, user_id long, event_type string, value double, ts_us long",
    )
    got = M.merged_latest_cells(df).collect()
    return {(r.key, r.col_name): (r.value, r.ts) for r in got}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_spark_merge_matches_model(spark, events):
    assert _spark_merge(spark, events) == model_merge(events)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, seed=st.integers(min_value=0, max_value=999))
def test_merge_is_order_invariant(spark, events, seed):
    """Commutativity across run order: shuffling the input (≡ arbitrary
    run assignment/arrival order) cannot change the merge result."""
    shuffled = events[:]
    random.Random(seed).shuffle(shuffled)
    assert _spark_merge(spark, shuffled) == model_merge(events)


def test_merge_idempotent_under_duplication(spark):
    """Idempotence: replaying the whole stream twice (≡ the same run
    appearing in two SSTable generations) is a no-op."""
    events = [
        {
            "event_id": i * 7 + 1,
            "user_id": i % 3,
            "event_type": "ab"[i % 2],
            "value": float(i),
            "ts_us": 1_700_000_000_000_000 + i,
        }
        for i in range(40)
    ]
    once = _spark_merge(spark, events)
    twice = _spark_merge(spark, events + events)
    assert once == twice and len(once) > 0


# --------------------------------------------- incremental CDC fold


_CDC_ORACLE_SQL = """
WITH cls AS (SELECT * FROM rows_tbl),
cells AS (
  SELECT col, value, ts, exp FROM cls WHERE kind = 'cell'
),
cover AS (
  SELECT c.col, max(t.ts) AS tomb_ts
  FROM (SELECT DISTINCT col FROM cells) c
  JOIN cls t ON (t.kind = 'point' AND t.col = c.col)
             OR (t.kind = 'row')
             OR (t.kind = 'range' AND t.col >= c.col)
  GROUP BY c.col
),
latest AS (
  SELECT col, arg_max(value, ts) AS value,
         arg_max(coalesce(exp, -1), ts) AS exp  -- arg_max skips NULLs
  FROM cells c
  WHERE NOT EXISTS (SELECT 1 FROM cover v
                    WHERE v.col = c.col AND c.ts <= v.tomb_ts)
  GROUP BY col
)
SELECT col, value, exp FROM latest
"""


@settings(
    max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(st.data())
def test_cdc_fold_matches_duckdb_mini_merge(data):
    """The incremental CDC state fold (streaming/stream_queries.py:
    cdc_fold_rows + cdc_live_record) agrees with an INDEPENDENT DuckDB
    merge over the same classified rows — per-column LWW under
    row/point/range tombstone cover with strict-ts liveness — for
    arbitrary row sets, and is invariant under any batch split (the
    state round-trip can't change the answer).  Timestamps are drawn
    distinct so cross-engine tie order never enters."""
    import duckdb

    from cassandra2aerospike_spark.streaming.stream_queries import (
        cdc_fold_rows,
        cdc_live_record,
    )

    cols = ["a", "ab", "b", "zz"]
    kinds = ["cell", "cell", "cell", "point", "row", "range"]
    n = data.draw(st.integers(min_value=1, max_value=24))
    ts_pool = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=10**9),
            min_size=n, max_size=n, unique=True,
        )
    )
    rows = []
    for i in range(n):
        kind = data.draw(st.sampled_from(kinds))
        col = data.draw(st.sampled_from(cols))
        val = float(data.draw(st.integers(min_value=-999, max_value=999))) / 4
        exp = data.draw(st.sampled_from([None, 10**9, 2 * 10**9]))
        rows.append((col, val, ts_pool[i], exp, kind))

    # fold over a random batch split
    n_splits = data.draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n),
                min_size=n_splits - 1, max_size=n_splits - 1,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [n]:
        batches.append(rows[prev:c])
        prev = c
    cells, points, ranges, row_ts = {}, {}, {}, -(1 << 62)
    for b in batches:
        row_ts = cdc_fold_rows(cells, points, ranges, row_ts, b)
    eternal, now_floor = 4294967295, 0  # no expiry filtering in this model
    cols_str, expiry = cdc_live_record(
        cells, points, ranges, row_ts, eternal, now_floor
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rows_tbl (col VARCHAR, value DOUBLE, ts BIGINT, "
        "exp BIGINT, kind VARCHAR)"
    )
    con.executemany(
        "INSERT INTO rows_tbl VALUES (?, ?, ?, ?, ?)",
        [(c, v, t, e, k) for (c, v, t, e, k) in rows],
    )
    live = con.execute(_CDC_ORACLE_SQL).fetchall()
    if not live:
        assert cols_str is None and expiry is None
        return
    want_cols = ",".join(sorted(f"{c}={v:.2f}" for c, v, _ in live))
    exps = [e for _, _, e in live]
    want_exp = eternal if any(e == -1 for e in exps) else max(exps)
    assert cols_str == want_cols
    assert expiry == want_exp
