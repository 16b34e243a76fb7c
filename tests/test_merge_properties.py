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
