"""Hypothesis properties for the in-row text folds (functions/text.py):
the sorted-run mode and duplicated-run character measures must agree
with plain Python reference implementations on arbitrary token lists."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra2aerospike_spark.functions.text import (
    _dup_run_chars,
    _mode_run,
    ngrams_of,
)

_words = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e", "ffff", "g"]),
    min_size=0,
    max_size=40,
)


def _py_mode(vals: list[str]) -> tuple[int, str]:
    if not vals:
        return 0, ""
    c = Counter(vals)
    best_cnt = max(c.values())
    best_val = min(v for v, n in c.items() if n == best_cnt)
    return best_cnt, best_val


def _py_dup_chars(vals: list[str]) -> int:
    c = Counter(vals)
    return sum(n * len(v) for v, n in c.items() if n >= 2)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vals=_words)
def test_mode_run_matches_python(spark, vals):
    df = spark.createDataFrame([(vals,)], "arr array<string>")
    got = df.select(_mode_run(F.array_sort(F.col("arr"))).alias("m")).collect()[0].m
    cnt, val = _py_mode(vals)
    assert (got.cnt, got.val) == (cnt, val)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vals=_words)
def test_dup_run_chars_matches_python(spark, vals):
    df = spark.createDataFrame([(vals,)], "arr array<string>")
    got = df.select(
        _dup_run_chars(F.array_sort(F.col("arr"))).alias("d")
    ).collect()[0].d
    assert got == _py_dup_chars(vals)


def test_ngrams_positions(spark):
    df = spark.createDataFrame([(["w1", "w2", "w3", "w4"],)], "t array<string>")
    g2 = df.select(ngrams_of(F.col("t"), 2).alias("g")).collect()[0].g
    assert g2 == ["w1 w2", "w2 w3", "w3 w4"]
    g5 = df.select(ngrams_of(F.col("t"), 5).alias("g")).collect()[0].g
    assert g5 == []
