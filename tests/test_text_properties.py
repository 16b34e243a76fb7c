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


def test_chunk_windows_cover_every_token(spark):
    """Property: with window 64 / stride 48, chunk spans tile each doc —
    starts at 0,48,96..., every token index falls in >= 1 chunk, overlap
    between consecutive chunks is exactly 16 tokens (until the tail),
    and md5 identities match the token slices."""
    import hashlib

    from cassandra2aerospike_spark.queries.text_q import q_text_chunk_windows

    rows = [
        (1, " ".join(f"w{i}" for i in range(200))),   # 200 toks -> 4 chunks
        (2, " ".join(f"x{i}" for i in range(64))),    # exactly one window
        (3, " ".join(f"y{i}" for i in range(65))),    # 2 chunks, short tail
        (4, "a b c"),                                  # tiny: one short chunk
        (5, ""),                                       # empty: no chunks
    ]
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="chunk_prop_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    got = {}
    for r in q_text_chunk_windows(spark, d).collect():
        got.setdefault(r.doc_id, []).append(r)
    assert 5 not in got
    toks = {i: rows[i - 1][1].split() for i in (1, 2, 3, 4)}
    for doc_id, chunks in got.items():
        chunks.sort(key=lambda r: r.start_tok)
        n = len(toks[doc_id])
        # tiling: 0-based starts 0, 48, 96, ... cover every token index
        assert [c.start_tok for c in chunks] == list(range(0, max(n - 16, 1), 48))
        covered = set()
        for c in chunks:
            covered.update(range(c.start_tok, c.start_tok + c.n_chunk_tokens))
            want = " ".join(toks[doc_id][c.start_tok : c.start_tok + 64])
            assert c.chunk_md5 == hashlib.md5(want.encode()).hexdigest()
        assert covered == set(range(n))
    assert len(got[1]) == 4 and len(got[2]) == 1 and len(got[3]) == 2


def test_dup_span_removal_islands(spark):
    """Crafted corpus with a known duplicated substring: two docs share a
    20-token run (plus distinct tails), so 12-grams at starts 1..9 of
    the run are duplicated and must merge into ONE maximal island per
    doc covering exactly the shared run; a doc with no duplication
    emits nothing; self-repetition inside one doc also flags."""
    import os
    import tempfile

    from cassandra2aerospike_spark.queries.text_q import q_text_dup_span_removal

    shared = " ".join(f"s{i}" for i in range(20))         # 20 shared tokens
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    rep = " ".join(f"r{i % 12}" for i in range(24))       # self-repeat 12-gram
    rows = [
        (1, shared + " " + uniq("a", 30)),
        (2, uniq("b", 7) + " " + shared + " " + uniq("c", 9)),
        (3, uniq("d", 40)),                                # clean doc
        (4, rep),                                          # self-duplication
    ]
    d = tempfile.mkdtemp(prefix="span_prop_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    got = {}
    for r in q_text_dup_span_removal(spark, d).collect():
        got.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok, r.span_tokens))
    assert 3 not in got
    # doc 1: shared run occupies tokens 1..20 -> one island [1, 20]
    assert got[1] == [(1, 20, 20)]
    # doc 2: shared run occupies tokens 8..27 -> one island [8, 27]
    assert got[2] == [(8, 27, 20)]
    # doc 4: every 12-gram repeats (period 12 over 24 tokens) -> the
    # whole doc is one flagged island
    assert got[4] == [(1, 24, 24)]
