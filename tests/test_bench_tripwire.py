"""bench.py regression-tripwire unit tests (round 11): baseline
resolution order (newest BENCH_r*.json parsed stdout, BENCH_DETAIL
fallback) and the normalized-median comparison rule — no Spark."""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join("/root/repo", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_prev_normalized_prefers_newest_round(tmp_path):
    bench = _load_bench()
    d = str(tmp_path)
    json.dump(
        {"parsed": {"queries_warm_normalized": {"q": 1.0}}},
        open(os.path.join(d, "BENCH_r09.json"), "w"),
    )
    json.dump(
        {"parsed": {"queries_warm": {"q": 2.0}, "host_speed_factor": 0.5}},
        open(os.path.join(d, "BENCH_r10.json"), "w"),
    )
    tag, prev = bench._prev_normalized(d)
    assert tag == "BENCH_r10"
    assert prev == {"q": 4.0}  # warm / factor


def test_prev_normalized_detail_fallback(tmp_path):
    bench = _load_bench()
    d = str(tmp_path)
    # a round file with NO per-query maps must be skipped
    json.dump({"parsed": {"value": 1}}, open(os.path.join(d, "BENCH_r10.json"), "w"))
    json.dump(
        {"queries_warm": {"a": 1.5}, "host_speed_factor": 0.75},
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    tag, prev = bench._prev_normalized(d)
    assert tag == "BENCH_DETAIL"
    assert prev == {"a": 2.0}


def test_prev_normalized_empty_dir(tmp_path):
    bench = _load_bench()
    tag, prev = bench._prev_normalized(str(tmp_path))
    assert tag is None and prev == {}
