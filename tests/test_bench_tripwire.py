"""bench.py regression-tripwire unit tests (rounds 11-13): baseline
resolution (per-query MIN across all same-host-tag artifacts —
BENCH_r*.json parsed stdout + committed BENCH_DETAIL), the host-tag
refusal rule, and the compact short-name normalized map — no Spark."""

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


def test_prev_normalized_takes_per_query_min_across_artifacts(tmp_path):
    """VERDICT r12 task 2: a newer CONTENDED artifact (inflated values)
    must not mask the older clean figure — the baseline is the
    per-query MIN across all same-tag artifacts, so each query's
    baseline comes from whichever artifact measured it best."""
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    json.dump(
        {
            "parsed": {
                "queries_warm_normalized": {"q": 1.0, "r": 5.0},
                "host_tag": tag,
            }
        },
        open(os.path.join(d, "BENCH_r09.json"), "w"),
    )
    # newer round, contended: q inflated 4x, but r measured cleaner
    json.dump(
        {
            "parsed": {
                "queries_warm": {"q": 2.0, "r": 1.5},
                "host_speed_factor": 0.5,
                "host_tag": tag,
            }
        },
        open(os.path.join(d, "BENCH_r10.json"), "w"),
    )
    btag, prev = bench._prev_normalized(d, ["q", "r"], tag)
    assert prev == {"q": 1.0, "r": 3.0}  # q from r09, r from r10 (1.5/0.5)
    assert btag == "min(BENCH_r09,BENCH_r10)"


def test_prev_normalized_refuses_foreign_or_missing_tag(tmp_path):
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    # r11-era artifact: per-query map but NO host_tag -> refused (this
    # is exactly the builder-idle vs driver-contended r11 mismatch)
    json.dump(
        {"parsed": {"queries_warm_normalized": {"q": 1.0}}},
        open(os.path.join(d, "BENCH_r11.json"), "w"),
    )
    # different machine -> refused
    json.dump(
        {
            "parsed": {
                "queries_warm_normalized": {"q": 1.0},
                "host_tag": "deadbeef",
            }
        },
        open(os.path.join(d, "BENCH_r12.json"), "w"),
    )
    json.dump(
        {"queries_warm": {"a": 1.5}, "host_speed_factor": 0.75},
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    btag, prev = bench._prev_normalized(d, ["q", "a"], tag)
    assert btag is None and prev == {}


def test_prev_normalized_detail_participates_same_tag(tmp_path):
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    json.dump({"parsed": {"value": 1}}, open(os.path.join(d, "BENCH_r10.json"), "w"))
    json.dump(
        {"queries_warm": {"a": 1.5}, "host_speed_factor": 0.75, "host_tag": tag},
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    btag, prev = bench._prev_normalized(d, ["a"], tag)
    assert btag == "min(BENCH_DETAIL)"
    assert prev == {"a": 2.0}


def test_prev_normalized_detail_min_beats_contended_round(tmp_path):
    """The exact r12->r13 shape: the committed idle BENCH_DETAIL carries
    the clean wire-family figures; the newest BENCH_r*.json is the
    contended driver run.  The baseline must use the idle numbers."""
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    json.dump(
        {
            "parsed": {
                "queries_warm_normalized": {"s40": 8.78, "s41": 6.92},
                "host_tag": tag,
                "sf": 0.1,
            }
        },
        open(os.path.join(d, "BENCH_r12.json"), "w"),
    )
    json.dump(
        {
            "queries_warm_normalized": {"s40": 2.49, "s41": 2.08},
            "host_tag": tag,
            "sf": 0.1,
        },
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    btag, prev = bench._prev_normalized(d, ["s40", "s41"], tag, sf=0.1)
    assert prev == {"s40": 2.49, "s41": 2.08}
    assert btag == "min(BENCH_DETAIL)"


def test_prev_normalized_unshortens_qn_map(tmp_path):
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    names = ["s29_bloom_lookup_merge", "text_quality"]
    qn = {bench.short_name(n): 1.25 for n in names}
    json.dump(
        {"parsed": {"qn": qn, "host_tag": tag}},
        open(os.path.join(d, "BENCH_r12.json"), "w"),
    )
    btag, prev = bench._prev_normalized(d, names, tag)
    assert btag == "min(BENCH_r12)"
    assert prev == {n: 1.25 for n in names}


def test_prev_normalized_empty_dir(tmp_path):
    bench = _load_bench()
    tag, prev = bench._prev_normalized(str(tmp_path), [], bench.host_tag())
    assert tag is None and prev == {}


def test_short_map_collision_falls_back_to_full_names():
    bench = _load_bench()
    # 'abcd_efgh' and 'abcdq_efghq' share short form 'abcdefgh'
    m = bench.short_map({"abcd_efgh": 1.0, "abcdq_efghq": 2.0, "other_q": 3.0})
    assert m == {
        "abcd_efgh": 1.0,
        "abcdq_efghq": 2.0,
        bench.short_name("other_q"): 3.0,
    }


def test_headline_short_names_are_collision_free():
    bench = _load_bench()
    shorts = [bench.short_name(n) for n in bench.HEADLINE]
    assert len(set(shorts)) == len(shorts)


def test_registry_short_names_are_collision_free():
    """All 170+ registry names stay distinct under the shortener, so the
    qn map round-trips losslessly even if HEADLINE grows to cover them."""
    bench = _load_bench()
    sys.path.insert(0, "/root/repo")
    from cassandra2aerospike_spark.queries import QUERIES

    shorts = [bench.short_name(n) for n in QUERIES]
    assert len(set(shorts)) == len(shorts)


def test_prev_raw_warm_min_across_artifacts(tmp_path):
    """The raw-series second gate (r13, s37 adjudication): raw warm
    baselines come from any same-tag artifact carrying queries_warm —
    in practice the committed BENCH_DETAIL — taking the per-query min,
    with foreign tags and other scale factors refused."""
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    json.dump(
        {"parsed": {"queries_warm": {"s37": 1.3}, "host_tag": tag, "sf": 0.1}},
        open(os.path.join(d, "BENCH_r12.json"), "w"),
    )
    json.dump(
        {"queries_warm": {"s37": 0.91, "q2": 2.0}, "host_tag": tag, "sf": 0.1},
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    # foreign tag: ignored entirely
    json.dump(
        {"parsed": {"queries_warm": {"s37": 0.1}, "host_tag": "ffff", "sf": 0.1}},
        open(os.path.join(d, "BENCH_r11.json"), "w"),
    )
    raw = bench._prev_raw_warm(d, ["s37", "q2"], tag, sf=0.1)
    assert raw == {"s37": 0.91, "q2": 2.0}
    # wrong sf: refused
    assert bench._prev_raw_warm(d, ["s37"], tag, sf=0.01) == {}


def _git(d, *args):
    import subprocess

    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
        cwd=d, check=True, capture_output=True,
    )


def test_committed_detail_participates_even_when_working_tree_clobbered(tmp_path):
    """VERDICT r13 task 2: the driver's post-commit bench run overwrites
    the working-tree BENCH_DETAIL.json with a contended measurement.
    The committed idle anchor must still participate in the baseline
    min via git history — the working file being clobbered (or even
    committed as-is later) cannot lose the best same-tag figure."""
    bench = _load_bench()
    d = str(tmp_path)
    tag = bench.host_tag()
    _git(d, "init", "-q")
    # commit the IDLE anchor
    json.dump(
        {"queries_warm": {"s33": 1.0}, "qn": {"s33": 1.1}, "host_tag": tag, "sf": 0.1},
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    _git(d, "add", "BENCH_DETAIL.json")
    _git(d, "commit", "-qm", "idle anchor")
    # driver clobbers the working tree with a contended run
    json.dump(
        {"queries_warm": {"s33": 2.5}, "qn": {"s33": 2.7}, "host_tag": tag, "sf": 0.1},
        open(os.path.join(d, "BENCH_DETAIL.json"), "w"),
    )
    raw = bench._prev_raw_warm(d, ["s33"], tag, sf=0.1)
    assert raw == {"s33": 1.0}, raw  # idle git version wins the min
    label, norm = bench._prev_normalized(d, ["s33"], tag, sf=0.1)
    assert norm == {"s33": 1.1}, norm
    assert "BENCH_DETAIL@" in label, label


def test_git_detail_versions_absent_repo_is_empty(tmp_path):
    bench = _load_bench()
    assert bench._git_detail_versions(str(tmp_path)) == []


def test_variance_class_thresholds():
    """VERDICT r15 task 4: the two rows with three rounds of identical
    environment adjudications carry a measured per-row threshold above
    the global 1.5x line; everything else stays at 1.5x."""
    bench = _load_bench()
    assert bench.flag_threshold("dedup_lsh_recall_report") == 2.3
    assert bench.flag_threshold("pipeline_training_manifest") == 1.9
    assert bench.flag_threshold("merge_full") == 1.5
    # the class only ever RAISES the bar
    assert all(v > 1.5 for v in bench.VARIANCE_FACTOR.values())


def test_classify_regressions_variance_waiver():
    """A 1.5x crossing inside a row's documented spread is WAIVED (but
    returned, so it stays on the record); a crossing beyond the row's
    threshold — or any crossing on a normal row — is a regression."""
    bench = _load_bench()
    warm = {
        "dedup_lsh_recall_report": 8.0,   # 3.7 baseline: 2.16x — waived
        "pipeline_training_manifest": 5.2,  # 2.47 baseline: 2.1x > 1.9 — flagged
        "merge_full": 3.2,                # 2.0 baseline: 1.6x — flagged
        "a1_lww_latest": 1.2,             # 1.0 baseline: 1.2x — clean
    }
    prev_norm = {
        "dedup_lsh_recall_report": 3.7,
        "pipeline_training_manifest": 2.47,
        "merge_full": 2.0,
        "a1_lww_latest": 1.0,
    }
    regs, waived = bench.classify_regressions(
        warm, dict(warm), prev_norm, dict(prev_norm), "min(test)"
    )
    assert {r["query"] for r in regs} == {
        "pipeline_training_manifest", "merge_full",
    }
    assert [w["query"] for w in waived] == ["dedup_lsh_recall_report"]
    assert waived[0]["threshold"] == 2.3
    # raw exoneration still applies at the row's threshold: the same
    # normalized crossing with a raw series that did NOT move is noise
    regs2, waived2 = bench.classify_regressions(
        {"merge_full": 2.0}, {"merge_full": 3.2},
        {"merge_full": 2.0}, {"merge_full": 2.0}, "min(test)",
    )
    assert regs2 == [] and waived2 == []


def test_classify_regressions_small_baselines_exempt():
    bench = _load_bench()
    regs, waived = bench.classify_regressions(
        {"q": 0.9}, {"q": 0.9}, {"q": 0.4}, {"q": 0.4}, "min(test)"
    )
    assert regs == [] and waived == []


def test_headline_short3_map_round_trips():
    """r18 (VERDICT r17 task 2): the 3-char alias map must decode back
    to full names losslessly for every headline query, including the
    one known 3-char collision (sim_ivf_topk / sim_ivfpq_topk), which
    falls back to full names in the emitted map."""
    bench = _load_bench()
    values = {n: 1.0 for n in bench.HEADLINE}
    m = bench.short_map3(values)
    un = bench._unshorten_map(bench.HEADLINE)
    decoded = {un.get(k, k) for k in m}
    assert decoded == set(bench.HEADLINE)
    # colliding pair rides as full names
    assert "sim_ivf_topk" in m and "sim_ivfpq_topk" in m


def test_unshorten_map_accepts_both_alias_schemes():
    """Pre-r18 artifacts carry 4-char aliases, r18+ carry 3-char; the
    readers must decode both (and full names) so historical baselines
    keep contributing to the tripwire min."""
    bench = _load_bench()
    names = ["s29_bloom_lookup_merge", "text_quality"]
    un = bench._unshorten_map(names)
    for n in names:
        assert un[bench.short_name(n)] == n
        assert un[bench.short_name3(n)] == n
        assert un[n] == n


def test_stdout_line_fits_driver_window_with_qn():
    """The driver tail-captures exactly 2000 chars; the one-line JSON
    with all 100 headline queries in the compact qn map and every
    scalar must fit after trimming — and the trim must NEVER drop the
    qn map, even with many flagged regressions (VERDICT r17 task 2)."""
    import json as _json

    bench = _load_bench()

    def _compact_val(v):
        v = round(v, 1)
        return int(v) if v >= 10 or v == int(v) else v

    def make_out(n_regs):
        return {
            "metric": "headline_query_suite",
            "value": 342.747,
            "unit": "sec",
            "queries": {n: 3.251 for n in bench.HEADLINE},
            "qn": bench.short_map3(
                {n: _compact_val(3.25) for n in bench.HEADLINE}
            ),
            "host_tag": "22931373",
            "regressions": [
                {"q": bench.short_name3(n), "p": 1.25, "n": 2.31, "c": 2.11}
                for n in bench.HEADLINE[:n_regs]
            ],
            "variance_waived": ["dedup_lsh_recall_report"],
            "value_warm": 300.1,
            "warm_k": 3,
            "calibration_sec": 0.7,
            "calibration_ref_sec": 0.7,
            "host_speed_factor": 0.867,
            "value_warm_normalized": 323.806,
            "sf": 0.1,
            "merge_throughput_rows_per_sec": 1000000,
            "sstable_merge_rows_per_sec_normalized": 432251,
            "real_ma_merge_rows_per_sec_normalized": 415582,
            "merge_rows_per_sec_normalized": 759828,
        }

    for n_regs in (0, 1, 10):
        out = make_out(n_regs)
        line = bench._fit_stdout_line(out)
        assert len(line) <= 1980, (n_regs, len(line))
        parsed = _json.loads(line)
        assert len(parsed["qn"]) == len(bench.HEADLINE), n_regs
        # the flag signal survives at least as a count
        regs = parsed["regressions"]
        assert (regs == n_regs) if isinstance(regs, int) else (
            len(regs) == n_regs
        )
