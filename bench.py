"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cassandra2aerospike_spark.session import get_spark

# Headline subset: the reference's end-to-end query plus one per operator
# family (kept in sync as families land).
HEADLINE = [
    # merge-semantics core (the reference's one query, end to end + pieces)
    "merge_full",
    "a1_lww_latest",
    "f1_live_cells",
    "a5_record_assembly",
    "s10_clustering_merge",
    # relational families
    "join_broadcast_star",
    "agg_pricing_summary",
    "agg_salted_skew",
    "win_topk_per_group",
    "win_frame_analytics",
    "topk_global",
    # ordering / resume (merged O2+O3 query)
    "token_resume",
    # training-pipeline extensions
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "text_quality",
    "text_line_dedup",
    "text_decontaminate",
    "pipeline_corpus_prep",
    # real-format + real-decode paths (round 5)
    "mm_real_decode",
    "pipeline_sstable_corpus",
    # round-6 training-pipeline additions
    "sim_semantic_dedup",
    "text_pii_scrub",
    "text_dup_span_removal",
    # round-7: typed multi-clustering-column cover on real ma bytes
    "s22_multi_ck_range_merge",
    # round-9: non-frozen UDT complex decode and ReversedType (DESC)
    # clustering — the r08/r09 format families get their own series
    "s25_udt_merge",
    "s26_reversed_ck_merge",
    # round-9 retrieval: the BM25 inverted-index pipeline
    "text_bm25_topk",
    # round-10: bloom-pruned point lookup, exact prefix-filter Jaccard,
    # the distributed integer-GD quality classifier, the snapshot-diff
    # (CDC) merge, and SQ8 integer-quantized ANN
    "s29_bloom_lookup_merge",
    "dedup_jaccard_prefix_filter",
    "text_quality_classifier",
    "s31_snapshot_diff",
    "sim_sq8_topk",
    # round-10: asb backup-format roundtrip + bigram-LM quality filter
    "s32_asb_backup_roundtrip",
    "text_ngram_lm",
    # round-10: tombstone GC census + Matryoshka two-stage ANN +
    # repair-style per-range digest comparison + the as-of snapshot
    # and partition-size histogram over the same staged stream
    "s33_gc_grace_report",
    "s34_repair_merkle_ranges",
    "sim_mrl_topk",
    "s30_asof_merge",
    "s35_partition_size_histogram",
    # round-10: binary-quantization ANN (Hamming prescreen + rescore)
    "sim_bq_topk",
    # round-10: pooled-chunk long-document retrieval
    "sim_chunk_pool_topk",
    # round-11: widened marshal types (7 classes beyond the reference's
    # enum) decoded from a real nb-era zstd-chunked table
    "s37_marshal_types_merge",
    # round-11: 3-node secured wire cluster (LOGIN handshake + digest
    # partition-map routing + distributed digest join) and the wire
    # read-back verification pass
    "s36_wire_cluster_sink",
    "s38_wire_readback_verify",
    # round-11 capstone: real mixed-era dir -> secured discovered
    # cluster -> distributed read-back proof
    "s39_e2e_migration_verified",
    # round-12: live partition handoff with client re-tend, RF=2
    # replication + node-death failover, and the persisted ANN index
    # (train once / append / serve from storage)
    "s40_wire_cluster_handoff",
    "s41_wire_rf2_failover",
    "sim_index_persist_topk",
    # round-12: DSIR-style importance-weighted corpus selection, and the
    # cluster-as-a-source scan sweep (one LOGIN+scan task per node)
    "text_dsir_select",
    "s42_wire_cluster_scan_source",
    # round-12: hybrid BM25+vector retrieval fused by RRF
    "sim_hybrid_rrf_topk",
    # round-13: scan surviving a live handoff (generation-checked range
    # restarts), the backup->.asb->restore->verify capstone across two
    # clusters, the persisted PQ index, and hybrid retrieval served
    # from the persisted IVF index
    "s44_wire_scan_during_handoff",
    "s45_backup_restore_verified",
    "s46_degraded_cluster_backup",
    "stream_asb_incremental_backup",
    "sim_index_persist_pq",
    "sim_index_persist_sq8",
    "sim_index_drift_topk",
    "sim_hybrid_index_rrf_topk",
    # round-13 (late): the wire BATCH-INDEX read family (per-node batch
    # lookups; handoff-resilient), streaming enrichment against the
    # live cluster, the gen-checked CAS refresh, and the persisted
    # binary-quantization index
    "s47_wire_batch_lookup",
    "s48_wire_batch_during_handoff",
    "s49_wire_cas_refresh",
    "s50_wire_touch_ttl_extend",
    "s51_wire_compressed_sink",
    "s52_wire_scan_projection",
    "stream_wire_batch_enrich",
    "sim_index_persist_bq",
    "sample_global_shuffle",
    # round-13 (late): the operational metrics + the north-star capstone
    "sim_recall_report",
    "dedup_lsh_recall_report",
    "pipeline_training_manifest",
    # round-14: the OPERATE multi-op transaction sweep, server-side
    # expression-filtered scans, the incremental-backup chain rebase,
    # and the two measure->retune loops (LSH banding auto-selection,
    # recall-driven probe-depth retune after index drift)
    "s53_wire_operate",
    "s54_wire_scan_expr_filter",
    "s55_wire_batch_expr_filter",
    "s56_filtered_partial_backup",
    "s57_sindex_query",
    "s58_wire_operate_during_handoff",
    "stream_asb_backup_rebase",
    "dedup_lsh_band_select",
    "sim_drift_recall_retune",
    # round-15: the batch-WRITE op family (per-record sub-transactions,
    # batch-node split, handoff-safe non-idempotent retries), image
    # near-dup dedup over real pixel decode, and the token-true manifest
    "s59_wire_batch_write",
    "s60_wire_batch_write_during_handoff",
    "stream_cdc_batch_apply",
    "mm_phash_dedup",
    "pipeline_bpe_manifest",
    "pipeline_multimodal_prep",
    "mm_audio_fp_dedup",
    # round-16: video near-dup (the last X2 modality), the all-modality
    # AV corpus-prep capstone, and the CDT list/map op family (single
    # OPERATE + batch sub-transactions + handoff safety)
    "mm_video_fp_dedup",
    "pipeline_multimodal_prep_av",
    "s61_wire_cdt_ops",
    "s62_wire_cdt_during_handoff",
    # round-16 (late): paged/resumable scans — digest-cursor pagination —
    # and incremental image near-dup against the persisted fingerprint
    # store (the continuous-ingest image-modality shape)
    "s63_wire_paged_scan_source",
    "mm_phash_incremental",
    "s64_wire_cdt_sindex_query",
    "pipeline_length_buckets",
    "s65_wire_cluster_to_cluster",
    "mm_audio_fp_incremental",
]


# Host-speed calibration (VERDICT r07 task 3 / r08 task 3 / r11 tasks
# 1-2 / r12 task 1): rounds 7-11 showed the whole suite drifting
# 1.3-1.5x in BOTH directions on byte-identical plans — pure host
# noise, indistinguishable from a real regression without an anchor.
# THREE fixed probes, one per execution regime the suite runs in:
#
#   * JVM probe: range -> hash -> 32-partition shuffle agg (no parquet,
#     no Python, no repo code) — tracks JVM codegen + shuffle speed.
#   * Python probe (r12): a fixed Arrow-batched pandas_udf numpy fold
#     over 32 partitions — tracks Python-worker fork, Arrow transfer and
#     memory bandwidth, the half the r11 driver run proved the JVM probe
#     cannot see (its factor said "host 1.56x FASTER" while every
#     Python-heavy warm median ran ~1.4x slower under 32-way contention).
#   * CPython probe (r13): a fixed pure-Python byte-decode loop inside
#     mapInPandas — the pure-bytecode regime (GIL held, no numpy) the
#     zstd/chunk-decode DataSource queries actually run in, which
#     NEITHER other probe samples: the JVM probe is codegen-bound, the
#     numpy fold releases the GIL and is memory-bandwidth-bound.  The
#     r12 driver run proved the blind spot: s37_marshal_types_merge
#     (the registry's most bytecode-bound query) read as a CONFIRMED
#     1.5x regression on byte-identical code because the contention it
#     saw never moved either existing probe.
#
# All probes are sampled at the START and then INTERLEAVED through the
# suite (every 12 queries + once at the end), so time-varying load lands
# in the medians the same way it lands in the query timings.
# host_speed_factor = max over probes of median/REF — the conservative
# reading: if ANY execution regime is degraded, the normalization
# discounts the suite accordingly.
CALIBRATION_REF_SEC = 0.70  # JVM probe, median of the r09 bench-context
# samples (0.736, 0.704; a standalone quiet-window sample read 0.49 —
# the anchor is pinned to the bench's own calling context so factor ~1.0
# means "a typical r09 host", not "the quietest moment observed")
PY_CALIBRATION_REF_SEC = 1.04  # Python probe, pinned r12 so that on the
# r12 builder host (idle) both probes report the SAME factor (jvm 0.396s
# -> 0.566; py 0.589s / 1.04 -> 0.566): the normalized series stays
# continuous with r09-r11, and the py probe only moves the max() when
# Python-side contention diverges from JVM-side
CPY_CALIBRATION_REF_SEC = 1.41  # CPython probe, pinned r13 by the same
# recipe: ref = idle_median / idle_factor_of_the_other_probes (measured
# idle on the r13 builder host: cpy 0.915s, jvm 0.455s -> 0.65, py
# 0.557s -> 0.536; 0.915 / 0.65 = 1.408), so on the idle builder host
# the new probe reports the same factor as the max of the other two and
# the normalized series stays continuous; the probe only moves the
# max() when pure-bytecode contention diverges from the other regimes
# (the r13 measurement is recorded in DESIGN.md)


def _jvm_calib_run(spark) -> float:
    """One timed run of the fixed JVM-only calibration query."""
    from pyspark.sql import functions as F

    t0 = time.time()
    (
        spark.range(0, 80_000_000, 1, 32)
        .select(F.xxhash64("id").alias("h"))
        .groupBy(F.pmod("h", F.lit(1024)).alias("b"))
        # pmod bounds the summand so ANSI mode can't overflow long
        .agg(F.count("*").alias("n"), F.sum(F.pmod("h", F.lit(1000003))).alias("s"))
        .agg(F.sum("n"), F.max("s"))
        .collect()
    )
    return time.time() - t0


def _py_calib_runner(spark):
    """Build the one-timed-run callable for the fixed Python-path probe
    (module-scope pandas_udf objects need an active session, so the udf
    is built lazily and reused across samples)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _work(s):
        x = s.to_numpy(dtype="float64")
        acc = np.sqrt(x + 1.0)
        for _ in range(8):
            acc = np.sqrt(acc * x + 1.0)
        return pd.Series(acc)

    # real type objects, not strings: `from __future__ import annotations`
    # would stringify inline hints and the UDF infer step can't resolve
    # 'pd.Series' against this module's globals
    _work.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _work = pandas_udf(T.DoubleType())(_work)

    def run() -> float:
        t0 = time.time()
        (
            spark.range(0, 8_000_000, 1, 32)
            .select(_work(F.col("id")).alias("v"))
            .agg(F.sum("v"))
            .collect()
        )
        return time.time() - t0

    return run


def _cpy_calib_runner(spark):
    """Build the one-timed-run callable for the fixed pure-CPython
    probe: 2560 rows over 32 partitions, each row a 48 KiB byte-fold in
    a plain Python loop inside mapInPandas (~7 ms/row idle) — GIL held,
    no numpy, no Arrow payload to speak of.  This is the execution
    regime of the pure-Python chunk/vint decoders in the SSTable
    DataSource (zstd_py/ma_format), whose queries were invisible to the
    JVM and numpy probes under contention (VERDICT r12 task 1)."""
    import pandas as pd

    from pyspark.sql import functions as F

    def _decode(batches):
        buf = bytes(range(256)) * 192  # 48 KiB pseudo-chunk
        acc = 0
        for pdf in batches:
            for _ in pdf["id"]:
                h = 0
                for b in buf:
                    h = (h * 31 + b) & 0xFFFFFFFF
                acc ^= h
            yield pd.DataFrame({"v": [acc]})

    def run() -> float:
        t0 = time.time()
        (
            spark.range(0, 2560, 1, 32)
            .mapInPandas(_decode, "v long")
            .agg(F.sum("v"))
            .collect()
        )
        return time.time() - t0

    return run


def calibration_probe(spark, k: int = 5) -> float:
    """Median wall-time of the fixed JVM-only calibration query (kept as
    the standalone API; main() samples the same runner interleaved)."""
    import statistics

    for _ in range(3):  # JIT warm-up: first runs are C1-compiled and slower
        _jvm_calib_run(spark)
    return round(statistics.median(_jvm_calib_run(spark) for _ in range(k)), 3)


def host_tag() -> str:
    """Stable 8-hex tag of the host HARDWARE (cpu model + core count +
    RAM size).  Normalized medians are only comparable when the factor
    chain shares an anchor lineage; a different machine breaks that, so
    the tripwire refuses baselines whose host_tag differs (VERDICT r11
    task 1).  Same-machine load differences are the calibration
    factor's job, not the tag's."""
    import hashlib

    model, mem = "", ""
    try:
        for line in open("/proc/cpuinfo"):
            if line.startswith("model name"):
                model = line.split(":", 1)[1].strip()
                break
        for line in open("/proc/meminfo"):
            if line.startswith("MemTotal"):
                mem = line.split(":", 1)[1].strip()
                break
    except OSError:
        pass
    raw = f"{model}|{os.cpu_count()}|{mem}"
    return hashlib.md5(raw.encode()).hexdigest()[:8]


def short_name(name: str) -> str:
    """Compact stable query alias for the stdout normalized map: first 4
    chars of each underscore token ('s29_bloom_lookup_merge' ->
    's29bloolookmerg').  Collisions (none across the current registry,
    test-pinned) are resolved by the caller falling back to full names
    for the colliding pair."""
    return "".join(t[:4] for t in name.split("_"))


def short_name3(name: str) -> str:
    """r18 compact alias (first THREE chars per token): at 100 headline
    queries the 4-char map alone is ~2020 chars and the driver
    tail-captures exactly 2000 — the per-query stdout contract had been
    silently dead since r14 (VERDICT r17 task 2).  The 3-char map is
    ~1750 chars, so the full line fits the window again.  Readers
    (_extract_normalized/_extract_raw_warm, and next round's tripwire)
    accept BOTH schemes."""
    return "".join(t[:3] for t in name.split("_"))


def short_map(values: dict[str, float]) -> dict[str, float]:
    """{short_name: value} with collision fallback to full names."""
    from collections import Counter

    counts = Counter(short_name(n) for n in values)
    return {
        (short_name(n) if counts[short_name(n)] == 1 else n): v
        for n, v in values.items()
    }


def short_map3(values: dict[str, float]) -> dict[str, float]:
    """{short_name3: value} with collision fallback to full names
    (sim_ivf_topk / sim_ivfpq_topk collide at 3 chars)."""
    from collections import Counter

    counts = Counter(short_name3(n) for n in values)
    return {
        (short_name3(n) if counts[short_name3(n)] == 1 else n): v
        for n, v in values.items()
    }


def _unshorten_map(names: list[str]) -> dict[str, str]:
    """alias -> full-name decode table covering the full-name identity
    plus both alias schemes (4-char pre-r18 artifacts, 3-char r18+).
    Built oldest-scheme-last so a cross-scheme clash (none in the
    current registry, test-pinned) resolves to the proven 4-char read."""
    un = {n: n for n in names}
    un.update({short_name3(n): n for n in names})
    un.update({short_name(n): n for n in names})
    return un


def _extract_raw_warm(parsed: dict, names: list[str]) -> dict[str, float]:
    """Per-query RAW warm-median map out of one bench artifact dict
    (full query names).  Only BENCH_DETAIL sidecars carry it — the
    stdout qn map is normalized-only — but the sidecar is committed
    every round, so a raw same-host baseline is always available."""
    qw = parsed.get("queries_warm") or {}
    unshorten = _unshorten_map(names)
    return {unshorten.get(k, k): v for k, v in qw.items()}


def _git_detail_versions(repo_dir: str, max_versions: int = 6) -> list[dict]:
    """Recent COMMITTED versions of BENCH_DETAIL.json via `git show`.

    VERDICT r13 task 2: the driver's post-commit bench run overwrites the
    working-tree BENCH_DETAIL.json with a contended measurement, and if
    that file is then committed as-is the idle anchor is lost — the
    min-of-artifacts baseline silently degrades to contended-only.  Git
    history still holds every idle anchor ever committed, so the baseline
    min also folds in the last few committed versions regardless of what
    the working tree currently says.  Failures (no git, shallow history,
    file absent in a revision) are ignored — this only ever ADDS
    candidate baselines."""
    import subprocess

    out: list[dict] = []
    try:
        revs = subprocess.run(
            ["git", "log", "-n", str(max_versions), "--format=%H", "--", "BENCH_DETAIL.json"],
            cwd=repo_dir, capture_output=True, text=True, timeout=30,
        ).stdout.split()
    except (OSError, subprocess.SubprocessError):
        return out
    for rev in revs:
        try:
            blob = subprocess.run(
                ["git", "show", f"{rev}:BENCH_DETAIL.json"],
                cwd=repo_dir, capture_output=True, text=True, timeout=30,
            ).stdout
            d = json.loads(blob)
            if isinstance(d, dict):
                d["_git_rev"] = rev[:8]
                out.append(d)
        except (OSError, ValueError, subprocess.SubprocessError):
            continue
    return out


# Per-row variance class (VERDICT r15 task 4): rows whose MEASURED
# fresh-session day-to-day spread exceeds the global 1.5x line get a
# row-specific flag threshold — retiring the r13-r15 ritual of manually
# adjudicating the same two rows as environment every round.  The
# factor IS the measured benign spread on byte-identical code:
#   dedup_lsh_recall_report: all-time-min 3.7; committed flags 8.0
#     (r15) / 7.1 (r14) / 7.9 (r13) each refuted by a fresh-session or
#     driver re-measure at 4.2-4.9 -> benign swing observed to 2.16x.
#   pipeline_training_manifest: all-time-min 2.47; flags 4.21/3.9/4.1
#     refuted at 2.57-3.1 -> benign swing observed to 1.70x.
# Both are pandas-UDF + checkpoint heavy: wall time is dominated by
# Python-worker fork, Arrow transfer and tmpfs checkpoint I/O, whose
# contention swing the calibration probes only partly normalize.  A
# flag on these rows now requires exceeding the measured benign factor
# (plus margin) x the all-time-min; crossings of the plain 1.5x line
# are still LOGGED (stderr + `variance_waived`) so the raw signal is
# never silently eaten.
VARIANCE_FACTOR = {
    "dedup_lsh_recall_report": 2.3,
    "pipeline_training_manifest": 1.9,
}


def flag_threshold(name: str) -> float:
    """The per-row regression multiplier: the global 1.5x line unless
    the row's documented fresh-session spread is wider."""
    return max(1.5, VARIANCE_FACTOR.get(name, 1.5))


def classify_regressions(warm, warm_norm, prev_norm, prev_raw, prev_tag):
    """The tripwire's flag decision, factored for unit tests: raw 1.5x
    crossings split into (regressions, variance_waived) by each row's
    flag_threshold.  A flag requires BOTH the normalized and the raw
    warm series to exceed the row's threshold x the same-host baseline
    min (the r12 s37 rule); crossings of 1.5x that stay inside the
    row's documented variance class are returned as waived — logged,
    never silently eaten."""

    def _raw_regressed(n: str, factor: float) -> bool:
        # no raw baseline -> can't exonerate, the normalized flag stands
        return n not in prev_raw or warm[n] > factor * prev_raw[n]

    def _entry(n: str) -> dict:
        return {
            "query": n,
            "prev_normalized": round(prev_norm[n], 3),
            "now_normalized": warm_norm[n],
            "prev_raw": round(prev_raw[n], 3) if n in prev_raw else None,
            "now_raw": warm[n],
            "baseline": prev_tag,
            "threshold": flag_threshold(n),
        }

    raw_flags = [
        n
        for n in warm_norm
        if n in prev_norm
        and prev_norm[n] >= 0.5
        and warm_norm[n] > 1.5 * prev_norm[n]
        and _raw_regressed(n, 1.5)
    ]
    regressions = [
        _entry(n)
        for n in raw_flags
        if warm_norm[n] > flag_threshold(n) * prev_norm[n]
        and _raw_regressed(n, flag_threshold(n))
    ]
    flagged = {r["query"] for r in regressions}
    variance_waived = [_entry(n) for n in raw_flags if n not in flagged]
    return regressions, variance_waived


def _prev_raw_warm(repo_dir: str, names: list[str], tag: str, sf=None):
    """Per-query MIN of the RAW warm medians across all same-host-tag,
    same-sf artifacts — the tripwire's second gate (r13, the s37
    adjudication): a fixed-cost-bound query's RAW time barely moves
    with host load, so dividing it by the fluctuating calibration
    factor manufactures phantom normalized regressions (s37 ranged
    0.89→1.81 normalized across byte-identical runs whose raw warm
    stayed 0.91→1.32).  A REAL regression is slower in raw terms on
    the same host too, so a flag must reproduce in BOTH series."""
    import glob

    merged: dict[str, float] = {}
    for f in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        try:
            parsed = (json.load(open(f)) or {}).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if parsed.get("host_tag") != tag or (
            sf is not None and parsed.get("sf") != sf
        ):
            continue
        for k, v in _extract_raw_warm(parsed, names).items():
            if k not in merged or v < merged[k]:
                merged[k] = v
    details = []
    try:
        details.append(json.load(open(os.path.join(repo_dir, "BENCH_DETAIL.json"))))
    except (OSError, ValueError):
        pass
    details.extend(_git_detail_versions(repo_dir))
    for d in details:
        if d.get("host_tag") == tag and (sf is None or d.get("sf") == sf):
            for k, v in _extract_raw_warm(d, names).items():
                if k not in merged or v < merged[k]:
                    merged[k] = v
    return merged


def _extract_normalized(parsed: dict, names: list[str]) -> dict[str, float]:
    """Per-query normalized map out of one bench artifact dict, keyed by
    FULL query name.  Accepts the r12+ compact `qn` map (short_name
    keys), the older full-name `queries_warm_normalized`, or derives
    from `queries_warm` + `host_speed_factor`."""
    qn = parsed.get("qn") or parsed.get("queries_warm_normalized")
    if qn is None and parsed.get("queries_warm") and parsed.get("host_speed_factor"):
        hs = parsed["host_speed_factor"]
        qn = {k: v / hs for k, v in parsed["queries_warm"].items()}
    if not qn:
        return {}
    unshorten = _unshorten_map(names)
    return {unshorten.get(k, k): v for k, v in qn.items()}


def _prev_normalized(repo_dir: str, names: list[str], tag: str, sf=None):
    """Tripwire baseline: per-query MIN of the NORMALIZED warm medians
    across ALL same-host-tag, same-sf artifacts — every BENCH_r*.json
    carrying a normalized map plus the committed BENCH_DETAIL.json
    sidecar (VERDICT r12 task 2).  Newest-round selection was the r12
    flaw: the driver's contended run became the baseline (wire family
    2.6-3.5x its idle figure), and a REAL regression up to that factor
    would have compared favorably and never fired.  The min across
    recent artifacts is the host's demonstrated-achievable figure: any
    contended artifact's inflation is ignored as long as ONE clean
    measurement exists.  A baseline from a different machine (or one
    too old to carry a tag) is refused outright: its factor chain
    shares no anchor lineage with ours, and r11 proved such comparisons
    manufacture phantom regressions.
    Returns (source_label, {query: normalized_sec}) or (None, {})."""
    import glob
    import re as _re

    sources: list[tuple[str, dict[str, float]]] = []
    for f in glob.glob(os.path.join(repo_dir, "BENCH_r*.json")):
        m = _re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        try:
            parsed = (json.load(open(f)) or {}).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if parsed.get("host_tag") != tag:
            continue
        if sf is not None and parsed.get("sf") != sf:
            continue  # cross-scale comparison is meaningless
        qn = _extract_normalized(parsed, names)
        if qn:
            sources.append((f"BENCH_r{int(m.group(1)):02d}", qn))
    details: list[tuple[str, dict]] = []
    try:
        details.append(
            ("BENCH_DETAIL", json.load(open(os.path.join(repo_dir, "BENCH_DETAIL.json"))))
        )
    except (OSError, ValueError):
        pass
    details.extend(
        (f"BENCH_DETAIL@{d.get('_git_rev', 'git')}", d)
        for d in _git_detail_versions(repo_dir)
    )
    for label, d in details:
        if d.get("host_tag") == tag and (sf is None or d.get("sf") == sf):
            qn = _extract_normalized(d, names)
            if qn:
                sources.append((label, qn))
    if not sources:
        return None, {}
    merged: dict[str, float] = {}
    used: set[str] = set()
    for label, qn in sources:
        for k, v in qn.items():
            if k not in merged or v < merged[k]:
                merged[k] = v
    # label only the sources that actually contributed a per-query min
    for label, qn in sources:
        if any(merged[k] == qn[k] for k in qn):
            used.add(label)
    return "min(" + ",".join(sorted(used)) + ")", merged


def _fit_stdout_line(out: dict, budget: int = 1980) -> str:
    """Shrink the stdout JSON to the driver's tail-capture window (2000
    chars; 20 headroom for the newline) WITHOUT ever dropping the
    per-query `qn` map (VERDICT r17 task 2: the per-query contract had
    been silently dead since r14 because the old order dropped it last
    but the budget was never reachable at 100 queries).  Order: the cold
    full-name map (total survives as `value`), secondary scalars (all in
    the sidecar), then the waived/regression LISTS degrade to counts
    (full entries in the sidecar + stderr), and only as a never-in-
    practice last resort the qn map itself.  Mutates `out`."""
    secondary = [
        "baseline_reference_rows_per_sec",
        "calibration_ref_sec",
        "calibration_py_ref_sec",
        "calibration_cpy_ref_sec",
        "calibration_sec",
        "calibration_py_sec",
        "calibration_cpy_sec",
        "sstable_merge_throughput_rows_per_sec",
        "real_ma_merge_throughput_rows_per_sec",
        "merge_throughput_rows_per_sec",
        "value_warm",
        "warm_k",
        "media_decode_blobs_per_sec",
        "similarity_gemm_vecs_per_sec",
        "dedup_throughput_docs_per_sec",
        "sstable_merge_rows_per_sec_normalized",
        "real_ma_merge_rows_per_sec_normalized",
        "merge_rows_per_sec_normalized",
    ]

    def dumps() -> str:
        return json.dumps(out, separators=(",", ":"))

    line = dumps()
    if len(line) > budget and "queries" in out:
        del out["queries"]
        line = dumps()
    for k in secondary:
        if len(line) <= budget:
            break
        out.pop(k, None)
        line = dumps()
    if len(line) > budget and isinstance(out.get("variance_waived"), list):
        out["variance_waived"] = len(out["variance_waived"])
        line = dumps()
    if len(line) > budget and isinstance(out.get("regressions"), list):
        out["regressions"] = len(out["regressions"])
        line = dumps()
    if len(line) > budget:
        del out["qn"]
        line = dumps()
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] or list(qs)

    # Warm-up: JIT/codegen + parquet footer caches dominate first-query
    # latency at these SFs (~3-4 s of fixed JVM cost on a ~1 s query), so
    # run the heaviest pipeline once untimed before measuring steady state.
    spark.range(1).count()
    import statistics

    py_run = _py_calib_runner(spark)
    cpy_run = _cpy_calib_runner(spark)
    for _ in range(3):  # JIT / worker-pool warm-up for the probes
        _jvm_calib_run(spark)
    py_run()
    cpy_run()
    jvm_samples = [_jvm_calib_run(spark) for _ in range(3)]
    py_samples = [py_run() for _ in range(2)]
    cpy_samples = [cpy_run() for _ in range(2)]

    def speed_now() -> tuple[float, float, float, float]:
        calib_ = round(statistics.median(jvm_samples), 3)
        calib_py_ = round(statistics.median(py_samples), 3)
        calib_cpy_ = round(statistics.median(cpy_samples), 3)
        return (
            calib_,
            calib_py_,
            calib_cpy_,
            round(
                max(
                    calib_ / CALIBRATION_REF_SEC,
                    calib_py_ / PY_CALIBRATION_REF_SEC,
                    calib_cpy_ / CPY_CALIBRATION_REF_SEC,
                ),
                3,
            ),
        )

    calib, calib_py, calib_cpy, speed = speed_now()
    print(
        f"# calibration: jvm {calib}s (ref {CALIBRATION_REF_SEC}s), py "
        f"{calib_py}s (ref {PY_CALIBRATION_REF_SEC}s), cpy {calib_cpy}s "
        f"(ref {CPY_CALIBRATION_REF_SEC}s) -> host speed "
        f"factor {speed} — >1 means THIS host run is slower than the "
        f"anchor; divide suite times by it to compare rounds; all probes "
        f"re-sample every 12 queries so time-varying load lands in the "
        f"medians",
        file=sys.stderr,
    )
    if "merge_full" in qs:
        qs["merge_full"](spark, sf_dir).count()
    # stage the capstone's on-disk fixture outside the timed pass (one-
    # time file build, cached in /tmp — the same treatment the probe
    # section gives big_runs/ma_dir); the timed pass then measures the
    # READ+merge+corpus path, not MaWriter
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_ma_docs_table,
    )

    build_ma_docs_table(spark, sf_dir)
    # same treatment for s22's typed-write compaction fixture: the
    # cache key folds the write-path source hash (merge_q._write_path_rev),
    # so ANY ma_format/datasource edit rebuilds it — untimed here, or
    # the round's first cold pass times MaWriter (~20 s) instead of the
    # READ+merge the series tracks (observed r09: s22 cold 23.0 s on a
    # stale cache vs 2.4 s staged)
    if "s22_multi_ck_range_merge" in qs:
        qs["s22_multi_ck_range_merge"](spark, sf_dir)  # builds eagerly
    if "s26_reversed_ck_merge" in qs:
        qs["s26_reversed_ck_merge"](spark, sf_dir)  # same rewrite cache
    if "s25_udt_merge" in qs:
        qs["s25_udt_merge"](spark, sf_dir)  # stages the UDT fixture
    if "s37_marshal_types_merge" in qs:
        qs["s37_marshal_types_merge"](spark, sf_dir)  # stages the typed table
    # round-10 snapshot family: stage the multi-generation runs, the
    # classified parquet checkpoint (content + read-path-code keyed) and
    # the real-ma lookup table untimed — the timed series tracks the
    # snapshot / diff / census / digest / bloom-lookup OPERATORS, not
    # the one-time pure-Python decode or MaWriter build they cache from
    from cassandra2aerospike_spark.queries.merge_q import _classified_staged
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    _classified_staged(spark, sf_dir)
    build_ma_table_from_events(spark, sf_dir, default_runs_dir(sf_dir) + "_ma")

    # Per-query protocol: one COLD pass (codegen + planning + first data
    # touch — the cross-round-comparable series, `queries`/`value`), then
    # k warm passes whose MEDIAN is the steady-state figure
    # (`queries_warm`) and whose max-min is the noise band
    # (`queries_spread`).  Medians exist because host noise is large
    # (±30% measured across rounds on unchanged code, DESIGN.md): a
    # single warm sample can't distinguish a real regression from a noisy
    # neighbor; the median of 3 plus an explicit spread can.
    k_warm = int(os.environ.get("SPARK_GRAFT_BENCH_K", "3"))
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    spread: dict[str, float] = {}

    for qi, name in enumerate(names):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()  # materialize fully, leave results distributed
        timings[name] = round(time.time() - t0, 3)
        samples = []
        for _ in range(k_warm):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
        warm[name] = round(statistics.median(samples), 3)
        spread[name] = round(max(samples) - min(samples), 3)
        print(
            f"# {name}: {n} rows in {timings[name]}s "
            f"(warm median {warm[name]}s, spread {spread[name]}s over {k_warm})",
            file=sys.stderr,
        )
        # interleaved calibration (VERDICT r11 task 2): one sample of
        # each probe every 12 queries, so contention that arrives (or
        # leaves) mid-suite moves the factor the way it moves the suite
        if (qi + 1) % 12 == 0:
            jvm_samples.append(_jvm_calib_run(spark))
            py_samples.append(py_run())
            cpy_samples.append(cpy_run())
    jvm_samples.append(_jvm_calib_run(spark))
    py_samples.append(py_run())
    cpy_samples.append(cpy_run())
    calib, calib_py, calib_cpy, speed = speed_now()
    print(
        f"# calibration final (n={len(jvm_samples)} jvm / {len(py_samples)} py "
        f"/ {len(cpy_samples)} cpy samples): jvm {calib}s, py {calib_py}s, "
        f"cpy {calib_cpy}s -> host speed factor {speed}",
        file=sys.stderr,
    )

    # Throughput probe against the reference's one published number
    # (~100k rows/s end-to-end, BASELINE.md): the full merge over a
    # 10x-amplified events cell stream, measured warm (steady state —
    # the reference's figure is also steady-state, sink-bound).
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")

    def merge_probe(factor: int) -> tuple[float, int]:
        amp = (
            ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("user_id", F.col("user_id") + F.col("rep") * 100000)
            .withColumn("ts_us", F.col("ts_us") + F.col("rep"))
            .drop("rep")
            .persist()
        )
        n_cells = amp.count()
        merge.merge_records(amp).count()  # warm-up pass
        t0 = time.time()
        merge.merge_records(amp).count()
        rate = n_cells / (time.time() - t0)
        amp.unpersist()
        return rate, n_cells

    thru, n_cells = merge_probe(10)
    print(f"# merge throughput: {thru:,.0f} cells/s over {n_cells} cells", file=sys.stderr)

    # Scale-slope probe (opt-in: SPARK_GRAFT_SLOPE=1): the same merge at
    # 3x the amplification.  cells/s holding steady (or rising, as fixed
    # cost amortizes) across the 3x step is the evidence that probe cost
    # scales sublinearly — the two-point anchor for the 100x story.
    slope: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SLOPE"):
        thru30, n30 = merge_probe(30)
        slope = {
            "merge_rows_per_sec_x10": round(thru),
            "merge_rows_per_sec_x30": round(thru30),
            "merge_slope_ratio": round(thru30 / thru, 3),
        }
        print(
            f"# merge slope: x10 {thru:,.0f} -> x30 {thru30:,.0f} cells/s "
            f"(ratio {thru30 / thru:.2f}, {n30} cells)",
            file=sys.stderr,
        )

    # Full binary-path probe — the apples-to-apples number against the
    # reference's ~100k rows/s (its figure INCLUDES SSTable parsing):
    # events amplified 10x, materialized as binary runs (cached in /tmp;
    # ~20 s one-time build), then scanned through the Python DataSource
    # (vint/delta decode + chunk checksums, Arrow-batched) into the LWW
    # merge, measured warm.
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_runs_from_events,
        classified_from_runs,
        default_runs_dir,
    )

    # probe hygiene (same discipline as the dedup probe below): the
    # headline pass — now including s22's writer-heavy roundtrip —
    # leaves executor heap/cache state that measurably depresses the
    # Python-DataSource decode probes; start them from a clean cache
    spark.catalog.clearCache()
    big_runs = build_runs_from_events(
        spark, sf_dir, default_runs_dir(sf_dir), amplify=10
    )
    src = classified_from_runs(spark, big_runs)
    n_src = src.count()
    merge.lww_latest(merge.live_cells_from_classified(src)).count()  # warm
    t0 = time.time()
    merge.lww_latest(
        merge.live_cells_from_classified(classified_from_runs(spark, big_runs))
    ).count()
    sst_thru = n_src / (time.time() - t0)
    print(
        f"# sstable->merge throughput: {sst_thru:,.0f} cells/s over {n_src} cells",
        file=sys.stderr,
    )

    # REAL-format binary-path probe: the same 10x-amplified events
    # materialized as an actual Cassandra ma table (vints, delta minima,
    # chunk checksums), read through the real-format DataSource branch
    # (token-range sub-split per sstable) into the LWW merge — the
    # number a user with real SSTables would see.
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_ma_table_from_events,
        classified_from_ma,
    )

    ma_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma", amplify=10
    )
    src_ma = classified_from_ma(spark, ma_dir)
    n_ma = src_ma.count()
    merge.lww_latest(merge.live_cells_from_classified(src_ma)).count()  # warm
    t0 = time.time()
    merge.lww_latest(
        merge.live_cells_from_classified(classified_from_ma(spark, ma_dir))
    ).count()
    ma_thru = n_ma / (time.time() - t0)
    print(
        f"# REAL-ma->merge throughput: {ma_thru:,.0f} cells/s over {n_ma} cells",
        file=sys.stderr,
    )

    # Extension-family scale probes (steady-state, like the merge probe):
    # 20x-amplified documents through the full MinHash-LSH near-dup
    # pipeline (docs/s), and the GEMM similarity path over 10x-amplified
    # embeddings (vectors/s) — the numbers that support the 100 TB story
    # for the north-star operators.
    from cassandra2aerospike_spark.functions import dedup as dedup_fns
    from cassandra2aerospike_spark.functions import similarity as sim_fns

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def dedup_probe(factor: int, distinct: bool = False) -> tuple[float, int]:
        # distinct=True (slope probe): every replica gets a unique suffix,
        # so near-dup clusters — and the candidate-pair output, which is
        # QUADRATIC in cluster size — stay constant-size as docs scale;
        # amplification then measures scan/shuffle cost, not output growth
        amp_text = (
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
            if distinct
            else F.when(F.col("rep") % 2 == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
            )
        )
        docs_amp = (
            docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
            .withColumn("text", amp_text)
            .drop("rep")
            .persist()
        )
        n_docs = docs_amp.count()
        # parquet checkpoint per call (the production shape, see
        # functions/dedup.stage_parquet): a FRESH dir each time so the
        # timed run pays the full write+readback cost — no marker reuse
        import shutil
        import tempfile

        dirs = [tempfile.mkdtemp(prefix="graft_dedup_probe_") for _ in range(2)]
        dedup_fns.minhash_lsh_pairs(
            docs_amp, 16, 4, 4, 3, 0.5, checkpoint_dir=dirs[0]
        ).count()  # warm
        t0 = time.time()
        dedup_fns.minhash_lsh_pairs(
            docs_amp, 16, 4, 4, 3, 0.5, checkpoint_dir=dirs[1]
        ).count()
        rate = n_docs / (time.time() - t0)
        docs_amp.unpersist()
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()
        return rate, n_docs

    # probe hygiene: the binary-path probes leave executor heap/cache
    # state that measurably depresses the pandas-UDF-heavy dedup probe
    # (isolated 27k docs/s vs 9k in-sequence measured on one host);
    # start it from a clean cache
    spark.catalog.clearCache()
    dedup_thru, n_docs = dedup_probe(20)
    print(f"# dedup throughput: {dedup_thru:,.0f} docs/s over {n_docs} docs", file=sys.stderr)
    if os.environ.get("SPARK_GRAFT_SLOPE"):
        dedup20d, _ = dedup_probe(20, distinct=True)
        dedup60d, nd60 = dedup_probe(60, distinct=True)
        slope.update(
            {
                "dedup_docs_per_sec_x20_distinct": round(dedup20d),
                "dedup_docs_per_sec_x60_distinct": round(dedup60d),
                "dedup_slope_ratio": round(dedup60d / dedup20d, 3),
            }
        )
        print(
            f"# dedup slope (distinct texts): x20 {dedup20d:,.0f} -> x60 "
            f"{dedup60d:,.0f} docs/s (ratio {dedup60d / dedup20d:.2f}, {nd60} docs)",
            file=sys.stderr,
        )

        # semantic-dedup slope: the FULL pipeline (GEMM Lloyd, 2
        # iterations + per-cell Gram pair scan) over an id-rotated
        # amplified embedding corpus — rotation makes replicas distinct
        # vectors so the within-cell pair output stays proportional.
        # k SCALES with the corpus (k = 8 per 10x) — the SemDeDup
        # contract: cluster count grows with corpus size so cells stay
        # bounded and the per-cell quadratic never grows.  Round-6
        # measurement with k pinned at 8 showed exactly the failure the
        # contract exists to prevent: 30x corpus -> 7.5k-member cells ->
        # slope 0.20.  With scaled k the probe measures scan/GEMM/
        # shuffle cost, not cell-quadratic growth.
        emb_base = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )

        def semdedup_probe(factor: int) -> tuple[float, int]:
            k_cells = max(8, (8 * factor) // 10)
            amp = (
                emb_base.withColumn(
                    "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .select(
                    (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
                    F.expr(
                        "transform(embedding, (x, i) -> "
                        "element_at(embedding, 1 + int((i + rep) % size(embedding))))"
                    ).alias("embedding"),
                )
                .persist()
            )
            n_vecs = amp.count()

            def run() -> None:
                q = amp.select(
                    "vec_id", sim_fns.quantize_vec(F.col("embedding")).alias("xq")
                )
                cids, mat = sim_fns.kmeans_fit_quantized_np(q, k=k_cells, iters=2)
                assigned = sim_fns.assign_cells_quantized_np(q, cids, mat).select(
                    "vec_id", "xq", "cell"
                )
                sim_fns.semantic_dedup_quantized_fast(assigned).count()

            run()  # warm
            t0 = time.time()
            run()
            rate = n_vecs / (time.time() - t0)
            amp.unpersist()
            spark.catalog.clearCache()
            return rate, n_vecs

        sd10, _ = semdedup_probe(10)
        sd30, nsd = semdedup_probe(30)
        slope.update(
            {
                "semdedup_vecs_per_sec_x10": round(sd10),
                "semdedup_vecs_per_sec_x30": round(sd30),
                "semdedup_slope_ratio": round(sd30 / sd10, 3),
            }
        )
        print(
            f"# semantic-dedup slope: x10 {sd10:,.0f} -> x30 {sd30:,.0f} vecs/s "
            f"(ratio {sd30 / sd10:.2f}, {nsd} vecs)",
            file=sys.stderr,
        )

    # X5 media-decode probe: synthesize real WAV/BMP/PNG/JPEG/GIF blobs
    # and run the full byte-level decode (PCM fold, BMP rows, PNG
    # inflate + unfilter, JPEG huffman + IDCT, GIF LZW) through
    # mapInPandas — the Python-side decode is the cost, Arrow batching
    # the mitigation.  doc_id*5 + rep(0..4) covers every format branch
    # of the % 5 synth policy exactly once per source doc, regardless of
    # the source id distribution.
    from cassandra2aerospike_spark.functions import multimodal as mm

    media_docs = (
        docs.select("doc_id")
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(4))))
        .withColumn("doc_id", F.col("doc_id") * 5 + F.col("rep"))
        .drop("rep")
        .persist()
    )
    media = mm.synthesize_av_media(media_docs).persist()
    n_media = media.count()  # materialize blobs so only DECODE is timed
    mm.decode_media(media).count()  # warm
    t0 = time.time()
    mm.decode_media(media).count()
    media_thru = n_media / (time.time() - t0)
    media.unpersist()
    media_docs.unpersist()
    print(f"# media decode throughput: {media_thru:,.0f} blobs/s over {n_media} blobs", file=sys.stderr)

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qset = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    def gemm_probe(factor: int) -> tuple[float, int]:
        emb_amp = (
            emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
            .drop("rep")
            .persist()
        )
        n_vecs = emb_amp.count()
        sim_fns.brute_force_topk_fast(qset, emb_amp, k=5).count()  # warm
        t0 = time.time()
        sim_fns.brute_force_topk_fast(qset, emb_amp, k=5).count()
        rate = n_vecs / (time.time() - t0)
        emb_amp.unpersist()
        return rate, n_vecs

    # round-9 text-op slope probes (opt-in with the rest): the BM25
    # inverted-index build and the BPE trainer over an amplified corpus
    # with DISTINCT replica suffixes — vocabulary and df distributions
    # grow with the corpus, so the probes measure index-build/pair-count
    # scaling, not degenerate duplicate collapse.
    if os.environ.get("SPARK_GRAFT_SLOPE"):
        from cassandra2aerospike_spark.queries.text_q import bm25_topk, bpe_train

        def text_amp(factor: int):
            amp = (
                docs.withColumn(
                    "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
                .withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")),
                )
                .drop("rep")
                .persist()
            )
            return amp, amp.count()

        def text_op_probe(core, factor: int) -> tuple[float, int]:
            amp, n = text_amp(factor)
            core(spark, amp).count()  # warm
            t0 = time.time()
            core(spark, amp).count()
            rate = n / (time.time() - t0)
            amp.unpersist()
            return rate, n

        bm10, _ = text_op_probe(bm25_topk, 10)
        bm30, nb30 = text_op_probe(bm25_topk, 30)
        bp10, _ = text_op_probe(bpe_train, 10)
        bp30, np30 = text_op_probe(bpe_train, 30)
        slope.update(
            {
                "bm25_docs_per_sec_x10": round(bm10),
                "bm25_docs_per_sec_x30": round(bm30),
                "bm25_slope_ratio": round(bm30 / bm10, 3),
                "bpe_docs_per_sec_x10": round(bp10),
                "bpe_docs_per_sec_x30": round(bp30),
                "bpe_slope_ratio": round(bp30 / bp10, 3),
            }
        )
        print(
            f"# bm25 slope: x10 {bm10:,.0f} -> x30 {bm30:,.0f} docs/s "
            f"(ratio {bm30 / bm10:.2f}, {nb30} docs); bpe slope: x10 "
            f"{bp10:,.0f} -> x30 {bp30:,.0f} docs/s (ratio {bp30 / bp10:.2f})",
            file=sys.stderr,
        )

        # round-11 slope probes (VERDICT r10 task 7): the two widest-
        # shuffle round-10 queries — the bigram stupid-backoff LM (17
        # shuffles) and the exact prefix-filter Jaccard (9 shuffles).
        # The LM rides text_amp's distinct suffixes (vocabulary grows
        # naturally).  The Jaccard probe interleaves the replica tag
        # into EVERY shingle (regexp_replace of spaces): a mere suffix
        # leaves long replicas above the 0.6 threshold and the pair
        # output goes quadratic in the factor — measured 25,300 pairs at
        # x10-suffix vs the exactly-linear 280 with interleaving — so
        # interleaving is what makes the probe measure scan/shuffle
        # cost, not output growth.  Fresh checkpoint dirs per run (the
        # LSH probe's full-cost discipline).
        from cassandra2aerospike_spark.queries.text_q import ngram_lm

        def jaccard_probe(factor: int) -> tuple[float, int]:
            import tempfile as _tf

            amp = (
                docs.withColumn(
                    "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
                .withColumn(
                    "text",
                    F.expr("regexp_replace(text, ' ', concat(' r', rep, ' '))"),
                )
                .drop("rep")
                .persist()
            )
            n = amp.count()

            def run() -> None:
                dedup_fns.prefix_filter_jaccard_pairs(
                    amp, 3, 3, 5,
                    checkpoint_dir=_tf.mkdtemp(prefix="graft_jacc_probe_"),
                ).count()

            run()  # warm
            t0 = time.time()
            run()
            rate = n / (time.time() - t0)
            amp.unpersist()
            return rate, n

        lm10, _ = text_op_probe(ngram_lm, 10)
        lm30, nl30 = text_op_probe(ngram_lm, 30)
        jc10, _ = jaccard_probe(10)
        jc30, nj30 = jaccard_probe(30)
        slope.update(
            {
                "ngram_lm_docs_per_sec_x10": round(lm10),
                "ngram_lm_docs_per_sec_x30": round(lm30),
                "ngram_lm_slope_ratio": round(lm30 / lm10, 3),
                "jaccard_prefix_docs_per_sec_x10": round(jc10),
                "jaccard_prefix_docs_per_sec_x30": round(jc30),
                "jaccard_prefix_slope_ratio": round(jc30 / jc10, 3),
            }
        )
        print(
            f"# ngram-lm slope: x10 {lm10:,.0f} -> x30 {lm30:,.0f} docs/s "
            f"(ratio {lm30 / lm10:.2f}, {nl30} docs); jaccard-prefix "
            f"slope: x10 {jc10:,.0f} -> x30 {jc30:,.0f} docs/s "
            f"(ratio {jc30 / jc10:.2f}, {nj30} docs)",
            file=sys.stderr,
        )

        # round-12 wire-family slope probe (VERDICT r11 task 7): the
        # s36-shape SECURED cluster write — per-connection LOGIN
        # (bcrypt credential), digest routing across 3 misroute-refusing
        # nodes, bounded-async pipelining — over xN-replicated merged
        # records (distinct keys -> distinct digests).  Records/s
        # holding steady across the 3x step shows per-record cost is
        # flat once past the connect+LOGIN floor; _sink_parallelism
        # grows the task count with N so the floor amortizes.
        def wire_probe(factor: int) -> tuple[float, int]:
            from cassandra2aerospike_spark.queries.pipeline_q import (
                _sink_parallelism,
            )
            from cassandra2aerospike_spark.sinks.aerospike_wire import (
                N_PARTITIONS,
                WireClient,
                WireServer,
                fetch_partition_map,
                key_digest,
                partition_id,
            )
            from cassandra2aerospike_spark.sinks.bcrypt_py import hashpw
            from cassandra2aerospike_spark.sinks.kv_sink import (
                bounded_async_foreach_writer,
            )

            recs = (
                merge.merge_records(ev)
                .withColumn(
                    "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn(
                    "key", F.col("key") + F.col("rep").cast("long") * 10_000_000
                )
                .drop("rep")
                .select("key", "columns", "expiry")
                .persist()
            )
            n = recs.count()
            sink = recs.coalesce(_sink_parallelism(n))
            user, password = "probe", "pw"
            salt6 = "$2a$06$7EqJtq98hPqEX7fNZaFWoO"
            credential = hashpw(password, salt6)
            servers = [
                WireServer(
                    credentials=(user, password),
                    owned_partitions={
                        p for p in range(N_PARTITIONS) if p % 3 == i
                    },
                    credential_salt=salt6,
                )
                for i in range(3)
            ]
            nodes = [(s_.host, s_.port) for s_ in servers]
            pmap = [-1] * N_PARTITIONS
            for idx, (h_, p_) in enumerate(nodes):
                _g, owned = fetch_partition_map(h_, p_, "tmx")
                for pt in owned:
                    pmap[pt] = idx
            state: dict = {}
            eternal, now_s = merge.ETERNAL, merge.NOW_EPOCH_S

            def put(rd):
                cl = state.get("clients")
                if cl is None:
                    cl = state["clients"] = [
                        WireClient(
                            h_, p_, "tmx", "records",
                            user=user, credential=credential,
                        )
                        for h_, p_ in nodes
                    ]
                key = str(rd["key"]).encode()
                bins = {
                    k2: ("%.2f" % v).encode() for k2, v in rd["columns"].items()
                }
                ttl = (
                    0xFFFFFFFF
                    if rd["expiry"] == eternal
                    else int(rd["expiry"]) - now_s
                )
                c = cl[pmap[partition_id(key_digest("records", key))]]
                return c.put(key, bins, ttl), c

            def wait(h):
                handle, c = h
                if c.wait(handle) != "ok":
                    raise RuntimeError("wire probe: unexpected non-ok put")
                return True

            t0 = time.time()
            bounded_async_foreach_writer(sink, put, wait, max_in_flight=32)
            dt = time.time() - t0
            n_stored = sum(len(s_.records()) for s_ in servers)
            for s_ in servers:
                s_.close()
            recs.unpersist()
            if n_stored != n:
                raise RuntimeError(f"wire probe lost puts: {n_stored}/{n}")
            return n / dt, n

        w5, _ = wire_probe(5)
        w15, nw15 = wire_probe(15)
        slope.update(
            {
                "wire_recs_per_sec_x5": round(w5),
                "wire_recs_per_sec_x15": round(w15),
                "wire_slope_ratio": round(w15 / w5, 3),
            }
        )
        print(
            f"# wire-cluster slope: x5 {w5:,.0f} -> x15 {w15:,.0f} recs/s "
            f"(ratio {w15 / w5:.2f}, {nw15} records)",
            file=sys.stderr,
        )

        # round-13 backup-family slope probe: the asbackup job shape —
        # partition-sliced masters-only SWEEP of a filled 3-node
        # cluster (8 pid-range mapInPandas tasks, each scanning every
        # node) STRAIGHT INTO the keyless .asb sink — over xN-replicated
        # merged records.  The fill is untimed (it is the wire probe's
        # axis); the timed region is scan -> .asb write, the backup's
        # own cost.  Records/s holding across the 3x step shows the
        # sweep+serialize path is scan-bound, not per-record-bound.
        def backup_probe(factor: int) -> tuple[float, int]:
            import shutil
            import tempfile as _tf

            import pandas as _pd

            from cassandra2aerospike_spark.sinks.aerospike_wire import (
                N_PARTITIONS,
                WireClient,
                WireServer,
                fetch_partition_map,
                key_digest,
                partition_id,
            )
            from cassandra2aerospike_spark.sinks.asb_backup import (
                read_asb_scan,
                write_asb_scan,
            )
            from cassandra2aerospike_spark.sinks.kv_sink import (
                bounded_async_foreach_writer,
            )

            ns_, set_ = "tmx", "bkup"
            recs = (
                merge.merge_records(ev)
                .withColumn(
                    "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn(
                    "key", F.col("key") + F.col("rep").cast("long") * 10_000_000
                )
                .drop("rep")
                .select("key", "columns", "expiry")
                .persist()
            )
            n = recs.count()
            servers = [
                WireServer(
                    owned_partitions={
                        p for p in range(N_PARTITIONS) if p % 3 == i
                    },
                    info_namespace=ns_,
                )
                for i in range(3)
            ]
            nodes = [(s_.host, s_.port) for s_ in servers]
            pmap = [-1] * N_PARTITIONS
            for idx, (h_, p_) in enumerate(nodes):
                _g, owned = fetch_partition_map(h_, p_, ns_)
                for pt in owned:
                    pmap[pt] = idx
            eternal, now_s = merge.ETERNAL, merge.NOW_EPOCH_S
            state: dict = {}

            def put(rd):
                cl = state.get("clients")
                if cl is None:
                    cl = state["clients"] = [
                        WireClient(h_, p_, ns_, set_) for h_, p_ in nodes
                    ]
                key = str(rd["key"]).encode()
                bins = {
                    k2: ("%.2f" % v).encode()
                    for k2, v in rd["columns"].items()
                }
                ttl = (
                    0xFFFFFFFF
                    if rd["expiry"] == eternal
                    else int(rd["expiry"]) - now_s
                )
                c = cl[pmap[partition_id(key_digest(set_, key))]]
                return c.put(key, bins, ttl), c

            def wait(h):
                handle, c = h
                if c.wait(handle) != "ok":
                    raise RuntimeError("backup probe: non-ok put")
                return True

            bounded_async_foreach_writer(recs, put, wait, max_in_flight=32)
            n_ranges = 8
            span = N_PARTITIONS // n_ranges
            ranges_df = spark.createDataFrame(
                [(r, r * span, span) for r in range(n_ranges)],
                "rng int, begin int, count int",
            ).repartition(n_ranges, "rng")

            def scan_range(batches):
                for pdf in batches:
                    for begin, count in zip(pdf["begin"], pdf["count"]):
                        dh, cols, ttls = [], [], []
                        for h_, p_ in nodes:
                            c = WireClient(h_, p_, ns_, set_)
                            for digest, ttl, bins in c.scan(
                                int(begin), int(count)
                            ):
                                dh.append(digest.hex())
                                cols.append(
                                    ",".join(
                                        sorted(
                                            f"{n2}={v.decode()}"
                                            for n2, v in bins.items()
                                        )
                                    )
                                )
                                ttls.append(int(ttl))
                            c.close()
                        yield _pd.DataFrame(
                            {"digest_hex": dh, "cols_str": cols, "ttl": ttls}
                        )

            out_dir = _tf.mkdtemp(prefix="graft_backup_probe_")
            t0 = time.time()
            write_asb_scan(
                ranges_df.mapInPandas(
                    scan_range,
                    "digest_hex string, cols_str string, ttl long",
                ),
                out_dir, ns_, set_, now_s, n_files=4,
            )
            dt = time.time() - t0
            n_backed = read_asb_scan(spark, out_dir, ns_, set_, now_s).count()
            for s_ in servers:
                s_.close()
            recs.unpersist()
            shutil.rmtree(out_dir, ignore_errors=True)
            if n_backed != n:
                raise RuntimeError(f"backup probe lost records: {n_backed}/{n}")
            return n / dt, n

        b5, _ = backup_probe(5)
        b15, nb15 = backup_probe(15)
        slope.update(
            {
                "backup_recs_per_sec_x5": round(b5),
                "backup_recs_per_sec_x15": round(b15),
                "backup_slope_ratio": round(b15 / b5, 3),
            }
        )
        print(
            f"# backup slope: x5 {b5:,.0f} -> x15 {b15:,.0f} recs/s "
            f"(ratio {b15 / b5:.2f}, {nb15} records)",
            file=sys.stderr,
        )

        # round-13 (late): the batch-lookup family — the READ phase
        # resolves every stored key through per-node BATCH requests
        # (ClusterRouter.batch_read's batch-node split); per-unit
        # throughput should RISE with scale as the per-task connect +
        # tend floor amortizes over more digests per batch
        def batch_probe(factor: int):
            import pandas as _pd

            from cassandra2aerospike_spark.operators import merge
            from cassandra2aerospike_spark.sinks.aerospike_wire import (
                ClusterRouter,
                N_PARTITIONS,
                WireClient,
                WireServer,
                fetch_partition_map,
                key_digest,
                partition_id,
            )
            from cassandra2aerospike_spark.sinks.kv_sink import (
                bounded_async_foreach_writer,
            )

            ns_, set_ = "tmx", "blkup"
            recs = (
                merge.merge_records(ev)
                .withColumn(
                    "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
                )
                .withColumn(
                    "key", F.col("key") + F.col("rep").cast("long") * 10_000_000
                )
                .drop("rep")
                .select("key", "columns", "expiry")
                .persist()
            )
            n = recs.count()
            servers = [
                WireServer(
                    owned_partitions={
                        p for p in range(N_PARTITIONS) if p % 3 == i
                    },
                    info_namespace=ns_,
                )
                for i in range(3)
            ]
            nodes = [(s_.host, s_.port) for s_ in servers]
            pmap = [-1] * N_PARTITIONS
            for idx, (h_, p_) in enumerate(nodes):
                _g, owned = fetch_partition_map(h_, p_, ns_)
                for pt in owned:
                    pmap[pt] = idx
            eternal, now_s = merge.ETERNAL, merge.NOW_EPOCH_S
            state: dict = {}

            def put(rd):
                cl = state.get("clients")
                if cl is None:
                    cl = state["clients"] = [
                        WireClient(h_, p_, ns_, set_) for h_, p_ in nodes
                    ]
                key = str(rd["key"]).encode()
                bins = {
                    k2: ("%.2f" % v).encode()
                    for k2, v in rd["columns"].items()
                }
                ttl = (
                    0xFFFFFFFF
                    if rd["expiry"] == eternal
                    else int(rd["expiry"]) - now_s
                )
                c = cl[pmap[partition_id(key_digest(set_, key))]]
                return c.put(key, bins, ttl), c

            def wait(h):
                handle, c = h
                if c.wait(handle) != "ok":
                    raise RuntimeError("batch probe: non-ok put")
                return True

            bounded_async_foreach_writer(
                recs.coalesce(8), put, wait, max_in_flight=32
            )
            probes = recs.select("key").repartition(8)

            def lookup(batches):
                router = None
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    if router is None:
                        router = ClusterRouter(nodes, ns_, set_)
                    digs = [
                        key_digest(set_, str(int(k)).encode())
                        for k in pdf["key"]
                    ]
                    got = router.batch_read(digs)
                    miss = sum(1 for d in digs if got[d] is None)
                    yield _pd.DataFrame({"miss": [miss], "n": [len(digs)]})

            t0 = time.time()
            agg = (
                probes.mapInPandas(lookup, "miss long, n long")
                .groupBy()
                .sum("miss", "n")
                .first()
            )
            dt = time.time() - t0
            for s_ in servers:
                s_.close()
            recs.unpersist()
            if agg["sum(miss)"] != 0 or agg["sum(n)"] != n:
                raise RuntimeError(
                    f"batch probe lost lookups: {agg} for {n}"
                )
            return n / dt, n

        bl5, _ = batch_probe(5)
        bl15, nbl15 = batch_probe(15)
        slope.update(
            {
                "batch_lookup_recs_per_sec_x5": round(bl5),
                "batch_lookup_recs_per_sec_x15": round(bl15),
                "batch_lookup_slope_ratio": round(bl15 / bl5, 3),
            }
        )
        print(
            f"# batch-lookup slope: x5 {bl5:,.0f} -> x15 {bl15:,.0f} recs/s "
            f"(ratio {bl15 / bl5:.2f}, {nbl15} records)",
            file=sys.stderr,
        )

    sim_thru, n_vecs = gemm_probe(10)
    print(f"# similarity GEMM throughput: {sim_thru:,.0f} vecs/s over {n_vecs} vecs x 10 queries", file=sys.stderr)
    if os.environ.get("SPARK_GRAFT_SLOPE"):
        gemm30, nv30 = gemm_probe(30)
        slope.update(
            {
                "gemm_vecs_per_sec_x10": round(sim_thru),
                "gemm_vecs_per_sec_x30": round(gemm30),
                "gemm_slope_ratio": round(gemm30 / sim_thru, 3),
            }
        )
        print(
            f"# GEMM slope: x10 {sim_thru:,.0f} -> x30 {gemm30:,.0f} vecs/s "
            f"(ratio {gemm30 / sim_thru:.2f}, {nv30} vecs)",
            file=sys.stderr,
        )

    # Regression tripwire (VERDICT r10 task 2 / r12 tasks 1-2): the
    # NORMALIZED warm median (warm / host_speed_factor) is the tracked
    # per-query series; a flag requires the regression to reproduce in
    # the RAW warm series too (>1.5x the same-host raw minimum) — the
    # r12 s37 adjudication: a fixed-cost-bound query's raw time barely
    # moves with load, so its normalized value swings with the factor
    # alone (measured 0.89→1.81 on byte-identical code whose raw stayed
    # 0.91→1.32); such swings are normalization artifacts, not
    # regressions.  Baselines are per-query MINs across all same-tag/
    # same-sf artifacts (never a single contended round).  Queries with
    # baseline < 0.5 s sit inside the measured ±30% host noise band and
    # are exempt.  The list is part of the stdout JSON, so a regression
    # is visible in BENCH_rN itself; an empty list is the green state.
    warm_norm = {n: round(w / max(speed, 1e-9), 2) for n, w in warm.items()}
    tag = host_tag()
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev_tag, prev_norm = _prev_normalized(repo_dir, names, tag, sf)
    prev_raw = _prev_raw_warm(repo_dir, names, tag, sf)

    regressions, variance_waived = classify_regressions(
        warm, warm_norm, prev_norm, prev_raw, prev_tag
    )
    for w in variance_waived:
        print(
            f"# variance-waived {w['query']}: normalized warm "
            f"{w['prev_normalized']}s -> {w['now_normalized']}s crosses "
            f"1.5x but not the row's documented {w['threshold']}x "
            "fresh-session spread — logged, not flagged",
            file=sys.stderr,
        )
    # confirmation pass (r12): a 1-3 s query's 3-sample warm median
    # bounces ~1.4-2.1 s on byte-identical code (measured same-day),
    # which crosses the 1.5x line as pure noise.  Each flagged entry
    # re-measures with a FRESH 5-sample median (plus fresh calibration
    # samples, so a load change between the original measurement and
    # now is normalized too); only entries whose re-measured normalized
    # median STILL exceeds 1.5x the baseline stay in `regressions` — a
    # real regression reproduces, noise doesn't.
    regressions_refuted: list[dict] = []
    if regressions:
        jvm_samples.append(_jvm_calib_run(spark))
        py_samples.append(py_run())
        cpy_samples.append(cpy_run())
        _, _, _, speed = speed_now()
        confirmed = []
        for r in regressions:
            name = r["query"]
            thr = flag_threshold(name)
            samples = []
            for _ in range(5):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                samples.append(time.time() - t0)
            remed = statistics.median(samples)
            renorm = round(remed / max(speed, 1e-9), 2)
            raw_still = name not in prev_raw or remed > thr * prev_raw[name]
            if renorm > thr * prev_norm[name] and raw_still:
                r["confirm_normalized"] = renorm
                r["confirm_raw"] = round(remed, 2)
                confirmed.append(r)
            else:
                # refuted flags stay on the record in the detail sidecar
                # (ADVICE r17: a silently-dropped flag under-reports the
                # snapshot's 1.5x crossings)
                r["refuted_normalized"] = renorm
                r["refuted_raw"] = round(remed, 2)
                regressions_refuted.append(r)
                print(
                    f"# regression NOT confirmed {name}: re-measured "
                    f"normalized {renorm}s (raw {remed:.2f}s) vs baseline "
                    f"{r['prev_normalized']}s — noise, dropped",
                    file=sys.stderr,
                )
        regressions = confirmed
    for r in regressions:
        print(
            f"# REGRESSION {r['query']}: normalized warm "
            f"{r['prev_normalized']}s ({prev_tag}) -> {r['now_normalized']}s"
            f" (confirmed {r['confirm_normalized']}s)",
            file=sys.stderr,
        )
    # compact stdout form of each confirmed regression: the full entries
    # (baseline label, thresholds) live in the detail sidecar; the line
    # must carry the flags without evicting the per-query map
    regressions_compact = [
        {
            "q": short_name3(r["query"]),
            "p": r["prev_normalized"],
            "n": r["now_normalized"],
            "c": r.get("confirm_normalized"),
        }
        for r in regressions
    ]

    def _compact_val(v: float):
        """1-decimal rendering for the stdout qn map (ints when the
        decimal carries no information) — the tripwire's 1.5x threshold
        is insensitive to <0.05 s rounding, and the full-precision map
        rides the sidecar."""
        v = round(v, 1)
        return int(v) if v >= 10 or v == int(v) else v

    out = {
        "metric": "headline_query_suite",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # `qn` — the per-query NORMALIZED warm-median map, compact
        # (short_name3 keys + 1-decimal values, r18) so it survives the
        # driver's 2000-char stdout tail window EVERY round even at 100
        # headline queries: next round's tripwire (and the driver's
        # per-query speedup/scaling tables) read it back as a same-host
        # driver-to-driver baseline
        "qn": short_map3({n: _compact_val(v) for n, v in warm_norm.items()}),
        "host_tag": tag,
        "regressions": regressions_compact,
        # 1.5x crossings absorbed by a row's documented variance class
        # (names only here; full entries in the detail sidecar)
        "variance_waived": [w["query"] for w in variance_waived],
        "value_warm": round(sum(warm.values()), 3),
        "warm_k": k_warm,
        "calibration_sec": calib,
        "calibration_ref_sec": CALIBRATION_REF_SEC,
        "calibration_py_sec": calib_py,
        "calibration_py_ref_sec": PY_CALIBRATION_REF_SEC,
        "calibration_cpy_sec": calib_cpy,
        "calibration_cpy_ref_sec": CPY_CALIBRATION_REF_SEC,
        "host_speed_factor": speed,
        # scalar computed from the SAME rounded per-query values as the
        # map so the two always agree (ADVICE r17)
        "value_warm_normalized": round(sum(warm_norm.values()), 3),
        "sf": sf,
        "merge_throughput_rows_per_sec": round(thru),
        "sstable_merge_throughput_rows_per_sec": round(sst_thru),
        "real_ma_merge_throughput_rows_per_sec": round(ma_thru),
        # host-normalized twins (rate * speed_factor): the 491k<->648k
        # binary-path swings of r08-r10 are host noise when these hold
        # steady — the explanation now rides in the JSON itself
        "sstable_merge_rows_per_sec_normalized": round(sst_thru * speed),
        "real_ma_merge_rows_per_sec_normalized": round(ma_thru * speed),
        "merge_rows_per_sec_normalized": round(thru * speed),
        "baseline_reference_rows_per_sec": 100000,
        "dedup_throughput_docs_per_sec": round(dedup_thru),
        "similarity_gemm_vecs_per_sec": round(sim_thru),
        "media_decode_blobs_per_sec": round(media_thru),
    }
    # Full per-query detail (incl. spreads and slope probes) goes to a
    # sidecar; the stdout line must stay under the driver's 2000-char
    # tail-capture window or it arrives truncated and unparseable
    # (BENCH_r06 "parsed": null).  Budget 1750 with room for growth:
    # if the line would blow it, drop the warm map (the cold series is
    # the cross-round-comparable one; warm medians stay in the sidecar
    # and as the value_warm scalar).
    detail = dict(out)
    detail["regressions"] = regressions  # full entries, not the compact line form
    # flags raised then refuted by the confirmation pass (ADVICE r17:
    # every 1.5x crossing stays on the record with its re-measured value)
    detail["regressions_refuted"] = regressions_refuted
    detail["queries_warm"] = warm
    detail["queries_warm_normalized"] = warm_norm  # full-name twin of qn
    detail["queries_spread"] = spread
    # the per-row variance class + any 1.5x crossings it absorbed this
    # run (VERDICT r15 task 4): the raw signal stays on the record
    detail["variance_class"] = VARIANCE_FACTOR
    detail["variance_waived"] = variance_waived
    if slope:
        detail["scale_slope"] = slope
    # BENCH_DETAIL.json is COMMITTED (VERDICT r11 task 1): it carries the
    # host_tag, so the tripwire can use it as a same-machine baseline
    # when no tagged BENCH_r*.json exists yet, and refuses it otherwise.
    # ONLY the canonical sf0.1 run may touch the committed name — a
    # quick sf0.001 smoke once clobbered the idle baseline in the
    # working tree and slipped into a commit; off-SF runs now write an
    # untracked local sidecar instead
    sidecar = (
        "BENCH_DETAIL.json" if sf == 0.1 else f"BENCH_DETAIL_sf{sf}.json"
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), sidecar),
        "w",
    ) as fh:
        json.dump(detail, fh, indent=1)
    # stdout budget: the driver tail-captures exactly 2000 chars; keep
    # the line under 1980 (headroom for a trailing newline).  Fallback
    # order: the cold per-query map goes first (its total survives as
    # `value`), then SECONDARY scalars (raw throughput twins,
    # calibration components, value_warm — all recoverable from the
    # sidecar), then the waived/regression lists shrink to counts, and
    # only then — never, in practice — the compact normalized map, the
    # tracked tripwire + driver per-query series (VERDICT r17 task 2:
    # qn must survive EVERY round at 100 headline queries; the 3-char
    # alias + 1-decimal values leave ~100 chars of slack with every
    # secondary scalar already dropped).
    print(_fit_stdout_line(out))


if __name__ == "__main__":
    main()
