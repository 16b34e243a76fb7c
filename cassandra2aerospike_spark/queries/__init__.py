"""Named-query registry: every operator from SURVEY.md §2 ships as a
(callable, oracle-SQL) pair consumed by __spark_entry__.py.

Each submodule contributes a QUERIES dict (name -> f(spark, sf_dir) ->
DataFrame) and an ORACLES dict (name -> DuckDB SQL).  Every registered
query currently carries an exact oracle; tests/test_registry.py
enforces ORACLES keys == QUERIES keys (rows-only exceptions must be
declared there explicitly) and that every module-level q_* function is
registered — the round-8 slip (two written-but-unregistered queries
shipping driver-unverified) is now a test failure.

REGISTRY ORDER IS DELIBERATE: the driver's correctness gate checks the
FIRST 50 registry rows each round, so _PRIORITY spends those slots on
(a) queries with no driver row yet, (b) queries whose fixtures or
semantics changed this round, (c) the stalest cohort — see the comment
at _PRIORITY for the current (round-10) allocation.  Everything after
the cut keeps module order and rotates back in as its driver green
ages.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import dedup_q, merge_q, pipeline_q, relational_q, sim_q, stream_q, text_q, tokens_q, udx_q

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _mod in (merge_q, relational_q, text_q, dedup_q, sim_q, tokens_q, pipeline_q, stream_q, udx_q):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)

# Checked-prefix priority (see module docstring) — ROUND-11 prefix.
# The driver signs the first 50 registry rows; slots are spent on
# (a) queries NEW this round, (b) queries whose fixtures, plans or
# semantics changed this round, (c) the stalest driver-signature
# cohort.  Signature histogram entering r11 (latest green driver round
# per row): r05 x22 live (+3 retired names), r06 x46, r08 x49, r10
# x50 — this prefix spends 11 slots on (a)+(b) and all 39 remaining on
# the complete live r05 cohort (22 rows) plus the first 17 of the r06
# cohort; the remaining 29 r06 rows sit at positions 51+ and head the
# r12 rotation.
_PRIORITY = [
    # -- (a) NEW in r11: the secured 3-node wire cluster (LOGIN
    #    handshake, digest partition-map routing, distributed digest
    #    join), the widened typed-marshal merge (7 classes beyond
    #    the reference's enum on a real nb-era zstd-chunked table)
    #    and the wire READ-BACK verification pass
    "s36_wire_cluster_sink",
    "s37_marshal_types_merge",
    "s38_wire_readback_verify",
    "stream_cdc_wire_apply",
    "s39_e2e_migration_verified",
    # -- (b) changed in r11 without a driver re-verify yet: s19's
    #    nb/oa generations switched to ZstdCompressor chunks (the new
    #    codec); s29's lookup plan now batches windows into bounded
    #    per-sstable tasks; s28/stream wire sinks replaced the
    #    collected-keys digest inversion with the distributed join;
    #    the CDC pair gained idempotent batch-keyed sinks, and the
    #    incremental one per-fold state pruning
    "s19_mc_era_merge",
    "s29_bloom_lookup_merge",
    "s28_aerospike_wire_sink",
    "stream_aerospike_wire_sink",
    "stream_snapshot_cdc",
    "stream_cdc_incremental",
    # -- (c) the FULL live r03+r05 cohort (22 rows; the three other
    #    stale signatures — mm_decode_features r03, mm_frame_sample and
    #    mm_resize r05 — name RETIRED queries superseded by the
    #    real-decode mm_real_* family, which is r10-signed)
    "agg_approx_distinct",
    "agg_approx_percentiles",
    "agg_percentiles",
    "scalar_conditional",
    "scalar_maps",
    "scalar_math_safe",
    "scalar_strings_hex",
    "series_gap_fill",
    "set_ops_all",
    "set_ops_distinct",
    "sort_multi_limit",
    "src_formats_roundtrip",
    "text_decontaminate",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_rare_token_filter",
    "text_salient_terms",
    "text_token_stats",
    "topk_global",
    "unpivot_melt",
    "win_range_frame",
    # -- (c) the first 20 of the r06 cohort: stream_stateful_lww first
    #    (its module carried this round's CDC edits), then
    #    alphabetically
    "stream_stateful_lww",
    "a1_lww_latest",
    "a4_expiry_fold_last",
    "a5_record_assembly",
    "agg_bitwise",
    "agg_session_windows_batch",
    "agg_stats_moments",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "f1_live_cells",
    "gm_sessionize",
    "j1_kway_merge",
    "j3_range_tombstone_cover",
    "join_asof",
    "join_bucketed_colocated",
    "o2_layout_resume",
    # -- position 51+: the remaining 29 r06-latest rows, first in line
    #    for the r12 rotation
    "pipeline_corpus_prep",
    "s10_clustering_merge",
    "s13_dry_run",
    "s14_run_accounting",
    "s21_schema_evolution_merge",
    "s2_run_identity",
    "sample_hash_split",
    "scalar_dates",
    "scalar_json",
    "sim_cosine_topk_fast",
    "sim_kmeans_cells",
    "sim_semantic_dedup",
    "stream_corpus_dedup",
    "stream_dedup_keys",
    "stream_late_data",
    "stream_session_windows",
    "stream_sstable_ingest",
    "stream_stream_join",
    "stream_window_counts",
    "text_chunk_windows",
    "text_pack_sequences",
    "text_term_freq",
    "token_md5",
    "token_resume",
    "token_ring_buckets",
    "udaf_expiry_fold",
    "udtf_tokenize",
    "win_frame_analytics",
    "win_lag_lead",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
