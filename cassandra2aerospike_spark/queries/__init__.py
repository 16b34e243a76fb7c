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
at _PRIORITY for the current (round-12) allocation.  Everything after
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

# Checked-prefix priority (see module docstring) — ROUND-15 prefix.
# The driver signs the first 50 registry rows; slots are spent on
# (a) the 7 rows NEW this round (the batch-WRITE op family, its
#     live-handoff variant and the batched streaming CDC applier,
#     image AND audio near-dup dedup over real byte decode, the
#     token-true BPE-packed manifest, the multimodal corpus-prep
#     capstone),
# (b) ALL 19 rows of the stalest (r10) cohort — VERDICT r14 task 1,
# (c) the r12-signed wire rows named by the r14 rotation note (s28,
#     s36, s38-s43, stream_aerospike_wire_sink, stream_cdc_cluster_
#     apply, stream_cdc_wire_apply): r14 touched shared wire code they
#     all traverse, and r15 touched it again (the operate op grammar
#     factored into encode_op/decode_op + apply_op_list, and a new
#     dispatch branch in WireServer._apply every wire request passes),
# (d) 13 of the r11 cohort, wire/stream-adjacent and merge-core rows
#     first (join_asof, src_formats_roundtrip and o2_layout_resume
#     rotated out to make room for the new rows; they head the r16
#     rotation with the rest of the r11 cohort).
# Signature histogram entering r15: r10 x19, r11 x44, r12 x50,
# r13 x49, r14 x50 (212 rows, all driver-green at least once; zero
# regressions ever).  After this prefix signs, no row is older than
# r11; the remaining 28 r11 rows head the r16 rotation, followed by
# the 39 r12 rows.  The r14-signed wire rows (s47-s58) also traverse
# the r15 wire-code touches — they re-passed their exact oracles in
# the full post-change pytest suite and rotate behind the older
# cohorts rather than consuming fresh slots two rounds running.
_PRIORITY = [
    # -- (a) NEW in r15
    "s59_wire_batch_write",
    "s60_wire_batch_write_during_handoff",
    "stream_cdc_batch_apply",
    "mm_phash_dedup",
    "pipeline_bpe_manifest",
    "pipeline_multimodal_prep",
    "mm_audio_fp_dedup",
    # -- (b) the whole r10 cohort
    "dedup_exact_prefix",
    "ma_compaction_roundtrip",
    "mm_binary_meta",
    "mm_media_probe",
    "mm_real_decode",
    "mm_real_frame_sample",
    "mm_real_resize",
    "mm_video_probe",
    "s35_partition_size_histogram",
    "sample_domain_mix",
    "sample_stratified",
    "scalar_arrays",
    "sim_bq_topk",
    "sim_chunk_pool_topk",
    "sim_mrl_topk",
    "sim_sq8_topk",
    "text_bpe_encode",
    "text_ngram_lm",
    "text_quality_classifier",
    # -- (c) r12-signed wire rows over the re-touched shared wire code
    "s28_aerospike_wire_sink",
    "s36_wire_cluster_sink",
    "s38_wire_readback_verify",
    "s39_e2e_migration_verified",
    "s40_wire_cluster_handoff",
    "s41_wire_rf2_failover",
    "s42_wire_cluster_scan_source",
    "s43_wire_partition_scan_source",
    "stream_aerospike_wire_sink",
    "stream_cdc_cluster_apply",
    "stream_cdc_wire_apply",
    # -- (d) r11 cohort, wire/stream-adjacent + merge core first
    "stream_cdc_incremental",
    "stream_snapshot_cdc",
    "stream_stateful_lww",
    "s19_mc_era_merge",
    "s29_bloom_lookup_merge",
    "s37_marshal_types_merge",
    "j1_kway_merge",
    "j3_range_tombstone_cover",
    "a1_lww_latest",
    "f1_live_cells",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_incremental",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
