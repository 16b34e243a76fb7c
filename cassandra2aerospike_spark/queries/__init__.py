"""Named-query registry: every operator from SURVEY.md §2 ships as a
(callable, oracle-SQL) pair consumed by __spark_entry__.py.

Each submodule contributes a QUERIES dict (name -> f(spark, sf_dir) ->
DataFrame) and an ORACLES dict (name -> DuckDB SQL).  Queries without an
oracle entry get the driver's weaker rows-only check (streaming, LSH, ...).

REGISTRY ORDER IS DELIBERATE: the driver's correctness gate checks a
prefix of the registry (round 1 recorded rows for exactly the first 50
entries), so entries that do not yet have a driver-green CORRECTNESS row
— plus queries whose semantics changed this round — are ordered FIRST,
covering every §2/X family inside the checked prefix.  Queries that
already hash-passed in CORRECTNESS_r01.json sit after the cut; their
round-1 rows stand as evidence, and they rotate back into the prefix
once the newer families are green.
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

# Checked-prefix priority (see module docstring).  First the queries that
# were fixed/changed this round, then one-or-more per family without a
# round-1 driver row.  Everything not listed keeps its module order after
# the prefix.
_PRIORITY = [
    # -- round-5 NEW training-pipeline queries: benchmark decontamination
    #    (broadcast n-gram overlap), stratified rate sampling, domain
    #    mixing by epoch repetition
    "text_decontaminate",
    "sample_stratified",
    "sample_domain_mix",
    "sim_kmeans_cells",
    "text_rare_token_filter",
    "text_salient_terms",
    "layout_zorder",
    "dedup_incremental",
    "mm_real_frame_sample",
    "mm_video_probe",
    "pipeline_sstable_corpus",
    "src_formats_roundtrip",
    # -- round-6 NEW queries: Cassandra 3.11-era (mc/md) directory
    #    auto-detect on real files, plus REAL clustered tombstones
    #    (ck-bounded range markers + clustered-row deletions) via layout=ma
    "s19_mc_era_merge",
    "s20_ma_rt_compaction_roundtrip",
    "s18_ma_range_tombstone_merge",
    "a7_counter_reconcile",
    # -- round-5 NEW queries: REAL Cassandra 3.x ma-format table read
    #    end-to-end through the DataSource layout=ma branch, and REAL
    #    media-container header parsing (PNG/GIF/WAV) for X5
    "s16_mixed_era_merge",
    "s17_ma_clustering_merge",
    "s15_ma_format_merge",
    "mm_media_probe",
    "mm_real_decode",
    "mm_real_resize",
    "ma_compaction_roundtrip",
    "stream_real_sstable_ingest",
    "o2_real_resume",
    # -- round-5 CHANGED surfaces: the mixed-codec fixtures now exercise
    #    all three reference compressors in one scan (deflate + Snappy +
    #    the new pure-Python LZ4 block codec, Buffer.cpp:243-272)
    "s8_oldformat_merge",
    "s9_sstable_merge",
    # -- rotation, stalest first (VERDICT r4 item 1: after r05 no
    #    registry query's newest green row may be older than two rounds).
    #    These 7 were round-1-latest ...
    "agg_percentiles",
    "scalar_arrays",
    "scalar_maps",
    "series_gap_fill",
    "sort_multi_limit",
    "topk_global",
    "win_range_frame",
    # ... these 17 round-2-latest ...
    "agg_approx_distinct",
    "agg_approx_percentiles",
    "dedup_exact_prefix",
    "mm_binary_meta",
    "s11_create_only_sink",
    "scalar_conditional",
    "scalar_math_safe",
    "scalar_strings_hex",
    "set_ops_all",
    "set_ops_distinct",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "unpivot_melt",
    # ... and the rest of the prefix rolls through the round-3-latest
    #     cohort so it cannot age past two rounds either
    "merge_full",
    "a1_lww_latest",
    "a4_expiry_fold_last",
    "a5_record_assembly",
    "f1_live_cells",
    "j1_kway_merge",
    "j3_range_tombstone_cover",
    "s2_run_identity",
    "s10_clustering_merge",
    "s13_dry_run",
    "s14_run_accounting",
    "o2_layout_resume",
    "join_asof",
    "join_bucketed_colocated",
    "agg_bitwise",
    "agg_session_windows_batch",
    "agg_stats_moments",
    "gm_sessionize",
    "sample_hash_split",
    "scalar_dates",
    "scalar_json",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
