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

# Checked-prefix priority (see module docstring) — ROUND-10 prefix.
# The driver signs the first 50 registry rows; slots are spent on
# (a) queries with no driver row yet, (b) queries whose fixtures or
# semantics change this round, (c) the stalest cohort.  NOTE: no
# CORRECTNESS_r09.json was produced, so the round-9 prefix below was
# never driver-signed — it stays in place behind the 22 queries that
# are new since it was built (6 late-r09 + 16 r10).
_PRIORITY = [
    # -- (a) NEW this round (r10): bloom-pruned point lookup over
    #    Filter.db (both eras), as-of snapshot + snapshot-diff CDC +
    #    GC-grace census over the classified runs, SQ8/MRL integer
    #    ANN, asbackup-format roundtrip, bigram-LM quality filter,
    #    streaming CDC, exact prefix-filter n-gram Jaccard near-dup,
    #    distributed integer-GD quality classifier
    "s29_bloom_lookup_merge",
    "s30_asof_merge",
    "s31_snapshot_diff",
    "sim_sq8_topk",
    "s32_asb_backup_roundtrip",
    "text_ngram_lm",
    "s33_gc_grace_report",
    "s34_repair_merkle_ranges",
    "s35_partition_size_histogram",
    "sim_mrl_topk",
    "sim_bq_topk",
    "sim_chunk_pool_topk",
    "stream_snapshot_cdc",
    "stream_cdc_incremental",
    "dedup_jaccard_prefix_filter",
    "text_quality_classifier",
    # -- (a) new in r09 past the 50-slot cut, never driver-checked:
    #    old-era wide-partition fan-out, the real Aerospike wire sink
    #    (batch + streaming), BM25 retrieval, BPE train/encode
    "s27_old_wide_merge",
    "s28_aerospike_wire_sink",
    "stream_aerospike_wire_sink",
    "text_bm25_topk",
    "text_bpe_train",
    "text_bpe_encode",
    # -- (a) carried from the unsigned r09 prefix: round-8's
    #    non-frozen UDT merge (field-index cell paths; r09 added
    #    per-generation UDT schema evolution) and ReversedType DESC
    #    clustering (complement-after-framing sort keys, both merge
    #    branches) — judge-verified in r08, still no driver row
    "s25_udt_merge",
    "s26_reversed_ck_merge",
    # -- (b) fixtures/semantics changed in r09/r10 without a driver
    #    re-verify: s19's mixed directory gained nb (r09) then oa
    #    (r10, Cassandra 5.0) generations; the r10 writers now emit
    #    Filter.db bloom sidecars in BOTH eras (s8/s16 read those
    #    directories); s20 exercises the r08 framed-key change; s24
    #    rides the r09 complex_value_fmt malformed-path strictening
    "s19_mc_era_merge",
    "s20_ma_rt_compaction_roundtrip",
    "s24_collection_merge",
    # -- (c) the full r05-stale cohort (45 rows), semantics-adjacent
    #    rows first: the sstable read path (old-format promoted-index
    #    split + the r08 comparator change touch these), then the rest.
    "s15_ma_format_merge",
    "s17_ma_clustering_merge",
    "s18_ma_range_tombstone_merge",
    "s8_oldformat_merge",
    "s16_mixed_era_merge",
    "s9_sstable_merge",
    "ma_compaction_roundtrip",
    "merge_full",
    "pipeline_sstable_corpus",
    "stream_real_sstable_ingest",
    "o2_real_resume",
    "s11_create_only_sink",
    "mm_binary_meta",
    "mm_media_probe",
    "mm_real_decode",
    "mm_real_frame_sample",
    "mm_real_resize",
    "mm_video_probe",
    "dedup_exact_prefix",
    "layout_zorder",
    "sample_domain_mix",
    "sample_stratified",
    "scalar_arrays",
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
    # -- position 51+: the 21 rows the (eventually 13-deep) r10 head
    #    displaces past the 50-slot cut — pure-relational / pure-text /
    #    scalar rows untouched by any sstable-path change, and all
    #    oracle-verified locally every run by tests/test_oracle_parity.py
    #    + tools/check_oracle.py (this round's local full-gate run:
    #    0 failures / 167).  First in line for the r11 rotation.
    "agg_percentiles",
    "agg_approx_distinct",
    "agg_approx_percentiles",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
