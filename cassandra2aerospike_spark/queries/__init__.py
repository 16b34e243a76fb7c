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
    # -- round-6 NEW queries: Cassandra 3.11-era (mc/md) directory
    #    auto-detect on real files, and the range-tombstone WRITE path
    #    (full-content rewrite of the s18 table through layout=ma)
    "s19_mc_era_merge",
    "s20_ma_rt_compaction_roundtrip",
    # -- round-6 NEW training-pipeline queries: SemDeDup-style semantic
    #    dedup (integer-cosine within k-means cells, planted near-dups),
    #    PII scrubbing (Java/RE2 common-subset regexes, full-md5 oracle),
    #    and the stream-static corpus-dedup join
    "sim_semantic_dedup",
    "text_pii_scrub",
    "stream_corpus_dedup",
    "text_chunk_windows",
    "text_dup_span_removal",
    "s21_schema_evolution_merge",
    # -- round-6 CHANGED surfaces: the LSH family now materializes its
    #    shingle frame via a parquet storage checkpoint (shared across
    #    all consumers + the incremental corpus fingerprints); the
    #    kmeans oracle moved to pure integer division; the jpeg decoder
    #    accepts fill bytes/standalone markers; the madocs fixture cache
    #    key folds in the source parquet's identity
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "pipeline_corpus_prep",
    "sim_kmeans_cells",
    # -- rotation (VERDICT r5 item 9): the entire round-3-latest cohort
    #    re-enters the checked prefix so no registry row's newest green
    #    is older than two rounds at r06 end
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
    "win_lag_lead",
    "win_frame_analytics",
    "text_pack_sequences",
    "text_term_freq",
    "sim_cosine_topk_fast",
    "token_md5",
    "token_ring_buckets",
    "token_resume",
    "stream_window_counts",
    "stream_late_data",
    "stream_session_windows",
    "stream_dedup_keys",
    "stream_stream_join",
    "stream_sstable_ingest",
    "udaf_expiry_fold",
    "udtf_tokenize",
    "stream_stateful_lww",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
