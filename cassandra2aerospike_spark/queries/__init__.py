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
    # -- round-4 NEW queries: components that previously had no driver row
    "f4_ttl_policy",            # CLI -x eternal-record TTL policy
    "p4_partitioner_registry",  # registry dispatch + default + abort
    "p5_partitioner_abort",     # multi-run partitioner consistency abort
    "s12_retry_backpressure",   # bounded-async writer requeue counters
    "pipeline_corpus_prep",     # capstone quality->exact->near-dup keep list
    "text_line_dedup",          # C4-style corpus-level line dedup
    "sim_pq_topk",              # product-quantization ADC top-k
    "sim_ivfpq_topk",           # IVF cells + PQ reconstructions (flagship ANN)
    # -- round-4 CHANGED surfaces: mixed-era fixtures now include SGRA +
    #    Snappy chunks + composite cell paths + Adler32 discipline ...
    "s8_oldformat_merge",
    "s9_sstable_merge",
    # ... similarity local pre-top-k moved from mapInPandas to a JVM
    #     (partition_id, q_id) row_number window ...
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_embedding_neardup",
    # ... the dedup tokenizer stage gained the spread_scan exchange ...
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "dedup_keep_list",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_edit_distance",
    # ... gopher_rules builds symbol counts from the passed Column now ...
    "text_gopher_rules",
    "text_repetition_rules",
    # ... and the murmur3 oracle gained the <= 8-byte loud guard
    "token_murmur3",
    # -- rotation: queries whose only driver row is from ROUND 1 (the
    #    stalest evidence; r2/r3-green entries sit after the cut)
    "f2_live_row_counts",
    "a2_row_tombstone_max",
    "a4_expiry_fold_first",
    "f3_expired_filter",
    "compaction_roundtrip",
    "counter_merge",
    "a5_pivot_wide",
    "join_inner",
    "join_left",
    "join_right",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_broadcast_star",
    "join_range_theta",
    "agg_pricing_summary",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_minmax_stats",
    "agg_collect",
    "agg_salted_skew",
    "win_topk_per_group",
    "win_rank",
    "win_running_sum",
    "win_distribution",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
