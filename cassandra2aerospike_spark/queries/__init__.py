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
    # -- round-7 NEW queries: typed multi-clustering-column cover on
    #    real bytes (signed Int32 + UTF8 clustering, prefix + full
    #    range-marker bounds, static-row deletions; tagged-union with
    #    its compaction roundtrip through the typed DataSource write
    #    path), and multi-cell COLLECTION columns (map/set/list cell
    #    paths + complex deletions — the HAS_COMPLEX_DELETION grammar
    #    the reference declares but cannot read)
    "s22_multi_ck_range_merge",
    "s24_collection_merge",
    # -- round-7 CHANGED surfaces that must re-verify: the dup-span
    #    gram frequency moved from a count-over-window to groupBy+join
    #    (hot-key fix); the counter fixture gained a REAL ma generation
    #    (3-era ka+la+ma reconciliation); PII scrubbing gained IPv6 /
    #    Luhn-checked card / national-ID classes
    "text_dup_span_removal",
    "a7_counter_reconcile",
    "text_pii_scrub",
    # -- rotation (VERDICT r6 item 6): the entire round-4-latest cohort
    #    (45 rows) re-enters the checked prefix so no registry row's
    #    newest green is older than r05 at r07 end
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
    "dedup_jaccard_pairs",
    "dedup_keep_list",
    "dedup_edit_distance",
    "dedup_simhash_pairs",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_embedding_neardup",
    "token_murmur3",
    "text_gopher_rules",
    "text_repetition_rules",
    "f4_ttl_policy",
    "p4_partitioner_registry",
    "p5_partitioner_abort",
    "s12_retry_backpressure",
    "text_line_dedup",
    "sim_pq_topk",
    "sim_ivfpq_topk",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"priority list references unknown queries: {_missing}"

QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
