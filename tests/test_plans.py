"""Physical-plan posture tests: assert the plan properties that must
survive a 100× scale-up (SURVEY.md §4).  A regression that adds a
shuffle, drops a broadcast, leaks a cartesian product, or sneaks a
row-at-a-time Python UDF into a hot path fails here — before it ever
shows up as a slow benchmark.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from cassandra2aerospike_spark.plans import assert_scale_posture, audit


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_merge_full_single_scan_single_shuffle(spark, sf_dir, queries):
    """The reference's end-to-end merge: ONE pass over the input, ONE
    shuffle (the key exchange feeds window + both aggregations)."""
    rep = assert_scale_posture(
        queries["merge_full"](spark, sf_dir), max_scans=1, max_exchanges=1
    )
    assert rep.n_sortmerge_joins == 0 and rep.n_broadcast_joins == 0


def test_lww_latest_one_shuffle(spark, sf_dir, queries):
    assert_scale_posture(
        queries["a1_lww_latest"](spark, sf_dir), max_scans=1, max_exchanges=1
    )


def test_record_assembly_reuses_key_partitioning(spark, sf_dir, queries):
    """groupBy(key, col) then groupBy(key): hash(key) satisfies both, so
    record assembly must not re-shuffle."""
    assert_scale_posture(
        queries["a5_record_assembly"](spark, sf_dir), max_scans=1, max_exchanges=1
    )


def test_broadcast_star_join_broadcasts_all_dims(spark, sf_dir, queries):
    rep = assert_scale_posture(
        queries["join_broadcast_star"](spark, sf_dir), require_broadcast=True
    )
    assert rep.n_sortmerge_joins == 0, "dim join fell back to sort-merge"


def test_resume_scan_pushes_key_filter(spark, sf_dir):
    """O2 resume: a start-key predicate on a STORED column must reach the
    parquet scan (the Spark analog of the reference's Summary/Index seek).
    The md5-token variant (token_resume 'scan_cut' branch) filters a derived column and
    legitimately cannot push — this covers the prunable path."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.sources import load_table

    df = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") >= 100)
    rep = audit(df)
    assert any("GreaterThanOrEqual(c_custkey,100)" in pf for pf in rep.pushed_filters), (
        rep.pushed_filters
    )


def test_no_python_row_udfs_anywhere(spark, sf_dir, queries):
    """UDF discipline: vectorized (Arrow) stages are allowed, BatchEvalPython
    is not.  Streaming queries excluded (no batch plan to audit)."""
    offenders = {}
    for name, fn in queries.items():
        if name.startswith("stream_"):
            continue
        rep = audit(fn(spark, sf_dir))
        if rep.n_python_row_udf:
            offenders[name] = rep.n_python_row_udf
    assert not offenders, f"row-UDF stages found: {offenders}"


def test_no_cartesian_products_anywhere(spark, sf_dir, queries):
    """No unbounded cartesian joins.  BroadcastNestedLoopJoin is tolerated
    only when one side is a broadcast small-dim (θ-join patterns); plain
    CartesianProduct is always a bug."""
    offenders = {}
    for name, fn in queries.items():
        if name.startswith("stream_"):
            continue
        rep = audit(fn(spark, sf_dir))
        if "CartesianProduct" in rep.plan:
            offenders[name] = True
    assert not offenders, f"cartesian products found: {offenders}"


def test_dedup_lsh_no_explosive_plan(spark, sf_dir, queries):
    rep = assert_scale_posture(queries["dedup_minhash_lsh"](spark, sf_dir))
    assert rep.n_cartesian == 0


def test_scan_prunes_columns(spark, sf_dir, queries):
    """Column pruning reaches the scan: a 2-column aggregate must not read
    the whole events schema."""
    rep = audit(queries["a1_lww_latest"](spark, sf_dir))
    assert rep.read_schemas, "no ReadSchema found"
    # a1 needs user_id, event_type, value, ts — not event_id/props/etc.
    assert all("props" not in s for s in rep.read_schemas), rep.read_schemas


def test_bucketed_join_is_exchange_free(spark, sf_dir, queries):
    """Co-located bucketed join: both sides hash-clustered on the join key
    at WRITE time, so the SortMergeJoin AND the downstream per-key
    aggregation plan with zero runtime Exchanges — the layout technique
    that amortizes the fact-table shuffle across every query at 100 TB."""
    rep = audit(queries["join_bucketed_colocated"](spark, sf_dir))
    assert rep.n_exchanges == 0, rep.summary()
    assert rep.n_sortmerge_joins == 1 and rep.n_broadcast_joins == 0, rep.summary()


def test_salted_agg_two_exchanges_no_joins(spark, sf_dir, queries):
    """Salted aggregation trades exactly ONE extra (tiny) shuffle for skew
    immunity: partial agg on (keys, salt), finish on keys — and no joins."""
    rep = assert_scale_posture(queries["agg_salted_skew"](spark, sf_dir), max_exchanges=2, max_scans=1)
    assert rep.n_sortmerge_joins == 0 and rep.n_broadcast_joins == 0


def test_ivf_topk_broadcasts_cell_join(spark, sf_dir, queries):
    """IVF ANN: the query-side cell join must be a broadcast hash join
    (query set is the small side); the corpus must never sort-merge or
    cartesian against anything (the 1-row codebook BNLJ is the one
    tolerated nested-loop, audited by the global cartesian test)."""
    rep = assert_scale_posture(
        queries["sim_ivf_topk"](spark, sf_dir),
        require_broadcast=True,
        forbid_cartesian=False,  # 1-row broadcast codebook only
    )
    assert rep.n_sortmerge_joins == 0
    assert "CartesianProduct" not in rep.plan


def test_bucketed_join_needs_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located join via bucketing (SURVEY.md §4 'merge without sort'):
    two tables bucketed+sorted on the join key join with ZERO exchanges —
    the Spark analog of the reference exploiting pre-sorted runs."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
       .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
       .option("path", str(tmp_path / "b_customer")).saveAsTable("b_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("b_orders")
            .join(spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey")
            .agg(F.count("*").alias("n"))
        )
        rep = audit(j)
        assert rep.n_exchanges == 0, f"bucketed join shuffled:\n{rep.plan}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_topk_per_group_pushes_window_group_limit(spark, sf_dir, queries):
    """rank-filter top-k must trigger WindowGroupLimit (per-partition
    top-k below the shuffle) — without it, skewed groups materialize
    their full window state."""
    rep = audit(queries["win_topk_per_group"](spark, sf_dir))
    assert "WindowGroupLimit" in rep.plan, rep.plan


def test_approx_percentiles_close_to_exact(spark, sf_dir, queries):
    # the query now carries its own sketch-vs-exact bound check (that's
    # what makes it oracle-checkable); assert every group is in-bound and
    # the exact side agrees with the exact-percentile query
    rows = {r.l_returnflag: r
            for r in queries["agg_approx_percentiles"](spark, sf_dir).collect()}
    exact = {r.l_returnflag: (r.p50, r.p90)
             for r in queries["agg_percentiles"](spark, sf_dir).collect()}
    for k, r in rows.items():
        assert r.p50_in_bound == 1 and r.p90_in_bound == 1
        e50, e90 = exact[k]
        assert r.p50_exact == e50 and r.p90_exact == e90


def test_jaccard_shingle_frame_materializes_once(spark, sf_dir, queries):
    """RUNTIME one-materialization assertion (PLANS.md caveat): the
    shingle-set frame feeding dedup_jaccard_pairs' ~12 consumers is a
    STORAGE checkpoint (functions/dedup.stage_parquet) — written to
    parquet exactly once at build, scanned (not re-derived) by every
    consumer.  Assertions: (a) after the build, the executed query never
    touches documents.parquet — every input file is the checkpoint's;
    (b) a rebuild reuses the checkpoint byte-for-byte (marker-guarded,
    no rewrite); (c) the executed stage count sits in the
    one-materialization regime (a per-consumer re-derivation would add
    ~2 stages per consumer, landing 30+)."""
    import glob
    import os
    import shutil

    from cassandra2aerospike_spark.queries.dedup_q import _ckpt_dir

    sc = spark.sparkContext
    ckpt = _ckpt_dir(sf_dir, "sets_k3")
    shutil.rmtree(ckpt, ignore_errors=True)  # exercise a fresh write
    df = queries["dedup_jaccard_pairs"](spark, sf_dir)

    files = df.inputFiles()
    assert files and all("documents.parquet" not in f for f in files), (
        "consumers must scan the checkpoint, not re-derive from documents"
    )
    assert all(os.path.abspath(ckpt) in os.path.abspath(f.replace("file:", "")) for f in files)

    snap = sorted(
        (f, os.path.getmtime(f)) for f in glob.glob(os.path.join(ckpt, "*.parquet"))
    )
    assert snap, "checkpoint parquet missing after build"
    df2 = queries["dedup_jaccard_pairs"](spark, sf_dir)  # rebuild: marker hit
    snap2 = sorted(
        (f, os.path.getmtime(f)) for f in glob.glob(os.path.join(ckpt, "*.parquet"))
    )
    assert snap2 == snap, "rebuild rewrote the checkpoint instead of reusing it"

    sc.setJobGroup("jaccard_runtime_probe", "one-materialization assertion")
    try:
        df2.count()
    finally:
        sc.setJobGroup(None, None)

    tracker = sc.statusTracker()
    stage_ids = set()
    for jid in tracker.getJobIdsForGroup("jaccard_runtime_probe"):
        stage_ids.update(tracker.getJobInfo(jid).stageIds)
    executed = 0
    for sid in stage_ids:
        si = tracker.getStageInfo(sid)
        if si is not None and si.numCompletedTasks > 0:
            executed += 1
    assert 0 < executed <= 24, (
        f"{executed} executed stages — above the one-materialization regime"
    )


def test_global_shuffle_single_exchange(spark, sf_dir, queries):
    """The seeded global shuffle (round 13) pays exactly ONE exchange —
    the per-shard rank window's repartition, the same shuffle a shard
    writer must pay — over one corpus scan, no joins."""
    rep = assert_scale_posture(
        queries["sample_global_shuffle"](spark, sf_dir),
        max_scans=1, max_exchanges=1,
    )
    assert rep.n_sortmerge_joins == 0 and rep.n_broadcast_joins == 0
