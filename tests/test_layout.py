"""Token-range layout (O1/O2 at scale): directory-level partition pruning
for resume scans, plus salted-agg equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra2aerospike_spark.functions.tokens import md5_token
from cassandra2aerospike_spark.plans import audit
from cassandra2aerospike_spark.sources import load_table
from cassandra2aerospike_spark.sources.token_layout import (
    read_resume,
    token_range_of,
    write_token_layout,
)


def test_token_layout_resume_prunes_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cust_layout")
    cust = load_table(spark, sf_dir, "customer")
    write_token_layout(cust, "c_custkey", out, n_ranges=32)

    start = "80"  # resume from the middle of the ring
    got = read_resume(spark, out, start, n_ranges=32)

    # correctness: exactly the keys whose token >= start survive
    expect = (
        cust.withColumn("token", md5_token(F.col("c_custkey")))
        .filter(F.col("token") >= start)
        .select("c_custkey")
    )
    assert sorted(r.c_custkey for r in got.select("c_custkey").collect()) == sorted(
        r.c_custkey for r in expect.collect()
    )

    # plan: the coarse range predicate must prune DIRECTORIES (partition
    # filter), not just rows — the analog of dropping whole runs before EOF
    rep = audit(got)
    assert "PartitionFilters" in rep.plan and "token_range" in rep.plan, rep.plan
    # and the fine token predicate must reach the parquet scan
    assert any("token" in pf for pf in rep.pushed_filters), rep.pushed_filters


def test_token_range_of_contiguous(spark):
    """Range ids are contiguous in token order: prefix byte b maps to
    b * n / 256, monotone and onto 0..n-1."""
    df = spark.range(0, 256).select(
        F.lpad(F.conv(F.col("id"), 10, 16), 2, "0").alias("tok")
    )
    got = df.select(token_range_of(F.col("tok"), 32).alias("r")).collect()
    rs = [r.r for r in got]
    assert rs == sorted(rs) and set(rs) == set(range(32))


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from cassandra2aerospike_spark.operators.relational import salted_agg

    ev = load_table(spark, sf_dir, "events")
    salted = salted_agg(
        ev,
        ["event_type"],
        F.col("event_id"),
        {
            "n": (F.col("event_id"), "count"),
            "mx": (F.col("ts_us"), "max"),
            "mn": (F.col("ts_us"), "min"),
        },
        n_salts=16,
    )
    plain = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.max("ts_us").alias("mx"),
        F.min("ts_us").alias("mn"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
