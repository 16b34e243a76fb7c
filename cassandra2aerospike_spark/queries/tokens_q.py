"""Token / partitioner / ordering / resume queries (SURVEY.md §2.6, §2.8
P1-P3, O1-O4) over the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import tokens as TK
from ..sources import load_table


def q_token_md5(spark, sf_dir):
    """P2 RandomPartitioner analog: md5 token per key (hex order == ring
    order)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", TK.md5_token(F.col("c_custkey")).alias("token")
    )


def q_token_ring_ranges(spark, sf_dir):
    """O1: token-ring range assignment — first token byte buckets the ring
    into 32 ranges; per-range key counts (the unit of the reference's
    global (token, key) iteration order, CassandraParser.cpp:38-46)."""
    c = load_table(spark, sf_dir, "customer")
    tok = TK.md5_token(F.col("c_custkey"))
    range_id = F.floor(
        F.conv(F.substring(tok, 1, 2), 16, 10).cast("int") / 8
    ).cast("int")
    return (
        c.select(tok.alias("token"), range_id.alias("range_id"))
        .groupBy("range_id")
        .agg(F.count("*").alias("n_keys"), F.min("token").alias("range_start"))
    )


def q_token_resume_scan(spark, sf_dir):
    """O2/O3: resume-from-key — keys at or after a token cutpoint, plus the
    next resume point (min token of the remainder).  The reference's
    Summary/Index seek (SSTable.cpp:122-180) becomes a filter that prunes
    via parquet min/max stats."""
    c = load_table(spark, sf_dir, "customer")
    toks = c.select("c_custkey", TK.md5_token(F.col("c_custkey")).alias("token"))
    remainder = toks.filter(F.col("token") >= "80")
    return remainder.agg(
        F.count("*").alias("n_remaining"),
        F.min("token").alias("resume_token"),
        F.max("token").alias("last_token"),
    )


def q_token_byteorder(spark, sf_dir):
    """P3 ByteOrdered/OrderPreserving partitioner: token = the key itself
    (Partitioners.cpp:212-240) — ring ranges become plain key-prefix
    buckets; per-bucket count and boundary keys."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(F.col("c_name").alias("key"))
        .groupBy(F.substring("key", 1, 10).alias("bucket"))
        .agg(
            F.count("*").alias("n_keys"),
            F.min("key").alias("first_key"),
            F.max("key").alias("last_key"),
        )
    )


def q_token_resume_after_sink(spark, sf_dir):
    """O3 resume-point computation: the next `-S` hint = min token over
    keys NOT yet in the sink (get_first_unsent_record / get_next_key,
    AerospikeWriter.cpp:424-446, CassandraParser.cpp:394-409).  The
    'already written' set (every third order) is left-anti-joined away;
    at scale both sides shuffle on the key — same distribution the
    create-only sink itself uses."""
    o = load_table(spark, sf_dir, "orders")
    toks = o.select("o_orderkey", TK.md5_token(F.col("o_orderkey")).alias("token"))
    written = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    remaining = toks.join(written, "o_orderkey", "left_anti")
    return remaining.agg(
        F.count("*").alias("n_unsent"),
        F.min("token").alias("resume_token"),
        F.min_by("o_orderkey", "token").alias("resume_key"),
    )


def q_o2_layout_resume(spark, sf_dir):
    """O2 at scale: resume scan over a token-range PARTITIONED layout —
    the coarse range predicate prunes directories (partition pruning),
    the token predicate prunes row groups (parquet stats), before any row
    is read (the analog of the reference's Summary/Index seek +
    whole-run drop).  Layout staged once under /tmp per sf_dir."""
    import hashlib
    import os
    import tempfile

    from ..sources.token_layout import read_resume, write_token_layout

    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_layout_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        write_token_layout(load_table(spark, sf_dir, "customer"), "c_custkey", out)
    return (
        read_resume(spark, out, "80", n_ranges=32)
        .select("c_custkey", "token")
        .orderBy("token")
    )


def q_token_murmur3(spark, sf_dir):
    """P1: Cassandra-compatible Murmur3 tokens (pandas UDF — the one
    computation with no Spark builtin).  No SQL oracle (DuckDB has no
    Cassandra murmur3) -> rows-only; bit-level vectors are unit-tested."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        TK.murmur3_token(F.col("c_custkey").cast("string")).alias("token"),
    ).orderBy("token")


ORACLES = {
    "token_md5": """
        SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS token FROM customer
    """,
    "token_ring_ranges": """
        WITH t AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS token FROM customer)
        SELECT CAST(floor(((strpos('0123456789abcdef', substr(token, 1, 1)) - 1) * 16
                           + strpos('0123456789abcdef', substr(token, 2, 1)) - 1) / 8.0)
                    AS INT) AS range_id,
               count(*) AS n_keys, min(token) AS range_start
        FROM t GROUP BY 1
    """,
    "token_resume_scan": """
        WITH t AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS token FROM customer)
        SELECT count(*) AS n_remaining, min(token) AS resume_token,
               max(token) AS last_token
        FROM t WHERE token >= '80'
    """,
    "o2_layout_resume": """
        SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS token
        FROM customer
        WHERE md5(CAST(c_custkey AS VARCHAR)) >= '80'
    """,
    "token_byteorder": """
        SELECT substring(c_name, 1, 10) AS bucket, count(*) AS n_keys,
               min(c_name) AS first_key, max(c_name) AS last_key
        FROM customer GROUP BY 1
    """,
    "token_resume_after_sink": """
        WITH t AS (
          SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS token
          FROM orders WHERE o_orderkey % 3 != 0
        )
        SELECT count(*) AS n_unsent, min(token) AS resume_token,
               arg_min(o_orderkey, token) AS resume_key
        FROM t
    """,
}

QUERIES = {
    "token_md5": q_token_md5,
    "token_ring_ranges": q_token_ring_ranges,
    "token_resume_scan": q_token_resume_scan,
    "token_byteorder": q_token_byteorder,
    "token_resume_after_sink": q_token_resume_after_sink,
    "o2_layout_resume": q_o2_layout_resume,
    "token_murmur3": q_token_murmur3,
}
