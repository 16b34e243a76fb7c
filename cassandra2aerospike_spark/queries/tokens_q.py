"""Token / partitioner / ordering / resume queries (SURVEY.md §2.6, §2.8
P1-P3, O1-O4) over the fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import tokens as TK
from ..sources import load_table


# fixed resume key for o2_real_resume: the bound is this key's Murmur3
# token, computed once here and inlined into BOTH the Spark filter and
# the oracle SQL
_O2_REAL_RESUME_KEY = b"500"
_O2_REAL_BOUND = TK.murmur3_128_h1(_O2_REAL_RESUME_KEY)


def q_token_md5(spark, sf_dir):
    """P2 RandomPartitioner analog: md5 token per key (hex order == ring
    order)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", TK.md5_token(F.col("c_custkey")).alias("token")
    )


def q_token_ring_buckets(spark, sf_dir):
    """O1 + P3 in one tagged result: ring-range assignment under BOTH
    partitioner families.  'md5' = first token byte buckets the ring into
    32 ranges (the unit of the reference's global (token, key) iteration
    order, CassandraParser.cpp:38-46); 'byteorder' = token is the key
    itself (Partitioners.cpp:212-240), so ranges become key-prefix
    buckets.  Identical aggregate shape, tagged union."""
    c = load_table(spark, sf_dir, "customer")
    tok = TK.md5_token(F.col("c_custkey"))
    range_id = F.floor(
        F.conv(F.substring(tok, 1, 2), 16, 10).cast("int") / 8
    ).cast("int")
    md5_branch = (
        c.select(tok.alias("token"), range_id.alias("range_id"))
        .groupBy("range_id")
        .agg(F.count("*").alias("n_keys"), F.min("token").alias("first_key"),
             F.max("token").alias("last_key"))
        .select(
            F.lit("md5").alias("partitioner"),
            F.col("range_id").cast("string").alias("bucket"),
            "n_keys", "first_key", "last_key",
        )
    )
    bo_branch = (
        c.select(F.col("c_name").alias("key"))
        .groupBy(F.substring("key", 1, 10).alias("bucket"))
        .agg(F.count("*").alias("n_keys"), F.min("key").alias("first_key"),
             F.max("key").alias("last_key"))
        .select(F.lit("byteorder").alias("partitioner"), "bucket",
                "n_keys", "first_key", "last_key")
    )
    return md5_branch.unionByName(bo_branch)


def q_token_resume(spark, sf_dir):
    """O2 + O3 in one tagged result.  'scan_cut': keys at or after a token
    cutpoint plus the next resume point — the reference's Summary/Index
    seek (SSTable.cpp:122-180) as a stats-pruned filter.  'after_sink':
    the next `-S` hint = min token over keys NOT yet written
    (get_first_unsent_record / get_next_key, AerospikeWriter.cpp:424-446,
    CassandraParser.cpp:394-409) — the written set anti-joined away on
    the same key distribution the create-only sink uses."""
    c = load_table(spark, sf_dir, "customer")
    toks = c.select("c_custkey", TK.md5_token(F.col("c_custkey")).alias("token"))
    scan = (
        toks.filter(F.col("token") >= "80")
        .agg(
            F.count("*").alias("n_remaining"),
            F.min("token").alias("resume_token"),
            F.max("token").alias("detail"),
        )
        .select(F.lit("scan_cut").alias("op"), "n_remaining", "resume_token", "detail")
    )
    o = load_table(spark, sf_dir, "orders")
    otoks = o.select("o_orderkey", TK.md5_token(F.col("o_orderkey")).alias("token"))
    written = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    after_sink = (
        otoks.join(written, "o_orderkey", "left_anti")
        .agg(
            F.count("*").alias("n_remaining"),
            F.min("token").alias("resume_token"),
            F.min_by("o_orderkey", "token").cast("string").alias("detail"),
        )
        .select(F.lit("after_sink").alias("op"), "n_remaining", "resume_token", "detail")
    )
    return scan.unionByName(after_sink)


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


def q_p4_partitioner_registry(spark, sf_dir):
    """P4: partitioner-registry dispatch (Partitioners.cpp:247-288) as a
    functional check — every registered fully-qualified class name and
    its short alias must resolve to the SAME token function (token values
    compared key-by-key over a sample, mismatches counted), the pre-'hc'
    default (no name) must resolve to RandomPartitioner
    (SSTable.cpp:332-334), and an unknown name must abort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    key = F.col("c_custkey").cast("string")
    pairs = [
        ("org.apache.cassandra.dht.Murmur3Partitioner", "murmur3"),
        ("org.apache.cassandra.dht.RandomPartitioner", "random"),
        ("org.apache.cassandra.dht.ByteOrderedPartitioner", "byteordered"),
        ("org.apache.cassandra.dht.OrderPreservingPartitioner", "byteordered"),
    ]
    frames = []
    for full, short in pairs:
        t_full = TK.partitioner_for(full)(key).cast("string")
        t_short = TK.partitioner_for(short)(key).cast("string")
        frames.append(
            c.select((t_full != t_short).cast("long").alias("mm"))
            .agg(F.count("*").alias("n_keys"), F.sum("mm").alias("n_mismatch"))
            .select(F.lit(full).alias("partitioner"), "n_keys", "n_mismatch")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    # registry edge rows, only present when the dispatch behaves
    edges = []
    if TK.partitioner_for(None) is TK.PARTITIONERS[TK.DEFAULT_PARTITIONER]:
        edges.append(("(default -> random)", 0, 0))
    try:
        TK.partitioner_for("org.apache.cassandra.dht.Bogus")
    except ValueError:
        edges.append(("(unknown -> abort)", 0, 0))
    return out.unionByName(
        spark.createDataFrame(
            edges, "partitioner string, n_keys long, n_mismatch long"
        )
    )


def q_p5_partitioner_abort(spark, sf_dir):
    """P5: the multi-run consistent-partitioner check — a directory whose
    runs declare different partitioners must ABORT the scan (the global
    (token, key) merge order is meaningless across token functions;
    CassandraParser.cpp:144-153), while a consistent directory scans
    fine.  Both outcomes surfaced as rows."""
    import hashlib
    import os
    import tempfile

    from ..sources.sstable.datasource import register
    from ..sources.sstable.format import Cell, Partition, RunWriter

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_p5_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )

    def build(d: str, partitioners: list[str]) -> None:
        from ..sources.sstable.format import MAGIC

        # marker carries the run-format magic: a format bump invalidates
        # fixtures left in /tmp by an earlier build instead of feeding
        # the scan stale bytes
        marker = os.path.join(d, f"_DONE_{MAGIC.decode()}")
        if os.path.exists(marker):
            return
        os.makedirs(d, exist_ok=True)
        for gen, pname in enumerate(partitioners, start=1):
            w = RunWriter(d, gen, partitioner=pname)
            parts = [
                Partition(
                    key=f"k{i}".encode(),
                    cells=[Cell(col_name="c", value=b"1", ts=1_700_000_000_000_000 + i)],
                )
                for i in range(10)
            ]
            for p in sorted(parts, key=lambda p: (p.token, p.key)):
                w.add(p)
            w.finish()
        open(marker, "w").write("ok")

    build(os.path.join(base, "consistent"), ["md5", "md5"])
    build(os.path.join(base, "mixed"), ["md5", "byteordered"])
    register(spark)

    def outcome(label: str, d: str):
        try:
            n = spark.read.format("sstable_run").load(d).count()
            return (label, int(n), 0)
        except Exception as e:  # noqa: BLE001 - abort surfaces via Py4J
            return (label, -1, 1 if "partitioner" in str(e) else 0)

    return spark.createDataFrame(
        [
            outcome("consistent", os.path.join(base, "consistent")),
            outcome("mixed", os.path.join(base, "mixed")),
        ],
        "runs string, n_cells long, aborted long",
    )


def q_token_murmur3(spark, sf_dir):
    """P1: Cassandra-compatible Murmur3 tokens (pandas UDF — the one
    computation with no Spark builtin, Partitioners.cpp:80-191).  The
    oracle reimplements Cassandra Murmur3 in PURE DuckDB SQL over
    HUGEINT limb arithmetic (see _MURMUR3_ORACLE) — customer keys are
    ASCII digits <= 8 bytes, so only the tail path + finalization is
    exercised, which a CTE chain expresses exactly."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        TK.murmur3_token(F.col("c_custkey").cast("string")).alias("token"),
    ).orderBy("token")


# --- Cassandra Murmur3 x64-128 h1 in pure SQL (DuckDB HUGEINT) ----------
# 64-bit wrapping ops emulated on HUGEINT: values live in [0, 2^64);
# a*b mod 2^64 via 32-bit limbs (every intermediate < 2^65 < HUGEINT max);
# rotl/shr via exact powers of two (disjoint bit ranges -> '+' is '|').
# Keys here are ASCII digits (< 0x80), so Java's signed-byte tail quirk
# is value-neutral; keys are <= 8 bytes, so nblocks=0 and k2=0 — the
# whole algorithm reduces to the k1 tail mix + finalization, which is
# what this CTE chain encodes.  Constants from Partitioners.cpp:80-191.
_B64 = "CAST('18446744073709551616' AS HUGEINT)"  # 2^64
_B63 = "CAST('9223372036854775808' AS HUGEINT)"  # 2^63


def _mul64(a: str, b: str) -> str:
    """(a * b) mod 2^64 without overflowing HUGEINT."""
    return (
        f"(((({a}) % 4294967296) * (({b}) % 4294967296)"
        f" + (((({a}) // 4294967296) * (({b}) % 4294967296)"
        f"     + (({a}) % 4294967296) * (({b}) // 4294967296)) % 4294967296)"
        f"   * 4294967296) % {_B64})"
    )


def _rotl64(x: str, r: int) -> str:
    return f"(((({x}) * {1 << r}) % {_B64}) + (({x}) // {1 << (64 - r)}))"


def _xor_shr(x: str, s: int) -> str:
    return f"xor(({x}), ({x}) // {1 << s})"


def _fmix_stages(src: str, pfx: str, prev: str) -> str:
    """Three CTE stages computing fmix64(src) into column {pfx}f."""
    m1 = "CAST('18397679294719823053' AS HUGEINT)"  # 0xff51afd7ed558ccd
    m2 = "CAST('14181476777654086739' AS HUGEINT)"  # 0xc4ceb9fe1a85ec53
    return (
        f"{pfx}1 AS (SELECT *, {_mul64(_xor_shr(src, 33), m1)} AS {pfx}a FROM {prev}),\n"
        f"{pfx}2 AS (SELECT *, {_mul64(_xor_shr(pfx + 'a', 33), m2)} AS {pfx}b FROM {pfx}1),\n"
        f"{pfx}3 AS (SELECT *, {_xor_shr(pfx + 'b', 33)} AS {pfx}f FROM {pfx}2)"
    )


def _murmur3_oracle(source: str = "customer", keycol: str = "c_custkey") -> str:
    c1 = "CAST('9782798678568883157' AS HUGEINT)"  # 0x87c37b91114253d5
    c2 = "CAST('5545529020109919103' AS HUGEINT)"  # 0x4cf5ad432745937f
    return f"""
        WITH base AS (
          SELECT {keycol},
                 CAST(length(CAST({keycol} AS VARCHAR)) AS HUGEINT) AS n,
                 list_reduce(list_transform(
                        range(length(CAST({keycol} AS VARCHAR)), 0, -1),
                        -- HUGEINT per element: the fold overflows INT32
                        -- at >= 5 key bytes otherwise
                        i -> CAST(ascii(substr(CAST({keycol} AS VARCHAR), CAST(i AS INT), 1)) AS HUGEINT)),
                      (a, b) -> a * 256 + b) AS k1
          FROM {source}
        ),
        s1 AS (SELECT *, {_mul64('k1', c1)} AS k1a FROM base),
        s2 AS (SELECT *, {_rotl64('k1a', 31)} AS k1b FROM s1),
        s3 AS (SELECT *, {_mul64('k1b', c2)} AS k1c FROM s2),
        -- tail <= 8 bytes: h1 = (0 ^ k1c) ^ n, h2 = 0 ^ n,
        -- then h1 += h2; h2 += h1 (sequential)
        s4 AS (SELECT *, xor(k1c, n) AS h1x, n AS h2x FROM s3),
        s5 AS (SELECT *, (h1x + h2x) % {_B64} AS h1y FROM s4),
        s6 AS (SELECT *, (h2x + h1y) % {_B64} AS h2y FROM s5),
        {_fmix_stages('h1y', 'fa', 's6')},
        {_fmix_stages('h2y', 'fb', 'fa3')},
        fin AS (SELECT {keycol}, (faf + fbf) % {_B64} AS tu FROM fb3),
        -- the base CTE folds ALL key bytes into k1 (nblocks = 0, k2 = 0),
        -- which is only Murmur3 for keys <= 8 bytes; fail LOUDLY if a
        -- larger SF ever produces a 9-digit key instead of silently
        -- emitting wrong expected tokens
        guard AS (
          SELECT CASE WHEN max(length(CAST({keycol} AS VARCHAR))) > 8
                      THEN error('murmur3 oracle: key > 8 bytes; k2 limb not modeled')
                      ELSE 1 END AS ok
          FROM {source}
        )
        SELECT {keycol},
               CAST(CASE WHEN tu = {_B63} THEN {_B63} - 1
                         WHEN tu >= {_B63} THEN tu - {_B64}
                         ELSE tu END AS BIGINT) AS token
        FROM fin, guard WHERE guard.ok = 1
    """


def q_layout_zorder(spark, sf_dir):
    """O-family extension: Z-ORDER data layout — the multi-column
    clustering move of 100 TB lakehouse tables (Delta/Iceberg OPTIMIZE
    ZORDER): bit-interleave two key dimensions so a range predicate on
    EITHER column prunes to a bounded set of file buckets instead of
    scanning everything.  zval interleaves the low 16 bits of
    (l_orderkey, l_partkey); zbucket = top 8 z bits = one 4096 x 4096
    quadtree cell (x/y spans inside a bucket are bounded by construction
    — pinned by test).  Pure bit arithmetic: map-side, integer-exact,
    identical in SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    x = (F.col("l_orderkey") % 65536).cast("long")
    y = (F.col("l_partkey") % 65536).cast("long")
    z = F.lit(0).cast("long")
    for i in range(16):  # disjoint bit positions, so + == bitwise-or
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return li.select(
        "l_orderkey",
        "l_partkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        z.alias("zval"),
        F.shiftright(z, 24).cast("int").alias("zbucket"),
    )


_ZEXPR = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)

ORACLES = {
    "layout_zorder": f"""
        WITH b AS (
          SELECT l_orderkey, l_partkey, l_linenumber,
                 l_orderkey % 65536 AS x, l_partkey % 65536 AS y
          FROM lineitem
        )
        SELECT l_orderkey, l_partkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               CAST({_ZEXPR} AS BIGINT) AS zval,
               CAST(({_ZEXPR}) >> 24 AS INT) AS zbucket
        FROM b
    """,
    "token_murmur3": _murmur3_oracle(),
    "o2_real_resume": "WITH toks AS MATERIALIZED (" + _murmur3_oracle(
        "(SELECT DISTINCT user_id AS ukey FROM events) u", "ukey"
    ) + f"""
    ), cls AS (
      SELECT user_id AS key,
             CASE WHEN event_id % 97 = 0 THEN 'row'
                  WHEN event_id % 13 = 0 THEN 'range'
                  WHEN event_id % 10 = 0 THEN 'point'
                  ELSE 'cell' END AS kind
      FROM events
    ), cnt AS (
      SELECT key, count(*) AS n_cells FROM cls WHERE kind = 'cell' GROUP BY 1
    )
    SELECT c.key, t.token, c.n_cells
    FROM cnt c JOIN toks t ON t.ukey = c.key
    WHERE t.token >= {_O2_REAL_BOUND}
    """,
    "token_md5": """
        SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS token FROM customer
    """,
    "token_ring_buckets": """
        WITH t AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS token FROM customer)
        SELECT 'md5' AS partitioner,
               CAST(CAST(floor(((strpos('0123456789abcdef', substr(token, 1, 1)) - 1) * 16
                           + strpos('0123456789abcdef', substr(token, 2, 1)) - 1) / 8.0)
                    AS INT) AS VARCHAR) AS bucket,
               count(*) AS n_keys, min(token) AS first_key, max(token) AS last_key
        FROM t GROUP BY 2
        UNION ALL
        SELECT 'byteorder' AS partitioner,
               substring(c_name, 1, 10) AS bucket, count(*) AS n_keys,
               min(c_name) AS first_key, max(c_name) AS last_key
        FROM customer GROUP BY 2
    """,
    "token_resume": """
        WITH t AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS token FROM customer),
        u AS (
          SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS token
          FROM orders WHERE o_orderkey % 3 != 0
        )
        SELECT 'scan_cut' AS op, count(*) AS n_remaining,
               min(token) AS resume_token, max(token) AS detail
        FROM t WHERE token >= '80'
        UNION ALL
        SELECT 'after_sink' AS op, count(*) AS n_remaining,
               min(token) AS resume_token,
               CAST(arg_min(o_orderkey, token) AS VARCHAR) AS detail
        FROM u
    """,
    "o2_layout_resume": """
        SELECT c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS token
        FROM customer
        WHERE md5(CAST(c_custkey AS VARCHAR)) >= '80'
    """,
}

def q_o2_real_resume(spark, sf_dir):
    """O2/O3 on REAL files: resume pushdown over the mixed-era REAL
    Cassandra directory (ka + la + ma).  A fixed resume key's Murmur3
    token becomes the lower bound: the DataSource consumes it via
    pushFilters (whole-slice prune + Summary/Index seek inside each
    sstable), Spark re-applies it exactly, and the oracle recomputes
    BOTH the Murmur3 tokens (pure-SQL x64-128 h1) AND the per-key
    live-cell counts — real-format token order and resume semantics
    pinned end to end."""
    from ..sources.sstable.datasource import register
    from ..sources.sstable.fixtures import (
        build_mixed_era_table_from_events,
        default_runs_dir,
    )

    table_dir = build_mixed_era_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_mixed_era"
    )
    register(spark)
    raw = spark.read.format("sstable_run").option("layout", "ma").load(table_dir)
    cells = raw.filter(
        (F.col("token") >= F.lit(_O2_REAL_BOUND))
        & F.col("col_name").isNotNull()
        & ~F.col("deleted")
        & ~F.col("range_tomb")
    )
    return cells.groupBy(
        F.col("key").cast("string").cast("long").alias("key")
    ).agg(F.min("token").alias("token"), F.count("*").alias("n_cells"))


QUERIES = {
    "token_md5": q_token_md5,
    "token_ring_buckets": q_token_ring_buckets,
    "token_resume": q_token_resume,
    "o2_layout_resume": q_o2_layout_resume,
    "token_murmur3": q_token_murmur3,
    "o2_real_resume": q_o2_real_resume,
    "p4_partitioner_registry": q_p4_partitioner_registry,
    "p5_partitioner_abort": q_p5_partitioner_abort,
    "layout_zorder": q_layout_zorder,
}

ORACLES["p4_partitioner_registry"] = """
    WITH s AS (SELECT count(*) AS n FROM customer WHERE c_custkey <= 200)
    SELECT 'org.apache.cassandra.dht.Murmur3Partitioner' AS partitioner,
           n AS n_keys, CAST(0 AS BIGINT) AS n_mismatch FROM s
    UNION ALL
    SELECT 'org.apache.cassandra.dht.RandomPartitioner', n, 0 FROM s
    UNION ALL
    SELECT 'org.apache.cassandra.dht.ByteOrderedPartitioner', n, 0 FROM s
    UNION ALL
    SELECT 'org.apache.cassandra.dht.OrderPreservingPartitioner', n, 0 FROM s
    UNION ALL
    SELECT '(default -> random)', 0, 0
    UNION ALL
    SELECT '(unknown -> abort)', 0, 0
"""

# 2 runs x 10 single-cell partitions scan clean when partitioners agree;
# the mixed directory aborts before producing any row
ORACLES["p5_partitioner_abort"] = """
    SELECT 'consistent' AS runs, CAST(20 AS BIGINT) AS n_cells,
           CAST(0 AS BIGINT) AS aborted
    UNION ALL
    SELECT 'mixed', -1, 1
"""
