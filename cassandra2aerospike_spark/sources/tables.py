"""Fixture table loaders.

Reproduces the reference's source discovery (CassandraParser::open,
/root/reference/CassandraParser.cpp:83-175 — directory scan + per-run schema)
as plain `spark.read.parquet(dir)`: Spark's file listing, footer-schema read
and partition planning are the idiomatic equivalent of the reference's
Data.db/Statistics.db scan, with predicate pushdown and row-group pruning
standing in for its Summary/Index seek (SSTable.cpp:58-87, 122-180).

One quirk handled here: the driver-generated ``events`` table stores
TIMESTAMP(NANOS), which Spark cannot represent.  We read the raw int64
(``spark.sql.legacy.parquet.nanosAsLong``) and derive:

    ts_us  BIGINT       — epoch microseconds, floor(ns / 1000)
    ts     TIMESTAMP_NTZ — microsecond timestamp (matches DuckDB, which
                           truncates parquet nanos to its µs TIMESTAMP)

``ts_ns`` (the raw value) is kept for full-precision ordering.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize the raw events frame to (ts_ns BIGINT, ts_us BIGINT,
    ts TIMESTAMP_NTZ) regardless of how the fixture stored the timestamp.

    Two layouts exist across driver generations:
      - TIMESTAMP(NANOS): unreadable natively; read as raw int64 via
        ``spark.sql.legacy.parquet.nanosAsLong`` and divided down.
        Integer division keeps exactness (double division would lose
        precision above 2^53 — epoch-nanos is ~2^61).
      - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as TIMESTAMP_NTZ;
        derive the epoch integers with ``timestampdiff`` (tz-independent
        on NTZ — no session-zone reinterpretation anywhere).
    """
    ts_type = dict(df.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns div 1000"))
            .withColumn(
                "ts",
                F.expr(
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + ts_us * INTERVAL '1' MICROSECOND"
                ),
            )
        )
    return df.withColumn(
        "ts_us",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    ).withColumn("ts_ns", F.col("ts_us") * F.lit(1000))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the events nanos timestamp.

    Must work on ANY caller-supplied session (the driver passes its own),
    so the nanos handling is set at runtime here.
    """
    # tz-pin every caller session (runtime-settable): date-part extraction
    # on LTZ timestamps (orders/lineitem dates) must agree with DuckDB's
    # tz-naive reading regardless of the driver session's local timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # session-level but runtime-settable; required to read TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    return df


def spread(df: DataFrame, *key_cols: str, n: int | None = None) -> DataFrame:
    """Repartition a compute-heavy frame across cores BEFORE an expensive
    narrow projection (explode / hash / vector pipelines).

    Why this is the scale-correct shape, not a local hack: shuffling the
    compact pre-explode rows is strictly cheaper than letting the
    downstream groupBy shuffle the k×-larger exploded data — and because
    we key the exchange by the downstream aggregation key, Catalyst reuses
    this partitioning and the groupBy needs NO second exchange (verify:
    one Exchange in .explain()).  Locally it also fixes the
    one-small-file → one-task parallelism collapse.  Explicit partition
    count so AQE does not coalesce a CPU-bound stage by its (tiny) size.
    """
    from ..session import default_parallelism

    n = n or default_parallelism()
    return df.repartition(n, *key_cols) if key_cols else df.repartition(n)


def _parse_bytes_conf(v: str, default: int = 134217728) -> int:
    """Spark byte-conf strings: bare digits or digits + k/m/g/t (+'b')
    unit suffix ('128MB', '64m', '134217728b').  Unparseable -> default."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([kmgt]?)b?\s*", v, re.IGNORECASE)
    if not m:
        return default
    scale = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    parsed = int(m.group(1)) * scale[m.group(2).lower()]
    return parsed if parsed > 0 else default  # '0' would divide-by-zero


def spread_scan(
    df: DataFrame, n: int | None = None, min_bytes_per_core: int = 1 << 20
) -> DataFrame:
    """Round-robin an UNDER-partitioned scan before a compute-heavy narrow
    projection (regex tokenization, vector math).

    A `spread()` above the projection parallelizes everything downstream
    of the exchange, but the projection itself still executes in the
    exchange's MAP stage — i.e. with the scan's parallelism, which for a
    single small parquet file is one task.  This helper fixes that by
    exchanging the raw pre-projection rows first — and only when the scan
    actually has fewer splits than cores: at 100 TB input-split counts
    (thousands of tasks) it is a structural no-op, so the extra exchange
    exists exactly where it is free and nowhere else.
    """
    from ..session import default_parallelism

    n = n or default_parallelism()
    # Probe the scan's split count CHEAPLY: inputFiles() costs one
    # analysis pass (~ms); df.rdd.getNumPartitions() would force a full
    # physical plan + RDD conversion (~seconds of driver time per query
    # build).  Many files -> scan is already parallel -> no-op.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= n:
        return df
    # few files: estimate splits from local sizes (FileSourceScan splits
    # at spark.sql.files.maxPartitionBytes).  Non-local paths where sizes
    # are unreadable conservatively no-op: at real scale the file count
    # already exceeded the core count above.
    if files:
        try:
            total = sum(
                os.path.getsize(f.removeprefix("file:").removeprefix("//"))
                for f in files
            )
        except OSError:
            return df
        spark = df.sparkSession
        max_bytes = _parse_bytes_conf(
            str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        )
        if total // max_bytes >= n:
            return df
        # floor: an exchange is its own stage (scheduling + codegen); it
        # only pays for itself when each core gets meaningful compute.
        # Below ~1 MiB/core of input the single-task projection is
        # cheaper than the extra stage.  Callers whose per-ROW cost is
        # decoupled from input bytes (media synthesis + codec decode:
        # a 12-byte doc_id row fans out to a GIF encode + LZW walk)
        # pass min_bytes_per_core=0 to spread regardless (r18 — the
        # byte floor left mm_video_fp_dedup's whole Python pipeline in
        # one serial task, 4.8 s wall at 0.1 s JVM CPU).
        if total < n * min_bytes_per_core:
            return df
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
