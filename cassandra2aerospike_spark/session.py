"""SparkSession factory tuned for this engine.

Local mode is for tests only; every config here is chosen to also make
sense on a large cluster (AQE, adaptive coalesce/skew-join, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "cassandra2aerospike_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Scale posture:
      - AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
      - shuffle.partitions sized to cores locally; on a real cluster this is
        overridden by AQE's coalescing from an initial higher value.
      - Arrow enabled so the pandas-UDF slow path is batch-vectorized.
      - nanosAsLong: the fixture events table stores TIMESTAMP(NANOS), which
        Spark has no native type for; we read the raw int64 and convert to
        microsecond timestamps in the loader (sources/tables.py).
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing (r18, reverting the r17 64k experiment):
        # the r17 session-wide 65536-row batches were the driver-confirmed
        # prime suspect for 5+ mapInPandas regressions (the per-batch
        # score matrix of the persisted-index probes is O(batch x n_q),
        # so 6.5x bigger batches inflate per-task allocations ~6.5x on a
        # page-fault-fragile host) and a same-host A/B this round showed
        # NO offsetting win at 64k on any of the affected rows.  Batch
        # size is a per-operator tradeoff, not a session constant — the
        # session stays at Spark's 10k/64MiB defaults (env-overridable
        # for experiments).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_ROWS", "10000"),
        )
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BYTES", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # per-call Python call-site capture costs ~0.5 ms of py4j traffic
        # on EVERY DataFrame API call — measured ~0.6 s of pure driver
        # overhead building one expression-heavy query; an engine favors
        # build latency over error-message call sites
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
