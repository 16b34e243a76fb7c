"""Sinks (SURVEY.md §2.1 S11-S13): create-only KV writes, bounded-async
pipelined writer, dry-run print sink.

The reference writes each merged record to Aerospike with exists=CREATE
semantics, 100 async ops in flight per event loop, transient-error retry
(AerospikeWriter.cpp:216-380).  Spark-first mapping:

  * create-only   -> left-anti join against the sink's existing keys, then
                     append.  Idempotent under task retries for the same
                     reason the reference is: creates of already-present
                     keys are no-ops, so replayed partitions converge.
  * bounded async -> foreachPartition with a bounded in-flight window over
                     a caller-supplied async `put`; Spark's task retry
                     replaces the reference's resend queue.
  * dry run       -> deterministic textual record dump (DryRun.cpp:22-72's
                     golden-output mechanism).
"""

from __future__ import annotations

import os
from collections import deque
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_only_append(
    records: DataFrame, sink_path: str, key_col: str = "key"
) -> dict[str, int]:
    """S11: create-only append to a parquet-backed KV sink directory.

    Existing keys are never overwritten (policy exists=CREATE,
    Cassandra2Aerospike.cpp:244-247): new records are anti-joined against
    the sink's current keys before appending.  Returns accounting counters
    (S14: written / already_existing) like the reference's end-of-run
    report (Cassandra2Aerospike.cpp:376-401).

    Scale: the anti-join shuffles on the key — the same key distribution
    the merge already produced, so AQE reuses the partitioning; the
    existing-keys side prunes to the key column only.  The record lineage
    (typically the full merge) is materialized ONCE: `observe` counters
    ride the single write pass, so read/written/already_existing all come
    from the same execution instead of three recomputations.

    Intra-batch duplicate keys are collapsed to one row (deterministic
    min-ordering) before the anti-join — the reference's exists=CREATE
    would keep exactly one of them too (first arrival wins; we pick a
    deterministic winner instead of a racy one).
    """
    from pyspark.sql import Observation

    spark = records.sparkSession
    # deterministic intra-batch winner: lowest sort-order row per key
    value_cols = [c for c in records.columns if c != key_col]
    records = (
        records.groupBy(key_col).agg(
            *[F.min_by(c, F.struct(*value_cols)).alias(c) for c in value_cols]
        )
        if value_cols
        else records.dropDuplicates([key_col])
    )
    # both counters ride the ONE write execution: obs_read sits upstream
    # of the anti-join, obs_written downstream — no recomputation of the
    # record lineage (the dominant cost at scale is the merge feeding it)
    obs_read, obs_written = Observation(), Observation()
    records = records.observe(obs_read, F.count(F.lit(1)).alias("n_read"))
    if os.path.isdir(sink_path) and any(
        f.endswith(".parquet") for f in os.listdir(sink_path)
    ):
        existing = spark.read.parquet(sink_path).select(key_col)
        fresh = records.join(existing, key_col, "left_anti")
    else:
        fresh = records
    fresh = fresh.observe(obs_written, F.count(F.lit(1)).alias("n_written"))
    fresh.write.mode("append").parquet(sink_path)
    n_total = obs_read.get["n_read"]
    n_written = obs_written.get["n_written"]
    return {"read": n_total, "written": n_written, "already_existing": n_total - n_written}


def bounded_async_foreach_writer(
    records: DataFrame,
    put: Callable[[dict], "object"],
    wait: Callable[["object"], bool],
    max_in_flight: int = 100,
    max_retries: int = 5,
) -> None:
    """S12: pipelined writes with a bounded in-flight window and a
    transient-failure requeue, per partition.

    `put(row_dict)` starts an async write and returns a handle; `wait(h)`
    blocks until that write completes (returns success).  At most
    `max_in_flight` handles are outstanding per task — the reference's
    backpressure default (-a 100, AerospikeWriter.cpp:25).  A failed wait
    RE-PUTS the same row (the reference's transient-error resend queue,
    AerospikeWriter.cpp:138-180) up to `max_retries` times per row; only
    exhausted retries raise, letting Spark's task retry re-drive the
    partition — idempotent when combined with create-only semantics.
    """

    def write_partition(rows: Iterator) -> None:
        in_flight: deque = deque()  # (handle, row_dict, attempts)

        def drain_one() -> None:
            h, rd, attempts = in_flight.popleft()
            if wait(h):
                return
            if attempts >= max_retries:
                raise RuntimeError("write retries exhausted; task will retry")
            # requeue: one slot was just freed, so the window stays bounded
            in_flight.append((put(rd), rd, attempts + 1))

        for row in rows:
            # `while`, not `if`: a failed wait REQUEUES (length unchanged),
            # so a single drain could leave the window full and the append
            # below would breach the in-flight bound
            while len(in_flight) >= max_in_flight:
                drain_one()
            rd = row.asDict()
            in_flight.append((put(rd), rd, 0))
        while in_flight:
            drain_one()

    records.foreachPartition(write_partition)


def dry_run(records: DataFrame, limit: int = 20) -> list[str]:
    """S13: deterministic textual dump of merged records, mirroring the
    reference's dry-run format — key line, then `name=value` per column
    with `(timeout=...)` for expiring records (DryRun.cpp:27-63).

    Returns the lines (ordered by key) rather than printing, so tests and
    golden files can diff them.
    """
    from ..operators.merge import ETERNAL

    rows = (
        records.orderBy("key")
        .limit(limit)
        .select("key", "columns", "expiry")
        .collect()
    )
    lines: list[str] = []
    for r in rows:
        suffix = "" if r.expiry == ETERNAL else f" (timeout={r.expiry})"
        lines.append(f"key={r.key}{suffix}")
        for name in sorted(r.columns):
            lines.append(f"  {name}={r.columns[name]:.2f}")
    return lines


def run_with_accounting(records: DataFrame, name: str = "sink") -> DataFrame:
    """S14: attach observable metrics to the record stream (the engine's
    version of the reference's read/skipped/expired counters) — collected
    by the driver via QueryExecutionListener or `observe` results."""
    return records.observe(
        name,
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.col("n_cols")).alias("n_cells"),
        F.count(F.when(F.col("expiry") != 4294967295, 1)).alias("n_expiring"),
    )
