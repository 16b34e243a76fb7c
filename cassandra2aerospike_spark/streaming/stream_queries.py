"""Structured Streaming track (SURVEY.md §2.8).

The reference is batch-only but incremental and resumable (seek-to-key
resume + backpressured async sink).  The engine maps that contract to
Structured Streaming: file source -> watermark -> windowed/stateful ops ->
checkpointed sink; watermark semantics replace the reference's resume-key
contract (O2/O3), checkpoint+idempotent-sink replaces its resend queue.

Each query here drives a real streaming query over the events fixture to
completion (memory sink, processAllAvailable) and returns the result
DataFrame, so the driver can oracle-check streaming semantics against
batch SQL.  Window aggregations run in `complete` mode (the finite fixture
would otherwise withhold unclosed windows in append mode); the dedup query
runs append with a watermark — the streaming-native A1.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import normalize_events


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture as a file-source stream (schema from the batch
    footer; same nanos normalization as the batch loader).

    Adds `ts_event` (TIMESTAMP, i.e. LTZ) for watermarking — Spark event
    time must be TIMESTAMP, not NTZ.  Built from epoch micros so the
    instant is session-timezone-independent; queries emit window bounds
    as epoch-µs BIGINTs to stay tz-proof in oracle comparison.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # abspath: a relative sf_dir would make a relative symlink target
    # (broken when resolved against the /tmp staging dir) and a second
    # cache key for the same fixture
    path = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    # the file source requires a directory; stage a symlink dir holding
    # just the events file (the fixture dir mixes all tables).  The stage
    # path is DETERMINISTIC per sf_dir so checkpointed queries can resume
    # (the checkpoint pins the source path).
    stage = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_src_"
        + hashlib.md5(os.path.dirname(path).encode()).hexdigest()[:12],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    # lexists, not exists: exists() follows the link, so a stale/broken
    # symlink (fixture moved) would return False and the re-symlink would
    # raise FileExistsError, permanently wedging the deterministic stage
    if os.path.lexists(link) and os.readlink(link) != path:
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(stage)
    return normalize_events(raw).withColumn(
        "ts_event", F.timestamp_micros(F.col("ts_us"))
    )


def _rows_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Driver-rows -> DataFrame via the Arrow path for non-trivial row
    counts (see queries.pipeline_q._rows_df; lazy import avoids a
    module cycle)."""
    from ..queries.pipeline_q import _rows_df as _impl

    return _impl(spark, rows, schema)


def _stream_state_partitions(spark: SparkSession, table_dir: str) -> int:
    """Scale-adaptive state-partition count for a stateful stream over a
    real table directory (r17, guide §2 'derive partitioning from input
    size, not a constant').  Stateful operators pin their shuffle count
    from spark.sql.shuffle.partitions at the first microbatch and AQE
    cannot coalesce them, so a cores-sized constant gives a tiny fixture
    32 state-store tasks per microbatch — each paying an Arrow+Python
    worker handoff and a state-store commit for a handful of keys.  Size
    to ~4 MiB of source bytes per state partition, clamped to [8, 4x
    cores]; a real multi-GB table saturates the cap, so production
    behavior is unchanged.  Override with SPARK_GRAFT_STATE_PARTITIONS."""
    from ..session import default_parallelism

    override = os.environ.get("SPARK_GRAFT_STATE_PARTITIONS")
    if override:
        return max(1, int(override))
    total = 0
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return max(8, min(4 * default_parallelism(), total // (4 << 20)))


class _scaled_shuffle_partitions:
    """Context manager: pin spark.sql.shuffle.partitions for the stream
    execution region (stateful operators read it at first-batch planning;
    a checkpointed restart keeps its recorded value regardless)."""

    def __init__(self, spark: SparkSession, n: int):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)
        return False


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Execute the streaming plan to completion into a memory sink and
    return the materialized result."""
    name = "stream_out_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (watermark + F.window)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_event", "10 minutes")
        .groupBy(F.window("ts_event", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        F.unix_micros(F.col("w.end")).alias("window_end_us"),
        "event_type",
        "n",
        "sum_value",
    )


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour every 30 minutes."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_event", "10 minutes")
        .groupBy(F.window("ts_event", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        F.unix_micros(F.col("w.end")).alias("window_end_us"),
        "n",
    )


def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + sliding windowed aggregation as ONE tagged result: two
    real Structured Streaming queries (watermark + F.window) driven to
    completion, unioned.  'tumbling' = 1-hour windows per event type with
    decimal-exact value sums; 'sliding' = 1-hour windows every 30 minutes
    (each event lands in 2 windows).  Merged so the §2.8 window family
    checks in one driver row."""
    tumb = stream_tumbling_counts(spark, sf_dir).select(
        F.lit("tumbling").alias("op"),
        "window_start_us",
        "window_end_us",
        "event_type",
        "n",
        "sum_value",
    )
    slide = stream_sliding_counts(spark, sf_dir).select(
        F.lit("sliding").alias("op"),
        "window_start_us",
        "window_end_us",
        F.lit(None).cast("string").alias("event_type"),
        "n",
        F.lit(None).cast("double").alias("sum_value"),
    )
    return tumb.unionByName(slide)


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap (F.session_window)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_event", "10 minutes")
        .groupBy(F.session_window("ts_event", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_events",
    )


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: each purchase joined to
    the same user's view events in the preceding hour.  Both sides carry
    watermarks and the join has a time-bound condition, so state is
    evictable — the production-shape streaming join.  Counted per
    purchase (deterministic; oracle = the equivalent batch range join)."""
    ev = stream_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts_event").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts_event").alias("v_ts"))
        .withWatermark("v_ts", "10 minutes")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    )
    table = _run_to_memory(joined, "append")
    return (
        table.groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_prior_views"))
    )


def stream_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join — the streaming production shape of
    incremental ingestion dedup (dedup_incremental's contract run
    continuously): documents arrive as file-source microbatches (the
    'new batch' = odd doc_ids), each batch is fingerprinted MAP-SIDE
    and LEFT-joined against the PRECOMPUTED corpus fingerprint table —
    the same parquet checkpoint dedup_incremental stages
    (functions/dedup.stage_parquet), scanned per microbatch and
    broadcast when small.  The corpus side is never re-shuffled per
    batch, and the join is stateless (static right side: no watermark,
    no state store) — at 100 TB the static side is the object-store
    fingerprint table every arriving batch checks against.  In-batch
    dedup is deliberately out of scope here (that is the batch window
    in dedup_incremental); this query pins the stream-static mechanism.
    """
    from ..functions.text import fingerprint
    from ..queries.dedup_q import _ckpt_dir
    from .. import functions as _f  # noqa: F401 (package init)
    from ..functions.dedup import stage_parquet

    # static side: precomputed corpus fingerprints (even doc_ids),
    # shared byte-for-byte with dedup_incremental's checkpoint
    docs = load_docs_batch(spark, sf_dir)
    old = stage_parquet(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("old_rep")),
        _ckpt_dir(sf_dir, "corpus_fp"),
    )

    new = (
        stream_documents(spark, sf_dir)
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
    )
    joined = new.join(old, "fp", "left").select(
        "doc_id",
        "fp",
        F.when(F.col("old_rep").isNotNull(), F.lit("dup_of_corpus"))
        .otherwise(F.lit("keep"))
        .alias("decision"),
        F.col("old_rep").alias("dup_of"),
    )
    return _run_to_memory(joined, "append")


def load_docs_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table

    return load_table(spark, sf_dir, "documents")


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fixture as a file-source stream (same deterministic
    symlink-staging discipline as stream_events)."""
    # abspath before linking/hashing: a relative sf_dir would produce a
    # relative symlink target (resolved against the staging dir -> broken
    # link, empty stream) and a second key for the same fixture
    path = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    stage = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream_docs_"
        + hashlib.md5(os.path.dirname(path).encode()).hexdigest()[:12],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if os.path.lexists(link) and os.readlink(link) != path:
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(stage)


def stream_lww_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 on the MODERN stateful API (transformWithStateInPandas,
    Spark 4): a StatefulProcessor with a ValueState cell per
    (user_id, event_type) holds the running LWW winner — the
    forward-looking twin of stream_stateful_lww's applyInPandasWithState.
    Output mode 'update' emits the current winner per batch; the final
    answer per key is the emission with the greatest timestamp."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("latest_value", DoubleType()),
            StructField("latest_ts_us", LongType()),
        ]
    )

    class LWWProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState(
                "lww", StructType([StructField("v", DoubleType()), StructField("t", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            if self.state.exists():
                v, t = self.state.get()
            else:
                v, t = None, -(1 << 62)
            for pdf in rows:
                for val, ts in zip(pdf["value"], pdf["ts_us"]):
                    ts = int(ts)
                    if ts > t:  # strict >: first-seen wins ties (A1)
                        v, t = float(val), ts
            self.state.update((v, t))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "latest_value": [v],
                    "latest_ts_us": [t],
                }
            )

        def close(self) -> None:
            pass

    ev = stream_events(spark, sf_dir)
    res = (
        ev.select("user_id", "event_type", "value", "ts_us")
        .groupBy("user_id", "event_type")
        .transformWithStateInPandas(
            LWWProcessor(), outputStructType=out_schema, outputMode="Update",
            timeMode="None",
        )
    )
    table = _run_to_memory(res, "update")
    final = F.max_by(F.struct("latest_value", "latest_ts_us"), "latest_ts_us").alias("s")
    return (
        table.groupBy("user_id", "event_type")
        .agg(final)
        .select(
            "user_id",
            "event_type",
            F.col("s.latest_value").alias("latest_value"),
            F.col("s.latest_ts_us").alias("latest_ts_us"),
        )
    )


def stream_sstable_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CONTINUOUS operation: the SSTable-run directory as
    a stream — each run generation is one microbatch via the custom
    streaming DataSource (checkpointed offsets = exactly-once per run,
    the O3 resume contract).  Emits live-cell counts per run; row-
    tombstone markers are excluded (they collapse per partition in the
    run encoding, so only cell rows are count-stable)."""
    from ..sources.sstable import register
    from ..sources.sstable.fixtures import build_runs_from_events, default_runs_dir

    runs_dir = build_runs_from_events(spark, sf_dir, default_runs_dir(sf_dir))
    register(spark)
    stream = spark.readStream.format("sstable_run").load(runs_dir)
    cells = stream.filter(
        F.col("col_name").isNotNull() & ~F.col("deleted") & ~F.col("range_tomb")
    )
    agg = cells.groupBy("run").agg(F.count("*").alias("n_cells"))
    return _run_to_memory(agg, "complete")


def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics, deterministically: the 3-generation
    run stream delivers each run as one microbatch in gen order, and the
    ts%3 run assignment makes every run span the whole time range — so
    batches 2 and 3 are mostly LATE relative to the watermark set by
    earlier batches.  Append-mode windowed aggregation then (a) drops
    arriving rows whose window already closed (window_end <= watermark
    before their batch) and (b) emits only windows the final watermark
    passed.  Both rules are pure functions of per-run maxima, so the
    DuckDB oracle reproduces the exact surviving counts — the strongest
    statement the fixtures can make about watermark correctness
    (SURVEY §2.8: watermark replaces the reference's resume-key
    contract for late/replayed data)."""
    from ..sources.sstable import register
    from ..sources.sstable.fixtures import build_runs_from_events, default_runs_dir

    runs_dir = build_runs_from_events(spark, sf_dir, default_runs_dir(sf_dir))
    register(spark)
    stream = (
        spark.readStream.format("sstable_run")
        # admission control: ONE generation per microbatch, so the
        # watermark advances between runs and late-data drops are
        # deterministic functions of per-run maxima
        .option("max_gens_per_batch", "1")
        .load(runs_dir)
    )
    cells = stream.filter(
        F.col("col_name").isNotNull() & ~F.col("deleted") & ~F.col("range_tomb")
    )
    ev = cells.withColumn("ts_event", F.timestamp_micros(F.col("ts")))
    agg = (
        ev.withWatermark("ts_event", "10 minutes")
        .groupBy(F.window("ts_event", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_on_time"))
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        F.unix_micros(F.col("w.end")).alias("window_end_us"),
        "n_on_time",
    )


def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming A1: stateful dedup under a watermark
    (dropDuplicatesWithinWatermark) — emits each (user_id, event_type)
    once; which physical row wins is arrival-order-dependent, so only the
    key columns are exposed (deterministic; oracle = SELECT DISTINCT)."""
    ev = stream_events(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts_event", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(dedup, "append")


def stream_stateful_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a CUSTOM stateful streaming operator (applyInPandasWithState,
    SURVEY.md §2.8/§2.9): per-(user_id, event_type) GroupState holds the
    running last-write-wins winner — the streaming twin of
    choose_latest_match (CassandraParser.cpp:316-333), with checkpointed
    state standing in for the reference's resume contract (O3).

    Emits the state after every batch (update mode); the final answer is
    the per-key row with the greatest state version, which equals the
    batch a1_lww_latest result regardless of how the source was batched.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream_events(spark, sf_dir)

    def update(key, pdfs, state):
        if state.exists:
            value, ts, version = state.get
        else:
            value, ts, version = None, -(1 << 62), 0
        for pdf in pdfs:
            for v, t in zip(pdf["value"], pdf["ts_us"]):
                t = int(t)
                if t > ts:  # strict >: first-seen wins ties, like the ref
                    value, ts = float(v), t
        version += 1
        state.update((value, ts, version))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "latest_value": [value],
                "latest_ts_us": [ts],
                "version": [version],
            }
        )

    out_schema = (
        "user_id long, event_type string, latest_value double, "
        "latest_ts_us long, version long"
    )
    state_schema = "value double, ts long, version long"
    res = (
        ev.select("user_id", "event_type", "value", "ts_us")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
    table = _run_to_memory(res, "update")
    final = F.max_by(F.struct("latest_value", "latest_ts_us"), "version").alias("s")
    return (
        table.groupBy("user_id", "event_type")
        .agg(final)
        .select("user_id", "event_type", F.col("s.latest_value").alias("latest_value"),
                F.col("s.latest_ts_us").alias("latest_ts_us"))
    )


def stream_real_sstable_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_sstable_ingest over a REAL Cassandra table directory: the
    streaming DataSource's `layout=ma` branch treats each actual
    ma-<gen>-big-* sstable as one microbatch — continuous ingest of a
    live Cassandra data directory (flushes/compactions land as new
    sstables; the reference's continuous operation over its true input
    format).  Emits live-cell counts per sstable generation."""
    from ..sources.sstable import register
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    register(spark)
    stream = (
        spark.readStream.format("sstable_run").option("layout", "ma").load(table_dir)
    )
    cells = stream.filter(
        F.col("col_name").isNotNull() & ~F.col("deleted") & ~F.col("range_tomb")
    )
    agg = cells.groupBy("run").agg(F.count("*").alias("n_cells"))
    return _run_to_memory(agg, "complete")


def stream_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS CDC over a live Cassandra directory (round 10 — the
    streaming face of q_s31_snapshot_diff): each microbatch admits one
    sstable generation (ascending), folds it into the cumulative merged
    state, and emits ONLY the change set vs the previous state — one
    row per record CREATED / UPDATED / DELETED by that generation,
    tagged with its batch id.  Batch 0 emits every initial record as
    'created'; a later generation's tombstones surface as 'deleted',
    its LWW-superseding cells as 'updated'.  This is the incremental
    Cassandra->Aerospike sync the reference cannot express (its every
    run re-merges and re-ships the full table,
    Cassandra2Aerospike.cpp:167-199).

    State lives in PARQUET, not the driver: foreachBatch appends the
    batch's classified cells to a cells dir, re-merges the cumulative
    state distributed, full-outer-joins it against the previous state
    snapshot (also parquet), and appends the churn-sized change rows to
    a changes dir; the driver holds only a path pointer.  At 100 TB the
    per-batch remerge would ride the same incremental-state machinery
    as stream_stateful_lww — here the cumulative remerge keeps the
    semantics byte-auditable against three unrolled cumulative merge
    oracles."""
    from ..operators.merge import (
        assemble_records,
        filter_expired,
        live_cells_from_classified,
        lww_latest,
    )
    from ..sources.sstable import register
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        classify_raw_real,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    register(spark)
    work = tempfile.mkdtemp(prefix="cdc_")
    cells_dir = os.path.join(work, "cells")
    changes_dir = os.path.join(work, "changes")
    state: dict = {"prev": None}

    def render(records: DataFrame) -> DataFrame:
        return records.select(
            "key",
            F.array_join(
                F.sort_array(
                    F.transform(
                        F.map_entries("columns"),
                        lambda e: F.concat(
                            e["key"], F.lit("="), F.format_string("%.2f", e["value"])
                        ),
                    )
                ),
                ",",
            ).alias("cols_str"),
            F.col("expiry").cast("long").alias("expiry"),
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # IDEMPOTENT per-batch writes (round-11 advice fix): foreachBatch
        # is at-least-once — a crash between a sink write and the offset
        # commit replays the batch on restart.  Keying every write by
        # batch_id and OVERWRITING that subdirectory makes the replay a
        # no-op instead of a row duplication; appends would double both
        # the cumulative cell log and the change log.
        classify_raw_real(batch_df).write.mode("overwrite").parquet(
            os.path.join(cells_dir, f"b{batch_id}")
        )
        cum = spark.read.parquet(os.path.join(cells_dir, "b*"))
        new_recs = render(
            filter_expired(
                assemble_records(lww_latest(live_cells_from_classified(cum)))
            )
        )
        new_dir = os.path.join(work, f"state_{batch_id}")
        new_recs.write.mode("overwrite").parquet(new_dir)
        new = spark.read.parquet(new_dir)
        if state["prev"] is None:
            changes = new.select(
                F.lit(batch_id).cast("int").alias("batch_id"),
                "key",
                F.lit("created").alias("status"),
                F.lit(None).cast("string").alias("cols_before"),
                F.col("cols_str").alias("cols_after"),
                F.lit(None).cast("long").alias("expiry_before"),
                F.col("expiry").alias("expiry_after"),
            )
        else:
            prev = spark.read.parquet(state["prev"])
            before = prev.select(
                "key",
                F.col("cols_str").alias("cols_before"),
                F.col("expiry").alias("expiry_before"),
            )
            after = new.select(
                "key",
                F.col("cols_str").alias("cols_after"),
                F.col("expiry").alias("expiry_after"),
            )
            changes = (
                before.join(after, "key", "full_outer")
                .filter(
                    F.col("cols_before").isNull()
                    | F.col("cols_after").isNull()
                    | (F.col("cols_before") != F.col("cols_after"))
                    | (F.col("expiry_before") != F.col("expiry_after"))
                )
                .select(
                    F.lit(batch_id).cast("int").alias("batch_id"),
                    "key",
                    F.when(F.col("cols_before").isNull(), F.lit("created"))
                    .when(F.col("cols_after").isNull(), F.lit("deleted"))
                    .otherwise(F.lit("updated"))
                    .alias("status"),
                    "cols_before",
                    "cols_after",
                    "expiry_before",
                    "expiry_after",
                )
            )
        changes.write.mode("overwrite").parquet(
            os.path.join(changes_dir, f"b{batch_id}")
        )
        state["prev"] = new_dir

    stream = (
        spark.readStream.format("sstable_run")
        .option("layout", "ma")
        .option("max_gens_per_batch", "1")
        .load(table_dir)
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_cdc_")
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(os.path.join(changes_dir, "b*"))


def cdc_fold_rows(cells, points, ranges, row_ts, rows):
    """Fold classified (col, value, ts, expiration, kind) rows into the
    per-key CDC merge state — module-level so the stateful operator and
    the hypothesis property test share ONE implementation (and so the
    worker pickles a plain function, not a self-referential closure).
    `cells` maps col -> (ts, value, exp_or_-1); `points`/`ranges` map
    col / col_end -> max tombstone ts.  Returns the new row_ts."""
    import pandas as pd

    for col, val, ts, exp, kind in rows:
        ts = int(ts)
        if kind == "row":
            row_ts = max(row_ts, ts)
        elif kind == "point":
            if ts > points.get(col, -(1 << 62)):
                points[col] = ts
        elif kind == "range":
            if ts > ranges.get(col, -(1 << 62)):
                ranges[col] = ts
        else:  # cell — strict >: first-seen wins ties (reference)
            prev = cells.get(col)
            if prev is None or ts > prev[0]:
                e = -1 if pd.isna(exp) else int(exp)
                cells[col] = (ts, float(val), e)
    return row_ts


def cdc_live_record(cells, points, ranges, row_ts, eternal, now_floor):
    """The key's record under the current state: (cols_str, expiry),
    both None when dead — a cell survives iff ts > the max covering
    tombstone for its column (row / point / range cover where
    col_end >= col), the record survives iff some cell is live AND the
    folded expiry is eternal or still in the future."""
    live = {}
    for col, (ts, val, exp) in cells.items():
        cover = row_ts
        cover = max(cover, points.get(col, cover))
        for ce, rt in ranges.items():
            if ce >= col and rt > cover:
                cover = rt
        if ts > cover:
            live[col] = (val, exp)
    if not live:
        return None, None
    expiry = (
        eternal
        if any(e == -1 for _, e in live.values())
        else max(e for _, e in live.values())
    )
    if expiry != eternal and expiry < now_floor:
        return None, None  # expired record: dead, like filter_expired
    return ",".join(sorted(f"{c}={v:.2f}" for c, (v, _) in live.items())), expiry


def cdc_prune_state(cells, points, ranges, row_ts):
    """Bound the per-key CDC GroupState (round 11, VERDICT r10 task 6):
    drop everything FUTURE folds can never observe.  Coverage (row_ts,
    per-column point max, range entries at col <= end) only ever GROWS,
    so:

      * a range entry (end1, ts1) DOMINATED by another (end2 >= end1,
        ts2 >= ts1) — or by row_ts — contributes nothing to any
        column's coverage, ever: prune.  What survives is the strict
        STAIRCASE (ends descending, timestamps strictly increasing as
        ends shrink) — state size = the number of live (non-covered)
        range steps, not the number of markers ever folded;
      * a point tombstone at/below its column's residual coverage is
        redundant: prune;
      * a DEAD cell (ts <= coverage) can never win again — a future
        cell only replaces it via a strictly larger ts, and any ts
        above coverage wins with or without the corpse: prune.

    Mutates in place and returns (cells, points, ranges) for chaining.
    cdc_live_record over the pruned state equals the unpruned fold
    exactly (hypothesis-pinned in tests/test_sstable.py)."""
    # ranges: keep the non-dominated staircase above row_ts
    if ranges:
        kept = {}
        running = row_ts
        for ce in sorted(ranges, reverse=True):
            if ranges[ce] > running:
                kept[ce] = ranges[ce]
                running = ranges[ce]
        ranges.clear()
        ranges.update(kept)

    def cover(col):
        c = row_ts
        for ce, rt in ranges.items():
            if ce >= col and rt > c:
                c = rt
        return c

    for col in [c for c, ts in points.items() if ts <= cover(c)]:
        del points[col]
    for col in [
        c
        for c, (ts, _v, _e) in cells.items()
        if ts <= max(cover(c), points.get(c, -(1 << 62)))
    ]:
        del cells[col]
    return cells, points, ranges


def _cdc_incremental_result(spark, table_dir, gc_grace_ms=None):
    """The incremental stateful-CDC PLAN over a real ma table directory
    (one generation admitted per microbatch, per-key GroupState fold
    with pruning, optional gc-grace eviction timers) — shared by
    stream_cdc_incremental (emission-log consumers) and
    stream_cdc_wire_apply (the continuous wire sync)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators import merge as M
    from ..sources.sstable import register
    from ..sources.sstable.fixtures import classify_raw_real

    register(spark)
    stream = (
        spark.readStream.format("sstable_run")
        .option("layout", "ma")
        .option("max_gens_per_batch", "1")
        .load(table_dir)
    )
    classified = classify_raw_real(stream)
    eternal, now_floor = M.ETERNAL, M.NOW_EPOCH_S + M.MIN_TTL_S

    def update(key, pdfs, state):
        if state.hasTimedOut:
            # gc-grace fired for a fully-dead key: evict its state and
            # emit nothing (the deletion was already emitted when the
            # record died)
            state.remove()
            return
        if state.exists:
            (ccols, cts, cval, cexp, row_ts, pcols, pts, rends, rts, version) = (
                state.get
            )
            cells = {
                c: (t, v, e)
                for c, t, v, e in zip(ccols, cts, cval, cexp)
            }
            points = dict(zip(pcols, pts))
            ranges = dict(zip(rends, rts))
        else:
            cells, points, ranges = {}, {}, {}
            row_ts, version = -(1 << 62), 0
        for pdf in pdfs:
            row_ts = cdc_fold_rows(
                cells, points, ranges, row_ts,
                zip(pdf["col_name"], pdf["value"], pdf["ts"],
                    pdf["expiration"], pdf["kind"]),
            )
        cdc_prune_state(cells, points, ranges, row_ts)
        version += 1
        state.update((
            sorted(cells),
            [cells[c][0] for c in sorted(cells)],
            [cells[c][1] for c in sorted(cells)],
            [cells[c][2] for c in sorted(cells)],
            row_ts,
            sorted(points),
            [points[c] for c in sorted(points)],
            sorted(ranges),
            [ranges[c] for c in sorted(ranges)],
            version,
        ))
        cols_str, expiry = cdc_live_record(
            cells, points, ranges, row_ts, eternal, now_floor
        )
        if cols_str is None and gc_grace_ms is not None:
            # fully dead: arm the gc-grace eviction clock; any earlier
            # pending timeout is replaced (a key that dies again after
            # resurrection re-arms)
            state.setTimeoutDuration(gc_grace_ms)
        yield pd.DataFrame(
            {
                "key": [int(key[0])],
                "version": [version],
                "cols_str": [cols_str],
                "expiry": pd.array([expiry], dtype="Int64"),
            }
        )

    out_schema = "key long, version int, cols_str string, expiry long"
    state_schema = (
        "ccols array<string>, cts array<long>, cval array<double>, "
        "cexp array<long>, row_ts long, pcols array<string>, "
        "pts array<long>, rends array<string>, rts array<long>, version int"
    )
    res = (
        classified.select("key", "col_name", "value", "ts", "expiration", "kind")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.ProcessingTimeTimeout
            if gc_grace_ms is not None
            else GroupStateTimeout.NoTimeout,
        )
    )
    return res


def stream_cdc_incremental(
    spark: SparkSession,
    sf_dir: str,
    table_dir: str | None = None,
    ckpt: str | None = None,
    gc_grace_ms: int | None = None,
) -> DataFrame:
    """INCREMENTAL stateful CDC (round 10 — the production path
    stream_snapshot_cdc's docstring promises): per-KEY GroupState holds
    the full merge state — per-column LWW winner (ts, value,
    expiration), the row-tombstone max, per-column point-tombstone
    maxes and the range staircase — and each microbatch folds ONLY its
    own rows into that state (applyInPandasWithState), then emits the
    key's post-batch record: (key, version, cols_str, expiry), with
    NULL cols_str when the record is dead (tombstoned out or expired).
    No cumulative remerge, no re-scan of earlier generations: per batch
    the work is proportional to the BATCH, the state store carries the
    past — exactly how a 100 TB continuous sync would run, with
    checkpointed state standing in for the reference's resume contract.

    version = how many batches have touched the key (update is invoked
    only for keys present in the batch), so the emission log IS the
    CDC stream: first emission with columns = created, a later one
    with different columns = updated, NULL columns = deleted.  The
    oracle rebuilds the same log from the parquet events: per key, the
    generations that contain it (ordered -> version) joined to the
    cumulative-merge state after each such generation.

    `table_dir`/`ckpt` override the fixture table and checkpoint
    location — the resume test drives a partially-populated directory
    through one run, lands more generations, and RESTARTS from the same
    checkpoint: the recovered GroupState must continue the fold exactly
    (the streaming answer to the reference's seek-to-key resume).

    STATE IS BOUNDED (round 11): every fold prunes dominated range
    steps, covered point tombstones and dead cells (cdc_prune_state —
    coverage only grows, so none can matter again).  With `gc_grace_ms`
    set, a key whose record is fully DEAD additionally arms a
    processing-time timeout: when it fires the key's GroupState is
    EVICTED (Cassandra's gc_grace_seconds contract — an older-than-
    tombstone write arriving after eviction resurrects, exactly like a
    compacted-away tombstone; the eviction test pins that
    resurrection).  Timer-armed runs use the availableNow trigger
    (engine timers keep processAllAvailable from settling); the default
    no-eviction mode keeps NoTimeout + processAllAvailable, preserving
    the one-generation-per-batch version numbering the resume contract
    pins."""
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    if table_dir is None:
        table_dir = build_ma_table_from_events(
            spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
        )
    res = _cdc_incremental_result(spark, table_dir, gc_grace_ms)
    n_state = _stream_state_partitions(spark, table_dir)
    if ckpt is None:
        if gc_grace_ms is None:
            with _scaled_shuffle_partitions(spark, n_state):
                return _run_to_memory(res, "update")
        # timers armed: availableNow, NOT processAllAvailable — with
        # processing-time timers the engine keeps scheduling timer-check
        # batches and processAllAvailable never settles; availableNow
        # drains the source, fires any EXPIRED timers, and terminates
        name = "stream_out_" + uuid.uuid4().hex[:12]
        with _scaled_shuffle_partitions(spark, n_state):
            q = (
                res.writeStream.outputMode("update")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table(name)
    # explicit checkpoint: the resume path — a restart against the same
    # ckpt recovers the GroupState store and continues the fold from the
    # last committed generation offset.  The memory sink cannot recover
    # from a checkpoint (not fault-tolerant), so this path lands each
    # batch's emissions in a parquet dir via foreachBatch — the same
    # recoverable-sink shape a production run would use; the returned
    # frame is the ACCUMULATED emission log across all runs of this ckpt.
    # Each batch OVERWRITES its own batch_id-keyed subdirectory (round-11
    # advice fix): foreachBatch is at-least-once, so a crash between the
    # write and the offset commit replays the batch — keyed overwrite
    # makes the replay idempotent where an append would duplicate rows.
    out_dir = ckpt + "_emissions"

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )

    w = res.writeStream.outputMode("update").foreachBatch(land).option(
        "checkpointLocation", ckpt
    )
    with _scaled_shuffle_partitions(spark, n_state):
        if gc_grace_ms is not None:
            q = w.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = w.start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
    return spark.read.parquet(os.path.join(out_dir, "b*"))


def stream_cdc_wire_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS CDC -> AEROSPIKE sync over the wire, WITH DELETES
    (round 11): the incremental stateful-CDC plan's per-batch emissions
    apply to an in-process protocol server as they happen — a live
    emission is a REPLACE put (create_only off: updates must land, the
    one place the reference's AS_POLICY_EXISTS_CREATE posture cannot
    go), a dead emission (NULL columns) is a real wire DELETE (info2
    WRITE|DELETE, idempotent on absent keys).  After the last
    generation drains, the server's store must equal the FULL batch
    merge's live records exactly — interim states were overwritten,
    deleted records removed — which is the continuous-sync contract:
    at every quiesce point the sink is byte-equal to a from-scratch
    migration.  The store maps back to keys through the distributed
    digest join (no driver-side key collection); the oracle is the
    merge-records derivation with the engine's expiry -> write-ttl
    rule."""
    from ..operators import merge as M
    from ..queries.pipeline_q import _digest_hex_records
    from ..sinks.aerospike_wire import WireClient, WireServer, cols_str_to_bins
    from ..sources import load_table
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    res = _cdc_incremental_result(spark, table_dir)
    srv = WireServer()
    host, port = srv.host, srv.port
    ns, set_name = "tmx", "cdc"
    eternal, now_s = M.ETERNAL, M.NOW_EPOCH_S

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        def part(rows):
            client = None
            handles = []
            for r in rows:
                if client is None:
                    client = WireClient(host, port, ns, set_name)
                key = str(r["key"]).encode()
                if r["cols_str"] is None:
                    handles.append(client.delete(key))
                else:
                    bins = cols_str_to_bins(r["cols_str"])
                    ttl = (
                        0xFFFFFFFF
                        if r["expiry"] == eternal
                        else int(r["expiry"]) - now_s
                    )
                    handles.append(
                        client.put(key, bins, ttl, create_only=False)
                    )
            if client is not None:
                for h in handles:
                    client.wait(h)  # 'ok' / idempotent 'not_found'
                client.close()

        batch_df.foreachPartition(part)

    ckpt = tempfile.mkdtemp(prefix="ckpt_cdcwire_")
    with _scaled_shuffle_partitions(
        spark, _stream_state_partitions(spark, table_dir)
    ):
        q = (
            res.writeStream.outputMode("update")
            .foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    store = srv.records()
    srv.close()
    store_rows = []
    for (s_ns, s_set, digest), (bins, ttl) in store.items():
        if s_ns != ns or s_set != set_name:
            raise RuntimeError("cdc wire apply: foreign record stored")
        entries = sorted(f"{n}={v.decode()}" for n, v in bins.items())
        store_rows.append((digest.hex(), ",".join(entries), int(ttl)))
    store_df = _rows_df(
        spark, store_rows, "digest_hex string, cols_str string, ttl long"
    )
    keyed = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .select(
            "key",
            _digest_hex_records(F.lit(set_name), F.col("key")).alias(
                "digest_hex"
            ),
        )
    )
    return keyed.join(F.broadcast(store_df), "digest_hex", "inner").select(
        "key", "cols_str", "ttl"
    )


def stream_cms_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING COUNT-MIN SKETCH (round 13, late): per tumbling 1-hour
    window, the event stream folds user_id frequencies into a d=2 x
    w=64 integer counter matrix — the windowed hot-key detector a
    streaming pipeline runs when per-key state would not fit (128
    counters summarize any number of keys per window).  The sketch IS
    the streaming aggregation state: one watermarked groupBy on
    (window, hash-row, bucket), nothing per-key.  Integer md5 bucketing
    makes the sketch bit-identical to a batch rebuild, so the row
    carries an exact oracle — the same cross-engine-determinism
    discipline as the batch CMS row (agg_countmin_heavy_hitters)."""

    ev = stream_events(spark, sf_dir)

    def bucket(row: int):
        h = F.md5(F.concat(F.lit(f"scms{row}|"), F.col("user_id").cast("string")))
        return (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 64
        ).cast("int")

    tagged = ev.select(
        "ts_event", F.lit(0).alias("d"), bucket(0).alias("bucket")
    ).unionAll(
        ev.select("ts_event", F.lit(1).alias("d"), bucket(1).alias("bucket"))
    )
    agg = (
        tagged.withWatermark("ts_event", "10 minutes")
        .groupBy(F.window("ts_event", "1 hour").alias("w"), "d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        "d",
        "bucket",
        "cnt",
    )


def stream_wire_batch_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC ENRICHMENT AGAINST THE LIVE CLUSTER (round 13):
    every event flowing through a Structured Streaming plan is tagged
    with the CURRENT cluster state of its key — liveness, live-column
    count, stored write-ttl — via wire BATCH-INDEX reads.  This is the
    external-KV lookup-join every production stream runs: the dimension
    lives in a cluster Spark cannot broadcast or snapshot, so each task
    resolves the DISTINCT keys of its Arrow batch through
    ClusterRouter.batch_read — one request per (task, node), the real
    client's batch-node split — instead of a per-row get.  The
    enrichment is a stateless mapInPandas ON THE STREAM (the plan stays
    a genuine streaming query; no foreachBatch detour), so at scale the
    lookup cost per microbatch is bounded by tasks x nodes round trips.
    Exact oracle: events LEFT JOIN the live merge state (found /
    n_cols / the expiry -> write-ttl rule; absent keys 0 / 0 / -1)."""
    import pandas as pd

    from ..operators import merge as M
    from ..queries.pipeline_q import _sink_parallelism
    from ..sinks.aerospike_wire import (
        ClusterRouter,
        N_PARTITIONS,
        WireServer,
        key_digest,
    )
    from ..sinks.kv_sink import bounded_async_foreach_writer
    from ..sources import load_table

    n_nodes = 3
    ns, set_name = "tmx", "enrich"
    eternal, now_s = M.ETERNAL, M.NOW_EPOCH_S
    records = M.merge_records(load_table(spark, sf_dir, "events")).cache()
    n_records = records.count()
    servers = [
        WireServer(
            owned_partitions={
                p for p in range(N_PARTITIONS) if p % n_nodes == i
            },
            info_namespace=ns,
        )
        for i in range(n_nodes)
    ]
    nodes = [(srv.host, srv.port) for srv in servers]
    state: dict = {}

    def put(rd):
        r = state.get("router")
        if r is None:
            r = state["router"] = ClusterRouter(nodes, ns, set_name)
        key = str(rd["key"]).encode()
        bins = {k: ("%.2f" % v).encode() for k, v in rd["columns"].items()}
        ttl = (
            0xFFFFFFFF if rd["expiry"] == eternal else int(rd["expiry"]) - now_s
        )
        c = r.client_for(key)
        return c.put(key, bins, ttl), c

    def wait(h):
        handle, c = h
        if c.wait(handle) != "ok":
            raise RuntimeError("enrich sink: unexpected non-ok put")
        return True

    bounded_async_foreach_writer(
        records.coalesce(_sink_parallelism(n_records)), put, wait,
        max_in_flight=32,
    )

    def enrich(batches):
        router = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if router is None:
                router = ClusterRouter(nodes, ns, set_name)
            uniq = sorted({int(k) for k in pdf["key"]})
            digs = {k: key_digest(set_name, str(k).encode()) for k in uniq}
            got = router.batch_read(list(digs.values()))
            found, ncols, ttls = [], [], []
            for k in pdf["key"]:
                rec = got[digs[int(k)]]
                if rec is None:
                    found.append(0)
                    ncols.append(0)
                    ttls.append(-1)
                else:
                    ttl, bins = rec
                    found.append(1)
                    ncols.append(len(bins))
                    ttls.append(int(ttl))
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "key": pdf["key"],
                    "found": found,
                    "n_cols": ncols,
                    "ttl": ttls,
                }
            )

    ev = stream_events(spark, sf_dir).select(
        "event_id", F.col("user_id").alias("key")
    )
    enriched = ev.mapInPandas(
        enrich, "event_id long, key long, found int, n_cols int, ttl long"
    )
    out = _run_to_memory(enriched, "append")
    n_out = out.count()  # materialize while the cluster lives
    # batching invariants: the lookup never degrades to per-row gets
    if sum(srv._gets for srv in servers) != 0:
        raise RuntimeError("stream enrich degraded to single gets")
    n_batches = sum(srv._batches for srv in servers)
    if not 0 < n_batches < n_out:
        raise RuntimeError(
            f"stream enrich: {n_batches} batch requests for {n_out} events"
        )
    for srv in servers:
        srv.close()
    records.unpersist()
    return out


def _emit_asb_segments(spark: SparkSession, sf_dir: str, set_name: str):
    """Shared emission half of the streaming incremental-backup rows:
    the incremental CDC stream's per-microbatch live emissions land as
    an ORDERED SERIES of keyless digest-addressed .asb segments (one
    segment directory per batch_id, overwritten on checkpoint replay —
    asbackup's modified-after mode).  Returns (segment paths in chain
    order, ns, now_s)."""
    from ..operators import merge as M
    from ..queries.pipeline_q import _digest_hex_records
    from ..sinks.asb_backup import write_asb_scan
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    res = _cdc_incremental_result(spark, table_dir)
    ns = "tmx"
    eternal, now_s = M.ETERNAL, M.NOW_EPOCH_S
    seg_root = tempfile.mkdtemp(prefix="asb_incr_")

    def write_segment(batch_df: DataFrame, batch_id: int) -> None:
        live = batch_df.filter(F.col("cols_str").isNotNull()).select(
            _digest_hex_records(F.lit(set_name), F.col("key")).alias(
                "digest_hex"
            ),
            "cols_str",
            F.when(F.col("expiry") == eternal, F.lit(0xFFFFFFFF))
            .otherwise(F.col("expiry") - now_s)
            .cast("long")
            .alias("ttl"),
        )
        # batch_id-keyed subdir, overwritten: a checkpoint replay of the
        # same batch rewrites its segment instead of duplicating records
        write_asb_scan(
            live,
            os.path.join(seg_root, f"segment={batch_id:05d}"),
            ns,
            set_name,
            now_s,
            n_files=2,
        )

    ckpt = tempfile.mkdtemp(prefix="ckpt_asbincr_")
    with _scaled_shuffle_partitions(
        spark, _stream_state_partitions(spark, table_dir)
    ):
        q = (
            res.writeStream.outputMode("update")
            .foreachBatch(write_segment)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    segs = sorted(
        os.path.join(seg_root, d)
        for d in os.listdir(seg_root)
        if d.startswith("segment=")
    )
    if not segs:
        raise RuntimeError("incremental backup produced no segments")
    return segs, ns, now_s


def _replay_asb_chain(
    spark: SparkSession,
    seg_paths: list[str],
    ns: str,
    set_name: str,
    now_s: int,
) -> DataFrame:
    """Restore replay: union the segments' file-parallel reads in chain
    order and keep the LATEST segment's record per digest (asrestore
    --replace over an ordered chain).  One window shuffle; segment
    count is the backup cadence, not the data size."""
    from ..sinks.asb_backup import read_asb_scan

    frames = [
        read_asb_scan(spark, p, ns, set_name, now_s).select(
            "digest_hex", "cols_str", "ttl", F.lit(i).alias("seg")
        )
        for i, p in enumerate(seg_paths)
    ]
    allr = frames[0]
    for fr in frames[1:]:
        allr = allr.unionByName(fr)
    # latest-segment-wins as a hash aggregation, not a window (r17,
    # guide §2.3 "aggregate before you shuffle"): max_by on the segment
    # ordinal does partial map-side aggregation and needs no per-group
    # sort; a digest appears at most once per segment, so the argmax is
    # deterministic and row-identical to the old row_number()==1 pick.
    return (
        allr.groupBy("digest_hex")
        .agg(
            F.max_by(F.struct("cols_str", "ttl"), "seg").alias("latest")
        )
        .select(
            "digest_hex",
            F.col("latest.cols_str").alias("cols_str"),
            F.col("latest.ttl").alias("ttl"),
        )
    )


def _asb_keys_join(
    spark: SparkSession, sf_dir: str, final: DataFrame, set_name: str
) -> DataFrame:
    """Map restored digests back to user keys distributedly (the .asb
    chain is keyless, like the real format)."""
    from ..queries.pipeline_q import _digest_hex_records
    from ..sources import load_table

    keyed = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .select(
            "key",
            _digest_hex_records(F.lit(set_name), F.col("key")).alias(
                "digest_hex"
            ),
        )
    )
    return keyed.join(final, "digest_hex", "inner").select(
        "key", "cols_str", "ttl"
    )


def stream_asb_incremental_backup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING INCREMENTAL BACKUP (round 13): the CDC stream's
    per-microbatch live emissions land as an ORDERED SERIES of keyless
    digest-addressed .asb segments (one segment directory per batch_id,
    overwritten on checkpoint replay — the incremental-backup job the
    ecosystem runs with asbackup's modified-after mode), and a restore
    REPLAYS the segments in order with latest-segment-wins semantics
    (asrestore --replace).  Deletes are NOT captured — the .asb format
    carries records, not tombstones, exactly like the real tool — so a
    key whose final CDC state is dead survives the restore at its LAST
    LIVE version: the documented semantic gap of backup-without-deletes,
    encoded in the oracle (per key: the live cumulative-merge state at
    the LARGEST generation that touched the key and left it live; keys
    never live in any emitted batch are absent).

    Scale shape: each segment write is the distributed .asb sink (no
    driver rows); the replay is one union of per-segment file-parallel
    reads with a per-digest latest-wins window — segment count is the
    backup cadence, not the data size — and digests map back to keys
    through the distributed digest join.  (Emission/replay/key-join are
    the shared helpers above, reused by the rebase row.)"""
    set_name = "cdc"
    segs, ns, now_s = _emit_asb_segments(spark, sf_dir, set_name)
    final = _replay_asb_chain(spark, segs, ns, set_name, now_s)
    return _asb_keys_join(spark, sf_dir, final, set_name)


def stream_asb_backup_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL-BACKUP CHAIN COMPACTION (round 14, VERDICT r13 task
    3): an incremental chain grows with backup cadence FOREVER — at 100
    TB a months-long chain makes every restore pay the whole history.
    The real asbackup rotation folds incrementals into a periodic full
    base (base + short tail); this is that REBASE as a distributed job:
    all segments but the newest fold latest-wins into ONE base .asb
    (the same window shuffle the restore itself uses — fold cost is
    proportional to the folded history, paid once per rotation), and a
    restore then replays base + tail only.  The job never rewrites the
    tail, so backups taken DURING a rebase keep appending safely.
    In-query asserts: (a) the chain was genuinely compacted — read
    units shrink from len(chain) to 1 + tail (3 -> 2 here); (b) the
    rebased restore is RECORD-IDENTICAL to the full-chain replay
    (exceptAll both directions).  Exact oracle: same contract as
    stream_asb_incremental_backup — compaction must be invisible."""
    set_name = "cdcrb"
    segs, ns, now_s = _emit_asb_segments(spark, sf_dir, set_name)
    if len(segs) < 2:
        raise RuntimeError(
            f"rebase needs >= 2 segments, chain has {len(segs)}"
        )
    from ..sinks.asb_backup import write_asb_scan

    # ---- the rebase job: fold every segment but the newest ----
    fold, tail = segs[:-1], segs[-1:]
    base_df = _replay_asb_chain(spark, fold, ns, set_name, now_s)
    base_dir = os.path.join(
        os.path.dirname(segs[0]), f"base={len(fold) - 1:05d}"
    )
    write_asb_scan(base_df, base_dir, ns, set_name, now_s, n_files=2)

    # ---- restores: base + tail vs the full chain ----
    rebased_units = [base_dir, *tail]
    if not len(rebased_units) < len(segs):
        raise RuntimeError(
            f"rebase did not shorten the chain: {len(rebased_units)} "
            f">= {len(segs)}"
        )
    rebased = _replay_asb_chain(
        spark, rebased_units, ns, set_name, now_s
    ).cache()
    full = _replay_asb_chain(spark, segs, ns, set_name, now_s)
    # symmetric multiset difference in ONE pass (r17, guide §1.2): the
    # two exceptAll counts executed the full-chain replay twice and took
    # two jobs; |A\B| + |B\A| == sum over distinct rows of
    # |cnt_A - cnt_B|, which one union + one aggregation computes with
    # a single execution of each replay.
    diff_row = (
        rebased.withColumn("side", F.lit(1))
        .unionByName(full.withColumn("side", F.lit(-1)))
        .groupBy("digest_hex", "cols_str", "ttl")
        .agg(F.sum("side").alias("d"))
        .agg(F.sum(F.abs(F.col("d"))).alias("diff"))
        .collect()[0]
    )
    diff = int(diff_row["diff"] or 0)
    if diff:
        raise RuntimeError(
            f"rebase changed the restore: {diff} differing records"
        )
    return _asb_keys_join(spark, sf_dir, rebased, set_name)


def stream_cdc_cluster_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS CDC -> SECURED CLUSTER sync surviving a LIVE HANDOFF
    (round 12): stream_cdc_wire_apply's contract — REPLACE puts + real
    wire DELETEs, store == from-scratch migration at quiesce — but the
    sink is the s36-shape cluster (three LOGIN-authenticated nodes,
    each owning a third of the partition map) and node 0 MIGRATES its
    whole slice (ownership + data) to node 1 after its 3rd applied put,
    MID-STREAM.  Batch tasks route through per-task ClusterRouters
    seeded with the PRE-handoff map (the process-level tend shape), so
    post-handoff emissions to moved partitions draw UNAVAILABLE, re-
    tend, and re-issue — puts AND deletes.  Final-state determinism
    under any cutover timing is the point: microbatches are sequential,
    within-batch emissions are one-per-key, and the handoff migrates
    data, so the per-key last-write order is preserved wherever the
    partition lives.  The quiesce check then proves zero lost or
    misplaced operations across the cutover.  Same exact oracle as the
    single-node row (the cluster is invisible at quiesce — that IS the
    contract)."""
    from ..operators import merge as M
    from ..queries.pipeline_q import _digest_hex_records
    from ..sinks.aerospike_wire import (
        ClusterRouter,
        N_PARTITIONS,
        WireServer,
        cols_str_to_bins,
    )
    from ..sinks.bcrypt_py import hashpw
    from ..sources import load_table
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    res = _cdc_incremental_result(spark, table_dir)
    n_nodes = 3
    ns, set_name = "tmx", "cdc"
    user, password = "tmx_cdc", "s3cr3t"
    salt6 = "$2a$06$7EqJtq98hPqEX7fNZaFWoO"
    credential = hashpw(password, salt6)
    slice0 = {p for p in range(N_PARTITIONS) if p % n_nodes == 0}
    servers: list = []
    moved = {"n": -1}

    def on_node0_put(n_puts: int) -> None:
        if n_puts == 3:
            moved["n"] = servers[0].handoff(servers[1], slice0)

    servers.append(
        WireServer(
            credentials=(user, password),
            owned_partitions=slice0,
            credential_salt=salt6,
            info_namespace=ns,
            on_put=on_node0_put,
        )
    )
    servers.extend(
        WireServer(
            credentials=(user, password),
            owned_partitions={
                p for p in range(N_PARTITIONS) if p % n_nodes == i
            },
            credential_salt=salt6,
            info_namespace=ns,
        )
        for i in (1, 2)
    )
    nodes = [(srv.host, srv.port) for srv in servers]
    seed = ClusterRouter(nodes, ns, set_name, user=user, credential=credential)
    pmap0 = list(seed.pmap)
    seed.close()
    eternal, now_s = M.ETERNAL, M.NOW_EPOCH_S
    sc = spark.sparkContext
    acc_unavail = sc.accumulator(0)

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        def part(rows):
            router = None
            pend = []
            for r in rows:
                if router is None:
                    router = ClusterRouter(
                        nodes, ns, set_name,
                        user=user, credential=credential,
                        initial_pmap=pmap0,
                    )
                key = str(r["key"]).encode()
                idx = router.master_idx_for(key)
                c = router.client(idx)
                if r["cols_str"] is None:
                    pend.append((c.delete(key), c, r, idx))
                else:
                    bins = cols_str_to_bins(r["cols_str"])
                    ttl = (
                        0xFFFFFFFF
                        if r["expiry"] == eternal
                        else int(r["expiry"]) - now_s
                    )
                    pend.append(
                        (c.put(key, bins, ttl, create_only=False), c, r, idx)
                    )
            for h, c, r, idx in pend:
                d = c.wait(h)
                while d == "unavailable":
                    # the cluster moved under the stream: re-tend (only
                    # if the map still routes this key at the refusing
                    # node — ADVICE r12: one sweep per map change, not
                    # per stale op) and re-issue through the fresh map
                    # (retend's livelock cap bounds the loop)
                    acc_unavail.add(1)
                    key = str(r["key"]).encode()
                    router.retend_if_stale(key, idx)
                    idx = router.master_idx_for(key)
                    c2 = router.client(idx)
                    if r["cols_str"] is None:
                        d = c2.wait(c2.delete(key))
                    else:
                        bins = cols_str_to_bins(r["cols_str"])
                        ttl = (
                            0xFFFFFFFF
                            if r["expiry"] == eternal
                            else int(r["expiry"]) - now_s
                        )
                        d = c2.wait(c2.put(key, bins, ttl, create_only=False))
            if router is not None:
                router.close()

        batch_df.foreachPartition(part)

    ckpt = tempfile.mkdtemp(prefix="ckpt_cdccluster_")
    with _scaled_shuffle_partitions(
        spark, _stream_state_partitions(spark, table_dir)
    ):
        q = (
            res.writeStream.outputMode("update")
            .foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    if moved["n"] < 0:
        raise RuntimeError("cdc cluster apply: handoff never fired")
    if acc_unavail.value < 1:
        raise RuntimeError("cdc cluster apply: no op ever saw the stale map")
    if servers[0].records():
        raise RuntimeError("cdc cluster apply: node 0 still holds records")
    store: dict = {}
    for srv in servers:
        store.update(srv.records())
        srv.close()
    store_rows = []
    for (s_ns, s_set, digest), (bins, ttl) in store.items():
        if s_ns != ns or s_set != set_name:
            raise RuntimeError("cdc cluster apply: foreign record stored")
        entries = sorted(f"{n}={v.decode()}" for n, v in bins.items())
        store_rows.append((digest.hex(), ",".join(entries), int(ttl)))
    store_df = _rows_df(
        spark, store_rows, "digest_hex string, cols_str string, ttl long"
    )
    keyed = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .select(
            "key",
            _digest_hex_records(F.lit(set_name), F.col("key")).alias(
                "digest_hex"
            ),
        )
    )
    return keyed.join(F.broadcast(store_df), "digest_hex", "inner").select(
        "key", "cols_str", "ttl"
    )


def stream_cdc_batch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS CDC -> CLUSTER sync through BATCH WRITES (round 15):
    the stream_cdc_cluster_apply contract — REPLACE puts + wire
    DELETEs, store == from-scratch migration at quiesce — but every
    micro-batch partition ships as ONE batch-write request per master
    node (ClusterRouter.batch_operate's batch-node split): live
    emissions ride write-op sub-transactions, dead emissions ride the
    batch grammar's DELETE record type, and per-record result codes
    keep the accounting exact.  This is the modern client's CDC-apply
    shape: wire round trips per micro-batch are bounded by
    tasks x nodes, not by the emission count — at 100 TB the apply
    stream is wire-bound and this is the number that matters.  Asserts
    ZERO single puts/gets across the whole run (the sink is entirely
    batched) and per-record statuses in-task ('ok' for writes, 'ok' |
    idempotent 'not_found' for deletes).  Same exact oracle as the
    per-record rows — the batching must be invisible at quiesce."""
    from ..operators import merge as M
    from ..queries.pipeline_q import _digest_hex_records
    from ..sinks.aerospike_wire import (
        ClusterRouter,
        N_PARTITIONS,
        WireServer,
        cols_str_to_bins,
        key_digest,
    )
    from ..sources import load_table
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    res = _cdc_incremental_result(spark, table_dir)
    n_nodes = 3
    ns, set_name = "tmx", "cdc_b"
    servers = [
        WireServer(
            owned_partitions={
                p for p in range(N_PARTITIONS) if p % n_nodes == i
            },
            info_namespace=ns,
        )
        for i in range(n_nodes)
    ]
    nodes = [(srv.host, srv.port) for srv in servers]
    eternal, now_s = M.ETERNAL, M.NOW_EPOCH_S

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        def part(rows):
            items, is_delete = [], {}
            for r in rows:
                d = key_digest(set_name, str(r["key"]).encode())
                if r["cols_str"] is None:
                    items.append((d, [], 0, None, False, True))
                    is_delete[d] = True
                else:
                    bins = cols_str_to_bins(r["cols_str"])
                    ttl = (
                        0xFFFFFFFF
                        if r["expiry"] == eternal
                        else int(r["expiry"]) - now_s
                    )
                    # REPLACE policy (flags bit3): whole-record update —
                    # a later emission with fewer columns must not leave
                    # stale bins behind
                    items.append(
                        (
                            d,
                            [("write", n, v) for n, v in bins.items()],
                            ttl, None, False, False, True,
                        )
                    )
                    is_delete[d] = False
            if not items:
                return
            router = ClusterRouter(nodes, ns, set_name)
            got = router.batch_operate(items)
            for it in items:
                st = got[it[0]][0]
                ok = (
                    st in ("ok", "not_found")
                    if is_delete[it[0]]
                    else st == "ok"
                )
                if not ok:
                    raise RuntimeError(f"cdc batch apply: status {st}")
            router.close()

        batch_df.foreachPartition(part)

    ckpt = tempfile.mkdtemp(prefix="ckpt_cdcbatch_")
    with _scaled_shuffle_partitions(
        spark, _stream_state_partitions(spark, table_dir)
    ):
        q = (
            res.writeStream.outputMode("update")
            .foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    n_puts = sum(srv._puts for srv in servers)
    n_gets = sum(srv._gets for srv in servers)
    n_bw = sum(srv._batch_writes for srv in servers)
    if (n_puts, n_gets) != (0, 0) or n_bw < 1:
        raise RuntimeError(
            f"cdc batch apply degraded: puts={n_puts} gets={n_gets} "
            f"batch_writes={n_bw} — the sink must be entirely batched"
        )
    store: dict = {}
    for srv in servers:
        store.update(srv.records())
        srv.close()
    store_rows = []
    for (s_ns, s_set, digest), (bins, ttl) in store.items():
        if s_ns != ns or s_set != set_name:
            raise RuntimeError("cdc batch apply: foreign record stored")
        entries = sorted(f"{n}={v.decode()}" for n, v in bins.items())
        store_rows.append((digest.hex(), ",".join(entries), int(ttl)))
    store_df = _rows_df(
        spark, store_rows, "digest_hex string, cols_str string, ttl long"
    )
    keyed = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .select(
            "key",
            _digest_hex_records(F.lit(set_name), F.col("key")).alias(
                "digest_hex"
            ),
        )
    )
    return keyed.join(F.broadcast(store_df), "digest_hex", "inner").select(
        "key", "cols_str", "ttl"
    )


def stream_aerospike_wire_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TRUE production shape, modernized (round 9): a
    live Cassandra data directory streamed CONTINUOUSLY into Aerospike
    over the real wire protocol.  The real-format streaming source
    admits ONE sstable generation per microbatch (ascending, the
    admission-controlled `max_gens_per_batch=1`); foreachBatch merges
    each generation's cells (liveness -> LWW -> record assembly ->
    expiry fold -> write-TTL policy, the batch operators verbatim) and
    pushes the records from executor tasks through the pipelined
    WireClient into an in-process protocol server with CREATE-only
    semantics — so per key, the FIRST generation that yields a live
    record wins, and every later generation's write draws KEY_EXISTS
    (the reference's not-an-error accounting).  Returns the server's
    final stored state per key (sorted name=value bins + stored ttl) —
    the oracle derives the same first-live-generation records from the
    parquet events (three unrolled per-generation merges + a priority
    coalesce)."""
    from ..operators.merge import (
        apply_ttl_policy,
        assemble_records,
        filter_expired,
        live_cells_from_classified,
        lww_latest,
    )
    from ..sinks.aerospike_wire import WireClient, WireServer, key_digest
    from ..sinks.kv_sink import bounded_async_foreach_writer
    from ..sources.sstable import register
    from ..sources.sstable.fixtures import (
        build_ma_table_from_events,
        classify_raw_real,
        default_runs_dir,
    )

    table_dir = build_ma_table_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_ma"
    )
    register(spark)
    srv = WireServer()
    host, port = srv.host, srv.port
    ns, set_name = "tmx", "stream"

    stream = (
        spark.readStream.format("sstable_run")
        .option("layout", "ma")
        .option("max_gens_per_batch", "1")
        .load(table_dir)
    )

    def write_batch(batch_df, _batch_id: int) -> None:
        latest = lww_latest(
            live_cells_from_classified(classify_raw_real(batch_df))
        )
        records = apply_ttl_policy(filter_expired(assemble_records(latest)))
        state: dict = {}

        def put(rd):
            c = state.get("client")
            if c is None:
                c = state["client"] = WireClient(host, port, ns, set_name)
            bins = {
                k: ("%.2f" % v).encode() for k, v in rd["columns"].items()
            }
            return c.put(str(rd["key"]).encode(), bins, int(rd["write_ttl"])), c

        def wait(h):
            handle, c = h
            return c.wait(handle) != "retry"

        bounded_async_foreach_writer(
            records.select("key", "columns", "write_ttl"), put, wait, 32
        )

    ckpt = tempfile.mkdtemp(prefix="ckpt_aw_")
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    store = srv.records()
    srv.close()
    from ..queries.pipeline_q import _digest_hex_records
    from ..sources import load_table

    # digest -> key via the distributed digest join (round 11): the
    # store rows broadcast, executors recompute key digests in Arrow
    # batches — no driver-side key collection.  A foreign stored record
    # or recipe drift drops rows from the inner join and fails the
    # oracle's row count.
    store_rows = []
    for (s_ns, s_set, digest), (bins, ttl) in store.items():
        if s_ns != ns or s_set != set_name:
            raise RuntimeError("stream wire sink: foreign record stored")
        entries = sorted(f"{n}={v.decode()}" for n, v in bins.items())
        store_rows.append((digest.hex(), ",".join(entries), int(ttl)))
    store_df = _rows_df(
        spark, store_rows, "digest_hex string, cols_str string, ttl long"
    )
    keyed = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .select(
            "key",
            _digest_hex_records(F.lit(set_name), F.col("key")).alias(
                "digest_hex"
            ),
        )
    )
    return keyed.join(F.broadcast(store_df), "digest_hex", "inner").select(
        "key", "cols_str", "ttl"
    )
