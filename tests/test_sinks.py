"""Sink tests (S11-S13): create-only semantics, bounded-async writer,
dry-run format, streaming foreachBatch checkpoint resume (O3)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cassandra2aerospike_spark.operators import merge
from cassandra2aerospike_spark.sinks import (
    bounded_async_foreach_writer,
    create_only_append,
    dry_run,
)
from cassandra2aerospike_spark.sources import load_table


def _records(spark, rows):
    return spark.createDataFrame(rows, "key long, value double")


def test_create_only_append_never_overwrites(spark):
    sink = tempfile.mkdtemp(prefix="kv_sink_")
    r1 = create_only_append(_records(spark, [(1, 1.0), (2, 2.0)]), sink)
    assert r1 == {"read": 2, "written": 2, "already_existing": 0}
    # second batch: key 2 exists (new value must NOT replace), key 3 is new
    r2 = create_only_append(_records(spark, [(2, 99.0), (3, 3.0)]), sink)
    assert r2 == {"read": 2, "written": 1, "already_existing": 1}
    final = {r.key: r.value for r in spark.read.parquet(sink).collect()}
    assert final == {1: 1.0, 2: 2.0, 3: 3.0}  # key 2 kept its ORIGINAL value


def test_bounded_async_writer_applies_backpressure(spark):
    # foreachPartition runs in a separate Python worker process, so the
    # fake client reports observations through the shared filesystem
    log_path = os.path.join(tempfile.mkdtemp(prefix="sink_log_"), "writes.csv")
    state = {"depth": 0, "max": 0}

    def put(row):
        state["depth"] += 1
        state["max"] = max(state["max"], state["depth"])
        return row

    def wait(handle):
        state["depth"] -= 1
        with open(log_path, "a") as f:
            f.write(f"{handle['key']},{state['max']}\n")
        return True

    df = _records(spark, [(i, float(i)) for i in range(50)]).coalesce(1)
    bounded_async_foreach_writer(df, put, wait, max_in_flight=5)
    lines = [l.split(",") for l in open(log_path).read().splitlines()]
    assert sorted(int(k) for k, _ in lines) == list(range(50))
    assert max(int(d) for _, d in lines) <= 5  # backpressure held


def test_dry_run_format(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    lines = dry_run(merge.merge_records(ev), limit=3)
    assert lines and lines[0].startswith("key=")
    assert any("=" in l and l.startswith("  ") for l in lines)  # column lines


def test_foreachbatch_checkpoint_resume(spark):
    """O3 analog: a checkpointed stream writing via foreachBatch processes
    each input exactly once across restarts."""
    from cassandra2aerospike_spark.streaming.stream_queries import stream_events

    out_dir = tempfile.mkdtemp(prefix="fb_out_")
    ckpt = tempfile.mkdtemp(prefix="fb_ckpt_")

    def write_batch(batch_df, epoch_id):
        batch_df.select("event_id").write.mode("append").parquet(out_dir)

    def run_once():
        ev = stream_events(spark, "/root/testdata/sf0.001")
        q = (
            ev.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    run_once()  # restart with same checkpoint: no new data -> no duplicates
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == 1000 and n2 == 1000
