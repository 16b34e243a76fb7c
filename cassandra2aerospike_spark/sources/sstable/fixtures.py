"""Bridge between the parquet fixtures and the SSTable-run format: write
the events cell stream as N sorted runs, read it back as the classified
EAV frame the merge operators consume.

This closes the loop on SURVEY.md §7 Phase 6: the reference's actual
input (multi-run SSTables with versions of the same key spread across
runs) is materialized in our run format, and `merge over sstable source`
must equal `merge over parquet` — the strongest parity statement the
fixtures allow.

Run assignment: event_id % n_runs, so most keys have cells in several
runs (the k-way merge shape of CassandraParser.cpp:219-281).  Values are
stored as repr(float) bytes: byte-opaque in the format (README.md:39 "all
columns are written ... as binary blobs") yet exactly recoverable with
cast(string as double) in any engine.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators.merge import classify_cells
from ..tables import load_table
from .datasource import register
from .format import Cell, Partition, RunWriter


def build_runs_from_events(
    spark: SparkSession, sf_dir: str, out_dir: str, n_runs: int = 3
) -> str:
    """Materialize events as n_runs sorted runs under out_dir (idempotent:
    a _DONE marker skips rebuild).  Driver-side build — this is fixture
    authoring, not a query path; the scale path for writing runs would be
    a DataSourceWriter."""
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    rows = (
        classify_cells(events)
        .withColumn("run", (F.col("ts") % n_runs).cast("int"))
        .select("run", "key", "col_name", "value", "ts", "ttl", "expiration", "kind")
        .collect()
    )
    by_run: dict[int, dict[bytes, Partition]] = {g: {} for g in range(n_runs)}
    for r in rows:
        key = str(r.key).encode("utf-8")
        parts = by_run[r.run]
        p = parts.get(key)
        if p is None:
            p = parts[key] = Partition(key=key)
        if r.kind == "row":
            p.row_tomb_ts = max(p.row_tomb_ts or r.ts, r.ts)
        elif r.kind == "range":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, range_tomb=True))
        elif r.kind == "point":
            p.cells.append(Cell(col_name=r.col_name, ts=r.ts, deleted=True))
        else:
            p.cells.append(
                Cell(
                    col_name=r.col_name,
                    value=repr(float(r.value)).encode("utf-8"),
                    ts=r.ts,
                    ttl=r.ttl,
                    expiration=r.expiration,
                )
            )
    for gen, parts in by_run.items():
        w = RunWriter(out_dir, gen + 1)
        for p in sorted(parts.values(), key=lambda p: (p.token, p.key)):
            p.cells.sort(key=lambda c: (c.col_name, c.ts))
            w.add(p)
        w.finish()
    open(marker, "w").write("ok")
    return out_dir


def classified_from_runs(spark: SparkSession, runs_dir: str) -> DataFrame:
    """Read the runs back into the classified EAV frame (key, col_name,
    value, ts, ttl, expiration, kind) that operators/merge.py consumes —
    the inverse of build_runs_from_events' encoding."""
    register(spark)
    raw = spark.read.format("sstable_run").load(runs_dir)
    kind = (
        F.when(F.col("col_name").isNull(), F.lit("row"))
        .when(F.col("range_tomb"), F.lit("range"))
        .when(F.col("deleted"), F.lit("point"))
        .otherwise(F.lit("cell"))
    )
    return raw.select(
        F.col("key").cast("string").cast("long").alias("key"),
        "col_name",
        # tombstone rows carry empty values — try_cast yields NULL for them
        F.col("value").cast("string").try_cast("double").alias("value"),
        "ts",
        "ttl",
        "expiration",
        kind.alias("kind"),
    )


def default_runs_dir(sf_dir: str) -> str:
    """Deterministic per-SF cache location for the generated runs."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join("/tmp", "spark_graft_runs", tag)
