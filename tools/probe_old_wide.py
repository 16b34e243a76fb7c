"""Old-era (2.x) WIDE-partition fan-out probe — the measured evidence
for round 9's ka/la promoted-index split (the twin of the round-7 ma
number: one 300k-cell partition 38.4k -> 71.7k cells/s).

Plants ONE giant partition (n_cells old-format cells under one key) in
an `la` sstable twice: once with promoted_threshold=64KB (the planner
fans blocks out as InputPartitions) and once with 0 (the whole
partition is a single task).  Reads both through the real DataSource
into the LWW merge and reports warm cells/s + the planned task count.

Usage: python tools/probe_old_wide.py [n_cells]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.session import get_spark
    from cassandra2aerospike_spark.sources.sstable.datasource import (
        SSTableRunReader,
        register,
    )
    from cassandra2aerospike_spark.sources.sstable.format import Cell, Partition
    from cassandra2aerospike_spark.sources.sstable.old_format import OldWriter

    base = tempfile.mkdtemp(prefix="graft_old_wide_")

    def build(tag: str, thr: int) -> str:
        d = os.path.join(base, tag, "tmx", "events")
        w = OldWriter(d, 1, version="la", promoted_threshold=thr)
        big = Partition(
            key=b"giant",
            cells=[
                Cell("c%07d" % i, b"v%06d" % i, ts=1_000_000 + i)
                for i in range(n_cells)
            ],
        )
        w.add(big)
        # a handful of ordinary partitions so the plan also carries
        # range slices around the wide one
        for k in range(8):
            w.add(
                Partition(key=b"s%d" % k, cells=[Cell("c", b"y", ts=5 + k)])
            )
        w.finish()
        return d

    spark = get_spark("probe-old-wide")
    register(spark)
    out: dict[str, object] = {"n_cells": n_cells}
    try:
        for tag, thr in (("flat", 0), ("wide", 64 * 1024)):
            d = build(tag, thr)
            # 64 KB slice target so the single planted partition fans
            # out (at the 64 MB production default a 300k-cell ~9 MB
            # partition would correctly stay one range slice)
            slices = SSTableRunReader(
                {"path": d, "layout": "ma", "wide_slice_bytes": "65536"}
            ).partitions()
            n_blocks = sum(1 for s in slices if s.block is not None)

            def run() -> float:
                t0 = time.time()
                raw = (
                    spark.read.format("sstable_run")
                    .option("layout", "ma")
                    .option("wide_slice_bytes", "65536")
                    .load(d)
                )
                merge.lww_latest(
                    raw.select(
                        "key",
                        "col_name",
                        "value",
                        "ts",
                        "deleted",
                        "range_tomb",
                        "row_tomb_ts",
                        F.col("ttl").alias("ttl"),
                        "expiration",
                    )
                ).count()
                return time.time() - t0

            run()  # warm (codegen + page cache)
            secs = min(run() for _ in range(2))
            out[f"{tag}_tasks"] = len(slices)
            out[f"{tag}_block_tasks"] = n_blocks
            out[f"{tag}_cells_per_sec"] = round((n_cells + 8) / secs)
        out["speedup"] = round(
            out["wide_cells_per_sec"] / out["flat_cells_per_sec"], 2
        )
        print(json.dumps(out, separators=(",", ":")))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
