"""Scale-slope probe for the round-10 snapshot family: the as-of /
snapshot-diff / repair-digest operators over the classified cell stream.

Amplification = KEY-SPACE REPLICATION of the staged classified frame: an
xN input carries N disjoint copies of every key's cell history (key
offset by i*10^9 per copy), so per-key merge work is unchanged while
total cells, shuffle volume and output all scale with N — the honest
shape for operators whose exchanges are keyed on the record key.
cells/s holding (or rising) across the measured factors is the
evidence the snapshot family scales like the merge family it reuses.
Measured r10 (idle host, sf0.1 base): 61k cells/s at x3, 131-323k at
x9-x27, 425k at x81 (8.1M cells) — monotonically rising; the pipeline
is stage-scheduling-bound until millions of cells, data-bound after.

The timed section is the OPERATOR work only: two ts<=T snapshot merges
(tombstone-cover windows + LWW + record fold + alive-at-T filter), the
full-outer diff, and the 32-range bit_xor digest comparison — one
action over the diff count + one over the digest frame.  The amplified
parquet staging is untimed (fresh content-keyed dir, file-copy-cheap).

Usage: python tools/probe_snapshot_slope.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        # x27 holds ~2.7M-cell shuffles across 32 threads; the 1g
        # default heap OOMs, so the probe pins a workstation-sized one
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cassandra2aerospike_spark.queries.merge_q import (
        _classified_staged,
        _snapshot_at,
    )
    from cassandra2aerospike_spark.sources import load_table

    base = _classified_staged(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")

    def bounds_at(num: int, den: int):
        return ev.agg(
            F.expr(
                f"min(ts_us) + (max(ts_us) - min(ts_us)) * {num} div {den}"
            ).alias("asof_us")
        )

    def amplified(factor: int):
        parts = [
            base.withColumn("key", F.col("key") + F.lit(i * 1_000_000_000))
            for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = os.path.join(
            "/tmp", "spark_graft_snapslope", f"{os.path.basename(sf_dir)}_x{factor}"
        )
        from cassandra2aerospike_spark.functions.dedup import stage_parquet

        return stage_parquet(out, path)

    # untimed warm pass (x1): codegen + JIT + parquet footer caches
    # dominate the first pipeline execution and would inflate x3
    warm = amplified(1)
    _snapshot_at(warm, bounds_at(1, 3)).count()

    results = {}
    for factor in (27, 81):
        amp = amplified(factor)
        n_cells = amp.count()
        t0 = time.time()
        before = _snapshot_at(amp, bounds_at(1, 3)).select(
            "key",
            F.col("cols_str").alias("cols_before"),
            F.col("expiry").alias("expiry_before"),
        )
        after = _snapshot_at(amp, bounds_at(2, 3)).select(
            "key",
            F.col("cols_str").alias("cols_after"),
            F.col("expiry").alias("expiry_after"),
        )
        diff = before.join(after, "key", "full_outer").filter(
            F.col("cols_before").isNull()
            | F.col("cols_after").isNull()
            | (F.col("cols_before") != F.col("cols_after"))
            | (F.col("expiry_before") != F.col("expiry_after"))
        )
        n_diff = diff.count()
        # repair digests over the same two snapshots
        def digests(side_df, side):
            return (
                side_df.select(
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(F.col("key").cast("string")), 1, 15
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(32),
                    ).alias("bucket"),
                    F.conv(
                        F.substring(F.md5(F.col("key").cast("string")), 1, 15),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("h"),
                )
                .groupBy("bucket")
                .agg(F.expr("bit_xor(h)").alias(f"d_{side}"))
            )

        n_rng = (
            digests(before, "a")
            .join(digests(after, "b"), "bucket", "full_outer")
            .count()
        )
        dt = time.time() - t0
        results[f"x{factor}"] = {
            "cells": n_cells,
            "diff_rows": n_diff,
            "ranges": n_rng,
            "sec": round(dt, 2),
            "cells_per_sec": int(n_cells / dt),
        }

    slope = round(
        results["x81"]["cells_per_sec"] / results["x27"]["cells_per_sec"], 2
    )
    print(
        json.dumps(
            {"metric": "snapshot_family_slope", "slope_x27_to_x81": slope, **results}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
