"""Scale-slope probe for the round-7 format operators: typed multi-ck
cover (s22 pipeline) and collection merge (s24 pipeline).

Amplification = GENERATION REPLICATION: the fixture table's sstables are
copied under higher generation numbers, so an xN directory carries N
versions of every row — the multi-generation reconciliation shape the
k-way merge exists for — and the read+decode+merge work scales with N
while staging stays a file copy.  cells/s holding (or rising) from x3 to
x9 is the evidence the new cover operators scale like the rest of the
merge family.

Usage: python tools/probe_format_slope.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _amplify(table_dir: str, out_dir: str, factor: int) -> str:
    """Copy every sstable generation `factor` times under fresh gens."""
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import re

    files = sorted(os.listdir(table_dir))
    gens = sorted(
        {
            int(m.group(2))
            for f in files
            if (m := re.match(r"([a-z]{2})-(\d+)-big-", f))
        }
    )
    next_gen = 1
    for _rep in range(factor):
        for g in gens:
            for f in files:
                m = re.match(r"([a-z]{2})-(\d+)-big-(.*)", f)
                if m is None or int(m.group(2)) != g:
                    continue
                shutil.copyfile(
                    os.path.join(table_dir, f),
                    os.path.join(
                        out_dir, f"{m.group(1)}-{next_gen}-big-{m.group(3)}"
                    ),
                )
            next_gen += 1
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    return out_dir


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F  # noqa: F401

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.session import get_spark
    from cassandra2aerospike_spark.sources.sstable.datasource import register
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_ma_collection_table_from_events,
        build_ma_multick_table_from_events,
        build_ma_reversed_ck_table_from_events,
        build_ma_udt_table_from_events,
        default_runs_dir,
    )

    spark = get_spark("probe_format_slope")
    register(spark)
    base = default_runs_dir(sf_dir)
    mck = build_ma_multick_table_from_events(spark, sf_dir, base + "_ma_mck")
    coll = build_ma_collection_table_from_events(spark, sf_dir, base + "_ma_coll")
    udt = build_ma_udt_table_from_events(spark, sf_dir, base + "_ma_udt")
    rck = build_ma_reversed_ck_table_from_events(spark, sf_dir, base + "_ma_rck")

    def probe(table_dir: str, tag: str, live_fn, factor: int) -> tuple[float, int]:
        amp = _amplify(table_dir, f"{table_dir}_x{factor}", factor)
        raw = spark.read.format("sstable_run").option("layout", "ma").load(amp)
        n = raw.count()
        live_fn(raw).count()  # warm
        t0 = time.time()
        live_fn(
            spark.read.format("sstable_run").option("layout", "ma").load(amp)
        ).count()
        return n / (time.time() - t0), n

    out = {}
    for tag, table, fn in (
        ("multick", mck, merge.clustered_live_cells),
        ("collection", coll, merge.collection_live_cells),
        # round 8/9 format families: non-frozen UDT complex blocks and
        # ReversedType (DESC) clustering cover
        ("udt", udt, merge.collection_live_cells),
        ("reversed_ck", rck, merge.clustered_live_cells),
    ):
        r3, _ = probe(table, tag, fn, 3)
        r9, n9 = probe(table, tag, fn, 9)
        out[f"{tag}_cells_per_sec_x3"] = round(r3)
        out[f"{tag}_cells_per_sec_x9"] = round(r9)
        out[f"{tag}_slope_ratio"] = round(r9 / r3, 3)
        out[f"{tag}_cells_x9"] = n9
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
