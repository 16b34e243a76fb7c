"""Backup-family slope DECOMPOSITION (VERDICT r14 task 5): the r13/r14
slope sweeps read backup_slope_ratio 3.30 -> 3.65 at the x5 -> x15
step, and the standing explanation ("the connect floor amortizes")
predicts the ratio should FALL toward 1 as data grows — it rose
instead.  This probe replays the exact bench.py backup probe shape
(fill a 3-node cluster with xN-replicated merged records, then the
asbackup job: 8 pid-range mapInPandas tasks scanning every node
straight into the keyless 4-file .asb sink) with the timed region
DECOMPOSED per stage:

  * sched  — the pure Spark floor: the same 8-task mapInPandas shape
             doing nothing (no sockets, no records);
  * connect — wall seconds spent constructing WireClients inside scan
             tasks (accumulator, summed across tasks);
  * drain  — wall seconds draining the scan record streams
             (accumulator);
  * write  — the .asb write job minus the in-task connect+drain time
             (serialize + 4-file write + scheduling);
  * restore — read_asb_scan().count(), the verify pass.

Run FACTORS (default 5, 15, 45) in ONE session so later factors are
the warm ones (the bench sweep's order), then once more with
--reverse to separate warm-up from scale: if x5-run-second is as fast
per record as x15-run-second, the >3 ratio is first-run warm-up, not
scale behavior.

Usage: python tools/probe_backup_decomp.py [sf_dir] [--reverse]
Prints one JSON line per factor plus a summary line.
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reverse = "--reverse" in sys.argv
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import pandas as pd
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.session import get_spark
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireClient,
        WireServer,
        fetch_partition_map,
        key_digest,
        partition_id,
    )
    from cassandra2aerospike_spark.sinks.asb_backup import (
        read_asb_scan,
        write_asb_scan,
    )
    from cassandra2aerospike_spark.sinks.kv_sink import (
        bounded_async_foreach_writer,
    )

    from cassandra2aerospike_spark.sources import load_table

    spark = get_spark("probe_backup_decomp")
    sc = spark.sparkContext
    ev = load_table(spark, sf_dir, "events")

    def probe(factor: int) -> dict:
        ns_, set_ = "tmx", "bkup"
        recs = (
            merge.merge_records(ev)
            .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("key", F.col("key") + F.col("rep").cast("long") * 10_000_000)
            .drop("rep")
            .select("key", "columns", "expiry")
            .persist()
        )
        n = recs.count()
        servers = [
            WireServer(
                owned_partitions={p for p in range(N_PARTITIONS) if p % 3 == i},
                info_namespace=ns_,
            )
            for i in range(3)
        ]
        nodes = [(s_.host, s_.port) for s_ in servers]
        pmap = [-1] * N_PARTITIONS
        for idx, (h_, p_) in enumerate(nodes):
            _g, owned = fetch_partition_map(h_, p_, ns_)
            for pt in owned:
                pmap[pt] = idx
        eternal, now_s = merge.ETERNAL, merge.NOW_EPOCH_S
        state: dict = {}

        def put(rd):
            cl = state.get("clients")
            if cl is None:
                cl = state["clients"] = [
                    WireClient(h_, p_, ns_, set_) for h_, p_ in nodes
                ]
            key = str(rd["key"]).encode()
            bins = {k2: ("%.2f" % v).encode() for k2, v in rd["columns"].items()}
            ttl = (
                0xFFFFFFFF if rd["expiry"] == eternal else int(rd["expiry"]) - now_s
            )
            c = cl[pmap[partition_id(key_digest(set_, key))]]
            return c.put(key, bins, ttl), c

        def wait(h):
            handle, c = h
            if c.wait(handle) != "ok":
                raise RuntimeError("backup decomp: non-ok put")
            return True

        t_fill0 = time.time()
        bounded_async_foreach_writer(recs, put, wait, max_in_flight=32)
        t_fill = time.time() - t_fill0

        n_ranges = 8
        span = N_PARTITIONS // n_ranges
        ranges_df = spark.createDataFrame(
            [(r, r * span, span) for r in range(n_ranges)],
            "rng int, begin int, count int",
        ).repartition(n_ranges, "rng")

        # --- pure scheduling floor: same shape, no work ---
        def noop(batches):
            for pdf in batches:
                yield pd.DataFrame({"n": [len(pdf)]})

        t0 = time.time()
        ranges_df.mapInPandas(noop, "n long").count()
        t_sched = time.time() - t0

        acc_connect = sc.accumulator(0.0)
        acc_drain = sc.accumulator(0.0)

        def scan_range(batches):
            for pdf in batches:
                for begin, count in zip(pdf["begin"], pdf["count"]):
                    dh, cols, ttls = [], [], []
                    for h_, p_ in nodes:
                        tc = time.time()
                        c = WireClient(h_, p_, ns_, set_)
                        acc_connect.add(time.time() - tc)
                        td = time.time()
                        for digest, ttl, bins in c.scan(int(begin), int(count)):
                            dh.append(digest.hex())
                            cols.append(
                                ",".join(
                                    sorted(
                                        f"{n2}={v.decode()}"
                                        for n2, v in bins.items()
                                    )
                                )
                            )
                            ttls.append(int(ttl))
                        acc_drain.add(time.time() - td)
                        c.close()
                    yield pd.DataFrame(
                        {"digest_hex": dh, "cols_str": cols, "ttl": ttls}
                    )

        out_dir = tempfile.mkdtemp(prefix="graft_backup_decomp_")
        t0 = time.time()
        write_asb_scan(
            ranges_df.mapInPandas(
                scan_range, "digest_hex string, cols_str string, ttl long"
            ),
            out_dir, ns_, set_, now_s, n_files=4,
        )
        t_job = time.time() - t0
        t0 = time.time()
        n_backed = read_asb_scan(spark, out_dir, ns_, set_, now_s).count()
        t_restore = time.time() - t0
        for s_ in servers:
            s_.close()
        recs.unpersist()
        shutil.rmtree(out_dir, ignore_errors=True)
        if n_backed != n:
            raise RuntimeError(f"backup decomp lost records: {n_backed}/{n}")
        row = {
            "factor": factor,
            "records": n,
            "fill_s": round(t_fill, 3),
            "sched_floor_s": round(t_sched, 3),
            "connect_s": round(acc_connect.value, 3),
            "drain_s": round(acc_drain.value, 3),
            "backup_job_s": round(t_job, 3),
            "write_residual_s": round(
                t_job - acc_connect.value - acc_drain.value, 3
            ),
            "restore_s": round(t_restore, 3),
            "recs_per_sec": round(n / t_job),
        }
        print(json.dumps(row), flush=True)
        return row

    factors = [5, 15, 45]
    if reverse:
        factors = factors[::-1]
    rows = [probe(f) for f in factors]
    by_f = {r["factor"]: r for r in rows}
    if 5 in by_f and 15 in by_f:
        print(
            json.dumps(
                {
                    "metric": "backup_decomp",
                    "order": factors,
                    "slope_x5_x15": round(
                        by_f[15]["recs_per_sec"] / by_f[5]["recs_per_sec"], 3
                    ),
                    "slope_x15_x45": round(
                        by_f[45]["recs_per_sec"] / by_f[15]["recs_per_sec"], 3
                    )
                    if 45 in by_f
                    else None,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
