"""10x-STEP scale probes (VERDICT r14 task 7): the slope sweep's
largest step is 3x (merge x10->x30, LSH x20->x60), so the 100x posture
argument extrapolated from 3x ratios.  This probe pushes the two
north-star paths one decade further IN A FRESH SESSION:

  * merge: the bench merge probe at x30 then x300 of sf0.1 events
    (3M -> 30M cells; same key-space replication, per-key work
    unchanged, shuffle volume scales with N);
  * MinHash-LSH dedup: the distinct-text probe at x60 then x600 of
    sf0.1 documents (150k -> 1.5M docs; distinct suffixes keep clusters
    — and the quadratic pair output — constant-size, so the step
    measures scan/shuffle/checkpoint cost, not output growth).

Per-decade throughput RATIO >= ~0.8 is the pass bar: cells/s and
docs/s holding across a 10x step is one decade of the 100x story
measured, not extrapolated.

Round 16 adds the remaining heavy families (VERDICT r15 task 5), each
behind its own flag so every leg runs in a fresh session:

  * --media: the full byte-level decode (PCM/BMP/PNG/JPEG/GIF) over
    x1 -> x10 replicated blob sets (25k -> 250k blobs at sf0.1);
  * --wire: the secured 3-node cluster put path (LOGIN + digest
    routing + bounded-async pipelining) over x5 -> x50 replicated
    merged records;
  * --batch: the s59-shape batched migration (ONE batch-write per
    task x node, create-only write ops per record) over x5 -> x50;
  * --scan (round 16 late): the PAGED read side — 8 pid-range tasks,
    512-record pages on fresh connections with digest-cursor resume,
    x5 -> x50, plus the unbounded sweep at x50 (pagination's price).

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_10x.py [sf_dir]
       [--lsh-only | --media | --wire | --batch | --scan]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import dedup as dedup_fns
    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.session import get_spark
    from cassandra2aerospike_spark.sources import load_table

    lsh_only = "--lsh-only" in sys.argv
    spark = get_spark("probe_10x")
    ev = load_table(spark, sf_dir, "events")
    out: dict = {"metric": "scale_10x", "sf_dir": sf_dir}

    if "--media" in sys.argv:
        return _media_leg(spark, sf_dir, out)
    if "--wire" in sys.argv:
        return _wire_leg(spark, sf_dir, out, batched=False)
    if "--batch" in sys.argv:
        return _wire_leg(spark, sf_dir, out, batched=True)
    if "--scan" in sys.argv:
        return _scan_leg(spark, sf_dir, out)

    def merge_probe(factor: int) -> tuple[float, int]:
        amp = (
            ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
            .withColumn("user_id", F.col("user_id") + F.col("rep") * 100000)
            .withColumn("ts_us", F.col("ts_us") + F.col("rep"))
            .drop("rep")
            .persist()
        )
        n_cells = amp.count()
        merge.merge_records(amp).count()  # warm
        t0 = time.time()
        merge.merge_records(amp).count()
        rate = n_cells / (time.time() - t0)
        amp.unpersist()
        spark.catalog.clearCache()
        return rate, n_cells

    if not lsh_only:
        m30, n30 = merge_probe(30)
        m300, n300 = merge_probe(300)
        _report_merge(out, m30, m300, n300)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def dedup_probe(factor: int) -> tuple[float, int]:
        # NO .persist() of the amplified frame: at 1.5M+ docs the
        # materialized rows exceed the local JVM heap, and the frame is
        # a trivial explode of a 5,000-row parquet — recomputing it is
        # cheaper than caching it (exactly the 100 TB posture: derive,
        # don't materialize).
        #
        # EVERY WORD is salted with the replica id — a trailing " repN"
        # suffix (the bench sweep's distinct mode) only perturbs the
        # tail shingles, so replicas still share ~90% of their shingle
        # sets, still collide in the minhash bands, and the candidate-
        # pair output grows QUADRATICALLY in the replica count (fine at
        # x60, a 2 GB broadcast blowup at x300).  Per-word salting makes
        # every replica's shingle set fully distinct, so output stays
        # linear and the step measures scan/shuffle/LSH cost.
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
            ),
            " ",
        )
        docs_amp = (
            docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
            .withColumn("text", salted)
            .drop("rep")
        )
        n_docs = docs_amp.count()
        dirs = [tempfile.mkdtemp(prefix="graft_10x_dedup_") for _ in range(2)]
        dedup_fns.minhash_lsh_pairs(
            docs_amp, 16, 4, 4, 3, 0.5, checkpoint_dir=dirs[0]
        ).count()  # warm
        t0 = time.time()
        dedup_fns.minhash_lsh_pairs(
            docs_amp, 16, 4, 4, 3, 0.5, checkpoint_dir=dirs[1]
        ).count()
        rate = n_docs / (time.time() - t0)
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()
        return rate, n_docs

    d60, _ = dedup_probe(30)
    d600, nd600 = dedup_probe(300)
    out.update(
        {
            "dedup_docs_per_sec_x30": round(d60),
            "dedup_docs_per_sec_x300": round(d600),
            "dedup_docs_x300": nd600,
            "dedup_10x_ratio": round(d600 / d60, 3),
        }
    )
    print(
        f"# LSH 10x step: x30 {d60:,.0f} -> x300 {d600:,.0f} docs/s "
        f"({nd600:,} docs, ratio {d600 / d60:.2f})",
        file=sys.stderr,
    )
    print(json.dumps(out))
    return 0


def _report_merge(out: dict, m30: float, m300: float, n300: int) -> None:
    out.update(
        {
            "merge_cells_per_sec_x30": round(m30),
            "merge_cells_per_sec_x300": round(m300),
            "merge_cells_x300": n300,
            "merge_10x_ratio": round(m300 / m30, 3),
        }
    )
    print(
        f"# merge 10x step: x30 {m30:,.0f} -> x300 {m300:,.0f} cells/s "
        f"({n300:,} cells, ratio {m300 / m30:.2f})",
        file=sys.stderr,
    )


def _media_leg(spark, sf_dir: str, out: dict) -> int:
    """Media-decode 10x step: synthesize-then-persist xN replicated
    real blobs (5 formats per source doc, every % 5 branch), time the
    full byte decode only.  The decode is embarrassingly parallel
    (mapInPandas over the scan, zero shuffles), so blobs/s holding
    across the decade is the expected — and now measured — shape."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.functions import multimodal as mm
    from cassandra2aerospike_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def media_probe(factor: int) -> tuple[float, int]:
        media_docs = (
            docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(5 * factor - 1)))
            )
            .withColumn("doc_id", F.col("doc_id") * 5 * factor + F.col("rep"))
            .drop("rep")
        )
        media = mm.synthesize_av_media(media_docs).persist()
        n_media = media.count()  # materialize so only DECODE is timed
        mm.decode_media(media).count()  # warm
        t0 = time.time()
        mm.decode_media(media).count()
        rate = n_media / (time.time() - t0)
        media.unpersist()
        spark.catalog.clearCache()
        return rate, n_media

    r1, n1 = media_probe(1)
    r10, n10 = media_probe(10)
    out.update(
        {
            "media_blobs_per_sec_x1": round(r1),
            "media_blobs_per_sec_x10": round(r10),
            "media_blobs_x10": n10,
            "media_10x_ratio": round(r10 / r1, 3),
        }
    )
    print(
        f"# media 10x step: x1 {r1:,.0f} -> x10 {r10:,.0f} blobs/s "
        f"({n1:,} -> {n10:,} blobs, ratio {r10 / r1:.2f})",
        file=sys.stderr,
    )
    print(json.dumps(out))
    return 0


def _wire_leg(spark, sf_dir: str, out: dict, batched: bool) -> int:
    """Wire-path 10x step (x5 -> x50 replicated merged records against
    a fresh 3-node cluster per factor).  batched=False: the per-record
    put path (bounded-async pipelining).  batched=True: the s59-shape
    batch-write migration — ONE batch_operate per task, create-only
    write ops per record, so wire round trips stay tasks x nodes while
    records grow 10x; recs/s should IMPROVE as the batch amortizes."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.queries.pipeline_q import _sink_parallelism
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        ClusterRouter,
        WireServer,
        key_digest,
    )
    from cassandra2aerospike_spark.sinks.kv_sink import (
        bounded_async_foreach_writer,
    )
    from cassandra2aerospike_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    eternal, now_s = merge.ETERNAL, merge.NOW_EPOCH_S

    def wire_probe(factor: int) -> tuple[float, int]:
        recs = (
            merge.merge_records(ev)
            .withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .withColumn(
                "key", F.col("key") + F.col("rep").cast("long") * 10_000_000
            )
            .drop("rep")
            .select("key", "columns", "expiry")
            .persist()
        )
        n = recs.count()
        n_tasks = _sink_parallelism(n)
        sink = recs.coalesce(n_tasks)
        servers = [
            WireServer(
                owned_partitions={
                    p for p in range(N_PARTITIONS) if p % 3 == i
                },
                info_namespace="tmx",
            )
            for i in range(3)
        ]
        nodes = [(s_.host, s_.port) for s_ in servers]

        if batched:
            def sink_partition(rows):
                import pandas as _pd  # noqa: F401 — worker-side import

                router = ClusterRouter(nodes, "tmx", "recs")
                items = []
                for rd in rows:
                    bins = {
                        k2: ("%.2f" % v).encode()
                        for k2, v in rd["columns"].items()
                    }
                    ttl = (
                        0xFFFFFFFF
                        if rd["expiry"] == eternal
                        else int(rd["expiry"]) - now_s
                    )
                    items.append(
                        (
                            key_digest("recs", str(rd["key"]).encode()),
                            [("write", k2, v) for k2, v in bins.items()],
                            ttl,
                            None,
                            True,
                        )
                    )
                got = router.batch_operate(items)
                if any(got[d][0] != "ok" for d, *_ in items):
                    raise RuntimeError("batch probe: non-ok create")
                router.close()

            t0 = time.time()
            sink.foreachPartition(sink_partition)
            dt = time.time() - t0
        else:
            state: dict = {}

            def put(rd):
                r = state.get("router")
                if r is None:
                    r = state["router"] = ClusterRouter(nodes, "tmx", "recs")
                key = str(rd["key"]).encode()
                bins = {
                    k2: ("%.2f" % v).encode()
                    for k2, v in rd["columns"].items()
                }
                ttl = (
                    0xFFFFFFFF
                    if rd["expiry"] == eternal
                    else int(rd["expiry"]) - now_s
                )
                c = r.client_for(key)
                return c.put(key, bins, ttl), c

            def wait(h):
                handle, c = h
                if c.wait(handle) != "ok":
                    raise RuntimeError("wire probe: unexpected non-ok put")
                return True

            t0 = time.time()
            bounded_async_foreach_writer(sink, put, wait, max_in_flight=32)
            dt = time.time() - t0

        n_stored = sum(len(s_.records()) for s_ in servers)
        for s_ in servers:
            s_.close()
        recs.unpersist()
        spark.catalog.clearCache()
        if n_stored != n:
            raise RuntimeError(f"wire probe lost records: {n_stored}/{n}")
        return n / dt, n

    name = "batch" if batched else "wire"
    r5, n5 = wire_probe(5)
    r50, n50 = wire_probe(50)
    out.update(
        {
            f"{name}_recs_per_sec_x5": round(r5),
            f"{name}_recs_per_sec_x50": round(r50),
            f"{name}_recs_x50": n50,
            f"{name}_10x_ratio": round(r50 / r5, 3),
        }
    )
    print(
        f"# {name} 10x step: x5 {r5:,.0f} -> x50 {r50:,.0f} recs/s "
        f"({n5:,} -> {n50:,} records, ratio {r50 / r5:.2f})",
        file=sys.stderr,
    )
    print(json.dumps(out))
    return 0


def _scan_leg(spark, sf_dir: str, out: dict) -> int:
    """Read-side 10x step for the PAGED scan path (round 16): fill a
    3-node cluster with x5 then x50 replicated merged records (batch
    writes), then sweep it back through 8 disjoint pid ranges, every
    (range, node) stream read in 512-record pages on fresh connections
    with the digest-cursor resume.  Reports paged recs/s at both
    factors (the decade ratio) and, at x50, the UNBOUNDED sweep on the
    same stored state — the measured price of pagination (extra
    connections + per-page re-addressing) vs the resumability it
    buys."""
    from pyspark.sql import functions as F  # noqa: F401

    from cassandra2aerospike_spark.operators import merge
    from cassandra2aerospike_spark.queries.pipeline_q import _sink_parallelism
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        ClusterRouter,
        WireClient,
        WireServer,
        key_digest,
    )
    from cassandra2aerospike_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    eternal, now_s = merge.ETERNAL, merge.NOW_EPOCH_S
    n_ranges, page_size = 8, 512
    span = N_PARTITIONS // n_ranges

    def scan_probe(factor: int) -> tuple[float, float | None, int]:
        recs = (
            merge.merge_records(ev)
            .withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .withColumn(
                "key", F.col("key") + F.col("rep").cast("long") * 10_000_000
            )
            .drop("rep")
            .select("key", "columns", "expiry")
            .persist()
        )
        n = recs.count()
        servers = [
            WireServer(
                owned_partitions={
                    p for p in range(N_PARTITIONS) if p % 3 == i
                },
                info_namespace="tmx",
            )
            for i in range(3)
        ]
        nodes = [(s_.host, s_.port) for s_ in servers]

        def sink_partition(rows):
            router = ClusterRouter(nodes, "tmx", "recs")
            items = []
            for rd in rows:
                bins = {
                    k2: ("%.2f" % v).encode()
                    for k2, v in rd["columns"].items()
                }
                ttl = (
                    0xFFFFFFFF
                    if rd["expiry"] == eternal
                    else int(rd["expiry"]) - now_s
                )
                items.append(
                    (
                        key_digest("recs", str(rd["key"]).encode()),
                        [("write", k2, v) for k2, v in bins.items()],
                        ttl,
                        None,
                        True,
                    )
                )
            got = router.batch_operate(items)
            if any(got[d][0] != "ok" for d, *_ in items):
                raise RuntimeError("scan probe: non-ok create")
            router.close()

        recs.coalesce(_sink_parallelism(n)).foreachPartition(sink_partition)
        recs.unpersist()
        spark.catalog.clearCache()

        ranges_df = spark.createDataFrame(
            [(r, r * span, span) for r in range(n_ranges)],
            "rng int, begin int, count int",
        ).repartition(n_ranges, "rng")

        def sweep(paged: bool):
            def scan_range(batches):
                import pandas as _pd

                for pdf in batches:
                    for begin, count in zip(pdf["begin"], pdf["count"]):
                        got = 0
                        for h, p_ in nodes:
                            if not paged:
                                c = WireClient(h, p_, "tmx", "recs")
                                for _rec in c.scan(int(begin), int(count)):
                                    got += 1
                                c.close()
                                continue
                            cursor = None
                            while True:
                                c = WireClient(h, p_, "tmx", "recs")
                                page = list(
                                    c.scan(
                                        int(begin), int(count),
                                        resume_digest=cursor,
                                        max_records=page_size,
                                    )
                                )
                                c.close()
                                got += len(page)
                                if len(page) < page_size:
                                    break
                                cursor = page[-1][0]
                        yield _pd.DataFrame({"got": [got]})

            t0 = time.time()
            total = (
                ranges_df.mapInPandas(scan_range, "got long")
                .agg(F.sum("got"))
                .first()[0]
            )
            dt = time.time() - t0
            if total != n:
                raise RuntimeError(f"scan probe lost records: {total}/{n}")
            return n / dt

        sweep(paged=True)  # warm (JVM + server page sort)
        paged_rate = sweep(paged=True)
        unpaged_rate = sweep(paged=False) if factor == 50 else None
        for s_ in servers:
            s_.close()
        return paged_rate, unpaged_rate, n

    p5, _u5, n5 = scan_probe(5)
    p50, u50, n50 = scan_probe(50)
    out.update(
        {
            "scan_paged_recs_per_sec_x5": round(p5),
            "scan_paged_recs_per_sec_x50": round(p50),
            "scan_recs_x50": n50,
            "scan_10x_ratio": round(p50 / p5, 3),
            "scan_unpaged_recs_per_sec_x50": round(u50),
            "scan_paging_overhead_ratio": round(u50 / p50, 3),
        }
    )
    print(
        f"# paged scan 10x step: x5 {p5:,.0f} -> x50 {p50:,.0f} recs/s "
        f"({n5:,} -> {n50:,} records, ratio {p50 / p5:.2f}); unbounded "
        f"at x50 {u50:,.0f} recs/s (paging overhead x{u50 / p50:.2f})",
        file=sys.stderr,
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
