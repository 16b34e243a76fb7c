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

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_10x.py [sf_dir]
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


if __name__ == "__main__":
    raise SystemExit(main())
