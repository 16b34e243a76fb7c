"""Hot-gram scale-slope probe for text_dup_span_removal.

Plants ONE 12-token gram ("license boilerplate") in 30% of documents so
a single gram hash dominates the corpus, then measures docs/s for the
dup-span pipeline at 10x and 30x amplification.  A slope ratio near 1.0
is the evidence that no operator buffers the hot key in one task — the
failure mode of `count(*) over (partition by gh)` that the groupBy+join
shape in queries/text_q.py:q_text_dup_span_removal replaces.

Usage: python tools/probe_hot_gram.py [sf_dir]
Prints one JSON line with x10/x30 docs/s and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BOILER = " ".join(f"boiler{i}" for i in range(12))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from cassandra2aerospike_spark.queries.text_q import q_text_dup_span_removal
    from cassandra2aerospike_spark.session import get_spark
    from cassandra2aerospike_spark.sources import load_table

    spark = get_spark("probe_hot_gram")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def probe(factor: int) -> tuple[float, int]:
        # unique suffix per replica keeps ORDINARY grams distinct across
        # replicas (so dup-gram output does not grow quadratically with
        # amplification); the planted gram is identical in 30% of docs
        # at every scale — the hot key under test
        amp = (
            docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .select(
                (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
                F.concat(
                    F.when(
                        (F.col("doc_id") + F.col("rep")) % 10 < 3,
                        F.lit(BOILER + " "),
                    ).otherwise(F.lit("")),
                    F.col("text"),
                    F.lit(" u"),
                    F.col("rep").cast("string"),
                    F.lit("x"),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
            .persist()
        )
        n = amp.count()
        stage = "/tmp/graft_hot_gram_stage"
        amp.write.mode("overwrite").parquet(os.path.join(stage, "documents.parquet"))
        q_text_dup_span_removal(spark, stage).count()  # warm
        t0 = time.time()
        q_text_dup_span_removal(spark, stage).count()
        rate = n / (time.time() - t0)
        amp.unpersist()
        return rate, n

    r10, n10 = probe(10)
    r30, n30 = probe(30)
    print(
        json.dumps(
            {
                "hot_gram_docs_per_sec_x10": round(r10),
                "hot_gram_docs_per_sec_x30": round(r30),
                "hot_gram_slope_ratio": round(r30 / r10, 3),
                "n_docs_x30": n30,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
