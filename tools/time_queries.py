"""Focused per-query timer for A/B config bisects (guide §1).

Runs the named queries with bench.py's exact protocol (1 cold pass +
median of 3 warm passes, count() action) under whatever SPARK_GRAFT_*
env is in force, and prints one JSON line {query: {cold, warm}}.

Usage:
    SPARK_GRAFT_ARROW_ROWS=10000 python tools/time_queries.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cassandra2aerospike_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    k_warm = int(os.environ.get("SPARK_GRAFT_BENCH_K", "3"))
    spark = get_spark("time_queries")
    qs = entrymod.queries()
    spark.range(1).count()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        cold = time.time() - t0
        samples = []
        for _ in range(k_warm):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
        out[name] = {
            "cold": round(cold, 3),
            "warm": round(statistics.median(samples), 3),
        }
        print(f"# {name}: cold {cold:.2f}s warm {out[name]['warm']}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
