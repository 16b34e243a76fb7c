"""Regenerate the PLANS.md posture table from the live registry.

Audits the formatted physical plan of every batch `queries()` entry at
sf0.01 (plan shape is SF-independent) and rewrites the table section of
PLANS.md in place, preserving the prose header above the table.  Usage:

    python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries staged through external state (SSTable run dirs, token layouts,
# parquet sinks) or a streaming engine: audited by their own tests, the
# static batch-plan audit would mostly measure the staging fixture
EXCLUDED_PREFIXES = ("stream_",)
EXCLUDED = {
    "p5_partitioner_abort",
    "s12_retry_backpressure",
    "s28_aerospike_wire_sink",
    "s8_oldformat_merge",
    "s9_sstable_merge",
    "compaction_roundtrip",
    "ma_compaction_roundtrip",
    "o2_layout_resume",
    "s11_create_only_sink",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from cassandra2aerospike_spark.plans import audit
    from cassandra2aerospike_spark.queries import QUERIES
    from cassandra2aerospike_spark.session import get_spark

    spark = get_spark("gen_plans")
    rows = []
    for name in sorted(QUERIES):
        if name.startswith(EXCLUDED_PREFIXES) or name in EXCLUDED:
            continue
        rep = audit(QUERIES[name](spark, sf_dir))
        n_bnlj = rep.plan.count("BroadcastNestedLoopJoin")
        rows.append(
            (name, rep.n_scans, rep.n_exchanges, rep.n_broadcast_joins,
             rep.n_sortmerge_joins, n_bnlj, rep.n_python_row_udf,
             rep.n_arrow_eval)
        )
        print(f"{name}: scans={rep.n_scans} shuffles={rep.n_exchanges}")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    text = open(path).read()
    head = text.split("| query |")[0]
    table = ["| query | scans | shuffles | bhj | smj | bnlj | row-udf | arrow |",
             "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        table.append("| `" + r[0] + "` | " + " | ".join(str(v) for v in r[1:]) + " |")
    open(path, "w").write(head + "\n".join(table) + "\n")
    print(f"wrote {path}: {len(rows)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
