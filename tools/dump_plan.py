"""Dump `.explain("formatted")` for named batch queries to files.

Usage:
    python tools/dump_plan.py <out_dir> <suffix> <query> [<query> ...]

Writes <out_dir>/<query>_<suffix>.txt for each query, built at sf0.01
(plan shape is SF-independent).  Streaming queries execute to a result
frame, so their "plan" here is the plan of the returned batch frame;
for those the interesting before/after evidence is the code diff plus
bench numbers, not this file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from cassandra2aerospike_spark.queries import QUERIES
    from cassandra2aerospike_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump_plan")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
