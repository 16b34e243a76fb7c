"""Calibration-under-contention experiment (VERDICT r11 task 2).

Measures a fixed query subset twice on the SAME code: once on the idle
host, once with 32 CPU-hog processes running (the contention regime the
r11 driver bench ran in).  For each regime it computes warm medians and
the r12 two-probe interleaved host_speed_factor, then reports how far
RAW vs NORMALIZED medians moved.  Pass criterion (recorded in
DESIGN.md): normalized medians of byte-identical queries move <1.2x
while raw medians move >1.5x.

Usage: python tools/calib_experiment.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from cassandra2aerospike_spark.session import get_spark  # noqa: E402

NAMES = [
    "a1_lww_latest",
    "f1_live_cells",
    "text_quality",
    "topk_global",
    "win_range_frame",
    "dedup_minhash_lsh",
]


def measure(spark, qs, sf_dir: str):
    py_run = bench._py_calib_runner(spark)
    for _ in range(2):
        bench._jvm_calib_run(spark)
        py_run()
    jvm = [bench._jvm_calib_run(spark) for _ in range(3)]
    py = [py_run() for _ in range(3)]
    warm: dict[str, float] = {}
    for n in NAMES:
        qs[n](spark, sf_dir).count()  # warm pass
        s = []
        for _ in range(3):
            t0 = time.time()
            qs[n](spark, sf_dir).count()
            s.append(time.time() - t0)
        warm[n] = round(statistics.median(s), 3)
        # interleave — the r12 bench protocol
        jvm.append(bench._jvm_calib_run(spark))
        py.append(py_run())
    jm, pm = statistics.median(jvm), statistics.median(py)
    factor = round(
        max(jm / bench.CALIBRATION_REF_SEC, pm / bench.PY_CALIBRATION_REF_SEC), 3
    )
    return {
        "warm": warm,
        "factor": factor,
        "jvm_median": round(jm, 3),
        "py_median": round(pm, 3),
        "normalized": {n: round(w / factor, 3) for n, w in warm.items()},
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("calib_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    idle = measure(spark, qs, sf_dir)
    print("# idle:", json.dumps(idle), file=sys.stderr)

    hogs = [
        subprocess.Popen(
            [sys.executable, "-c", "i=3\nwhile True: i = (i * i) % 1000003"],
            stdout=subprocess.DEVNULL,
        )
        for _ in range(32)
    ]
    time.sleep(2)
    try:
        loaded = measure(spark, qs, sf_dir)
    finally:
        for h in hogs:
            h.kill()
    print("# loaded:", json.dumps(loaded), file=sys.stderr)

    raw_ratio = {n: round(loaded["warm"][n] / idle["warm"][n], 2) for n in NAMES}
    norm_ratio = {
        n: round(loaded["normalized"][n] / idle["normalized"][n], 2) for n in NAMES
    }
    out = {
        "idle_factor": idle["factor"],
        "loaded_factor": loaded["factor"],
        "raw_ratio": raw_ratio,
        "raw_ratio_median": round(statistics.median(raw_ratio.values()), 2),
        "normalized_ratio": norm_ratio,
        "normalized_ratio_median": round(
            statistics.median(norm_ratio.values()), 2
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
