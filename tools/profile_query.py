"""Per-query profiler: run one or more declared queries with the Spark
event log enabled, then summarize where the wall-clock went — per job
(with job description / call site), per stage (task time, python worker
time, shuffle bytes), and the uncovered gap (driver-side work between
jobs).

Usage:
    python tools/profile_query.py <query> [<query> ...] [--warm N]

Writes a plain-text report per query to /tmp/profile_<query>.txt and a
one-line summary to stdout.  Measurement-only tooling (guide §1): no
query semantics are touched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def build_spark(log_dir: str):
    os.makedirs(log_dir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    # get_spark reuses an active session, so set event-log confs via the
    # builder BEFORE the factory ever runs
    from pyspark.sql import SparkSession

    from cassandra2aerospike_spark.session import default_parallelism

    n = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("profile")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def parse_event_log(path: str, t_lo_ms: float, t_hi_ms: float):
    """Jobs/stages inside [t_lo_ms, t_hi_ms] with durations + metrics."""
    jobs = {}
    stages = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            t = ev["Submission Time"]
            if t_lo_ms <= t <= t_hi_ms:
                jobs[ev["Job ID"]] = {
                    "start": t,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:120],
                    "callsite": (ev.get("Properties") or {}).get(
                        "callSite.short", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
        elif k == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["end"] = ev["Completion Time"]
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            t = si.get("Submission Time", 0)
            if t_lo_ms <= t <= t_hi_ms:
                stages.setdefault(si["Stage ID"], {}).update(
                    {
                        "name": si.get("Name", "")[:80],
                        "ntasks": si.get("Number of Tasks", 0),
                        "start": t,
                        "end": si.get("Completion Time", t),
                    }
                )
        elif k == "SparkListenerTaskEnd":
            sid = ev.get("Stage ID")
            st = stages.get(sid)
            m = ev.get("Task Metrics") or {}
            if st is None:
                # task may end after StageCompleted parse order; buffer
                stages.setdefault(sid, {}).setdefault("_pending", [])
                st = stages[sid]
            st.setdefault("run_ms", 0)
            st.setdefault("cpu_ms", 0)
            st.setdefault("gc_ms", 0)
            st.setdefault("sh_read", 0)
            st.setdefault("sh_write", 0)
            st.setdefault("input", 0)
            st["run_ms"] += m.get("Executor Run Time", 0)
            st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
            st["gc_ms"] += m.get("JVM GC Time", 0)
            st["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0
            ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            st["sh_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            st["input"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
    return jobs, stages


def profile(spark, name: str, fn, sf_dir: str, log_dir: str, warm: int):
    sc = spark.sparkContext
    # cold pass primes fixtures/JIT so the profiled pass is steady-state
    t0 = time.time()
    fn(spark, sf_dir).count()
    cold = time.time() - t0
    times = []
    t_lo = time.time() * 1000
    for _ in range(max(warm, 1)):
        t0 = time.time()
        fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    t_hi = time.time() * 1000
    # flush the event log
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    app_id = sc.applicationId
    candidates = [
        os.path.join(log_dir, app_id + ".inprogress"),
        os.path.join(log_dir, app_id),
    ]
    # Spark 4 rolling layout: eventlog_v2_<appid>/events_*_<appid>*
    v2 = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        candidates = sorted(
            os.path.join(v2, f)
            for f in os.listdir(v2)
            if f.startswith("events_")
        )
    jobs, stages = {}, {}
    for log_path in candidates:
        if os.path.exists(log_path):
            j, s = parse_event_log(log_path, t_lo, t_hi)
            jobs.update(j)
            stages.update(s)
    wall = sum(times)
    job_total = sum(
        (j.get("end", j["start"]) - j["start"]) / 1000 for j in jobs.values()
    )
    rep = [
        f"=== {name}: cold {cold:.2f}s, {len(times)} warm passes "
        f"total {wall:.2f}s (median {sorted(times)[len(times)//2]:.2f}s)",
        f"jobs in window: {len(jobs)}, sum of job wall {job_total:.2f}s, "
        f"gap (driver/non-job) {wall - job_total:.2f}s",
        "",
        f"{'job':>4} {'dur_s':>7}  {'callsite':<28} {'desc':<60}",
    ]
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("end", j["start"]) - j["start"]) / 1000
        rep.append(
            f"{jid:>4} {dur:>7.2f}  {j['callsite']:<28} {j['desc']:<60}"
        )
    rep.append("")
    rep.append(
        f"{'stage':>5} {'wall_s':>7} {'ntask':>5} {'run_s':>7} {'cpu_s':>7} "
        f"{'gc_s':>5} {'in_MB':>7} {'shR_MB':>7} {'shW_MB':>7}  name"
    )
    for sid in sorted(stages):
        st = stages[sid]
        if "start" not in st:
            continue
        rep.append(
            f"{sid:>5} {(st['end'] - st['start']) / 1000:>7.2f} "
            f"{st.get('ntasks', 0):>5} {st.get('run_ms', 0) / 1000:>7.2f} "
            f"{st.get('cpu_ms', 0) / 1000:>7.2f} "
            f"{st.get('gc_ms', 0) / 1000:>5.2f} "
            f"{st.get('input', 0) / 1e6:>7.1f} "
            f"{st.get('sh_read', 0) / 1e6:>7.1f} "
            f"{st.get('sh_write', 0) / 1e6:>7.1f}  {st.get('name', '')}"
        )
    out = "\n".join(rep)
    with open(f"/tmp/profile_{name}.txt", "w") as fh:
        fh.write(out + "\n")
    print(
        f"{name}: cold {cold:.2f}s warm {wall / len(times):.2f}s "
        f"jobs {len(jobs)} job_wall {job_total / len(times):.2f}s/pass "
        f"gap {(wall - job_total) / len(times):.2f}s/pass "
        f"-> /tmp/profile_{name}.txt"
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    warm = 1
    for a in sys.argv[1:]:
        if a.startswith("--warm"):
            warm = int(a.split("=", 1)[1]) if "=" in a else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = "/tmp/spark_graft_eventlog"
    spark = build_spark(log_dir)
    qs = entrymod.queries()
    for name in args:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        profile(spark, name, qs[name], sf_dir, log_dir, warm)


if __name__ == "__main__":
    main()
