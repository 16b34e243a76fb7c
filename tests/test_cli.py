"""CLI surface (the reference binary's flag set, __main__.py): dry run,
create-only sink with accounting, resume-from-token pushdown, checksum
toggle, expiry-fold mode."""

from __future__ import annotations

import shutil

import pytest

from cassandra2aerospike_spark.__main__ import main


@pytest.fixture(scope="module")
def runs_dir(spark, sf_dir):
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_runs_from_events,
        default_runs_dir,
    )

    return build_runs_from_events(spark, sf_dir, default_runs_dir(sf_dir))


NOW = ["--now", "1719792000"]  # merge.NOW_EPOCH_S: deterministic expiry


def test_cli_dry_run_prints_records(runs_dir, capsys):
    assert main(["-i", runs_dir, "-D", "--limit", "5"] + NOW) == 0
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[-1].startswith("# dry run: showed 5")
    assert sum(1 for l in lines if l.startswith("key=")) == 5
    # reference format: indented name=value cells under each key line
    assert any(l.startswith("  ") and "=" in l for l in lines)


def test_cli_sink_create_only_idempotent(runs_dir, tmp_path, capsys):
    out_dir = str(tmp_path / "kv")
    shutil.rmtree(out_dir, ignore_errors=True)
    assert main(["-i", runs_dir, "-o", out_dir] + NOW) == 0
    first = capsys.readouterr().out
    assert "written: " in first and "already existing: 0" in first
    assert "# resume hint: --token " in first
    # replay: exists=CREATE semantics -> nothing written twice
    assert main(["-i", runs_dir, "-o", out_dir] + NOW) == 0
    second = capsys.readouterr().out
    assert "written: 0" in second


def test_cli_resume_token_filters(runs_dir, capsys):
    assert main(["-i", runs_dir, "-D", "--limit", "1000"] + NOW) == 0
    n_all = sum(
        1 for l in capsys.readouterr().out.splitlines() if l.startswith("key=")
    )
    assert main(["-i", runs_dir, "-D", "--limit", "1000", "--token", "0"] + NOW) == 0
    n_half = sum(
        1 for l in capsys.readouterr().out.splitlines() if l.startswith("key=")
    )
    assert 0 < n_half < n_all  # roughly the upper half of the md5 token ring


def test_cli_multi_dir_union(runs_dir, spark, tmp_path, capsys):
    """Multiple -i dirs union into one merge (the reference accepts many
    input directories, CassandraParser.cpp:83-175): splitting the same
    runs across two dirs must produce the same records as one dir."""
    import os
    import shutil

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(d1), os.makedirs(d2)
    for f in os.listdir(runs_dir):
        if f.startswith("_"):
            continue
        gen = int(f.split("-")[0])
        shutil.copy(os.path.join(runs_dir, f), os.path.join(d1 if gen == 1 else d2, f))
    assert main(["-i", runs_dir, "-D", "--limit", "1000"] + NOW) == 0
    single = capsys.readouterr().out
    assert main(["-i", d1, "-i", d2, "-D", "--limit", "1000"] + NOW) == 0
    multi = capsys.readouterr().out
    assert single == multi


def test_cli_first_expiring_and_no_checksums(runs_dir, capsys):
    assert main(["-i", runs_dir, "-D", "-f", "-C", "--limit", "3"] + NOW) == 0
    out = capsys.readouterr().out
    assert sum(1 for l in out.splitlines() if l.startswith("key=")) == 3


def test_cli_prohibit_eternal_ttl_policy(runs_dir, tmp_path, capsys):
    """-x (F4): eternal records write the namespace-default TTL sentinel
    instead of never-expire (Cassandra2Aerospike.cpp:165-167)."""
    from pyspark.sql import SparkSession

    out_x = str(tmp_path / "kvx")
    out_d = str(tmp_path / "kvd")
    assert main(["-i", runs_dir, "-o", out_x, "-x"] + NOW) == 0
    assert main(["-i", runs_dir, "-o", out_d] + NOW) == 0
    capsys.readouterr()
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    px = {r.key: r.write_ttl for r in spark.read.parquet(out_x).collect()}
    pd_ = {r.key: r.write_ttl for r in spark.read.parquet(out_d).collect()}
    exp = {r.key: r.expiry for r in spark.read.parquet(out_d).collect()}
    assert px.keys() == pd_.keys()
    eternal = [k for k, e in exp.items() if e == 4294967295]
    assert eternal, "fixture must contain eternal records"
    for k in px:
        if k in eternal:
            assert px[k] == 0 and pd_[k] == -1
        else:
            assert px[k] == pd_[k] == exp[k] - 1719792000
    # dry run marks eternal records under -x
    assert main(["-i", runs_dir, "-D", "-x", "--limit", "200"] + NOW) == 0
    out = capsys.readouterr().out
    assert "(ttl=default)" in out


def test_bounded_writer_requeues_within_window():
    """S12: a failed wait requeues the SAME row; the in-flight window is
    never breached even on the requeue path (the bug the driver row
    caught: `if` instead of `while` on the drain)."""
    from pyspark.sql import SparkSession

    from cassandra2aerospike_spark.sinks import bounded_async_foreach_writer

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    df = spark.range(0, 200, 1, 2).withColumnRenamed("id", "key").coalesce(1)
    sc = spark.sparkContext
    n_done = sc.accumulator(0)
    n_retry_put = sc.accumulator(0)
    n_viol = sc.accumulator(0)
    # per-task state: the closure is pickled fresh into the worker
    state = {"open": 0}
    attempts: dict = {}

    def put(rd):
        state["open"] += 1
        if state["open"] > 4:
            n_viol.add(1)
        a = attempts.get(rd["key"], 0)
        attempts[rd["key"]] = a + 1
        if a > 0:
            n_retry_put.add(1)
        return (rd["key"], a)

    def wait(h):
        k, a = h
        state["open"] -= 1
        if a < 2 and k % 3 == 0:
            return False  # fail first TWO attempts of every 3rd key
        n_done.add(1)
        return True

    bounded_async_foreach_writer(df, put, wait, max_in_flight=4, max_retries=3)
    # every key eventually succeeded, the window never exceeded 4, and
    # every 3rd key was requeued exactly twice
    assert n_done.value == 200
    assert n_viol.value == 0
    assert n_retry_put.value == 2 * len([k for k in range(200) if k % 3 == 0])


def test_bounded_writer_exhausted_retries_raises():
    from pyspark.sql import SparkSession

    from cassandra2aerospike_spark.sinks import bounded_async_foreach_writer

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    df = spark.range(0, 10, 1, 1).withColumnRenamed("id", "key")

    def put(rd):
        return rd["key"]

    def wait(h):
        return h != 5  # key 5 fails every attempt

    import pytest as _pytest

    with _pytest.raises(Exception, match="retries exhausted"):
        bounded_async_foreach_writer(df, put, wait, max_in_flight=4, max_retries=2)


def test_apply_ttl_policy_unit(spark):
    from cassandra2aerospike_spark.operators.merge import (
        ETERNAL,
        TTL_NAMESPACE_DEFAULT,
        TTL_NO_EXPIRE,
        apply_ttl_policy,
    )

    df = spark.createDataFrame(
        [(1, ETERNAL), (2, 1719792000 + 500)], "key long, expiry long"
    )
    d = {r.key: r.write_ttl for r in apply_ttl_policy(df, now_s=1719792000).collect()}
    assert d == {1: TTL_NO_EXPIRE, 2: 500}
    x = {
        r.key: r.write_ttl
        for r in apply_ttl_policy(df, now_s=1719792000, prohibit_eternal=True).collect()
    }
    assert x == {1: TTL_NAMESPACE_DEFAULT, 2: 500}


def test_cli_mixed_era_dir_equals_modern(runs_dir, spark, sf_dir, capsys):
    """End-to-end era-independence: a directory mixing SGRA (snappy,
    composite names, after-decompress CRC32), SGR0 (Adler32) and SGR1
    must dry-run print EXACTLY what the all-modern directory prints."""
    from cassandra2aerospike_spark.sources.sstable.fixtures import (
        build_runs_from_events,
        default_runs_dir,
    )

    mixed = build_runs_from_events(
        spark, sf_dir, default_runs_dir(sf_dir) + "_mixedfmt",
        old_format_runs=2, codecs=("snappy", "deflate", "deflate"),
        composite_old_names=True,
    )
    assert main(["-i", runs_dir, "-D", "--limit", "1000"] + NOW) == 0
    modern = capsys.readouterr().out
    assert main(["-i", mixed, "-D", "--limit", "1000"] + NOW) == 0
    assert capsys.readouterr().out == modern


def test_cli_reference_flag_surface(runs_dir, tmp_path, capsys):
    """A migrating reference invocation — hosts, namespace, set, async
    window, credentials — must run, not crash: with BOTH -h and -o, the
    explicit parquet sink (-o) wins and -n/-t namespace its path; -u/-p
    warn (auth unused); -v prints a version.  (-h WITHOUT -o drives the
    real wire client — test_cli_aerospike_wire_host_flag.)"""
    import os

    assert main(["-v"]) == 0
    assert "spark-graft" in capsys.readouterr().out
    out_dir = str(tmp_path / "kvns")
    rc = main([
        "-i", runs_dir, "-h", "10.0.0.1:3000", "-h", "10.0.0.2",
        "-n", "prod", "-t", "events", "-a", "100", "-u", "svc", "-p", "pw",
        "-o", out_dir,
    ] + NOW)
    assert rc == 0
    err_plus_out = capsys.readouterr()
    assert os.path.isdir(os.path.join(out_dir, "prod", "events"))
    assert "-o wins" in err_plus_out.err and "auth" in err_plus_out.err


def test_cli_resume_raw_key_matches_hex(runs_dir, capsys):
    """-s KEY (reference firstKey semantics: raw key string hashed to its
    token) must resume at the same point as -S with the key's hex."""
    key = "42"
    assert main(["-i", runs_dir, "-D", "--limit", "1000", "-s", key] + NOW) == 0
    raw_out = capsys.readouterr().out
    # an all-digit -s prints an advisory note (old hints were raw tokens);
    # the note must appear but not change the records printed
    assert "# note: -s now takes a key string" in raw_out
    via_raw = "\n".join(
        ln for ln in raw_out.splitlines() if not ln.startswith("# note:")
    )
    assert main(
        ["-i", runs_dir, "-D", "--limit", "1000", "-S", key.encode().hex()] + NOW
    ) == 0
    assert capsys.readouterr().out.rstrip("\n") == via_raw.rstrip("\n")
    assert "key=" in via_raw


def test_cli_aerospike_wire_host_flag(runs_dir, capsys):
    """Reference-flag parity over the REAL protocol (round 9): `-h
    host:port -n ns -t set -a window` drives merged records from
    executor tasks through the pipelined wire client into an
    in-process protocol server; a replay draws KEY_EXISTS for every
    record (not-an-error accounting, AerospikeWriter.cpp:142-148); the
    stored ttls follow write_ttl (never-expire for eternal records)."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import WireServer

    srv = WireServer()
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{srv.port}",
            "-n", "tmx", "-t", "recs", "-a", "16",
        ] + NOW
        assert main(argv) == 0
        first = capsys.readouterr().out
        assert "already existing: 0" in first
        assert "# resume hint: --token " in first
        store = srv.records()
        n_written = int(first.split("written: ")[1].split()[0])
        assert n_written == len(store) > 0
        assert all(k[0] == "tmx" and k[1] == "recs" for k in store)
        ttls = {ttl for _bins, ttl in store.values()}
        assert 0xFFFFFFFF in ttls  # eternal records -> never-expire
        # replay: create-only, everything already exists
        assert main(argv) == 0
        second = capsys.readouterr().out
        assert "written: 0" in second
        assert f"already existing: {len(store)}" in second
        assert srv.records() == store
    finally:
        srv.close()


def test_cli_asof_time_travel(runs_dir, spark, sf_dir, capsys):
    """--asof T: the CLI's point-in-time run must equal q_s30_asof_merge
    on the same directory — same T expression, same alive-at-T expiry —
    and an explicit --now alongside --asof is refused (asof pins now)."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.queries.merge_q import (
        _classified_staged,
        _events,
        _snapshot_at,
    )

    bounds = _events(spark, sf_dir).agg(
        F.expr("(min(ts_us) + max(ts_us)) div 2").alias("asof_us")
    )
    asof_us = bounds.collect()[0][0]
    expected = {
        r.key
        for r in _snapshot_at(_classified_staged(spark, sf_dir), bounds)
        .select("key")
        .collect()
    }

    assert (
        main(["-i", runs_dir, "-D", "--limit", "1000", "--asof", str(asof_us)])
        == 0
    )
    out = capsys.readouterr().out
    got = {
        int(bytes.fromhex(line.split("=", 1)[1].split(" ", 1)[0]).decode())
        for line in out.splitlines()
        if line.startswith("key=")
    }
    assert got == expected

    with pytest.raises(SystemExit):
        main(
            ["-i", runs_dir, "-D", "--asof", str(asof_us), "--now", "1719792000"]
        )


def test_cli_since_incremental_ship_set(runs_dir, spark, sf_dir, capsys):
    """--since T: the shipped set is exactly the records whose newest
    surviving write is after T — --since 0 ships everything, --since
    max_ts ships nothing, and the mid-point ship set matches the
    events-derived expectation."""
    from pyspark.sql import functions as F

    from cassandra2aerospike_spark.queries.merge_q import _events

    lo, hi = (
        _events(spark, sf_dir)
        .agg(F.min("ts_us"), F.max("ts_us"))
        .collect()[0]
    )
    mid = (lo + hi) // 2

    def keys_for(since):
        assert (
            main(["-i", runs_dir, "-D", "--limit", "100000",
                  "--since", str(since)] + NOW)
            == 0
        )
        out = capsys.readouterr().out
        return {
            int(bytes.fromhex(line.split("=", 1)[1].split(" ", 1)[0]).decode())
            for line in out.splitlines()
            if line.startswith("key=")
        }

    all_keys = keys_for(0)
    assert len(all_keys) > 0
    assert keys_for(hi) == set()
    mid_keys = keys_for(mid)
    assert set() < mid_keys <= all_keys


def test_cli_since_ships_tombstone_only_update(tmp_path, spark, capsys):
    """Round-11 advice fix: a record whose ONLY post-T event is a point
    tombstone (every surviving cell older than T) has still CHANGED
    since T — its column set shrank — so --since T must ship it.  The
    incremental cursor is max(ts) over ALL classified events, not over
    surviving cells only (the old cursor silently skipped these)."""
    from cassandra2aerospike_spark.sources.sstable.format import (
        Cell,
        Partition,
        RunWriter,
    )

    d = str(tmp_path / "runs")
    w = RunWriter(d, 1)
    w.add(
        Partition(
            key=b"42",
            cells=[
                Cell("colA", b"1.00", ts=100),
                Cell("colB", b"2.00", ts=100),
                # colB deleted AFTER the --since cursor; colA (the only
                # survivor) predates it
                Cell("colB", ts=500, deleted=True),
            ],
        )
    )
    w.finish()
    assert main(["-i", d, "-D", "--limit", "10", "--since", "300"] + NOW) == 0
    out = capsys.readouterr().out
    assert ("key=" + b"42".hex()) in out  # ships: newest event ts=500 > 300
    cells = [l.strip() for l in out.splitlines() if l.startswith("  ")]
    assert cells == ["colA=1.00"]  # ...without the deleted column
    # and a cursor PAST the tombstone still ships nothing
    assert main(["-i", d, "-D", "--limit", "10", "--since", "500"] + NOW) == 0
    assert "key=" not in capsys.readouterr().out


def test_cli_wire_auth_flags(runs_dir, capsys):
    """-u/-p (round 11): against a security-enabled server the CLI's
    wire path LOGINs (bcrypt credential over the admin channel) before
    any put; with the wrong password the job fails the handshake."""
    import pytest

    from cassandra2aerospike_spark.sinks.aerospike_wire import WireServer

    # the CLI hashes with the client-constant salt (cost 10); the
    # server must hold the same constant's hash for the compare
    srv_real = WireServer(credentials=("svc", "hunter2"))
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{srv_real.port}",
            "-n", "tmx", "-t", "recs",
            "-u", "svc", "-p", "hunter2",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert "written: " in out
        assert len(srv_real.records()) > 0
        # wrong password: the handshake refuses and the job errors
        bad = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{srv_real.port}",
            "-n", "tmx", "-t", "recs",
            "-u", "svc", "-p", "nope",
        ] + NOW
        with pytest.raises(Exception, match="security handshake refused"):
            main(bad)
    finally:
        srv_real.close()


def test_cli_wire_verify_flag(runs_dir, capsys):
    """--verify (round 11): after the wire sink pass the CLI reads every
    record back over the wire and compares bins + ttl; a clean run
    reports zero mismatches and exits 0, a server whose stored state
    was tampered with exits 1."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import WireServer

    srv = WireServer()
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{srv.port}",
            "-n", "tmx", "-t", "recs", "--verify",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert "mismatches" in out and " 0 mismatches" in out
        n = len(srv.records())
        assert f"# verify: {n} records match" in out
        # tamper with one stored record server-side: verify must fail
        with srv._lock:
            k = next(iter(srv._store))
            bins, ttl = srv._store[k]
            srv._store[k] = ({**bins, "tampered": b"x"}, ttl)
        assert main(argv) == 1
        out2 = capsys.readouterr().out
        assert " 1 mismatches" in out2 or "1 mismatches" in out2
    finally:
        srv.close()


def test_cli_wire_cluster_hosts(runs_dir, capsys):
    """Several -h hosts (round 11): the CLI discovers each node's
    mastered slice over the info channel and routes puts by digest
    partition — every record lands on exactly the node that owns its
    partition (nodes refuse misroutes, so a routing bug fails the run);
    --verify then proves the cluster state record-for-record."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
        partition_id,
    )

    servers = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 2 == i},
            info_namespace="tmx",
        )
        for i in range(2)
    ]
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{servers[0].port}",
            "-h", f"127.0.0.1:{servers[1].port}",
            "-n", "tmx", "-t", "recs", "--verify",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert " 0 mismatches" in out
        per_node = [srv.records() for srv in servers]
        assert all(per_node), "both nodes must hold records"
        for i, store in enumerate(per_node):
            for (_ns, _st, digest) in store:
                assert partition_id(digest) % 2 == i  # landed on its owner
        # replay: create-only across the cluster
        assert main(argv) == 0
        assert "written: 0" in capsys.readouterr().out
    finally:
        for srv in servers:
            srv.close()


def test_cli_cluster_retend_and_verify_failover(runs_dir, capsys):
    """Round 12: the CLI cluster survives LIVE handoffs on BOTH paths.
    Mid-WRITE, node 0's whole slice (ownership + data) migrates to
    node 1 — stale-routed puts draw UNAVAILABLE, the per-task router
    re-tends and the requeued puts land on the new owner.  Mid-VERIFY,
    node 1 hands the same slice on to node 2 — pipelined gets on the
    stale connection raise WireUnavailable and the redeem falls back
    (re-tend -> new master).  Exit 0, zero mismatches, and the slice's
    records end up exactly on node 2."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
        partition_id,
    )

    slice0 = {p for p in range(N_PARTITIONS) if p % 3 == 0}
    servers = []

    def on_put(n):
        if n == 2:  # node 0's 2nd applied put: hand everything to node 1
            servers[0].handoff(servers[1], slice0)

    def on_get(n):
        if n == 3:  # node 1's 3rd served get: hand the slice on to node 2
            servers[1].handoff(servers[2], slice0)

    servers.append(
        WireServer(
            owned_partitions=slice0, on_put=on_put, info_namespace="tmx"
        )
    )
    servers.append(
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 3 == 1},
            on_get=on_get,
            info_namespace="tmx",
        )
    )
    servers.append(
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 3 == 2},
            info_namespace="tmx",
        )
    )
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{servers[0].port}",
            "-h", f"127.0.0.1:{servers[1].port}",
            "-h", f"127.0.0.1:{servers[2].port}",
            "-n", "tmx", "-t", "recs", "--verify",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert " 0 mismatches" in out
        # the handed-off slice lives exactly on node 2 now
        assert not servers[0].records(), "node 0 must be empty post-handoff"
        for (_ns, _st, digest) in servers[1].records():
            assert partition_id(digest) % 3 == 1
        n2_pids = {
            partition_id(d) % 3 for (_, _, d) in servers[2].records()
        }
        assert n2_pids == {0, 2}, n2_pids
        total = sum(len(s.records()) for s in servers)
        assert f"# verify: {total} records match" in out
    finally:
        for srv in servers:
            srv.close()


def test_cli_backup_restore_roundtrip(runs_dir, tmp_path, capsys):
    """Round 13: the asbackup/asrestore job shapes.  Populate a 3-node
    cluster through the normal wire-sink path, `--backup` it into a
    keyless .asb series, `--restore` into a FRESH 2-node cluster (a
    different layout — the digest-addressed records must route by the
    target's own map), `--verify` compares digest+bins+ttl, and the
    two clusters end bin-for-bin identical."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
    )

    src = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 3 == i},
            info_namespace="tmx",
        )
        for i in range(3)
    ]
    dst = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 2 == i},
            info_namespace="tmx",
        )
        for i in range(2)
    ]
    bdir = str(tmp_path / "asb_backup")
    try:
        hosts_src = [x for s in src for x in ("-h", f"127.0.0.1:{s.port}")]
        hosts_dst = [x for s in dst for x in ("-h", f"127.0.0.1:{s.port}")]
        # populate the source cluster through the ordinary sink path
        assert main(["-i", runs_dir, "-n", "tmx", "-t", "recs"] + hosts_src + NOW) == 0
        n_src = sum(len(s.records()) for s in src)
        assert n_src > 0
        # backup: no -i, generation-checked sweep -> .asb
        assert main(hosts_src + ["-n", "tmx", "-t", "recs", "--backup", bdir] + NOW) == 0
        out = capsys.readouterr().out
        assert f"# backup: {n_src} records" in out
        # restore into the differently-shaped cluster + verify
        assert (
            main(
                hosts_dst
                + ["-n", "tmx", "-t", "recs", "--restore", bdir, "--verify"]
                + NOW
            )
            == 0
        )
        out = capsys.readouterr().out
        assert f"# restore: {n_src} records written, 0 already existing" in out
        assert f"# verify: {n_src} records match the backup, 0 mismatches" in out
        # bin-for-bin identity across the two clusters
        def store(servers):
            merged = {}
            for s in servers:
                merged.update(s.records())
            return merged

        assert store(src) == store(dst)
        # a SECOND restore is idempotent (create-only: all 'exists')
        assert main(hosts_dst + ["-n", "tmx", "-t", "recs", "--restore", bdir] + NOW) == 0
        out = capsys.readouterr().out
        assert f"# restore: 0 records written, {n_src} already existing" in out
        # flag hygiene: no hosts -> argparse error
        with pytest.raises(SystemExit):
            main(["--backup", bdir])
    finally:
        for s in src + dst:
            s.close()


def test_cli_batch_verify_single_and_cluster(runs_dir, capsys):
    """--batch-verify (round 13): the read-back rides the wire
    BATCH-INDEX op — zero single gets are ever issued; on a cluster the
    digests split per master node (batch-node split), and tampering
    with a stored record still exits 1."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
    )

    # single host: implies --verify, batches only
    srv = WireServer()
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{srv.port}",
            "-n", "tmx", "-t", "recs", "--batch-verify",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert " 0 mismatches" in out
        n = len(srv.records())
        assert f"# verify: {n} records match" in out
        assert srv._gets == 0, "batch verify degraded to single gets"
        assert srv._batches > 0
        with srv._lock:
            k = next(iter(srv._store))
            bins, ttl = srv._store[k]
            srv._store[k] = ({**bins, "tampered": b"x"}, ttl)
        assert main(argv) == 1
        assert "1 mismatches" in capsys.readouterr().out
    finally:
        srv.close()

    # cluster: per-node batches, still zero single gets
    servers = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 2 == i},
            info_namespace="tmx",
        )
        for i in range(2)
    ]
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{servers[0].port}",
            "-h", f"127.0.0.1:{servers[1].port}",
            "-n", "tmx", "-t", "recs", "--batch-verify",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert " 0 mismatches" in out
        assert all(srv._gets == 0 for srv in servers)
        assert all(srv._batches > 0 for srv in servers)
    finally:
        for srv in servers:
            srv.close()


def test_cli_compress_flag_ships_envelopes(runs_dir, capsys):
    """--compress (round 13): the sink's data frames cross the socket
    inside the compressed proto envelope — the server counts the
    arrivals; the stored state and --verify outcome are identical to a
    plain-wire run."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import WireServer

    plain, comp = WireServer(), WireServer()
    try:
        base = ["-i", runs_dir, "-n", "tmx", "-t", "recs", "--verify"] + NOW
        assert main(base + ["-h", f"127.0.0.1:{plain.port}"]) == 0
        assert (
            main(base + ["-h", f"127.0.0.1:{comp.port}", "--compress"]) == 0
        )
        out = capsys.readouterr().out
        assert " 0 mismatches" in out
        assert plain._envelopes == 0
        # frames above the 128 B floor arrived deflated (small records
        # stay plain — the real client's size-floor behavior)
        assert comp._envelopes > 0
        assert comp.records() == plain.records()
    finally:
        plain.close()
        comp.close()


def test_cli_filtered_partial_backup(runs_dir, tmp_path, capsys):
    """Round 14: `--backup --filter 'bin exists'` — the server-side
    expression filter prunes the sweep, so the .asb holds ONLY the
    matching slice; restore + verify into a fresh cluster round-trips
    exactly that slice."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
    )

    src = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 3 == i},
            info_namespace="tmx",
        )
        for i in range(3)
    ]
    dst = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 2 == i},
            info_namespace="tmx",
        )
        for i in range(2)
    ]
    bdir = str(tmp_path / "asb_partial")
    try:
        hosts_src = [x for s in src for x in ("-h", f"127.0.0.1:{s.port}")]
        hosts_dst = [x for s in dst for x in ("-h", f"127.0.0.1:{s.port}")]
        assert main(["-i", runs_dir, "-n", "tmx", "-t", "recs"] + hosts_src + NOW) == 0
        store = {}
        for s in src:
            store.update(s.records())
        target = min(n for bins, _ttl in store.values() for n in bins)
        n_match = sum(1 for bins, _ttl in store.values() if target in bins)
        n_all = len(store)
        assert 0 < n_match < n_all
        assert (
            main(
                hosts_src
                + ["-n", "tmx", "-t", "recs", "--backup", bdir,
                   "--filter", f"{target} exists"]
                + NOW
            )
            == 0
        )
        out = capsys.readouterr().out
        assert f"# backup: {n_match} records" in out
        assert (
            main(
                hosts_dst
                + ["-n", "tmx", "-t", "recs", "--restore", bdir, "--verify"]
                + NOW
            )
            == 0
        )
        out = capsys.readouterr().out
        assert f"# restore: {n_match} records written" in out
        assert f"# verify: {n_match} records match the backup, 0 mismatches" in out
        dstore = {}
        for s in dst:
            dstore.update(s.records())
        assert len(dstore) == n_match
        assert all(target in bins for bins, _ttl in dstore.values())
    finally:
        for s in src + dst:
            s.close()


def test_cli_filter_predicate_grammar():
    from cassandra2aerospike_spark.__main__ import parse_filter_predicate

    assert parse_filter_predicate(None) is None
    assert parse_filter_predicate("nc>=2") == (
        "cmp", "ge", ("bin_int", "nc"), ("int", 2)
    )
    assert parse_filter_predicate("nc<=9") == (
        "cmp", "le", ("bin_int", "nc"), ("int", 9)
    )
    assert parse_filter_predicate("grp==even") == (
        "cmp", "eq", ("bin_blob", "grp"), ("blob", b"even")
    )
    assert parse_filter_predicate("flag exists") == (
        "cmp", "ne", ("bin_type", "flag"), ("int", 0)
    )
    import pytest

    with pytest.raises(SystemExit):
        parse_filter_predicate("nc >> 3")
    with pytest.raises(SystemExit):
        parse_filter_predicate("nc>=abc")


def test_cli_batch_write_sink(runs_dir, capsys):
    """--batch-write (round 15): the wire sink rides per-record
    CREATE-only sub-transactions batched by master node — identical
    final cluster state and accounting to the put path (same records,
    same owners, replay writes nothing), but ZERO single puts ever
    issued and batch requests bounded by tasks x nodes x chunks."""
    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
        partition_id,
    )

    servers = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 2 == i},
            info_namespace="tmx",
        )
        for i in range(2)
    ]
    try:
        argv = [
            "-i", runs_dir,
            "-h", f"127.0.0.1:{servers[0].port}",
            "-h", f"127.0.0.1:{servers[1].port}",
            "-n", "tmx", "-t", "recs", "--batch-write", "--verify",
        ] + NOW
        assert main(argv) == 0
        out = capsys.readouterr().out
        assert " 0 mismatches" in out
        assert all(srv._puts == 0 for srv in servers), "degraded to single puts"
        assert all(srv._batch_writes >= 1 for srv in servers)
        per_node = [srv.records() for srv in servers]
        assert all(per_node), "both nodes must hold records"
        for i, store in enumerate(per_node):
            for (_ns, _st, digest) in store:
                assert partition_id(digest) % 2 == i
        # replay: per-record 'exists' -> create-only idempotence holds
        assert main(argv) == 0
        assert "written: 0" in capsys.readouterr().out
        # single-host batch path: one node owning everything
        single = WireServer(info_namespace="tmx")
        try:
            argv1 = [
                "-i", runs_dir, "-h", f"127.0.0.1:{single.port}",
                "-n", "tmx", "-t", "recs", "--batch-write",
            ] + NOW
            assert main(argv1) == 0
            assert "written: " in capsys.readouterr().out
            assert single._puts == 0 and single._batch_writes >= 1
            assert len(single.records()) == sum(len(s) for s in per_node)
        finally:
            single.close()
    finally:
        for srv in servers:
            srv.close()


def test_cli_paged_backup(runs_dir, tmp_path, capsys):
    """Round 16: --page-records pages the backup sweep with the
    digest-cursor resume — the backup output is byte-identical to the
    unbounded sweep's, and the scan-request count shows pagination
    actually engaged (more scan requests than ranges x nodes)."""
    import os

    from cassandra2aerospike_spark.sinks.aerospike_wire import (
        N_PARTITIONS,
        WireServer,
    )

    src = [
        WireServer(
            owned_partitions={p for p in range(N_PARTITIONS) if p % 3 == i},
            info_namespace="tmx",
        )
        for i in range(3)
    ]
    try:
        hosts = [x for s in src for x in ("-h", f"127.0.0.1:{s.port}")]
        assert main(["-i", runs_dir, "-n", "tmx", "-t", "recs"] + hosts + NOW) == 0
        n_src = sum(len(s.records()) for s in src)
        assert n_src > 0
        plain, paged = str(tmp_path / "plain"), str(tmp_path / "paged")
        s0 = sum(s._scans for s in src)
        assert main(hosts + ["-n", "tmx", "-t", "recs", "--backup", plain] + NOW) == 0
        s1 = sum(s._scans for s in src)
        assert (
            main(
                hosts
                + ["-n", "tmx", "-t", "recs", "--backup", paged,
                   "--page-records", "1"]
                + NOW
            )
            == 0
        )
        s2 = sum(s._scans for s in src)
        out = capsys.readouterr().out
        assert out.count(f"# backup: {n_src} records") == 2
        # pagination engaged: every record costs one extra page request
        # at page size 1, so the paged sweep issues strictly more scan
        # requests than the unbounded one
        assert s2 - s1 == (s1 - s0) + n_src
        # identical backup CONTENT (part-file names carry Spark task
        # UUIDs; the record lines are the contract)
        def series_lines(d):
            lines = []
            for f in os.listdir(d):
                if f.startswith(("_", ".")) or not f.endswith(".txt"):
                    continue
                with open(os.path.join(d, f)) as fh:
                    lines.extend(fh.read().splitlines())
            return sorted(lines)

        assert series_lines(plain) == series_lines(paged)
    finally:
        for s in src:
            s.close()
