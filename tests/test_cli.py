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
    assert "# resume hint: -s " in first
    # replay: exists=CREATE semantics -> nothing written twice
    assert main(["-i", runs_dir, "-o", out_dir] + NOW) == 0
    second = capsys.readouterr().out
    assert "written: 0" in second


def test_cli_resume_token_filters(runs_dir, capsys):
    assert main(["-i", runs_dir, "-D", "--limit", "1000"] + NOW) == 0
    n_all = sum(
        1 for l in capsys.readouterr().out.splitlines() if l.startswith("key=")
    )
    assert main(["-i", runs_dir, "-D", "--limit", "1000", "-s", "0"] + NOW) == 0
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
