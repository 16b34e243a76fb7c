"""Local replica of the driver's correctness gate — driver-strict.

Runs every ``queries()[name]`` from __spark_entry__.py against the matching
``oracle_sql()[name]`` in DuckDB at a given sf dir, comparing row count,
column names, and a TYPED canonical form of every cell (order-insensitive).

Unlike the round-1/2 version, values are NOT stringified before compare:
the driver hashes typed values, so an int64 column vs a DuckDB HUGEINT
(float64 in pandas), or a DATE vs a session-TZ TIMESTAMP, must FAIL here
exactly as it fails the driver.  Each cell is mapped to a (type-tag, value)
tuple — numeric kind, date-vs-timestamp, and timestamp instants survive.

``--tz=Zone`` runs the Spark side under a hostile (non-UTC) session
timezone, simulating a driver that does not pin spark.sql.session.timeZone.
Any query whose output depends on the session zone fails under --tz even if
it passes bare.

Usage:

    python tools/check_oracle.py [--tz=America/New_York] [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import struct
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v):
    """Map a cell to a (type-tag, canonical-value) tuple.

    The tag preserves every distinction the driver's typed hash sees:
    int vs float vs decimal, date vs timestamp, tz-aware offsets, bytes.
    Tuples are totally ordered (same tag => same value type), so rows of
    canon cells can be sorted for order-insensitive compare.
    """
    if v is None:
        return ("null",)
    if isinstance(v, float) and math.isnan(v):
        return ("null",)
    if isinstance(v, np.floating):
        fv = float(v)
        if math.isnan(fv):
            return ("null",)
        return ("float", struct.pack(">d", fv).hex())
    if isinstance(v, float):
        return ("float", struct.pack(">d", v).hex())
    if isinstance(v, (bool, np.bool_)):
        return ("bool", "T" if v else "F")
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, decimal.Decimal):
        if v.is_nan():
            return ("null",)
        return ("decimal", str(v.normalize()))
    if v is pd.NaT:
        return ("null",)
    # DATE and TIMESTAMP carry DISTINCT tags: DuckDB results are fetched
    # via Arrow (date32 -> datetime.date objects, like Spark's toPandas),
    # so a Spark DATE vs an oracle TIMESTAMP (or vice versa) fails here
    # the way the driver's typed hash fails it.  A session-TZ shift also
    # fails (different instant / local rendering), and tz-aware offsets
    # stay in the canonical string.
    if isinstance(v, pd.Timestamp):
        return ("datetime", v.isoformat())
    if isinstance(v, np.datetime64):
        if np.isnat(v):
            return ("null",)
        return ("datetime", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.datetime):  # must precede the date check
        return ("datetime", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, datetime.timedelta):
        return ("interval", str(v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(canon_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((str(k), canon_cell(x)) for k, x in v.items())))
    return ("obj:" + type(v).__name__, str(v))


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, every cell canon'd, rows sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    cols = []
    for c in df.columns:
        s = df[c]
        # Keep datetime64 columns as pd.Timestamp objects (not via .values,
        # which would reinterpret tz-aware as naive UTC differently).
        cols.append(list(s))
    rows = [tuple(canon_cell(v) for v in row) for row in zip(*cols)] if cols else []
    rows.sort()
    return rows


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pd) != len(duck_pd):
        errs.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        errs.append(
            f"columns spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
        )
        return errs
    if errs:
        return errs
    a, b = canon_rows(spark_pd), canon_rows(duck_pd)
    if a != b:
        colnames = sorted(spark_pd.columns)
        n_bad = 0
        first = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                n_bad += 1
                if first is None:
                    for cn, ca, cb in zip(colnames, ra, rb):
                        if ca != cb:
                            first = f"row {i} col {cn}: spark={ca!r} duck={cb!r}"
                            break
        errs.append(f"typed-value mismatch ({n_bad} rows differ); first: {first}")
    return errs


def main() -> int:
    argv = sys.argv[1:]
    tz = None
    rest = []
    for a in argv:
        if a.startswith("--tz="):
            tz = a.split("=", 1)[1]
        else:
            rest.append(a)
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    only = set(rest[1:])
    import __spark_entry__ as entrymod
    from cassandra2aerospike_spark.session import get_spark

    spark = get_spark("check_oracle")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
        print(f"# hostile session timezone: {tz}")
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if tz:
                # re-assert the hostile zone AFTER query building: every
                # query's load_table pins the session to UTC while the
                # plan is built, so without this the hostile zone would
                # never be in effect at EXECUTION time (spark.conf wins
                # at action, not at plan construction) and --tz would be
                # a no-op
                spark.conf.set("spark.sql.session.timeZone", tz)
            spark_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            # Arrow fetch (not fetchdf): preserves date32 as datetime.date
            # so the date-vs-timestamp tag distinction survives
            duck_pd = con.execute(oracles[name]).arrow().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        errs = compare(name, spark_pd, duck_pd)
        if errs:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"OK   {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s)")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {n_fail} failures / {len(qs)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
