"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` from __spark_entry__.py against the matching
``oracle_sql()[name]`` in DuckDB at a given sf dir, comparing row count,
column names, and order-insensitive values.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
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


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            s = s.map(lambda v: str(v) if v is not None else None)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pd) != len(duck_pd):
        errs.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        errs.append(f"columns spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}")
        return errs
    a, b = normalize(spark_pd), normalize(duck_pd)
    if len(a) == len(b):
        for c in a.columns:
            x, y = a[c], b[c]
            if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
                eq = np.isclose(x, y, rtol=0, atol=0, equal_nan=True)
                exact = (x.fillna(0) == y.fillna(0)) | (x.isna() & y.isna())
                if not exact.all():
                    bad = (~exact).idxmax()
                    errs.append(f"col {c}: first diff row {bad}: {x[bad]!r} vs {y[bad]!r}")
            else:
                eq = (x == y) | (x.isna() & y.isna())
                if not eq.all():
                    bad = (~eq).idxmax()
                    errs.append(f"col {c}: first diff row {bad}: {x[bad]!r} vs {y[bad]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from cassandra2aerospike_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
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
