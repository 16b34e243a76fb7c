"""Driver-gate replica: every declared query must hash-match its DuckDB
oracle (run at sf0.001 for speed; tools/check_oracle.py runs sf0.01)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_oracle import compare  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spark_pd = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(spark_pd) >= 0  # rows-only check
        return
    # Arrow fetch like the gate: preserves date32 as datetime.date so the
    # DATE-vs-TIMESTAMP tag distinction matches tools/check_oracle.py
    duck_pd = duck.execute(ORACLES[name]).arrow().to_pandas()
    errs = compare(name, spark_pd, duck_pd)
    assert not errs, f"{name}: {errs}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
