"""Registry invariants (VERDICT r08 item 1): the round-8 state — two
`q_*` functions with ORACLES entries but missing from QUERIES, so the
driver silently never executed them — must be a TEST FAILURE, not a
judge finding.

Three invariants, each per-submodule and globally:
  1. ORACLES keys == QUERIES keys (a query without an oracle, or a
     dead oracle without a query, is an error — streaming/rows-only
     exceptions must be listed in _ROWS_ONLY explicitly).
  2. Every module-level `q_<name>` function is registered in its own
     module's QUERIES under the matching key.
  3. The registry _PRIORITY prefix references only known queries and
     has no duplicates.
"""

from __future__ import annotations

import inspect
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra2aerospike_spark import queries as registry  # noqa: E402
from cassandra2aerospike_spark.queries import (  # noqa: E402
    dedup_q,
    merge_q,
    pipeline_q,
    relational_q,
    sim_q,
    stream_q,
    text_q,
    tokens_q,
    udx_q,
)

_MODULES = [
    merge_q,
    relational_q,
    text_q,
    dedup_q,
    sim_q,
    tokens_q,
    pipeline_q,
    stream_q,
    udx_q,
]

# Queries deliberately shipped without an exact-SQL oracle (the driver
# records the weaker rows-only check).  Currently empty: every
# registered query has an exact DuckDB oracle, and any new rows-only
# query must be added here on purpose.
_ROWS_ONLY: set[str] = set()


@pytest.mark.parametrize("mod", _MODULES, ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_oracles_match_queries_per_module(mod):
    q, o = set(mod.QUERIES), set(mod.ORACLES)
    assert o - q == set(), f"oracles without a registered query: {sorted(o - q)}"
    assert (q - o) - _ROWS_ONLY == set(), (
        f"queries without an oracle (add to ORACLES or to _ROWS_ONLY "
        f"explicitly): {sorted((q - o) - _ROWS_ONLY)}"
    )


@pytest.mark.parametrize("mod", _MODULES, ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_every_query_function_is_registered(mod):
    funcs = {
        name[2:]: fn
        for name, fn in vars(mod).items()
        if name.startswith("q_") and inspect.isfunction(fn)
    }
    unregistered = {
        key for key, fn in funcs.items() if fn not in mod.QUERIES.values()
    }
    assert unregistered == set(), (
        f"q_* functions not in {mod.__name__}.QUERIES: {sorted(unregistered)}"
    )


def test_global_registry_consistency():
    assert set(registry.ORACLES) - set(registry.QUERIES) == set()
    assert (
        set(registry.QUERIES) - set(registry.ORACLES) - _ROWS_ONLY == set()
    )
    # no name collisions between submodules
    total = sum(len(m.QUERIES) for m in _MODULES)
    assert total == len(registry.QUERIES), "duplicate query names across modules"


def test_priority_prefix_well_formed():
    prio = registry._PRIORITY
    assert len(prio) == len(set(prio)), "duplicate names in _PRIORITY"
    unknown = [n for n in prio if n not in registry.QUERIES]
    assert unknown == [], f"_PRIORITY references unknown queries: {unknown}"
    # the registry must actually start with the priority prefix
    assert list(registry.QUERIES)[: len(prio)] == prio
