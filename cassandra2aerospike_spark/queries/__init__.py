"""Named-query registry: every operator from SURVEY.md §2 ships as a
(callable, oracle-SQL) pair consumed by __spark_entry__.py.

Each submodule contributes a QUERIES dict (name -> f(spark, sf_dir) ->
DataFrame) and an ORACLES dict (name -> DuckDB SQL).  Queries without an
oracle entry get the driver's weaker rows-only check (streaming, LSH, ...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import dedup_q, merge_q, pipeline_q, relational_q, sim_q, stream_q, text_q, tokens_q, udx_q

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _mod in (merge_q, relational_q, text_q, dedup_q, sim_q, tokens_q, pipeline_q, stream_q, udx_q):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
