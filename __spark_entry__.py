"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``cassandra2aerospike_spark/``; this module only
wires named queries to their oracles.  Conventions that keep the
value-hash stable across engines:

  * every computed column is aliased identically on both sides;
  * double aggregates are summed as exact DECIMALs then cast back to
    double (raw double sums are summation-order-dependent);
  * events timestamps are compared as epoch-µs BIGINTs or µs-truncated
    timestamps (the parquet stores nanos: Spark reads the raw int64 via
    nanosAsLong, DuckDB truncates to µs — sources/tables.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cassandra2aerospike_spark.queries import ORACLES, QUERIES
from cassandra2aerospike_spark.operators import merge
from cassandra2aerospike_spark.sources import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's end-to-end merge query (LWW + tombstones +
    expiry fold + record assembly) over sf0.001 events."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return merge.merge_records(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return dict(ORACLES)
