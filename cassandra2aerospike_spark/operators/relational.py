"""Relational operator helpers (SURVEY.md §2.3-§2.7).

The reference's single join family (k-way sort-merge co-group,
CassandraParser.cpp:219-313) decomposes into the standard join surface;
everything here is built-in Catalyst — these helpers only encode the
engine-portable numeric conventions and the couple of composite operators
Spark lacks natively (top-k per group, as-of join).

Numeric convention for oracle-stable aggregates: raw double summation is
summation-order-dependent (Spark sums in partition order, DuckDB in scan
order), so cross-engine-comparable sums go through exact DECIMAL
arithmetic and cast back to double at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact decimal sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent average: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def topk_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """O-family top-k per group: ranking window + filter.  At scale this is
    a single shuffle on the partition keys; Spark pushes a per-partition
    top-k (WindowGroupLimit) below the shuffle for rank/row_number
    predicates, so skewed groups don't spill the full window state."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_source: Column,
    metrics: dict[str, tuple[Column, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Skew-immune two-phase aggregation (SURVEY.md §4 'salting for skew').

    Low-cardinality or hot grouping keys funnel whole key-groups through
    single reducers; salting splits each group into `n_salts` sub-groups
    on a derived salt (hash of a high-cardinality column), partially
    aggregates, then finishes on the bare keys.  The second shuffle moves
    only keys × n_salts rows — negligible — while the first distributes
    evenly.  Only algebraic metrics compose: 'sum' (re-sum), 'count'
    (sum of partials), 'min'/'max' (idempotent).

    metrics: output_name -> (input column, 'sum'|'count'|'min'|'max').
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salt = F.pmod(F.hash(salt_source), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            (F.count(c) if how == "count" else getattr(F, how)(c)).alias(f"_p_{name}")
            for name, (c, how) in metrics.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            recombine[how](F.col(f"_p_{name}")).alias(name)
            for name, (_, how) in metrics.items()
        ]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts within the `on` group.

    Implemented as union + ordered window (`last_value ignore nulls`) —
    one shuffle on the group key, no range-join fan-out; this is the
    scalable pattern for 100 TB event streams (the sort is within group
    partitions only).  Right rows order before left rows at equal ts so
    "at or before" includes ties.
    """
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side", "__ts", *value_cols)
    for c in value_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out


def range_join(
    fact: DataFrame, dim: DataFrame, condition: Column, broadcast_dim: bool = True
) -> DataFrame:
    """θ/range join against a small dimension: broadcast the dim so the
    non-equi condition evaluates map-side (BroadcastNestedLoopJoin) instead
    of a shuffled cartesian.  For two large sides, bucketize the range key
    into an equi-join prefix first (J3 pattern, operators/merge.py)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, condition)
