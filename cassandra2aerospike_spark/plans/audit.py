"""Physical-plan auditing: machine-checkable scale posture.

The reference hard-codes its physical strategy (seek-to-key pushdown,
late materialization, pipelined one-pass merge — SURVEY.md §4); on Spark
the equivalent guarantees are properties of the Catalyst physical plan.
This module turns ".explain() and iterate" into assertions the test
suite enforces, so a regression that silently de-broadcasts a join, drops
a pushed filter, or sneaks a Python row UDF into a hot path fails CI.

Audited properties:
  - scans:            parquet scans + their PushedFilters / ReadSchema
  - exchanges:        shuffle count (every one is a cluster-wide barrier)
  - broadcasts:       BroadcastHashJoin / BroadcastExchange presence
  - cartesian:        CartesianProduct / BroadcastNestedLoopJoin leaks
  - python_eval:      BatchEvalPython (row UDF — the slow path) vs
                      ArrowEvalPython / MapInPandas (vectorized — allowed)
  - codegen:          WholeStageCodegen span count
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan string (what .explain(mode) prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanReport:
    plan: str
    n_scans: int = 0
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_cartesian: int = 0
    n_python_row_udf: int = 0
    n_arrow_eval: int = 0
    n_codegen_spans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    def summary(self) -> str:
        return (
            f"scans={self.n_scans} exchanges={self.n_exchanges} "
            f"bhj={self.n_broadcast_joins} smj={self.n_sortmerge_joins} "
            f"cartesian={self.n_cartesian} row_udf={self.n_python_row_udf} "
            f"codegen={self.n_codegen_spans}"
        )


def audit(df: DataFrame) -> PlanReport:
    """Parse the formatted physical plan into a PlanReport."""
    plan = physical_plan(df, "formatted")
    simple = physical_plan(df, "simple")
    rep = PlanReport(plan=plan)
    rep.n_scans = len(re.findall(r"Scan parquet", simple))
    # count only shuffle exchanges; broadcast exchanges counted separately
    rep.n_exchanges = len(re.findall(r"Exchange (?:hash|range|Single|RoundRobin)", simple, re.I))
    rep.n_broadcast_joins = len(re.findall(r"BroadcastHashJoin", simple))
    rep.n_sortmerge_joins = len(re.findall(r"SortMergeJoin", simple))
    rep.n_cartesian = len(
        re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", simple)
    )
    # BatchEvalPythonUDTF is the (declared) table-function slow path, not a
    # row UDF leak — only bare BatchEvalPython is banned
    rep.n_python_row_udf = len(re.findall(r"BatchEvalPython(?!UDTF)", simple))
    rep.n_arrow_eval = len(
        re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|AggregateInPandas",
            simple,
        )
    )
    rep.n_codegen_spans = len(set(re.findall(r"\*\((\d+)\)", simple)))
    rep.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    rep.read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return rep


def assert_scale_posture(
    df: DataFrame,
    max_exchanges: int | None = None,
    require_broadcast: bool = False,
    require_pushed_filter: str | None = None,
    forbid_cartesian: bool = True,
    forbid_python_row_udf: bool = True,
    max_scans: int | None = None,
) -> PlanReport:
    """Assert the plan properties that must survive a 100× scale-up.

    Raises AssertionError with the offending plan attached, so the test
    failure shows exactly what Catalyst chose.
    """
    rep = audit(df)
    problems: list[str] = []
    if max_exchanges is not None and rep.n_exchanges > max_exchanges:
        problems.append(
            f"{rep.n_exchanges} shuffle exchanges (max {max_exchanges})"
        )
    if require_broadcast and rep.n_broadcast_joins == 0:
        problems.append("no BroadcastHashJoin (small side not broadcast)")
    if require_pushed_filter is not None and not any(
        require_pushed_filter in pf for pf in rep.pushed_filters
    ):
        problems.append(
            f"filter on {require_pushed_filter!r} not pushed to scan "
            f"(PushedFilters={rep.pushed_filters})"
        )
    if forbid_cartesian and rep.n_cartesian:
        problems.append(f"{rep.n_cartesian} cartesian/nested-loop joins")
    if forbid_python_row_udf and rep.n_python_row_udf:
        problems.append(
            f"{rep.n_python_row_udf} row-at-a-time Python UDF stages "
            "(BatchEvalPython — use pandas_udf)"
        )
    if max_scans is not None and rep.n_scans > max_scans:
        problems.append(f"{rep.n_scans} parquet scans (max {max_scans})")
    if problems:
        raise AssertionError(
            "plan fails scale posture: " + "; ".join(problems) + "\n" + rep.plan
        )
    return rep
