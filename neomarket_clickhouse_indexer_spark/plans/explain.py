"""Physical-plan inspection — make plan quality testable.

"The plan you'd want, not the first one that passed": these helpers turn
``.explain`` output into assertions so regressions in pushdown, pruning,
broadcast choice, or partial aggregation fail CI instead of shipping a
10× slower scan (the optimizer techniques the reference gets from
ClickHouse — PREWHERE, partition pruning, in-memory dims — are only "free"
in Spark if the plan actually shows them; SURVEY §4).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_asserts(
    df: DataFrame,
    pushed_filters: list[str] | None = None,
    read_schema_only: list[str] | None = None,
    broadcast_joins: int | None = None,
    forbid_cartesian: bool = True,
    partial_agg: bool = False,
) -> list[str]:
    """Return a list of violations (empty == plan is as intended).

    - pushed_filters: column names that must appear in PushedFilters
      (predicate reached the parquet scan)
    - read_schema_only: scan must read ONLY these columns (column pruning)
    - broadcast_joins: minimum number of BroadcastHashJoin nodes
    - forbid_cartesian: no CartesianProduct/BroadcastNestedLoopJoin unless
      the operator is an intentional cross join
    - partial_agg: require two-phase HashAggregate (partial + final)
    """
    plan = explain_str(df)
    problems: list[str] = []
    for colname in pushed_filters or []:
        if f"PushedFilters: [" not in plan or colname not in plan.split(
            "PushedFilters:"
        )[1].split("]")[0]:
            problems.append(f"filter on {colname!r} not pushed to scan")
    if read_schema_only is not None:
        for chunk in plan.split("ReadSchema: ")[1:]:
            schema_line = chunk.split("\n")[0]
            read_cols = [
                c.split(":")[0]
                for c in schema_line.split("struct<")[-1].rstrip(">").split(",")
                if c
            ]
            extra = set(read_cols) - set(read_schema_only)
            if extra:
                problems.append(f"scan reads unpruned columns {sorted(extra)}")
    if broadcast_joins is not None:
        n = plan.count("BroadcastHashJoin")
        if n < broadcast_joins:
            problems.append(f"expected ≥{broadcast_joins} broadcast joins, saw {n}")
    if forbid_cartesian and ("CartesianProduct" in plan):
        problems.append("plan contains CartesianProduct")
    if partial_agg:
        if "partial_" not in plan and plan.count("HashAggregate") < 2:
            problems.append("no two-phase (partial/final) hash aggregation")
    return problems
