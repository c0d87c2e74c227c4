"""Explain-plan helpers: make the scale properties testable.

"Would this plan survive a 100× scale-up?" is a question about the
physical plan, not the result: filters must reach the parquet scan
(``PushedFilters``), projections must prune the read schema
(``ReadSchema``), small dims must broadcast, and candidate-generation
joins must never degrade to cartesian products. These helpers turn each
property into an assertion used by the perf tests, so a regression in
plan shape fails CI before it costs cluster-hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, needle: str) -> None:
    """The filter must appear in the scan's PushedFilters list."""
    plan = plan_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(needle in ln for ln in pushed), (
        f"filter {needle!r} not pushed to scan; PushedFilters lines: {pushed}\n{plan}"
    )


def assert_read_schema_pruned(
    df: DataFrame, required: tuple[str, ...], absent: tuple[str, ...]
) -> None:
    """Column pruning: the parquet ReadSchema carries only needed columns."""
    plan = plan_str(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, f"no ReadSchema in plan:\n{plan}"
    joined = "\n".join(read)
    for col in required:
        assert col in joined, f"required column {col} missing from ReadSchema: {joined}"
    for col in absent:
        assert col not in joined, f"column {col} should be pruned: {joined}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )


def assert_no_cartesian_product(df: DataFrame) -> None:
    plan = plan_str(df)
    assert "CartesianProduct" not in plan, (
        f"plan degraded to a cartesian product:\n{plan}"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of *shuffle* Exchange operators in the physical plan —
    the scale budget a query must hold as data grows 100×. Broadcast
    and reused exchanges don't count (they don't move the big side)."""
    plan = plan_str(df, "simple")
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        or "Exchange rangepartitioning" in ln
        or "Exchange SinglePartition" in ln
        if "ReusedExchange" not in ln
    )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    got = count_exchanges(df)
    assert got <= n, (
        f"plan has {got} exchanges, budget {n}:\n{plan_str(df)}"
    )
