"""Plan-shape inspection helpers.

The 100 TB posture is checked by asserting on the *physical plan*, not by
hoping: dimension joins must be broadcast, filters must reach the parquet
scan (PushedFilters), and projections must prune columns (ReadSchema).
Used by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_broadcast_join(df: DataFrame, n_expected: int = 1) -> None:
    plan = plan_string(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= n_expected, (
        f"expected >= {n_expected} BroadcastHashJoin, found {n} in plan:\n{plan}"
    )


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a filter fragment appears in the scan's PushedFilters."""
    plan = plan_string(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
