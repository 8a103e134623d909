"""Physical-plan audit helpers (SURVEY §4: "explain and iterate").

Small assertions over the executed plan used by tests and by humans
tuning queries: did the filter reach the scan, did the dim join
broadcast, how many exchanges does the plan pay. These inspect
`queryExecution.executedPlan` — i.e. what will actually run,
post-AQE-planning, not the unresolved logical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters contains `fragment`."""
    plan = executed_plan(df)
    return any(
        "PushedFilters" in line and fragment in line for line in plan.splitlines()
    )


def broadcasts(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def exchanges(df: DataFrame) -> int:
    """Shuffle count — the number every scale review starts from."""
    return executed_plan(df).count("Exchange")


def assert_no_exchange(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "Exchange" not in plan, f"unexpected shuffle:\n{plan}"
