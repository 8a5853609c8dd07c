"""Physical-plan introspection: the guard-rails that keep queries
100 TB-shaped.

A query that is correct at sf0.01 but reads all columns, skips
pushdown, or shuffles a broadcastable dim will fall over at cluster
scale; these helpers turn `.explain("formatted")` into assertions so
plan regressions fail tests, not production runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters entry of the
    scan — i.e. the predicate reaches the parquet reader."""
    plan = plan_string(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed to scan; plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, count: int = 1) -> None:
    """Assert at least `count` broadcast-hash joins in the plan (the
    dim side never shuffles the fact table)."""
    plan = plan_string(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= count, f"expected ≥{count} BroadcastHashJoin, found {n}; plan:\n{plan}"


def assert_no_shuffle(df: DataFrame) -> None:
    """Assert the plan contains no Exchange (narrow pipeline only)."""
    plan = plan_string(df)
    assert "Exchange" not in plan, f"unexpected shuffle; plan:\n{plan}"


def count_shuffles(df: DataFrame) -> int:
    # simple mode prints operators inline ("Exchange hashpartitioning(…)");
    # formatted mode splits the arguments into a detail section, where
    # these substrings never occur and the count is silently zero
    plan = plan_string(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
