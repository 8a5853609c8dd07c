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


def exchange_inputs(df: DataFrame) -> list[str]:
    """Input-column lines of every Exchange node in the formatted plan
    — one string per Exchange, e.g. "Input [2]: [id#12L, cs#45]".
    Lets tests assert WHAT a shuffle carries (narrow key/score rows vs
    vector-fat rows), not just how many shuffles exist."""
    import re

    lines = plan_string(df, "formatted").splitlines()
    out = []
    for i, ln in enumerate(lines):
        if re.match(r"^\(\d+\)\s+Exchange", ln.strip()):
            for nxt in lines[i + 1 : i + 5]:
                if nxt.strip().startswith("Input"):
                    out.append(nxt.strip())
                    break
    return out


def count_shuffles(df: DataFrame) -> int:
    # simple mode prints operators inline ("Exchange hashpartitioning(…)");
    # formatted mode splits the arguments into a detail section, where
    # these substrings never occur and the count is silently zero
    plan = plan_string(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
