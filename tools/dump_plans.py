#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to
plans/<round>/<name>_<tag>.txt — the optimization-round plan evidence.

Usage: python tools/dump_plans.py <round> <tag> <query> [query ...]

The data directory comes from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) — the same env contract as bench.py, so the plan
evidence is taken at the SF the bench runs at (round-20 ADVICE: no
hardcoded machine layout). Plans are produced via the documented
queryExecution().explainString path (one _jdf hop, no _sc._jvm
internals)."""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    """The string .explain('formatted') prints, returned instead."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main():
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans-{rnd}-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(__file__).resolve().parent.parent / "plans" / rnd
    out.mkdir(parents=True, exist_ok=True)
    for n in names:
        df = REGISTRY[n].fn(spark, sf)
        p = out / f"{n}_{tag}.txt"
        p.write_text(explain_formatted(df))
        print("wrote", p)
    spark.stop()


if __name__ == "__main__":
    main()
