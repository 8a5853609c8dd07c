"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over kafkastreams_example_spark.queries.REGISTRY — every
implemented operator from SURVEY.md §2 is one (queries, oracle_sql)
pair; the engine code lives in the package.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafkastreams_example_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped pricing summary at sf0.001."""
    return _q.q_agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
