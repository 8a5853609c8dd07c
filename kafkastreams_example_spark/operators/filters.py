"""Stateless filters — F1/F2 of the reference surface.

F1 (KafkaStreamsApplication.java:110): ``v.level.equals("INFO")``. The
Java version NPEs on a null level; Spark three-valued logic drops the
row. We adopt the Spark semantic (documented divergence, SURVEY.md §1).

F2 (KStreamDistinct.java:150): ``v != null`` — drop tombstones.

These compile to simple Catalyst predicates, so at scale they push down
into the parquet/kafka scan (PushedFilters) and cost nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_equals(df: DataFrame, col: str | Column, value) -> DataFrame:
    """F1: keep rows where col == value (null col → dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return df.filter(c == F.lit(value))


def filter_not_null(df: DataFrame, col: str | Column) -> DataFrame:
    """F2: keep rows where col IS NOT NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return df.filter(c.isNotNull())
