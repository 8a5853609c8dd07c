"""Relational-core helpers: oracle-exact aggregates and join utilities.

The relational surface itself (§2c: projections, filters, joins, aggs,
window functions, sorts/limits, set ops) is plain DataFrame API — there
is nothing to reimplement on top of Catalyst. What lives here is the
discipline needed for (a) cross-engine exactness and (b) scale:

- Floating-point SUM is order-dependent, and Spark's partial aggregation
  order differs from DuckDB's. ``dsum`` casts each addend to
  DECIMAL(18,2) (exact, deterministic: doubles are never exact .005
  midpoints, so round-to-nearest agrees across engines), sums exactly,
  and casts the exact result back to double — bit-identical everywhere,
  while keeping map-side partial aggregation (decimal sum combines
  associatively).
- ``davg`` divides the exact decimal sum by the count in one IEEE
  division — also bit-identical.
- ``broadcast_dim`` marks dimension tables for broadcast-hash joins
  explicitly, so fact-table joins never shuffle the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact, engine-portable SUM of a double column (result as double)."""
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Exact-sum average: decimal-sum ÷ count in one IEEE double division."""
    c = _c(col)
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def dsum_expr(expr: Column, scale: int = 2) -> Column:
    """dsum over a computed per-row expression.

    CAUTION: only exact if ``expr`` itself is decimal arithmetic over
    exact-decimal inputs. Casting a computed DOUBLE product to decimal
    is NOT portable — true .xx5 midpoints occur (e.g. price*0.1) and
    engines break them differently (Spark HALF_UP on shortest-repr
    digits, DuckDB scaled-multiply). Build the expression from decimal
    casts of the source columns instead (see queries.q_agg_pricing_summary).
    """
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (keys, random salt) so a hot key's rows spread
    over salt_buckets reducers; phase 2 re-aggregates the partials by
    the real keys. Correct for decomposable aggregates (sum/count/min/
    max — pass the MERGE expression in `aggs`, applied to the phase-1
    partial column of the same name). AQE's skew handling covers
    moderate skew automatically; salting is the explicit tool for the
    pathological single-hot-key case (one exception_class producing 90%
    of a 100 TB stream).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    merge = {
        name: _merge_expr(name, expr) for name, expr in aggs.items()
    }
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge.items()]
    )


def _merge_expr(name: str, original: Column) -> Column:
    """Merge step for common decomposable aggregates, inferred from the
    phase-1 expression string (count → sum of partial counts; sum/min/
    max → same function over partials)."""
    s = str(original)
    col = F.col(name)
    if "count(" in s:
        return F.sum(col)
    if "min(" in s:
        return F.min(col)
    if "max(" in s:
        return F.max(col)
    return F.sum(col)


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Mark a dimension table for broadcast: dim⋈fact never shuffles the
    fact side. At 100 TB this is the difference between a map-side join
    and a full shuffle of the fact table; AQE would usually get it right
    from statistics, but being explicit survives stale stats."""
    return F.broadcast(df)
