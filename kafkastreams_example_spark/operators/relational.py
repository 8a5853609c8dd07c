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


#: Supported salted aggregate kinds: kind → (partial fn, merge fn).
#: ``avg`` is handled structurally in salted_agg (a (sum, count) partial
#: pair merged as sum-of-sums / sum-of-counts) and so isn't listed here.
_SALTED_AGG_SPECS: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (keys, random salt) so a hot key's rows spread
    over salt_buckets reducers; phase 2 re-aggregates the partials by
    the real keys. AQE's skew handling covers moderate skew
    automatically; salting is the explicit tool for the pathological
    single-hot-key case (one exception_class producing 90% of a 100 TB
    stream).

    ``aggs`` maps output name → (kind, column), where kind is one of
    ``sum``/``count``/``min``/``max``/``avg``. The partial and merge
    functions come from an explicit spec per kind — never inferred from
    the expression — and an unknown kind raises instead of silently
    merging with the wrong function. ``avg`` is decomposed into a
    (sum, count) partial pair and merged as sum-of-sums over
    sum-of-counts; for cross-engine-exact averages pass a decimal-cast
    column (see ``davg``).
    """
    unknown = sorted(
        {kind for kind, _ in aggs.values()} - set(_SALTED_AGG_SPECS) - {"avg"}
    )
    if unknown:
        raise ValueError(
            f"salted_agg: unsupported aggregate kind(s) {unknown}; "
            f"supported: {sorted(_SALTED_AGG_SPECS) + ['avg']}"
        )
    partial_exprs: list[Column] = []
    merge_exprs: list[Column] = []
    for name, (kind, col) in aggs.items():
        c = _c(col)
        if kind == "avg":
            partial_exprs.append(F.sum(c).alias(f"__{name}_sum"))
            partial_exprs.append(F.count(c).alias(f"__{name}_cnt"))
            # exact total (decimal sums stay exact through both phases),
            # then ONE double division — the davg discipline; avoids
            # Spark's decimal-division scale rules differing between the
            # salted and unsalted plans
            merge_exprs.append(
                (F.sum(f"__{name}_sum").cast("double") / F.sum(f"__{name}_cnt")).alias(
                    name
                )
            )
        else:
            partial_fn, merge_fn = _SALTED_AGG_SPECS[kind]
            partial_exprs.append(partial_fn(c).alias(name))
            merge_exprs.append(merge_fn(F.col(name)).alias(name))
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Skew-defeating equi-join: the fact side gets a salt in
    [0, salt_buckets) and the (small) dim side is replicated once per
    salt value, so a hot join key's rows spread across ``salt_buckets``
    reducers instead of landing on one. Output is IDENTICAL to
    ``fact.join(dim, on)`` for any salt assignment — salting only
    re-partitions the work, which is why the oracle for a salted join
    is the plain join.

    The salt is a deterministic hash of ``salt_source`` (any
    fact-side column, ideally unique — falls back to the join key's
    own hash mixed with a constant, which still splits hot keys because
    xxhash64 varies per row only if the source does; pass a row-unique
    column for real skew). dim×salt replication is an ``explode`` of a
    literal range — at 100 TB the dim side is broadcast-sized by
    contract (use AQE skew-join for large-large skew instead).
    """
    src = _c(salt_source) if salt_source is not None else F.col(on)
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(src), F.lit(salt_buckets)).cast("int")
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return fact_s.join(dim_s, [on, "__salt"]).drop("__salt")


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Mark a dimension table for broadcast: dim⋈fact never shuffles the
    fact side. At 100 TB this is the difference between a map-side join
    and a full shuffle of the fact table; AQE would usually get it right
    from statistics, but being explicit survives stale stats."""
    return F.broadcast(df)


def grouped_exact_percentile(
    df: DataFrame, keys: list[str], col: str, p: float, out: str = "pct"
) -> DataFrame:
    """EXACT per-group interpolated percentile that scales:
    value-histogram + cumulative rank pick, never a per-group value
    buffer.

    Spark's built-in `percentile`/`median` aggregate is exact but
    buffers EVERY value of a group in the aggregation buffer
    (ObjectHashAggregate) — per-group O(rows) executor memory, which
    with a handful of groups is exactly the operator that OOMs at
    100 TB. This helper computes the same exact interpolated percentile
    through bounded state: count by (keys, value) — the histogram is
    bounded by the column's DISTINCT-value cardinality, the natural
    bound for fixed-precision telemetry — then a running sum over the
    per-group histogram locates the two straddling ranks of position
    (n−1)·p and interpolates with the TWO-SIDED weighting
    (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi, SHORT-CIRCUITING to v_lo
    whenever v_lo == v_hi. Both pieces are required for bit-equality
    with Spark's Percentile, which is itself histogram-based: when the
    two straddling ranks fall inside ONE distinct-value bucket it
    returns the bucket value with no arithmetic at all, and only
    otherwise evaluates the two-sided expression. Neither pure form
    matches alone — the one-sided v_lo + frac·(v_hi−v_lo) lands an ulp
    off at 34/401 fuzz cases (e.g. p=0.9 on the fixture), and the pure
    two-sided form multiplies rounding INTO the duplicated-value case
    ((0.8)·(−3) + (0.2)·(−3) = −3.0000000000000004 ≠ −3.0, the r17
    hypothesis falsifier, now pinned at tests/test_properties.py::
    test_percentile_duplicated_straddle_regression). Bit-equality with
    the built-in is additionally pinned by tests/test_operators.py::
    test_grouped_exact_median_matches_builtin. (Signed zeros are the
    one documented divergence: SQL groupBy normalizes −0.0 to 0.0 in
    the histogram key while the built-in's Java map keeps them
    distinct; −0.0 == 0.0 everywhere downstream, so no == contract can
    observe it.)

    Plan: one two-phase count aggregation over the scan, then two
    window passes over the HISTOGRAM (hash-partitioned by group, sorted
    within partitions by value — no global range sort, no value
    buffering), then a final one-row-per-group aggregate. For columns
    with unbounded distinct values, quantize first or use
    approx_percentile — an exact percentile fundamentally requires rank
    structure over the value domain."""
    from pyspark.sql.window import Window

    # NULL values are ignored, matching the built-in percentile/median
    # aggregate (and DuckDB's quantile_cont). Without this filter the
    # histogram would gain a NULL-value row that inflates __n and —
    # with Spark's NULLS FIRST ascending window order — shifts every
    # cumulative rank, silently breaking the bit-equality contract.
    hist = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count("*").alias("__cnt"))
    )
    w_run = Window.partitionBy(*keys).orderBy(col)
    w_all = Window.partitionBy(*keys)
    h = (
        hist.withColumn("__hi", F.sum("__cnt").over(w_run))
        .withColumn("__lo", F.col("__hi") - F.col("__cnt") + 1)
        .withColumn("__n", F.sum("__cnt").over(w_all))
    )
    # 0-based fractional position, exactly Spark's (count-1)*percentage
    pos = (F.col("__n") - 1).cast("double") * F.lit(float(p))
    k1 = F.floor(pos) + 1  # 1-based lower straddling rank
    k2 = F.ceil(pos) + 1  # 1-based upper straddling rank
    covers1 = (F.col("__lo") <= k1) & (k1 <= F.col("__hi"))
    covers2 = (F.col("__lo") <= k2) & (k2 <= F.col("__hi"))
    picked = h.filter(covers1 | covers2).groupBy(*keys).agg(
        F.min(F.when(covers1, F.col(col))).alias("__v1"),
        F.min(F.when(covers2, F.col(col))).alias("__v2"),
        F.min(pos).alias("__pos"),
    )
    lo_d = F.floor("__pos").cast("double")
    hi_d = F.ceil("__pos").cast("double")
    interp = (hi_d - F.col("__pos")) * F.col("__v1") + (
        F.col("__pos") - lo_d
    ) * F.col("__v2")
    # v1 == v2 short-circuit: when both straddling ranks sit in the
    # same histogram bucket the built-in returns the value untouched;
    # evaluating the two-sided product instead injects an ulp (the r17
    # falsifier: 0.8·(−3) + 0.2·(−3) = −3.0000000000000004).
    return picked.select(
        *keys,
        F.when(lo_d == hi_d, F.col("__v1"))
        .when(F.col("__v1") == F.col("__v2"), F.col("__v1"))
        .otherwise(interp)
        .alias(out),
    )


def grouped_exact_median(
    df: DataFrame, keys: list[str], col: str, out: str = "med"
) -> DataFrame:
    """Exact per-group median via the bounded-histogram percentile
    kernel (p = 0.5) — see grouped_exact_percentile for the scale
    argument and exactness contract."""
    return grouped_exact_percentile(df, keys, col, 0.5, out)


def grouped_exact_percentiles(
    df: DataFrame, keys: list[str], col: str, ps: dict[str, float]
) -> DataFrame:
    """Multi-percentile form of grouped_exact_percentile: computes ALL
    requested percentiles (out_name → p) from ONE shared value
    histogram and one rank pass — a caller needing p05+p95 (winsorize,
    IQR fences) pays one corpus scan, not one per percentile. Same
    bounded-state and interpolation bit-equality contract as the
    single-p kernel — two-sided weighting with the v1 == v2
    short-circuit, see grouped_exact_percentile — and identical per-p
    results (each p's straddling
    ranks are picked with per-p guards over the union filter, so
    adding a percentile never perturbs another's value)."""
    from pyspark.sql.window import Window

    hist = (
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, col)
        .agg(F.count("*").alias("__cnt"))
    )
    w_run = Window.partitionBy(*keys).orderBy(col)
    w_all = Window.partitionBy(*keys)
    h = (
        hist.withColumn("__hi", F.sum("__cnt").over(w_run))
        .withColumn("__lo", F.col("__hi") - F.col("__cnt") + 1)
        .withColumn("__n", F.sum("__cnt").over(w_all))
    )
    any_cover = F.lit(False)
    aggs = []
    for out, p in ps.items():
        pos = (F.col("__n") - 1).cast("double") * F.lit(float(p))
        k1 = F.floor(pos) + 1
        k2 = F.ceil(pos) + 1
        covers1 = (F.col("__lo") <= k1) & (k1 <= F.col("__hi"))
        covers2 = (F.col("__lo") <= k2) & (k2 <= F.col("__hi"))
        any_cover = any_cover | covers1 | covers2
        aggs += [
            F.min(F.when(covers1, F.col(col))).alias(f"__v1_{out}"),
            F.min(F.when(covers2, F.col(col))).alias(f"__v2_{out}"),
            F.min(pos).alias(f"__pos_{out}"),
        ]
    picked = h.filter(any_cover).groupBy(*keys).agg(*aggs)
    sel: list = list(keys)
    for out in ps:
        pos_c = F.col(f"__pos_{out}")
        lo_d = F.floor(pos_c).cast("double")
        hi_d = F.ceil(pos_c).cast("double")
        interp = (hi_d - pos_c) * F.col(f"__v1_{out}") + (
            pos_c - lo_d
        ) * F.col(f"__v2_{out}")
        # Same v1 == v2 short-circuit as the single-p kernel (r17
        # falsifier): same-bucket straddles return the value untouched.
        sel.append(
            F.when(lo_d == hi_d, F.col(f"__v1_{out}"))
            .when(
                F.col(f"__v1_{out}") == F.col(f"__v2_{out}"),
                F.col(f"__v1_{out}"),
            )
            .otherwise(interp)
            .alias(out)
        )
    return picked.select(*sel)
