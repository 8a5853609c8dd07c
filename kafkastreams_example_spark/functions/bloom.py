"""Bloom-filter semi-join reduction — kill non-matching fact rows
BEFORE the shuffle when the dim side is too big to broadcast raw but
its key set fits a few megabits.

The 100 TB problem this solves: `fact SEMI JOIN dim` shuffles the
ENTIRE fact table on the join key even when only a sliver matches.
Broadcasting dim's raw keys stops working around 10⁷–10⁸ keys, but a
Bloom filter over those keys is n_bits/8 bytes regardless of key width
(Bloom 1970; the classic semi-join reduction from distributed query
processing — Bernstein & Chiu, JACM 1981 — and what Spark's own
runtime-filter optimization does internally when statistics let it).
With the filter applied inside the fact SCAN stage, the shuffle
carries matches + a bounded false-positive residue instead of the
whole table; the exact semi join afterwards removes the residue, so
results are EXACT — the filter only prices the plan, never the answer.

Construction is pure JVM-side SQL (no UDFs, no driver loops over
rows):

  * build: k seeded ``xxhash64(key, seed)`` positions per distinct
    key, exploded to (word, bitmask) contributions and OR-folded by
    ``bit_or`` into n_bits/64 longs — ONE aggregation whose shuffle is
    bounded by n_bits/64 rows, not by key count. The word array
    crosses to the driver: n_bits/8 bytes by construction.
  * probe: the word array is embedded as an ARRAY LITERAL in the fact
    plan; each row tests k ``getbit(element_at(words, h/64), h%64)``
    expressions inside whole-stage codegen. No join, no broadcast
    variable plumbing — the filter is a plain Filter node fused into
    the scan.

Size discipline: the literal is capped (default 2²⁴ bits = 2 MiB) —
beyond that a plan-embedded constant stops being free to ship per
task; raise the cap consciously, or pre-reduce the key domain. False
positive rate ≈ (k·n/m)ᵏ; at the default k=2 and m = 16·n it is
~1/64 — i.e. the shuffle shrinks to matches + ~1.6% of non-matches.

No reference-repo counterpart (SURVEY.md §2c extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_LITERAL_BITS = 1 << 24  # 2 MiB of plan-embedded constant

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_FLOATING = {"float", "double"}


def _key_family(dtype: str) -> str:
    """Type family under which the STRING rendering of equi-join-equal
    values is identical: all integrals render alike ('1'); each
    decimal SCALE renders its own way ('1.00'); FLOAT and DOUBLE are
    SEPARATE families — a float's shortest-repr string ('1.1') differs
    from its lossless double widening's ('1.1000000238418579') for
    most non-dyadic values, so a FLOAT-vs-DOUBLE pair must widen
    before hashing (round-14 review finding); everything else is its
    own family."""
    d = dtype.lower()
    if d in _INTEGRAL:
        return "integral"
    return d


def _is_numeric_family(fam: str) -> bool:
    return (
        fam in ("integral",) or fam in _FLOATING or fam.startswith("decimal")
    )


def _canon(col: Column, widen_numeric: bool) -> Column:
    return (col.cast("double") if widen_numeric else col).cast("string")


def build_bloom_bits(
    keys: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int = 2,
    widen_numeric: bool = False,
) -> list[int]:
    """Aggregate a Bloom filter over the (deduplicated) key column.
    Returns the n_bits/64 word array — driver memory bounded by
    construction. One explode + one bit_or aggregation; the shuffle
    carries at most n_bits/64 rows regardless of key count.

    Build and probe keys must share a TYPE FAMILY (all integrals; or
    the same floating type — FLOAT and DOUBLE render differently; or
    decimals of one scale): the hash input is the key's string
    rendering, identical within a family but NOT across (INT 1 -> '1'
    vs DOUBLE 1.0 -> '1.0' vs FLOAT 1.1 -> '1.1' vs its double
    widening '1.1000000238418579' vs DECIMAL(_,2) -> '1.00'),
    so a cross-family pair silently false-negatives (round-13 ADVICE).
    For cross-family numeric pairs set ``widen_numeric=True`` on BOTH
    sides — keys widen to DOUBLE first, so any two values equal under
    the equi-join render identically; 2^53-adjacent longs may then
    collide, which is a false POSITIVE only (the caller's trailing
    exact join removes it). bloom_semi_join flips this automatically
    from the two schemas."""
    if n_bits % 64 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if n_bits > MAX_LITERAL_BITS:
        raise ValueError(
            f"n_bits={n_bits} exceeds the {MAX_LITERAL_BITS}-bit literal cap "
            "(a plan-embedded constant ships with every task); shrink the "
            "filter or pre-reduce the key domain"
        )
    # xxhash64 is TYPE-sensitive (hash of 1 AS INT != 1 AS BIGINT), so
    # a build/probe dtype mismatch would silently drop matching rows
    # (false negatives the trailing semi join cannot restore). Both
    # sides therefore hash the STRING rendering of the key, identical
    # within a type family; widen_numeric handles cross-family pairs
    # (see docstring).
    hs = F.array(
        *[
            F.pmod(
                F.xxhash64(_canon(F.col(key_col), widen_numeric), F.lit(s)),
                F.lit(n_bits),
            )
            for s in range(n_hashes)
        ]
    )
    rows = (
        keys.select(F.explode(hs).alias("h"))
        .select(
            (F.col("h") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1::BIGINT, CAST(h % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r["word"]] = r["mask"]
    return words


def bloom_probe(
    key: Column,
    words: list[int],
    n_hashes: int = 2,
    widen_numeric: bool = False,
) -> Column:
    """Membership-test expression against a built word array: true for
    every inserted key (no false negatives — all k bits were set),
    true for a non-member with probability ≈ (k·n/m)ᵏ. Pure codegen:
    k getbit probes of an array literal, no join. Hashes the STRING
    rendering of the key to match build_bloom_bits; same type-family
    contract and ``widen_numeric`` escape hatch as there — pass the
    SAME widen_numeric the filter was built with."""
    n_bits = len(words) * 64
    lit_words = F.lit(words)
    cond = F.lit(True)
    for s in range(n_hashes):
        h = F.pmod(
            F.xxhash64(_canon(key, widen_numeric), F.lit(s)), F.lit(n_bits)
        )
        word = (h / 64).cast("int")
        bit = (h % 64).cast("int")
        cond = cond & (
            F.getbit(F.element_at(lit_words, word + F.lit(1)), bit) == 1
        )
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    n_bits: int | None = None,
    n_hashes: int = 2,
) -> DataFrame:
    """EXACT semi join with Bloom pre-reduction: filter the fact side
    by a Bloom filter over dim's distinct keys inside the scan stage,
    then the real left-semi join removes the false-positive residue.
    ``n_bits`` defaults to the next multiple of 64 above 16x the dim
    key count (≈1.6% fp at k=2), capped at the literal bound.

    Sees BOTH schemas, so the build/probe type-family contract is
    handled here: when the two key columns are numeric but of
    different families (e.g. INT fact vs DOUBLE dim, whose string
    renderings diverge), both sides widen to DOUBLE before hashing —
    equi-join-equal values then render identically and the bloom stays
    false-negative-free (round-13 ADVICE)."""
    # persist the distinct key frame: it is scanned by the filter BUILD
    # action (and the auto-sizing count when n_bits is None) and again
    # by the exact semi join — without the persist the dim scan +
    # distinct exchange run once per consumer (guide §3.2: the build
    # side is scanned twice; make the second scan read the cache). The
    # returned frame is lazy, so the cache is left to the session —
    # it is exactly the O(keys) frame the semi join must hold anyway.
    keys = dim_keys.select(key_col).distinct().persist()
    fact_fam = _key_family(dict(fact.dtypes)[key_col])
    dim_fam = _key_family(dict(keys.dtypes)[key_col])
    widen = (
        fact_fam != dim_fam
        and _is_numeric_family(fact_fam)
        and _is_numeric_family(dim_fam)
    )
    if n_bits is None:
        n = keys.count()
        n_bits = min(MAX_LITERAL_BITS, max(64, ((16 * n + 63) // 64) * 64))
    words = build_bloom_bits(keys, key_col, n_bits, n_hashes, widen)
    pre = fact.filter(bloom_probe(F.col(key_col), words, n_hashes, widen))
    return pre.join(keys, key_col, "left_semi")
