"""Deduplication family — batch-expressible forms of the reference's
windowed stream dedup (KStreamDistinct.java:42-112), plus exact dedup.

Semantics pinned from the reference (SURVEY.md §2a D1):
- dedup key = one value column (exception.exception_class, :148);
- null key → always pass through untouched (:71-72);
- duplicate = same key seen within the store window; on duplicate the
  stored timestamp is REFRESHED (:97-99), so a continuous run of
  duplicates is suppressed indefinitely;
- in-order streams probe a ±window/2 centered range (:56-57, :88-91),
  which for monotone event time reduces to "gap from previous survivor
  or duplicate ≤ window/2".

Scale notes: every variant here is one hash shuffle on the dedup key
(plus the window bucket where applicable) followed by a streaming
row_number / running aggregate — no driver-side loops, no UDFs. This
fixes the reference's cross-partition dedup miss (it never repartitions
by the dedup id — SURVEY.md §3): in Spark the shuffle co-locates keys by
construction. Skewed keys (one exception_class dominating) are handled
by AQE skew handling; for pathological skew, pre-aggregate per
(key, bucket) partial survivors before the final window.

The exact streaming parity op (refresh + centered probe on out-of-order
input) is streaming/dedup_refresh.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: list[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def dedup_exact(
    df: DataFrame,
    keys: list[str | Column],
    order_by: list[str | Column],
) -> DataFrame:
    """Keep the first row per key under a total order (deterministic
    dropDuplicates). D1 with an infinite window.

    row_number over (key → order) rather than dropDuplicates so the
    survivor is deterministic (dropDuplicates keeps an arbitrary row,
    which can't be oracle-checked and isn't reproducible across runs).
    """
    w = Window.partitionBy(*_cols(keys)).orderBy(*_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_windowed(
    df: DataFrame,
    key: str | Column,
    ts: str | Column,
    window_seconds: int,
    tiebreak: list[str | Column] | None = None,
) -> DataFrame:
    """First event per (key, tumbling time bucket).

    The batch-expressible projection of D1: the reference's 10-minute
    window store retention (KStreamDistinct.java:135-136) quantized to
    tumbling buckets. Bucketing via floor(epoch/window) keeps the whole
    operator in one shuffle + window; at scale the bucket column also
    becomes a natural partition-pruning key for incremental runs.
    """
    k = F.col(key) if isinstance(key, str) else key
    t = F.col(ts) if isinstance(ts, str) else ts
    bucket = F.floor(t.cast("double") / F.lit(window_seconds))
    order = [t] + _cols(tiebreak or [])
    w = Window.partitionBy(k, bucket).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_null_passthrough(
    df: DataFrame,
    key: Column,
    ts: str | Column,
    window_seconds: int,
    tiebreak: list[str | Column] | None = None,
) -> DataFrame:
    """dedup_windowed, but rows with a null key always survive —
    the reference's null-id rule (KStreamDistinct.java:71-72).

    Implemented as a single window pass with an OR filter (null keys all
    land in one partition of the window, but we never inspect their
    row_number, and Spark's window on a null partition is still a single
    shuffle — for extreme null skew, split-union the null slice instead;
    documented alternative kept simple here because null share is
    bounded in the log-event domain).
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    bucket = F.floor(t.cast("double") / F.lit(window_seconds))
    order = [t] + _cols(tiebreak or [])
    w = Window.partitionBy(key, bucket).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(key.isNull() | (F.col("__rn") == 1))
        .drop("__rn")
    )


def dedup_refresh_batch(
    df: DataFrame,
    key: Column,
    ts: str | Column,
    gap_seconds: float,
    tiebreak: list[str | Column] | None = None,
) -> DataFrame:
    """Batch projection of the refresh-on-duplicate dedup (D1) for
    in-order event time.

    Reference semantics: a duplicate refreshes the stored timestamp
    (KStreamDistinct.java:97-99), so suppression extends as long as the
    inter-arrival gap stays within the probe half-window
    (left = window/2, :56-57, :88-91). For monotone event time that is
    exactly session-gap logic: a row survives iff its gap from the
    previous same-key row exceeds gap_seconds (or it is the first).
    Null keys always pass (:71-72).

    One shuffle on the key; lag + filter, all codegen'd — scales
    linearly and is the standard sessionization shape.
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    order = [t] + _cols(tiebreak or [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(t.cast("double")).over(w)
    gap_ok = prev_ts.isNull() | (t.cast("double") - prev_ts > F.lit(gap_seconds))
    return (
        df.withColumn("__keep", gap_ok)
        .filter(key.isNull() | F.col("__keep"))
        .drop("__keep")
    )
