"""Reference-parity stateful dedup: refresh-on-duplicate with a
centered probe window, via applyInPandasWithState.

Semantics replicated from the reference DeduplicationTransformer
(KStreamDistinct.java:42-112), the one operator Spark's built-ins can't
express (SURVEY.md §4):

- per record with dedup id k and event time ts:
  - k null → pass through untouched (:71-72) — handled by the caller's
    split-union, null keys never enter the stateful path;
  - state holds last-seen ts for k; duplicate iff stored ts is within
    [ts − window/2, ts + window/2] (:56-59, :86-95) — centered, so
    out-of-order records slightly OLDER than a remembered event are
    also suppressed;
  - duplicate → suppress AND overwrite stored ts with the duplicate's
    ts (:76-77, :97-99): continuous duplicates extend suppression
    indefinitely;
  - not duplicate → emit and remember (id, ts) (:101-103).
- state eviction ≈ store retention (= window size, :135-136): a
  processing-time timeout clears state for ids unseen for one window,
  so state size stays bounded by the active-key cardinality.

API note: Spark 4's transformWithStateInPandas is the designated
successor for custom stateful ops, but its Python worker requires
protobuf (absent in this environment); applyInPandasWithState is the
Arrow-only equivalent and expresses identical semantics for a
value-state + timeout processor.

Scale: state is one 8-byte timestamp per key, RocksDB-backed, hash-
partitioned by the dedup key — the shuffle the reference lacks
(SURVEY.md §3), so duplicates are caught across input partitions.
Within a micro-batch, rows are processed in event-time order for
determinism (the reference's arrival order is nondeterministic under
parallel consumption anyway).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_WINDOW_MS = 10 * 60 * 1000  # KStreamDistinct.java:135-136


def make_refresh_dedup_fn(window_ms: int = DEFAULT_WINDOW_MS, evict: bool = False):
    """Build the per-key stateful function. State: (last_seen_ms,).

    evict=True arms a processing-time timeout that forgets ids unseen
    for a full retention window (:135-141) — required for bounded state
    on continuous streams, but ONLY for continuous triggers: with
    Trigger.AvailableNow, pending processing-time timers keep the query
    alive indefinitely (it never self-terminates), so batch-style runs
    must leave evict=False.
    """
    left_ms = window_ms // 2  # :56
    right_ms = window_ms - left_ms  # :57

    def dedup_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if evict and state.hasTimedOut:
            # id unseen for a full retention window → forget it (:135-141)
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_ms", "row_id"], kind="mergesort")
        last = state.get[0] if state.exists else None
        keep = []
        for ts in batch["ts_ms"].astype("int64"):
            ts = int(ts)
            is_dup = last is not None and (ts - left_ms) <= last <= (ts + right_ms)
            keep.append(not is_dup)
            # remember on miss (:101-103), refresh on hit (:97-99):
            # either way the stored timestamp becomes this record's
            last = ts
        state.update((int(last),))
        if evict:
            state.setTimeoutDuration(window_ms)
        yield batch.loc[keep, ["row_id", "ts_ms"]]

    return dedup_fn


def dedup_refresh_stream(
    decoded: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    id_col: str = "dedup_id",
    ts_col: str = "event_time",
    row_id_col: str = "row_id",
    evict_state: bool = False,
) -> DataFrame:
    """Wire the stateful dedup: rows with null ids bypass (split-union,
    KStreamDistinct.java:71-72), the rest shuffle by id and run the
    keyed processor. Returns surviving (row_id, ts_ms) pairs to re-join
    against the full record — keeping shuffled/state rows minimal no
    matter how wide the event payload is.

    evict_state=True (continuous deployments only) bounds state via a
    processing-time TTL; leave False for Trigger.AvailableNow runs —
    pending timers prevent availableNow queries from terminating.
    """
    from pyspark.sql import functions as F

    keyed = decoded.select(
        F.col(id_col).alias("dedup_id"),
        (F.col(ts_col).cast("double") * 1000).cast("bigint").alias("ts_ms"),
        F.col(row_id_col).alias("row_id"),
    )
    # a record with a dedup id but no event time can't participate in
    # windowed dedup: dead-letter it (dropped here), consistent with the
    # PERMISSIVE-parse upgrade in sources/kafka.py — the reference never
    # sees this case (Kafka record timestamps always exist)
    nonnull = keyed.filter(F.col("dedup_id").isNotNull() & F.col("ts_ms").isNotNull())
    survivors = nonnull.groupBy("dedup_id").applyInPandasWithState(
        make_refresh_dedup_fn(window_ms, evict=evict_state),
        outputStructType="row_id BIGINT, ts_ms BIGINT",
        stateStructType="last_seen_ms BIGINT",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_state
            else GroupStateTimeout.NoTimeout
        ),
    )
    null_rows = keyed.filter(F.col("dedup_id").isNull()).select("row_id", "ts_ms")
    return survivors.unionByName(null_rows)
