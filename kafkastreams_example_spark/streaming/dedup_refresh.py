"""Reference-parity stateful dedup: refresh-on-duplicate with a
centered probe window, via applyInPandasWithState.

Semantics replicated from the reference DeduplicationTransformer
(KStreamDistinct.java:42-112), the one operator Spark's built-ins can't
express (SURVEY.md §4):

- per record with dedup id k and event time ts:
  - k null → pass through untouched (:71-72) — handled by the caller's
    split-union, null keys never enter the stateful path;
  - state holds the set of remembered timestamps for k within the
    retention window (the reference's WindowStore keeps every put(),
    it never replaces); duplicate iff ANY remembered ts is within
    [ts − window/2, ts + window/2] (:56-59, :86-95) — centered, so
    out-of-order records slightly OLDER than a remembered event are
    also suppressed;
  - duplicate → suppress AND put the duplicate's ts (:76-77, :97-99):
    continuous duplicates extend suppression indefinitely;
  - not duplicate → emit and remember (id, ts) (:101-103).
- state eviction ≈ store retention (= window size, :135-136): a
  processing-time timeout clears state for ids unseen for one window,
  so state size stays bounded by the active-key cardinality.

API note: Spark 4's transformWithStateInPandas is the designated
successor for custom stateful ops, but its Python worker requires
protobuf (absent in this environment); applyInPandasWithState is the
Arrow-only equivalent and expresses identical semantics for a
value-state + timeout processor.

Scale: state is the ≤1-window set of 8-byte timestamps per key (the
same bound as the reference's segmented store), RocksDB-backed, hash-
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

from ._evict import arm, expired

DEFAULT_WINDOW_MS = 10 * 60 * 1000  # KStreamDistinct.java:135-136


def make_refresh_dedup_fn(
    window_ms: int = DEFAULT_WINDOW_MS,
    evict: bool = False,
    out_cols: tuple[str, ...] = ("row_id", "ts_ms"),
    clock: str = "event",
):
    """Build the per-key stateful function. State: (seen timestamps,).

    The reference's WindowStore retains MULTIPLE entries per key —
    put() adds, it never replaces (:97-103: a probe hit puts the
    duplicate's timestamp, a miss puts the new event's), and the range
    fetch (:88-91) probes everything still inside retention. So the
    state here is the sorted set of remembered timestamps within the
    last retention window, pruned behind the key's max seen event time.
    A single last-seen scalar diverges: key@0 (emit), key@9min (emit,
    gap > half-window), then out-of-order key@3.5min must STILL be
    suppressed by the 0min entry — which only a multi-entry store
    remembers. State size is bounded by one entry per distinct
    timestamp inside the window — the same bound the reference's
    segmented store has.

    Retention note: the reference expires entries by task-global stream
    time; we prune per key (max seen ts for that key), which retains
    idle keys' entries slightly longer — strictly more suppression
    never reachable by an in-retention probe, and the evict timeout
    bounds idle-key state overall.

    clock selects the reference variant being replicated. "event"
    (default) is D1: probe/remember use the record's own event time
    (context.timestamp(), KStreamDistinct.java:77,80,87). "stream" is
    D1′: the FixedKeyProcessor variant substitutes the running stream
    time for every timestamp (context.currentStreamTimeMs(),
    KStreamDistinct_example.java:65,94,97) — monotone, so out-of-order
    records probe at the clock's high-water mark instead of their own
    time. The reference's stream time is task-global; here it is
    approximated per key (max event time seen for the key), the
    closest analog under key-partitioned state — divergence documented,
    covered by tests/test_streaming.py.

    evict=True arms a processing-time timeout that forgets ids unseen
    for a full retention window (:135-141) — required for bounded state
    on continuous streams, but ONLY for continuous triggers: with
    Trigger.AvailableNow, pending processing-time timers keep the query
    alive indefinitely (it never self-terminates), so batch-style runs
    must leave evict=False.
    """
    if clock not in ("event", "stream"):
        raise ValueError(f"clock must be 'event' or 'stream', got {clock!r}")

    tiebreak = [c for c in out_cols if c != "ts_ms"]

    def dedup_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if expired(state, window_ms if evict else None):
            # id unseen for a full retention window → forgotten (:135-141)
            return
        import numpy as np

        chunks = list(pdfs)
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        # event-time order with the payload columns as a deterministic
        # tie-break (arrival order is nondeterministic under parallel
        # consumption anyway). numpy lexsort + direct column-array
        # output instead of sort_values + .loc: the per-group pandas
        # machinery was ~6× the actual decision cost for the small
        # per-key groups a real key distribution produces (profiled at
        # ~1 ms vs ~175 µs per 12-row group). Object-dtype tiebreak
        # columns (string payloads, possibly NULL) can't lexsort — None
        # vs str comparison raises — so those take the original pandas
        # sort path; numeric payloads keep the fast path.
        cols = {c: batch[c].to_numpy() for c in out_cols}
        ts = cols["ts_ms"] = cols["ts_ms"].astype("int64", copy=False)
        if any(cols[c].dtype == object for c in tiebreak):
            batch = batch.sort_values(["ts_ms", *tiebreak], kind="mergesort")
            cols = {c: batch[c].to_numpy() for c in out_cols}
            ts = cols["ts_ms"] = cols["ts_ms"].astype("int64", copy=False)
            order = np.arange(len(batch))
        else:
            order = np.lexsort(tuple(cols[c] for c in reversed(tiebreak)) + (ts,))
        seen = list(state.get[0]) if state.exists else []
        keep, seen = probe_and_remember(seen, ts[order], window_ms, clock)
        state.update((seen,))
        arm(state, window_ms if evict else None)
        emit = order[np.asarray(keep, dtype=bool)]
        yield pd.DataFrame({c: cols[c][emit] for c in out_cols})

    return dedup_fn


def probe_and_remember(
    seen: list[int], ts_list, window_ms: int, clock: str = "event"
) -> tuple[list[bool], list[int]]:
    """The core refresh-on-duplicate algorithm, state-backend-agnostic —
    shared by the applyInPandasWithState wrapper above and the
    transformWithStateInPandas processor (dedup_refresh_tws.py).

    Input: the key's remembered timestamps (sorted ascending) and the
    batch's event times in processing order. Returns (keep flags, new
    remembered list after retention pruning).

    Hot path: when the batch arrives in ascending event-time order (the
    streaming wrappers always pre-sort), the whole batch is decided
    with three numpy vector ops instead of a per-record Python loop —
    valid because the reference puts EVERY processed timestamp into the
    store (hit refreshes, miss remembers: KStreamDistinct.java:97-103),
    so under ascending order the only batch-internal entry that can
    collide with record i is its immediate predecessor, and the prior
    state is probed with one searchsorted. Unsorted input (direct API
    use) falls back to the sequential reference loop.
    """
    import numpy as np

    ts = np.asarray(ts_list, dtype=np.int64)
    if ts.size == 0:
        if not len(seen):
            return [], []
        lo = seen[-1] - window_ms  # retention still applies on empty batches
        return [], [int(s) for s in seen if s >= lo]
    if np.any(np.diff(ts) < 0):  # processing order is not time order
        return _probe_and_remember_seq(list(seen), [int(t) for t in ts], window_ms, clock)
    left_ms = window_ms // 2  # KStreamDistinct.java:56
    right_ms = window_ms - left_ms  # :57
    s0 = np.asarray(seen, dtype=np.int64)
    if clock == "stream":
        # D1′: every timestamp is the monotone stream time; ascending
        # input makes the running high-water mark max(prior hwm, ts)
        e = np.maximum(ts, s0[-1]) if s0.size else ts
    else:
        e = ts
    # duplicate vs PRIOR state: any remembered entry inside the
    # centered probe window [e − left, e + right] (:86-95) — the
    # smallest remembered entry ≥ e − left decides
    if s0.size:
        i1 = np.searchsorted(s0, e - left_ms, side="left")
        col_state = (i1 < s0.size) & (s0[np.minimum(i1, s0.size - 1)] <= e + right_ms)
    else:
        col_state = np.zeros(e.size, dtype=bool)
    # duplicate vs EARLIER BATCH entries: every earlier element was put
    # (:97-103) and is ≤ e[i], so the binding probe is e[i-1]
    col_batch = np.empty(e.size, dtype=bool)
    col_batch[0] = False
    col_batch[1:] = e[:-1] >= e[1:] - left_ms
    keep = ~(col_state | col_batch)
    # retention = window size (:135-136): drop entries a full window
    # behind this key's stream time
    merged = np.union1d(s0, e) if s0.size else np.unique(e)
    pruned = merged[merged >= merged[-1] - window_ms]
    return keep.tolist(), pruned.tolist()


def _probe_and_remember_seq(
    seen: list[int], ts_list: list[int], window_ms: int, clock: str = "event"
) -> tuple[list[bool], list[int]]:
    """Sequential reference implementation (KStreamDistinct.java:42-112
    transliterated to the state model) — the semantics ground truth the
    vectorized fast path is property-tested against, and the fallback
    for out-of-order processing sequences."""
    from bisect import bisect_left

    left_ms = window_ms // 2  # KStreamDistinct.java:56
    right_ms = window_ms - left_ms  # :57
    # stream clock high-water mark: remembered entries are stream
    # times, so the max survives in state across batches
    hwm = seen[-1] if seen else None
    keep: list[bool] = []
    for ts in ts_list:
        if clock == "stream":
            # D1′: every timestamp is the monotone stream time
            hwm = ts if hwm is None else max(hwm, ts)
            ts = hwm
        # duplicate iff ANY remembered entry is inside the centered
        # probe window [ts − left, ts + right] (:86-95)
        i = bisect_left(seen, ts - left_ms)
        keep.append(not (i < len(seen) and seen[i] <= ts + right_ms))
        # WindowStore.put on BOTH branches: hit → add the duplicate's
        # timestamp (refresh, :97-99), miss → remember the new event
        # (:101-103)
        j = bisect_left(seen, ts)
        if j >= len(seen) or seen[j] != ts:
            seen.insert(j, ts)
    if not seen:  # empty batch against empty state
        return keep, seen
    # retention = window size (:135-136): drop entries a full window
    # behind this key's stream time
    lo = seen[-1] - window_ms
    return keep, [s for s in seen if s >= lo]


def dedup_refresh_stream(
    decoded: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    id_col: str = "dedup_id",
    ts_col: str = "event_time",
    payload_cols: tuple[str, ...] = ("row_id",),
    evict_state: bool = False,
    clock: str = "event",
) -> DataFrame:
    """Wire the stateful dedup: rows with null ids bypass (split-union,
    KStreamDistinct.java:71-72), the rest shuffle by id and run the
    keyed processor. Returns surviving (payload_cols..., ts_ms) rows.

    The payload columns ride THROUGH the stateful function's output
    schema — joining survivors back to the source stream would be a
    second stateful op after applyInPandasWithState, which Structured
    Streaming restricts (and any synthetic join key such as
    monotonically_increasing_id is both unsupported on streams and
    replay-unstable). Callers needing row identity should pass a
    replay-stable id derived from source coordinates, e.g.
    xxhash64(topic, partition, offset) for a Kafka stream.

    evict_state=True (continuous deployments only) bounds state via a
    processing-time TTL; leave False for Trigger.AvailableNow runs —
    pending timers prevent availableNow queries from terminating.
    """
    from pyspark.sql import functions as F

    keyed = decoded.select(
        F.col(id_col).alias("dedup_id"),
        # exact integer milliseconds — double epoch math differs by 1
        # ulp across engines and truncates wrong near representation
        # boundaries (README exactness discipline)
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        *[F.col(c) for c in payload_cols],
    )
    out_cols = tuple(payload_cols) + ("ts_ms",)
    dtypes = dict(keyed.dtypes)
    out_ddl = ", ".join(f"`{c}` {dtypes[c]}" for c in out_cols)
    # a record with a dedup id but no event time can't participate in
    # windowed dedup: dead-letter it (dropped here), consistent with the
    # PERMISSIVE-parse upgrade in sources/kafka.py — the reference never
    # sees this case (Kafka record timestamps always exist)
    nonnull = keyed.filter(F.col("dedup_id").isNotNull() & F.col("ts_ms").isNotNull())
    survivors = nonnull.groupBy("dedup_id").applyInPandasWithState(
        make_refresh_dedup_fn(
            window_ms, evict=evict_state, out_cols=out_cols, clock=clock
        ),
        outputStructType=out_ddl,
        stateStructType="seen ARRAY<BIGINT>",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_state
            else GroupStateTimeout.NoTimeout
        ),
    )
    null_rows = keyed.filter(F.col("dedup_id").isNull()).select(*out_cols)
    return survivors.unionByName(null_rows)


def make_coalesced_refresh_fn(
    window_ms: int,
    out_cols: tuple[str, ...],
    clock: str = "event",
    id_dtype_is_str: bool = True,
    evict: bool = False,
):
    """Key-COALESCED variant of the stateful dedup kernel (round-13
    verdict item 6): one state key carries MANY logical dedup ids, so
    the ~0.5 ms/key/batch applyInPandasWithState protocol round-trip
    (round-7 profiling: a NO-OP stateful fn measures the same floor as
    the real kernel at ~1.2 rows/key/batch) amortizes across the
    packed ids instead of being paid per id.

    State is the CSR flattening of {id -> remembered timestamps}
    (parallel arrays ids / offsets / ts) because the state DDL needs
    flat, fixed types. The decision algebra is probe_and_remember_many
    — ALL the pack's ids decided in one numpy pass via band-offset
    encoding (a per-id Python loop measured away the protocol win:
    1.14x; the vectorized kernel is what makes the pack cheap) —
    property-tested equal to per-id probe_and_remember on randomized
    state/batch/clock fixtures, and parity-asserted end-to-end by
    tools/coalesce_probe.py and tests/test_streaming.py.

    evict=True arms a processing-time idle timeout at PACK granularity
    (round-15 verdict item 3): per-id aging already prunes ids whose
    entries aged out, but only when the pack is TOUCHED — a pack whose
    ids ALL go quiet otherwise keeps its CSR arrays forever. On expiry
    the whole pack is forgotten (its ids' remembered timestamps are by
    then a full retention window stale, so forgetting matches the
    per-key tier's eviction semantics id-for-id). Continuous triggers
    only — same AvailableNow caveat as the per-key tier."""
    if clock not in ("event", "stream"):
        raise ValueError(f"clock must be 'event' or 'stream', got {clock!r}")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if expired(state, window_ms if evict else None):
            # every id in the pack unseen for a full retention window —
            # pack forgotten (the per-key tier's :135-141 semantics,
            # paid once per pack instead of once per id)
            return
        chunks = list(pdfs)
        batch = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        )
        st4 = state.get if state.exists else None
        # the state handle's batch-FIXED processing-time clock, not
        # time.time(): every pack in a batch must sweep against the
        # same instant, and a task retry must recompute the identical
        # output (deterministic-recomputation contract for
        # exactly-once sinks) — also the clock arm()'s timeout runs on
        # (round-16 self-review)
        out, new_state = coalesced_kernel(
            st4, batch, out_cols, window_ms, clock,
            now_ms=state.getCurrentProcessingTimeMs(),
            ttl_ms=window_ms if evict else None,
        )
        state.update(new_state)
        arm(state, window_ms if evict else None)
        yield out

    return fn


def coalesced_kernel(
    st4,
    batch: pd.DataFrame,
    out_cols: tuple[str, ...],
    window_ms: int,
    clock: str = "event",
    now_ms: int | None = None,
    ttl_ms: int | None = None,
):
    """The per-(pack, batch) kernel of the coalesced dedup tier,
    state-backend-agnostic — shared by the applyInPandasWithState
    wrapper above and the transformWithStateInPandas processor
    (dedup_refresh_tws.py), the same split every other stateful op in
    this package now has. ``st4`` is the CSR state tuple
    (ids, offsets, flat_ts, last_seen) or None for a fresh pack.
    Returns (out, new_st4) — survivors in the batch's deterministic
    (id, ts, tiebreak) order and the pruned CSR state in storable
    form.

    ``last_seen`` + ``ttl_ms`` (round 16): the per-id lazy TTL sweep.
    The per-id retention prune keeps entries within a window of the
    id's OWN max, so a DEAD id's last entry never ages — and under a
    churning keyspace the hash spread keeps every pack touched, so the
    pack-granularity eviction timer never fires either: ids
    accumulated with everything ever seen (caught live by the bench's
    state_ids_final gate at ~10k retained vs ~1k active). With
    ``ttl_ms`` set, ids whose ``last_seen`` (processing-time ms,
    stamped at each batch that carries the id) lags ``now_ms`` by more
    than the TTL are forgotten BEFORE the batch is decided — the same
    forget-after-idle contract the per-key tier's ProcessingTimeTimeout
    enforces eagerly, evaluated lazily at pack-touch time (the pack
    timer still covers the all-quiet pack). A swept id recurring later
    is treated as fresh, exactly like a per-key id whose timer fired."""
    import numpy as np

    tiebreak = [c for c in out_cols if c not in ("ts_ms", "dedup_id")]
    batch = batch.sort_values(
        ["dedup_id", "ts_ms", *tiebreak], kind="mergesort"
    )
    if st4 is not None:
        ids, offs, flat, seen_ms = st4
        ids, offs, flat, seen_ms = (
            list(ids), list(offs), list(flat), list(seen_ms)
        )
        if ttl_ms is not None and now_ms is not None and ids:
            fresh_enough = [now_ms - s <= ttl_ms for s in seen_ms]
            if not all(fresh_enough):
                counts0 = [offs[j + 1] - offs[j] for j in range(len(ids))]
                flat = [
                    t
                    for j, ok in enumerate(fresh_enough)
                    if ok
                    for t in flat[offs[j] : offs[j + 1]]
                ]
                ids = [i for i, ok in zip(ids, fresh_enough) if ok]
                seen_ms = [s for s, ok in zip(seen_ms, fresh_enough) if ok]
                kept_counts = [
                    c for c, ok in zip(counts0, fresh_enough) if ok
                ]
                offs = [0]
                for c in kept_counts:
                    offs.append(offs[-1] + c)
    else:
        ids, offs, flat, seen_ms = [], [0], [], []
    # combined id table: state ids keep their codes (and CSR
    # slices); batch-new ids append with empty slices
    now_val = int(now_ms) if now_ms is not None else 0
    code_of = {i: j for j, i in enumerate(ids)}
    for did in pd.unique(batch["dedup_id"]):
        if did not in code_of:
            code_of[did] = len(code_of)
            ids.append(did)
            offs.append(offs[-1])
            seen_ms.append(now_val)
    codes = batch["dedup_id"].map(code_of).to_numpy(np.int64)
    ts_arr = batch["ts_ms"].to_numpy(np.int64)
    # the kernel's precondition is rows sorted by (code, ts), and
    # codes follow state-INSERTION order, not id-value order: an id
    # first seen in a later batch gets a HIGHER code even if its
    # value sorts before an existing state id, so the value-sorted
    # batch is not code-sorted. Reorder by (code, ts) — lexsort is
    # stable, so the value-sort's tiebreak order survives within
    # equal (code, ts) — and scatter keep flags back afterwards.
    order = np.lexsort((ts_arr, codes))
    keep_sorted, new_off, new_flat = probe_and_remember_many(
        offs,
        flat,
        codes[order],
        ts_arr[order],
        len(ids),
        window_ms,
        clock,
    )
    keep = np.empty(len(codes), dtype=bool)
    keep[order] = np.asarray(keep_sorted, dtype=bool)
    # drop ids whose entries all aged out — the pack's id table
    # must not grow without bound
    counts = np.diff(new_off)
    live = counts > 0
    # ids carried by THIS batch refresh their last_seen stamp;
    # untouched survivors keep their old stamp so the lazy TTL sweep
    # above can age them out at a later pack touch
    touched = np.zeros(len(ids), dtype=bool)
    if codes.size:
        touched[np.unique(codes)] = True
    # .item() any numpy scalar: pd.unique on an integral id column
    # yields np.int64 values, and storing those in state fails the
    # JVM-side unpickle (net.razorvine PickleException on numpy.dtype)
    # — string ids masked this until the integer-id churn tier
    # (round 16). Same storable-form rule as every other state write.
    ids_out = [
        i.item() if hasattr(i, "item") else i
        for i, ok in zip(ids, live)
        if ok
    ]
    seen_out = [
        now_val if t else int(s)
        for s, t, ok in zip(seen_ms, touched, live)
        if ok
    ]
    offs_out = np.zeros(len(ids_out) + 1, dtype=np.int64)
    np.cumsum(counts[live], out=offs_out[1:])
    new_state = (
        ids_out,
        [int(x) for x in offs_out],
        [int(x) for x in new_flat],
        seen_out,
    )
    return batch.loc[np.asarray(keep, dtype=bool), list(out_cols)], new_state


def dedup_refresh_stream_coalesced(
    decoded: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    id_col: str = "dedup_id",
    ts_col: str = "event_time",
    payload_cols: tuple[str, ...] = ("row_id",),
    clock: str = "event",
    n_state_keys: int = 256,
    evict_state: bool = False,
) -> DataFrame:
    """dedup_refresh_stream with ids PACKED n-per-state-key: rows
    shuffle by xxhash64(id) % n_state_keys instead of by id, so the
    stateful operator pays its per-key protocol round-trip once per
    PACK per batch instead of once per id. Semantics are unchanged
    (same probe_and_remember per logical id; ids never interact —
    hash collisions just co-locate their state).

    Trade-offs vs the per-key tier, for the probe to price: (a) the
    pack's whole state deserializes/reserializes every batch even if
    one id was touched (state amplification ∝ pack size); (b)
    parallelism caps at n_state_keys — size it ≥ cluster cores ×
    a few; (c) no per-id eviction TIMERS (timeout granularity is the
    pack): evict_state=True forgets an all-quiet pack via its timer,
    and — round 16 — forgets DEAD ids inside touched packs via the
    kernel's lazy per-id TTL sweep (last_seen stamps, TTL =
    window_ms), because on a churning keyspace the hash spread keeps
    every pack touched forever and the per-id retention prune alone
    retained every id ever seen (caught by the bench's
    state_ids_final gate). Continuous triggers only, same
    AvailableNow caveat as the per-key tier. State schema is 4
    arrays since round 16 (ids/offsets/ts/last_seen): coalesced
    checkpoints written by earlier rounds do not restore under this
    DDL. Low-occupancy regimes (rows/key/batch ≈ 1) are where (a)
    loses to the protocol win; tools/coalesce_probe.py measures the
    crossover."""
    from pyspark.sql import functions as F

    keyed = decoded.select(
        F.col(id_col).alias("dedup_id"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        *[F.col(c) for c in payload_cols],
    )
    out_cols = tuple(payload_cols) + ("ts_ms",)
    dtypes = dict(keyed.dtypes)
    out_ddl = ", ".join(f"`{c}` {dtypes[c]}" for c in out_cols)
    id_ddl = dtypes["dedup_id"]
    nonnull = keyed.filter(
        F.col("dedup_id").isNotNull() & F.col("ts_ms").isNotNull()
    ).withColumn(
        "skey", F.pmod(F.xxhash64("dedup_id"), F.lit(n_state_keys)).cast("int")
    )
    survivors = nonnull.groupBy("skey").applyInPandasWithState(
        make_coalesced_refresh_fn(
            window_ms, ("dedup_id",) + out_cols, clock, evict=evict_state
        ),
        outputStructType=f"`dedup_id` {id_ddl}, {out_ddl}",
        stateStructType=(
            f"ids ARRAY<{id_ddl}>, offsets ARRAY<INT>, ts ARRAY<BIGINT>, "
            "last_seen ARRAY<BIGINT>"
        ),
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_state
            else GroupStateTimeout.NoTimeout
        ),
    ).select(*out_cols)
    null_rows = keyed.filter(F.col("dedup_id").isNull()).select(*out_cols)
    return survivors.unionByName(null_rows)


def probe_and_remember_many(
    state_offsets,
    state_ts,
    batch_codes,
    batch_ts,
    n_ids: int,
    window_ms: int,
    clock: str = "event",
):
    """Multi-id vectorized form of probe_and_remember: decide EVERY
    (id, ts) row of a coalesced pack in one numpy pass instead of a
    Python loop over ids (measured: the per-id loop ate the protocol
    win key coalescing was built for — 1.14x; this kernel is what
    makes the pack cheap).

    Band-offset encoding (same trick as functions/sliding.py): each
    id's timestamps shift by code·OFF where OFF exceeds the pack's
    time spread + window, so ONE global searchsorted probes every id's
    state slice and window arithmetic can never cross ids. The
    per-band algebra is probe_and_remember's ascending fast path
    (property-tested equal per id).

    Inputs: state as CSR over codes 0..n_ids-1 (offsets, flat SORTED
    ts per id), batch rows sorted by (code, ts). Returns (keep flags
    aligned to batch order, new_offsets, new_flat_ts) after per-id
    retention pruning.
    """
    import numpy as np

    state_offsets = np.asarray(state_offsets, dtype=np.int64)
    s = np.asarray(state_ts, dtype=np.int64)
    codes = np.asarray(batch_codes, dtype=np.int64)
    ts = np.asarray(batch_ts, dtype=np.int64)
    left_ms = window_ms // 2  # KStreamDistinct.java:56
    right_ms = window_ms - left_ms  # :57
    lo_t = min(int(s.min()) if s.size else 0, int(ts.min()) if ts.size else 0)
    hi_t = max(int(s.max()) if s.size else 0, int(ts.max()) if ts.size else 0)
    off = np.int64(hi_t - lo_t + window_ms + 2)
    if n_ids * int(off) >= 1 << 62:
        raise OverflowError("band-offset time axis would overflow int64")
    s_codes = np.repeat(
        np.arange(n_ids, dtype=np.int64), np.diff(state_offsets)
    )
    s_adj = (s - lo_t) + s_codes * off
    e_adj = (ts - lo_t) + codes * off
    if clock == "stream":
        # per-id running high-water mark, seeded by the id's state max:
        # global maximum.accumulate is per-band correct because a later
        # band's floor exceeds any earlier band's ceiling
        seed = np.full(n_ids, np.iinfo(np.int64).min, dtype=np.int64)
        has_state = np.diff(state_offsets) > 0
        if s.size:
            seed[has_state] = s_adj[state_offsets[1:][has_state] - 1]
        e_adj = np.maximum.accumulate(np.maximum(e_adj, seed[codes]))
    # duplicate vs PRIOR state: smallest remembered entry >= e - left
    if s_adj.size:
        i1 = np.searchsorted(s_adj, e_adj - left_ms, side="left")
        col_state = (i1 < s_adj.size) & (
            s_adj[np.minimum(i1, s_adj.size - 1)] <= e_adj + right_ms
        )
    else:
        col_state = np.zeros(e_adj.size, dtype=bool)
    # duplicate vs earlier batch entries of the SAME id: the binding
    # probe is the predecessor (every processed ts is remembered); a
    # previous id's rows sit >= off - spread below, so the comparison
    # is automatically false across band boundaries
    col_batch = np.empty(e_adj.size, dtype=bool)
    if e_adj.size:
        col_batch[0] = False
        col_batch[1:] = e_adj[:-1] >= e_adj[1:] - left_ms
    keep = ~(col_state | col_batch)
    # merge + per-id retention prune (entries a full window behind the
    # id's max); codes recover exactly as merged // off
    merged = np.union1d(s_adj, e_adj)
    m_codes = merged // off
    last_idx = np.searchsorted(m_codes, np.arange(n_ids), side="right") - 1
    has = last_idx >= np.searchsorted(m_codes, np.arange(n_ids), side="left")
    id_max = np.where(has, merged[np.maximum(last_idx, 0)], np.int64(0))
    keep_state = merged >= id_max[m_codes] - window_ms
    kept = merged[keep_state]
    k_codes = m_codes[keep_state]
    new_offsets = np.zeros(n_ids + 1, dtype=np.int64)
    np.cumsum(np.bincount(k_codes, minlength=n_ids), out=new_offsets[1:])
    new_flat = (kept - k_codes * off) + lo_t
    return keep, new_offsets, new_flat
