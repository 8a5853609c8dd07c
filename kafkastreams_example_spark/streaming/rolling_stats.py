"""Streaming face of the retract-capable time-RANGE sliding aggregates
(functions/sliding.py): per event, the (count, sum, mean, min, max) of
its entity's trailing ``window_us`` of VALUES — continuously, over a
micro-batch stream, via applyInPandasWithState.

Structured Streaming cannot express this declaratively at all: its
windowed aggregations emit PER-WINDOW rows (tumbling/sliding buckets),
not per-EVENT trailing frames, and the batch Window API is unsupported
on streams. Flink calls this an OVER aggregation; this module is the
Spark equivalent, built on the same algebra as the batch kernel:

  * state per entity = the (t, v) pairs inside the retention horizon
    (per-key max seen t − window; the same per-key retention contract
    as streaming/dedup_refresh.py, and the same bound the batch
    kernel's history_cap enforces);
  * per micro-batch and entity: merge state with the batch's rows
    (sorted by event time), ONE searchsorted pair finds every incoming
    row's frame over the merged timeline, prefix-differenced moments +
    the shared sparse-table RMQ (sliding.sparse_range_minmax) price
    all aggregates in O(b log(b+s)) — never O(rows · frame);
  * frames include ALL in-window rows of the merged timeline (state
    AND batch peers, even later-arriving ties) — chosen so that a
    stream delivered in event-time order produces EXACTLY the batch
    kernel's output (tests pin stream==batch row-for-row across batch
    boundaries). Out-of-order rows probe the entity's state as-of
    their batch (an earlier-time straggler sees in-window state rows
    that arrived before it, exactly like the dedup tier's probe).

Two emission tiers (round 14): the default emits each arriving row
once (emit-on-arrival; a late row's frame covers what has arrived —
divergence from batch bounded to frames whose window-mates arrive
later); ``emit_corrections=True`` additionally re-emits the rows a
late event retro-affects, stamped with a per-key ``rev`` sequence, so
max(rev)-per-id downstream CONVERGES to the batch kernel for every
row whose window-mates all arrive within the retention horizon
(pinned in tests; the upsert-over-append shape Flink uses for
retracting OVER windows).

100 TB shape: rows shuffle once on the entity key; state per key is
O(rows inside one window), RocksDB-backed; the numpy work is per
(entity, batch) with no Python row loop.

No reference-repo counterpart (SURVEY.md §2c extension surface);
public precedent: Flink OVER-window aggregations, KSQL's windowed
aggregations; Hirzel et al. DEBS'17 (sliding-window aggregation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.sliding import sparse_range_minmax
from ._evict import arm, expired

DEFAULT_WINDOW_US = 86_400_000_000  # 24 h


def stats_kernel(st_, sv, batch: pd.DataFrame, id_col: str, window_us: int):
    """The per-(entity, batch) kernel of the plain tier, state-backend-
    agnostic — shared by the applyInPandasWithState wrapper below and
    the transformWithStateInPandas processor (rolling_stats_tws.py),
    the same split dedup_refresh gives probe_and_remember.

    Input: the key's retained timeline as two arrays (sorted int64
    microseconds + float64 values; empty arrays for a fresh key) and
    the batch rows (t_us, value, id_col). Returns (out, kept_ts,
    kept_vs): the per-row trailing-frame stats frame and the merged
    timeline pruned to the retention horizon (per-key max t − W).

    Algebra (module docstring): one stable merge, ONE searchsorted
    pair for every row's frame, prefix-differenced sums + the shared
    sparse-table RMQ — O(b log(b+s)), never O(rows · frame)."""
    import numpy as np

    batch = batch.sort_values(["t_us", id_col], kind="mergesort")
    bt = batch["t_us"].to_numpy(np.int64)
    bv = batch["value"].to_numpy(np.float64)
    st_ = np.asarray(st_, dtype=np.int64)
    sv = np.asarray(sv, dtype=np.float64)
    # merged timeline, time-sorted (state is already sorted; the
    # batch is sorted; one merge via argsort of the concatenation —
    # stable, so state rows precede batch ties, which is irrelevant
    # to the sums)
    mt = np.concatenate([st_, bt])
    mv = np.concatenate([sv, bv])
    order = np.argsort(mt, kind="mergesort")
    mt, mv = mt[order], mv[order]
    lo = np.searchsorted(mt, bt - window_us, side="left")
    hi = np.searchsorted(mt, bt, side="right")
    pv = np.zeros(len(mv) + 1)
    np.cumsum(mv, out=pv[1:])
    n = (hi - lo).astype(np.int64)  # state never holds NULL values
    s = pv[hi] - pv[lo]
    mn, mx = sparse_range_minmax(mv, mv, lo, hi)
    out = pd.DataFrame(
        {
            id_col: batch[id_col].to_numpy(),
            "ts_ms": (bt // 1000).astype(np.int64),
            "n_frame": n,
            "sum_v": s,
            "mean_v": s / n,  # frames include the row itself: n >= 1
            "min_v": mn,
            "max_v": mx,
        }
    )
    # retention: keep the merged timeline behind the key's max t
    keep = mt >= mt[-1] - window_us
    return out, mt[keep], mv[keep]


def make_rolling_stats_fn(
    window_us: int, id_col: str, evict_after_ms: int | None = None
):
    """Per-entity stateful function: state = (ts ARRAY<BIGINT>,
    vs ARRAY<DOUBLE>) — the retention-pruned (t, value) timeline.

    ``evict_after_ms`` arms a processing-time idle timeout (round-15
    verdict item 1): retention pruning runs only when a key receives a
    batch, so an entity that permanently stops emitting would otherwise
    keep its timeline arrays in the state store forever — an unbounded
    leak on churning keyspaces. On expiry the key's state is dropped
    and nothing is emitted; a revived entity restarts from an empty
    timeline (its frames cover post-revival arrivals only — exactly
    the emit-on-arrival contract, since pre-eviction rows are by
    construction at least one idle period older). Same pattern as
    dedup_refresh.py's evict tier."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if expired(state, evict_after_ms):
            # idle for a full eviction period → timeline forgotten
            return
        chunks = list(pdfs)
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        st_, sv = state.get if state.exists else ((), ())
        out, kt, kv = stats_kernel(st_, sv, batch, id_col, window_us)
        state.update((kt.tolist(), kv.tolist()))
        arm(state, evict_after_ms)
        yield out

    return fn


def make_rolling_stats_corrected_fn(
    window_us: int,
    id_col: str,
    retention_windows: int = 2,
    evict_after_ms: int | None = None,
):
    """CORRECTED-EMISSION variant (round 14): same per-entity timeline
    state plus row ids and a per-key emission sequence. A LATE event
    doesn't just emit its own frame — it also RE-EMITS every state row
    whose trailing frame the late event falls into (rows with
    t ∈ [t_late, t_late + W]), recomputed over the merged timeline and
    stamped with the new sequence number. Downstream keeps the row
    with the max ``rev`` per id (upsert semantics over an append
    sink — the same shape Flink gives retracting OVER windows on
    append-only sinks).

    Retention and exactness: the corrected tier keeps
    ``retention_windows``·W of timeline (default 2W; the plain tier
    keeps W) because a correctable row can sit up to W behind the
    key's max and its OWN frame reaches another W back — raise the
    multiple to buy tolerance for later stragglers with state; it
    also carries the highest prune floor ever applied, and a
    correction is emitted ONLY when its frame provably contains every
    arrived row (frame start >= floor) — a correction computed over a
    truncated frame would carry the highest rev and OVERWRITE a better
    earlier emission (round-14 review finding; pinned by test).

    Convergence contract (pinned in tests): a row converges to the
    batch kernel exactly once every event inside its window has
    arrived no later than (retention_windows−1)·W behind the key's
    max event time at arrival (the retention then guarantees the
    correction frame is complete). Stragglers beyond that bound leave
    the row at its best exactly-computable emission — never a
    truncated overwrite.

    ``evict_after_ms`` (round-15): idle-key eviction, as in the plain
    tier. Eviction also resets the key's ``rev`` sequence and prune
    floor, so rev values are only COMPARABLE within one eviction-free
    epoch: a pre-eviction row id that reappears after revival (an
    at-least-once redelivery, or a straggler past the idle horizon)
    emits over the post-revival timeline at a restarted rev that may
    tie or — after enough revived batches — exceed its pre-eviction
    rev, and downstream max(rev) may then keep the truncated
    emission. The operating rule is therefore the same one Spark's
    own dropDuplicatesWithinWatermark state expiry imposes: size the
    timeout past BOTH the lateness you correct for
    (≥ retention_windows · the window's wall-time equivalent) AND the
    source's redelivery horizon, so no pre-eviction id can legally
    reappear after its key was dropped."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if expired(state, evict_after_ms):
            return
        chunks = list(pdfs)
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        st5 = state.get if state.exists else None
        out, new_state = corrected_stats_kernel(
            st5, batch, id_col, window_us, retention_windows
        )
        state.update(new_state)
        arm(state, evict_after_ms)
        yield out

    return fn


def corrected_stats_kernel(
    st5,
    batch: pd.DataFrame,
    id_col: str,
    window_us: int,
    retention_windows: int = 2,
):
    """The per-(entity, batch) kernel of the CORRECTED stats tier,
    state-backend-agnostic — shared by the applyInPandasWithState
    wrapper above and the transformWithStateInPandas processor
    (rolling_stats_tws.py).

    ``st5`` is the 5-field state tuple (ts, vs, ids, seq, floor) or
    None for a fresh key. Returns (out, new_st5): the emission frame
    (batch rows + provably-complete corrections, all stamped with the
    new rev) and the updated state tuple in storable form (lists +
    ints). All semantics — affected-set probe, prune-floor
    suppression, 2W retention — are the round-14 contract; see
    make_rolling_stats_corrected_fn's docstring."""
    import numpy as np

    batch = batch.sort_values(["t_us", id_col], kind="mergesort")
    bt = batch["t_us"].to_numpy(np.int64)
    bv = batch["value"].to_numpy(np.float64)
    bi = batch[id_col].to_numpy(np.int64)
    if st5 is not None:
        st_, sv, sids, seq, floor = st5
        st_ = np.asarray(st_, dtype=np.int64)
        sv = np.asarray(sv, dtype=np.float64)
        sids = np.asarray(sids, dtype=np.int64)
        seq = int(seq)
        floor = int(floor)
    else:
        st_ = np.zeros(0, dtype=np.int64)
        sv = np.zeros(0, dtype=np.float64)
        sids = np.zeros(0, dtype=np.int64)
        seq = -1
        floor = np.iinfo(np.int64).min
    seq += 1
    # a state row is AFFECTED iff some batch row lands inside its
    # trailing frame, i.e. a batch t exists in [t_s - W, t_s]; on
    # an in-order stream that is at most a same-timestamp tie, so
    # the correction set is empty and this tier degenerates to the
    # plain one (plus the rev column)
    if st_.size and bt.size:
        pos = np.searchsorted(bt, st_ - window_us, side="left")
        affected = (pos < bt.size) & (
            bt[np.minimum(pos, bt.size - 1)] <= st_
        )
    else:
        affected = np.zeros(st_.size, dtype=bool)
    # a correction whose frame reaches below the prune floor would
    # be computed over a TRUNCATED frame yet carry the highest rev
    # — suppress it (the earlier emission stands); batch rows
    # always emit (emit-on-arrival allows their truncation)
    affected &= (st_ - window_us) >= floor
    mt = np.concatenate([st_, bt])
    mv = np.concatenate([sv, bv])
    mi = np.concatenate([sids, bi])
    order = np.argsort(mt, kind="mergesort")
    mt, mv, mi = mt[order], mv[order], mi[order]
    # emission set: the batch's own rows + affected state rows
    emit_t = np.concatenate([st_[affected], bt])
    emit_i = np.concatenate([sids[affected], bi])
    lo = np.searchsorted(mt, emit_t - window_us, side="left")
    hi = np.searchsorted(mt, emit_t, side="right")
    pv = np.zeros(len(mv) + 1)
    np.cumsum(mv, out=pv[1:])
    n = (hi - lo).astype(np.int64)
    s = pv[hi] - pv[lo]
    mn, mx = sparse_range_minmax(mv, mv, lo, hi)
    out = pd.DataFrame(
        {
            id_col: emit_i,
            "ts_ms": (emit_t // 1000).astype(np.int64),
            "n_frame": n,
            "sum_v": s,
            "mean_v": s / n,
            "min_v": mn,
            "max_v": mx,
            "rev": np.full(len(emit_i), seq, dtype=np.int64),
        }
    )
    # retain 2W: a correctable row sits up to W behind the key max
    # and its frame reaches another W back — W retention would
    # hand corrections truncated frames (review finding)
    new_floor = mt[-1] - retention_windows * window_us
    keep = mt >= new_floor
    new_state = (
        mt[keep].tolist(),
        mv[keep].tolist(),
        mi[keep].tolist(),
        seq,
        int(max(floor, new_floor)),
    )
    return out, new_state


def rolling_stats_stream(
    events: DataFrame,
    entity_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "event_time",
    value_col: str = "value",
    id_col: str = "row_id",
    window_us: int = DEFAULT_WINDOW_US,
    emit_corrections: bool = False,
    retention_windows: int = 2,
    evict_after_ms: int | None = None,
) -> DataFrame:
    """Wire the per-event trailing-window stats over a stream: rows
    with NULL value or NULL event time are dead-lettered (dropped —
    they can contribute nothing to any frame and SQL aggregates would
    skip them anyway; the batch kernel instead reports them with their
    frame, a difference documented here because streaming state must
    not hold non-contributing rows). Output per surviving input row:
    id_col, ts_ms, n_frame, sum_v, mean_v, min_v, max_v.

    ``emit_corrections=True`` selects the corrected-emission tier
    (make_rolling_stats_corrected_fn): late events additionally
    RE-EMIT the state rows they retro-affect, every row carries a
    per-key ``rev`` sequence, and downstream keeps max(rev) per id —
    eventual consistency with the batch kernel inside the retention
    horizon. That tier requires an integral id column (ids live in
    the state struct as ARRAY<BIGINT>).

    ``evict_after_ms`` bounds state on CHURNING keyspaces: a key idle
    for that many ms of processing time is dropped from the state
    store (retention pruning otherwise runs only on touch, so a
    permanently-quiet entity's timeline would live forever). Size it
    at least the window's wall-clock equivalent (corrected tier:
    retention_windows × that). Continuous triggers only — with
    Trigger.AvailableNow, pending processing-time timers keep the
    query alive indefinitely (same caveat as dedup_refresh_stream's
    evict_state)."""
    keyed = events.select(
        *entity_cols,
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull() & F.col("t_us").isNotNull())
    id_ddl = dict(keyed.dtypes)[id_col]
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    if not emit_corrections:
        return keyed.groupBy(*entity_cols).applyInPandasWithState(
            make_rolling_stats_fn(window_us, id_col, evict_after_ms),
            outputStructType=(
                f"`{id_col}` {id_ddl}, ts_ms BIGINT, n_frame BIGINT, "
                "sum_v DOUBLE, mean_v DOUBLE, min_v DOUBLE, max_v DOUBLE"
            ),
            stateStructType="ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>",
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    if id_ddl not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"emit_corrections requires an integral id column, got "
            f"{id_col}: {id_ddl}"
        )
    return keyed.groupBy(*entity_cols).applyInPandasWithState(
        make_rolling_stats_corrected_fn(
            window_us, id_col, retention_windows, evict_after_ms
        ),
        outputStructType=(
            f"`{id_col}` BIGINT, ts_ms BIGINT, n_frame BIGINT, "
            "sum_v DOUBLE, mean_v DOUBLE, min_v DOUBLE, max_v DOUBLE, "
            "rev BIGINT"
        ),
        stateStructType=(
            "ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>, ids ARRAY<BIGINT>, "
            "seq BIGINT, floor BIGINT"
        ),
        outputMode="append",
        timeoutConf=timeout_conf,
    )
