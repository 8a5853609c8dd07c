"""Streaming face of the retract-capable time-RANGE rolling
CORRELATION kernel (functions/sliding.py::rolling_corr_range): per
event, the Pearson correlation of its entity's trailing ``window_us``
of (t, value) pairs — continuously, over a micro-batch stream, via
applyInPandasWithState.

Same execution shape as streaming/rolling_stats.py (the one-series
face): Structured Streaming has no per-EVENT trailing-frame (OVER)
aggregation, so state per entity is the retention-pruned (t, v)
timeline, and each (entity, micro-batch) merges state with the batch's
rows, finds every incoming row's frame with one searchsorted pair, and
prices the corr from prefix-differenced co-moments — O(b log(b+s)) per
batch, never O(rows · frame). The numerical discipline is the batch
kernel's: both regressors are REBASED (x by the merged timeline's
mean after scaling to days, y likewise — corr is shift-invariant, and
the co-moment identity needs small magnitudes), and zero-variance
frames are detected EXACTLY via change-count prefixes, never from the
FP residue of n·Sxx − Sx².

Emission contract matches the batch kernel: a row is emitted only when
its frame corr is DEFINED (n ≥ 2, both regressors non-degenerate,
finite) — so on an event-time-ordered stream the output equals
rolling_corr_range row-for-row (pinned across micro-batch boundaries
in tests/test_streaming.py). NULL-value rows are dead-lettered, the
one documented divergence (the batch kernel pair-deletes them but
still reports them; streaming state must not hold non-contributing
rows — same note as rolling_stats_stream). Out-of-order rows follow
the module-wide emit-on-arrival semantics: a late event's frame is
computed over the rows that have ARRIVED (state as-of its batch plus
batch peers at or before its event time), and already-emitted rows are
never retracted — divergence from the batch kernel is bounded to
frames whose window-mates arrive later (see
streaming/rolling_stats.py and the round-14 out-of-order tests).

100 TB shape: rows shuffle once on the entity key; state per key is
O(rows inside one window), RocksDB-backed; numpy work is per
(entity, batch) with no Python row loop.

No reference-repo counterpart (SURVEY.md §2c extension surface);
public precedent: Flink OVER-window aggregations; Hirzel et al.
DEBS'17 (sliding-window aggregation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.sliding import US_PER_DAY, exact_frame_corr
from ._evict import arm, expired

DEFAULT_WINDOW_US = 86_400_000_000  # 24 h


def _corr_over_frames(mt, mv, lo, hi):
    """Shared frame algebra of both emission tiers: given the merged
    (time, value) timeline and each emission's frame slice [lo, hi),
    return (corr, ok) — the rebased prefix-differenced Pearson corr
    and the defined-corr mask (n >= 2, both regressors exactly
    non-degenerate via change-count prefixes, finite)."""
    import numpy as np

    n = (hi - lo).astype(np.float64)

    def pref(a):
        p = np.zeros(len(a) + 1)
        np.cumsum(a, out=p[1:])
        return p

    # rebase both regressors by the merged timeline's means: corr is
    # shift-invariant and the co-moment identity loses exactly the low
    # bits near-degenerate frames need at raw magnitudes
    x = mt.astype(np.float64) / US_PER_DAY
    xr = x - x.mean()
    yr = mv - mv.mean()
    px, py = pref(xr), pref(yr)
    pxx, pyy, pxy = pref(xr * xr), pref(yr * yr), pref(xr * yr)
    sx, sy = px[hi] - px[lo], py[hi] - py[lo]
    sxx, syy = pxx[hi] - pxx[lo], pyy[hi] - pyy[lo]
    sxy = pxy[hi] - pxy[lo]
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    def degenerate(vals):
        # EXACT zero-variance test: a frame is degenerate iff vals has
        # ZERO changes inside it (change-count prefixes — never the FP
        # residue of the co-moment identity)
        chg = np.zeros(len(vals))
        if len(vals) > 1:
            chg[1:] = (vals[1:] != vals[:-1]).astype(np.float64)
        p = pref(chg)
        first = np.minimum(lo + 1, hi)
        return p[hi] - p[first] == 0

    ok = (
        (n >= 2)
        & ~degenerate(mt)
        & ~degenerate(mv)
        & np.isfinite(corr)
    )
    # NEAR-DEGENERATE frames (|corr| → 1; any 2-point frame is exactly
    # ±1) are where the co-moment identity's cancellation survives the
    # timeline rebase — the same regime the batch kernel's sf0.1 sweep
    # caught at 6 dp (functions/sliding.py). Recompute those rows
    # exactly: two-pass, frame-mean-centered, via the shared
    # VECTORIZED tail (the tail can be most rows for a trending
    # entity — no per-row Python loop); mid-range frames stay on the
    # O(1)-per-row prefix path. The recompute can yield NaN (den == 0
    # underflow) — re-and the mask so the defined-corr emission
    # contract holds (round-17 advice).
    hits = np.flatnonzero(ok & (np.abs(corr) > 0.999))
    if len(hits):
        corr[hits] = exact_frame_corr(np, x, mv, lo, hi, hits)
        ok &= np.isfinite(corr)
    return corr, ok


def corr_kernel(st_, sv, batch: pd.DataFrame, id_col: str, window_us: int):
    """The per-(entity, batch) kernel of the plain corr tier, state-
    backend-agnostic — shared by the applyInPandasWithState wrapper
    below and the transformWithStateInPandas processor
    (rolling_corr_tws.py), the same split rolling_stats.stats_kernel
    and dedup_refresh.probe_and_remember give their faces.

    Input: the key's retained timeline arrays (empty for a fresh key)
    and the batch rows (t_us, value, id_col). Returns (out, kept_ts,
    kept_vs) — ``out`` already filtered to defined-corr rows (n ≥ 2,
    both regressors exactly non-degenerate, finite), the emission
    contract of the batch kernel."""
    import numpy as np

    batch = batch.sort_values(["t_us", id_col], kind="mergesort")
    bt = batch["t_us"].to_numpy(np.int64)
    st_ = np.asarray(st_, dtype=np.int64)
    sv = np.asarray(sv, dtype=np.float64)
    mt = np.concatenate([st_, bt])
    mv = np.concatenate([sv, batch["value"].to_numpy(np.float64)])
    order = np.argsort(mt, kind="mergesort")
    mt, mv = mt[order], mv[order]
    lo = np.searchsorted(mt, bt - window_us, side="left")
    hi = np.searchsorted(mt, bt, side="right")
    corr, ok = _corr_over_frames(mt, mv, lo, hi)
    out = pd.DataFrame(
        {
            id_col: batch[id_col].to_numpy(),
            "ts_ms": (bt // 1000).astype(np.int64),
            "n_frame": (hi - lo).astype(np.int64),
            "corr": corr,
        }
    )[np.asarray(ok, dtype=bool)]
    keep = mt >= mt[-1] - window_us  # per-key retention horizon
    return out, mt[keep], mv[keep]


def make_rolling_corr_fn(
    window_us: int, id_col: str, evict_after_ms: int | None = None
):
    """Per-entity stateful function: state = (ts ARRAY<BIGINT>,
    vs ARRAY<DOUBLE>) — the retention-pruned (t, value) timeline
    (identical layout to rolling_stats_stream's plain tier, pinned by
    tests/test_streaming.py's checkpoint-share test: a checkpoint
    written by one face restores under the other).

    ``evict_after_ms``: idle-key eviction, same contract as
    rolling_stats.make_rolling_stats_fn (round-15 verdict item 1) —
    a key idle that long in processing time is dropped; a revived
    entity restarts from an empty timeline per emit-on-arrival."""

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
        st_, sv = state.get if state.exists else ((), ())
        out, kt, kv = corr_kernel(st_, sv, batch, id_col, window_us)
        state.update((kt.tolist(), kv.tolist()))
        arm(state, evict_after_ms)
        yield out

    return fn


def make_rolling_corr_corrected_fn(
    window_us: int,
    id_col: str,
    retention_windows: int = 2,
    evict_after_ms: int | None = None,
):
    """CORRECTED-EMISSION variant of the corr face — same contract as
    rolling_stats.make_rolling_stats_corrected_fn: state adds row ids
    and a per-key ``rev``; a late event re-emits the state rows whose
    trailing frame it falls into (t ∈ [t_late, t_late + W]),
    recomputed over the merged timeline; downstream keeps max(rev)
    per id and converges to the batch kernel within the retention
    horizon. Emission keeps the defined-corr contract — a correction
    can therefore APPEAR for a row that previously emitted nothing
    (its frame reached n ≥ 2 / non-degeneracy only once the late peer
    arrived), which is exactly the batch kernel's row set.

    ``evict_after_ms``: idle-key eviction, same contract and rev-reset
    caveat as rolling_stats.make_rolling_stats_corrected_fn — rev
    values are comparable only within one eviction-free epoch; size
    the timeout past the lateness AND redelivery horizons."""

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
        out, new_state = corrected_corr_kernel(
            st5, batch, id_col, window_us, retention_windows
        )
        state.update(new_state)
        arm(state, evict_after_ms)
        yield out

    return fn


def corrected_corr_kernel(
    st5,
    batch: pd.DataFrame,
    id_col: str,
    window_us: int,
    retention_windows: int = 2,
):
    """The per-(entity, batch) kernel of the CORRECTED corr tier,
    state-backend-agnostic — shared by the applyInPandasWithState
    wrapper above and the transformWithStateInPandas processor
    (rolling_corr_tws.py); the corr analogue of
    rolling_stats.corrected_stats_kernel. ``st5`` = (ts, vs, ids,
    seq, floor) or None. Returns (out, new_st5) with ``out`` already
    filtered to defined-corr rows."""
    import numpy as np

    batch = batch.sort_values(["t_us", id_col], kind="mergesort")
    bt = batch["t_us"].to_numpy(np.int64)
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
    if st_.size and bt.size:
        pos = np.searchsorted(bt, st_ - window_us, side="left")
        affected = (pos < bt.size) & (
            bt[np.minimum(pos, bt.size - 1)] <= st_
        )
    else:
        affected = np.zeros(st_.size, dtype=bool)
    # suppress corrections whose frame reaches below the prune
    # floor — a truncated recompute would outrank a better earlier
    # emission (same rule as rolling_stats' corrected tier)
    affected &= (st_ - window_us) >= floor
    mt = np.concatenate([st_, bt])
    mv = np.concatenate([sv, batch["value"].to_numpy(np.float64)])
    mi = np.concatenate([sids, bi])
    order = np.argsort(mt, kind="mergesort")
    mt, mv, mi = mt[order], mv[order], mi[order]
    emit_t = np.concatenate([st_[affected], bt])
    emit_i = np.concatenate([sids[affected], bi])
    lo = np.searchsorted(mt, emit_t - window_us, side="left")
    hi = np.searchsorted(mt, emit_t, side="right")
    corr, ok = _corr_over_frames(mt, mv, lo, hi)
    out = pd.DataFrame(
        {
            id_col: emit_i,
            "ts_ms": (emit_t // 1000).astype(np.int64),
            "n_frame": (hi - lo).astype(np.int64),
            "corr": corr,
            "rev": np.full(len(emit_i), seq, dtype=np.int64),
        }
    )[np.asarray(ok, dtype=bool)]
    # retain 2W so correctable rows keep complete frames (same
    # review finding as rolling_stats)
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


def rolling_corr_stream(
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
    """Wire the per-event trailing-window corr over a stream: rows
    with NULL value or NULL event time are dead-lettered (dropped);
    output per input row whose frame corr is defined: id_col, ts_ms,
    n_frame, corr. ``emit_corrections=True`` selects the
    corrected-emission tier (adds a per-key ``rev``; max(rev) per id
    converges to the batch kernel within the retention horizon;
    requires an integral id column). ``evict_after_ms`` bounds state
    on churning keyspaces — idle keys are dropped after that much
    processing time; continuous triggers only (pending timers keep
    AvailableNow queries alive — see rolling_stats_stream)."""
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
            make_rolling_corr_fn(window_us, id_col, evict_after_ms),
            outputStructType=(
                f"`{id_col}` {id_ddl}, ts_ms BIGINT, n_frame BIGINT, "
                "corr DOUBLE"
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
        make_rolling_corr_corrected_fn(
            window_us, id_col, retention_windows, evict_after_ms
        ),
        outputStructType=(
            f"`{id_col}` BIGINT, ts_ms BIGINT, n_frame BIGINT, "
            "corr DOUBLE, rev BIGINT"
        ),
        stateStructType=(
            "ts ARRAY<BIGINT>, vs ARRAY<DOUBLE>, ids ARRAY<BIGINT>, "
            "seq BIGINT, floor BIGINT"
        ),
        outputMode="append",
        timeoutConf=timeout_conf,
    )
