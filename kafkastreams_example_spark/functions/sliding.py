"""Retract-capable time-RANGE sliding aggregates.

Spark's declarative window aggregates have NO retract path: a sliding
frame re-aggregates from scratch every time its lower bound moves, so a
time-RANGE frame (``RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND
CURRENT ROW``) over a dense stream costs O(n · rows-per-window) — the
repo measured 17.4 s (RANGE) vs 0.83 s (bounded ROWS) for the same
rolling correlation at sf0.1, and the RANGE cost grows with ingest
DENSITY, not just volume (see q_rolling_corr's design record; the
dedicated probe tools/range_frame_probe.py measures the kernel here
FLAT at 4x density where the declarative form pays exactly 4x, a 257x
gap at 8640-row frames). Under Spark 4's default ANSI mode the
declarative windowed corr additionally THROWS [DIVIDE_BY_ZERO] on
zero-variance frames. Flink and KSQL ship incremental (add/retract)
sliding aggregates natively; this module supplies the equivalent
kernel for Spark.

Physical shape — mapInPandas over entity-clustered data, NOT
groupBy().applyInPandas: per-entity grouped-pandas pays Spark's
per-group Arrow slice + Python call for EVERY entity (measured 10.8 s
at sf0.1 over ~7.5k tiny entities — the overhead, not the math), while
this kernel repartitions by entity hash, sorts within partitions by
(entity, t), and processes whole Arrow batches with the math
vectorized ACROSS entities:

  1. entities are run-length encoded (change-flag cumsum over the
     sorted batch); an entity spanning a batch boundary is carried
     into the next batch, so memory is O(batch + largest entity);
  2. each entity's t is offset by entity_code · (span + W + 2) — the
     gap exceeds the window, so ONE global ``np.searchsorted`` per
     bound finds every row's frame without frames ever crossing an
     entity boundary;
  3. frame moments (n, Σy, Σy², and for corr Σx, Σx², Σxy) come from
     global prefix sums differenced at the frame bounds — the retract
     is the subtraction. O(n log n) per batch at ANY density.

Numerical discipline (what makes prefix differencing safe here):

  * second-moment inputs are rebased to their entity's masked mean
    before the cumsum (the co-moment identity n·Σa²−(Σa)² cancels
    catastrophically at large magnitudes; raw global cumsums
    measurably lost low bits — corr −1.000006 vs the oracle's −1) and
    the prefix itself is re-centered per entity so it returns to ~0 at
    every entity boundary, with the exact (hi−lo)·μ correction added
    back;
  * zero-variance frames are detected EXACTLY, never by floating-point
    residue: a frame is degenerate in a regressor iff the regressor
    has ZERO value-changes along the masked subsequence inside the
    frame (prefix counts of integer/equality change flags).

Cross-engine parity: DuckDB's windowed aggregates accumulate
differently (segment-tree merged states), so results agree to
rounding, not bit-for-bit — callers round (the registry entries use
6 dp) and normalize NaN→NULL.

100 TB shape: one exchange on the entity key (partition count grows
with entity cardinality, which grows with the data), task memory
O(Arrow batch + largest entity history) — the same retention-bounded-
history contract as q_ewma/q_sequence_match, ENFORCED via
``history_cap`` (a pathological entity raises a diagnosable error
naming itself instead of OOMing the task).

No reference-repo counterpart (SURVEY.md §2c extension surface);
public precedent: Flink's sliding-window incremental aggregation,
Hirzel et al. "Sliding-Window Aggregation Algorithms" (DEBS'17
tutorial — the prefix-sum/two-stack family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000.0

#: Ceiling on per-entity history a single task will hold (rows). The
#: testdata contract keeps per-entity history ~66 rows at every SF;
#: the cap is generous headroom above that, and small enough that a
#: violating entity fails fast with a clear message instead of an OOM.
DEFAULT_HISTORY_CAP = 1_000_000


def sparse_range_minmax(y_mn, y_mx, lo, hi):
    """EXACT range min/max over arbitrary (possibly overlapping)
    half-open ranges [lo, hi) — prefix sums can't express order
    statistics, so this is a SPARSE TABLE (Bender/Farach-Colton RMQ):
    L = ⌈log₂ n⌉ levels of strided np.minimum/np.maximum, every range
    answered by two overlapping power-of-two blocks — O(n log n)
    build, O(1) per range, no Python loop over rows. ``y_mn``/``y_mx``
    are the value arrays with excluded positions pre-filled +inf/−inf;
    empty ranges return (+inf, −inf). Shared by the batch kernel
    (_FrameCtx.frame_minmax) and the streaming rolling-stats state
    processor."""
    import numpy as np

    lens = hi - lo
    n = len(y_mn)
    levels_mn, levels_mx = [y_mn], [y_mx]
    size = 1
    while size * 2 <= n:
        prev_mn, prev_mx = levels_mn[-1], levels_mx[-1]
        m_ = len(prev_mn) - size
        levels_mn.append(np.minimum(prev_mn[:m_], prev_mn[size:]))
        levels_mx.append(np.maximum(prev_mx[:m_], prev_mx[size:]))
        size *= 2
    k = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    k[nz] = np.floor(np.log2(lens[nz])).astype(np.int64)
    # guard against float log rounding at exact powers of two
    k = np.minimum(k, len(levels_mn) - 1)
    too_big = (1 << k) > np.maximum(lens, 1)
    k[too_big] -= 1
    blk = 1 << k
    out_mn = np.full(len(lens), np.inf)
    out_mx = np.full(len(lens), -np.inf)
    for kk in range(len(levels_mn)):
        sel = nz & (k == kk)
        if not sel.any():
            continue
        l_, r_ = lo[sel], hi[sel] - blk[sel]
        out_mn[sel] = np.minimum(levels_mn[kk][l_], levels_mn[kk][r_])
        out_mx[sel] = np.maximum(levels_mx[kk][l_], levels_mx[kk][r_])
    return out_mn, out_mx


def exact_frame_corr(np, x, y, lo, hi, hits, m=None, budget=1 << 22):
    """EXACT two-pass frame-mean-centered Pearson corr for the
    |corr| → 1 near-degenerate tail — VECTORIZED (round-17 advice):
    for rolling corr of value vs TIME, a trending entity sits at
    |corr| → 1 pervasively, so the tail can be MOST rows and a
    per-row Python loop doing O(frame) work per hit degrades to
    O(rows · frame) — the exact scale cliff the prefix kernel exists
    to avoid. Frames are instead gathered into padded (rows × max_len)
    matrices and reduced with masked numpy row-ops; batches bound the
    gather at ~``budget`` elements, so peak memory is
    O(max(budget, longest_frame)) × ~7 float64 temporaries — a single
    frame longer than the budget is still gathered whole (the batch
    degenerates to that one row of frame_len elements; chunking within
    a frame would need running-sum reductions this exact two-pass
    centering deliberately avoids). Worst case cost is
    O(tail_rows · frame) in NUMPY flops — same asymptotics as the
    loop, ~100× the constant.

    ``x``/``y`` are the full (batch-local) regressor arrays, ``lo``/
    ``hi`` the per-row frame bounds, ``hits`` the row indices to
    recompute, ``m`` an optional validity mask over rows (None = all
    valid — the streaming face dead-letters NULLs upstream). Returns
    corr values aligned to ``hits``; NaN when the frame is
    value-degenerate under exact two-pass centering (den == 0, e.g.
    (v − mean)² underflow) — CALLERS MUST re-and their ok mask with
    isfinite afterwards (the defined-corr emission contract)."""
    out = np.empty(len(hits))
    lo_h = np.asarray(lo)[hits].astype(np.int64)
    hi_h = np.asarray(hi)[hits].astype(np.int64)
    lens = hi_h - lo_h
    start = 0
    while start < len(hits):
        # grow the batch until rows × max_len would exceed the budget
        max_len = int(lens[start])
        end = start + 1
        while end < len(hits):
            cand = max(max_len, int(lens[end]))
            if (end - start + 1) * cand > budget:
                break
            max_len, end = cand, end + 1
        max_len = max(max_len, 1)
        offs = np.arange(max_len, dtype=np.int64)
        idx = lo_h[start:end, None] + offs[None, :]
        valid = offs[None, :] < lens[start:end, None]
        idx = np.minimum(idx, len(x) - 1)  # clip pad lanes, masked out
        w = valid if m is None else (valid & m[idx])
        cnt = w.sum(axis=1)
        cnt_safe = np.maximum(cnt, 1)
        xs = np.where(w, x[idx], 0.0)
        ys = np.where(w, y[idx], 0.0)
        xc = np.where(w, xs - (xs.sum(axis=1) / cnt_safe)[:, None], 0.0)
        yc = np.where(w, ys - (ys.sum(axis=1) / cnt_safe)[:, None], 0.0)
        den = np.sqrt((xc * xc).sum(axis=1) * (yc * yc).sum(axis=1))
        with np.errstate(invalid="ignore", divide="ignore"):
            c = (xc * yc).sum(axis=1) / den
        out[start:end] = np.where(den > 0.0, c, np.nan)
        start = end
    return out


class _FrameCtx:
    """Everything a RANGE-frame aggregate needs for one batch of
    complete entities, precomputed once: entity codes, frame bounds
    (lo/hi), exact masked pair count n, and the entity-centered
    ``frame_sum`` / exact ``degenerate`` primitives."""

    def __init__(self, pdf, entity_cols, t_us_col, y_col, window_us, cap, where):
        import numpy as np

        self.np = np
        self.pdf = pdf
        n_rows = len(pdf)
        chg_ent = np.zeros(n_rows, dtype=bool)
        for c in entity_cols:
            v = pdf[c].to_numpy()
            chg_ent[1:] |= v[1:] != v[:-1]
        self.codes = codes = np.cumsum(chg_ent)
        counts = np.bincount(codes)
        if counts.max() > cap:
            bad = int(np.argmax(counts))
            row = pdf.iloc[int(np.searchsorted(codes, bad))]
            ent = {c: row[c] for c in entity_cols}
            raise ValueError(
                f"{where}: entity {ent} has {counts.max()} rows, over "
                f"the history_cap of {cap} — the retention contract "
                "this kernel sizes task memory by is violated; raise "
                "the cap consciously or bound the entity's history "
                "upstream"
            )
        self.t = t = pdf[t_us_col].to_numpy(np.int64)
        self.y = y = pdf[y_col].to_numpy(np.float64)
        self.m = m = ~np.isnan(y)
        # entity-offset time axis: gaps exceed the window, so global
        # searchsorted frames can never cross an entity boundary
        self.t0 = t0 = t - t.min()
        step = np.int64(int(t0.max()) + window_us + 2)
        self.n_codes = n_codes = int(codes[-1]) + 1
        if n_codes * int(step) >= 1 << 62:
            raise OverflowError(
                f"{where}: entity-offset time axis would overflow "
                f"int64 ({n_codes} entities x {step} span-µs step) — "
                "shrink the Arrow batch "
                "(spark.sql.execution.arrow.maxRecordsPerBatch)"
            )
        t_adj = t0 + codes * step
        self.lo = np.searchsorted(t_adj, t_adj - window_us, side="left")
        self.hi = np.searchsorted(t_adj, t_adj, side="right")
        self._span = (self.hi - self.lo).astype(np.float64)
        self._ent_len = np.bincount(codes, minlength=n_codes).astype(
            np.float64
        )
        # the pair count must stay EXACT (n>=1/2 gates): cumsum of 0/1
        # doubles is integer-exact below 2^53, so difference it raw
        pn = self.pref(m.astype(np.float64))
        self.n = pn[self.hi] - pn[self.lo]
        # per-entity masked mean of y, for mean-rebasing second moments
        cm = codes[m]
        cnt = np.bincount(cm, minlength=n_codes).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            self.mean_y_ent = (
                np.bincount(cm, weights=y[m], minlength=n_codes) / cnt
            )
            self.mean_x_ent = (
                np.bincount(
                    cm,
                    weights=(t0.astype(np.float64) / US_PER_DAY)[m],
                    minlength=n_codes,
                )
                / cnt
            )

    def pref(self, a):
        p = self.np.zeros(len(a) + 1)
        self.np.cumsum(a, out=p[1:])
        return p

    def frame_sum(self, a):
        """Frame sums by prefix differencing — but NOT over raw global
        cumsums: those grow with the whole batch (~50k rows), and
        differencing a small frame sum out of a large prefix loses the
        low bits exactly where near-degenerate frames need them
        (measured: corr = -1.000006 vs the oracle's -1). Each moment
        array is centered by its ENTITY mean before the cumsum — the
        prefix returns to ~0 at every entity boundary — and the exact
        (hi−lo)·μ correction is added back."""
        np = self.np
        mu = (
            np.bincount(self.codes, weights=a, minlength=self.n_codes)
            / self._ent_len
        )
        p = self.pref(a - mu[self.codes])
        return (p[self.hi] - p[self.lo]) + self._span * mu[self.codes]

    def frame_minmax(self):
        """EXACT per-frame min/max of y over the masked rows — see
        sparse_range_minmax (the RMQ is shared with the streaming
        face). Masked-out rows are filled with ±inf; a frame with zero
        masked rows surfaces ±inf (callers NULL it via n == 0)."""
        np = self.np
        y_mn = np.where(self.m, np.nan_to_num(self.y), np.inf)
        y_mx = np.where(self.m, np.nan_to_num(self.y), -np.inf)
        return sparse_range_minmax(y_mn, y_mx, self.lo, self.hi)

    def degenerate(self, values):
        """EXACT zero-variance test over the masked subsequence (never
        FP residue of the co-moment identity): a frame is degenerate
        iff ``values`` has ZERO changes along the masked rows inside
        it. A change flag at a masked position compares against the
        PREVIOUS masked position; the first counted position is clo+1,
        whose predecessor clo is inside the same entity's frame —
        cross-entity boundary flags are never counted."""
        np = self.np
        idx = np.flatnonzero(self.m)
        vc = values[idx]
        chg = np.zeros(len(vc))
        if len(vc) > 1:
            chg[1:] = (vc[1:] != vc[:-1]).astype(np.float64)
        pchg = self.pref(chg)
        clo = np.searchsorted(idx, self.lo, side="left")
        chi = np.searchsorted(idx, self.hi, side="left")
        first_chg = np.minimum(clo + 1, chi)
        return pchg[chi] - pchg[first_chg] == 0


def _range_kernel(
    df: DataFrame,
    entity_cols: list[str],
    t_us_col: str,
    y_col: str,
    window_us: int,
    id_cols: list[str],
    history_cap: int,
    out_schema_suffix: str,
    emit,
    where: str,
) -> DataFrame:
    """Shared scaffold for time-RANGE sliding aggregates: entity-hash
    repartition + (entity, t, tiebreak) within-partition sort feeding
    mapInPandas, entity runs carried across Arrow-batch boundaries,
    per-batch _FrameCtx handed to ``emit(ctx) -> output pdf``."""
    import pandas as pd

    w = int(window_us)
    cap = int(history_cap)
    in_cols = list(dict.fromkeys([*entity_cols, t_us_col, y_col, *id_cols]))
    schema = ", ".join(
        f"{c} {t}" for c, t in df.select(*id_cols).dtypes
    ) + f", {out_schema_suffix}"

    def process(pdf):
        return emit(
            _FrameCtx(pdf, entity_cols, t_us_col, y_col, w, cap, where)
        )

    def gen(batches):
        import numpy as np

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # hold back the trailing entity — it may continue in the
            # next batch of this sorted partition
            last = pdf.iloc[-1]
            tail_mask = np.ones(len(pdf), dtype=bool)
            for c in entity_cols:
                tail_mask &= pdf[c].to_numpy() == last[c]
            # tail rows are contiguous at the end (sorted by entity)
            n_tail = int(tail_mask[::-1].cumprod().sum())
            if n_tail > cap:
                ent = {c: last[c] for c in entity_cols}
                raise ValueError(
                    f"{where}: entity {ent} exceeds the history_cap of "
                    f"{cap} rows while buffering — the retention "
                    "contract is violated"
                )
            head = pdf.iloc[: len(pdf) - n_tail]
            carry = pdf.iloc[len(pdf) - n_tail :]
            if len(head):
                yield process(head)
        if carry is not None and len(carry):
            yield process(carry)

    clustered = (
        df.select(*in_cols)
        .repartition(*[F.col(c) for c in entity_cols])
        .sortWithinPartitions(*entity_cols, t_us_col, *id_cols)
    )
    return clustered.mapInPandas(gen, schema)


def rolling_corr_range(
    df: DataFrame,
    entity_cols: list[str],
    t_us_col: str,
    y_col: str,
    window_us: int,
    id_cols: list[str],
    out_col: str = "corr",
    history_cap: int = DEFAULT_HISTORY_CAP,
) -> DataFrame:
    """Per-entity rolling Pearson correlation of ``y`` against time
    over a TRUE time-RANGE trailing frame of ``window_us``
    microseconds: for each row, corr over all rows of the same entity
    with t ∈ [tᵢ − W, tᵢ] (peers included, per RANGE semantics).

    Returns one row per input row whose frame corr is defined
    (n ≥ 2 pairs, both variances non-degenerate), with columns
    ``id_cols + [out_col]`` — out_col is the UNROUNDED double; callers
    apply their own rounding shield. NULL ``y`` rows contribute
    nothing to any frame but still get an output row when their frame
    has ≥2 pairs (pair-wise deletion, matching SQL corr).
    """

    def emit(ctx):
        np = ctx.np
        # rebase both regressors: corr is shift-invariant and the
        # co-moment identity needs small magnitudes
        x = ctx.t0.astype(np.float64) / US_PER_DAY
        xr = np.where(ctx.m, x - ctx.mean_x_ent[ctx.codes], 0.0)
        yr = np.where(
            ctx.m, np.nan_to_num(ctx.y) - ctx.mean_y_ent[ctx.codes], 0.0
        )
        n = ctx.n
        sx, sy = ctx.frame_sum(xr), ctx.frame_sum(yr)
        sxx, syy = ctx.frame_sum(xr * xr), ctx.frame_sum(yr * yr)
        sxy = ctx.frame_sum(xr * yr)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (n * sxy - sx * sy) / np.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
        ok = (
            (n >= 2)
            & ~ctx.degenerate(ctx.t)
            & ~ctx.degenerate(ctx.y)
            & np.isfinite(corr)
        )
        # NEAR-DEGENERATE frames (|corr| → 1, e.g. any 2-point frame,
        # whose true corr is EXACTLY ±1) are the one regime where the
        # co-moment identity's cancellation survives entity-centering:
        # the sf0.1 full sweep measured -0.999999 against the oracle's
        # -1 (the 6 dp shield cannot absorb an absolute error that
        # brushes the 6th decimal at the |corr|=1 boundary). Those
        # rows are recomputed EXACTLY: two-pass, frame-mean-centered
        # over the frame slice — the textbook-stable form. The tail
        # can be MOST rows (value-vs-time corr of a trending entity),
        # so the recompute is vectorized with bounded memory
        # (exact_frame_corr), never a per-row Python loop; mid-range
        # frames stay on the O(1)-per-row prefix path, where the
        # centered-prefix error is orders below the shield.
        hits = np.flatnonzero(ok & (np.abs(corr) > 0.999))
        if len(hits):
            corr[hits] = exact_frame_corr(
                np, x, np.nan_to_num(ctx.y), ctx.lo, ctx.hi, hits, m=ctx.m
            )
            # the recompute can yield NaN (den == 0 via (v-mean)^2
            # underflow): re-and the mask so the defined-corr emission
            # contract survives the exact tail (round-17 advice)
            ok &= np.isfinite(corr)
        out = ctx.pdf[id_cols].copy()
        out[out_col] = corr
        return out[ok]

    return _range_kernel(
        df, entity_cols, t_us_col, y_col, window_us, id_cols,
        history_cap, f"{out_col} double", emit, "rolling_corr_range",
    )


def rolling_range_stats(
    df: DataFrame,
    entity_cols: list[str],
    t_us_col: str,
    y_col: str,
    window_us: int,
    id_cols: list[str],
    history_cap: int = DEFAULT_HISTORY_CAP,
) -> DataFrame:
    """Per-entity rolling (count, sum, mean, population std, min, max)
    of ``y`` over the same TRUE time-RANGE trailing frame as
    ``rolling_corr_range`` — the standard-aggregate face of the
    retract-capable kernel (one pass computes all six; the declarative
    RANGE form replays the frame per row for each). Moments come from
    the prefix machinery; min/max — which prefix sums cannot express —
    from a sparse-table RMQ (O(n log n) build, O(1) per row, see
    _FrameCtx.frame_minmax).

    Output per input row: id_cols + n_frame (BIGINT, non-null count),
    sum_v / mean_v / std_v / min_v / max_v (unrounded doubles, NULL
    when n_frame = 0; std is exact 0 for a value-degenerate frame via
    the change-count test; min/max are exact selections). Callers
    round the moments; min/max need no shield.
    """

    def emit(ctx):
        np = ctx.np
        n = ctx.n
        # sum/mean are NOT shift-invariant: compute on raw y (masked);
        # magnitudes are data-scale, safe without rebasing at the
        # callers' rounding. std IS shift-invariant: rebased moments.
        y_raw = np.where(ctx.m, np.nan_to_num(ctx.y), 0.0)
        s_raw = ctx.frame_sum(y_raw)
        yr = np.where(
            ctx.m, np.nan_to_num(ctx.y) - ctx.mean_y_ent[ctx.codes], 0.0
        )
        sy, syy = ctx.frame_sum(yr), ctx.frame_sum(yr * yr)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s_raw / n
            var = np.maximum(syy / n - (sy / n) ** 2, 0.0)
        std = np.sqrt(var)
        # a value-degenerate frame has EXACTLY zero variance — pin it
        # (the FP residue would round to 0 at 6 dp, but exact is exact)
        std = np.where(ctx.degenerate(ctx.y), 0.0, std)
        empty = n == 0
        out = ctx.pdf[id_cols].copy()
        out["n_frame"] = n.astype(np.int64)

        def nullable(vals):
            # pandas nullable Float64 → Spark NULL (a plain float64 NaN
            # would arrive as NaN, which is NOT the SQL NULL the
            # aggregates return over an empty frame)
            import pandas as pd

            a = pd.array(np.nan_to_num(vals), dtype="Float64")
            a[empty] = pd.NA
            return a

        out["sum_v"] = nullable(s_raw)
        out["mean_v"] = nullable(mean)
        out["std_v"] = nullable(std)
        mn, mx = ctx.frame_minmax()
        out["min_v"] = nullable(mn)
        out["max_v"] = nullable(mx)
        return out

    return _range_kernel(
        df, entity_cols, t_us_col, y_col, window_us, id_cols,
        history_cap,
        "n_frame bigint, sum_v double, mean_v double, std_v double, "
        "min_v double, max_v double",
        emit, "rolling_range_stats",
    )
