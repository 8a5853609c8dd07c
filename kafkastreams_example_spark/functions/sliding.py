"""Retract-capable time-RANGE sliding aggregates.

Spark's declarative window aggregates have NO retract path: a sliding
frame re-aggregates from scratch every time its lower bound moves, so a
time-RANGE frame (``RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND
CURRENT ROW``) over a dense stream costs O(n · rows-per-window) — the
repo measured 17.4 s (RANGE) vs 0.83 s (bounded ROWS) for the same
rolling correlation at sf0.1, and the RANGE cost grows with ingest
DENSITY, not just volume (see q_rolling_corr's design record). Flink
and KSQL ship incremental (add/retract) sliding aggregates natively;
this module supplies the equivalent kernel for Spark.

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
  3. frame moments (n, Σx, Σy, Σx², Σy², Σxy) come from global prefix
     sums differenced at the frame bounds — the retract is the
     subtraction. O(n log n) per batch at ANY density.

Numerical discipline (what makes prefix differencing safe here):

  * x (time) is rescaled to DAYS and rebased to its entity's masked
    mean (corr is shift- and scale-invariant; raw epoch-µs magnitudes
    ~1.7e15 would burn half of double's mantissa on a constant
    offset); y is rebased to its entity's masked mean; per-entity
    means come from ``np.bincount`` — no Python per-group loop;
  * zero-variance frames are detected EXACTLY, never by floating-point
    residue: a frame is degenerate in a regressor iff the regressor
    has ZERO value-changes along the masked subsequence inside the
    frame (prefix counts of integer/equality change flags). The
    co-moment identity n·Σx²−(Σx)² cancels catastrophically exactly
    when true variance ~0, so an FP-residual test would misclassify;
    the change-count test cannot.

Cross-engine parity: DuckDB's windowed ``corr`` accumulates
differently (segment-tree merged co-moment states), so results agree
to rounding, not bit-for-bit — callers round (the registry entry uses
6 dp, like the ROWS-frame sibling) and normalize NaN→NULL.

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
    import numpy as np
    import pandas as pd

    w = int(window_us)
    cap = int(history_cap)
    in_cols = list(dict.fromkeys([*entity_cols, t_us_col, y_col, *id_cols]))
    schema = ", ".join(
        f"{c} {t}" for c, t in df.select(*id_cols).dtypes
    ) + f", {out_col} double"

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        """Vectorized frame corr over a batch of COMPLETE entities,
        sorted by (entity, t, tiebreak)."""
        # run-length entity codes over the sorted batch
        n_rows = len(pdf)
        chg_ent = np.zeros(n_rows, dtype=bool)
        for c in entity_cols:
            v = pdf[c].to_numpy()
            chg_ent[1:] |= v[1:] != v[:-1]
        codes = np.cumsum(chg_ent)
        counts = np.bincount(codes)
        if counts.max() > cap:
            bad = int(np.argmax(counts))
            row = pdf.iloc[int(np.searchsorted(codes, bad))]
            ent = {c: row[c] for c in entity_cols}
            raise ValueError(
                f"rolling_corr_range: entity {ent} has {counts.max()} "
                f"rows, over the history_cap of {cap} — the retention "
                "contract this kernel sizes task memory by is violated; "
                "raise the cap consciously or bound the entity's history "
                "upstream"
            )
        t = pdf[t_us_col].to_numpy(np.int64)
        y = pdf[y_col].to_numpy(np.float64)
        m = ~np.isnan(y)
        # entity-offset time axis: gaps exceed the window, so global
        # searchsorted frames can never cross an entity boundary
        t0 = t - t.min()
        step = np.int64(int(t0.max()) + w + 2)
        n_codes = int(codes[-1]) + 1
        if (n_codes) * int(step) >= 1 << 62:
            raise OverflowError(
                "rolling_corr_range: entity-offset time axis would "
                f"overflow int64 ({n_codes} entities x {step} span-µs "
                "step) — shrink the Arrow batch "
                "(spark.sql.execution.arrow.maxRecordsPerBatch)"
            )
        t_adj = t0 + codes * step
        lo = np.searchsorted(t_adj, t_adj - w, side="left")
        hi = np.searchsorted(t_adj, t_adj, side="right")
        # per-entity masked means (bincount — no Python group loop);
        # rebase both regressors: corr is shift-invariant and the
        # co-moment identity needs small magnitudes
        x = t0.astype(np.float64) / US_PER_DAY
        cm = codes[m]
        cnt = np.bincount(cm, minlength=n_codes).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_x = np.bincount(cm, weights=x[m], minlength=n_codes) / cnt
            mean_y = np.bincount(cm, weights=y[m], minlength=n_codes) / cnt
        xr = np.where(m, x - mean_x[codes], 0.0)
        yr = np.where(m, np.nan_to_num(y) - mean_y[codes], 0.0)

        def pref(a):
            p = np.zeros(len(a) + 1)
            np.cumsum(a, out=p[1:])
            return p

        # Frame sums by prefix differencing — but NOT over raw global
        # cumsums: those grow with the whole batch (~50k rows), and
        # differencing a small frame sum out of a large prefix loses
        # the low bits exactly where near-degenerate frames need them
        # (measured: corr = -1.000006 vs the oracle's -1). Instead each
        # moment array is centered by its ENTITY mean before the
        # cumsum — the prefix returns to ~0 at every entity boundary,
        # so its magnitude stays at within-entity excursions — and the
        # exact correction (hi-lo)·μ_entity is added back.
        ent_len = np.bincount(codes, minlength=n_codes).astype(np.float64)
        span = (hi - lo).astype(np.float64)

        def frame_sum(a):
            mu = np.bincount(codes, weights=a, minlength=n_codes) / ent_len
            p = pref(a - mu[codes])
            return (p[hi] - p[lo]) + span * mu[codes]

        # the pair count must stay EXACT (n>=2 gate): cumsum of 0/1
        # doubles is integer-exact below 2^53, so difference it raw
        pn = pref(m.astype(np.float64))
        n = pn[hi] - pn[lo]
        sx, sy = frame_sum(xr), frame_sum(yr)
        sxx, syy = frame_sum(xr * xr), frame_sum(yr * yr)
        sxy = frame_sum(xr * yr)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (n * sxy - sx * sy) / np.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
        # EXACT degeneracy tests over the masked subsequence (see
        # module docstring): zero changes in the frame ⇒ degenerate.
        # A change flag at a masked position compares against the
        # PREVIOUS masked position; the first counted position is
        # clo+1, whose predecessor clo is inside the same entity's
        # frame — cross-entity boundary flags are never counted.
        idx = np.flatnonzero(m)
        tc, yc = t[idx], y[idx]

        def pref_changes(a):
            chg = np.zeros(len(a))
            if len(a) > 1:
                chg[1:] = (a[1:] != a[:-1]).astype(np.float64)
            return pref(chg)

        ptchg, pychg = pref_changes(tc), pref_changes(yc)
        clo = np.searchsorted(idx, lo, side="left")
        chi = np.searchsorted(idx, hi, side="left")
        first_chg = np.minimum(clo + 1, chi)
        x_degenerate = ptchg[chi] - ptchg[first_chg] == 0
        y_degenerate = pychg[chi] - pychg[first_chg] == 0
        ok = (n >= 2) & ~x_degenerate & ~y_degenerate & np.isfinite(corr)
        out = pdf[id_cols].copy()
        out[out_col] = corr
        return out[ok]

    def gen(batches):
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
                    f"rolling_corr_range: entity {ent} exceeds the "
                    f"history_cap of {cap} rows while buffering — the "
                    "retention contract is violated"
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
