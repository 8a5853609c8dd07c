"""Retract-capable time-RANGE sliding aggregate (functions/sliding.py).

Spark's declarative sliding frames replay the frame when the lower
bound moves (no retract), so the RANGE form of a rolling metric is
O(n·rows-per-window) — these tests pin the incremental kernel that
replaces it: RANGE-peer frame semantics (ties included), pair-wise NULL
deletion, EXACT zero-variance exclusion, the enforced per-entity
history cap, and density-independence of the algorithm (the wall-clock
probe lives in tools/range_frame_probe.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafkastreams_example_spark.functions.sliding import rolling_corr_range

W = 1_000  # window µs for the synthetic fixtures


def _brute(rows, w=W):
    """Reference: per entity, frame = all rows with t in [t_i-w, t_i]
    (any position — RANGE peers), corr over non-null pairs, NULL when
    n<2 or either variance is 0."""
    out = {}
    by_ent = {}
    for ent, eid, t, y in rows:
        by_ent.setdefault(ent, []).append((eid, t, y))
    for ent, rs in by_ent.items():
        for eid, t, y in rs:
            frame = [
                (tj, yj) for _, tj, yj in rs if t - w <= tj <= t and yj is not None
            ]
            n = len(frame)
            if n < 2:
                continue
            xs = [tj for tj, _ in frame]
            ys = [yj for _, yj in frame]
            mx, my = sum(xs) / n, sum(ys) / n
            vx = sum((x - mx) ** 2 for x in xs)
            vy = sum((y2 - my) ** 2 for y2 in ys)
            if vx == 0 or vy == 0:
                continue
            cov = sum((x - mx) * (y2 - my) for x, y2 in zip(xs, ys))
            out[eid] = cov / math.sqrt(vx * vy)
    return out


def _run(spark, rows, w=W, cap=1_000_000):
    df = spark.createDataFrame(
        [(e, i, t, y) for e, i, t, y in rows],
        "ent BIGINT, eid BIGINT, t_us BIGINT, value DOUBLE",
    )
    got = rolling_corr_range(
        df, ["ent"], "t_us", "value", w, ["eid"], out_col="c",
        history_cap=cap,
    ).collect()
    return {r["eid"]: r["c"] for r in got}


def test_range_semantics_vs_brute_force(spark):
    """Dense/sparse mix, t-ties (RANGE peers — including a LATER row
    tying the current one), interspersed NULLs, multiple entities:
    kernel output must equal the quadratic reference row-for-row."""
    rows = [
        # entity 1: dense cluster + tie pair + a null inside frames
        (1, 1, 100, 1.0),
        (1, 2, 200, 3.0),
        (1, 3, 200, 2.0),      # tie with eid=2: each is the other's peer
        (1, 4, 600, None),     # null y — contributes nothing, gets a row
        (1, 5, 900, 7.0),
        (1, 6, 1150, 4.0),     # frame drops eid=1 (t<150)
        (1, 7, 5000, 9.0),     # isolated — frame n=1, no output
        # entity 2: constant y (y-degenerate frames must be excluded)
        (2, 10, 100, 5.0),
        (2, 11, 300, 5.0),
        (2, 12, 500, 5.0),
        # entity 3: all rows tie on t (x-degenerate)
        (3, 20, 400, 1.0),
        (3, 21, 400, 2.0),
        (3, 22, 400, 3.0),
    ]
    got = _run(spark, rows)
    want = _brute(rows)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for eid, c in want.items():
        assert got[eid] == pytest.approx(c, abs=1e-9), eid
    # the null row DID get an output (its frame holds eids 2,3,5? no —
    # within 1000µs of t=600: t in [.. - 400, 600] → eids 1,2,3)
    assert 4 in got
    # degenerate entities produced nothing
    assert not any(e in got for e in (10, 11, 12, 20, 21, 22))


def test_exact_degeneracy_not_fp_residue(spark):
    """The y-degeneracy test must be EXACT: a frame of equal values at
    a magnitude where the co-moment identity leaves an FP residue
    (n·Σy² − (Σy)² ≠ 0 in doubles for n=3) is still excluded, and a
    frame with a genuinely tiny-but-real y spread is still reported."""
    base = 1.0 / 3.0  # mantissa-full value: 3·fl(b²) ≠ fl((3b)²)/3
    rows = [(1, i, 100 * i, base) for i in range(1, 4)]
    assert _run(spark, rows) == {}
    rows2 = [
        (1, 1, 100, 500.0),
        (1, 2, 200, 500.01),   # 2e-5 relative spread — must survive
        (1, 3, 300, 500.02),
    ]
    got = _run(spark, rows2)
    assert got[3] == pytest.approx(1.0, abs=1e-6)


def test_history_cap_raises_diagnosably(spark):
    """A pathological entity over the cap must fail with the entity
    named in the error, not OOM: the 100 TB degradation contract."""
    rows = [(42, i, 10 * i, float(i % 7)) for i in range(50)]
    with pytest.raises(Exception, match="history_cap|42"):
        _run(spark, rows, cap=10)
    # same data under a sufficient cap computes fine
    assert len(_run(spark, rows, cap=1000)) > 0


def test_registry_entry_matches_rows_frame_on_sparse_data(spark):
    """Sanity link between the two rolling_corr entries: on entities
    whose 24 h frames happen to contain the SAME rows as the trailing
    64-row frame (sparse entities with <=64 rows all inside 24 h),
    the RANGE and ROWS forms agree where both are defined — but only
    when no t-ties reorder frame membership; construct tie-free data."""
    rows = [(1, i, i * 3_600_000_000, float((i * 7) % 13)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "ent BIGINT, eid BIGINT, t_us BIGINT, value DOUBLE"
    )
    got = rolling_corr_range(
        df, ["ent"], "t_us", "value", 86_400_000_000, ["eid"], out_col="c"
    ).collect()
    from pyspark.sql import Window

    w = (
        Window.partitionBy("ent")
        .orderBy("t_us")
        .rangeBetween(-86_400_000_000, 0)
    )
    decl = df.select(
        "eid", F.corr("value", F.col("t_us").cast("double")).over(w).alias("c")
    ).collect()
    want = {
        r["eid"]: r["c"]
        for r in decl
        if r["c"] is not None and not math.isnan(r["c"])
    }
    assert {r["eid"]: pytest.approx(r["c"], abs=1e-9) for r in got} == want


def test_trending_entity_exact_tail_pervasive(spark):
    """A perfectly linear entity puts EVERY frame at corr = 1 exactly —
    the |corr| > 0.999 tail is ALL rows, the regime the round-17
    vectorized recompute (exact_frame_corr) exists for. Every output
    must be exactly 1.0 at machine tolerance (the exact two-pass form
    has no cancellation), and the row set must match brute force."""
    rows = [(1, i, 100 * i, 2.5 * i + 7.0) for i in range(1, 60)]
    rows += [(2, 100 + i, 100 * i, -3.0 * i) for i in range(1, 40)]
    got = _run(spark, rows, w=1_500)
    want = _brute(rows, w=1_500)
    assert set(got) == set(want)
    for eid, c in got.items():
        assert c == pytest.approx(want[eid], abs=1e-12), eid
        assert abs(c) == pytest.approx(1.0, abs=1e-12), eid


def test_exact_frame_corr_vectorized_matches_loop_and_masks_nan():
    """Unit-level pin of the shared exact tail: (a) batched gathers
    (tiny budget forcing multiple batches) equal the per-frame
    two-pass loop; (b) masked rows are excluded; (c) a frame whose
    centered squares underflow to zero (den == 0) returns NaN — the
    signal callers must re-and into their ok mask."""
    import numpy as np

    from kafkastreams_example_spark.functions.sliding import (
        exact_frame_corr,
    )

    rng = np.random.default_rng(7)
    n = 200
    x = np.sort(rng.uniform(0, 100, n))
    y = 3.0 * x + rng.normal(0, 1e-6, n)  # near-perfect trend
    lo = np.maximum(np.arange(n) - rng.integers(2, 40, n), 0)
    hi = np.arange(n) + 1
    m = rng.uniform(size=n) > 0.1
    hits = np.flatnonzero((hi - lo) >= 3)
    got = exact_frame_corr(np, x, y, lo, hi, hits, m=m, budget=64)
    for k, i in enumerate(hits):
        seg = m[lo[i]:hi[i]]
        xs = x[lo[i]:hi[i]][seg]
        ys = y[lo[i]:hi[i]][seg]
        if len(xs) == 0:
            continue
        xs, ys = xs - xs.mean(), ys - ys.mean()
        den = np.sqrt((xs * xs).sum() * (ys * ys).sum())
        want = (xs * ys).sum() / den if den > 0 else np.nan
        if np.isnan(want):
            assert np.isnan(got[k]), i
        else:
            assert got[k] == pytest.approx(want, abs=1e-12), i
    # (c) underflow frame: values change (exact change-count says
    # non-degenerate) but centered squares underflow → den == 0 → NaN
    xs2 = np.array([0.0, 1.0, 2.0])
    ys2 = np.array([1e-200, 2e-200, 3e-200])
    out = exact_frame_corr(
        np, xs2, ys2, np.array([0]), np.array([3]), np.array([0])
    )
    assert np.isnan(out[0])


def test_streaming_corr_ok_mask_refreshed_after_exact_tail(monkeypatch):
    """The defined-corr emission contract must survive the exact-tail
    recompute: if the recompute yields NaN, the row is DROPPED, not
    emitted with corr = NaN (round-17 advice). Pinned by forcing the
    shared tail to return NaN for a frame the prefix path found
    finite."""
    import numpy as np

    from kafkastreams_example_spark.streaming import rolling_corr as rc

    mt = np.array([100, 200, 300], dtype=np.int64)
    mv = np.array([1.0, 2.0, 3.0])
    lo = np.array([0, 0, 0])
    hi = np.array([1, 2, 3])
    corr0, ok0 = rc._corr_over_frames(mt, mv, lo, hi)
    assert list(ok0) == [False, True, True]  # sanity: trend → |corr|=1

    monkeypatch.setattr(
        rc,
        "exact_frame_corr",
        lambda np_, x, y, lo_, hi_, hits, **kw: np.full(
            len(hits), np.nan
        ),
    )
    corr1, ok1 = rc._corr_over_frames(mt, mv, lo, hi)
    assert not ok1.any(), "NaN recompute rows must leave the ok mask"


def test_rolling_range_stats_matches_brute_force(spark):
    """count/sum/mean/std/min/max over the RANGE frame vs a quadratic
    reference — exercises the sparse-table RMQ at power-of-two frame
    lengths, singleton frames, NULL rows inside frames, ties, and an
    all-null entity."""
    from kafkastreams_example_spark.functions.sliding import (
        rolling_range_stats,
    )

    rows = [
        (1, 1, 100, 5.0),
        (1, 2, 150, 2.0),
        (1, 3, 200, None),     # null inside others' frames
        (1, 4, 900, 9.0),
        (1, 5, 950, 9.0),      # tie value
        (1, 6, 1000, 1.0),     # frame of exactly 4 non-null (pow-2)
        (1, 7, 5000, 3.0),     # singleton frame
        (2, 10, 100, None),    # entity with only nulls
        (2, 11, 200, None),
    ]
    df = spark.createDataFrame(
        rows, "ent BIGINT, eid BIGINT, t_us BIGINT, value DOUBLE"
    )
    got = {
        r["eid"]: r
        for r in rolling_range_stats(
            df, ["ent"], "t_us", "value", 1_000, ["eid"]
        ).collect()
    }
    assert set(got) == {r[1] for r in rows}
    for ent, eid, t, _ in rows:
        frame = [
            y for e2, _, t2, y in rows
            if e2 == ent and t - 1_000 <= t2 <= t and y is not None
        ]
        g = got[eid]
        assert g["n_frame"] == len(frame)
        if not frame:
            assert g["sum_v"] is None and g["min_v"] is None
            assert g["max_v"] is None and g["std_v"] is None
            continue
        assert g["sum_v"] == pytest.approx(sum(frame), abs=1e-9)
        assert g["mean_v"] == pytest.approx(
            sum(frame) / len(frame), abs=1e-9
        )
        mu = sum(frame) / len(frame)
        assert g["std_v"] == pytest.approx(
            math.sqrt(sum((v - mu) ** 2 for v in frame) / len(frame)),
            abs=1e-9,
        )
        assert g["min_v"] == min(frame)
        assert g["max_v"] == max(frame)
