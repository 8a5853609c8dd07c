"""Distributed top-r PCA by deflated power iteration — the general form
of the single-component kernel behind ``embedding_pca_scores``.

One principal component is rarely enough for whitening or
SemDeDup-style embedding cleanup, so this module extends the
power-iteration shape to the top r components via Hotelling deflation
(Hotelling 1933; the standard sequential-eigenvector scheme): after
accepting direction x_j with Rayleigh eigenvalue λ_j = x_jᵀ·Cov·x_j,
later components iterate on the deflated operator

    B = Cov − Σ_j λ_j · x_j x_jᵀ,
    B·x = Cov·x − Σ_j λ_j · (x_j·x) · x_j.

The 100 TB shape argument is unchanged from the r=1 kernel: Cov·x is
two corpus aggregates — y = v·x − μ·x per row (a narrow map fused into
the scan) and z_p = Σ v_p·y − μ_p·Σy (one posexplode + d-group partial
agg) — so each iteration is ONE shuffle of d·P partial sums and the
d×d Gram matrix is never materialized. The deflation correction runs
entirely on the DRIVER: x, every accepted x_j, and every λ_j are
d-float vectors/scalars, so B·x costs Cov·x plus O(r·d) driver flops —
no extra cluster pass. Total cluster work for r components:
r·(iters + 1) aggregate passes over a persisted corpus (the +1 is one
Rayleigh pass per accepted direction).

Determinism/oracle story: fixed start x₀ = (1/√d, …), fixed iteration
count, no convergence test — the PROCEDURE is the contract, replicated
step-for-step by an unrolled SQL oracle (queries.SQL_EMBEDDING_PCA_TOPR
is generated from the same recurrence), so cross-engine divergence is
only float-sum ordering inside each aggregate, absorbed by round(.,6)
on the final projections. Accuracy against ground truth (numpy eigh on
a spiked covariance) is pinned ≥0.99 per-component by
tests/test_operators.py::test_pca_topr_recovers_spiked_components.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_mean(emb: DataFrame, dim: int) -> list[float]:
    """Per-position mean of the ``dv`` array column — one posexplode
    aggregate, a dim-float driver collect (bounded by construction)."""
    mu_rows = (
        emb.select(F.posexplode("dv").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    mu = [0.0] * dim
    for r in mu_rows:
        mu[r["pos"]] = r["s"] / r["c"]
    return mu


def _cov_times(emb: DataFrame, mu: list[float], x: list[float], dim: int) -> list[float]:
    """One Cov·x application. Two corpus aggregates, dim-float collect;
    z_p = Σ v_p·y − μ_p·Σy with y = v·x − μ·x."""
    xlit = F.array(*[F.lit(v) for v in x])
    mux = sum(m * v for m, v in zip(mu, x))
    dot = F.aggregate(
        F.zip_with("dv", xlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    rows = (
        emb.select("dv", (dot - F.lit(mux)).alias("y"))
        .select(F.posexplode("dv").alias("pos", "val"), "y")
        .groupBy("pos")
        .agg(
            (F.sum(F.col("val") * F.col("y"))).alias("s"),
            F.sum("y").alias("ysum"),
        )
        .collect()
    )
    z = [0.0] * dim
    for r in rows:
        z[r["pos"]] = r["s"] - mu[r["pos"]] * r["ysum"]
    return z


def power_iteration_topr(
    emb: DataFrame, dim: int, r: int = 1, iters: int = 3
) -> tuple[list[float], list[tuple[list[float], float]]]:
    """Top-r principal directions of the ``dv`` column's covariance by
    deflated power iteration. Returns (mu, [(x_j, λ_j), ...]).

    For r=1 the arithmetic is IDENTICAL to the original
    embedding_pca_scores kernel (empty deflation sum, and the Rayleigh
    pass is skipped entirely — λ is only needed to deflate LATER
    components). Caller is responsible for persisting ``emb`` around
    the r·(iters+1) aggregate passes."""
    mu = corpus_mean(emb, dim)
    accepted: list[tuple[list[float], float]] = []
    for comp in range(r):
        x = [1.0 / math.sqrt(dim)] * dim
        for _ in range(iters):
            z = _cov_times(emb, mu, x, dim)
            # Hotelling deflation — driver-side O(r·d) flops
            for xj, lam in accepted:
                dj = sum(a * b for a, b in zip(xj, x))
                z = [zv - lam * dj * xv for zv, xv in zip(z, xj)]
            nrm = math.sqrt(sum(v * v for v in z)) or 1.0
            x = [v / nrm for v in z]
        if comp < r - 1:
            # Rayleigh eigenvalue λ = xᵀ·Cov·x at the accepted x — one
            # extra pass, only needed when a later component deflates
            w = _cov_times(emb, mu, x, dim)
            lam = sum(a * b for a, b in zip(x, w))
        else:
            lam = float("nan")  # never used
        accepted.append((x, lam))
    return mu, accepted


def project(
    emb: DataFrame,
    mu: list[float],
    directions: list[list[float]],
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Centered projections pc1..pcr onto the given directions — a
    narrow map fused into a fresh scan (no shuffle)."""
    dv = F.transform(vec_col, lambda v: v.cast("double"))
    cols = []
    for i, x in enumerate(directions, start=1):
        xlit = F.array(*[F.lit(v) for v in x])
        mux = sum(m * v for m, v in zip(mu, x))
        dot = F.aggregate(
            F.zip_with(dv, xlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        expr = dot - F.lit(mux)
        if round_to is not None:
            expr = F.round(expr, round_to)
        cols.append(expr.alias(f"pc{i}"))
    return emb.select("vec_id", *cols)
