"""Distributed top-r PCA by block subspace iteration — the general
form of the single-component power-iteration kernel behind
``embedding_pca_scores``.

One principal component is rarely enough for whitening or
SemDeDup-style embedding cleanup. Round 12 first landed the classic
sequential Hotelling deflation (one component at a time, r·(iters+1)
corpus passes); this block form replaces it because it computes the
SAME subspace in (iters) passes total: each iteration applies Cov to
the whole r-column block in ONE corpus pass — the per-row y_c = v·x_c
− μ·x_c maps and the per-position z sums for all r columns batch into
a single select + single posexplode aggregate — then re-orthonormalizes
the block on the DRIVER by classical Gram-Schmidt (orthogonal/subspace
iteration; Golub & Van Loan §8.2.4). Measured at sf0.1: 2.94 s
(deflation) → ~1.4 s (block), and at 100 TB the pass count is the
whole cost.

The 100 TB shape argument is unchanged from the r=1 kernel: Cov·X is
two fused corpus aggregates — r narrow y maps fused into the scan and
one posexplode + d-group agg emitting 2r partial sums per position —
so each iteration is ONE shuffle of d·P·O(r) partial sums and the d×d
Gram matrix is never materialized. Gram-Schmidt runs on r d-float
driver vectors: O(r²·d) flops, no cluster pass.

Start block: column 0 is the uniform 1/√d vector (bit-compatible with
the r=1 kernel — for r=1 this IS the original power iteration,
arithmetic unchanged), column c≥1 is the canonical basis vector
e_{c−1}. Deterministic and exactly expressible in the SQL oracle; a
start block orthogonal to a target eigenvector is the measure-zero
failure mode shared by all power methods.

Determinism/oracle story: fixed start, fixed iteration count, no
convergence test — the PROCEDURE is the contract, replicated
step-for-step (including the classical-GS dot/subtract order) by a
generated unrolled SQL oracle (queries.SQL_EMBEDDING_PCA_TOPR), so
cross-engine divergence is only float-sum ordering inside aggregates,
absorbed by round(.,6) on the final projections. Accuracy against
ground truth (numpy eigh on a spiked covariance) is pinned ≥0.99
per-component by tests/test_operators.py::
test_pca_topr_recovers_spiked_components.
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


def _cov_times_block(
    emb: DataFrame, mu: list[float], xs: list[list[float]], dim: int
) -> list[list[float]]:
    """One Cov·X application for the whole r-column block in a SINGLE
    corpus pass: z_c[p] = Σ v_p·y_c − μ_p·Σy_c with y_c = v·x_c − μ·x_c.
    Returns [z_0, ..., z_{r-1}]; collect is r·dim floats (bounded)."""
    r = len(xs)
    ys = []
    for c, x in enumerate(xs):
        xlit = F.array(*[F.lit(v) for v in x])
        mux = sum(m * v for m, v in zip(mu, x))
        dot = F.aggregate(
            F.zip_with("dv", xlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        ys.append((dot - F.lit(mux)).alias(f"y{c}"))
    rows = (
        emb.select("dv", *ys)
        .select(
            F.posexplode("dv").alias("pos", "val"),
            *[f"y{c}" for c in range(r)],
        )
        .groupBy("pos")
        .agg(
            *[
                F.sum(F.col("val") * F.col(f"y{c}")).alias(f"s{c}")
                for c in range(r)
            ],
            *[F.sum(f"y{c}").alias(f"u{c}") for c in range(r)],
        )
        .collect()
    )
    zs = [[0.0] * dim for _ in range(r)]
    for row in rows:
        p = row["pos"]
        for c in range(r):
            zs[c][p] = row[f"s{c}"] - mu[p] * row[f"u{c}"]
    return zs


def _gram_schmidt(zs: list[list[float]]) -> tuple[list[list[float]], list[float]]:
    """Classical Gram-Schmidt (dots against the ORIGINAL column,
    subtracted left-to-right — mirrored exactly by the SQL oracle).
    Returns (orthonormal block, norms); the norms of the final
    iteration approximate the leading eigenvalues of n·Cov (the R
    diagonal of the QR step)."""
    qs: list[list[float]] = []
    norms: list[float] = []
    for z in zs:
        w = list(z)
        for q in qs:
            d = sum(a * b for a, b in zip(q, z))
            w = [wv - d * qv for wv, qv in zip(w, q)]
        nrm = math.sqrt(sum(v * v for v in w)) or 1.0
        qs.append([v / nrm for v in w])
        norms.append(nrm)
    return qs, norms


def start_block(dim: int, r: int) -> list[list[float]]:
    """Deterministic start: column 0 uniform 1/√d (the r=1 kernel's
    start, kept bit-compatible), column c≥1 the basis vector e_{c−1}."""
    u = [1.0 / math.sqrt(dim)] * dim
    cols = [u]
    for c in range(1, r):
        e = [0.0] * dim
        e[c - 1] = 1.0
        cols.append(e)
    return cols


def power_iteration_topr(
    emb: DataFrame, dim: int, r: int = 1, iters: int = 3
) -> tuple[list[float], list[tuple[list[float], float]]]:
    """Top-r principal directions of the ``dv`` column's covariance by
    block subspace iteration. Returns (mu, [(x_c, sigma_c), ...]) where
    sigma_c is the final-iteration R-diagonal entry — an estimate of
    the c-th eigenvalue of n·Cov (decreasing once converged).

    For r=1 the arithmetic is IDENTICAL to the original
    embedding_pca_scores kernel (one y column, empty Gram-Schmidt
    reduction, same normalize). Cluster cost: iters+1 corpus passes
    TOTAL regardless of r (the +1 is the mean); caller persists
    ``emb``."""
    mu = corpus_mean(emb, dim)
    xs = start_block(dim, r)
    norms = [float("nan")] * r
    for _ in range(iters):
        zs = _cov_times_block(emb, mu, xs, dim)
        xs, norms = _gram_schmidt(zs)
    return mu, list(zip(xs, norms))


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
            # + 0.0 collapses signed zero (IEEE: -0.0 + 0.0 = +0.0):
            # a projection residual can round to -0.0 in one engine
            # and +0.0 in the other (x30 sweep finding) — the oracle
            # applies the same normalization
            expr = F.round(expr, round_to) + F.lit(0.0)
        cols.append(expr.alias(f"pc{i}"))
    return emb.select("vec_id", *cols)
