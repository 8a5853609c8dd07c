"""Iterative graph operators (PageRank) — the graph-processing tier of
the engine, generalizing the unrolled registry entry
(queries.q_graph_pagerank) into a reusable operator with the two terms
real graphs need: dangling-node mass redistribution and
iterate-until-converged stopping.

Scale stance (the q_graph_pagerank discipline, kept here): the edge
list is persisted ONCE with pre-folded 1/outdeg weights so each power
iteration joins one narrow (src, dst, w) frame; ranks and node frames
are node-cardinality and always SHUFFLE-join (never broadcast — at
10⁹ nodes a broadcast would be the bug); every new rank frame
localCheckpoints eagerly to keep lineage flat across iterations. The
two driver-side scalars per round (dangling mass, L1 delta) are narrow
single-row aggregates — the same runtime-statistic class as the
Lloyd-training and adaptive-grid actions, not data collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
    tol: float | None = None,
    teleport: float | None = None,
) -> DataFrame:
    """Distributed PageRank (Brin & Page 1998) over an edge list.

    - Dangling (sink) nodes — nodes that appear only as destinations —
      donate their whole rank uniformly each round (the standard
      dangling-mass correction): without it, rank mass leaks and the
      ranks of a graph WITH sinks no longer sum to 1 (property-pinned
      in tests/test_operators.py::test_pagerank_sinks_sum_to_one).
    - tol=None runs exactly `iters` power iterations (the oracle-able
      fixed form the registry entry uses). tol=x stops early when the
      L1 delta Σ|r_k − r_{k−1}| drops below x — the production stopping
      rule; `iters` then caps the worst case.
    - teleport overrides the (1 − damping) numerator with an exact
      literal: 1.0 − 0.85 is 0.15000000000000002 in IEEE doubles, and
      an engine-parity caller (the DuckDB-oracled registry entry, whose
      SQL says 0.15) wants the exact 0.15 on both sides rather than a
      1-ulp seed divergence.

    Returns (node BIGINT, r DOUBLE); ranks sum to 1 up to float
    summation error."""
    base = (1.0 - damping) if teleport is None else teleport
    # persist the NORMALIZED EDGE FRAME itself, not just the weighted
    # form (round 20, guide §5): nodes, degrees, the stats agg and the
    # weighted wedges all derive from e — without this cache each
    # derivation re-ran the caller's whole edge construction (for the
    # registry entry: a lineitem⋈orders join + distinct, measured 3-4
    # full rebuilds per pagerank call)
    e = edges.select(
        F.col(src).cast("bigint").alias("src"), F.col(dst).cast("bigint").alias("dst")
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    wedges = (
        e.join(deg, "src")
        .select("src", "dst", (1.0 / F.col("outdeg")).alias("w"))
        .persist()
    )
    try:
        # ONE narrow agg derives both runtime stats (node count, sink
        # count) — it also serves the empty-graph check, so the former
        # separate nodes.count() job is gone (round 20); the sink node
        # FRAME is only materialized when sinks exist (the common
        # sink-free graph pays zero extra jobs for it)
        stats = (
            nodes.join(deg, nodes["node"] == deg["src"], "left")
            .agg(
                F.count("*").alias("n"),
                F.count(F.when(F.col("outdeg").isNull(), 1)).alias("n_sinks"),
            )
            .first()
        )
        n, has_sinks = stats["n"], stats["n_sinks"] > 0
        if n == 0:
            # empty graph → empty ranks (round-10 review fix: a
            # reusable operator must not ZeroDivisionError on a
            # filtered-to-nothing edge frame)
            return nodes.select("node", F.lit(0.0).alias("r"))
        dangling = None
        if has_sinks:
            dangling = nodes.join(
                deg, nodes["node"] == deg["src"], "left_anti"
            ).localCheckpoint(eager=True)
        ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
        # Per-round driver actions are only REQUIRED when a scalar must
        # leave the cluster mid-loop (dangling mass, convergence delta).
        # The fixed-iteration sink-free form instead unrolls LAZILY into
        # one job (a NON-EAGER localCheckpoint every round keeps lineage
        # flat; only the final round's checkpoint is eager, so the
        # returned frame is materialized while the wedge cache is still
        # alive). Arithmetic is identical either way — checkpoints
        # never change values.
        lazy_unroll = tol is None and not has_sinks
        if not lazy_unroll:
            ranks = ranks.localCheckpoint(eager=True)
        for it in range(iters):
            dmass = 0.0
            if has_sinks:
                dmass = (
                    ranks.join(dangling, "node", "left_semi").agg(F.sum("r")).first()[0]
                    or 0.0
                )
            contrib = (
                wedges.join(ranks, wedges["src"] == ranks["node"])
                .select("dst", (F.col("r") * F.col("w")).alias("m"))
                .groupBy("dst")
                .agg(F.sum("m").alias("acc"))
            )
            new_ranks = nodes.join(
                contrib, F.col("node") == F.col("dst"), "left"
            ).select(
                "node",
                (
                    F.lit(base / n)
                    + damping
                    * (F.coalesce(F.col("acc"), F.lit(0.0)) + F.lit(dmass / n))
                ).alias("r"),
            )
            if lazy_unroll:
                # non-eager checkpoint every round: lineage stays flat
                # and each round's RDD computes exactly once, but the
                # whole fixed-iteration run executes inside the FINAL
                # round's single eager job instead of one job per round
                new_ranks = new_ranks.localCheckpoint(eager=it == iters - 1)
                ranks = new_ranks
                continue
            new_ranks = new_ranks.localCheckpoint(eager=True)
            if tol is not None:
                prev = ranks.select("node", F.col("r").alias("r_prev"))
                delta = (
                    new_ranks.join(prev, "node")
                    .agg(F.sum(F.abs(F.col("r") - F.col("r_prev"))))
                    .first()[0]
                )
                ranks = new_ranks
                if delta is not None and delta < tol:
                    break
            else:
                ranks = new_ranks
    finally:
        wedges.unpersist()
        e.unpersist()
    return ranks
