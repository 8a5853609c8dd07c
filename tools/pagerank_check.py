#!/usr/bin/env python
"""Engine-independent PageRank self-check for scales where the DuckDB
oracle is infeasible (round 17; companion to triangle_check.py).

At x30 the unrolled-CTE oracle for ``graph_pagerank`` exceeds the
box's spill disk (>78 GB — the same resource wall the triangles
oracle hit at x10). This check needs no oracle: PageRank is
equivariant under graph isomorphism, so recomputing the ranks with
the bipartite namespacing SWAPPED (customers odd / suppliers even
instead of even / odd) must produce the IDENTICAL rank for every
node under the relabeling. The swap changes join hash distributions,
partition layouts, and summation orders — a fanout bug, a dropped
node class, or an asymmetric join would have to corrupt both runs
identically through different physical plans to pass. Two scalar
invariants are asserted on top: total-mass conservation
(Σ rank = N, no dangling nodes in the doubled bipartite graph) and
the teleport floor (rank·N ≥ 0.15 for every node).

Comparison tolerance: the two runs sum floats in different orders,
so ranks are compared at 2e-6 on the round-6 outputs (one ulp at the
rounding boundary), with the count of >tolerance rows required to be
ZERO.

Usage: python tools/pagerank_check.py [sf_dir ...]
    default: /root/testdata/sf0.01 (oracle cross-anchor) and
    .scale_probe/x30 (the oracle-infeasible scale)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _ranks(spark, sf_dir: str, swapped: bool):
    from kafkastreams_example_spark.functions.graph import pagerank
    from kafkastreams_example_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    if swapped:
        c = (F.col("o_custkey") * 2 + 1).alias("c")
        s = (F.col("l_suppkey") * 2).alias("s")
    else:
        c = (F.col("o_custkey") * 2).alias("c")
        s = (F.col("l_suppkey") * 2 + 1).alias("s")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(c, s).distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    ranks = pagerank(edges, iters=3, teleport=0.15)
    # the registry entry's exact output form: round(r*N, 6)
    n = ranks.count()
    return ranks.select(
        "node", F.round(F.col("r") * n, 6).alias("rank")
    )


def check(spark, sf_dir: str) -> bool:
    t0 = time.time()
    base = _ranks(spark, sf_dir, swapped=False)
    # normalize both encodings to (kind, entity_id): even ids are the
    # run's "first" namespace, odd the second
    orig = base.select(
        (F.col("node") % 2).alias("kind"),
        (F.col("node") / 2).cast("bigint").alias("ent"),
        F.col("rank").alias("r1"),
    )
    swap = _ranks(spark, sf_dir, swapped=True).select(
        (1 - F.col("node") % 2).alias("kind"),
        (F.col("node") / 2).cast("bigint").alias("ent"),
        F.col("rank").alias("r2"),
    )
    j = orig.join(swap, ["kind", "ent"], "full_outer")
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum(
            (
                F.col("r1").isNull()
                | F.col("r2").isNull()
                | (F.abs(F.col("r1") - F.col("r2")) > 2e-6)
            ).cast("long")
        ).alias("bad"),
        F.sum("r1").alias("mass"),
        F.min("r1").alias("floor"),
    ).collect()[0]
    n, bad, mass, floor = agg["n"], agg["bad"], agg["mass"], agg["floor"]
    # rank column is rank*N rounded: conservation reads Σ = N (of the
    # scaled-by-N form divided by N — i.e. mean = 1)
    mass_ok = abs(mass / n - 1.0) < 1e-6
    floor_ok = floor >= 0.15 - 1e-6
    ok = bad == 0 and mass_ok and floor_ok
    msg = (
        f"{sf_dir}: {'ok' if ok else 'MISMATCH'} nodes={n} "
        f"relabel_mismatches={bad} mean_rank={mass / n:.9f} "
        f"min_rank={floor:.6f} [{time.time() - t0:.1f}s]"
    )
    print(msg, file=sys.stderr if not ok else sys.stdout)
    return ok


def main(argv: list[str]) -> int:
    from kafkastreams_example_spark.session import get_spark

    dirs = argv or [
        "/root/testdata/sf0.01",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_probe",
            "x30",
        ),
    ]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fails = [d for d in dirs if not check(spark, d)]
    print(f"FAILS: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
