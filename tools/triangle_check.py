#!/usr/bin/env python
"""Engine-independent triangle-census self-check for scales where the
DuckDB oracle is infeasible (round-16 verdict item 1).

``graph_triangles`` is the one registry entry whose SQL oracle cannot
run at the x10 (sf1-equivalent) corpus: DuckDB's naive 3-way
self-join form exceeded 77 GB of spill and was killed, while the
engine's degree-ordered adjacency-intersection plan completed — the
expected shape (the engine plan exists precisely because the naive
join dies first), but it left one registry cell without at-scale
verification.

This tool closes that hole without an all-pairs oracle: the census is
computed TWICE by structurally different plans and must agree exactly.

  1. The REGISTRY entry itself (degree-ordered orientation, per-edge
     sorted-adjacency intersection — Chiba-Nishizeki / Suri &
     Vassilvitskii).
  2. An independent ID-ORDER census coded here: every undirected edge
     oriented from lower to higher node ID (no degree frame at all),
     triangles counted as wedge closures via a JOIN against the edge
     set (a different physical shape from the registry's
     array_intersect adjacency form).

Any total order on nodes counts each triangle exactly once (the
orientation of a triangle under a total order always has exactly one
node with two out-edges), so the two counts are equal iff both plans
are correct — a bug in orientation, dedup, wedge formation, or
closure would have to hit BOTH differently-shaped plans identically
to slip through. n_nodes / n_edges / n_wedges are recomputed from the
id-order plan's own frames as well.

The id-order variant has a weaker skew bound than degree order
(out-degree is not O(sqrt m)) — fine for a CHECK at x10 on the part
co-occurrence graph (max degree is bounded by orders-per-part x
lines-per-order), and it is deliberately NOT the registry plan.

Usage:
  python tools/triangle_check.py [sf_dir ...]
      default: /root/testdata/sf0.01 (oracle cross-anchor) and
      .scale_probe/x10 (the oracle-infeasible scale)

Prints one "<sf_dir>: ok census=..." line per dir; exits non-zero on
any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def id_order_census(spark, sf_dir: str):
    """Triangle census under the id-only total order, wedge-closure
    join form — independent of the registry's degree-ordered
    adjacency-intersection plan (see module docstring)."""
    from kafkastreams_example_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("s")
    ).distinct()
    # undirected edge set, already lower-id -> higher-id
    e = (
        li.alias("a")
        .join(li.alias("b"), "k")
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # wedge u->v, u->w (v < w by id) closed by edge v->w: each triangle
    # {u,v,w} with u the minimum id is counted exactly once
    wedges = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.u") == F.col("y.u"))
        .filter(F.col("x.v") < F.col("y.v"))
        .select(F.col("x.v").alias("u"), F.col("y.v").alias("v"))
    )
    tri = wedges.join(e, ["u", "v"], "left_semi").agg(
        F.count("*").alias("n_triangles")
    )
    stats = (
        deg.agg(
            F.count("*").alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
            .cast("bigint")
            .alias("n_wedges"),
        )
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri)
    )
    return stats.select("n_nodes", "n_edges", "n_wedges", "n_triangles")


def check(spark, sf_dir: str) -> bool:
    from kafkastreams_example_spark.queries import REGISTRY

    t0 = time.time()
    reg = REGISTRY["graph_triangles"].fn(spark, sf_dir).collect()[0].asDict()
    t1 = time.time()
    alt = id_order_census(spark, sf_dir).collect()[0].asDict()
    t2 = time.time()
    keys = ["n_nodes", "n_edges", "n_wedges", "n_triangles"]
    ok = all(reg[k] == alt[k] for k in keys)
    census = {k: reg[k] for k in keys}
    if ok:
        print(
            f"{sf_dir}: ok census={census} "
            f"[registry {t1 - t0:.1f}s, id-order {t2 - t1:.1f}s]"
        )
    else:
        print(
            f"{sf_dir}: MISMATCH registry={reg} id_order={alt}",
            file=sys.stderr,
        )
    return ok


def main(argv: list[str]) -> int:
    from kafkastreams_example_spark.session import get_spark

    dirs = argv or [
        "/root/testdata/sf0.01",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_probe",
            "x10",
        ),
    ]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fails = [d for d in dirs if not check(spark, d)]
    print(f"FAILS: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
