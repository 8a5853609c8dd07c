#!/usr/bin/env python
"""Prove the manifest tables' bucket-pruned merge is O(hot buckets),
not O(table) — the round-11 verdict's top evidence gap.

The ROUND11B scale probe ran mat_view_counts on deltas whose key
density touched ALL buckets every batch, so it could only bound the
merge cost from above; the O(hot-buckets) claim — the entire 100 TB
story of streaming/mat_view.py and streaming/cdc_table.py — had no
positive evidence. This probe constructs the contrast directly:

  * Commit a base table of K keys across 64 buckets (batch 0).
  * SKEWED delta: D rows whose keys all hash into ONE bucket
    (pre-filtered by the same pmod(xxhash64) the table uses).
  * UNIFORM delta: D rows spread over all 64 buckets.
  * Time apply_batch for each delta shape at growing base-table sizes
    (1x / 4x / 16x keys).

Expected under correct pruning: the skewed merge reads + rewrites
1/64th of the table, so its wall stays near-FLAT as the table grows
16x, while the uniform merge reads + rewrites everything and its wall
tracks table size. Both snapshots are verified equal to a recomputed
groupBy after every merge (the probe must not trade correctness for
speed). Keys come from spark.range — this is a microbenchmark of the
TABLE MACHINERY (state maintenance cost vs state size), not a query
over the test corpus, and range keys let the bucket pre-filter be
exact.

Usage: python tools/merge_prune_probe.py [base_keys [growth ...]]
Prints one JSON line per (table-size, delta-shape) cell plus a summary
line {"merge_prune_probe": {...}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.streaming.cdc_table import CdcTable  # noqa: E402
from kafkastreams_example_spark.streaming.mat_view import (  # noqa: E402
    MaterializedCounts,
)

N_BUCKETS = 64
DELTA_ROWS = 20_000


def _keys(spark, n: int, bucket: int | None):
    """n distinct keys; bucket=None → uniform over all buckets,
    bucket=b → only keys hashing to bucket b (same pmod(xxhash64)
    expression the table itself buckets by, so the pre-filter is
    exact)."""
    df = spark.range(0, n * (N_BUCKETS if bucket is not None else 1)).select(
        F.col("id").alias("user_id")
    )
    if bucket is not None:
        df = df.filter(
            F.pmod(F.xxhash64("user_id"), F.lit(N_BUCKETS)) == bucket
        ).limit(n)
    return df


def _with_value(df):
    return df.withColumn(
        "value", (F.pmod(F.col("user_id"), F.lit(1000)) / 10.0)
    )


def _as_changes(df, seq_base: int):
    """Reinterpret a (user_id, value) frame as CDC upserts with
    seq = user_id + seq_base (strictly later than any earlier base)."""
    return df.select(
        "user_id",
        (F.col("user_id") + F.lit(seq_base)).alias("seq"),
        F.lit("u").alias("op"),
        F.col("value").cast("string").alias("payload"),
    )


def _verify_cdc(spark, table: CdcTable, base, delta) -> None:
    """Expected snapshot = per-key max-seq change over base ∪ delta
    (all ops are upserts here)."""
    union = base.unionByName(delta)
    want = union.groupBy("user_id").agg(
        F.max_by(F.struct("seq", "payload"), "seq").alias("r")
    ).select("user_id", "r.seq", "r.payload")
    got = table.read(spark).select("user_id", "seq", "payload")
    diff = got.exceptAll(want).unionAll(want.exceptAll(got)).count()
    if diff:
        raise SystemExit(f"cdc merge produced wrong snapshot: {diff} diff rows")


def _verify(spark, table: MaterializedCounts, frames) -> None:
    """Recompute the expected per-key (n, total) from the union of all
    applied batches and diff against the committed snapshot."""
    expect = None
    for f in frames:
        expect = f if expect is None else expect.unionByName(f)
    want = expect.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("total"),
    )
    got = table.read(spark).select("user_id", "n", "total")
    diff = got.exceptAll(want).unionAll(want.exceptAll(got)).count()
    if diff:
        raise SystemExit(f"merge produced wrong snapshot: {diff} diff rows")


def probe(base_keys: int, growths: tuple[int, ...]) -> dict:
    spark = get_spark(app_name="merge_prune_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # session warmup
    out: dict[str, dict] = {}
    for g in growths:
        n_base = base_keys * g
        base = _with_value(_keys(spark, n_base, None)).persist()
        base.count()
        cell: dict[str, float] = {"table_keys": n_base}
        import os

        repeat = int(os.environ.get("SPARK_GRAFT_PROBE_REPEAT", "2"))
        for shape, bucket in (("skewed", 7), ("uniform", None)):
            delta = _with_value(_keys(spark, DELTA_ROWS, bucket)).persist()
            delta.count()  # materialize OUTSIDE the timed merge
            wall = None
            # min-of-N with a FRESH table per rep: the first merge in a
            # session pays codegen/committer warmup that would otherwise
            # masquerade as merge cost in the smallest cell
            for _ in range(repeat):
                root = tempfile.mkdtemp(prefix=f"merge_probe_{shape}_{g}x_")
                try:
                    table = MaterializedCounts(
                        root,
                        keys=("user_id",),
                        value_col="value",
                        n_buckets=N_BUCKETS,
                    )
                    table.apply_batch(base, 0)
                    t0 = time.perf_counter()
                    table.apply_batch(delta, 1)
                    dt = time.perf_counter() - t0
                    wall = dt if wall is None else min(wall, dt)
                    _verify(spark, table, [base, delta])
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            hot = len(
                {
                    r[0]
                    for r in delta.select(
                        F.pmod(F.xxhash64("user_id"), F.lit(N_BUCKETS))
                    ).distinct().collect()
                }
            )
            delta.unpersist()
            cell[f"{shape}_merge_sec"] = round(wall, 3)
            cell[f"{shape}_hot_buckets"] = hot

            # same contrast for the CDC table (shared manifest
            # machinery, argmax merge algebra instead of additive):
            # base = one upsert per key at seq=key, delta = later
            # upserts (seq = key + LARGE) on the same key shape
            cdc_base = _as_changes(base, 0).persist()
            cdc_delta = _as_changes(delta, 1_000_000_000).persist()
            cdc_base.count(), cdc_delta.count()
            wall = None
            for _ in range(repeat):
                root = tempfile.mkdtemp(prefix=f"cdc_probe_{shape}_{g}x_")
                try:
                    table = CdcTable(
                        root, key="user_id", n_buckets=N_BUCKETS
                    )
                    table.apply_batch(cdc_base, 0)
                    t0 = time.perf_counter()
                    table.apply_batch(cdc_delta, 1)
                    dt = time.perf_counter() - t0
                    wall = dt if wall is None else min(wall, dt)
                    _verify_cdc(spark, table, cdc_base, cdc_delta)
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            cdc_base.unpersist(), cdc_delta.unpersist()
            cell[f"cdc_{shape}_merge_sec"] = round(wall, 3)
        base.unpersist()
        out[f"x{g}"] = cell
        print(json.dumps({f"x{g}": cell}), flush=True)
    spark.stop()
    return out


def main() -> int:
    base_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    growths = tuple(int(a) for a in sys.argv[2:]) or (1, 4, 16)
    out = probe(base_keys, growths)
    first, last = f"x{growths[0]}", f"x{growths[-1]}"
    summary = {"cells": out, "table_growth": growths[-1] / growths[0]}
    for m in (
        "skewed_merge_sec",
        "uniform_merge_sec",
        "cdc_skewed_merge_sec",
        "cdc_uniform_merge_sec",
    ):
        summary[m.replace("_sec", "_growth")] = round(
            out[last][m] / out[first][m], 2
        )
    print(json.dumps({"merge_prune_probe": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
