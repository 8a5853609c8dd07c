#!/usr/bin/env python
"""Skew stress for the salted primitives (round-4 verdict item 4).

Fixture: a pathologically skewed fact table — 90% of rows carry ONE hot
join key (key 0), the rest spread uniformly over 999 cold keys — joined
to a 1000-row dim. This is the documented target case of
operators/relational.py::salted_join ("one exception_class producing
90% of a 100 TB stream").

Three plans are timed on the same data:

  plain_noskewaqe — SortMergeJoin, broadcast OFF, AQE skew-join OFF:
                    the hot key lands on ONE reducer (what a naive
                    shuffle join does on any engine without skew
                    handling).
  plain_aqe       — SortMergeJoin, broadcast OFF, AQE skew-join ON:
                    Spark's built-in runtime skew splitting.
  salted          — salted_join with a row-unique salt source: the hot
                    key's rows spread over salt_buckets reducers by
                    construction, no runtime statistics needed.

Broadcast stays disabled for ALL variants: with a 1000-row dim a
broadcast join trivially wins and measures nothing about skew — the
probe models the large-large case where the dim exceeds broadcast
reach (at 100 TB: a multi-GB dim or a shuffle forced by a downstream
key requirement).

Output identity is asserted (count + order-insensitive row hash) —
salting only re-partitions work, never changes results.

Usage:
  python tools/skew_probe.py build        # materialize .skew_probe/
  python tools/skew_probe.py run          # time 1x and 30x, print JSON
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_example_spark.operators.relational import salted_join  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent / ".skew_probe"
BASE_ROWS = 1_000_000
FACTORS = (1, 30)
N_KEYS = 1000  # one hot + 999 cold
SALT_BUCKETS = 32


def _fact(spark, n_rows: int):
    # 90% hot key 0; cold keys uniform over [1, N_KEYS)
    return spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)) + 1)
        .cast("bigint")
        .alias("key"),
        F.col("id").alias("row_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias("value"),
    )


def build() -> None:
    spark = get_spark(app_name="skew-probe-build")
    spark.sparkContext.setLogLevel("ERROR")
    for f in FACTORS:
        _fact(spark, BASE_ROWS * f).write.mode("overwrite").parquet(
            str(ROOT / f"fact_x{f}")
        )
    spark.range(N_KEYS).select(
        F.col("id").alias("key"),
        F.concat(F.lit("attr_"), F.col("id")).alias("attr"),
    ).write.mode("overwrite").parquet(str(ROOT / "dim"))
    spark.stop()
    print("built", ROOT)


def _force(joined) -> tuple[int, int]:
    """Execute the join and reduce to (row count, order-insensitive
    hash) — forces both fact payload and dim attr through the join."""
    row = joined.agg(
        F.count("*").alias("n"),
        # bit_xor: order-insensitive and overflow-free (a bigint SUM of
        # xxhash64 values trips ANSI ARITHMETIC_OVERFLOW)
        F.bit_xor(F.xxhash64("key", "row_id", "value", "attr")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def run() -> None:
    spark = get_spark(app_name="skew-probe-run")
    spark.sparkContext.setLogLevel("ERROR")
    # large-large regime for every variant: no broadcast shortcut
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    dim = spark.read.parquet(str(ROOT / "dim"))
    out: dict[str, dict] = {}
    for f in FACTORS:
        fact = spark.read.parquet(str(ROOT / f"fact_x{f}"))

        def plain():
            return fact.join(dim, "key")

        def salted():
            return salted_join(
                fact, dim, "key", salt_buckets=SALT_BUCKETS, salt_source="row_id"
            )

        variants = {
            "plain_noskewaqe": (plain, "false"),
            "plain_aqe": (plain, "true"),
            "salted": (salted, "false"),
        }
        res: dict[str, dict] = {}
        checks: set[tuple[int, int]] = set()
        for name, (fn, skew_aqe) in variants.items():
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_aqe)
            best = None
            for _ in range(2):  # min-of-2, same protocol as bench.py
                t0 = time.perf_counter()
                n, h = _force(fn())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            checks.add((n, h))
            res[name] = {"sec": round(best, 2), "rows": n}
        assert len(checks) == 1, f"output mismatch across variants: {checks}"
        out[f"x{f}"] = res
        print(f"x{f}: " + json.dumps(res), flush=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()
    print(json.dumps({"metric": "skew_probe", "results": out}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    {"build": build, "run": run}[cmd]()
