#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every registry
query on Spark and its oracle on DuckDB at a given scale factor and
compare (row count + column set + order-insensitive normalized values).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreams_example_spark.queries import REGISTRY, _gate_order  # noqa: E402
from kafkastreams_example_spark.schema import TABLE_NAMES  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402


def norm(v, strict_float: bool = False):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if strict_float:
            # strict mode (round-18 gate hardening): full repr — one
            # ulp of divergence fails the gate. Reserved for entries
            # whose contract is bit-equality with a built-in; signed
            # zero still collapses (v + 0.0) — engines legitimately
            # disagree on the zero's sign (x30 sweep evidence).
            return repr(v + 0.0) if v == 0.0 else repr(v)
        # collapse signed zero: a score that ROUNDS to zero can carry
        # either sign per engine ("%.9g" of -0.0 is '-0' — the x30
        # sweep caught embedding_pca_topr differing only there); IEEE
        # -0.0 == 0.0, so the compare must not split on it
        return f"{v + 0.0:.9g}" if v == 0.0 else f"{v:.9g}"
    if isinstance(v, int):
        # ints compare EXACTLY — 9-sig-fig collapse is for absorbing
        # float formatting skew only; applying it to ≥10-digit ints
        # (epoch ms, large sums) would silently pass real mismatches
        return v
    return v


def compare_query(
    spark, con, fn, oracle: str, sf_dir: str, strict_float: bool = False
):
    """Run a query callable against its DuckDB oracle and compare with
    the driver's exact discipline (row count + column set + order-
    insensitive normalized values). Returns (ok, detail). Shared by the
    gate replica below and tools/gate_sensitivity.py (the mutation
    audit must test the SAME comparator the gate uses, or it audits
    nothing). ``strict_float=True`` compares floats by full repr
    (QuerySpec.strict_float — the kernel-contract entries)."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    # toPandas(), not collect(): the driver compares pandas frames on
    # BOTH sides, so nullable numeric columns become float64+NaN
    # symmetrically (collect() keeps None and would false-fail vs the
    # oracle's NaN).
    spdf = sdf.toPandas()
    srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    # Fetch through pandas, NOT fetchall(): the driver compares via a
    # pandas frame, where DuckDB HUGEINT/UBIGINT become float64 ("1.0"
    # vs Spark's 1). fetchall() keeps exact Python ints and can
    # green-light oracles the driver will hash-fail (agg_boolean, r3).
    pdf = con.execute(oracle).df()
    dcols = list(pdf.columns)
    drows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    oi = sorted(range(len(scols)), key=lambda i: scols[i])
    di = sorted(range(len(dcols)), key=lambda i: dcols[i])
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    a = sorted(
        [tuple(norm(r[i], strict_float) for i in oi) for r in srows], key=key
    )
    b = sorted(
        [tuple(norm(r[i], strict_float) for i in di) for r in drows], key=key
    )
    ok = a == b and sorted(scols) == sorted(c.lower() for c in dcols)
    if ok:
        return True, f"rows={len(srows)}" + (" [strict]" if strict_float else "")
    bad = [(x, y) for x, y in zip(a, b) if x != y][:2]
    return False, f"rows={len(srows)}/{len(drows)} first={bad}"


def _check_one(spark, con, name: str, sf_dir: str, fails: list[str]) -> None:
    spec = REGISTRY[name]
    t0 = time.perf_counter()
    if spec.oracle is None:
        srows = spec.fn(spark, sf_dir).toPandas()
        print(
            f"{name}: rows={len(srows)} (rows-only) "
            f"[{time.perf_counter()-t0:.1f}s]"
        )
        return
    ok, detail = compare_query(
        spark,
        con,
        spec.fn,
        spec.oracle,
        sf_dir,
        strict_float=getattr(spec, "strict_float", False),
    )
    if not ok:
        fails.append(name)
        print(f"{name}: MISMATCH {detail}")
    else:
        print(f"{name}: ok {detail} [{time.perf_counter()-t0:.1f}s]")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or _gate_order()  # replicate the driver's order
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(REGISTRY)}")
        return 2
    spark = get_spark(app_name="oracle-check", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # driver testdata ships one file per table; the scale-probe
        # replicated corpora mix plain files with Spark DIRECTORY
        # layouts (part-*.parquet under <table>.parquet/) — glob the
        # directory form so the same sweep runs at every fixture
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if Path(p).is_dir() else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    fails = []
    for name in names:
        # per-query fault isolation: a throwing query records one ERROR
        # line and the sweep continues (pre-round-6 this aborted the
        # whole run at the first AnalysisException)
        try:
            _check_one(spark, con, name, sf_dir, fails)
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")
    print("FAILS:", fails if fails else "none")
    spark.stop()
    try:
        from tools.artifacts import commit_round_artifacts

        commit_round_artifacts()
    except Exception as exc:  # noqa: BLE001
        print(f"artifact auto-commit unavailable: {exc}", file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
