#!/usr/bin/env python
"""Engine-independent self-checks for the three heaviest x100 oracle
cells (round-19 verdict item 7).

The x100 numerics sweep (CORRECTNESS_r18_x100_numerics.log) is
standing evidence, but its three heaviest cells are DUCKDB-side
bills: rolling_range_stats 1122 s (a RANGE window over 10M rows),
rolling_corr 355 s, session_stats 290 s — ~30 min of oracle time per
re-run that measures DuckDB, not this engine. This tool re-validates
exactly those three entries at x100 WITHOUT DuckDB, using the
graph-tier pattern (independent recomputation + algebraic
invariants):

  rolling_range_stats — (a) conservation: one output row per input
      event; (b) SAMPLED FRAME RECOMPUTE: ~2k deterministic sample
      events, each frame's member rows gathered by an explicit
      range-predicate join (a different plan family than the
      merged-timeline kernel) and the stats recomputed in PYTHON
      (numpy) — n/min/max exact, sum/mean/std within the entry's own
      6-dp rounding.
  rolling_corr — sampled ROWS-frame recompute: per sample, the
      entity's history is collected, the last-64 frame cut by the
      same (t, event_id) total order, and Pearson corr recomputed in
      PYTHON; degenerate frames (n<2 / zero variance) must be ABSENT
      from the query output, defined ones within 6-dp rounding.
  session_stats — (a) conservation: Σ n_events == |events|; (b) a
      WINDOW-FREE total-session count (sessions == users + over-gap
      adjacent pairs, gaps counted via a sorted-list fold — no lag(),
      no running sum); (c) PYTHON RESESSIONIZATION of ~200 sampled
      users compared session-by-session (id, n_events, duration).

The samples are hash-deterministic, so runs are reproducible. The
checks hold at ANY sf_dir; pointing at `.scale_probe/x100` makes the
x100 rung re-runnable each round for the cost of the Spark side
alone. Artifact: X100_SELFCHECK_<GATE_ROUND|adhoc>.json; exit 1 on
any failure.

Usage: python tools/x100_selfcheck.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.sources.tables import load_table  # noqa: E402

W_US = 86_400_000_000  # the entry's 24 h RANGE window
TOL = 2e-6  # the entries round to 6 dp; allow one rounding step


def _sampled(ev, n_target: int, seed: int):
    """Deterministic ~n_target-row sample keyed by (event_id,
    event_type) hash — reproducible across runs and engines."""
    total = ev.count()
    step = max(total // max(n_target, 1), 1)
    return ev.filter(
        F.pmod(F.xxhash64("event_id", "event_type", F.lit(seed)), F.lit(step))
        == 0
    )


def check_rolling_range_stats(spark, sf_dir: str) -> dict:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.col("value").cast("double").alias("v"),
    )
    out = REGISTRY["rolling_range_stats"].fn(spark, sf_dir)
    n_in = ev.count()
    n_out = out.count()
    conserved = n_in == n_out

    s = _sampled(ev, 2000, seed=7).select(
        F.col("user_id").alias("su"),
        F.col("event_type").alias("se"),
        F.col("event_id").alias("sid"),
        F.col("t").alias("st"),
    )
    # explicit range-predicate join: a different plan family than the
    # kernel's merged-timeline pass — frame = the entity's rows with
    # t in [st − W, st] (RANGE ... CURRENT ROW includes time peers)
    frames = (
        s.join(
            ev,
            (F.col("su") == F.col("user_id"))
            & (F.col("se") == F.col("event_type"))
            & (F.col("t") >= F.col("st") - F.lit(W_US))
            & (F.col("t") <= F.col("st")),
        )
        .groupBy("sid", "se")
        .agg(F.collect_list("v").alias("vs"))
        .collect()
    )
    got = {
        (r["event_id"], r["event_type"]): r
        for r in out.join(
            F.broadcast(s.select(F.col("sid").alias("event_id"),
                                 F.col("se").alias("event_type"))),
            ["event_id", "event_type"],
        ).collect()
    }
    bad = []
    for r in frames:
        key = (r["sid"], r["se"])
        vs = np.array([x for x in r["vs"] if x is not None], dtype=np.float64)
        g = got.get(key)
        if g is None:
            bad.append((key, "missing from output"))
            continue
        n, su = len(vs), float(vs.sum()) if len(vs) else None
        checks = [g["n_frame"] == n]
        if n:
            checks += [
                abs(g["sum_v"] - su) <= TOL * max(1.0, abs(su)),
                abs(g["mean_v"] - su / n) <= TOL,
                abs(g["std_v"] - float(np.std(vs))) <= TOL,
                g["min_v"] == float(vs.min()),
                g["max_v"] == float(vs.max()),
            ]
        if not all(checks):
            bad.append((key, f"mismatch n={n} got={dict(g.asDict())}"))
    return {
        "rows_in": n_in,
        "rows_out": n_out,
        "conserved": conserved,
        "samples": len(frames),
        "sample_mismatches": len(bad),
        "first_bad": bad[:3],
        "pass": conserved and len(frames) > 0 and not bad,
    }


def check_rolling_corr(spark, sf_dir: str) -> dict:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.col("value").cast("double").alias("v"),
    )
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC, the entry's re-base
    out = REGISTRY["rolling_corr"].fn(spark, sf_dir)

    s = _sampled(ev, 1000, seed=13).select(
        F.col("user_id").alias("su"),
        F.col("event_type").alias("se"),
        F.col("event_id").alias("sid"),
        F.col("t").alias("st"),
    )
    # collect each sample's FULL entity history (retention-bounded per
    # entity by the testdata contract) and cut the ROWS frame in Python
    hist = (
        s.join(
            ev,
            (F.col("su") == F.col("user_id"))
            & (F.col("se") == F.col("event_type")),
        )
        .groupBy("sid", "se", "st")
        .agg(F.collect_list(F.struct("t", "event_id", "v")).alias("xs"))
        .collect()
    )
    got = {
        (r["event_id"], r["event_type"]): r["trend"]
        for r in out.join(
            F.broadcast(s.select(F.col("sid").alias("event_id"),
                                 F.col("se").alias("event_type"))),
            ["event_id", "event_type"],
        ).collect()
    }
    bad = []
    n_defined = 0
    for r in hist:
        key = (r["sid"], r["se"])
        rows = sorted(
            (x["t"], x["event_id"], x["v"]) for x in r["xs"]
        )
        upto = [x for x in rows if (x[0], x[1]) <= (r["st"], r["sid"])]
        frame = upto[-64:]
        ys = np.array([x[2] for x in frame], dtype=np.float64)
        ts = np.array([float(x[0] - base_us) for x in frame], dtype=np.float64)
        mask = ~np.isnan(ys)
        ys, ts = ys[mask], ts[mask]
        defined = (
            len(ys) >= 2 and float(np.std(ys)) > 0 and float(np.std(ts)) > 0
        )
        trend = got.get(key)
        if not defined:
            if trend is not None:
                bad.append((key, f"degenerate frame but trend={trend}"))
            continue
        n_defined += 1
        want = float(np.corrcoef(ys, ts)[0, 1])
        if trend is None or abs(trend - want) > TOL:
            bad.append((key, f"trend={trend} want={want}"))
    return {
        "samples": len(hist),
        "defined_frames": n_defined,
        "sample_mismatches": len(bad),
        "first_bad": bad[:3],
        "pass": len(hist) > 0 and n_defined > 0 and not bad,
    }


def check_session_stats(spark, sf_dir: str) -> dict:
    GAP = 1_800_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms")
    )
    out = REGISTRY["session_stats"].fn(spark, sf_dir)
    n_in = ev.count()
    agg = out.agg(
        F.sum("n_events").alias("n"),
        F.count("*").alias("sessions"),
        F.min("duration_ms").alias("min_dur"),
    ).first()
    conserved = agg["n"] == n_in and (agg["min_dur"] or 0) >= 0

    # window-free session count: per user, sort the (ms, id) list and
    # FOLD over adjacent pairs counting gaps > 30 min — total sessions
    # must equal users + over-gap pairs (no lag(), no running sum)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ms", "event_id"))).alias("xs")
    )
    gaps = per_user.select(
        F.aggregate(
            F.expr("slice(xs, 2, size(xs) - 1)"),
            F.struct(
                F.element_at("xs", 1).getField("ms").alias("prev"),
                F.lit(0).cast("long").alias("n"),
            ),
            lambda acc, x: F.struct(
                x.getField("ms").alias("prev"),
                (
                    acc.getField("n")
                    + F.when(
                        x.getField("ms") - acc.getField("prev") > GAP, 1
                    ).otherwise(0)
                ).cast("long").alias("n"),
            ),
        ).getField("n").alias("gaps")
    ).agg(F.sum("gaps").alias("g"), F.count("*").alias("users")).first()
    sessions_expected = gaps["users"] + gaps["g"]
    count_ok = agg["sessions"] == sessions_expected

    # Python resessionization of ~200 sampled users, compared
    # session-by-session against the query output
    su = per_user.filter(
        F.pmod(F.xxhash64("user_id", F.lit(3)), F.lit(max(per_user.count() // 200, 1))) == 0
    ).collect()
    sample_ids = [r["user_id"] for r in su]
    got_rows = out.filter(F.col("user_id").isin(sample_ids)).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["user_id"], {})[r["session_id"]] = (
            r["n_events"],
            r["duration_ms"],
        )
    bad = []
    for r in su:
        xs = sorted((x["ms"], x["event_id"]) for x in r["xs"])
        sessions, cur = [], [xs[0]]
        for prev, nxt in zip(xs, xs[1:]):
            if nxt[0] - prev[0] > GAP:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        want = {
            i + 1: (len(sess), sess[-1][0] - sess[0][0])
            for i, sess in enumerate(sessions)
        }
        if got.get(r["user_id"]) != want:
            bad.append((r["user_id"], got.get(r["user_id"]), want))
    return {
        "rows_in": n_in,
        "sum_n_events": agg["n"],
        "sessions": agg["sessions"],
        "sessions_windowfree": sessions_expected,
        "conserved": conserved,
        "session_count_ok": count_ok,
        "sampled_users": len(su),
        "sample_mismatches": len(bad),
        "first_bad": bad[:2],
        "pass": conserved and count_ok and len(su) > 0 and not bad,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scale_probe" / "x100"
    )
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"x100_selfcheck: {sf_dir!r} is not a directory")
    spark = get_spark(app_name="x100-selfcheck")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    report = {}
    for name, fn in (
        ("rolling_range_stats", check_rolling_range_stats),
        ("rolling_corr", check_rolling_corr),
        ("session_stats", check_session_stats),
    ):
        t1 = time.time()
        try:
            r = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            r = {"pass": False, "error": f"{type(exc).__name__}: {exc}"[:300]}
        r["sec"] = round(time.time() - t1, 1)
        report[name] = r
        print(json.dumps({name: r}, default=str), flush=True)
    ok = all(r.get("pass") for r in report.values())
    summary = {
        "sf_dir": sf_dir,
        "pass": ok,
        "elapsed_sec": round(time.time() - t0, 1),
        "checks": report,
    }
    rnd = os.environ.get("GATE_ROUND")
    out = Path(__file__).resolve().parent.parent / (
        f"X100_SELFCHECK_{rnd if rnd else 'adhoc'}.json"
    )
    out.write_text(json.dumps(summary, indent=1, default=str))
    print(json.dumps({k: v for k, v in summary.items() if k != "checks"}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
