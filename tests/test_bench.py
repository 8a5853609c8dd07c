"""Harness fault-isolation guards: a deliberately-broken query must not
zero the round's perf record (the round-5 outage mode) — the bench
keeps timing everything else and records one {"err": ...} entry."""

from __future__ import annotations

from types import SimpleNamespace

import pytest

import bench


def test_run_bench_isolates_broken_query(spark):
    def good(s, sf_dir):
        return s.range(10)

    def broken(s, sf_dir):
        raise RuntimeError("synthetic analysis failure")

    registry = {
        "good_q": SimpleNamespace(fn=good),
        "broken_q": SimpleNamespace(fn=broken),
        "good_q2": SimpleNamespace(fn=good),
    }
    out = bench.run_bench(
        spark,
        "/root/testdata/sf0.001",
        queries=["good_q", "broken_q", "good_q2"],
        repeat=2,
        registry=registry,
    )
    q = out["queries"]
    assert isinstance(q["good_q"], float) and isinstance(q["good_q2"], float)
    assert "synthetic analysis failure" in q["broken_q"]["err"]
    # total only sums successful timings
    assert out["value"] == round(q["good_q"] + q["good_q2"], 3)


def test_streaming_bench_harness_runs(spark):
    """bench_streaming's query driver produces sane metrics on a tiny
    rate stream — guards the harness itself (thresholds live in
    BASELINE.md; this is a plumbing check, not a perf assertion)."""
    import tempfile

    import bench_streaming as bs
    from kafkastreams_example_spark.streaming.pipelines import filter_pipeline

    with tempfile.TemporaryDirectory() as ckpt:
        d = bs._decoded(bs._rate_source(spark, 500))
        out = bs._run_query(filter_pipeline(d), "smoke", ckpt)
    assert out["batches"] == bs.MEASURE_BATCHES
    assert out["rows_per_sec"] and out["rows_per_sec"] > 0
    assert out["batch_ms_p50"] and out["batch_ms_max"] >= out["batch_ms_p50"]


def test_bench_queries_all_registered():
    """Every BENCH_QUERIES name must exist in the registry, exactly
    once — a renamed or dropped entry must fail CI, not surface as a
    per-query {"err"} row in the round artifact."""
    from kafkastreams_example_spark.queries import REGISTRY

    missing = [n for n in bench.BENCH_QUERIES if n not in REGISTRY]
    assert not missing, missing
    dupes = [n for n in set(bench.BENCH_QUERIES) if bench.BENCH_QUERIES.count(n) > 1]
    assert not dupes, dupes


def test_streaming_state_gate_semantics():
    """Round-16 state-rows gate: over-bound and signal-lost (None)
    both regress; at-bound, stateless (unbounded), and
    absent-from-this-run pipelines do not."""
    import bench_streaming as bs

    results = {
        "at_bound": {"state_rows_final": 100},
        "over": {"state_rows_final": 101},
        "lost": {"state_rows_final": None},
        "stateless": {"state_rows_final": None},  # no bound -> ignored
    }
    bounds = {"at_bound": 100, "over": 100, "lost": 100, "not_run": 1}
    assert bs._state_gate(results, bounds) == ["lost", "over"]

    # the retained-ids variant reads a different field (statestore
    # sum, not progress numRowsTotal) through the same semantics
    results = {
        "coalesced": {"state_rows_final": 256, "state_ids_final": 9999},
    }
    assert bs._state_gate(results, {"coalesced": 5000},
                          field="state_ids_final") == ["coalesced"]
    assert bs._state_gate(results, {"coalesced": 10_000},
                          field="state_ids_final") == []


def test_streaming_state_bounds_cover_benched_pipelines():
    """Every bounded pipeline must be a real benched pipeline (a rename
    must fail CI, not silently drop its state gate), and the churn
    tiers — the gate's teeth — must carry BOTH a floor and a bound."""
    import bench_streaming as bs

    bounds = bs._state_bounds(200_000, 50_000)
    unknown = sorted(set(bounds) - set(bs.THRESHOLDS))
    assert not unknown, f"state bound for un-benched pipeline: {unknown}"
    for churn in ("rolling_stats_churn", "dedup_refresh_churn"):
        assert churn in bounds and churn in bs.THRESHOLDS


def test_drift_normalized_band_gate():
    """Round-17 verdict item 2: the 2-2.3x drift headroom in the bands
    must not hide a real lone-query regression, and uniform host drift
    must not false-trip. Proven with synthetic readings: (a) quiet box
    + one query 2x over its top → breach; (b) the SAME 2x on every
    query including all canaries (pure host drift) → no breach; (c)
    drifted box AND a lone extra regression on top → still caught."""
    refs = {
        "agg_pricing_summary": 0.4,
        "window_rank": 0.44,
        "join_customer_orders": 0.38,
        "sql_q3_shipping": 1.57,
        "text_stats": 0.19,
    }
    bands = {"target_q": [0.5, 1.0], "other_q": [0.5, 2.0]}
    quiet = {**refs, "target_q": 0.8, "other_q": 1.0}

    # (a) quiet canaries, target_q alone at 2x its quiet reading
    slow = {**quiet, "target_q": 1.6}
    drift = bench.canary_drift(slow, refs)
    assert drift == 1.0
    assert bench.band_breaches(slow, bands, drift) == ["target_q"]

    # (b) uniform 2x drift (canaries move too): normalized back under
    # the tops — host drift is not a regression
    drifted = {k: v * 2 for k, v in quiet.items()}
    drift = bench.canary_drift(drifted, refs)
    assert drift == pytest.approx(2.0, rel=0.01)
    assert bench.band_breaches(drifted, bands, drift) == []

    # (c) 2x drift AND target_q regressed 2.5x on top of it: the
    # raw reading (0.8*5=4.0) normalizes to 2.0 > top 1.0 → caught,
    # where the un-normalized band (top 1.0, headroom baked for
    # drift) would need the reading itself compared — it IS over, but
    # the point is the drift divisor doesn't absolve it
    both = {**drifted, "target_q": 0.8 * 5}
    drift = bench.canary_drift(both, refs)
    assert bench.band_breaches(both, bands, drift) == ["target_q"]

    # err entries and un-banded queries are ignored by the compare
    messy = {**quiet, "broken": {"err": "x"}, "unbanded": 99.0}
    assert bench.band_breaches(messy, bands, 1.0) == []


def test_canary_refs_are_benched_and_banded_sanely():
    """The canaries must be real headline queries (a rename must fail
    CI) with a numeric quiet reference recorded in BASELINE_BANDS.json
    — and the floor-at-1.0 rule must hold on a fast box."""
    import json

    doc = json.load(open("BASELINE_BANDS.json"))
    refs = doc["canary_ref_sec"]
    for c in bench.CANARY_QUERIES:
        assert c in bench.BENCH_QUERIES, c
        assert isinstance(refs.get(c), float) and refs[c] > 0, c
    fast = {c: refs[c] / 2 for c in bench.CANARY_QUERIES}
    assert bench.canary_drift(fast, refs) == 1.0
    # non-numeric ledger keys in refs (the _doc note) are skipped
    assert bench.canary_drift({}, refs) == 1.0


def test_wait_for_quiet_gate():
    """The quiet gate must pass through immediately under a huge
    threshold and flag `loaded` (without blocking) when the threshold
    is impossible and the budget is zero."""
    load, flagged = bench.wait_for_quiet(threshold=1e9, budget_sec=0)
    assert not flagged and load >= 0.0
    load, flagged = bench.wait_for_quiet(threshold=0.0, budget_sec=0)
    assert flagged


def test_registry_md_is_fresh():
    """REGISTRY.md is generated from the QuerySpec table
    (tools/gen_registry.py); a registry change without regeneration
    would hand reviewers a stale index. Compare entry names and
    oracle kinds (not line numbers — those shift with unrelated
    edits) between the committed table and the live registry."""
    import re
    from pathlib import Path

    from kafkastreams_example_spark.queries import REGISTRY

    rows = {}
    # repo-root-anchored, not cwd-relative (post-close review: pytest
    # invoked from another directory must not FileNotFoundError here)
    reg_md = Path(__file__).resolve().parent.parent / "REGISTRY.md"
    with open(reg_md) as fh:
        for ln in fh:
            m = re.match(
                r"\| ([a-z0-9_]+) \| .* \| (sql-strict|sql|rows-only) \| ", ln
            )
            if m:
                rows[m.group(1)] = m.group(2)
    assert set(rows) == set(REGISTRY), (
        "REGISTRY.md out of date — run: python tools/gen_registry.py "
        f"(missing: {sorted(set(REGISTRY) - set(rows))}, "
        f"stale: {sorted(set(rows) - set(REGISTRY))})"
    )
    for name, spec in REGISTRY.items():
        want = (
            "sql-strict"
            if spec.oracle and getattr(spec, "strict_float", False)
            else "sql" if spec.oracle else "rows-only"
        )
        assert rows[name] == want, (name, rows[name], want)


def test_stall_reprobe_clears_false_breach():
    """Round-19 host-stall defense, synthetic stall: a pipeline whose
    FIRST reading sits below floor (the hypervisor-pause signature)
    but whose process-fresh re-probe clears the floor must be
    replaced by the fresh reading — state fields included — and no
    longer gate; both readings land under stall_reprobe."""
    import bench_streaming as bs

    results = {
        "stalled": {
            "rows_per_sec": 4_500.0,
            "state_rows_final": 9_999,
            "rows_per_batch": 50_000,
        },
        "healthy": {"rows_per_sec": 500_000.0, "rows_per_batch": 50_000},
    }
    thresholds = {"stalled": 10_000, "healthy": 100_000}
    calls = []

    def reprobe(name):
        calls.append(name)
        return {
            "rows_per_sec": 21_000.0,
            "state_rows_final": 4_096,
            "rows_per_batch": 50_000,
        }

    out, log = bs.reprobe_below_floor(results, thresholds, reprobe)
    assert calls == ["stalled"]
    assert bs._floor_breaches(out, thresholds) == []
    rec = out["stalled"]
    assert rec["rows_per_sec"] == 21_000.0
    assert rec["state_rows_final"] == 4_096  # fresh run is authoritative
    assert rec["stall_reprobe"] == {
        "first_rows_per_sec": 4_500.0,
        "reprobed_rows_per_sec": 21_000.0,
        "cleared": True,
    }
    assert log["attempted"]["stalled"]["cleared"]
    # the healthy pipeline is untouched
    assert "stall_reprobe" not in out["healthy"]


def test_stall_reprobe_keeps_real_regression():
    """A re-probe still below floor (or failing outright, None) keeps
    the ORIGINAL reading and the pipeline still gates — the defense
    must not absorb genuine code regressions."""
    import bench_streaming as bs

    results = {
        "regressed": {"rows_per_sec": 4_500.0, "rows_per_batch": 50_000},
        "dead": {"rows_per_sec": None, "rows_per_batch": 50_000},
    }
    thresholds = {"regressed": 10_000, "dead": 10_000}

    def reprobe(name):
        return {"rows_per_sec": 5_000.0} if name == "regressed" else None

    out, log = bs.reprobe_below_floor(results, thresholds, reprobe)
    assert bs._floor_breaches(out, thresholds) == ["dead", "regressed"]
    assert out["regressed"]["rows_per_sec"] == 4_500.0  # original kept
    assert not out["regressed"]["stall_reprobe"]["cleared"]
    assert out["dead"]["stall_reprobe"]["reprobed_rows_per_sec"] is None
    assert not out["dead"]["stall_reprobe"]["cleared"]


def test_stall_reprobe_total_stall_triggers():
    """rows_per_sec None (ZERO measured batches — a total stall) is a
    breach and must trigger a re-probe, not an exemption; a fresh run
    above floor clears it."""
    import bench_streaming as bs

    results = {"frozen": {"rows_per_sec": None, "rows_per_batch": 50_000}}
    calls = []

    def reprobe(name):
        calls.append(name)
        return {"rows_per_sec": 30_000.0, "rows_per_batch": 50_000}

    out, _ = bs.reprobe_below_floor(results, {"frozen": 10_000}, reprobe)
    assert calls == ["frozen"]
    assert bs._floor_breaches(out, {"frozen": 10_000}) == []


def test_stall_reprobe_systemic_cap():
    """More breaches than MAX_REPROBES means host-wide drift or a real
    multi-pipeline regression — NOT a one-off stall: no re-probes run
    (a re-probe storm on a slow box would stretch the bench by many
    JVM starts) and the raw readings gate."""
    import bench_streaming as bs

    results = {
        f"p{i}": {"rows_per_sec": 1.0, "rows_per_batch": 1} for i in range(6)
    }
    thresholds = {f"p{i}": 10_000 for i in range(6)}
    calls = []

    out, log = bs.reprobe_below_floor(
        results, thresholds, lambda n: calls.append(n), max_reprobes=4
    )
    assert calls == []
    assert "systemic" in log and len(log["breaches"]) == 6
    assert bs._floor_breaches(out, thresholds) == sorted(results)


def test_stall_reprobe_noop_when_green():
    """No breach, no re-probe: a green run must not pay a single
    subprocess."""
    import bench_streaming as bs

    results = {"ok": {"rows_per_sec": 1e6}}
    calls = []
    out, log = bs.reprobe_below_floor(
        results, {"ok": 10_000}, lambda n: calls.append(n)
    )
    assert calls == [] and log == {} and out == results


def test_stall_defense_subprocess_drill():
    """End-to-end drill of the REAL re-probe machinery (the unit tests
    above stub reprobe_fn): an impossible floor on one tiny pipeline
    forces a genuine breach, the gated run spawns the actual
    `--only filter` subprocess (fresh interpreter + JVM), the fresh
    reading also lands below the impossible floor, and the run exits 1
    with BOTH real measurements recorded under stall_reprobe — proving
    the subprocess path (spawn, JSON parse, merge, gate) live, not
    just the decision logic."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = {
        **os.environ,
        "SPARK_GRAFT_STREAM_ROWS": "3000",
        "SPARK_GRAFT_STREAM_PIPELINES": "filter",
        "SPARK_GRAFT_STREAM_FLOORS": '{"filter": 1000000000}',
    }
    proc = subprocess.run(
        [sys.executable, str(repo / "bench_streaming.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(repo),
        env=env,
    )
    assert proc.returncode == 1, proc.stderr[-500:]
    line = next(
        ln
        for ln in reversed(proc.stdout.strip().splitlines())
        if ln.startswith('{"metric"')
    )
    d = json.loads(line)
    assert d["regressions"] == ["filter"]
    rec = d["reprobes"]["attempted"]["filter"]
    # both readings are REAL measurements from two separate processes
    assert rec["first_rows_per_sec"] and rec["first_rows_per_sec"] > 0
    assert rec["reprobed_rows_per_sec"] and rec["reprobed_rows_per_sec"] > 0
    assert not rec["cleared"]
    assert d["pipelines"]["filter"]["stall_reprobe"] == rec
    assert d["pipelines"]["filter"]["below_threshold"]
