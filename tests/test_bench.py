"""Harness fault-isolation guards: a deliberately-broken query must not
zero the round's perf record (the round-5 outage mode) — the bench
keeps timing everything else and records one {"err": ...} entry."""

from __future__ import annotations

from types import SimpleNamespace

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


def test_wait_for_quiet_gate():
    """The quiet gate must pass through immediately under a huge
    threshold and flag `loaded` (without blocking) when the threshold
    is impossible and the budget is zero."""
    load, flagged = bench.wait_for_quiet(threshold=1e9, budget_sec=0)
    assert not flagged and load >= 0.0
    load, flagged = bench.wait_for_quiet(threshold=0.0, budget_sec=0)
    assert flagged
