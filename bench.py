#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a cheap count() over the full result (no
driver-side collect of payload rows). First query pays JVM/session
warmup; a warmup no-op runs first so per-query numbers reflect
execution, not session start.

Quiet-by-construction (r8 verdict item 2): before timing, the harness
waits up to $SPARK_GRAFT_BENCH_QUIET_WAIT (180 s — bounded so the
per-round artifact can never be lost to a driver timeout) for the 1-minute
loadavg to drop under $SPARK_GRAFT_BENCH_MAX_LOAD (1.0 — the BASELINE.md
discipline), runs min-of-$SPARK_GRAFT_BENCH_REPEAT (3) passes, and
stamps "loadavg_start" (+ "loaded": true when the gate never cleared)
into the JSON so a loaded reading is self-identifying.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402

# Headline set: the scale-relevant shapes (big agg, joins, windows,
# dedup families, text/LSH, similarity) — not every registry entry.
BENCH_QUERIES = [
    "agg_pricing_summary",
    "join_customer_orders",
    "join_multiway_region",
    "sql_q3_shipping",
    "sql_q5_local_supplier",
    "window_rank",
    "dedup_exact",
    "dedup_windowed",
    "dedup_refresh",
    "agg_windowed_events",
    "asof_join",
    "range_join",
    "session_stats",
    "text_stats",
    "doc_fingerprint",
    "tfidf_top_terms",
    "minhash_signature",
    "minhash_lsh_pairs",
    "shingle_jaccard",
    "simhash",
    "sim_topk",
    "ivf_topk",
    "ivf_topk_trained",
    "cosine_pairs",
    "dedup_embeddings",
    "clean_pipeline",
    "reference_pipeline",
    "multimodal_meta",
    # round-4 additions: every operator family added in rounds 2-4 gets
    # a perf guard so regressions surface round-over-round
    "kmeans_centroids",
    "dedup_candidates_union",
    "contamination",
    "udtf_term_counts",
    "fuzzy_match",
    "image_header_meta",
    # round-7 additions
    "audio_header_meta",
    "approx_quantiles",
    "approx_distinct_merge",
    "sql_q10_returns",
    "sql_q12_latency",
    "ngram_span_dedup",
    "ngram_span_removal",
    "sequence_pack",
    "bpe_pair_counts",
    "quality_mix_sample",
    "join_salted",
    "activity_streaks",
    "value_histogram",
    "embedding_quantize",
    "repetition_ratio",
    "ngram_lm_score",
    # round-8 additions
    "dedup_embeddings_trained",
    "sql_q18_large_orders",
    "tfidf_cosine_pairs",
    "knn_label_accuracy",
    "bpe_train_merges",
    "zorder_layout",
    "classifier_eval",
    "weighted_sample",
    "video_header_meta",
    "interval_coverage",
    # round-9 additions
    "sql_q21_blame_supplier",
    "sql_q17_small_qty_revenue",
    "sql_q16_supplier_cnt",
    "sql_q2_min_cost_supplier",
    "sql_q20_excess_share_supplier",
    "sql_q22_dormant_customers",
    "sql_q13_order_distribution",
    "sql_q15_top_supplier",
    "sql_q19_disjunct_revenue",
    "sql_q7_nation_volume",
    "sql_q9_product_profit",
    "gopher_rules",
    "wav_pcm_stats",
    "bmp_pixel_stats",
    "cohort_retention",
    "scd2_merge",
    "graph_pagerank",
    # round-11 additions
    "sql_q4_priority_count",
    "sql_q6_forecast_revenue",
    "sql_q8_market_share",
    "sql_q11_important_parts",
    "mad_outliers",
    "mat_view_counts",
    "top_terms_sketched",
    "split_divergence",
    "embedding_pca_scores",
    "linear_trend",
    "graph_triangles",
    "cdc_snapshot",
    # round-12 additions
    "embedding_pca_topr",
    "bloom_semi_join",
    "fk_integrity",
    "semdedup",
    "resample_ohlc",
    "winsorize",
    "skew_profile",
    "snapshot_diff",
    "bm25_topk",
    "twap",
    "markov_transitions",
    "rolling_corr",
    "ssjoin_prefix",
    "bm25_incremental",
    "ewma",
    "k_anonymity",
    "expectations_audit",
    "minhash_incremental",
    "table_checksum",
    "decile_lift",
    "sequence_match",
    "mutual_information",
    "mmr_rerank",
    "zonemap_prune",
    # round-13 additions
    "rolling_corr_range",
    "rolling_range_stats",
    "ann_recall",
    # round-14 additions
    "ivf_incremental",
    "zoned_read_prune",
    # round-16 band-coverage additions (verdict item 4): every
    # registry entry that reads >=1 s at sf0.1 must be measured (and
    # banded) per round — these 11 were previously timed only in the
    # oracle sweep; the remaining 73 non-headline entries all read
    # <0.8 s (exemption ledger in BASELINE.md)
    "dedup_cluster_profile",
    "dedup_clusters",
    "bigram_counts",
    "simhash_pairs",
    "bpe_encode",
    "curation_funnel",
    "jaccard_est",
    "simhash_pairs_4band",
    "wav_decimate",
    "bmp_frame_sample",
    "dedup_incremental",
]


# Drift canaries (round-17, verdict item 2): five headline queries
# whose code has been untouched for many rounds, spanning cheap scans
# to join-heavy shapes. Host drift (the round-15/16 regime: uniform
# 1.2-2.3x slowdowns on UNTOUCHED code) moves the canaries and the
# regressed query alike; a real code regression moves only its query.
# The gate therefore normalizes every reading by the MEDIAN canary
# ratio against quiet reference readings before comparing to band
# tops — so the 2.3x drift headroom baked into the bands can no
# longer hide a genuine ~1.5x code regression on a drifted run.
CANARY_QUERIES = [
    "agg_pricing_summary",
    "window_rank",
    "join_customer_orders",
    "sql_q3_shipping",
    "text_stats",
]


def canary_drift(timings: dict, refs: dict) -> float:
    """Median ratio of measured canary walls to their quiet reference
    readings, floored at 1.0: a faster-than-reference box must not
    SHRINK readings below what was actually measured (normalization
    only ever discounts shared host slowdown, never amplifies)."""
    ratios = sorted(
        timings[c] / refs[c]
        for c in refs
        if isinstance(timings.get(c), float) and refs[c] > 0
    )
    if not ratios:
        return 1.0
    mid = len(ratios) // 2
    med = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return max(1.0, round(med, 3))


def band_breaches(timings: dict, bands: dict, drift: float) -> list[str]:
    """Queries whose drift-normalized reading exceeds their band top.
    Readings are divided by the canary drift ratio first — a uniform
    host slowdown (all canaries up together) is discounted; a query
    that moved ALONE still breaches."""
    return sorted(
        q
        for q, t in timings.items()
        if isinstance(t, float) and q in bands and t / drift > bands[q][1]
    )


def run_bench(spark, sf_dir: str, queries=None, repeat: int = 2, registry=None) -> dict:
    """Time each query (per-query min over `repeat` passes) and return
    the bench record. Per-query fault isolation: one broken query must
    not zero the whole round's perf record (round-5 outage: a single
    AnalysisException left BENCH_r05 with rc:1 and no timings) — it
    records {"err": ...} under its key and the run continues."""
    queries = BENCH_QUERIES if queries is None else queries
    registry = REGISTRY if registry is None else registry
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _ in range(max(repeat, 1)):
        for name in queries:
            if name in errors:
                continue
            fn = registry[name].fn
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                continue
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "bench_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {**timings, **{k: {"err": v} for k, v in errors.items()}},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


def wait_for_quiet(
    threshold: float | None = None, budget_sec: float | None = None
) -> tuple[float, bool]:
    """Enforce the BASELINE.md measurement discipline in code (r8
    verdict item 2): the recorded artifact must be quiet-by-
    construction, not triaged after the fact. Polls the 1-minute
    loadavg until it drops below `threshold` (default 1.0 — the
    discipline every quiet baseline in BASELINE.md was recorded under)
    or `budget_sec` (default 180 s) runs out. Returns (loadavg at
    go-time, loaded_flag); the flag is stamped into the JSON so a
    reading taken on a busy box is self-identifying instead of
    poisoning round-over-round comparisons. Pre-timing check only: the
    bench itself saturates all 32 cores once running, so mid-run
    loadavg carries no signal about OTHER work."""
    if threshold is None:
        threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "1.0"))
    if budget_sec is None:
        budget_sec = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "180"))
    deadline = time.monotonic() + budget_sec
    load = os.getloadavg()[0]
    while load >= threshold and time.monotonic() < deadline:
        time.sleep(10)
        load = os.getloadavg()[0]
    return round(load, 2), load >= threshold


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # quiet gate BEFORE the session exists — the JVM itself adds load
    load, loaded = wait_for_quiet()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch the session + parquet reader once
    spark.range(1).count()

    # three passes, report per-query min: the first pays JVM/codegen
    # warmup, the min-of-3 is the BASELINE.md steady-state discipline
    # (override with repeat=1 for a strictly cold run)
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    record = run_bench(spark, sf_dir, repeat=repeat)
    record["loadavg_start"] = load
    # drift-normalized band gate (round-17): only meaningful at the
    # SF the bands were calibrated at
    if sf_dir.rstrip("/").endswith("sf0.1"):
        try:
            with open(Path(__file__).resolve().parent / "BASELINE_BANDS.json") as fh:
                bands_doc = json.load(fh)
            refs = bands_doc.get("canary_ref_sec", {})
            drift = canary_drift(record["queries"], refs)
            breaches = band_breaches(
                record["queries"], bands_doc.get("bench_bands_sec", {}), drift
            )
            record["canary_drift"] = drift
            record["band_breaches"] = breaches
            # drift-normalized per-query seconds (round-20 verdict item
            # 7): host drift made raw cross-round numbers incomparable
            # (r20 ran at drift 1.714 vs r19's 1.0, so every untouched
            # query read as a phantom regression). RAW stays primary —
            # `queries` is untouched; this extra top-level map lets any
            # consumer compare rounds without reconstructing the canary.
            record["queries_norm"] = {
                q: round(t / drift, 3)
                for q, t in record["queries"].items()
                if isinstance(t, float)
            }
            if breaches:
                print(
                    f"BAND BREACH (drift-normalized x{drift}): {breaches}",
                    file=sys.stderr,
                )
        except Exception as exc:  # noqa: BLE001 — the gate must never
            # cost the round its JSON artifact
            print(f"band gate unavailable: {exc}", file=sys.stderr)
    if loaded:
        # never blocks the round artifact (the driver must always get
        # its JSON line) — but the reading is marked as taken against
        # the discipline, so bands are compared with that knowledge
        record["loaded"] = True
    # the JSON record is the LAST stdout line of the process (round-20
    # verdict item 7): the r19 driver record kept only an output tail
    # and the mid-run JSON line was truncated, so the whole round
    # compared as unparseable — session teardown and the artifact
    # auto-commit (stderr-only) run BEFORE the line is printed, and
    # nothing may write to stdout after it.
    spark.stop()
    _commit_round_artifacts()
    print(json.dumps(record))


def _commit_round_artifacts() -> None:
    """Round-evidence hygiene, structural since round 12 (the printed
    reminder failed six rounds running): any loose BENCH_r*/
    CORRECTNESS_r*/BENCH_STREAMING_r* artifact at the repo root is
    auto-committed (just those paths) by tools/artifacts.py."""
    try:
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from tools.artifacts import commit_round_artifacts

        commit_round_artifacts()
    except Exception as exc:  # noqa: BLE001 — evidence hygiene never
        # breaks the bench run itself
        print(f"artifact auto-commit unavailable: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
