#!/usr/bin/env python
"""Streaming throughput bench: drives the two reference-parity
pipelines (filter, refresh-on-duplicate dedup), the built-in watermark
dedup tier, the streaming windowed aggregation, and the watermarked
stream-stream interval join over a deterministic rate-micro-batch
source and prints ONE JSON line:

  {"metric": "streaming_throughput", "pipelines": {name: {
      "rows_per_sec": N, "batch_ms_p50": N, "batch_ms_max": N,
      "batches": N, "rows_per_batch": N, "below_threshold": bool,
      "state_rows_final": N|null, "above_state_bound": bool}},
   "thresholds": {...}, "state_bounds": {...},
   "regressions": [...], "state_regressions": [...]}

The rate-micro-batch source emits exactly rowsPerBatch rows per
trigger, so per-batch latency is comparable run-over-run (the plain
rate source emits wall-clock-dependent row counts). The first two
batches are excluded from metrics (codegen/state-store warmup), the
query runs until MEASURE_BATCHES measured batches complete.

The refresh tier is measured at TWO key occupancies because its cost
model has two regimes (round-7 profiling): per-key state-protocol
overhead (~0.5 ms/key/batch — Arrow group framing + state get/update
round-trip; a NO-OP applyInPandasWithState function at 4096 keys
measures the same floor) and the per-row Python kernel (numpy-
vectorized, ~0.2 ms per 12-row group). At ~12 rows/key/batch
(dedup_refresh) the operator is protocol-bound; at ~48 rows/key/batch
(dedup_refresh_hot) the per-key cost amortizes and the same operator
clears 170k rows/s.

Regression guard: THRESHOLDS below are machine-checked — any pipeline
under its floor sets below_threshold, lists under "regressions", and
exits 1. Floors sit ~2x under quiet-machine recordings (BASELINE.md)
to absorb sandbox variance; a reading below threshold is a real
regression, not noise.

Host-stall defense (round 19): before gating, every below-floor
reading is re-probed ONCE in a fresh process (`--only NAME` re-runs
exactly one pipeline and prints {"single": {...}}). A hypervisor
pause that stalled one pipeline's batches clears on the re-probe and
the fresh reading replaces it (both recorded under "stall_reprobe"
and the top-level "reprobes"); a genuine code regression fails the
re-probe too and still exits 1. More than MAX_REPROBES breaches skip
re-probing (host-wide drift / real multi-pipeline regression — raw
readings reported). See reprobe_below_floor and the synthetic-stall
tests in tests/test_bench.py.

State-rows gate (round 16): every stateful pipeline's final-batch
state-store row count is checked against ``_state_bounds`` — a
pipeline over its bound (unbounded state growth, the 100 TB OOM
class) or reporting None where state is expected lists under
"state_regressions" and exits 1. Two pure-churn tiers
(rolling_stats_churn, dedup_refresh_churn) exist specifically to give
this gate teeth: on a churning keyspace, a wiring change reverting
idle-key eviction turns their plateau into linear growth.

Env: SPARK_GRAFT_CPUS (local parallelism), SPARK_GRAFT_STREAM_ROWS
(rows per batch override for quick smokes); drill hooks
SPARK_GRAFT_STREAM_PIPELINES (comma-separated subset for the gated
run) and SPARK_GRAFT_STREAM_FLOORS (JSON overlay on THRESHOLDS) —
together they stage a real below-floor breach cheaply so the
subprocess re-probe is exercised end-to-end in CI; never set in
normal bench runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.streaming.dedup_refresh import (  # noqa: E402
    dedup_refresh_stream,
)
from kafkastreams_example_spark.streaming.pipelines import (  # noqa: E402
    attribution_join_pipeline,
    dedup_pipeline_within_watermark,
    filter_pipeline,
    minhash_band_dedup_any_pipeline,
    minhash_band_dedup_pipeline,
    embedding_corpus_index,
    embedding_dedup_pipeline,
    quality_filter_pipeline,
    session_window_pipeline,
    sliding_window_pipeline,
    static_enrich_pipeline,
    windowed_count_pipeline,
)

WARMUP_BATCHES = 2
MEASURE_BATCHES = 8
# late fraction for the round-15 late-heavy corrected-emission tiers:
# 1 row in LATE_EVERY arrives half a window late
LATE_EVERY = 10

# rows/s floors, machine-checked in main() — see module docstring
THRESHOLDS = {
    # r16 re-measure: two back-to-back quiet full runs read 553k/331k
    # (r15: 654k) — the box drifts; floor restored to ~2x under the
    # WORST quiet reading per the round-12 policy precedent
    "filter": 150_000,
    "dedup_watermark": 100_000,
    # r16 re-measure: 19.6k/20.0k on back-to-back quiet runs (r15
    # recorded 43.5k on the same code — drift on the protocol-bound
    # tier); floor at ~2x under the worst quiet reading
    "dedup_refresh": 9_000,
    "dedup_refresh_hot": 60_000,
    # round-13 key-coalesced tier (64 ids/state-key, pack-vectorized
    # decisions): probe read 99.7k rows/s at the hot shape — floor at
    # the ~2-3x under-recording policy
    "dedup_refresh_coalesced": 35_000,
    # round-13 streaming OVER-aggregation (per-event trailing-window
    # stats, the RANGE kernel's streaming face): merged-timeline
    # searchsorted + prefix moments + shared RMQ per (entity, batch);
    # first recording 33.1k rows/s at 50k-row batches — floor at the
    # ~2-3x under-recording policy
    "rolling_stats": 10_000,
    # round-14 two-series (corr) face over the same state layout:
    # adds 3 co-moment prefixes + 2 change-count degeneracy passes to
    # the rolling_stats batch work; first recording 29.3k rows/s at
    # 50k-row batches — floor at the ~2-3x under-recording policy
    "rolling_corr": 11_000,
    # round-14 corrected-emission tier of rolling_stats (ids + rev in
    # state; correction set empty on the in-order feed): first
    # recording 33.1k rows/s — floor at the same policy
    "rolling_stats_corrected": 11_000,
    # transformWithState twins (executable since round 17 — vendored
    # protobuf): same feeds as their APWS tiers; the proto
    # state-server round-trips cost ~a quarter-to-third over APWS's
    # Arrow state columns at this key density. Round-18 floor
    # re-derivation (verdict item 3, tools/tws_floor_probe.py): three
    # PROCESS-FRESH quiet runs read dedup 37.4-53.1k, stats
    # 18.7-22.8k, corr 18.5-20.3k rows/s at 50k-row batches — floors
    # at ~2.5x under the WORST quiet reading. Process-fresh matters:
    # within one session, repeated streaming queries degrade
    # monotonically (dedup 54.1k -> 41.8k -> 22.7k over three
    # back-to-back runs — state-store/worker residue accumulates per
    # query), so in-session repeats under-read the regime
    # bench_streaming actually measures (each pipeline once).
    "dedup_refresh_tws": 15_000,
    "rolling_stats_tws": 8_000,
    # corr face: same derivation (worst quiet 18.5k). A cold
    # first-query probe once read 3.2k (session warmup on the
    # heaviest face); the floor stays below that regime deliberately
    # since the bench's WARMUP_BATCHES absorb it.
    "rolling_corr_tws": 7_000,
    # round-15 late-heavy feeds (1 in LATE_EVERY rows W/2 late across
    # the REAL entities — see the offset-3 note at the feed, one
    # batch ≈ one window): prices the corrected tiers' emit
    # amplification — round-15 recordings 38.7k / 36.0k rows/s at
    # 50k-row batches, correction_ratio 1.098 both (~10% re-emission
    # volume at this lateness); floors at the ~2-3x under-recording
    # policy
    "rolling_stats_corrected_late": 12_000,
    "rolling_corr_corrected_late": 11_000,
    # round-16 churn tiers (the STATE_BOUNDS gate's teeth — see the
    # churn section in main()): same kernels as rolling_stats /
    # dedup_refresh but ~1k fresh keys per batch (50 rows/key) with
    # 1 s idle eviction armed; first recordings 23.2k / 61.1k rows/s
    # at 50k-row batches (state plateau exactly 1,000 both) — floors
    # at the ~2-3x under-recording policy
    "rolling_stats_churn": 10_000,
    "dedup_refresh_churn": 25_000,
    # coalesced face under the same churn (gated on state_ids_final
    # from a post-run statestore read, see _ID_BOUNDS): first quiet
    # recording 74.8k rows/s with the round-16 lazy TTL sweep in
    # (retained ids plateau exactly 1,000) — floor at the ~3x policy
    "dedup_refresh_coalesced_churn": 25_000,
    # quiet readings 194-258k across r7/r8; 150k left only ~1.3x
    # headroom and a load-overlapped r8 run read 127k — 100k restores
    # the ~2-3x under-recording policy (same correction minhash got)
    "windowed_agg": 100_000,
    "session_window": 60_000,
    # each event writes 2 overlapping-window state rows (~2x tumbling
    # work, though 32-core quiet readings track tumbling closely:
    # 252.7k vs windowed_agg 264.3k, round-9 min-of-3 in BASELINE.md);
    # floor at the same ~2.5x under-recording policy as windowed_agg
    "sliding_window": 100_000,
    # per-row cost is the SemDeDup screening contract itself: n_probe ×
    # target_bucket_rows (~250) dim-64 cosines per vector — since
    # round 10 evaluated as per-bucket BLAS matmuls inside the single
    # mapInPandas kernel (assignment + screening), not per-pair
    # codegen expressions. Quiet reading 33.2k rows/s at 50k-row
    # batches (was 8.6k at the r9 expression form) — floor at the
    # ~2-3x under-recording policy.
    "embedding_dedup": 12_000,
    # r16 re-measure: run-to-run swing 54.4k/21.3k on identical code
    # (r15: 57.2k; the 1.8M-state-row tier is GC-pause-prone) — floor
    # at ~2x under the worst quiet reading
    "interval_join": 10_000,
    # stateless broadcast probe fused into the batch scan — tracks the
    # filter pipeline as expected (quiet r11 recording 796k rows/s at
    # 200k-row batches); floor at the ~2-3x under-recording policy
    "static_enrich": 250_000,
    "quality_filter": 100_000,
    # quiet-machine readings 40–50k; 30k left only ~1.5x headroom and a
    # moderately loaded (but healthy) run tripped it — 15k restores the
    # ~2-3x under-recording policy every other floor follows
    # r16 re-measure: run-to-run swing 40.9k/15.7k on identical code
    # (r15: 40.9k) — floors at ~2x under the worst quiet reading
    "minhash_dedup": 7_000,
    "minhash_dedup_any": 10_000,
    # per-batch MG partition summaries + a ≤(k+1)·P-row collect; first
    # recording 354.7k rows/s at 200k-row batches (round 11) — floor at
    # the ~2-3x under-recording policy
    "topk_terms": 90_000,
    # every batch pays an argmax merge + bucket-pruned parquet rewrite
    # (real table maintenance, not a projection); first recording
    # 76.6k rows/s at 50k-row batches — ~3x under-recording floor
    "cdc_apply": 25_000,
    # incremental term index: every batch explodes ~15 term rows/doc
    # and pays an additive merge + bucket-pruned parquet rewrite of the
    # vocabulary table; first recordings 132.0k/151.6k rows/s at
    # 50k-row batches — ~3x under-recording floor. (Smoke note: a
    # StackOverflowError can appear on the stream-execution thread when
    # stop() interrupts the post-measure batch — it reproduces
    # identically on cdc_apply in the same standalone harness, is a
    # stop-path artifact of this Spark build's error classification,
    # and never affects measured batches or committed state.)
    "term_index": 45_000,
    # round-14 streaming IVF ingest: codegen argmax projection + the
    # same bucket-pruned parquet upsert class as term_index; every
    # batch's posting set is NEW keys (monotone vec_id), so the merge
    # is the hot-bucket worst case; first recording 47.1k rows/s at
    # 50k-row batches — ~3x under-recording floor (floor kept at 10k
    # for headroom against loaded runs)
    "ivf_index": 10_000,
}

def _state_bounds(rows_filter: int, rows_dedup: int) -> dict[str, int]:
    """Per-pipeline MAX ``state_rows_final`` (round-16 gate, verdict
    item 1): the r15 artifacts recorded the signal but nothing failed
    on a state-growth regression — a wiring change silently reverting
    ``evict_after_ms``/``evict_state`` to None belongs to CI, not to a
    100 TB OOM. A pipeline above its bound (or reporting None where
    state is expected) lands in ``state_regressions`` and exits 1,
    exactly like the rows/s floors. Most bounds sit ~1.5x over the
    known plateau (r15 recordings) so quiet-machine variance never
    trips them while a leak regime (linear growth per batch) always
    does. TWO bounds are deliberately tighter (plateau + HALF a
    batch): interval_join and embedding_dedup, whose plateaus are
    DETERMINISTIC rows-seen counts at the fixed final measured batch
    (round-16 self-review: the earlier 12x-run ceilings could never
    trip within the run; the post-close review then caught that a
    one-full-batch margin + the strict-> gate let a plateau+1-batch
    regime land exactly AT the bound and pass). If you change the
    feed shape, WARMUP/MEASURE, or the batch size, recompute those
    two plateaus — the margin does not absorb an extra batch, by
    construction now.
    """
    # event time advances 1 s/batch and the run spans WARMUP+MEASURE
    # (+ up to ~2 stop-lag) batches — watermark-bounded identity
    # stores can hold at most every row seen during the short run
    run_batches = WARMUP_BATCHES + MEASURE_BATCHES + 2
    return {
        # fixed ~4,096-key feeds (exception_class; +1 NULL-key row on
        # the rolling tiers): one state row per key, plateau 4,096-7
        "dedup_watermark": 6_000,
        "dedup_refresh": 6_000,
        "dedup_refresh_hot": 6_000,
        # 64 ids packed per state key over the same keyspace -> 64 packs
        "dedup_refresh_coalesced": 100,
        "rolling_stats": 6_000,
        "rolling_stats_corrected": 6_000,
        "rolling_corr": 6_000,
        # TWS twins (round 17): numRowsTotal counts primary state rows
        # — measured plateau 4,096/4,097 on the same ~4k-key feeds
        "dedup_refresh_tws": 6_000,
        "rolling_stats_tws": 6_000,
        "rolling_corr_tws": 6_000,
        "rolling_stats_corrected_late": 6_000,
        "rolling_corr_corrected_late": 6_000,
        # CHURN tiers: ~1,000 fresh keys/batch, 1 s idle eviction ->
        # plateau = keys inside the timeout horizon (~2-3 batches,
        # 2-3k). An eviction revert grows ~1k/batch to ~10k+ by the
        # final measured batch -> trips. Bound leaves ~2x headroom
        # over the worst plateau and ~2x separation from the leak.
        "rolling_stats_churn": 5_000,
        "dedup_refresh_churn": 5_000,
        # pack count is capped by the hash modulus (256); the tier's
        # REAL leak signal is state_ids_final under _ID_BOUNDS
        "dedup_refresh_coalesced_churn": 300,
        # watermark-bounded window stores: 5 levels x a handful of
        # open windows (r15 recordings 5 / 5 / 10)
        "windowed_agg": 64,
        "session_window": 64,
        "sliding_window": 128,
        # identity/buffer stores legitimately grow with rows during
        # the short run (the watermark horizon exceeds the run's 10 s
        # event-time span, so NOTHING is evicted and a dropped
        # watermark is indistinguishable within this run — these two
        # bounds are row-DUPLICATION/runaway + signal-presence checks,
        # not watermark checks). Bounds sit HALF a batch over the
        # deterministic rows-seen plateau (r15/r16 recordings:
        # exactly 500k / 1.8M at the default feed sizes), so one
        # whole extra batch of retained rows trips the strict-> gate
        # — plateau+batch landing exactly AT a bound would pass it
        # (post-close review finding on the earlier one-batch margin).
        "embedding_dedup": rows_dedup * 10 + rows_dedup // 2,
        "interval_join": rows_filter * 9 + rows_filter // 2,
        # banded-minhash stores: distinct (band, signature) buckets
        # over the fixed corpus (r15 recordings 2,667 / 5,908)
        "minhash_dedup": 6_000,
        "minhash_dedup_any": 12_000,
    }


def _state_gate(
    results: dict,
    bounds: dict[str, int],
    field: str = "state_rows_final",
) -> list[str]:
    """The state-size gate decision, separated from main() so the
    pass/fail semantics are unit-testable: a bounded pipeline regresses
    when its ``field`` reading exceeds the bound OR is None (signal
    lost / run stalled — never a pass). Unbounded (stateless) pipelines
    and bounds for pipelines absent from this run are ignored."""
    return sorted(
        name
        for name, bound in bounds.items()
        if name in results
        and (
            results[name].get(field) is None
            or results[name][field] > bound
        )
    )


# retained-id bounds checked against "state_ids_final" (statestore
# read, not progress): the coalesced churn tier's pack count is fixed
# at the hash modulus, so its leak class — ids accumulating INSIDE
# touched packs when the inline retention prune breaks — only shows in
# the summed ids array length. With a 1 s window over the churn feed,
# ~1-2 batches' ~1k ids may legitimately remain; a broken prune
# retains all ~10k+ ids ever seen.
_ID_BOUNDS = {"dedup_refresh_coalesced_churn": 5_000}


_LEVELS = ("INFO", "WARN", "ERROR", "DEBUG", "TRACE")


def _rate_source(spark, rows_per_batch: int):
    """Deterministic micro-batch source: exactly rows_per_batch rows per
    trigger, event time advancing 1 s per batch."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )


def _decoded(src):
    """Shape the rate stream like the decoded LogEvent stream the
    pipelines consume: event.level cycles the 5 levels,
    event.exception.exception_class has ~4k distinct ids (1 in 5 rows
    null — the reference's non-exception records)."""
    level = F.element_at(
        F.array(*[F.lit(x) for x in _LEVELS]), (F.col("value") % 5 + 1).cast("int")
    )
    exc = F.when(
        F.col("value") % 5 != 0,
        F.concat(F.lit("exc_"), (F.col("value") % 4096).cast("string")),
    )
    return src.select(
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("row_id"),
        F.struct(
            level.alias("level"),
            F.struct(exc.alias("exception_class")).alias("exception"),
        ).alias("event"),
    )


def _run_query(df, name: str, ckpt_root: str, sink_fn=None) -> dict:
    """Run df through a foreachBatch sink (default: counting) for
    WARMUP+MEASURE batches; report throughput from query progress."""
    q = (
        df.writeStream.foreachBatch(sink_fn or (lambda bdf, bid: bdf.count()))
        .option("checkpointLocation", os.path.join(ckpt_root, name))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            lp = q.lastProgress
            if lp and lp["batchId"] >= WARMUP_BATCHES + MEASURE_BATCHES:
                break
            time.sleep(0.2)
        progresses = [
            p
            for p in q.recentProgress
            if WARMUP_BATCHES <= p["batchId"] < WARMUP_BATCHES + MEASURE_BATCHES
            and p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    durs = sorted(p["durationMs"]["triggerExecution"] for p in progresses)
    rows = sum(p["numInputRows"] for p in progresses)
    total_ms = sum(durs)
    # state-size observability (round 15): the final measured batch's
    # state-store row count, so round-over-round artifacts expose
    # state GROWTH regressions (the leak class the eviction tiers
    # close) — None for stateless pipelines
    state_rows = None
    if progresses:
        ops = progresses[-1].get("stateOperators") or []
        if ops:
            state_rows = sum(op.get("numRowsTotal", 0) for op in ops)
    return {
        "rows_per_sec": round(rows / (total_ms / 1000.0), 1) if total_ms else None,
        "batch_ms_p50": durs[len(durs) // 2] if durs else None,
        "batch_ms_max": durs[-1] if durs else None,
        "batches": len(durs),
        "state_rows_final": state_rows,
    }


def run_pipelines(
    spark,
    ckpt_root: str,
    rows_filter: int,
    rows_dedup: int,
    only: str | frozenset | None = None,
) -> dict[str, dict]:
    """Run every benched pipeline (or exactly ``only``) and return the
    per-pipeline measurement dicts. Split out of main() in round 19 so
    the host-stall defense can re-run ONE pipeline in a fresh process
    (``--only NAME``) — the process-fresh re-probe that distinguishes
    a hypervisor pause from a real code regression."""
    results: dict[str, dict] = {}

    def _w(name: str) -> bool:
        if only is None:
            return True
        return name == only if isinstance(only, str) else name in only

    if _w("filter"):
        d = _decoded(_rate_source(spark, rows_filter))
        results["filter"] = {
            **_run_query(filter_pipeline(d), "filter", ckpt_root),
            "rows_per_batch": rows_filter,
        }

    if _w("dedup_watermark"):
        d = _decoded(_rate_source(spark, rows_filter))
        results["dedup_watermark"] = {
            **_run_query(
                dedup_pipeline_within_watermark(d), "dedup_watermark", ckpt_root
            ),
            "rows_per_batch": rows_filter,
        }

    if _w("dedup_refresh"):
        d = _decoded(_rate_source(spark, rows_dedup)).withColumn(
            "dedup_id", F.col("event.exception.exception_class")
        )
        results["dedup_refresh"] = {
            **_run_query(
                dedup_refresh_stream(
                    d, id_col="dedup_id", ts_col="event_time", payload_cols=("row_id",)
                ),
                "dedup_refresh",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }

    # same operator, same ~4k key space, 4x the rows per batch
    # (~48 rows/key): the per-key protocol floor amortizes and the
    # number reflects the vectorized kernel
    if _w("dedup_refresh_hot"):
        d = _decoded(_rate_source(spark, rows_filter)).withColumn(
            "dedup_id", F.col("event.exception.exception_class")
        )
        results["dedup_refresh_hot"] = {
            **_run_query(
                dedup_refresh_stream(
                    d, id_col="dedup_id", ts_col="event_time", payload_cols=("row_id",)
                ),
                "dedup_refresh_hot",
                ckpt_root,
            ),
            "rows_per_batch": rows_filter,
        }

    # round-13 key-coalesced tier: same workload as dedup_refresh_hot,
    # ids packed 64-per-state-key, decisions vectorized across the
    # pack (probe: 1.19-1.21x over per-key; parity-tested)
    from kafkastreams_example_spark.streaming.dedup_refresh import (
        dedup_refresh_stream_coalesced,
    )

    if _w("dedup_refresh_coalesced"):
        d = _decoded(_rate_source(spark, rows_filter)).withColumn(
            "dedup_id", F.col("event.exception.exception_class")
        )
        results["dedup_refresh_coalesced"] = {
            **_run_query(
                dedup_refresh_stream_coalesced(
                    d, id_col="dedup_id", ts_col="event_time",
                    payload_cols=("row_id",), n_state_keys=64,
                ),
                "dedup_refresh_coalesced",
                ckpt_root,
            ),
            "rows_per_batch": rows_filter,
        }

    # round-13 per-event trailing-window stats (streaming OVER
    # aggregation — the RANGE kernel's streaming face); ~4k
    # entities via the exception-class id, value synthesized from
    # the rate value
    from kafkastreams_example_spark.streaming.rolling_stats import (
        rolling_stats_stream,
    )

    # shared feed for the rolling family (stats/corrected/corr + TWS
    # twins) — lazy plan construction, cheap to build unconditionally
    d = (
        _decoded(_rate_source(spark, rows_dedup))
        .withColumn("ent", F.col("event.exception.exception_class"))
        .withColumn(
            "value", (F.col("row_id") % 997).cast("double")
        )
    )
    if _w("rolling_stats"):
        results["rolling_stats"] = {
            **_run_query(
                rolling_stats_stream(
                    d, entity_cols=("ent",), ts_col="event_time",
                    value_col="value", id_col="row_id",
                    window_us=3_600_000_000,
                ),
                "rolling_stats",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }

    # round-14 corrected-emission tier: same kernel + row ids and
    # a per-key rev sequence in state; on this in-order feed the
    # correction set is empty, so the reading prices the tier's
    # bookkeeping overhead (id array state amplification + rev)
    if _w("rolling_stats_corrected"):
        results["rolling_stats_corrected"] = {
            **_run_query(
                rolling_stats_stream(
                    d, entity_cols=("ent",), ts_col="event_time",
                    value_col="value", id_col="row_id",
                    window_us=3_600_000_000, emit_corrections=True,
                ),
                "rolling_stats_corrected",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }

    # round-14 two-series face of the same kernel: per-event
    # trailing-window Pearson corr of value against time — same
    # state layout, plus co-moment prefixes and exact
    # change-count degeneracy per (entity, batch)
    from kafkastreams_example_spark.streaming.rolling_corr import (
        rolling_corr_stream,
    )

    if _w("rolling_corr"):
        results["rolling_corr"] = {
            **_run_query(
                rolling_corr_stream(
                    d, entity_cols=("ent",), ts_col="event_time",
                    value_col="value", id_col="row_id",
                    window_us=3_600_000_000,
                ),
                "rolling_corr",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }

    # round-17: the transformWithState (v2 state API) faces
    # EXECUTE here now (vendored protobuf — _proto_vendor.py), so
    # the TWS twins of dedup_refresh and rolling_stats are benched
    # on the SAME feeds as their applyInPandasWithState tiers —
    # the reading prices the proto state-server round-trips
    # against APWS's Arrow state columns. Gated: environments
    # without any protobuf skip these two, keeping the bench
    # green-by-construction elsewhere.
    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_tws,
        tws_available,
    )

    if tws_available()[0]:
        if _w("dedup_refresh_tws"):
            d_tws = _decoded(_rate_source(spark, rows_dedup)).withColumn(
                "dedup_id", F.col("event.exception.exception_class")
            )
            results["dedup_refresh_tws"] = {
                **_run_query(
                    dedup_refresh_stream_tws(
                        d_tws, id_col="dedup_id", ts_col="event_time",
                        payload_cols=("row_id",),
                    ),
                    "dedup_refresh_tws",
                    ckpt_root,
                ),
                "rows_per_batch": rows_dedup,
            }

        from kafkastreams_example_spark.streaming.rolling_stats_tws import (
            rolling_stats_stream_tws,
        )

        if _w("rolling_stats_tws"):
            results["rolling_stats_tws"] = {
                **_run_query(
                    rolling_stats_stream_tws(
                        d, entity_cols=("ent",), ts_col="event_time",
                        value_col="value", id_col="row_id",
                        window_us=3_600_000_000,
                    ),
                    "rolling_stats_tws",
                    ckpt_root,
                ),
                "rows_per_batch": rows_dedup,
            }

        from kafkastreams_example_spark.streaming.rolling_corr_tws import (
            rolling_corr_stream_tws,
        )

        if _w("rolling_corr_tws"):
            results["rolling_corr_tws"] = {
                **_run_query(
                    rolling_corr_stream_tws(
                        d, entity_cols=("ent",), ts_col="event_time",
                        value_col="value", id_col="row_id",
                        window_us=3_600_000_000,
                    ),
                    "rolling_corr_tws",
                    ckpt_root,
                ),
                "rows_per_batch": rows_dedup,
            }

    # round-15 LATE-HEAVY tier for both corrected faces: the
    # in-order feeds above have an EMPTY correction set, so they
    # price only the tiers' bookkeeping — the real cost is emit
    # amplification under lateness. Here 1 row in LATE_EVERY
    # arrives W/2 late, and event time is scaled so one batch
    # spans ~one window (us_per_row = W / rows_per_batch): each
    # late row then retro-affects ~half its entity's in-window
    # state rows — a steady-state lateness regime, not a
    # degenerate all-rows-in-one-window pileup. Output rows are
    # counted in the sink: correction_ratio = emitted / input
    # over the measured batches (stats face: > 1.0 means
    # re-emissions; corr face: undefined-corr rows are dropped so
    # the ratio also nets out the defined-frame contract).
    # The late predicate uses offset 3, NOT 0: _decoded nulls the
    # exception class (= ent) when row_id % 5 == 0, and LATE_EVERY
    # is a multiple of 5 — a % == 0 cut would concentrate EVERY
    # late row on the single NULL-entity key and leave the ~4k
    # real entities on the empty-correction in-order path
    # (round-15 review finding); % == 3 is never ≡ 0 (mod 5), so
    # late rows spread across the real entities.
    W_us = 3_600_000_000
    us_per_row = max(W_us // rows_dedup, 1)
    base_t = F.col("row_id") * F.lit(us_per_row)
    late_t = F.when(
        F.col("row_id") % LATE_EVERY == 3, base_t - F.lit(W_us // 2)
    ).otherwise(base_t)
    d_late = (
        _decoded(_rate_source(spark, rows_dedup))
        .withColumn("ent", F.col("event.exception.exception_class"))
        .withColumn("value", (F.col("row_id") % 997).cast("double"))
        .withColumn("event_time", F.timestamp_micros(late_t))
    )
    for nm, builder in (
        ("rolling_stats_corrected_late", rolling_stats_stream),
        ("rolling_corr_corrected_late", rolling_corr_stream),
    ):
        if not _w(nm):
            continue
        out_counts: dict[int, int] = {}
        res = _run_query(
            builder(
                d_late, entity_cols=("ent",), ts_col="event_time",
                value_col="value", id_col="row_id", window_us=W_us,
                emit_corrections=True,
            ),
            nm,
            ckpt_root,
            sink_fn=lambda bdf, bid, c=out_counts: c.__setitem__(
                bid, bdf.count()
            ),
        )
        measured_out = sum(
            v
            for k, v in out_counts.items()
            if WARMUP_BATCHES <= k < WARMUP_BATCHES + MEASURE_BATCHES
        )
        measured_in = MEASURE_BATCHES * rows_dedup
        results[nm] = {
            **res,
            "rows_per_batch": rows_dedup,
            "correction_ratio": (
                round(measured_out / measured_in, 3)
                if measured_in
                else None
            ),
        }

    # ---- round-16 CHURN tiers: the state-bound gate's teeth ----
    # Every feed above has a FIXED ~4k keyspace, so its state
    # plateaus with or without eviction — a wiring change that
    # reverts evict_after_ms / evict_state to None would pass
    # those tiers unnoticed. These two drive PURE CHURN (each key
    # emits one run of ~50 consecutive rows, then never returns;
    # ~1,000 fresh keys per batch) WITH eviction armed at a 1 s
    # idle timeout: state must plateau near the keys active inside
    # the timeout horizon (~2-3 batches' worth). A revert makes
    # state grow ~1,000 rows/batch to ~10k+ by the final measured
    # batch and trips STATE_BOUNDS (same churn shape
    # tools/eviction_probe.py prices: flat ~200 vs unbounded 1200).
    rows_per_key = max(rows_dedup // 1000, 1)
    d_churn = _rate_source(spark, rows_dedup).select(
        (F.col("value") / rows_per_key).cast("bigint").alias("ent"),
        F.col("value").alias("row_id"),
        F.col("timestamp").alias("event_time"),
        (F.col("value") % 997).cast("double").alias("value"),
    )
    if _w("rolling_stats_churn"):
        results["rolling_stats_churn"] = {
            **_run_query(
                rolling_stats_stream(
                    d_churn, entity_cols=("ent",), ts_col="event_time",
                    value_col="value", id_col="row_id",
                    window_us=3_600_000_000, evict_after_ms=1_000,
                ),
                "rolling_stats_churn",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }
    # per-key dedup under the same churn, evict_state=True: the
    # TTL is window_ms (1 s) of wall-clock idleness — dead ids'
    # seen-timelines must be forgotten, not retained forever
    if _w("dedup_refresh_churn"):
        results["dedup_refresh_churn"] = {
            **_run_query(
                dedup_refresh_stream(
                    d_churn.withColumnRenamed("ent", "dedup_id"),
                    window_ms=1_000,
                    id_col="dedup_id",
                    ts_col="event_time",
                    payload_cols=("row_id",),
                    evict_state=True,
                ),
                "dedup_refresh_churn",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }
    # coalesced dedup under the same churn. Its pack count (what
    # numRowsTotal sees) is FIXED at the hash modulus, so the leak
    # class here is invisible to the state-rows gate: ids retained
    # INSIDE touched packs, bounded only by the inline event-time
    # retention prune (dedup_refresh.py: touched packs prune aged
    # ids; evict_state covers only all-quiet packs). Gate the real
    # signal instead — total retained ids summed from the state
    # store itself after the run ("state_ids_final",
    # _ID_BOUNDS): with a 1 s window only the last ~1-2 batches'
    # ~1k ids may remain; a broken prune retains every id ever
    # seen (~10k+ by run end) and trips.
    # (dedup_refresh_stream_coalesced was imported at the fixed-key
    # coalesced tier above — same run_pipelines scope.)
    if _w("dedup_refresh_coalesced_churn"):
        nm = "dedup_refresh_coalesced_churn"
        res = _run_query(
            dedup_refresh_stream_coalesced(
                d_churn.withColumnRenamed("ent", "dedup_id"),
                window_ms=1_000,
                id_col="dedup_id",
                ts_col="event_time",
                payload_cols=("row_id",),
                evict_state=True,
            ),
            nm,
            ckpt_root,
        )
        try:
            st = spark.read.format("statestore").load(
                os.path.join(ckpt_root, nm)
            )
            res["state_ids_final"] = (
                st.select(
                    F.sum(F.size("value.groupState.ids")).alias("n")
                ).collect()[0]["n"]
                or 0
            )
        except Exception:  # noqa: BLE001
            # no committed batch (query stalled/crashed): the gate's
            # None-never-passes rule reports it — one tier's failure
            # must not take down the whole bench artifact
            res["state_ids_final"] = None
        results[nm] = {**res, "rows_per_batch": rows_dedup}

    # streaming windowed aggregation (tumbling 1 h per level, 10 min
    # watermark): measures the partial-agg + state-store update path
    if _w("windowed_agg"):
        d = _decoded(_rate_source(spark, rows_filter))
        results["windowed_agg"] = {
            **_run_query(windowed_count_pipeline(d), "windowed_agg", ckpt_root),
            "rows_per_batch": rows_filter,
        }

    # streaming session windows (5 min gap per level, 10 min
    # watermark): measures the dynamic-window state-merge path —
    # heavier than tumbling because overlapping session candidates
    # merge in the state store before emission
    if _w("session_window"):
        d = _decoded(_rate_source(spark, rows_filter))
        results["session_window"] = {
            **_run_query(session_window_pipeline(d), "session_window", ckpt_root),
            "rows_per_batch": rows_filter,
        }

    # sliding windows (10 min window / 5 min slide per level): each
    # event lands in window/slide = 2 state rows, so the expected
    # cost is ~2x tumbling — the hopping-window class used for
    # trend smoothing (r8 verdict item 8: tested but unbenched)
    if _w("sliding_window"):
        d = _decoded(_rate_source(spark, rows_filter))
        results["sliding_window"] = {
            **_run_query(sliding_window_pipeline(d), "sliding_window", ckpt_root),
            "rows_per_batch": rows_filter,
        }

    # streaming embedding near-dup ingest gate (round 9): stateless
    if _w("embedding_dedup"):
        # per-row PQ assignment (codebooks as literal arrays), probed
        # rows anti-join a static corpus index on bucket + cosine, the
        # any-band counting trick closes the verdict. Corpus/index are
        # batch side inputs from the sf0.1 embeddings table; the stream
        # synthesizes 64-dim vectors from the rate value. Python-free:
        # every stage is codegen expressions + one stream-static join.
        emb_corpus = spark.read.parquet(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            + "/embeddings.parquet"
        )
        e_index, e_ac, e_bc, e_grid = embedding_corpus_index(emb_corpus)
        e_index = e_index.cache()
        e_index.count()
        # round 10: the gate's two BLAS-vectorized stages cut per-batch
        # latency ~4x, so batches doubled (rows_filter // 8 → // 4,
        # p50 ~1.6 s — still comparable to the sibling pipelines) and
        # the synthesis moved from F.transform (a higher-order function
        # — interpreted per element, 64 lambda evals/row) to an
        # UNROLLED F.array of 64 codegen expressions. A numpy
        # mapInPandas synthesizer was measured SLOWER (16k vs 22k
        # rows/s): chaining a second Python stage round-trips the fat
        # array column through Arrow twice.
        n_emb = rows_filter // 4
        vec_expr = F.array(
            *[((F.col("value") * 31 + i * 7919) % 1000) / 500.0 - 1.0 for i in range(64)]
        )
        ev = _rate_source(spark, n_emb).select(
            F.col("value").alias("vec_id"),
            F.col("timestamp").alias("event_time"),
            vec_expr.alias("embedding"),
        )
        results["embedding_dedup"] = {
            **_run_query(
                embedding_dedup_pipeline(ev, e_index, e_ac, e_bc, e_grid),
                "embedding_dedup",
                ckpt_root,
            ),
            "rows_per_batch": n_emb,
        }
        e_index.unpersist()

    # watermarked stream-stream interval join (impression→click
    # attribution, 1:1 key match): measures symmetric join-state
    # buffering. numInputRows counts BOTH sides.
    if _w("interval_join"):
        n_join = rows_filter // 2
        imps = _rate_source(spark, n_join).select(
            F.col("value").alias("ad_id"), F.col("timestamp").alias("imp_time")
        )
        clicks = _rate_source(spark, n_join).select(
            F.col("value").alias("ad_id"), F.col("timestamp").alias("click_time")
        )
        results["interval_join"] = {
            **_run_query(
                attribution_join_pipeline(imps, clicks), "interval_join", ckpt_root
            ),
            "rows_per_batch": 2 * n_join,
        }
    # stream-static broadcast enrichment: events keyed into the
    # sf customer dim (bounded snapshot, explicitly broadcast) —
    # measures the per-batch broadcast-probe path, the canonical
    # streaming dimension lookup
    if _w("static_enrich"):
        cust = spark.read.parquet(
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            + "/customer.parquet"
        ).select(
            F.col("c_custkey").alias("user_id"),
            "c_mktsegment",
            "c_nationkey",
        )
        n_cust = cust.count()
        ev = _rate_source(spark, rows_filter).select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("event_time"),
            (F.col("value") % n_cust + 1).alias("user_id"),
        )
        results["static_enrich"] = {
            **_run_query(
                static_enrich_pipeline(ev, cust), "static_enrich", ckpt_root
            ),
            "rows_per_batch": rows_filter,
        }

    # LLM-ingest pipelines over a synthetic document stream:
    # ~14-token docs, 90% in-window duplicate mass for the dedup
    def _doc_stream(n):
        return _rate_source(spark, n).select(
            F.col("timestamp").alias("event_time"),
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("sample document body number "),
                (F.col("value") % 5000).cast("string"),
                F.lit(" with the quick brown fox and some filler tokens"),
            ).alias("text"),
        )

    if _w("quality_filter"):
        results["quality_filter"] = {
            **_run_query(
                quality_filter_pipeline(_doc_stream(rows_filter)),
                "quality_filter",
                ckpt_root,
            ),
            "rows_per_batch": rows_filter,
        }
    if _w("minhash_dedup"):
        results["minhash_dedup"] = {
            **_run_query(
                minhash_band_dedup_pipeline(_doc_stream(rows_dedup)),
                "minhash_dedup",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }
    # any-band tier: 2 chained stateful stages, n_bands x the state
    # rows — the exact-recall upgrade's throughput price on record
    if _w("minhash_dedup_any"):
        results["minhash_dedup_any"] = {
            **_run_query(
                minhash_band_dedup_any_pipeline(_doc_stream(rows_dedup)),
                "minhash_dedup_any",
                ckpt_root,
            ),
            "rows_per_batch": rows_dedup,
        }

    # continuous heavy-hitters: each batch reduced to Misra-Gries
    if _w("topk_terms"):
        # partition summaries in the cluster, folded into a k-bounded
        # driver sketch (functions/sketches.StreamingTopK). Term stream
        # is zipf-ish (u³ skew over ~5000 ids) so the decrement path is
        # genuinely exercised: k=512 < batch vocabulary.
        from kafkastreams_example_spark.functions.sketches import (
            StreamingTopK,
        )

        terms = _rate_source(spark, rows_filter).select(
            F.concat(
                F.lit("term_"),
                F.floor(
                    F.pow((F.col("value") % 10000) / 10000.0, 3) * 5000
                ).cast("string"),
            ).alias("term")
        )
        tracker = StreamingTopK(k=512)
        results["topk_terms"] = {
            **_run_query(
                terms, "topk_terms", ckpt_root,
                sink_fn=tracker.foreach_batch(),
            ),
            "rows_per_batch": rows_filter,
        }

    # CDC apply: the rate stream as a change log (value IS the log
    if _w("cdc_apply"):
        # offset — globally monotonic across batches, the seq contract),
        # 50k churning keys, 10% deletes. Each batch pays a real
        # argmax merge + bucket-pruned parquet rewrite.
        from kafkastreams_example_spark.streaming.cdc_table import CdcTable

        changes = _rate_source(spark, rows_dedup).select(
            (F.col("value") % 50_000).alias("k"),
            F.col("value").alias("seq"),
            F.when(F.col("value") % 10 == 0, "d").otherwise("u").alias("op"),
            F.concat(F.lit("p"), (F.col("value") % 997).cast("string")).alias(
                "payload"
            ),
        )
        cdc = CdcTable(
            os.path.join(ckpt_root, "cdc_table_data"), key="k", n_buckets=16
        )
        results["cdc_apply"] = {
            **_run_query(
                changes, "cdc_apply", ckpt_root, sink_fn=cdc.sink()
            ),
            "rows_per_batch": rows_dedup,
        }

    # incremental term index: every batch explodes ~15 distinct
    if _w("term_index"):
        # terms + 1 stats row per doc and upserts the vocabulary-keyed
        # MaterializedCounts table (bucket-pruned parquet rewrite per
        # batch — real index maintenance; serves q_bm25_incremental's
        # ranking tier)
        from kafkastreams_example_spark.streaming.mat_view import (
            MaterializedCounts,
        )
        from kafkastreams_example_spark.streaming.pipelines import (
            term_index_feed,
        )

        idx = MaterializedCounts(
            os.path.join(ckpt_root, "term_index_data"),
            keys=("term",),
            value_col="value",
            n_buckets=16,
        )
        results["term_index"] = {
            **_run_query(
                term_index_feed(_doc_stream(rows_dedup)),
                "term_index",
                ckpt_root,
                sink_fn=idx.sink(),
            ),
            "rows_per_batch": rows_dedup,
        }

    # round-14 streaming IVF ingest: per row an O(C·dim) codegen
    if _w("ivf_index"):
        # argmax against a FROZEN 16-centroid dim-8 codebook (pure
        # projection, no shuffle, no Python), then the bucket-pruned
        # posting-list upsert — the third index-as-you-land pipeline
        from kafkastreams_example_spark.streaming.pipelines import (
            ivf_index_feed,
        )

        dim = 8
        crows = [
            (j, [1.0 if p == j % dim else 0.2 * ((j + p) % 3) for p in range(dim)])
            for j in range(16)
        ]
        emb_stream = _rate_source(spark, rows_dedup).select(
            F.col("value").alias("vec_id"),
            F.array(
                *[
                    ((F.col("value") * (p + 3)) % 17).cast("double")
                    for p in range(dim)
                ]
            ).alias("embedding"),
        )
        ivf_idx = MaterializedCounts(
            os.path.join(ckpt_root, "ivf_index_data"),
            keys=("ivf_bucket", "vec_id"),
            value_col=None,
            n_buckets=16,
        )
        results["ivf_index"] = {
            **_run_query(
                ivf_index_feed(emb_stream, crows),
                "ivf_index",
                ckpt_root,
                sink_fn=ivf_idx.sink(),
            ),
            "rows_per_batch": rows_dedup,
        }
    return results


# ---- round-19 host-stall defense -----------------------------------
# Two of the three round-18 close runs tripped ONE-OFF floor breaches
# on DIFFERENT pipelines, each reading 1.5-3x ABOVE floor when
# re-probed process-fresh, with dmesg showing hypervisor timer stalls
# (BASELINE.md round-18 honesty note) — the exact false-positive
# class the batch bench closed with canary-drift normalization
# (bench.py:201-230). Streaming has no stable intra-run canary (each
# pipeline runs once, and a stall is a PAUSE, not a uniform slowdown),
# so the defense here is the one the adjudications actually performed
# by hand: any pipeline reading below its floor is re-run ONCE in a
# FRESH PROCESS (fresh interpreter + JVM — the same regime the floors
# were pinned from). A stalled first reading clears on re-probe and is
# replaced (both readings recorded under "stall_reprobe"); a genuine
# code regression fails the re-probe too and still gates. A cap keeps
# a systemically slow box from triggering a re-probe storm: above
# MAX_REPROBES breaches the readings are reported raw — that is drift
# or a real multi-pipeline regression, not a one-off stall.

MAX_REPROBES = 4


def _floor_breaches(results: dict, thresholds: dict) -> list[str]:
    """Pipelines reading below floor. rows_per_sec None means ZERO
    measured batches inside the deadline — a total stall is the worst
    regression, not an exemption."""
    return sorted(
        name
        for name, r in results.items()
        if r.get("rows_per_sec") is None
        or r["rows_per_sec"] < thresholds.get(name, 0)
    )


def reprobe_below_floor(
    results: dict,
    thresholds: dict,
    reprobe_fn,
    max_reprobes: int = MAX_REPROBES,
) -> tuple[dict, dict]:
    """The stall-defense decision, separated from main() so the
    pass/fail semantics are unit-testable (tests/test_bench.py):
    every below-floor pipeline gets ONE process-fresh re-probe via
    ``reprobe_fn(name) -> result | None``. A re-probe at-or-above
    floor REPLACES the stalled reading (state fields included — the
    fresh run is the authoritative measurement); a re-probe still
    below floor (or a failed re-probe, None) keeps the original
    reading and the pipeline gates as a real regression. Returns
    (updated results, reprobe log for the artifact)."""
    breaches = _floor_breaches(results, thresholds)
    if not breaches:
        return results, {}
    if len(breaches) > max_reprobes:
        return results, {
            "systemic": (
                f"{len(breaches)} below-floor pipelines exceed the "
                f"re-probe cap ({max_reprobes}) — host-wide drift or a "
                "real multi-pipeline regression, not a one-off stall; "
                "readings reported raw"
            ),
            "breaches": breaches,
        }
    out = dict(results)
    attempted: dict[str, dict] = {}
    for name in breaches:
        first = results[name]
        fresh = reprobe_fn(name)
        fresh_rps = (fresh or {}).get("rows_per_sec")
        rec = {
            "first_rows_per_sec": first.get("rows_per_sec"),
            "reprobed_rows_per_sec": fresh_rps,
            "cleared": bool(
                fresh_rps is not None and fresh_rps >= thresholds.get(name, 0)
            ),
        }
        base = fresh if rec["cleared"] else first
        out[name] = {**base, "stall_reprobe": rec}
        attempted[name] = rec
    return out, {"attempted": attempted}


def _subprocess_reprobe(name: str) -> dict | None:
    """Re-run ONE pipeline in a fresh interpreter + JVM (``--only``)
    and return its measurement dict, or None if the re-probe itself
    failed — the caller then keeps the original below-floor reading."""
    import subprocess

    here = Path(__file__).resolve()
    # start_new_session so a timeout can kill the whole process GROUP:
    # killing only the direct python child leaves its JVM grandchild
    # alive, stealing CPU from subsequent sequential re-probes and
    # making a LATER pipeline's reading spuriously low (r19 advice)
    proc = subprocess.Popen(
        [sys.executable, str(here), "--only", name],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=str(here.parent),
        start_new_session=True,
    )
    try:
        stdout, _ = proc.communicate(timeout=1200)
    except subprocess.TimeoutExpired:
        import signal

        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.communicate()
        return None
    if proc.returncode != 0:
        return None
    for ln in reversed(stdout.strip().splitlines()):
        # a stray '{'-prefixed log line printed AFTER the payload must
        # not convert a successful re-probe into a failed one — skip
        # non-payload lines and keep scanning earlier output (r19
        # advice: match only the payload, never return on log noise)
        if ln.startswith("{"):
            try:
                doc = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "single" in doc:
                return doc.get("single", {}).get(name)
    return None


def main() -> None:
    only = None
    if "--only" in sys.argv:
        idx = sys.argv.index("--only") + 1
        if idx >= len(sys.argv):
            raise SystemExit("bench_streaming --only: missing pipeline name")
        only = sys.argv[idx]
        if only not in THRESHOLDS:
            raise SystemExit(
                f"bench_streaming --only: unknown pipeline {only!r}"
            )
    # end-to-end drill hooks (round 19): SPARK_GRAFT_STREAM_PIPELINES
    # limits the GATED run to a comma-separated subset, and
    # SPARK_GRAFT_STREAM_FLOORS overlays THRESHOLDS with a JSON dict —
    # together they stage a REAL below-floor breach cheaply (one tiny
    # pipeline, an impossible floor), driving the subprocess re-probe
    # end-to-end (tests/test_bench.py::
    # test_stall_defense_subprocess_drill). Neither is set in normal
    # bench runs, where the full pipeline set gates under THRESHOLDS.
    thresholds = dict(THRESHOLDS)
    floors_env = os.environ.get("SPARK_GRAFT_STREAM_FLOORS")
    if floors_env:
        overlay = json.loads(floors_env)
        unknown = sorted(set(overlay) - set(thresholds))
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_STREAM_FLOORS: unknown pipelines {unknown}"
            )
        thresholds.update(overlay)
    subset_env = os.environ.get("SPARK_GRAFT_STREAM_PIPELINES")
    subset = frozenset(x for x in (subset_env or "").split(",") if x)
    if subset and (bad := sorted(subset - set(thresholds))):
        raise SystemExit(
            f"SPARK_GRAFT_STREAM_PIPELINES: unknown pipelines {bad}"
        )

    spark = get_spark(app_name="bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    rows_filter = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "200000"))
    # the Python stateful path moves every row through Arrow + pandas;
    # smaller batches keep the bench under a minute
    rows_dedup = max(rows_filter // 4, 1000)

    ckpt_root = tempfile.mkdtemp(prefix="bench_streaming_ckpt_")
    try:
        results = run_pipelines(
            spark, ckpt_root, rows_filter, rows_dedup,
            only=only if only is not None else (subset or None),
        )
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
        spark.stop()

    if only is not None:
        # single-pipeline mode: print the raw measurement, no gates —
        # this IS the process-fresh re-probe the parent run consumes
        print(json.dumps({"single": results}))
        return

    # host-stall defense (round 19): process-fresh re-probe of every
    # below-floor reading before gating — see the block comment above
    results, reprobes = reprobe_below_floor(
        results, thresholds, _subprocess_reprobe
    )
    regressions = _floor_breaches(results, thresholds)
    # state-rows gate (round 16): every stateful pipeline must land
    # under its bound; None where state is expected means the signal
    # was lost (or the run stalled) — also a failure, never a pass
    state_bounds = _state_bounds(rows_filter, rows_dedup)
    state_regressions = sorted(
        set(_state_gate(results, state_bounds))
        | set(_state_gate(results, _ID_BOUNDS, field="state_ids_final"))
    )
    for name, r in results.items():
        r["below_threshold"] = name in regressions
        r["above_state_bound"] = name in state_regressions
    print(
        json.dumps(
            {
                "metric": "streaming_throughput",
                "pipelines": results,
                "thresholds": thresholds,
                "state_bounds": state_bounds,
                "id_bounds": _ID_BOUNDS,
                "reprobes": reprobes,
                "regressions": regressions,
                "state_regressions": state_regressions,
            }
        )
    )
    if regressions or state_regressions:
        sys.exit(1)


if __name__ == "__main__":
    main()
