#!/usr/bin/env python
"""Streaming throughput bench: drives the two reference-parity
pipelines (filter, refresh-on-duplicate dedup) plus the built-in
watermark dedup tier over a deterministic rate-micro-batch source and
prints ONE JSON line:

  {"metric": "streaming_throughput", "pipelines": {name: {
      "rows_per_sec": N, "batch_ms_p50": N, "batch_ms_max": N,
      "batches": N, "rows_per_batch": N}}, ...}

The rate-micro-batch source emits exactly rowsPerBatch rows per
trigger, so per-batch latency is comparable run-over-run (the plain
rate source emits wall-clock-dependent row counts). The first two
batches are excluded from metrics (codegen/state-store warmup), the
query runs until MEASURE_BATCHES measured batches complete.

Regression guard (BASELINE.md round 6, recorded on local[32]:
filter 533k rows/s, dedup_watermark 306k rows/s, dedup_refresh
50k rows/s): thresholds filter ≥ 250k, dedup_watermark ≥ 100k,
dedup_refresh ≥ 20k rows/s — ~2x headroom under the recordings to
absorb sandbox variance; a reading below threshold is a real
regression, not noise.

Env: SPARK_GRAFT_CPUS (local parallelism), SPARK_GRAFT_STREAM_ROWS
(rows per batch override for quick smokes).
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
    dedup_pipeline_within_watermark,
    filter_pipeline,
)

WARMUP_BATCHES = 2
MEASURE_BATCHES = 8

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


def _run_query(df, name: str, ckpt_root: str) -> dict:
    """Run df through a counting foreachBatch sink for
    WARMUP+MEASURE batches; report throughput from query progress."""
    q = (
        df.writeStream.foreachBatch(lambda bdf, bid: bdf.count())
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
    return {
        "rows_per_sec": round(rows / (total_ms / 1000.0), 1) if total_ms else None,
        "batch_ms_p50": durs[len(durs) // 2] if durs else None,
        "batch_ms_max": durs[-1] if durs else None,
        "batches": len(durs),
    }


def main() -> None:
    spark = get_spark(app_name="bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    rows_filter = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "200000"))
    # the Python stateful path moves every row through Arrow + pandas;
    # smaller batches keep the bench under a minute
    rows_dedup = max(rows_filter // 4, 1000)

    ckpt_root = tempfile.mkdtemp(prefix="bench_streaming_ckpt_")
    results: dict[str, dict] = {}
    try:
        d = _decoded(_rate_source(spark, rows_filter))
        results["filter"] = {
            **_run_query(filter_pipeline(d), "filter", ckpt_root),
            "rows_per_batch": rows_filter,
        }

        d = _decoded(_rate_source(spark, rows_filter))
        results["dedup_watermark"] = {
            **_run_query(
                dedup_pipeline_within_watermark(d), "dedup_watermark", ckpt_root
            ),
            "rows_per_batch": rows_filter,
        }

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
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
        spark.stop()

    print(json.dumps({"metric": "streaming_throughput", "pipelines": results}))


if __name__ == "__main__":
    main()
