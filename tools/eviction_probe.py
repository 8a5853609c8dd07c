#!/usr/bin/env python
"""Measure what round-15's idle-key eviction actually buys: state-store
row counts under a CHURNING keyspace, with and without eviction.

The leak being priced (round-15 verdict item 1): the rolling faces'
retention pruning runs only when a key receives a batch, so on a
keyspace where entities come and go (the regime a 100 TB ingest lives
in — session ids, request ids, short-lived devices) state grows with
ALL KEYS EVER SEEN, not keys currently active. ``evict_after_ms`` adds
a processing-time idle timeout; this probe drives the same churning
feed through both configurations and reports the state operator's
``numRowsTotal`` trajectory from query progress.

Feed shape: rate-micro-batch, entity id = value // rows_per_entity —
each entity emits a run of consecutive rows and then never returns
(pure churn, ~batch_rows/rows_per_entity fresh entities per batch).

Expected: the NoTimeout run's numRowsTotal climbs linearly with
batches (every dead entity's timeline retained); the evicting run
plateaus near (active keys x timeline rows) once the timeout horizon
is reached. The probe prints one JSON line with both trajectories and
the final ratio.

Usage: python tools/eviction_probe.py [batches] [rows_per_batch]
       [rows_per_entity]  (churn knob: entities/batch = rows/rpe)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.streaming.rolling_stats import (  # noqa: E402
    rolling_stats_stream,
)


def run_once(
    spark,
    n_batches: int,
    rows_per_batch: int,
    evict_after_ms: int | None,
    rows_per_entity: int | None = None,
) -> list[int]:
    """Drive the churning feed for n_batches and return the state
    operator's numRowsTotal per completed batch. ``rows_per_entity``
    sets the churn rate (fresh entities per batch =
    rows_per_batch / rows_per_entity); default keeps the original
    ~100-entities-per-batch shape."""
    if rows_per_entity is None:
        rows_per_entity = max(rows_per_batch // 100, 1)
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
        .select(
            (F.col("value") / rows_per_entity).cast("bigint").alias("ent"),
            F.col("value").alias("row_id"),
            F.col("timestamp").alias("event_time"),
            (F.col("value") % 997).cast("double").alias("value"),
        )
    )
    out = rolling_stats_stream(
        src,
        entity_cols=("ent",),
        ts_col="event_time",
        value_col="value",
        id_col="row_id",
        window_us=3_600_000_000,
        evict_after_ms=evict_after_ms,
    )
    ckpt = tempfile.mkdtemp(prefix="eviction_probe_")
    q = (
        out.writeStream.foreachBatch(lambda bdf, bid: bdf.count())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    rows_by_batch: dict[int, int] = {}
    try:
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            for p in q.recentProgress:
                ops = p.get("stateOperators") or []
                if ops and p["numInputRows"] > 0:
                    rows_by_batch[p["batchId"]] = ops[0]["numRowsTotal"]
            if len(rows_by_batch) >= n_batches:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    return [rows_by_batch[k] for k in sorted(rows_by_batch)][:n_batches]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    # optional churn knob (round-16 scale rehearsal): entities per
    # batch = rows_per_batch / rows_per_entity
    rpe = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="eviction-probe")
    spark.sparkContext.setLogLevel("ERROR")
    no_evict = run_once(spark, n_batches, rows_per_batch, None, rpe)
    evict = run_once(spark, n_batches, rows_per_batch, 2_000, rpe)
    record = {
        "metric": "eviction_state_rows",
        "rows_per_batch": rows_per_batch,
        "rows_per_entity": rpe if rpe else max(rows_per_batch // 100, 1),
        "batches": n_batches,
        "evict_after_ms": 2_000,
        "state_rows_no_evict": no_evict,
        "state_rows_evict": evict,
        "final_ratio": (
            round(no_evict[-1] / evict[-1], 2)
            if no_evict and evict and evict[-1]
            else None
        ),
    }
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
