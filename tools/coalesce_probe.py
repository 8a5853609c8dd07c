#!/usr/bin/env python
"""Key-coalescing probe for the low-occupancy stateful dedup tier
(round-13 verdict item 6).

Round-7 profiling pinned the dedup_refresh floor (~60k rows/s at
~1.2 rows/key/batch) on the applyInPandasWithState PROTOCOL: a NO-OP
stateful fn measures the same wall, ~0.5 ms per key per batch for the
Arrow group round-trip. The mechanical fix is to pay that round-trip
once per PACK of ids instead of once per id:
dedup_refresh_stream_coalesced shuffles by xxhash64(id) % n_state_keys
and keeps a CSR {id -> remembered ts} map per pack, running the SAME
probe_and_remember kernel per logical id.

This probe (a) asserts survivor-set PARITY between the per-key and
coalesced tiers on the bench's deterministic rate-micro-batch workload,
then (b) measures both at the bench's low-occupancy shape (~4k ids,
~1.2 rows/id/batch) across pack counts. Records the win (or documents
the dead end) in BASELINE.md either way.

Usage: python tools/coalesce_probe.py [rows_per_batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench_streaming import _decoded, _rate_source  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.streaming.dedup_refresh import (  # noqa: E402
    dedup_refresh_stream,
    dedup_refresh_stream_coalesced,
)

WARMUP = 2
MEASURE = 6
PACKS = (64, 256, 1024)


def _with_ids(src):
    return _decoded(src).withColumn(
        "dedup_id", F.col("event.exception.exception_class")
    )


def _run(spark, stream_fn, rows_per_batch, ckpt, collect=False):
    """Drive the pipeline for WARMUP+MEASURE deterministic micro-batches
    (bench_streaming's discipline: continuous trigger, progress-polled,
    warmup batches excluded from throughput). Returns
    (survivor (batch_id, row_id) pairs or None, rows_per_sec)."""
    src = _with_ids(_rate_source(spark, rows_per_batch))
    out = stream_fn(src)
    seen = [] if collect else None

    def sink(batch_df, batch_id):
        if collect:
            seen.extend((batch_id, r["row_id"]) for r in batch_df.collect())
        else:
            batch_df.count()

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            lp = q.lastProgress
            if lp and lp["batchId"] >= WARMUP + MEASURE:
                break
            time.sleep(0.2)
        progresses = [
            p
            for p in q.recentProgress
            if WARMUP <= p["batchId"] < WARMUP + MEASURE
            and p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    rows = sum(p["numInputRows"] for p in progresses)
    ms = sum(p["durationMs"]["triggerExecution"] for p in progresses)
    rps = round(rows / (ms / 1000.0), 1) if ms else None
    if collect:
        # only batches BOTH runs certainly completed: deterministic set
        seen = sorted(p for p in seen if p[0] < WARMUP + MEASURE)
    return seen, rps


def main():
    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark(app_name="coalesce_probe")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    out = {}
    # -- parity: identical survivor sets on the same deterministic input
    base_rows, _ = _run(
        spark,
        lambda s: dedup_refresh_stream(
            s, id_col="dedup_id", ts_col="event_time", payload_cols=("row_id",)
        ),
        rows_per_batch,
        tempfile.mkdtemp(prefix="cp_base_"),
        collect=True,
    )
    coal_rows, _ = _run(
        spark,
        lambda s: dedup_refresh_stream_coalesced(
            s, id_col="dedup_id", ts_col="event_time",
            payload_cols=("row_id",), n_state_keys=256,
        ),
        rows_per_batch,
        tempfile.mkdtemp(prefix="cp_coal_"),
        collect=True,
    )
    parity = base_rows == coal_rows
    out["parity"] = {
        "equal": parity,
        "survivors": len(base_rows),
        "coalesced_survivors": len(coal_rows),
    }
    print(json.dumps({"parity": out["parity"]}), flush=True)
    if not parity:
        diff = set(base_rows) ^ set(coal_rows)
        print(json.dumps({"parity_diff_sample": sorted(diff)[:10]}))
        print(json.dumps({"coalesce_probe": out}))
        spark.stop()
        return 1

    # -- throughput: best of 2 runs each (progress-based, warmup cut)
    def measure(fn, label):
        best = None
        for _ in range(2):
            _, rps = _run(
                spark, fn, rows_per_batch,
                tempfile.mkdtemp(prefix=f"cp_{label}_"),
            )
            if rps is not None:
                best = rps if best is None else max(best, rps)
        return best

    out["per_key_rows_per_sec"] = measure(
        lambda s: dedup_refresh_stream(
            s, id_col="dedup_id", ts_col="event_time", payload_cols=("row_id",)
        ),
        "base",
    )
    print(json.dumps({"per_key": out["per_key_rows_per_sec"]}), flush=True)
    for packs in PACKS:
        out[f"coalesced_{packs}_rows_per_sec"] = measure(
            lambda s: dedup_refresh_stream_coalesced(
                s, id_col="dedup_id", ts_col="event_time",
                payload_cols=("row_id",), n_state_keys=packs,
            ),
            f"c{packs}",
        )
        print(
            json.dumps(
                {f"coalesced_{packs}": out[f"coalesced_{packs}_rows_per_sec"]}
            ),
            flush=True,
        )
    best_pack = max(PACKS, key=lambda p: out[f"coalesced_{p}_rows_per_sec"])
    out["speedup_best"] = round(
        out[f"coalesced_{best_pack}_rows_per_sec"] / out["per_key_rows_per_sec"], 2
    )
    out["best_pack"] = best_pack
    print(json.dumps({"coalesce_probe": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
