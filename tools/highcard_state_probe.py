#!/usr/bin/env python
"""High-cardinality streaming-state probe (round-19 verdict item 4).

Every keyed pipeline in bench_streaming.py plateaus at 4,096-4,097
state keys, so the refresh tier's cost model — a state-protocol
round-trip per TOUCHED key per batch, plus whatever the state store
pays to hold the keyspace — has never been observed at a realistic
keyspace. This probe drives dedup_refresh, dedup_refresh_tws and
rolling_stats to ~1M DISTINCT KEYS and records, per batch, the
trigger latency and cumulative state rows, so two regimes are
separated in the artifact:

  * GROWTH (batches 1..K): every batch lands rows_per_batch FRESH
    keys (key = monotone row id mod KEYSPACE), so per-batch cost is
    the per-touched-key protocol price while the store grows by
    rows_per_batch keys per batch.
  * FULL-STATE (batches K+1..): the key sequence wraps; batches
    touch existing keys while the store holds the full KEYSPACE —
    any superlinear degradation here (RocksDB read amplification,
    memtable pressure) is the 100 TB signal the 4k-key bench cannot
    see.

Each pipeline runs in its OWN SUBPROCESS (--single NAME) — the same
process-fresh discipline the TWS floors are pinned under (in-session
streaming repeats degrade monotonically; see bench_streaming.py).

One row per key is the deliberate worst case for the protocol tier:
at 1 row/key/batch nothing amortizes, so the rows/s reading IS the
per-key price. Results are recorded in BASELINE.md (round-19 notes);
floors move only if the cost model says the 4k-key readings
misrepresent the large-keyspace regime.

Usage:
  python tools/highcard_state_probe.py             # all three
  python tools/highcard_state_probe.py --single dedup_refresh
Env: HIGHCARD_KEYS (default 1_048_576), HIGHCARD_ROWS (rows/batch,
default 131_072 -> keyspace wraps after 8 batches).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KEYSPACE = int(os.environ.get("HIGHCARD_KEYS", str(1_048_576)))
ROWS = int(os.environ.get("HIGHCARD_ROWS", str(131_072)))
WARMUP = 1
MEASURE = 14  # growth (8 batches to wrap) + full-state regime


def _feed(spark):
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS)
        .option("numPartitions", spark.sparkContext.defaultParallelism)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
        .select(
            (F.col("value") % KEYSPACE).alias("k"),
            F.col("value").alias("row_id"),
            F.col("timestamp").alias("event_time"),
            (F.col("value") % 997).cast("double").alias("value"),
        )
    )


def _run(spark, df, name: str, ckpt_root: str) -> dict:
    q = (
        df.writeStream.foreachBatch(lambda bdf, bid: bdf.count())
        .option("checkpointLocation", os.path.join(ckpt_root, name))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 3000
        while time.monotonic() < deadline:
            lp = q.lastProgress
            if lp and lp["batchId"] >= WARMUP + MEASURE:
                break
            time.sleep(0.5)
        progresses = [
            p
            for p in q.recentProgress
            if WARMUP <= p["batchId"] < WARMUP + MEASURE
            and p["numInputRows"] > 0
        ]
    finally:
        q.stop()
    batches = []
    for p in progresses:
        ops = p.get("stateOperators") or []
        batches.append(
            {
                "batch": p["batchId"],
                "ms": p["durationMs"]["triggerExecution"],
                "state_rows": sum(op.get("numRowsTotal", 0) for op in ops)
                if ops
                else None,
            }
        )
    wrap_batch = WARMUP + (KEYSPACE + ROWS - 1) // ROWS
    growth = [b for b in batches if b["batch"] < wrap_batch]
    full = [b for b in batches if b["batch"] >= wrap_batch]

    def rps(bs):
        ms = sum(b["ms"] for b in bs)
        return round(len(bs) * ROWS / (ms / 1000.0), 1) if ms else None

    return {
        "keyspace": KEYSPACE,
        "rows_per_batch": ROWS,
        "batches": batches,
        "rows_per_sec_growth": rps(growth),
        "rows_per_sec_full_state": rps(full),
        "state_rows_final": batches[-1]["state_rows"] if batches else None,
    }


def run_single(name: str) -> None:
    from kafkastreams_example_spark.session import get_spark

    spark = get_spark(app_name=f"highcard-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    ckpt_root = tempfile.mkdtemp(prefix=f"highcard_{name}_")
    d = _feed(spark)
    if name == "dedup_refresh":
        from kafkastreams_example_spark.streaming.dedup_refresh import (
            dedup_refresh_stream,
        )

        out = dedup_refresh_stream(
            d, id_col="k", ts_col="event_time", payload_cols=("row_id",)
        )
    elif name == "dedup_refresh_tws":
        from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
            dedup_refresh_stream_tws,
            tws_available,
        )

        ok, reason = tws_available()
        if not ok:
            print(json.dumps({"single": {name: {"error": reason}}}))
            return
        out = dedup_refresh_stream_tws(
            d, id_col="k", ts_col="event_time", payload_cols=("row_id",)
        )
    elif name == "rolling_stats":
        from kafkastreams_example_spark.streaming.rolling_stats import (
            rolling_stats_stream,
        )

        out = rolling_stats_stream(
            d, entity_cols=("k",), ts_col="event_time",
            value_col="value", id_col="row_id",
            window_us=3_600_000_000,
        )
    else:
        raise SystemExit(f"unknown pipeline {name!r}")
    res = _run(spark, out, name, ckpt_root)
    spark.stop()
    print(json.dumps({"single": {name: res}}), flush=True)


def main() -> None:
    if "--single" in sys.argv:
        run_single(sys.argv[sys.argv.index("--single") + 1])
        return
    names = ("dedup_refresh", "dedup_refresh_tws", "rolling_stats")
    out = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, __file__, "--single", name],
            capture_output=True,
            text=True,
            timeout=3600,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        line = next(
            (
                ln
                for ln in reversed(proc.stdout.strip().splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            out[name] = {
                "error": f"rc={proc.returncode}",
                "stderr_tail": proc.stderr[-400:],
            }
        else:
            out[name] = json.loads(line)["single"][name]
        print(json.dumps({name: out[name]}), flush=True)
    print(
        json.dumps(
            {"highcard_state_probe": out, "process_fresh": True}
        )
    )


if __name__ == "__main__":
    main()
