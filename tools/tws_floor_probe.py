#!/usr/bin/env python
"""Quiet-run floor probe for the transformWithState pipelines
(round-18, verdict item 3; round-19 advice fix: process-fresh runs).

The three TWS floors in bench_streaming.THRESHOLDS must be derived
from PROCESS-FRESH observations: the round-18 derivation recorded in
bench_streaming.py shows back-to-back streaming runs inside one
session degrade monotonically (dedup 54.1k -> 41.8k -> 22.7k over
three in-session repeats — state-store/worker residue accumulates per
query), so in-session repeats under-read the regime bench_streaming
actually measures (each pipeline once, fresh JVM). This tool
therefore spawns ONE SUBPROCESS PER ITERATION (`--single` mode runs
one pass of the trio in a fresh interpreter + JVM and prints one JSON
line); the parent aggregates per-run rows/s plus min/median so floors
can be re-derived from >= 3 quiet process-fresh observations and
recorded in BASELINE.md. Run it on an otherwise idle box (check
loadavg first, as with bench.py).

Usage: python tools/tws_floor_probe.py [--repeat N]
       python tools/tws_floor_probe.py --single   (internal: one pass)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_single() -> None:
    """One pass over the TWS trio in THIS process (same feeds, same
    _run_query measurement window as bench_streaming.py); prints one
    JSON line {"single": {name: result}}."""
    import bench_streaming as bs
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.session import get_spark

    rows_filter = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "200000"))
    rows_dedup = max(rows_filter // 4, 1000)

    spark = get_spark(app_name="tws-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from kafkastreams_example_spark.streaming.dedup_refresh_tws import (
        dedup_refresh_stream_tws,
        tws_available,
    )

    ok, reason = tws_available()
    if not ok:
        print(json.dumps({"error": f"tws unavailable: {reason}"}))
        return
    from kafkastreams_example_spark.streaming.rolling_corr_tws import (
        rolling_corr_stream_tws,
    )
    from kafkastreams_example_spark.streaming.rolling_stats_tws import (
        rolling_stats_stream_tws,
    )

    ckpt_root = tempfile.mkdtemp(prefix="tws_floor_probe_")
    d_dedup = bs._decoded(bs._rate_source(spark, rows_dedup)).withColumn(
        "dedup_id", F.col("event.exception.exception_class")
    )
    d_roll = (
        bs._decoded(bs._rate_source(spark, rows_dedup))
        .withColumn("ent", F.col("event.exception.exception_class"))
        .withColumn("value", (F.col("row_id") % 997).cast("double"))
    )
    runs = {
        "dedup_refresh_tws": dedup_refresh_stream_tws(
            d_dedup, id_col="dedup_id", ts_col="event_time",
            payload_cols=("row_id",),
        ),
        "rolling_stats_tws": rolling_stats_stream_tws(
            d_roll, entity_cols=("ent",), ts_col="event_time",
            value_col="value", id_col="row_id",
            window_us=3_600_000_000,
        ),
        "rolling_corr_tws": rolling_corr_stream_tws(
            d_roll, entity_cols=("ent",), ts_col="event_time",
            value_col="value", id_col="row_id",
            window_us=3_600_000_000,
        ),
    }
    out = {name: bs._run_query(q, name, ckpt_root) for name, q in runs.items()}
    spark.stop()
    print(json.dumps({"single": out}), flush=True)


def main() -> None:
    if "--single" in sys.argv:
        run_single()
        return
    repeat = 3
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    out: dict[str, dict] = {}
    for r in range(repeat):
        # fresh interpreter + JVM per iteration: floors are pinned
        # against the process-fresh regime, never in-session repeats
        proc = subprocess.run(
            [sys.executable, __file__, "--single"],
            capture_output=True,
            text=True,
            timeout=1800,
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
            print(
                json.dumps(
                    {
                        "run": r,
                        "error": f"single-pass subprocess rc={proc.returncode}",
                        "stderr_tail": proc.stderr[-500:],
                    }
                ),
                flush=True,
            )
            continue
        payload = json.loads(line)
        if "error" in payload:
            print(json.dumps({"run": r, **payload}), flush=True)
            continue
        for name, m in payload["single"].items():
            out.setdefault(name, {"runs": []})["runs"].append(m["rows_per_sec"])
            print(json.dumps({name: {"run": r, **m}}), flush=True)
    for name, rec in out.items():
        vals = [v for v in rec["runs"] if v is not None]
        rec["min"] = min(vals) if vals else None
        rec["median"] = statistics.median(vals) if vals else None
    print(
        json.dumps(
            {"tws_floor_probe": out, "repeat": repeat, "process_fresh": True}
        )
    )


if __name__ == "__main__":
    main()
