#!/usr/bin/env python
"""Quiet-run floor probe for the transformWithState pipelines
(round-18, verdict item 3).

The three TWS floors in bench_streaming.THRESHOLDS were pinned from
their FIRST recordings (round 17) — against the standing policy of
floors 2-3x under quiet readings measured across runs. This tool runs
exactly the TWS trio (same feeds, same _run_query measurement window
as bench_streaming.py) ``--repeat`` times in one session and prints
per-run rows/s plus min/median, so the floors can be re-derived from
>= 3 quiet observations and recorded in BASELINE.md. Run it on an
otherwise idle box (check loadavg first, as with bench.py).

Usage: python tools/tws_floor_probe.py [--repeat N]
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench_streaming as bs  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_example_spark.session import get_spark  # noqa: E402


def main() -> None:
    repeat = 3
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    import os

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

    def feeds():
        d_dedup = bs._decoded(bs._rate_source(spark, rows_dedup)).withColumn(
            "dedup_id", F.col("event.exception.exception_class")
        )
        d_roll = (
            bs._decoded(bs._rate_source(spark, rows_dedup))
            .withColumn("ent", F.col("event.exception.exception_class"))
            .withColumn("value", (F.col("row_id") % 997).cast("double"))
        )
        return d_dedup, d_roll

    out: dict[str, dict] = {}
    for r in range(repeat):
        ckpt_root = tempfile.mkdtemp(prefix=f"tws_floor_probe_{r}_")
        d_dedup, d_roll = feeds()
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
        for name, q in runs.items():
            m = bs._run_query(q, f"{name}_r{r}", ckpt_root)
            out.setdefault(name, {"runs": []})["runs"].append(
                m["rows_per_sec"]
            )
            print(
                json.dumps({name: {"run": r, **m}}), flush=True
            )
    for name, rec in out.items():
        rec["min"] = min(rec["runs"])
        rec["median"] = statistics.median(rec["runs"])
    print(json.dumps({"tws_floor_probe": out, "repeat": repeat}))
    spark.stop()


if __name__ == "__main__":
    main()
