#!/usr/bin/env python
"""Round-16 scale rehearsal (verdict item 5): the round-15 late-heavy
corrected-emission tiers re-measured at ~x10 the bench shape — 10x the
entity count (~41k synthetic entities vs the bench's ~4k exception
classes) and 10x the rows per batch (500k vs 50k) — so the pricing of
emit amplification under lateness is demonstrated at scale, not just
at the shape the floors were calibrated on.

Feed: same structure as bench_streaming's late tier — event time
scaled so one batch spans ~one window (us_per_row = W / rows), 1 row
in LATE_EVERY arriving W/2 late. The entity modulus is 40_961, NOT a
multiple of LATE_EVERY: with ent = row_id % ent_n and ent_n ≡ 0
(mod 10), every occurrence of an entity would share row_id mod 10 and
the late rows would concentrate on one entity decile (the same
concentration class the bench's offset-3 note closed); ent_n ≡ 1
(mod 10) rotates the residue per occurrence so lateness spreads
across all entities.

Prints one JSON line: rows/s, correction_ratio and state_rows_final
per face at the x10 shape. Recorded in BASELINE.md.

Usage: python tools/late_rehearsal.py [rows_per_batch] [ent_n]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

import bench_streaming as bs  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.streaming.rolling_corr import (  # noqa: E402
    rolling_corr_stream,
)
from kafkastreams_example_spark.streaming.rolling_stats import (  # noqa: E402
    rolling_stats_stream,
)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    ent_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40_961
    w_us = 3_600_000_000
    us_per_row = max(w_us // rows, 1)
    spark = get_spark(app_name="late-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    base_t = F.col("row_id") * F.lit(us_per_row)
    late_t = F.when(
        F.col("row_id") % bs.LATE_EVERY == 3, base_t - F.lit(w_us // 2)
    ).otherwise(base_t)
    ckpt_root = tempfile.mkdtemp(prefix="late_rehearsal_")
    out: dict[str, dict] = {}
    try:
        for nm, builder in (
            ("rolling_stats_corrected_late_x10", rolling_stats_stream),
            ("rolling_corr_corrected_late_x10", rolling_corr_stream),
        ):
            d = (
                bs._rate_source(spark, rows)
                .select(
                    F.col("value").alias("row_id"),
                    (F.col("value") % ent_n).alias("ent"),
                    (F.col("value") % 997).cast("double").alias("value"),
                )
                .withColumn("event_time", F.timestamp_micros(late_t))
            )
            counts: dict[int, int] = {}
            res = bs._run_query(
                builder(
                    d, entity_cols=("ent",), ts_col="event_time",
                    value_col="value", id_col="row_id", window_us=w_us,
                    emit_corrections=True,
                ),
                nm,
                ckpt_root,
                sink_fn=lambda bdf, bid, c=counts: c.__setitem__(
                    bid, bdf.count()
                ),
            )
            measured_out = sum(
                v
                for k, v in counts.items()
                if bs.WARMUP_BATCHES
                <= k
                < bs.WARMUP_BATCHES + bs.MEASURE_BATCHES
            )
            res["correction_ratio"] = round(
                measured_out / (bs.MEASURE_BATCHES * rows), 3
            )
            res["rows_per_batch"] = rows
            res["entities"] = ent_n
            out[nm] = res
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
        spark.stop()
    print(json.dumps({"metric": "late_tier_rehearsal_x10", "pipelines": out}))


if __name__ == "__main__":
    main()
