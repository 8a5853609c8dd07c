"""foreachBatch sinks: the production pattern for exactly-once-ish
delivery to systems without a native streaming sink.

Structured Streaming guarantees foreachBatch is called with a
monotonically increasing batch_id, and REPLAYS the last batch after a
failure — so the sink function must be idempotent per batch_id. The
helper below implements the standard recipe: write each micro-batch to
a batch-id-suffixed directory and skip ids already present (replay →
no-op), giving effectively-once parquet output on top of at-least-once
execution. The same shape wraps JDBC upserts, key-value stores, or any
transactional target at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def idempotent_parquet_sink(base_path: str):
    """Build a foreachBatch function writing each micro-batch to
    base_path/batch_id=<id>/, skipping already-committed ids."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(base_path, f"batch_id={batch_id}")
        marker = os.path.join(out, "_SUCCESS")
        if os.path.exists(marker):  # replay after failure → no-op
            return
        batch_df.write.mode("overwrite").parquet(out)

    return sink


def start_foreach_batch(
    df: DataFrame,
    base_path: str,
    checkpoint_location: str,
    trigger_interval: str | None = None,
    available_now: bool = False,
):
    """Wire a streaming DataFrame to the idempotent parquet sink."""
    w = (
        df.writeStream.foreachBatch(idempotent_parquet_sink(base_path))
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_interval:
        w = w.trigger(processingTime=trigger_interval)
    return w.start()
