#!/usr/bin/env python
"""Quantify the two streaming MinHash dedup tiers against the batch
LSH candidate generator on real documents: of the documents the BATCH
pipeline (minhash_lsh_pairs — pair on ANY shared band) would mark as
duplicates, what fraction would each STREAMING tier suppress at ingest?

Thin CLI over streaming.pipelines.stream_dedup_recall_metrics (the
shared computation is also CI-pinned by
tests/test_streaming.py::test_stream_dedup_recall_gate); prints the
metrics dict for BASELINE.md. Run:
python tools/stream_dedup_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.sources.tables import load_table  # noqa: E402
from kafkastreams_example_spark.streaming.pipelines import (  # noqa: E402
    stream_dedup_recall_metrics,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="stream_dedup_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    print(json.dumps({"sf_dir": sf_dir, **stream_dedup_recall_metrics(docs)}))
    spark.stop()


if __name__ == "__main__":
    main()
