#!/usr/bin/env python
"""Quantify the two streaming MinHash dedup tiers against the batch
LSH candidate generator on real documents: of the documents the BATCH
pipeline (minhash_lsh_pairs — pair on ANY shared band) would mark as
duplicates, what fraction would each STREAMING tier suppress at ingest?

The streaming tiers are simulated in batch with the same arrival order
(doc_id ascending — the deterministic stand-in for event order):

* all-band tier  — a doc is suppressed iff its FULL band-key tuple was
  seen on an earlier doc (dropDuplicatesWithinWatermark on all bands);
* any-band tier  — a doc is suppressed iff ANY of its band keys was
  seen on an earlier doc (the chained-stateful pipeline's semantics);
* batch baseline — a doc is a duplicate iff it pairs with a LOWER-id
  doc in minhash_lsh_pairs (any shared band, bucket-capped).

any-band ≽ batch-on-uncapped-buckets by construction (same condition,
no bucket cap); the printed table shows the measured containment so
BASELINE.md can cite it. Run: python tools/stream_dedup_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F  # noqa: E402

from kafkastreams_example_spark.functions.dedup_approx import (  # noqa: E402
    minhash_lsh_pairs,
)
from kafkastreams_example_spark.session import get_spark  # noqa: E402
from kafkastreams_example_spark.sources.tables import load_table  # noqa: E402
from kafkastreams_example_spark.streaming.pipelines import (  # noqa: E402
    _minhash_band_cols,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="stream_dedup_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    keyed = docs.select("doc_id", *_minhash_band_cols("text", 8, 4)).persist()
    band_cols = [f"__band{b}" for b in range(4)]

    # all-band: first doc per full signature tuple survives
    w_all = Window.partitionBy(*band_cols).orderBy("doc_id")
    all_band_dup = keyed.withColumn("rn", F.row_number().over(w_all)).filter(
        F.col("rn") > 1
    )
    sup_all = {r["doc_id"] for r in all_band_dup.select("doc_id").collect()}

    # any-band: a doc loses if ANY band key has an earlier claimant
    exploded = keyed.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "bh")
    )
    w_band = Window.partitionBy("band", "bh").orderBy("doc_id")
    lost = exploded.withColumn("rn", F.row_number().over(w_band)).filter(
        F.col("rn") > 1
    )
    sup_any = {r["doc_id"] for r in lost.select("doc_id").distinct().collect()}

    # any-band + hot-band cap: hot rows can't cause a loss (the
    # pipeline rewrites them to per-doc solo keys)
    from kafkastreams_example_spark.streaming.pipelines import hot_band_frame

    hot = hot_band_frame(docs, 8, 4, max_bucket=64)
    lost_capped = (
        exploded.join(hot, ["band", "bh"], "left_anti")
        .withColumn("rn", F.row_number().over(w_band))
        .filter(F.col("rn") > 1)
    )
    sup_capped = {r["doc_id"] for r in lost_capped.select("doc_id").distinct().collect()}

    # batch baseline: duplicate = pairs with a lower-id doc
    batch_dup = {
        r["id_b"]
        for r in minhash_lsh_pairs(docs).select("id_b").distinct().collect()
    }
    keyed.unpersist()

    caught_all = len(batch_dup & sup_all)
    caught_any = len(batch_dup & sup_any)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "batch_duplicate_docs": len(batch_dup),
                "all_band": {
                    "suppressed": len(sup_all),
                    "batch_dups_caught": caught_all,
                    "recall_vs_batch": round(caught_all / len(batch_dup), 3)
                    if batch_dup
                    else None,
                },
                "any_band": {
                    "suppressed": len(sup_any),
                    "batch_dups_caught": caught_any,
                    "recall_vs_batch": round(caught_any / len(batch_dup), 3)
                    if batch_dup
                    else None,
                },
                "any_band_hot_capped": {
                    "suppressed": len(sup_capped),
                    "batch_dups_caught": len(batch_dup & sup_capped),
                    "recall_vs_batch": round(len(batch_dup & sup_capped) / len(batch_dup), 3)
                    if batch_dup
                    else None,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
