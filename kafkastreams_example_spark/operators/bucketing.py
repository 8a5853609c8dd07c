"""Physical-layout operators: bucketed tables (co-located joins) and
partitioned writes (partition-pruned scans).

These are the two storage-side levers the 100 TB design notes lean on:

* **Bucketing** pre-shuffles a table ONCE at write time
  (`bucketBy(n, key)` + `sortBy(key)`): every bucket holds one
  deterministic hash-slice of the key space, so a join or aggregation
  on the bucket key needs NO exchange at read time — Spark proves both
  sides share the partitioning and plans a zero-shuffle sort-merge
  join. At 100 TB, re-shuffling a fact table per query is the dominant
  cost; a bucketed layout amortizes that single shuffle across every
  downstream join on the same key (the classic warehouse fact/fact
  co-location strategy). The bucket count is a layout-time decision:
  size it so one bucket ≈ one task's worth of data at target scale.

* **Partition-by-column writes** (`partitionBy(col)`) turn equality /
  IN predicates on the partition column into DIRECTORY pruning: the
  scan never opens non-matching files. The partition column should be
  low-cardinality and almost-always-filtered (ingest date, source,
  language) — high-cardinality partitioning creates the small-files
  problem instead.

Both are exercised end-to-end by tests/test_bucketing.py, which
asserts the plan shapes (no Exchange between bucketed scans and the
join; PartitionFilters reaching the partitioned scan) rather than just
row counts — the layout is only worth anything if the planner actually
exploits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Materialize df as a bucketed, bucket-sorted parquet table.

    The write shuffles by hash(key) into n_buckets files per partition
    — the one-time cost that every later equi-join/agg on `key` skips.
    sortBy keeps rows key-ordered inside each bucket so the co-located
    join needs no per-task sort either.
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def write_partitioned(df: DataFrame, table: str, partition_col: str) -> None:
    """Materialize df partitioned by a low-cardinality column: one
    directory per value, giving equality predicates file-level pruning."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .partitionBy(partition_col)
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Compact a parquet dataset in place to ~target-size files — the
    maintenance counterpart of write_partitioned: streaming sinks and
    fine-grained partitioned writes accumulate small files, and at
    100 TB an over-fragmented table turns every scan into a
    metadata/open-cost storm (one task per tiny file). Sizing comes
    from the dataset's actual on-disk bytes, not a row-count guess;
    with sort_col the rewrite range-partitions so each output file
    covers a contiguous key range (clustered layout ⇒ min/max row-group
    pruning works for range predicates). Returns the output file count.

    Writes to a sibling temp dir, then swaps via two renames. The swap
    window (source briefly renamed away) is the unavoidable POSIX
    limitation of directory swaps; what IS guaranteed is that no crash
    point loses data, and that a rerun after any crash self-recovers:
    a stale tmp dir is discarded (incomplete write), and a stale old
    dir with the source missing is renamed back (crash mid-swap)
    before compacting again.
    """
    import math
    import shutil
    from pathlib import Path

    src = Path(path)
    tmp = src.with_name(src.name + "._compact_tmp")
    old = src.with_name(src.name + "._compact_old")
    # crash recovery from a previous attempt, before touching anything:
    if old.exists() and not src.exists():
        old.rename(src)  # died between the two swap renames
    elif old.exists():
        shutil.rmtree(old)  # died before cleanup; src is the new data
    if tmp.exists():
        shutil.rmtree(tmp)  # incomplete prior write
    on_disk = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, math.ceil(on_disk / target_file_bytes))
    df = spark.read.parquet(str(src))
    out = df.repartitionByRange(n_files, sort_col) if sort_col else df.coalesce(n_files)
    out.write.mode("overwrite").parquet(str(tmp))
    src.rename(old)
    tmp.rename(src)
    shutil.rmtree(old)
    return len(list(src.rglob("*.parquet")))


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key.

    With both sides bucketed into the same bucket count on `key`, the
    planner reuses the storage partitioning: the physical plan contains
    NO Exchange on either join input (asserted in
    tests/test_bucketing.py). This is the read-side payoff of
    write_bucketed; the same layout also serves groupBy(key) with a
    shuffle-free partial→final aggregation.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
