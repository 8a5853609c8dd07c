"""Batch sinks: partitioned and bucketed parquet — the layout half of
the 100 TB story.

- Hive-style partitioning (partitionBy) turns equality/range predicates
  on the partition column into directory pruning: a scan of 1/N of the
  data reads 1/N of the files, before any row is touched.
- Bucketing (bucketBy on the join/agg key) pre-shuffles data at write
  time: two tables bucketed on the same key by the same count join with
  NO Exchange at read time — at scale this converts every recurring
  fact⋈fact join from a multi-TB shuffle into a local zip of buckets.

Both are declarative table layouts: downstream queries stay unchanged
and Catalyst exploits the layout automatically (verified in
tests/test_sinks.py via plan assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a Hive-partitioned columnar dataset. Choose partition
    columns with bounded cardinality (date, category) — 10⁴⁺ tiny
    partitions hurt more than they help; high-cardinality keys belong
    in bucketing. ``fmt`` is any columnar format Spark bundles —
    'parquet' (default) or 'orc' (same pruning/pushdown machinery;
    pick it when the downstream estate is Hive/ORC-native). Avro needs
    the external spark-avro artifact and is intentionally not listed."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Write a bucketed (and optionally sorted) table. Joins and
    aggregations on bucket_col between tables bucketed the same way
    skip the shuffle entirely; sorting within buckets additionally
    enables merge-join without a sort step. Pass `path` for an external
    table (warehouse.dir is a static config and can't move per-job).
    ``fmt``: 'parquet' (default) or 'orc' — bucketing metadata lives in
    the catalog, so the shuffle-free join property is format-agnostic
    (plan-asserted for both in tests/test_sinks.py)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format(fmt).saveAsTable(table)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    size-targeted files. Streaming sinks and fine partitioning produce
    file counts that degrade scan planning (one task per tiny file);
    periodic compaction is standard warehouse hygiene. Returns the
    output file count."""
    import glob
    import os

    df = spark.read.parquet(path)
    total = _dataset_bytes(path)
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    dest = out_path or f"{path}__compact"
    df.repartition(int(n_files)).write.mode("overwrite").parquet(dest)
    return len(glob.glob(os.path.join(dest, "*.parquet")))


def _dataset_bytes(path: str) -> int:
    import glob
    import os

    return sum(os.path.getsize(p) for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def read_partition_pruned(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a partitioned dataset; prune via ordinary filters on the
    partition column (Catalyst emits PartitionFilters). Same machinery
    for 'parquet' and 'orc'."""
    return spark.read.format(fmt).load(path)
