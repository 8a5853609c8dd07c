"""Storage-layout plan guards: bucketed co-located joins and
partition-pruned scans (operators/bucketing.py).

These assert the PLANNER exploits the layout — a bucketed table whose
join still shuffles, or a partitioned table whose scan reads every
directory, is paying the write cost for nothing.
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR

from kafkastreams_example_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
    write_partitioned,
)
from kafkastreams_example_spark.plans.explain import count_shuffles, plan_string
from kafkastreams_example_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-join planning: with broadcast on, any small table
    joins shuffle-free trivially and the bucketing assertion would be
    vacuous."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    """Both sides bucketed into the same count on the join key ⇒ the
    sort-merge join consumes the storage partitioning directly: zero
    Exchange in the plan. The unbucketed control join of the SAME data
    must shuffle both sides — proving the assertion isn't vacuous."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    try:
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
        write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4)

        joined = colocated_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert count_shuffles(joined) == 0, plan_string(joined, "simple")
        assert "SortMergeJoin" in plan_string(joined, "simple")

        control = orders.join(lineitem, "o_orderkey")
        assert count_shuffles(control) >= 2  # both sides re-shuffle per query

        # and the co-located layout serves aggregation on the bucket
        # key shuffle-free too (partial→final with no exchange between)
        agg = spark.table("b_lineitem").groupBy("o_orderkey").count()
        assert count_shuffles(agg) == 0
        assert joined.count() == control.count()  # layout changes nothing semantically
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_scan_prunes_directories(spark):
    """An equality predicate on the partition column must become a
    PartitionFilter (directory pruning), never a post-scan filter over
    all files; the scan's data filters stay empty for it."""
    events = load_table(spark, SF_DIR, "events")
    try:
        write_partitioned(events, "p_events", "event_type")
        df = spark.table("p_events").where("event_type = 'view'")
        plan = plan_string(df)
        assert "PartitionFilters" in plan
        # the predicate must appear inside the PartitionFilters entry
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert any("event_type" in ln for ln in pf), plan
        n_pruned = df.count()
        assert (
            n_pruned == events.where("event_type = 'view'").count() and n_pruned > 0
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS p_events")


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    """Compaction must collapse a fragmented dataset to ~target-size
    files, preserve the exact row multiset, and leave no temp dirs.
    With sort_col, each output file covers a contiguous key range."""
    from kafkastreams_example_spark.operators.bucketing import compact_parquet

    src = str(tmp_path / "frag")
    events = load_table(spark, SF_DIR, "events")
    events.repartition(64).write.parquet(src)  # the small-files mess
    n_before = len(list((tmp_path / "frag").rglob("*.parquet")))
    assert n_before >= 32
    before = events.count()

    n_after = compact_parquet(spark, src, target_file_bytes=1 << 30, sort_col="event_id")
    assert n_after < n_before and n_after >= 1
    got = spark.read.parquet(src)
    assert got.count() == before
    assert not list(tmp_path.glob("*._compact_*"))
    # clustered layout: per-file event_id ranges must not overlap
    import pyarrow.parquet as pq

    ranges = []
    for f in (tmp_path / "frag").rglob("*.parquet"):
        md = pq.read_metadata(str(f))
        idx = md.schema.names.index("event_id")
        mins = [md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)]
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping key ranges
