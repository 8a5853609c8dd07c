"""Sink-layout tests: partition pruning and shuffle-free bucketed joins
— asserted on physical plans, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreams_example_spark.plans.explain import plan_string
from kafkastreams_example_spark.sources.sinks import (
    read_partition_pruned,
    write_bucketed,
    write_partitioned,
)
from kafkastreams_example_spark.sources.tables import load_table

from conftest import SF_DIR


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    back = read_partition_pruned(spark, path).filter(F.col("event_type") == "error")
    plan = plan_string(back)
    assert "PartitionFilters" in plan and "event_type" in plan
    # pruned read returns exactly the error slice
    expected = ev.filter(F.col("event_type") == "error").count()
    assert back.count() == expected


def test_compaction_reduces_file_count(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)  # 64 tiny files
    from kafkastreams_example_spark.sources.sinks import compact

    n = compact(spark, frag, target_file_bytes=8 * 1024 * 1024)
    assert n < 64
    back = spark.read.parquet(frag + "__compact")
    assert back.count() == ev.count()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey",
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        li, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey",
        path=str(tmp_path / "lineitem_b"),
    )
    try:
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        # disable broadcast so the join strategy decision is about
        # bucketing, not table size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the same thing as the unbucketed join
        assert joined.count() == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_orc_roundtrip_prunes_and_pushes(spark, tmp_path):
    """ORC sink tier: partition pruning and predicate pushdown work
    through the same declarative layout as parquet (Spark bundles the
    ORC datasource natively — no extra artifact), and the roundtrip is
    value-exact. Pins fmt='orc' as a supported estate choice."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    path = str(tmp_path / "events_orc")
    write_partitioned(ev, path, ["event_type"], fmt="orc")

    back = spark.read.orc(path).filter(
        (F.col("event_type") == "error") & (F.col("user_id") > 5)
    )
    plan = plan_string(back)
    assert "PartitionFilters" in plan and "event_type" in plan
    assert "PushedFilters" in plan and "user_id" in plan
    want = sorted(
        (r["event_id"], r["value"])
        for r in ev.filter(
            (F.col("event_type") == "error") & (F.col("user_id") > 5)
        ).collect()
    )
    got = sorted((r["event_id"], r["value"]) for r in back.collect())
    assert got == want and len(got) > 0
    # the read_partition_pruned front door reads ORC too
    via_helper = read_partition_pruned(spark, path, fmt="orc").filter(
        F.col("event_type") == "error"
    )
    assert "PartitionFilters" in plan_string(via_helper)


def test_bucketed_orc_join_skips_shuffle(spark, tmp_path):
    """Round-12 parity item: the ORC tier must carry the same
    shuffle-free bucketed-join property as parquet — bucketing metadata
    lives in the catalog, not the file format, so a same-key/same-count
    ORC⋈ORC join compiles to SortMergeJoin with NO Exchange."""
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        orders, "orders_ob", "o_orderkey", 8, sort_col="o_orderkey",
        path=str(tmp_path / "orders_ob"), fmt="orc",
    )
    write_bucketed(
        li, "lineitem_ob", "l_orderkey", 8, sort_col="l_orderkey",
        path=str(tmp_path / "lineitem_ob"), fmt="orc",
    )
    try:
        ob = spark.table("orders_ob")
        lb = spark.table("lineitem_ob")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed ORC join shuffles:\n{plan}"
        assert (
            joined.count()
            == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_ob")
        spark.sql("DROP TABLE IF EXISTS lineitem_ob")
