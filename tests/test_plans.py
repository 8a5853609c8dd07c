"""Plan-shape tests: scale-readiness as assertions.

Correctness at sf0.01 says nothing about 100 TB; these tests pin the
physical properties that matter there — predicate pushdown into the
parquet scan, column pruning, broadcast joins for dims, narrow
(shuffle-free) per-row operators, and whole-stage codegen in the hot
paths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreams_example_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_shuffle,
    assert_pushed_filters,
    plan_string,
)
from kafkastreams_example_spark.queries import (
    q_filter_level,
    q_join_customer_orders,
    q_join_multiway_region,
    q_text_stats,
    q_agg_pricing_summary,
)
from kafkastreams_example_spark.sources.tables import load_table

from conftest import SF_DIR


def test_filter_pushes_to_scan(spark):
    df = q_filter_level(spark, SF_DIR)
    assert_pushed_filters(df, "IsNotNull(event_type)", "EqualTo(event_type,error)")


def test_projection_prunes_columns(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_string(li)
    # ReadSchema must contain only the two referenced columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_extendedprice" not in read[0] and "l_orderkey" in read[0]


def test_dim_joins_broadcast(spark):
    assert_broadcast_join(q_join_customer_orders(spark, SF_DIR), 1)
    assert_broadcast_join(q_join_multiway_region(spark, SF_DIR), 2)


def test_narrow_ops_do_not_shuffle(spark):
    # per-document text stats are a pure projection: no Exchange at all
    assert_no_shuffle(q_text_stats(spark, SF_DIR))


def test_agg_uses_partial_aggregation(spark):
    # map-side partial agg: two HashAggregate levels around one Exchange
    plan = plan_string(q_agg_pricing_summary(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_hot_path_stays_in_codegen(spark):
    # the filter pipeline's scan→filter→project chain is fused into
    # whole-stage codegen (no interpreted row processing)
    # formatted mode marks codegen'd operators with a leading '*'
    plan = plan_string(q_filter_level(spark, SF_DIR))
    assert "* Filter" in plan and "* Project" in plan


def test_asof_join_is_single_shuffle_no_join(spark):
    """The as-of join compiles to union + one window shuffle — no Join
    operator, no row multiplication."""
    from kafkastreams_example_spark.queries import q_asof_join
    from kafkastreams_example_spark.plans.explain import count_shuffles

    df = q_asof_join(spark, SF_DIR)
    plan = plan_string(df)
    assert "Join" not in plan.replace("join", "Join") or "SortMergeJoin" not in plan
    assert count_shuffles(df) <= 1


def test_cosine_pairs_registry_is_bucketed(spark, monkeypatch):
    """The registry entry runs the SemDeDup-style bucketed form (round
    6 demoted the exact all-pairs kernel to an internal function):
    pairs are born inside the per-bucket grouped-Pandas kernel, never a
    nested-loop/cartesian pair join, and building the plan must not
    collect rows to the driver (the adaptive-C count() is a scalar
    aggregate, not a row materialization)."""
    from pyspark.sql import DataFrame

    from kafkastreams_example_spark.queries import q_cosine_pairs

    def _boom(self, *a, **k):  # any driver row materialization is a bug
        raise AssertionError("cosine_pairs collected rows to the driver")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom, raising=False)
    df = q_cosine_pairs(spark, SF_DIR)
    monkeypatch.undo()
    plan = plan_string(df, "simple")
    assert "FlatMapGroupsInPandas" in plan  # per-bucket matmul kernel
    assert "CartesianProduct" not in plan
    # the only nested-loop joins are the two O(sqrt C)-row codebook
    # crosses of the product-quantizer assignment (broadcast side is a
    # codebook, never the corpus)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_exact_cosine_kernel_is_cogrouped_tiles(spark, monkeypatch):
    """The internal exact all-pairs kernel keeps its distributed shape:
    block-tiled cogrouped-Pandas matmuls, nothing collected to the
    driver, no cartesian pair join."""
    from pyspark.sql import DataFrame

    from kafkastreams_example_spark.functions.similarity import cosine_pairs

    def _boom(self, *a, **k):
        raise AssertionError("exact kernel collected rows to the driver")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom, raising=False)
    df = cosine_pairs(load_table(spark, SF_DIR, "embeddings"), threshold=0.35)
    monkeypatch.undo()
    plan = plan_string(df)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_embeddings_has_no_full_pair_join(spark):
    """SemDeDup-style embedding dedup must never materialize the n²
    pair join: candidates exist only inside the per-bucket cogrouped
    kernel. The only BroadcastNestedLoopJoins allowed are the two
    O(sqrt C)-row codebook-assignment crosses (broadcast side is a
    codebook frame, not the corpus); pair scoring itself must be the
    grouped-Pandas kernel with no cartesian anywhere."""
    from kafkastreams_example_spark.queries import q_dedup_embeddings

    # simple mode: one line per physical node (formatted prints each
    # node twice — tree + detail section — breaking occurrence counts)
    plan = plan_string(q_dedup_embeddings(spark, SF_DIR), "simple")
    assert "FlatMapGroupsInPandas" in plan  # per-bucket matmul kernel
    assert "CartesianProduct" not in plan
    # two codebook crosses (product-quantizer assignment), corpus never
    # the broadcast side
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_bucketed_pairs_candidate_set_is_subquadratic(spark):
    """The bucketed generator's runtime contract: candidate volume is
    Σ_b C(n_b,2) summed over probed buckets — strictly under the n²
    all-pairs count whenever buckets split the corpus. Verified by
    emitting threshold=-1 (every within-bucket pair survives) and
    comparing against C(n,2)."""
    from kafkastreams_example_spark.functions.similarity import bucketed_cosine_pairs

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    cand = bucketed_cosine_pairs(emb, threshold=-1.0, n_centroids=16, n_probe=2).count()
    assert 0 < cand < n * (n - 1) / 2


def test_simhash_pairs_is_banded_equi_join(spark):
    """Hamming-≤3 pairing must come from the byte-band LSH equi-join
    (hash-joinable, scales with candidate count), never the O(n²)
    BroadcastNestedLoopJoin the bare id_a < id_b predicate produces."""
    from kafkastreams_example_spark.queries import q_simhash_pairs

    plan = plan_string(q_simhash_pairs(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # the banded equi-join is a real hash join


def test_doc_chunking_is_narrow(spark):
    """Chunking is tokenize → explode → slice: a pure per-row fan-out
    with no Exchange — at 100 TB it pipelines straight off the scan."""
    from kafkastreams_example_spark.plans.explain import assert_no_shuffle
    from kafkastreams_example_spark.queries import q_doc_chunking

    assert_no_shuffle(q_doc_chunking(spark, SF_DIR))


def test_token_histogram_partial_aggregates(spark):
    # map-side partial agg around one exchange — the histogram never
    # moves per-doc rows, only per-bucket partials
    from kafkastreams_example_spark.queries import q_token_histogram

    from kafkastreams_example_spark.plans.explain import count_shuffles
    from kafkastreams_example_spark.queries import q_token_histogram as q

    plan = plan_string(q(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert count_shuffles(q(spark, SF_DIR)) == 1


def test_window_range_frame_single_shuffle(spark):
    from kafkastreams_example_spark.plans.explain import count_shuffles
    from kafkastreams_example_spark.queries import q_window_range_frame

    assert count_shuffles(q_window_range_frame(spark, SF_DIR)) <= 1


def test_subquery_exists_becomes_semi_join(spark):
    # Catalyst must rewrite the correlated EXISTS to a semi join, never
    # a per-row subquery execution
    from kafkastreams_example_spark.queries import q_subquery_exists

    plan = plan_string(q_subquery_exists(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_sort_limit_is_topk_not_global_sort(spark):
    # orderBy().limit() must compile to TakeOrderedAndProject
    # (per-partition heaps), not a full Exchange rangepartitioning sort
    orders = load_table(spark, SF_DIR, "orders")
    df = orders.orderBy(F.col("o_totalprice").desc()).limit(10)
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_bucketed_pairs_adaptive_grid_derivation(spark):
    """n_centroids=None must scale the bucket count with the corpus
    (fixed target bucket size -> linear total matmul work) AND factor
    it into the two-level product grid (sublinear assignment): with n
    rows and target_bucket_rows=t the adaptive path must derive
    C = ceil(n/t), c1 = ceil(sqrt(C)), c2 = ceil(C/c1) exactly —
    asserted by output identity with the explicit-grid call."""
    import math

    from kafkastreams_example_spark.functions.similarity import (
        bucketed_cosine_pairs,
        product_grid,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    target = 10
    expected_c = max(2, -(-n // target))
    c1 = math.ceil(math.sqrt(expected_c))
    expected_grid = (c1, math.ceil(expected_c / c1))
    assert product_grid(n, target, 2) == expected_grid
    adaptive = bucketed_cosine_pairs(
        emb, threshold=-1.0, n_centroids=None, target_bucket_rows=target, min_centroids=2
    )
    explicit = bucketed_cosine_pairs(emb, threshold=-1.0, grid=expected_grid)
    a = {tuple(r) for r in adaptive.collect()}
    e = {tuple(r) for r in explicit.collect()}
    assert a == e and len(a) > 0


def test_bucketed_pairs_assignment_broadcasts_stay_sublinear(spark):
    """The product-quantizer assignment must broadcast only the two
    O(sqrt C) codebooks, never a flat O(C) centroid table: with a grid
    forcing c1=c2=4 the plan's broadcast sides must be codebook filters
    (id-range scans), and no single broadcast may carry the full bucket
    count's worth of centroid rows."""
    from kafkastreams_example_spark.functions.similarity import bucketed_assign

    emb = load_table(spark, SF_DIR, "embeddings")
    members = bucketed_assign(emb, grid=(4, 4), n_probe=2)
    plan = plan_string(members, "simple")
    # both codebook crosses broadcast; the corpus side is never inside
    # a BroadcastExchange (its scan would carry no id upper-bound filter)
    assert plan.count("BroadcastNestedLoopJoin") == 2
    # every vector lands in exactly n_probe buckets (one per probed A
    # cell x its single nearest B cell)
    n = emb.count()
    assert members.count() == 2 * n
    n_buckets = members.select("bucket").distinct().count()
    assert n_buckets <= 16


def test_sql_q18_partial_agg_and_topk(spark):
    """The agg-dominated SQL entry must partial-aggregate the lineitem
    scan map-side (HashAggregate pair around one exchange — at 100 TB
    the shuffle carries per-order partials, never raw lines) and
    compile its top-100 to TakeOrderedAndProject, not a global sort."""
    from kafkastreams_example_spark.queries import q_sql_q18_large_orders

    plan = plan_string(q_sql_q18_large_orders(spark, SF_DIR), "simple")
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_sql_q21_semi_and_anti_join(spark):
    """The correlated multi-subquery SQL entry (r8 verdict item 4):
    Catalyst must decorrelate BOTH subqueries — the EXISTS into a left
    semi join and the NOT EXISTS into a left anti join on l_orderkey —
    and never fall back to a per-row subplan re-executing the lineitem
    scan per outer tuple. The top-25 must compile to
    TakeOrderedAndProject, not a global sort."""
    from kafkastreams_example_spark.queries import q_sql_q21_blame_supplier

    plan = plan_string(q_sql_q21_blame_supplier(spark, SF_DIR), "simple")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    # a surviving correlated subplan would show as an in-plan Subquery
    # node re-evaluated per row
    assert "Subquery subquery" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_scd2_merge_is_single_full_outer_join(spark):
    """The SCD2 merge must classify through ONE full-outer equi-join of
    dimension and change batch — a second dimension pass (separate
    joins per output branch, the naive UNION formulation) would double
    the dominant scan at 100 TB. The change batch derives from the
    dimension, so the plan carries exactly two dimension scans total
    (dim side + batch side), one join, and the explode fan-out."""
    from kafkastreams_example_spark.queries import q_scd2_merge

    plan = plan_string(q_scd2_merge(spark, SF_DIR), "simple")
    assert "FullOuter" in plan
    joins = sum(plan.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert joins == 1, plan
    assert plan.count("FileScan") <= 2


def test_cohort_retention_partial_aggregates(spark):
    """The cohort matrix must partial-aggregate every stage (the
    distinct activity pass, the per-user min-week, the per-cell
    countDistinct) — shuffles carry per-key partials, never raw events
    — and read the events scan at most twice (activity + cohort both
    derive from the same distinct frame)."""
    from kafkastreams_example_spark.queries import q_cohort_retention

    plan = plan_string(q_cohort_retention(spark, SF_DIR), "simple")
    assert "partial_min" in plan and "partial_count" in plan
    assert plan.count("FileScan") <= 2


def test_sql_q16_null_aware_anti_join(spark):
    """NOT IN under SQL's three-valued logic is not a plain anti join
    (one NULL in the subquery result must empty the output): Catalyst
    must compile the null-aware anti-join variant, and the distinct
    count must partial-aggregate."""
    from kafkastreams_example_spark.queries import q_sql_q16_supplier_cnt

    import re

    plan = plan_string(q_sql_q16_supplier_cnt(spark, SF_DIR), "simple")
    # BroadcastHashJoin renders the isNullAwareAntiJoin flag as the
    # trailing positional boolean: "... LeftAnti, BuildRight, true"
    assert re.search(r"LeftAnti, Build\w+, true", plan), plan
    assert "partial_count" in plan


def test_sql_q4_semi_join_with_residual(spark):
    """Q4's EXISTS correlates on an expression of the outer row
    (shipdate > orderdate + 60 days): Catalyst must still decorrelate
    to ONE left semi join on orderkey carrying the date comparison as
    a non-equi residual — never a per-outer-row lineitem subplan — and
    the quarter predicate must push to the orders scan."""
    from kafkastreams_example_spark.queries import q_sql_q4_priority_count

    df = q_sql_q4_priority_count(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "LeftSemi" in plan
    assert "Subquery subquery" not in plan
    assert "rangepartitioning" not in plan
    assert_pushed_filters(df, "GreaterThanOrEqual(o_orderdate")


def test_sql_q6_full_pushdown_no_join(spark):
    """Q6 is the pure scan showcase: zero joins, all three predicate
    families pushed to the parquet reader, a pruned 4-column
    ReadSchema, and a two-phase agg whose shuffle carries one partial
    row per task."""
    from kafkastreams_example_spark.queries import q_sql_q6_forecast_revenue

    df = q_sql_q6_forecast_revenue(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert not any(
        j in plan for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )
    assert plan.count("HashAggregate") == 2
    assert_pushed_filters(
        df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"
    )
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_returnflag" not in read[0] and "l_partkey" not in read[0]


def test_sql_q8_broadcast_star(spark):
    """Q8's eight-relation star must broadcast every dimension arm
    (region, the two nation roles, part, supplier, customer, orders
    after its date filter) — seven broadcast joins, no sort-merge
    join, no global sort; the one remaining exchange is the 2-row
    year rollup."""
    from kafkastreams_example_spark.queries import q_sql_q8_market_share

    plan = plan_string(q_sql_q8_market_share(spark, SF_DIR), "simple")
    assert plan.count("BroadcastHashJoin") == 7
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan


def test_sql_q11_scalar_subquery_once(spark):
    """Q11's two uncorrelated scalar subqueries aggregate the SAME
    derived relation the outer query groups over. The executed plan
    must (a) merge the two scalars into one subplan with the second
    reference a ReusedSubquery (MergeScalarSubqueries) and (b) reuse
    the per-part aggregation exchange between the main branch and the
    scalar subplan (ReusedExchange) — i.e., the fact side is
    aggregated ONCE at runtime, not once per consumer. AQE finalizes
    reuse at execution, so the guard reads the post-collect plan."""
    from kafkastreams_example_spark.queries import q_sql_q11_important_parts

    df = q_sql_q11_important_parts(spark, SF_DIR)
    df.collect()
    plan = plan_string(df, "simple")
    assert "isFinalPlan=true" in plan
    assert "ReusedSubquery" in plan
    assert "ReusedExchange" in plan
    assert "rangepartitioning" not in plan


def test_mad_outliers_no_global_sort(spark):
    """The exact medians must go through the bounded-histogram kernel:
    NO ObjectHashAggregate (the built-in percentile's per-group value
    buffer — per-group O(rows) memory, the 100 TB OOM), no global range
    sort (the histogram windows sort within hash partitions), and the
    O(#types) stat frames broadcast back over the scan."""
    from kafkastreams_example_spark.queries import q_mad_outliers

    df = q_mad_outliers(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "rangepartitioning" not in plan
    assert "ObjectHashAggregate" not in plan
    assert "BroadcastHashJoin" in plan


def test_knn_screened_is_bucketed_kernel(spark):
    """The screened kNN eval must score through the per-bucket BLAS
    kernel (one FlatMapGroupsInPandas over the probed assignment,
    emitting per-query top-k), never a candidate-pair join that
    re-shuffles vector-fat rows — the join formulation measured 47 s at
    30× vs 7.6 s for the kernel. Scan budget: the assignment subtree's
    narrow column-pruned passes plus the two label joins — 12-scan
    double-assignment shapes must not come back."""
    from kafkastreams_example_spark.queries import REGISTRY

    df = REGISTRY["knn_label_accuracy"].fn(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("FileScan") <= 8, plan.count("FileScan")


def test_sql_q2_decorrelated_min_join(spark):
    """Q2's correlated scalar MIN contains its own 4-way join; Catalyst
    must decorrelate the whole subtree into a per-partkey min aggregate
    joined back on (partkey, price) — no per-row Subquery subplan — and
    the top-100 must compile to TakeOrderedAndProject."""
    from kafkastreams_example_spark.queries import q_sql_q2_min_cost_supplier

    plan = plan_string(q_sql_q2_min_cost_supplier(spark, SF_DIR), "simple")
    assert "min(l_extendedprice" in plan  # the decorrelated aggregate
    assert "Subquery subquery" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_sql_q20_semi_chain(spark):
    """Q20's nested IN chain must compile to stacked LEFT SEMI hash
    joins (supplier ⋉ grouped lineitem, lineitem ⋉ part prefix scan)
    with the HAVING's correlated per-part sum decorrelated into an
    aggregate joined back under the share inequality — never a per-row
    subplan."""
    from kafkastreams_example_spark.queries import (
        q_sql_q20_excess_share_supplier,
    )

    plan = plan_string(q_sql_q20_excess_share_supplier(spark, SF_DIR), "simple")
    assert plan.count("LeftSemi") >= 2
    assert "Subquery subquery" not in plan
    assert "CartesianProduct" not in plan
    # r10 plan-audit catch: the original body carried an unlimited
    # ORDER BY s_name — a global range sort of the result. Output is a
    # set; no range partitioning may appear.
    assert "rangepartitioning" not in plan


def test_sql_q22_anti_join_scalar_cohort(spark):
    """Q22's NOT EXISTS must be a LEFT ANTI join on custkey with the
    date predicate pushed into the orders scan; the two cohort
    aggregates are UNCORRELATED scalar subqueries — executed once as
    their own Subquery stages, which is the one legitimate Subquery
    appearance in the tier (unlike the correlated shapes, where a
    surviving Subquery node means per-row re-execution)."""
    from kafkastreams_example_spark.plans.explain import assert_pushed_filters
    from kafkastreams_example_spark.queries import q_sql_q22_dormant_customers

    df = q_sql_q22_dormant_customers(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "LeftAnti" in plan
    assert "Subquery subquery" in plan  # the one-shot cohort aggregates
    assert "CartesianProduct" not in plan
    assert_pushed_filters(df, "o_orderdate")


def test_sql_q17_scalar_subquery_decorrelates(spark):
    """Both correlated scalar-aggregate subqueries (per-part count and
    sum) must decorrelate into per-part HashAggregate pairs joined back
    on partkey — no per-row subplan re-scanning lineitem per outer
    tuple. Partial aggregation must survive (map-side partials around
    the exchanges)."""
    from kafkastreams_example_spark.queries import q_sql_q17_small_qty_revenue

    plan = plan_string(q_sql_q17_small_qty_revenue(spark, SF_DIR), "simple")
    assert "Subquery subquery" not in plan
    assert plan.count("HashAggregate") >= 4  # count agg pair + sum agg pair
    assert "partial_count" in plan and "partial_sum" in plan


def test_bucketed_assign_exchanges_are_narrow(spark):
    """r7 verdict finding, tightened in round 20: the PQ assignment
    must never exchange vector-fat rows. Since the per-row rewrite
    (cell selection computed inline over the collected codebook array)
    the only exchanges left are the two O(√C)-row codebook collects —
    the corpus rows, WITH their embedding column, never shuffle at all
    (the old shape exchanged one best-so-far row per vector per
    selection agg plus an n-row uv re-join)."""
    from kafkastreams_example_spark.functions.similarity import bucketed_assign
    from kafkastreams_example_spark.plans.explain import exchange_inputs

    emb = load_table(spark, SF_DIR, "embeddings")
    members = bucketed_assign(emb, grid=(4, 4), n_probe=2)
    inputs = exchange_inputs(members)
    fat = [ln for ln in inputs if "uv#" in ln]
    assert not fat, f"vector-fat exchanges: {fat}"
    # every surviving exchange is a single-partition codebook collect,
    # never a corpus-keyed hash repartition
    plan = plan_string(members, "formatted")
    assert "Exchange hashpartitioning" not in plan, plan


def test_ivf_assignment_pass_is_exchange_free(spark):
    """Round-20 per-row rewrite guard: frozen-codebook IVF assignment
    (the ingest half of the incremental inverted file) must compute
    each vector's bucket INSIDE the scan projection — array_max over
    the collected codebook array — with no corpus-keyed hash exchange
    anywhere in the plan. The former shape (broadcast cross join →
    groupBy(id) max_by) exchanged one best-so-far row per ingested
    vector per batch."""
    from kafkastreams_example_spark.functions.similarity import ivf_assign, kmeans_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=1)
    assigned = ivf_assign(emb, cents)
    plan = plan_string(assigned, "formatted")
    assert "array_max" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_assign_sparse_ids_bucket_like_dense(spark):
    """Codebooks anchor at min(id): a corpus whose ids start at 1000
    must produce exactly the dense-from-0 pair set shifted by 1000 —
    no silent corpus drop when no id < c1 exists (r7 ADVICE)."""
    from kafkastreams_example_spark.functions.similarity import bucketed_cosine_pairs

    base = [
        (i, [1.0 if j == i % 4 else 0.1 * ((i * 7 + j) % 5) for j in range(4)])
        for i in range(40)
    ]
    dense = spark.createDataFrame(base, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    shifted = spark.createDataFrame(
        [(i + 1000, v) for i, v in base], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    d = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in bucketed_cosine_pairs(dense, threshold=0.9, grid=(3, 3)).collect()
    }
    s = {
        (r["id_a"] - 1000, r["id_b"] - 1000, r["cosine"])
        for r in bucketed_cosine_pairs(shifted, threshold=0.9, grid=(3, 3)).collect()
    }
    assert len(d) > 0 and d == s


def test_ngram_span_dedup_semi_join_no_fanout(spark):
    """The dup-hash membership probe must be a LEFT SEMI join (each gram
    row emitted at most once even for corpus-hot n-grams), never an
    inner join that fans out on hot keys."""
    from kafkastreams_example_spark.queries import q_ngram_span_dedup

    plan = plan_string(q_ngram_span_dedup(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_gopher_rules_shuffle_free(spark):
    """The hard quality gate fronts every expensive stage at 100 TB —
    it must stay a single narrow projection over the scan: zero
    exchanges, zero joins."""
    from kafkastreams_example_spark.plans.explain import assert_no_shuffle
    from kafkastreams_example_spark.queries import q_gopher_rules

    assert_no_shuffle(q_gopher_rules(spark, SF_DIR))


def test_ngram_span_removal_no_allpairs(spark):
    """Span removal must keep the dedup-signal shape (LEFT SEMI dup
    probe), subtract coverage with a LEFT ANTI position join, and never
    introduce an all-pairs term: no cartesian product, and the only
    fan-outs are the linear gram/token explodes."""
    from kafkastreams_example_spark.queries import q_ngram_span_removal

    plan = plan_string(q_ngram_span_removal(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql_q7_dim_pushdown_no_fact_shuffle(spark):
    """Q7's 6-way join: each nation role's disjunct union must be
    pushed into its own scan, the shipdate range must reach lineitem,
    and the fact table must flow through broadcast joins — the only
    exchange is the final per-year rollup."""
    import re

    from kafkastreams_example_spark.plans.explain import assert_pushed_filters
    from kafkastreams_example_spark.queries import q_sql_q7_nation_volume

    df = q_sql_q7_nation_volume(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
    assert_pushed_filters(df, "n_name", "l_shipdate")


def test_sql_q9_profit_shape(spark):
    """Q9's 5-way profit join: all dims broadcast (no sort-merge), the
    nation×year rollup is the single exchange, no global sort."""
    import re

    from kafkastreams_example_spark.queries import q_sql_q9_product_profit

    plan = plan_string(q_sql_q9_product_profit(spark, SF_DIR), "simple")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
    assert "rangepartitioning" not in plan


def test_sql_q13_outer_join_histogram_no_sort(spark):
    """Q13's histogram must keep the LEFT OUTER join (the priority
    exclusion lives in the join condition — an inner join would drop
    zero-order customers) and contain no global range sort."""
    from kafkastreams_example_spark.queries import q_sql_q13_order_distribution

    plan = plan_string(q_sql_q13_order_distribution(spark, SF_DIR), "simple")
    assert "LeftOuter" in plan
    assert "rangepartitioning" not in plan
    assert plan.count("HashAggregate") >= 4  # two two-phase aggregations


def test_sql_q15_scalar_max_and_pushdown(spark):
    """Q15's MAX-equality must be a one-shot uncorrelated scalar
    Subquery (evaluated once, broadcast as a literal) and the quarter
    range must reach the lineitem scan."""
    from kafkastreams_example_spark.plans.explain import assert_pushed_filters
    from kafkastreams_example_spark.queries import q_sql_q15_top_supplier

    df = q_sql_q15_top_supplier(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "Subquery subquery" in plan
    assert_pushed_filters(df, "l_shipdate")


def test_sql_q19_disjunct_pushdown(spark):
    """Q19's OR-of-conjunctions spans both join sides; Catalyst must
    extract each side's single-table implication and push it into that
    side's scan, so neither table is scanned unfiltered."""
    from kafkastreams_example_spark.queries import q_sql_q19_disjunct_revenue

    plan = plan_string(q_sql_q19_disjunct_revenue(spark, SF_DIR), "simple")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    assert "p_brand" in joined, joined   # part-side OR implication pushed
    assert "l_quantity" in joined, joined  # lineitem-side OR implication pushed
    assert "CartesianProduct" not in plan


def test_scd2_merge_single_full_outer_no_global_sort(spark):
    """SCD2 merge must be exactly ONE full-outer change-detection join
    (a hash exchange per side, the declared cost) with no global range
    sort anywhere — the r9 probe's 4.4x-at-30x reading is join/output
    growth, and this pins that no second pass or sort ever creeps in."""
    import re

    from kafkastreams_example_spark.queries import q_scd2_merge

    plan = plan_string(q_scd2_merge(spark, SF_DIR), "simple")
    assert plan.count("FullOuter") == 1
    assert "rangepartitioning" not in plan
    # two hash exchanges feed the join (one per side); nothing else
    # about the shape may shuffle the dimension again
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_salted_join_spreads_hot_keys(spark):
    """The salted plan must (a) join on the composite (key, salt) pair
    and (b) replicate the dim side via explode — the two ingredients
    that spread a hot key across reducers."""
    from kafkastreams_example_spark.queries import q_join_salted

    plan = plan_string(q_join_salted(spark, SF_DIR))
    assert "__salt" in plan
    assert "Generate explode" in plan or "explode" in plan.lower()


def test_value_histogram_no_global_sort(spark):
    """The equi-width histogram must be two aggregate passes (scalar
    min/max broadcast back over the scan) — never a range-partitioned
    sort of the fact table."""
    from kafkastreams_example_spark.queries import q_value_histogram

    plan = plan_string(q_value_histogram(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_sql_q10_topk_and_pushdown(spark):
    """Q10's claims, verified: the return-flag predicate reaches the
    lineitem scan and top-20 compiles to per-partition heaps, not a
    global sort."""
    from kafkastreams_example_spark.plans.explain import assert_pushed_filters
    from kafkastreams_example_spark.queries import q_sql_q10_returns

    df = q_sql_q10_returns(spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan_string(df, "simple")
    assert_pushed_filters(df, "EqualTo(l_returnflag,R)")


def test_tfidf_cosine_pairs_exchanges_never_carry_text(spark):
    """tfidf_cosine_pairs' wide stages (tf/df aggs, signature and
    champion windows, the inverted-index self-join) must all run on
    tokenized/aggregated rows — the raw `text` column may never reach
    an Exchange. At 100 TB the document bodies are the corpus's bulk;
    a shuffle carrying them would dwarf every other stage."""
    from kafkastreams_example_spark.plans.explain import exchange_inputs
    from kafkastreams_example_spark.queries import REGISTRY

    df = REGISTRY["tfidf_cosine_pairs"].fn(spark, SF_DIR)
    inputs = exchange_inputs(df)
    assert len(inputs) >= 2  # tf agg + signature/champion selections shuffle
    fat = [ln for ln in inputs if "text#" in ln]
    assert not fat, f"text-carrying exchanges: {fat}"


def test_bpe_train_merges_iterations_stay_on_vocab(spark):
    """bpe_train_merges must touch the corpus ONCE: without the eager
    localCheckpoint cuts on vocab0 and each round's best pair, every
    union branch re-derives the full chain and the corpus scan
    duplicates ~2^rounds times in the physical plan (measured 15 scans
    for 4 rounds before the fix — the 100 TB killer). After the cuts
    the final plan contains no corpus scan at all (the one real scan
    ran at vocab0 materialization)."""
    from kafkastreams_example_spark.plans.explain import plan_string
    from kafkastreams_example_spark.queries import REGISTRY

    df = REGISTRY["bpe_train_merges"].fn(spark, SF_DIR)
    plan = plan_string(df, "simple")
    scans = plan.count("documents.parquet")
    assert scans <= 1, f"{scans} corpus scans; plan:\n{plan[:2000]}"


def test_bloom_semi_join_filters_before_exchange(spark):
    """The bloom probe must be a plain Filter (getbit over an array
    literal) evaluated in the fact SCAN stage — i.e. BELOW the
    fact-side exchange — so the shuffle carries matches + fp residue,
    not the whole table. No UDF/python stage anywhere."""
    from kafkastreams_example_spark.queries import q_bloom_semi_join

    df = q_bloom_semi_join(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "getbit" in plan, plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # the getbit filter must appear deeper in the tree than the first
    # exchange that feeds the semi join (plan text is printed root-
    # first, so scan-stage operators appear AFTER their exchange)
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1 and plan.find("getbit") > first_exchange, plan


def test_semdedup_assignment_is_hash_agg(spark):
    """semdedup's nearest-centroid assignment must compile to a
    PER-ROW array_min over the collected codebook array (round 20: the
    former min_by hash aggregation re-keyed the n·C cross-join through
    an Exchange; the per-row form is exchange-free) — never a window
    sort — and the whole entry must stay JVM-side (no Python stage)
    with no global sort."""
    from kafkastreams_example_spark.queries import q_semdedup

    plan = plan_string(q_semdedup(spark, SF_DIR), "simple")
    assert "array_min" in plan, plan
    assert "Window" not in plan, plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "rangepartitioning" not in plan  # no global sort anywhere


def test_graph_triangles_is_intersection_form(spark):
    """Triangle counting must evaluate via per-edge adjacency-array
    intersection (array_intersect inside codegen over m edge rows),
    never by exploding the O(m^1.5) wedge set through an exchange —
    the wedge-join formulation shipped 3.5x slower at sf0.1 and its
    shuffle volume grows with the wedge count, not the edge count."""
    from kafkastreams_example_spark.queries import q_graph_triangles

    df = q_graph_triangles(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "array_intersect" in plan, plan
    # no generator/explode anywhere: wedges are never materialized
    assert "Generate" not in plan, plan
    # round-12 guard: no FORCED broadcast anywhere in the query — every
    # joined frame here (edges, degrees, neighbor arrays) is node- or
    # edge-cardinality, i.e. grows with the graph, so a broadcast hint
    # would be an OOM at scale. AQE may still broadcast at runtime when
    # a side is actually small; the hint is what we forbid, and hints
    # survive verbatim in the analyzed logical plan.
    logical = plan_string(df, "extended")
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical, (
        logical[:2000]
    )


def test_resample_ohlc_is_single_hash_agg(spark):
    """The OHLC resample must compile to ONE hash aggregation over the
    scan — open/close via struct min/max (map-side-combinable min_by/
    max_by), NEVER a first_value/last_value window sort over raw rows
    (the oracle's formulation, and the shape that range-sorts 100 TB
    of ticks)."""
    from kafkastreams_example_spark.queries import q_resample_ohlc

    df = q_resample_ohlc(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert plan.count("Exchange") == 1, plan  # one shuffle: the groupBy


def test_skew_profile_topk_no_global_sort(spark):
    """Key-skew diagnostics: the top-10 hot keys must compile to
    TakeOrderedAndProject (partition-local heaps + driver merge), and
    the totals fold-in must be a broadcast of the 1-row scalar frame,
    never a second scan of the fact table."""
    from kafkastreams_example_spark.queries import q_skew_profile

    df = q_skew_profile(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    # one scan only: counts frame is reused for totals, not recomputed
    assert plan.count("Scan parquet") <= 2, plan


def test_snapshot_diff_single_state_pass(spark):
    """The as-of diff must compute BOTH snapshots in one conditional
    aggregation (max(struct) + max(when(t<=cut1, struct))) — a single
    keyspace-bound shuffle — never two per-cutoff scans joined back,
    and never a window sort."""
    from kafkastreams_example_spark.queries import q_snapshot_diff

    df = q_snapshot_diff(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan  # no snapshot self-join
    # scans: one for the ts-span scalars, one for the state agg
    assert plan.count("Scan parquet") == 2, plan


def test_winsorize_shares_one_histogram(spark):
    """winsorize's p05/p95 must come from the shared multi-percentile
    kernel: the value histogram is built ONCE (one aggregation over
    the scan feeding both rank picks), the bounds frame joins back by
    broadcast, and no global sort appears anywhere."""
    from kafkastreams_example_spark.queries import q_winsorize

    df = q_winsorize(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "rangepartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # events scanned once for the histogram + once for the clip pass;
    # a per-percentile kernel would add a third scan
    assert plan.count("Scan parquet") == 2, plan


def test_bm25_topk_bounded_broadcasts_and_heap_topk(spark):
    """BM25: the df frame (bounded by |query| = 3) and the 1-row corpus
    stats frame broadcast; the top-10 compiles to TakeOrderedAndProject
    (partition-local heaps), never a global rangepartitioning sort; and
    doc length rides the explode (no doc_id self-join to reattach it —
    every join in the plan is a broadcast join)."""
    from kafkastreams_example_spark.queries import q_bm25_topk

    df = q_bm25_topk(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) == 2, plan


def test_twap_single_exchange(spark):
    """TWAP: the lead() window and the weighted-mean aggregation share
    the (event_type, day) partitioning — the whole query is ONE
    exchange, with the display-string projection after the agg (never
    a second shuffle on a derived grouping key)."""
    from kafkastreams_example_spark.queries import q_twap

    df = q_twap(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_markov_transitions_bounded_normalization(spark):
    """Markov transitions: the sequence window partitions by user_id
    (the only corpus-bound shuffle); the count agg and the P(next|prev)
    normalization window both operate on the |event_type|²-bounded
    matrix frame — no global sort, no join."""
    from kafkastreams_example_spark.queries import q_markov_transitions

    df = q_markov_transitions(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_rolling_corr_single_window_exchange(spark):
    """Rolling corr: one event_type-partitioned window exchange, the
    RANGE frame slides over a declarative corr aggregate (no Python,
    no join, no buffering operator), and the scan reads only the four
    referenced columns."""
    from kafkastreams_example_spark.queries import q_rolling_corr

    df = q_rolling_corr(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_ssjoin_prefix_no_cartesian_and_staged_arrays(spark):
    """The prefix-filtered similarity join must never fall back to a
    cartesian/nested-loop product — candidates come from the equi-join
    on prefix shingles — and the doc->sorted-shingle-array frame must
    be staged (written once to a temp parquet, scanned by the prefix
    explode and both verify sides) so the tokenize->df->sort pipeline
    is not re-derived three times. Parquet staging, not persist(): a
    lazily-returned frame can never unpersist, so a cache here would
    leak corpus-sized storage memory per invocation."""
    from kafkastreams_example_spark.queries import q_ssjoin_prefix

    df = q_ssjoin_prefix(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "InMemoryTableScan" not in plan, plan  # no cache leak
    assert plan.count("ssjoin_prefix_stage_") >= 3, plan  # staged scan x3
    assert "rangepartitioning" not in plan, plan


def test_bm25_incremental_index_reads_are_broadcast(spark):
    """BM25-from-index: the committed index contributes a
    |query|-bounded df frame and a 1-row stats frame, both broadcast;
    ranking is TakeOrderedAndProject. The three micro-batch merges run
    eagerly inside the builder (state maintenance, not the query), so
    the RETURNED plan must contain no shuffle join and no global
    sort."""
    from kafkastreams_example_spark.queries import q_bm25_incremental

    df = q_bm25_incremental(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) == 2, plan


def test_ewma_single_exchange_no_window(spark):
    """EWMA: the per-entity fold must be ONE hash-aggregated collect
    (entity-keyed exchange) with the left fold fused into the
    projection — no Window operator, no join, one scan."""
    from kafkastreams_example_spark.queries import q_ewma

    df = q_ewma(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_k_anonymity_bounded_two_phase_agg(spark):
    """k-anonymity/l-diversity: one scan, the count-distinct two-phase
    aggregation keyed by the bounded QI domain — no join, no window,
    no global sort."""
    from kafkastreams_example_spark.queries import q_k_anonymity

    df = q_k_anonymity(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_expectations_audit_one_pass(spark):
    """Expectation audit: ALL rules in one conditional-aggregation pass
    over one scan (never a scan per rule), unpivoted via stack — a
    single single-partition exchange, no join."""
    from kafkastreams_example_spark.queries import q_expectations_audit

    df = q_expectations_audit(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_minhash_incremental_pairs_from_committed_index(spark):
    """LSH-from-index: the returned query pairs committed (band, bh,
    doc_id) rows — never recomputing signatures (no parquet scan of
    documents in the plan, only the index table's files), bucket-capped
    before the self-join, no cartesian fallback."""
    from kafkastreams_example_spark.queries import q_minhash_incremental

    df = q_minhash_incremental(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    # the only scans are the index table's own version files
    assert "documents.parquet" not in plan, plan


def test_ivf_incremental_serves_from_committed_postings(spark):
    """IVF-from-index (round 14): the served top-k consumes the
    committed (ivf_bucket, vec_id) posting list through ivf_topk's
    assignments fast path — the plan must contain NO per-vector
    assignment pass (no cross join of the corpus against centroids in
    the serving branch beyond the query/probe side), no cartesian
    fallback, and the posting join must not shuffle the corpus by
    range. The embeddings parquet is still scanned (vectors live
    there; the index holds only postings), but the bucket map comes
    from the index table's version files."""
    from kafkastreams_example_spark.queries import q_ivf_incremental

    df = q_ivf_incremental(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    # the committed index's version files are a scan source
    assert "version=" in plan or "MaterializedCounts" in plan or \
        "ivf_index_" in plan, plan


def test_ivf_incremental_matches_one_shot_assignment(spark):
    """The committed posting list must equal one-shot ivf_assign over
    the whole corpus regardless of ingestion batching (%3 here, %2 as
    the alternative), and the served top-k must equal ivf_topk run
    WITHOUT the assignments fast path — the index-as-you-land
    invariant, locally (the oracle proves it against DuckDB)."""
    from kafkastreams_example_spark.functions.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )
    from kafkastreams_example_spark.queries import q_ivf_incremental
    from kafkastreams_example_spark.sources.tables import load_table

    got = sorted(
        map(tuple, q_ivf_incremental(spark, SF_DIR).collect())
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_centroids(emb, k=16, iters=2)
    want = sorted(
        map(
            tuple,
            ivf_topk(
                emb, query_ids=[0, 1, 2, 3, 4], k=5, centroids=cents
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_table_checksum_single_agg(spark):
    """Table checksum: one scan, one hash aggregation keyed by the
    bounded flag domain, hashing fused into the projection — no join,
    no window, no global sort."""
    from kafkastreams_example_spark.queries import q_table_checksum

    df = q_table_checksum(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "Window" not in plan, plan


def test_decile_lift_no_global_sort(spark):
    """Global decile assignment must come from broadcast percentile
    boundaries, NEVER an ntile/range-sort of the corpus: no
    rangepartitioning anywhere, the boundary and base-rate frames join
    by broadcast, bucket assignment is a projection."""
    from kafkastreams_example_spark.queries import q_decile_lift

    df = q_decile_lift(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "rangepartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row frames


def test_sequence_match_single_exchange(spark):
    """MATCH_RECOGNIZE-lite: one user-keyed hash-aggregated collect,
    symbol fold + regex fused into the projection — one exchange, no
    window, no join."""
    from kafkastreams_example_spark.queries import q_sequence_match

    df = q_sequence_match(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_mutual_information_bounded_frame(spark):
    """PMI profile: one scan, one hash agg keyed by the bounded feature
    product; marginals are window sums over the 35-cell frame — no
    second scan, no join."""
    from kafkastreams_example_spark.queries import q_mutual_information

    df = q_mutual_information(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_mmr_rerank_candidates_via_topk_heap(spark):
    """MMR: the only corpus-bound stage is the candidate top-10, which
    must compile to TakeOrderedAndProject; the greedy steps operate on
    the persisted pool frame (InMemoryTableScan) with broadcast-only
    joins — no global sort, no shuffle join."""
    from kafkastreams_example_spark.queries import q_mmr_rerank

    df = q_mmr_rerank(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_zonemap_prune_skips_most_buckets(spark):
    """Zone-map pruning must demonstrate a real skip win on the
    clustered layout: most of the 64 buckets skipped for the ~4%
    box, scanned rows a small fraction of the table, and every join
    in the plan broadcast (stats frames are bounded)."""
    from kafkastreams_example_spark.queries import q_zonemap_prune

    r = q_zonemap_prune(spark, SF_DIR).collect()[0]
    assert r["n_buckets"] == 64
    assert r["n_skipped"] >= 40, r
    assert r["rows_scanned"] < r["rows_total"] // 4, r
    assert r["rows_matched"] <= r["rows_scanned"], r
    df = q_zonemap_prune(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_rolling_corr_range_single_exchange_no_window(spark):
    """The retract-capable time-RANGE kernel must compile to ONE
    exchange on the entity key feeding an Arrow-batched MapInPandas —
    never a declarative Window (whose RANGE frame replays per row,
    O(n·rows-per-24h)), never per-entity FlatMapGroupsInPandas
    (measured 10.8 s of per-group Arrow overhead at sf0.1 vs ~1 s for
    batch-vectorized MapInPandas), and never a global sort. The
    within-partition Sort below the pandas op is the entity-clustering
    sort, not a rangepartitioning."""
    from kafkastreams_example_spark.queries import q_rolling_corr_range

    df = q_rolling_corr_range(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "MapInPandas" in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(user_id" in plan, plan
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_rolling_range_stats_single_exchange_no_window(spark):
    """The stats face of the RANGE kernel carries the identical plan
    contract as the corr face: one entity-hash exchange into
    MapInPandas, no declarative Window, no global sort."""
    from kafkastreams_example_spark.queries import q_rolling_range_stats

    df = q_rolling_range_stats(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "MapInPandas" in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_ann_recall_eval_join_is_broadcast(spark):
    """The recall@5 eval joins two |queries|*k-row frames: the eval
    join itself must be broadcast (the only SortMergeJoin allowed is
    ivf_topk's internal corpus-side bucket equi-join — shuffle-
    appropriate, it carries candidate rows), no cartesian product
    anywhere, and nothing range-partitions (per-query ranking is
    query-partitioned window work, never a global sort)."""
    from kafkastreams_example_spark.queries import q_ann_recall

    df = q_ann_recall(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("SortMergeJoin") <= 1, plan  # ivf bucket join only
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_training_shuffle_one_exchange_no_global_sort(spark):
    """The seeded epoch shuffle must be the factored form (hash to
    shard, sort WITHIN shard), never the naive global `ORDER BY
    random-key`: exactly one Exchange (hashpartitioning on shard —
    no rangepartitioning anywhere, which is what a global sort would
    compile to), the scan pruned to doc_id alone, and the key
    arithmetic inside whole-stage codegen."""
    from kafkastreams_example_spark.queries import q_training_shuffle

    df = q_training_shuffle(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning(shard" in plan, plan
    assert "rangepartitioning" not in plan, plan
    formatted = plan_string(df)
    assert "ReadSchema: struct<doc_id:bigint>" in formatted, formatted
