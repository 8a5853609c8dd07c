"""The engine's declared query surface: every operator from SURVEY.md §2
as a (Spark callable, DuckDB oracle SQL) pair.

Each entry is one `queries()` key in __spark_entry__.py; the oracle SQL
runs on the same parquet via DuckDB views. Column names and value
semantics are aligned across engines (see operators/relational.py for
the decimal-exact aggregation discipline; timestamps are emitted as
formatted strings to avoid ns/µs representation skew).

Reference parity citations are on each query; the reference is
lokeshallam/kafkastreams-example at /root/reference (see SURVEY.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.tables import load_table
from .operators.filters import filter_equals, filter_not_null
from .operators.json_codec import json_decode, json_encode
from .operators.dedup import (
    dedup_exact,
    dedup_windowed,
    dedup_null_passthrough,
    dedup_refresh_batch,
)
from .operators.relational import (
    broadcast_dim,
    davg,
    dsum,
    grouped_exact_percentiles,
)
from .functions.text import (
    STOPWORDS,
    text_stats,
    text_quality,
    lang_id_heuristic,
    doc_fingerprint,
)
from .functions.dedup_approx import (
    _exploded_tokens,
    minhash_signatures,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash,
    simhash_band_pairs,
    symdelete_fuzzy_pairs,
)
from .functions.similarity import cosine_topk, cosine_pairs, embedding_norms
from .functions.multimodal import attach_binary_payload, decode_media_meta, frame_sample_plan
from .schema import PROPS_SCHEMA_DDL


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()
    # strict_float (round-18, verdict item 6): opt-in full-repr float
    # compare for entries whose CONTRACT is bit-equality with a
    # built-in (checksum, ewma, the exact-percentile family). The
    # default 9-sig-fig collapse is right for cross-engine formatting
    # skew but structurally blind to ulp-class kernel bugs — the r17
    # percentile falsifier survived 17 rounds of green gates behind
    # it. Only set where the docstring claims "no rounding shield";
    # signed zero stays collapsed even in strict mode (IEEE
    # -0.0 == 0.0; engines disagree on the sign after rounding).
    strict_float: bool = False


def _ts_s(col: str) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# --------------------------------------------------------------------------
# Reference surface (SURVEY.md §2a): filter / json codec / dedup family
# --------------------------------------------------------------------------


def q_filter_level(spark, sf_dir):
    """F1 equality filter (KafkaStreamsApplication.java:110), events
    analog: event_type == 'error'."""
    ev = load_table(spark, sf_dir, "events")
    return filter_equals(ev, "event_type", "error").select(
        "event_id", "user_id", "event_type", "value", _ts_s("ts").alias("ts_s")
    )


SQL_FILTER_LEVEL = """
SELECT event_id, user_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM events WHERE event_type = 'error'
"""


def q_filter_notnull(spark, sf_dir):
    """F2 not-null filter (KStreamDistinct.java:150); the nullable dedup
    id analog is nullif(event_type,'view')."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "dedup_id", F.nullif(F.col("event_type"), F.lit("view"))
    )
    return filter_not_null(ev, "dedup_id").select("event_id", "dedup_id")


SQL_FILTER_NOTNULL = """
SELECT event_id, nullif(event_type, 'view') AS dedup_id
FROM events WHERE nullif(event_type, 'view') IS NOT NULL
"""


def q_json_decode(spark, sf_dir):
    """S2 JSON decode (JsonDeserializer.java:26-38): props payload → k."""
    ev = load_table(spark, sf_dir, "events")
    return json_decode(ev, "props", PROPS_SCHEMA_DDL, out="p").select(
        "event_id", F.col("p.k").alias("k")
    )


SQL_JSON_DECODE = """
SELECT event_id, CAST(props->>'k' AS INT) AS k FROM events
"""


def q_json_encode(spark, sf_dir):
    """E1 JSON encode (JsonSerializer.java:22-31): compact to_json."""
    ev = load_table(spark, sf_dir, "events")
    return json_encode(ev, ["event_id", "event_type"], out="js").select("event_id", "js")


SQL_JSON_ENCODE = """
SELECT event_id,
       to_json(struct_pack(event_id := event_id, event_type := event_type))::VARCHAR AS js
FROM events
"""


def q_json_deadletter(spark, sf_dir):
    """S2 strictness divergence, oracle-checked: corrupt every 100th
    payload in-query; PERMISSIVE from_json yields null → dead-letter
    flag instead of the reference's hard crash
    (JsonDeserializer.java:33-34, SURVEY.md §1)."""
    ev = load_table(spark, sf_dir, "events")
    # corrupt the PREFIX: from_json tolerates trailing garbage after a
    # complete object, so suffix corruption wouldn't trip the parser
    raw = F.when(F.col("event_id") % 100 == 0, F.concat(F.lit("{{"), F.col("props"))).otherwise(
        F.col("props")
    )
    # PERMISSIVE from_json yields a struct with all-null FIELDS on
    # malformed input (not a null struct); every valid payload carries
    # k, so null k ⟺ dead letter here
    parsed = F.from_json(raw, PROPS_SCHEMA_DDL)
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        parsed.getField("k").isNull().alias("is_dead"),
    )


SQL_JSON_DEADLETTER = """
WITH r AS (
  SELECT event_id,
         CASE WHEN event_id % 100 = 0 THEN '{{' || props ELSE props END AS raw
  FROM events)
SELECT event_id,
  CASE WHEN json_valid(raw) THEN CAST(raw->>'k' AS INT) END AS k,
  NOT json_valid(raw) AS is_dead
FROM r
"""


def q_reference_pipeline(spark, sf_dir):
    """The reference's filter+dedup pipeline end-to-end in batch, JSON
    wire format included: build a LogEvent-shaped JSON per event (ERROR
    events carry an exception struct), decode with LOG_SCHEMA-style
    parsing, filter level=='INFO'-analog, dedup by exception_class with
    null passthrough — the whole topology
    (KafkaStreamsApplication.java:92-114 + KStreamDistinct.java:129-153)
    as one oracle-checked query. JSON strings are constructed with
    concat (identically in both engines) so the codec is exercised on
    the decode side."""
    ev = load_table(spark, sf_dir, "events")
    js = F.when(
        F.col("event_type") == "error",
        F.concat(
            F.lit('{"level":"ERROR","exception":{"exception_class":"E'),
            (F.col("user_id") % 3).cast("string"),
            F.lit('"}}'),
        ),
    ).otherwise(F.concat(F.lit('{"level":"'), F.upper("event_type"), F.lit('"}')))
    decoded = ev.select(
        "event_id",
        "ts",
        F.from_json(
            js, "level STRING, exception STRUCT<exception_class: STRING>"
        ).alias("ev"),
    )
    kept = decoded.filter(F.col("ev.level") != "VIEW")  # the F1-filter analog
    key = F.col("ev.exception.exception_class")
    deduped = dedup_null_passthrough(
        kept.withColumn("dedup_id", key), F.col("dedup_id"), "ts", 600, tiebreak=["event_id"]
    )
    return deduped.select(
        "event_id", F.col("ev.level").alias("level"), "dedup_id"
    )


SQL_REFERENCE_PIPELINE = """
WITH js AS (
  SELECT event_id, ts,
    CASE WHEN event_type = 'error'
         THEN '{"level":"ERROR","exception":{"exception_class":"E'
              || CAST(user_id % 3 AS VARCHAR) || '"}}'
         ELSE '{"level":"' || upper(event_type) || '"}' END AS raw
  FROM events),
decoded AS (
  SELECT event_id, ts, raw->>'level' AS level,
         raw->'exception'->>'exception_class' AS dedup_id
  FROM js),
kept AS (SELECT * FROM decoded WHERE level != 'VIEW'),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY dedup_id, floor(epoch(CAST(ts AS TIMESTAMP)) / 600)
    ORDER BY ts, event_id) AS rn
  FROM kept)
SELECT event_id, level, dedup_id
FROM ranked WHERE dedup_id IS NULL OR rn = 1
"""


def q_dedup_exact(spark, sf_dir):
    """D1 with infinite window: deterministic first row per key."""
    ev = load_table(spark, sf_dir, "events")
    out = dedup_exact(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select("user_id", "event_type", "event_id", _ts_s("ts").alias("ts_s"))


SQL_DEDUP_EXACT = """
SELECT user_id, event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
"""


def q_dedup_windowed(spark, sf_dir):
    """D1 quantized: first event per (event_type, 10-min tumbling
    bucket) — KStreamDistinct.java:42-112, window = 10 min (:135-136)."""
    ev = load_table(spark, sf_dir, "events")
    out = dedup_windowed(ev, "event_type", "ts", 600, tiebreak=["event_id"])
    return out.select("event_id", "event_type", _ts_s("ts").alias("ts_s"))


SQL_DEDUP_WINDOWED = """
SELECT event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (SELECT *, row_number() OVER (PARTITION BY event_type, floor(epoch(CAST(ts AS TIMESTAMP)) / 600)
                                   ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
"""


def q_dedup_null_passthrough(spark, sf_dir):
    """D1 null-id rule (KStreamDistinct.java:71-72): null dedup ids
    always survive; 'view' events play the no-exception records."""
    ev = load_table(spark, sf_dir, "events")
    key = F.nullif(F.col("event_type"), F.lit("view"))
    out = dedup_null_passthrough(ev, key, "ts", 600, tiebreak=["event_id"])
    return out.select("event_id", "event_type", _ts_s("ts").alias("ts_s"))


SQL_DEDUP_NULL_PASSTHROUGH = """
SELECT event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM (SELECT *, row_number() OVER (
        PARTITION BY nullif(event_type, 'view'),
                     floor(epoch(CAST(ts AS TIMESTAMP)) / 600)
        ORDER BY ts, event_id) AS rn
      FROM events)
WHERE nullif(event_type, 'view') IS NULL OR rn = 1
"""


def q_dedup_refresh(spark, sf_dir):
    """D1 exact in-order semantics: refresh-on-duplicate
    (KStreamDistinct.java:97-99) ≡ session-gap dedup with
    gap = window/2 = 5 min (:56-57, :88-91)."""
    ev = load_table(spark, sf_dir, "events")
    out = dedup_refresh_batch(ev, F.col("event_type"), "ts", 300.0, tiebreak=["event_id"])
    return out.select("event_id", "event_type", _ts_s("ts").alias("ts_s"))


SQL_DEDUP_REFRESH = """
WITH g AS (
  SELECT event_id, event_type, ts,
         lag(epoch(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_s
  FROM events)
SELECT event_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM g WHERE prev_s IS NULL OR epoch(CAST(ts AS TIMESTAMP)) - prev_s > 300.0
"""


# --------------------------------------------------------------------------
# Relational core (SURVEY.md §2c): aggs / joins / windows / sorts / set ops
# --------------------------------------------------------------------------


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: hash agg with map-side partials;
    the flagship batch plan (scan → partial agg → 1 shuffle → final)."""
    li = load_table(spark, sf_dir, "lineitem")
    # full decimal arithmetic: source values are exact 2-decimal, so the
    # products are exact decimals in every engine — no double rounding
    # anywhere (double→decimal casts of computed products round
    # differently across engines near midpoints)
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = ep * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_customer_orders(spark, sf_dir):
    """Fact⋈dim equi-join + agg; customer is broadcast (map-side join,
    no shuffle of orders)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(broadcast_dim(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("sum_total"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


SQL_JOIN_CUSTOMER_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join_salted(spark, sf_dir):
    """Skew-defeating salted equi-join (operators/relational.py::
    salted_join): orders salted by a row-unique hash, customer
    replicated ×8, joined on (custkey, salt) — a hot customer's orders
    spread across 8 reducers. Salting never changes the result, so the
    oracle is the PLAIN join; what the entry pins is that the salted
    plan stays value-identical. Plan shape asserted in
    tests/test_plans.py."""
    from .operators.relational import salted_join

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    joined = salted_join(orders, cust, "custkey", salt_buckets=8, salt_source="o_orderkey")
    return joined.groupBy("c_mktsegment", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("sum_total"),
    )


SQL_JOIN_SALTED = """
SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus
"""


def q_join_multiway_region(spark, sf_dir):
    """3-way snowflake join: both dims broadcast; single agg shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(broadcast_dim(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast_dim(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            davg("c_acctbal").alias("avg_acctbal"),
        )
    )


SQL_JOIN_MULTIWAY_REGION = """
SELECT r_name, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_join_semi(spark, sf_dir):
    """Left-semi join: customers with ≥1 open ('O') order — no
    row-multiplication, dedup-free EXISTS shape."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


SQL_JOIN_SEMI = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def q_bloom_semi_join(spark, sf_dir):
    """Bloom-prefiltered semi join (functions/bloom.py): lineitems of
    top-decile-value orders (o_totalprice > 449k), pre-reduced by a
    Bloom filter over the qualifying order keys INSIDE the lineitem
    scan stage, then exactly semi-joined — per-returnflag revenue
    profile of the high-value slice.

    Why this is its own entry next to join_semi: at 100 TB the plain
    semi join shuffles the ENTIRE fact table on the key even when a
    sliver matches, and the dim key set (10⁷–10⁸ keys) is past raw
    broadcast range. The Bloom filter is n_bits/8 bytes regardless of
    key width (built by ONE bit_or aggregation whose shuffle is
    ≤ n_bits/64 rows; probed as k getbit tests of an array literal
    fused into the scan — no UDF, no extra join), so the fact shuffle
    carries matches + ~1.6% false-positive residue which the exact
    semi join then removes. The classic semi-join reduction (Bloom
    1970; Bernstein & Chiu, JACM 1981). Results are EXACT — the bloom
    only prices the plan — so the oracle is the plain IN-subquery.
    Plan-guarded: getbit filter present below the fact-side exchange,
    no false negatives by construction (property-tested)."""
    from .functions.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = orders.filter(F.col("o_totalprice") > 449000.0).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    # explicit n_bits (16x the ~15k keys/SF0.1, rounded up to a power
    # of two) skips the auto-sizing count pass; at sf0.1 the probe
    # passes 68.5k of 600k lineitems (60.9k true + 1.4% fp residue) —
    # an 8.8x shuffle reduction, recorded in BASELINE.md
    matched = bloom_semi_join(li, keys, "l_orderkey", n_bits=1 << 18)
    return matched.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(3,2)"))
        )
        .cast("double")
        .alias("revenue"),
    )


SQL_BLOOM_SEMI_JOIN = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 449000.0)
GROUP BY l_returnflag
"""


def q_fk_integrity(spark, sf_dir):
    """Referential-integrity validation in one declarative pass: for
    every FK edge of the star schema (+ the events→customer edge),
    count child rows, distinct child keys, and ORPHAN keys (child keys
    with no parent) — the constraint check a pipeline runs before
    training-data joins, where silent orphans become silently dropped
    or duplicated rows downstream.

    Scale shape: the orphan probe anti-joins DISTINCT child keys
    (never raw child rows — the shuffle is keyspace-bound, and for the
    big fact edges the distinct itself is the same map-side partial
    dedup the joins already pay), parents are dimension tables AQE
    broadcasts, and the per-edge scalars union into a 7-row frame.
    NULL child keys are excluded per standard FK semantics. All counts
    exact/integer — trivially hash-stable cross-engine."""
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ]
    # One pass per edge (optimization round 21, guide §2.3): the
    # former n_rows / n_keys / n_orphans triple computed three
    # independent aggregate subtrees whose crossJoins re-scanned the
    # child table per scalar (56 parquet scans across the 7 edges,
    # zero reuse in the plan). Instead reduce the child ONCE to
    # per-key row counts, left-join the distinct parent keys, and fold
    # all three scalars from that single keyspace-bound frame:
    # n_rows = Σ per-key counts (child rows with non-null key, exactly
    # the old count), n_keys = frame rows, n_orphans = keys whose
    # parent probe missed. Two scans per edge, one shuffle.
    out = None
    for name, ct, ck, pt, pk in edges:
        child = load_table(spark, sf_dir, ct).filter(F.col(ck).isNotNull())
        parent = (
            load_table(spark, sf_dir, pt)
            .select(F.col(pk).alias(ck))
            .distinct()
            .withColumn("__p", F.lit(1))
        )
        dk = child.groupBy(ck).agg(F.count("*").alias("__cnt"))
        row = (
            # parent is distinct on the key, so the left join cannot
            # fan out: one row per child key, __p NULL iff orphan
            dk.join(parent, ck, "left")
            .agg(
                # coalesce: an EMPTY child edge must read 0, not NULL
                # (and keeps the column non-nullable like the old
                # count(*) form)
                F.coalesce(F.sum("__cnt"), F.lit(0).cast("bigint")).alias(
                    "n_rows"
                ),
                F.count("*").alias("n_keys"),
                F.count(F.when(F.col("__p").isNull(), 1)).alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk"), "n_rows", "n_keys", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_fk_edge(name, ct, ck, pt, pk):
    return f"""SELECT '{name}' AS fk,
 (SELECT COUNT(*) FROM {ct} WHERE {ck} IS NOT NULL) AS n_rows,
 (SELECT COUNT(DISTINCT {ck}) FROM {ct} WHERE {ck} IS NOT NULL) AS n_keys,
 (SELECT COUNT(*) FROM (SELECT DISTINCT {ck} FROM {ct} WHERE {ck} IS NOT NULL) d
   WHERE NOT EXISTS (SELECT 1 FROM {pt} WHERE {pk} = d.{ck})) AS n_orphans"""


SQL_FK_INTEGRITY = "\nUNION ALL\n".join(
    _sql_fk_edge(*e)
    for e in [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ]
)


def q_join_anti(spark, sf_dir):
    """Left-anti join: customers with no RECENT order (none since
    1999-01-01). Round-10 signal-audit fix: the original "no orders at
    all" predicate matched zero customers at every SF (this testdata
    gives every customer at least one order), so the gate never
    produced an anti-join survivor; the recency filter keeps the same
    physical anti-join shape (with the date predicate pushed into the
    orders scan) and yields 6 rows at sf0.001 / 29 at sf0.01."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
"""


def q_agg_distinct(spark, sf_dir):
    """Distinct aggregate alongside plain aggregates (expand + two-phase
    agg under the hood)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice").alias("sum_total"),
    )


SQL_AGG_DISTINCT = """
SELECT o_orderstatus, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders GROUP BY o_orderstatus
"""


def q_agg_rollup(spark, sf_dir):
    """ROLLUP grouping sets over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )


SQL_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_agg_having(spark, sf_dir):
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_total"))
        .filter(F.col("n_orders") > 50)
    )


SQL_AGG_HAVING = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 50
"""


def q_window_rank(spark, sf_dir):
    """Ranking window: top-3 orders per customer (row_number with a
    total-order tiebreaker for determinism)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk", "o_totalprice")
    )


SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, rnk, o_totalprice
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) WHERE rnk <= 3
"""


def q_window_running(spark, sf_dir):
    """Analytic window: per-customer running total (decimal-exact
    cumulative sum, ROWS UNBOUNDED PRECEDING)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    return orders.select("o_custkey", "o_orderkey", run.alias("run_total"))


SQL_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
FROM orders
"""


def q_sort_limit(spark, sf_dir):
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no full sort/shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_setop_intersect(spark, sf_dir):
    """INTERSECT: customers having both finished and open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


SQL_SETOP_INTERSECT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_setop_except(spark, sf_dir):
    """EXCEPT: customers with finished but no open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(o)


SQL_SETOP_EXCEPT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL bag semantics (multiset counting, a
    different physical shape from the DISTINCT set ops)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(o)


SQL_SETOP_INTERSECT_ALL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_cross_join_dims(spark, sf_dir):
    """Explicit cartesian product of two small dims (the deliberate
    cross join every engine must support — and confine to small sides)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.crossJoin(region).select("n_name", "r_name")


SQL_CROSS_JOIN_DIMS = """
SELECT n_name, r_name FROM nation CROSS JOIN region
"""


def q_sql_q5_local_supplier(spark, sf_dir):
    """TPC-H Q5-shaped 5-way join with a cross-table equality (customer
    and supplier in the same nation), revenue per nation. The heaviest
    join shape in the registry: two fact tables + three broadcast dims."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


SQL_SQL_Q5_LOCAL_SUPPLIER = """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_scalar_funcs(spark, sf_dir):
    """Scalar function library sweep: string/date/math/conditional, all
    JVM expressions inside whole-stage codegen."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        # decimal×decimal, not round(double): the source is exact
        # 2-decimal, so decimal arithmetic is exact in every engine,
        # while round-on-double hits true .xx5 midpoints that engines
        # break differently
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit("0.1").cast("decimal(2,1)"))
        .cast("double")
        .alias("tithe"),
        F.abs(F.col("o_totalprice") - 1000.0).alias("dist1k"),
        F.when(F.col("o_totalprice") > 100000, "big").otherwise("small").alias("bucket"),
    )


SQL_SCALAR_FUNCS = """
SELECT o_orderkey,
  upper(substring(o_orderpriority, 1, 3)) AS pri3,
  length(o_orderstatus) AS status_len,
  concat_ws('#', o_orderstatus, o_orderpriority) AS tag,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1)) AS DOUBLE) AS tithe,
  abs(o_totalprice - 1000.0) AS dist1k,
  CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS bucket
FROM orders
"""


def q_string_funcs3(spark, sf_dir):
    """String library long tail: reverse/repeat/position/affix tests."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.reverse("p_name").alias("rev"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand2x"),
        F.instr("p_name", "a").alias("a_pos"),
        # round-10 signal-audit fix: the previous affixes ('p', '0',
        # 'art') never occur in this corpus's part names — all three
        # flags were constant False, so the affix functions were never
        # exercised on the true branch; these split 269/514/664 of 2000
        F.col("p_name").startswith("s").alias("starts_s"),
        F.col("p_name").endswith("t").alias("ends_t"),
        F.col("p_name").contains("ol").alias("has_ol"),
        F.ascii("p_brand").alias("brand_ascii"),
    )


SQL_STRING_FUNCS3 = """
SELECT p_partkey,
  reverse(p_name) AS rev,
  repeat(substring(p_brand, 1, 2), 2) AS brand2x,
  CAST(strpos(p_name, 'a') AS INT) AS a_pos,
  starts_with(p_name, 's') AS starts_s,
  ends_with(p_name, 't') AS ends_t,
  contains(p_name, 'ol') AS has_ol,
  ascii(p_brand) AS brand_ascii
FROM part
"""


def q_map_explode(spark, sf_dir):
    """Map explosion: JSON payload → one row per (key, value) entry."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select("event_id", F.explode(m).alias("key", "val"))


SQL_MAP_EXPLODE = """
SELECT event_id, k AS key, CAST(json_extract_string(props, '$.' || k) AS INT) AS val
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
"""


def q_agg_windowed_events(spark, sf_dir):
    """Streaming-analog tumbling-window aggregate in batch: events per
    (event_type, 1-hour bucket). In streaming this is exactly
    window(ts,'1 hour') + watermark; the batch form is oracle-checkable."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    return ev.groupBy("event_type", bucket.alias("hour_bucket")).agg(
        F.count("*").alias("n_events"), dsum("value").alias("sum_value")
    )


SQL_AGG_WINDOWED_EVENTS = """
SELECT event_type, CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hour_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Relational core, batch 2: outer joins, window variants, cube, as-of /
# range joins, sessionization, function-library sweeps
# --------------------------------------------------------------------------


def q_join_outer_left(spark, sf_dir):
    """Left outer join keeping order-less customers (n_orders = 0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("sum_total"),
        )
    )


SQL_JOIN_OUTER_LEFT = """
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def q_union_all(spark, sf_dir):
    """UNION ALL (bag semantics) of two order slices."""
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 200000).select("o_orderkey", "o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    return hi.unionByName(urgent)


SQL_UNION_ALL = """
SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 200000
UNION ALL
SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q_window_lag_lead(spark, sf_dir):
    """lag/lead/ntile: per-customer order deltas and quartiles."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    prev = F.lag("o_totalprice").over(w)
    nxt = F.lead("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_total"),
        nxt.alias("next_total"),
        F.ntile(4).over(wq).alias("quartile"),
    )


SQL_WINDOW_LAG_LEAD = """
SELECT o_custkey, o_orderkey,
  lag(o_totalprice) OVER w AS prev_total,
  lead(o_totalprice) OVER w AS next_total,
  ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_window_moving_avg(spark, sf_dir):
    """Frame window: 3-order moving average per customer (decimal-exact
    sum ÷ frame count, both engines bit-identical)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    msum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    mcnt = F.count("*").over(w)
    return orders.select(
        "o_custkey", "o_orderkey", (msum / mcnt).alias("moving_avg3")
    )


SQL_WINDOW_MOVING_AVG = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS moving_avg3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_agg_cube(spark, sf_dir):
    """CUBE grouping sets over (status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_total")
    )


SQL_AGG_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _asof_carried(spark, sf_dir):
    """Shared union-merge as-of frame for the two as-of entries (plain
    and tolerance — round-10 review: the construction existed twice and
    a future rebase would plausibly update one and miss the other):
    purchase probes and non-purchase state events tagged and merged,
    one sort-partition per user, the latest state event's id AND
    timestamp carried forward under the deterministic
    (ts, side, event_id) order. Ties at identical timestamps resolve
    state-before-probe then by event id — same in the oracles. Unused
    carried columns are pruned by Catalyst, so the plain entry pays
    nothing for the timestamp carry it doesn't select."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    state = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("k"), F.col("ts"),
        F.lit(0).alias("side"), F.col("event_id"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.col("ts"),
        F.lit(1).alias("side"), F.col("event_id"),
    )
    merged = state.unionByName(probes)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    state_id = F.when(F.col("side") == 0, F.col("event_id"))
    state_ts = F.when(F.col("side") == 0, F.col("ts"))
    return merged.withColumn(
        "asof_event_id", F.last(state_id, ignorenulls=True).over(w)
    ).withColumn("asof_ev_ts", F.last(state_ts, ignorenulls=True).over(w))


def q_asof_join(spark, sf_dir):
    """As-of join: for each PURCHASE event, the latest same-user
    non-purchase event at or before it — "what was the user last doing
    when they bought?", the attribution lookup shape.

    Round-10 review-class fix: this entry previously joined orders to
    events, whose time axes never overlap in this testdata (events sit
    in 2024, orders in 1995-2001), so the as-of match was NULL for
    every row at every SF — a zero-signal gate. Both sides now come
    from the events table (shared clock), and the sf0.01 gate carries
    ~2k real matches.

    Implemented as the scalable union-merge shape (tag both sides,
    one sort-partition by key, carry the last state event forward) — a
    single shuffle on the key, no row-multiplying range join; see
    _asof_carried for the shared construction and tie-break contract.
    """
    return (
        _asof_carried(spark, sf_dir)
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("k").alias("user_id"),
            "asof_event_id",
        )
    )


SQL_ASOF_JOIN = """
WITH merged AS (
  SELECT user_id AS k, ts, 0 AS side, event_id
  FROM events WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, ts, 1, event_id
  FROM events WHERE event_type = 'purchase'),
carried AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY ts, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS asof_event_id
  FROM merged)
SELECT event_id AS purchase_event_id, k AS user_id, asof_event_id
FROM carried WHERE side = 1
"""


def q_asof_join_tolerance(spark, sf_dir):
    """As-of join WITH TOLERANCE — the pandas merge_asof(tolerance=...)
    contract q_asof_join lacks: the last same-user state event before a
    purchase counts only if it is at most 1 hour old; staler matches
    return NULL (a stale "last known state" is often worse than none —
    the contract feature-store lookups actually use). Shares
    _asof_carried's union-merge frame; the freshness check is integer
    epoch-second arithmetic (exact in both engines — the timestamp-math
    discipline)."""
    tol_s = 3600
    carried = _asof_carried(spark, sf_dir)
    lag = F.unix_timestamp("ts") - F.unix_timestamp("asof_ev_ts")
    fresh = F.col("asof_event_id").isNotNull() & (lag <= tol_s)
    return (
        carried.filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("k").alias("user_id"),
            F.when(fresh, F.col("asof_event_id")).alias("asof_event_id"),
            F.when(fresh, lag).cast("bigint").alias("lag_seconds"),
        )
    )


SQL_ASOF_JOIN_TOLERANCE = """
WITH merged AS (
  SELECT user_id AS k, ts, 0 AS side, event_id
  FROM events WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, ts, 1, event_id
  FROM events WHERE event_type = 'purchase'),
carried AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w
           AS asof_event_id,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w
           AS asof_ev_ts
  FROM merged
  WINDOW w AS (PARTITION BY k ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_id AS purchase_event_id, k AS user_id,
       CASE WHEN asof_event_id IS NOT NULL
             AND date_diff('second', asof_ev_ts, ts) <= 3600
            THEN asof_event_id END AS asof_event_id,
       CAST(CASE WHEN asof_event_id IS NOT NULL
             AND date_diff('second', asof_ev_ts, ts) <= 3600
            THEN date_diff('second', asof_ev_ts, ts) END AS BIGINT)
         AS lag_seconds
FROM carried WHERE side = 1
"""


def q_range_join(spark, sf_dir):
    """Range join: events of the same user within 1 day after the order
    date, counted per order. Equi-key + range predicate → Spark plans a
    hash join with the range as a post-filter (no cartesian)."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cond = (
        (ev.user_id == orders.o_custkey)
        & (ev.ts >= orders.o_orderdate)
        & (ev.ts < F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    return (
        orders.join(ev, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_1d"))
    )


SQL_RANGE_JOIN = """
SELECT o_orderkey, COUNT(event_id) AS n_events_1d
FROM orders LEFT JOIN events
  ON user_id = o_custkey
 AND ts >= CAST(o_orderdate AS TIMESTAMP)
 AND ts < CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 DAY
GROUP BY o_orderkey
"""


def q_session_stats(spark, sf_dir):
    """Sessionization: 30-min-gap sessions per user (lag → gap flag →
    running sum = session id → per-session aggregates). One shuffle on
    user_id; the batch analog of session_window streaming aggregation
    and the same shape as dedup_refresh_batch."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer milliseconds, not double seconds: double epoch conversion
    # differs across engines by 1 ulp, and the session-gap comparison /
    # duration subtraction would amplify it into visible mismatches
    ms = F.unix_millis("ts")
    gap = ms - F.lag(ms).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(ms) - F.min(ms)).alias("duration_ms"),
    )


SQL_SESSION_STATS = """
WITH g AS (
  SELECT user_id, event_id, ts, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
    CASE WHEN lag(epoch_ms(CAST(ts AS TIMESTAMP)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR epoch_ms(CAST(ts AS TIMESTAMP))
              - lag(epoch_ms(CAST(ts AS TIMESTAMP)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
         THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  -- prefix-sum MUST order by the same total order as the lag above
  -- (full-resolution ts, event_id); ordering by ms-truncated time can
  -- split sub-millisecond ties differently from the Spark side.
  SELECT user_id, event_id, ms,
    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(ms) - MIN(ms) AS duration_ms
FROM s GROUP BY user_id, session_id
"""


def q_scalar_funcs2(spark, sf_dir):
    """Function-library sweep 2: date arithmetic and string surgery."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.lpad("o_orderstatus", 3, "_").alias("status_pad"),
        F.translate("o_orderpriority", "-", " ").alias("pri_spaced"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).alias("pri_code"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored"),
    )


SQL_SCALAR_FUNCS2 = """
SELECT o_orderkey,
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
  lpad(o_orderstatus, 3, '_') AS status_pad,
  translate(o_orderpriority, '-', ' ') AS pri_spaced,
  split_part(o_orderpriority, '-', 1) AS pri_code,
  least(o_totalprice, 100000.0) AS capped,
  greatest(o_totalprice, 100000.0) AS floored
FROM orders
"""


def q_map_funcs(spark, sf_dir):
    """JSON payload as a map column: keys + typed element access."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        m.getItem("k").alias("k"),
    )


SQL_MAP_FUNCS = """
SELECT event_id,
  array_to_string(json_keys(props), ',') AS prop_keys,
  CAST(props->>'k' AS INT) AS k
FROM events
"""


def q_array_funcs(spark, sf_dir):
    """Array function sweep over tokenized documents."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.array_join(F.array_sort(F.array_distinct(toks)), "|").alias("sorted_vocab"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, "spark").cast("int").alias("spark_pos"),
    )


SQL_ARRAY_FUNCS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, len(toks) AS n_words,
  array_to_string(list_slice(toks, 1, 3), ' ') AS first3,
  array_to_string(list_sort(list_distinct(toks)), '|') AS sorted_vocab,
  list_contains(toks, 'spark') AS has_spark,
  CAST(coalesce(list_position(toks, 'spark'), 0) AS INT) AS spark_pos
FROM t
"""


def q_agg_minmax(spark, sf_dir):
    """min/max over numerics, strings and timestamps per group."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max("o_totalprice").alias("max_total"),
        F.min("o_totalprice").alias("min_total"),
        F.min("o_orderpriority").alias("min_pri"),
        _ts_s(F.min("o_orderdate")).alias("first_order"),
        _ts_s(F.max("o_orderdate")).alias("last_order"),
    )


SQL_AGG_MINMAX = """
SELECT o_orderstatus,
  MAX(o_totalprice) AS max_total, MIN(o_totalprice) AS min_total,
  MIN(o_orderpriority) AS min_pri,
  strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_order,
  strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Relational core, batch 3: pivot/unpivot, string agg, grouping sets,
# exact-moment statistics, SQL-API entry, approximate aggregates
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(spark, sf_dir):
    """PIVOT: per-user event-type counts as columns."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count("event_id"))
        .na.fill(0, list(_EVENT_TYPES))
    )


SQL_PIVOT_EVENTS = """
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS "view"
FROM events GROUP BY user_id
"""


def q_unpivot_part(spark, sf_dir):
    """UNPIVOT/melt: wide numeric columns → (attr, val) rows."""
    part = load_table(spark, sf_dir, "part")
    return part.unpivot(
        ["p_partkey"],
        ["p_size", "p_retailprice"],
        "attr",
        "val",
    ).select("p_partkey", "attr", F.col("val").cast("double").alias("val"))


SQL_UNPIVOT_PART = """
SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
"""


def q_agg_string_concat(spark, sf_dir):
    """Ordered string aggregation per group (deterministic listagg:
    sort before joining — collect_list order is not guaranteed)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count("*").alias("n_nations"),
    )


SQL_AGG_STRING_CONCAT = """
SELECT n_regionkey,
  array_to_string(list_sort(list(n_name)), ',') AS nations,
  COUNT(*) AS n_nations
FROM nation GROUP BY n_regionkey
"""


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping_id disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    # Spark's DataFrame API exposes rollup/cube; arbitrary grouping sets
    # go through the SQL layer — itself part of the engine surface
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
"""


def q_stats_moments(spark, sf_dir):
    """Variance/stddev/covariance/correlation via exact decimal moment
    sums (Σx, Σx², Σxy as decimals → one deterministic double formula).
    Built-in var_samp/corr use streaming algorithms whose float results
    are engine- and partition-order-dependent; the moment formulation
    is the portable (and shuffle-cheaper: one pass, no per-group state)
    equivalent."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    corr = cov / F.sqrt(var_x * var_y)
    return agg.select(
        "l_returnflag",
        "n",
        var_x.alias("var_qty"),
        cov.alias("cov_qty_price"),
        corr.alias("corr_qty_price"),
    )


SQL_STATS_MOMENTS = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_qty,
  (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS cov_qty_price,
  ((sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
    / sqrt(((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
         * ((syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))) AS corr_qty_price
FROM m
"""


def q_sql_q3_shipping(spark, sf_dir):
    """The SQL API surface: a TPC-H Q3-shaped query via spark.sql over
    registered views (customer ⋈ orders ⋈ lineitem, filtered both
    sides, aggregated, top-10). Exercises the full text-to-Catalyst
    path rather than the DataFrame builder."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate_s
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND l.l_shipdate > o.o_orderdate
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
        """
    )


SQL_SQL_Q3_SHIPPING = """
SELECT o.o_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate_s
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND l.l_shipdate > o.o_orderdate
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


def q_sql_q10_returns(spark, sf_dir):
    """TPC-H Q10-shaped via the SQL API: revenue lost to returned items
    per customer in a one-quarter window — 4-way join (customer ⋈
    orders ⋈ lineitem ⋈ nation) with the date-window predicate pushed
    to the orders scan and the decimal-from-source revenue discipline
    (never round(double)). Top-20 compiles to TakeOrderedAndProject,
    not a global sort."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
        """
    )


SQL_SQL_Q10_RETURNS = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


def q_sql_q12_latency(spark, sf_dir):
    """TPC-H Q12-shaped (adapted to this schema's columns): shipping-
    latency SLA accounting — lineitems shipped more than 30 days after
    their order date, bucketed by high/low order priority and line
    status. Interval arithmetic on the timestamp columns + conditional
    classification; pure integer outputs, immune to float drift."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'high' ELSE 'low' END AS prio_class,
               l.l_linestatus,
               COUNT(*) AS n_late_lines,
               COUNT(DISTINCT o.o_orderkey) AS n_late_orders
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1, 2
        """
    )


SQL_SQL_Q12_LATENCY = """
SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'high' ELSE 'low' END AS prio_class,
       l.l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_late_lines,
       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_late_orders
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY 1, 2
"""


def q_sql_q18_large_orders(spark, sf_dir):
    """TPC-H Q18-shaped (large-volume orders) via the SQL API — the
    agg-DOMINATED shape next to the join-dominated Q3/Q5/Q10/Q12: the
    driver is a full lineitem scan aggregated per order (map-side
    partial sums of decimal quantities around ONE exchange — the plan
    guard in tests/test_plans.py), whose HAVING filter survives only a
    few percent of orders; the orders/customer joins that follow are
    lookups against the filtered agg, and the top-100 compiles to
    TakeOrderedAndProject (per-partition heaps), never a global sort.
    Decimal-from-source quantity sums, double only at the output
    boundary."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS orderdate_s,
               o.o_totalprice,
               CAST(big.sum_qty AS DOUBLE) AS sum_qty
        FROM (SELECT l_orderkey,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              FROM lineitem
              GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200) big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
        """
    )


SQL_SQL_Q18_LARGE_ORDERS = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate_s,
       o.o_totalprice,
       CAST(big.sum_qty AS DOUBLE) AS sum_qty
FROM (SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


# Q14's one body both engines run verbatim: decimal-exact sums from the
# source column, each cast to DOUBLE before the one ratio division
# (decimal/decimal division scale-and-round rules differ between
# engines; double division of exact sums is IEEE-identical), rounded
# once at the output boundary
_SQL_Q14_BODY = """
SELECT round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN
               CAST(l.l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6)
         AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_sql_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14-shaped (promotion revenue share) via the SQL API — the
    conditional-aggregate-RATIO shape: one month of lineitem joined to
    part, with the promo share computed as a CASE-gated sum over the
    total sum in a single aggregation (no second scan, no self-join —
    the classic one-pass ratio idiom). At 100 TB the shipdate range
    predicate must reach the parquet scan (PushedFilters) so the join
    only sees the month; the part side is a broadcast lookup. Float
    discipline per _SQL_Q14_BODY: decimal-exact sums, ONE double
    division at the boundary."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q14_BODY)


SQL_SQL_Q14_PROMO_REVENUE = _SQL_Q14_BODY


_SQL_Q16_BODY = """
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 20
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_name LIKE '%7%')
GROUP BY p.p_brand, p.p_type
"""


def q_sql_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16-shaped (supplier count excluding complained-about
    suppliers) via the SQL API — the NOT IN subquery shape completing
    the subquery tier (Q21: EXISTS/NOT EXISTS → semi/anti; Q17:
    correlated scalar aggregates; this: uncorrelated NOT IN, which is
    NOT a plain anti join — SQL's three-valued logic means one NULL in
    the subquery result empties the output, so Catalyst must compile a
    NULL-AWARE anti join, a physically different operator the other
    shapes never exercise (plan guard:
    tests/test_plans.py::test_sql_q16_null_aware_anti_join). The
    distinct-supplier count per (brand, type) is the expand +
    two-phase partial agg; the excluded-supplier list is a filtered
    dimension scan the null-aware join broadcasts."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q16_BODY)


SQL_SQL_Q16_SUPPLIER_CNT = _SQL_Q16_BODY


# the one Q21 body both engines run verbatim: this testdata has no
# l_commitdate/l_receiptdate (TPC-H-ish, reference's LogEvent-era
# subset), so the "kept waiting" predicate maps to l_returnflag = 'R'
# — the correlated-subquery STRUCTURE (two subqueries on the same fact
# table, one EXISTS + one NOT EXISTS, correlated on orderkey with a
# suppkey inequality) is exactly Q21's
_SQL_Q21_BODY = """
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 25
"""


def q_sql_q21_blame_supplier(spark, sf_dir):
    """TPC-H Q21-shaped (suppliers who kept orders waiting) via the SQL
    API — the correlated MULTI-subquery shape next to the join-dominated
    Q3/Q5/Q10/Q12 and agg-dominated Q18 (r8 verdict item 4): two
    correlated subqueries against the same fact table, one EXISTS (the
    order involved other suppliers) and one NOT EXISTS (none of the
    others was at fault), both correlated on l_orderkey with a suppkey
    inequality. What matters at 100 TB is the REWRITE: Catalyst must
    decorrelate both into one LEFT SEMI and one LEFT ANTI hash join on
    l_orderkey — three shuffles of narrow (orderkey, suppkey[, flag])
    rows — never a per-row subplan re-executing a lineitem scan per
    outer tuple (the plan guard in
    tests/test_plans.py::test_sql_q21_semi_and_anti_join pins exactly
    that). Supplier and the filtered orders side are broadcast lookups;
    the top-25 compiles to TakeOrderedAndProject. The waiting predicate
    maps to l_returnflag='R' (this testdata carries no
    commit/receiptdate — see _SQL_Q21_BODY)."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q21_BODY)


SQL_SQL_Q21_BLAME_SUPPLIER = _SQL_Q21_BODY


# Q17 body shared verbatim by both engines. The reference predicate is
# l_quantity < 0.2 * avg(l_quantity per part); both sides multiplied by
# 5 * count make it INTEGER-EXACT (quantities are integral doubles):
# 5*q*cnt < sum(q) — no double avg whose partial-sum ORDER could differ
# across engines/partitions and flip a boundary row
_SQL_Q17_BODY = """
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) *
      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    < (SELECT SUM(CAST(l3.l_quantity AS BIGINT)) FROM lineitem l3
       WHERE l3.l_partkey = p.p_partkey)
GROUP BY p.p_brand
"""


def q_sql_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17-shaped (small-quantity-order revenue) via the SQL API —
    the correlated SCALAR-AGGREGATE subquery shape completing the
    subquery tier (Q21 covers EXISTS/NOT EXISTS → semi/anti; this is
    the per-outer-row aggregate lookup): each lineitem compares its
    quantity against 20% of the average quantity OF ITS PART, phrased
    as two correlated scalar subqueries over the fact table. At 100 TB
    what matters is the decorrelation: Catalyst rewrites each into a
    per-part partial-agg HashAggregate pair joined back on partkey
    (observed plan: the count join LeftOuter, the sum join carrying the
    integer predicate) — never a per-row subplan re-scanning lineitem
    per outer tuple (plan guard: tests/test_plans.py::test_sql_q17_
    scalar_subquery_decorrelates; Spark 4.1 keeps the two aggregates
    separate rather than merging them — two narrow column-pruned
    lineitem scans, a cost the guard documents). The predicate is
    integer-exact (see
    _SQL_Q17_BODY); revenue sums are decimal-from-source with the
    double cast only at the output boundary."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q17_BODY)


SQL_SQL_Q17_SMALL_QTY_REVENUE = _SQL_Q17_BODY


# Q2 body shared verbatim by both engines: this testdata has no
# partsupp, so lineitem is the part↔supplier bridge and the "supply
# cost" analog is l_extendedprice — the STRUCTURE is exactly Q2's:
# a correlated scalar MIN whose subquery is itself a 4-way join
# (lineitem⋈supplier⋈nation⋈region) correlated on p_partkey, equality
# against the outer 5-way join's price. MIN over doubles is exact (no
# arithmetic), so the float-parity rules allow direct comparison.
_SQL_Q2_BODY = """
SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
       l.l_extendedprice AS supply_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_type = 'ECONOMY'
  AND r.r_name = 'EUROPE'
  AND l.l_extendedprice = (
      SELECT MIN(l2.l_extendedprice)
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


def q_sql_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped (minimum-cost supplier per part within a region)
    via the SQL API — the correlated-scalar-MIN-ACROSS-A-JOIN shape
    that completes the decorrelation taxonomy next to Q17 (scalar agg
    over ONE table) and Q21 (EXISTS/NOT EXISTS): here the correlated
    scalar subquery contains its own multi-way join, so Catalyst must
    decorrelate the whole join SUBTREE into a per-partkey min aggregate
    joined back on (partkey, price) — never a per-outer-row re-plan of
    a 4-way join (plan guard:
    tests/test_plans.py::test_sql_q2_decorrelated_min_join). At 100 TB
    the rewrite is the difference between 2 lineitem scans and 10⁹ of
    them; dims broadcast, the top-100 compiles to
    TakeOrderedAndProject. See _SQL_Q2_BODY for the partsupp →
    lineitem adaptation."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q2_BODY)


SQL_SQL_Q2_MIN_COST_SUPPLIER = _SQL_Q2_BODY


# Q20 body shared verbatim: availqty > 0.5 * shipped-qty maps to
# "supplier ships > 5% of a prefix-named part's total volume"
# (integer-exact: 20·sum_sp > sum_total over integral quantities).
# The nesting is exactly Q20's: IN (grouped fact subquery whose HAVING
# carries a correlated scalar agg, itself filtered by IN (dimension
# prefix scan)).
_SQL_Q20_BODY = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'large%')
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING 20 * SUM(CAST(l.l_quantity AS BIGINT)) >
             (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
"""


def q_sql_q20_excess_share_supplier(spark, sf_dir):
    """TPC-H Q20-shaped (suppliers holding an outsized share of a named
    part family) via the SQL API — the NESTED IN/semi CHAIN shape: an
    IN whose subquery is a grouped aggregate over the fact table, which
    itself filters by an IN over a dimension prefix scan AND carries a
    correlated scalar aggregate in its HAVING. Catalyst must compile
    the chain into stacked LEFT SEMI hash joins (supplier ⋉ grouped
    lineitem ⋉ part) with the HAVING's correlated sum decorrelated into
    a per-partkey aggregate joined back — no nested-loop subplans (plan
    guard: tests/test_plans.py::test_sql_q20_semi_chain). The share
    predicate is integer-exact (see _SQL_Q20_BODY); the part prefix
    scan broadcasts, lineitem shuffles once per grouping key."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q20_BODY)


SQL_SQL_Q20_EXCESS_SHARE_SUPPLIER = _SQL_Q20_BODY


# Q22 body shared verbatim: c_phone's country code maps to the last
# digit of c_name (substring cohort key), "no orders at all" maps to
# "no orders since 1999-01-01" (every sf0.01 customer has SOME order —
# the anti join on bare existence would be vacuously empty; the round-10
# review moved the cutoff from 1998-01-01, which was itself vacuous at
# sf0.001 — the gate carries signal at BOTH scales now: 1 row at
# sf0.001, 5 cohort rows at sf0.01), and the avg comparison is
# decimal-exact via the multiply-through form bal·cnt > sum (AVG of
# DECIMAL returns DOUBLE in DuckDB but DECIMAL in Spark — dividing
# would diverge the engines at boundary rows).
_SQL_Q22_BODY = """
SELECT right(c.c_name, 1) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE right(c.c_name, 1) IN ('1','3','5','7','9')
  AND CAST(c.c_acctbal AS DECIMAL(18,2)) *
      (SELECT COUNT(*) FROM customer c2
       WHERE CAST(c2.c_acctbal AS DECIMAL(18,2)) > 0
         AND right(c2.c_name, 1) IN ('1','3','5','7','9'))
    > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) FROM customer c2
       WHERE CAST(c2.c_acctbal AS DECIMAL(18,2)) > 0
         AND right(c2.c_name, 1) IN ('1','3','5','7','9'))
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY right(c.c_name, 1)
"""


def q_sql_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22-shaped (well-funded customers gone dormant) via the
    SQL API — the NOT EXISTS + UNCORRELATED-scalar-avg cohort shape
    closing the subquery taxonomy: a substring cohort key, two
    uncorrelated scalar aggregates over the cohort (executed ONCE and
    broadcast as literals — unlike Q17/Q2's per-row correlated
    lookups), and an anti join against a date-filtered fact subset.
    Catalyst compiles the NOT EXISTS to a LEFT ANTI hash join on
    custkey with the date predicate pushed INTO the orders scan (plan
    guard: tests/test_plans.py::test_sql_q22_anti_join_scalar_cohort).
    Comparisons are decimal-exact via multiply-through (see
    _SQL_Q22_BODY)."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q22_BODY)


SQL_SQL_Q22_DORMANT_CUSTOMERS = _SQL_Q22_BODY


# Q13 body shared verbatim: the priority exclusion lives INSIDE the
# outer-join condition (the Q13 trick — a WHERE would turn the outer
# join inner and drop order-less customers from the histogram). No
# ORDER BY: the histogram is a set, and a global sort of it would be
# the one scale-hostile operator in an otherwise two-agg plan.
_SQL_Q13_BODY = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey AS ck, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
"""


def q_sql_q13_order_distribution(spark, sf_dir):
    """TPC-H Q13-shaped (customer order-count distribution) via the SQL
    API — the OUTER-JOIN-AGGREGATION histogram shape: customers LEFT
    OUTER joined to a predicate-filtered orders side (the filter is
    part of the JOIN CONDITION so zero-order customers survive with
    count 0), counted per customer, then re-aggregated into the
    distribution. Two chained aggregations over one join — the
    double-shuffle pattern every engagement/frequency histogram uses;
    the second aggregate's input is already tiny (one row per
    customer). Plan guard pins the LeftOuter join and the absence of
    any global sort."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q13_BODY)


SQL_SQL_Q13_ORDER_DISTRIBUTION = _SQL_Q13_BODY


# Q15 body shared verbatim: the revenue view is decimal-from-source
# (the float discipline), so the MAX-equality against it is EXACT in
# both engines — the one comparison class where "= (SELECT MAX(...))"
# is engine-safe; the double cast happens only at the output boundary.
_SQL_Q15_BODY = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_sql_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15-shaped (top supplier by quarterly revenue) via the SQL
    API — the DERIVED-VIEW + scalar-MAX-equality shape: a grouped
    revenue view consumed twice, once as the join input and once under
    an uncorrelated MAX scalar subquery, keeping ALL ties (the original
    query's view semantics, which a LIMIT 1 would break). The
    comparison is exact because the view sums decimals from source
    columns (see _SQL_Q15_BODY); Catalyst evaluates the scalar subquery
    once and broadcasts the literal into the filter. Plan guard pins
    the one-shot Subquery and the pushed shipdate range."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q15_BODY)


SQL_SQL_Q15_TOP_SUPPLIER = _SQL_Q15_BODY


# Q19 body shared verbatim: three brand/size/quantity disjuncts spanning
# BOTH join sides — the OR-predicate pushdown stress shape.
_SQL_Q19_BODY = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
         * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20 AND l.l_returnflag = 'N')
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 35 AND l.l_returnflag = 'R')
   OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
"""


def q_sql_q19_disjunct_revenue(spark, sf_dir):
    """TPC-H Q19-shaped (discounted revenue under brand/size/quantity
    disjuncts) via the SQL API — the DISJUNCTIVE-predicate shape: three
    OR'd conjunctions each constraining BOTH join sides. What matters
    at 100 TB is per-side predicate extraction: Catalyst must derive
    the single-table implications of the OR (the union of each side's
    disjunct ranges) and push them into BOTH scans, so the join sees
    pre-filtered inputs instead of evaluating the full disjunction on
    the cross of full tables (plan guard:
    tests/test_plans.py::test_sql_q19_disjunct_pushdown). Revenue is
    decimal-from-source with the double cast at the boundary."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q19_BODY)


SQL_SQL_Q19_DISJUNCT_REVENUE = _SQL_Q19_BODY


# Q7 body shared verbatim: the two-nation volume-shipping shape — a
# 6-way join whose nation filter is a DISJUNCTION OF PAIRS (either
# direction of trade between the two named nations), then per-year
# revenue. Revenue is decimal-from-source; year() is integer in both
# engines.
_SQL_Q7_BODY = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(3,2))) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q_sql_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7-shaped (volume shipping between two nations) via the
    SQL API — the MULTI-DIMENSION join shape of the tier: a 6-way join
    (two roles of the same nation dimension) whose selective predicate
    is a DISJUNCTION OF CONJUNCTION PAIRS over BOTH dimension roles
    (either trade direction), then a 3-key per-year rollup. What
    matters at 100 TB: Catalyst pushes each role's disjunct union
    (n_name IN (NATION_3, NATION_19)) into its own broadcast nation
    scan, the shipdate range reaches the lineitem scan, and the fact
    table flows through broadcast hash joins without ever shuffling on
    a dimension key (plan guard:
    tests/test_plans.py::test_sql_q7_dim_pushdown_no_fact_shuffle).
    Revenue is decimal-from-source with the double cast at the
    boundary; year() is integer in both engines."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q7_BODY)


SQL_SQL_Q7_NATION_VOLUME = _SQL_Q7_BODY


# Q9 body shared verbatim: no partsupp in this testdata, so the supply
# cost maps to p_retailprice (part-level, decimal-from-source). NOTE
# the CAST(l_quantity AS BIGINT): quantities are integral doubles by
# generator contract, for which the cast is exact in both engines; on
# FRACTIONAL doubles Spark truncates while DuckDB rounds half-even —
# the same contract Q17/Q20 already rely on (a corpus with fractional
# quantities would need a shared explicit floor()/round() first). The
# STRUCTURE is Q9's: profit = revenue − cost·qty summed inside the
# aggregate (decimal SUBTRACTION, the one arithmetic class the other
# revenue shapes never exercise), over a 5-way join, rolled up by
# supplier nation × order year, part family selected by infix LIKE.
_SQL_Q9_BODY = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
              - CAST(p.p_retailprice AS DECIMAL(18,2))
                * CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS profit,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


def q_sql_q9_product_profit(spark, sf_dir):
    """TPC-H Q9-shaped (product-type profit by nation and year) via the
    SQL API — the PROFIT-EXPRESSION shape: the aggregate sums a decimal
    SUBTRACTION of two products (revenue − cost·qty), all factors cast
    from source columns so the difference is exact in both engines (a
    double subtraction of near-equal products is the classic
    cancellation trap the float discipline exists for). Join shape: the
    infix-LIKE part filter cannot push to parquet as a range (it
    evaluates post-scan — the honest cost of %substring% selection) but
    DOES prune the join via the broadcast part side; supplier/nation/
    orders broadcast, the single exchange is the nation×year rollup
    (plan guard: tests/test_plans.py::test_sql_q9_profit_shape)."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q9_BODY)


SQL_SQL_Q9_PRODUCT_PROFIT = _SQL_Q9_BODY


_SQL_Q4_BODY = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
"""


def q_sql_q4_priority_count(spark, sf_dir):
    """TPC-H Q4-shaped (order-priority checking) via the SQL API — the
    EXISTS-correlated-on-an-EXPRESSION shape the subquery tier still
    lacked: Q21's EXISTS correlates on a plain column equality, while
    Q4's inner predicate compares an inner column against an
    ARITHMETIC of the outer row (l_shipdate > o_orderdate + 60 days —
    this testdata carries no commit/receiptdate, so the spec's
    "committed late" maps to "shipped ≥60 days after ordering", the
    same late-fulfilment semantics). Catalyst must still decorrelate
    to ONE left semi hash join on orderkey with the date comparison as
    the join condition's non-equi residual — never a per-outer-row
    lineitem scan. At 100 TB the quarter predicate on orders pushes to
    the scan and the semi join shuffles only (orderkey, shipdate) vs
    (orderkey, orderdate) narrow rows; the 5-row priority rollup is a
    trivial final agg. Plan guard:
    tests/test_plans.py::test_sql_q4_semi_join_with_residual."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q4_BODY)


SQL_SQL_Q4_PRIORITY_COUNT = _SQL_Q4_BODY


_SQL_Q6_BODY = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_sql_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped (forecasting revenue change) via the SQL API —
    the pure SCAN-FILTER-AGGREGATE shape: no join at all, one pass over
    the fact table with three conjunctive predicates and a single
    decimal-exact sum. This is the query whose entire 100 TB cost is
    the scan, so the plan is the pushdown showcase: all three
    predicates (shipdate range, discount band, quantity cap) must reach
    the parquet reader as PushedFilters, the scan must read exactly the
    four referenced columns (ReadSchema), and the aggregate is a
    two-phase HashAggregate whose shuffle carries ONE partial row per
    task. The discount literals compare against the same stored doubles
    in both engines, so the filter set is engine-exact; the summed term
    is decimal(18,2)×decimal(3,2) — exact, one double cast at the
    boundary. Plan guard:
    tests/test_plans.py::test_sql_q6_full_pushdown_no_join."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q6_BODY)


SQL_SQL_Q6_FORECAST_REVENUE = _SQL_Q6_BODY


_SQL_Q8_BODY = """
SELECT year(o.o_orderdate) AS o_year,
       round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE),
             6) AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n1.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'STANDARD'
  AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY year(o.o_orderdate)
"""


def q_sql_q8_market_share(spark, sf_dir):
    """TPC-H Q8-shaped (national market share) via the SQL API — the
    WIDEST join shape in the tier: eight relations, with nation joined
    TWICE under different roles (customer's nation → region filter;
    supplier's nation → the market-share numerator), the pattern that
    exercises Catalyst's alias-scoped column resolution and join
    reordering across a star with two dimension arms. The share is the
    Q14 one-pass conditional-ratio idiom (CASE-gated decimal sum over
    total decimal sum, ONE double division then round) — never a
    self-join of two filtered aggregates. At 100 TB everything except
    lineitem⋈orders broadcasts: region/nation/part/supplier/customer
    are bounded dims, so the plan has exactly one shuffle-worthy join
    (fact to orders on orderkey) plus the 2-row year rollup. Plan
    guard: tests/test_plans.py::test_sql_q8_broadcast_star."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q8_BODY)


SQL_SQL_Q8_MARKET_SHARE = _SQL_Q8_BODY


# Q11 adapted: this testdata has no partsupp table, so "stock value"
# maps to each part's lineitem value (extendedprice × quantity) via
# suppliers of one REGION (a nation is too sparse at sf0.001 — zero
# suppliers), and the spec's fixed FRACTION threshold (which cannot
# hold signal across scale factors: any constant is too high at one SF
# and too low at another) maps to "above 2× the average part value",
# phrased division-free (value·n > 2·total) so both engines compare
# exact decimals — the HAVING-above-scalar-subquery STRUCTURE is
# exactly Q11's.
_SQL_Q11_BODY = """
WITH val AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(l.l_quantity AS BIGINT)) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
FROM val
WHERE value * (SELECT COUNT(*) FROM val)
      > (SELECT SUM(value) FROM val) * 2
"""


def q_sql_q11_important_parts(spark, sf_dir):
    """TPC-H Q11-shaped (important stock identification) via the SQL
    API — the GROUP-THEN-FILTER-BY-GLOBAL-SCALAR shape that closes the
    22-query taxonomy: an aggregate CTE consumed THREE times (group
    rows, a COUNT(*) scalar, a SUM scalar), where the filter compares
    each group's aggregate against a scalar aggregate OVER THE SAME
    derived relation. What matters at 100 TB is that Catalyst evaluates
    the two uncorrelated scalar subqueries ONCE each (driver-side
    scalar broadcast, never per-row) and — because all three consumers
    share one CTE — the expensive fact-side aggregation is planned
    once and reused, not recomputed per consumer. The threshold is
    division-free exact-decimal arithmetic (see _SQL_Q11_BODY note) so
    no double rounding can flip a boundary part between engines. Plan
    guard: tests/test_plans.py::test_sql_q11_scalar_subquery_once."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_Q11_BODY)


SQL_SQL_Q11_IMPORTANT_PARTS = _SQL_Q11_BODY


def q_approx_distinct(spark, sf_dir):
    """Approximate aggregates (HLL count-distinct). Sketch estimates
    differ across engines by design, so the raw estimate can't be
    hash-compared — instead the entry emits the EXACT distinct count
    alongside a bounded-relative-error FLAG on each engine's own
    sketch: |approx − exact| / exact ≤ 0.15 (3× the worst observed
    error — Spark's default rsd=0.05 HLL++ measured ≤0.057 at
    sf0.001–0.1, DuckDB ≤0.014). The oracle computes the same flag over
    DuckDB's own sketch, so BOTH engines' sketch machinery is exercised
    and value-hashed (exact column + flag), closing the one
    `no_oracle` row of rounds 1–6."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey").alias("__approx"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("__approx") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.15
            ).alias("approx_in_tol"),
        )
    )


SQL_APPROX_DISTINCT = """
SELECT o_orderstatus,
  count(DISTINCT o_custkey) AS exact_customers,
  CAST(count(*) AS BIGINT) AS n_orders,
  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
    / CAST(count(DISTINCT o_custkey) AS DOUBLE) <= 0.15 AS approx_in_tol
FROM orders GROUP BY o_orderstatus
"""


def q_approx_distinct_merge(spark, sf_dir):
    """Sketch MERGE — the shape a 100 TB rollup actually uses: HLL
    sketches are built once per fine-grained group
    (status × priority), stored, and UNIONED to coarser grains without
    touching raw data (Spark DataSketches hll_sketch_agg →
    hll_union_agg → hll_sketch_estimate). The estimate from the merged
    sketches must agree with the exact per-status distinct count within
    ≤0.15 relative error (measured ≤0.0133); the oracle checks the
    exact value plus DuckDB's own direct-sketch flag over the same
    quantity. Mergeability is the entire point of sketches at scale —
    this entry pins that code path, not just single-shot estimation
    (q_approx_distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    sk = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = sk.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__approx"),
        F.count("*").alias("n_subgroups"),
    )
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return merged.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        "n_subgroups",
        (
            F.abs(F.col("__approx") - F.col("exact_customers"))
            / F.col("exact_customers")
            <= 0.15
        ).alias("merged_in_tol"),
    )


SQL_APPROX_DISTINCT_MERGE = """
SELECT o_orderstatus,
  count(DISTINCT o_custkey) AS exact_customers,
  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_subgroups,
  abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
    / CAST(count(DISTINCT o_custkey) AS DOUBLE) <= 0.15 AS merged_in_tol
FROM orders GROUP BY o_orderstatus
"""


def q_approx_quantiles(spark, sf_dir):
    """Approximate percentile sketches (Spark GK/percentile_approx vs
    DuckDB t-digest/approx_quantile) under the same exact-plus-
    tolerance-flag oracle treatment as q_approx_distinct: the EXACT
    interpolated percentiles (percentile_cont semantics, identical in
    both engines — verified equal to the cent at all three SFs) are
    value-hashed, and each engine's own sketch is checked against its
    exact value with a ≤0.05 relative-error flag (5× the worst observed
    sketch error, ≤0.0096). Quantile sketches are THE 100 TB
    distribution-profiling primitive — exact percentiles need a full
    sort per group, sketches one pass + tiny merges."""
    orders = load_table(spark, sf_dir, "orders")
    c = F.col("o_totalprice").cast("double")
    agg = orders.groupBy("o_orderstatus").agg(
        F.percentile(c, 0.5).alias("p50_exact"),
        F.percentile(c, 0.9).alias("p90_exact"),
        F.percentile_approx(c, 0.5, 10000).alias("__a50"),
        F.percentile_approx(c, 0.9, 10000).alias("__a90"),
    )
    tol = lambda a, e: (F.abs(F.col(a) - F.col(e)) / F.col(e) <= 0.05)  # noqa: E731
    return agg.select(
        "o_orderstatus",
        "p50_exact",
        "p90_exact",
        tol("__a50", "p50_exact").alias("p50_in_tol"),
        tol("__a90", "p90_exact").alias("p90_in_tol"),
    )


SQL_APPROX_QUANTILES = """
SELECT o_orderstatus,
  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50_exact,
  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90_exact,
  abs(approx_quantile(CAST(o_totalprice AS DOUBLE), 0.5)
      - quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5))
    / quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) <= 0.05 AS p50_in_tol,
  abs(approx_quantile(CAST(o_totalprice AS DOUBLE), 0.9)
      - quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9))
    / quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) <= 0.05 AS p90_in_tol
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Text analysis (north-star LLM-pipeline surface)
# --------------------------------------------------------------------------

_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def q_text_stats(spark, sf_dir):
    return text_stats(load_table(spark, sf_dir, "documents"))


SQL_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents)
SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct_tokens,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS avg_token_len
FROM t
"""


def q_text_quality(spark, sf_dir):
    return text_quality(load_table(spark, sf_dir, "documents"))


_SW = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

SQL_TEXT_QUALITY = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
s AS (SELECT doc_id, len(toks) AS n_tokens,
        CAST(len(list_filter(toks, x -> list_contains({_SW}, x))) AS DOUBLE) / len(toks) AS stopword_ratio,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio
      FROM t)
SELECT doc_id, n_tokens, stopword_ratio, type_token_ratio,
  stopword_ratio * 0.5 + type_token_ratio * 0.5 AS quality_score
FROM s
"""


def q_lang_id(spark, sf_dir):
    return lang_id_heuristic(load_table(spark, sf_dir, "documents"))


SQL_LANG_ID = f"""
WITH t AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents)
SELECT doc_id, lang AS lang_label,
  CASE WHEN list_contains(toks, 'the') AND list_contains(toks, 'a') THEN 'en'
       WHEN list_contains(toks, 'spark') AND list_contains(toks, 'stream') THEN 'code'
       ELSE 'unk' END AS lang_pred
FROM t
"""


def q_doc_fingerprint(spark, sf_dir):
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


SQL_DOC_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
       length(text) AS n_chars
FROM documents
"""


def q_dedup_exact_docs(spark, sf_dir):
    """Exact content dedup at corpus scale: group by fingerprint, keep
    min doc_id, count members (hash-groupBy, one shuffle on the hash)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = doc_fingerprint(docs)
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_members")
    )


SQL_DEDUP_EXACT_DOCS = r"""
SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS keep_doc_id, count(*) AS n_members
FROM documents GROUP BY 1
"""


def q_minhash_signature(spark, sf_dir):
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


_MH_AGGS = ",\n  ".join(f"min(md5('{i}:' || tok)) AS mh{i}" for i in range(8))

SQL_MINHASH_SIGNATURE = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents)
SELECT doc_id, {_MH_AGGS}
FROM w GROUP BY doc_id
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


SQL_MINHASH_LSH_PAIRS = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents),
sig AS (SELECT doc_id, {_MH_AGGS} FROM w GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bh FROM sig UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bh FROM sig),
capped AS (
  SELECT doc_id, band, bh
  FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS n FROM bands)
  WHERE n <= 64)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM capped a JOIN capped b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


def q_shingle_jaccard(spark, sf_dir):
    return shingle_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.0)


SQL_SHINGLE_JACCARD = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                        i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS sh
       FROM t),
-- mirror the engine's max_df=64 hot-shingle cap: the Jaccard universe
-- is the discriminative (df <= 64) shingles only
sh AS (SELECT * FROM (
         SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
       WHERE df <= 64),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, n_shared,
  CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) AS jaccard
FROM shared JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
"""


def q_simhash(spark, sf_dir):
    return simhash(load_table(spark, sf_dir, "documents"))


SQL_SIMHASH = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents),
h AS (SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h FROM w),
bits AS (SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS tot
         FROM h, (SELECT unnest(range(0, 60)) AS j) AS js
         GROUP BY doc_id, j)
SELECT doc_id,
  CAST(SUM(CASE WHEN tot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF: the canonical text-pipeline weighting. tf per (doc,term)
    → document frequency per term → idf = ln(N/df) → top-3 terms per
    doc. Two narrow aggregations + one equi-join on term — a plain
    shuffle join (round 9, the tfidf_cosine_pairs hardening applied
    here too: the df side's cardinality is the corpus VOCABULARY,
    unbounded at 100 TB, so it is never broadcast; the 1-row count
    frame stays broadcast) — and the top-3 window ranks on round(w, 6)
    so a 1-ulp libm-ln divergence can't flip membership across
    engines."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import tokenize

    terms = docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size as a broadcast 1-row cross join, not a driver-side
    # count(): .count() would be a second full scan scheduled eagerly;
    # this stays one lazy plan
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tfidf"), 6).desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "rnk", F.round("tfidf", 6).alias("tfidf"))
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH terms AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tf.term,
         tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, rnk, round(tfidf, 6) AS tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY round(tfidf, 6) DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 3
"""


def q_corpus_top_terms(spark, sf_dir):
    """Corpus-level term frequencies: top-20 tokens (the vocabulary
    profile step of a data pipeline)."""
    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import tokenize

    return (
        docs.select(F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(20)
    )


SQL_CORPUS_TOP_TERMS = f"""
SELECT term, COUNT(*) AS n
FROM (SELECT unnest({_TOK}) AS term FROM documents)
GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


def q_top_terms_sketched(spark, sf_dir):
    """Top-25 corpus terms via bounded-memory Misra-Gries partition
    summaries + exact candidate recount — same ANSWER as the exact
    groupBy (the oracle is the plain exact top-25), different SHUFFLE:
    candidate generation crosses the wire with ≤ k rows per partition
    regardless of vocabulary size, where corpus_top_terms' exact
    groupBy ships one row per distinct term per map partition. At
    100 TB the long tail (billions of singleton junk tokens) makes
    that difference the whole cost; the MG form's recount shuffle is
    candidate-only. Exactness is CERTIFIED from the run's own error
    ledger (rank-25 exact count > sum of per-partition decrements) and
    the operator raises rather than return uncertifiable counts — see
    functions/sketches.py for the bound. Certificate collect is two
    scalars + 25 rows: bounded by construction."""
    from .functions.sketches import top_terms_sketched
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokenize("text")).alias("term"))
    return top_terms_sketched(terms, n=25, k=2048)


SQL_TOP_TERMS_SKETCHED = f"""
SELECT term, COUNT(*) AS n
FROM (SELECT unnest({_TOK}) AS term FROM documents)
GROUP BY term ORDER BY n DESC, term LIMIT 25
"""


def q_subquery_above_avg(spark, sf_dir):
    """Correlated-style scalar subquery: parts priced above their
    type's average (decomposed as agg + broadcast join — the plan
    Catalyst produces for the correlated form anyway)."""
    part = load_table(spark, sf_dir, "part")
    avg_by_type = part.groupBy("p_type").agg(davg("p_retailprice").alias("avg_price"))
    return (
        part.join(F.broadcast(avg_by_type), "p_type")
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select("p_partkey", "p_type", "p_retailprice", "avg_price")
    )


SQL_SUBQUERY_ABOVE_AVG = """
WITH a AS (SELECT p_type,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(p_retailprice) AS avg_price
           FROM part GROUP BY p_type)
SELECT p_partkey, part.p_type, p_retailprice, avg_price
FROM part JOIN a ON part.p_type = a.p_type
WHERE p_retailprice > avg_price
"""


def q_regexp_extract(spark, sf_dir):
    """Regexp surface: capture-group extraction + boolean match."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"(\d+)", 1).alias("first_num"),
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
    )


SQL_REGEXP_EXTRACT = r"""
SELECT p_partkey,
  coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
  coalesce(regexp_extract(p_name, '(\d+)', 1), '') AS first_num,
  regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
"""


def q_agg_filtered(spark, sf_dir):
    """Conditional aggregation (FILTER / count_if shapes)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count(F.when(F.col("l_tax") == 0.0, 1)).alias("n_taxfree"),
        dsum("l_quantity").alias("sum_qty"),
        F.max(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))).alias(
            "max_discounted_price"
        ),
    )


SQL_AGG_FILTERED = """
SELECT l_returnflag,
  COUNT(*) FILTER (l_discount > 0.05) AS n_discounted,
  COUNT(*) FILTER (l_tax = 0.0) AS n_taxfree,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  MAX(l_extendedprice) FILTER (l_discount > 0.05) AS max_discounted_price
FROM lineitem GROUP BY l_returnflag
"""


def q_date_arith(spark, sf_dir):
    """Date arithmetic: add_months, last_day, quarter, week truncation."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("week_start"),
    )


SQL_DATE_ARITH = """
SELECT o_orderkey,
  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
FROM orders
"""


def q_linear_trend(spark, sf_dir):
    """Per-group OLS trend line: value regressed on event DAY for each
    event_type via the SQL-standard REGR_* aggregates — the drift/
    trend detector a telemetry pipeline runs per metric (is this
    counter creeping up?). One hash aggregate, map-side partial
    co-moments, O(#groups) output: the cheapest possible distributed
    regression — no iteration, no driver math.

    Exactness: the x axis is an INTEGER day index (unix_millis div
    86_400_000 — integer division end-to-end, the session_stats
    timestamp-math discipline) so both engines regress on identical
    abscissae; slope/intercept/r2 are co-moment ratios whose only
    cross-engine skew is partial-sum ordering, absorbed by round(.,6)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_millis(ts) div 86400000")
    return (
        ev.select("event_type", day.alias("day"), "value")
        .groupBy("event_type")
        .agg(
            F.regr_count("value", "day").alias("n_pts"),
            F.round(F.regr_slope("value", "day"), 6).alias("slope"),
            F.round(F.regr_intercept("value", "day"), 6).alias("intercept"),
            F.round(F.regr_r2("value", "day"), 6).alias("r2"),
            F.round(F.regr_avgx("value", "day"), 6).alias("avg_day"),
            F.round(F.regr_avgy("value", "day"), 6).alias("avg_value"),
        )
    )


SQL_LINEAR_TREND = """
SELECT event_type,
       regr_count(value, day) AS n_pts,
       round(regr_slope(value, day), 6) AS slope,
       round(regr_intercept(value, day), 6) AS intercept,
       round(regr_r2(value, day), 6) AS r2,
       round(regr_avgx(value, day), 6) AS avg_day,
       round(regr_avgy(value, day), 6) AS avg_value
FROM (SELECT event_type, epoch_ms(ts) // 86400000 AS day, value FROM events)
GROUP BY event_type
"""


def q_bit_aggs(spark, sf_dir):
    """Bitwise aggregates over int columns."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.bit_and("p_size").alias("size_and"),
        F.bit_or("p_size").alias("size_or"),
        F.bit_xor("p_size").alias("size_xor"),
        F.count("*").alias("n_parts"),
    )


SQL_BIT_AGGS = """
SELECT p_brand,
  bit_and(p_size) AS size_and, bit_or(p_size) AS size_or,
  bit_xor(p_size) AS size_xor, COUNT(*) AS n_parts
FROM part GROUP BY p_brand
"""


def _sql_hybrid_pct(
    inner: str, keys: list, val: str, outs: dict
) -> str:
    """DuckDB SQL for interpolated percentiles BIT-EQUAL to Spark's
    built-in Percentile (round 18). DuckDB's quantile_cont is the pure
    two-sided weighting with NO same-value short-circuit — on
    duplicated straddling values it lands an ulp away from Spark's
    histogram-based built-in (the r17 falsifier: quantile_cont gives
    −3.0000000000000004 where Spark returns −3.0). Oracles for entries
    whose floats derive from percentiles therefore spell out the
    hybrid rule Spark (and operators/relational.py's kernels, post-
    r17-fix) actually evaluate: sort the group's values, take v1/v2 at
    ranks ⌊pos⌋+1/⌈pos⌉+1 for pos=(n−1)·p, return v1 untouched when
    v1 == v2, else (⌈pos⌉−pos)·v1 + (pos−⌊pos⌋)·v2 — the identical
    IEEE expression, so strict_float gating becomes possible.
    ``inner`` must pre-filter NULL values (list() would keep them and
    shift every rank); perf is irrelevant — this is oracle-side
    DuckDB at gate SFs.

    Two DuckDB-vs-Spark type traps this generator defuses (found by
    the first strict run, round 18): (a) a literal like 0.05 parses as
    DECIMAL in DuckDB, making pos EXACT where Spark's is the double
    product — different interpolation weights (0.35 vs
    0.3499999999999943 at n=2014) — so p is cast to DOUBLE before the
    multiply; (b) a DECIMAL value column (o_totalprice) would
    interpolate in exact decimal arithmetic where Spark's Percentile
    converts values to double FIRST — so the list is built over
    CAST(val AS DOUBLE) (monotone and injective at these scales:
    decimal(15,2) spacing 0.01 dwarfs the double ulp)."""
    kcols = ", ".join(keys)
    kpre = (kcols + ", ") if keys else ""
    gb = f" GROUP BY {kcols}" if keys else ""
    picks = ", ".join(
        f"xs[CAST(floor(pos_{o}) AS BIGINT)+1] AS v1_{o}, "
        f"xs[CAST(ceil(pos_{o}) AS BIGINT)+1] AS v2_{o}, pos_{o}"
        for o in outs
    )
    poses = ", ".join(
        f"(n-1) * CAST({p!r} AS DOUBLE) AS pos_{o}" for o, p in outs.items()
    )
    cases = ", ".join(
        f"CASE WHEN v1_{o} = v2_{o} THEN v1_{o} "
        f"ELSE (ceil(pos_{o}) - pos_{o}) * v1_{o} "
        f"+ (pos_{o} - floor(pos_{o})) * v2_{o} END AS {o}"
        for o in outs
    )
    return (
        f"SELECT {kpre}{cases} FROM ("
        f"SELECT {kpre}{picks} FROM ("
        f"SELECT {kpre}xs, {poses} FROM ("
        f"SELECT {kpre}list_sort(list(CAST({val} AS DOUBLE))) AS xs, "
        f"count(*) AS n FROM {inner}{gb})))"
    )


def q_agg_percentiles(spark, sf_dir):
    """Exact percentiles via Spark's built-in Percentile. At 100 TB
    you'd use approx_percentile sketches — or, when the value domain
    has bounded distinct cardinality, operators/relational.py::
    grouped_exact_percentile, which computes the SAME bit-exact
    interpolated percentile through a value histogram instead of the
    built-in's per-group value buffer (mad_outliers runs on that
    kernel); the built-in exact form here is the correctness baseline.
    Oracle: the hybrid-interpolation SQL (_sql_hybrid_pct), NOT
    quantile_cont — DuckDB's quantile_cont skips the same-value
    short-circuit and lands an ulp off on duplicated straddles, which
    this entry's strict_float gate would (correctly) fail."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("med_total"),
        F.percentile("o_totalprice", 0.9).alias("p90_total"),
        F.count("*").alias("n_orders"),
    )


SQL_AGG_PERCENTILES = f"""
WITH pct AS ({_sql_hybrid_pct(
    "(SELECT o_orderstatus, o_totalprice FROM orders"
    " WHERE o_totalprice IS NOT NULL) s",
    ["o_orderstatus"],
    "o_totalprice",
    {"med_total": 0.5, "p90_total": 0.9},
)}),
cnt AS (SELECT o_orderstatus, COUNT(*) AS n_orders FROM orders GROUP BY 1)
SELECT o_orderstatus, med_total, p90_total, n_orders
FROM pct JOIN cnt USING (o_orderstatus)
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: connected components (iterative min-label
    propagation) over shingle-candidate pairs; cluster id = min doc id
    of the component. The oracle expresses the same closure as a
    recursive CTE."""
    from .functions.dedup_approx import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(docs, threshold=0.0).select("id_a", "id_b")
    return dedup_clusters(pairs)


SQL_DEDUP_CLUSTERS = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                        i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS sh
       FROM t),
-- mirror the engine's max_df=64 hot-shingle cap (see SQL_SHINGLE_JACCARD)
sh AS (SELECT * FROM (
         SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
       WHERE df <= 64),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  WITH RECURSIVE r(node, lab) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.lab FROM r JOIN edges e ON e.src = r.node)
  SELECT * FROM r)
SELECT node AS doc_id, MIN(lab) AS cluster_id
FROM reach GROUP BY node
"""


def q_dedup_cluster_profile(spark, sf_dir):
    """Dedup-operations TELEMETRY: the cluster-size histogram every
    dedup sweep reports before committing deletions — how much
    duplicate mass exists and in what shape (many pairs vs a few huge
    templates decide salvage-one-per-cluster vs drop-the-template).
    Composes the connected-components output (dedup_clusters) into
    (cluster_size, n_clusters, n_docs) buckets, with the un-clustered
    remainder counted as size-1 clusters via a LEFT ANTI join (emitted
    only when non-empty, identically in both engines). All partial-agg
    groupBys over the narrow (doc, cluster) frame; n_docs =
    size × count is integer-exact."""
    from .functions.dedup_approx import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(docs, threshold=0.0).select("id_a", "id_b")
    cl = dedup_clusters(pairs)
    sizes = cl.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(F.count("*").alias("n_clusters")).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
    )
    singles = (
        docs.select("doc_id")
        .join(cl, "doc_id", "left_anti")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 0)
        .select(
            F.lit(1).cast("bigint").alias("cluster_size"),
            F.col("n").alias("n_clusters"),
            F.col("n").alias("n_docs"),
        )
    )
    return hist.unionByName(singles)


SQL_DEDUP_CLUSTER_PROFILE = (
    SQL_DEDUP_CLUSTERS.replace(
        "SELECT node AS doc_id, MIN(lab) AS cluster_id\nFROM reach GROUP BY node",
        """, cl AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
         FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cl GROUP BY cluster_id),
hist AS (SELECT cluster_size, COUNT(*) AS n_clusters,
                cluster_size * COUNT(*) AS n_docs
         FROM sizes GROUP BY cluster_size),
singles AS (SELECT CAST(1 AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters,
                   COUNT(*) AS n_docs
            FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM cl)
            HAVING COUNT(*) > 0)
SELECT * FROM hist UNION ALL SELECT * FROM singles""",
    )
)


def q_session_window_agg(spark, sf_dir):
    """Built-in session_window aggregation (30-min gap) — the native
    form of session_stats' manual lag/cumsum sessionization; in
    streaming the identical expression runs with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


SQL_SESSION_WINDOW_AGG = """
WITH g AS (
  SELECT user_id, ts, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
    CASE WHEN lag(epoch_ms(CAST(ts AS TIMESTAMP)))
              OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR epoch_ms(CAST(ts AS TIMESTAMP))
              - lag(epoch_ms(CAST(ts AS TIMESTAMP)))
                OVER (PARTITION BY user_id ORDER BY ts) >= 1800000
         THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g)
SELECT user_id,
  strftime(to_timestamp(MIN(ms) / 1000.0), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(to_timestamp((MAX(ms) + 1800000) / 1000.0), '%Y-%m-%d %H:%M:%S') AS session_end,
  COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: docs whose 60-bit fingerprints are
    within hamming distance 3 (bit_count(xor)) — PRODUCTION DEFAULT.

    Delegates to the multi-block Manku banding (WWW 2007): 6 blocks of
    10 bits, every C(6,3) = 20 combination of 3 blocks is a 30-bit
    equi-join key, so any ≤3-bit difference leaves some key untouched
    (pigeonhole) — recall exact, output identical to all-pairs. This is
    the default because its RANDOM candidate mass is n²/2³⁰ × 20
    tables; the 4×15-bit banding (kept as simhash_pairs_4band, the
    teaching contrast) collides at n²/2¹⁵ per band — its 32k-value band
    space saturates at corpus scale regardless of true dup density
    (measured 272k → 10.5M candidates at 30× on the scale fixtures), a
    superlinear term no registry default should carry. Shares the
    all-pairs oracle verbatim (banding is plan, not semantics)."""
    from .functions.dedup_approx import simhash_manku_pairs

    fp = simhash(load_table(spark, sf_dir, "documents"))
    return simhash_manku_pairs(fp)


def q_simhash_pairs_4band(spark, sf_dir):
    """SimHash near-dup pairs via the 4×15-bit banding — the TEACHING
    CONTRAST to the Manku default (see q_simhash_pairs).

    ≤3 differing bits touch ≤3 of the 4 bands, so every qualifying
    pair shares at least one band value exactly (pigeonhole);
    candidates come from an equi-join on (band index, band value),
    then the exact hamming filter and a distinct. Output identical to
    all-pairs and to the Manku form. Regime note: on a DUPLICATE-DENSE
    corpus (candidates dominated by real pairs) this form's 4-vs-20
    explode fan-out is cheaper; on realistic sparse corpora its
    n²/2¹⁵ random-collision floor makes it the wrong plan at 10⁹ rows
    — which is why it is no longer the default."""
    fp = simhash(load_table(spark, sf_dir, "documents"))
    return simhash_band_pairs(fp)


SQL_SIMHASH_PAIRS = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents),
h AS (SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h FROM w),
bits AS (SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS tot
         FROM h, (SELECT unnest(range(0, 60)) AS j) AS js
         GROUP BY doc_id, j),
fp AS (SELECT doc_id,
         SUM(CASE WHEN tot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS simhash
       FROM bits GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_window_nth(spark, sf_dir):
    """first_value/last_value/nth_value with explicit full-partition
    frames (the defaults differ subtly across engines; pin them)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_total"),
        F.last("o_totalprice").over(w).alias("last_total"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_total"),
    )


SQL_WINDOW_NTH = """
SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_total,
  last_value(o_totalprice) OVER w AS last_total,
  nth_value(o_totalprice, 2) OVER w AS second_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --------------------------------------------------------------------------
# Similarity search (embeddings)
# --------------------------------------------------------------------------

# pre-normalized vectors, mirroring similarity._unit: cosine of unit
# vectors is one dot product; division sequence matches Spark's exactly
_COS = "list_sum(list_transform(list_zip(a.uv, b.uv), p -> p[1] * p[2]))"
_EMB_U = """
SELECT vec_id, label,
       list_transform(dv, x -> x / CASE WHEN nrm = 0 THEN 1 ELSE nrm END) AS uv
FROM (SELECT vec_id, label, dv, sqrt(list_sum(list_transform(dv, x -> x * x))) AS nrm
      FROM (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
            FROM embeddings))
"""


def q_embedding_norms(spark, sf_dir):
    emb = embedding_norms(load_table(spark, sf_dir, "embeddings"))
    return emb.select("vec_id", "dim", F.round("l2_norm", 6).alias("l2_norm"), "label")


SQL_EMBEDDING_NORMS = """
WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           FROM embeddings)
SELECT vec_id, len(dv) AS dim,
  round(sqrt(list_sum(list_transform(dv, x -> x * x))), 6) AS l2_norm, label
FROM e
"""


def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding column — the
    standard 4× storage/IO compression before ANN indexing at corpus
    scale. Per vector: scale = max|x|/127, q_i = floor(x_i·127/amax
    + 0.5) (round-half-up — portable, unlike round()'s half-even vs
    half-away dialect split). Pure higher-order functions, narrow
    projection, fuses into the scan. Quantized vector is emitted as an
    md5 over the comma-joined ints to keep the compare narrow."""
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform("embedding", lambda x: x.cast("double"))
    amax = F.array_max(F.transform(dv, F.abs))
    q = F.transform(
        dv, lambda x: F.floor(x * 127 / amax + F.lit(0.5)).cast("bigint")
    )
    return emb.select(
        "vec_id",
        (amax / 127).alias("scale"),
        F.when(
            amax > 0,
            F.md5(F.concat_ws(",", F.transform(q, lambda v: v.cast("string")))),
        ).alias("q_hash"),
    )


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           FROM embeddings),
a AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) AS amax FROM e)
SELECT vec_id, amax / 127 AS scale,
       CASE WHEN amax > 0 THEN
         md5(array_to_string(
           list_transform(dv, x -> CAST(floor(x * 127 / amax + 0.5) AS BIGINT)), ','))
       END AS q_hash
FROM a
"""


def q_embedding_pca_scores(spark, sf_dir):
    """Distributed PCA by power iteration, oracle-checked end-to-end:
    3 unrolled iterations of x ← normalize(Cov·x) from the fixed start
    x₀ = (1/8,…,1/8), then every vector's projection onto the resulting
    principal direction — the whitening/compression step before
    clustering or ANN indexing. The oracle replicates the SAME 3
    unrolled iterations in pure SQL CTEs, so this is iterative linear
    algebra under the full value-hash gate, not a rows-only check.

    The scale story is why this shape and not a Gram matrix: Cov·x is
    computed as two corpus aggregates — y = v·x − μ·x per row (a
    narrow map fused into the scan) and z_j = Σ v_j·y − μ_j·Σy (one
    posexplode + 64-group partial agg) — so each iteration is ONE
    shuffle of 64·P partial sums; the d×d Gram matrix (4096 doubles
    here, but d² at transformer widths) is never materialized, and the
    driver only ever holds 64-float vectors (μ, z): bounded collects by
    construction, the PQ-codebook precedent. The corpus frame is
    persisted across the 4 aggregate passes and unpersisted before the
    final projection (which fuses into a fresh scan). Engines diverge
    only by float-sum ordering inside each aggregate; 3 iterations
    amplify that ~linearly (≈1e-13 relative) and round(.,6) absorbs
    it, the sim_topk/ngram_lm_score precedent. Since round 12 the
    kernel lives in functions/pca.py (deflated top-r generalization);
    r=1 runs the identical arithmetic (empty deflation sum, no
    Rayleigh pass)."""
    from .functions.pca import power_iteration_topr, project

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("dv")
    )
    emb = emb.persist()
    try:
        mu, accepted = power_iteration_topr(emb, dim=64, r=1, iters=3)
    finally:
        emb.unpersist()
    return project(
        load_table(spark, sf_dir, "embeddings"), mu, [accepted[0][0]]
    )


# power iteration unrolled: each xN CTE is the normalized covariance
# product of the previous direction; scores project onto x3. POSITIONAL
# list indexing is 1-based in DuckDB; pos joins are on the same basis
# both sides because both sides only ever join pos-to-pos.
SQL_EMBEDDING_PCA_SCORES = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           FROM embeddings),
dims AS (SELECT unnest(range(1, 65)) AS pos),
mu AS (SELECT pos, SUM(dv[pos]) / COUNT(*) AS m
       FROM e CROSS JOIN dims GROUP BY pos),

mux0 AS (SELECT SUM(m * 0.125) AS s FROM mu),
y1 AS (SELECT dv, list_sum(list_transform(dv, v -> v * 0.125))
                  - (SELECT s FROM mux0) AS y FROM e),
z1 AS (SELECT pos, SUM(dv[pos] * y) AS s, SUM(y) AS ysum
       FROM y1 CROSS JOIN dims GROUP BY pos),
zz1 AS (SELECT z1.pos, z1.s - mu.m * z1.ysum AS z FROM z1 JOIN mu USING (pos)),
n1 AS (SELECT CASE WHEN SUM(z * z) = 0 THEN 1 ELSE sqrt(SUM(z * z)) END AS nrm
       FROM zz1),
x1 AS (SELECT list(z / nrm ORDER BY pos) AS xv FROM zz1 CROSS JOIN n1),

mux1 AS (SELECT SUM(mu.m * xv[mu.pos]) AS s FROM mu CROSS JOIN x1),
y2 AS (SELECT dv, list_sum(list_transform(list_zip(dv, (SELECT xv FROM x1)),
                                          p -> p[1] * p[2]))
                  - (SELECT s FROM mux1) AS y FROM e),
z2 AS (SELECT pos, SUM(dv[pos] * y) AS s, SUM(y) AS ysum
       FROM y2 CROSS JOIN dims GROUP BY pos),
zz2 AS (SELECT z2.pos, z2.s - mu.m * z2.ysum AS z FROM z2 JOIN mu USING (pos)),
n2 AS (SELECT CASE WHEN SUM(z * z) = 0 THEN 1 ELSE sqrt(SUM(z * z)) END AS nrm
       FROM zz2),
x2 AS (SELECT list(z / nrm ORDER BY pos) AS xv FROM zz2 CROSS JOIN n2),

mux2 AS (SELECT SUM(mu.m * xv[mu.pos]) AS s FROM mu CROSS JOIN x2),
y3 AS (SELECT dv, list_sum(list_transform(list_zip(dv, (SELECT xv FROM x2)),
                                          p -> p[1] * p[2]))
                  - (SELECT s FROM mux2) AS y FROM e),
z3 AS (SELECT pos, SUM(dv[pos] * y) AS s, SUM(y) AS ysum
       FROM y3 CROSS JOIN dims GROUP BY pos),
zz3 AS (SELECT z3.pos, z3.s - mu.m * z3.ysum AS z FROM z3 JOIN mu USING (pos)),
n3 AS (SELECT CASE WHEN SUM(z * z) = 0 THEN 1 ELSE sqrt(SUM(z * z)) END AS nrm
       FROM zz3),
x3 AS (SELECT list(z / nrm ORDER BY pos) AS xv FROM zz3 CROSS JOIN n3),

mux3 AS (SELECT SUM(mu.m * xv[mu.pos]) AS s FROM mu CROSS JOIN x3)
SELECT vec_id,
       round(list_sum(list_transform(list_zip(dv, (SELECT xv FROM x3)),
                                     p -> p[1] * p[2]))
             - (SELECT s FROM mux3), 6) AS pc1
FROM e
"""


def q_embedding_pca_topr(spark, sf_dir):
    """Top-3 principal components by BLOCK subspace iteration
    (functions/pca.py; orthogonal iteration, Golub & Van Loan §8.2.4)
    — the multi-component extension of embedding_pca_scores that
    whitening and SemDeDup-style embedding cleanup actually need.

    Scale shape: each iteration applies Cov to the whole 3-column
    block in ONE corpus pass (three y maps fused into the scan, one
    posexplode 64-group agg emitting 6 partial sums per position) —
    never a d×d Gram — then re-orthonormalizes the block on the DRIVER
    by classical Gram-Schmidt (O(r²·d) flops on 64-float vectors). So
    top-3 costs iters+1 = 4 aggregate passes over the persisted corpus
    TOTAL, the same as the single-component entry (the sequential
    Hotelling-deflation form this replaced cost r·(iters+1) = 12
    passes; measured 2.9 s → ~1.4 s at sf0.1). The oracle replicates
    the full unrolled recurrence — 3 iterations of blocked Cov·X plus
    the exact classical-GS dot/subtract order — in generated SQL CTEs
    (SQL_EMBEDDING_PCA_TOPR below), so the block algebra itself is
    under the value-hash gate. Accuracy vs ground truth (numpy eigh,
    spiked covariance) pinned ≥0.99 per component by
    test_pca_topr_recovers_spiked_components."""
    from .functions.pca import power_iteration_topr, project

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("dv")
    )
    emb = emb.persist()
    try:
        mu, accepted = power_iteration_topr(emb, dim=64, r=3, iters=3)
    finally:
        emb.unpersist()
    return project(
        load_table(spark, sf_dir, "embeddings"), mu, [x for x, _ in accepted]
    )


def _sql_pca_block_ctes(r: int, iters: int, dim: int) -> tuple[list, str]:
    """Shared CTE prefix for the PCA-based oracles: block subspace
    iteration mirrored step-for-step from functions/pca.py — per
    iteration one mux/y/z/zz block computing Cov·X for all r columns
    (the single-corpus-pass shape), then a classical Gram-Schmidt CTE
    chain (dots against the ORIGINAL zz column, subtracted
    left-to-right, zero-norm guarded to 1) and a re-assembled list
    block. Start block: column 0 the uniform 1/sqrt(d) vector
    (bit-compatible with the r=1 oracle), column c>=1 the basis vector
    e_{c-1}. Every CTE is MATERIALIZED — DuckDB's default CTE inlining
    makes the nested chain exponential and hung even at 50 rows
    without it. Returns (ctes, final_block_name)."""
    startv = 1.0 / (dim ** 0.5)
    ctes = [
        "e AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        " AS dv\n     FROM embeddings)",
        f"dims AS MATERIALIZED (SELECT unnest(range(1, {dim + 1})) AS pos)",
        "mu AS MATERIALIZED (SELECT pos, SUM(dv[pos]) / COUNT(*) AS m\n"
        "       FROM e CROSS JOIN dims GROUP BY pos)",
    ]
    cols = list(range(r))
    # start block xb0: x0 uniform, xc = e_{c-1} (1-based pos == c)
    parts = [f"list(CAST({startv!r} AS DOUBLE) ORDER BY pos) AS x0"]
    for c in cols[1:]:
        parts.append(
            f"list(CASE WHEN pos = {c} THEN CAST(1.0 AS DOUBLE) "
            f"ELSE CAST(0.0 AS DOUBLE) END ORDER BY pos) AS x{c}"
        )
    ctes.append(
        "xb0 AS MATERIALIZED (SELECT " + ", ".join(parts) + " FROM dims)"
    )

    for i in range(1, iters + 1):
        prev = f"xb{i - 1}"
        # mux: r scalars in one CTE
        ctes.append(
            f"mux{i} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"SUM(mu.m * list_extract(px.x{c}, mu.pos)) AS m{c}"
                for c in cols
            )
            + f"\n       FROM mu CROSS JOIN {prev} px)"
        )
        # y: r per-row columns, ONE pass over e
        ctes.append(
            f"y{i} AS MATERIALIZED (SELECT dv, "
            + ", ".join(
                f"list_sum(list_transform(list_zip(dv, "
                f"(SELECT x{c} FROM {prev})), p -> p[1] * p[2]))"
                f" - (SELECT m{c} FROM mux{i}) AS y{c}"
                for c in cols
            )
            + " FROM e)"
        )
        # z: 2r aggregates per position, ONE group-by
        ctes.append(
            f"z{i} AS MATERIALIZED (SELECT pos, "
            + ", ".join(f"SUM(dv[pos] * y{c}) AS s{c}" for c in cols)
            + ", "
            + ", ".join(f"SUM(y{c}) AS u{c}" for c in cols)
            + f"\n       FROM y{i} CROSS JOIN dims GROUP BY pos)"
        )
        ctes.append(
            f"zz{i} AS MATERIALIZED (SELECT z.pos, "
            + ", ".join(f"z.s{c} - mu.m * z.u{c} AS z{c}" for c in cols)
            + f"\n       FROM z{i} z JOIN mu USING (pos))"
        )
        # classical Gram-Schmidt, column by column
        for c in cols:
            if c == 0:
                wsrc, wcol = f"zz{i}", "z0"
            else:
                # dots of every earlier q against the ORIGINAL z{c}
                for j in range(c):
                    ctes.append(
                        f"d{i}_{c}_{j} AS MATERIALIZED (SELECT "
                        f"SUM(q.q * zz.z{c}) AS d\n       "
                        f"FROM q{i}_{j} q JOIN zz{i} zz USING (pos))"
                    )
                joins = " ".join(
                    f"JOIN q{i}_{j} q{j} USING (pos)" for j in range(c)
                )
                terms = "".join(
                    f" - (SELECT d FROM d{i}_{c}_{j}) * q{j}.q"
                    for j in range(c)
                )
                ctes.append(
                    f"w{i}_{c} AS MATERIALIZED (SELECT zz.pos, "
                    f"zz.z{c}{terms} AS w\n       FROM zz{i} zz {joins})"
                )
                wsrc, wcol = f"w{i}_{c}", "w"
            ctes.append(
                f"n{i}_{c} AS MATERIALIZED (SELECT CASE WHEN "
                f"SUM({wcol} * {wcol}) = 0 THEN 1 ELSE "
                f"sqrt(SUM({wcol} * {wcol})) END AS nrm FROM {wsrc})"
            )
            ctes.append(
                f"q{i}_{c} AS MATERIALIZED (SELECT pos, {wcol} / "
                f"(SELECT nrm FROM n{i}_{c}) AS q FROM {wsrc})"
            )
        ctes.append(
            f"xb{i} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"(SELECT list(q ORDER BY pos) FROM q{i}_{c}) AS x{c}"
                for c in cols
            )
            + ")"
        )
    return ctes, f"xb{iters}"


def _sql_pca_projections(ctes: list, fin: str, r: int) -> list[str]:
    """Append the per-component projection-mean CTEs and return the
    rounded projection expressions pc1..pcr (round 6 — the float
    firewall: everything DOWNSTREAM of these computes on bit-identical
    operands in both engines)."""
    projs = []
    for c in range(r):
        ctes.append(
            f"p{c}_mux AS MATERIALIZED (SELECT "
            f"SUM(mu.m * list_extract(px.x{c}, mu.pos)) AS s\n"
            f"       FROM mu CROSS JOIN {fin} px)"
        )
        projs.append(
            # + 0.0 collapses signed zero, mirroring functions/pca.py
            f"round(list_sum(list_transform(list_zip(dv, "
            f"(SELECT x{c} FROM {fin})), p -> p[1] * p[2]))"
            f" - (SELECT s FROM p{c}_mux), 6) + 0.0 AS pc{c + 1}"
        )
    return projs


def _sql_pca_topr(r: int = 3, iters: int = 3, dim: int = 64) -> str:
    """Oracle for q_embedding_pca_topr: the shared block-iteration
    prefix plus the rounded projections."""
    ctes, fin = _sql_pca_block_ctes(r, iters, dim)
    projs = _sql_pca_projections(ctes, fin, r)
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT vec_id,\n       "
        + ",\n       ".join(projs) + "\nFROM e"
    )


SQL_EMBEDDING_PCA_TOPR = _sql_pca_topr(r=3, iters=3, dim=64)


def _sql_semdedup(
    r: int = 3, iters: int = 3, dim: int = 64, thr: float = 0.95
) -> str:
    """Oracle for q_semdedup: the PCA prefix, then the full SemDeDup
    chain in SQL — rounded projections (the cross-engine float
    firewall), deterministic first-C codebook with C = max(16, n/64),
    nearest-centroid assignment with (dist, cid) tie-break, and the
    within-cluster cosine-threshold dup marking. Every arithmetic
    expression is written in the same operand order as the Spark side,
    so downstream floats are bit-identical."""
    ctes, fin = _sql_pca_block_ctes(r, iters, dim)
    projs = _sql_pca_projections(ctes, fin, r)
    ctes.append(
        "red AS MATERIALIZED (SELECT vec_id, "
        + ", ".join(projs)
        + " FROM e)"
    )
    ctes.append(
        "cnt AS MATERIALIZED (SELECT GREATEST(16, COUNT(*) // 64) AS c FROM e)"
    )
    ctes.append(
        "cents AS MATERIALIZED (SELECT vec_id AS cid, "
        + ", ".join(f"pc{c + 1} AS c{c + 1}" for c in range(r))
        + " FROM red WHERE vec_id < (SELECT c FROM cnt))"
    )
    dist = " + ".join(
        f"(r.pc{c + 1} - c.c{c + 1}) * (r.pc{c + 1} - c.c{c + 1})"
        for c in range(r)
    )
    ctes.append(
        "adist AS MATERIALIZED (SELECT r.vec_id, "
        + ", ".join(f"r.pc{c + 1}" for c in range(r))
        + f", c.cid, {dist} AS dist FROM red r CROSS JOIN cents c)"
    )
    ctes.append(
        "assign AS MATERIALIZED (SELECT vec_id, "
        + ", ".join(f"pc{c + 1}" for c in range(r))
        + ", cid AS cluster FROM (SELECT *, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM adist) "
        "WHERE rn = 1)"
    )
    na = " + ".join(f"a.pc{c + 1} * a.pc{c + 1}" for c in range(r))
    nb = " + ".join(f"b.pc{c + 1} * b.pc{c + 1}" for c in range(r))
    dot = " + ".join(f"a.pc{c + 1} * b.pc{c + 1}" for c in range(r))
    cos = (
        f"CASE WHEN sqrt({na}) * sqrt({nb}) = 0 THEN 0 "
        f"ELSE ({dot}) / (sqrt({na}) * sqrt({nb})) END"
    )
    ctes.append(
        "dups AS MATERIALIZED (SELECT DISTINCT b.vec_id FROM assign a "
        "JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id "
        f"WHERE {cos} > {thr!r})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT a.vec_id, a.cluster, (d.vec_id IS NOT NULL) AS dup"
        + "\nFROM assign a LEFT JOIN dups d USING (vec_id)"
    )


SQL_SEMDEDUP = _sql_semdedup(r=3, iters=3, dim=64, thr=0.999)


def q_semdedup(spark, sf_dir):
    """SemDeDup-style embedding cleanup (Abbas et al. 2023,
    arXiv:2303.09540 — semantic dedup by clustering embeddings and
    dropping within-cluster near-duplicates), composed from this
    repo's PCA + clustering pieces and kept FULLY under the value-hash
    gate: project every embedding onto the top-3 principal components
    (block subspace iteration, functions/pca.py — 4 corpus passes),
    assign to the nearest of C = max(16, n/64) deterministic
    first-C-ids centroids in the REDUCED space, and inside each
    cluster mark every vector that has a smaller-id neighbor with
    reduced-space cosine > 0.999 as a duplicate (keep-lowest-id, the
    dedup_exact_docs convention). The threshold is calibrated to the
    REDUCED space: 3-d projections crowd directions (the corpus-wide
    99.9th-percentile reduced cosine is ~0.998 on this fixture, vs
    zero full-space pairs above 0.95), so the paper's full-space 0.95
    would flag 80% of the corpus here; 0.999 flags the genuine tail
    (~6% at sf0.01).

    Cross-engine exactness for an 11-stage float pipeline: the PCA
    projections are ROUNDED to 6 dp first — the float firewall — so
    assignment distances, tie-breaks, norms, and cosines downstream
    compute on bit-identical operands in both engines (every
    expression written in the same operand order; zero-norm cosine
    guarded to 0). The oracle replicates the entire chain, PCA
    included, in generated SQL.

    Scale shape: C ∝ n keeps expected cluster size ~64, so the
    within-cluster pair stage is expected-linear (Σ n_c² ≈ 64·n);
    assignment is one C-row broadcast cross join reduced by a map-side
    min_by hash agg (no window sort); the only corpus-keyed shuffles
    are the cluster self-join and the dup anti-probe. Skewed clusters
    are the honest failure mode, as in the paper (k-means there, fixed
    codebook here); the two-level PQ in dedup_embeddings is the
    adversarial-skew alternative."""
    from .functions.pca import power_iteration_topr, project

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("dv")
    )
    emb = emb.persist()
    try:
        mu, accepted = power_iteration_topr(emb, dim=64, r=3, iters=3)
        n = emb.count()
    finally:
        emb.unpersist()
    red = project(
        load_table(spark, sf_dir, "embeddings"), mu, [x for x, _ in accepted]
    )
    c_count = max(16, n // 64)
    cents = red.filter(F.col("vec_id") < c_count).select(
        F.col("vec_id").alias("cid"),
        *[F.col(f"pc{i}").alias(f"c{i}") for i in (1, 2, 3)],
    )
    # per-row argmin over the collected codebook array (round 20, guide
    # §2.4): the former broadcast cross join + groupBy(vec_id) min_by
    # re-keyed n·C scored rows through a hash Exchange (and each of the
    # THREE consumers of `assign` — both self-join sides and the final
    # dup probe — re-ran it); the per-row form is exchange-free and
    # cheap to recompute. Arithmetic identical: same (pc−c)² operand
    # order, array_min over STRUCT(dist, cid) ≡ min_by by (dist, cid).
    carr = cents.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c1", "c2", "c3"))).alias("carr")
    )
    dist = lambda c: sum(  # noqa: E731
        (F.col(f"pc{i}") - c[f"c{i}"]) * (F.col(f"pc{i}") - c[f"c{i}"])
        for i in (1, 2, 3)
    )
    assign = red.join(F.broadcast(carr), how="cross").select(
        "vec_id",
        F.array_min(
            F.transform(
                F.col("carr"),
                lambda c: F.struct(dist(c).alias("dist"), c["cid"].alias("cid")),
            )
        )["cid"].alias("cluster"),
        "pc1",
        "pc2",
        "pc3",
    )
    a, b = assign.alias("a"), assign.alias("b")
    na = sum(F.col(f"a.pc{i}") * F.col(f"a.pc{i}") for i in (1, 2, 3))
    nb = sum(F.col(f"b.pc{i}") * F.col(f"b.pc{i}") for i in (1, 2, 3))
    dot = sum(F.col(f"a.pc{i}") * F.col(f"b.pc{i}") for i in (1, 2, 3))
    cos = F.when(F.sqrt(na) * F.sqrt(nb) == 0, F.lit(0.0)).otherwise(
        dot / (F.sqrt(na) * F.sqrt(nb))
    )
    dups = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos > F.lit(0.999))
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(dups.withColumn("__d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("__d").isNotNull().alias("dup"),
        )
    )



def q_sim_topk(spark, sf_dir):
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5)


SQL_SIM_TOPK = f"""
WITH u AS ({_EMB_U}),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
  FROM u a JOIN u b ON b.vec_id != a.vec_id
  WHERE a.vec_id IN (0, 1, 2, 3, 4)),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 5
"""


def q_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate top-k (the at-scale ANN path),
    training-free deterministic codebook (first 16 vectors by id).
    Measured recall vs brute force on this corpus: 0.92/0.92/1.0 at
    sf0.001/0.01/0.1 — at or above the k-means-trained codebook
    (0.88/0.88/1.0, see q_ivf_topk_trained) at a third of the cost, so
    it stays the fast default; the trained variant is the first-class
    entry for corpora where a deterministic id-prefix codebook would be
    degenerate (adversarial id assignment, clustered ingest order)."""
    from .functions.similarity import ivf_topk

    return ivf_topk(load_table(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5)


_DOT2 = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"

SQL_IVF_TOPK = f"""
WITH u AS ({_EMB_U}),
cents AS (SELECT vec_id AS cent_id, uv AS cv FROM u WHERE vec_id < 16),
ascore AS (
  SELECT u.vec_id, c.cent_id, {_DOT2.format(a="u.uv", b="c.cv")} AS cs
  FROM u CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, cent_id AS bucket
  FROM (SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS r
        FROM ascore) WHERE r = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS bucket
  FROM (SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS r
        FROM ascore WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE r <= 4),
cand AS (
  SELECT a.vec_id AS cand_id, a.bucket, u.uv AS cv2
  FROM assigned a JOIN u ON u.vec_id = a.vec_id),
scored AS (
  SELECT p.query_id, c.cand_id AS neighbor_id,
         {_DOT2.format(a="qu.uv", b="c.cv2")} AS cosine
  FROM probes p JOIN cand c USING (bucket)
  JOIN u qu ON qu.vec_id = p.query_id
  WHERE p.query_id != c.cand_id)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= 5
"""


def q_ivf_topk_trained(spark, sf_dir):
    """IVF approximate top-k over a k-means-TRAINED codebook: the
    inverted file is built from kmeans_centroids(k=16, 2 Lloyd rounds)
    instead of the deterministic id-prefix codebook — the
    production-robust configuration for corpora where "first 16 vectors
    by id" could be degenerate (clustered ingest order, adversarial
    ids). Fully oracle-checked: the fixed iteration count makes the
    training SQL-expressible as unrolled CTEs (_sql_kmeans_cte), so
    DuckDB reproduces centroids, bucket assignment, probes, and top-k
    bit-for-bit. Measured recall vs brute force 0.84/0.88/1.0 at
    sf0.001/0.01/0.1 (floor ≥0.8 pinned by
    tests/test_operators.py::test_ivf_recall_against_exact); see
    q_ivf_topk for why the training-free codebook remains the fast
    default on this corpus."""
    from .functions.similarity import ivf_topk, kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=16, iters=2)
    return ivf_topk(emb, query_ids=[0, 1, 2, 3, 4], k=5, centroids=cents)


def _sql_ivf_topk_trained(k: int = 16, iters: int = 2, n_probe: int = 4) -> str:
    cte, cents = _sql_kmeans_cte(k, iters)
    cte = list(cte)
    dot_uc = "list_sum(list_transform(list_zip(u.uv, c.cv), p -> p[1] * p[2]))"
    dot_qc = "list_sum(list_transform(list_zip(qu.uv, c.cv2), p -> p[1] * p[2]))"
    cte += [
        f"""ascore AS (
  SELECT u.vec_id, c.cent_id, {dot_uc} AS cs
  FROM unit u CROSS JOIN {cents} c)""",
        """assigned AS (
  SELECT vec_id, cent_id AS bucket
  FROM (SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS r
        FROM ascore) WHERE r = 1)""",
        f"""probes AS (
  SELECT vec_id AS query_id, cent_id AS bucket
  FROM (SELECT vec_id, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS r
        FROM ascore WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE r <= {n_probe})""",
        """cand AS (
  SELECT a.vec_id AS cand_id, a.bucket, u.uv AS cv2
  FROM assigned a JOIN unit u ON u.vec_id = a.vec_id)""",
        f"""scored AS (
  SELECT p.query_id, c.cand_id AS neighbor_id, {dot_qc} AS cosine
  FROM probes p JOIN cand c USING (bucket)
  JOIN unit qu ON qu.vec_id = p.query_id
  WHERE p.query_id != c.cand_id)""",
    ]
    return (
        "WITH " + ",\n".join(cte) + """
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= 5
"""
    )


def q_cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs, SemDeDup-style within-bucket
    semantics with an ADAPTIVE TWO-LEVEL product-quantizer codebook:
    C = max(16, ceil(n/1024)) buckets factored into a c1×c2 grid of two
    O(√C) codebooks — the 100 TB artifact. Pairs are scored only inside
    shared buckets, so total matmul work stays linear as C tracks n,
    and the assignment stage costs O(√C) dots per vector with O(√C)-row
    broadcasts (the flat adaptive scheme was O(C) per vector with an
    O(C)-row broadcast — quadratic total once C ∝ n). The exact
    all-pairs kernel remains available as the internal
    functions.similarity.cosine_pairs for small corpora (its quadratic
    contract made it unfit as a first-class entry)."""
    from .functions.similarity import bucketed_cosine_pairs

    return bucketed_cosine_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.35, n_centroids=None
    )


# the adaptive two-level grid mirrored in SQL from a count(*)/min()
# CTE — the oracle derives C = max(16, ceil(n/1024)), c1 = ceil(sqrt(C)),
# c2 = ceil(C/c1) and the codebook anchor m = min(vec_id) exactly as
# functions.similarity.{product_grid,bucketed_assign} do (ceil/sqrt are
# IEEE-exact in both engines for these magnitudes)
_SQL_GRID = """
cfg AS (SELECT GREATEST(16, CAST(ceil(COUNT(*) / 1024.0) AS BIGINT)) AS c,
               MIN(vec_id) AS m
        FROM embeddings),
grid AS (SELECT c, m, CAST(ceil(sqrt(c)) AS BIGINT) AS c1,
                CAST(ceil(c / ceil(sqrt(c))) AS BIGINT) AS c2 FROM cfg)
"""

# product-quantizer bucket assignment shared by the two embedding-dedup
# oracles: codebook A = first c1 vectors from the min id, codebook B =
# next c2 vectors, bucket = nearest-A (top-2 probed) × c2 + nearest-B
_SQL_PQ_ASSIGN = f"""
acents AS (SELECT vec_id - (SELECT m FROM grid) AS a_id, uv AS av FROM u
           WHERE vec_id >= (SELECT m FROM grid)
             AND vec_id < (SELECT m + c1 FROM grid)),
bcents AS (SELECT vec_id - (SELECT m + c1 FROM grid) AS b_id, uv AS bv FROM u
           WHERE vec_id >= (SELECT m + c1 FROM grid)
             AND vec_id < (SELECT m + c1 + c2 FROM grid)),
ascore AS (
  SELECT u.vec_id, a.a_id, {_DOT2.format(a='u.uv', b='a.av')} AS cs
  FROM u CROSS JOIN acents a),
aassign AS (
  SELECT vec_id, a_id
  FROM (SELECT vec_id, a_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, a_id) AS r
        FROM ascore) WHERE r <= 2),
bscore AS (
  SELECT u.vec_id, b.b_id, {_DOT2.format(a='u.uv', b='b.bv')} AS cs
  FROM u CROSS JOIN bcents b),
bassign AS (
  SELECT vec_id, b_id
  FROM (SELECT vec_id, b_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, b_id) AS r
        FROM bscore) WHERE r = 1),
assign AS (
  SELECT a.vec_id,
         a.a_id * (SELECT c2 FROM grid) + COALESCE(b.b_id, 0) AS bucket
  FROM aassign a LEFT JOIN bassign b ON a.vec_id = b.vec_id)
"""

SQL_COSINE_PAIRS = f"""
WITH u AS ({_EMB_U}),
{_SQL_GRID},
{_SQL_PQ_ASSIGN},
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM assign x JOIN assign y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
SELECT c.id_a, c.id_b, round({_COS}, 6) AS cosine
FROM cand c JOIN u a ON a.vec_id = c.id_a
            JOIN u b ON b.vec_id = c.id_b
WHERE {_COS} >= 0.35
"""


def q_dedup_embeddings(spark, sf_dir):
    """Embedding-cosine near-dup DEDUP, SemDeDup-style (Abbas et al.
    2023): vectors are bucketed by the adaptive two-level
    product-quantizer codebook (see q_cosine_pairs — C = n/1024 buckets
    as a c1×c2 grid of two O(√C) codebooks, assignment O(√C) dots per
    vector), pairs are scored ONLY within shared buckets (cogrouped
    BLAS matmul — compute n²·probe/C, linear as C tracks corpus size),
    and survivors are vectors with no lower-id within-bucket neighbor
    above the threshold. The within-bucket semantic is the operator's
    contract — the oracle reproduces the same grid, bucket assignment,
    and candidate set exactly, so parity holds at any scale; the exact
    all-pairs variant remains available as cosine_pairs for small
    corpora."""
    from .functions.similarity import bucketed_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = bucketed_cosine_pairs(emb, threshold=0.35, n_centroids=None, n_probe=2)
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


SQL_DEDUP_EMBEDDINGS = f"""
WITH u AS ({_EMB_U}),
{_SQL_GRID},
{_SQL_PQ_ASSIGN},
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM assign x JOIN assign y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
pairs AS (
  SELECT c.id_b
  FROM cand c JOIN u a ON a.vec_id = c.id_a
              JOIN u b ON b.vec_id = c.id_b
  WHERE {_COS} >= 0.35)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT id_b FROM pairs)
"""


def q_dedup_embeddings_trained(spark, sf_dir):
    """dedup_embeddings with TRAINED subspace-PQ codebooks (Jégou et
    al., TPAMI 2011): the unit vector splits into halves, each half
    gets its own squared-Euclidean Lloyd-trained codebook (k = c1/c2,
    2 fixed rounds, init = the min-id-anchored id blocks), and the
    bucket is (top-2-probed nearest-A cell) × c2 + nearest-B cell.
    Removes the r7-flagged recall dependence on the id-prefix vectors
    being spread out — on a shuffled-id corpus the trained buckets
    recover near-dup recall the raw prefix codebooks lose (floor
    pinned in tests/test_operators.py). Fixed iteration count keeps
    the training unrollable as oracle CTEs, so grid derivation, both
    trainings, assignment, probing, and within-bucket pairing are all
    cross-checked bit-for-bit (same discipline as ivf_topk_trained)."""
    from .functions.similarity import bucketed_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = bucketed_cosine_pairs(
        emb, threshold=0.35, n_centroids=None, n_probe=2, codebook="trained"
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


def _sql_dedup_embeddings_trained(iters: int = 2, n_probe: int = 2, dim: int = 64) -> str:
    """Unrolled-CTE mirror of the trained subspace-PQ dedup: half
    slices, per-half Lloyd training (`iters` rounds, squared-Euclidean
    argmin with lowest-cent_id tie-break, position-wise mean update,
    empty cluster keeps its centroid), final top-n_probe × top-1
    assignment, within-bucket pairing. Float note: per-position avg()
    sums in engine order on both sides (≤1 ulp drift); assignments
    only flip on ~1e-15 distance ties — same margin as the kmeans
    oracle, never observed on the testdata."""
    h = dim // 2
    d2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])))"
    cte = [
        f"u AS ({_EMB_U})",
        _SQL_GRID.strip(),
        f"hv AS (SELECT vec_id, uv[1:{h}] AS h1, uv[{h + 1}:{dim}] AS h2 FROM u)",
        "ac0 AS (SELECT CAST(vec_id - (SELECT m FROM grid) AS INT) AS cent_id, h1 AS cv"
        " FROM hv WHERE vec_id >= (SELECT m FROM grid)"
        " AND vec_id < (SELECT m + c1 FROM grid))",
        "bc0 AS (SELECT CAST(vec_id - (SELECT m + c1 FROM grid) AS INT) AS cent_id, h2 AS cv"
        " FROM hv WHERE vec_id >= (SELECT m + c1 FROM grid)"
        " AND vec_id < (SELECT m + c1 + c2 FROM grid))",
    ]
    for x, hcol in (("a", "h1"), ("b", "h2")):
        for t in range(1, iters + 1):
            p = t - 1
            cte.append(
                f"{x}s{t} AS (SELECT v.vec_id, v.{hcol} AS hh, c.cent_id,"
                f" {d2.format(a='v.' + hcol, b='c.cv')} AS d2"
                f" FROM hv v CROSS JOIN {x}c{p} c)"
            )
            cte.append(
                f"{x}a{t} AS (SELECT vec_id, hh, cent_id FROM"
                f" (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS r"
                f" FROM {x}s{t}) WHERE r = 1)"
            )
            cte.append(
                f"{x}b{t} AS (SELECT cent_id, i AS pos, avg(hh[i]) AS mm"
                f" FROM {x}a{t}, (SELECT unnest(range(1, {h + 1})) AS i) idx"
                f" GROUP BY cent_id, i)"
            )
            cte.append(
                f"{x}m{t} AS (SELECT cent_id, list(mm ORDER BY pos) AS mv"
                f" FROM {x}b{t} GROUP BY cent_id)"
            )
            cte.append(
                f"{x}c{t} AS (SELECT c.cent_id, COALESCE(m.mv, c.cv) AS cv"
                f" FROM {x}c{p} c LEFT JOIN {x}m{t} m USING (cent_id))"
            )
    cte += [
        f"fa AS (SELECT v.vec_id, c.cent_id, {d2.format(a='v.h1', b='c.cv')} AS d2"
        f" FROM hv v CROSS JOIN ac{iters} c)",
        f"faa AS (SELECT vec_id, cent_id AS a_id FROM"
        f" (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS r FROM fa)"
        f" WHERE r <= {n_probe})",
        f"fb AS (SELECT v.vec_id, c.cent_id, {d2.format(a='v.h2', b='c.cv')} AS d2"
        f" FROM hv v CROSS JOIN bc{iters} c)",
        "fbb AS (SELECT vec_id, cent_id AS b_id FROM"
        " (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS r FROM fb)"
        " WHERE r = 1)",
        "assign AS (SELECT a.vec_id,"
        " a.a_id * (SELECT c2 FROM grid) + COALESCE(b.b_id, 0) AS bucket"
        " FROM faa a LEFT JOIN fbb b ON a.vec_id = b.vec_id)",
        "cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b"
        " FROM assign x JOIN assign y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)",
        f"pairs AS (SELECT c.id_b FROM cand c JOIN u a ON a.vec_id = c.id_a"
        f" JOIN u b ON b.vec_id = c.id_b WHERE {_COS} >= 0.35)",
    ]
    return (
        "WITH " + ",\n".join(cte) + """
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT id_b FROM pairs)
"""
    )


def q_graph_triangles(spark, sf_dir):
    """Triangle census of the part co-occurrence graph (parts adjacent
    iff some order contains lines of both — the co-purchase graph;
    the supplier analog is complete at every test SF, all-pairs
    co-occur, so parts are the fixture with real structure): node/edge
    counts,
    wedge count, triangle count, global clustering coefficient
    3·T/W — the cohesion profile used for community structure and
    link-spam auditing. The graph-analytics COUNTING tier next to the
    iterative graph_pagerank.

    Algorithm is the degree-ordered orientation form (Chiba-Nishizeki;
    the MapReduce analysis in Suri & Vassilvitskii, WWW 2011): orient
    every undirected edge from its lower to its higher endpoint under
    the total order (degree, id), then count paths a→b→c that close
    with a→c. Why this and not the naive triple-join: out-degree under
    degree-orientation is O(√m), so the wedge join materializes
    O(m^1.5) candidates total regardless of skew — a hub of degree d
    contributes C(d,2) wedges to the NAIVE count but only C(out,2),
    out ≤ O(√m), here. All-integer arithmetic until the final
    coefficient (exact cross-engine). All joins — including the
    degree-frame joins — shuffle on node keys with NO forced
    broadcast: the degree frame is O(#nodes), i.e. it grows with the
    graph, so a F.broadcast hint on it would be a driver/executor OOM
    at 100× (the repo-wide rule: forced broadcasts only on BOUNDED
    sides). AQE still picks a broadcast join at runtime while the
    frame is actually small — the hint bought nothing but the OOM."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("s")
    ).distinct()
    # persist the staged intermediates (optimization round 21, guide
    # §5 — the pagerank round-20 fix applied here): the edge frame `e`
    # (self-join + distinct, the dominant build) feeds deg, the
    # orientation join AND the edge-count agg — the pre-round plan
    # re-derived the lineitem self-join 72-scans deep with zero reuse.
    # deg feeds both orientation sides + the wedge agg; the oriented
    # frame `o` feeds the neighbor-array agg and the per-edge probe.
    # All are the operator's O(m)-narrow staged tables; persists
    # materialize inside the single returned action.
    e = (
        li.alias("a")
        .join(li.alias("b"), "k")
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .persist()
    )
    # adjacency-intersection evaluation of the SAME count the oracle's
    # wedge/EXISTS form computes: a triangle {u,v,w} (w highest in the
    # (deg,id) order) is found exactly once as w ∈ N⁺(u) ∩ N⁺(v) for
    # the oriented edge u→v. Materializing per-NODE sorted out-neighbor
    # arrays (≤ O(√m) long under degree orientation) and intersecting
    # per EDGE ships m array-payload rows through two node-keyed
    # shuffles, instead of exploding the O(m^1.5) wedge rows through an
    # exchange — measured 3.5x faster at sf0.1 (14.0 → 4.0 s quiet min-of-2), same
    # asymptotics, all work inside codegen (array_intersect).
    nbrs = o.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nb")
    ).persist()
    per_edge = (
        o.join(nbrs.select(F.col("src"), F.col("nb").alias("nb_u")), "src")
        .join(
            nbrs.select(F.col("src").alias("dst"), F.col("nb").alias("nb_v")),
            "dst",
            "left",
        )
        .select(
            F.size(
                F.array_intersect("nb_u", F.coalesce("nb_v", F.array()))
            ).alias("t")
        )
    )
    stats = (
        deg.agg(
            F.count("*").alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
            .cast("bigint")
            .alias("n_wedges"),
        )
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(per_edge.agg(F.sum("t").alias("n_triangles")))
    )
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("clustering"),
    )


SQL_GRAPH_TRIANGLES = """
WITH li AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS s FROM lineitem),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM li a JOIN li b ON a.k = b.k AND a.s < b.s),
deg AS (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node),
o AS (
  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS dst
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
wedge AS (
  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
  FROM o e1 JOIN o e2 ON e1.dst = e2.src),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM wedge w WHERE EXISTS (
    SELECT 1 FROM o WHERE o.src = w.x AND o.dst = w.z)),
stats AS (
  SELECT COUNT(*) AS n_nodes,
         CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
  FROM deg)
SELECT stats.n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       stats.n_wedges,
       tri.n_triangles,
       round(3.0 * tri.n_triangles / stats.n_wedges, 6) AS clustering
FROM stats CROSS JOIN tri
"""


def q_graph_pagerank(spark, sf_dir):
    """PageRank (Brin & Page 1998; damping 0.85, 3 FIXED power
    iterations) over the customer↔supplier bipartite trade graph —
    the iterative GRAPH-processing tier next to the iterative-relational
    kmeans_centroids and bpe_train_merges: authority scoring of this
    kind weights sources in training-data pipelines (domain authority)
    and the fixed iteration count keeps the whole computation
    unrollable as oracle CTEs, the same discipline as those entries.
    Graph: distinct (customer, supplier) pairs that traded (lineitem ⋈
    orders), namespaced even/odd and doubled into both directions.
    Each iteration is the standard distributed PR step: one equi-join
    of the edge list with the current rank frame on src (ranks and
    degrees are node-cardinality — shuffle joins, never broadcast), a
    partial-agg SUM of r/outdeg per dst, and the damping update; the
    rank frame localCheckpoints per round to keep lineage flat (the
    _lloyd_iterations pattern). No dangling-node term is needed —
    every node in the doubled bipartite graph has outdegree ≥ 1.
    Output is round(rank·N, 6): scaling by N puts values at O(1) so
    6-decimal rounding preserves resolution, and rounding keeps the
    engines' last-ulp summation-order differences from reaching the
    hash (float-sum discipline as elsewhere)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # round 10: the power-iteration loop moved to functions/graph.py::
    # pagerank — the generalized operator adds dangling-mass
    # redistribution (a no-op here: every node of the doubled bipartite
    # graph has outdegree ≥ 1, detected upfront so the loop stays
    # 3-shuffle) and an iterate-until-converged mode (tol=...; this
    # entry keeps tol=None + 3 fixed iterations so the oracle stays the
    # unrolled CTE chain). teleport=0.15 passes the oracle's exact
    # literal (1.0 − 0.85 is 0.15000000000000002 in IEEE — a 1-ulp seed
    # divergence the parity discipline refuses on principle).
    from .functions.graph import pagerank

    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iters=3, teleport=0.15)
    n = ranks.count()
    return ranks.select("node", F.round(F.col("r") * n, 6).alias("scaled_rank"))


def _sql_pagerank(iters: int = 3) -> str:
    cte = [
        """pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "edges AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        "r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)",
    ]
    for k in range(1, iters + 1):
        cte.append(
            f"""r{k} AS (
  SELECT d.src AS node,
         0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(x.acc, 0) AS r
  FROM deg d LEFT JOIN (
    SELECT e.dst AS nd, SUM(p.r * (1.0 / dg.outdeg)) AS acc
    FROM edges e JOIN r{k - 1} p ON e.src = p.node
                 JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst) x ON x.nd = d.src)"""
        )
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT node, round(r * (SELECT n FROM nn), 6) AS scaled_rank FROM r{iters}"
    )


def q_scd2_merge(spark, sf_dir):
    """Slowly-changing-dimension type-2 MERGE — the warehouse upsert
    shape (close the old version, append the new, insert unseen keys)
    that every dimension-maintenance pipeline runs; previously absent
    from the registry. The change batch is synthesized deterministically
    from the dimension itself (every s_suppkey % 7 == 0 re-arrives with
    acctbal + 100; five NEW suppliers arrive above the current max key
    with key-derived balances), standing in for a CDC feed — the
    contract assumes upstream CDC already dropped no-op rows, so no
    value-equality squash is needed (both engines share that contract).
    Plan: ONE full-outer equi-join of dimension and batch on the key,
    each joined row classified and exploded into its 1-or-2 SCD2 output
    rows (insert → v1 current; unmatched dim → v1 current; update →
    v1 closed + v2 current) — no second pass over the dimension, no
    fan-out beyond the 2-row update case; the max-key anchor is the
    same narrow runtime-stat agg the adaptive-grid operators use. The
    oracle phrases the identical result as two LEFT-join UNION branches
    (set-equal by construction)."""
    supp = load_table(spark, sf_dir, "supplier")
    mx = int(supp.agg(F.max("s_suppkey")).first()[0])
    dim = supp.select(F.col("s_suppkey").alias("k"), F.col("s_acctbal").alias("v"))
    chg = dim.filter(F.col("k") % 7 == 0).select("k", (F.col("v") + 100).alias("v")).unionAll(
        spark.range(1, 6).select(
            (F.lit(mx) + F.col("id")).alias("k"),
            (((F.lit(mx) + F.col("id")) * 37) % 9000).cast("double").alias("v"),
        )
    )
    d, c = dim.alias("d"), chg.alias("c")

    def row(k, v, ver, cur):
        return F.struct(
            k.alias("k"), v.alias("v"),
            F.lit(ver).cast("int").alias("version"), F.lit(cur).alias("is_current"),
        )

    rows = (
        F.when(F.col("c.k").isNull(), F.array(row(F.col("d.k"), F.col("d.v"), 1, True)))
        .when(F.col("d.k").isNull(), F.array(row(F.col("c.k"), F.col("c.v"), 1, True)))
        .otherwise(
            F.array(
                row(F.col("d.k"), F.col("d.v"), 1, False),
                row(F.col("c.k"), F.col("c.v"), 2, True),
            )
        )
    )
    return (
        d.join(c, F.col("d.k") == F.col("c.k"), "full_outer")
        .select(F.explode(rows).alias("r"))
        .select(
            F.col("r.k").alias("s_suppkey"),
            F.col("r.v").alias("acctbal"),
            F.col("r.version").alias("version"),
            F.col("r.is_current").alias("is_current"),
        )
    )


SQL_SCD2_MERGE = """
WITH dim AS (SELECT s_suppkey AS k, s_acctbal AS v FROM supplier),
chg AS (SELECT k, v + 100 AS v FROM dim WHERE k % 7 = 0
        UNION ALL
        SELECT mx + i AS k, CAST(((mx + i) * 37) % 9000 AS DOUBLE) AS v
        FROM (SELECT MAX(s_suppkey) AS mx FROM supplier), range(1, 6) t(i))
SELECT d.k AS s_suppkey, d.v AS acctbal, CAST(1 AS INT) AS version,
       (c.k IS NULL) AS is_current
FROM dim d LEFT JOIN chg c ON d.k = c.k
UNION ALL
SELECT c.k, c.v, CAST(CASE WHEN d.k IS NULL THEN 1 ELSE 2 END AS INT), TRUE
FROM chg c LEFT JOIN dim d ON c.k = d.k
"""


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix — the classic product-analytics shape
    next to events_funnel/activity_streaks: users are cohorted by the
    week of their FIRST activity, and each cell counts distinct users
    from cohort week C still active at week offset K. Plan: one
    distinct (user, week) pass (partial-agg), a per-user min-week agg
    (partial-agg on the same narrow rows), one equi-join back on
    user_id — a SHUFFLE join, the cohort frame is user-cardinality and
    never broadcast — then a two-phase countDistinct per (cohort,
    offset) cell. The offset is integer-exact: both timestamps are
    week-truncated (Monday), so the day difference is always a
    multiple of 7 and days/7 carries no float; the cohort week is
    emitted as a formatted string so both engines hash the same value
    regardless of date/timestamp type width."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    acts = ev.select("user_id", wk.alias("w")).distinct()
    cohort = acts.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        acts.join(cohort, "user_id")
        .select(
            "user_id",
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH acts AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
cohort AS (SELECT user_id, MIN(w) AS cw FROM acts GROUP BY user_id)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cw, a.w) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM acts a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


def q_events_funnel(spark, sf_dir):
    """Conversion funnel: per user, first signup and first purchase
    after it; converted = that purchase lands within 24 HOURS of the
    signup (round-10 signal-audit fix: without the window, every user
    at this event density converts and the flag was constant True —
    the 24 h bound splits 6/15 at sf0.001, 57/150 at sf0.01, so both
    funnel outcomes are live at the gate; signed_up remains
    data-dependent and is constant at this density — that is the
    corpus, not a dead predicate: it shares the hash with the live
    columns). Two conditional min-aggregations over one shuffle — no
    self-join; the window check is integer-ms arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    win_ms = 24 * 3600 * 1000
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", ms)).alias("first_signup_ms"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", ms.alias("p_ms"))
        .join(per_user, "user_id")
        .filter(F.col("p_ms") >= F.col("first_signup_ms"))
        .groupBy("user_id")
        .agg(F.min("p_ms").alias("first_purchase_ms"))
    )
    lag = F.col("first_purchase_ms") - F.col("first_signup_ms")
    conv = F.coalesce(lag <= win_ms, F.lit(False))
    return (
        per_user.join(purch, "user_id", "left")
        .select(
            "user_id",
            F.col("first_signup_ms").isNotNull().alias("signed_up"),
            conv.alias("converted"),
            F.when(conv, lag).alias("ms_to_convert"),
        )
    )


SQL_EVENTS_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
    MIN(epoch_ms(CAST(ts AS TIMESTAMP))) FILTER (event_type = 'signup') AS first_signup_ms
  FROM events GROUP BY user_id),
purch AS (
  SELECT e.user_id, MIN(epoch_ms(CAST(e.ts AS TIMESTAMP))) AS first_purchase_ms
  FROM events e JOIN per_user p ON e.user_id = p.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_ms(CAST(e.ts AS TIMESTAMP)) >= p.first_signup_ms
  GROUP BY e.user_id)
SELECT p.user_id,
  first_signup_ms IS NOT NULL AS signed_up,
  COALESCE(first_purchase_ms - first_signup_ms <= 86400000, FALSE) AS converted,
  CASE WHEN COALESCE(first_purchase_ms - first_signup_ms <= 86400000, FALSE)
       THEN first_purchase_ms - first_signup_ms END AS ms_to_convert
FROM per_user p LEFT JOIN purch ON p.user_id = purch.user_id
"""


def q_window_distribution(spark, sf_dir):
    """Distribution window functions: percent_rank, cume_dist,
    dense_rank over order totals per status."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


SQL_WINDOW_DISTRIBUTION = """
SELECT o_orderkey, o_orderstatus,
  round(percent_rank() OVER w, 9) AS pct_rank,
  round(cume_dist() OVER w, 9) AS cume,
  dense_rank() OVER w AS drank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


def q_null_handling(spark, sf_dir):
    """Null-handling function sweep: coalesce/nullif/nvl2-shape/
    null-safe equality."""
    ev = load_table(spark, sf_dir, "events")
    dedup_id = F.nullif(F.col("event_type"), F.lit("view"))
    return ev.select(
        "event_id",
        F.coalesce(dedup_id, F.lit("(none)")).alias("id_or_default"),
        dedup_id.isNull().alias("is_view"),
        F.when(dedup_id.isNotNull(), F.lit("keyed")).otherwise(F.lit("passthrough")).alias(
            "route"
        ),
        dedup_id.eqNullSafe(F.lit("error")).alias("is_error_nullsafe"),
    )


SQL_NULL_HANDLING = """
SELECT event_id,
  coalesce(nullif(event_type, 'view'), '(none)') AS id_or_default,
  nullif(event_type, 'view') IS NULL AS is_view,
  CASE WHEN nullif(event_type, 'view') IS NOT NULL THEN 'keyed'
       ELSE 'passthrough' END AS route,
  nullif(event_type, 'view') IS NOT DISTINCT FROM 'error' AS is_error_nullsafe
FROM events
"""


def q_bigram_counts(spark, sf_dir):
    """Corpus word-bigram counts (n-gram generation, top-30).

    Plan shape (optimization round 20): bigrams are built by exploding
    the POSITION sequence and slicing the tokens column in a top-level
    projection — whole-stage codegen — not by exploding a
    transform()-lambda array, which Spark evaluates interpreted per
    element with the tokenizer regex re-run per position (the
    hashed_shingle_frame lesson, measured 3.7× there). Same bigrams,
    same counts; only where the slice is evaluated changes."""
    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import tokenize

    t = docs.select(tokenize("text").alias("toks"))
    n_pos = F.greatest(F.size("toks") - 1, F.lit(0))
    return (
        t.filter(n_pos > 0)
        .select(F.explode(F.sequence(F.lit(1), n_pos)).alias("i"), "toks")
        .select(F.concat_ws(" ", F.slice("toks", F.col("i"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(30)
    )


SQL_BIGRAM_COUNTS = f"""
WITH t AS (SELECT {_TOK} AS toks FROM documents),
b AS (SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS bigram
      FROM t)
SELECT bigram, COUNT(*) AS n FROM b
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30
"""


def q_clean_pipeline(spark, sf_dir):
    """Composed cleaning pipeline — the operators in series, as a real
    corpus job would run them: quality-filter → exact-dedup by
    fingerprint (keep min doc_id) → per-language stats. One narrow
    stage + two shuffles end to end."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    from .functions.text import tokenize

    toks = tokenize("text")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    scored = docs.select(
        "doc_id", "lang", "text", n_tok.alias("n_tokens"), ttr.alias("ttr")
    ).filter((F.col("n_tokens") >= 10) & (F.col("ttr") >= 0.3))
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = Window.partitionBy(fp).orderBy("doc_id")
    deduped = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


SQL_CLEAN_PIPELINE = f"""
WITH scored AS (
  SELECT doc_id, lang, text, len({_TOK}) AS n_tokens,
         CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK}) AS ttr
  FROM documents),
filtered AS (SELECT * FROM scored WHERE n_tokens >= 10 AND ttr >= 0.3),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
      ORDER BY doc_id) AS rn
    FROM filtered) WHERE rn = 1)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM deduped GROUP BY lang
"""


def q_udf_normalize(spark, sf_dir):
    """The pandas-UDF extension surface, oracle-checked: vectorized
    normalize (lower/trim/collapse-ws) + md5 of the normalized text.
    The oracle reproduces the normalization in plain SQL — the UDF's
    output contract is what's checked, not its implementation."""
    from .functions.udf import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select("doc_id", F.md5(norm).alias("norm_md5"), F.length(norm).alias("norm_len"))


SQL_UDF_NORMALIZE = r"""
SELECT doc_id,
  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS norm_md5,
  length(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS norm_len
FROM documents
"""


def q_ann_hyperplane(spark, sf_dir):
    """Random-hyperplane LSH bucket assignment (8-bit angular buckets)."""
    from .functions.similarity import hyperplane_buckets

    return hyperplane_buckets(load_table(spark, sf_dir, "embeddings"))


def _sql_ann_hyperplane() -> str:
    from .functions.similarity import hyperplane_matrix

    planes = hyperplane_matrix(8, 64)
    terms = []
    for p, plane in enumerate(planes):
        lits = ", ".join(repr(x) for x in plane)
        terms.append(
            f"CASE WHEN list_sum(list_transform(list_zip(dv, [{lits}]),"
            f" p -> p[1] * p[2])) > 0 THEN {1 << p} ELSE 0 END"
        )
    expr = " + ".join(terms)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
           FROM embeddings)
SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM e
"""


SQL_ANN_HYPERPLANE = _sql_ann_hyperplane()


def q_kmeans_centroids(spark, sf_dir):
    """Deterministic Lloyd k-means cluster profile over the embedding
    corpus (k=8, 3 fixed iterations): per cluster, member count and
    mean member-to-centroid cosine (cohesion). The trainer behind
    ivf_topk's real-centroid mode (functions/similarity.py:
    kmeans_centroids). Fully oracle-checked: the fixed iteration count
    makes the training expressible as unrolled CTEs
    (_sql_kmeans_centroids), verified value-identical to DuckDB at
    sf0.001 and sf0.01; quality is additionally pinned by the ≥0.8 IVF
    recall floor test."""
    from .functions.similarity import _codebook_row, _dot, _unit, kmeans_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, k=8, iters=3)
    unit = emb.select("vec_id", _unit(F.col("embedding")).alias("uv"))
    # per-row argmax over the collected codebook array (round 20,
    # guide §2.4): replaces a row_number window that sorted and
    # exchanged all k·n scored rows. Ordering identical: array_max over
    # STRUCT(cs, -cent_id) ≡ rank 1 of (cs DESC, cent_id ASC), NaN
    # largest in both. Two-step select so the array_max struct computes
    # once (CollapseProject keeps non-cheap aliased exprs staged).
    best = F.array_max(
        F.transform(
            F.col("carr"),
            lambda c: F.struct(
                _dot(F.col("uv"), c["cv"]).alias("cs"),
                (-c["cent_id"]).alias("nc"),
                c["cent_id"].alias("cent_id"),
            ),
        )
    )
    assigned = (
        unit.join(F.broadcast(_codebook_row(cents)), how="cross")
        .select("vec_id", best.alias("best"))
        .select("vec_id", F.col("best.cent_id").alias("cent_id"), F.col("best.cs").alias("cs"))
    )
    return assigned.groupBy("cent_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("cs"), 3).alias("cohesion"),
    )


def _sql_kmeans_cte(k: int = 8, iters: int = 3, dim: int = 64) -> tuple[list[str], str]:
    """Unrolled Lloyd-training CTE list for DuckDB (init = first k by
    id, `iters` rounds of argmax-cosine assign → position-wise mean →
    re-normalize → empty cluster keeps previous centroid). Returns the
    CTE list and the name of the final centroid CTE (cent_id, cv) so
    downstream oracles (the kmeans profile, the trained-IVF entry) can
    graft the trained codebook into their own SQL."""
    dot = "list_sum(list_transform(list_zip(u.uv, c.cv), p -> p[1] * p[2]))"
    cte = [
        "u0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv FROM embeddings)",
        "unit AS (SELECT vec_id, list_transform(dv, x -> x / n) AS uv FROM"
        " (SELECT vec_id, dv, sqrt(list_sum(list_transform(dv, x -> x * x))) AS n FROM u0))",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cent_id, uv AS cv FROM unit WHERE vec_id < {k})",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        cte.append(
            f"s{t} AS (SELECT u.vec_id, u.uv, c.cent_id, {dot} AS cs"
            f" FROM unit u CROSS JOIN c{p} c)"
        )
        cte.append(
            f"a{t} AS (SELECT vec_id, uv, cent_id FROM"
            f" (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS r FROM s{t})"
            f" WHERE r = 1)"
        )
        cte.append(
            f"b{t} AS (SELECT cent_id, i AS pos, avg(uv[i]) AS m"
            f" FROM a{t}, (SELECT unnest(range(1, {dim + 1})) AS i) idx"
            f" GROUP BY cent_id, i)"
        )
        cte.append(
            f"m{t} AS (SELECT cent_id, list_transform(l, x -> x / n) AS nv FROM"
            f" (SELECT cent_id, list(m ORDER BY pos) AS l,"
            f" sqrt(list_sum(list_transform(list(m ORDER BY pos), x -> x * x))) AS n"
            f" FROM b{t} GROUP BY cent_id))"
        )
        cte.append(
            f"c{t} AS (SELECT c.cent_id, COALESCE(m.nv, c.cv) AS cv"
            f" FROM c{p} c LEFT JOIN m{t} m USING (cent_id))"
        )
    return cte, f"c{iters}"


def _sql_kmeans_centroids(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Cluster-profile mirror of q_kmeans_centroids on top of the
    unrolled training CTEs: final argmax assignment, then per-cluster
    member count and mean member-to-centroid cosine.
    Float note: per-element sums/avgs differ from Spark by ≤1 ulp;
    assignments only flip if two centroid cosines are within ~1e-15 —
    never observed on the testdata (verified at sf0.001 and sf0.01, the
    driver's gate scale). Output cohesion is round(.,3), far inside the
    drift margin."""
    dot = "list_sum(list_transform(list_zip(u.uv, c.cv), p -> p[1] * p[2]))"
    cte, cents = _sql_kmeans_cte(k, iters, dim)
    cte = list(cte)
    final = iters + 1
    cte.append(
        f"s{final} AS (SELECT u.vec_id, c.cent_id, {dot} AS cs"
        f" FROM unit u CROSS JOIN {cents} c)"
    )
    cte.append(
        f"a{final} AS (SELECT vec_id, cent_id, cs FROM"
        f" (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS r FROM s{final})"
        f" WHERE r = 1)"
    )
    return (
        "WITH " + ",\n".join(cte) + f"""
SELECT cent_id, COUNT(*) AS n_members, round(avg(cs), 3) AS cohesion
FROM a{final} GROUP BY cent_id
"""
    )


def q_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: per-user consecutive-active-day streaks via the
    classic day − row_number island key (no self-join, no recursion —
    one shuffle on user_id for the window, one for the final agg).
    Output: per-user active days, number of streaks, longest streak."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", F.date_sub(F.col("d"), F.row_number().over(w)).alias("island")
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("len")
    )
    return per_island.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


SQL_ACTIVITY_STREAKS = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
r AS (SELECT user_id, d,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days),
g AS (SELECT user_id, d - CAST(rn AS INTEGER) AS island, CAST(count(*) AS BIGINT) AS len
      FROM r GROUP BY user_id, island)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM g GROUP BY user_id
"""


def q_value_histogram(spark, sf_dir):
    """Equi-width histogram of events.value in 20 bins: scalar min/max
    aggregate broadcast back over the scan (two passes, no global
    sort — the scale-correct histogram; both passes are map-side
    partial aggs). Bin edges computed with the IDENTICAL double
    expression order as the oracle so floor() boundaries agree
    bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ext = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    binned = ev.crossJoin(F.broadcast(ext)).select(
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(19),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * 20
                    / (F.col("vmax") - F.col("vmin"))
                ),
            )
        )
        .cast("bigint")
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").alias("cnt"))


SQL_VALUE_HISTOGRAM = """
WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
ext AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM e)
SELECT CAST(CASE WHEN vmax = vmin THEN 0
            ELSE least(19, floor((value - vmin) * 20 / (vmax - vmin)))
            END AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM e CROSS JOIN ext
GROUP BY bin
"""


def q_mad_outliers(spark, sf_dir):
    """Robust outlier gate over events.value: per event_type MEDIAN and
    MAD (median absolute deviation), then the count and fraction of
    rows with |value − median| > 5·MAD — the data-cleaning filter that
    survives heavy-tailed junk where mean/stddev z-scores break (one
    corrupt 1e12 reading shifts a mean arbitrarily; the median moves by
    at most one rank). The standard robust-scale gate a training-data
    pipeline runs over numeric telemetry before fitting anything.

    Exactness: both medians are EXACT interpolated percentiles,
    bit-equal to Spark's built-in Percentile (two-sided weighting with
    the v1 == v2 short-circuit — the r17-fixed kernel contract). The
    oracle spells out the SAME hybrid rule via _sql_hybrid_pct rather
    than DuckDB's median/quantile_cont, which skips the short-circuit
    and lands an ulp off on duplicated middle values — so med/MAD
    agree bit-for-bit cross-engine and the 5·MAD comparison cannot
    flip a boundary row between engines (strict_float-gated).

    Plan — and WHY not the built-in `median` aggregate: Spark's exact
    percentile buffers every group value in executor memory
    (ObjectHashAggregate); with a handful of event types that is
    per-group O(rows) state — the operator that OOMs at 100 TB. The
    medians here go through operators/relational.py::
    grouped_exact_median instead: a bounded value-HISTOGRAM (two-phase
    count by (type, value)) + cumulative-rank pick through window
    passes over the histogram — state bounded by distinct-value
    cardinality (fixed-precision telemetry ⇒ bounded), no global range
    sort, no value buffering; bit-equality with the built-in is pinned
    by tests/test_operators.py::test_grouped_exact_median_matches_builtin.
    The O(#types) stat frames broadcast back over the scan (guard:
    tests/test_plans.py::test_mad_outliers_no_global_sort). At 100 TB
    the alternative single-pass approx_percentile trades exactness for
    one scan; this entry is the exact tier (the approximate tier is
    q_approx_quantiles)."""
    from .operators.relational import grouped_exact_median

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = grouped_exact_median(ev, ["event_type"], "value", out="med_value")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_value",
        F.abs(F.col("value") - F.col("med_value")).alias("ad"),
    )
    mad = grouped_exact_median(dev, ["event_type"], "ad", out="mad_value")
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.first("med_value").alias("med_value"),
        F.first("mad_value").alias("mad_value"),
        F.sum((F.col("ad") > 5 * F.col("mad_value")).cast("bigint")).alias(
            "n_outliers"
        ),
        (
            F.sum((F.col("ad") > 5 * F.col("mad_value")).cast("bigint"))
            / F.count("*")
        ).alias("outlier_frac"),
    )


SQL_MAD_OUTLIERS = f"""
WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
med AS ({_sql_hybrid_pct("e", ["event_type"], "value",
                         {"med_value": 0.5})}),
dev AS (SELECT e.event_type, m.med_value, abs(e.value - m.med_value) AS ad
        FROM e JOIN med m USING (event_type)),
mad AS ({_sql_hybrid_pct("dev", ["event_type"], "ad",
                         {"mad_value": 0.5})})
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       any_value(d.med_value) AS med_value,
       any_value(m.mad_value) AS mad_value,
       CAST(sum(CASE WHEN d.ad > 5 * m.mad_value THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(sum(CASE WHEN d.ad > 5 * m.mad_value THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS outlier_frac
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def q_mat_view_counts(spark, sf_dir):
    """Incremental materialized aggregate, oracle-checked end-to-end:
    events split into THREE deterministic batches (event_id % 3 — a
    stand-in for stream arrival), each merged into a
    streaming/mat_view.py MaterializedCounts table (bucket-pruned
    upsert, manifest commits), then the COMMITTED table state is read
    back — and must hash-match the oracle's ONE-SHOT groupBy over all
    events. This is the gate that proves the incremental path computes
    the same answer as the batch path no matter how the input was
    batched: counts are integers, totals accumulate as DECIMAL(18,2)
    (associative — double addition is not, and an upsert table
    re-associates sums across batches and merge rounds by design).

    Plan character: three micro-batch merges, each aggregating its
    delta map-side and rewriting ONLY the buckets the delta touches
    (untouched buckets carry forward by reference in the manifest) —
    merge cost O(hot buckets), not O(table), which is what makes a
    100 TB materialized view maintainable. The table lives under a
    fresh temp dir per run (state, not fixture); because the returned
    DataFrame reads it LAZILY, cleanup is deferred to process exit
    (atexit) rather than an eager rmtree that would break a later
    collect."""
    import atexit
    import shutil
    import tempfile

    from .streaming.mat_view import MaterializedCounts

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = tempfile.mkdtemp(prefix="mat_view_counts_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = MaterializedCounts(
        path,
        keys=("user_id",),
        value_col="value",
        n_buckets=8,
    )
    for i in range(3):
        table.apply_batch(ev.filter(F.col("event_id") % 3 == i), i)
    return table.read(spark).select(
        "user_id",
        "n",
        F.col("total").cast("double").alias("total"),
    )


SQL_MAT_VIEW_COUNTS = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(COALESCE(CAST(value AS DECIMAL(18,2)),
                         CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS total
FROM events
GROUP BY user_id
"""


def q_cdc_snapshot(spark, sf_dir):
    """CDC apply driven end-to-end: events reinterpreted as a change
    stream (key = user_id, seq = event_id — the log offset, op = 'd'
    on every 10th event id else upsert, payload = event_type), split
    into THREE seq-ordered ranges (the ordered-batch contract a CDC
    log guarantees), each merged into a streaming/cdc_table.py
    CdcTable — then the committed snapshot must hash-match the oracle's
    one-shot "latest change per key, drop deletes" window query. This
    is the last-writer-wins state contract next to mat_view_counts'
    additive one: argmax-by-seq per key instead of a sum, deletes
    erase.

    Plan character per batch: one max_by hash agg of the delta (map-
    side partials — never a window sort over the batch), bucket-pruned
    merge rewriting only delta-touched buckets. The seq-range split
    derives from one bounded collect of max(event_id). Temp-dir state
    is atexit-cleaned (the returned frame reads it lazily)."""
    import atexit
    import shutil
    import tempfile

    from .streaming.cdc_table import CdcTable

    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_id") % 10 == 0, "d").otherwise("u").alias("op"),
        F.col("event_type").alias("payload"),
    )
    hi = changes.agg(F.max("seq")).collect()[0][0] + 1
    path = tempfile.mkdtemp(prefix="cdc_snapshot_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    table = CdcTable(
        path,
        key="user_id",
        n_buckets=8,
    )
    for i in range(3):
        table.apply_batch(
            changes.filter(
                (F.col("seq") >= i * hi / 3) & (F.col("seq") < (i + 1) * hi / 3)
            ),
            i,
        )
    return table.read(spark)


SQL_CDC_SNAPSHOT = """
WITH c AS (
  SELECT user_id, event_id AS seq,
         CASE WHEN event_id % 10 = 0 THEN 'd' ELSE 'u' END AS op,
         event_type AS payload
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM c)
SELECT user_id, seq, payload FROM r WHERE rn = 1 AND op <> 'd'
"""


def q_profile_events(spark, sf_dir):
    """Column profiling: per-column null counts, distinct counts, and
    numeric ranges in one pass — the stats stage before heavy pipeline
    work."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count("event_type").alias("event_type_nonnull"),
        F.countDistinct("event_type").alias("event_type_distinct"),
        F.countDistinct("user_id").alias("user_id_distinct"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        dsum("value").alias("value_sum"),
    )


SQL_PROFILE_EVENTS = """
SELECT COUNT(*) AS n_rows,
  COUNT(event_type) AS event_type_nonnull,
  COUNT(DISTINCT event_type) AS event_type_distinct,
  COUNT(DISTINCT user_id) AS user_id_distinct,
  MIN(value) AS value_min, MAX(value) AS value_max,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
"""


# --------------------------------------------------------------------------
# Multimodal plumbing (binary payload + pandas-UDF decode)
# --------------------------------------------------------------------------


def q_multimodal_meta(spark, sf_dir):
    """Real mapInPandas decode path over a binary payload column; the
    'decode' itself is the deterministic fake (no codec libs here)."""
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return decode_media_meta(docs, decoder="fake")


SQL_MULTIMODAL_META = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
  CAST(64 + CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT) % 1984 AS INT) AS width,
  CAST(64 + CAST(('0x' || substring(md5(text), 5, 4)) AS BIGINT) % 1984 AS INT) AS height,
  'fake/raw' AS format
FROM documents
"""


def q_image_header_meta(spark, sf_dir):
    """REAL image metadata decode under the gate: even-id documents get
    a genuine PNG signature+IHDR synthesized JVM-side (unhex/lpad/hex
    build the big-endian dimension words — no Python in the encode
    path) with dimensions derived from doc_id; odd ids carry non-image
    bytes. decoder='real' (functions.multimodal.parse_image_header)
    must struct-parse the true dimensions back out, and the oracle
    recomputes them arithmetically — so the gate checks the actual
    header parser, not a fake. Non-images degrade to NULL/'unknown'."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(64) + F.col("doc_id") % 512).cast("bigint")
    h = (F.lit(64) + (F.col("doc_id") * 7) % 512).cast("bigint")
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),          # IHDR length = 13
        F.unhex(F.lit("49484452")),          # "IHDR"
        be32(w), be32(h),
        F.unhex(F.lit("0802000000")),        # bit depth / color / crc stub
    )
    payload = F.when(F.col("doc_id") % 2 == 0, png).otherwise(
        F.encode(F.lit("not an image"), "utf-8")
    )
    return decode_media_meta(docs.withColumn("payload", payload), decoder="real")


SQL_IMAGE_HEADER_META = """
SELECT doc_id,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 29 ELSE 12 END AS BIGINT) AS byte_len,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id % 512 END AS INT) AS width,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 64 + (doc_id * 7) % 512 END AS INT) AS height,
  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'unknown' END AS format
FROM documents
"""


# Byte-construction helpers for the JVM-side container synthesis used
# by the header-decode gates (audio/video): integer columns → exact
# big/little-endian byte strings, zero runs, ASCII tags. Shared so a
# fix (e.g. odd-width hex) lands in every synthesized-container gate.
def _syn_le(c, hexw):
    # little-endian byte string of an integer column: fixed-width hex,
    # then byte-reversed pairs, then unhex
    h = F.lpad(F.hex(c), hexw, "0")
    return F.unhex(F.concat(*[F.substring(h, i, 2) for i in range(hexw - 1, 0, -2)]))


def _syn_be(c, hexw):
    return F.unhex(F.lpad(F.hex(c), hexw, "0"))


def _syn_zeros(nb):
    return F.unhex(F.lit("00" * nb))


def _syn_ascii(s):
    return F.encode(F.lit(s), "utf-8")


def q_audio_header_meta(spark, sf_dir):
    """REAL audio metadata decode under the gate (sibling of
    q_image_header_meta), now over ALL FOUR containers: documents get a
    genuine payload synthesized JVM-side — WAV (RIFF + fmt/data chunk
    walk), MP3 (Layer-III frames with real bitrate/samplerate header
    indexes, repeated frame hops), Ogg Vorbis (BOS page carrying the
    identification header + EOS page carrying the granule position),
    FLAC (STREAMINFO with bit-packed rate/channels/bits/total-samples)
    — all built from hex/lpad/byte-reversal expressions with fields
    derived from doc_id, and decode_audio_meta
    (functions.multimodal.parse_audio_header) must walk each container
    back out, including DURATION for every format. The oracle
    recomputes every field arithmetically, so the gate checks the
    actual chunk/page/frame walkers bit-for-bit. doc_id % 8 == 7 rows
    carry non-audio bytes and degrade to NULL/'unknown'."""
    from .functions.multimodal import decode_audio_meta

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")

    le, be, zeros, ascii_ = _syn_le, _syn_be, _syn_zeros, _syn_ascii

    # --- WAV (doc_id % 4 == 0): canonical 44-byte RIFF header ---
    wch = F.when(d % 8 == 0, 1).otherwise(2).cast("bigint")
    wsr = (8000 * (1 + d % 3)).cast("bigint")
    wba = wch * 2  # block align: channels × 2 bytes (16-bit samples)
    wns = (160 + d % 320).cast("bigint")
    wds = wns * wba  # declared data-chunk size
    wav = F.concat(
        ascii_("RIFF"), le(wds + 36, 8), ascii_("WAVE"),
        ascii_("fmt "), le(F.lit(16), 8),
        le(F.lit(1), 4), le(wch, 4), le(wsr, 8), le(wsr * wba, 8),
        le(wba, 4), le(F.lit(16), 4),
        ascii_("data"), le(wds, 8),
    )

    # --- MP3 (doc_id % 4 == 1): k genuine Layer-III frames, 128 kbit/s,
    # header byte2 = bitrate idx 9 << 4 | samplerate idx << 2 ---
    msr = F.when(d % 8 == 1, 44100).otherwise(32000).cast("bigint")
    mch = F.when(d % 3 == 0, 1).otherwise(2).cast("bigint")
    mk = (2 + d % 3).cast("int")
    mflen = (144 * 128000 / msr).cast("bigint")  # 417 @44100, 576 @32000
    frame_hex = F.concat(
        F.lit("FFFB"),
        F.when(d % 8 == 1, F.lit("90")).otherwise(F.lit("98")),
        F.when(d % 3 == 0, F.lit("C0")).otherwise(F.lit("00")),
        F.repeat(F.lit("00"), (mflen - 4).cast("int")),
    )
    mp3 = F.unhex(F.repeat(frame_hex, mk))

    # --- Ogg Vorbis (doc_id % 4 == 2): BOS page with the 30-byte
    # identification header, EOS page with the total-sample granule ---
    osr = (16000 * (1 + d % 3)).cast("bigint")
    och = F.when(d % 8 == 2, 1).otherwise(2).cast("bigint")
    og = (1000 + d % 4000).cast("bigint")  # granule = total PCM samples
    ogg = F.concat(
        # page 1: "OggS" v0 type BOS, granule 0, serial/seq/crc 0, 1 seg of 30
        ascii_("OggS"), F.unhex(F.lit("0002")), zeros(8), zeros(12),
        F.unhex(F.lit("011E")),
        F.unhex(F.lit("01")), ascii_("vorbis"), zeros(4), le(och, 2), le(osr, 8),
        zeros(12), zeros(1), F.unhex(F.lit("01")),
        # page 2: type EOS, granule = total samples, 1 seg of 1 byte
        ascii_("OggS"), F.unhex(F.lit("0004")), le(og, 16), zeros(12),
        F.unhex(F.lit("0101")), zeros(1),
    )

    # --- FLAC (doc_id % 8 == 3): STREAMINFO — the 8 bytes at offset 18
    # pack sr(20) | channels-1(3) | bits-1(5) | total_samples(36) ---
    fsr = F.when(d % 16 == 3, 22050).otherwise(48000).cast("bigint")
    fch = (1 + d % 3).cast("bigint")
    fts = (5000 + d % 9000).cast("bigint")
    packed = (
        fsr * F.lit(2**44).cast("bigint")
        + (fch - 1) * F.lit(2**41).cast("bigint")
        + F.lit(15 * 2**36).cast("bigint")  # bits-1 = 15 (16-bit)
        + fts
    )
    flac = F.concat(
        ascii_("fLaC"), F.unhex(F.lit("80000022")),
        F.unhex(F.lit("10001000")), zeros(6), be(packed, 16), zeros(16),
    )

    payload = (
        F.when(d % 4 == 0, wav)
        .when(d % 4 == 1, mp3)
        .when(d % 4 == 2, ogg)
        .when(d % 8 == 3, flac)
        .otherwise(ascii_("not audio"))
    )
    return decode_audio_meta(docs.withColumn("payload", payload))


# every field recomputed arithmetically per container: the parser's
# floor divisions reduce exactly to the formulas below (WAV:
# data_size*1000 // byte_rate == n_samples*1000 // sample_rate — the
# block-align factor cancels under floor division; MP3: k frames ×
# 1152 samples; Ogg: granule = total samples; FLAC: total_samples)
SQL_AUDIO_HEADER_META = """
SELECT doc_id,
  CAST(CASE doc_id % 4 WHEN 0 THEN 44
       WHEN 1 THEN (2 + doc_id % 3) *
            (CASE WHEN doc_id % 8 = 1 THEN 417 ELSE 576 END)
       WHEN 2 THEN 87
       ELSE CASE WHEN doc_id % 8 = 3 THEN 42 ELSE 9 END END AS BIGINT)
    AS byte_len,
  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 * (1 + doc_id % 3)
       WHEN 1 THEN CASE WHEN doc_id % 8 = 1 THEN 44100 ELSE 32000 END
       WHEN 2 THEN 16000 * (1 + doc_id % 3)
       ELSE CASE WHEN doc_id % 8 = 3 THEN
            CASE WHEN doc_id % 16 = 3 THEN 22050 ELSE 48000 END END END AS INT)
    AS sample_rate,
  CAST(CASE doc_id % 4 WHEN 0 THEN CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 2 END
       WHEN 1 THEN CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END
       WHEN 2 THEN CASE WHEN doc_id % 8 = 2 THEN 1 ELSE 2 END
       ELSE CASE WHEN doc_id % 8 = 3 THEN 1 + doc_id % 3 END END AS INT)
    AS channels,
  CAST(CASE WHEN doc_id % 4 = 0 THEN 16
       WHEN doc_id % 8 = 3 THEN 16 END AS INT) AS bits,
  CAST(CASE doc_id % 4
       WHEN 0 THEN ((160 + doc_id % 320) * 1000) // (8000 * (1 + doc_id % 3))
       WHEN 1 THEN ((2 + doc_id % 3) * 1152 * 1000) //
            (CASE WHEN doc_id % 8 = 1 THEN 44100 ELSE 32000 END)
       WHEN 2 THEN ((1000 + doc_id % 4000) * 1000) // (16000 * (1 + doc_id % 3))
       ELSE CASE WHEN doc_id % 8 = 3 THEN ((5000 + doc_id % 9000) * 1000) //
            (CASE WHEN doc_id % 16 = 3 THEN 22050 ELSE 48000 END) END END AS BIGINT)
    AS duration_ms,
  CASE doc_id % 4 WHEN 0 THEN 'wav' WHEN 1 THEN 'mp3' WHEN 2 THEN 'ogg'
       ELSE CASE WHEN doc_id % 8 = 3 THEN 'flac' ELSE 'unknown' END END AS format
FROM documents
"""


def q_wav_pcm_stats(spark, sf_dir):
    """CONTENT-level media decode under the gate (r8 verdict item 6) —
    the step past q_audio_header_meta's header walk: the synthesized
    WAV payloads carry ACTUAL 16-bit PCM sample data (mono, 160 +
    doc_id % 320 samples; sample i is the deterministic waveform
    u = (doc_id·31 + i·7919) mod 2¹⁶ reinterpreted signed — built
    JVM-side as per-sample little-endian hex via transform/array_join,
    one unhex), and functions.multimodal.parse_wav_pcm must chunk-walk
    to the data chunk, reinterpret the bytes as int16, and report
    sample statistics (count/min/max/mean). The oracle regenerates the
    same waveform with a lateral range() and aggregates it — so the
    gate checks the byte-level sample decode, not just header fields,
    retiring the 'content decode is a stub' caveat for the audio
    modality (pixel/sample decode of COMPRESSED codecs still needs
    codec libs this container lacks). doc_id % 8 == 7 rows carry
    non-audio bytes and degrade to NULLs."""
    from .functions.multimodal import decode_wav_pcm_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_wav_pcm_stats(docs.withColumn("payload", _syn_wav_payload()))


def _syn_wav_payload():
    """The shared sample-carrying WAV synthesis (see q_wav_pcm_stats
    docstring): one Column expression, reused by the PCM-stats and
    decimation entries so both gates decode the same bytes."""
    d = F.col("doc_id")
    le, ascii_ = _syn_le, _syn_ascii

    wns = (160 + d % 320).cast("bigint")
    wds = wns * 2  # mono 16-bit: 2 bytes per sample

    def hexle16(u):
        h = F.lpad(F.hex(u), 4, "0")
        return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))

    pcm_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), wns - 1),
            lambda i: hexle16((d * 31 + i * 7919) % 65536),
        ),
        "",
    )
    wav = F.concat(
        ascii_("RIFF"), le(wds + 36, 8), ascii_("WAVE"),
        ascii_("fmt "), le(F.lit(16), 8),
        le(F.lit(1), 4), le(F.lit(1), 4), le(F.lit(16000), 8),
        le(F.lit(32000), 8), le(F.lit(2), 4), le(F.lit(16), 4),
        ascii_("data"), le(wds, 8),
        F.unhex(pcm_hex),
    )
    return F.when(d % 8 == 7, ascii_("not audio")).otherwise(wav)


def q_wav_decimate(spark, sf_dir):
    """CONTENT-level audio RESAMPLE under the gate — decimation by 2
    (every second sample; output rate 8000 from the synthesized 16000)
    over the same real-PCM WAVs as q_wav_pcm_stats, by
    functions.multimodal.decimate_wav_pcm: the audio sibling of
    q_bmp_resize, so BOTH codec-free modalities now have a real
    decode→transform step, not just decode→stats. The oracle
    regenerates the even-index subsequence arithmetically
    (generate_series step 2) and checks the output rate, count, and
    envelope statistics — a decoder that keeps odd samples or
    mis-reads the fmt rate diverges. doc_id % 8 == 7 degrades to
    NULLs."""
    from .functions.multimodal import decimate_wav_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decimate_wav_stats(docs.withColumn("payload", _syn_wav_payload()))


SQL_WAV_DECIMATE = """
WITH base AS (SELECT doc_id, 160 + doc_id % 320 AS n FROM documents),
s AS (
  SELECT doc_id, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp
  FROM (SELECT doc_id,
               (doc_id * 31 + unnest(generate_series(0, n - 1, 2)) * 7919)
                 % 65536 AS u
        FROM base WHERE doc_id % 8 != 7))
SELECT doc_id, CAST(8000 AS INT) AS out_rate, COUNT(*) AS n_samples,
       CAST(MIN(smp) AS INT) AS s_min, CAST(MAX(smp) AS INT) AS s_max,
       round(CAST(SUM(smp) AS DOUBLE) / COUNT(*), 6) AS s_mean
FROM s GROUP BY doc_id
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL, NULL FROM base WHERE doc_id % 8 = 7
"""


# the oracle re-generates the waveform arithmetically (lateral range()
# per document) and aggregates — int64-exact sum, one double division,
# matching parse_wav_pcm's numpy reduction bit-for-bit
SQL_WAV_PCM_STATS = """
WITH base AS (SELECT doc_id, 160 + doc_id % 320 AS n FROM documents),
s AS (
  SELECT doc_id, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS smp
  FROM (SELECT doc_id,
               (doc_id * 31 + unnest(generate_series(0, n - 1)) * 7919) % 65536 AS u
        FROM base WHERE doc_id % 8 != 7))
SELECT doc_id, COUNT(*) AS n_samples,
       CAST(MIN(smp) AS INT) AS s_min, CAST(MAX(smp) AS INT) AS s_max,
       round(CAST(SUM(smp) AS DOUBLE) / COUNT(*), 6) AS s_mean
FROM s GROUP BY doc_id
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL FROM base WHERE doc_id % 8 = 7
"""


def q_bmp_pixel_stats(spark, sf_dir):
    """CONTENT-level IMAGE decode under the gate — the pixel-array
    sibling of q_wav_pcm_stats (r8 verdict item 6, second modality):
    documents get a genuine uncompressed 24-bit BMP synthesized
    JVM-side with REAL pixel data — width 4 + doc_id % 5, height
    3 + doc_id % 4, channel byte (x, y, c) = (doc_id·7 + y·131 + x·31
    + c·17) mod 256, rows stored BOTTOM-UP with 4-byte stride padding
    per the BMP spec (nested transform/sequence builds the row hex,
    one unhex) — and functions.multimodal.parse_bmp_pixels must walk
    the header to the pixel offset, un-flip the rows, skip the padding,
    and report per-channel means plus the order-sensitive weighted
    checksum wsum = Σ (y·w + x + 1)(b+g+r), which the oracle recomputes
    over a double generate_series — a decoder that forgets the row flip
    or the stride produces a different wsum, so the gate checks the
    byte-level pixel layout, not just aggregate luck. doc_id % 8 == 7
    rows carry non-BMP bytes and degrade to NULLs."""
    from .functions.multimodal import decode_bmp_pixel_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_bmp_pixel_stats(docs.withColumn("payload", _syn_bmp_payload()))


def _syn_bmp_payload():
    """The shared pixel-carrying BMP synthesis (see q_bmp_pixel_stats
    docstring for the layout): one Column expression, reused by the
    pixel-stats and resize entries so both gates decode the same
    bytes."""
    d = F.col("doc_id")
    le, zeros, ascii_ = _syn_le, _syn_zeros, _syn_ascii

    w = (4 + d % 5).cast("bigint")
    h = (3 + d % 4).cast("bigint")
    stride = ((w * 3 + 3) / 4).cast("bigint") * 4
    img_size = stride * h

    def hex2(v):
        return F.lpad(F.hex(v), 2, "0")

    def chan(x, y, c):
        return (d * 7 + y * 131 + x * 31 + F.lit(c * 17)) % 256

    pad_hex = F.repeat(F.lit("00"), (stride - w * 3).cast("int"))
    pixels_hex = F.array_join(
        F.transform(
            F.sequence(h - 1, F.lit(0).cast("bigint"), F.lit(-1).cast("bigint")),
            lambda y: F.concat(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0).cast("bigint"), w - 1),
                        lambda x: F.concat(
                            hex2(chan(x, y, 0)), hex2(chan(x, y, 1)), hex2(chan(x, y, 2))
                        ),
                    ),
                    "",
                ),
                pad_hex,
            ),
        ),
        "",
    )
    bmp = F.concat(
        ascii_("BM"), le(img_size + 54, 8), zeros(4), le(F.lit(54), 8),
        le(F.lit(40), 8), le(w, 8), le(h, 8), le(F.lit(1), 4), le(F.lit(24), 4),
        le(F.lit(0), 8), le(img_size, 8), zeros(16),
    )
    return F.when(d % 8 == 7, ascii_("not a bitmap")).otherwise(
        F.concat(bmp, F.unhex(pixels_hex))
    )


SQL_BMP_PIXEL_STATS = """
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents),
px AS (
  SELECT doc_id, w, h, y, unnest(generate_series(0, w - 1)) AS x
  FROM (SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS y
        FROM base WHERE doc_id % 8 != 7)),
ch AS (SELECT doc_id, w, h, y, x,
         (doc_id*7 + y*131 + x*31) % 256 AS b,
         (doc_id*7 + y*131 + x*31 + 17) % 256 AS g,
         (doc_id*7 + y*131 + x*31 + 34) % 256 AS r
       FROM px)
SELECT doc_id, CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
       COUNT(*) AS n_px,
       round(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS mean_b,
       round(CAST(SUM(g) AS DOUBLE) / COUNT(*), 6) AS mean_g,
       round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_r,
       SUM((y*w + x + 1) * (b + g + r)) AS wsum
FROM ch GROUP BY doc_id
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
FROM base WHERE doc_id % 8 = 7
"""


def q_bmp_resize(spark, sf_dir):
    """CONTENT-level image RESIZE under the gate — completes the
    brief's decode / feature-extract / resize / frame-sample quartet
    with a REAL resize for the uncompressed modality (compressed-codec
    resize remains the documented env stub): the same synthesized
    pixel-carrying BMPs as q_bmp_pixel_stats, downsampled 2×
    nearest-neighbor (target (x, y) samples source (2x, 2y)) by
    functions.multimodal.resize_bmp_nn, which must walk the layout,
    un-flip bottom-up rows, skip stride padding, and sample the RIGHT
    source coordinates — the oracle regenerates the sampled raster
    arithmetically over a double generate_series and checks the
    resized dimensions, per-channel means, and the order-sensitive
    positional checksum. doc_id % 8 == 7 rows degrade to NULLs."""
    from .functions.multimodal import resize_bmp_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return resize_bmp_stats(docs.withColumn("payload", _syn_bmp_payload()))


SQL_BMP_RESIZE = """
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents),
dims AS (SELECT doc_id, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh FROM base),
px AS (
  SELECT doc_id, ow, oh, y, unnest(generate_series(0, ow - 1)) AS x
  FROM (SELECT doc_id, ow, oh, unnest(generate_series(0, oh - 1)) AS y
        FROM dims WHERE doc_id % 8 != 7)),
ch AS (SELECT doc_id, ow, oh, y, x,
         (doc_id*7 + (2*y)*131 + (2*x)*31) % 256 AS b,
         (doc_id*7 + (2*y)*131 + (2*x)*31 + 17) % 256 AS g,
         (doc_id*7 + (2*y)*131 + (2*x)*31 + 34) % 256 AS r
       FROM px)
SELECT doc_id, CAST(MAX(ow) AS INT) AS out_w, CAST(MAX(oh) AS INT) AS out_h,
       COUNT(*) AS n_px,
       round(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS mean_b,
       round(CAST(SUM(g) AS DOUBLE) / COUNT(*), 6) AS mean_g,
       round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_r,
       SUM((y*ow + x + 1) * (b + g + r)) AS wsum
FROM ch GROUP BY doc_id
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
FROM base WHERE doc_id % 8 = 7
"""


def q_bmp_frame_sample(spark, sf_dir):
    """CONTENT-level FRAME SAMPLING under the gate — the last leg of
    the brief's decode / feature-extract / resize / frame-sample
    quartet made REAL for the codec-free container (q_frame_sample
    keeps the offset-plumbing form for opaque payloads): each document
    gets a synthetic "animation" of 2 + doc_id % 3 complete BMP files
    concatenated, frame f's pixel channel being (doc_id·7 + f·59 +
    y·131 + x·31 + c·17) mod 256, and
    functions.multimodal.sample_bmp_frames must hop frame headers by
    their declared file sizes, sample every 2nd frame, and reduce each
    sampled frame's ACTUAL pixels — frame count, sampled count, pixel
    count, and the summed order-sensitive wsum are all recomputed
    arithmetically by the oracle over a triple generate_series, so
    wrong hop offsets, wrong sampled indices, or wrong per-frame decode
    all diverge. doc_id % 8 == 7 rows degrade to NULLs."""
    from .functions.multimodal import frame_sample_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    w = (4 + d % 5).cast("bigint")
    h = (3 + d % 4).cast("bigint")
    nf = (2 + d % 3).cast("bigint")
    stride = ((w * 3 + 3) / 4).cast("bigint") * 4
    img_size = stride * h

    def hex2(v):
        return F.lpad(F.hex(v), 2, "0")

    def le_hex(c, hexw):
        hh = F.lpad(F.hex(c), hexw, "0")
        return F.concat(*[F.substring(hh, i, 2) for i in range(hexw - 1, 0, -2)])

    pad_hex = F.repeat(F.lit("00"), (stride - w * 3).cast("int"))

    def chan(x, y, f, c):
        return (d * 7 + f * 59 + y * 131 + x * 31 + F.lit(c * 17)) % 256

    def frame_hex(f):
        pixels = F.array_join(
            F.transform(
                F.sequence(h - 1, F.lit(0).cast("bigint"), F.lit(-1).cast("bigint")),
                lambda y: F.concat(
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0).cast("bigint"), w - 1),
                            lambda x: F.concat(
                                hex2(chan(x, y, f, 0)),
                                hex2(chan(x, y, f, 1)),
                                hex2(chan(x, y, f, 2)),
                            ),
                        ),
                        "",
                    ),
                    pad_hex,
                ),
            ),
            "",
        )
        return F.concat(
            F.lit("424D"), le_hex(img_size + 54, 8), F.lit("00000000"),
            le_hex(F.lit(54), 8), le_hex(F.lit(40), 8), le_hex(w, 8), le_hex(h, 8),
            le_hex(F.lit(1), 4), le_hex(F.lit(24), 4), le_hex(F.lit(0), 8),
            le_hex(img_size, 8), F.lit("00" * 16), pixels,
        )

    anim_hex = F.array_join(
        F.transform(F.sequence(F.lit(0).cast("bigint"), nf - 1), frame_hex), ""
    )
    payload = F.when(d % 8 == 7, F.encode(F.lit("not a movie"), "utf-8")).otherwise(
        F.unhex(anim_hex)
    )
    return frame_sample_stats(docs.withColumn("payload", payload))


SQL_BMP_FRAME_SAMPLE = """
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
                     2 + doc_id % 3 AS nf FROM documents),
fr AS (SELECT doc_id, w, h, nf, unnest(generate_series(0, nf - 1, 2)) AS f
       FROM base WHERE doc_id % 8 != 7),
px AS (
  SELECT doc_id, w, nf, f, y, unnest(generate_series(0, w - 1)) AS x
  FROM (SELECT doc_id, w, h, nf, f, unnest(generate_series(0, h - 1)) AS y
        FROM fr)),
ch AS (SELECT doc_id, nf, w, f, y, x,
         (doc_id*7 + f*59 + y*131 + x*31) % 256 AS b,
         (doc_id*7 + f*59 + y*131 + x*31 + 17) % 256 AS g,
         (doc_id*7 + f*59 + y*131 + x*31 + 34) % 256 AS r
       FROM px)
SELECT doc_id, CAST(MAX(nf) AS INT) AS n_frames,
       CAST((MAX(nf) + 1) // 2 AS INT) AS n_sampled,
       COUNT(*) AS n_px,
       SUM((y*w + x + 1) * (b + g + r)) AS wsum_total
FROM ch GROUP BY doc_id
UNION ALL
SELECT doc_id, NULL, NULL, NULL, NULL FROM base WHERE doc_id % 8 = 7
"""


def q_media_features(spark, sf_dir):
    """Feature extraction over binary payloads (mapInPandas batch loop;
    deterministic md5-derived stand-in features, oracle-checked byte
    for byte)."""
    from .functions.multimodal import extract_media_features

    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_media_features(docs)


SQL_MEDIA_FEATURES = """
SELECT doc_id,
  CAST(('0x' || substring(md5(text), 1, 2)) AS INT) AS f0,
  CAST(('0x' || substring(md5(text), 3, 2)) AS INT) AS f1,
  CAST(('0x' || substring(md5(text), 5, 2)) AS INT) AS f2,
  CAST(('0x' || substring(md5(text), 7, 2)) AS INT) AS f3
FROM documents
"""


def q_sort_limit_offset(spark, sf_dir):
    """Pagination: ORDER BY … LIMIT … OFFSET (page 3 of 10-row pages)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


SQL_SORT_LIMIT_OFFSET = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20
"""


def q_frame_sample(spark, sf_dir):
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return frame_sample_plan(docs)


SQL_FRAME_SAMPLE = """
WITH d AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
           FROM documents)
SELECT doc_id, byte_len, CAST(off AS INT) AS frame_idx,
       CAST(off * 32 AS INT) AS byte_offset
FROM d, LATERAL (SELECT unnest(range(0, greatest(byte_len // 32, 1)))) AS t(off)
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

def q_doc_chunking(spark, sf_dir):
    """Document chunking for training pipelines: fixed-size overlapping
    token windows (size 32, stride 24 — 8-token overlap), the standard
    pre-tokenization step before packing sequences. Pure Catalyst:
    tokenize → explode window starts → slice; narrow except the explode
    fan-out (≈ n_tokens/stride rows per doc), no shuffle. Chunk content
    is emitted as an md5 so the compare stays narrow."""
    from .functions.text import tokenize

    size, stride = 32, 24
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize("text").alias("toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride))
    ex = t.select("doc_id", "toks", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("toks"), F.col("start"), size)
    return ex.select(
        "doc_id",
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    ).filter(F.col("n_tokens") > 0)


SQL_DOC_CHUNKING = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
s AS (SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks), 1) + 1, 24)) AS start
      FROM t),
c AS (SELECT doc_id, CAST((start - 1) / 24 AS INT) AS chunk_idx,
             list_slice(toks, start, start + 31) AS chunk
      FROM s)
SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM c WHERE len(chunk) > 0
"""


def q_ngram_span_dedup(spark, sf_dir):
    """Exact substring (8-gram) duplication per doc — the ExactSubstr
    dedup signal of Lee et al. 2022: fraction of each doc's 8-grams
    that also occur in another document. See
    functions/text.py::duplicated_ngram_stats for the scale analysis
    (linear explode, two-phase agg, semi-join back — no hot-key
    fan-out)."""
    from .functions.text import duplicated_ngram_stats

    docs = load_table(spark, sf_dir, "documents")
    out = duplicated_ngram_stats(docs, n=8)
    return out.select(
        "doc_id",
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        F.col("n_dup_ngrams").cast("bigint").alias("n_dup_ngrams"),
        "dup_fraction",
    )


SQL_NGRAM_SPAN_DEDUP = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
tt AS (SELECT doc_id, toks, greatest(len(toks) - 7, 0) AS n_ngrams FROM t),
g AS (SELECT doc_id,
             md5(array_to_string(list_slice(toks, s, s + 7), ' ')) AS h
      FROM tt, unnest(range(1, n_ngrams + 1)) AS u(s)),
d AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_ngrams
       FROM g WHERE h IN (SELECT h FROM d) GROUP BY doc_id)
SELECT tt.doc_id,
       CAST(n_ngrams AS BIGINT) AS n_ngrams,
       CAST(COALESCE(pd.n_dup_ngrams, 0) AS BIGINT) AS n_dup_ngrams,
       CASE WHEN n_ngrams > 0
            THEN CAST(COALESCE(pd.n_dup_ngrams, 0) AS DOUBLE) / n_ngrams
            ELSE 0.0 END AS dup_fraction
FROM tt LEFT JOIN pd USING (doc_id)
"""


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (round 10 upgrade of the
    original mod-10 8/1/1 form) — the last step before a
    corpus ships to training: each doc lands in a split by a hash of
    its id (md5 → first 8 hex chars → bucket mod 100; <80 train,
    <90 val, else test). Hash-based, not random: reproducible across
    runs, engines, and partitionings (a rand() split is none of those),
    and adding documents never moves existing ones between splits — the
    property that keeps eval sets uncontaminated as the corpus grows.
    Emits per-doc assignment plus the split-level counts as a windowed
    total so one query serves both the manifest and the sanity check.
    Plan: one narrow projection + one tiny (3-group) aggregate joined
    back broadcast — no full-corpus shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    assigned = docs.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias(
            "split"
        ),
    )
    totals = assigned.groupBy("split").agg(F.count("*").alias("split_size"))
    return assigned.join(F.broadcast(totals), "split").select(
        "doc_id", "bucket", "split", "split_size"
    )


SQL_DATASET_SPLIT = """
WITH a AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS INT) AS bucket
  FROM documents),
s AS (SELECT doc_id, bucket,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM a),
t AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS split_size FROM s GROUP BY split)
SELECT s.doc_id, s.bucket, s.split, t.split_size
FROM s JOIN t ON s.split = t.split
"""


def q_training_shuffle(spark, sf_dir):
    """Seeded epoch shuffle for training-data ordering — the step
    after dataset_split and sequence_pack, before a corpus is consumed
    by a training run: every document gets a pseudo-random but fully
    DETERMINISTIC (seed, shard, position) so N data-loader workers can
    each read one shard in `pos` order and the global visit order is a
    reproducible permutation. A new epoch is a new seed — no data
    movement, just a recomputed manifest.

    The 100 TB-honest part is what this query does NOT do: globally
    sort by a random key (the naive `ORDER BY hash` shuffle — a
    full-corpus range exchange + total sort, the classic scale
    killer; this registry carries zero global sorts). Instead the
    permutation is factored the way training pipelines actually shard:
    hash → shard (ONE hash-partition exchange) and a within-shard
    sort (row_number window PARTITIONED by shard — local sort, never
    a global one). Readers consume shards independently, so nothing
    downstream ever needs the total order materialized in one place.

    The key is the first 48 bits of md5("<id>:<seed>") — the exact
    q_dataset_split discipline, chosen over integer mixing for three
    properties a multiplicative hash folded to 64-bit-safe arithmetic
    could not give at the claimed scale (post-close review): (1) the
    key space is 2^48, so a billion-doc corpus carries ~2^-18 expected
    collisions per pair instead of the ~2.3e8 systematically
    doc_id-ordered tie pairs a 2^31 key space produces; (2) ids are
    hashed as STRINGS, so no id-space fold exists at all (a mod-2^31
    fold gives ids differing by 2^31 identical keys under EVERY seed —
    permanently correlated pairs, the opposite of an epoch shuffle);
    (3) the seed participates inside the hash, so epochs decorrelate
    fully rather than rotating one fixed permutation. Both engines
    compute md5 over the identical string (negative ids included), so
    the oracle reproduces the permutation bit-identically — the
    property a seeded shuffle exists to provide (a rand() shuffle has
    none of it). Ties on the 48-bit key are broken by doc_id, making
    the permutation total. Plan: scan → project → one Exchange
    hashpartitioning(shard) → local sort + Window.

    Sizing: reduce-side parallelism AND per-task sort volume both
    equal one shard, so n_shards is chosen as corpus_bytes /
    target_shard_bytes (a few hundred MB per shard — at 100 TB that
    is O(100k) shards, far above any cluster's core count; 64 here
    only because the gate corpus is tiny). Extension surface
    (reference has no batch analytics; SURVEY §2b)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    seed, n_shards = 42, 64
    # 48-bit md5 prefix keeps conv()'s result exactly representable
    # (< 2^63 with huge margin) and bit-identical to the oracle's
    # CAST('0x'||hex AS BIGINT); the seed is hashed INSIDE the digest
    key = (
        F.conv(
            F.substring(
                F.md5(
                    # concat (NOT concat_ws): concat_ws SKIPS NULLs, so a
                    # NULL doc_id would hash as md5('42') and get a real
                    # key/shard while the oracle's '||' propagates NULL →
                    # NULL key — concat propagates NULL identically
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(f":{seed}")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
    )
    keyed = docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shuffle_key",
        "shard",
        F.row_number().over(w).alias("pos"),
    )


SQL_TRAINING_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substring(
                 md5(CAST(doc_id AS VARCHAR) || ':' || '42'), 1, 12))
              AS BIGINT) AS shuffle_key
  FROM documents)
SELECT doc_id, shuffle_key,
       CAST(shuffle_key % 64 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % 64
                               ORDER BY shuffle_key, doc_id) AS INT) AS pos
FROM h
"""


def q_gopher_rules(spark, sf_dir):
    """Gopher-style hard quality gate (Rae et al. 2021): per-doc rule
    flags + pass verdict — the branch-on filter tier in front of every
    expensive stage. One shuffle-free projection over the scan; see
    functions/text.py::gopher_quality_rules for rules and calibration."""
    from .functions.text import gopher_quality_rules

    return gopher_quality_rules(load_table(spark, sf_dir, "documents"))


# NULL text folds into the zero-token fail class on BOTH engines
# (round-11 review fix mirrors functions/text.py's coalesce)
SQL_GOPHER_RULES = """
WITH t AS (SELECT doc_id,
                  regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')
                    AS toks
           FROM documents),
m AS (SELECT doc_id,
             len(toks) AS n_tok,
             CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                  AS DOUBLE) / len(toks) AS mean_len,
             len(list_filter(toks, x -> x IN
                 ('the','a','of','and','to','in','is','it'))) AS n_stop,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
      FROM t),
r AS (SELECT doc_id, n_tok, mean_len,
             (n_tok >= 30 AND n_tok <= 80) AS word_count_ok,
             COALESCE(mean_len >= 4.2 AND mean_len <= 4.8, FALSE) AS mean_len_ok,
             (n_stop >= 2) AS stopwords_ok,
             COALESCE(ttr >= 0.5, FALSE) AS repetition_ok
      FROM m)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       round(mean_len, 6) AS mean_token_len,
       word_count_ok, mean_len_ok, stopwords_ok, repetition_ok,
       CAST((NOT word_count_ok)::INT + (NOT mean_len_ok)::INT
            + (NOT stopwords_ok)::INT + (NOT repetition_ok)::INT AS INT)
         AS n_failed,
       (word_count_ok AND mean_len_ok AND stopwords_ok AND repetition_ok)
         AS passes
FROM r
"""


def q_curation_funnel(spark, sf_dir):
    """Corpus-curation FUNNEL — the survivor-count telemetry every
    training-data pipeline dashboards: raw → Gopher hard gate →
    exact dedup (min-doc per normalized fingerprint) → MinHash near-dup
    removal, one row per stage with count and fraction-of-raw. The
    stages are the registry's own operators composed in their
    production order (gopher_rules, doc_fingerprint's normalization,
    minhash_lsh_pairs), so the funnel doubles as an integration check
    that the gates agree on one corpus. pct_of_raw is one IEEE division
    of two exact counts — engine-identical.

    Relation to quality_funnel: that entry is the SINGLE-PASS form —
    per-doc flags counted conditionally in one narrow agg, possible
    because its stages are all doc-local. This funnel's stages are
    CROSS-DOCUMENT (the rule gate feeds a corpus-level near-dup join
    whose candidate set depends on who survived), which no single pass
    can express — the two entries bracket the funnel-telemetry design
    space.

    Plan note: each stage's count re-derives its predecessors (the
    lineage recomputes — ~4 passes over the scan at this telemetry
    query's size); a production run materializes each stage to a table
    as it filters, and this entry exists to pin the composed SEMANTICS,
    which is what the oracle replays stage by stage."""
    from pyspark.sql import Window

    from .functions.dedup_approx import minhash_lsh_pairs
    from .functions.text import gopher_quality_rules

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    passed = gopher_quality_rules(docs).filter(F.col("passes")).select("doc_id")
    s1 = docs.join(passed, "doc_id")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = Window.partitionBy(fp).orderBy("doc_id")
    s2 = (
        s1.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    dropped = (
        minhash_lsh_pairs(s2).select(F.col("id_b").alias("doc_id")).distinct()
    )
    s3 = s2.join(dropped, "doc_id", "left_anti")

    def cnt(stage, name, df):
        return df.agg(F.count("*").alias("n_docs")).select(
            F.lit(stage).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )

    counts = (
        cnt(0, "raw", docs)
        .unionAll(cnt(1, "gopher_pass", s1))
        .unionAll(cnt(2, "exact_dedup", s2))
        .unionAll(cnt(3, "near_dedup", s3))
    )
    total = docs.agg(F.count("*").cast("bigint").alias("__raw"))
    return counts.crossJoin(F.broadcast(total)).select(
        "stage",
        "stage_name",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("__raw")).alias("pct_of_raw"),
    )


SQL_CURATION_FUNNEL = f"""
WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents),
m AS (SELECT doc_id, text,
             len(toks) AS n_tok,
             CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                  AS DOUBLE) / len(toks) AS mean_len,
             len(list_filter(toks, x -> x IN
                 ('the','a','of','and','to','in','is','it'))) AS n_stop,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
      FROM t),
s1 AS (SELECT doc_id, text FROM m
       WHERE n_tok >= 30 AND n_tok <= 80
         AND mean_len >= 4.2 AND mean_len <= 4.8
         AND n_stop >= 2 AND ttr >= 0.5),
s2 AS (SELECT doc_id, text FROM (
         SELECT doc_id, text,
                row_number() OVER (
                  PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                  ORDER BY doc_id) AS rn
         FROM s1)
       WHERE rn = 1),
w2 AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM s2),
sig AS (SELECT doc_id, {_MH_AGGS} FROM w2 GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bh FROM sig UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bh FROM sig),
capped AS (
  SELECT doc_id, band, bh
  FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS n FROM bands)
  WHERE n <= 64),
dropped AS (
  SELECT DISTINCT b.doc_id
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
raw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
counts AS (
  SELECT 0 AS stage, 'raw' AS stage_name, CAST(COUNT(*) AS BIGINT) AS n_docs FROM t
  UNION ALL SELECT 1, 'gopher_pass', CAST(COUNT(*) AS BIGINT) FROM s1
  UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'near_dedup', CAST(COUNT(*) AS BIGINT) FROM s3)
SELECT stage, stage_name, n_docs,
       CAST(n_docs AS DOUBLE) / (SELECT n FROM raw) AS pct_of_raw
FROM counts
"""


def q_ngram_span_removal(spark, sf_dir):
    """Exact-substring span REMOVAL (Lee et al. 2022 ExactSubstr,
    second half): cut every cross-document duplicated 8-gram span and
    return (doc_id, n_tokens, n_removed_tokens, cleaned_text) — the
    operator a training-data pipeline runs after the ngram_span_dedup
    signal. See functions/text.py::remove_duplicated_ngram_spans for
    the covered-position contract and the no-all-pairs plan."""
    from .functions.text import remove_duplicated_ngram_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicated_ngram_spans(docs, n=8)


SQL_NGRAM_SPAN_REMOVAL = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
tt AS (SELECT doc_id, toks, greatest(len(toks) - 7, 0) AS n_ngrams FROM t),
g AS (SELECT doc_id, s,
             md5(array_to_string(list_slice(toks, s, s + 7), ' ')) AS h
      FROM tt, unnest(range(1, n_ngrams + 1)) AS u(s)),
d AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT doc_id, s + o AS pos
        FROM g, unnest(range(0, 8)) AS v(o)
        WHERE h IN (SELECT h FROM d)),
tok AS (SELECT doc_id, toks[pos] AS tok, pos
        FROM t, unnest(range(1, len(toks) + 1)) AS u(pos)),
kept AS (SELECT tok.doc_id, tok.pos, tok.tok
         FROM tok LEFT JOIN cov
           ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
         WHERE cov.pos IS NULL),
re AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
       FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - COALESCE(re.n_kept, 0) AS BIGINT) AS n_removed_tokens,
       COALESCE(re.cleaned_text, '') AS cleaned_text
FROM t LEFT JOIN re ON t.doc_id = re.doc_id
"""


def q_sequence_pack(spark, sf_dir):
    """Sequence packing for pretraining shards: documents are dealt to
    8 shards (doc_id % 8), deterministically shuffled within each shard
    (md5 of the id — the engine-portable stand-in for a seeded
    permutation), then greedily streamed into fixed token-budget bins
    (budget 256): bin = exclusive-prefix-sum(tokens) // budget. Each
    shard's window runs independently — parallelism = n_shards, which
    on a real cluster is set ~ executor count, so no global single-
    partition sort ever exists (the classic packing-scale trap)."""
    from pyspark.sql import Window

    from .functions.text import tokenize

    budget, n_shards = 256, 8
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.size(tokenize("text")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ord_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("bigint").alias("seq_bin"),
    )


SQL_SEQUENCE_PACK = f"""
WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
                  CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                  md5(CAST(doc_id AS VARCHAR)) AS ord_key
           FROM documents),
c AS (SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord_key
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM t)
SELECT doc_id, shard, n_tokens,
       CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_bin
FROM c
"""


def q_bpe_pair_counts(spark, sf_dir):
    """BPE training iteration 1: corpus-wide adjacent character-pair
    frequencies, deterministic top-100 (count DESC, pair ASC) via
    TakeOrderedAndProject. See functions/text.py::bpe_pair_counts."""
    from .functions.text import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, top_k=100).select(
        "pair", F.col("cnt").cast("bigint").alias("cnt")
    )


SQL_BPE_PAIR_COUNTS = f"""
WITH w AS (SELECT unnest({_TOK}) AS w FROM documents),
p AS (SELECT substring(w, s, 2) AS pair
      FROM (SELECT w FROM w WHERE length(w) >= 2) w2,
           unnest(range(1, length(w))) AS u(s))
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM p GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 100
"""


def q_locf_fill(spark, sf_dir):
    """Last-observation-carried-forward gap fill: the latest 'purchase'
    value per user carried over subsequent events (last IGNORE NULLS
    with a running frame) — the canonical sparse-signal densification
    window. One shuffle on user_id; values pass through untouched (no
    arithmetic), so cross-engine equality is exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    val = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(val, ignorenulls=True).over(w).alias("filled_value"),
    )


SQL_LOCF_FILL = """
SELECT event_id, user_id,
  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM events
"""


def q_window_range_frame(spark, sf_dir):
    """RANGE-frame window (value-based, not row-based): trailing-7-day
    revenue per customer ordered by epoch day. Distinct from every ROWS
    frame in the registry — peers at the same day share one frame, so
    the result is tie-order independent. Decimal sum → double (exactness
    discipline)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    return orders.withColumn("day", day).select(
        "o_orderkey",
        "day",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rev_7d"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, day,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
FROM (SELECT *, datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
      FROM orders)
"""


def q_subquery_exists(spark, sf_dir):
    """Correlated EXISTS subquery through the SQL API — Catalyst
    rewrites it to a left-semi hash join (same physical shape as
    join_semi, different language surface)."""
    from .sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        """
    )


SQL_SUBQUERY_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


def q_jaccard_est(spark, sf_dir):
    """MinHash Jaccard ESTIMATION on the LSH candidate pairs: est =
    (matching signature slots)/H. The estimator that makes
    signature-only dedup decisions possible at scale — no token-set
    rejoin. n/8 is exactly representable in double, so no rounding is
    needed for cross-engine equality."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    sig = minhash_signatures(docs)
    a = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)]
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)]
    )
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8)
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (matches / F.lit(8.0)).alias("jaccard_est"))
    )


SQL_JACCARD_EST = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents),
sig AS (SELECT doc_id, {_MH_AGGS} FROM w GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bh FROM sig UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bh FROM sig),
capped AS (
  SELECT doc_id, band, bh
  FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS n FROM bands)
  WHERE n <= 64),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
  ((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END
  + CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) / 8.0) AS jaccard_est
FROM pairs JOIN sig sa ON sa.doc_id = id_a
           JOIN sig sb ON sb.doc_id = id_b
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep rates
    (en 50%, others 20%) decided by a content-stable md5 bucket — the
    rerun-stable, engine-portable alternative to RNG sampling when
    rebalancing a training corpus."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 50).otherwise(20)
    return docs.withColumn("bucket", bucket).filter(F.col("bucket") < rate).select(
        "doc_id", "lang", "bucket"
    )


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, bucket
FROM (SELECT doc_id, lang,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      FROM documents)
WHERE bucket < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
"""


def q_quality_mix_sample(spark, sf_dir):
    """Quality-weighted corpus mixing (the DCLM/FineWeb curation shape):
    score each doc by a cheap COMPUTED signal, tier on it, then keep
    each tier at its own deterministic hash rate (natural 100%, mixed
    50%, synthetic 10%). All arithmetic is INTEGER (percent = 100·hits
    DIV tokens) so tier assignment is bit-identical across engines — no
    float-threshold parity risk.

    The stopword count runs as explode → codegen'd IN → per-doc hash
    agg, NOT as an array-lambda filter: Spark evaluates higher-order
    array functions interpreted per element, measured 13× slower at 30×
    sf0.1 (24.3 s vs 1.8 s). Exploded tokens stay partition-local, so
    the map-side partial agg collapses each doc to one row before the
    single doc_id shuffle."""
    from .functions.text import STOPWORDS, tokenize

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokenize("text").alias("toks"))
    ex = base.select(
        "doc_id", F.size("toks").alias("n_tok"), F.explode_outer("toks").alias("t")
    )
    agg = ex.groupBy("doc_id").agg(
        F.first("n_tok").alias("n_tok"),
        F.count(F.when(F.col("t").isin(*STOPWORDS), 1)).alias("stop_hits"),
    )
    pct = F.when(
        F.col("n_tok") > 0,
        F.floor((F.lit(100) * F.col("stop_hits")) / F.col("n_tok")),
    ).otherwise(F.lit(0))
    tier = (
        F.when(pct >= 8, "natural").when(pct >= 1, "mixed").otherwise("synthetic")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.when(tier == "natural", 100).when(tier == "mixed", 50).otherwise(10)
    return agg.select(
        "doc_id",
        tier.alias("tier"),
        bucket.alias("bucket"),
    ).filter(bucket < rate)


SQL_QUALITY_MIX_SAMPLE = f"""
WITH t AS (
  SELECT doc_id, {_TOK} AS toks,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents),
s AS (
  SELECT doc_id, bucket,
         CASE WHEN len(toks) > 0
              THEN (100 * len(list_filter(toks, x -> x IN {STOPWORDS!r}))) // len(toks)
              ELSE 0 END AS pct
  FROM t)
SELECT doc_id,
       CASE WHEN pct >= 8 THEN 'natural'
            WHEN pct >= 1 THEN 'mixed'
            ELSE 'synthetic' END AS tier,
       bucket
FROM s
WHERE bucket < (CASE WHEN pct >= 8 THEN 100 WHEN pct >= 1 THEN 50 ELSE 10 END)
"""


def q_token_histogram(spark, sf_dir):
    """Corpus token-length histogram (bucket width 10) — the length
    profile every data pipeline reports before choosing sequence
    lengths. Two tiny aggs; the scan stays narrow (text only)."""
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokenize("text"))
    bucket = (n - (n % 10)).alias("token_bucket")
    return (
        docs.select(bucket)
        .groupBy("token_bucket")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_TOKEN_HISTOGRAM = f"""
SELECT CAST(n - (n % 10) AS INT) AS token_bucket, COUNT(*) AS n_docs
FROM (SELECT len({_TOK}) AS n FROM documents)
GROUP BY 1
"""


def q_ngram_lm_score(spark, sf_dir):
    """Unigram language-model scoring: per-doc mean log-probability of
    its tokens under the corpus unigram distribution — the cheap
    perplexity-style quality signal used to rank/filter training text.
    Two hash aggs build the LM (term counts + total); scoring joins the
    occurrences to the LM on term — a shuffle hash join, NOT a forced
    broadcast: at web scale the vocabulary is itself huge, and AQE
    still picks broadcast from stats when it genuinely fits. The corpus
    total rides a 1-row broadcast cross join (never a driver count()).
    round(.,6) absorbs the float-sum ordering ulp between engines."""
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    tf = docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
    lm = tf.groupBy("term").agg(F.count("*").alias("tc"))
    # corpus total from the vocabulary-sized LM, not a third scan of the
    # occurrence frame (tokenize+explode would otherwise run 3×)
    total = lm.select(F.sum("tc").alias("n_total"))
    scored = (
        tf.join(lm, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("tc") / F.col("n_total")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("lp") / F.count("*"), 6).alias("mean_logprob"),
        F.count("*").alias("n_tokens"),
    )


SQL_NGRAM_LM_SCORE = f"""
WITH tf AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
lm AS (SELECT term, COUNT(*) AS tc FROM tf GROUP BY term),
tot AS (SELECT COUNT(*) AS n_total FROM tf),
scored AS (
  SELECT doc_id, ln(CAST(tc AS DOUBLE) / n_total) AS lp
  FROM tf JOIN lm USING (term) CROSS JOIN tot)
SELECT doc_id, round(SUM(lp) / COUNT(*), 6) AS mean_logprob,
       COUNT(*) AS n_tokens
FROM scored GROUP BY doc_id
"""


def q_split_divergence(spark, sf_dir):
    """Distribution-shift audit between two corpus slices: token
    unigram distributions of the even/odd doc_id halves (a stand-in
    for train-vs-validation or old-crawl-vs-new-crawl), add-one
    smoothed over the union vocabulary, compared by KL divergence in
    both directions plus each side's Shannon entropy — the drift gate
    a training-data pipeline runs before mixing a new source into the
    corpus (cf. the data-mixture audits in Gopher/ The Pile papers).

    Plan character: ONE vocabulary-bound shuffle (groupBy term with
    conditional partial sums — the split pivot happens map-side, so
    both halves ride the same agg), then the scalar totals
    (token counts + vocab size) ride a 1-row broadcast cross join back
    onto the vocabulary frame, and the final reduce is a scalar agg —
    no driver collect, no per-split re-scan of the corpus. At 100 TB
    the cost is exactly one occurrence-frame agg, same as any term
    count. Smoothed probabilities are ratios of exact integers in one
    double division (bit-identical cross-engine); round(.,6) absorbs
    the vocabulary-sum ordering ulp, the ngram_lm_score precedent."""
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        (F.col("doc_id") % 2).alias("split"),
        F.explode(tokenize("text")).alias("term"),
    )
    counts = terms.groupBy("term").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).alias("cq"),
    )
    totals = counts.agg(
        F.sum("cp").alias("np"),
        F.sum("cq").alias("nq"),
        F.count("*").alias("v"),
    )
    pr = counts.crossJoin(F.broadcast(totals)).select(
        "np",
        "nq",
        "v",
        ((F.col("cp") + 1.0) / (F.col("np") + F.col("v"))).alias("p"),
        ((F.col("cq") + 1.0) / (F.col("nq") + F.col("v"))).alias("q"),
    )
    return pr.groupBy("np", "nq", "v").agg(
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl_pq"),
        F.round(F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 6).alias("kl_qp"),
        F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy_p"),
        F.round(-F.sum(F.col("q") * F.log("q")), 6).alias("entropy_q"),
    ).select(
        F.col("np").alias("tokens_p"),
        F.col("nq").alias("tokens_q"),
        F.col("v").alias("vocab"),
        "kl_pq",
        "kl_qp",
        "entropy_p",
        "entropy_q",
    )


SQL_SPLIT_DIVERGENCE = f"""
WITH t AS (
  SELECT doc_id % 2 AS split, unnest({_TOK}) AS term FROM documents),
c AS (
  SELECT term,
         SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS cp,
         SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS cq
  FROM t GROUP BY term),
tot AS (SELECT SUM(cp) AS np, SUM(cq) AS nq, COUNT(*) AS v FROM c),
pr AS (
  SELECT np, nq, v,
         (cp + 1.0) / (np + v) AS p,
         (cq + 1.0) / (nq + v) AS q
  FROM c CROSS JOIN tot)
SELECT CAST(np AS BIGINT) AS tokens_p, CAST(nq AS BIGINT) AS tokens_q,
       CAST(v AS BIGINT) AS vocab,
       round(SUM(p * ln(p / q)), 6) AS kl_pq,
       round(SUM(q * ln(q / p)), 6) AS kl_qp,
       round(-SUM(p * ln(p)), 6) AS entropy_p,
       round(-SUM(q * ln(q)), 6) AS entropy_q
FROM pr GROUP BY np, nq, v
"""


def q_quality_funnel(spark, sf_dir):
    """Pipeline observability: documents surviving each cleaning stage
    (raw → length ≥ 10 tokens → type-token ratio ≥ 0.3 → exact-dedup
    survivor), as one (stage, n_docs) report — the funnel every corpus
    job logs. Stages nest, so one pass computes per-doc flags and four
    conditional counts; a single narrow agg, no joins."""
    from pyspark.sql import Window

    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    flagged = docs.select(
        n_tok.alias("n_tokens"),
        ttr.alias("ttr"),
        F.row_number().over(Window.partitionBy(fp).orderBy("doc_id")).alias("rn"),
    )
    length_ok = F.col("n_tokens") >= 10
    ttr_ok = length_ok & (F.col("ttr") >= 0.3)
    dedup_ok = ttr_ok & (F.col("rn") == 1)
    counts = flagged.agg(
        F.count("*").alias("raw"),
        F.count(F.when(length_ok, 1)).alias("length_filter"),
        F.count(F.when(ttr_ok, 1)).alias("ttr_filter"),
        F.count(F.when(dedup_ok, 1)).alias("exact_dedup"),
    )
    stages = ["raw", "length_filter", "ttr_filter", "exact_dedup"]
    unpivot = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"), F.col(s).alias("n_docs"))
            for i, s in enumerate(stages)
        ])
    )
    return counts.select(unpivot.alias("u")).select("u.stage_idx", "u.stage", "u.n_docs")


SQL_QUALITY_FUNNEL = f"""
WITH f AS (
  SELECT len({_TOK}) AS n_tokens,
         CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK}) AS ttr,
         row_number() OVER (
           PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
           ORDER BY doc_id) AS rn
  FROM documents),
c AS (
  SELECT COUNT(*) AS raw,
         COUNT(CASE WHEN n_tokens >= 10 THEN 1 END) AS length_filter,
         COUNT(CASE WHEN n_tokens >= 10 AND ttr >= 0.3 THEN 1 END) AS ttr_filter,
         COUNT(CASE WHEN n_tokens >= 10 AND ttr >= 0.3 AND rn = 1 THEN 1 END) AS exact_dedup
  FROM f)
SELECT 0 AS stage_idx, 'raw' AS stage, raw AS n_docs FROM c
UNION ALL SELECT 1, 'length_filter', length_filter FROM c
UNION ALL SELECT 2, 'ttr_filter', ttr_filter FROM c
UNION ALL SELECT 3, 'exact_dedup', exact_dedup FROM c
"""


def q_dedup_candidates_union(spark, sf_dir):
    """Ensemble near-dup detection: the union of three independent
    candidate generators — MinHash-LSH bands, SimHash byte bands
    (hamming ≤ 3), and capped-shingle Jaccard (≥ 0.2) — with a source
    bitmask per pair (1=minhash, 2=simhash, 4=shingle). Real pipelines
    run several signals because each misses different near-dup classes;
    the union is one distinct over already-bucketed joins, never
    all-pairs.

    The MinHash and SimHash signals both start from the same exploded
    distinct-token frame; it is built ONCE and persisted so the
    tokenize→explode→distinct pass (the dominant narrow cost) runs one
    time instead of twice — at warehouse scale this intermediate is a
    staged table shared by every signal generator. (Round-21
    measurement note: fusing the MinHash and SimHash signature
    aggregations into one groupBy(doc_id) pass was built and A/B'd —
    it LOST at sf0.1 because the fused form forces the slower
    61-accumulator SimHash kernel; see functions/dedup_approx.simhash.)
    """
    docs = load_table(spark, sf_dir, "documents")
    # the token frame is a STAGED intermediate (persisted, read by
    # three generators): build it at cluster-width parallelism. The
    # small-SF corpus is one parquet split, which would otherwise
    # serialize the dominant tokenize→explode→distinct pass onto one
    # task (measured 2× the whole entry's wall); at production scale
    # the scan already has thousands of splits and this repartition is
    # noise next to the staged build it feeds.
    par = spark.sparkContext.defaultParallelism
    toks = _exploded_tokens(docs.repartition(par), "text", "doc_id").persist()
    mh = minhash_lsh_pairs(docs, tokens=toks).select(
        "id_a", "id_b", F.lit(1).alias("src")
    )
    sh = simhash_band_pairs(simhash(docs, tokens=toks)).select(
        "id_a", "id_b", F.lit(2).alias("src")
    )
    sj = shingle_jaccard_pairs(docs, threshold=0.2).select(
        "id_a", "id_b", F.lit(4).alias("src")
    )
    return (
        mh.unionByName(sh)
        .unionByName(sj)
        .groupBy("id_a", "id_b")
        .agg(F.sum("src").cast("int").alias("sources"))
    )


SQL_DEDUP_CANDIDATES_UNION = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents),
sig AS (SELECT doc_id, {_MH_AGGS} FROM w GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bh FROM sig UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bh FROM sig),
capped AS (
  SELECT doc_id, band, bh
  FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS n FROM bands)
  WHERE n <= 64),
mh_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
h AS (SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h FROM w),
bits AS (SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS tot
         FROM h, (SELECT unnest(range(0, 60)) AS j) AS js
         GROUP BY doc_id, j),
fp AS (SELECT doc_id,
         CAST(SUM(CASE WHEN tot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id),
sh_pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
sh0 AS (SELECT doc_id, unnest(list_distinct(
         list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                        i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS sh
       FROM t),
shc AS (SELECT * FROM (
         SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
       WHERE df <= 64),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
           FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
sj_pairs AS (
  SELECT id_a, id_b
  FROM shared JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.2),
unioned AS (
  SELECT id_a, id_b, 1 AS src FROM mh_pairs
  UNION ALL SELECT id_a, id_b, 2 FROM sh_pairs
  UNION ALL SELECT id_a, id_b, 4 FROM sj_pairs)
SELECT id_a, id_b, CAST(SUM(src) AS INT) AS sources
FROM unioned GROUP BY id_a, id_b
"""


def q_udtf_term_counts(spark, sf_dir):
    """The UDTF extension surface, oracle-checked: a Python table
    function expanding each document into (term, count) rows, invoked
    from SQL via LATERAL — the row→rows extension tier next to scalar
    pandas UDFs and the stateful processor. The output contract (same
    [a-z0-9]+ tokenizer as functions.text) is what's checked, not the
    implementation."""
    from .functions.udf import register_udfs

    register_udfs(spark)
    # the small-SF corpus is one parquet file → one input split; a
    # Python table function must not inherit that single-task plan
    # (at 100 TB the scan has thousands of splits and this repartition
    # is a no-op in spirit — here it buys cluster-width Arrow
    # parallelism, same derivation as q_dedup_candidates_union)
    load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.term, t.n FROM __udtf_docs, LATERAL term_counts(text) t"
    )


SQL_UDTF_TERM_COUNTS = f"""
SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
GROUP BY doc_id, term
"""


def q_contamination(spark, sf_dir):
    """Train/eval contamination detection: for each held-out document
    (source = 'src0' stands in for the benchmark set), how many of its
    5-gram shingles appear anywhere in the training split, and how many
    distinct training docs share at least one. The bipartite variant of
    the shingle candidate join — same hashed-shingle, df-capped shuffle
    shape, so it scales exactly like shingle_jaccard (the cap bounds
    boilerplate fan-out)."""
    from pyspark.sql import Window

    from .functions.dedup_approx import hashed_shingle_frame

    docs = load_table(spark, sf_dir, "documents")
    # staged+persisted shingle frame: same cluster-width build as
    # q_dedup_candidates_union's token frame (see rationale there)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    sh = hashed_shingle_frame(docs, 5, extra_cols=("source",))
    sh = (
        sh.withColumn("__df", F.count("*").over(Window.partitionBy("sh")))
        .filter(F.col("__df") <= 64)
        .drop("__df")
        # both join sides derive from this frame — persist or the whole
        # tokenize→shingle→window pipeline computes twice (same
        # discipline as shingle_jaccard_pairs)
        .persist()
    )
    ev = sh.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("eval_doc"), "sh"
    )
    tr = sh.filter(F.col("source") != "src0").select(
        F.col("doc_id").alias("train_doc"), "sh"
    )
    return (
        ev.join(tr, "sh")
        .groupBy("eval_doc")
        .agg(
            F.countDistinct("sh").alias("n_shared_shingles"),
            F.countDistinct("train_doc").alias("n_train_docs"),
        )
    )


SQL_CONTAMINATION = f"""
WITH t AS (SELECT doc_id, source, {_TOK} AS toks FROM documents),
sh0 AS (SELECT doc_id, source, unnest(list_distinct(
         list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                        i -> array_to_string(list_slice(toks, i, i + 4), ' ')))) AS sh
       FROM t),
sh AS (SELECT * FROM (
         SELECT doc_id, source, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh0)
       WHERE df <= 64)
SELECT e.doc_id AS eval_doc,
       COUNT(DISTINCT e.sh) AS n_shared_shingles,
       COUNT(DISTINCT tr.doc_id) AS n_train_docs
FROM (SELECT doc_id, sh FROM sh WHERE source = 'src0') e
JOIN (SELECT doc_id, sh FROM sh WHERE source != 'src0') tr USING (sh)
GROUP BY e.doc_id
"""


def q_repetition_ratio(spark, sf_dir):
    """Intra-document repetition: share of a doc's 3-grams taken by its
    single most frequent 3-gram — the classic generated/boilerplate
    text detector. Non-distinct n-grams (every position counts), two
    narrow aggs; the division is one int/int double op, identical
    across engines without rounding.

    Grams come from exploding the POSITION sequence and slicing in a
    top-level projection (whole-stage codegen), not from exploding a
    transform()-lambda array: higher-order lambdas run interpreted per
    element and measured 16× slower here (14.8 s → 0.9 s at 30×
    sf0.1)."""
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize("text").alias("toks"))
    n_pos = F.greatest(F.size("toks") - 2, F.lit(0))
    grams = t.filter(n_pos > 0).select(
        "doc_id", F.explode(F.sequence(F.lit(1), n_pos)).alias("i"), F.col("toks")
    ).select(
        "doc_id", F.concat_ws(" ", F.slice("toks", F.col("i"), 3)).alias("gram")
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        (F.max("c").cast("double") / F.sum("c")).alias("max_gram_ratio"),
    )


SQL_REPETITION_RATIO = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
g AS (SELECT doc_id, unnest(
        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS gram
      FROM t),
pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(MAX(c) AS DOUBLE) / SUM(c) AS max_gram_ratio
FROM pg GROUP BY doc_id
"""


def q_join_full_outer(spark, sf_dir):
    """Full-outer join: every customer and every order-owner appears,
    matched where possible (coalesced key, null-padded sides) — the one
    outer-join shape the registry lacked. Shuffles both sides on the
    key; AQE handles the skew split at scale."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_mktsegment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


SQL_JOIN_FULL_OUTER = """
SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_mktsegment,
       COALESCE(n_orders, 0) AS n_orders
FROM (SELECT c_custkey, c_mktsegment FROM customer) c
FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders
                 FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
"""


def q_agg_boolean(spark, sf_dir):
    """Boolean aggregate family: bool_and / bool_or / count_if per
    order status — the predicate-summary aggregates (every/any/count
    matching) the ANSI surface includes."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


SQL_AGG_BOOLEAN = """
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000.0) AS all_over_1k,
       bool_or(o_totalprice > 400000.0) AS any_over_400k,
       CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
FROM orders GROUP BY o_orderstatus
"""


def q_setop_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference with multiplicity (each occurrence
    on the right removes ONE on the left), completing the set-op
    family next to EXCEPT/INTERSECT/INTERSECT ALL/UNION ALL."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("user_id", "event_type")
    b = ev.filter(F.col("value") > 50).select("user_id", "event_type")
    return a.exceptAll(b)


SQL_SETOP_EXCEPT_ALL = """
SELECT user_id, event_type FROM events
EXCEPT ALL
SELECT user_id, event_type FROM events WHERE value > 50
"""


def q_date_spine_gaps(spark, sf_dir):
    """Calendar-spine gap detection: generate the full day series
    between the first and last order date (a generated table, no
    source rows) and anti-join the observed days — the
    missing-partition / data-freshness check every ingestion pipeline
    runs. The spine explodes from one aggregated row, so the only
    per-row work is the anti join."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    observed = orders.select(F.col("o_orderdate").cast("date").alias("day")).distinct()
    return (
        spine.join(observed, "day", "left_anti")
        .select(F.date_format("day", "yyyy-MM-dd").alias("missing_day"))
    )


SQL_DATE_SPINE_GAPS = """
WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
                  MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
obs AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders)
SELECT strftime(CAST(s.day AS DATE), '%Y-%m-%d') AS missing_day
FROM spine s LEFT JOIN obs o ON CAST(s.day AS DATE) = o.day
WHERE o.day IS NULL
"""


def q_fuzzy_match(spark, sf_dir):
    """Fuzzy matching with symmetric-delete (SymSpell-style) blocking:
    ALL supplier-name pairs within Levenshtein distance 2 — exact
    recall by construction (see functions.dedup_approx.
    symdelete_fuzzy_pairs), replacing round 2's last-character
    blocking whose ≤36 coarse blocks skewed reducers and silently
    missed pairs whose final characters differ. The oracle is now the
    ground-truth all-pairs semantics, so the gate checks recall rather
    than sharing the blind spot. Gated at max_dist=1: at the driver's
    sf0.01 every supplier pair is within ed 2 (an all-pairs emitter
    would pass vacuously), while at ed ≤ 1 only same-digit-neighbor
    names match — the oracle exercises real recall AND precision at
    gate scale. max_dist=2 recall is pinned by the brute-force
    ground-truth unit test. Reference parity: entity resolution over
    short fields where shingle/token methods are useless."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return symdelete_fuzzy_pairs(sup, "s_suppkey", "s_name", max_dist=1)


# Oracle = ground-truth all-pairs semantics (exact at oracle scale);
# the Spark side must reproduce it through blocking, so the gate now
# checks RECALL, not just that both engines share the same blind spot.
SQL_FUZZY_MATCH = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       levenshtein(a.s_name, b.s_name) AS edit_dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


def q_pii_redact(spark, sf_dir):
    """PII-shaped redaction: mask digit runs ≥ 6 chars (account-number /
    ID shaped — the only PII-like structure in this synthetic data; in a
    real corpus the pattern list extends to emails/phones/SSNs with the
    identical plan) and count masked spans per row. Pure JVM regex
    projection — no shuffle, scales embarrassingly; the operator's real
    test is CROSS-ENGINE REGEX PARITY: Spark's regexp_replace replaces
    every match by default while DuckDB needs the 'g' flag, and
    regexp_extract_all counts must agree span-for-span. A pipeline that
    silently redacts only the first match per row is a compliance bug
    this oracle would catch."""
    c = load_table(spark, sf_dir, "customer")
    pat = "[0-9]{6,}"
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", pat, "<NUM>").alias("redacted"),
        F.size(F.regexp_extract_all("c_name", F.lit(pat), F.lit(0)))
        .cast("int")
        .alias("n_redacted"),
    )


SQL_PII_REDACT = """
SELECT c_custkey,
  regexp_replace(c_name, '[0-9]{6,}', '<NUM>', 'g') AS redacted,
  CAST(len(regexp_extract_all(c_name, '[0-9]{6,}')) AS INT) AS n_redacted
FROM customer
"""


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup — the production shape for a crawl
    pipeline: a NEW batch (here doc_id % 10 = 0) is LSH-banded against
    the EXISTING corpus (the rest), and only batch docs with no banded
    near-dup in the corpus survive (left_anti). Differs from every
    self-dedup entry: the join is asymmetric (small batch × big
    corpus), so at 100 TB the batch's band table broadcasts and the
    corpus is streamed — no corpus self-join ever happens, and the
    corpus side keeps the max_bucket=64 hot-band cap (an over-popular
    band carries no discriminative signal; capping it bounds fan-out
    exactly as in minhash_lsh_pairs). Signatures are per-doc, so
    computing them on the split frames equals splitting a full-corpus
    signature table (what the oracle does)."""
    from pyspark.sql import Window

    from .functions.dedup_approx import minhash_bands

    docs = load_table(spark, sf_dir, "documents")
    batch_bands = minhash_bands(
        minhash_signatures(docs.filter(F.col("doc_id") % 10 == 0))
    ).withColumnRenamed("doc_id", "batch_id")
    corpus_bands = minhash_bands(
        minhash_signatures(docs.filter(F.col("doc_id") % 10 != 0))
    )
    bucket_n = F.count("*").over(Window.partitionBy("band", "bh"))
    corpus_bands = (
        corpus_bands.withColumn("__n", bucket_n).filter(F.col("__n") <= 64).drop("__n")
    )
    hits = (
        F.broadcast(batch_bands)
        .join(corpus_bands, ["band", "bh"])
        .select(F.col("batch_id").alias("doc_id"))
        .distinct()
    )
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .join(hits, "doc_id", "left_anti")
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH w AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS tok FROM documents),
sig AS (SELECT doc_id, {_MH_AGGS} FROM w GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3) AS bh FROM sig UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) AS bh FROM sig),
corpus AS (
  SELECT doc_id, band, bh
  FROM (SELECT *, count(*) OVER (PARTITION BY band, bh) AS n
        FROM bands WHERE doc_id % 10 != 0)
  WHERE n <= 64),
hits AS (
  SELECT DISTINCT n.doc_id
  FROM bands n JOIN corpus c ON n.band = c.band AND n.bh = c.bh
  WHERE n.doc_id % 10 = 0)
SELECT doc_id FROM documents
WHERE doc_id % 10 = 0 AND doc_id NOT IN (SELECT doc_id FROM hits)
"""


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity join — the text-side counterpart
    of the dense `cosine_pairs`: documents as tf·idf-weighted sparse
    vectors, paired through an inverted index on shared terms. Scale
    controls are the standard all-pairs-similarity prunings (Bayardo et
    al., WWW 2007; impact-ordered posting truncation from the IR
    literature): (1) each document keeps only its top-8 terms by weight
    as its signature, bounding index size to 8·n postings; (2) each
    term's posting list keeps only its top-64 documents by weight (a
    "champion list"), bounding the per-term join fan-out to 64² pairs
    regardless of how hot the term is — so no key ever produces an
    unbounded skew bucket. Weights and norms come from the FULL vector
    (truncation prunes candidate generation, not the norm), cosine is
    the truncated-dot / full-norm estimate, threshold 0.6. All stages
    are partial-agg groupBys and one bounded equi-join on term; the
    per-doc/per-term top-k windows run over narrow (id, term, weight)
    rows only. Zero-idf terms (df == N) are dropped before signatures:
    they carry no contrast and would divide-by-zero an all-boilerplate
    document's norm. Two r8-advice hardenings: the tf⋈df join is a
    plain shuffle join on term (df's cardinality is the corpus
    VOCABULARY — unbounded at 100 TB, so never broadcast; the 1-row
    count frame stays broadcast), and both signature/champion windows
    rank on round(w, 6) — Spark's Math.log and DuckDB's libm ln can
    differ in the last ulp, and ranking the raw double lets a 1-ulp
    near-tie flip top-8/top-64 membership across engines; after
    rounding, sub-1e-6 weight gaps fall through to the integer
    term/doc_id tie-break, identical everywhere."""
    from pyspark.sql import Window

    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    w = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
        .filter(F.col("w") > 1e-12)
    )
    norm = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    rw = F.round(F.col("w"), 6)
    wd = Window.partitionBy("doc_id").orderBy(rw.desc(), "term")
    sig = w.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") <= 8)
    wt = Window.partitionBy("term").orderBy(rw.desc(), "doc_id")
    champ = (
        sig.withColumn("brn", F.row_number().over(wt))
        .filter(F.col("brn") <= 64)
        .select("doc_id", "term", "w")
    )
    a, b = champ.alias("a"), champ.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na, nb = norm.alias("na"), norm.alias("nb")
    return (
        dots.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.6)
    )


SQL_TFIDF_COSINE_PAIRS = f"""
WITH terms AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (SELECT doc_id, tf.term, tf * ln(CAST(n_docs AS DOUBLE)/df) AS w
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      WHERE tf * ln(CAST(n_docs AS DOUBLE)/df) > 1e-12),
norm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY doc_id),
sig AS (SELECT doc_id, term, w FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY round(w, 6) DESC, term) AS rn FROM w)
    WHERE rn <= 8),
champ AS (SELECT doc_id, term, w FROM (
    SELECT *, row_number() OVER (PARTITION BY term
                                 ORDER BY round(w, 6) DESC, doc_id) AS brn FROM sig)
    WHERE brn <= 64),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w*b.w) AS dot
         FROM champ a JOIN champ b ON a.term = b.term AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT doc_a, doc_b, round(dot/(na.nrm*nb.nrm), 6) AS cosine
FROM dots JOIN norm na ON dots.doc_a = na.doc_id
          JOIN norm nb ON dots.doc_b = nb.doc_id
WHERE round(dot/(na.nrm*nb.nrm), 6) >= 0.6
"""


def knn_label_accuracy_exact(spark, sf_dir):
    """Brute-force exact-kNN majority-vote label accuracy — test-only
    ground truth for the screened registry entry (q_knn_label_accuracy):
    the agreement floor itself runs on synthetic clustered corpora via
    functions.similarity.knn_label_report(screened=False)
    (tests/test_operators.py::test_knn_screened_agreement), and THIS
    sf_dir wrapper plus SQL_KNN_LABEL_ACCURACY_EXACT keep their own
    oracle gate in tests/test_parity.py::
    test_knn_exact_ground_truth_matches_its_oracle so neither rots
    unreferenced. Quadratic by construction (every query scores the
    whole corpus), so NOT a registry entry; at scale use the
    PQ-screened path."""
    from .functions.similarity import knn_label_report

    return knn_label_report(load_table(spark, sf_dir, "embeddings"), screened=False)


def q_knn_label_accuracy(spark, sf_dir):
    """Embedding-quality eval: kNN majority-vote label accuracy with
    PQ-SCREENED candidate generation — the at-scale form of the standard
    "do these embeddings cluster by label?" probe run before committing
    a corpus to embedding-based dedup or retrieval. A deterministic 10%
    query sample (vec_id % 10 == 0) is scored only against candidates
    sharing one of its probed product-quantizer buckets (the adaptive
    c1×c2 grid of functions.similarity.bucketed_assign, n_probe=2 — the
    same sublinear inverted-file machinery as dedup_embeddings /
    cosine_pairs), so per-query candidate count is bounded by
    n_probe × target bucket size (~2×1024) instead of the whole corpus.
    Scoring is the bucketed_cosine_pairs shape: the probed assignment
    shuffles ONCE by bucket and a per-bucket BLAS kernel emits only each
    query's top-5 (candidate PAIRS are never materialized — the join
    formulation shuffled ~22M vector-fat rows at 30× and measured 47 s
    vs 7.6 s for the kernel); per-bucket top-k → global top-k is
    lossless under the shared (round(cosine,6) DESC, id) order. Vote →
    per-label n/correct/accuracy stages are unchanged from the
    brute-force form (knn_label_accuracy_exact, kept as the test-only
    ground truth — accuracy agreement vs it is floor-pinned on a
    clustered-label corpus in
    tests/test_operators.py::test_knn_screened_agreement). The oracle
    reproduces grid derivation, bucket assignment, candidate set, and
    rounded-rank scoring via the shared _SQL_GRID/_SQL_PQ_ASSIGN CTEs.
    Core: functions.similarity.knn_label_report(screened=True)."""
    from .functions.similarity import knn_label_report

    return knn_label_report(load_table(spark, sf_dir, "embeddings"), screened=True)


SQL_KNN_LABEL_ACCURACY_EXACT = f"""
WITH u AS ({_EMB_U}),
scored AS (
  SELECT a.vec_id AS query_id, a.label AS true_label, b.vec_id AS neighbor_id,
         b.label AS neighbor_label, {_COS} AS cosine
  FROM u a JOIN u b ON b.vec_id != a.vec_id
  WHERE a.vec_id % 10 = 0),
knn AS (SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM scored) WHERE rnk <= 5),
votes AS (SELECT query_id, true_label, neighbor_label, COUNT(*) AS votes
          FROM knn GROUP BY 1, 2, 3),
pred AS (SELECT query_id, true_label, neighbor_label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY votes DESC, neighbor_label) AS vr
    FROM votes) WHERE vr = 1)
SELECT true_label AS label, COUNT(*) AS n_queries,
       COUNT(CASE WHEN pred_label = true_label THEN 1 END) AS n_correct,
       round(CAST(COUNT(CASE WHEN pred_label = true_label THEN 1 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM pred GROUP BY 1
"""


# the screened-kNN oracle grafts the shared adaptive-grid + PQ-assign
# CTEs (bit-identical bucket assignment to bucketed_assign, n_probe=2)
# in front of the exact-kNN vote/report pipeline: candidates are pairs
# sharing a probed bucket where the left endpoint is a query vector
SQL_KNN_LABEL_ACCURACY = f"""
WITH u AS ({_EMB_U}),
{_SQL_GRID},
{_SQL_PQ_ASSIGN},
cand AS (
  SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
  FROM assign x JOIN assign y ON x.bucket = y.bucket AND x.vec_id != y.vec_id
  WHERE x.vec_id % 10 = 0),
scored AS (
  SELECT c.query_id, a.label AS true_label, c.neighbor_id,
         b.label AS neighbor_label, {_COS} AS cosine
  FROM cand c JOIN u a ON a.vec_id = c.query_id
              JOIN u b ON b.vec_id = c.neighbor_id),
-- ranking on round(cosine, 6), matching the engine's per-bucket BLAS
-- kernel discipline: numpy's blocked matmul and this sequential fold
-- can differ in the last ulp, and a raw-double rank would let that
-- flip top-5 membership
knn AS (SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(cosine, 6) DESC, neighbor_id) AS rnk
    FROM scored) WHERE rnk <= 5),
votes AS (SELECT query_id, true_label, neighbor_label, COUNT(*) AS votes
          FROM knn GROUP BY 1, 2, 3),
pred AS (SELECT query_id, true_label, neighbor_label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY votes DESC, neighbor_label) AS vr
    FROM votes) WHERE vr = 1)
SELECT true_label AS label, COUNT(*) AS n_queries,
       COUNT(CASE WHEN pred_label = true_label THEN 1 END) AS n_correct,
       round(CAST(COUNT(CASE WHEN pred_label = true_label THEN 1 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM pred GROUP BY 1
"""


def q_bpe_train_merges(spark, sf_dir):
    """BPE tokenizer TRAINING (Sennrich et al., ACL 2016), 4 merge
    rounds — the full iterative loop, not just the one-step pair count
    (`bpe_pair_counts`). Round structure: (1) adjacent-pair frequencies
    weighted by word count, aggregated on the VOCABULARY (the corpus
    touches the cluster once, in the initial word-count groupBy — the
    shape that makes BPE training tractable at 100 TB: all iteration
    happens on the tiny distinct-word frame); (2) deterministic argmax
    via min(struct(-weight, pair)) — one partial-agg row, no window;
    (3) greedy left-to-right merge applied with a built-in `aggregate`
    fold over each word's symbol array (null-safe `get` makes the
    empty-accumulator probe yield false, no ANSI out-of-bounds), best
    pair riding a 1-row broadcast. Output: the ordered merge table
    (rank, left, right, weight) — the artifact a tokenizer trainer
    ships. Lineage discipline (same as `dedup_clusters` /
    `kmeans_centroids`): the initial vocabulary and each round's 1-row
    best pair are eagerly localCheckpoint-ed — without the cuts every
    union branch re-derives the full chain and the corpus scan
    DUPLICATES ~2^rounds times in the physical plan (measured 15 scans
    for 4 rounds; plan-guarded at ≤1 in tests/test_plans.py). Oracle
    replays training with per-round recursive-CTE merge walks over
    materialized vocab stages."""
    from .functions.text import bpe_train_vocab

    docs = load_table(spark, sf_dir, "documents")
    bests, _vocab = bpe_train_vocab(docs, n_merges=4)
    if not bests:  # vocabulary was single symbols from the start
        return spark.createDataFrame(
            [], "merge_rank INT, left_sym STRING, right_sym STRING, weight BIGINT"
        )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out


def _sql_bpe_train_merges(n_merges: int = 4) -> str:
    """Unrolled-CTE oracle for q_bpe_train_merges: per round, a
    MATERIALIZED pair-count + argmax pair of CTEs and a recursive
    merge walk (position cursor, greedy left-to-right skip-2-on-match —
    bit-identical to the Spark fold). MATERIALIZED is load-bearing:
    DuckDB inlines plain CTEs per reference, which turns the chained
    rounds into exponential recomputation."""
    ctes = []
    for r in range(1, n_merges + 1):
        prev = f"vocab{r-1}"
        ctes.append(f"""
pairs{r} AS MATERIALIZED (
  SELECT pr[1] AS pa, pr[2] AS pb, sum(weight) AS w
  FROM (SELECT weight,
               unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
        FROM {prev})
  GROUP BY 1, 2),
best{r} AS MATERIALIZED (SELECT pa, pb, w FROM pairs{r} ORDER BY w DESC, pa, pb LIMIT 1),
walk{r} AS (
  SELECT word, weight, syms, 1 AS pos, CAST([] AS VARCHAR[]) AS acc FROM {prev}
  UNION ALL
  SELECT w0.word, w0.weight, w0.syms,
         CASE WHEN w0.pos < len(w0.syms) AND w0.syms[w0.pos] = b.pa
                   AND w0.syms[w0.pos+1] = b.pb
              THEN w0.pos + 2 ELSE w0.pos + 1 END,
         CASE WHEN w0.pos < len(w0.syms) AND w0.syms[w0.pos] = b.pa
                   AND w0.syms[w0.pos+1] = b.pb
              THEN w0.acc || [w0.syms[w0.pos] || w0.syms[w0.pos+1]]
              ELSE w0.acc || [w0.syms[w0.pos]] END
  FROM walk{r} w0, best{r} b WHERE w0.pos <= len(w0.syms)),
vocab{r} AS MATERIALIZED (
  SELECT word, weight, acc AS syms FROM walk{r} WHERE pos > len(syms))""")
    selects = " UNION ALL ".join(
        # CAST: DuckDB sum(BIGINT) widens to HUGEINT, which its Python
        # client hands back as float — the compare needs exact ints
        f"SELECT {r} AS merge_rank, pa AS left_sym, pb AS right_sym,"
        f" CAST(w AS BIGINT) AS weight FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return f"""
WITH RECURSIVE words AS (
  SELECT unnest({_TOK}) AS word FROM documents),
vocab0 AS MATERIALIZED (
  SELECT word, COUNT(*) AS weight,
         list_transform(range(1, length(word)+1), i -> substr(word, i::int, 1)) AS syms
  FROM words GROUP BY word),
{','.join(ctes)}
{selects}
"""


def q_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION — train the 4-round merge table
    (functions/text.py::bpe_train_vocab, the q_bpe_train_merges loop)
    and ENCODE the corpus with it: per document, the raw token count,
    the BPE-symbol count after all merges, and symbols-per-word — the
    operator a pipeline runs to budget sequence lengths with the
    tokenizer it just trained (token counting with a REAL trained
    tokenizer, not the whitespace proxy).

    Plan: per-word symbol counts live on the DISTINCT-word vocabulary
    frame (the merge fold cost is vocabulary-sized); the corpus-sized
    work is one explode + one equi-join on word + one per-doc agg. The
    vocabulary joins as a plain equi-join (AQE may broadcast it at this
    SF from stats; never forced — a 100 TB corpus's vocabulary is
    bounded but not driver-bounded). syms_per_word is one IEEE division
    of two exact ints — engine-identical. Oracle: the bpe_train_merges
    unrolled recursive-CTE training walk, extended with the token →
    vocab4 join and per-doc aggregation."""
    from .functions.text import bpe_train_vocab, tokenize

    docs = load_table(spark, sf_dir, "documents")
    bests, vocab = bpe_train_vocab(docs, n_merges=4)
    if len(bests) < 4:
        # training exhausted before n_merges rounds: the oracle's
        # vocab{n} CTE chain goes empty from the exhausted round on, so
        # its final join emits nothing — mirror that exactly (round-10
        # review fix; practical corpora never exhaust at 4 merges)
        return spark.createDataFrame(
            [],
            "doc_id BIGINT, n_words BIGINT, n_bpe_tokens BIGINT, syms_per_word DOUBLE",
        )
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("word"))
    enc = toks.join(vocab.select("word", F.size("syms").alias("n_syms")), "word")
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
            (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias(
                "syms_per_word"
            ),
        )
    )


def _sql_bpe_encode(n_merges: int = 4) -> str:
    """Oracle for q_bpe_encode: reuse the bpe_train_merges recursive-
    CTE training walk through vocab{n}, then swap the merge-table
    SELECT for the token->vocab join + per-doc aggregation."""
    train = _sql_bpe_train_merges(n_merges)
    cut = "SELECT 1 AS merge_rank"
    assert cut in train
    with_block = train[: train.index(cut)].rstrip()
    assert with_block.endswith(")")
    return (
        with_block
        + ",\ntok AS (SELECT doc_id, unnest("
        + _TOK
        + ") AS word FROM documents)\n"
        + "SELECT t.doc_id,\n"
        + "  CAST(COUNT(*) AS BIGINT) AS n_words,\n"
        + "  CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens,\n"
        + "  CAST(SUM(len(v.syms)) AS DOUBLE) / COUNT(*) AS syms_per_word\n"
        + f"FROM tok t JOIN vocab{n_merges} v ON t.word = v.word\n"
        + "GROUP BY t.doc_id\n"
    )


def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton) multi-dimensional clustering — the lakehouse
    OPTIMIZE ZORDER maintenance op: interleave the bits of two
    min-max-quantized dimensions into one key so that range-
    partitioning on it co-locates rows that are close in BOTH
    dimensions, and per-file min/max stats prune scans filtered on
    EITHER column. All arithmetic is integer-exact (16-bit
    quantization, `div`, bit ops), extrema ride a broadcast 1-row agg,
    and the report — per-bucket count and min/max rectangle for both
    dims — is one partial-agg groupBy. On this corpus each of 64
    buckets covers ~12% of each dimension's range vs 100% unclustered:
    an ~8x data-skipping factor per dimension. The write path is
    `df.repartitionByRange(64, zval)` + the partitioned parquet sink
    (`sources/sinks.py`); fixed-width top-bit buckets stand in for the
    range split here so the report needs no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_custkey").cast("bigint").alias("x"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("y"),
    )
    ext = src.agg(
        F.min("x").alias("xmn"),
        F.max("x").alias("xmx"),
        F.min("y").alias("ymn"),
        F.max("y").alias("ymx"),
    )
    q = src.crossJoin(F.broadcast(ext)).select(
        "x",
        "y",
        F.expr("((x - xmn) * CAST(65535 AS BIGINT)) div greatest(xmx - xmn, CAST(1 AS BIGINT))").alias("xq"),
        F.expr("((y - ymn) * CAST(65535 AS BIGINT)) div greatest(ymx - ymn, CAST(1 AS BIGINT))").alias("yq"),
    )
    interleave = " | ".join(
        f"shiftleft(shiftright(xq, {i}) & 1, {2 * i})"
        f" | shiftleft(shiftright(yq, {i}) & 1, {2 * i + 1})"
        for i in range(16)
    )
    z = q.select("x", "y", F.expr(f"({interleave})").alias("zval"))
    return (
        z.select("x", "y", F.expr("shiftright(zval, 26)").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


_ZORDER_INTERLEAVE = " | ".join(
    f"(((xq >> {i}) & 1) << {2 * i}) | (((yq >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)

SQL_ZORDER_LAYOUT = f"""
WITH src AS (
  SELECT CAST(o_custkey AS BIGINT) AS x,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
  FROM orders),
ext AS (SELECT MIN(x) AS xmn, MAX(x) AS xmx, MIN(y) AS ymn, MAX(y) AS ymx FROM src),
q AS (
  SELECT x, y,
         ((x - xmn) * 65535) // greatest(xmx - xmn, 1) AS xq,
         ((y - ymn) * 65535) // greatest(ymx - ymn, 1) AS yq
  FROM src CROSS JOIN ext),
z AS (SELECT x, y, ({_ZORDER_INTERLEAVE}) AS zval FROM q)
SELECT zval >> 26 AS bucket, COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
FROM z GROUP BY 1
"""


def q_zonemap_prune(spark, sf_dir):
    """Zone-map data-skipping report — the measured WIN from
    q_zorder_layout's clustering: given the 64 z-order buckets'
    min/max rectangles (per-file stats in a real lakehouse) and a 2-D
    box predicate (custkey in the [10%,25%] span of its range ×
    orderdate in the [30%,55%] span), count how many buckets a
    stats-only planner SKIPS (rectangle disjoint from the box) and
    report rows_scanned vs rows_total vs rows_matched — exactly the
    row-group pruning arithmetic parquet/Iceberg scan planning does.

    Scale shape: the skip decision runs on the 64-row bucket-stats
    frame (never row-bound); the exact match count is one more
    conditional agg over the 2-column projection. All cuts and ratios
    are integer `div` arithmetic — exact cross-engine. The plan pays
    several narrow 2-column scans of orders (each stats branch —
    extrema, quantized buckets, box, match count — re-derives the
    projection; at 100 TB the bucket-stats frame IS the table's stats
    metadata and costs no scan at all, so the live derivation here is
    the probe's honesty tax, not the operator's shape). Measured at
    sf0.1: 58/64 buckets skipped, scan_ppm 95120 — a ~10.5× skip win
    for a ~3.8%-selectivity box."""
    buckets = q_zorder_layout(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_custkey").cast("bigint").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("y"),
    )
    box = src.agg(
        F.expr("min(x) + (max(x) - min(x)) * 10 div 100").alias("x_lo"),
        F.expr("min(x) + (max(x) - min(x)) * 25 div 100").alias("x_hi"),
        F.expr("min(y) + (max(y) - min(y)) * 30 div 100").alias("y_lo"),
        F.expr("min(y) + (max(y) - min(y)) * 55 div 100").alias("y_hi"),
    )
    skipped = (
        F.col("x_max") < F.col("x_lo")
    ) | (F.col("x_min") > F.col("x_hi")) | (
        F.col("y_max") < F.col("y_lo")
    ) | (F.col("y_min") > F.col("y_hi"))
    plan_report = (
        buckets.crossJoin(F.broadcast(box))
        .select("n_rows", skipped.cast("int").alias("skip"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("skip").alias("n_skipped"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.when(F.col("skip") == 0, F.col("n_rows")).otherwise(0)).alias(
                "rows_scanned"
            ),
        )
    )
    matched = (
        src.crossJoin(F.broadcast(box))
        .agg(
            F.sum(
                (
                    F.col("x").between(F.col("x_lo"), F.col("x_hi"))
                    & F.col("y").between(F.col("y_lo"), F.col("y_hi"))
                ).cast("bigint")
            ).alias("rows_matched")
        )
    )
    return plan_report.crossJoin(F.broadcast(matched)).select(
        "n_buckets",
        "n_skipped",
        "rows_total",
        "rows_scanned",
        "rows_matched",
        F.expr("rows_scanned * 1000000 div rows_total").alias("scan_ppm"),
    )


def q_zoned_read_prune(spark, sf_dir):
    """FILE-LEVEL zone-map pruned read, gate-checked END-TO-END
    (round 14): lays orders out with the d-DIMENSIONAL write_zoned
    (x = custkey, y = orderdate-day, price = totalprice AS DOUBLE —
    the third dim exercises the round-13-ADVICE floating-point
    quantizer) into a session temp dir, then serves a 2-D box through
    sources/sinks.read_zone_pruned, whose sidecar stats CUT the
    partition-dir list BEFORE the scan. The oracle is the plain box
    filter over the orders table — pruning is a file skip, NEVER a
    semantics change, and this entry makes the gate prove it on every
    run (q_zonemap_prune reports the skip arithmetic; this entry
    drives the actual pruned READ). The box bounds use the same
    integer `div` percent-of-extent arithmetic as q_zonemap_prune so
    both engines compute bit-identical bounds; the 1-row extent
    collect is bounded by construction. Temp-dir layout is
    atexit-cleaned."""
    import atexit
    import shutil
    import tempfile

    from .sources.sinks import read_zone_pruned, write_zoned

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint").alias("y"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    box = src.agg(
        F.expr("min(x) + (max(x) - min(x)) * 10 div 100").alias("x_lo"),
        F.expr("min(x) + (max(x) - min(x)) * 25 div 100").alias("x_hi"),
        F.expr("min(y) + (max(y) - min(y)) * 30 div 100").alias("y_lo"),
        F.expr("min(y) + (max(y) - min(y)) * 55 div 100").alias("y_hi"),
    ).collect()[0]
    path = tempfile.mkdtemp(prefix="zoned_read_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    write_zoned(src, path, ("x", "y", "price"), n_buckets=64)
    pruned = read_zone_pruned(
        spark,
        path,
        {
            "x": (box["x_lo"], box["x_hi"]),
            "y": (box["y_lo"], box["y_hi"]),
        },
    )
    return pruned.select("o_orderkey", "x", "y", "price")


SQL_ZONED_READ_PRUNE = """
WITH src AS (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders),
ext AS (SELECT MIN(x) AS xmn, MAX(x) AS xmx, MIN(y) AS ymn, MAX(y) AS ymx FROM src),
box AS (SELECT xmn + (xmx - xmn) * 10 // 100 AS x_lo,
               xmn + (xmx - xmn) * 25 // 100 AS x_hi,
               ymn + (ymx - ymn) * 30 // 100 AS y_lo,
               ymn + (ymx - ymn) * 55 // 100 AS y_hi
        FROM ext)
SELECT o_orderkey, x, y, price
FROM src CROSS JOIN box
WHERE x BETWEEN x_lo AND x_hi AND y BETWEEN y_lo AND y_hi
"""


SQL_ZONEMAP_PRUNE = f"""
WITH src AS (
  SELECT CAST(o_custkey AS BIGINT) AS x,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
  FROM orders),
ext AS (SELECT MIN(x) AS xmn, MAX(x) AS xmx, MIN(y) AS ymn, MAX(y) AS ymx FROM src),
q AS (
  SELECT x, y,
         ((x - xmn) * 65535) // greatest(xmx - xmn, 1) AS xq,
         ((y - ymn) * 65535) // greatest(ymx - ymn, 1) AS yq
  FROM src CROSS JOIN ext),
z AS (SELECT x, y, ({_ZORDER_INTERLEAVE}) AS zval FROM q),
b AS (SELECT zval >> 26 AS bucket, COUNT(*) AS n_rows,
             MIN(x) AS x_min, MAX(x) AS x_max,
             MIN(y) AS y_min, MAX(y) AS y_max
      FROM z GROUP BY 1),
box AS (SELECT xmn + (xmx - xmn) * 10 // 100 AS x_lo,
               xmn + (xmx - xmn) * 25 // 100 AS x_hi,
               ymn + (ymx - ymn) * 30 // 100 AS y_lo,
               ymn + (ymx - ymn) * 55 // 100 AS y_hi
        FROM ext),
plan_report AS (
  SELECT COUNT(*) AS n_buckets,
         SUM(CASE WHEN x_max < x_lo OR x_min > x_hi
                    OR y_max < y_lo OR y_min > y_hi THEN 1 ELSE 0 END)
           AS n_skipped,
         SUM(n_rows) AS rows_total,
         SUM(CASE WHEN x_max < x_lo OR x_min > x_hi
                    OR y_max < y_lo OR y_min > y_hi THEN 0 ELSE n_rows END)
           AS rows_scanned
  FROM b CROSS JOIN box),
m AS (
  SELECT SUM(CASE WHEN x BETWEEN x_lo AND x_hi
                   AND y BETWEEN y_lo AND y_hi THEN 1 ELSE 0 END)
           AS rows_matched
  FROM src CROSS JOIN box)
SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(n_skipped AS BIGINT) AS n_skipped,
       CAST(rows_total AS BIGINT) AS rows_total,
       CAST(rows_scanned AS BIGINT) AS rows_scanned,
       CAST(rows_matched AS BIGINT) AS rows_matched,
       CAST(rows_scanned * 1000000 // rows_total AS BIGINT) AS scan_ppm
FROM plan_report CROSS JOIN m
"""


def q_classifier_eval(spark, sf_dir):
    """Classifier evaluation report — per-class tp/fp/fn + precision/
    recall/F1 over (true, predicted) label pairs, fed here by the
    lang-ID heuristic against the corpus's ground-truth `lang` column
    (the eval every filtering-model deployment runs before trusting a
    classifier at corpus scale; `knn_label_accuracy`'s sibling for
    arbitrary label pairs). Class axis = union of true and predicted
    labels, so classes the model never predicts (all-fn) and classes
    that don't exist in truth (all-fp) both surface. Two partial-agg
    groupBys full-outer-joined on class — label cardinality is tiny, so
    every stage after the scan is broadcast-sized."""
    preds = lang_id_heuristic(load_table(spark, sf_dir, "documents")).select(
        F.col("lang_label").alias("t"), F.col("lang_pred").alias("p")
    )
    by_pred = preds.groupBy(F.col("p").alias("klass")).agg(
        F.count(F.when(F.col("t") == F.col("p"), 1)).alias("tp_p"),
        F.count(F.when(F.col("t") != F.col("p"), 1)).alias("fp"),
    )
    by_true = preds.groupBy(F.col("t").alias("klass")).agg(
        F.count(F.when(F.col("t") == F.col("p"), 1)).alias("tp_t"),
        F.count(F.when(F.col("t") != F.col("p"), 1)).alias("fn"),
    )
    j = by_pred.join(by_true, "klass", "full_outer").select(
        "klass",
        F.coalesce(F.col("tp_p"), F.col("tp_t"), F.lit(0)).alias("tp"),
        F.coalesce("fp", F.lit(0)).alias("fp"),
        F.coalesce("fn", F.lit(0)).alias("fn"),
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return j.select(
        "klass",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


SQL_CLASSIFIER_EVAL = f"""
WITH t0 AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents),
preds AS (
  SELECT lang AS t,
    CASE WHEN list_contains(toks, 'the') AND list_contains(toks, 'a') THEN 'en'
         WHEN list_contains(toks, 'spark') AND list_contains(toks, 'stream') THEN 'code'
         ELSE 'unk' END AS p
  FROM t0),
by_pred AS (
  SELECT p AS klass,
         COUNT(CASE WHEN t = p THEN 1 END) AS tp_p,
         COUNT(CASE WHEN t != p THEN 1 END) AS fp
  FROM preds GROUP BY 1),
by_true AS (
  SELECT t AS klass,
         COUNT(CASE WHEN t = p THEN 1 END) AS tp_t,
         COUNT(CASE WHEN t != p THEN 1 END) AS fn
  FROM preds GROUP BY 1),
j AS (
  SELECT coalesce(by_pred.klass, by_true.klass) AS klass,
         coalesce(tp_p, tp_t, 0) AS tp, coalesce(fp, 0) AS fp, coalesce(fn, 0) AS fn
  FROM by_pred FULL OUTER JOIN by_true ON by_pred.klass = by_true.klass),
m AS (
  SELECT klass, tp, fp, fn,
         CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END AS prec,
         CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END AS rec
  FROM j)
SELECT klass, tp, fp, fn, round(prec, 6) AS precision, round(rec, 6) AS recall,
       round(CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec) ELSE 0.0 END, 6) AS f1
FROM m
"""


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling via PRIORITY SAMPLING (Duffield,
    Lund & Thorup, JACM 2007): each doc gets priority w·2³² div (h+1)
    where h is its 32-bit content-independent hash and w its weight
    (length here — sample long docs preferentially, the corpus-mixing
    primitive when token budgets are weighted). The top-k by priority
    is the sample; unlike rejection/Bernoulli sampling the sample size
    is EXACT, and unlike Efraimidis-Spirakis exponential keys the
    arithmetic is integer-only — bit-identical across engines, no
    libm-ln parity risk. Top-100 compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge, no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    )
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            (h + 1).alias("h1"),
        )
        .select(
            "doc_id",
            "weight",
            F.expr("(weight * CAST(4294967296 AS BIGINT)) div h1").alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(100)
    )


SQL_WEIGHTED_SAMPLE = """
WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1 AS h1
  FROM documents)
SELECT doc_id, weight, (weight * 4294967296) // h1 AS priority
FROM t
ORDER BY priority DESC, doc_id
LIMIT 100
"""


def q_video_header_meta(spark, sf_dir):
    """REAL video metadata decode under the gate (closing the last
    header-decode modality after image and audio): documents get a
    genuine ISO-BMFF/MP4 payload synthesized JVM-side — `ftyp` box,
    `moov` with a spec-layout `mvhd` (timescale, duration, rate
    0x00010000, volume 0x0100) and one or two `trak`/`tkhd` children
    with 16.16 fixed-point width/height — and decode_video_meta
    (functions.multimodal.parse_video_header) must walk the box tree
    back out: timescale, duration_ms (integer div), track count and
    presentation size. doc_id % 8 == 1 rows lead with a ZERO-dimension
    audio track so the walker's first-non-zero-width rule is exercised,
    and doc_id % 4 == 3 rows carry non-video bytes and degrade to
    NULL/'unknown'. The oracle recomputes every field arithmetically,
    so the gate checks the box walker bit-for-bit."""
    from .functions.multimodal import decode_video_meta

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")

    be, zeros, ascii_ = _syn_be, _syn_zeros, _syn_ascii

    ts = (500 * (1 + d % 4)).cast("bigint")
    du = (30000 + d % 60000).cast("bigint")
    w = (320 * (1 + d % 3)).cast("bigint")
    h = (240 * (1 + d % 3)).cast("bigint")
    two_tracks = d % 4 == 1

    ftyp = F.concat(be(F.lit(16), 8), ascii_("ftyp"), ascii_("isom"), zeros(4))
    mvhd = F.concat(
        be(F.lit(108), 8), ascii_("mvhd"),
        zeros(4), zeros(8), be(ts, 8), be(du, 8),
        F.unhex(F.lit("00010000")), F.unhex(F.lit("0100")),
        zeros(10), zeros(36), zeros(24), be(F.lit(2), 8),
    )

    def trak(tid, wexpr, hexpr):
        tkhd = F.concat(
            be(F.lit(92), 8), ascii_("tkhd"),
            F.unhex(F.lit("00000007")), zeros(8), be(F.lit(tid), 8), zeros(4),
            be(du, 8), zeros(8), zeros(8), zeros(36),
            be(wexpr * 65536, 8), be(hexpr * 65536, 8),
        )
        return F.concat(be(F.lit(100), 8), ascii_("trak"), tkhd)

    t1 = trak(1, F.when(d % 8 == 1, F.lit(0)).otherwise(w),
              F.when(d % 8 == 1, F.lit(0)).otherwise(h))
    t2 = F.when(two_tracks, trak(2, w, h)).otherwise(F.unhex(F.lit("")))
    moov_size = F.when(two_tracks, 316).otherwise(216).cast("bigint")
    # moov = 8 (header) + 108 (mvhd) + 100·n_tracks children
    moov = F.concat(be(moov_size, 8), ascii_("moov"), mvhd, t1, t2)
    payload = F.when(d % 4 == 3, F.encode(F.lit("not a video!"), "utf-8")).otherwise(
        F.concat(ftyp, moov)
    )
    return decode_video_meta(docs.withColumn("payload", payload))


SQL_VIDEO_HEADER_META = """
SELECT doc_id,
  CAST(CASE WHEN doc_id % 4 = 3 THEN 12
       WHEN doc_id % 4 = 1 THEN 332 ELSE 232 END AS BIGINT) AS byte_len,
  CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
       ELSE 500 * (1 + doc_id % 4) END AS INT) AS timescale,
  CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
       ELSE ((30000 + doc_id % 60000) * 1000) // (500 * (1 + doc_id % 4)) END
       AS BIGINT) AS duration_ms,
  CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
       WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS INT) AS n_tracks,
  CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
       ELSE 320 * (1 + doc_id % 3) END AS INT) AS width,
  CAST(CASE WHEN doc_id % 4 = 3 THEN NULL
       ELSE 240 * (1 + doc_id % 3) END AS INT) AS height,
  CASE WHEN doc_id % 4 = 3 THEN 'unknown' ELSE 'mp4' END AS format
FROM documents
"""


def q_interval_coverage(spark, sf_dir):
    """Merged-interval union time (the sweep-line primitive behind
    utilization, billing and overlapping-span dedup): each event opens
    a 5-minute activity window; per user, overlapping-or-touching
    windows merge into islands and the report is (user, island count,
    total covered ms). The merge is the gaps-and-islands composition —
    lag to flag a window break (gap > window), running sum to number
    islands, one partial-agg per island then per user — all on narrow
    (user, epoch-ms) rows, integer-exact end to end. Cousin of
    `activity_streaks` (calendar-day islands) but on the continuous
    time axis with an additive measure, which streaks can't express."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_ms = 300000
    e = ev.select("user_id", F.unix_millis("ts").alias("t"))
    wo = Window.partitionBy("user_id").orderBy("t")
    flags = e.withColumn(
        "new_island",
        F.when(F.col("t") - F.lag("t").over(wo) > w_ms, 1).otherwise(0),
    )
    islands = flags.withColumn(
        "island",
        F.sum("new_island").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("user_id", "island").agg(
        (F.max("t") - F.min("t") + w_ms).alias("span_ms")
    )
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum("span_ms").alias("coverage_ms"),
    )


SQL_INTERVAL_COVERAGE = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS t FROM events),
flags AS (
  SELECT user_id, t,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 300000
              THEN 1 ELSE 0 END AS new_island
  FROM e),
islands AS (
  SELECT user_id, t,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flags),
spans AS (
  SELECT user_id, island, max(t) - min(t) + 300000 AS span_ms
  FROM islands GROUP BY 1, 2)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(sum(span_ms) AS BIGINT) AS coverage_ms
FROM spans GROUP BY 1
"""


def q_resample_ohlc(spark, sf_dir):
    """Time-series downsampling to per-hour OHLC bars (the classic
    tick→bar resample of timeseries engines): per (event_type, hour)
    emit the value of the earliest row (open), min/max (low/high), the
    value of the latest row (close), and the row count.

    Scale shape: the whole resample is ONE hash aggregation over the
    scan — open/close come from min/max over struct(ts, event_id,
    value), i.e. map-side-combinable min_by/max_by with a TOTAL
    deterministic order (event_id breaks ts ties), never a window sort
    over raw rows. The oracle has to use first_value/last_value windows
    to express the same thing; the Spark plan deliberately does not.
    Floats are selected, not computed, so cross-engine hashes are exact
    bit-for-bit; a row whose value is NULL can still open/close a bar
    (selection semantics), while high/low ignore NULLs like every SQL
    min/max."""
    ev = load_table(spark, sf_dir, "events")
    sel = F.struct("ts", "event_id", "value")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.min(sel).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(sel).getField("value").alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            _ts_s("bucket").alias("bucket_s"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


SQL_RESAMPLE_OHLC = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events),
w AS (
  SELECT event_type, bucket, value,
         first_value(value) OVER
           (PARTITION BY event_type, bucket ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS open,
         last_value(value) OVER
           (PARTITION BY event_type, bucket ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS close
  FROM e)
SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_s,
       any_value(open) AS open, max(value) AS high, min(value) AS low,
       any_value(close) AS close, COUNT(*) AS n
FROM w GROUP BY 1, 2
"""


def q_winsorize(spark, sf_dir):
    """Per-group winsorized statistics: clip events.value to the
    group's exact [p05, p95] and report the bounds, clip counts, and
    the winsorized mean — the standard outlier-robust feature scaling
    step before training-data aggregation.

    Scale shape: both percentiles come from ONE shared pass of the
    bounded-state multi-percentile kernel (operators/relational.py::
    grouped_exact_percentiles — histogram state ∝ distinct values,
    never a per-group value buffer, bit-identical to Spark's built-in
    Percentile by the hybrid interpolation contract; the oracle uses
    _sql_hybrid_pct, not quantile_cont — see q_agg_percentiles; the
    fixed-precision-telemetry distinct-value bound argued for
    q_mad_outliers applies unchanged), the per-group bounds frame is
    #groups-bounded so it broadcasts back over the scan, and the
    final stats are one hash aggregation. Mean is rounded to 6 dp on
    both engines to absorb summation-order float jitter; bounds and
    counts are exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bounds = grouped_exact_percentiles(
        ev, ["event_type"], "value", {"p_lo": 0.05, "p_hi": 0.95}
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "p_lo",
        "p_hi",
        F.greatest(F.least(F.col("value"), F.col("p_hi")), F.col("p_lo")).alias(
            "w"
        ),
        (F.col("value") < F.col("p_lo")).cast("int").alias("is_lo"),
        (F.col("value") > F.col("p_hi")).cast("int").alias("is_hi"),
    )
    return clipped.groupBy("event_type").agg(
        F.first("p_lo").alias("p_lo"),
        F.first("p_hi").alias("p_hi"),
        F.count("*").alias("n"),
        F.sum("is_lo").alias("n_clipped_lo"),
        F.sum("is_hi").alias("n_clipped_hi"),
        F.round(F.avg("w"), 6).alias("mean_winsorized"),
    )


SQL_WINSORIZE = f"""
WITH b AS ({_sql_hybrid_pct(
    "(SELECT event_type, value FROM events WHERE value IS NOT NULL) s",
    ["event_type"],
    "value",
    {"p_lo": 0.05, "p_hi": 0.95},
)})
SELECT e.event_type, any_value(b.p_lo) AS p_lo, any_value(b.p_hi) AS p_hi,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN e.value < b.p_lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_lo,
       CAST(SUM(CASE WHEN e.value > b.p_hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_hi,
       ROUND(AVG(GREATEST(LEAST(e.value, b.p_hi), b.p_lo)), 6)
         AS mean_winsorized
FROM events e JOIN b USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY 1
"""


def q_skew_profile(spark, sf_dir):
    """Join-key skew diagnostics — the pre-flight check that decides
    whether a join needs salting/AQE skew handling: per hot key of
    lineitem.l_orderkey, its row count, its share of the table in ppm,
    and its count as a multiple of the mean key count (×1000), for the
    top 10 keys.

    Scale shape: one partial-aggregated count-by-key shuffle (keyspace-
    bound), totals folded in as a crossJoined 1-row scalar aggregate
    over the SAME counts frame (no second scan of the fact table), and
    the top-10 compiles to TakeOrderedAndProject — no global sort. All
    derived columns use integer arithmetic (ppm / ×1000 ratios as
    BIGINT), so cross-engine hashes are exact. Ties break on key
    ascending for determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            (F.col("cnt") * F.lit(1000000) / F.col("total_rows"))
            .cast("long")
            .alias("share_ppm"),
            (F.col("cnt") * F.col("n_keys") * F.lit(1000) / F.col("total_rows"))
            .cast("long")
            .alias("x_mean_1000"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(10)
    )


SQL_SKEW_PROFILE = """
WITH c AS (
  SELECT l_orderkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1),
t AS (
  SELECT SUM(cnt) AS total_rows, COUNT(*) AS n_keys FROM c)
SELECT c.key, c.cnt,
       CAST(TRUNC(c.cnt * 1000000 / t.total_rows) AS BIGINT) AS share_ppm,
       CAST(TRUNC(c.cnt * t.n_keys * 1000 / t.total_rows) AS BIGINT)
         AS x_mean_1000
FROM c, t
ORDER BY c.cnt DESC, c.key
LIMIT 10
"""


def q_snapshot_diff(spark, sf_dir):
    """Differential snapshot comparison: treating lineitem as a keyed
    update stream (key = l_partkey, each shipped line is a state
    update, version = the unique l_orderkey·10+l_linenumber row id),
    classify every key's state at cutoff T2 against its state at the
    earlier cutoff T1 as added (absent at T1) / changed (a newer
    update arrived) / unchanged, and emit per-class key counts with an
    exact key-sum checksum — the table-diff primitive behind
    incremental retraining triggers and data-drift audits.

    Scale shape: ONE conditional aggregation pass computes BOTH
    snapshots — per key, max(struct(t, rid)) under t<=T2 and the same
    under a when(t<=T1) guard — so the diff costs a single keyspace-
    bound shuffle, never two scans plus a self-join. The cutoffs (3%
    and 6% of the observed l_shipdate range — chosen so ~0.9 expected
    updates per part land in each span, keeping all three classes
    populated at EVERY scale factor since parts and lineitem grow in
    the same ratio) come from a scalar min/max aggregate crossJoined
    over the scan; integer epoch-ms arithmetic. All outputs
    BIGINT-exact."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey").isNotNull() & F.col("l_shipdate").isNotNull())
        .select(
            F.col("l_partkey").alias("key"),
            F.unix_millis("l_shipdate").alias("t"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        )
    )
    span = li.agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    tagged = li.crossJoin(F.broadcast(span)).select(
        "key",
        "t",
        "rid",
        (
            F.col("t0") + ((F.col("t1") - F.col("t0")) * 3 / 100).cast("long")
        ).alias("cut1"),
        (
            F.col("t0") + ((F.col("t1") - F.col("t0")) * 6 / 100).cast("long")
        ).alias("cut2"),
    )
    st = F.struct("t", "rid")
    states = (
        tagged.filter(F.col("t") <= F.col("cut2"))
        .groupBy("key")
        .agg(
            F.max(F.when(F.col("t") <= F.col("cut1"), st)).alias("s1"),
            F.max(st).alias("s2"),
        )
    )
    classified = states.select(
        "key",
        F.when(F.col("s1").isNull(), F.lit("added"))
        .when(F.col("s1.rid") != F.col("s2.rid"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return classified.groupBy("status").agg(
        F.count("*").alias("n_keys"), F.sum("key").alias("key_sum")
    )


SQL_SNAPSHOT_DIFF = """
WITH e AS (
  SELECT l_partkey AS key, epoch_ms(l_shipdate) AS t,
         l_orderkey * 10 + l_linenumber AS rid
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_shipdate IS NOT NULL),
span AS (
  SELECT MIN(t) AS t0, MAX(t) AS t1 FROM e),
cuts AS (
  SELECT t0 + CAST(TRUNC((t1 - t0) * 3 / 100) AS BIGINT) AS cut1,
         t0 + CAST(TRUNC((t1 - t0) * 6 / 100) AS BIGINT) AS cut2
  FROM span),
s2 AS (
  SELECT key, struct_extract(max(row(t, rid)), 2) AS r2
  FROM e, cuts WHERE t <= cut2 GROUP BY key),
s1 AS (
  SELECT key, struct_extract(max(row(t, rid)), 2) AS r1
  FROM e, cuts WHERE t <= cut1 GROUP BY key),
c AS (
  SELECT s2.key,
         CASE WHEN s1.key IS NULL THEN 'added'
              WHEN s1.r1 <> s2.r2 THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM s2 LEFT JOIN s1 ON s1.key = s2.key)
SELECT status, COUNT(*) AS n_keys,
       CAST(SUM(key) AS BIGINT) AS key_sum
FROM c GROUP BY 1
"""


_BM25_QUERY = ("scan", "merge", "customer")


def _bm25_rank(tf, df_, stats, k1=1.2, b=0.75, topk=10):
    """Shared BM25 scoring tail: (doc_id, term, tf, dl) frame ×
    |query|-bounded df frame × 1-row corpus stats frame → top-k docs.
    Used by the one-shot ranker (q_bm25_topk) and the incremental-
    index ranker (q_bm25_incremental) so both compute the identical
    expression tree — the parity between them is then exactly the
    parity of their df/N/avgdl inputs."""
    k1, b = F.lit(k1), F.lit(b)
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * sat).alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("s"), 6).alias("score"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(topk)
    )


def q_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval (Robertson/Sparck Jones, the Lucene
    `(1 + (N - df + 0.5)/(df + 0.5))` idf variant with k1=1.2, b=0.75):
    top-10 documents for a fixed 3-term query, with the per-doc score
    and the number of query terms matched.

    Scale shape: the token list is materialized ONCE per doc and the
    array is filtered to the query terms BEFORE the explode, so the
    exploded relation carries at most |query| rows per doc (never the
    full token stream) and doc length rides along as a column — no
    doc_id self-join to reattach it. The df frame is bounded by |query|
    (3 rows) and the corpus stats frame is 1 row, so both broadcast
    legitimately at any corpus size; the only corpus-bound shuffle is
    the (doc_id, term) tf aggregation. Top-10 compiles to
    TakeOrderedAndProject (no global sort); the rank key is
    round(score, 6) with doc_id tie-break so a 1-ulp libm ln/division
    divergence can't flip membership across engines."""
    from .functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokenize("text").alias("toks"))
    stats = toked.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    matched = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(
            F.filter(F.col("toks"), lambda t: t.isin(*_BM25_QUERY))
        ).alias("term"),
    )
    tf = matched.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    return _bm25_rank(tf, df_, stats)


SQL_BM25_TOPK = f"""
WITH d AS (SELECT doc_id, {_TOK} AS toks FROM documents),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 avg(len(toks)) AS avgdl FROM d),
m AS (SELECT doc_id, len(toks) AS dl,
             unnest(list_filter(toks, t -> t IN ('scan','merge','customer')))
               AS term
      FROM d),
tf AS (SELECT doc_id, term, COUNT(*) AS tf, any_value(dl) AS dl
       FROM m GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT doc_id,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s
  FROM tf JOIN df USING (term) CROSS JOIN stats)
SELECT doc_id, round(SUM(s), 6) AS score, COUNT(*) AS n_terms
FROM scored GROUP BY 1
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_bm25_incremental(spark, sf_dir):
    """BM25 retrieval served from an INCREMENTALLY MAINTAINED term
    index: documents arrive in three deterministic batches (doc_id %
    3 — a stand-in for stream ingest), each batch upserting (a) one
    df-count row per distinct (doc, term) and (b) one corpus-stats row
    per doc under the reserved key '#corpus' (value = doc length, so
    that key's n = N and total = Σdl) into a streaming/mat_view.py
    MaterializedCounts table (bucket-pruned merges, manifest commits).
    The ranker then scores the SAME expression tree as q_bm25_topk
    (shared _bm25_rank) with df/N/avgdl read from the COMMITTED index
    instead of recomputed — and the oracle is the one-shot BM25 SQL,
    so the gate proves the incremental index serves bit-identical
    retrieval no matter how the corpus was batched. avgdl stays exact:
    doc lengths accumulate as decimal, and Σdl/N in double equals the
    one-shot avg of integers.

    Plan character: three micro-batch merges each rewriting only
    delta-touched buckets (index maintenance is O(hot buckets) — at
    100 TB the vocabulary table never rewrites wholesale), then a
    query whose index inputs are a 3-row df frame and a 1-row stats
    frame, both broadcast. Temp-dir state is atexit-cleaned (the
    returned frame reads it lazily)."""
    import atexit
    import shutil
    import tempfile

    from .functions.text import tokenize
    from .streaming.mat_view import MaterializedCounts
    from .streaming.pipelines import term_index_feed

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokenize("text").alias("toks"))
    # index feed: per-doc distinct term rows + the reserved stats row
    # (shared with the streaming bench pipeline — same transform)
    feed = term_index_feed(docs)
    path = tempfile.mkdtemp(prefix="bm25_index_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    index = MaterializedCounts(
        path, keys=("term",), value_col="value", n_buckets=8
    )
    for i in range(3):
        index.apply_batch(feed.filter(F.col("doc_id") % 3 == i), i)
    state = index.read(spark)
    df_ = (
        state.filter(F.col("term").isin(*_BM25_QUERY))
        .select("term", F.col("n").alias("df"))
    )
    stats = state.filter(F.col("term") == "#corpus").select(
        F.col("n").cast("double").alias("n_docs"),
        (F.col("total").cast("double") / F.col("n")).alias("avgdl"),
    )
    matched = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(
            F.filter(F.col("toks"), lambda t: t.isin(*_BM25_QUERY))
        ).alias("term"),
    )
    tf = matched.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    return _bm25_rank(tf, df_, stats)


def q_twap(spark, sf_dir):
    """Time-weighted average (the TWAP of market-data engines): per
    (event_type, day), weight each value by the µs it "held" — until
    the next event of that type that day, or the end-of-day boundary
    for the last one — and report Σ(value·w)/Σ(w).

    Scale shape: ONE window pass (lead over the (event_type, day)
    partition — the same shuffle the aggregation needs, so the whole
    query is a single exchange) followed by a map-side-combinable hash
    aggregation. Weights stay exact BIGINT µs; only the final weighted
    mean is double, rounded to 6 dp on both engines to absorb
    summation-order jitter. NULL values are filtered first (a NULL
    observation cannot "hold" an interval); Σw > 0 by construction
    because every event precedes its day's end boundary."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # materialize `day` as a named column BEFORE the window so the
    # window partitioning and the downstream groupBy reference the SAME
    # attribute — Catalyst then proves the agg's required distribution
    # is already satisfied and elides the second exchange
    base = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    t = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    day_end = F.unix_micros(F.col("day") + F.expr("INTERVAL 1 DAY"))
    timed = base.select(
        "event_type",
        "day",
        "value",
        (F.coalesce(F.lead(t).over(w), day_end) - t).alias("w"),
    )
    # group on the window's own partition key (event_type, day) — the
    # agg then reuses the window's exchange (ONE shuffle total); the
    # display string is projected after the agg, never grouped on
    return (
        timed.groupBy("event_type", "day")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("w")) / F.sum("w").cast("double"),
                6,
            ).alias("twap"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            "twap",
            "n",
        )
    )


SQL_TWAP = """
WITH e AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id, value,
         epoch_us(ts) AS t
  FROM events WHERE value IS NOT NULL),
x AS (
  SELECT event_type, day, value,
         coalesce(lead(t) OVER (PARTITION BY event_type, day
                                ORDER BY ts, event_id),
                  epoch_us(day + INTERVAL 1 DAY)) - t AS w
  FROM e)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s,
       round(SUM(value * w) / CAST(SUM(w) AS DOUBLE), 6) AS twap,
       COUNT(*) AS n
FROM x GROUP BY 1, 2
"""


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for every (prev event_type → next event_type) pair, the
    transition count and conditional probability P(next | prev) — the
    standard sequence profile behind session modeling and synthetic-
    sequence generation.

    Scale shape: one window shuffle partitioned by user_id (sequences
    are per-user, so partitions are user-bounded and skew-free), then
    a hash aggregation whose key space is |event_type|² (bounded,
    ~25 rows — map-side combine collapses each task's output to that),
    and the P(next|prev) normalization is a window over the bounded
    matrix frame, never over raw events. Ordering is total (ts,
    event_id) so the pairing is deterministic on both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = pairs.groupBy("prev", "nxt").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev")
    return counts.select(
        "prev",
        "nxt",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


SQL_MARKOV_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (SELECT prev, nxt, COUNT(*) AS n FROM seq
      WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT prev, nxt, n,
       round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev), 6) AS p
FROM c
"""


def q_rolling_corr(spark, sf_dir):
    """Rolling Pearson correlation between value and time over each
    user's trailing 64 observations of an event_type (a per-user
    trend-strength signal: +1 = that user's values rising across the
    window, −1 = falling) — the moving-window second-moment tier above
    window_moving_avg's first moments.

    Scale shape: one window exchange partitioned by (user_id,
    event_type) with a BOUNDED trailing ROWS frame. Both bounds are
    deliberate 100 TB choices: (a) the partition key includes user_id
    because a per-event_type-only window caps parallelism at
    |event_type| (5 sequential task streams on a 1000-executor
    cluster), while user cardinality grows with the data; (b) the
    frame is row-count bounded, not time-RANGE bounded — Spark's
    sliding-frame aggregates replay the frame when the lower bound
    moves (declarative aggregates have no retract), so a time-based
    frame costs O(n · rows-per-24h), measured 17.4 s at sf0.1 and
    growing with ingest DENSITY, while ROWS 63 PRECEDING is ≤64
    updates per row, linear at any scale and density. (Since round 13
    the TRUE 24 h RANGE semantics are available at the same cost via
    the retract-capable incremental kernel — q_rolling_corr_range /
    functions/sliding.py; this entry remains the declarative ROWS
    face.) The time
    regressor is re-based to the epoch floor (2024-01-01): raw
    epoch-µs magnitudes (~1.7e15) would burn 5 of double's 16 digits
    on a constant offset and make the co-moment subtraction
    cancellation-prone; corr is shift-invariant so the result is
    unchanged. Ordering is total ((t, event_id) — replicated fixtures
    can duplicate ts) so frame membership is deterministic on both
    engines. NaN (single-row frame on Spark; zero variance) is
    normalized to NULL to match DuckDB, and the value rounds to 6 dp
    to absorb moment-accumulation order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    base = F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy(t_us, "event_id")
        .rowsBetween(-63, 0)
    )
    c = F.corr(F.col("value"), (t_us - base).cast("double")).over(w)
    # the NOT NULL filter drops degenerate frames (n=1 → NaN on Spark,
    # NULL on DuckDB) AND makes the row count depend on the corr value,
    # so a count()-shaped consumer (bench) can't column-prune the
    # Window away and time an empty scan
    return (
        ev.select(
            "event_id",
            "event_type",
            F.when(F.isnan(c), F.lit(None))
            .otherwise(F.round(c, 6))
            .alias("trend"),
        )
        .filter(F.col("trend").isNotNull())
    )


SQL_ROLLING_CORR = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t,
         CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE) AS tr
  FROM events),
c AS (
  SELECT event_id, event_type,
         corr(value, tr) OVER (PARTITION BY user_id, event_type
                               ORDER BY t, event_id
                               ROWS BETWEEN 63 PRECEDING
                               AND CURRENT ROW) AS c
  FROM e)
SELECT event_id, event_type,
       CASE WHEN isnan(c) THEN NULL ELSE round(c, 6) END AS trend
FROM c
WHERE CASE WHEN isnan(c) THEN NULL ELSE round(c, 6) END IS NOT NULL
"""


def q_ssjoin_prefix(spark, sf_dir):
    """Exact τ=0.5 shingle-Jaccard similarity join via prefix filtering
    (functions/dedup_approx.py::ssjoin_prefix_pairs — SSJoin/PPJoin
    prefix filter, distributed per Vernica et al. SIGMOD'10): every
    doc pair with 5-gram Jaccard ≥ 0.5, candidates generated from the
    rarest-first prefix of each doc's shingle set instead of every
    shared shingle. The oracle is the brute-force ground truth over
    ALL shared-shingle pairs, so the gate checks the prefix filter's
    recall (a missed pair fails the row count) AND precision (a
    sub-threshold survivor fails the hash)."""
    from .functions.dedup_approx import ssjoin_prefix_pairs

    return ssjoin_prefix_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )


SQL_SSJOIN_PREFIX = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
sh AS (SELECT doc_id, list_distinct(
         list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
                        i -> array_to_string(list_slice(toks, i, i + 4), ' ')))
         AS shs
       FROM t),
s AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
           FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, n_shared,
       CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
FROM shared JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.5
"""


def q_mutual_information(spark, sf_dir):
    """Pointwise mutual information profile between two categorical
    features (event_type × weekday) — the association-mining /
    feature-relevance primitive: per cell, the joint count and
    pmi = ln(n_xy·N / (n_x·n_y)), positive where the pair co-occurs
    more than independence predicts.

    Scale shape: ONE hash aggregation whose key space is the bounded
    feature-domain product (|types|×7 = 35 cells); marginals and N
    fold in as window sums over that bounded frame — the corpus is
    never re-scanned and nothing row-bound shuffles. Per-cell
    arithmetic is exact-int inputs → one ln, rounded to 6 dp to absorb
    libm ulps. Weekday aligns across engines as Spark dayofweek()−1 =
    DuckDB dayofweek() (Sunday = 0)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    joint = ev.groupBy(
        F.col("event_type").alias("x"),
        (F.dayofweek("ts") - 1).alias("y"),
    ).agg(F.count("*").alias("n_xy"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    return joint.select(
        "x",
        "y",
        "n_xy",
        F.round(
            F.log(
                F.col("n_xy").cast("double")
                * F.sum("n_xy").over(wall)
                / (F.sum("n_xy").over(wx) * F.sum("n_xy").over(wy))
            ),
            6,
        ).alias("pmi"),
    )


SQL_MUTUAL_INFORMATION = """
WITH j AS (
  SELECT event_type AS x, dayofweek(ts) AS y, COUNT(*) AS n_xy
  FROM events GROUP BY 1, 2)
SELECT x, y, n_xy,
       round(ln(CAST(n_xy AS DOUBLE) * SUM(n_xy) OVER ()
                / (SUM(n_xy) OVER (PARTITION BY x)
                   * SUM(n_xy) OVER (PARTITION BY y))), 6) AS pmi
FROM j
"""


def q_mmr_rerank(spark, sf_dir):
    """Diversity-aware retrieval: Maximal Marginal Relevance (MMR,
    Carbonell & Goldstein SIGIR'98) reranking of the top-10 cosine
    candidates for query vec 0 — greedily pick 3 results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-picked (λ=0.7), the
    standard redundancy-suppressing step between ANN retrieval and an
    LLM context window.

    Scale shape: the only corpus-bound work is the candidate stage —
    pre-normalized vectors, broadcast query, top-10 via
    TakeOrderedAndProject (no global sort). The greedy loop
    (functions/similarity.py::mmr_rerank, parameterized over k since
    round 13 — this entry pins k=3, pool=10) is k DataFrame steps over
    the persisted pool-row candidate frame: each step anti-conditions
    on picked ids, computes the penalty as greatest(dot to each picked
    vector), and takes limit(1) — pool- and k-bounded, never
    corpus-bound. Dot products are sequential folds on both engines
    (bit-identical doubles, the cosine-tier contract), so raw-score
    ordering with id tie-break is deterministic cross-engine; scores
    round to 6 dp at output only. Pick 1's penalty term is zero (max
    over the empty set), so every reported score is uniformly
    λ·rel − (1−λ)·penalty."""
    from .functions.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    out = mmr_rerank(emb, query_id=0, k=3, pool=10, lam=0.7)
    return out.select("rank", "neighbor_id", F.round("score", 6).alias("score"))


SQL_MMR_RERANK = f"""
WITH u AS ({_EMB_U}),
q AS (SELECT uv AS qv FROM u WHERE vec_id = 0),
cand AS (
  SELECT b.vec_id AS id, b.uv,
         list_sum(list_transform(list_zip(q.qv, b.uv), p -> p[1] * p[2]))
           AS rel
  FROM q, u b WHERE b.vec_id != 0
  ORDER BY rel DESC, id LIMIT 10),
p1 AS (SELECT id, uv, 0.7 * rel AS score FROM cand
       ORDER BY rel DESC, id LIMIT 1),
s2 AS (
  SELECT c.id, c.uv, c.rel,
         0.7 * c.rel - 0.3 * list_sum(list_transform(
             list_zip(c.uv, p1.uv), p -> p[1] * p[2])) AS score
  FROM cand c, p1 WHERE c.id != p1.id),
p2 AS (SELECT id, uv, score FROM s2 ORDER BY score DESC, id LIMIT 1),
s3 AS (
  SELECT c.id, c.rel,
         0.7 * c.rel - 0.3 * greatest(
           list_sum(list_transform(list_zip(c.uv, p1.uv), p -> p[1] * p[2])),
           list_sum(list_transform(list_zip(c.uv, p2.uv), p -> p[1] * p[2])))
           AS score
  FROM cand c, p1, p2 WHERE c.id != p1.id AND c.id != p2.id),
p3 AS (SELECT id, score FROM s3 ORDER BY score DESC, id LIMIT 1)
SELECT 1 AS rank, id AS neighbor_id, round(score, 6) AS score FROM p1
UNION ALL SELECT 2, id, round(score, 6) FROM p2
UNION ALL SELECT 3, id, round(score, 6) FROM p3
"""


def q_sequence_match(spark, sf_dir):
    """Row-sequence pattern matching (the MATCH_RECOGNIZE of stream
    engines, restricted to per-entity regular patterns): each user's
    event history folds to an ordered symbol string (the five event
    types map to their distinct first letters), and regex patterns
    count behavioral motifs per user — conversion journeys `v[ce]*p`
    (a view, any clicks/errors, then a purchase), instant conversions
    `vp`, and error bursts `ee+`. Matching is leftmost
    non-overlapping on both engines (Java regex find-loop, RE2), and
    the greedy character-class patterns used here have identical
    semantics under both.

    Scale shape: one user-keyed hash-aggregated collect (per-entity
    history retention-bounded by contract, same argument as q_ewma,
    and equally ENFORCED via _history_cap_guard — an over-cap entity
    raises a diagnosable error instead of OOMing the task),
    symbol-fold + regex fused into the projection — one exchange, no
    window, no join. This is the scalable MATCH_RECOGNIZE shape:
    pattern state never crosses entities, so entities partition
    freely."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("xs"),
        F.count("*").alias("n_events"),
    )
    from .functions.sliding import DEFAULT_HISTORY_CAP

    s = _history_cap_guard(
        F.concat_ws(
            "",
            F.transform(
                "xs", lambda r: F.substring(r.getField("event_type"), 1, 1)
            ),
        ),
        "n_events",
        "user_id",
        DEFAULT_HISTORY_CAP,
        "q_sequence_match",
    )

    def n(pat):
        return F.size(F.regexp_extract_all(s, F.lit(pat), 0))

    return seq.select(
        "user_id",
        "n_events",
        n("v[ce]*p").alias("n_conversions"),
        n("vp").alias("n_instant"),
        n("ee+").alias("n_error_bursts"),
    )


SQL_SEQUENCE_MATCH = """
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id)
SELECT user_id, n_events,
       len(regexp_extract_all(seq, 'v[ce]*p')) AS n_conversions,
       len(regexp_extract_all(seq, 'vp')) AS n_instant,
       len(regexp_extract_all(seq, 'ee+')) AS n_error_bursts
FROM s
"""


def q_decile_lift(spark, sf_dir):
    """Decile lift table — the model-eval report behind every ranking/
    filtering deployment: bucket documents into GLOBAL score deciles
    (score = n_chars), report each decile's size, positive count
    (label: lang = 'en'), exact rate in ppm, and lift vs the base
    rate.

    Scale shape: global decile assignment WITHOUT a global sort — the
    naive ntile(10) OVER (ORDER BY score) range-sorts the corpus; here
    the 9 decile boundaries come from ONE pass of the shared
    bounded-state multi-percentile kernel (operators/relational.py::
    grouped_exact_percentiles with no grouping keys — histogram state
    ∝ distinct score values, bit-identical to Spark's built-in by the
    hybrid interpolation contract; oracle via _sql_hybrid_pct, since
    quantile_cont's ulp-off boundaries on this duplicate-heavy int
    column could flip a bucket), the 1-row boundary frame broadcasts
    over the scan, and bucket = count of boundaries below the score —
    a pure projection. Rates are integer-div ppm (exact); lift is the
    double ratio of two exact ppm ints, identical cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    ps = {f"b{i}": i / 10 for i in range(1, 10)}
    bounds = grouped_exact_percentiles(docs, [], "n_chars", ps)
    dec = docs.crossJoin(F.broadcast(bounds)).select(
        sum(
            [(F.col("n_chars") > F.col(f"b{i}")).cast("int") for i in range(1, 10)],
            F.lit(0),
        ).alias("decile"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    )
    per = dec.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("pos").alias("n_pos")
    )
    tot = per.agg(
        F.expr("sum(n_pos) * 1000000 div sum(n)").alias("base_ppm")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            F.expr("n_pos * 1000000 div n").alias("rate_ppm"),
            F.round(
                F.expr("n_pos * 1000000 div n").cast("double")
                / F.col("base_ppm"),
                6,
            ).alias("lift"),
        )
    )


SQL_DECILE_LIFT = f"""
WITH b AS ({_sql_hybrid_pct(
    "(SELECT n_chars FROM documents WHERE n_chars IS NOT NULL) s",
    [],
    "n_chars",
    {f"b{i}": i / 10 for i in range(1, 10)},
)}),
d AS (
  SELECT (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b2 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b3 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b4 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b5 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b6 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b7 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b8 THEN 1 ELSE 0 END
        + CASE WHEN n_chars > b9 THEN 1 ELSE 0 END) AS decile,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents, b),
per AS (SELECT decile, COUNT(*) AS n, SUM(pos) AS n_pos FROM d GROUP BY 1),
t AS (SELECT SUM(n_pos) * 1000000 // SUM(n) AS base_ppm FROM per)
SELECT decile, n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_pos * 1000000 // n AS BIGINT) AS rate_ppm,
       round(CAST(n_pos * 1000000 // n AS DOUBLE) / base_ppm, 6) AS lift
FROM per, t
"""


def q_table_checksum(spark, sf_dir):
    """Order-independent table checksum, grouped by l_returnflag — the
    anti-entropy / replication-verification primitive (compare source
    and replica checksums per partition to locate divergence without
    moving rows): each row canonicalizes to a '|'-joined string with
    NULL → '\\N', hashes through md5 with the top 60 bits taken as a
    BIGINT (the portable cross-engine hash this repo's simhash oracle
    established), and the per-group checksum is the exact decimal SUM
    of row hashes — commutative, so partition/arrival order is
    irrelevant, and mergeable across shards by addition. Exact-typed
    columns only (keys, ints, flags, a formatted date): float→text is
    not portable across engines, so a production checksum would
    canonicalize doubles first (documented exclusion, not an
    oversight). One hash aggregation keyed by the bounded flag domain;
    checksum emitted as a digit string (exact at any magnitude — never
    a double)."""
    li = load_table(spark, sf_dir, "lineitem")

    def s(c):
        return F.coalesce(F.col(c).cast("string"), F.lit("\\N"))

    row = F.concat_ws(
        "|",
        s("l_orderkey"),
        s("l_partkey"),
        s("l_suppkey"),
        s("l_linenumber"),
        s("l_returnflag"),
        s("l_linestatus"),
        F.coalesce(F.date_format("l_shipdate", "yyyy-MM-dd"), F.lit("\\N")),
    )
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(h).cast("decimal(38,0)").alias("cs"),
        )
        .select(
            "l_returnflag", "n_rows", F.col("cs").cast("string").alias("checksum")
        )
    )


SQL_TABLE_CHECKSUM = r"""
WITH h AS (
  SELECT l_returnflag,
         CAST(('0x' || substring(md5(
           COALESCE(CAST(l_orderkey AS VARCHAR), '\N') || '|' ||
           COALESCE(CAST(l_partkey AS VARCHAR), '\N') || '|' ||
           COALESCE(CAST(l_suppkey AS VARCHAR), '\N') || '|' ||
           COALESCE(CAST(l_linenumber AS VARCHAR), '\N') || '|' ||
           COALESCE(l_returnflag, '\N') || '|' ||
           COALESCE(l_linestatus, '\N') || '|' ||
           COALESCE(strftime(l_shipdate, '%Y-%m-%d'), '\N')
         ), 1, 15)) AS BIGINT) AS h
  FROM lineitem)
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(CAST(SUM(h) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM h GROUP BY 1
"""


def q_minhash_incremental(spark, sf_dir):
    """LSH dedup served from an INCREMENTALLY MAINTAINED band-bucket
    index — the dedup counterpart to q_bm25_incremental's term index:
    documents arrive in three deterministic batches (doc_id % 3), each
    batch computing its MinHash band keys (functions/dedup_approx.py::
    minhash_signatures + minhash_bands — the exact one-shot kernel)
    and upserting (band, bh, doc_id) rows into a MaterializedCounts
    table; the committed index is then bucket-capped (64, the same
    guard as the one-shot) and self-joined into candidate pairs. The
    oracle is the ONE-SHOT LSH SQL (SQL_MINHASH_LSH_PAIRS), so the
    gate proves the maintained index yields the identical candidate
    set no matter how the corpus was batched — the invariant that lets
    a 100 TB dedup pipeline index new documents as they land (each
    batch's merge touches only the buckets its bands hash to) instead
    of recomputing signatures corpus-wide. Temp-dir state is
    atexit-cleaned (the returned frame reads it lazily)."""
    import atexit
    import shutil
    import tempfile

    from .functions.dedup_approx import minhash_bands, minhash_signatures
    from .streaming.mat_view import MaterializedCounts

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="minhash_index_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    index = MaterializedCounts(
        path, keys=("band", "bh", "doc_id"), value_col=None, n_buckets=8
    )
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == i)
        index.apply_batch(minhash_bands(minhash_signatures(batch)), i)
    from pyspark.sql import Window

    state = index.read(spark).select("band", "bh", "doc_id")
    bucket_n = F.count("*").over(Window.partitionBy("band", "bh"))
    capped = (
        state.withColumn("__n", bucket_n)
        .filter(F.col("__n") <= 64)
        .drop("__n")
    )
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def q_ivf_incremental(spark, sf_dir):
    """ANN top-k served from an INCREMENTALLY MAINTAINED inverted
    file — completing the index-as-you-land triple (q_bm25_incremental:
    term index; q_minhash_incremental: band-bucket index; here: IVF
    posting lists). The codebook is FROZEN at train time
    (kmeans_centroids k=16, 2 Lloyd rounds — the exact
    q_ivf_topk_trained trainer); vectors then arrive in three
    deterministic batches (vec_id % 3), each assigned under the frozen
    codebook (functions/similarity.py::ivf_assign — broadcast
    centroids, map-side max_by, the corpus never shuffled with vectors
    attached) and upserted as (bucket, vec_id) postings into a
    MaterializedCounts table, so each batch's merge touches only the
    buckets its vectors land in, never the whole index. The committed
    posting list then serves ivf_topk through its ``assignments`` fast
    path (no in-query assignment pass). The oracle is the ONE-SHOT
    trained-IVF SQL (_sql_ivf_topk_trained), so the gate proves the
    maintained index answers top-k IDENTICALLY to an index built in
    one pass over the whole corpus, no matter how ingestion was
    batched — the invariant that lets a 100 TB retrieval pipeline
    index embeddings as they land instead of rebuilding the inverted
    file corpus-wide. Temp-dir state is atexit-cleaned (the returned
    frame reads it lazily)."""
    import atexit
    import shutil
    import tempfile

    from .functions.similarity import ivf_assign, ivf_topk, kmeans_centroids
    from .streaming.mat_view import MaterializedCounts

    emb = load_table(spark, sf_dir, "embeddings")
    # frozen MECHANICALLY, not just conceptually: kmeans_centroids
    # localCheckpoints eagerly per Lloyd round, so cents is a
    # materialized 16-row RDD — the three apply_batch actions and the
    # final top-k REUSE it (~0.1 s per re-action, no embeddings scan
    # in its executed plan) instead of re-training (verified round 14)
    cents = kmeans_centroids(emb, k=16, iters=2)
    path = tempfile.mkdtemp(prefix="ivf_index_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    # the posting key is named ivf_bucket: "bucket" is the index
    # table's own internal partitioning column
    index = MaterializedCounts(
        path, keys=("ivf_bucket", "vec_id"), value_col=None, n_buckets=8
    )
    for i in range(3):
        batch = emb.filter(F.col("vec_id") % 3 == i)
        index.apply_batch(
            ivf_assign(batch, cents).withColumnRenamed("bucket", "ivf_bucket"),
            i,
        )
    postings = index.read(spark).select(
        "vec_id", F.col("ivf_bucket").alias("bucket")
    )
    return ivf_topk(
        emb,
        query_ids=[0, 1, 2, 3, 4],
        k=5,
        centroids=cents,
        assignments=postings,
    )


def _history_cap_guard(result, n_col, entity_col, cap, where):
    """Wrap a per-entity computed column so a retention-contract
    violation degrades into a DIAGNOSABLE runtime error instead of a
    task OOM: entities whose collected history exceeds ``cap`` rows
    raise with the entity id in the message; everything else passes
    ``result`` through untouched. CaseWhen short-circuits per row, so
    raise_error fires only on violating entities — contract-respecting
    data is plan- and hash-identical to the unguarded form. Used by
    the collect_list entries (q_ewma, q_sequence_match), whose task
    memory is O(per-entity history) by design."""
    msg = F.concat(
        F.lit(
            f"{where}: entity history exceeds the retention-contract "
            f"cap of {cap} rows (task memory is O(history) here) — "
            "entity "
        ),
        F.col(entity_col).cast("string"),
        F.lit(", rows "),
        F.col(n_col).cast("string"),
    )
    return F.when(F.col(n_col) > cap, F.raise_error(msg)).otherwise(result)


def ewma_fold(vals, alpha):
    """The EWMA left fold s_i = α·x_i + (1−α)·s_{i−1}, seeded with the
    FIRST element, as one Column over an array<double> — the exact
    IEEE operation sequence q_ewma's cross-engine bit-equality gate
    pins. SHARED with tests/test_properties.py::
    test_ewma_fold_bit_equality_property (round-19 advice): the fuzz
    must exercise THE expression the query ships, so a reassociation
    here (fma fusion, acc + α·(x−acc)) fails the fuzz, not just the
    strict-float oracle tier."""
    return F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )


def q_ewma(spark, sf_dir):
    """Per-entity exponential smoothing (EWMA, α=0.3): the final
    smoothed value of each (user, event_type) series — the
    feature-store "current smoothed state per entity" pattern. EWMA is
    a linear recurrence (s_i = α·x_i + (1−α)·s_{i−1}), which no
    window frame expresses; the scalable form is a LEFT FOLD over the
    entity's time-ordered values: collect the per-entity sequence
    (bounded: events-per-user is retention-bounded by contract — the
    testdata holds it ~66 at every SF while users grow with the data,
    so state per group never scales with corpus size; ENFORCED via
    _history_cap_guard — an over-cap entity raises a diagnosable error
    naming it instead of OOMing the task at scale), seed with the
    first observation, fold α·x + (1−α)·acc. Both engines execute the
    IDENTICAL left fold over the identically-ordered list — same IEEE
    ops in the same order — so the double is bit-identical
    cross-engine with NO rounding shield (the repo rounds only where
    accumulation order can differ; here it cannot). Plan: one
    partial-aggregated collect per entity, fold fused into the
    projection; total order (ts, event_id) pins the sequence."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    a = 0.3
    seq = ev.groupBy("user_id", "event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("xs"),
        F.count("*").alias("n"),
    )
    vals = F.transform("xs", lambda s: s.getField("value"))
    ewma = ewma_fold(vals, a)
    from .functions.sliding import DEFAULT_HISTORY_CAP

    guarded = _history_cap_guard(
        ewma, "n", "user_id", DEFAULT_HISTORY_CAP, "q_ewma"
    )
    return seq.select("user_id", "event_type", "n", guarded.alias("ewma"))


SQL_EWMA = """
WITH s AS (
  SELECT user_id, event_type,
         list(value ORDER BY ts, event_id) AS vals,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2)
SELECT user_id, event_type, n,
       list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc) AS ewma
FROM s
"""


def q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity privacy audit over the customer
    quasi-identifiers (nation, market segment) — the release-gate
    check a training-data pipeline runs before publishing joined
    records: every QI equivalence class with its size (k), the count
    of distinct sensitive values in it (l; sensitive = account-balance
    kilobucket), and an at-risk flag for classes of size ≤ 5 (k < 6 —
    the conventional "release only classes you could hide 5 people
    in" parameter; round-15 signal audit: the earlier k < 5 cut was
    constant False at sf0.01, the gate SF, so the flag's branch was
    never exercised where the gate runs — k < 6 has occupied classes
    on BOTH sides at sf0.001 and sf0.01. At large SF every class of
    this bounded QI domain saturates past any fixed k; that is
    k-anonymity's semantics, not a dead predicate).

    Scale shape: ONE hash aggregation whose key space is the QI
    domain (|nations|×|segments| — bounded, never row-bound), with
    the l-diversity distinct folded into the same pass via Spark's
    count_distinct expansion; integer arithmetic throughout."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    return (
        cust.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("*").alias("k"),
            F.countDistinct(band).alias("l_div"),
        )
        .select(
            "nation",
            "segment",
            "k",
            "l_div",
            (F.col("k") < 6).alias("at_risk"),
        )
    )


SQL_K_ANONYMITY = """
SELECT c_nationkey AS nation, c_mktsegment AS segment,
       COUNT(*) AS k,
       COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS l_div,
       COUNT(*) < 6 AS at_risk
FROM customer GROUP BY 1, 2
"""


def q_expectations_audit(spark, sf_dir):
    """Data-contract expectation audit (the great-expectations /
    dbt-test pattern): five row-level rules over lineitem — quantity
    ceiling, discount ceiling, tax ceiling, returnflag enum
    membership, positive price — each reported as (rule, violation
    count, ppm). ALL rules evaluate in ONE conditional-aggregation
    pass over the scan (never a scan per rule — at 100 TB the audit
    must cost one read no matter how many expectations the contract
    holds), then the 1-row wide result unpivots to per-rule rows via
    stack. ppm is integer `div` arithmetic — exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    wide = li.agg(
        viol(F.col("l_quantity") > 45).alias("qty_ceiling"),
        viol(F.col("l_discount") > 0.06).alias("disc_ceiling"),
        viol(F.col("l_tax") > 0.07).alias("tax_ceiling"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("flag_enum"),
        viol(F.col("l_extendedprice") <= 0).alias("price_pos"),
        F.count("*").alias("n"),
    )
    rules = wide.selectExpr(
        "stack(5, 'qty_ceiling', qty_ceiling, 'disc_ceiling', disc_ceiling,"
        " 'tax_ceiling', tax_ceiling, 'flag_enum', flag_enum,"
        " 'price_pos', price_pos) as (rule, n_violations)",
        "n",
    )
    return rules.select(
        "rule",
        "n_violations",
        F.expr("n_violations * 1000000 div n").alias("ppm"),
    )


SQL_EXPECTATIONS_AUDIT = """
WITH a AS (
  SELECT
    SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS qty_ceiling,
    SUM(CASE WHEN l_discount > 0.06 THEN 1 ELSE 0 END) AS disc_ceiling,
    SUM(CASE WHEN l_tax > 0.07 THEN 1 ELSE 0 END) AS tax_ceiling,
    SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)
      AS flag_enum,
    SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS price_pos,
    COUNT(*) AS n
  FROM lineitem),
u AS (
  SELECT 'qty_ceiling' AS rule, qty_ceiling AS v, n FROM a
  UNION ALL SELECT 'disc_ceiling', disc_ceiling, n FROM a
  UNION ALL SELECT 'tax_ceiling', tax_ceiling, n FROM a
  UNION ALL SELECT 'flag_enum', flag_enum, n FROM a
  UNION ALL SELECT 'price_pos', price_pos, n FROM a)
SELECT rule, CAST(v AS BIGINT) AS n_violations,
       CAST(v * 1000000 // n AS BIGINT) AS ppm
FROM u
"""


def q_rolling_corr_range(spark, sf_dir):
    """Rolling Pearson correlation with TRUE time-RANGE semantics —
    each event's trend over its entity's trailing 24 HOURS (all rows
    with t ∈ [tᵢ−24h, tᵢ], ties included), not a row-count proxy.
    This is the capability q_rolling_corr deliberately routed around:
    Spark's declarative sliding frames have no retract, so the RANGE
    form replays the frame per row — measured 17.4 s vs 0.83 s at
    sf0.1 and O(n·rows-per-24h), growing with ingest DENSITY. Here the
    frame is computed by the retract-capable incremental kernel
    (functions/sliding.py::rolling_corr_range): per-entity Arrow-
    batched applyInPandas, prefix-summed co-moments + two binary
    searches per row — O(n log n) per entity at ANY density (probe:
    tools/range_frame_probe.py).

    Scale shape: ONE exchange on (user_id, event_type) — entity
    cardinality grows with the data, so parallelism does too; task
    memory is O(per-entity history), retention-bounded by contract and
    ENFORCED by the kernel's history_cap (a pathological entity fails
    with a diagnosable error, not a task OOM). Zero-variance frames
    are excluded by EXACT integer tests, never FP residue; the 6 dp
    round absorbs cross-engine accumulation-order differences (DuckDB
    merges segment-tree co-moment states)."""
    from .functions.sliding import rolling_corr_range

    ev = load_table(spark, sf_dir, "events")
    df = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").cast("double").alias("value"),
    )
    out = rolling_corr_range(
        df,
        entity_cols=["user_id", "event_type"],
        t_us_col="t_us",
        y_col="value",
        window_us=86_400_000_000,
        id_cols=["event_id", "event_type"],
        out_col="trend",
    )
    return out.select(
        "event_id", "event_type", F.round("trend", 6).alias("trend")
    )


SQL_ROLLING_CORR_RANGE = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t
  FROM events),
c AS (
  SELECT event_id, event_type,
         corr(value, CAST(t AS DOUBLE) / 86400000000.0)
           OVER (PARTITION BY user_id, event_type
                 ORDER BY t
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
           AS c
  FROM e)
SELECT event_id, event_type,
       CASE WHEN isnan(c) THEN NULL ELSE round(c, 6) END AS trend
FROM c
WHERE CASE WHEN isnan(c) THEN NULL ELSE round(c, 6) END IS NOT NULL
"""


def q_ann_recall(spark, sf_dir):
    """ANN quality eval as a first-class operator: recall@5 of the
    IVF-bucketed approximate top-k against the exact brute-force
    top-k, per query — the acceptance gate every production ANN
    deployment runs before (and periodically after) switching the
    retrieval path from exact to approximate. Output: one row per
    query (n_hits, recall_at_5).

    Scale shape: both sides are existing registry operators (sim_topk
    exact baseline, ivf_topk bucketed path) whose own plans are
    corpus-bound only in their candidate stages (TakeOrderedAndProject
    heaps, no global sort); the eval itself joins two |queries|·k-row
    frames — broadcast territory. recall = n_hits / 5.0 is one IEEE
    division of identical operands on both engines (bit-identical, no
    rounding shield). Oracle: the two entries' own SQL oracles
    composed as derived tables — the gate checks the eval arithmetic
    AND re-checks both retrieval paths in one entry."""
    from .functions.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, query_ids=qids, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(emb, query_ids=qids, k=5).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    hit = exact.join(
        F.broadcast(approx),
        (exact.query_id == F.col("aq")) & (exact.neighbor_id == F.col("an")),
        "left",
    )
    return hit.groupBy("query_id").agg(
        F.count("an").alias("n_hits"),
        (F.count("an") / F.lit(5.0)).alias("recall_at_5"),
    )


# the eval's oracle literally embeds the two retrieval oracles as
# derived tables (DuckDB accepts WITH inside a parenthesized subquery)
SQL_ANN_RECALL = f"""
WITH ex AS ({SQL_SIM_TOPK}), ap AS ({SQL_IVF_TOPK})
SELECT ex.query_id,
       CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_hits,
       COUNT(ap.neighbor_id) / 5.0 AS recall_at_5
FROM ex LEFT JOIN ap
  ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.query_id
"""


def q_rolling_range_stats(spark, sf_dir):
    """Standard aggregates over the TRUE time-RANGE trailing frame —
    the second face of the retract-capable kernel next to
    q_rolling_corr_range: per event, the (count, sum, mean, population
    std) of its entity's values over the trailing 24 hours, all four
    from ONE kernel pass (functions/sliding.py::rolling_range_stats).
    The declarative form replays the frame per row for EACH aggregate;
    the kernel's prefix-differenced moments price the whole family at
    two binary searches per row regardless of frame size or density.

    Same plan shape and enforcement as the corr entry: one entity-hash
    exchange, batch-vectorized mapInPandas, history cap. Exactness:
    n_frame is integer-exact; sum/mean/std round to 6 dp (cross-engine
    accumulation order); a value-degenerate frame's std is pinned to
    exact 0 via the change-count test, never FP residue."""
    from .functions.sliding import rolling_range_stats

    ev = load_table(spark, sf_dir, "events")
    df = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").cast("double").alias("value"),
    )
    out = rolling_range_stats(
        df,
        entity_cols=["user_id", "event_type"],
        t_us_col="t_us",
        y_col="value",
        window_us=86_400_000_000,
        id_cols=["event_id", "event_type"],
    )
    return out.select(
        "event_id",
        "event_type",
        "n_frame",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("mean_v", 6).alias("mean_v"),
        F.round("std_v", 6).alias("std_v"),
        "min_v",
        "max_v",
    )


SQL_ROLLING_RANGE_STATS = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t
  FROM events)
SELECT event_id, event_type,
       COUNT(value) OVER w AS n_frame,
       round(SUM(value) OVER w, 6) AS sum_v,
       round(AVG(value) OVER w, 6) AS mean_v,
       round(STDDEV_POP(value) OVER w, 6) AS std_v,
       MIN(value) OVER w AS min_v,
       MAX(value) OVER w AS max_v
FROM e
WINDOW w AS (PARTITION BY user_id, event_type
             ORDER BY t
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""


REGISTRY: dict[str, QuerySpec] = {
    # reference surface
    "filter_level": QuerySpec(q_filter_level, SQL_FILTER_LEVEL, ("reference", "filter")),
    "filter_notnull": QuerySpec(q_filter_notnull, SQL_FILTER_NOTNULL, ("reference", "filter")),
    "json_decode": QuerySpec(q_json_decode, SQL_JSON_DECODE, ("reference", "json")),
    "json_encode": QuerySpec(q_json_encode, SQL_JSON_ENCODE, ("reference", "json")),
    "dedup_exact": QuerySpec(q_dedup_exact, SQL_DEDUP_EXACT, ("reference", "dedup")),
    "dedup_windowed": QuerySpec(q_dedup_windowed, SQL_DEDUP_WINDOWED, ("reference", "dedup")),
    "dedup_null_passthrough": QuerySpec(
        q_dedup_null_passthrough, SQL_DEDUP_NULL_PASSTHROUGH, ("reference", "dedup")
    ),
    "dedup_refresh": QuerySpec(q_dedup_refresh, SQL_DEDUP_REFRESH, ("reference", "dedup")),
    "json_deadletter": QuerySpec(q_json_deadletter, SQL_JSON_DEADLETTER, ("reference", "json")),
    "reference_pipeline": QuerySpec(q_reference_pipeline, SQL_REFERENCE_PIPELINE, ("reference", "pipeline")),
    # relational core
    "agg_pricing_summary": QuerySpec(q_agg_pricing_summary, SQL_AGG_PRICING_SUMMARY, ("relational",)),
    "join_customer_orders": QuerySpec(q_join_customer_orders, SQL_JOIN_CUSTOMER_ORDERS, ("relational",)),
    "join_multiway_region": QuerySpec(q_join_multiway_region, SQL_JOIN_MULTIWAY_REGION, ("relational",)),
    "join_semi": QuerySpec(q_join_semi, SQL_JOIN_SEMI, ("relational",)),
    "bloom_semi_join": QuerySpec(
        q_bloom_semi_join, SQL_BLOOM_SEMI_JOIN, ("relational", "pipeline")
    ),
    "fk_integrity": QuerySpec(
        q_fk_integrity, SQL_FK_INTEGRITY, ("relational", "pipeline", "eval")
    ),
    "join_anti": QuerySpec(q_join_anti, SQL_JOIN_ANTI, ("relational",)),
    "agg_distinct": QuerySpec(q_agg_distinct, SQL_AGG_DISTINCT, ("relational",)),
    "agg_rollup": QuerySpec(q_agg_rollup, SQL_AGG_ROLLUP, ("relational",)),
    "agg_having": QuerySpec(q_agg_having, SQL_AGG_HAVING, ("relational",)),
    "window_rank": QuerySpec(q_window_rank, SQL_WINDOW_RANK, ("relational",)),
    "window_running": QuerySpec(q_window_running, SQL_WINDOW_RUNNING, ("relational",)),
    "sort_limit": QuerySpec(q_sort_limit, SQL_SORT_LIMIT, ("relational",)),
    "setop_intersect": QuerySpec(q_setop_intersect, SQL_SETOP_INTERSECT, ("relational",)),
    "setop_except": QuerySpec(q_setop_except, SQL_SETOP_EXCEPT, ("relational",)),
    "setop_intersect_all": QuerySpec(q_setop_intersect_all, SQL_SETOP_INTERSECT_ALL, ("relational",)),
    "cross_join_dims": QuerySpec(q_cross_join_dims, SQL_CROSS_JOIN_DIMS, ("relational",)),
    "sql_q5_local_supplier": QuerySpec(q_sql_q5_local_supplier, SQL_SQL_Q5_LOCAL_SUPPLIER, ("relational", "sql-api")),
    "scalar_funcs": QuerySpec(q_scalar_funcs, SQL_SCALAR_FUNCS, ("relational",)),
    "agg_windowed_events": QuerySpec(q_agg_windowed_events, SQL_AGG_WINDOWED_EVENTS, ("relational", "streaming-analog")),
    # relational core, batch 2
    "join_outer_left": QuerySpec(q_join_outer_left, SQL_JOIN_OUTER_LEFT, ("relational",)),
    "union_all": QuerySpec(q_union_all, SQL_UNION_ALL, ("relational",)),
    "window_lag_lead": QuerySpec(q_window_lag_lead, SQL_WINDOW_LAG_LEAD, ("relational",)),
    "window_moving_avg": QuerySpec(q_window_moving_avg, SQL_WINDOW_MOVING_AVG, ("relational",)),
    "agg_cube": QuerySpec(q_agg_cube, SQL_AGG_CUBE, ("relational",)),
    "asof_join": QuerySpec(q_asof_join, SQL_ASOF_JOIN, ("relational", "temporal")),
    "asof_join_tolerance": QuerySpec(
        q_asof_join_tolerance, SQL_ASOF_JOIN_TOLERANCE, ("relational", "temporal")
    ),
    "range_join": QuerySpec(q_range_join, SQL_RANGE_JOIN, ("relational", "temporal")),
    "session_stats": QuerySpec(q_session_stats, SQL_SESSION_STATS, ("relational", "temporal")),
    "scalar_funcs2": QuerySpec(q_scalar_funcs2, SQL_SCALAR_FUNCS2, ("relational",)),
    "string_funcs3": QuerySpec(q_string_funcs3, SQL_STRING_FUNCS3, ("relational",)),
    "map_explode": QuerySpec(q_map_explode, SQL_MAP_EXPLODE, ("relational",)),
    "map_funcs": QuerySpec(q_map_funcs, SQL_MAP_FUNCS, ("relational",)),
    "array_funcs": QuerySpec(q_array_funcs, SQL_ARRAY_FUNCS, ("relational", "text")),
    "agg_minmax": QuerySpec(q_agg_minmax, SQL_AGG_MINMAX, ("relational",)),
    # relational core, batch 3
    "pivot_events": QuerySpec(q_pivot_events, SQL_PIVOT_EVENTS, ("relational",)),
    "unpivot_part": QuerySpec(q_unpivot_part, SQL_UNPIVOT_PART, ("relational",)),
    "agg_string_concat": QuerySpec(q_agg_string_concat, SQL_AGG_STRING_CONCAT, ("relational",)),
    "grouping_sets": QuerySpec(q_grouping_sets, SQL_GROUPING_SETS, ("relational",)),
    "stats_moments": QuerySpec(q_stats_moments, SQL_STATS_MOMENTS, ("relational",)),
    "sql_q3_shipping": QuerySpec(q_sql_q3_shipping, SQL_SQL_Q3_SHIPPING, ("relational", "sql-api")),
    "sql_q10_returns": QuerySpec(q_sql_q10_returns, SQL_SQL_Q10_RETURNS, ("relational", "sql-api")),
    "sql_q12_latency": QuerySpec(q_sql_q12_latency, SQL_SQL_Q12_LATENCY, ("relational", "sql-api")),
    "sql_q18_large_orders": QuerySpec(
        q_sql_q18_large_orders, SQL_SQL_Q18_LARGE_ORDERS, ("relational", "sql-api")
    ),
    "sql_q21_blame_supplier": QuerySpec(
        q_sql_q21_blame_supplier, SQL_SQL_Q21_BLAME_SUPPLIER, ("relational", "sql-api")
    ),
    "sql_q17_small_qty_revenue": QuerySpec(
        q_sql_q17_small_qty_revenue, SQL_SQL_Q17_SMALL_QTY_REVENUE, ("relational", "sql-api")
    ),
    "sql_q16_supplier_cnt": QuerySpec(
        q_sql_q16_supplier_cnt, SQL_SQL_Q16_SUPPLIER_CNT, ("relational", "sql-api")
    ),
    "sql_q2_min_cost_supplier": QuerySpec(
        q_sql_q2_min_cost_supplier, SQL_SQL_Q2_MIN_COST_SUPPLIER, ("relational", "sql-api")
    ),
    "sql_q20_excess_share_supplier": QuerySpec(
        q_sql_q20_excess_share_supplier,
        SQL_SQL_Q20_EXCESS_SHARE_SUPPLIER,
        ("relational", "sql-api"),
    ),
    "sql_q22_dormant_customers": QuerySpec(
        q_sql_q22_dormant_customers, SQL_SQL_Q22_DORMANT_CUSTOMERS, ("relational", "sql-api")
    ),
    "sql_q13_order_distribution": QuerySpec(
        q_sql_q13_order_distribution,
        SQL_SQL_Q13_ORDER_DISTRIBUTION,
        ("relational", "sql-api"),
    ),
    "sql_q15_top_supplier": QuerySpec(
        q_sql_q15_top_supplier, SQL_SQL_Q15_TOP_SUPPLIER, ("relational", "sql-api")
    ),
    "sql_q19_disjunct_revenue": QuerySpec(
        q_sql_q19_disjunct_revenue, SQL_SQL_Q19_DISJUNCT_REVENUE, ("relational", "sql-api")
    ),
    "sql_q7_nation_volume": QuerySpec(
        q_sql_q7_nation_volume, SQL_SQL_Q7_NATION_VOLUME, ("relational", "sql-api")
    ),
    "sql_q9_product_profit": QuerySpec(
        q_sql_q9_product_profit, SQL_SQL_Q9_PRODUCT_PROFIT, ("relational", "sql-api")
    ),
    "sql_q14_promo_revenue": QuerySpec(
        q_sql_q14_promo_revenue, SQL_SQL_Q14_PROMO_REVENUE, ("relational", "sql-api")
    ),
    "sql_q4_priority_count": QuerySpec(
        q_sql_q4_priority_count, SQL_SQL_Q4_PRIORITY_COUNT, ("relational", "sql-api")
    ),
    "sql_q6_forecast_revenue": QuerySpec(
        q_sql_q6_forecast_revenue, SQL_SQL_Q6_FORECAST_REVENUE, ("relational", "sql-api")
    ),
    "sql_q8_market_share": QuerySpec(
        q_sql_q8_market_share, SQL_SQL_Q8_MARKET_SHARE, ("relational", "sql-api")
    ),
    "sql_q11_important_parts": QuerySpec(
        q_sql_q11_important_parts, SQL_SQL_Q11_IMPORTANT_PARTS, ("relational", "sql-api")
    ),
    "approx_distinct": QuerySpec(
        q_approx_distinct, SQL_APPROX_DISTINCT, ("relational", "approximate")
    ),
    "approx_quantiles": QuerySpec(
        q_approx_quantiles, SQL_APPROX_QUANTILES, ("relational", "approximate")
    ),
    "approx_distinct_merge": QuerySpec(
        q_approx_distinct_merge, SQL_APPROX_DISTINCT_MERGE, ("relational", "approximate")
    ),
    # relational/text batch 4
    "tfidf_top_terms": QuerySpec(q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS, ("text",)),
    "corpus_top_terms": QuerySpec(q_corpus_top_terms, SQL_CORPUS_TOP_TERMS, ("text",)),
    "top_terms_sketched": QuerySpec(
        q_top_terms_sketched, SQL_TOP_TERMS_SKETCHED, ("text", "sketch")
    ),
    "subquery_above_avg": QuerySpec(q_subquery_above_avg, SQL_SUBQUERY_ABOVE_AVG, ("relational",)),
    "regexp_extract": QuerySpec(q_regexp_extract, SQL_REGEXP_EXTRACT, ("relational", "text")),
    "agg_filtered": QuerySpec(q_agg_filtered, SQL_AGG_FILTERED, ("relational",)),
    "date_arith": QuerySpec(q_date_arith, SQL_DATE_ARITH, ("relational",)),
    "linear_trend": QuerySpec(
        q_linear_trend, SQL_LINEAR_TREND, ("relational", "pipeline")
    ),
    "bit_aggs": QuerySpec(q_bit_aggs, SQL_BIT_AGGS, ("relational",)),
    # batch 5
    "dedup_embeddings": QuerySpec(q_dedup_embeddings, SQL_DEDUP_EMBEDDINGS, ("similarity", "dedup")),
    "events_funnel": QuerySpec(q_events_funnel, SQL_EVENTS_FUNNEL, ("relational", "temporal")),
    "cohort_retention": QuerySpec(
        q_cohort_retention, SQL_COHORT_RETENTION, ("relational", "temporal")
    ),
    "scd2_merge": QuerySpec(
        q_scd2_merge, SQL_SCD2_MERGE, ("relational", "maintenance")
    ),
    "graph_pagerank": QuerySpec(
        q_graph_pagerank, _sql_pagerank(), ("relational", "iterative", "graph")
    ),
    "graph_triangles": QuerySpec(
        q_graph_triangles, SQL_GRAPH_TRIANGLES, ("relational", "graph")
    ),
    "window_distribution": QuerySpec(q_window_distribution, SQL_WINDOW_DISTRIBUTION, ("relational",)),
    "null_handling": QuerySpec(q_null_handling, SQL_NULL_HANDLING, ("relational",)),
    "bigram_counts": QuerySpec(q_bigram_counts, SQL_BIGRAM_COUNTS, ("text",)),
    "clean_pipeline": QuerySpec(q_clean_pipeline, SQL_CLEAN_PIPELINE, ("text", "pipeline")),
    "simhash_pairs": QuerySpec(q_simhash_pairs, SQL_SIMHASH_PAIRS, ("text", "dedup")),
    "simhash_pairs_4band": QuerySpec(
        q_simhash_pairs_4band, SQL_SIMHASH_PAIRS, ("text", "dedup")
    ),
    "agg_percentiles": QuerySpec(
        q_agg_percentiles, SQL_AGG_PERCENTILES, ("relational",),
        strict_float=True,
    ),
    "dedup_clusters": QuerySpec(q_dedup_clusters, SQL_DEDUP_CLUSTERS, ("text", "dedup", "iterative")),
    "dedup_cluster_profile": QuerySpec(
        q_dedup_cluster_profile, SQL_DEDUP_CLUSTER_PROFILE, ("text", "dedup", "iterative")
    ),
    "session_window_agg": QuerySpec(q_session_window_agg, SQL_SESSION_WINDOW_AGG, ("relational", "temporal")),
    "window_nth": QuerySpec(q_window_nth, SQL_WINDOW_NTH, ("relational",)),
    # text analysis
    "text_stats": QuerySpec(q_text_stats, SQL_TEXT_STATS, ("text",)),
    "text_quality": QuerySpec(q_text_quality, SQL_TEXT_QUALITY, ("text",)),
    "lang_id": QuerySpec(q_lang_id, SQL_LANG_ID, ("text",)),
    "doc_fingerprint": QuerySpec(q_doc_fingerprint, SQL_DOC_FINGERPRINT, ("text",)),
    "dedup_exact_docs": QuerySpec(q_dedup_exact_docs, SQL_DEDUP_EXACT_DOCS, ("text", "dedup")),
    "minhash_signature": QuerySpec(q_minhash_signature, SQL_MINHASH_SIGNATURE, ("text", "dedup")),
    "minhash_lsh_pairs": QuerySpec(q_minhash_lsh_pairs, SQL_MINHASH_LSH_PAIRS, ("text", "dedup")),
    "shingle_jaccard": QuerySpec(q_shingle_jaccard, SQL_SHINGLE_JACCARD, ("text", "dedup")),
    "simhash": QuerySpec(q_simhash, SQL_SIMHASH, ("text", "dedup")),
    # similarity
    "embedding_norms": QuerySpec(q_embedding_norms, SQL_EMBEDDING_NORMS, ("similarity",)),
    "sim_topk": QuerySpec(q_sim_topk, SQL_SIM_TOPK, ("similarity",)),
    "ivf_topk": QuerySpec(q_ivf_topk, SQL_IVF_TOPK, ("similarity",)),
    "ivf_topk_trained": QuerySpec(
        q_ivf_topk_trained, _sql_ivf_topk_trained(), ("similarity", "iterative")
    ),
    "ann_hyperplane": QuerySpec(q_ann_hyperplane, SQL_ANN_HYPERPLANE, ("similarity",)),
    "dedup_embeddings_trained": QuerySpec(
        q_dedup_embeddings_trained,
        _sql_dedup_embeddings_trained(),
        ("similarity", "dedup", "iterative"),
    ),
    "kmeans_centroids": QuerySpec(
        q_kmeans_centroids, _sql_kmeans_centroids(), ("similarity", "iterative")
    ),
    # round-2 additions: training-pipeline + relational long tail
    "doc_chunking": QuerySpec(q_doc_chunking, SQL_DOC_CHUNKING, ("text", "pipeline")),
    "locf_fill": QuerySpec(q_locf_fill, SQL_LOCF_FILL, ("relational", "temporal")),
    "window_range_frame": QuerySpec(q_window_range_frame, SQL_WINDOW_RANGE_FRAME, ("relational",)),
    "subquery_exists": QuerySpec(q_subquery_exists, SQL_SUBQUERY_EXISTS, ("relational", "sql-api")),
    "jaccard_est": QuerySpec(q_jaccard_est, SQL_JACCARD_EST, ("text", "dedup")),
    "stratified_sample": QuerySpec(q_stratified_sample, SQL_STRATIFIED_SAMPLE, ("text", "pipeline")),
    "token_histogram": QuerySpec(q_token_histogram, SQL_TOKEN_HISTOGRAM, ("text",)),
    "ngram_lm_score": QuerySpec(q_ngram_lm_score, SQL_NGRAM_LM_SCORE, ("text",)),
    "split_divergence": QuerySpec(
        q_split_divergence, SQL_SPLIT_DIVERGENCE, ("text", "pipeline")
    ),
    "quality_funnel": QuerySpec(q_quality_funnel, SQL_QUALITY_FUNNEL, ("text", "pipeline")),
    "dedup_candidates_union": QuerySpec(
        q_dedup_candidates_union, SQL_DEDUP_CANDIDATES_UNION, ("text", "dedup")
    ),
    "udtf_term_counts": QuerySpec(q_udtf_term_counts, SQL_UDTF_TERM_COUNTS, ("text", "udf")),
    "contamination": QuerySpec(q_contamination, SQL_CONTAMINATION, ("text", "dedup", "pipeline")),
    "repetition_ratio": QuerySpec(q_repetition_ratio, SQL_REPETITION_RATIO, ("text",)),
    "join_full_outer": QuerySpec(q_join_full_outer, SQL_JOIN_FULL_OUTER, ("relational",)),
    "agg_boolean": QuerySpec(q_agg_boolean, SQL_AGG_BOOLEAN, ("relational",)),
    "setop_except_all": QuerySpec(q_setop_except_all, SQL_SETOP_EXCEPT_ALL, ("relational",)),
    "date_spine_gaps": QuerySpec(q_date_spine_gaps, SQL_DATE_SPINE_GAPS, ("relational", "temporal")),
    "fuzzy_match": QuerySpec(q_fuzzy_match, SQL_FUZZY_MATCH, ("text", "dedup")),
    "pii_redact": QuerySpec(q_pii_redact, SQL_PII_REDACT, ("text", "pipeline")),
    "dedup_incremental": QuerySpec(
        q_dedup_incremental, SQL_DEDUP_INCREMENTAL, ("text", "dedup")
    ),
    "ngram_span_dedup": QuerySpec(
        q_ngram_span_dedup, SQL_NGRAM_SPAN_DEDUP, ("text", "dedup")
    ),
    "ngram_span_removal": QuerySpec(
        q_ngram_span_removal, SQL_NGRAM_SPAN_REMOVAL, ("text", "dedup", "pipeline")
    ),
    "curation_funnel": QuerySpec(
        q_curation_funnel, SQL_CURATION_FUNNEL, ("text", "dedup", "pipeline")
    ),
    "gopher_rules": QuerySpec(
        q_gopher_rules, SQL_GOPHER_RULES, ("text", "pipeline")
    ),
    "dataset_split": QuerySpec(
        q_dataset_split, SQL_DATASET_SPLIT, ("text", "pipeline")
    ),
    "training_shuffle": QuerySpec(
        q_training_shuffle, SQL_TRAINING_SHUFFLE, ("text", "pipeline")
    ),
    "sequence_pack": QuerySpec(q_sequence_pack, SQL_SEQUENCE_PACK, ("text", "pipeline")),
    "bpe_pair_counts": QuerySpec(q_bpe_pair_counts, SQL_BPE_PAIR_COUNTS, ("text",)),
    "quality_mix_sample": QuerySpec(
        q_quality_mix_sample, SQL_QUALITY_MIX_SAMPLE, ("text", "pipeline")
    ),
    "join_salted": QuerySpec(q_join_salted, SQL_JOIN_SALTED, ("relational",)),
    "activity_streaks": QuerySpec(
        q_activity_streaks, SQL_ACTIVITY_STREAKS, ("relational", "pipeline")
    ),
    "value_histogram": QuerySpec(
        q_value_histogram, SQL_VALUE_HISTOGRAM, ("relational", "pipeline")
    ),
    "mad_outliers": QuerySpec(
        q_mad_outliers, SQL_MAD_OUTLIERS, ("relational", "pipeline"),
        strict_float=True,
    ),
    "mat_view_counts": QuerySpec(
        q_mat_view_counts, SQL_MAT_VIEW_COUNTS, ("streaming", "pipeline")
    ),
    "cdc_snapshot": QuerySpec(
        q_cdc_snapshot, SQL_CDC_SNAPSHOT, ("streaming", "pipeline")
    ),
    "embedding_quantize": QuerySpec(
        q_embedding_quantize, SQL_EMBEDDING_QUANTIZE, ("similarity", "pipeline")
    ),
    "embedding_pca_scores": QuerySpec(
        q_embedding_pca_scores, SQL_EMBEDDING_PCA_SCORES, ("similarity", "pipeline")
    ),
    "embedding_pca_topr": QuerySpec(
        q_embedding_pca_topr, SQL_EMBEDDING_PCA_TOPR, ("similarity", "pipeline")
    ),
    "semdedup": QuerySpec(
        q_semdedup, SQL_SEMDEDUP, ("similarity", "dedup", "pipeline")
    ),
    "udf_normalize": QuerySpec(q_udf_normalize, SQL_UDF_NORMALIZE, ("text", "udf")),
    "profile_events": QuerySpec(q_profile_events, SQL_PROFILE_EVENTS, ("relational", "pipeline")),
    "cosine_pairs": QuerySpec(q_cosine_pairs, SQL_COSINE_PAIRS, ("similarity",)),
    # multimodal
    "multimodal_meta": QuerySpec(q_multimodal_meta, SQL_MULTIMODAL_META, ("multimodal",)),
    "image_header_meta": QuerySpec(q_image_header_meta, SQL_IMAGE_HEADER_META, ("multimodal",)),
    "audio_header_meta": QuerySpec(q_audio_header_meta, SQL_AUDIO_HEADER_META, ("multimodal",)),
    "wav_pcm_stats": QuerySpec(q_wav_pcm_stats, SQL_WAV_PCM_STATS, ("multimodal",)),
    "bmp_pixel_stats": QuerySpec(q_bmp_pixel_stats, SQL_BMP_PIXEL_STATS, ("multimodal",)),
    "bmp_resize": QuerySpec(q_bmp_resize, SQL_BMP_RESIZE, ("multimodal",)),
    "wav_decimate": QuerySpec(q_wav_decimate, SQL_WAV_DECIMATE, ("multimodal",)),
    "bmp_frame_sample": QuerySpec(
        q_bmp_frame_sample, SQL_BMP_FRAME_SAMPLE, ("multimodal",)
    ),
    "frame_sample": QuerySpec(q_frame_sample, SQL_FRAME_SAMPLE, ("multimodal",)),
    "media_features": QuerySpec(q_media_features, SQL_MEDIA_FEATURES, ("multimodal",)),
    "sort_limit_offset": QuerySpec(q_sort_limit_offset, SQL_SORT_LIMIT_OFFSET, ("relational",)),
    "tfidf_cosine_pairs": QuerySpec(
        q_tfidf_cosine_pairs, SQL_TFIDF_COSINE_PAIRS, ("text", "similarity")
    ),
    "knn_label_accuracy": QuerySpec(
        q_knn_label_accuracy, SQL_KNN_LABEL_ACCURACY, ("similarity", "eval")
    ),
    "bpe_train_merges": QuerySpec(
        q_bpe_train_merges, _sql_bpe_train_merges(), ("text", "iterative")
    ),
    "bpe_encode": QuerySpec(
        q_bpe_encode, _sql_bpe_encode(), ("text", "iterative", "pipeline")
    ),
    "zorder_layout": QuerySpec(
        q_zorder_layout, SQL_ZORDER_LAYOUT, ("relational", "maintenance")
    ),
    "classifier_eval": QuerySpec(
        q_classifier_eval, SQL_CLASSIFIER_EVAL, ("text", "eval")
    ),
    "weighted_sample": QuerySpec(
        q_weighted_sample, SQL_WEIGHTED_SAMPLE, ("pipeline",)
    ),
    "video_header_meta": QuerySpec(
        q_video_header_meta, SQL_VIDEO_HEADER_META, ("multimodal",)
    ),
    "interval_coverage": QuerySpec(
        q_interval_coverage, SQL_INTERVAL_COVERAGE, ("relational", "window")
    ),
    "resample_ohlc": QuerySpec(
        q_resample_ohlc, SQL_RESAMPLE_OHLC, ("relational", "timeseries")
    ),
    "winsorize": QuerySpec(
        q_winsorize, SQL_WINSORIZE, ("relational", "pipeline"),
        strict_float=True,
    ),
    "skew_profile": QuerySpec(
        q_skew_profile, SQL_SKEW_PROFILE, ("relational", "maintenance")
    ),
    "snapshot_diff": QuerySpec(
        q_snapshot_diff, SQL_SNAPSHOT_DIFF, ("relational", "pipeline")
    ),
    "bm25_topk": QuerySpec(q_bm25_topk, SQL_BM25_TOPK, ("text", "search")),
    "twap": QuerySpec(q_twap, SQL_TWAP, ("relational", "timeseries")),
    "markov_transitions": QuerySpec(
        q_markov_transitions, SQL_MARKOV_TRANSITIONS, ("relational", "window")
    ),
    "rolling_corr": QuerySpec(
        q_rolling_corr, SQL_ROLLING_CORR, ("relational", "window", "timeseries")
    ),
    "ssjoin_prefix": QuerySpec(
        q_ssjoin_prefix, SQL_SSJOIN_PREFIX, ("text", "dedup")
    ),
    "bm25_incremental": QuerySpec(
        q_bm25_incremental, SQL_BM25_TOPK, ("text", "search", "streaming")
    ),
    "minhash_incremental": QuerySpec(
        q_minhash_incremental, SQL_MINHASH_LSH_PAIRS, ("text", "dedup", "streaming")
    ),
    "ivf_incremental": QuerySpec(
        q_ivf_incremental,
        _sql_ivf_topk_trained(),
        ("similarity", "iterative", "streaming"),
    ),
    "table_checksum": QuerySpec(
        q_table_checksum, SQL_TABLE_CHECKSUM, ("relational", "maintenance"),
        strict_float=True,
    ),
    "decile_lift": QuerySpec(
        q_decile_lift, SQL_DECILE_LIFT, ("relational", "eval"),
        strict_float=True,
    ),
    "sequence_match": QuerySpec(
        q_sequence_match, SQL_SEQUENCE_MATCH, ("relational", "window")
    ),
    "mutual_information": QuerySpec(
        q_mutual_information, SQL_MUTUAL_INFORMATION, ("relational", "eval")
    ),
    "mmr_rerank": QuerySpec(
        q_mmr_rerank, SQL_MMR_RERANK, ("similarity", "search")
    ),
    "zonemap_prune": QuerySpec(
        q_zonemap_prune, SQL_ZONEMAP_PRUNE, ("relational", "maintenance")
    ),
    "zoned_read_prune": QuerySpec(
        q_zoned_read_prune, SQL_ZONED_READ_PRUNE, ("relational", "maintenance")
    ),
    "ewma": QuerySpec(
        q_ewma, SQL_EWMA, ("relational", "timeseries"), strict_float=True
    ),
    "k_anonymity": QuerySpec(
        q_k_anonymity, SQL_K_ANONYMITY, ("relational", "privacy")
    ),
    "rolling_corr_range": QuerySpec(
        q_rolling_corr_range,
        SQL_ROLLING_CORR_RANGE,
        ("relational", "window", "timeseries"),
    ),
    "rolling_range_stats": QuerySpec(
        q_rolling_range_stats,
        SQL_ROLLING_RANGE_STATS,
        ("relational", "window", "timeseries"),
    ),
    "ann_recall": QuerySpec(
        q_ann_recall, SQL_ANN_RECALL, ("similarity", "eval")
    ),
    "expectations_audit": QuerySpec(
        q_expectations_audit, SQL_EXPECTATIONS_AUDIT, ("relational", "quality")
    ),
}


# Driver-gate evaluation order: oldest-evidence-first rotation. The
# driver samples ~50 entries per round, so order = (entries changed this
# round) then (entries whose latest driver row is oldest, cheapest-first
# within a tier by measured sf0.01 wall time). This guarantees every
# entry is re-evidenced at least every ~2 rounds under the truncation,
# and anything just modified is confirmed immediately. Tiers reflect
# CORRECTNESS_r0{1,2,3}.json latest-row ages as of round 4 — rotate
# again next round.
_GATE_ORDER = [
    # — changed or new in round 14: must (re-)evidence first —
    "ivf_incremental",         # new: IVF top-k from the incremental posting list
    "zoned_read_prune",        # new: zone-map pruned READ vs plain box filter
    "bloom_semi_join",         # advice fix: cross-family key widening
    "ssjoin_prefix",           # advice fix: executor-visible staging
    # — round-13 tier (still recent) —
    "rolling_corr_range",      # new: retract-capable 24 h time-RANGE corr
    "rolling_range_stats",     # new: count/sum/mean/std over the same kernel
    "ann_recall",              # new: recall@5 eval of IVF vs exact top-k
    "ewma",                    # history-cap enforcement
    "sequence_match",          # history-cap enforcement
    # — round-12 tier (still recent) —
    "bm25_incremental",        # new: BM25 from the incremental index
    "minhash_incremental",     # new: LSH pairs from the incremental index
    "table_checksum",          # new: order-independent table checksum
    "decile_lift",             # new: sort-free global decile lift table
    "mutual_information",      # new: PMI association profile
    "mmr_rerank",              # new: MMR diversity-aware reranking
    "zonemap_prune",           # new: zone-map skip-ratio report
    "k_anonymity",             # new: k-anonymity/l-diversity audit
    "expectations_audit",      # new: one-pass data-contract audit
    "bm25_topk",               # new: BM25 keyword retrieval top-10
    "twap",                    # new: time-weighted average
    "markov_transitions",      # new: event-sequence transition matrix
    "rolling_corr",            # new: trailing 64-row ROWS-frame rolling corr
    "resample_ohlc",           # new: time-bucket OHLC downsampling
    "winsorize",               # new: exact-percentile winsorized stats
    "skew_profile",            # new: join-key skew diagnostics
    "snapshot_diff",           # new: one-pass as-of table diff
    "fk_integrity",            # new: referential-integrity validation
    "semdedup",                # new: PCA-space semantic dedup
    "embedding_pca_topr",      # new: block subspace-iteration top-3 PCA
    "embedding_pca_scores",    # refactored onto functions/pca.py
    "graph_triangles",         # degree-broadcast hints dropped
    "mad_outliers",            # percentile kernel now NULL-filtering
    "mat_view_counts",         # schema persistence + atexit cleanup
    "cdc_snapshot",            # schema persistence + atexit cleanup
    "top_terms_sketched",      # order_cols hatch removed
    # — round-11 tier (still recent) —
    "sql_q4_priority_count",
    "sql_q6_forecast_revenue",
    "sql_q8_market_share",
    "sql_q11_important_parts",
    "split_divergence",
    "linear_trend",
    "gopher_rules",
    # — stale tier: NOT in CORRECTNESS_r10.json's 50-slot gate —
    # oldest-evidence-first approximation: prior rotation order
    "approx_quantiles",
    "approx_distinct_merge",
    "sql_q10_returns",
    "sql_q12_latency",
    "agg_boolean",
    "fuzzy_match",
    "image_header_meta",
    "pii_redact",
    "dedup_incremental",
    "ngram_span_dedup",
    "sequence_pack",
    "bpe_pair_counts",
    "quality_mix_sample",
    "join_salted",
    "activity_streaks",
    "value_histogram",
    "embedding_quantize",
    "simhash",
    "dedup_candidates_union",
    "kmeans_centroids",
    "agg_string_concat",
    "array_funcs",
    "cross_join_dims",
    "filter_level",
    "filter_notnull",
    "json_encode",
    "setop_except",
    "sort_limit",
    "agg_cube",
    "agg_having",
    "agg_minmax",
    "agg_windowed_events",
    "approx_distinct",
    "join_semi",
    "pivot_events",
    "setop_intersect_all",
    "union_all",
    "unpivot_part",
    "agg_distinct",
    "dedup_exact",
    "dedup_refresh",
    "dedup_windowed",
    "join_outer_left",
    "json_deadletter",
    "map_funcs",
    "setop_intersect",
    "stats_moments",
    "window_rank",
    "window_running",
    "agg_rollup",
    "dedup_null_passthrough",
    "join_customer_orders",
    "join_multiway_region",
    "json_decode",
    "agg_pricing_summary",
    "grouping_sets",
    "map_explode",
    "scalar_funcs",
    "window_moving_avg",
    "range_join",
    "window_lag_lead",
    "reference_pipeline",
    "scalar_funcs2",
    "sql_q3_shipping",
    "sql_q5_local_supplier",
    "doc_chunking",
    "locf_fill",
    "window_range_frame",
    "ngram_lm_score",
    "subquery_exists",
    "quality_funnel",
    "jaccard_est",
    "stratified_sample",
    "token_histogram",
    "frame_sample",
    "agg_filtered",
    "corpus_top_terms",
    "media_features",
    "text_stats",
    "udf_normalize",
    "doc_fingerprint",
    "bit_aggs",
    "dedup_exact_docs",
    "embedding_norms",
    "null_handling",
    "regexp_extract",
    "text_quality",
    "window_nth",
    "agg_percentiles",
    "clean_pipeline",
    "date_arith",
    "session_stats",
    "sort_limit_offset",
    "lang_id",
    "session_window_agg",
    "minhash_signature",
    "profile_events",
    "window_distribution",
    "ann_hyperplane",
    "sim_topk",
    "subquery_above_avg",
    "minhash_lsh_pairs",
    "ivf_topk",
    "join_full_outer",
    "shingle_jaccard",
    "date_spine_gaps",
    "setop_except_all",
    "bigram_counts",
    "dedup_clusters",
    "repetition_ratio",
    "contamination",
    # — freshly evidenced in round 10's driver gate: go last —
    "simhash_pairs",
    "ngram_span_removal",
    "sql_q2_min_cost_supplier",
    "sql_q20_excess_share_supplier",
    "sql_q22_dormant_customers",
    "graph_pagerank",
    "sql_q13_order_distribution",
    "sql_q15_top_supplier",
    "sql_q19_disjunct_revenue",
    "dataset_split",
    "bpe_encode",
    "curation_funnel",
    "sql_q7_nation_volume",
    "sql_q9_product_profit",
    "asof_join_tolerance",
    "asof_join",
    "join_anti",
    "string_funcs3",
    "events_funnel",
    "knn_label_accuracy",
    "sql_q21_blame_supplier",
    "sql_q17_small_qty_revenue",
    "cohort_retention",
    "scd2_merge",
    "simhash_pairs_4band",
    "sql_q16_supplier_cnt",
    "bmp_resize",
    "wav_decimate",
    "bmp_frame_sample",
    "dedup_cluster_profile",
    "sql_q14_promo_revenue",
    "audio_header_meta",
    "video_header_meta",
    "multimodal_meta",
    "wav_pcm_stats",
    "bmp_pixel_stats",
    "tfidf_cosine_pairs",
    "tfidf_top_terms",
    "bpe_train_merges",
    "zorder_layout",
    "classifier_eval",
    "weighted_sample",
    "interval_coverage",
    "dedup_embeddings_trained",
    "sql_q18_large_orders",
    "dedup_embeddings",
    "cosine_pairs",
    "udtf_term_counts",
    "ivf_topk_trained",
]


def _gate_order() -> list[str]:
    """_GATE_ORDER with unlisted registry additions appended — a new
    query never silently drops out of the driver contract."""
    missing = [n for n in _GATE_ORDER if n not in REGISTRY]
    assert not missing, f"_GATE_ORDER names unknown queries: {missing}"
    dupes = [n for n in set(_GATE_ORDER) if _GATE_ORDER.count(n) > 1]
    assert not dupes, f"_GATE_ORDER has duplicates: {dupes}"
    return _GATE_ORDER + [n for n in REGISTRY if n not in _GATE_ORDER]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _gate_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle for name in _gate_order() if REGISTRY[name].oracle
    }
