"""Streaming pipelines: the reference's two topologies, Spark-first.

Pipeline 1 (filter): KafkaStreamsApplication.java:92-114 —
stream → filter(level=='INFO') → to. Here: any streaming DataFrame of
decoded LogEvents → filter → sink. The transform is a pure function of
DataFrames, so the SAME code runs in batch (oracle-checkable, the
TopologyTestDriver pattern) and streaming.

Pipeline 2 (dedup): KStreamDistinct.java:129-153 —
stream → windowed dedup on exception_class → not-null filter → to.
Standard tier: withWatermark + dropDuplicatesWithinWatermark
(first-seen-timestamp semantics). Exact reference parity
(refresh-on-duplicate) is dedup_refresh.py.

Scale notes: the dedup key shuffle fixes the reference's cross-partition
dedup miss (SURVEY.md §3 — Kafka Streams never repartitions by the
dedup id). State is RocksDB-backed (session.py) with watermark-driven
eviction ≈ the reference's 10-min store retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_WINDOW = "10 minutes"  # KStreamDistinct.java:135-136


def filter_pipeline(decoded: DataFrame, level: str = "INFO") -> DataFrame:
    """stream → keep level==INFO (null level drops — documented
    divergence from the reference's NPE, SURVEY.md §1)."""
    return decoded.filter(F.col("event.level") == level)


def dedup_pipeline_within_watermark(
    decoded: DataFrame,
    window: str = DEDUP_WINDOW,
    ts_col: str = "event_time",
) -> DataFrame:
    """Windowed dedup, built-in tier: suppress records whose
    exception_class was already seen within the watermark window;
    null-id records always pass (KStreamDistinct.java:71-72).

    Differences vs the reference (documented, SURVEY.md §2a D1):
    dropDuplicatesWithinWatermark keeps the FIRST-seen timestamp (no
    refresh-on-duplicate), and lateness is bounded by the watermark
    rather than a ±window/2 probe.
    """
    keyed = decoded.withColumn("dedup_id", F.col("event.exception.exception_class"))
    with_wm = keyed.withWatermark(ts_col, window)
    nulls = with_wm.filter(F.col("dedup_id").isNull())
    dups = with_wm.filter(F.col("dedup_id").isNotNull()).dropDuplicatesWithinWatermark(
        ["dedup_id"]
    )
    return dups.unionByName(nulls).drop("dedup_id")


def windowed_count_pipeline(
    decoded: DataFrame,
    window: str = "1 hour",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed aggregation (the §2b gap the reference never
    had): tumbling-window counts per level with late-data handling."""
    return (
        decoded.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col("event.level").alias("level"))
        .agg(F.count("*").alias("n"))
    )


def sliding_window_pipeline(
    decoded: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window counts per level: each event lands in
    window/slide overlapping windows (the hopping-window class the
    tumbling pipeline can't express — trend smoothing, rate alarms).
    State per (window, level) evicts once the watermark passes the
    window end."""
    return (
        decoded.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), F.col("event.level").alias("level"))
        .agg(F.count("*").alias("n"))
    )


def session_window_pipeline(
    decoded: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming session windows: per level, events closer than `gap`
    merge into one session (dynamic-length windows — the streaming form
    of the batch session_stats/session_window_agg operators). Spark
    merges overlapping session candidates in the state store and emits
    a session once the watermark passes its end + gap, so state per
    (level, open session) is bounded by the watermark horizon.
    Output: session window, level, event count, session span."""
    return (
        decoded.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(ts_col, gap), F.col("event.level").alias("level")
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.unix_millis(F.col("session_window.end"))
                - F.unix_millis(F.col("session_window.start"))
            ).alias("span_ms"),
        )
    )


def quality_filter_pipeline(
    docs: DataFrame,
    min_tokens: int = 8,
    max_stopword_ratio: float = 0.8,
    min_stopword_ratio: float = 0.01,
    text_col: str = "text",
) -> DataFrame:
    """Streaming corpus-ingest quality gate: the BATCH quality signals
    (functions/text.quality_signal_cols — the exact expressions behind
    the oracle-checked q_text_quality) applied unchanged to a stream of
    documents. Pure codegen projections ⇒ stateless and watermark-free;
    no join, no state store. Keeps documents inside the token-count and
    stopword-ratio band. This is the shape a 100 TB ingest uses: score
    and gate AT ingest, so downstream dedup/train jobs never rescan
    rejected text."""
    from ..functions.text import quality_signal_cols

    sig = quality_signal_cols(F.col(text_col))
    return docs.filter(
        (sig["n_tokens"] >= min_tokens)
        & (sig["stopword_ratio"] <= max_stopword_ratio)
        & (sig["stopword_ratio"] >= min_stopword_ratio)
    )


def static_enrich_pipeline(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment — the canonical streaming
    lookup join: every micro-batch hash-joins the stream against a
    bounded dimension snapshot (user profile, ad campaign, device
    registry), attaching the dim's columns to each event at ingest so
    downstream consumers never re-join it.

    Semantics: stateless and watermark-free — a stream-static equi-join
    buffers NO state (Spark re-plans the static side per micro-batch,
    so a dim refreshed underneath the path is picked up on the next
    trigger). Default how='left' preserves unmatched events with NULL
    dim columns: an ingest path must never DROP telemetry because the
    dimension is stale; the gate that filters is a separate downstream
    decision. how='inner' is the filtering variant.

    Scale: the dim side is explicitly broadcast — at 100 TB of stream
    the lookup must be a map-side hash probe fused into the batch's
    scan stage, never a shuffle of the stream on the join key (a
    shuffled stream-static join would re-partition every micro-batch).
    For dims too big to broadcast, pre-bucket the dim table on the key
    and let the stream side shuffle once per batch — that variant is a
    deployment choice, not a different operator."""
    return stream.join(F.broadcast(dim), key, how)


def minhash_band_dedup_pipeline(
    docs: DataFrame,
    n_hashes: int = 8,
    n_bands: int = 4,
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming NEAR-duplicate suppression — the in-stream form of the
    batch MinHash+LSH dedup (functions/dedup_approx.py): each document
    gets its n_hashes-slot MinHash signature as PURE codegen
    expressions (array_min over per-token md5, the same
    `md5(i ':' token)` convention as the batch minhash_signatures, so
    batch and stream agree on signatures), folded into n_bands band
    keys, and the stream is deduplicated on the FULL band-key tuple
    within the watermark — one built-in stateful op, stateless
    signature stage.

    Semantics (documented, deliberately stricter than the batch
    candidate join): a document is suppressed only when ALL band keys
    match an earlier in-window document — near-certain duplicates
    (collision probability s^n_hashes for Jaccard similarity s) —
    whereas the batch LSH path pairs on ANY shared band. Any-band
    streaming semantics would need two chained stateful ops (explode
    bands → per-band first-wins → doc-level verdict merge); the
    all-band form is the cheap, robust ingest guard: exact and
    trivially-mutated duplicates collapse in-stream, borderline
    near-dups are left to the batch sweep. State = one row per distinct
    signature per window. Token-free documents all share the constant
    empty-signature band key (concat_ws skips null slots), so empty
    docs collapse to one per window — the conventional ingest policy.
    """
    keyed = docs.select("*", *_minhash_band_cols(text_col, n_hashes, n_bands))
    band_cols = [f"__band{b}" for b in range(n_bands)]
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(band_cols)
        .drop(*band_cols)
    )


def _minhash_band_cols(text_col: str, n_hashes: int, n_bands: int) -> list:
    """n_bands MinHash band-key expressions (pure codegen: array_min
    over per-token md5, same md5(i ':' token) convention as the batch
    minhash_signatures) — shared by both streaming dedup tiers."""
    from ..functions.text import tokenize

    if n_hashes % n_bands:
        raise ValueError(
            f"n_hashes ({n_hashes}) must divide evenly into n_bands "
            f"({n_bands}) — trailing signature slots would be computed "
            "but silently unused, weakening the scheme below what was asked"
        )
    toks = F.array_distinct(tokenize(F.col(text_col)))

    def mh_slot(i: int):
        # NOTE: the lambda must stay SINGLE-argument. pyspark
        # arity-dispatches higher-order-function lambdas, so a
        # two-parameter lambda (e.g. the `lambda t, i=i:` closure idiom)
        # receives (element, array-index) — the second parameter shadows
        # the closure and, stringified into the hash prefix, embeds an
        # auto-generated per-plan variable name: every query run then
        # computes DIFFERENT signatures for identical text (caught by
        # the cross-restart any-band test).
        prefix = f"{i}:"
        return F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(prefix), t)))
        )

    mh = [mh_slot(i) for i in range(n_hashes)]
    per_band = n_hashes // n_bands
    return [
        F.md5(F.concat_ws("|", *mh[b * per_band : (b + 1) * per_band])).alias(
            f"__band{b}"
        )
        for b in range(n_bands)
    ]


def band_dedup_any_pipeline(
    keyed: DataFrame,
    band_cols: list[str],
    id_col: str = "doc_id",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    hot_bands: DataFrame | None = None,
) -> DataFrame:
    """ANY-band streaming LSH dedup — batch-parity candidate semantics
    (a document is a duplicate if it shares ≥1 band key with an earlier
    in-window document) from two CHAINED BUILT-IN stateful operators,
    no custom state code:

    1. explode the band keys and keep the FIRST arrival per (band,
       key) bucket — dropDuplicatesWithinWatermark, state = one row per
       live band bucket;
    2. windowed per-document count of surviving band rows — a document
       that lost ANY band collided with an earlier document, so
       survivors are exactly the documents that WON ALL their bands
       (n_won = n_bands). The count aggregation closes when the
       watermark passes the document's window, which is when Spark can
       prove no band verdict is still pending.

    Cost of exact any-band semantics vs the all-band tier
    (minhash_band_dedup_pipeline): n_bands× state rows, a second
    stateful stage, and verdicts delayed until watermark closure —
    stream-side latency traded for batch-parity recall. Emits
    (id_col, window, n_won) for survivors.

    hot_bands — an optional STATIC (band, bh) denylist of
    non-discriminative band buckets (boilerplate, tiny vocabulary),
    the streaming analog of the batch generator's 64-member bucket cap
    (minhash_lsh_pairs). Measured without it on a duplicate-heavy
    corpus the any-band rule over-fires (suppressed 498/500 at sf0.01,
    BASELINE.md round 7). Hot rows are NOT dropped — dropping would
    make winning all bands impossible — their key is rewritten to a
    per-document unique value, so the document trivially wins that band
    and competes only on discriminative ones. The denylist is
    batch-computed (hot_band_frame) and broadcast into a stream-static
    join: the production shape for a periodically refreshed cap.
    """
    n_bands = len(band_cols)
    exploded = keyed.select(
        id_col,
        ts_col,
        F.posexplode(F.array(*[F.col(c) for c in band_cols])).alias("band", "bh"),
    )
    if hot_bands is not None:
        marked = F.broadcast(
            hot_bands.select("band", "bh").withColumn("__hot", F.lit(True))
        )
        exploded = (
            exploded.join(marked, ["band", "bh"], "left")
            .withColumn(
                "bh",
                F.when(
                    F.col("__hot"),
                    F.concat_ws(":", F.lit("__solo"), F.col(id_col), F.col("band")),
                ).otherwise(F.col("bh")),
            )
            .drop("__hot")
        )
    winners = exploded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["band", "bh"]
    )
    counts = winners.groupBy(F.window(ts_col, window), F.col(id_col)).agg(
        F.count("*").alias("n_won")
    )
    return counts.filter(F.col("n_won") == n_bands)


def minhash_band_dedup_any_pipeline(
    docs: DataFrame,
    n_hashes: int = 8,
    n_bands: int = 4,
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_bands: DataFrame | None = None,
) -> DataFrame:
    """minhash signature stage (stateless codegen) + the any-band
    chained-stateful dedup: the streaming pipeline with the SAME
    candidate semantics as the batch minhash_lsh_pairs (pair on any
    shared band). See band_dedup_any_pipeline for the mechanism, the
    latency/state trade vs the all-band tier, and the hot_bands
    precision cap."""
    keyed = docs.select(
        id_col, ts_col, *_minhash_band_cols(text_col, n_hashes, n_bands)
    )
    return band_dedup_any_pipeline(
        keyed,
        [f"__band{b}" for b in range(n_bands)],
        id_col=id_col,
        ts_col=ts_col,
        watermark=watermark,
        window=window,
        hot_bands=hot_bands,
    )


def hot_band_frame(
    corpus: DataFrame,
    n_hashes: int = 8,
    n_bands: int = 4,
    max_bucket: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Batch-compute the (band, bh) denylist for the any-band streaming
    tier: band buckets with more than max_bucket members in a reference
    corpus carry no discriminative signal (the same judgement as the
    batch generator's bucket cap). Recompute periodically from recent
    data and feed to band_dedup_any_pipeline(hot_bands=...)."""
    keyed = corpus.select(*_minhash_band_cols(text_col, n_hashes, n_bands))
    exploded = keyed.select(
        F.posexplode(
            F.array(*[F.col(f"__band{b}") for b in range(n_bands)])
        ).alias("band", "bh")
    )
    return (
        exploded.groupBy("band", "bh")
        .count()
        .filter(F.col("count") > max_bucket)
        .select("band", "bh")
    )


def attribution_join_pipeline(
    imps: DataFrame,
    clicks: DataFrame,
    key: str = "ad_id",
    imp_ts: str = "imp_time",
    click_ts: str = "click_time",
    within: str = "10 minutes",
    how: str = "inner",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join (impression→click
    attribution): clicks attach to the impression they followed within
    `within`. how='left_outer' also emits unattributed impressions with
    a null click time — but only once the watermark passes the
    impression's join interval, which is when Spark can prove no
    matching click can still arrive; how='full_outer' additionally
    emits orphan clicks (click with no preceding impression — the
    fraud/latency signal) under the same watermark-closure rule, with
    a null impression time. Both watermarks bound the join state;
    click columns are prefixed c_ so the joined schema is unambiguous,
    and the output key coalesces across sides so orphan clicks carry
    their key rather than a null."""
    l = imps.withWatermark(imp_ts, watermark)
    r = clicks.withWatermark(click_ts, watermark).select(
        F.col(key).alias(f"c_{key}"), F.col(click_ts)
    )
    cond = (
        (F.col(key) == F.col(f"c_{key}"))
        & (F.col(click_ts) >= F.col(imp_ts))
        & (F.col(click_ts) <= F.col(imp_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).select(
        F.coalesce(F.col(key), F.col(f"c_{key}")).alias(key),
        imp_ts,
        click_ts,
    )


def stream_dedup_recall_metrics(
    docs: DataFrame,
    n_hashes: int = 8,
    n_bands: int = 4,
    max_bucket: int = 64,
) -> dict:
    """Batch simulation of the streaming MinHash dedup tiers against
    the batch LSH candidate generator (arrival order = doc_id
    ascending, the deterministic stand-in for event order):

    * all-band  — a doc is suppressed iff its FULL band-key tuple was
      seen on an earlier doc (dropDuplicatesWithinWatermark semantics);
    * any-band  — suppressed iff ANY band key has an earlier claimant
      (the chained-stateful pipeline's semantics);
    * any-band + hot cap — hot band keys (bucket > max_bucket in the
      batch profile) can't cause a loss, mirroring the pipeline's
      broadcast denylist;
    * batch baseline — duplicate iff the doc pairs with a LOWER-id doc
      in minhash_lsh_pairs (any shared band, bucket-capped).

    any-band ⊇ batch-on-uncapped-buckets by construction (same
    condition, no bucket cap) — recall_vs_batch == 1.0 is the
    CI-pinned contract (tests/test_streaming.py); the tool
    tools/stream_dedup_recall_probe.py prints the same dict for
    BASELINE.md. Driver-side collects are probe-only by design: this
    function is evidence tooling, not a pipeline stage."""
    from pyspark.sql import Window

    from ..functions.dedup_approx import minhash_lsh_pairs

    band_cols = [f"__band{b}" for b in range(n_bands)]
    keyed = docs.select(
        "doc_id", *_minhash_band_cols("text", n_hashes, n_bands)
    ).persist()
    try:
        w_all = Window.partitionBy(*band_cols).orderBy("doc_id")
        sup_all = {
            r["doc_id"]
            for r in keyed.withColumn("rn", F.row_number().over(w_all))
            .filter(F.col("rn") > 1)
            .select("doc_id")
            .collect()
        }

        exploded = keyed.select(
            "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "bh")
        )
        w_band = Window.partitionBy("band", "bh").orderBy("doc_id")
        sup_any = {
            r["doc_id"]
            for r in exploded.withColumn("rn", F.row_number().over(w_band))
            .filter(F.col("rn") > 1)
            .select("doc_id")
            .distinct()
            .collect()
        }

        hot = hot_band_frame(docs, n_hashes, n_bands, max_bucket=max_bucket)
        sup_capped = {
            r["doc_id"]
            for r in exploded.join(hot, ["band", "bh"], "left_anti")
            .withColumn("rn", F.row_number().over(w_band))
            .filter(F.col("rn") > 1)
            .select("doc_id")
            .distinct()
            .collect()
        }

        batch_dup = {
            r["id_b"]
            for r in minhash_lsh_pairs(docs).select("id_b").distinct().collect()
        }
    finally:
        keyed.unpersist()

    def tier(sup: set) -> dict:
        caught = len(batch_dup & sup)
        return {
            "suppressed": len(sup),
            "batch_dups_caught": caught,
            "recall_vs_batch": round(caught / len(batch_dup), 3) if batch_dup else None,
        }

    return {
        "n_docs": docs.count(),
        "batch_duplicate_docs": len(batch_dup),
        "all_band": tier(sup_all),
        "any_band": tier(sup_any),
        "any_band_hot_capped": tier(sup_capped),
    }


def embedding_corpus_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket_rows: int = 1024,
):
    """Batch-build the STATIC artifacts for the streaming embedding
    near-dup gate (embedding_dedup_pipeline): the adaptive product-grid
    codebooks and the corpus bucket index — the embedding analog of
    hot_band_frame's batch-computed, periodically refreshed side input.

    Returns (index, acents, bcents, grid): `index` is the (bucket, cuv)
    frame of corpus home-bucket assignments (bucketed_assign, n_probe=1
    — at scale this is a written table, refreshed with the corpus, not
    recomputed per batch); acents/bcents are the O(√C) codebook vectors
    COLLECTED to the driver as (cell_id, unit_vec) lists so the stream
    side can assign buckets with pure per-row expressions (stateless —
    a streaming groupBy would otherwise be needed; the codebooks are
    sublinear in the corpus by construction, ~10³ vectors at 10⁹ rows,
    so the driver collect is bounded)."""
    from ..functions.similarity import _unit, bucketed_assign, product_grid

    n_rows, min_id = corpus.agg(
        F.count(F.lit(1)), F.min(F.col(id_col).cast("bigint"))
    ).first()
    grid = product_grid(n_rows, target_bucket_rows)
    c1, c2 = grid
    off = int(min_id or 0)
    unit = corpus.select(
        F.col(id_col).cast("bigint").alias("id"), _unit(F.col(vec_col)).alias("uv")
    )
    acents = [
        (r["id"] - off, r["uv"])
        for r in unit.filter((F.col("id") >= off) & (F.col("id") < off + c1)).collect()
    ]
    bcents = [
        (r["id"] - off - c1, r["uv"])
        for r in unit.filter(
            (F.col("id") >= off + c1) & (F.col("id") < off + c1 + c2)
        ).collect()
    ]
    index = bucketed_assign(
        corpus, grid, n_probe=1, vec_col=vec_col, id_col=id_col, id_offset=off
    ).select("bucket", F.col("uv").alias("cuv"))
    return index, acents, bcents, grid


def embedding_dedup_pipeline(
    vecs: DataFrame,
    corpus_index: DataFrame,
    acents: list,
    bcents: list,
    grid: tuple[int, int],
    threshold: float = 0.9,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    broadcast_index: bool = True,
) -> DataFrame:
    """Streaming embedding near-dup ingest gate — the SemDeDup-style
    "is this vector already in the corpus?" filter applied AT ingest,
    the embedding sibling of the in-stream MinHash tiers and the
    batch dedup_incremental shape: new vectors stream in, the corpus
    is a static, periodically refreshed index (embedding_corpus_index).

    Round-10 rewrite — the per-row higher-order-function cosines (an
    interpreted F.aggregate over zip_with per codebook cell AND per
    bucket candidate) were the measured bottleneck at 5.7–8.6k rows/s;
    both stages are now Arrow-batched BLAS in ONE stateless mapInPandas
    kernel (default) or BLAS assignment + codegen hash join (at-scale
    tier). Stages:

    1. Assignment: the kernel normalizes each micro-batch as a numpy
       matrix and scores ALL c1 + c2 codebook dots as two matrix
       products (U @ A.T / U @ B.T), deriving each vector's n_probe
       probed buckets. Cell choice is bit-identical to bucketed_assign's
       prefix branch: ascending (o = -dot, cell) with the NaN→-inf
       guard (stable argsort over cell-ascending codebooks ≡ the
       (o, cell) struct sort). Codebooks are O(√C) and ride in the
       kernel closure (~10³ vectors ≈ 512 KB at 10⁹ corpus rows —
       bounded by construction). Rows whose embedding is NULL or
       mis-dimensioned are DROPPED here: an ingest gate quarantines
       what it cannot score rather than silently admitting it.
    2. Screening — a probe survives iff its bucket holds NO corpus
       vector with cosine ≥ threshold. Two regimes:
       - broadcast_index=True (default): the corpus index is collected
         ONCE at pipeline build into per-bucket matrices held in the
         kernel closure, and screening is a per-bucket BLAS matmul in
         the same kernel — the n_probe × target-bucket-rows (~2k at the
         1024-row design point) candidate cosines per vector are the
         SemDeDup screening contract itself; BLAS evaluates them ~50×
         faster than any per-pair JVM expression. Right whenever the
         reference index fits in worker memory (the same budget class
         as broadcasting it); refresh = rebuild the query, the normal
         side-input cycle.
       - broadcast_index=False — the 10⁹-row-corpus tier: the kernel
         emits probes with the unit vector as d FLAT double columns and
         LEFT ANTI stream-static joins a widened (bucket, c_0..c_{d-1})
         index projection on bucket equality AND an UNROLLED
         per-dimension product sum ≥ threshold. Flat attributes, not
         array getItem: the element-wise null/bounds checks of the
         array form overflow the JIT method budget and drop the join
         to interpreted evaluation (measured 13× slower). Materialize
         corpus_index as a table bucketed on `bucket` so the join is
         hash-partitioned and co-located. Left-assoc addition from 0.0
         keeps the sum bit-identical to a sequential fold. Between the
         TWO tiers the sums are NOT bit-identical — numpy's matmul uses
         pairwise/SIMD summation — so a cosine landing within an ulp of
         the threshold could gate differently per tier (measure-zero
         for dot products of normalized doubles; the same accepted
         class as the np.round half-to-even note in similarity.py).
         Non-finite embeddings would be a LARGER divergence (numpy's
         `NaN >= t` is False, Spark orders NaN above every double) —
         they are quarantined in _assign before either tier can score
         one, so the ulp class is the only remaining divergence.
    3. A vector passes the gate iff ALL its probed rows survived —
       the band_dedup_any_pipeline counting trick: windowed count ==
       n_probe_effective, closing when the watermark passes.

    Emits (id_col, window, n_won) for vectors that are NOT near-dups
    of the corpus. Recall is the PQ co-bucketing probability (the same
    contract as bucketed_cosine_pairs — floor-pinned for the batch
    kernel; the streaming gate reuses the identical bucketing)."""
    import numpy as np
    import pandas as pd

    c1, c2 = grid
    n_eff = min(n_probe, max(len(acents), 1))
    dim = len(acents[0][1]) if acents else (len(bcents[0][1]) if bcents else 0)

    # cell-ascending codebook matrices: with unique ascending cells a
    # STABLE argsort over o alone reproduces the (o, cell) struct order
    a_sorted = sorted(acents, key=lambda t: t[0])
    b_sorted = sorted(bcents, key=lambda t: t[0])
    a_cells = np.array([int(c) for c, _ in a_sorted], dtype=np.int64)
    b_cells = np.array([int(c) for c, _ in b_sorted], dtype=np.int64)
    amat = (
        np.array([list(map(float, v)) for _, v in a_sorted], dtype=np.float64)
        if a_sorted
        else np.zeros((0, dim))
    )
    bmat = (
        np.array([list(map(float, v)) for _, v in b_sorted], dtype=np.float64)
        if b_sorted
        else np.zeros((0, dim))
    )

    bucket_mats: dict[int, "np.ndarray"] = {}
    if broadcast_index:
        grouped: dict[int, list] = {}
        for r in corpus_index.select("bucket", "cuv").collect():
            grouped.setdefault(int(r["bucket"]), []).append(
                [float(x) for x in r["cuv"]]
            )
        bucket_mats = {
            b: np.array(v, dtype=np.float64) for b, v in grouped.items()
        }

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0 or amat.size == 0:
                continue
            # quarantine rule covers the ID too (round-10 review fix):
            # a NULL id would crash to_numpy(int64) executor-side and
            # kill the query; an unidentifiable row can't be gated.
            # Non-finite embeddings are quarantined too (round-11
            # review fix): a NaN/inf component makes the cosine NaN,
            # and the two screening tiers DISAGREE on NaN — numpy's
            # `NaN >= t` is False (probe survives) while Spark's
            # flat-column `cos >= t` treats NaN as greater-than-any-
            # double (probe killed). A vector that can't be scored
            # can't be gated; dropping it here makes both tiers
            # identical by construction.
            ok = pdf[vec_col].map(
                lambda v: v is not None
                and len(v) == dim
                and np.isfinite(np.asarray(v, dtype=np.float64)).all()
            ) & pdf[id_col].notna()
            pdf = pdf[ok.to_numpy(dtype=bool)]
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1)
            nrm[nrm == 0.0] = 1.0  # zero vector stays zero (_unit rule)
            unit = mat / nrm[:, None]
            oa = -(unit @ amat.T)
            oa[np.isnan(oa)] = -np.inf  # NaN ranks FIRST, as under DESC
            a_top = a_cells[np.argsort(oa, axis=1, kind="stable")[:, :n_eff]]
            if bmat.size:
                ob = -(unit @ bmat.T)
                ob[np.isnan(ob)] = -np.inf
                b_best = b_cells[np.argsort(ob, axis=1, kind="stable")[:, 0]]
            else:
                b_best = np.zeros(len(unit), dtype=np.int64)
            bucket = (a_top * c2 + b_best[:, None]).ravel()
            rep = np.repeat(np.arange(len(unit)), a_top.shape[1])
            ids = pdf[id_col].to_numpy(dtype=np.int64)[rep]
            tss = pdf[ts_col].to_numpy()[rep]
            uprobe = unit[rep]
            if broadcast_index:
                # in-kernel screening: one BLAS matmul per bucket
                # present in this batch; probes in index-absent buckets
                # survive by definition
                keep = np.ones(len(bucket), dtype=bool)
                for b in np.unique(bucket):
                    m = bucket_mats.get(int(b))
                    if m is None:
                        continue
                    sel = bucket == b
                    close = (uprobe[sel] @ m.T >= threshold).any(axis=1)
                    idx = np.flatnonzero(sel)
                    keep[idx[close]] = False
                yield pd.DataFrame({id_col: ids[keep], ts_col: tss[keep]})
            else:
                out = {id_col: ids, ts_col: tss, "bucket": bucket}
                for i in range(dim):
                    out[f"__u{i}"] = uprobe[:, i]
                yield pd.DataFrame(out)

    if broadcast_index:
        schema = f"`{id_col}` BIGINT, `{ts_col}` TIMESTAMP"
        survivors = vecs.select(id_col, ts_col, vec_col).mapInPandas(
            _assign, schema
        )
    else:
        schema = (
            f"`{id_col}` BIGINT, `{ts_col}` TIMESTAMP, bucket BIGINT, "
            + ", ".join(f"__u{i} DOUBLE" for i in range(dim))
        )
        probes = vecs.select(id_col, ts_col, vec_col).mapInPandas(_assign, schema)
        wide_index = corpus_index.select(
            F.col("bucket").alias("__cb"),
            *[F.col("cuv")[i].alias(f"__c{i}") for i in range(dim)],
        )
        cos = F.lit(0.0)
        for i in range(dim):
            cos = cos + F.col(f"__u{i}") * F.col(f"__c{i}")
        survivors = probes.join(
            wide_index,
            (probes["bucket"] == F.col("__cb")) & (cos >= threshold),
            "left_anti",
        )
    counts = (
        survivors.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(id_col))
        .agg(F.count("*").alias("n_won"))
    )
    return counts.filter(F.col("n_won") == n_eff)


def term_index_feed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_key: str = "#corpus",
) -> DataFrame:
    """Transform a document stream into the incremental term-index
    feed consumed by a MaterializedCounts(keys=("term",),
    value_col="value") table: one row per distinct (doc, term) —
    summing their counts across batches yields document frequency for
    an append-only corpus — plus one reserved ``corpus_key`` row per
    doc carrying the doc length, so that key's (n, total) materialize
    (N, Σdl) and avgdl = total/n stays exact (decimal accumulation).

    The reserved key cannot collide with real terms: the tokenizer
    emits [a-z0-9]+ only. Pure DataFrame transform — the SAME code
    feeds the batch-driven registry entry (q_bm25_incremental) and the
    streaming bench pipeline, the TopologyTestDriver pattern the rest
    of this module follows."""
    from ..functions.text import tokenize

    toked = docs.select(F.col(id_col), tokenize(text_col).alias("toks"))
    term_rows = toked.select(
        F.col(id_col),
        F.explode(F.array_distinct("toks")).alias("term"),
        F.lit(None).cast("double").alias("value"),
    )
    stat_rows = toked.select(
        F.col(id_col),
        F.lit(corpus_key).alias("term"),
        F.size("toks").cast("double").alias("value"),
    )
    return term_rows.unionByName(stat_rows)


def ivf_index_feed(
    emb: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Transform an embedding stream into the incremental IVF
    posting-list feed consumed by a MaterializedCounts(keys=
    ("ivf_bucket", "vec_id"), value_col=None) table — the STREAMING
    face of q_ivf_incremental's ingest (the third index-as-you-land
    pipeline, after the bm25 term index and the minhash band feeds).

    The codebook is FROZEN (a driver-side list of (cent_id, unit
    centroid), e.g. kmeans_centroids(...).collect() at train time), so
    the nearest-centroid argmax compiles to a PURE PROJECTION — an
    array_max over per-centroid (cosine, -cent_id) structs, whose
    struct ordering reproduces ivf_assign's exact tie-break (highest
    cosine, then lowest cent_id) — and the feed stays legal on an
    unaggregated stream in append mode (a groupBy/max_by formulation
    would need a watermarked aggregation; a projection needs nothing).
    Per row: O(C·dim) fused multiply-adds inside codegen, no shuffle,
    no Python. Parity with the batch ivf_assign is pinned in
    tests/test_streaming.py."""
    from ..functions.similarity import _dot, _unit

    uv = _unit(F.col(vec_col))
    cands = F.array(
        *[
            F.struct(
                _dot(uv, F.array(*[F.lit(float(x)) for x in cv])).alias(
                    "cs"
                ),
                F.lit(-int(cid)).cast("bigint").alias("nc"),
            )
            for cid, cv in centroid_rows
        ]
    )
    best = F.array_max(cands)
    return emb.select(
        (-best["nc"]).cast("int").alias("ivf_bucket"),
        F.col(id_col).alias("vec_id"),
    )
