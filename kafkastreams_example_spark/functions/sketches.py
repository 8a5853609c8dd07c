"""Bounded-memory frequency sketches: Misra-Gries partition summaries
with an exactness certificate.

Why this exists next to the exact groupBy (queries.q_corpus_top_terms):
at 100 TB the vocabulary is NOT small — web-scale corpora carry
billions of singleton junk tokens (hashes, typos, serial numbers), so
an exact `groupBy(term).count()` shuffles one row per distinct term
PER MAP PARTITION (partial aggregation dedups within a partition, not
across), and the shuffle is vocabulary-bound. The classic fix
(Misra & Gries 1982; merge form per Agarwal et al., "Mergeable
Summaries", PODS 2012) is a per-partition k-counter summary: each
partition emits ≤ k candidate terms plus one scalar — its total
decrement D_p — and the follow-up EXACT recount touches only
candidate terms, so the heavy shuffle carries ≤ k rows per partition
no matter how large the long tail is.

The certificate that makes the sketch safe as a default: MG guarantees
(a) every stored count undercounts its term by at most D_p, and
(b) any term ABSENT from a partition's summary occurred at most D_p
times in that partition — each decrement round subtracts d from ≥ k+1
counters, destroying ≥ (k+1)·d mass, so Σd = D_p ≤ n_p/(k+1).
Summing (b) over partitions: a term absent from EVERY summary has
global count ≤ ΣD_p. After the exact recount of candidates, if the
k-th requested result's exact count exceeds ΣD_p, NO excluded term
can displace it — the top-k is provably exact, certified from the
run's own numbers rather than a distributional assumption. On skewed
(Zipfian) data the certificate holds at modest k; on adversarially
flat data it honestly fails instead of silently returning wrong
counts — `top_terms_sketched` raises in that case.

No reference-repo counterpart (the reference is a 2-topology Kafka
Streams demo, kafka-streams-examples PageViewTypeDemo scale); this is
part of the training-data-pipeline extension surface (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_reduce(batch_counts, k: int) -> tuple[dict, int]:
    """The batch-form Misra-Gries reduction itself, Spark-free so the
    invariants are directly property-testable (and reusable by the
    streaming tier): fold per-batch exact count mappings into ≤ k
    counters, returning (counters, d_total). Invariants (see module
    docstring for the proof): for every term,
    true_count − d_total ≤ stored_count ≤ true_count, and a term
    absent from `counters` has true_count ≤ d_total."""
    counters: dict = {}
    d_total = 0
    for vc in batch_counts:
        for t, c in vc.items():
            counters[t] = counters.get(t, 0) + int(c)
        if len(counters) > k:
            vals = np.fromiter(counters.values(), dtype=np.int64)
            # (k+1)-th largest = index -(k+1) of the ascending sort
            d = int(np.partition(vals, len(vals) - (k + 1))[len(vals) - (k + 1)])
            if d > 0:
                counters = {t: c - d for t, c in counters.items() if c > d}
                d_total += d
    return counters, d_total


def mg_partition_summaries(
    terms: DataFrame, k: int, term_col: str = "term"
) -> DataFrame:
    """Per-partition Misra-Gries summaries over a one-string-column
    frame of term OCCURRENCES (pre-exploded).

    Output rows, per input partition:
      * ≤ k candidate rows: (term, cnt = MG lower-bound count, dp = 0)
      * exactly one ledger row: (term = NULL, cnt = 0, dp = D_p), the
        partition's total decrement — the error budget the certificate
        sums.

    Batch-form MG: accumulate exact batch counts into the counter map;
    whenever the map exceeds k entries, subtract the (k+1)-th largest
    value d from every counter and drop the non-positive ones (≥ k+1
    counters lose the full d, so D_p ≤ n_p/(k+1) by mass conservation).
    Arrow-batched via mapInPandas — partition state lives across the
    batch iterator, per-batch counting is a vectorized value_counts,
    and the decrement threshold is an O(m) np.partition select, so the
    Python loop is per-DISTINCT-term-per-batch, never per-occurrence.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters, d_total = mg_reduce(
            (pdf[term_col].dropna().value_counts() for pdf in batches), k
        )
        out = pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                "dp": [0] * len(counters) + [d_total],
            }
        )
        yield out

    return terms.select(F.col(term_col).alias("term")).mapInPandas(
        summarize, schema="term STRING, cnt BIGINT, dp BIGINT"
    )


class StreamingTopK:
    """Continuous heavy-hitters over a term stream: each micro-batch is
    reduced to a Misra-Gries partition summary IN the cluster (≤ k+1
    rows per partition cross to the driver — bounded by construction,
    never the batch vocabulary), then merged into a k-counter driver
    state with `mg_reduce`. Mergeable-summaries composition (Agarwal
    et al., PODS 2012): merging MG summaries yields an MG summary whose
    error budgets ADD, so after any number of batches every stored
    count satisfies true − d_total ≤ stored ≤ true and any absent term
    has true ≤ d_total — the same certificate arithmetic as the batch
    operator, maintained incrementally. State is O(k) on the driver
    (the sketch IS the state; there is nothing to keep executor-side
    between micro-batches, which is why this is a foreachBatch fold
    rather than a stateful-operator job).

    Usage: `.foreach_batch()` plugs into `writeStream.foreachBatch`;
    `.topk(n)` reads the current heavy hitters with their count bounds
    — d_total == 0 certifies them exact, and in general a hitter is
    provably real whenever its lower bound exceeds d_total.

    At-least-once replay: foreachBatch can redeliver a batch (failure
    between batch completion and checkpoint commit, or restart replaying
    the last un-committed batch). Folding the same batch twice would
    overcount and break the `stored <= true` upper-bound side of the
    certificate, so `apply_batch` tracks the last applied batch_id and
    skips batch_id <= last — the same guard the manifest-table sinks
    (MaterializedCounts/CdcTable.apply_batch) use. Driver-held sketch
    state is NOT persisted: a query restart in a NEW process starts the
    sketch empty and re-counts only from the stream's current offsets —
    callers needing restart-spanning totals should snapshot
    `.topk()`/`.d_total` externally."""

    def __init__(self, k: int = 1024, term_col: str = "term"):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = k
        self.term_col = term_col
        self.counters: dict = {}
        self.d_total = 0
        self.last_batch_id = -1

    def apply_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is not None and batch_id <= self.last_batch_id:
            return  # foreachBatch redelivery — already folded in
        rows = mg_partition_summaries(
            batch_df, self.k, term_col=self.term_col
        ).collect()
        # a hot term appears in SEVERAL partition summaries — sum them
        # (a plain dict build would keep one partition's count and
        # silently discard the rest, breaking the lower-bound invariant)
        batch_counts: dict = {}
        dp = 0
        for r in rows:
            if r["term"] is None:
                dp += r["dp"]
            else:
                batch_counts[r["term"]] = batch_counts.get(r["term"], 0) + r["cnt"]
        self.counters, d_merge = mg_reduce([self.counters, batch_counts], self.k)
        self.d_total += dp + d_merge
        # commit AFTER the fold succeeds (same order as the manifest
        # sinks): if the collect/fold above throws, a foreachBatch
        # redelivery of this batch_id must NOT be skipped — recording
        # the id first would permanently lose the batch's counts and
        # break the stored + d_total >= true certificate side.
        if batch_id is not None:
            self.last_batch_id = batch_id

    def foreach_batch(self):
        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch_df, batch_id=batch_id)

        return fn

    def topk(self, n: int) -> list[tuple]:
        """Top-n as (term, count_lower_bound, count_upper_bound),
        ordered by stored count desc then term. Upper bound = stored +
        d_total (the undercount can be anywhere in [0, d_total])."""
        ranked = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(t, c, c + self.d_total) for t, c in ranked[:n]]


def top_terms_sketched(
    terms: DataFrame,
    n: int,
    k: int = 2048,
    term_col: str = "term",
) -> DataFrame:
    """Exact-or-error top-n terms by occurrence count WITHOUT a
    vocabulary-wide shuffle: MG candidate generation (≤ k rows per
    partition cross the wire) → broadcast semi-probe of the corpus →
    exact recount of candidates only → certificate check.

    The certificate collect is two scalars (ΣD_p and the n-th exact
    candidate count) — bounded by construction, not a data-sized
    driver pull. If the n-th count does not strictly exceed ΣD_p the
    sketch cannot prove exactness and this RAISES rather than return
    counts that might be wrong (raise k or fall back to the exact
    groupBy). d=0 everywhere (partition vocab ≤ k) degrades to exact
    per-partition counting, so small-data runs always certify.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    summaries = mg_partition_summaries(terms, k, term_col=term_col)
    summaries = summaries.persist()
    try:
        candidates = (
            summaries.filter(F.col("term").isNotNull()).select("term").distinct()
        )
        exact = (
            terms.select(F.col(term_col).alias("term"))
            .join(F.broadcast(candidates), "term")
            .groupBy("term")
            .agg(F.count("*").alias("n"))
        )
        # count-desc ordering is load-bearing: the certificate compares
        # the n-th COUNT against the error budget, so any other primary
        # ordering would certify/reject on the wrong boundary value.
        # Term asc is a pure tie-break for determinism.
        order = (F.col("n").desc(), F.col("term"))
        top = exact.orderBy(*order).limit(n).persist()
        try:
            rows = top.orderBy(*order).collect()
            d_tot = summaries.agg(F.sum("dp")).collect()[0][0] or 0
            # < n candidates is only provably complete when nothing was
            # ever decremented (d_tot == 0 ⇒ summaries were exact)
            certified = (
                rows[n - 1]["n"] > d_tot if len(rows) >= n else d_tot == 0
            )
            if not certified:
                bound = rows[n - 1]["n"] if len(rows) >= n else len(rows)
                raise ValueError(
                    f"top-{n} not certifiable: boundary {bound} vs "
                    f"error budget {d_tot}; raise k"
                )
            spark = terms.sparkSession
            return spark.createDataFrame(rows, schema=top.schema)
        finally:
            top.unpersist()
    finally:
        summaries.unpersist()
