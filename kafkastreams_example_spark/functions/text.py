"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (split / higher-order functions / regex) —
no Python in the hot path, so each op is a narrow projection that scales
embarrassingly: no shuffle, fused into the scan by whole-stage codegen.
These are the per-document stages (tokenize → stats → quality → lang →
fingerprint) that typically precede dedup + filtering in an LLM data
pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic English stopword list used by the quality score.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

TOKEN_PATTERN = "[a-z0-9]+"


def tokenize(col: str | Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Lowercased regex tokens (BPE-ish: maximal [a-z0-9] runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc counting stats: chars, tokens, distinct tokens, avg token
    length (exact arithmetic: int sums ÷ count in one double division)."""
    toks = tokenize(text_col)
    n_tok = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (total_len.cast("double") / n_tok).alias("avg_token_len"),
    )


def quality_signal_cols(text_col: str | Column = "text") -> dict[str, Column]:
    """The quality-signal expressions as a name→Column dict, shared by
    the batch scorer (text_quality / q_text_quality's oracle) and the
    streaming ingest gate (streaming.pipelines.quality_filter_pipeline)
    so both tiers compute identical signals from identical code."""
    toks = tokenize(text_col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    return {
        "n_tokens": n_tok,
        "stopword_ratio": stop_ratio,
        "type_token_ratio": ttr,
        "quality_score": stop_ratio * F.lit(0.5) + ttr * F.lit(0.5),
    }


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: stopword ratio, type-token ratio,
    mean token length — the standard cheap filters before expensive
    pipeline stages."""
    sig = quality_signal_cols(text_col)
    return docs.select("doc_id", *[c.alias(n) for n, c in sig.items()])


def lang_id_heuristic(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic marker-token language heuristic (n-gram-lite).

    Real lang-ID would be a fastText-style model behind a pandas UDF;
    the engine surface here is the deterministic fallback tier: presence
    ranking of per-language marker tokens.
    """
    toks = tokenize(text_col)
    has = lambda w: F.array_contains(toks, w)  # noqa: E731
    pred = (
        F.when(has("the") & has("a"), "en")
        .when(has("spark") & has("stream"), "code")
        .otherwise("unk")
    )
    return docs.select("doc_id", F.col("lang").alias("lang_label"), pred.alias("lang_pred"))


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint for exact dedup: md5 over normalized text
    (lowercase, collapsed whitespace). Engine-portable by construction
    (md5 hex is identical everywhere)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(text_col).alias("n_chars"),
    )


def _dup_gram_frames(docs: DataFrame, n: int, text_col: str):
    """Shared gram/dup-set construction for the two ExactSubstr
    operators — the FLAG (duplicated_ngram_stats) and the CUT
    (remove_duplicated_ngram_spans) MUST agree on what counts as a
    duplicated n-gram, so the tokenize → n-gram window → md5 → ≥2-
    distinct-docs pipeline lives exactly once (round-10 review fix:
    it existed twice and could silently desynchronize the stats a
    pipeline branches on from the spans that then get removed).
    Returns (t, n_grams, grams, dup): the (doc_id, toks) frame, the
    per-doc gram-count expression over it, the (doc_id, start, h)
    occurrence frame (1-based starts; linear explode), and the
    duplicated-hash set (two-phase count-distinct, map-side partial)."""
    toks = tokenize(text_col)
    t = docs.select("doc_id", toks.alias("toks"))
    n_grams = F.greatest(F.size("toks") - (n - 1), F.lit(0))
    starts = F.sequence(F.lit(1), n_grams, F.lit(1))
    grams = (
        t.filter(n_grams > 0)
        .select("doc_id", F.explode(starts).alias("start"), F.col("toks"))
        .select(
            "doc_id",
            "start",
            F.md5(F.concat_ws(" ", F.slice("toks", F.col("start"), n))).alias("h"),
        )
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("h")
    )
    return t, n_grams, grams, dup


def duplicated_ngram_stats(
    docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Exact substring (word n-gram) duplication stats per document —
    the ExactSubstr signal of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", re-expressed relationally: an
    n-gram is *duplicated* iff it occurs in ≥ 2 distinct documents, and
    each doc reports how much of its content is covered by such spans
    (the usual cut-or-drop decision input).

    Plan (all Catalyst, no Python): tokenize → explode n-gram start
    positions (linear fan-out, ≈ n_tokens rows/doc) → md5 the joined
    window (engine-portable; 8-byte xxhash would be faster but is not
    reproducible in the DuckDB oracle) → two-phase countDistinct per
    hash (partial map-side agg) → LEFT SEMI join back (no fan-out even
    on hot n-grams: semi-join emits each gram row at most once) →
    per-doc count. Shuffles: by hash (agg + semi-join, one exchange
    reused), by doc_id (final agg). At 100 TB the gram frame is the
    big intermediate; it is never widened past (doc_id, hash).
    """
    t, n_grams, grams, dup = _dup_gram_frames(docs, n, text_col)
    per_doc = (
        grams.join(dup, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_ngrams"))
    )
    totals = t.select("doc_id", n_grams.alias("n_ngrams"))
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_dup_ngrams", F.lit(0)).alias("n_dup_ngrams"),
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce("n_dup_ngrams", F.lit(0)).cast("double") / F.col("n_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def gopher_quality_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality RULES (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", appendix A1.1 quality heuristics) —
    the accept/reject tier that runs BEFORE expensive pipeline stages,
    complementing text_quality's continuous scores with the hard
    pass/fail contract a filtering pipeline actually branches on.

    Rules (thresholds calibrated to this corpus's 10-99-token synthetic
    docs so both outcomes exist; the paper's 50-100k-word bounds are
    web-document calibrations of the same rule shapes):
      - word_count_ok:    30 ≤ n_tokens ≤ 80
      - mean_len_ok:      4.2 ≤ mean token length ≤ 4.8
      - stopwords_ok:     ≥ 2 stopword occurrences
      - repetition_ok:    type-token ratio ≥ 0.5 (the paper's
                          duplicate-n-gram-fraction family)
    All arithmetic is a single integer-sum / integer-count division per
    signal (one IEEE op — engine-exact); passes = every rule holds,
    n_failed counts violations for triage dashboards. Plan: one narrow
    projection over the scan, no shuffle at all — the cheapest possible
    full-corpus pass, which is the point of a gate that fronts 100 TB.

    Zero-token rule (round-10 review fix): a doc with NO tokens fails
    EVERY rule deterministically — mean_len/ttr are x/0 and would
    otherwise null-poison the flags (Spark: NULL == 0 is NULL; a hard
    gate whose verdict can be NULL is broken), so the ratio rules are
    coalesced to False and mean_token_len reports NULL. NULL text is
    folded into the same class (round-11 review fix): tokenize(NULL)
    is NULL, which would make n_tok NULL and null-poison the two
    count rules the zero-token fix did NOT coalesce — so text is
    coalesced to '' first and a NULL-text doc fails all four rules
    exactly like an empty one. Both engines share the contract."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(F.coalesce(c, F.lit("")))
    n_tok = F.size(toks)
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
        / n_tok,
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ttr = F.when(n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok)
    rules = {
        "word_count_ok": (n_tok >= 30) & (n_tok <= 80),
        "mean_len_ok": F.coalesce((mean_len >= 4.2) & (mean_len <= 4.8), F.lit(False)),
        "stopwords_ok": n_stop >= 2,
        "repetition_ok": F.coalesce(ttr >= 0.5, F.lit(False)),
    }
    n_failed = sum(
        (~c).cast("int") for c in rules.values()
    )
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        *[c.alias(n) for n, c in rules.items()],
        n_failed.cast("int").alias("n_failed"),
        (n_failed == 0).alias("passes"),
    )


def remove_duplicated_ngram_spans(
    docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Exact-substring span REMOVAL — the second half of the Lee et al.
    2022 ExactSubstr pipeline: where duplicated_ngram_stats only FLAGS
    how much of each doc is covered by cross-document n-gram spans,
    this operator CUTS those spans and returns the cleaned remainder —
    the transform a training-data pipeline actually applies next.

    Contract: a token position is covered iff it lies inside any
    n-token window whose n-gram occurs in ≥ 2 DISTINCT documents;
    cleaned_text is the space-joined uncovered tokens (the tokenized
    view — same normalization as every text operator here). The span
    is cut from EVERY document containing it, a deterministic,
    order-free relational rule; the paper's keep-one-occurrence
    variant needs a canonical-survivor choice that is inherently
    sequential across overlapping spans — cut-everywhere is the
    contract that scales and the common conservative choice for
    contamination-style cleanup. Docs shorter than n tokens have no
    grams and pass through untouched.

    Plan (all Catalyst, no Python): the same gram frame as
    duplicated_ngram_stats (linear explode, ≈ n_tokens rows/doc) →
    two-phase count-distinct dup-hash set → LEFT SEMI back onto the
    gram occurrences (hot grams emit each occurrence once — no
    fan-out) → explode each dup occurrence into its n covered
    positions, distinct per (doc, pos) (bounded n× fan-out of DUP
    grams only) → posexplode'd tokens LEFT ANTI the covered set →
    ordered re-assembly per doc via array_sort(collect_list(struct)).
    Shuffles: gram hash (agg + semi, exchange reused), (doc_id, pos)
    twice (distinct + anti join — same key, exchange reused), doc_id
    (final agg). Nothing is ever all-pairs; the widest intermediate
    stays (doc_id, pos)."""
    t, n_grams, grams, dup = _dup_gram_frames(docs, n, text_col)
    covered = (
        grams.join(dup, "h", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (n - 1), F.lit(1))
            ).alias("pos"),
        )
        .distinct()
    )
    tok_pos = t.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tok_pos.join(covered, ["doc_id", "pos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("cleaned_text"),
    )
    totals = t.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).cast("bigint").alias(
            "n_removed_tokens"
        ),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def bpe_pair_counts(docs: DataFrame, top_k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies over token
    occurrences — iteration 1 of BPE vocabulary training (Sennrich et
    al. 2016). Every token occurrence contributes its adjacent pairs,
    which equals the classic word-frequency-weighted formulation.

    Plan: explode token occurrences → two-phase count into the (much
    smaller) vocabulary — so the expensive per-position pair slicing
    runs once per DISTINCT token, weighted by its frequency, not once
    per occurrence (the classic word-frequency BPE formulation) → sum
    per pair → deterministic top-k (count DESC, pair ASC) via
    TakeOrderedAndProject — no global sort, scale-safe for any corpus.
    """
    toks = tokenize(text_col)
    vocab = (
        docs.select(F.explode(toks).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("w_cnt"))
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "w_cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("w_cnt").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def bpe_train_vocab(docs, n_merges: int = 4, text_col: str = "text"):
    """BPE training loop (Sennrich et al. 2016) shared by the merge-
    table entry (queries.q_bpe_train_merges) and the encoder
    (queries.q_bpe_encode): returns (bests, vocab) where `bests` is the
    per-round list of 1-row (merge_rank, left_sym, right_sym, weight)
    frames and `vocab` is the final (word, weight, syms) frame with all
    merges applied. Scale shape: the corpus touches the cluster once
    (the initial word-count groupBy); every iteration runs on the tiny
    distinct-word frame; the initial vocabulary and each round's 1-row
    best pair are eagerly localCheckpoint-ed (without the cuts every
    union branch re-derives the chain and the corpus scan duplicates
    ~2^rounds times — measured 15 scans for 4 rounds, plan-guarded at
    ≤1). A round with NO pairs ends training, matching the oracle
    whose LIMIT 1 over an empty pair set emits nothing."""
    from pyspark.sql import functions as F

    vocab = (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
        .withColumn(
            "syms", F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        )
        .localCheckpoint(eager=True)
    )
    bests = []
    for r in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "weight",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms)-1),"
                        " (s, i) -> struct(s AS pa, syms[i+1] AS pb))"
                    )
                ).alias("pr"),
            )
            .groupBy("pr.pa", "pr.pb")
            .agg(F.sum("weight").alias("w"))
        )
        best = (
            pairs.agg(
                F.min(F.struct((-F.col("w")).alias("nw"), "pa", "pb")).alias("m")
            )
            .select(
                F.col("m.pa").alias("pa"),
                F.col("m.pb").alias("pb"),
                (-F.col("m.nw")).alias("w"),
            )
            .filter(F.col("pa").isNotNull())
            .localCheckpoint(eager=True)
        )
        if best.count() == 0:  # acknowledged runtime-stat action class
            break
        bests.append(
            best.select(
                F.lit(r).alias("merge_rank"),
                F.col("pa").alias("left_sym"),
                F.col("pb").alias("right_sym"),
                F.col("w").alias("weight"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .withColumn(
                "syms", bpe_greedy_merge(F.col("syms"), F.col("pa"), F.col("pb"))
            )
            .select("word", "weight", "syms")
        )
    return bests, vocab


def bpe_greedy_merge(syms: Column, pa: Column, pb: Column) -> Column:
    """One BPE merge pass: replace every non-overlapping (pa, pb)
    adjacency in `syms` with the concatenated token, scanning greedily
    left-to-right (Sennrich et al., ACL 2016 semantics). Implemented as
    a built-in `aggregate` fold so it stays JVM-side: the accumulator
    is the merged prefix; a null-safe `get` makes the empty-accumulator
    probe compare NULL == pa → false instead of raising ANSI
    out-of-bounds. The just-merged token (pa||pb) can never re-trigger
    the same pair, because pa||pb = pa would need pb = ''."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == pa) & (x == pb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(pa, pb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
