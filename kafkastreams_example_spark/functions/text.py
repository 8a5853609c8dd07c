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


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: stopword ratio, type-token ratio,
    mean token length — the standard cheap filters before expensive
    pipeline stages."""
    toks = tokenize(text_col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        (stop_ratio * F.lit(0.5) + ttr * F.lit(0.5)).alias("quality_score"),
    )


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
