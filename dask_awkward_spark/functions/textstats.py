"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword n-gram heuristic), quality scoring, token counting,
document fingerprinting. All pure Column expressions — at 100 TB these run
inside the scan stage with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword list for the langid heuristic.
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(F.trim(col), "\\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def word_tokens_bpe_ish(col: Column) -> Column:
    """BPE-ish regex tokenizer: splits words, numbers, punctuation runs."""
    return F.filter(
        F.split(col, "(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])(?=[a-zA-Z0-9])|\\s+"),
        lambda t: t != "",
    )


def stopword_count(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    return F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(sw))).cast("bigint")


def punct_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, "[.,;:!?]", ""))).cast("bigint")


def quality_score(col: Column) -> Column:
    """Length/stopword/punct composite in [0,1] — ratios of exact ints so
    the value is engine-deterministic."""
    n_tok = token_count(col)
    n_sw = stopword_count(col)
    n_ch = F.length(col).cast("bigint")
    sw_ratio = F.when(n_tok > 0, n_sw.cast("double") / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((n_ch >= 100) & (n_ch <= 10000), F.lit(1.0)).otherwise(F.lit(0.5))
    avg_wl = F.when(n_tok > 0, n_ch.cast("double") / n_tok).otherwise(F.lit(0.0))
    wl_ok = F.when((avg_wl >= 3.0) & (avg_wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (sw_ratio + len_ok + wl_ok) / 3


def langid_en(col: Column, threshold: float = 0.05) -> Column:
    """Heuristic language ID: stopword density above threshold → 'en'."""
    n_tok = token_count(col)
    dens = F.when(n_tok > 0, stopword_count(col).cast("double") / n_tok).otherwise(F.lit(0.0))
    return F.when(dens >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized token
    stream (whitespace/case folded) — robust to formatting-only changes."""
    return F.md5(F.array_join(tokens(F.lower(col)), " "))


def rolling_hashes(col: Column, k: int = 8) -> Column:
    """k-gram rolling fingerprints: md5 of each k-token window (winnowing
    building block). Returns array<string> of window hashes.

    The token array is bound ONCE as a lambda variable via a wrapping
    single-element transform. Referencing the tokenization expression
    directly inside the per-window lambda would re-evaluate the whole
    split per window (no common-subexpression elimination inside
    higher-order-function lambdas) — O(doc_len) per shingle, quadratic
    per document; measured 6x slower at sf0.1."""

    def windows(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            starts, lambda i: F.md5(F.array_join(F.slice(toks, i + 1, k), " "))
        )

    return F.get(F.transform(F.array(tokens(F.lower(col))), windows), 0)
