"""Text analysis operators for training-data pipelines.

Beyond-reference LLM-data-pipeline operators (BASELINE.json north
star): language-ID heuristic, quality scoring, token counting,
document fingerprinting. All built-in Column expressions (JVM-side);
no UDFs anywhere — these run at full codegen speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import round_det

# A small high-frequency English stopword set for the n-gram/stopword
# language heuristic. Deterministic + public knowledge.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (BPE-ish regex split on \\s+)."""
    return F.split(F.trim(text), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def word_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/char/word-length stats."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("char_count"),
        F.size(toks).alias("token_count"),
        (F.length(F.col(text_col)) / F.size(toks)).alias("avg_token_len"),
    )


def stopword_ratio_col(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    toks = tokens_col(F.lower(text))
    matches = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return matches / F.size(toks)


def punct_ratio_col(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.length(text)


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality: length, punctuation, stopword
    signals combined into [0,1] (the standard pretraining-filter
    recipe: too-short / punct-heavy / stopword-free docs score low).
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    len_score = F.least(F.lit(1.0), n_tok / F.lit(50.0))
    sw_score = F.least(F.lit(1.0), stopword_ratio_col(F.col(text_col)) * 5.0)
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col(F.col(text_col)) * 4.0)
    return df.select(
        F.col(id_col),
        round_det(len_score * 0.4 + sw_score * 0.3 + punct_penalty * 0.3, 4).alias(
            "quality_score"
        ),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Stopword-ratio language heuristic: docs whose English-stopword
    ratio clears ``threshold`` → 'en', else 'unknown'."""
    ratio = stopword_ratio_col(F.col(text_col))
    return df.select(
        F.col(id_col),
        round_det(ratio, 4).alias("en_stopword_ratio"),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unknown")).alias(
            "predicted_lang"
        ),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", prefix_tokens: int = 8
) -> DataFrame:
    """Document fingerprints: full-text md5 + a prefix-shingle md5
    (cheap rolling-hash-style locality signal: docs sharing a prefix
    fingerprint share their first ``prefix_tokens`` words)."""
    toks = tokens_col(F.col(text_col))
    prefix = F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("full_md5"),
        F.md5(prefix).alias("prefix_md5"),
    )
