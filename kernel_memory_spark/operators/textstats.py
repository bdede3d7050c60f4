"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting. All pure column
expressions (JVM-side, codegen-friendly) so they cost one narrow scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.functions.text import (
    doc_fingerprint,
    token_count_4char,
    token_count_words,
)

# tiny closed stopword sets per language for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une"],
    "es": ["el", "la", "los", "y", "es", "en", "que", "por", "una"],
}


def _stopword_hits(words: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS[lang]])
    return F.size(F.array_intersect(words, sw))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: the language whose stopword set overlaps the
    document's word set most; 'und' (undetermined) when nothing matches."""
    words = F.array_distinct(
        F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]", " ")), r"\s+")
    )
    out = df.withColumn("__words", words)
    hit_cols = [
        _stopword_hits(F.col("__words"), lang).alias(f"__hits_{lang}")
        for lang in _LANG_STOPWORDS
    ]
    out = out.select("*", *hit_cols)
    langs = list(_LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"__hits_{l}") for l in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pick = pick.when(F.col(f"__hits_{l}") == best, F.lit(l))
    out = out.withColumn("lang_id", pick)
    return out.drop("__words", *[f"__hits_{l}" for l in langs])


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, alpha ratio, punctuation ratio, mean word
    length, stopword ratio -> score in [0,1]."""
    txt = F.col(text_col)
    length = F.length(txt)
    n_alpha = F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(txt, r"[^.,;:!?]", ""))
    words = F.split(F.lower(txt), r"\s+")
    n_words = F.size(words)
    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), sw))

    alpha_ratio = F.when(length > 0, n_alpha / length).otherwise(F.lit(0.0))
    punct_ratio = F.when(length > 0, n_punct / length).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / F.lit(10.0)).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), length / F.lit(200.0))

    score = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                0.35 * alpha_ratio
                + 0.25 * len_score
                + 0.25 * stop_ratio
                + 0.15 * (1 - F.least(F.lit(1.0), punct_ratio * 5)),
            ),
        ),
        4,
    )
    return (
        df.withColumn("n_chars_text", length)
        .withColumn("alpha_ratio", F.round(alpha_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("quality_score", score)
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace words, BPE-ish regex tokens, 4-char tokens (A3/C4)."""
    return (
        df.withColumn(
            "n_words",
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")),
        )
        .withColumn("n_tokens_bpeish", token_count_words(F.col(text_col)))
        .withColumn("n_tokens_4char", token_count_4char(F.col(text_col)))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprint for dedup/lineage."""
    return df.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
