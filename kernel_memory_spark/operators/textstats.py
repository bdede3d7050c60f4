"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting. All pure column
expressions (JVM-side, codegen-friendly) so they cost one narrow scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def gopher_gates(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.80,
    max_symbol_ratio: float = 0.10,
    max_bullet_line_frac: float = 0.90,
    max_ellipsis_line_frac: float = 0.30,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality gates (Rae et al. 2021, Table A1
    subset) -> per-document measurements + one boolean per gate +
    `keep` (AND of all gates). The standard pre-training corpus filter:
    each gate is a closed-form column expression over ONE narrow scan —
    no UDF, no shuffle, fully engine-replayable — so filtering 10^12
    documents costs exactly one pass.

    Measurement definitions (pinned for the cross-engine oracle):
    words = whitespace-split of trim(text); mean word length =
    len(text minus whitespace) / n_words; alpha word = word containing
    at least one A-Za-z; symbol ratio = (#'#' + #'...') / n_words;
    bullet line = line starting with '-', '*', or bullet dot after
    trim; ellipsis line = line ending with '...' after trim; stopword
    hits = how many of the 10 closed English stopwords appear."""
    txt = F.col(text_col)
    trimmed = F.trim(txt)
    words = F.split(trimmed, r"\s+")
    n_words = F.size(words)
    sum_word_chars = F.length(F.regexp_replace(trimmed, r"\s+", ""))
    mean_wl = F.when(
        n_words > 0, sum_word_chars / n_words
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    alpha_frac = F.when(
        n_words > 0, n_alpha_words / n_words
    ).otherwise(F.lit(0.0))
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#")))
    n_ellipsis = (
        F.length(txt) - F.length(F.replace(txt, F.lit("...")))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).otherwise(F.lit(0.0))
    lines = F.split(txt, r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike(r"^[-*•]"),
        )
    )
    n_ell_end = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$"))
    )
    bullet_frac = F.when(
        n_lines > 0, n_bullet / n_lines
    ).otherwise(F.lit(0.0))
    ell_frac = F.when(
        n_lines > 0, n_ell_end / n_lines
    ).otherwise(F.lit(0.0))
    lowered = F.array_distinct(
        F.split(F.lower(trimmed), r"[^a-z0-9]+")
    )
    stop_hits = sum(
        (
            F.array_contains(lowered, w).cast("int")
            for w in _LANG_STOPWORDS["en"]
        ),
        F.lit(0),
    )
    out = df.select(
        "*",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ell_frac, 4).alias("ellipsis_line_frac"),
        stop_hits.alias("stopword_hits"),
    )
    gates = {
        "g_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "g_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "g_alpha_words": F.col("alpha_word_frac")
        >= min_alpha_word_frac,
        "g_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "g_bullet_lines": F.col("bullet_line_frac")
        <= max_bullet_line_frac,
        "g_ellipsis_lines": F.col("ellipsis_line_frac")
        <= max_ellipsis_line_frac,
        "g_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for name, cond in gates.items():
        out = out.withColumn(name, cond)
    keep = None
    for name in gates:
        keep = F.col(name) if keep is None else (keep & F.col(name))
    return out.withColumn("keep", keep)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm) -> distinct (id, pos, gram_hash): from
    the char k-gram hash sequence of the normalized text, every length-w
    window contributes its MINIMUM hash (rightmost on ties), then
    selections are deduplicated. Guarantees: any shared substring of
    length >= k + w - 1 between two documents yields at least one
    shared fingerprint (the local-fingerprint contract whole-document
    hashing lacks), while keeping ~2/(w+1) of positions.

    Scale shape: normalization + gram hashing is one narrow projection
    with a posexplode fan-out linear in text length; the window minimum
    is ONE per-document ordered window (rows between CURRENT ROW and
    w-1 FOLLOWING — document-local, so partitions never exchange rows);
    dedup is a hash aggregate. Tail windows (< w grams) participate,
    documented as part of the contract.

    Engine determinism: the (hash asc, pos desc) argmin is packed into
    a single BIGINT key hash * 2^21 + (2^21 - 1 - pos) — exact integer
    comparisons, no struct-in-window support required of the mirroring
    engine; positions must be < 2^21 (2M chars — cap or pre-chunk
    longer docs)."""
    clean = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    grams = (
        df.select(
            F.col(id_col).alias("id"), clean.alias("__c")
        )
        .filter(F.length("__c") >= k)
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length(__c) - {k} + 1), "
                    f"i -> substring(__c, i, {k}))"
                )
            ).alias("pos", "gram"),
        )
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast(
        "long"
    )
    keyed = grams.select(
        "id",
        "pos",
        (
            h * F.lit(2 ** 21)
            + (F.lit(2 ** 21 - 1) - F.col("pos"))
        ).alias("__key"),
    )
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    picked = keyed.select(
        "id", F.min("__key").over(win).alias("__sel")
    ).distinct()
    return picked.select(
        F.col("id").alias(id_col),
        (
            F.lit(2 ** 21 - 1) - F.pmod(F.col("__sel"), F.lit(2 ** 21))
        ).cast("int").alias("pos"),
        F.floor(F.col("__sel") / F.lit(2 ** 21)).alias("gram_hash"),
    )
