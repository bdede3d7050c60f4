"""Training-corpus cleaning operators: PII scrubbing, benchmark
decontamination, repetition-quality signals.

The standard pre-training hygiene passes a 100TB text pipeline runs after
dedup (operators/dedup.py) and quality scoring (operators/textstats.py):

- `pii_scrub` — deterministic redaction of e-mail addresses, phone
  numbers, IPv4 addresses and long digit runs with typed placeholders.
  Pure regexp_replace chain (RE2-compatible patterns, no lookbehind), so
  it stays in whole-stage codegen AND any SQL engine replays it.
- `decontaminate` — flag documents sharing word n-grams with an
  evaluation/benchmark set (the n-gram-overlap decontamination used for
  public LM training sets, e.g. GPT-3 appendix C / PaLM: 8-13 token
  overlap). Shape: explode doc n-grams -> hash -> broadcast-join the
  (small) benchmark gram set -> per-doc overlap counts. At 100TB the
  benchmark side is thousands of grams — always the broadcast side; the
  doc side is one narrow projection, no self-join.
- `repetition_stats` — the repetition signals of Gopher/MassiveText's
  quality rules (Rae et al. 2021, table A1): duplicate-line fraction,
  duplicate-line character fraction, top-bigram character fraction.
  explode + two bounded aggregations per doc.
- `line_dedup` — C4's cross-document span dedup at line granularity
  (keep the first occurrence corpus-wide, drop the rest), the removal
  TRANSFORM that complements boilerplate_ngrams' detection.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: e-mail first (it contains digits/dots), then IP, then
# bare long digit runs as [ID] (so a separator-free account number isn't
# mislabeled a phone), then separator-formatted phone numbers; all RE2-safe
PII_RULES: Tuple[Tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\b\d{9,}\b", "[ID]"),
    (r"\+?\d[\d ()-]{7,}\d", "[PHONE]"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed") -> DataFrame:
    """Redact PII spans with typed placeholders (one regexp_replace per
    rule, chained — a single projection in the plan)."""
    c = F.col(text_col)
    for pattern, placeholder in PII_RULES:
        c = F.regexp_replace(c, pattern, placeholder)
    return df.withColumn(out_col, c)


def _word_ngrams(text_col: str, n: int):
    words = F.split(
        F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]", " ")), r"\s+"
    )
    words = F.filter(words, lambda w: F.length(w) > 0)
    k = F.size(words) - (n - 1)
    return F.when(k > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )).otherwise(F.array())


def benchmark_ngrams(benchmark: DataFrame, n: int = 8,
                     text_col: str = "text") -> DataFrame:
    """The (small) contamination reference set: distinct word n-grams of
    the benchmark texts -> one `gram` column."""
    return (
        benchmark.select(F.explode(_word_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_overlaps): count of DISTINCT benchmark n-grams each
    document contains (0-overlap docs are absent — clean). Filter/flag
    with `n_overlaps >= threshold` upstream of training-set export."""
    grams = benchmark_ngrams(benchmark, n, text_col)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(text_col, n)).alias("gram"),
    ).distinct()
    return (
        doc_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlaps"))
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher repetition signals per document:

    - dup_line_frac: duplicated lines / total lines
    - dup_line_char_frac: characters in duplicated lines / total characters
    - top_bigram_char_frac: characters covered by the most frequent word
      bigram / total word characters

    (Rae et al. 2021, appendix A1; thresholds there: 0.30 / 0.20 / 0.18.)"""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\n")).alias("line"),
    ).filter(F.length(F.trim("line")) > 0)
    per_line = lines.groupBy(id_col, "line").agg(
        F.count("*").alias("c"), F.length("line").alias("len")
    )
    line_stats = per_line.groupBy(id_col).agg(
        (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
         / F.sum("c")).alias("dup_line_frac"),
        (F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(0))
         / F.sum(F.col("c") * F.col("len"))).alias("dup_line_char_frac"),
    )

    bigrams = df.select(
        F.col(id_col),
        F.explode(_word_ngrams(text_col, 2)).alias("gram"),
    )
    per_gram = bigrams.groupBy(id_col, "gram").agg(
        F.count("*").alias("c"),
        (F.length("gram") - 1).alias("chars"),  # gram chars minus the space
    )
    gram_stats = per_gram.groupBy(id_col).agg(
        (F.max(F.col("c") * F.col("chars"))
         / F.sum(F.col("c") * F.col("chars"))).alias("top_bigram_char_frac"),
    )
    return line_stats.join(gram_stats, id_col, "full")


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detection -> (gram, df): word n-grams
    appearing in >= min_df DISTINCT documents (headers, footers, cookie
    banners, licence blurbs — the spans that survive per-doc dedup but
    poison training data). Set semantics per document (a gram repeated
    inside one doc counts once), same tokenizer as decontaminate so the
    two share scan work when composed.

    Scale: the (doc, gram) relation is distinct-ed then hash-aggregated
    by gram with map-side combine; min_df prunes before anything joins
    back. The result is the small side by construction — broadcast it
    against the corpus to strip matching spans."""
    doc_grams = docs.select(
        F.col(id_col), F.explode(_word_ngrams(text_col, n)).alias("gram")
    ).distinct()
    return (
        doc_grams.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style cross-document line deduplication (Raffel et al. 2020
    §2.2: 'we discarded all but one of any three-sentence span occurring
    more than once', applied here at line granularity): every distinct
    non-blank line is kept only at its FIRST occurrence — the smallest
    (doc, position) in the corpus — and removed from every later
    document; blank lines are structural and always survive. Returns
    (id_col, text_clean, n_lines_kept, n_lines_dropped); a document with
    no cross-corpus duplicate lines reconstructs byte-identically.

    Scale shape: one posexplode, ONE hash-partitioned window keyed by
    line text (partition size = occurrences of one line — bounded, and
    the blank-line mega-partition never reaches the window because
    blanks are split off first), one re-aggregation per document. No
    global windows, no self-joins, no Python anywhere."""
    from pyspark.sql import Window

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    is_content = F.length(F.trim(F.col("line"))) > 0
    content = lines.filter(is_content).withColumn(
        "keep",
        F.row_number().over(
            Window.partitionBy("line").orderBy(id_col, "pos")
        )
        == 1,
    )
    blanks = lines.filter(~is_content).withColumn("keep", F.lit(True))
    all_lines = content.unionByName(blanks)
    return all_lines.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.sum(
            F.when(F.col("keep") & (F.length(F.trim("line")) > 0), 1)
            .otherwise(0)
        ).cast("long").alias("n_lines_kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
        .cast("long").alias("n_lines_dropped"),
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty -> (id_col, n_grams, n_novel,
    novel_frac): the fraction of a document's distinct word n-grams that
    occur in NO other document — the rare-end complement of
    boilerplate_ngrams (df >= cap) and the standard cheap proxy for
    "does this document add information the corpus doesn't already
    have" when selecting training data (high novelty = new content; a
    near-zero score means the document is assembled from corpus-common
    phrasing even if no single near-dup exists).

    Same tokenizer as boilerplate/decontaminate (shared scan when
    composed). Shape: one distinct (doc, gram) relation consumed twice
    — a gram-df hash aggregate and a join-back — then one per-doc
    aggregate; the df relation never leaves the executors."""
    doc_grams = (
        docs.select(
            F.col(id_col),
            F.explode(_word_ngrams(text_col, n)).alias("gram"),
        )
        .distinct()
        .localCheckpoint()
    )
    gram_df = doc_grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__df")
    )
    return (
        doc_grams.join(gram_df, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("__df") == 1).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novel_frac",
            F.round(F.col("n_novel") / F.col("n_grams"), 6),
        )
    )
