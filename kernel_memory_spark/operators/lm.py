"""Unigram language-model scoring — corpus-level quality signal.

textstats.with_quality_score is per-document surface heuristics; this is
the corpus-statistical complement (the CCNet/Gopher pattern of scoring
documents by a language model and filtering the tail — here the
dependency-free unigram case): train add-one-smoothed unigram
log-probabilities on a (reference) corpus, then score each document by
its mean token log-probability. Gibberish, OCR noise, and wrong-language
text score far below prose drawn from the training distribution.

Scale shape: training is one hash aggregate over tokens (map-side
combine) + ONE 2-scalar aggregate (total tokens T, vocab V) to the
driver; scoring is a keyed join on term (|tokens| ⋈ |vocab|, shuffle
hash join — the LM side is usually broadcastable but is not required to
be) + one per-doc aggregate. No Python anywhere, engine-replayable.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("term"),
    ).filter(F.length("term") >= 1)


def train_unigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, float]:
    """-> ((term, logp), oov_logp): add-one-smoothed unigram model,
    logp = ln((c+1)/(T+V)); unseen terms get ln(1/(T+V))."""
    import math

    counts = (
        _tokens(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    t_row = counts.agg(
        F.sum("c").alias("T"), F.count("*").alias("V")
    ).collect()[0]
    denom = float(t_row["T"] + t_row["V"])
    lm = counts.select(
        "term",
        F.log((F.col("c").cast("double") + F.lit(1.0)) / F.lit(denom)).alias(
            "logp"
        ),
    )
    return lm, math.log(1.0 / denom)


def unigram_logprob_scores(
    docs: DataFrame,
    lm: Optional[DataFrame] = None,
    oov_logp: Optional[float] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_tokens, avg_logp): mean token log-probability per
    document under the unigram LM (self-trained on `docs` when no model
    is passed — the in-distribution quality baseline)."""
    if lm is None:
        lm, oov_logp = train_unigram_lm(docs, id_col, text_col)
    toks = _tokens(docs, id_col, text_col)
    scored = toks.join(lm, "term", "left").select(
        "id",
        F.coalesce(F.col("logp"), F.lit(float(oov_logp))).alias("logp"),
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.avg("logp").alias("avg_logp"),
    )


def _bigram_pairs(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """-> (id, w1, w2): consecutive-token pairs per document. Built with
    array functions (filter empty tokens, zip the array against its own
    1-shift, explode) — per-document work, no window, no Python."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda x: F.length(x) >= 1,
    )
    npairs = F.greatest(F.size(arr) - F.lit(1), F.lit(0))
    zipped = F.arrays_zip(
        F.slice(arr, F.lit(1), npairs).alias("w1"),
        F.slice(arr, F.lit(2), npairs).alias("w2"),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(zipped).alias("__p")
    ).select("id", F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))


def bigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_bigrams, avg_logp): mean TRANSITION log-probability per
    document under a self-trained add-one bigram LM,
    logp(w2|w1) = ln((c(w1,w2) + 1) / (c(w1) + V)) with V = unigram
    vocabulary size — the order-sensitive upgrade of
    unigram_logprob_scores (catches shuffled/templated word salad that
    unigram frequencies score as fluent). Documents with < 2 tokens have
    no transitions and are omitted.

    Scale shape: two hash aggregates (bigram + unigram counts, map-side
    combine), ONE 1-row scalar (V) to the driver, one keyed join of
    transitions against the |bigram-vocab| model relation. Self-trained,
    so every transition is in-model (no OOV branch in the hot path)."""
    pairs = _bigram_pairs(docs, id_col, text_col).localCheckpoint()
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = (
        _tokens(docs, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
        .withColumnRenamed("term", "w1")
    )
    v = float(c1.count())
    model = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.log(
            (F.col("c12").cast("double") + F.lit(1.0))
            / (F.col("c1").cast("double") + F.lit(v))
        ).alias("logp"),
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("logp").alias("avg_logp"),
        )
    )
