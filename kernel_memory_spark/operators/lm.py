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
