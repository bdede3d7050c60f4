"""Retrieval-quality metrics at corpus scale: NDCG@k, MRR, Precision@k.

The reference's search stack (SearchClient.cs result assembly + the
rerank path mirrored in operators/query.py) produces ranked lists but has
no batch evaluation surface; measuring a ranker over 10^9 queries is a
first-class need for a training-data / search engine and is pure
column algebra:

* ONE exchange on the query/group key; both orderings (the system run,
  ordered by score, and the ideal ordering, by relevance) are windows
  over the same partitioning, so Catalyst plans a single shuffle with
  two in-partition sorts — no global sort, no driver loop.
* Group sizes are candidate-list lengths (bounded by the retriever's
  top-N), so window memory is bounded regardless of query count.
* Deterministic across engines: ties broken by an explicit id column,
  gains and discounts are closed-form (2^rel - 1, log2(pos + 1)) —
  the whole computation replays bit-for-bit in any SQL engine.

Metric definitions (Jarvelin & Kekalainen 2002 for DCG):
  DCG@k  = sum over run positions p <= k of (2^rel - 1) / log2(p + 1)
  NDCG@k = DCG@k / IDCG@k, 0 when the group has no relevant item
  MRR    = 1 / (first run position with rel > 0), 0 when none
  P@k    = |{p <= k : rel > 0}| / k
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    tie_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group ranking quality of ordering by `score_col` DESC against
    graded labels `rel_col` -> (group, n_items, ndcg_at_k, mrr,
    precision_at_k). `tie_col` pins a total order (determinism)."""
    g = F.col(group_col)
    run = Window.partitionBy(g).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    ideal = Window.partitionBy(g).orderBy(
        F.col(rel_col).desc(), F.col(tie_col).asc()
    )
    rel = F.col(rel_col).cast("double")
    gain = F.pow(F.lit(2.0), rel) - F.lit(1.0)
    pos = F.row_number().over(run)
    ipos = F.row_number().over(ideal)
    scored = df.select(
        g.alias("group"),
        rel.alias("__rel"),
        gain.alias("__gain"),
        pos.alias("__pos"),
        ipos.alias("__ipos"),
    )
    agg = scored.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.when(
                F.col("__pos") <= k,
                F.col("__gain") / F.log2(F.col("__pos") + F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("__dcg"),
        F.sum(
            F.when(
                F.col("__ipos") <= k,
                F.col("__gain") / F.log2(F.col("__ipos") + F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("__idcg"),
        F.min(
            F.when(F.col("__rel") > 0, F.col("__pos"))
        ).alias("__first_rel"),
        F.sum(
            F.when(
                (F.col("__pos") <= k) & (F.col("__rel") > 0), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("__hits"),
    )
    return agg.select(
        F.col("group").alias(group_col),
        "n_items",
        F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg_at_k"),
        F.when(
            F.col("__first_rel").isNotNull(),
            F.lit(1.0) / F.col("__first_rel"),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        (F.col("__hits") / F.lit(float(k))).alias("precision_at_k"),
    )
