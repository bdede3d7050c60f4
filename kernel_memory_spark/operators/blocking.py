"""Meta-blocking for entity resolution: block purging + common-block
weighting + per-entity candidate pruning.

Blocking (group by cheap keys, compare only within blocks) is how ER
avoids the O(n^2) comparison matrix; META-blocking (Papadakis et al. 2014)
then treats the block collection itself as a graph and prunes it: huge
blocks are purged (a stopword block of 10^7 entities contributes 10^13
comparisons and almost no signal), surviving candidate pairs are weighted
by how many blocks they co-occur in (CBS — common-blocks scheme), and weak
pairs are dropped globally or per-entity.

This complements the LSH pipeline in operators/linking.py: LSH needs a
metric space; meta-blocking works on ANY key generator (tokens, prefixes,
phonetic codes) and is the standard recipe for dirty/heterogeneous KG
merges.

Scale shape: one size-aggregate + one semi-join (purge), one self-join
per block (bounded by the purge cap, so worst case is
n_blocks * cap^2 / 2 — a tunable, not a tail risk), one pair aggregate
(CBS weight), and a keyed window for top-k. No Python, no collect.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def meta_block(
    assignments: DataFrame,
    entity: str = "entity",
    block: str = "block",
    max_block_size: int = 100,
    min_common_blocks: int = 1,
    top_k: Optional[int] = None,
) -> DataFrame:
    """(entity, block) assignments -> candidate pairs (a, b,
    n_common_blocks) with a < b.

    Steps: (1) block purging — blocks larger than `max_block_size`
    entities are dropped whole; (2) pair generation within surviving
    blocks; (3) CBS weighting — pairs below `min_common_blocks` are
    dropped; (4) optional cardinality node pruning — keep a pair iff it
    ranks in the top_k strongest of EITHER endpoint (Papadakis' node-
    centric pruning keeps locally-strong edges a global threshold would
    lose)."""
    a = assignments.select(
        F.col(entity).alias("e"), F.col(block).alias("b")
    ).distinct()
    sizes = a.groupBy("b").agg(F.count("*").alias("__n"))
    kept = a.join(
        sizes.filter(F.col("__n") <= max_block_size).select("b"), "b"
    )
    pairs = (
        kept.select("b", F.col("e").alias("ea"))
        .join(kept.select("b", F.col("e").alias("eb")), "b")
        .filter(F.col("ea") < F.col("eb"))
        .groupBy(F.col("ea").alias("a"), F.col("eb").alias("b"))
        .agg(F.count("*").alias("n_common_blocks"))
        .filter(F.col("n_common_blocks") >= min_common_blocks)
    )
    if top_k is None:
        return pairs
    wa = Window.partitionBy("a").orderBy(
        F.desc("n_common_blocks"), F.asc("b")
    )
    wb = Window.partitionBy("b").orderBy(
        F.desc("n_common_blocks"), F.asc("a")
    )
    return (
        pairs.withColumn("__ra", F.row_number().over(wa))
        .withColumn("__rb", F.row_number().over(wb))
        .filter((F.col("__ra") <= top_k) | (F.col("__rb") <= top_k))
        .select("a", "b", "n_common_blocks")
    )


def blocking_quality(
    candidates: DataFrame,
    truth: DataFrame,
    entities: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Standard blocking evaluation -> ONE row (n_candidates, n_true,
    n_covered, pairs_completeness, reduction_ratio).

    pairs_completeness = |candidates ∩ truth| / |truth| (recall of the
    comparison set); reduction_ratio = 1 - |candidates| / C(n, 2) (how
    much of the quadratic matrix was avoided) — the two axes every
    blocking paper reports (Christen 2012). Both inputs are canonical
    a < b pair sets; `entities` is the entity relation whose count sets
    the denominator.

    Plan: three 1-row aggregates (candidate count, truth count + covered
    count via a semi-join, entity count) cross-joined into the metrics
    row — the crosses are broadcast nested loops against single-row
    relations, never a shuffle."""
    cand = candidates.select(F.col(a).alias("a"), F.col(b).alias("b"))
    tr = truth.select(F.col(a).alias("a"), F.col(b).alias("b"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_true = tr.agg(F.count("*").alias("n_true"))
    n_cov = tr.join(cand, ["a", "b"], "semi").agg(
        F.count("*").alias("n_covered")
    )
    n_ent = entities.agg(F.count("*").alias("__n"))
    return (
        n_cand.crossJoin(n_true)
        .crossJoin(n_cov)
        .crossJoin(n_ent)
        .select(
            "n_candidates",
            "n_true",
            "n_covered",
            F.round(
                F.when(F.col("n_true") > 0,
                       F.col("n_covered") / F.col("n_true"))
                .otherwise(F.lit(1.0)), 6
            ).alias("pairs_completeness"),
            F.round(
                F.lit(1.0)
                - F.col("n_candidates")
                / (F.col("__n") * (F.col("__n") - 1) / 2.0),
                6,
            ).alias("reduction_ratio"),
        )
    )


def sorted_neighborhood(
    records: DataFrame,
    entity: str,
    sort_key,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernandez & Stolfo 1995):
    order entities by a blocking key, compare each with its `window - 1`
    successors -> (a, b, rank_dist). The classic complement to hash
    blocking — catches near-duplicates whose keys HASH apart but SORT
    together (typos, prefix variants), with work exactly O(n * window).

    `sort_key` is a Column; ties are broken by the entity id so the
    total order (and therefore the candidate set) is deterministic and
    layout-independent.

    Scale shape: the global rank comes from the range-partition +
    local-window prefix sum (operators/packing.global_cumsum — NO
    single-task global window), then each row probes its own and the
    next rank bucket of size `window`; since successors within `window`
    live in at most those two buckets, the self-join input is 2 rows per
    entity, never the quadratic matrix."""
    if window < 2:
        raise ValueError("window must be >= 2")
    from kernel_memory_spark.operators.packing import global_cumsum

    keyed = records.select(
        F.col(entity).alias("e"),
        F.concat(
            sort_key.cast("string"), F.lit("|"),
            F.col(entity).cast("string"),
        ).alias("__sk"),
        F.lit(1).alias("__one"),
    )
    ranked = global_cumsum(keyed, "__sk", "__one", out_col="__rank")
    ranked = ranked.select("e", F.col("__rank").cast("long").alias("r"))
    w = int(window)
    left = ranked.select(
        F.col("e").alias("a"),
        F.col("r").alias("ra"),
        F.explode(
            F.array(
                (F.col("r") / w).cast("long"),
                (F.col("r") / w).cast("long") + 1,
            )
        ).alias("__bkt"),
    )
    right = ranked.select(
        F.col("e").alias("b"),
        F.col("r").alias("rb"),
        (F.col("r") / w).cast("long").alias("__bkt"),
    )
    return (
        left.join(right, "__bkt")
        .filter(
            (F.col("rb") > F.col("ra"))
            & (F.col("rb") - F.col("ra") < w)
        )
        .select("a", "b", (F.col("rb") - F.col("ra")).alias("rank_dist"))
    )


def bcubed(
    assignments: DataFrame,
    id_col: str = "id",
    pred: str = "pred",
    truth: str = "truth",
) -> DataFrame:
    """B-cubed cluster evaluation -> ONE row (n, bcubed_precision,
    bcubed_recall, bcubed_f1): the element-weighted cluster metric that
    (unlike pairwise P/R) stays meaningful when cluster sizes are skewed
    (Bagga & Baldwin 1998; the standard ER/coreference report alongside
    pairs completeness).

    Closed-form aggregation instead of per-element loops: with
    n_pt = |pred cluster p ∩ truth cluster t|, the element-average
    precision is sum(n_pt^2 / n_p) / N and recall is sum(n_pt^2 / n_t)
    / N — so the whole metric is two hash aggregates (cluster sizes),
    one intersection aggregate on (pred, truth), two keyed joins and a
    1-row reduce. No element ever reaches the driver."""
    base = assignments.select(
        F.col(id_col).alias("id"),
        F.col(pred).alias("p"),
        F.col(truth).alias("t"),
    )
    n_pt = base.groupBy("p", "t").agg(
        F.count(F.lit(1)).cast("double").alias("n_pt")
    )
    n_p = base.groupBy("p").agg(
        F.count(F.lit(1)).cast("double").alias("n_p")
    )
    n_t = base.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("n_t")
    )
    sums = (
        n_pt.join(n_p, "p")
        .join(n_t, "t")
        .agg(
            F.sum("n_pt").cast("long").alias("n"),
            F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_p")).alias(
                "__sp"
            ),
            F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_t")).alias(
                "__sr"
            ),
        )
    )
    p_ = F.col("__sp") / F.col("n")
    r_ = F.col("__sr") / F.col("n")
    return sums.select(
        "n",
        F.round(p_, 6).alias("bcubed_precision"),
        F.round(r_, 6).alias("bcubed_recall"),
        F.round(2.0 * p_ * r_ / (p_ + r_), 6).alias("bcubed_f1"),
    )
