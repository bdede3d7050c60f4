"""Co-occurrence statistics → PMI-weighted KG edges.

The reference stores tag/entity co-mentions as unweighted links
(src/Core/Graph edge assembly; tag pairs from SaveRecords payloads). For a
KG built from 10^12 documents an unweighted co-mention edge set is mostly
noise — the standard fix (Church & Hanks 1990) is to weight each pair by
pointwise mutual information, pmi(a,b) = log(P(a,b) / (P(a)P(b))), so
edges that co-occur more than chance survive and incidental pairs sink.

Scale design:

* The pair relation is built by a self-join WITHIN a basket (document /
  order / span group), so the fan-out per basket is bounded by basket
  size squared — linear in the input for bounded baskets, and the
  `max_basket` guard drops pathological mega-baskets (a boilerplate page
  mentioning 10^4 entities would alone emit 10^8 pairs) BEFORE the join,
  the same containment idea as linking.py's hot-bucket cap.
* Marginal counts (n_a) and the basket total N are separate small
  aggregates; N reaches the driver as one scalar and marginals join back
  keyed (shuffle-join on the item key — map-side combine has already
  collapsed them to one row per item, so the join input is |vocab|, not
  |pairs|).
* Everything is pure column algebra — deterministic, layout-independent,
  DuckDB-replayable (the entry `pmi_copurchase_edges` mirrors it).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_edges(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 1,
    max_basket: Optional[int] = None,
) -> DataFrame:
    """PMI-weighted undirected co-occurrence edges -> (src, dst, n_pairs,
    pmi) with src < dst.

    P(a) = baskets containing a / N; P(a,b) = baskets containing both / N
    (set semantics: duplicates of an item inside one basket count once).
    pmi = ln(n_ab * N / (n_a * n_b)). `min_pairs` prunes the long tail of
    single-co-occurrence pairs before the marginal join; `max_basket`
    drops baskets with more distinct items than the bound (fan-out guard).
    """
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        sizes = items.groupBy("__b").agg(F.count("*").alias("__sz"))
        items = (
            items.join(sizes, "__b")
            .filter(F.col("__sz") <= max_basket)
            .drop("__sz")
        )
    n_baskets = items.select("__b").distinct().count()
    marg = items.groupBy("__i").agg(F.count("*").alias("__n"))

    a = items.select(F.col("__b"), F.col("__i").alias("src"))
    b = items.select(F.col("__b"), F.col("__i").alias("dst"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_pairs)
    )
    return (
        pairs.join(marg.select(F.col("__i").alias("src"),
                               F.col("__n").alias("__na")), "src")
        .join(marg.select(F.col("__i").alias("dst"),
                          F.col("__n").alias("__nb")), "dst")
        .select(
            "src",
            "dst",
            "n_pairs",
            F.log(
                F.col("n_pairs").cast("double")
                * F.lit(float(n_baskets))
                / (F.col("__na").cast("double") * F.col("__nb"))
            ).alias("pmi"),
        )
    )
