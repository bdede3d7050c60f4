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
    pairs, marg, n_baskets = cooccur_counts(
        df, basket_col, item_col, max_basket
    )
    return _pmi_join(
        pairs.filter(F.col("n_pairs") >= min_pairs), marg, n_baskets
    )


def _pmi_join(pairs: DataFrame, marg: DataFrame, n_baskets: int) -> DataFrame:
    """pmi = ln(n_ab * N / (n_a * n_b)) via two keyed marginal joins."""
    return (
        pairs.join(marg.select(F.col("item").alias("src"),
                               F.col("n").alias("__na")), "src")
        .join(marg.select(F.col("item").alias("dst"),
                          F.col("n").alias("__nb")), "dst")
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


def cooccur_counts(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: Optional[int] = None,
):
    """Raw co-occurrence statistics of a basket set -> (pairs, marginals,
    n_baskets): pair counts (src < dst), per-item basket counts, total
    basket count. All three are ADDITIVE across disjoint basket sets —
    the property the incremental index below exploits."""
    items = _basket_items(df, basket_col, item_col, max_basket)
    n_baskets = items.select("__b").distinct().count()
    marg = items.groupBy(F.col("__i").alias("item")).agg(
        F.count("*").alias("n")
    )
    a = items.select(F.col("__b"), F.col("__i").alias("src"))
    b = items.select(F.col("__b"), F.col("__i").alias("dst"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_pairs"))
    )
    return pairs, marg, n_baskets


def _basket_items(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: Optional[int],
) -> DataFrame:
    """Distinct (basket, item) pairs with the mega-basket guard applied
    -> columns (__b, __i)."""
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
    return items


def upsert_cooccur_index(
    spark,
    catalog,
    name: str,
    batch: DataFrame,
    basket_col: str,
    item_col: str,
    n_buckets: int = 16,
    max_basket: Optional[int] = None,
    replace: bool = False,
) -> None:
    """Incremental co-occurrence index maintenance: fold a batch of
    baskets into persisted count tables without ever re-scanning the old
    corpus (the additive-aggregate analog of the ANN/FTS index upserts in
    similarity.py / search_text.py).

    Tables: `{name}__pairs` (src,dst,n_pairs; bucketed by src),
    `{name}__marg` (item,n; bucketed by item), `{name}__stats`
    (one n_baskets row). The batch's deltas are combined with the CURRENT
    rows of only the touched buckets (read_buckets manifest pruning), then
    merge_bucketed replaces those buckets — I/O is O(touched), compute is
    O(batch).

    Contract: baskets are ATOMIC per batch (a basket's items never split
    across batches — true for document-granular ingestion).

    Re-delivery: with replace=False a re-delivered basket double-counts
    (append-only contract). With replace=True the batch's baskets REPLACE
    their previous contribution — prior items of exactly those baskets
    are read back from the `{name}__baskets` sidecar (bucket-pruned on
    basket id), their counts folded NEGATIVELY, then the new counts
    folded; compute is O(batch + prior rows of re-delivered baskets),
    I/O still O(touched buckets). Counts that reach zero persist as
    tombstone rows invisible to pmi_from_index (min_pairs >= 1) until
    the bucket's next compaction. The sidecar is maintained on every
    upsert, so replace works regardless of how earlier batches were
    flagged.
    """
    items_new = _basket_items(batch, basket_col, item_col, max_basket)
    pairs, marg, n_new = cooccur_counts(items_new, "__b", "__i")
    p_name, m_name, s_name, b_name = (
        f"{name}__pairs", f"{name}__marg", f"{name}__stats",
        f"{name}__baskets",
    )

    n_replaced = 0
    if replace and catalog.exists(b_name):
        batch_baskets = items_new.select("__b").distinct()
        wanted = {
            r["bk"]
            for r in batch_baskets.select(
                catalog._bucket_expr("__b", n_buckets).alias("bk")
            )
            .distinct()
            .collect()
        }
        old_items = catalog.read_buckets(spark, b_name, wanted).join(
            batch_baskets, "__b", "left_semi"
        )
        old_pairs, old_marg, n_replaced = cooccur_counts(
            old_items, "__b", "__i"
        )
        pairs = pairs.unionByName(
            old_pairs.select("src", "dst", (-F.col("n_pairs")).alias("n_pairs"))
        )
        marg = marg.unionByName(
            old_marg.select("item", (-F.col("n")).alias("n"))
        )

    def _fold(delta, tname, keys, bucket_key, sum_col):
        if catalog.exists(tname):
            wanted = (
                delta.select(
                    catalog._bucket_expr(bucket_key, n_buckets).alias("b")
                )
                .distinct()
            )
            bucket_ids = {r["b"] for r in wanted.collect()}
            old = catalog.read_buckets(spark, tname, bucket_ids).select(
                *keys, sum_col
            )
            delta = delta.unionByName(old)
        combined = delta.groupBy(*keys).agg(F.sum(sum_col).alias(sum_col))
        catalog.merge_bucketed(
            spark, tname, combined, list(keys), bucket_key,
            n_buckets=n_buckets,
        )

    _fold(pairs, p_name, ["src", "dst"], "src", "n_pairs")
    _fold(marg, m_name, ["item"], "item", "n")
    catalog.merge_bucketed(
        spark, b_name, items_new, ["__b", "__i"], "__b",
        n_buckets=n_buckets, anti_cols=["__b"],
    )
    prev = 0
    if catalog.exists(s_name):
        prev = catalog.read(spark, s_name).collect()[0]["n_baskets"]
    catalog.overwrite(
        spark.createDataFrame(
            [(int(prev) + int(n_new) - int(n_replaced),)], "n_baskets long"
        ),
        s_name,
    )


def compact_cooccur_index(
    spark, catalog, name: str, threshold: int = 8
) -> list:
    """Small-file + tombstone maintenance for the incremental index: each
    upsert leaves <=2 manifest entries per touched bucket, and replace-mode
    folds leave zero-count tombstone rows. Once a component table has
    absorbed more than `threshold` merges since its last compaction (or
    piled up appended entries past the same bound), run a MAJOR fold —
    every bucket to one file, net-zero rows dropped while rewriting (safe:
    a zero row contributes nothing to any later fold's sum, and
    pmi_from_index never sees it anyway). The major pass is O(table) per
    trigger, amortized over `threshold` upserts; the baskets sidecar only
    needs the cheap multi-entry fold. Returns the tables compacted."""
    done = []
    for tname, zero_filter, fold_to in (
        (f"{name}__pairs", F.col("n_pairs") != 0, 0),
        (f"{name}__marg", F.col("n") != 0, 0),
        (f"{name}__baskets", None, 1),
    ):
        if catalog.auto_compact(spark, tname, threshold, zero_filter,
                                max_entries_per_bucket=fold_to):
            done.append(tname)
    return done


def pmi_from_index(
    spark, catalog, name: str, min_pairs: int = 1
) -> DataFrame:
    """PMI edges from the PERSISTED count tables (no corpus scan):
    identical output to pmi_edges over the union of all upserted batches
    (given the basket-atomicity contract)."""
    pairs = catalog.read(spark, f"{name}__pairs").filter(
        F.col("n_pairs") >= min_pairs
    )
    marg = catalog.read(spark, f"{name}__marg")
    n_baskets = catalog.read(spark, f"{name}__stats").collect()[0][
        "n_baskets"
    ]
    return _pmi_join(pairs, marg, n_baskets)


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: Optional[int] = None,
) -> DataFrame:
    """Directed association rules A -> B over a basket set (Agrawal &
    Srikant 1994, pair rules) -> (antecedent, consequent, n_both,
    support, confidence, lift).

    support     = n_ab / N          (fraction of baskets with both)
    confidence  = n_ab / n_a        (P(B | A), set semantics per basket)
    lift        = confidence / (n_b / N) = n_ab * N / (n_a * n_b)

    Scale design: reuses `cooccur_counts` — the pair relation is a
    within-basket self-join bounded by basket size (with the same
    `max_basket` mega-basket guard as PMI), pair counts collapse
    map-side before the shuffle, marginals join back keyed on the item
    (|vocab| rows, not |pairs|), and N is one driver scalar. Both rule
    directions come from ONE unordered pair relation (unioned after the
    marginal joins), so the expensive join runs once. Pure column
    algebra — replayable in any SQL engine.

    Reference parity: the reference stops at unweighted tag co-mention
    links (src/Core/Graph edge assembly); rules with confidence/lift are
    the standard upgrade for `related-entity` suggestions at corpus
    scale.
    """
    pairs, marg, n_baskets = cooccur_counts(
        df, basket_col, item_col, max_basket
    )
    return _rules_join(
        pairs.filter(F.col("n_pairs") >= min_pair_count), marg, n_baskets
    )


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: Optional[int] = None,
) -> DataFrame:
    """Frequent 3-itemsets (i1 < i2 < i3, basket support >= min_support)
    -> (i1, i2, i3, support) — the size-3 level of Apriori (Agrawal &
    Srikant 1994) with the anti-monotone prune applied at every level.

    Why the prune is the 10^12-basket shape, not an optimization
    nicety: the naive three-way within-basket self-join fans out
    |basket|^3 per basket, but every subset of a frequent itemset is
    frequent — so items below min_support are dropped BEFORE the first
    join (F1), and only (a, b) occurrences matching a frequent pair
    (F2, a semi-join) extend to a third item. On heavy-tailed corpora
    this collapses the candidate space by orders of magnitude while
    provably never changing the answer (pruned candidates cannot reach
    min_support) — a property the test suite pins by running with the
    prune disabled. `max_basket` is the same mega-basket fan-out guard
    as pmi_edges."""
    items = _basket_items(df, basket_col, item_col, max_basket)
    # L1 prune: items themselves must be frequent
    f1 = (
        items.groupBy("__i")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_support)
        .select("__i")
    )
    it = items.join(f1, "__i").select("__b", "__i")
    # per-basket ordered pair occurrences among frequent items
    a = it.select("__b", F.col("__i").alias("i1"))
    b = it.select("__b", F.col("__i").alias("i2"))
    pair_occ = a.join(b, "__b").filter(F.col("i1") < F.col("i2"))
    # L2 prune: keep only occurrences of globally frequent pairs
    f2 = (
        pair_occ.groupBy("i1", "i2")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_support)
        .select("i1", "i2")
    )
    pruned = pair_occ.join(f2, ["i1", "i2"], "left_semi")
    c = it.select("__b", F.col("__i").alias("i3"))
    return (
        pruned.join(c, "__b")
        .filter(F.col("i2") < F.col("i3"))
        .groupBy("i1", "i2", "i3")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def rules_from_index(
    spark, catalog, name: str, min_pair_count: int = 2
) -> DataFrame:
    """Association rules served from the PERSISTED co-occurrence count
    tables (upsert_cooccur_index) — no corpus scan: identical output to
    association_rules over the union of all upserted batches (the same
    additive pair/marginal/basket contract pmi_from_index rides).
    The serving cost is O(index), the maintenance cost O(touched
    buckets) — build-once/probe-many, like the FTS and ANN indexes."""
    pairs = catalog.read(spark, f"{name}__pairs").filter(
        F.col("n_pairs") >= min_pair_count
    )
    marg = catalog.read(spark, f"{name}__marg")
    n_baskets = catalog.read(spark, f"{name}__stats").collect()[0][
        "n_baskets"
    ]
    return _rules_join(pairs, marg, n_baskets)


def _rules_join(pairs: DataFrame, marg: DataFrame, n_baskets: int) -> DataFrame:
    """Both rule directions from ONE unordered pair relation + keyed
    marginal joins: support = n_ab/N, confidence = n_ab/n_a,
    lift = n_ab*N/(n_a*n_b). Shared by association_rules (corpus scan)
    and rules_from_index (persisted counts)."""
    both = (
        pairs.join(marg.select(F.col("item").alias("src"),
                               F.col("n").alias("__na")), "src")
        .join(marg.select(F.col("item").alias("dst"),
                          F.col("n").alias("__nb")), "dst")
    )
    fwd = both.select(
        F.col("src").alias("antecedent"),
        F.col("dst").alias("consequent"),
        F.col("n_pairs").alias("n_both"),
        F.col("__na").alias("__n_ante"),
        F.col("__nb").alias("__n_cons"),
    )
    rev = both.select(
        F.col("dst").alias("antecedent"),
        F.col("src").alias("consequent"),
        F.col("n_pairs").alias("n_both"),
        F.col("__nb").alias("__n_ante"),
        F.col("__na").alias("__n_cons"),
    )
    n = float(n_baskets)
    return fwd.unionByName(rev).select(
        "antecedent",
        "consequent",
        "n_both",
        (F.col("n_both") / F.lit(n)).alias("support"),
        (F.col("n_both") / F.col("__n_ante")).alias("confidence"),
        (
            F.col("n_both").cast("double") * F.lit(n)
            / (F.col("__n_ante").cast("double") * F.col("__n_cons"))
        ).alias("lift"),
    )
