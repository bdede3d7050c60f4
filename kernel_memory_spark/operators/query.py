"""Query layer: tag filtering, vector KNN, list, rerank, paginate.

Re-expresses the reference's retrieval semantics:

- MemoryFilter evaluation (SimpleVectorDb.TagsMatchFilters,
  archived/km-v1/service/Core/MemoryStorage/DevTools/SimpleVectorDb.cs:207-230):
  a filter is a set of (key, value) conditions AND-ed together; a list of
  filters is OR-ed; empty filters are ignored (:159). Compiled to one boolean
  Column so Catalyst pushes it into the scan.
- Vector KNN top-k (SimpleVectorDb.GetSimilarListAsync :96-144): cosine vs
  the tag-filtered set, min-relevance cut, ORDER BY score DESC LIMIT k.
  Vectors are L2-normalized at write time so the score is a dot product
  (SqliteVectorIndex.cs:143-147) — computed JVM-side with zip_with/aggregate,
  no Python.
- GetList (tag scan, SearchClient.cs:93-94), pagination
  (Skip/Take, src/Core/Search/SearchService.cs:83-87).
- WeightedDiminishingReranker (src/Core/Search/Reranking/
  WeightedDiminishingReranker.cs:83-128): per record, appearance scores
  sorted desc contribute score*2^-i, capped at 1.0; order by relevance desc
  then recency.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MemoryFilter = Dict[str, List[str]]  # key -> values; pairs AND-ed


def filter_to_column(filters: Optional[Sequence[MemoryFilter]]) -> Column:
    """Compile [filter, ...] (OR) of {key: [v, ...]} (AND) over a
    tags map<string,array<string>> column."""
    live = [f for f in (filters or []) if f]  # F5: drop empty filters
    if not live:
        return F.lit(True)
    ors: Optional[Column] = None
    for flt in live:
        ands: Optional[Column] = None
        for key, values in flt.items():
            for v in values:
                cond = F.array_contains(F.col("tags").getItem(key), v)
                cond = F.coalesce(cond, F.lit(False))
                ands = cond if ands is None else (ands & cond)
        ors = ands if ors is None else (ors | ands)
    return F.coalesce(ors, F.lit(False))


def get_list(
    records: DataFrame,
    filters: Optional[Sequence[MemoryFilter]] = None,
    limit: int = -1,
    with_vectors: bool = False,
) -> DataFrame:
    """Tag-scan listing (IMemoryDb.GetListAsync). limit<=0 => unbounded
    (SimpleVectorDb.cs:151-156). withEmbeddings=false prunes the vector
    column before the scan (IMemoryDb.cs:62)."""
    out = records.filter(filter_to_column(filters))
    if not with_vectors:
        out = out.drop("vector")
    if limit and limit > 0:
        out = out.limit(limit)
    return out


def dot_product(a: Column, b: Column) -> Column:
    """JVM-side dot product over array<float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_top_k(
    records: DataFrame,
    query_vector: List[float],
    k: int = 10,
    min_relevance: float = 0.0,
    filters: Optional[Sequence[MemoryFilter]] = None,
) -> DataFrame:
    """Brute-force cosine top-k over the (tag-filtered) record set.

    Records store unit vectors, so score = dot(record, unit(query)).
    At 100TB this is a single narrow scan + TakeOrderedAndProject (no
    shuffle of the full set — Spark's LIMIT-by-sort keeps k rows per
    partition then merges k*partitions rows on the driver side of the
    exchange).
    """
    import math

    qnorm = math.sqrt(sum(v * v for v in query_vector)) or 1.0
    q = F.array(*[F.lit(float(v / qnorm)) for v in query_vector])
    scored = records.filter(filter_to_column(filters)).withColumn(
        "score", dot_product(F.col("vector"), q)
    )
    scored = scored.filter(F.col("score") >= min_relevance)  # F2
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k if k > 0 else (1 << 31) - 1)


def paginate(df: DataFrame, order_by: Sequence[Column], offset: int, limit: int) -> DataFrame:
    """Skip(offset).Take(limit) (T4, SearchService.cs:83-87).

    orderBy().limit(offset+limit) first: that executes as
    TakeOrderedAndProject (a per-partition k-row heap, then a k*partitions
    merge) instead of funneling the whole table through one window task.
    The row_number window then runs over at most offset+limit survivors —
    a single tiny partition by construction, not a scale concern."""
    head = df.orderBy(*order_by).limit(offset + limit)
    w = Window.orderBy(*order_by)
    return (
        head.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > offset)
        .drop("__rn")
    )


def rerank_diminishing(
    appearances: DataFrame,
    index_weights: Optional[DataFrame] = None,
    node_weights: Optional[DataFrame] = None,
    record_col: str = "record_id",
    score_col: str = "score",
) -> DataFrame:
    """WeightedDiminishingReranker (:83-128): group appearances of the same
    record, sort scores desc, relevance = min(1.0, sum(score_i * 2^-i)).

    Weights (A2): weighted = score * index_weight * node_weight (default 1.0),
    applied via broadcast joins before the merge.
    One hash aggregation; the diminishing sum is a JVM higher-order function
    over the collected (small, top-k-bounded) score list.
    """
    df = appearances
    if index_weights is not None:
        df = df.join(F.broadcast(index_weights), "index", "left").withColumn(
            score_col, F.col(score_col) * F.coalesce("index_weight", F.lit(1.0))
        ).drop("index_weight")
    if node_weights is not None:
        df = df.join(F.broadcast(node_weights), "node", "left").withColumn(
            score_col, F.col(score_col) * F.coalesce("node_weight", F.lit(1.0))
        ).drop("node_weight")

    scores_desc = F.reverse(F.array_sort(F.collect_list(F.col(score_col))))
    relevance = F.least(
        F.lit(1.0),
        F.aggregate(
            F.zip_with(
                scores_desc,
                F.sequence(F.lit(0), F.size(scores_desc) - 1),
                lambda s, i: s * F.pow(F.lit(0.5), i.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    out = df.groupBy(record_col).agg(
        relevance.alias("relevance"),
        F.max("created_at").alias("created_at")
        if "created_at" in df.columns
        else F.lit(None).cast("timestamp").alias("created_at"),
    )
    # T3: relevance desc, recency tiebreak
    return out.orderBy(F.desc("relevance"), F.desc("created_at"))
