"""End-to-end composed search service.

Re-expresses the reference's two full search chains as single operators:

1. `search()` — KM2's SearchService.SearchAsync
   (src/Core/Search/SearchService.cs:43-106): parse query ->
   determine/validate nodes (:167-209) -> per-node FTS search
   (NodeSearchService.cs:68-126) -> weighted diminishing rerank
   (Reranking/WeightedDiminishingReranker.cs:26-128) -> min-relevance
   filter (SearchService.cs:79-81) -> offset/limit pagination (:83-87).

2. `search_memories()` — km-v1's SearchClient.SearchAsync
   (archived/km-v1/service/Core/Search/SearchClient.cs:69-115):
   vector/list retrieval -> ProcessMemoryRecord (:298-393) with
   duplicate-fact skip (:316-319) -> citations.

Spark shape (100TB notes):
- A "node" is a DataFrame (a shard/index of the corpus); per-node search
  is one pushed-down scan + the single-job BM25 of search_text.bm25_topk,
  capped at max_results_per_node via TakeOrderedAndProject — no full-set
  shuffle. Nodes union with unionByName (no barrier between node scans;
  Spark schedules them as independent stages of one job).
- The reference's FTS structural query + LINQ NOT-term post-filter
  (NodeSearchService.cs:119-122, 145-212) collapse into ONE boolean
  Column (plans/ast.compile_node) evaluated in the same scan: AND/OR/NOT
  structure, negated terms, and non-FTS comparisons are all enforced at
  the source instead of post-hoc. (The reference silently drops non-FTS
  comparisons outside NOT — NodeSearchService.cs:412-415 returns empty —
  which its own doc comment calls "handled by LINQ filtering"; this
  implementation enforces the documented intent.)
- BM25 relevance keeps the reference's normalization verbatim
  (SqliteFtsIndex.cs:199-205): SQLite's bm25() raw score is the NEGATED
  classic BM25 (more negative = better), normalized relevance =
  exp(raw / 10). Match-all queries (no positive terms) score 1.0
  (SqliteFtsIndex.cs:253).
- The rerank groups at most (n_nodes x max_results_per_node) appearances
  per query — a bounded hash aggregate, never O(corpus).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kernel_memory_spark.operators import citations as cit
from kernel_memory_spark.operators import query as qry
from kernel_memory_spark.operators import search_text as st
from kernel_memory_spark.plans import ast as A

# Constants.SearchDefaults (src/Core/Constants.cs:17-135)
DEFAULT_MIN_RELEVANCE = 0.3
DEFAULT_LIMIT = 20
DEFAULT_MAX_RESULTS_PER_NODE = 1000
DEFAULT_NODE_WEIGHT = 1.0
DEFAULT_INDEX_WEIGHT = 1.0
DEFAULT_FTS_INDEX_ID = "fts-main"
BM25_NORMALIZATION_DIVISOR = 10.0  # Constants.cs Bm25NormalizationDivisor
FTS_FIELDS = ("title", "description", "content")  # NodeSearchService.cs:417-426


class SearchError(ValueError):
    """SearchException analog (Search/Exceptions). error_type mirrors
    SearchErrorType: invalid_configuration | node_not_found."""

    def __init__(self, message: str, error_type: str, node_id: str | None = None):
        super().__init__(message)
        self.error_type = error_type
        self.node_id = node_id


@dataclass
class SearchRequest:
    """SearchRequest (Core/Search/Models) — the chain's inputs."""

    query: str = ""
    filters: Optional[Sequence[qry.MemoryFilter]] = None
    min_relevance: float = DEFAULT_MIN_RELEVANCE
    offset: int = 0
    limit: int = DEFAULT_LIMIT
    nodes: Sequence[str] = ()
    exclude_nodes: Sequence[str] = ()
    node_weights: Optional[Dict[str, float]] = None
    index_weights: Optional[Dict[str, Dict[str, float]]] = None
    max_results_per_node: int = DEFAULT_MAX_RESULTS_PER_NODE


# ---------------------------------------------------------------------------
# FtsQueryExtractor analog (NodeSearchService.cs:228-415): walk the AST
# collecting the POSITIVE text terms that drive BM25 scoring. Negative
# (NOT/NOR) subtrees contribute nothing here — compile_node enforces them
# as part of the boolean predicate, replacing the LINQ post-filter.
# ---------------------------------------------------------------------------

def collect_positive_terms(node: A.Node) -> List[str]:
    """Positive scoring terms: non-negated TextSearch terms plus eq/contains
    comparison values on FTS fields (title/description/content —
    NodeSearchService.cs:380-410). Phrases split into words (the DataFrame
    BM25 is bag-of-words; phrase exactness is enforced by the predicate's
    substring contains)."""
    out: List[str] = []

    def walk(n: A.Node) -> None:
        if isinstance(n, A.TextSearch):
            if not n.negated:
                out.extend(w for w in n.term.lower().split() if w)
        elif isinstance(n, A.Comparison):
            if n.op in ("eq", "contains") and n.field in FTS_FIELDS:
                out.extend(str(n.value).lower().split())
        elif isinstance(n, A.Logical):
            if n.op in ("not", "nor"):
                return  # NOT terms live in the predicate, not the scorer
            for c in n.children:
                walk(c)

    walk(node)
    # stable de-dup (FTS5 scores a repeated term once per posting anyway)
    seen = set()
    uniq = []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


def fts_normalize(node: A.Node, available: Optional[Sequence[str]] = None) -> A.Node:
    """Rewrite eq/contains comparisons on FTS fields into per-field text
    searches: "Equal on FTS fields uses FTS semantics (substring/stemming
    match), not exact equality" (NodeSearchService.cs:381-383). Applies
    inside NOT subtrees too — CollectNotTermsFromNode (:355-366) does the
    same for negative terms.

    `available` restricts every TextSearch's field list to columns that
    exist in the node DataFrame (a bare term defaults to all three FTS
    fields; a content-only schema must not fail column resolution)."""
    def fields_for(fields: Sequence[str]) -> tuple:
        if available is None:
            return tuple(fields)
        kept = tuple(f for f in fields if f in available)
        return kept or tuple(available)

    if isinstance(node, A.Comparison):
        if node.op in ("eq", "contains") and node.field in FTS_FIELDS:
            return A.TextSearch(
                str(node.value), fields=fields_for((node.field,))
            )
        return node
    if isinstance(node, A.TextSearch):
        return A.TextSearch(
            node.term, negated=node.negated, fields=fields_for(node.fields)
        )
    if isinstance(node, A.Logical):
        return A.Logical(
            node.op, [fts_normalize(c, available) for c in node.children]
        )
    return node


def _determine_nodes(
    available: Sequence[str], request: SearchRequest
) -> List[str]:
    """DetermineNodesToSearch + ValidateNodes (SearchService.cs:167-209)."""
    excluded = set(request.exclude_nodes)
    if request.nodes:
        chosen = [n for n in request.nodes if n not in excluded]
        if not chosen:
            raise SearchError(
                "No nodes to search after applying exclusions",
                "invalid_configuration",
            )
    else:
        chosen = [n for n in available if n not in excluded]
        if not chosen:
            raise SearchError(
                "No nodes to search - all nodes excluded",
                "invalid_configuration",
            )
    for n in chosen:
        if n not in available:
            raise SearchError(
                f"Node '{n}' not found in configuration",
                "node_not_found", n,
            )
    return chosen


def search_node(
    df: DataFrame,
    ast_node: Optional[A.Node],
    request: SearchRequest,
    node_id: str,
    index_id: str = DEFAULT_FTS_INDEX_ID,
    id_col: str = "id",
    text_col: str = "content",
    created_at_col: str = "created_at",
) -> DataFrame:
    """NodeSearchService.SearchAsync (:68-126) over one node DataFrame ->
    appearances (record_id, node, index, score, created_at).

    One scan: predicate (AST + memory filters) pushed to the source, BM25
    scored via the single-job search_text.bm25_topk, capped at
    max_results_per_node (TakeOrderedAndProject)."""
    pred = F.lit(True)
    if ast_node is not None:
        fts_avail = [c for c in FTS_FIELDS if c in df.columns] or [text_col]
        pred = A.compile_node(fts_normalize(ast_node, available=fts_avail))
    flt = qry.filter_to_column(request.filters) if request.filters else F.lit(True)
    matched = df.filter(pred & flt)

    terms = collect_positive_terms(ast_node) if ast_node is not None else []
    if terms:
        # FTS5 indexes title+description+content together
        # (SqliteFtsIndex.cs CREATE VIRTUAL TABLE): score over their
        # concatenation, falling back to text_col for schemas without them
        fts_present = [c for c in FTS_FIELDS if c in matched.columns]
        fts_text = (
            F.concat_ws(
                " ", *[F.coalesce(F.col(c), F.lit("")) for c in fts_present]
            )
            if fts_present
            else F.col(text_col)
        )
        # score ONLY the predicate-matched candidates, but with stats
        # (N, avgdl) and df(term) over the FULL node corpus — SQLite FTS5's
        # bm25() always normalizes with whole-index stats even when the
        # query is filtered (SqliteFtsIndex.cs:155-175); per-query this
        # re-tokenizes the corpus, which the persisted-index path
        # (query_fts_index) avoids by precomputing postings + stats
        scored = st.bm25_topk(
            df.withColumn("__fts_text", fts_text),
            terms, k=request.max_results_per_node,
            id_col=id_col, text_col="__fts_text",
            candidates=matched.select(F.col(id_col)),
        )
        # SqliteFtsIndex.cs:199-205: raw = sqlite bm25 = -classic_bm25;
        # relevance = exp(raw / divisor), rounded for cross-engine stability
        relevance = F.round(
            F.exp(-F.col("score") / BM25_NORMALIZATION_DIVISOR), 6
        )
        appearances = scored.select(
            F.col("doc").alias("record_id"), relevance.alias("score")
        )
    else:
        # match-all ("*"): every predicate-matched row at score 1.0
        # (SqliteFtsIndex.cs:227-259 GetAllDocumentsAsync)
        appearances = (
            matched.select(
                F.col(id_col).alias("record_id"), F.lit(1.0).alias("score")
            )
            .orderBy(F.asc("record_id"))
            .limit(request.max_results_per_node)
        )
    created = (
        df.select(
            F.col(id_col).alias("record_id"),
            F.col(created_at_col).cast("timestamp").alias("created_at"),
        )
        if created_at_col in df.columns
        else None
    )
    out = appearances.withColumns(
        {"node": F.lit(node_id), "index": F.lit(index_id)}
    )
    if created is not None:
        out = out.join(created, "record_id", "left")
    else:
        out = out.withColumn("created_at", F.lit(None).cast("timestamp"))
    return out.select("record_id", "node", "index", "score", "created_at")


def _weights_frame(
    spark: SparkSession, nodes: Sequence[str], request: SearchRequest
) -> DataFrame:
    """BuildRerankingConfig (SearchService.cs:214-266) as ONE broadcast
    frame of (node, index, weight = node_weight * index_weight)."""
    rows = []
    for n in nodes:
        nw = (request.node_weights or {}).get(n, DEFAULT_NODE_WEIGHT)
        per_index = dict((request.index_weights or {}).get(n, {}))
        per_index.setdefault(DEFAULT_FTS_INDEX_ID, DEFAULT_INDEX_WEIGHT)
        for idx, iw in per_index.items():
            rows.append((n, idx, float(nw) * float(iw)))
    return spark.createDataFrame(rows, "node string, index string, weight double")


def _search_filtered(
    spark: SparkSession,
    node_dfs: Dict[str, DataFrame],
    request: SearchRequest,
    **kwargs,
) -> DataFrame:
    """The chain up to (and including) the min-relevance filter: parse ->
    nodes -> per-node search -> apply weights -> diminishing rerank ->
    relevance >= minRelevance (SearchService.cs:43-81)."""
    ast_node = A.parse_query(request.query) if request.query.strip() else None
    nodes = _determine_nodes(list(node_dfs.keys()), request)
    per_node = [
        search_node(node_dfs[n], ast_node, request, n, **kwargs)
        for n in nodes
    ]
    return _fuse(spark, nodes, per_node, request)


def _fuse(
    spark: SparkSession,
    nodes: Sequence[str],
    per_node: Sequence[DataFrame],
    request: SearchRequest,
) -> DataFrame:
    """Union the per-node appearances, apply weights, diminishing-rerank,
    min-relevance filter (SearchService.cs:81-96 after the fan-out)."""
    appearances = per_node[0]
    for p in per_node[1:]:
        appearances = appearances.unionByName(p)

    # ApplyWeights (WeightedDiminishingReranker.cs:53-78): weighted =
    # base_relevance * index_weight * node_weight, via one broadcast join
    weights = _weights_frame(spark, nodes, request)
    weighted = (
        appearances.join(F.broadcast(weights), ["node", "index"], "left")
        .withColumn("score", F.col("score") * F.coalesce("weight", F.lit(1.0)))
        .drop("weight")
    )
    reranked = qry.rerank_diminishing(weighted, record_col="record_id")
    # stabilize float aggregation across engines before compare/order
    reranked = reranked.withColumn("relevance", F.round("relevance", 6))
    return reranked.filter(F.col("relevance") >= request.min_relevance)


def _result_order():
    # built lazily: Column construction needs an active SparkContext
    return [F.desc("relevance"), F.desc("created_at"), F.asc("record_id")]


def search(
    spark: SparkSession,
    node_dfs: Dict[str, DataFrame],
    request: SearchRequest,
    **kwargs,
) -> DataFrame:
    """SearchService.SearchAsync (:43-106), composed end-to-end. Returns
    the paginated result frame (record_id, relevance, created_at), ordered
    by relevance desc, created_at desc, record_id asc
    (WeightedDiminishingReranker.cs:45-49 with a deterministic id
    tiebreak). kwargs: id_col / text_col / created_at_col."""
    filtered = _search_filtered(spark, node_dfs, request, **kwargs)
    return qry.paginate(
        filtered, _result_order(), request.offset, request.limit
    )


def search_with_total(
    spark: SparkSession,
    node_dfs: Dict[str, DataFrame],
    request: SearchRequest,
    **kwargs,
) -> Tuple[DataFrame, DataFrame]:
    """(paginated results, 1-row total frame): SearchResponse.TotalResults
    is the filtered count BEFORE pagination (SearchService.cs:96)."""
    filtered = _search_filtered(spark, node_dfs, request, **kwargs)
    total = filtered.agg(F.count("*").alias("total_results"))
    return (
        qry.paginate(
            filtered, _result_order(), request.offset, request.limit
        ),
        total,
    )


def search_with_diagnostics(
    spark: SparkSession,
    node_dfs: Dict[str, DataFrame],
    request: SearchRequest,
    **kwargs,
) -> Tuple[DataFrame, DataFrame]:
    """SearchService.cs:167-192 (ExecuteSearchOnNodesAsync diagnostics):
    per-node elapsed time, appearance count, and FAILURE capture — a node
    whose frame errors is reported in the diagnostics row instead of
    sinking the whole fan-out, and the surviving nodes still produce
    results (the reference's partial-failure semantics).

    Returns (paginated results, diagnostics frame of
    (node, appearances, wall_ms, error)). Unlike search(), each node's
    appearances are materialized separately to time them — this is the
    observability path, not the hot path; search() keeps the single fused
    plan."""
    import time as _time

    ast_node = A.parse_query(request.query) if request.query.strip() else None
    nodes = _determine_nodes(list(node_dfs.keys()), request)
    diags, ok_nodes, ok_frames = [], [], []
    for n in nodes:
        t0 = _time.time()
        try:
            app = search_node(
                node_dfs[n], ast_node, request, n, **kwargs
            ).localCheckpoint()  # executes + pins this node's appearances
            cnt = app.count()
            ok_nodes.append(n)
            ok_frames.append(app)
            diags.append((n, cnt, int((_time.time() - t0) * 1000), None))
        except Exception as e:  # partial failure: report, keep going
            diags.append((
                n, 0, int((_time.time() - t0) * 1000),
                f"{type(e).__name__}: {e}"[:500],
            ))
    diag_df = spark.createDataFrame(
        diags, "node string, appearances long, wall_ms long, error string"
    )
    if not ok_frames:
        # every node failed: empty result frame with the search schema
        empty = spark.createDataFrame(
            [], "record_id string, relevance double, created_at timestamp"
        )
        return empty, diag_df
    fused = _fuse(spark, ok_nodes, ok_frames, request)
    return (
        qry.paginate(fused, _result_order(), request.offset, request.limit),
        diag_df,
    )


def hybrid_search(
    records: DataFrame,
    query_text: str,
    query_vector: List[float],
    k: int = 10,
    min_relevance: float = 0.0,
    filters: Optional[Sequence[qry.MemoryFilter]] = None,
    w_fts: float = 1.0,
    w_vec: float = 1.0,
    max_results_per_index: int = DEFAULT_MAX_RESULTS_PER_NODE,
    id_col: str = "id",
    text_col: str = "payload.text",
) -> DataFrame:
    """Hybrid retrieval: BM25 full-text + vector cosine fused by the
    weighted diminishing rerank — the exact shape the reranker was built
    for ("same record from multiple indexes", WeightedDiminishingReranker
    .cs:9-17): each record's appearances are its FTS relevance (exp(raw/10)
    normalization, SqliteFtsIndex.cs:199-205) and its cosine score, each
    scaled by its index weight, merged as s1*1.0 + s2*0.5 capped at 1.0.

    One scan per index path, both JVM-side; the merge is a bounded hash
    aggregate over <= 2*max_results_per_index appearances. Returns
    (record_id, relevance) top-k, relevance desc / id asc."""
    flt = qry.filter_to_column(filters) if filters else F.lit(True)
    base = records.filter(flt)

    terms = [w for w in query_text.lower().split() if w]
    fts = st.bm25_topk(
        base.withColumn("__fts_text", F.col(text_col)),
        terms, k=max_results_per_index, id_col=id_col, text_col="__fts_text",
    ).select(
        F.col("doc").alias("record_id"),
        F.round(
            F.exp(-F.col("score") / BM25_NORMALIZATION_DIVISOR), 6
        ).alias("score"),
        F.lit("fts-main").alias("index"),
    )
    vec = qry.knn_top_k(
        base, query_vector, k=max_results_per_index, min_relevance=-1e9,
    ).select(
        F.col(id_col).alias("record_id"),
        F.round("score", 6).alias("score"),
        F.lit("vector-main").alias("index"),
    )
    appearances = fts.unionByName(vec).withColumn(
        "score",
        F.col("score")
        * F.when(F.col("index") == "fts-main", w_fts).otherwise(w_vec),
    )
    merged = qry.rerank_diminishing(appearances, record_col="record_id")
    merged = merged.withColumn("relevance", F.round("relevance", 6))
    return (
        merged.filter(F.col("relevance") >= min_relevance)
        .select("record_id", "relevance")
        .orderBy(F.desc("relevance"), F.asc("record_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# km-v1 SearchClient.SearchAsync (SearchClient.cs:69-115): memory-record
# retrieval -> ProcessMemoryRecord -> citations
# ---------------------------------------------------------------------------

def search_memories(
    records: DataFrame,
    query_vector: Optional[List[float]] = None,
    filters: Optional[Sequence[qry.MemoryFilter]] = None,
    min_relevance: float = 0.0,
    limit: int = 10,
    index: str = "default",
) -> DataFrame:
    """SearchClient.SearchAsync composed over the RECORDS table:

    - vector given: GetSimilarListAsync == cosine KNN with filters +
      min-relevance (SearchClient.cs:93-95);
    - no vector: GetListAsync == tag-filtered listing at relevance
      double.MinValue -> surfaced as 0.0 (SearchClient.cs:93);
    - ProcessMemoryRecord: duplicate-fact skip — identical partition text
      keeps only its best-relevance record (F8, SearchClient.cs:316-319);
    - result-count stop: `limit` matches (T5, MaxMatchesCount);
    - citations built per (index, document, file) link
      (SearchClient.cs:298-393 via operators/citations.build_citations).

    Returns the citations frame (link, index, document_id, file_id, ...,
    partitions array)."""
    if query_vector is not None:
        matches = qry.knn_top_k(
            records, query_vector, k=limit,
            min_relevance=min_relevance, filters=filters,
        ).withColumnRenamed("score", "relevance")
    else:
        matches = qry.get_list(
            records, filters=filters, limit=limit, with_vectors=False
        ).withColumn("relevance", F.lit(0.0))
    deduped = (
        st.dedupe_facts(
            matches.withColumn("score", F.col("relevance")),
            text_col="payload.text",
        ).drop("score")
    )
    return cit.build_citations(deduped, index=index)


def rrf_fuse(
    ranked_lists: Sequence[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "record_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) ->
    (record_id, rrf_score, n_lists) top-k: each input ranking
    contributes 1 / (rrf_k + rank) per record and contributions sum.

    RRF is the standard score-free fusion — it needs NO cross-index
    score calibration (BM25 raw scores and cosine live on different
    scales; the weighted-diminishing merge above must normalize them,
    RRF only consumes ranks), which is why it wins when fusing engines
    you don't control. rrf_k=60 is the paper's constant.

    Each list is ranked by (score desc, id asc) — the deterministic
    total order the rest of the search stack pins — with ONE window per
    list over its own <= max_results rows, then a bounded hash
    aggregate; the final top-k is a TakeOrdered, never a full sort."""
    ranked = []
    for i, df in enumerate(ranked_lists):
        w = Window.orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        ranked.append(
            df.select(
                F.col(id_col).alias("record_id"),
                F.row_number().over(w).alias("__rank"),
            ).select(
                "record_id",
                (
                    F.lit(1.0)
                    / (F.lit(float(rrf_k)) + F.col("__rank"))
                ).alias("__contrib"),
            )
        )
    allc = ranked[0]
    for r in ranked[1:]:
        allc = allc.unionByName(r)
    fused = allc.groupBy("record_id").agg(
        F.round(F.sum("__contrib"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("record_id"))
        .limit(k)
    )
