"""Full-text scoring: BM25 over a tokenized corpus (T2) and RAG-prompt
assembly helpers (A5 token budget, C12 fact template, F8 dupe-fact skip).

The reference delegates BM25 to SQLite FTS5 (src/Core/Search/
SqliteFtsIndex.cs:59-67, 155-175: porter/unicode61 tokens, bm25() score,
ORDER BY LIMIT). Here the inverted index is a DataFrame of (term, doc)
postings and BM25 is a closed-form column expression — one groupBy(term)
for document frequencies (broadcast back) and one groupBy(doc) for scores;
everything stays in whole-stage codegen.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def tokenize_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) postings + doc length (lowercased word tokens)."""
    words = F.split(
        F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]", " ")), r"\s+"
    )
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.size(words).alias("dl"),
        F.explode(words).alias("term"),
    ).filter(F.length("term") > 0)
    return toks.groupBy("doc", "dl", "term").agg(F.count("*").alias("tf"))


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame = None,
) -> DataFrame:
    """BM25 top-k docs for a bag of query terms.

    Corpus stats (N, avgdl) are a 1-row DataFrame cross-joined in — not
    df.count()/.first() driver actions — so the whole query is ONE job; at
    production scale the stats table is precomputed once at index-build time
    and reused across queries (the SQLite FTS5 analog keeps them in the
    index header).

    `candidates` (optional, a DataFrame whose first column holds ids)
    restricts which documents are SCORED, while stats (N, avgdl) and
    per-term document frequencies stay whole-corpus — matching SQLite FTS5
    bm25(), whose normalization always uses whole-index stats even when a
    WHERE clause narrows the result set (SqliteFtsIndex.cs:155-175). Used
    by search_node for predicate-filtered queries."""
    postings = tokenize_terms(df, id_col, text_col)
    stats = df.agg(F.count("*").cast("double").alias("n_docs")).crossJoin(
        postings.select("doc", "dl")
        .distinct()
        .agg(F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"))
    )

    q = postings.filter(F.col("term").isin(list(query_terms)))
    # df(term) over the WHOLE index, before any candidate restriction
    dfreq = q.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    if candidates is not None:
        ids = candidates.select(
            F.col(candidates.columns[0]).alias("doc")
        ).distinct()
        q = q.join(ids, "doc", "left_semi")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        q.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            idf
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(F.round(F.sum("w"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Persisted FTS index (SqliteFtsIndex.cs analog): the per-query bm25_topk
# above re-tokenizes the corpus per query — fine for one-shot jobs, wrong
# for a serving index at 100TB. Build the postings once at write time,
# hive-partitioned by a hash bucket of the term, so a query scans only the
# buckets its terms hash to (partition pruning at the file listing); corpus
# stats (N, avgdl) persist as a 1-row table, mirroring FTS5 keeping them in
# the index header. Query path: pruned scan + JVM column math, no
# tokenization, no Python.
# ---------------------------------------------------------------------------

FTS_TERM_BUCKETS = 64
FTS_DOC_BUCKETS = 64


def _term_bucket(col, n_buckets: int = FTS_TERM_BUCKETS):
    return F.pmod(F.crc32(col.cast("string")), F.lit(n_buckets)).cast("int")


def _crc_bucket(term: str, n_buckets: int = FTS_TERM_BUCKETS) -> int:
    """Driver-side twin of _term_bucket (zlib.crc32 == Spark crc32)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _doc_lengths(df: DataFrame, postings: DataFrame, id_col: str) -> DataFrame:
    """(doc, dl) for EVERY batch document — term-less docs get dl=0 so the
    sidecar can answer "was this doc ever indexed" (needed to maintain
    n_docs incrementally) while dl>0 rows alone feed avgdl, matching the
    build-time average over posting-bearing docs."""
    return (
        df.select(F.col(id_col).alias("doc")).dropDuplicates(["doc"])
        .join(postings.select("doc", "dl").distinct(), "doc", "left")
        .select("doc", F.coalesce(F.col("dl"), F.lit(0)).alias("dl"))
    )


# composable doc-length aggregates: (row count, posting-bearing count,
# total length) — stats maintenance is pure arithmetic on these, so an
# upsert/remove touches the header in O(batch), never O(index)
def _dl_aggs():
    # built lazily: Column construction needs an active session (Spark 4)
    return (
        F.count("*").alias("n"),
        F.count(F.when(F.col("dl") > 0, True)).alias("dl_docs"),
        F.sum(F.when(F.col("dl") > 0, F.col("dl")).otherwise(0))
        .alias("sum_dl"),
    )


def _write_fts_stats(catalog, spark, table: str) -> None:
    """Derive the 1-row stats header from the doc-length sidecar (full
    build / layout-migration path; incremental paths use _bump_fts_stats):
    n_docs = all indexed docs, avgdl = mean length of posting-bearing docs
    (the FTS5-header analog)."""
    row = catalog.read(spark, table + "__dl").agg(*_dl_aggs()).first()
    _commit_fts_stats(catalog, spark, table,
                      row["n"] or 0, row["dl_docs"] or 0, row["sum_dl"] or 0)


def _commit_fts_stats(catalog, spark, table: str,
                      n: int, dl_docs: int, sum_dl: int) -> None:
    avgdl = (float(sum_dl) / dl_docs) if dl_docs else 1.0
    stats = spark.createDataFrame(
        [(float(n), avgdl, float(sum_dl), float(dl_docs))],
        "n_docs double, avgdl double, sum_dl double, dl_docs double",
    )
    catalog.overwrite(stats, table + "__stats")


def _bump_fts_stats(catalog, spark, table: str, minus, plus) -> None:
    """Incremental header update: subtract the replaced/removed docs'
    contribution, add the batch's. Exact — counts and integer length sums
    compose associatively, and avgdl is re-derived as sum/count, so the
    result is bit-identical to a full recompute."""
    old = catalog.read(spark, table + "__stats").first()
    if "sum_dl" not in old.__fields__:
        # stats written by a pre-sidecar build: one-time full recompute
        return _write_fts_stats(catalog, spark, table)
    n = int(old["n_docs"]) - (minus["n"] or 0) + (plus["n"] or 0)
    dl_docs = (int(old["dl_docs"]) - (minus["dl_docs"] or 0)
               + (plus["dl_docs"] or 0))
    sum_dl = (int(old["sum_dl"]) - (minus["sum_dl"] or 0)
              + (plus["sum_dl"] or 0))
    _commit_fts_stats(catalog, spark, table, n, dl_docs, sum_dl)


def build_fts_index(
    spark,
    catalog,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "fts_index",
    n_buckets: int = FTS_TERM_BUCKETS,
) -> int:
    """Full build: postings table (doc, dl, term, tf, term_bucket)
    identity-partitioned by term-hash bucket (manifest-pruned probes), a
    doc-length sidecar `{table}__dl` hash-bucketed by doc (pruned
    replaced-doc lookups for incremental upserts), and the 1-row
    `{table}__stats` header."""
    postings = tokenize_terms(df, id_col, text_col).withColumn(
        "term_bucket", _term_bucket(F.col("term"), n_buckets)
    ).localCheckpoint()  # feeds both the postings write and the dl sidecar
    version = catalog.overwrite_partitioned(
        spark, table, postings, "term_bucket", n_buckets
    )
    catalog.drop(table + "__dl")
    catalog.merge_bucketed(
        spark, table + "__dl", _doc_lengths(df, postings, id_col),
        ["doc"], "doc", n_buckets=FTS_DOC_BUCKETS,
    )
    _write_fts_stats(catalog, spark, table)
    return version


def upsert_fts_index(
    spark,
    catalog,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "fts_index",
    n_buckets: int = FTS_TERM_BUCKETS,
) -> int:
    """Incremental index maintenance mirroring SqliteFtsIndex.IndexAsync
    (src/Core/Search/SqliteFtsIndex.cs:81-142): tokenize ONLY the batch,
    merge into touched term_bucket partitions, keep the stats header
    consistent. Re-delivered documents are replaced: their old postings
    (possibly in other term buckets) are located and dropped.

    Cost model at 100TB: tokenization is O(batch); the doc-length sidecar
    answers "any re-delivered docs?" with a bucket-pruned read of O(batch)
    buckets; pure-insert batches (the common ingest case) then skip the
    postings-wide key scan entirely and rewrite only the term buckets the
    batch's terms hash to. Only a batch containing UPDATED docs pays one
    column-pruned (doc, term_bucket) scan to find their old partitions."""
    if not catalog.exists(table):
        return build_fts_index(
            spark, catalog, df, id_col, text_col, table, n_buckets
        )
    batch = df.dropDuplicates([id_col])
    postings = tokenize_terms(batch, id_col, text_col).withColumn(
        "term_bucket", _term_bucket(F.col("term"), n_buckets)
    ).localCheckpoint()  # consumed by the merge AND the dl sidecar
    batch_dl = _doc_lengths(batch, postings, id_col).localCheckpoint()

    # bucket-pruned re-delivery lookup: old lengths of any batch docs
    # already in the index (reads only the O(batch) doc-hash buckets of the
    # sidecar, 2 thin columns)
    dl_bucket = catalog._bucket_expr("doc", FTS_DOC_BUCKETS)
    ids = batch_dl.select("doc")
    wanted = [
        r[0] for r in ids.select(dl_bucket.alias("b")).distinct().collect()
    ]
    replaced = (
        catalog.read_buckets(spark, table + "__dl", wanted)
        .join(ids, "doc", "left_semi")
        .agg(*_dl_aggs()).first()
    )
    version = catalog.merge_partitioned(
        spark, table, postings, ["doc"], "term_bucket", n_buckets,
        replaced_parts=None if replaced["n"] else set(),
    )
    catalog.merge_bucketed(
        spark, table + "__dl", batch_dl,
        ["doc"], "doc", n_buckets=FTS_DOC_BUCKETS,
    )
    fresh = batch_dl.agg(*_dl_aggs()).first()
    _bump_fts_stats(catalog, spark, table, minus=replaced, plus=fresh)
    return version


def remove_fts_index(
    spark,
    catalog,
    ids,
    table: str = "fts_index",
) -> int:
    """Per-content removal mirroring SqliteFtsIndex.RemoveAsync
    (SqliteFtsIndex.cs:265): drop the docs' postings rewriting only the
    term buckets that hold them, shrink the doc-length sidecar
    (bucket-pruned on doc), bump the stats header arithmetically."""
    import zlib

    ids = list(ids)
    wanted = sorted({
        zlib.crc32(str(i).encode("utf-8")) % FTS_DOC_BUCKETS for i in ids
    })
    removed = (
        catalog.read_buckets(spark, table + "__dl", wanted)
        .filter(F.col("doc").isin(ids))
        .agg(*_dl_aggs()).first()
    )
    version = catalog.delete_keys_partitioned(spark, table, "doc", ids)
    catalog.delete_keys(spark, table + "__dl", "doc", ids)
    _bump_fts_stats(catalog, spark, table, minus=removed,
                    plus={"n": 0, "dl_docs": 0, "sum_dl": 0})
    return version


def clear_fts_index(catalog, table: str = "fts_index") -> None:
    """SqliteFtsIndex.ClearAsync: drop the index, sidecar, and header."""
    catalog.drop(table)
    catalog.drop(table + "__dl")
    catalog.drop(table + "__stats")


def query_fts_index(
    spark,
    catalog,
    query_terms: Sequence[str],
    k: int = 10,
    table: str = "fts_index",
    n_buckets: int = FTS_TERM_BUCKETS,
) -> DataFrame:
    """BM25 top-k from the persisted postings: scans ONLY the term buckets
    the query's terms hash to (term_bucket is a hive partition column), so
    per-query cost is O(postings of ~|terms| buckets), independent of
    corpus re-tokenization."""
    wanted = sorted({_crc_bucket(t, n_buckets) for t in query_terms})
    # manifest-level pruning (untouched buckets' files never listed); the
    # isin filters remain as the correctness guard for unlabeled entries
    postings = catalog.read_buckets(spark, table, wanted).filter(
        F.col("term_bucket").isin(wanted)
        & F.col("term").isin(list(query_terms))
    )
    stats = catalog.read(spark, table + "__stats").select("n_docs", "avgdl")
    dfreq = postings.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            idf
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc")
        .agg(F.round(F.sum("w"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
    )


# SqliteFtsIndex.cs:168: snippet(table, 3, '', '', '...', 32) — a ~32-token
# excerpt around the match with '...' ellipsis and no highlight markers;
# the match-all path returns substr(content, 1, DefaultSqlSnippetLength)
# (:231). Constants.cs: DefaultSnippetLength=200 chars.
SNIPPET_TOKENS = 32
SNIPPET_ELLIPSIS = "..."
DEFAULT_SNIPPET_LENGTH = 200


def snippet_expr(
    text_col,
    terms: Sequence[str],
    n_tokens: int = SNIPPET_TOKENS,
    snippet_chars: int = DEFAULT_SNIPPET_LENGTH,
    ellipsis: str = SNIPPET_ELLIPSIS,
):
    """Snippet Column: a window of up to n_tokens words starting shortly
    before the FIRST occurrence of any query term, '...'-marked when
    truncated on either side (FTS5 ranks candidate windows by match count;
    first-match-window is the deterministic, SQL-replayable approximation —
    divergence documented). No terms matched -> the match-all excerpt
    substr(text, 1, snippet_chars). Pure column math, JVM-side."""
    col = text_col if not isinstance(text_col, str) else F.col(text_col)
    words = F.split(F.trim(col), r"\s+")
    clean = F.transform(
        words, lambda w: F.lower(F.regexp_replace(w, r"[^\w]", ""))
    )
    term_arr = F.array(*[F.lit(t.lower()) for t in terms]) if terms else F.array()
    # first matching word index, -1 when none: zip each word with its
    # position, keep the first non-negative candidate
    idx = F.aggregate(
        F.zip_with(
            clean,
            F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0))),
            lambda w, i: F.when(F.array_contains(term_arr, w), i).otherwise(-1),
        ),
        F.lit(-1),
        lambda acc, v: F.when((acc == -1) & (v != -1), v).otherwise(acc),
    )
    lead = n_tokens // 4  # leading context before the match
    start = F.greatest(F.lit(0), idx - lead)
    snip = F.concat_ws(" ", F.slice(words, start + 1, n_tokens))
    windowed = F.concat(
        F.when(start > 0, F.lit(ellipsis)).otherwise(F.lit("")),
        snip,
        F.when(start + n_tokens < F.size(words), F.lit(ellipsis)).otherwise(
            F.lit("")
        ),
    )
    match_all = F.concat(
        F.substring(F.trim(col), 1, snippet_chars),
        F.when(
            F.length(F.trim(col)) > snippet_chars, F.lit(ellipsis)
        ).otherwise(F.lit("")),
    )
    return F.when(idx >= 0, windowed).otherwise(match_all)


def dedupe_facts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """F8 (SearchClient.cs:316-319): skip results whose partition text was
    already used — keep the first by relevance."""
    w = Window.partitionBy(text_col).orderBy(F.desc("score"))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def take_within_token_budget(
    df: DataFrame,
    budget: int,
    order_by: List,
    token_col: str = "token_count",
    min_tokens_per_fact: int = 1,
    strict: bool = False,
) -> DataFrame:
    """A5 (SearchClient.cs:341-352): accumulate facts in rank order while the
    running token total stays under budget.

    The semantics are a global ranked prefix, but the budget bounds the
    output: at most budget/min_tokens_per_fact rows can fit, so pre-cut with
    orderBy().limit(...) — TakeOrderedAndProject, per-partition heaps —
    before the cumulative-sum window. The window then sees at most that many
    rows (one tiny task), never the full table. Facts with fewer than
    min_tokens_per_fact tokens are excluded (the reference never emits an
    empty fact — SearchClient.cs:290-293 skips empty partitions).

    strict=True keeps rows while the running total stays STRICTLY under
    budget — the Ask path's stop condition `factSize >= TokensAvailable`
    (SearchClient.cs:341-346) is equivalent to `cum < budget` for positive
    sizes; the default (<=) matches the generic A5 accumulate-while-fits."""
    cap = max(1, budget // max(1, min_tokens_per_fact))
    head = (
        df.filter(F.col(token_col) >= min_tokens_per_fact)
        .orderBy(*order_by)
        .limit(cap)
    )
    w = Window.orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(token_col).over(w)
    cond = (F.col("__cum") < budget) if strict else (F.col("__cum") <= budget)
    return (
        head.withColumn("__cum", cum)
        .filter(cond)
        .drop("__cum")
    )


def render_facts(
    df: DataFrame,
    template: str = "==== [File:{{$source}};Relevance:{{$relevance}}]:\n{{$content}}",
    source_col: str = "source",
    relevance_col: str = "relevance",
    content_col: str = "text",
) -> DataFrame:
    """C12 (SearchClientConfig.cs:54): fact template substitution as a pure
    column expression."""
    fmt = (
        template.replace("%", "%%")
        .replace("{{$source}}", "%s")
        .replace("{{$relevance}}", "%s")
        .replace("{{$content}}", "%s")
    )
    # order of %s fills must match placeholder appearance order
    order = sorted(
        [
            ("{{$source}}", source_col),
            ("{{$relevance}}", relevance_col),
            ("{{$content}}", content_col),
        ],
        key=lambda kv: template.find(kv[0]),
    )
    cols = [
        F.col(c).cast("string") for marker, c in order if template.find(marker) >= 0
    ]
    return df.withColumn("fact", F.format_string(fmt, *cols))
