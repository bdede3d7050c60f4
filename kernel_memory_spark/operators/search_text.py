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


def _term_bucket(col, n_buckets: int = FTS_TERM_BUCKETS):
    return F.pmod(F.crc32(col.cast("string")), F.lit(n_buckets)).cast("int")


def build_fts_index(
    spark,
    catalog,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "fts_index",
    n_buckets: int = FTS_TERM_BUCKETS,
) -> int:
    """Write-once postings table (doc, dl, term, tf) partitioned by
    term-hash bucket + a 1-row stats table `{table}__stats`."""
    postings = tokenize_terms(df, id_col, text_col).withColumn(
        "term_bucket", _term_bucket(F.col("term"), n_buckets)
    )
    version = catalog.overwrite(postings, table, partition_by=["term_bucket"])
    stats = df.agg(F.count("*").cast("double").alias("n_docs")).crossJoin(
        postings.select("doc", "dl").distinct()
        .agg(F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"))
    )
    catalog.overwrite(stats, table + "__stats")
    return version


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
    import zlib

    wanted = sorted({
        zlib.crc32(t.encode("utf-8")) % n_buckets for t in query_terms
    })
    postings = catalog.read(spark, table).filter(
        F.col("term_bucket").isin(wanted)  # prunes at the file listing
        & F.col("term").isin(list(query_terms))
    )
    stats = catalog.read(spark, table + "__stats")
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
