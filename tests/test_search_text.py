"""BM25 (T2), token budget (A5), fact dedupe (F8), template render (C12),
map-reduce summarization (A4)."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import search_text as ST
from kernel_memory_spark.operators.summarize import summarize


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "spark engine spark spark distributed"),
        ("d2", "spark appears once here with many other words padding padding"),
        ("d3", "nothing relevant whatsoever in this text"),
        ("d4", "engine engine engine"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestBM25:
    def test_tf_and_idf_ordering(self, spark, corpus):
        got = ST.bm25_topk(corpus, ["spark"], k=10).collect()
        assert [r.doc for r in got] == ["d1", "d2"]  # tf(d1) > tf(d2)
        assert got[0].score > got[1].score > 0

    def test_multi_term(self, spark, corpus):
        got = ST.bm25_topk(corpus, ["spark", "engine"], k=10).collect()
        assert got[0].doc == "d1"  # matches both terms
        assert {r.doc for r in got} == {"d1", "d2", "d4"}

    def test_no_match(self, spark, corpus):
        assert ST.bm25_topk(corpus, ["zzz"], k=10).count() == 0


class TestPromptAssembly:
    def test_token_budget_cumsum(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 40), ("b", 0.9, 40), ("c", 0.8, 40)],
            "id string, relevance double, token_count int",
        )
        got = ST.take_within_token_budget(df, 100, [F.desc("relevance")])
        assert {r.id for r in got.collect()} == {"a", "b"}

    def test_dedupe_facts(self, spark):
        df = spark.createDataFrame(
            [("a", "same", 0.9), ("b", "same", 0.7), ("c", "other", 0.5)],
            "id string, text string, score double",
        )
        got = {r.id for r in ST.dedupe_facts(df).collect()}
        assert got == {"a", "c"}  # highest-scoring duplicate survives

    def test_render_facts(self, spark):
        df = spark.createDataFrame(
            [("f.txt", 0.5, "hello")], "source string, relevance double, text string"
        )
        fact = ST.render_facts(df).first().fact
        assert fact == "==== [File:f.txt;Relevance:0.5]:\nhello"


class TestPersistedFtsIndex:
    """Write-once FTS postings (SqliteFtsIndex analog): the query path must
    (a) score identically to the per-query bm25_topk and (b) scan only the
    term-hash buckets of the query terms (partition pruning)."""

    def test_matches_per_query_bm25(self, spark, corpus, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus)
        terms = ["spark", "engine"]
        direct = [(r.doc, r.score) for r in ST.bm25_topk(corpus, terms, k=4).collect()]
        indexed = [(r.doc, round(r.score, 6)) for r in
                   ST.query_fts_index(spark, cat, terms, k=4).collect()]
        assert [(d, round(s, 6)) for d, s in direct] == indexed

    def test_query_prunes_term_buckets(self, spark, corpus, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus)
        out = ST.query_fts_index(spark, cat, ["spark"], k=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "term_bucket" in plan
        assert "InPandas" not in plan and "BatchEvalPython" not in plan

    def test_rebuild_after_corpus_change(self, spark, corpus, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus)
        bigger = corpus.unionByName(spark.createDataFrame(
            [("d5", "spark spark spark spark")], "doc_id string, text string"
        ))
        ST.build_fts_index(spark, cat, bigger)  # overwrite = new snapshot
        direct = [r.doc for r in ST.bm25_topk(bigger, ["spark"], k=5).collect()]
        indexed = [r.doc for r in ST.query_fts_index(spark, cat, ["spark"], k=5).collect()]
        assert direct == indexed


class TestSnippets:
    """snippet() parity (SqliteFtsIndex.cs:168, 231): windowed excerpt
    around the first match, '...' when truncated, substr fallback."""

    def test_window_around_match(self, spark):
        words = " ".join(f"w{i}" for i in range(100))
        text = words.replace("w50", "needle")
        df = spark.createDataFrame([(text,)], "text string")
        got = df.select(
            ST.snippet_expr("text", ["needle"], n_tokens=8).alias("s")
        ).first().s
        assert "needle" in got
        assert got.startswith("...") and got.endswith("...")
        body = got.strip(".")
        assert len(body.split()) == 8

    def test_match_at_start_no_leading_ellipsis(self, spark):
        df = spark.createDataFrame(
            [("needle then more words follow here now ok",)], "text string"
        )
        got = df.select(
            ST.snippet_expr("text", ["needle"], n_tokens=4).alias("s")
        ).first().s
        assert not got.startswith("...")
        assert got.endswith("...")
        assert got.split()[0] == "needle"

    def test_no_match_falls_back_to_substr(self, spark):
        long_text = "alpha " * 100
        df = spark.createDataFrame([(long_text,)], "text string")
        got = df.select(
            ST.snippet_expr("text", ["zzz"], snippet_chars=50).alias("s")
        ).first().s
        assert got == long_text.strip()[:50] + "..."

    def test_punctuation_and_case_insensitive(self, spark):
        df = spark.createDataFrame(
            [("The big (Needle!) was found here",)], "text string"
        )
        got = df.select(
            ST.snippet_expr("text", ["needle"], n_tokens=3).alias("s")
        ).first().s
        assert "(Needle!)" in got


class TestSummarize:
    def test_short_text_passthrough(self, spark):
        df = spark.createDataFrame([("d1", "tiny.")], "doc_id string, text string")
        got = summarize(df, target_tokens=50).first()
        assert got.summary == "tiny."

    def test_long_text_shrinks_under_target(self, spark):
        long_text = " ".join(
            f"sentence number {i} has some words in it." for i in range(200)
        )
        df = spark.createDataFrame([("d1", long_text)], "doc_id string, text string")
        got = summarize(df, target_tokens=50, chunk_tokens=100).first()
        assert len(got.summary) <= 50 * 4  # 4-char tokens
        assert len(got.summary) > 0

    def test_deterministic(self, spark):
        long_text = " ".join(f"alpha beta gamma {i}." for i in range(100))
        df = spark.createDataFrame([("d1", long_text)], "doc_id string, text string")
        a = summarize(df, target_tokens=30).first().summary
        b = summarize(df, target_tokens=30).first().summary
        assert a == b
