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
