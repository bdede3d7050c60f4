"""MemoryFilter + retrieval semantics, re-expressed from the reference's
functional tests (FilteringTest.cs:33-137, DocumentUploadTest.ItSupportsTags
:75-135, SimpleVectorDb.TagsMatchFilters :207-230) as DataFrame assertions.
"""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from kernel_memory_spark.operators import query as Q


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        Row(id="r1", tags={"type": ["news", "test"], "ext": ["pdf"], "user": ["someone"]},
            vector=[1.0, 0.0], text="alpha"),
        Row(id="r2", tags={"type": ["blog"], "user": ["someone1"]},
            vector=[0.0, 1.0], text="beta"),
        Row(id="r3", tags={"type": ["news"], "user": ["admin"]},
            vector=[0.6, 0.8], text="gamma"),
    ]
    return spark.createDataFrame(rows)


def ids(df):
    return {r.id for r in df.select("id").collect()}


class TestMemoryFilters:
    def test_single_tag_match(self, records):
        # doc tagged {type:[news,test], ext:[pdf]} retrievable by each value
        assert "r1" in ids(Q.get_list(records, [{"type": ["news"]}]))
        assert "r1" in ids(Q.get_list(records, [{"type": ["test"]}]))
        assert "r1" in ids(Q.get_list(records, [{"ext": ["pdf"]}]))

    def test_no_match_for_unknown_tag(self, records):
        assert ids(Q.get_list(records, [{"foo": ["bar"]}])) == set()

    def test_and_within_filter(self, records):
        # [type=news AND user=someone] -> only r1
        assert ids(Q.get_list(records, [{"type": ["news"], "user": ["someone"]}])) == {"r1"}
        # conflicting conditions -> no match
        assert ids(Q.get_list(records, [{"type": ["news"], "user": ["someone1"]}])) == set()

    def test_or_across_filters(self, records):
        got = ids(Q.get_list(records, [{"user": ["someone1"]}, {"user": ["admin"]}]))
        assert got == {"r2", "r3"}

    def test_empty_filters_ignored(self, records):
        # FilteringTest.ItIgnoresEmptyFilters / SimpleVectorDb.cs:159
        assert ids(Q.get_list(records, [{}])) == {"r1", "r2", "r3"}
        assert ids(Q.get_list(records, None)) == {"r1", "r2", "r3"}

    def test_vector_column_pruned(self, records):
        assert "vector" not in Q.get_list(records, None).columns
        assert "vector" in Q.get_list(records, None, with_vectors=True).columns


class TestKnn:
    def test_topk_order_and_scores(self, records):
        got = Q.knn_top_k(records, [1.0, 0.0], k=2).collect()
        assert [r.id for r in got] == ["r1", "r3"]
        assert got[0].score == pytest.approx(1.0, abs=1e-6)
        assert got[1].score == pytest.approx(0.6, abs=1e-6)

    def test_min_relevance(self, records):
        got = Q.knn_top_k(records, [1.0, 0.0], k=10, min_relevance=0.7)
        assert ids(got) == {"r1"}

    def test_filters_applied_before_knn(self, records):
        got = Q.knn_top_k(records, [1.0, 0.0], k=10, filters=[{"user": ["admin"]}])
        assert ids(got) == {"r3"}

    def test_limit_nonpositive_means_unbounded(self, records):
        assert Q.knn_top_k(records, [1.0, 0.0], k=0).count() == 3


class TestRerank:
    def test_diminishing_returns_numerics(self, spark):
        # WeightedDiminishingReranker.cs:83-128: sort desc, x 1,.5,.25..., cap 1.0
        df = spark.createDataFrame(
            [("a", 0.8), ("a", 0.6), ("a", 0.4), ("b", 0.4), ("b", 0.2)],
            "record_id string, score double",
        )
        got = {r.record_id: r.relevance for r in Q.rerank_diminishing(df).collect()}
        assert got["a"] == pytest.approx(1.0)  # 0.8+0.3+0.1=1.2 capped
        assert got["b"] == pytest.approx(0.5)  # 0.4+0.1

    def test_weights_applied(self, spark):
        df = spark.createDataFrame(
            [("a", "i1", 0.5), ("b", "i2", 0.5)],
            "record_id string, index string, score double",
        )
        w = spark.createDataFrame(
            [("i1", 2.0), ("i2", 1.0)], "index string, index_weight double"
        )
        got = {
            r.record_id: r.relevance
            for r in Q.rerank_diminishing(df, index_weights=w).collect()
        }
        assert got["a"] == pytest.approx(1.0)
        assert got["b"] == pytest.approx(0.5)


class TestPagination:
    def test_skip_take(self, spark):
        df = spark.range(10).select(F.col("id"))
        got = [r.id for r in Q.paginate(df, [F.asc("id")], offset=3, limit=4).collect()]
        assert got == [3, 4, 5, 6]
