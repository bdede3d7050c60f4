"""Composed end-to-end search service.

Ports the semantics of tests/Core.Tests/Search/SearchEndToEndTests.cs
(infix/mongo queries, boolean logic, field-specific search, NOT exclusion,
min-relevance, pagination, total-before-pagination) plus the
SearchService.cs node fan-out rules (requested \\ excluded, validation,
node weights, diminishing merge across nodes).
"""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import search_service as svc
from kernel_memory_spark.operators.search_service import (
    SearchError,
    SearchRequest,
)

DOCS = [
    # id, title, description, content, created_at
    ("d1", "Spark tuning", "perf guide", "spark shuffle partitions tuning",
     "2024-01-01 00:00:00"),
    ("d2", "Vector search", "ann intro", "vector cosine similarity search",
     "2024-02-01 00:00:00"),
    ("d3", "Merge strategies", "iceberg", "merge into bucketed tables spark",
     "2024-03-01 00:00:00"),
    ("d4", "Cooking pasta", "dinner", "boil water add salt and pasta",
     "2024-04-01 00:00:00"),
    ("d5", "Spark streaming", "watermarks", "structured streaming spark state",
     "2024-05-01 00:00:00"),
]

SCHEMA = "id string, title string, description string, content string, created_at string"


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def run(spark, corpus, query, **kw):
    req = SearchRequest(query=query, min_relevance=0.0, limit=100, **kw)
    return svc.search(spark, {"node-a": corpus}, req)


def ids(df):
    return [r.record_id for r in df.collect()]


class TestInfixQueries:
    def test_simple_text_finds_matching_content(self, spark, corpus):
        got = set(ids(run(spark, corpus, "pasta")))
        assert got == {"d4"}

    def test_boolean_and_finds_only_matching_both(self, spark, corpus):
        got = set(ids(run(spark, corpus, "spark AND streaming")))
        assert got == {"d5"}

    def test_boolean_or_finds_matching_either(self, spark, corpus):
        got = set(ids(run(spark, corpus, "pasta OR streaming")))
        assert got == {"d4", "d5"}

    def test_field_specific_content_only(self, spark, corpus):
        # 'merge' appears in d3 title AND content; content:water only in d4
        got = set(ids(run(spark, corpus, "content:water")))
        assert got == {"d4"}

    def test_field_specific_title_only(self, spark, corpus):
        got = set(ids(run(spark, corpus, "title:cooking")))
        assert got == {"d4"}

    def test_case_insensitive(self, spark, corpus):
        assert set(ids(run(spark, corpus, "PASTA"))) == \
            set(ids(run(spark, corpus, "pasta")))

    def test_not_with_positive_term_excludes(self, spark, corpus):
        # KnownIssue1_NotWithPositiveTerm_ExcludesCorrectly
        got = set(ids(run(spark, corpus, "spark NOT streaming")))
        assert got == {"d1", "d3"}

    def test_min_relevance_passes_normalized_scores(self, spark, corpus):
        # RegressionTest_Bm25NormalizationBug: with the reference's
        # exp(raw/10) normalization, matches score >= 0.3 at the default
        # min relevance and are NOT all filtered out
        req = SearchRequest(query="spark", min_relevance=svc.DEFAULT_MIN_RELEVANCE)
        got = svc.search(spark, {"n": corpus}, req)
        rows = got.collect()
        assert len(rows) > 0
        assert all(r.relevance >= 0.3 for r in rows)


class TestMongoQueries:
    def test_text_search_operator(self, spark, corpus):
        got = set(ids(run(spark, corpus, '{"$text": {"$search": "pasta"}}')))
        assert got == {"d4"}

    def test_infix_and_mongo_same_semantics(self, spark, corpus):
        # InfixAndMongo_SameSemantics_ReturnSameResults
        infix = run(spark, corpus, "content:spark AND content:streaming")
        mongo = run(
            spark, corpus,
            '{"$and": [{"content": "spark"}, {"content": "streaming"}]}',
        )
        assert ids(infix) == ids(mongo)

    def test_mongo_not_excludes(self, spark, corpus):
        got = set(ids(run(
            spark, corpus,
            '{"$and": [{"content": "spark"},'
            ' {"$not": {"content": "streaming"}}]}',
        )))
        assert got == {"d1", "d3"}


class TestPagination:
    def test_pagination_returns_correct_subset(self, spark, corpus):
        # Search_WithPagination_ReturnsCorrectSubset
        req_all = SearchRequest(query="spark", min_relevance=0.0, limit=100)
        all_ids = ids(svc.search(spark, {"n": corpus}, req_all))
        assert len(all_ids) == 3  # d1 d3 d5
        page = ids(svc.search(
            spark, {"n": corpus},
            SearchRequest(query="spark", min_relevance=0.0, offset=1, limit=2),
        ))
        assert page == all_ids[1:3]

    def test_total_reflects_filtered_count_before_pagination(self, spark, corpus):
        # Search_TotalResults_ReflectsFilteredCountBeforePagination
        page, total = svc.search_with_total(
            spark, {"n": corpus},
            SearchRequest(query="spark", min_relevance=0.0, offset=0, limit=1),
        )
        assert len(ids(page)) == 1
        assert total.first().total_results == 3


class TestNodeFanout:
    """SearchService.cs:167-209 DetermineNodesToSearch/ValidateNodes and the
    multi-node diminishing merge (WeightedDiminishingReranker.cs:83-128)."""

    def test_all_nodes_minus_exclusions(self, spark, corpus):
        half_a = corpus.filter(F.col("id").isin("d1", "d2"))
        half_b = corpus.filter(~F.col("id").isin("d1", "d2"))
        req = SearchRequest(query="spark", min_relevance=0.0, limit=100,
                            exclude_nodes=["node-b"])
        got = set(ids(svc.search(
            spark, {"node-a": half_a, "node-b": half_b}, req
        )))
        assert got == {"d1"}  # d3/d5 live on the excluded node

    def test_all_excluded_raises(self, spark, corpus):
        req = SearchRequest(query="spark", exclude_nodes=["node-a"])
        with pytest.raises(SearchError) as ei:
            svc.search(spark, {"node-a": corpus}, req)
        assert ei.value.error_type == "invalid_configuration"

    def test_requested_minus_excluded_empty_raises(self, spark, corpus):
        req = SearchRequest(query="spark", nodes=["node-a"],
                            exclude_nodes=["node-a"])
        with pytest.raises(SearchError) as ei:
            svc.search(spark, {"node-a": corpus}, req)
        assert ei.value.error_type == "invalid_configuration"

    def test_unknown_node_raises(self, spark, corpus):
        req = SearchRequest(query="spark", nodes=["nope"])
        with pytest.raises(SearchError) as ei:
            svc.search(spark, {"node-a": corpus}, req)
        assert ei.value.error_type == "node_not_found"
        assert ei.value.node_id == "nope"

    def test_diminishing_merge_across_nodes(self, spark, corpus):
        # the same record on two nodes: relevance = s1*1.0 + s2*0.5 (capped
        # at 1.0), strictly greater than either single-node appearance
        req = SearchRequest(query="pasta", min_relevance=0.0, limit=10)
        single = svc.search(spark, {"a": corpus}, req).first()
        both = svc.search(spark, {"a": corpus, "b": corpus}, req).first()
        assert both.record_id == single.record_id == "d4"
        expected = min(1.0, single.relevance * 1.5)
        assert abs(both.relevance - expected) < 1e-5

    def test_node_weights_scale_relevance(self, spark, corpus):
        req_w = SearchRequest(query="pasta", min_relevance=0.0, limit=10,
                              node_weights={"a": 0.5})
        req_1 = SearchRequest(query="pasta", min_relevance=0.0, limit=10)
        w = svc.search(spark, {"a": corpus}, req_w).first()
        one = svc.search(spark, {"a": corpus}, req_1).first()
        assert abs(w.relevance - one.relevance * 0.5) < 1e-5


class TestContentOnlySchema:
    def test_bare_term_on_content_only_frame(self, spark):
        """A bare term defaults to searching title/description/content;
        a node whose schema only has `content` must still work (fields
        restricted to available columns, not an AnalysisException)."""
        df = spark.createDataFrame(
            [("x1", "spark rules"), ("x2", "other text")],
            "id string, content string",
        )
        req = SearchRequest(query="spark", min_relevance=0.0, limit=10)
        got = ids(svc.search(spark, {"n": df}, req))
        assert got == ["x1"]

    def test_not_term_on_content_only_frame(self, spark):
        df = spark.createDataFrame(
            [("x1", "spark rules"), ("x2", "spark streaming here")],
            "id string, content string",
        )
        req = SearchRequest(query="spark NOT streaming", min_relevance=0.0)
        got = ids(svc.search(spark, {"n": df}, req))
        assert got == ["x1"]


class TestMatchAll:
    def test_empty_query_with_filters_lists_all(self, spark, corpus):
        # no positive terms -> match-all at score 1.0
        # (SqliteFtsIndex.cs:227-259)
        req = SearchRequest(query="", min_relevance=0.0, limit=100)
        got = svc.search(spark, {"n": corpus}, req)
        assert len(ids(got)) == 5
        assert all(r.relevance == 1.0 for r in got.collect())


class TestHybridSearch:
    def test_both_paths_boost_with_diminishing_merge(self, spark):
        import math

        recs = spark.createDataFrame(
            [
                ("r1", [0.8, 0.6], ("spark tuning guide",)),  # both indexes
                ("r2", [0.8, 0.6], ("cooking pasta",)),       # vector-only
                ("r3", [0.0, 1.0], ("spark streaming",)),     # fts-dominant
            ],
            "id string, vector array<float>, payload struct<text string>",
        )
        got = {
            r.record_id: r.relevance
            for r in svc.hybrid_search(
                recs, "spark", [1.0, 0.0], k=10, min_relevance=0.0
            ).collect()
        }
        # r1 appears in BOTH indexes: relevance = max + 0.5*min beats its
        # vector-only twin r2 (cosine 0.8) and the fts-dominant r3
        assert got["r1"] > got["r2"] and got["r1"] > got["r3"]
        assert got["r2"] == pytest.approx(0.8, abs=1e-4)
        assert 0 < got["r3"] <= 1.0

    def test_index_weights_shift_ranking(self, spark):
        recs = spark.createDataFrame(
            [
                ("rv", [1.0, 0.0], ("nothing relevant",)),
                ("rf", [0.0, 1.0], ("spark spark spark",)),
            ],
            "id string, vector array<float>, payload struct<text string>",
        )
        vec_heavy = {
            r.record_id: r.relevance
            for r in svc.hybrid_search(
                recs, "spark", [1.0, 0.0], w_fts=0.1, w_vec=1.0,
                min_relevance=-10,
            ).collect()
        }
        fts_heavy = {
            r.record_id: r.relevance
            for r in svc.hybrid_search(
                recs, "spark", [1.0, 0.0], w_fts=1.0, w_vec=0.1,
                min_relevance=-10,
            ).collect()
        }
        assert vec_heavy["rv"] > vec_heavy["rf"]
        assert fts_heavy["rf"] > fts_heavy["rv"]


class TestSearchMemories:
    """km-v1 SearchClient.SearchAsync composition over RECORDS."""

    def test_vector_search_to_citations(self, spark, tmp_path):
        from kernel_memory_spark.operators import (
            embeddings as emb,
            extract as ext,
            partition as prt,
            save_records as sav,
        )
        from kernel_memory_spark.synth import synth_corpus

        corpus = synth_corpus(spark, 4)
        extracted = ext.extract(corpus)
        parts = prt.partition(extracted, max_tokens=60, overlap=0)
        vecs = emb.gen_embeddings(parts)
        records = sav.build_records(parts, vecs, None, extracted, "e1")

        qvec = [float(v) for v in vecs.first().vector]
        cites = svc.search_memories(
            records, query_vector=qvec, min_relevance=0.0, limit=5
        )
        rows = cites.collect()
        assert len(rows) >= 1
        # citations carry ordered partitions with relevance
        for r in rows:
            assert r.link.startswith("default/")
            rels = [p.relevance for p in r.partitions]
            assert rels == sorted(rels, reverse=True)

    def test_list_path_dedupes_facts(self, spark):
        from kernel_memory_spark.operators import (
            embeddings as emb,
            extract as ext,
            partition as prt,
            save_records as sav,
        )
        from kernel_memory_spark.synth import synth_corpus

        corpus = synth_corpus(spark, 3)
        extracted = ext.extract(corpus)
        parts = prt.partition(extracted, max_tokens=60, overlap=0)
        vecs = emb.gen_embeddings(parts)
        records = sav.build_records(parts, vecs, None, extracted, "e1")
        # duplicate every record's text by unioning the table with itself
        # under fresh ids: the dupe-fact skip must keep one per text
        dup = records.withColumn("id", F.concat(F.col("id"), F.lit("-copy")))
        both = records.unionByName(dup)

        cites = svc.search_memories(both, query_vector=None, limit=1000)
        n_parts = cites.select(
            F.explode("partitions").alias("p")
        ).count()
        assert n_parts == records.count()  # copies deduped


class TestSearchDiagnostics:
    """SearchService.cs:167-192: per-node timings, appearance counts,
    partial-failure capture."""

    def test_diagnostics_rows_per_node(self, spark, corpus):
        req = SearchRequest(query="content:spark", min_relevance=0.0,
                            limit=100)
        results, diag = svc.search_with_diagnostics(
            spark, {"node-a": corpus, "node-b": corpus}, req
        )
        rows = {r.node: r for r in diag.collect()}
        assert set(rows) == {"node-a", "node-b"}
        for r in rows.values():
            assert r.error is None
            assert r.appearances > 0
            assert r.wall_ms >= 0
        # fused results match the plain search() over the same nodes
        plain = svc.search(spark, {"node-a": corpus, "node-b": corpus}, req)
        assert ids(results) == ids(plain)

    def test_partial_failure_keeps_surviving_nodes(self, spark, corpus):
        broken = corpus.drop("id")  # no id column: plan-time failure
        req = SearchRequest(query="content:spark", min_relevance=0.0,
                            limit=100)
        results, diag = svc.search_with_diagnostics(
            spark, {"good": corpus, "bad": broken}, req
        )
        rows = {r.node: r for r in diag.collect()}
        assert rows["bad"].error is not None
        assert rows["good"].error is None
        # results come from the surviving node alone
        plain = svc.search(spark, {"good": corpus}, req)
        assert ids(results) == ids(plain)

    def test_all_nodes_failed_returns_empty_plus_errors(self, spark, corpus):
        broken = corpus.drop("id")
        req = SearchRequest(query="content:spark", min_relevance=0.0,
                            limit=10)
        results, diag = svc.search_with_diagnostics(
            spark, {"bad": broken}, req
        )
        assert results.count() == 0
        assert [r.error is not None for r in diag.collect()] == [True]


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        from kernel_memory_spark.operators import search_service as SVC

        # list A ranks: x=1, y=2, z=3 ; list B ranks: y=1, x=2
        a = spark.createDataFrame(
            [("x", 9.0), ("y", 5.0), ("z", 1.0)],
            "record_id string, score double",
        )
        b = spark.createDataFrame(
            [("y", 100.0), ("x", 50.0)],
            "record_id string, score double",
        )
        out = {
            r.record_id: (r.rrf_score, r.n_lists)
            for r in SVC.rrf_fuse([a, b], k=10, rrf_k=60).collect()
        }
        assert out["x"] == (round(1 / 61 + 1 / 62, 6), 2)
        assert out["y"] == (round(1 / 62 + 1 / 61, 6), 2)
        assert out["z"] == (round(1 / 63, 6), 1)

    def test_ties_broken_by_id_and_topk(self, spark):
        from kernel_memory_spark.operators import search_service as SVC

        # equal scores: id ASC wins rank 1
        a = spark.createDataFrame(
            [("b", 1.0), ("a", 1.0)], "record_id string, score double"
        )
        out = SVC.rrf_fuse([a], k=1, rrf_k=60).collect()
        assert len(out) == 1
        assert out[0].record_id == "a"
        assert out[0].rrf_score == round(1 / 61, 6)
