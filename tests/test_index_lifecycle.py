"""Index lifecycle semantics — ports the four reference functional tests
(archived/km-v1/service/tests/Core.FunctionalTests/DefaultTestCases/
IndexCreationTest / IndexDeletionTest / IndexListTest / MissingIndexTest)."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import (
    embeddings as emb,
    extract as ext,
    partition as prt,
    save_records as sav,
)
from kernel_memory_spark.sources.indexes import (
    IndexCatalog,
    IndexNotFoundError,
    normalize_index_name,
)
from kernel_memory_spark.sources.tables import TableCatalog
from kernel_memory_spark.synth import synth_corpus


@pytest.fixture()
def indexes(tmp_path):
    return IndexCatalog(TableCatalog(str(tmp_path)))


def some_records(spark, n_docs=3, execution_id="e1"):
    corpus = synth_corpus(spark, n_docs)
    extracted = ext.extract(corpus)
    parts = prt.partition(extracted, max_tokens=60, overlap=0)
    vecs = emb.gen_embeddings(parts)
    return sav.build_records(parts, vecs, None, extracted, execution_id)


class TestNormalization:
    def test_reference_rule(self):
        # IndexListTest: "name_with_underscore" -> "name-with-underscore"
        assert normalize_index_name("name_with_underscore") == "name-with-underscore"
        assert normalize_index_name("name-with-dashes") == "name-with-dashes"
        assert normalize_index_name(" Mixed.Case:V1 ") == "mixed-case-v1"
        assert normalize_index_name("") == "default"
        assert normalize_index_name(None) == "default"
        assert normalize_index_name("a b\\c/d.e_f:g") == "a-b-c-d-e-f-g"


class TestMissingIndex:
    """MissingIndexTest.ItHandlesMissingIndexesConsistently."""

    def test_consistent_missing_semantics(self, spark, indexes):
        name = "no-such-index"
        # delete a non-existing index: no exception
        indexes.delete_index(name)
        # not listed
        assert name not in indexes.list_indexes()
        # query path: empty results, not an error
        assert indexes.read(spark, name).count() == 0
        # strict path raises (IndexNotFoundException analog)
        with pytest.raises(IndexNotFoundError):
            indexes.read_strict(spark, name)
        # delete doc from non-existing index: no exception
        indexes.delete_document(spark, name, "doc-0")
        assert name not in indexes.list_indexes()
        # import into a non-existing index creates it
        indexes.upsert(spark, name, some_records(spark))
        assert name in indexes.list_indexes()
        assert indexes.read(spark, name).count() > 0
        indexes.delete_index(name)
        assert name not in indexes.list_indexes()


class TestIndexCreation:
    """IndexCreationTest.ItDoesntFailIfTheIndexExistsAlready."""

    def test_create_is_idempotent(self, spark, indexes):
        indexes.create_index(spark, "idx-a")
        n1 = indexes.upsert(spark, "idx-a", some_records(spark, execution_id="e1"))
        # second import into the existing index: no exception, upsert merges
        indexes.upsert(spark, "idx-a", some_records(spark, execution_id="e2"))
        got = indexes.read(spark, "idx-a")
        # same record ids from both executions: merged, not duplicated
        assert got.count() == got.select("id").distinct().count()
        indexes.create_index(spark, "idx-a")  # no-op, keeps data
        assert indexes.read(spark, "idx-a").count() > 0
        assert n1 > 0


class TestIndexDeletionAndList:
    """IndexDeletionTest.ItDeletesIndexes + IndexListTest.ItListsIndexes."""

    def test_delete_and_list(self, spark, indexes):
        recs = some_records(spark)
        indexes.upsert(spark, "index1", recs)
        indexes.upsert(spark, "index2", recs)
        indexes.upsert(spark, "name_with_underscore", recs)
        assert set(indexes.list_indexes()) == {
            "index1", "index2", "name-with-underscore",
        }
        # delete one document from index1 (no exception, data shrinks)
        doc = recs.first().doc_id
        before = indexes.read(spark, "index1").count()
        indexes.delete_document(spark, "index1", doc)
        after = indexes.read(spark, "index1").count()
        assert after < before
        # delete whole index2
        indexes.delete_index("index2")
        assert set(indexes.list_indexes()) == {"index1", "name-with-underscore"}

    def test_default_index_name(self, spark, indexes):
        # IndexListTest.ItUsesDefaultIndexName: empty name -> default
        indexes.upsert(spark, "", some_records(spark))
        assert indexes.list_indexes() == ["default"]


class TestBucketScopedUpsert:
    """At 100TB an index upsert must be O(batch), not O(index): an upsert
    touching one document rewrites at most the buckets it hashes to."""

    def test_single_doc_upsert_rewrites_one_bucket(self, spark, indexes):
        n_buckets = 8
        recs = some_records(spark, n_docs=20)
        indexes.upsert(spark, "big", recs, n_buckets=n_buckets)
        cat = indexes.catalog
        before = {
            e["bucket"]: e["path"] for e in cat._entries("idx__big")
        }
        assert all(b is not None for b in before)

        doc = recs.first().doc_id
        one = recs.filter(F.col("doc_id") == doc)
        indexes.upsert(spark, "big", one, n_buckets=n_buckets)
        after_entries = cat._entries("idx__big")
        # untouched buckets carried by reference (same paths)
        kept = {e["path"] for e in after_entries} & set(before.values())
        changed_buckets = {
            e["bucket"] for e in after_entries if e["path"] not in kept
        }
        assert len(changed_buckets) == 1  # only the doc's hash bucket
        assert len(kept) == len(before) - 1
        # and the data is still a correct merge
        got = indexes.read(spark, "big")
        assert got.count() == recs.count()

    def test_delete_document_rewrites_one_bucket(self, spark, indexes):
        recs = some_records(spark, n_docs=20)
        indexes.upsert(spark, "big", recs, n_buckets=8)
        cat = indexes.catalog
        before = {e["path"] for e in cat._entries("idx__big")}
        doc = recs.first().doc_id
        indexes.delete_document(spark, "big", doc)
        after = cat._entries("idx__big")
        kept = {e["path"] for e in after} & before
        assert len(before) - len(kept) == 1  # one bucket dropped/rewritten
        got = indexes.read(spark, "big")
        assert got.filter(F.col("doc_id") == doc).count() == 0
        assert got.count() == recs.filter(F.col("doc_id") != doc).count()
