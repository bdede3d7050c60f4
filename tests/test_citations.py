"""Citation derivation (SearchClient.ProcessMemoryRecord port):
grouping by link, field extraction from reserved tags/payload, partition
ordering by relevance desc."""

from pyspark.sql import functions as F

from kernel_memory_spark.operators import (
    citations as cit,
    embeddings as emb,
    extract as ext,
    partition as prt,
    save_records as sav,
)
from kernel_memory_spark.synth import synth_corpus, synth_doc_tags


def matched_records(spark, n_docs=6):
    corpus = synth_corpus(spark, n_docs)
    tags = synth_doc_tags(spark, n_docs)
    extracted = ext.extract(corpus)
    parts = prt.partition(extracted, max_tokens=40, overlap=0)
    vecs = emb.gen_embeddings(parts)
    recs = sav.build_records(parts, vecs, tags, extracted, "e1")
    # deterministic fake score per record
    return recs.withColumn(
        "relevance", F.round(1.0 / (1 + F.crc32("id") % 13), 6)
    )


class TestCitations:
    def test_one_citation_per_file(self, spark):
        matches = matched_records(spark)
        out = cit.build_citations(matches, index="idx").collect()
        n_files = matches.select(
            F.col("tags").getItem("__file_id").getItem(0)
        ).distinct().count()
        assert len(out) == n_files

    def test_fields_derive_from_tags_and_payload(self, spark):
        matches = matched_records(spark)
        row = cit.build_citations(matches, index="idx").first()
        assert row.link == f"idx/{row.document_id}/{row.file_id}"
        assert row["index"] == "idx"
        assert row.source_content_type == "text/plain"
        assert row.source_name == row.document_id + ".txt"
        assert row.source_url == ""
        assert len(row.partitions) >= 1
        p = row.partitions[0]
        assert p.text and p.relevance > 0

    def test_partitions_sorted_relevance_desc(self, spark):
        matches = matched_records(spark, n_docs=10)
        for row in cit.build_citations(matches).collect():
            rels = [p.relevance for p in row.partitions]
            assert rels == sorted(rels, reverse=True)
            # partition_number asc on relevance ties
            for a, b in zip(row.partitions, row.partitions[1:]):
                if a.relevance == b.relevance:
                    assert a.partition_number <= b.partition_number

    def test_flatten_round_trip(self, spark):
        matches = matched_records(spark)
        nested = cit.build_citations(matches)
        flat = cit.flatten_citations(nested)
        assert flat.count() == matches.count()
        # ordinal 0 is the highest-relevance partition of each citation
        top = flat.filter(F.col("partition_order") == 0).count()
        assert top == nested.count()
