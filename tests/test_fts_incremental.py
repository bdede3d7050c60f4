"""Incremental FTS postings maintenance (round-3 verdict item #2):
upsert/remove mirror SqliteFtsIndex.IndexAsync/RemoveAsync
(src/Core/Search/SqliteFtsIndex.cs:81-142, 265) — tokenization is O(batch),
rewrites touch only the term buckets involved, and the stats header stays
bit-identical to a full rebuild.
"""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import search_text as ST
from kernel_memory_spark.sources.tables import TableCatalog


def corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


BASE = [
    ("d1", "spark engine shuffles data across the cluster"),
    ("d2", "vector search ranks embeddings by cosine score"),
    ("d3", "merge writes new snapshots into the table catalog"),
    ("d4", "spark merge upserts records without rewriting everything"),
]
MORE = [
    ("d5", "streaming ingest tokenizes only the incoming batch"),
    ("d6", "spark prunes partitions at the manifest"),
]


def topk(spark, cat, terms, k=10):
    return [
        (r.doc, r.score)
        for r in ST.query_fts_index(spark, cat, terms, k=k).collect()
    ]


class TestFtsUpsert:
    def test_upsert_matches_full_rebuild(self, spark, tmp_path):
        """build(half) + upsert(rest) must score IDENTICALLY to
        build(all): postings, df, N, avgdl all converge exactly."""
        inc = TableCatalog(str(tmp_path / "inc"))
        ST.build_fts_index(spark, inc, corpus(spark, BASE))
        ST.upsert_fts_index(spark, inc, corpus(spark, MORE))

        full = TableCatalog(str(tmp_path / "full"))
        ST.build_fts_index(spark, full, corpus(spark, BASE + MORE))

        terms = ["spark", "merge", "batch"]
        assert topk(spark, inc, terms) == topk(spark, full, terms)
        si = inc.read(spark, "fts_index__stats").first()
        sf = full.read(spark, "fts_index__stats").first()
        assert (si.n_docs, si.avgdl, si.sum_dl, si.dl_docs) == \
            (sf.n_docs, sf.avgdl, sf.sum_dl, sf.dl_docs)

    def test_redelivery_replaces_old_postings(self, spark, tmp_path):
        """An updated document's OLD postings (possibly in other term
        buckets) must disappear."""
        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus(spark, BASE))
        ST.upsert_fts_index(
            spark, cat, corpus(spark, [("d1", "zebra quagga")])
        )
        idx = cat.read(spark, "fts_index")
        old_terms = {r.term for r in idx.filter(F.col("doc") == "d1").collect()}
        assert old_terms == {"zebra", "quagga"}
        # scores identical to a fresh build over the updated corpus
        full = TableCatalog(str(tmp_path / "full"))
        ST.build_fts_index(
            spark, full,
            corpus(spark, [("d1", "zebra quagga")] + BASE[1:]),
        )
        for terms in (["spark"], ["zebra"], ["merge", "spark"]):
            assert topk(spark, cat, terms) == topk(spark, full, terms)

    def test_pure_insert_rewrites_only_batch_term_buckets(
        self, spark, tmp_path
    ):
        """The incremental-ingest hot path: a new doc whose text holds ONE
        term touches exactly that term's bucket — every other postings
        entry carries by reference (no full re-tokenize, no full rewrite)."""
        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus(spark, BASE + MORE))
        before = {e["path"] for e in cat._entries("fts_index")}
        assert len(before) > 5  # terms spread across many buckets

        ST.upsert_fts_index(spark, cat, corpus(spark, [("d9", "zebra")]))
        after = {e["path"] for e in cat._entries("fts_index")}
        carried = before & after
        # at most ONE bucket (zebra's) rewritten/extended
        assert len(before - carried) <= 1
        new_entries = [
            e for e in cat._entries("fts_index") if e["path"] not in before
        ]
        assert {e["bucket"] for e in new_entries} == {
            ST._crc_bucket("zebra")
        }

    def test_remove_then_query(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus(spark, BASE + MORE))
        before = {e["path"] for e in cat._entries("fts_index")}
        ST.remove_fts_index(spark, cat, ["d4"])
        after = {e["path"] for e in cat._entries("fts_index")}
        # only the buckets holding d4's terms rewrote
        d4_terms = len(set("spark merge upserts records without "
                           "rewriting everything".split()))
        assert len(before - after) <= d4_terms
        assert cat.read(spark, "fts_index")\
            .filter(F.col("doc") == "d4").count() == 0
        # parity with a build that never saw d4
        full = TableCatalog(str(tmp_path / "full"))
        ST.build_fts_index(
            spark, full, corpus(spark, BASE[:3] + MORE)
        )
        for terms in (["spark"], ["merge", "batch"]):
            assert topk(spark, cat, terms) == topk(spark, full, terms)
        si = cat.read(spark, "fts_index__stats").first()
        sf = full.read(spark, "fts_index__stats").first()
        assert (si.n_docs, si.avgdl) == (sf.n_docs, sf.avgdl)

    def test_upsert_on_missing_table_builds(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        ST.upsert_fts_index(spark, cat, corpus(spark, BASE))
        assert topk(spark, cat, ["spark"])  # non-empty

    def test_clear(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus(spark, BASE))
        ST.clear_fts_index(cat)
        assert not cat.exists("fts_index")
        assert not cat.exists("fts_index__dl")
        assert not cat.exists("fts_index__stats")

    def test_query_prunes_at_manifest(self, spark, tmp_path):
        """A one-term query must read only that term's bucket files."""
        import os

        cat = TableCatalog(str(tmp_path))
        ST.build_fts_index(spark, cat, corpus(spark, BASE + MORE))
        out = ST.query_fts_index(spark, cat, ["spark"], k=5)
        read_files = {f.split("://", 1)[-1] for f in out.inputFiles()
                      if "fts_index" in f and "__stats" not in f}
        all_files = {
            os.path.join(dp, fn)
            for e in cat._entries("fts_index")
            for dp, _d, fns in os.walk(
                os.path.join(cat._dir("fts_index"), e["path"]))
            for fn in fns if fn.endswith(".parquet")
        }
        assert 0 < len(read_files) < len(all_files)
