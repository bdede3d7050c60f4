"""Byte-exact document export (DocumentUploadTest.cs:41-73 analog),
artifact-type filtering (F3), and stale-execution cancellation (Q4)."""

from pyspark.sql import functions as F

from kernel_memory_spark.operators import export as exp
from kernel_memory_spark.operators import partition as prt
from kernel_memory_spark.sources.tables import TableCatalog
from kernel_memory_spark.streaming.pipeline import Pipeline, PipelineConfig
from kernel_memory_spark.synth import synth_corpus


class TestExport:
    def test_span_sequence_byte_exact(self, spark, tmp_path):
        """Upload -> commit -> export must be span-for-span identical
        (kind, text, media_ref, order) — the north-rule invariant."""
        corpus = synth_corpus(spark, 8)
        cat = TableCatalog(str(tmp_path))
        Pipeline(spark, cat, PipelineConfig()).run(corpus, None)

        stored = cat.read(spark, "corpus")
        exported = exp.export_documents(stored)
        orig = {r.doc_id: r.spans for r in corpus.collect()}
        got = {r.doc_id: r.spans for r in exported.collect()}
        assert set(orig) == set(got)
        for doc_id in orig:
            a, b = orig[doc_id], got[doc_id]
            assert len(a) == len(b)
            for sa, sb in zip(a, b):
                assert (sa.kind, sa.text, sa.media_ref) == (
                    sb.kind, sb.text, sb.media_ref
                )

    def test_export_text_verbatim(self, spark):
        corpus = synth_corpus(spark, 3)
        texts = exp.export_text(corpus).collect()
        spans = {r.doc_id: r.spans for r in corpus.collect()}
        for r in texts:
            want = "".join(
                s.text if s.kind == "text" else (s.media_ref or "")
                for s in spans[r.doc_id]
            )
            assert r.content == want  # no trim, no normalization

    def test_export_id_filter(self, spark):
        corpus = synth_corpus(spark, 5)
        one = exp.export_documents(corpus, ["doc-000000002"])
        assert [r.doc_id for r in one.collect()] == ["doc-000000002"]


class TestArtifactTypeFilter:
    def test_partitions_tagged_and_filterable(self, spark):
        from kernel_memory_spark.operators import extract as ext

        corpus = synth_corpus(spark, 3)
        parts = prt.partition(ext.extract(corpus), max_tokens=60, overlap=0)
        assert {r.artifact_type for r in parts.select("artifact_type").distinct().collect()} == {
            prt.ARTIFACT_TEXT_PARTITION
        }
        synth_rows = parts.withColumn(
            "artifact_type", F.lit("detected_content")
        )
        both = parts.unionByName(synth_rows)
        kept = prt.filter_artifact_types(both)
        assert kept.count() == parts.count()


class TestStaleExecutionCancellation:
    def test_cancel_drops_other_executions(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        corpus = synth_corpus(spark, 3)
        Pipeline(spark, cat, PipelineConfig(execution_id="old-exec")).run(corpus, None)

        pipe_b = Pipeline(spark, cat, PipelineConfig(execution_id="new-exec"))
        removed = pipe_b.cancel_stale_executions()
        assert removed > 0

        ledger = cat.read(spark, "step_ledger")
        assert ledger.filter(F.col("execution_id") == "old-exec").count() == 0

        # new execution runs cleanly after cancellation
        metrics = pipe_b.run(corpus, None, resume=True)
        assert "materialize" in metrics
        assert pipe_b.cancel_stale_executions() == 0
