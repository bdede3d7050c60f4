"""Extract stage: section joining semantics + the span-sequence invariant."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from kernel_memory_spark import schema
from kernel_memory_spark.operators import extract as ex
from kernel_memory_spark.synth import synth_corpus, gen_doc


def mk_corpus(spark, rows):
    return spark.createDataFrame(rows, schema.CORPUS)


def span(kind, text, media_ref, offset):
    return Row(kind=kind, text=text, media_ref=media_ref, offset=offset)


class TestSectionJoining:
    def test_complete_sections_get_blank_line(self, spark):
        # offset 0 -> complete (text, offset%3==0); offset 1 -> incomplete;
        # media -> always complete (TextExtractionHandler.cs:217-233 analog).
        corpus = mk_corpus(
            spark,
            [
                Row(
                    doc_id="d1",
                    spans=[
                        span("text", "Page one.", "", 0),
                        span("text", "Page two", "", 1),
                        span("media", "Ocr text.", "img://d1/2", 2),
                    ],
                )
            ],
        )
        out = ex.extract(corpus).collect()[0]
        assert out.text == "Page one.\n\nPage twoOcr text."
        assert out.n_spans == 3
        assert out.mime_type == "text/plain"

    def test_sections_are_trimmed_and_empties_skipped(self, spark):
        corpus = mk_corpus(
            spark,
            [
                Row(
                    doc_id="d1",
                    spans=[
                        span("text", "  hello  ", "", 0),
                        span("text", "   ", "", 1),
                        span("text", "world", "", 2),
                    ],
                )
            ],
        )
        out = ex.extract(corpus).collect()[0]
        # span 0 complete -> \n\n; span 1 empty after trim -> skipped entirely
        assert out.text == "hello\n\nworld"

    def test_final_trim(self, spark):
        corpus = mk_corpus(
            spark, [Row(doc_id="d1", spans=[span("media", "only.", "img://d1/0", 0)])]
        )
        out = ex.extract(corpus).collect()[0]
        assert out.text == "only."  # trailing \n\n trimmed

    def test_deterministic_file_id(self, spark):
        corpus = mk_corpus(
            spark, [Row(doc_id="d1", spans=[span("text", "x.", "", 0)])]
        )
        a = ex.extract(corpus).collect()[0].file_id
        b = ex.extract(corpus).collect()[0].file_id
        assert a == b and len(a) == 32


class TestSpanInvariant:
    def test_invariant_holds_on_synth_corpus(self, spark):
        corpus = synth_corpus(spark, 200)
        assert ex.span_invariant_violations(corpus).count() == 0

    def test_invariant_catches_mutation(self, spark):
        corpus = synth_corpus(spark, 20)
        # Break one doc: drop its first span behind the pipeline's back.
        mutated = ex.spans_view(corpus).filter(
            ~((F.col("doc_id") == "doc-000000003") & (F.col("offset") == 0))
        )
        rebuilt = ex.reassemble_spans(mutated).withColumnRenamed(
            "spans", "spans_rebuilt"
        )
        bad = (
            corpus.join(rebuilt, "doc_id")
            .filter(
                F.col("spans").cast("string") != F.col("spans_rebuilt").cast("string")
            )
            .count()
        )
        assert bad == 1


class TestSynth:
    def test_generation_is_partitioning_invariant(self, spark):
        a = synth_corpus(spark, 64, partitions=2).orderBy("doc_id").collect()
        b = synth_corpus(spark, 64, partitions=16).orderBy("doc_id").collect()
        assert a == b

    def test_gen_doc_deterministic(self):
        assert gen_doc(7) == gen_doc(7)
        assert gen_doc(7) != gen_doc(8)

    def test_media_refs_and_offsets(self, spark):
        flat = ex.spans_view(synth_corpus(spark, 100))
        media = flat.filter(F.col("kind") == "media")
        assert media.filter(~F.col("media_ref").startswith("img://")).count() == 0
        text = flat.filter(F.col("kind") == "text")
        assert text.filter(F.col("media_ref") != "").count() == 0
