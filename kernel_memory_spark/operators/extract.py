"""Stage `extract`: span sequences -> one ExtractedText artifact per doc.

Re-expresses TextExtractionHandler's section-joining semantics
(archived/km-v1/service/Core/Handlers/TextExtractionHandler.cs:217-233):
trim each section; skip empties; concatenate; append "\\n\\n" only when the
section's sentences are complete; final trim.

Sentences-complete rule for the interleaved corpus (FIXTURES.md §1, mirroring
PdfDecoder.cs:63 false vs ImageDecoder.cs:44 true):
  complete(span) := span.kind == 'media' OR span.offset % 3 == 0.

Entirely pure column expressions (array HOFs) — no Python, no shuffle: this
stage is a narrow map over the corpus scan, so it scales linearly with input
splits and Catalyst keeps it inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.functions.text import unicode_trim

MIME_INTERLEAVED = "text/plain"


def span_is_complete(span: Column) -> Column:
    return (span["kind"] == "media") | (span["offset"] % 3 == 0)


def extracted_text_col(spans: Column) -> Column:
    """The joined document text, as a single column expression."""
    # (?U): unicode whitespace, matching the pandas oracle's str.strip()
    rendered = F.transform(
        spans,
        lambda s: F.concat(
            F.regexp_replace(s["text"], r"(?U)^\s+|\s+$", ""),
            F.when(
                span_is_complete(s)
                & (F.length(F.regexp_replace(s["text"], r"(?U)^\s+|\s+$", "")) > 0),
                F.lit("\n\n"),
            ).otherwise(F.lit("")),
        ),
    )
    return unicode_trim(F.array_join(rendered, ""))


def extract(corpus: DataFrame) -> DataFrame:
    """corpus(doc_id, spans) -> EXTRACTED schema (schema.EXTRACTED)."""
    text = extracted_text_col(F.col("spans"))
    return corpus.select(
        F.col("doc_id"),
        F.substring(F.sha2(F.concat(F.col("doc_id"), F.lit("/extract")), 256), 1, 32)
        .alias("file_id"),
        F.lit(MIME_INTERLEAVED).alias("mime_type"),
        text.alias("text"),
        F.sha2(text, 256).alias("text_sha256"),
        F.size("spans").cast("int").alias("n_spans"),
    )


def spans_view(corpus: DataFrame) -> DataFrame:
    """Flattened per-span view (doc_id, kind, text, media_ref, offset)."""
    return corpus.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def reassemble_spans(spans_flat: DataFrame) -> DataFrame:
    """Inverse of spans_view: rebuild ordered span arrays per document."""
    return (
        spans_flat.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("kind", "text", "media_ref", "offset")),
                lambda a, b: F.when(a["offset"] < b["offset"], -1)
                .when(a["offset"] > b["offset"], 1)
                .otherwise(0),
            ).alias("spans")
        )
    )


def span_invariant_violations(corpus: DataFrame) -> DataFrame:
    """Per-row invariant (input_hint): the span sequence that survives the
    pipeline's flatten/reassemble round-trip must equal the input exactly on
    (kind, text, media_ref, order). Returns the violating doc_ids (empty
    DataFrame == invariant holds).
    """
    rebuilt = reassemble_spans(spans_view(corpus)).withColumnRenamed(
        "spans", "spans_rebuilt"
    )
    joined = corpus.join(rebuilt, "doc_id", "left")
    return joined.filter(
        ~(
            F.col("spans").cast("string")
            == F.col("spans_rebuilt").cast("string")
        )
    ).select("doc_id")
