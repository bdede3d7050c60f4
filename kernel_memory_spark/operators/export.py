"""Document export: committed corpus -> the original uploaded content.

Re-expresses the reference's document-download contract
(DocumentUploadTest.cs:41-73: a file uploaded then exported must compare
byte-equal; BaseOrchestrator.ReadFileAsync serves the stored original).

The span corpus IS the stored original here (S1: documents arrive as
(doc_id, spans)), so export is a projection, not a reconstruction:

- export_documents: the stored span sequences verbatim — per-row invariant
  is span-sequence equality (kind, text, media_ref, order) against the
  ingested input, the north-rule check;
- export_text: a lossless text rendering (concatenated span text, NO
  normalization/trim — unlike extract(), which normalizes for chunking).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_documents(
    corpus: DataFrame, doc_ids: Optional[Sequence[str]] = None
) -> DataFrame:
    """(doc_id, spans) exactly as ingested; optional id pushdown filter."""
    out = corpus.select("doc_id", "spans")
    if doc_ids is not None:
        out = out.filter(F.col("doc_id").isin(list(doc_ids)))
    return out


def export_text(
    corpus: DataFrame, doc_ids: Optional[Sequence[str]] = None
) -> DataFrame:
    """(doc_id, content): text spans concatenated verbatim (media spans
    contribute their media_ref placeholder) — byte-exact for text-only
    documents, no trim/normalization anywhere."""
    spans = export_documents(corpus, doc_ids)
    rendered = F.array_join(
        F.transform(
            F.col("spans"),
            lambda s: F.when(s["kind"] == "text", s["text"]).otherwise(
                F.coalesce(s["media_ref"], F.lit(""))
            ),
        ),
        "",
    )
    return spans.select("doc_id", rendered.alias("content"))
