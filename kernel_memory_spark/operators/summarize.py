"""Map-reduce summarization (A4, SummarizationHandler.cs:134-242).

The reference loops: chunk the text, summarize each chunk with an LLM,
concatenate, repeat while the result is still larger than the target token
size (`summarize more == true` until one pass yields a single small chunk).

Spark shape: the per-chunk "summarize" is a vectorized UDF (here a
deterministic extractive stand-in for ITextGenerator — first sentence +
truncation — so tests are hermetic); the while-loop runs on the driver over
a DataFrame that shrinks geometrically, the same structure as the
reference's overlapping-window loop. Each round is a narrow map + one
groupBy(doc) concat — shuffle keyed on doc_id, uniform.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.functions.chunker import PlainTextChunker, PlainTextChunkerOptions
from kernel_memory_spark.functions.extraction import sentences
from kernel_memory_spark.functions.tokenizers import NCharTokenizer


def _extractive_summary(text: str, max_chars: int) -> str:
    """Deterministic stand-in for the LLM summarizer: first sentence,
    truncated. Swap for a model-backed pandas UDF in production."""
    sents = sentences(text or "")
    head = sents[0] if sents else (text or "")
    return head[:max_chars]


def summarize(
    docs: DataFrame,
    target_tokens: int = 50,
    chunk_tokens: int = 200,
    tokenizer_n: int = 4,
    max_rounds: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    summarizer=None,
) -> DataFrame:
    """(id, text) -> (id, summary): iterative chunk-summarize-concat.

    `summarizer(text, max_chars) -> str` is the ITextGenerator plug point
    (SummarizationHandler.cs:191 calls the configured generator per chunk);
    default is the extractive first-sentence stand-in."""
    tok = NCharTokenizer(tokenizer_n)
    opts = PlainTextChunkerOptions(max_tokens_per_chunk=chunk_tokens)
    max_chars = target_tokens * tokenizer_n
    summarize_chunk = summarizer or _extractive_summary

    def round_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunker = PlainTextChunker(NCharTokenizer(tokenizer_n))
        for pdf in batches:
            out_ids, out_texts, out_done = [], [], []
            for i, t in zip(pdf["id"], pdf["text"]):
                t = t or ""
                if tok.count_tokens(t) <= target_tokens:
                    out_ids.append(i); out_texts.append(t); out_done.append(True)
                    continue
                parts = chunker.split(t, opts)
                summary = " ".join(
                    summarize_chunk(p, max_chars) for p in parts
                ).strip()
                # guard: a round must shrink, else force-truncate (same
                # stop-guarantee the reference gets from its token budget)
                if tok.count_tokens(summary) >= tok.count_tokens(t):
                    summary = summary[: max(1, len(t) // 2)]
                out_ids.append(i); out_texts.append(summary)
                out_done.append(tok.count_tokens(summary) <= target_tokens)
            yield pd.DataFrame({"id": out_ids, "text": out_texts, "done": out_done})

    cur = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).withColumn("done", F.lit(False))

    for _ in range(max_rounds):
        cur = cur.select("id", "text").mapInPandas(
            round_fn, schema="id string, text string, done boolean"
        ).localCheckpoint()
        if cur.filter(~F.col("done")).isEmpty():
            break

    return cur.select(F.col("id").alias(id_col), F.col("text").alias("summary"))
