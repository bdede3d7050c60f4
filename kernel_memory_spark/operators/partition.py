"""Stage `partition`: extracted text -> token-bounded partitions.

Re-expresses TextPartitioningHandler (archived/km-v1/service/Core/Handlers/
TextPartitioningHandler.cs:71-194): runs the hierarchical chunker per
document, emits one row per partition with deterministic ids
(`{file_id}.partition.{n}`, DataPipeline.cs:196-199) and the content sha256
(TextPartitioningHandler.cs:177). Pipeline defaults MaxTokensPerParagraph=1000
/ OverlappingTokens=100 (TextPartitioningOptions.cs:14-19).

Execution shape: the chunker is Python, so it runs as one Arrow-batched
pandas UDF `text -> array<string>` — embarrassingly parallel per document,
no shuffle; posexplode afterwards is a narrow op. At 100TB the cost profile
is pure map-side CPU that scales with executor count.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kernel_memory_spark.functions.chunker import (
    MarkDownChunker,
    PlainTextChunker,
    PlainTextChunkerOptions,
)
from kernel_memory_spark.functions.tokenizers import (
    NCharTokenizer,
    WordTokenizer,
)

DEFAULT_MAX_TOKENS = 1000
DEFAULT_OVERLAP = 100

# DataPipeline.ArtifactTypes (DataPipeline.cs:162-185): the kinds
# SaveRecordsHandler consumes are TextPartition and SyntheticData
# (SaveRecordsHandler.cs:255-259).
ARTIFACT_TEXT_PARTITION = "text_partition"
ARTIFACT_SYNTHETIC_DATA = "synthetic_data"
SAVABLE_ARTIFACT_TYPES = (ARTIFACT_TEXT_PARTITION, ARTIFACT_SYNTHETIC_DATA)


def filter_artifact_types(df: DataFrame, types=SAVABLE_ARTIFACT_TYPES,
                          col: str = "artifact_type") -> DataFrame:
    """F3: artifact-type filter (SaveRecordsHandler.GetListOfPartitionFiles,
    SaveRecordsHandler.cs:255-259 — keep TextPartition | SyntheticData).
    A plain isin Column, so it pushes into the parquet scan."""
    return df.filter(F.col(col).isin(list(types)))


def upgrade_partitions(df: DataFrame) -> DataFrame:
    """Read-side schema self-upgrade (mirrors upgrade_records): a partitions
    table written before artifact_type existed gets the column defaulted to
    'text_partition' — every pre-change partition was a text partition, so
    resume on an old catalog keeps working instead of failing column
    resolution in filter_artifact_types."""
    if "artifact_type" not in df.columns:
        df = df.withColumn(
            "artifact_type", F.lit(ARTIFACT_TEXT_PARTITION)
        )
    return df


def _make_tokenizer(name: str):
    if name.endswith("char"):
        return NCharTokenizer(int(name[:-4]))
    if name == "word":
        return WordTokenizer()
    raise ValueError(f"unknown tokenizer {name!r}")


def chunk_udf(
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
    tokenizer: str = "4char",
    chunk_header: Optional[str] = None,
    fmt: str = "plain",
):
    """Arrow-vectorized pandas UDF: text -> array<string> of chunks.
    fmt='markdown' selects the markdown separator tiers (C6)."""

    opts = dict(
        max_tokens_per_chunk=max_tokens, overlap=overlap, chunk_header=chunk_header
    )
    tok_name = tokenizer
    cls = MarkDownChunker if fmt == "markdown" else PlainTextChunker

    @pandas_udf("array<string>")
    def _chunk(texts: pd.Series) -> pd.Series:
        chunker = cls(_make_tokenizer(tok_name))
        options = PlainTextChunkerOptions(**opts)
        return texts.map(lambda t: chunker.split(t or "", options))

    # The chunker IS deterministic, but marking it non-deterministic stops
    # the optimizer from duplicating the (expensive) UDF around the
    # `size(chunks) > 0` filter that InferFiltersFromGenerate inserts below
    # posexplode: with the default marking every consumer's plan carried TWO
    # ArrowEvalPython chunker nodes per scan (one under the pushed filter,
    # one in the projection), doubling the dominant Python cost of the
    # partition stage. Generate itself skips null/empty arrays, so dropping
    # the inferred filter changes nothing about the output.
    return _chunk.asNondeterministic()


def partition(
    extracted: DataFrame,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
    tokenizer: str = "4char",
) -> DataFrame:
    """EXTRACTED -> PARTITIONS (schema.PARTITIONS)."""
    chunks = chunk_udf(max_tokens, overlap, tokenizer)

    token_count = (
        F.ceil(F.length("text") / F.lit(float(tokenizer[:-4]))).cast("int")
        if tokenizer.endswith("char")
        else F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]|\s+"), 0))
    )

    return (
        extracted.withColumn("chunks", chunks(F.col("text")))
        .select(
            "doc_id",
            "file_id",
            F.posexplode("chunks").alias("partition_number", "text"),
        )
        .select(
            "doc_id",
            "file_id",
            F.format_string("%s.partition.%d", "file_id", "partition_number").alias(
                "partition_id"
            ),
            F.col("partition_number").cast("int"),
            F.lit(0).cast("int").alias("section_number"),
            "text",
            F.sha2("text", 256).alias("text_sha256"),
            token_count.alias("token_count"),
            # ArtifactTypes.TextPartition (DataPipeline.cs:162-185); the
            # summarization stage emits 'synthetic_data' rows (F3 filter)
            F.lit(ARTIFACT_TEXT_PARTITION).alias("artifact_type"),
        )
    )
