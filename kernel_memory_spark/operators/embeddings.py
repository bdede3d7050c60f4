"""Stage `gen_embeddings`: partition text -> unit-normalized float32 vectors.

Mirrors GenerateEmbeddingsHandler (archived/km-v1/service/Core/Handlers/
GenerateEmbeddingsHandler.cs:61-140, batch control :75-99) and the write-time
normalization trick (SqliteVectorIndex.cs:143-147): vectors are L2-normalized
here so query-time similarity is a dot product.

Scale design:
- identical chunks are embedded once: distinct() on the content hash, embed,
  then join back — the DataFrame equivalent of the reference's embedding
  cache keyed by (model, text-hash) (src/Core/Embeddings/
  CachedEmbeddingGenerator.cs);
- embedding runs inside mapInPandas with Arrow batches (the real generator
  would call a model endpoint per batch; the default is the deterministic
  feature-hash embedding so tests/benches are hermetic).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.functions.vectors import (
    DEFAULT_DIM,
    GENERATOR,
    PROVIDER,
    hash_embed,
)


def gen_embeddings(
    partitions: DataFrame,
    dim: int = DEFAULT_DIM,
    dedupe: bool = True,
) -> DataFrame:
    """PARTITIONS -> EMBEDDINGS (schema.EMBEDDINGS)."""

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [hash_embed(t or "", dim).tolist() for t in pdf["text"]]
            yield pd.DataFrame(
                {"text_sha256": pdf["text_sha256"], "vector": vecs}
            )

    if dedupe:
        distinct_texts = partitions.select("text_sha256", "text").dropDuplicates(
            ["text_sha256"]
        )
        vectors = distinct_texts.mapInPandas(
            embed, schema="text_sha256 string, vector array<float>"
        )
        joined = partitions.select("partition_id", "doc_id", "text_sha256").join(
            vectors, "text_sha256"
        )
    else:
        vectors = partitions.select(
            "partition_id", "doc_id", "text_sha256", "text"
        ).mapInPandas(
            lambda it: (
                pd.DataFrame(
                    {
                        "partition_id": pdf["partition_id"],
                        "doc_id": pdf["doc_id"],
                        "text_sha256": pdf["text_sha256"],
                        "vector": [hash_embed(t or "", dim).tolist() for t in pdf["text"]],
                    }
                )
                for pdf in it
            ),
            schema="partition_id string, doc_id string, text_sha256 string,"
            " vector array<float>",
        )
        joined = vectors

    return joined.select(
        "partition_id",
        "doc_id",
        "vector",
        F.lit(PROVIDER).alias("vector_provider"),
        F.lit(GENERATOR).alias("vector_generator"),
    )
