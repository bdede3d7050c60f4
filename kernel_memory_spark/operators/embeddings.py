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


def hashing_tf_sparse(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    signed: bool = True,
    l2_normalize: bool = True,
) -> DataFrame:
    """Feature-hashing (hashing-trick) sparse TF vectors -> exploded
    (id, pos, val) rows (Weinberger et al. 2009): each word lands in
    bucket md5('fh|'+word) % dim, optionally with a +/-1 sign from an
    independent md5 window so collisions cancel in expectation
    (E[<phi(a), phi(b)>] = <tf_a, tf_b>); per-document L2 normalization
    makes downstream cosine a plain dot product.

    Unlike the pipeline's mapInPandas embedder (gen_embeddings, which
    stands in for a model endpoint), this is PURE column algebra — no
    Python anywhere, vocabulary-free (no fit step, no dictionary to
    broadcast at 10^12 docs), and md5-replayable, so the exact vectors
    are pinned cross-engine. One explode (linear in tokens) + two hash
    aggregates."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fh|"), F.col("w"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(dim),
    )
    if signed:
        sign_bit = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("fh|"), F.col("w"))), 9, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        contrib = F.when(sign_bit == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
    else:
        contrib = F.lit(1.0)
    vals = (
        words.select("id", bucket.alias("pos"), contrib.alias("__c"))
        .groupBy("id", "pos")
        .agg(F.sum("__c").alias("val"))
        .filter(F.col("val") != 0.0)
    )
    if not l2_normalize:
        return vals.select(F.col("id").alias(id_col), "pos", "val")
    norms = vals.groupBy("id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("__n")
    )
    return vals.join(norms, "id").select(
        F.col("id").alias(id_col),
        "pos",
        (F.col("val") / F.col("__n")).alias("val"),
    )
