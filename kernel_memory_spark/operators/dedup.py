"""Deduplication operators for large-scale training-data pipelines.

Four strategies over a (id, text) corpus, all shuffle-bounded:

- exact:   sha-256 hash groupBy, keep the minimum id per group (one shuffle
           on the content hash — uniform keys, no skew);
- minhash: MinHash+LSH near-dup pairs (shingle -> signature -> band ->
           bucket equi-join), same construction as entity linking;
- simhash: 64-bit simhash with banded blocking (4 x 16-bit bands; Hamming
           distance <= 3 verified on candidates);
- ngram:   word n-gram Jaccard over LSH candidates (exact verify).

Each returns either survivors or the duplicate pair set so callers can pick
keep-strategy separately.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kernel_memory_spark.functions.minhash import (
    band_keys,
    jaccard,
    minhash_signature,
)


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep min(id) per identical normalized text (hash-groupBy)."""
    hashed = df.withColumn("__h", F.sha2(F.col(text_col), 256))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(keep, [ "__h", id_col], "left_semi").drop("__h")
    )


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate (a, b, jaccard) pairs via MinHash-LSH blocking."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "text": pdf[text_col],
                    "bands": [
                        band_keys(minhash_signature(t or ""))
                        for t in pdf[text_col]
                    ],
                }
            )

    sigs = df.select(id_col, text_col).mapInPandas(
        sig, schema="id string, text string, bands array<string>"
    )
    exploded = sigs.select("id", "text", F.explode("bands").alias("band"))
    l, r = exploded.alias("l"), exploded.alias("r")
    cands = (
        l.join(r, F.col("l.band") == F.col("r.band"))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("l.text").alias("ta"),
            F.col("r.id").alias("b"),
            F.col("r.text").alias("tb"),
        )
        .dropDuplicates(["a", "b"])
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "a": pdf["a"],
                    "b": pdf["b"],
                    "jaccard": [
                        jaccard(x or "", y or "")
                        for x, y in zip(pdf["ta"], pdf["tb"])
                    ],
                }
            )

    scored = cands.mapInPandas(verify, schema="a string, b string, jaccard double")
    return scored.filter(F.col("jaccard") >= threshold)


def _simhash64(text: str) -> int:
    acc = [0] * 64
    t = " " + (text or "").lower() + " "
    for i in range(max(1, len(t) - 2)):
        h = zlib.crc32(t[i : i + 3].encode("utf-8"))
        h = (h << 32) | zlib.crc32(t[i : i + 3].encode("utf-16-le"))
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dups: 4x16-bit band blocking guarantees detection of any
    pair within Hamming distance 3 (pigeonhole), then exact popcount verify."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs = [_simhash64(t) for t in pdf[text_col]]
            signed = [h - (1 << 64) if h & (1 << 63) else h for h in hs]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "sim": pd.array(signed, dtype="int64"),
                    "bands": [
                        [f"{k}:{(h >> (16 * k)) & 0xFFFF:04x}" for k in range(4)]
                        for h in hs
                    ],
                }
            )

    sigs = df.select(id_col, text_col).mapInPandas(
        sig, schema="id string, sim long, bands array<string>"
    )
    exploded = sigs.select("id", "sim", F.explode("bands").alias("band"))
    l, r = exploded.alias("l"), exploded.alias("r")
    cands = (
        l.join(r, F.col("l.band") == F.col("r.band"))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"), F.col("l.sim").alias("sa"),
            F.col("r.id").alias("b"), F.col("r.sim").alias("sb"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cands.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Word n-gram Jaccard, fully JVM-side (no Python): explode distinct
    n-grams, pair docs sharing a gram, count intersections, compute
    |A∩B| / (|A|+|B|-|A∩B|). The gram equi-join is the blocking step."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            )
        ).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))

    exploded = grams.select("id", "n_grams", F.explode("grams").alias("g"))
    l, r = exploded.alias("l"), exploded.alias("r")
    inter = (
        l.join(r, F.col("l.g") == F.col("r.g"))
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.n_grams").alias("na"),
            F.col("r.n_grams").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return inter.select(
        "a", "b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
