"""Deduplication operators for large-scale training-data pipelines.

Four strategies over a (id, text) corpus, all shuffle-bounded and all using
the same scale discipline as entity linking (operators/linking.py):

- exact:   sha-256 hash groupBy, keep the minimum id per group (one shuffle
           on the content hash — uniform keys, no skew);
- minhash: MinHash+LSH near-dup pairs (shingle -> signature -> band ->
           bucket equi-join), same construction as entity linking;
- simhash: 64-bit simhash with banded blocking (4 x 16-bit bands; Hamming
           distance <= max_hamming verified on candidates). The hash is
           md5-derived (2 low bits per hex nibble), so the construction is
           bit-for-bit reproducible in ANSI SQL — the DuckDB oracle in
           __spark_entry__ replays it exactly;
- ngram:   word n-gram Jaccard with a gram document-frequency cap (exact
           verify over the capped gram space).

Scale invariants (the 100TB contract):
- candidate pairs are generated from band/gram equi-joins, never from a
  cross join — pair volume is Σ bucket², bounded by the hot-bucket cap;
- band buckets larger than `bucket_cap` are dropped BEFORE pair generation
  (a common-shingle mega-bucket is O(bucket²); true near-dups share many
  bands, so they survive the cap — same guard as linking.candidate_pairs);
- joins carry ids only; document text / signatures are re-joined onto the
  (far smaller) deduplicated candidate set for the verify stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kernel_memory_spark.functions.minhash import (
    band_keys,
    jaccard,
    minhash_signature,
)

# Same hot-bucket guard as entity linking (linking.BAND_BUCKET_CAP): a band
# bucket with more members than this is dropped before pair generation.
BAND_BUCKET_CAP = 64
# Word n-grams occurring in more than this many documents are too common to
# block on (stopword-like) — a frequency cap keeps the gram self-join from
# going quadratic on one shared gram.
GRAM_DF_CAP = 64


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep min(id) per identical normalized text (hash-groupBy)."""
    hashed = df.withColumn("__h", F.sha2(F.col(text_col), 256))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(keep, [ "__h", id_col], "left_semi").drop("__h")
    )


def _drop_hot_buckets(exploded: DataFrame, keys: list, cap: int) -> DataFrame:
    """Remove rows whose bucket (grouped by `keys`) exceeds `cap` members."""
    hot = (
        exploded.groupBy(*keys)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > cap)
        .select(*keys)
    )
    return exploded.join(F.broadcast(hot), keys, "left_anti")


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    bucket_cap: int = BAND_BUCKET_CAP,
) -> DataFrame:
    """Near-duplicate (a, b, jaccard) pairs via MinHash-LSH blocking.

    Signatures carry ids only through the 32-band explode + self-join (text
    would amplify the shuffle 32x); text is joined back onto the deduplicated
    candidate set for exact-Jaccard verification."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "bands": [
                        band_keys(minhash_signature(t or ""))
                        for t in pdf[text_col]
                    ],
                }
            )

    # materialize once — the exploded band table feeds the hot-bucket
    # aggregation and both self-join sides (3 consumers of the UDF subtree)
    sigs = df.select(id_col, text_col).mapInPandas(
        sig, schema="id string, bands array<string>"
    ).localCheckpoint()
    exploded = sigs.select("id", F.explode("bands").alias("band"))
    cool = _drop_hot_buckets(exploded, ["band"], bucket_cap)
    l, r = cool.alias("l"), cool.alias("r")
    cands = (
        l.join(r, F.col("l.band") == F.col("r.band"))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )

    texts = df.select(
        F.col(id_col).alias("__tid"), F.col(text_col).alias("__text")
    )
    with_text = (
        cands.join(texts, cands["a"] == texts["__tid"])
        .select("a", "b", F.col("__text").alias("ta"))
        .join(texts, F.col("b") == texts["__tid"])
        .select("a", "b", "ta", F.col("__text").alias("tb"))
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

    scored = with_text.mapInPandas(verify, schema="a string, b string, jaccard double")
    return scored.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash — md5-derived bits, SQL-reproducible, numpy-vectorized
# ---------------------------------------------------------------------------

def _char_3grams(text: str) -> list:
    """Char 3-grams of ' '+lower(text)+' ', WITH repeats (classic simhash
    weights bits by term frequency). Identical construction to the SQL form
    `substr(' ' || lower(text) || ' ', i+1, 3)` for
    i in range(greatest(len - 2, 1)), so the Python, Spark, and DuckDB
    variants agree byte-for-byte."""
    t = " " + (text or "").lower() + " "
    n = max(len(t) - 2, 1)
    return [t[i : i + 3] for i in range(n)]


def _gram_bits(gram: str) -> np.ndarray:
    """(64,) int8 bit vector for one gram: bits (2j, 2j+1) are the two low
    bits of hex-nibble j of md5(gram) — a construction any SQL engine with
    md5/substr can replay (no 64-bit hex parsing needed)."""
    digest = hashlib.md5(gram.encode("utf-8")).digest()
    v = np.frombuffer(digest, dtype=np.uint8)
    nib = np.empty(32, dtype=np.uint8)
    nib[0::2] = v >> 4
    nib[1::2] = v & 15
    out = np.empty(64, dtype=np.int8)
    out[0::2] = nib & 1
    out[1::2] = (nib >> 1) & 1
    return out


def simhash_bands(text: str, memo: dict | None = None) -> list:
    """[b0, b1, b2, b3] — four 16-bit band values of the 64-bit simhash.
    Majority vote per bit over the gram bit matrix (+1/-1, ties -> 0)."""
    grams = _char_3grams(text)
    if memo is None:
        rows = [_gram_bits(g) for g in grams]
    else:
        rows = []
        for g in grams:
            r = memo.get(g)
            if r is None:
                r = _gram_bits(g)
                memo[g] = r
            rows.append(r)
    bits = np.stack(rows).astype(np.int32)  # (n, 64)
    votes = bits.sum(axis=0) * 2 - len(grams)
    final = (votes > 0).astype(np.int64)  # (64,)
    weights = 1 << np.arange(16, dtype=np.int64)
    return [int(x) for x in final.reshape(4, 16) @ weights]


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bucket_cap: int = BAND_BUCKET_CAP,
) -> DataFrame:
    """SimHash near-dups (a, b, hamming): 4x16-bit band blocking guarantees
    detection of any pair within Hamming distance 3 (pigeonhole), exact
    popcount verify on candidates. Ids-only band join; the four band values
    (the full signature) are re-joined per side for the verify."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            vals = np.array(
                [simhash_bands(t, memo) for t in pdf[text_col]], dtype=np.int64
            ).reshape(-1, 4)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "v0": vals[:, 0], "v1": vals[:, 1],
                    "v2": vals[:, 2], "v3": vals[:, 3],
                }
            )

    sigs = df.select(id_col, text_col).mapInPandas(
        sig, schema="id string, v0 long, v1 long, v2 long, v3 long"
    ).localCheckpoint()

    exploded = sigs.select(
        "id",
        F.posexplode(F.array("v0", "v1", "v2", "v3")).alias("k", "val"),
    )
    cool = _drop_hot_buckets(exploded, ["k", "val"], bucket_cap)
    l, r = cool.alias("l"), cool.alias("r")
    cands = (
        l.join(r, (F.col("l.k") == F.col("r.k")) & (F.col("l.val") == F.col("r.val")))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    sa = sigs.select(
        F.col("id").alias("a"), F.col("v0").alias("a0"), F.col("v1").alias("a1"),
        F.col("v2").alias("a2"), F.col("v3").alias("a3"),
    )
    sb = sigs.select(
        F.col("id").alias("b"), F.col("v0").alias("b0"), F.col("v1").alias("b1"),
        F.col("v2").alias("b2"), F.col("v3").alias("b3"),
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))) for k in range(4)
    )
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def pm1_planes(n_planes: int, dim: int) -> np.ndarray:
    """(n_planes, dim) +/-1 hyperplanes derived from md5('plane|i|j') — a
    deterministic construction any SQL engine with md5 can replay (the
    DuckDB oracle rebuilds the identical weight table), unlike np.random
    Gaussians. +/-1 planes are the standard cheap variant of sign-random-
    projection LSH (Charikar '02 works for any symmetric distribution)."""
    w = np.empty((n_planes, dim), dtype=np.int8)
    for i in range(n_planes):
        for j in range(dim):
            nibble = int(
                hashlib.md5(f"plane|{i}|{j}".encode("utf-8")).hexdigest()[0], 16
            )
            w[i, j] = 1 if nibble % 2 == 1 else -1
    return w


def cosine_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    n_planes: int = 8,
    bucket_cap: int = BAND_BUCKET_CAP,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a, b, cos): sign-random-projection
    blocking (one bucket = the 8-bit sign pattern of the +/-1 hyperplane
    dots), hot-bucket cap, ids-only bucket self-join, exact JVM-side cosine
    verify on the candidates. Near-identical vectors agree on every
    hyperplane sign, so true near-dups share the bucket; the cap bounds any
    degenerate bucket at cap^2 pairs."""
    planes = pm1_planes(n_planes, dim)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ).reshape(len(pdf), dim)
            signs = (mat @ planes.T) > 0  # (n, planes)
            buckets = signs.dot(1 << np.arange(n_planes)).astype("int64")
            yield pd.DataFrame({"id": pdf[id_col], "bucket": buckets})

    # materialize once: the bucket table feeds the hot-bucket aggregation
    # AND both self-join sides — without this the UDF subtree re-executes
    # for every consumer (4x the Python cost)
    bucketed = df.select(id_col, vec_col).mapInPandas(
        bucketize, schema="id long, bucket long"
    ).localCheckpoint()
    cool = _drop_hot_buckets(bucketed, ["bucket"], bucket_cap)
    l, r = cool.alias("l"), cool.alias("r")
    cands = (
        l.join(r, F.col("l.bucket") == F.col("r.bucket"))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("__vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x * x),
            F.lit(0.0), lambda acc, v: acc + v,
        )
    )
    return (
        cands.join(vecs, cands["a"] == vecs["__vid"])
        .select("a", "b", F.col("__v").alias("va"))
        .join(vecs, F.col("b") == vecs["__vid"])
        .select("a", "b", "va", F.col("__v").alias("vb"))
        .select(
            "a", "b",
            F.round(dot / (norm("va") * norm("vb")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    gram_df_cap: int = GRAM_DF_CAP,
) -> DataFrame:
    """Word n-gram Jaccard, fully JVM-side (no Python): explode distinct
    n-grams, drop grams shared by more than `gram_df_cap` documents
    (stopword-like grams are quadratic in the self-join and carry no dedup
    signal), pair docs sharing a surviving gram, compute
    |A∩B| / (|A|+|B|-|A∩B|) over the capped gram space."""
    inter, sizes = _gram_intersections(
        df, id_col, text_col, n, gram_df_cap
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n_grams").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n_grams").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _gram_intersections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    gram_df_cap: int,
):
    """Shared pair machinery for the n-gram similarity family ->
    (inter: (a, b, inter) with a < b over docs sharing a surviving gram,
    sizes: (id, n_grams) over the SAME capped gram space)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            )
        ).alias("grams"),
    )
    exploded = grams.select("id", F.explode("grams").alias("g"))
    # materialized once: consumed by sizes + both self-join sides (else the
    # split/explode subtree re-scans the source 3x)
    cool = _drop_hot_buckets(exploded, ["g"], gram_df_cap).localCheckpoint()
    sizes = cool.groupBy("id").agg(F.count("*").alias("n_grams"))

    l, r = cool.alias("l"), cool.alias("r")
    inter = (
        l.join(r, F.col("l.g") == F.col("r.g"))
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return inter, sizes


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    gram_df_cap: int = GRAM_DF_CAP,
) -> DataFrame:
    """ASYMMETRIC n-gram containment -> (src, dst, containment):
    containment(src in dst) = |grams(src) ∩ grams(dst)| / |grams(src)|
    (Broder 1997's containment coefficient). Catches what Jaccard
    structurally cannot: a short document quoted wholesale inside a much
    longer one has tiny Jaccard (union is dominated by the long doc) but
    containment ~1 — the quote/subset/boilerplate-page case an LLM
    training-dedup pass must see.

    Same capped-gram pair machinery as ngram_jaccard_pairs (one
    intersection count per unordered pair, derived in BOTH directions
    afterwards — the asymmetry costs nothing extra in the shuffle)."""
    inter, sizes = _gram_intersections(
        df, id_col, text_col, n, gram_df_cap
    )
    directed = inter.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "inter"
    ).unionByName(
        inter.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "inter"
        )
    )
    nsrc = sizes.select(
        F.col("id").alias("src"), F.col("n_grams").alias("n_src")
    )
    return (
        directed.join(nsrc, "src")
        .select(
            "src",
            "dst",
            (F.col("inter") / F.col("n_src")).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def collapse_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "dup_a",
    b_col: str = "dup_b",
) -> DataFrame:
    """The dedup ACTION: fold near-duplicate PAIRS into groups and elect a
    canonical representative -> (id, canonical_id, cluster_size, is_kept).

    Pair finders (minhash/simhash/ngram/cosine dup pairs above) emit an
    edge relation; transitive closure makes the groups (A~B, B~C => one
    group even if A,C never paired directly), and min-label-propagation
    connected components (canonicalize.connected_components — the same
    operator that canonicalizes KG entity aliases) computes exactly that,
    checkpointed per round with a convergence guard. Canonical member =
    min id. Documents in no pair are their own singleton group (the
    left-join + coalesce keeps them without ever materializing singleton
    edges). Downstream: filter is_kept for the deduplicated corpus, or
    join canonical_id to re-point references into collapsed docs.

    Scale: |pairs| rows into CC (bounded by the finders' caps), one keyed
    join back to ids, one count agg for sizes — never quadratic in docs.
    """
    from kernel_memory_spark.operators.canonicalize import (
        connected_components,
    )

    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    comp = connected_components(edges).select(
        F.col("norm").alias("id"), "component"
    )
    ids = docs.select(F.col(id_col).alias("id"))
    lab = ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("canonical_id")
    )
    sizes = lab.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return lab.join(sizes, "canonical_id").select(
        "id",
        "canonical_id",
        "cluster_size",
        (F.col("id") == F.col("canonical_id")).alias("is_kept"),
    )


def prefix_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT all-pairs token-Jaccard join -> (a, b, n_common, jaccard)
    for every pair with Jaccard >= threshold — prefix filtering
    (Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008 PPJoin), the
    lossless counterpart to this module's LSH/capped-gram family: no
    bands, no caps, no missed pairs.

    Why it scales: order every token by global rarity (document
    frequency asc, token asc) and keep only each document's first
    L = n - ceil(t*n) + 1 tokens as its PREFIX. Two sets with Jaccard
    >= t MUST share a prefix token under the same global order (if all
    shared tokens sat outside both prefixes, too few distinct tokens
    would remain to reach t), so the candidate join runs on the prefix
    relation — dominated by RARE tokens with tiny fan-out, while the
    stopword tokens that make a naive token self-join quadratic sit at
    the end of the order and never enter a prefix unless a document is
    almost all stopwords. A length filter (|y| >= t*|x|) prunes
    candidates that cannot reach t on size alone; survivors are verified
    EXACTLY by counting shared tokens over the full token relation
    restricted to candidate pairs (O(|candidates| * doc length), ids
    only).

    Per-document window sorts are bounded by document length; no
    Python, no driver collect."""
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
                )
            ).alias("token"),
        )
        .filter(F.length("token") >= 1)
        .localCheckpoint()
    )
    tdf = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("token_df")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("token_df").asc(), F.col("token").asc()
    )
    ranked = (
        toks.join(tdf, "token")
        .select(
            "id",
            "token",
            F.row_number().over(w).alias("pos"),
            F.count(F.lit(1))
            .over(Window.partitionBy("id"))
            .alias("n_tokens"),
        )
    )
    prefix_len = (
        F.col("n_tokens")
        - F.ceil(F.lit(threshold) * F.col("n_tokens"))
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "id", "token", "n_tokens"
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "token")
        .filter(F.col("x.id") < F.col("y.id"))
        # length filter: the smaller set must be >= t * the larger
        .filter(
            F.least(F.col("x.n_tokens"), F.col("y.n_tokens"))
            >= F.lit(threshold)
            * F.greatest(F.col("x.n_tokens"), F.col("y.n_tokens"))
        )
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.col("x.n_tokens").alias("na"),
            F.col("y.n_tokens").alias("nb"),
        )
        .distinct()
        .localCheckpoint()
    )
    # semi-join keyed on (b, token): count surviving shared tokens
    inter = (
        cand.join(toks.withColumnRenamed("id", "a"), "a")
        .join(
            toks.select(F.col("id").alias("b"), "token"),
            ["b", "token"],
            "semi",
        )
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    jac = F.col("n_common") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.filter(jac >= F.lit(threshold))
        .select(
            "a", "b", "n_common", F.round(jac, 6).alias("jaccard")
        )
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    gram_df_cap: int = GRAM_DF_CAP,
) -> DataFrame:
    """IDF-weighted (soft) n-gram Jaccard -> (a, b, wjaccard):
    wsim(A,B) = W(A∩B) / (W(A) + W(B) - W(A∩B)) with each gram g
    weighted idf(g) = ln(N / df(g)) — Broder Jaccard where rare shared
    grams count for more and boilerplate counts for almost nothing (the
    standard fix when plain Jaccard is dominated by template text;
    Chowdhury et al. 2002's collection statistics for duplicate
    detection).

    Same scale skeleton as ngram_jaccard_pairs: distinct grams, hot-gram
    cap BEFORE the self-join (the cap also bounds every df at
    gram_df_cap, so idf is bounded below by ln(N/cap) > 0), weights
    joined keyed on the gram (|vocab| rows), ONE self-join summing
    intersection weight map-side. The threshold compares the 6-dp
    ROUNDED ratio (float sum order lesson from dimsum)."""
    inter_ids, sizes, wexp = _weighted_gram_parts(
        df, id_col, text_col, n, gram_df_cap
    )
    wa = sizes.select(F.col("id").alias("a"), F.col("w").alias("wa"))
    wb = sizes.select(F.col("id").alias("b"), F.col("w").alias("wb"))
    wsim = F.col("iw") / (F.col("wa") + F.col("wb") - F.col("iw"))
    return (
        inter_ids.join(wa, "a")
        .join(wb, "b")
        .select("a", "b", wsim.alias("wjaccard"))
        .filter(F.round(F.col("wjaccard"), 6) >= threshold)
    )


def _weighted_gram_parts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    gram_df_cap: int,
):
    """(pair intersection weights, per-doc weight sums, weighted gram
    relation) over the capped gram space."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(words) - n, F.lit(0))
                ),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            )
        ).alias("grams"),
    )
    exploded = grams.select("id", F.explode("grams").alias("g"))
    cool = _drop_hot_buckets(
        exploded, ["g"], gram_df_cap
    ).localCheckpoint()
    n_docs = float(df.select(F.col(id_col)).distinct().count())
    idf = cool.groupBy("g").agg(
        F.log(F.lit(n_docs) / F.count("*")).alias("idf")
    )
    wexp = cool.join(idf, "g").localCheckpoint()
    sizes = wexp.groupBy("id").agg(F.sum("idf").alias("w"))
    l, r = wexp.alias("l"), wexp.alias("r")
    inter = (
        l.join(r, F.col("l.g") == F.col("r.g"))
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(
            F.col("l.id").alias("a"), F.col("r.id").alias("b")
        )
        .agg(F.sum("l.idf").alias("iw"))
    )
    return inter, sizes, wexp
