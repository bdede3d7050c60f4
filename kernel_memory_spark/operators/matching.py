"""Pairwise match scoring for entity resolution: the comparison +
classification stage that follows blocking (operators/blocking.py) and
precedes clustering (operators/linking.py connected components).

The reference resolves duplicates by exact id/hash equality
(archived/km-v1/service/Core/Handlers/SaveRecordsHandler.cs upsert keys);
a KG built from dirty interleaved corpora needs the classic record-linkage
recipe instead (Fellegi & Sunter 1969; Christen 2012): generate bounded
candidate pairs by blocking, compute a small vector of cheap similarity
features per pair, combine into a score, and classify into
match / possible / non_match tiers for the downstream linker.

Scale shape: two hash joins on the record key to attach both sides'
attributes to the (already bounded) candidate set, then pure column
algebra per pair — levenshtein is capped to a fixed-length prefix so the
per-pair cost is O(prefix^2) constant, never O(doc^2). No Python, no
collect, no shuffle beyond the two key joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed feature weights and tier cuts (a trained Fellegi-Sunter model
# would fit these from labeled m/u probabilities; deterministic constants
# keep the operator oracle-replayable)
_W_JACCARD = 0.5
_W_LEV = 0.3
_W_LEN = 0.2
_T_MATCH = 0.75
_T_POSSIBLE = 0.45


def _tokens(col):
    return F.array_distinct(F.split(F.lower(F.trim(col)), r"\s+"))


def match_scores(
    candidates: DataFrame,
    records: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    a: str = "a",
    b: str = "b",
    prefix_len: int = 80,
) -> DataFrame:
    """Candidate pairs (a, b) + records (key, text) -> per-pair feature
    vector and tier: (a, b, token_jaccard, lev_sim, len_ratio, score,
    tier).

    Features (each in [0, 1]):
      * token_jaccard — distinct-word-set overlap, the workhorse textual
        agreement signal;
      * lev_sim — 1 - levenshtein(prefix_a, prefix_b) / max prefix
        length, edit similarity on the first `prefix_len` lowercased
        chars (capped so a pathological pair of 1 MB documents costs the
        same as a pair of titles);
      * len_ratio — min/max full-text length, a cheap structural prior
        (true duplicates rarely differ 10x in size).

    score = 0.5*jaccard + 0.3*lev_sim + 0.2*len_ratio, rounded to 6
    places BEFORE tiering so the tier boundaries are decided on the same
    value in every engine. Tiers: match >= 0.75 > possible >= 0.45 >
    non_match (Fellegi-Sunter's accept / clerical-review / reject
    regions)."""
    rec = records.select(
        F.col(key).alias("__k"),
        F.lower(F.trim(F.col(text_col))).alias("__t"),
    )
    pairs = (
        candidates.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .join(rec.select(F.col("__k").alias("a"),
                         F.col("__t").alias("__ta")), "a")
        .join(rec.select(F.col("__k").alias("b"),
                         F.col("__t").alias("__tb")), "b")
    )
    pa = F.substring("__ta", 1, prefix_len)
    pb = F.substring("__tb", 1, prefix_len)
    wa, wb = _tokens(F.col("__ta")), _tokens(F.col("__tb"))
    la, lb = F.length("__ta"), F.length("__tb")
    jac = F.size(F.array_intersect(wa, wb)) / F.greatest(
        F.size(F.array_union(wa, wb)), F.lit(1)
    )
    lev = F.lit(1.0) - F.levenshtein(pa, pb) / F.greatest(
        F.length(pa), F.length(pb), F.lit(1)
    )
    lenr = F.least(la, lb) / F.greatest(la, lb, F.lit(1))
    scored = pairs.select(
        "a",
        "b",
        F.round(jac, 6).alias("token_jaccard"),
        F.round(lev, 6).alias("lev_sim"),
        F.round(lenr, 6).alias("len_ratio"),
        F.round(
            _W_JACCARD * jac + _W_LEV * lev + _W_LEN * lenr, 6
        ).alias("score"),
    )
    return scored.withColumn(
        "tier",
        F.when(F.col("score") >= _T_MATCH, F.lit("match"))
        .when(F.col("score") >= _T_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
    block_len: int = 4,
    len_band: int = 1,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked edit-distance self-join -> (id_a, id_b, text_a, text_b,
    dist): candidate pairs share their first `block_len` characters and
    differ in length by <= len_band, and survivors have
    levenshtein(text_a, text_b) <= max_distance.

    The length band is a NECESSARY condition for lev <= k (each edit
    changes length by at most 1); the shared prefix is the lossy
    candidate-generation step, part of the operator's contract exactly
    like LSH banding in dedup.py — an edit inside the prefix is missed,
    recall is documented, and the blocking replays deterministically in
    any engine. Cost shape: one equi-join on the block key (never an
    all-pairs comparison), per-pair work is one bounded levenshtein;
    `max_block` drops blocks larger than the cap before the join (the
    hot-bucket guard), so a degenerate key ('', 'unknown', ...) cannot
    fan out quadratically at 10^12 rows."""
    keys = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.substring(F.col(text_col), 1, block_len).alias("__blk"),
        F.length(F.col(text_col)).alias("__len"),
    )
    if max_block is not None:
        sizes = keys.groupBy("__blk").agg(F.count("*").alias("__n"))
        keys = (
            keys.join(sizes, "__blk")
            .filter(F.col("__n") <= max_block)
            .drop("__n")
        )
    a = keys.select(
        F.col("__blk"),
        F.col("__id").alias("id_a"),
        F.col("__t").alias("text_a"),
        F.col("__len").alias("__la"),
    )
    b = keys.select(
        F.col("__blk"),
        F.col("__id").alias("id_b"),
        F.col("__t").alias("text_b"),
        F.col("__len").alias("__lb"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.col("__la") - F.col("__lb")) <= len_band
        )
        .withColumn(
            "dist", F.levenshtein(F.col("text_a"), F.col("text_b"))
        )
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "text_a", "text_b", "dist")
    )
