"""TF-IDF keyword extraction — per-document top-k salient terms.

The reference tags memory records with caller-supplied tags only
(SaveRecords payload tags); a 10^12-doc corpus also needs MACHINE-derived
tags, and per-doc TF-IDF top-k is the standard first-order keyword
extractor (Salton & Buckley 1988; smooth-idf variant as popularized by
scikit-learn: idf = ln((1+N)/(1+df)) + 1).

Scale design: term frequencies are a hash aggregate on (doc, term) with
map-side combine; document frequencies aggregate the DISTINCT (doc, term)
relation that the tf step already produced (no second tokenize pass); the
idf join is keyed on term (|vocab| rows, not |tokens|); and the top-k cut
is a window partitioned BY DOCUMENT — thousands of independent partitions,
never a global sort. The only scalar to reach the driver is N. All column
algebra, deterministic, DuckDB-replayable (scores rounded before the
ordering so cross-libm last-ulp log differences cannot flip a rank; term
is the tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_len: int = 3,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF -> (id, term, tf,
    score, rn). Terms are lowercase alphabetic runs of length >=
    min_len; score = tf * (ln((1+N)/(1+df)) + 1), rounded to 6 places
    (the rounded value also drives the ranking; ties break on term)."""
    n_docs = df.select(id_col).distinct().count()
    terms = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_len)
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    idf = tf.groupBy("term").agg(
        (
            F.log(
                (F.lit(1.0 + n_docs))
                / (F.count("*").cast("double") + F.lit(1.0))
            )
            + F.lit(1.0)
        ).alias("idf")
    )
    scored = tf.join(idf, "term").withColumn(
        "score", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("id", "term", "tf", "score", "rn")
    )
