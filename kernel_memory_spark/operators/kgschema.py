"""KG schema discovery: per-predicate profiling of a triple relation.

The reference declares its graph schema up front (GraphSearchIndexConfig —
fixed node/edge types); a KG constructed FROM data at 100 TB has no
declared schema, so the first analysis any downstream consumer runs is
"what predicates exist, and how do they behave". These are the standard
ontology-alignment statistics (functionality / inverse functionality from
PARIS, Suchanek et al. 2011): a predicate with functionality ~1 is a
key-like attribute (one object per subject); inverse functionality ~1
means objects identify subjects — the pair drives which predicates are
safe to join or merge entities on.

One hash aggregate over the triple relation per statistic family — no
joins, no iteration; count_distinct is the only expensive reduction and
can be swapped for approx_count_distinct (HLL) at full scale, mirroring
operators/profile.py's exact/approx switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_stats(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    approx: bool = False,
) -> DataFrame:
    """Per-predicate profile -> (pred, n_triples, n_subj, n_obj,
    functionality, inv_functionality).

    functionality = n_subj / n_triples (1.0 iff every subject has exactly
    one object for this predicate); inv_functionality = n_obj / n_triples.
    `approx=True` switches distinct counts to HLL for the 100 TB path
    (exact by default so the DuckDB oracle matches bit-for-bit).
    """
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(c))
    )
    return (
        triples.groupBy(F.col(pred).alias("pred"))
        .agg(
            F.count("*").alias("n_triples"),
            nd(subj).alias("n_subj"),
            nd(obj).alias("n_obj"),
        )
        .select(
            "pred",
            "n_triples",
            "n_subj",
            "n_obj",
            F.round(F.col("n_subj") / F.col("n_triples"), 6).alias(
                "functionality"
            ),
            F.round(F.col("n_obj") / F.col("n_triples"), 6).alias(
                "inv_functionality"
            ),
        )
    )
