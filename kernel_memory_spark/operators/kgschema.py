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


def type_subsumption(
    assignments: DataFrame,
    entity: str = "entity",
    type_col: str = "type",
    min_support: int = 1,
    tolerance: float = 0.0,
    max_types_per_entity: int = 64,
) -> DataFrame:
    """Instance-based type-hierarchy inference -> (sub_type, super_type,
    n_sub, n_super, n_common, containment): sub ⊑ super whenever
    containment = |inst(sub) ∩ inst(super)| / |inst(sub)| >= 1 - tolerance
    (and the pair is not symmetric-equal, resolved by (count, name) order).

    The standard subsumption-mining construction (Völker & Niepert 2011,
    statistical schema induction): no declared ontology, the hierarchy is
    read off instance containment. One self-join on the entity key
    produces co-assignment pairs; everything else is hash aggregates.

    Scale guards: entities carrying more than `max_types_per_entity`
    types are dropped BEFORE the pair join (a tag-spam entity with 10^4
    types contributes 10^8 pairs — same hub-cap pattern as dedup/linking),
    and types below `min_support` instances are pruned before pairing.
    """
    a = assignments.select(
        F.col(entity).alias("e"), F.col(type_col).alias("t")
    ).distinct()
    # hub cap: bounded multiset of types per entity
    per_e = a.groupBy("e").agg(F.count("*").alias("__nt"))
    a = a.join(
        per_e.filter(F.col("__nt") <= max_types_per_entity).select("e"),
        "e",
    )
    counts = a.groupBy("t").agg(F.count("*").alias("n")).filter(
        F.col("n") >= min_support
    )
    a = a.join(counts.select("t"), "t")
    pairs = (
        a.select(F.col("e"), F.col("t").alias("ta"))
        .join(a.select("e", F.col("t").alias("tb")), "e")
        .filter(F.col("ta") != F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        pairs.join(
            counts.select(F.col("t").alias("ta"), F.col("n").alias("n_sub")),
            "ta",
        )
        .join(
            counts.select(
                F.col("t").alias("tb"), F.col("n").alias("n_super")
            ),
            "tb",
        )
        .filter(
            F.col("n_common") >= (1.0 - tolerance) * F.col("n_sub")
        )
        # orient: strictly smaller class is the subtype; equal-extent
        # pairs orient by name so exactly one direction survives
        .filter(
            (F.col("n_sub") < F.col("n_super"))
            | (
                (F.col("n_sub") == F.col("n_super"))
                & (F.col("ta") < F.col("tb"))
            )
        )
    )
    return out.select(
        F.col("ta").alias("sub_type"),
        F.col("tb").alias("super_type"),
        "n_sub",
        "n_super",
        "n_common",
        F.round(F.col("n_common") / F.col("n_sub"), 6).alias("containment"),
    )


def resolve_conflicts(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Truth discovery for functional predicates -> one (subj, pred)
    winner per group: majority vote over asserted objects, ties broken by
    smallest object (deterministic). Returns (subj, pred, obj, n_votes,
    n_alternatives) where n_alternatives counts DISTINCT competing values
    (1 = no conflict existed).

    The baseline resolution step when multiple sources assert different
    values for the same fact (majority voting is the standard strawman
    every truth-discovery paper starts from — Dong & Srivastava 2013).
    One hash aggregate + one keyed window; scale-safe at any subject
    cardinality because the window partitions on (subj, pred)."""
    from pyspark.sql import Window

    votes = triples.groupBy(subj, pred, obj).agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy(subj, pred)
    pick = Window.partitionBy(subj, pred).orderBy(
        F.desc("n_votes"), F.asc(obj)
    )
    return (
        votes.withColumn("n_alternatives", F.count("*").over(w))
        .withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(subj, pred, obj, "n_votes", "n_alternatives")
    )


def property_table(
    triples: DataFrame,
    predicates: list,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Pivot a triple relation into the classic RDF property-table layout
    -> (subj, <one column per predicate>), taking the MIN object when a
    predicate is multi-valued (deterministic; resolve_conflicts first for
    vote semantics).

    The property table is the standard physical design for wide KG reads
    (Wilkinson 2006; every triple store's 'flatten' step): one conditional
    hash aggregate, no join per predicate, no pivot-API metadata scan —
    the predicate list is explicit because at 100 TB you never want a
    distinct-scan of `pred` just to name columns."""
    aggs = [
        F.min(F.when(F.col(pred) == p, F.col(obj))).alias(p)
        for p in predicates
    ]
    return triples.groupBy(F.col(subj).alias("subj")).agg(*aggs)


def validate_shapes(
    triples: DataFrame,
    shapes: list,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """SHACL-style shape validation -> violation report (subj, pred,
    violation, observed): the QA gate a KG-construction pipeline runs
    before publishing a snapshot (W3C SHACL's sh:minCount / sh:maxCount /
    sh:pattern core, over the property shapes that matter for tabular
    triples).

    `shapes` is a list of dicts {"pred": str, "min_count": int|None,
    "max_count": int|None, "pattern": str|None}. Cardinality is per
    focus node over ALL distinct subjects (SHACL semantics: a subject
    with zero values violates min_count — absence is checked, not just
    excess), pattern applies per value triple and is reported aggregated
    per (subj, pred) with the offending-value count.

    Scale shape: ONE (subj, pred) hash aggregate for cardinality, the
    subjects x shaped-preds expansion is an in-row array explode of a
    literal list (|shapes| is tiny — no join, no shuffle), pattern
    checks are row-local rlike filters that push to the scan. Violations
    out: 'min_count' | 'max_count' | 'pattern'."""
    card = [
        (s["pred"], s.get("min_count"), s.get("max_count"))
        for s in shapes
        if s.get("min_count") is not None
        or s.get("max_count") is not None
    ]
    out = None
    if card:
        counts = (
            triples.filter(
                F.col(pred).isin([c[0] for c in card])
            )
            .groupBy(
                F.col(subj).alias("subj"), F.col(pred).alias("pred")
            )
            .agg(F.count("*").alias("observed"))
        )
        expanded = (
            triples.select(F.col(subj).alias("subj"))
            .distinct()
            .select(
                "subj",
                F.explode(
                    F.array(*[F.lit(c[0]) for c in card])
                ).alias("pred"),
            )
            .join(counts, ["subj", "pred"], "left")
            .withColumn("observed", F.coalesce("observed", F.lit(0)))
        )
        mins = F.create_map(
            *[
                x
                for c in card
                if c[1] is not None
                for x in (F.lit(c[0]), F.lit(c[1]))
            ]
        ) if any(c[1] is not None for c in card) else None
        maxs = F.create_map(
            *[
                x
                for c in card
                if c[2] is not None
                for x in (F.lit(c[0]), F.lit(c[2]))
            ]
        ) if any(c[2] is not None for c in card) else None
        parts = []
        if mins is not None:
            parts.append(
                expanded.filter(
                    F.col("observed") < mins[F.col("pred")]
                ).select(
                    "subj", "pred",
                    F.lit("min_count").alias("violation"),
                    F.col("observed").cast("long").alias("observed"),
                )
            )
        if maxs is not None:
            parts.append(
                expanded.filter(
                    F.col("observed") > maxs[F.col("pred")]
                ).select(
                    "subj", "pred",
                    F.lit("max_count").alias("violation"),
                    F.col("observed").cast("long").alias("observed"),
                )
            )
        for p in parts:
            out = p if out is None else out.unionByName(p)
    for s in shapes:
        pat = s.get("pattern")
        if pat is None:
            continue
        bad = (
            triples.filter(
                (F.col(pred) == s["pred"]) & ~F.col(obj).rlike(pat)
            )
            .groupBy(
                F.col(subj).alias("subj"), F.col(pred).alias("pred")
            )
            .agg(F.count("*").cast("long").alias("observed"))
            .select(
                "subj", "pred",
                F.lit("pattern").alias("violation"), "observed",
            )
        )
        out = bad if out is None else out.unionByName(bad)
    if out is None:
        raise ValueError("shapes define no checks")
    return out


def rank_facts(
    triples: DataFrame,
    k: int = 3,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Entity summarization -> the k most INFORMATIVE facts per subject
    (subj, pred, obj, df, score, rank): score = ln(N / df(pred, obj)),
    the self-information of the fact under the corpus fact distribution
    (RELIN/LinkSUM's informativeness term) — 'lang=en' (shared by half
    the corpus) ranks below a rare mention. The "show me this entity"
    card over a materialized KG.

    Scale shape: one (pred, obj) hash agg for document frequencies
    (distinct subjects per fact value), a 1-row N aggregate broadcast
    back (scalar cross), one join keyed on the fact value, one keyed
    window for top-k. Hot fact values ((pred,obj) shared by millions of
    subjects) are exactly the LOW-scoring ones, so skew and relevance
    point the same way."""
    from pyspark.sql import Window

    t = triples.select(
        F.col(subj).alias("subj"),
        F.col(pred).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct()
    dfreq = t.groupBy("pred", "obj").agg(
        F.countDistinct("subj").alias("df")
    )
    n = t.agg(F.countDistinct("subj").alias("__n"))
    scored = (
        t.join(dfreq, ["pred", "obj"])
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.log(F.col("__n").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("subj").orderBy(
        F.desc("score"), F.asc("pred"), F.asc("obj")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "subj", "pred", "obj", "df",
            F.round("score", 6).alias("score"), "rank",
        )
    )
