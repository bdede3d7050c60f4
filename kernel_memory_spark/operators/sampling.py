"""Deterministic sampling for reproducible training-data mixes.

`df.sample()` / `sampleBy()` draw from a seeded RNG whose stream depends
on partitioning — the sample CHANGES when the file layout or parallelism
changes, which is poison for reproducible training sets. Hash-based
sampling instead: a row is in the sample iff crc32(key) mod M falls under
the rate — a pure column predicate, independent of layout, identical on
any engine (and pushes into the scan). The same construction gives
consistent train/validation/test SPLITS: disjoint hash ranges of the same
key, so a document can never leak across splits even as the corpus grows.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = 1_000_000  # rate granularity: 1e-6


def _hash_pos(key_col, salt: str):
    """Deterministic position in [0, 1e6) from the row key (+ salt so
    independent samples over the same key don't correlate). md5-hex-prefix
    construction: replayable on any SQL engine (('0x'||substr(md5(k),1,8))
    ::BIGINT in DuckDB equals conv(substring(md5(k),1,8),16,10) here)."""
    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(_M)
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Layout-independent sample: keep rows whose hash position is under
    fraction. Re-running on re-partitioned/re-grown data keeps exactly the
    same keys (plus new ones at the same rate)."""
    return df.filter(_hash_pos(key_col, salt) < int(fraction * _M))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum rates (the training-mix reweighting step): each stratum
    keeps its own hash-fraction of rows; strata absent from `fractions`
    keep default_fraction."""
    thresh = F.lit(int(default_fraction * _M))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _M))
        ).otherwise(thresh)
    return df.filter(_hash_pos(key_col, salt) < thresh)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted source mixing (the multilingual/multi-source
    rebalancing rule of Rae et al. 2021 / mC4): source s is sampled in
    proportion to n_s^alpha, so alpha=1 keeps natural proportions, alpha=0
    weights all sources equally, 0<alpha<1 up-weights the tail. The
    expected output size is target_frac * |df|; a source whose quota
    exceeds its size keeps everything (rate capped at 1 — no upsampling).

    Fully distributed: per-source counts and the normalizer are small
    aggregates broadcast back onto the rows; the kept-set is then the same
    layout-independent hash predicate as deterministic_sample, so the mix
    is reproducible and engine-replayable. alpha=0.5 uses sqrt (exactly
    rounded per IEEE 754, so thresholds match any engine bit-for-bit);
    other alphas use pow (last-ulp may differ across libms — thresholds
    are floor(rate*1e6), so a mismatch needs a row hash exactly at the
    contested integer)."""
    n = F.col("__cnt").cast("double")
    w = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    counts = df.groupBy(source_col).agg(F.count("*").alias("__cnt"))
    tot = counts.agg(
        F.sum("__cnt").cast("double").alias("__total"),
        F.sum(w).alias("__norm"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_frac))
            * F.col("__total")
            * w
            / F.col("__norm")
            / n,
        ).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(
            _hash_pos(key_col, salt)
            < F.floor(F.col("__rate") * F.lit(float(_M))).cast("long")
        )
        .drop("__rate")
    )


def quota_cap(
    df: DataFrame,
    source_col: str,
    key_col: str,
    max_per_source: int,
    salt: str = "quota",
) -> DataFrame:
    """Per-source document cap (the host-level/source-level quota rule of
    Common-Crawl-style corpus curation): keep at most `max_per_source`
    rows per source, chosen in HASH order of the key — so the kept set is
    a deterministic, layout-independent pseudo-random subset, stable under
    corpus growth for the rows that already existed (a source under its
    cap keeps everything; one over it keeps the rows whose hash positions
    are smallest, and newly arrived rows only displace from the boundary).

    Scale: one window partitioned BY SOURCE — independent partitions, no
    global sort; a mega-source is bounded because only row_number (a
    streaming rank, no buffering of the partition in memory beyond sort
    spill) runs inside it. Skewed sources sort-spill but never OOM; if one
    source dominates the corpus, cap it harder, that is the point."""
    w = Window.partitionBy(source_col).orderBy(
        _hash_pos(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_source)
        .drop("__rn")
    )


def split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float] = (0.98, 0.01, 0.01),
    salt: str = "split",
) -> Tuple[DataFrame, ...]:
    """Disjoint, exhaustive, layout-independent splits (train/val/test):
    consecutive hash ranges sized by `weights`. A key always lands in the
    same split — growing the corpus never moves or leaks existing rows."""
    total = sum(weights)
    pos = _hash_pos(key_col, salt)
    out = []
    lo = 0.0
    for i, w in enumerate(weights):
        hi = lo + w / total
        hi_i = _M if i == len(weights) - 1 else int(hi * _M)
        out.append(df.filter((pos >= int(lo * _M)) & (pos < hi_i)))
        lo = hi
    return tuple(out)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: Optional[str] = None,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k rows per
    stratum (whole frame if `strata_col` is None): Efraimidis-Spirakis
    (2006) exponential race — each row draws u from its key hash and
    competes with key -ln(u)/w; the k smallest win, giving exactly the
    weighted-without-replacement distribution. The importance-sampling
    step of a training-data mix (sample long/high-quality docs more,
    but never twice).

    u = (hash_pos + 0.5) / 1e6 (never 0, so ln is finite); weights are
    clamped to >= 1e-9 so zero/negative weights behave as epsilon, not
    NaN. Deterministic, layout-independent, replayable in SQL.

    Scale: one keyed window per stratum (per-partition top-k heaps via
    rank pre-cut; with strata this never global-sorts) — for huge k on
    an UNstratified table prefer a strata split first."""
    u = (_hash_pos(key_col, salt) + F.lit(0.5)) / F.lit(float(_M))
    race = -F.log(u) / F.greatest(
        F.col(weight_col).cast("double"), F.lit(1e-9)
    )
    part = [strata_col] if strata_col is not None else []
    w = Window.partitionBy(*part).orderBy(
        F.asc("__race"), F.asc(key_col)
    )
    return (
        df.withColumn("__race", race)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__race", "__rn")
    )


def referential_sample(
    parent: DataFrame,
    children: dict,
    parent_key: str,
    fraction: float,
    salt: str = "refsample",
):
    """Referential-integrity-preserving co-sample of a table family ->
    (sampled_parent, {name: sampled_child}): the PARENT keys are chosen
    by the deterministic hash gate (md5 position < fraction), each
    child keeps exactly the rows whose foreign key survived. Every FK
    in every sampled child resolves, join cardinalities scale ~linearly
    with `fraction`, and re-running with the same salt reproduces the
    identical sample — the correct way to downscale a relational corpus
    for dev/CI (per-table independent sampling breaks every join).

    `children` maps name -> (DataFrame, fk_col). Children are filtered
    by the SAME hash predicate applied to their fk column — a pure
    column gate, no join, no broadcast of a key set (at 10^12 rows the
    sampled-key set itself may not be broadcastable); parent and child
    agree because the gate is a pure function of the key value."""
    gate_pos = int(fraction * _M)

    # NOTE (r5 advice, documented semantics): the hash gate evaluates to
    # NULL for NULL keys, so child rows with a NULL foreign key (and parent
    # rows with a NULL key) are dropped from every sample regardless of
    # fraction — the pinned cross-engine contract (the oracle replays the
    # same gate). Callers sampling nullable-FK children that must keep
    # orphan rows should add `fk.isNull() | gate` explicitly.
    def gate(col_name):
        return _hash_pos(col_name, salt) < F.lit(gate_pos)

    sp = parent.filter(gate(parent_key))
    out = {
        name: df.filter(gate(fk)) for name, (df, fk) in children.items()
    }
    return sp, out
