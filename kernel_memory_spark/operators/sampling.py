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

from typing import Dict, Sequence, Tuple

from pyspark.sql import DataFrame
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
