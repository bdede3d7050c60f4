"""Snapshot diff: what changed between two versions of a table.

The manifest layer (sources/tables.py) gives Iceberg-style snapshot
isolation with time-travel reads; this operator answers the follow-up a
10^12-row KG store actually needs — WHICH keys were added / removed /
changed between snapshot N and M (CDC extraction, audit of an ingest
batch, input to an incremental downstream refresh that only wants the
delta).

Scale shape: ONE full-outer shuffle join on the key (the theoretical
minimum for an unordered diff), all value comparison column-local with
null-safe equality; the common unchanged mass is dropped before anything
else touches it. No row hashing UDF — eqNullSafe per column keeps the
whole comparison inside whole-stage codegen and makes `changed_cols`
free.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """old/new frames -> (key..., change, changed_cols) where change in
    {'added', 'removed', 'changed'}; unchanged rows are omitted.
    `changed_cols` lists the differing columns (sorted, empty for
    added/removed). Duplicate keys within a side make the diff
    ill-defined — deduplicate upstream (the catalog's MERGE guarantees
    this for managed tables)."""
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    cmps = sorted(compare_cols)
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in cmps],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in cmps],
    )
    j = o.join(n, keys, "full_outer")
    diff_flags = [
        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in cmps
    ]
    any_diff = F.lit(False)
    for d in diff_flags:
        any_diff = any_diff | d
    changed_cols = F.array_compact(
        F.array(
            *[
                F.when(d, F.lit(c))
                for c, d in zip(cmps, diff_flags)
            ]
        )
    ) if cmps else F.array().cast("array<string>")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *keys,
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )


def snapshot_diff(
    catalog,
    spark: SparkSession,
    name: str,
    v_old: int,
    v_new: int,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Diff two committed snapshots of a managed table (time-travel reads
    via the manifest layer — zero copies, the old snapshot's files are
    still referenced by its manifest)."""
    return table_diff(
        catalog.read(spark, name, version=v_old),
        catalog.read(spark, name, version=v_new),
        key_cols,
        compare_cols,
    )
