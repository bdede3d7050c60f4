"""Temporal KG: SCD2 versioning of fact streams and as-of snapshots.

The reference stores one current value per memory record and overwrites on
re-upsert (SqlServerMemory/SimpleVectorDb upsert semantics — last write
wins, history discarded). A KG built from a 100 TB event firehose needs the
opposite: keep every version, answer "what did the graph say at time T".
This module derives the standard slowly-changing-dimension-type-2 form
(valid_from / valid_to / is_current) from an append-only fact stream with
ONE node-partitioned window — no global sort, no self-join — and serves
point-in-time snapshots as a pure filter on top.

Scale notes: the only shuffle is the hash partition on the entity key for
the window; at 10^10 facts that is one exchange, and the window itself is
a per-partition sort on (ts, tiebreak) — Spark's windowed lead() never
materializes more than a partition. as_of() is a predicate, so at read
time it pushes down to parquet row-group pruning on valid_from when the
version table is stored sorted/partitioned by time.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    facts: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Optional[Sequence[str]] = None,
    change_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Append-only facts -> SCD2 version rows.

    Adds `valid_from` (the fact's own timestamp), `valid_to` (the NEXT
    version's timestamp for the same key, null while current) and
    `is_current`. Ordering within a key is (ts, *tiebreak) — pass a unique
    tiebreak (an id column) so same-timestamp facts version
    deterministically.

    If `change_cols` is given, consecutive rows whose change_cols are all
    equal are collapsed first (run-length compression of no-op re-upserts,
    the usual 90%+ of a feed): a row is kept iff it differs from its
    predecessor, via lag() over the same window — still one shuffle.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    df = facts
    if change_cols:
        changed = F.lit(False)
        for c in change_cols:
            prev = F.lag(c).over(w)
            changed = changed | prev.isNull() | (
                ~F.col(c).eqNullSafe(prev)
            )
        df = df.withColumn("__chg", changed).filter("__chg").drop("__chg")
    out = df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def as_of(versions: DataFrame, ts, ts_type: str = "timestamp") -> DataFrame:
    """Point-in-time snapshot of an SCD2 table: the version valid at `ts`
    for every key that existed then. Pure predicate — pushes down."""
    t = F.lit(ts).cast(ts_type)
    return versions.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def scd2_apply(
    versions: DataFrame,
    new_facts: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Optional[Sequence[str]] = None,
    change_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Incrementally fold a new fact batch into an existing SCD2 table.

    Only keys PRESENT IN THE BATCH are re-versioned: their historical fact
    rows are reconstructed from the version table (an SCD2 row carries the
    original fact columns; valid_from/valid_to/is_current are derived),
    unioned with the batch, and re-windowed; untouched keys pass through
    by reference via one anti-join. Late-arriving facts are therefore
    handled exactly — a fact older than the current head splices into the
    middle of its key's chain and the downstream validity intervals
    shift, which pure append-only fast paths get wrong.

    Cost is O(facts of touched keys), not O(table): the same
    touched-partition contract as the FTS/PMI/ANN incremental index
    maintenance (sources/tables.py merge_partitioned). The result is
    bit-identical to scd2_versions(all facts) — pinned by the
    scd2_upsert_orders driver oracle (which IS the full-recompute SQL)
    and the parity pytest."""
    derived = {"valid_from", "valid_to", "is_current"}
    fact_cols = [c for c in versions.columns if c not in derived]
    touched = new_facts.select(*key_cols).distinct()
    untouched = versions.join(touched, list(key_cols), "left_anti")
    redo = (
        versions.join(touched, list(key_cols), "semi")
        .select(*fact_cols)
        .unionByName(new_facts.select(*fact_cols))
    )
    redone = scd2_versions(
        redo, key_cols, ts_col,
        tiebreak_cols=tiebreak_cols, change_cols=change_cols,
    )
    return untouched.unionByName(redone)


def decayed_scores(
    df: DataFrame,
    group_cols,
    ts_col: str,
    value_col: str,
    half_life_seconds: float,
    now=None,
) -> DataFrame:
    """Exponentially time-decayed activity score per group ->
    (*group_cols, n_events, decayed_score): score = sum over events of
    value * 2^(-(T - ts) / half_life), the standard recency-weighted
    counter (Cormode, Shkapenyuk, Srivastava & Xu 2009's forward-decay
    view: a half-life h means an event loses half its weight every h
    seconds of age).

    T (`now`) defaults to the corpus max timestamp — ONE 1-row
    aggregate broadcast into the scoring projection, so the whole
    operator is a narrow scan + one hash aggregate with map-side
    combine; no window, no per-group sort. Decayed counters are also
    mergeable across batches at a shared T (weights depend only on
    event age), which is what makes them the streaming-friendly
    replacement for sliding-window recount jobs at 10^12 events."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    # whole-second ages: unix_timestamp truncates to epoch seconds
    # (mirror engines with floor(epoch(ts))). Only DIFFERENCES T - ts
    # enter the weight, so any constant timezone offset between
    # engines' epoch conventions cancels; sub-second fractions are
    # deliberately dropped so both engines age events identically.
    ep = F.unix_timestamp(F.col(ts_col)).cast("double")
    if now is None:
        mx = df.agg(
            F.max(F.unix_timestamp(F.col(ts_col)))
            .cast("double")
            .alias("__T")
        )
        base = df.crossJoin(F.broadcast(mx))
    else:
        base = df.withColumn("__T", F.lit(float(now)))
    w = F.pow(
        F.lit(2.0),
        -(F.col("__T") - ep) / F.lit(float(half_life_seconds)),
    )
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col(value_col) * w).alias("decayed_score"),
    )
