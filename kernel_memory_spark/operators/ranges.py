"""Range (interval) join and multi-granularity time rollups — the other
two custom operators the brief names (range join, hypertable rollup),
each expressed as compositions of built-in ops.

- `range_join` — points ⋈ intervals where start <= pt <= end. The naive
  theta-join degenerates to a per-key cartesian (BroadcastNestedLoopJoin)
  at scale. The bucketed construction instead: explode every interval
  into the fixed-width time buckets it covers, equi-join points on their
  bucket, then post-filter the exact containment — a plain hash join
  whose fan-out is bounded by interval_length / bucket_width (choose the
  width near the median interval length). This is the same trick
  Photon/DuckDB's IEJoin-avoiding plans and Iceberg partition-bucketed
  time joins use.

- `time_rollup` — the hypertable continuous-aggregate shape: one pass
  producing counts/sums at several granularities via GROUPING SETS
  (hour/day/month), instead of G separate scans. Catalyst expands the
  sets into one shuffle with a grouping-id column.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts_s",
    start_col: str = "start_s",
    end_col: str = "end_s",
    bucket_width: int = 3600,
    keys: Optional[List[str]] = None,
) -> DataFrame:
    """Inner join of each point row to every interval row containing it
    (start <= ts <= end), optionally also matching on equality `keys`.
    Output: all point columns + all interval columns (callers project)."""
    keys = keys or []
    # floor, not cast: cast('long') on the double division truncates toward
    # zero, so negative timestamps (pre-1970 epochs) would bucket one slot
    # too high and silently miss matches
    b_start = F.floor(F.col(start_col) / bucket_width).cast("long")
    b_end = F.floor(F.col(end_col) / bucket_width).cast("long")
    exploded = intervals.withColumn(
        "__bucket", F.explode(F.sequence(b_start, b_end))
    )
    pts = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / bucket_width).cast("long")
    )
    joined = pts.join(exploded, keys + ["__bucket"])
    return joined.filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    ).drop("__bucket")


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    grains: Sequence[str] = ("hour", "day", "month"),
    group_cols: Sequence[str] = ("event_type",),
    sum_col: Optional[str] = None,
) -> DataFrame:
    """One-pass multi-granularity rollup: (grain, bucket_start, *group_cols,
    n[, total]) for every grain — the continuous-aggregate/hypertable
    shape. Each row contributes one (grain, bucket) pair per grain via an
    exploded literal array, then ONE hash aggregate covers all grains
    (instead of G separate scans; map-side combine still applies since
    the explode fan-out is the small constant G)."""
    ts = F.col(ts_col).cast("timestamp")
    pairs = F.array(*[
        F.struct(
            F.lit(g).alias("grain"),
            F.date_trunc(g, ts).alias("bucket_start"),
        )
        for g in grains
    ])
    extra = [sum_col] if sum_col else []
    exploded = events.withColumn("__g", F.explode(pairs)).select(
        F.col("__g.grain").alias("grain"),
        F.col("__g.bucket_start").alias("bucket_start"),
        *group_cols,
        *extra,
    )
    aggs = [F.count("*").alias("n")]
    if sum_col:
        aggs.append(F.round(F.sum(sum_col), 6).alias("total"))
    return exploded.groupBy("grain", "bucket_start", *group_cols).agg(*aggs)


def cube_counts(
    df: DataFrame,
    dims: Sequence[str],
    sum_col: Optional[str] = None,
    round_to: int = 2,
) -> DataFrame:
    """Full CUBE over `dims` -> (*dims, gid, n[, total]): every subset of
    the dimensions aggregated in ONE shuffle (Catalyst expands the cube
    into an Expand node feeding a single hash aggregate — 2^d grouping
    sets never means 2^d scans). `gid` is the grouping bitmask (leftmost
    dim = most significant bit, 1 = aggregated-away), the standard
    disambiguator between a real NULL dimension value and a rollup row —
    bit-compatible with SQL GROUPING(a, b, ...).

    The 100 TB note: cube fan-out multiplies shuffle rows by 2^d, so keep
    d small (<=4) or pre-aggregate to (dims, partial) first; partial
    aggregation absorbs the expansion map-side for low-cardinality dims."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if sum_col:
        aggs.append(F.round(F.sum(sum_col), round_to).alias("total"))
    return (
        df.cube(*[F.col(d) for d in dims])
        .agg(F.grouping_id().cast("long").alias("gid"), *aggs)
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """2-D skyline (Pareto frontier, both dimensions MINIMIZED) ->
    (x_col, y_col): the points no other point weakly dominates (<= in
    both, < in at least one). Negate a column to maximize it. Duplicate
    points collapse — the distinct-skyline contract.

    Scale shape (the reason this isn't a one-line window): the classic
    sorted-scan needs a GLOBAL running min, and a naive
    Window.orderBy(x) moves the whole table through one task. Instead:
    (1) hash-aggregate to one (x, min y) row per distinct x — dominance
    within an x-group is resolved for free; (2) range-partition by x and
    take the per-partition EXCLUSIVE running min; (3) collect one scalar
    per partition and broadcast exclusive PREFIX minima back — the same
    offsets pattern as packing.global_cumsum, with min replacing sum.
    The only driver traffic is numPartitions scalars; the window runs
    over distinct-x rows, never raw data."""
    from pyspark.sql.window import Window as W

    per_x = df.groupBy(F.col(x_col)).agg(
        F.min(y_col).alias("__y")
    )
    n = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    ranged = per_x.repartitionByRange(n, F.col(x_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = (
        W.partitionBy("__pid")
        .orderBy(x_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__local_min", F.min("__y").over(local_w)
    ).localCheckpoint()
    mins = {
        r["__pid"]: r["m"]
        for r in local.groupBy("__pid")
        .agg(F.min("__y").alias("m"))
        .collect()
    }
    prefix, running = [], None
    for pid in sorted(mins):
        prefix.append((pid, running))
        running = (
            mins[pid]
            if running is None
            else min(running, mins[pid])
        )
    off_df = df.sparkSession.createDataFrame(
        prefix, f"__pid int, __prefix_min {dict(local.dtypes)['__y']}"
    )
    # least() skips NULLs; a row with NO predecessor anywhere (the
    # global x-minimum) has both minima NULL and is always on the
    # frontier — coalesce(…, True) keeps it without special-casing.
    before_min = F.least("__local_min", "__prefix_min")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .filter(F.coalesce(F.col("__y") < before_min, F.lit(True)))
        .select(F.col(x_col), F.col("__y").alias(y_col))
    )
