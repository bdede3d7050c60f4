"""Count-Min Sketch — fixed-size frequency estimation over unbounded key
spaces (Cormode & Muthukrishnan 2005).

At 10^12 rows an exact per-key count table can itself be too large to
hold or broadcast; a CMS is depth x width COUNTERS (e.g. 4 x 65536
longs = 2 MB) regardless of key cardinality, supports point estimates
with one-sided error (estimate >= true count; overshoot <= 2N/width
with probability 1 - 2^-depth), and merges across partitions/batches by
plain addition — the property that makes it shuffle-friendly: building
one is a single hash aggregate with map-side combine.

Hashing is the repo's md5-hex-prefix idiom (sampling.py:25-30):
conv(substr(md5('cms<j>|' || key), 1, 8), 16, 10) % width — replayable
bit-for-bit in any SQL engine, so the sketch AND its estimates are
oracle-checkable, and a sketch built by Spark can be queried by DuckDB
(engine-portable index artifact, same philosophy as the FTS/ANN index
tables in sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, j: int, width: int) -> F.Column:
    h = F.md5(F.concat(F.lit(f"cms{j}|"), key))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width)
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build the sketch -> (row, bucket, cnt): at most depth*width rows
    no matter how many distinct keys exist. ONE explode (fan-out =
    depth, a small constant) + ONE hash aggregate; partial aggregation
    collapses each map partition to <= depth*width counters before the
    shuffle, so the build is skew-immune by construction."""
    k = F.col(key_col).cast("string")
    probes = F.array(*[
        F.struct(
            F.lit(j).alias("row"), _bucket(k, j, width).alias("bucket")
        )
        for j in range(depth)
    ])
    return (
        df.select(F.explode(probes).alias("__p"))
        .groupBy(
            F.col("__p.row").alias("row"),
            F.col("__p.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates -> (key_col, est_cnt) with est_cnt = min over the
    depth rows of the counter at that key's bucket (the CMS guarantee:
    est >= true, overshoot bounded by collisions). A bucket no probe
    ever incremented reads 0 via the left join's coalesce. The probe
    relation is |keys| * depth rows joined against the tiny sketch —
    broadcast-sized by construction."""
    k = F.col(key_col).cast("string")
    probes = F.array(*[
        F.struct(
            F.lit(j).alias("row"), _bucket(k, j, width).alias("bucket")
        )
        for j in range(depth)
    ])
    probe_rows = keys.select(
        F.col(key_col), F.explode(probes).alias("__p")
    ).select(
        key_col,
        F.col("__p.row").alias("row"),
        F.col("__p.bucket").alias("bucket"),
    )
    return (
        probe_rows.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias(
                "est_cnt"
            )
        )
    )
