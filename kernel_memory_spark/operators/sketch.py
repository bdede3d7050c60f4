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


def hll_build(
    df: DataFrame, key_col: str, p: int = 9
) -> DataFrame:
    """HyperLogLog registers -> (bucket, max_rank), at most 2^p rows
    (Flajolet et al. 2007): the constant-size distinct-count sketch.
    Like the CMS, registers merge by MAX, so building is one hash
    aggregate with map-side combine and sketches from different
    partitions/days union+max into one.

    Determinism across engines: bucket and rank derive from two
    independent 32-bit md5 hex windows (chars 1-8 and 9-16) of the key —
    rank = 32 - floor(log2(h2)) for h2 > 0 (floor(log2) of an integer
    can only be wrong if libm errs by >1 ulp AT an exact power of two,
    where log2 is exact — so the registers are bit-identical in any
    engine with md5 + log2), h2 = 0 maps to rank 33 (all-zero suffix)."""
    k = F.col(key_col).cast("string")
    h = F.md5(F.concat(F.lit("hll|"), k))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = F.when(F.col("__h2") == 0, F.lit(33)).otherwise(
        F.lit(32) - F.floor(F.log2(F.col("__h2")))
    )
    return (
        df.select(
            F.pmod(h1, F.lit(2 ** p)).alias("bucket"),
            h2.alias("__h2"),
        )
        .select("bucket", rank.cast("long").alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """-> ONE row (n_registers, est_distinct): the HLL estimator
    alpha_m * m^2 / sum over ALL m registers of 2^-M_j (empty registers
    contribute 2^0 = 1), with the standard small-range linear-counting
    correction (E <= 2.5m and empty registers exist ->
    m * ln(m / V)). Both branches are closed-form over the register
    relation — the correction choice is part of the cross-engine
    contract, mirrored literally in the SQL oracle."""
    import math

    m = 2 ** p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sums = registers.agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("__s"),
    )
    # empty registers: m - n_registers of them, each contributing 2^0
    full_sum = F.col("__s") + (F.lit(m) - F.col("n_registers"))
    raw = F.lit(alpha * m * m) / full_sum
    v = F.lit(m) - F.col("n_registers")  # count of empty registers
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(
        raw
    )
    return sums.select(
        "n_registers", F.round(est, 6).alias("est_distinct")
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom filter -> (bit,) the set bit positions (at most n_bits
    rows; the sparse representation IS the filter — union two filters
    with a plain distinct union). k independent md5-derived positions
    per key; same engine-portable hashing contract as the CMS/HLL, so a
    probe can be replayed by any engine against the same bit table.

    One explode (fan-out k) + one distinct — map-side partial distinct
    bounds the shuffle at n_bits rows per map partition."""
    k = F.col(key_col).cast("string")
    bits = F.array(*[
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{j}|"), k)), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_bits),
        )
        for j in range(n_hashes)
    ])
    return (
        df.select(F.explode(bits).alias("bit")).distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """-> (key_col, maybe_member): true iff ALL k bit positions are set
    — the Bloom contract (no false negatives; false-positive rate
    ~ (1 - e^{-kn/m})^k). The probe joins |keys| * k rows against the
    broadcast bit table and counts hits per key; a key is a maybe-member
    iff hits == k."""
    k = F.col(key_col).cast("string")
    bits = F.array(*[
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{j}|"), k)), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_bits),
        )
        for j in range(n_hashes)
    ])
    probes = keys.select(F.col(key_col), F.explode(bits).alias("bit"))
    hits = (
        probes.join(F.broadcast(bloom), "bit", "semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return keys.join(hits, key_col, "left").select(
        key_col,
        (F.coalesce("__hits", F.lit(0)) == n_hashes).alias(
            "maybe_member"
        ),
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int
) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches built
    with the SAME (depth, width): |A ⋈ B on key| is estimated by the
    MINIMUM over rows of the counter inner product Σ_b cntA[b]*cntB[b]
    (Cormode & Muthukrishnan 2005 §4.2 — est >= true, the planning-time
    statistic a join optimizer wants without scanning either input).
    One keyed join of two tiny counter tables + one aggregate."""
    prods = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.row") == F.col("b.row"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.row").alias("row"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("__p"),
        )
        .groupBy("row")
        .agg(F.sum("__p").alias("__dot"))
    )
    return prods.agg(
        F.min("__dot").cast("long").alias("est_join_size")
    )


def hll_build_grouped(
    df: DataFrame, group_cols, key_col: str, p: int = 6
) -> DataFrame:
    """Per-group HyperLogLog registers -> (group..., bucket, max_rank):
    <= 2^p rows per group no matter how many distinct keys the group
    holds. Same md5 register construction as hll_build, same MAX-merge
    property — so per-group sketches from different partitions/days
    combine by a plain groupBy-max, which is the whole point: the
    approx-distinct-per-key table for 10^9 keys x 10^12 rows is ONE
    hash aggregate with map-side combine, no per-group distinct."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    k = F.col(key_col).cast("string")
    h = F.md5(F.concat(F.lit("hll|"), k))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rank = F.when(F.col("__h2") == 0, F.lit(33)).otherwise(
        F.lit(32) - F.floor(F.log2(F.col("__h2")))
    )
    return (
        df.select(
            *group_cols,
            F.pmod(h1, F.lit(2 ** p)).alias("bucket"),
            h2.alias("__h2"),
        )
        .select(*group_cols, "bucket", rank.cast("long").alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols, p: int = 6
) -> DataFrame:
    """-> (group..., n_registers, est_distinct): the hll_estimate
    estimator applied per group (same alpha, same linear-counting
    small-range correction, both branches mirrored in SQL)."""
    import math

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    m = 2 ** p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sums = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("__s"),
    )
    full_sum = F.col("__s") + (F.lit(m) - F.col("n_registers"))
    raw = F.lit(alpha * m * m) / full_sum
    v = F.lit(m) - F.col("n_registers")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(
        raw
    )
    return sums.select(
        *group_cols,
        "n_registers",
        F.round(est, 6).alias("est_distinct"),
    )
