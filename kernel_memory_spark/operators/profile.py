"""Single-pass table profiling — the corpus-audit primitive.

Before any 100 TB ingest decision (partition count, skew salting, cap
tuning, schema checks) you profile: null rates, cardinalities, ranges per
column. The reference leaves this to the operator's SQL console; an engine
at 10^12 rows needs it as a first-class one-pass operator.

One job, one global aggregate: every column's count/distinct/min/max is an
expression in a SINGLE agg (partial aggregation map-side, one row to the
driver), then the 1-row result is unpivoted with `stack` — profiling never
scans the table once per column. Exact distinct counts expand to a
two-phase distinct aggregate per column (fine to sf-scale, oracle-exact);
`exact_distinct=False` switches to HyperLogLog approx_count_distinct — the
100 TB path, constant memory per column.

min/max cast to string AFTER aggregation (cast-then-min would compare
lexically and report "9" > "10"), so one output schema fits all column
types.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """-> (col_name, n_nulls, n_distinct, min_val, max_val), one row per
    profiled column, computed in one pass."""
    cols = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.countDistinct(F.col(c))
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    items = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {items}) as "
            "(col_name, n_nulls, n_distinct, min_val, max_val)"
        )
    )


def group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
) -> DataFrame:
    """EXACT per-group discrete quantiles -> (*group_cols, q, value, n):
    for each q, the value whose rank is max(1, ceil(q*n)) within the
    group's ascending value order (quantile_disc semantics — always an
    actual data value, deterministic, engine-neutral; no interpolation,
    so no float-order divergence between engines).

    Scale shape: the table is FIRST collapsed to (group, value, count) by
    a hash aggregate — the window then ranks DISTINCT values per group,
    not rows, so a 10^9-row group with 10^4 distinct values costs a
    10^4-row single-task window, not a 10^9-row sort. The cumulative-count
    window is the only per-group serial step; for pathological groups
    that are huge in distinct values too, fall back to
    percentile_approx. Each q is matched by locating the value whose
    cumulative count first covers the target rank (one exploded literal
    per q, filtered in place — no re-scan per quantile)."""
    gcols = list(group_cols)
    counts = (
        df.groupBy(*gcols, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy(*gcols).orderBy("value")
    ranked = counts.select(
        *gcols,
        "value",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt")
        .over(Window.partitionBy(*gcols))
        .cast("long")
        .alias("n"),
    )
    targets = F.array(*[
        F.struct(
            F.lit(float(q)).alias("q"),
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.lit(float(q)) * F.col("n")).cast("long"),
            ).alias("rank"),
        )
        for q in qs
    ])
    return (
        ranked.withColumn("__t", F.explode(targets))
        .filter(
            (F.col("cum") >= F.col("__t.rank"))
            & (F.col("cum_prev") < F.col("__t.rank"))
        )
        .select(*gcols, F.col("__t.q").alias("q"), "value", "n")
    )


def hot_keys(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Top-k heaviest values of `key_col` -> (key, cnt, share, rank) —
    the skew audit that decides whether a join/agg on this key needs
    salting or an AQE skew hint (the repo's salted aggregations and
    hot-bucket caps all start from exactly this question).

    One hash aggregate (map-side combine absorbs the skew being
    measured), a 1-row total cross-joined back (scalar, never a global
    window over the counts), and a TakeOrderedAndProject top-k
    (count desc, key asc tie-break — deterministic under ties); the rank
    window runs AFTER the limit, over k rows, so it is bounded, not a
    single-task pass over the key space."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("double").alias("__total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.crossJoin(total)
        .withColumn("share", F.round(F.col("cnt") / F.col("__total"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .drop("__total")
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profiling via the median absolute
    deviation (Hampel identifier) -> (*group_cols, median, mad, n,
    n_outliers): x is an outlier iff |x - median| > k * MAD, with
    MAD = median(|x - median|).

    Unlike mean/stddev, the identifier has a 50% breakdown point — the
    standard robust gate for numeric quality screening of 10^12-row
    feeds where the contamination itself is what you're hunting. Both
    medians are the exact DISCRETE group median (group_quantiles, rank
    ceil(n/2) — always a real data value, no interpolation, so the
    whole computation replays engine-neutrally). Cost: two
    (group, value) hash-aggregate + distinct-value-window passes and
    two keyed joins of per-group scalars — group count rows each, never
    a full-table sort."""
    gcols = list(group_cols)
    med = group_quantiles(df, gcols, value_col, [0.5]).select(
        *gcols, F.col("value").alias("median"), "n"
    )
    dev = df.join(med, gcols).select(
        *gcols,
        "median",
        "n",
        F.abs(F.col(value_col) - F.col("median")).alias("__absdev"),
    )
    mad = group_quantiles(dev, gcols, "__absdev", [0.5]).select(
        *gcols, F.col("value").alias("mad")
    )
    flagged = (
        dev.join(mad, gcols)
        .filter(F.col("__absdev") > F.lit(float(k)) * F.col("mad"))
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_outliers"))
    )
    return (
        med.join(mad, gcols)
        .join(flagged, gcols, "left")
        .select(
            *gcols,
            "median",
            "mad",
            "n",
            F.coalesce("n_outliers", F.lit(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def group_percentile_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Per-group percentile rank of every row's value -> input columns
    + `out_col` = (min_rank(value) - 1) / (n - 1) in [0, 1] (exactly
    SQL percent_rank(): ties share their group's minimum rank; n = 1
    groups get 0.0).

    The cross-source score calibrator: raw quality scores are not
    comparable across sources (each source has its own scale), so
    mixing pipelines gate on the WITHIN-source percentile instead
    (e.g. keep every source's top 30%). Scale shape = group_quantiles'
    trick: collapse to (group, value, count) FIRST, rank the DISTINCT
    values in the per-group window, then join the rank back on
    (group, value) — a 10^9-row group with 10^4 distinct scores costs a
    10^4-row window, never a full-group sort."""
    gcols = list(group_cols)
    counts = (
        df.groupBy(*gcols, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = Window.partitionBy(*gcols).orderBy("__v")
    ranked = counts.select(
        *gcols,
        "__v",
        (F.sum("__c").over(w) - F.col("__c") + 1).alias("__minrank"),
        F.sum("__c").over(Window.partitionBy(*gcols)).alias("__n"),
    )
    pr = ranked.select(
        *gcols,
        F.col("__v"),
        F.when(F.col("__n") > 1,
               (F.col("__minrank") - 1)
               / (F.col("__n") - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias(out_col),
    )
    # NOTE (r5 advice, documented semantics): the rank join uses plain
    # equality, so rows with NULL in value_col are excluded from the output
    # — unlike SQL percent_rank, which keeps them. This is the pinned
    # cross-engine contract (the DuckDB oracle replays the same equality
    # join); callers that need NULL rows must filter/handle them upstream.
    join_cond = gcols + ["__v"]
    return (
        df.withColumn("__v", F.col(value_col))
        .join(pr, join_cond)
        .drop("__v")
    )
