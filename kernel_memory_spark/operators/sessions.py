"""Gap-based sessionization over event streams.

The classic event-pipeline operator the reference's queue-centric world
never needed but a 100TB analytics engine does: assign each (user, event)
to a session, where a new session starts when the gap since the user's
previous event exceeds `gap` seconds.

Spark shape: ONE window partitioned by user (lag + conditional cumsum) —
no joins, no Python; the shuffle is a single hash partition on user_id and
skewed users cost O(their events log their events) in the sort. The
streaming analog is `F.session_window` (Structured Streaming's built-in
gap-based session windows); this is the batch/backfill twin with exactly
reproducible ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 30 * 60


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """events + (session_n, session_id): session_n is the user's 1-based
    session ordinal in time order (ties broken by id), session_id =
    '<user>#<n>'."""
    # parquet often stores TIMESTAMP_NTZ, which Spark won't cast to long
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_seconds)
    ).cast("int")
    return (
        events.withColumn("__new", new_session)
        .withColumn(
            "session_n",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("int"),
        )
        .drop("__new")
        .withColumn(
            "session_id",
            F.format_string("%s#%d", F.col(user_col).cast("string"),
                            F.col("session_n")),
        )
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: bounds, event count, duration seconds."""
    ts = F.col(ts_col).cast("timestamp")
    return sessions.groupBy(user_col, "session_n", "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(ts).cast("long") - F.min(ts).cast("long")).alias(
            "duration_sec"
        ),
    )


def funnel(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user -> (user, t_1..t_N,
    steps_completed): t_i is the EARLIEST occurrence of step i strictly
    AFTER t_{i-1} (the standard product-analytics funnel — a user who
    fires B before ever firing A has not completed A->B).

    Shape: one conditional min-aggregate per step, each keyed on the
    user column — N hash aggregates and N-1 user-keyed joins, no window,
    no explode, no per-user sort. Each aggregate is map-side combined,
    so hot users cost one partial per partition; at 10^10 events the
    plan is N sequential shuffles of |users| rows each (and the join key
    never changes, so a real cluster re-uses the partitioning across
    stages)."""
    ts = F.col(ts_col)
    out = None
    prev_t = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(step)
        if prev_t is None:
            cur = events.filter(cond).groupBy(user_col).agg(
                F.min(ts).alias(f"t_{i}")
            )
        else:
            cur = (
                events.join(
                    out.select(user_col, F.col(prev_t).alias("__p")),
                    user_col,
                )
                .filter(cond & (ts > F.col("__p")))
                .groupBy(user_col)
                .agg(F.min(ts).alias(f"t_{i}"))
            )
        out = out.join(cur, user_col, "left") if out is not None else cur
        prev_t = f"t_{i}"
    completed = sum(
        F.col(f"t_{i}").isNotNull().cast("int")
        for i in range(1, len(steps) + 1)
    )
    return out.withColumn("steps_completed", completed)


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention triangle -> (cohort, period, n_active,
    n_cohort, retention): users grouped by their first-activity period,
    counted back in every later period they reappear — the engagement
    health readout over any interleaved event log.

    Scale shape: ONE (user, period) distinct-reduce, one min-aggregate
    for the cohort assignment, one keyed join back (users x periods is
    tiny relative to events — the join input is already collapsed), two
    hash aggs. No window, no per-user sort, nothing quadratic.
    `retention` is n_active / n_cohort rounded to 6 places."""
    up = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc(grain, F.col(ts_col)).alias("p"),
        )
        .distinct()
    )
    first = up.groupBy("u").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count("*").alias("n_cohort")
    )
    active = (
        up.join(first, "u")
        .groupBy("cohort", F.col("p").alias("period"))
        .agg(F.count("*").alias("n_active"))
    )
    return active.join(sizes, "cohort").select(
        "cohort",
        "period",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
            "retention"
        ),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences -> (from_type, to_type, n, prob): the sequence-mining
    primitive behind next-action prediction, funnel discovery, and
    behavioral-log featurization for training data.

    ONE window per user (lead over the (ts, id) order — id is the
    deterministic tie-break for simultaneous events, same contract as
    sessionize) + one hash aggregate; prob is row-normalized within
    from_type by a keyed join of the per-from totals (never a global
    window). Skewed users cost one sorted partition each, the same bound
    as sessionize."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n").cast("double").alias("__tot")
    )
    return (
        counts.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("prob"),
        )
    )


def burst_scores(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    grain: str = "hour",
    trailing: int = 24,
) -> DataFrame:
    """Burst detection over per-type time-bucket counts -> (event_type,
    bucket_start, n, trail_mean, z): each bucket's count scored against
    the mean/std of the `trailing` PRECEDING buckets of the same type
    (the current bucket is excluded from its own baseline, so a burst
    cannot suppress its own z-score). Buckets with fewer than 2
    preceding observations or zero variance score NULL — honest
    cold-start/constant-series semantics, not a fake 0.

    Shape: one hash aggregate to (type, bucket) counts — the ONLY pass
    over the raw events — then windows partitioned BY TYPE over the
    tiny bucket series (a year of hourly buckets is 8.8k rows per type;
    the window never sees raw events). Missing buckets are not
    imputed: the trailing frame is over OBSERVED buckets, the
    documented contract (dense imputation would need a calendar spine
    join — compose with time_rollup if required)."""
    counts = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc(grain, F.col(ts_col).cast("timestamp")).alias(
                "bucket_start"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(-trailing, -1)
    )
    stats = counts.select(
        "event_type",
        "bucket_start",
        "n",
        F.count("n").over(w).alias("__k"),
        F.avg("n").over(w).alias("__mean"),
        F.stddev_samp("n").over(w).alias("__sd"),
    )
    return stats.select(
        "event_type",
        "bucket_start",
        "n",
        F.when(F.col("__k") >= 2, F.round("__mean", 6)).alias(
            "trail_mean"
        ),
        (
            F.when(
                (F.col("__k") >= 2) & (F.col("__sd") > 0),
                F.round(
                    (F.col("n") - F.col("__mean")) / F.col("__sd"), 6
                ),
            )
            + F.lit(0.0)
        ).alias("z"),
    )
