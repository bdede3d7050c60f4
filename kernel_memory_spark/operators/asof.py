"""As-of (point-in-time) join — a custom operator Spark's DataFrame API
lacks natively, built as a composition of existing ops (the brief's
case (a): no UDF needed).

Each left row joins the single right row with the same key whose
timestamp is the latest at-or-before the left row's timestamp (direction
'backward'; 'forward' = earliest at-or-after). The naive formulation is a
range join (left.ts >= right.ts) + per-left-row max — a shuffle-heavy
O(n*m) blowup per key at scale. This implementation uses the UNION +
ordered-window trick instead:

    union both sides tagged with a side marker, sort within each key by
    (ts, side) so right rows precede left rows at equal timestamps, and
    carry the last non-null right payload forward with last_value(...,
    ignoreNulls) — then keep only left rows.

ONE hash shuffle on the key and a per-key sort: O((|L|+|R|) log) per key,
the same shape pandas' merge_asof and kdb's aj use, and exactly what a
1000-executor cluster wants (skewed keys cost their own sort only).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[List[str]] = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + the matched right row's columns (suffixed), null when no
    right row exists at-or-before (backward) / at-or-after (forward)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols + [right_ts]])
                         .alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s"))
            .schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols + [right_ts]]).alias("__r"),
    )
    both = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows first at equal ts => a right row AT the left ts matches
        w = (
            Window.partitionBy(*on)
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.desc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    matched = both.withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)

    out = matched.select(
        F.col("__l.*"),
        *[
            F.col("__match").getField(c).alias(c + suffix)
            for c in right_cols + [right_ts]
        ],
    )
    return out.withColumnRenamed(right_ts + suffix, "matched" + suffix + "_ts")
