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
