"""Sequence packing / token-budget sharding for training-data export.

Two constructions, two cost/quality points:

* shard_by_budget — CONTIGUOUS shards: documents in a deterministic total
  order (a unique key) are cut into shards of ~`budget` tokens by the
  exclusive running token sum. This is the standard "export the corpus as
  N-token shards" step before tokenizer-side packing. It is pure column
  algebra (one range shuffle + one per-partition window + a broadcast of
  per-partition offsets), layout-independent, and SQL-replayable — the
  DuckDB oracle mirrors it with a plain window cumsum.

  The global cumsum does NOT use a single-partition window (the naive
  `Window.orderBy(key)` plans one task holding the whole table): rows are
  range-partitioned by the key, each partition computes its local running
  sum, and the per-partition totals (numPartitions scalars, the only thing
  that ever reaches the driver) become broadcast offsets. Wall-clock is
  one extra small job; memory per task is one partition.

* pack_first_fit — true bin packing: first-fit-decreasing within
  hash-assigned groups (Arrow-batched applyInPandas). Groups are
  independent, so packing parallelizes perfectly and is deterministic
  under any layout (group membership and within-group order are pure
  functions of the key). FFD within a group wastes < 22% of capacity in
  the worst case (classic bound) and ~2-5% in practice; cross-group
  packing would need a global sort + sequential pass — not worth it at
  10^10 docs. Documents larger than the budget become singleton packs
  (flagged oversize) rather than being dropped or crashing.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Exclusive prefix sum of `value_col` in the total order of
    `order_col` (which must be unique — ties would make the order, and so
    the sum, ambiguous). Scale-safe: range partition + local window +
    broadcast per-partition offsets; no single-task global window."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__local", F.coalesce(F.sum(value_col).over(local_w), F.lit(0))
    )
    local = local.localCheckpoint()  # compute pids once; reused twice below
    # per-partition totals -> offsets on the driver (numPartitions scalars)
    sums = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid]
    off_df = df.sparkSession.createDataFrame(
        offsets, f"__pid int, __off {dict(local.dtypes)[value_col]}"
    )
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )


def shard_by_budget(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Contiguous token-budget shards: shard = floor(exclusive_cumsum /
    budget). Every shard except possibly the last holds >= budget tokens
    once its boundary document is counted; documents are never split."""
    out = global_cumsum(df, order_col, token_col)
    return out.withColumn(
        shard_col,
        F.floor(F.col("cum_before") / F.lit(budget)).cast("long"),
    ).drop("cum_before")


class _FirstFitBins:
    """Leftmost bin whose remaining capacity fits the item, in O(log b)
    per item via a max-capacity segment tree descended left-first.

    Placement is IDENTICAL to a linear first-fit scan over bins in
    creation order (the classic FFD inner loop): the tree's leftmost
    descent finds the lowest-indexed leaf with capacity >= tok, which is
    exactly the bin the linear scan would pick. Leaves past the last real
    bin hold capacity 0 and can only be selected for tok == 0, where bin 0
    (capacity >= 0 always) wins the descent first — same as the scan."""

    __slots__ = ("budget", "cap", "tree", "size")

    def __init__(self, budget: int):
        self.budget = budget
        self.size = 1
        self.tree = [0, 0]  # 1-indexed max-tree; leaves at [size, 2*size)
        self.cap: list[int] = []  # remaining capacity per bin, index = bin

    def _set_leaf(self, b: int, value: int) -> None:
        i = self.size + b
        self.tree[i] = value
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2

    def _grow(self) -> None:
        old = self.size
        self.size = old * 2
        tree = [0] * (2 * self.size)
        tree[self.size : self.size + old] = self.tree[old : 2 * old]
        for i in range(self.size - 1, 0, -1):
            tree[i] = max(tree[2 * i], tree[2 * i + 1])
        self.tree = tree

    def place(self, tok: int) -> int:
        """Place an item of `tok` tokens; returns the 0-based bin index."""
        if self.cap and self.tree[1] >= tok:
            i = 1
            while i < self.size:
                i *= 2
                if self.tree[i] < tok:
                    i += 1
            b = i - self.size
        else:
            b = len(self.cap)
            if b >= self.size:
                self._grow()
            self.cap.append(self.budget)
        self.cap[b] -= tok
        self._set_leaf(b, self.cap[b])
        return b


def pack_first_fit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_groups: Optional[int] = None,
    docs_per_group: int = 100_000,
) -> DataFrame:
    """First-fit-decreasing bin packing -> (pack_id, <id_col>, <token_col>,
    oversize). pack_id = '<group>:<bin>'; group = crc32(id) % n_groups, so
    membership and results are layout-independent. Oversize documents
    (tokens > budget) become singleton packs with oversize=true.

    Scale notes: `n_groups=None` sizes the group count from the data
    (ceil(n / docs_per_group), floor 32) so a 10^10-doc corpus gets 10^5
    groups of ~100k docs instead of 10^7-doc groups under a fixed
    constant; the within-group inner loop uses a leftmost-fit segment
    tree (O(n log b) per group, bit-identical placement to the linear
    first-fit scan — see TestFirstFitPacking property test)."""
    if n_groups is None:
        n_rows = df.select(id_col).count()
        n_groups = max(32, -(-n_rows // docs_per_group))
    schema = (
        f"pack_id string, {id_col} string, {token_col} long, "
        "oversize boolean"
    )

    cols = ["pack_id", id_col, token_col, "oversize"]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=cols)
        group = int(pdf["__grp"].iloc[0])
        pdf = pdf.sort_values([token_col, id_col], ascending=[False, True])
        bins = _FirstFitBins(budget)
        out_rows = []
        for _id, tok in zip(pdf[id_col], pdf[token_col]):
            tok = int(tok)
            if tok > budget:
                out_rows.append(
                    (f"{group}:oversize-{_id}", str(_id), tok, True)
                )
                continue
            placed = bins.place(tok)
            out_rows.append((f"{group}:{placed}", str(_id), tok, False))
        return pd.DataFrame(out_rows, columns=cols)

    grouped = df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(token_col).cast("long").alias(token_col),
        (F.crc32(F.col(id_col).cast("string")) % n_groups)
        .cast("int")
        .alias("__grp"),
    )
    return (
        grouped.groupBy("__grp")
        .applyInPandas(pack, schema=schema)
    )


def global_rank(
    df: DataFrame,
    order_col: str,
    out_col: str = "idx",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """0-based contiguous dense ids in the total order of `order_col`
    (which must be unique) — the DataFrame-native zipWithIndex, e.g. for
    remapping string/sparse KG node ids to dense ints before array-indexed
    algorithms or export. Exactly global_cumsum over a column of ones, so
    it inherits the scale story: range shuffle + per-partition window +
    broadcast offsets; no single-task global window, no RDD round-trip,
    deterministic under any input layout."""
    with_one = df.withColumn("__one", F.lit(1).cast("long"))
    return global_cumsum(
        with_one, order_col, "__one", out_col, num_partitions
    ).drop("__one")
