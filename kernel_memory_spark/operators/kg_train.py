"""KG-embedding training-data operators: random-walk corpora and
filtered negative sampling.

A materialized knowledge graph (the pipeline's nodes/edges output,
operators/canonicalize.py) is usually consumed by representation
learning — DeepWalk/node2vec walks feeding a skip-gram model, and
TransE-style triple scoring trained with corrupted negatives (Bordes et
al. 2013). Both generators are re-expressed here as pure column algebra
+ joins, with the randomness replaced by md5-hash draws so the output
is deterministic, layout-independent, and replayable in any SQL engine
(the same '0x'||substr(md5(..),1,8) construction operators/sampling.py
pins cross-engine).

Scale shape:

* `random_walks`: per step exactly ONE shuffle join (frontier ⋈
  adjacency on the current node) and ONE hash aggregate (min-by-hash
  per walk, map-side combinable). The frontier never grows — it is one
  row per walk at every step — so `length` steps cost `length` joins
  over a constant-size relation. Hub fan-out in the join is bounded by
  the optional `neighbor_cap` (a static md5-ranked neighbor subsample,
  the standard node2vec scale trick); walks that hit a sink terminate
  and keep their shorter path. Lineage is localCheckpoint-truncated on
  the same cadence as pagerank.
* `negative_samples`: entity pool gets dense 0-based ids via
  packing.global_rank (range shuffle + broadcast offsets — no
  single-task global window), each positive draws k pool indexes by
  hash, one equi-join on idx materializes the candidate tails, one
  left_anti against the true triples implements the FILTERED setting
  (a sampled corruption that happens to be a true triple is dropped,
  including the positive itself). No Python anywhere.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 4


def _md5_long(col) -> "F.Column":
    """First 8 md5 hex chars as a non-negative int64 — the cross-engine
    uniform hash (DuckDB: ('0x'||substr(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    length: int = 3,
    src: str = "src",
    dst: str = "dst",
    neighbor_cap: Optional[int] = None,
    seed: str = "walk",
) -> DataFrame:
    """Deterministic hash-seeded uniform random walks ->
    (walk_id, start, path, n_steps).

    `edges` is the DIRECTED adjacency (symmetrize() first for an
    undirected graph). Every node starts `walks_per_node` walks; at step
    s a walk at node u moves to the out-neighbor v minimizing
    md5(seed:walk_id:s:v) — a uniform choice that is reproducible across
    engines and cluster layouts, unlike rand(). A walk at a sink keeps
    its path (n_steps records how far it got). `path` is the
    '->'-joined node sequence (skip-gram corpus line).

    `neighbor_cap` statically subsamples each node's out-neighbors to
    the cap lowest md5(seed:u:v) — at 10^10 edges a 10^6-degree hub
    would otherwise fan every passing walk out a million ways for a
    single argmin."""
    adj = edges.select(
        F.col(src).cast("long").alias("__cur"),
        F.col(dst).cast("long").alias("__nxt"),
    )
    if neighbor_cap is not None:
        rank_w = Window.partitionBy("__cur").orderBy(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("__cur").cast("string"),
                    F.col("__nxt").cast("string"),
                )
            ),
            "__nxt",
        )
        adj = (
            adj.withColumn("__rn", F.row_number().over(rank_w))
            .filter(F.col("__rn") <= neighbor_cap)
            .drop("__rn")
        )
    adj = adj.localCheckpoint()  # reused `length` times

    starts = adj.select(F.col("__cur").alias("node")).distinct()
    frontier = starts.select(
        F.col("node").alias("start"),
        F.col("node").alias("cur"),
        F.col("node").cast("string").alias("path"),
        F.explode(
            F.array(*[F.lit(i) for i in range(walks_per_node)])
        ).alias("__w"),
    ).select(
        F.concat_ws(
            "#", F.col("start").cast("string"), F.col("__w").cast("string")
        ).alias("walk_id"),
        "start",
        "cur",
        "path",
        F.lit(0).alias("n_steps"),
    )

    for step in range(1, length + 1):
        scored = frontier.join(
            adj, frontier["cur"] == adj["__cur"], "left"
        ).select(
            "walk_id",
            "start",
            "cur",
            "path",
            "n_steps",
            F.col("__nxt").alias("nxt"),
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("walk_id"),
                    F.lit(str(step)),
                    F.col("__nxt").cast("string"),
                )
            ).alias("sc"),
        )
        picked = scored.groupBy(
            "walk_id", "start", "cur", "path", "n_steps"
        ).agg(
            F.min(
                F.when(
                    F.col("nxt").isNotNull(), F.struct("sc", "nxt")
                )
            ).alias("__pick")
        )
        nxt = F.col("__pick.nxt")
        frontier = picked.select(
            "walk_id",
            "start",
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(
                nxt.isNotNull(),
                F.concat_ws("->", F.col("path"), nxt.cast("string")),
            )
            .otherwise(F.col("path"))
            .alias("path"),
            (
                F.col("n_steps") + F.when(nxt.isNotNull(), 1).otherwise(0)
            ).cast("int").alias("n_steps"),
        )
        if step % _CHECKPOINT_EVERY == 0 and step < length:
            frontier = frontier.localCheckpoint()

    return frontier.select("walk_id", "start", "path", "n_steps")


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    corrupt: str = "obj",
    seed: str = "neg",
) -> DataFrame:
    """Filtered corrupted-triple negatives for KG-embedding training ->
    (subj, pred, neg_ix, obj_neg) (corrupt='subj' swaps the roles and
    returns subj_neg).

    For every true triple and i in 0..k-1, a replacement entity is drawn
    from the distinct pool of the corrupted column at dense index
    md5(seed|subj|pred|obj|i) % |pool| — uniform, deterministic,
    engine-replayable. The FILTERED setting of Bordes et al. 2013 then
    drops any draw that collides with a true triple (which also covers
    drawing the positive itself), so a positive can yield fewer than k
    negatives; emit-what-survives is the standard contract."""
    keep, corrupt_col = (subj, obj) if corrupt == obj else (obj, subj)
    out_name = f"{corrupt_col}_neg"

    from kernel_memory_spark.operators.packing import global_rank

    pool = global_rank(
        triples.select(F.col(corrupt_col).alias("__ent")).distinct(),
        "__ent",
        "__idx",
    )
    n_pool = pool.count()  # bounded scalar: |entity vocabulary|

    cand = triples.select(subj, pred, obj).withColumn(
        "neg_ix",
        F.explode(F.array(*[F.lit(i) for i in range(k)])),
    )
    draw = _md5_long(
        F.concat_ws(
            "|",
            F.lit(seed),
            F.col(subj).cast("string"),
            F.col(pred).cast("string"),
            F.col(obj).cast("string"),
            F.col("neg_ix").cast("string"),
        )
    )
    cand = cand.withColumn("__idx", F.pmod(draw, F.lit(n_pool)))
    joined = cand.join(pool, "__idx").select(
        subj, pred, obj, "neg_ix", F.col("__ent").alias(out_name)
    )
    true_keyed = triples.select(
        F.col(keep).alias(keep),
        F.col(pred).alias(pred),
        F.col(corrupt_col).alias(out_name),
    ).distinct()
    filtered = joined.join(
        true_keyed, [keep, pred, out_name], "left_anti"
    )
    # the surviving (kept-entity, pred, replacement) IS the negative
    # triple; the corrupted original column is dropped
    return filtered.select(keep, pred, "neg_ix", out_name)


def node2vec_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    length: int = 3,
    return_units: int = 2,
    base_units: int = 4,
    out_units: int = 8,
    src: str = "src",
    dst: str = "dst",
    neighbor_cap: Optional[int] = None,
    seed: str = "n2v",
) -> DataFrame:
    """Second-order (node2vec-biased) random walks (Grover & Leskovec
    2016) -> (walk_id, start, path, n_steps): at each step the candidate
    class is decided by the PREVIOUS node — return to prev, stay at
    distance 1 from prev (candidate adjacent to prev), or move outward —
    and classes are weighted return_units : base_units : out_units
    (node2vec's 1/p : 1 : 1/q with the weights cleared to small
    integers; defaults 2:4:8 ≡ p=2, q=0.5, the outward/DFS-ish regime).

    Exact integer-weighted choice WITHOUT transcendentals: candidate v
    in class with w units enters w independent md5 draws
    (seed:walk:step:v:j) and the walk moves to the candidate owning the
    MINIMUM draw — the minimum of N iid uniforms is equally likely to
    be each one, so P(v) = w_v / sum(w), exactly proportional, and the
    whole step is string hashing + comparisons: bit-identical in any
    engine (no ln(), whose last-ulp is libm-specific). Draw fan-out per
    candidate is <= max units (a small constant).

    Scale shape = random_walks plus the node2vec tax: ONE extra keyed
    join per step, (prev, candidate) against the edge set, to classify
    candidates — the unavoidable cost of second-order bias in any
    distributed walker (the alias-table trick is per-machine, not
    per-cluster). First step has no prev: all candidates weigh
    base_units. `edges` directed; symmetrize() first for undirected."""
    adj = edges.select(
        F.col(src).cast("long").alias("__cur"),
        F.col(dst).cast("long").alias("__nxt"),
    )
    if neighbor_cap is not None:
        rank_w = Window.partitionBy("__cur").orderBy(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("__cur").cast("string"),
                    F.col("__nxt").cast("string"),
                )
            ),
            "__nxt",
        )
        adj = (
            adj.withColumn("__rn", F.row_number().over(rank_w))
            .filter(F.col("__rn") <= neighbor_cap)
            .drop("__rn")
        )
    adj = adj.localCheckpoint()
    adj_e = adj.select(
        F.col("__cur").alias("__p"),
        F.col("__nxt").alias("__v"),
        F.lit(True).alias("__is_adj"),
    )

    starts = adj.select(F.col("__cur").alias("node")).distinct()
    frontier = starts.select(
        "node",
        F.explode(
            F.array(*[F.lit(i) for i in range(walks_per_node)])
        ).alias("__w"),
    ).select(
        F.concat_ws(
            "#",
            F.col("node").cast("string"),
            F.col("__w").cast("string"),
        ).alias("walk_id"),
        F.col("node").alias("start"),
        F.col("node").alias("cur"),
        F.lit(None).cast("long").alias("prev"),
        F.col("node").cast("string").alias("path"),
        F.lit(0).alias("n_steps"),
    )

    for step in range(1, length + 1):
        cands = frontier.join(
            adj, frontier["cur"] == adj["__cur"], "left"
        ).select(
            "walk_id", "start", "cur", "prev", "path", "n_steps",
            F.col("__nxt").alias("nxt"),
        )
        cands = cands.join(
            adj_e,
            (cands["prev"] == adj_e["__p"])
            & (cands["nxt"] == adj_e["__v"]),
            "left",
        ).select(
            "walk_id", "start", "cur", "prev", "path", "n_steps", "nxt",
            F.when(F.col("prev").isNull(), F.lit(base_units))
            .when(F.col("nxt") == F.col("prev"), F.lit(return_units))
            .when(F.col("__is_adj"), F.lit(base_units))
            .otherwise(F.lit(out_units))
            .alias("__units"),
        )
        drawn = cands.select(
            "walk_id", "start", "cur", "path", "n_steps", "nxt",
            # sink walks (nxt null) keep one row with __j = null via
            # explode_outer of a null array
            F.explode_outer(
                F.when(
                    F.col("nxt").isNotNull(),
                    F.sequence(F.lit(0), F.col("__units") - 1),
                )
            ).alias("__j"),
        ).select(
            "walk_id", "start", "cur", "path", "n_steps", "nxt",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("walk_id"),
                    F.lit(str(step)),
                    F.col("nxt").cast("string"),
                    F.col("__j").cast("string"),
                )
            ).alias("sc"),
        )
        picked = drawn.groupBy(
            "walk_id", "start", "cur", "path", "n_steps"
        ).agg(
            F.min(
                F.when(
                    F.col("nxt").isNotNull(), F.struct("sc", "nxt")
                )
            ).alias("__pick")
        )
        nxt = F.col("__pick.nxt")
        frontier = picked.select(
            "walk_id",
            "start",
            F.coalesce(nxt, F.col("cur")).alias("cur"),
            F.when(nxt.isNotNull(), F.col("cur"))
            .otherwise(F.lit(None).cast("long"))
            .alias("prev"),
            F.when(
                nxt.isNotNull(),
                F.concat_ws("->", F.col("path"), nxt.cast("string")),
            )
            .otherwise(F.col("path"))
            .alias("path"),
            (
                F.col("n_steps") + F.when(nxt.isNotNull(), 1).otherwise(0)
            ).cast("int").alias("n_steps"),
        )
        if step % _CHECKPOINT_EVERY == 0 and step < length:
            frontier = frontier.localCheckpoint()

    return frontier.select("walk_id", "start", "path", "n_steps")
