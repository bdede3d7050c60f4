"""Stage `canonicalize`: alias edges -> canonical entity ids via iterative
connected components, then node/edge materialization.

Min-label propagation over the undirected alias graph: every surface starts
as its own label; each round a surface adopts the minimum label among itself
and its neighbors; fixpoint when no label changes. Deterministic: the
canonical id of a component is its lexicographically smallest member, so
distributed and single-node runs agree exactly.

Spark-specific physical concerns (SURVEY §4 last row):
- each round is two equi-joins + one aggregation (shuffles on surface id);
- `localCheckpoint()` after every round truncates the lineage so the plan
  does not grow exponentially with iterations;
- rounds are O(graph diameter); alias clusters are tiny (entity alias sets),
  so this converges in a handful of rounds even at 10^12 docs — the cost is
  proportional to |distinct surfaces|, not |mentions|.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


class NonConvergenceError(RuntimeError):
    """Raised when label propagation has not reached a fixpoint in max_iter
    rounds (component diameter > max_iter): the labels would be silently
    wrong otherwise."""


def connected_components(
    edges: DataFrame, max_iter: int = 25, strict: bool = True
) -> DataFrame:
    """edges(a, b) -> (norm, component) where component = min member id.

    Min-label propagation advances one hop per round, so a component whose
    diameter exceeds max_iter does not converge; with strict=True that
    raises NonConvergenceError, otherwise it is logged as a warning and the
    (incorrect on the long component) labels are returned."""
    # Undirected: symmetrize once.
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    # Initialize labels at round 1's result directly: with identity labels,
    # the first propagation round computes min(self, neighbors) — exactly
    # this one aggregation. Fusing it into the init removes one full
    # join+aggregate round (and the separate vertices.distinct shuffle);
    # every vertex appears as `a` because sym is symmetrized.
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("__nb"))
        .select(
            F.col("a").alias("norm"),
            F.least(F.col("a"), F.col("__nb")).alias("component"),
        )
    ).localCheckpoint()

    converged = False
    for _it in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["norm"])
            .select(sym["a"].alias("norm"), F.col("component"))
            .groupBy("norm")
            .agg(F.min("component").alias("nbr_component"))
        )
        # ONE driver action per round: the lazy localCheckpoint is
        # materialized by the changed-count job itself, which doubles as
        # the convergence probe — previously each round paid an eager
        # checkpoint job PLUS a separate isEmpty probe every other round,
        # and convergence was only detectable on probe rounds. Same labels,
        # fewer driver round-trips, earliest possible exit.
        updated = (
            labels.join(neighbor_min, "norm", "left")
            .select(
                "norm",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.coalesce("nbr_component", "component") < F.col("component")).alias(
                    "changed"
                ),
            )
        ).localCheckpoint(eager=False)
        n_changed = updated.filter("changed").count()
        labels = updated.select("norm", "component")
        if n_changed == 0:
            converged = True
            break

    if not converged:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            "(a component's diameter exceeds max_iter); labels are stale "
            "on the unconverged component(s)"
        )
        if strict:
            raise NonConvergenceError(msg)
        log.warning(msg)

    return labels


def entity_map(mentions: DataFrame, edges: DataFrame) -> DataFrame:
    """All surfaces (incl. singletons) -> canonical_id (= component min)."""
    surfaces = mentions.select("norm").distinct()
    components = connected_components(edges)
    return (
        surfaces.join(components, "norm", "left")
        .select(
            "norm",
            F.coalesce("component", "norm").alias("canonical_id"),
        )
    )


def materialize_nodes(
    mentions: DataFrame, emap: DataFrame
) -> DataFrame:
    """Canonical entity nodes with alias/mention counts (-> NODES schema).
    Mention counts use the explicit salted two-phase aggregation: surface
    frequency is Zipfian, so the hot entities would otherwise funnel into
    single reducers."""
    from kernel_memory_spark.operators.linking import salted_surface_counts

    per_surface = salted_surface_counts(mentions).withColumnRenamed(
        "n_mentions", "n"
    )
    return (
        per_surface.join(emap, "norm")
        .groupBy("canonical_id")
        .agg(
            F.count("*").cast("int").alias("n_aliases"),
            F.sum("n").alias("n_mentions"),
        )
        .select(
            F.col("canonical_id").alias("node_id"),
            F.col("canonical_id").alias("label"),
            F.lit("entity").alias("kind"),
            "n_aliases",
            "n_mentions",
        )
    )


def materialize_edges(canonical_triples: DataFrame) -> DataFrame:
    """Canonical (subj, pred, obj) -> weighted edge table (-> EDGES schema)."""
    return canonical_triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("weight")
    ).select(
        F.col("subj").alias("src"), "pred", F.col("obj").alias("dst"), "weight"
    )
