"""Graph analytics over the materialized knowledge graph (NODES/EDGES).

The pipeline's `materialize` stage produces canonical entity nodes and
weighted (src, pred, dst, weight) edges (operators/canonicalize.py:108-143;
reference KG assembly: src/Core/Graph — the reference stops at storing the
graph, these operators answer the questions a stored KG exists to answer:
importance ranking, neighborhood retrieval, cohesion).

Scale design — every operator here is iterative-join-shaped, which is where
naive Spark graph code dies at 10^10 edges:

* PageRank: the edge relation is joined `iterations` times. We compute
  out-degrees ONCE, pre-join them into a static contribution relation, and
  cache it; per iteration there is exactly ONE shuffle-join (ranks ⋈ edges
  on src) and ONE hash aggregate (sum by dst, partial/map-side combine
  absorbs hub skew). Lineage is truncated with localCheckpoint every few
  iterations or the plan grows exponentially and the driver OOMs planning
  iteration 20.
* Triangle counting uses the degree-ordering trick (orient each undirected
  edge from the (degree, id)-smaller endpoint to the larger): the wedge
  join then touches each wedge once and its size is bounded by
  sum(min_deg^2) instead of sum(deg^2) — the difference between feasible
  and not on power-law graphs.
* k-hop BFS keeps a `visited` anti-join so each node is expanded once;
  frontiers are distinct-ed before the expansion join so hub fan-in doesn't
  re-expand.

Everything is pure DataFrame (no Python in any hot path), deterministic,
and layout-independent — each operator has a DuckDB-replayable SQL mirror
in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 4


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct undirected edge set as both directions of each pair
    (self-loops dropped): the canonical input for pagerank/k_hop on an
    undirected graph."""
    pairs = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias(src), F.greatest(src, dst).alias(dst)
        )
        .distinct()
    )
    return pairs.unionByName(
        pairs.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: Optional[str] = None,
    init: Optional[DataFrame] = None,
) -> DataFrame:
    """Fixed-iteration PageRank -> (node, rank).

    r_{t+1}(v) = (1-d)/N + d * sum over in-edges (u,v) of r_t(u)/outdeg(u)
    (weighted variant divides by the sum of u's outgoing weights). Dangling
    nodes contribute nothing (their mass decays into the teleport term) —
    the standard simplification; symmetrize() the edges first if the graph
    is undirected, which also removes danglers.

    Deterministic given the edge set: the only float reduction is a hash
    aggregate whose addition order varies, so compare ranks rounded (the
    oracle rounds to 6); N reaches the driver as a single scalar, ranks
    never do.

    `init` warm-starts the iteration from a previous run's (node, rank)
    output instead of the uniform 1/N vector — the incremental-refresh
    path: after a graph delta, resume from yesterday's ranks and converge
    in a fraction of the iterations. Because the sync update is a pure
    function of the previous vector, warm-starting k iterations from a
    k-iteration cold run is EXACTLY a 2k-iteration cold run (pinned by
    the pagerank_warm_parts oracle and test_graph warm-start parity).
    Nodes absent from `init` (new since the snapshot) start at 1/N."""
    e = edges.select(src, dst, *( [weight] if weight else [] ))
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    w = F.col(weight) if weight else F.lit(1.0)
    out_mass = e.groupBy(src).agg(F.sum(w).alias("out_mass"))
    # static contribution relation: one join, computed once, reused per
    # iteration (cache keeps it materialized across the iteration jobs)
    contrib_e = (
        e.join(out_mass, src)
        .select(
            F.col(src).alias("u"),
            F.col(dst).alias("node"),
            (w / F.col("out_mass")).alias("share"),
        )
        .cache()
    )
    nodes = nodes.cache()
    teleport = (1.0 - damping) / n
    if init is not None:
        ranks = nodes.join(
            init.select("node", F.col("rank").alias("__r0")), "node", "left"
        ).select(
            "node", F.coalesce("__r0", F.lit(1.0 / n)).alias("rank")
        )
    else:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            contrib_e.join(
                ranks.select(F.col("node").alias("u"), "rank"), "u"
            )
            .select("node", (F.col("rank") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def triangles_per_node(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts -> (node, n_triangles), nodes with none
    omitted.

    Degree-ordered enumeration: undirected edges are oriented from the
    (degree, id)-smaller endpoint to the larger, wedges are generated by
    self-joining oriented edges on their source, and a wedge (u; v, w)
    closes iff the oriented edge (v, w) exists — each triangle is produced
    exactly once, and the wedge join is bounded by sum(min_deg^2), the
    classic power-law-safe bound (Schank & Wagner 2005)."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed(
        "a", "node"
    )
    # orient by (deg, id): u -> v iff (deg(u), u) < (deg(v), v)
    ranked = (
        adj.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")),
            "b",
        )
    )
    # lazy checkpoint: `oriented` feeds FOUR consumers (both wedge-join
    # sides and the two `closing` union branches) and `tris` feeds the
    # three corner projections — without materialization Spark re-derives
    # the degree-join pipeline four times and the wedge semi-join three
    # times (subtrees are never shared across join/union branches). Values
    # are unchanged; both materialize inside the terminal action.
    oriented = ranked.filter(
        (F.col("deg_a") < F.col("deg_b"))
        | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    ).select(F.col("a").alias("u"), F.col("b").alias("v")).localCheckpoint(
        eager=False
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("u"),
            F.col("e1.v").alias("v"),
            F.col("e2.v").alias("w"),
        )
    )
    closing = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    ).unionByName(oriented.select(F.col("v").alias("v"), F.col("u").alias("w")))
    tris = wedges.join(closing.distinct(), ["v", "w"], "left_semi")\
        .localCheckpoint(eager=False)
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("v").alias("node")))
        .unionByName(tris.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node -> (node, deg, n_triangles,
    lcc) over every node of the undirected graph: lcc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)), 0.0 where deg < 2 (Watts & Strogatz 1998 — the
    KG cohesion signal that separates tight entity clusters from hub
    spokes).

    Cost = triangles_per_node (degree-ordered wedge join, the
    sum(min_deg^2) bound) + one degree aggregate + one left join keyed on
    |V| — nothing here touches a quadratic relation, so the operator
    scales exactly as triangle counting does."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    tri = triangles_per_node(und, src="a", dst="b")
    out = deg.join(tri, "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce("n_triangles", F.lit(0))
            / (F.col("deg") * (F.col("deg") - F.lit(1.0))),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )
    return out


def hits(
    edges: DataFrame,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) over a DIRECTED graph ->
    (node, hub, authority), L2-normalized each half-step.

    a_t(v) = Σ_{(u,v)∈E} h_{t-1}(u), then a_t /= ‖a_t‖₂;
    h_t(u) = Σ_{(u,v)∈E} a_t(v),   then h_t /= ‖h_t‖₂; h_0 ≡ 1.
    Self-loops dropped, duplicate edges collapsed (unweighted).

    Scale shape mirrors pagerank: the edge relation is cached once; each
    half-step is ONE shuffle-join (scores ⋈ edges) + ONE map-combined
    hash aggregate. Because the iteration is LINEAR, the per-step L2
    normalization is deferred — a normalization scalar embedded per step
    would copy the whole lineage into a nested broadcast subtree each
    half-step and the plan would double per step. Instead the raw sums
    iterate, a rescale lands on the localCheckpoint boundary (where the
    frame is materialized anyway, keeping magnitudes ~1 so 10^7-degree
    hubs can't overflow double range between checkpoints), and the final
    vectors are unit-normalized once — the identical unit vectors, since
    scalar factors commute through the iteration. Deterministic up to
    float sum order — compare rounded (the oracle rounds to 6)."""
    e = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
        .cache()
    )

    def _half_step(scores: DataFrame, edge_from: str,
                   edge_to: str) -> DataFrame:
        """raw(x) = Σ over edges (from→to) of scores(other end)."""
        raw = (
            e.join(
                scores.select(
                    F.col("node").alias(edge_from), F.col("s").alias("s")
                ),
                edge_from,
            )
            .groupBy(F.col(edge_to).alias("node"))
            .agg(F.sum("s").alias("s"))
        )
        return nodes.join(raw, "node", "left").select(
            "node", F.coalesce("s", F.lit(0.0)).alias("s")
        )

    def _l2_normalize(scores: DataFrame) -> DataFrame:
        norm = scores.agg(
            F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n2")
        )
        return scores.crossJoin(F.broadcast(norm)).select(
            "node", (F.col("s") / F.col("n2")).alias("s")
        )

    hub = nodes.select("node", F.lit(1.0).alias("s"))
    auth = None
    for i in range(iterations):
        # Lazy checkpoint per half-step: hub_t's lineage contains auth_t,
        # which the final hub ⋈ auth join would otherwise RE-derive as a
        # second full chain (Spark shares no subtrees across join sides),
        # and the un-truncated plan grew by three joins per half-step —
        # at 3 iterations the single final action carried a ~20-join tree
        # that spent minutes in planning/AQE. The lazy checkpoints
        # materialize each half-step once inside the terminal action
        # (no extra jobs, no value change); the eager checkpoint + rescale
        # cadence below is unchanged so magnitudes still can't overflow
        # between checkpoints on deep iteration counts.
        auth = _half_step(hub, src, dst).localCheckpoint(eager=False)
        hub = _half_step(auth, dst, src)
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iterations:
            hub = _l2_normalize(hub.localCheckpoint())
        else:
            hub = hub.localCheckpoint(eager=False)
    return (
        _l2_normalize(hub)
        .select("node", F.col("s").alias("hub"))
        .join(
            _l2_normalize(auth).select(
                "node", F.col("s").alias("authority")
            ),
            "node",
        )
    )


def k_hop(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """BFS shortest hop-distance from a source set -> (node, dist),
    dist in [0, k]; unreachable nodes omitted. `sources` is a one-column
    DataFrame of node ids (its column is taken positionally).

    Each level is one join + distinct + anti-join; `visited` is
    localCheckpoint-ed per level so the lineage stays O(1) and a failed
    task replays one level, not the whole traversal. Early-exits when a
    frontier empties (the .count() per level is a scalar job on an
    already-shuffled frontier — the idiomatic convergence guard, same as
    connected_components)."""
    node_col = sources.columns[0]
    frontier = (
        sources.select(F.col(node_col).alias("node")).distinct().cache()
    )
    visited = frontier.select("node", F.lit(0).alias("dist"))
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("nxt"))
    for level in range(1, k + 1):
        nxt = (
            frontier.join(e, "node")
            .select(F.col("nxt").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        frontier = nxt.localCheckpoint()
        if frontier.isEmpty():
            break
        visited = visited.unionByName(
            frontier.select("node", F.lit(level).alias("dist"))
        ).localCheckpoint()
    return visited


def neighbor_mean(
    edges: DataFrame,
    features: DataFrame,
    id_col: str,
    vec_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One round of neighborhood feature aggregation (the GNN/node2vec
    smoothing primitive): for every edge target, the element-wise MEAN of
    its neighbors' feature vectors -> exploded (node, pos, val) rows.

    Implementation is posexplode + hash-aggregate on (node, pos), NOT
    collect_list-then-fold: a hub with 10^6 neighbors never materializes
    10^6 vectors in one task — partial aggregation collapses each map
    partition to one (sum, count) per (node, pos) before the shuffle, so
    skew from power-law degree distributions is absorbed map-side (same
    reasoning as the salted aggregations in linking.py, but here the
    combiner alone suffices because the aggregate is algebraic).

    Emitting exploded rows instead of re-assembled arrays is deliberate:
    (node, pos, val) is engine-neutral (the DuckDB mirror is unnest WITH
    ORDINALITY), and the caller can pivot back with collect_list over pos
    if an array is wanted."""
    feats = features.select(
        F.col(id_col).alias("__nbr"), F.col(vec_col).alias("__vec")
    )
    adj = edges.select(
        F.col(dst).alias("node"), F.col(src).alias("__nbr")
    )
    joined = adj.join(feats, "__nbr")
    return (
        joined.select(
            "node", F.posexplode("__vec").alias("pos", "val")
        )
        .groupBy("node", "pos")
        .agg(F.avg("val").alias("mean_val"))
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: Optional[str] = None,
) -> DataFrame:
    """Personalized PageRank -> (node, rank): teleport mass returns to the
    SEED set instead of the whole graph, so ranks measure relevance TO the
    seeds (the KG query primitive behind "entities related to X" — Haveliwala
    2002). `seeds` is a one-column DataFrame of node ids (taken
    positionally); seeds absent from the graph still count in the teleport
    normalizer (their mass decays like dangling mass).

    r_0 = tele;  r_{t+1}(v) = (1-d)·tele(v) + d·Σ_{(u,v)} r_t(u)/outdeg(u)

    Same scale shape as pagerank: the static contribution relation is
    built once and cached, one shuffle-join + one map-combined aggregate
    per iteration, lineage checkpointed. The teleport vector is a keyed
    left-join column, not a broadcast of the seed set, so a 10^8-node
    seed set (e.g. "all entities of type person") works unchanged."""
    e = edges.select(src, dst, *([weight] if weight else []))
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    seed_col = seeds.columns[0]
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = s.count()
    tele = (
        nodes.join(s.withColumn("__t", F.lit(1.0 / n_seeds)), "node", "left")
        .select("node", F.coalesce("__t", F.lit(0.0)).alias("tele"))
        .cache()
    )
    w = F.col(weight) if weight else F.lit(1.0)
    out_mass = e.groupBy(src).agg(F.sum(w).alias("out_mass"))
    contrib_e = (
        e.join(out_mass, src)
        .select(
            F.col(src).alias("u"),
            F.col(dst).alias("node"),
            (w / F.col("out_mass")).alias("share"),
        )
        .cache()
    )
    ranks = tele.select("node", F.col("tele").alias("rank"))
    for i in range(iterations):
        contribs = (
            contrib_e.join(
                ranks.select(F.col("node").alias("u"), "rank"), "u"
            )
            .select("node", (F.col("rank") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = tele.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping) * F.col("tele")
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: Optional[int] = None,
    min_common: int = 1,
) -> DataFrame:
    """Adamic-Adar link prediction -> (u, v, n_common, score) for
    NON-adjacent pairs, u < v: score = sum over common neighbors w of
    1 / ln(deg(w)) (Adamic & Adar 2003) — the KG-completion primitive
    ("which entities should probably be connected?").

    Pairs are enumerated per common neighbor (adj self-join on the shared
    endpoint), so the work is sum(deg^2) over NEIGHBOR nodes — on
    power-law graphs a single hub explodes that bound, so `max_degree`
    caps which nodes may act as common neighbors (a hub shared by 10^6
    pairs carries ~no evidence anyway: its weight is 1/ln(10^6) ≈ 0.07;
    dropping it is the standard approximation, stated, not silent).
    Existing edges are removed with one anti-join on the undirected edge
    set; `min_common` prunes single-witness pairs before the join."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("w")).agg(
        F.count("*").alias("deg_w")
    )
    if max_degree is not None:
        deg = deg.filter(F.col("deg_w") <= max_degree)
    # (w, u) rows for every neighbor u of an eligible common-neighbor w
    thru = adj.select(F.col("a").alias("w"), F.col("b").alias("u")).join(
        deg, "w"
    )
    pairs = (
        thru.alias("l")
        .join(thru.alias("r"), F.col("l.w") == F.col("r.w"))
        .filter(F.col("l.u") < F.col("r.u"))
        .select(
            F.col("l.u").alias("u"),
            F.col("r.u").alias("v"),
            (F.lit(1.0) / F.log(F.col("l.deg_w").cast("double"))).alias(
                "__aa"
            ),
        )
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("__aa").alias("score"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    return pairs.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )


def neighbor_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: Optional[int] = None,
    min_common: int = 1,
) -> DataFrame:
    """Jaccard-coefficient link prediction -> (u, v, n_common, jaccard)
    for NON-adjacent pairs, u < v: |N(u) ∩ N(v)| / |N(u) ∪ N(v)| (Liben-
    Nowell & Kleinberg 2003) — the set-overlap sibling of adamic_adar,
    preferred when raw neighborhood overlap (not inverse-frequency
    evidence) is the linkage signal, e.g. alias candidates sharing most
    of their KG context.

    Same wedge enumeration as adamic_adar (adj self-join on the shared
    witness, work bounded by sum(deg^2) over witnesses; `max_degree`
    caps witness fan-out on power-law graphs — the NUMERATOR becomes an
    under-count approximation, stated, while the denominator keeps full
    degrees so capped scores never exceed exact ones). Existing edges
    removed with one anti-join; `min_common` prunes single-witness pairs
    before the degree join-back."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("w")).agg(
        F.count("*").alias("deg_w")
    )
    wit = deg if max_degree is None else deg.filter(
        F.col("deg_w") <= max_degree
    )
    thru = adj.select(F.col("a").alias("w"), F.col("b").alias("u")).join(
        wit.select("w"), "w"
    )
    pairs = (
        thru.alias("l")
        .join(thru.alias("r"), F.col("l.w") == F.col("r.w"))
        .filter(F.col("l.u") < F.col("r.u"))
        .groupBy(F.col("l.u").alias("u"), F.col("r.u").alias("v"))
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    # full (uncapped) degrees of the endpoints set the union size
    pairs = (
        pairs.join(deg.select(F.col("w").alias("u"),
                              F.col("deg_w").alias("__du")), "u")
        .join(deg.select(F.col("w").alias("v"),
                         F.col("deg_w").alias("__dv")), "v")
        .select(
            "u", "v", "n_common",
            (
                F.col("n_common")
                / (F.col("__du") + F.col("__dv") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return pairs.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation communities -> (node, label)
    (Raghavan et al. 2007, deterministic variant): labels start as the
    node's own id; each round every node adopts the label held by the
    MOST of its neighbors, ties broken by smallest label. Fixed iteration
    count + deterministic tie-break = reproducible output (async LPA's
    random visit order is deliberately not reproduced).

    Per round: one shuffle-join (neighbor labels), one (node, label)
    hash-aggregate (map-side combine absorbs hub fan-in), one node-
    partitioned window for the argmax — no global window, no collect.
    Lineage is checkpoint-truncated like pagerank's."""
    from pyspark.sql import Window

    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("node"), F.col("b").alias("nbr")).cache()
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    pick = Window.partitionBy("node").orderBy(
        F.desc("votes"), F.asc("label")
    )
    for i in range(iterations):
        votes = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("votes"))
        )
        labels = (
            votes.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iterations:
            labels = labels.localCheckpoint()
    return labels


def k_core(
    edges: DataFrame,
    k: int,
    iterations: Optional[int] = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core membership -> (node,): the maximal subgraph in which every
    node keeps degree >= k (Seidman 1983) — the KG densest-region filter
    (drop the periphery before expensive per-node analytics).

    Iterative peel: drop nodes with current degree < k, remove their
    edges, repeat. The fixpoint is unique regardless of peel order, so
    the output is deterministic. `iterations=None` runs to convergence
    (monotone shrinking node set; the per-round count is the same scalar
    convergence guard as connected_components'); an int runs EXACTLY that
    many peels — the fixed-round variant an unrolled SQL mirror can
    replay.

    Per round: one degree aggregate + two semi-joins (both endpoints must
    survive); the adjacency is localCheckpoint-ed so lineage stays O(1)
    across rounds."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    n_prev = adj.select("a").distinct().count()
    rounds = 0
    while True:
        deg = adj.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("a").alias("node"))
        rounds += 1
        if iterations is not None and rounds >= iterations:
            return keep
        n_now = keep.count()
        adj = (
            adj.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
        if n_now == n_prev:
            return keep
        n_prev = n_now


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int,
    src: str = "src",
    dst: str = "dst",
    weight: Optional[str] = None,
) -> DataFrame:
    """Bounded-hop weighted shortest distances from a source set ->
    (node, dist): Bellman-Ford limited to `iterations` relaxation rounds,
    i.e. cheapest path using at most that many edges (k_hop's weighted
    sibling; with weight=None every edge costs 1.0 and dist is float hop
    count). Non-negative weights assumed (KG edge costs); negative-cycle
    detection is out of scope by construction.

    Per round: one shuffle-join (frontier distances x out-edges) + one
    min-aggregate, then a min-merge with the standing distances — all
    algebraic, map-side combined, hub fan-in collapses before the
    shuffle. Only nodes whose distance IMPROVED survive into the next
    frontier, so relaxation work decays like the real algorithm instead
    of re-expanding the whole reached set every round; the frontier is
    localCheckpoint-ed (O(1) lineage) and the per-round isEmpty guard
    early-exits on convergence exactly like k_hop's."""
    node_col = sources.columns[0]
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nxt"), w.alias("w")
    )
    dist = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0.0).alias("dist"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(iterations):
        cand = (
            frontier.join(e, "node")
            .select(
                F.col("nxt").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.select("node", "dist")
            .unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # survivors of this round: nodes whose standing distance improved
        # (strictly — float equality is exact here because both sides are
        # the same sums in the same order only when equal-length paths
        # tie, and a tie is not an improvement)
        frontier = (
            merged.join(
                dist.select("node", F.col("dist").alias("__old")),
                "node",
                "left",
            )
            .filter(
                F.col("__old").isNull() | (F.col("dist") < F.col("__old"))
            )
            .select("node", "dist")
            .localCheckpoint()
        )
        dist = merged.localCheckpoint()
        if frontier.isEmpty():
            break
    return dist


def transitive_closure(
    edges: DataFrame,
    doubling_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded transitive closure by iterative doubling -> distinct
    (src, dst) pairs connected by a directed path of <= 2^rounds hops.

    Path doubling (reach_{t+1} = reach_t UNION reach_t JOIN reach_t)
    covers hop budget 2^t in t rounds, vs t rounds for frontier BFS
    (k_hop) — the right shape when the needed depth is large (ontology
    subsumption chains, supply/lineage DAGs): closure to depth 4096 is
    12 self-joins, not 4096. The cost is that intermediate relations
    carry full reachability pairs, so use k_hop for shallow
    neighborhoods and this for deep/unbounded reachability on sparse
    DAGs. Distinct after every round bounds the relation by the final
    closure size; localCheckpoint truncates the exponential lineage.
    Self-pairs are excluded (irreflexive closure)."""
    reach = (
        edges.select(src, dst).filter(F.col(src) != F.col(dst)).distinct()
    )
    for _ in range(doubling_rounds):
        hop = reach.alias("a").join(
            reach.alias("b"), F.col("a." + dst) == F.col("b." + src)
        ).select(
            F.col("a." + src).alias(src), F.col("b." + dst).alias(dst)
        ).filter(F.col(src) != F.col(dst))
        reach = reach.unionByName(hop).distinct().localCheckpoint()
    return reach


def community_rollup(
    edges: DataFrame,
    labels: Optional[DataFrame] = None,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Graph summarization: collapse communities into supernodes ->
    (c_src, c_dst, n_edges, n_intra) where c_src <= c_dst are community
    labels (label_propagation's, unless a (node, label) mapping is
    given) and n_edges counts the distinct underlying undirected edges
    between/inside them.

    The standard KG compression step before visualization or
    coarse-grained reasoning: a 10^10-edge graph becomes a
    |communities|^2-bounded summary via two hash-joins (edge ⋈ label on
    each endpoint) and one aggregate — no iteration beyond the label
    pass itself. Undirected edges are canonicalized (least, greatest)
    first so each edge is counted once."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        )
        .distinct()
    )
    if labels is None:
        labels = label_propagation(edges, iterations, src=src, dst=dst)
    lab = labels.select("node", "label")
    return (
        und.join(lab.withColumnsRenamed({"node": "u", "label": "lu"}), "u")
        .join(lab.withColumnsRenamed({"node": "v", "label": "lv"}), "v")
        .select(
            F.least("lu", "lv").alias("c_src"),
            F.greatest("lu", "lv").alias("c_dst"),
            (F.col("lu") == F.col("lv")).cast("int").alias("__intra"),
        )
        .groupBy("c_src", "c_dst")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum("__intra").alias("n_intra"),
        )
    )


def k_truss(
    edges: DataFrame,
    k: int,
    iterations: Optional[int] = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-truss edge set -> (a, b, support): the maximal subgraph whose
    every edge sits in >= k-2 triangles (Cohen 2008) — the EDGE-cohesion
    sibling of k_core (node degree), and the standard stronger filter
    for "communities, not hubs" (a star hub survives k-core but has no
    triangles, so the truss drops it).

    Iterative peel on edges: compute per-edge triangle support (wedge
    self-join on the shared witness, closed against the surviving edge
    set), drop edges with support < k-2, repeat; the fixpoint is unique
    so the output is deterministic. `iterations=None` peels to
    convergence (monotone shrinking edge set, scalar count guard);
    an int runs EXACTLY that many support rounds — the fixed-round
    variant an unrolled SQL mirror can replay (same contract as k_core).

    Per round: one wedge join bounded by sum(deg^2) over witnesses + one
    hash agg + one inner join back to the edge relation; the edge set is
    localCheckpoint-ed per round so lineage stays O(1)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    need = k - 2
    n_prev = und.count()
    rounds = 0
    while True:
        adj = und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        thru = adj.select(F.col("a").alias("w"), F.col("b").alias("u"))
        closed = (
            thru.alias("l")
            .join(thru.alias("r"), F.col("l.w") == F.col("r.w"))
            .filter(F.col("l.u") < F.col("r.u"))
            .select(F.col("l.u").alias("a"), F.col("r.u").alias("b"))
            .join(und, ["a", "b"], "inner")
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("support"))
        )
        kept = (
            und.join(closed, ["a", "b"], "left")
            .withColumn(
                "support",
                F.coalesce("support", F.lit(0)).cast("long"),
            )
            .filter(F.col("support") >= need)
            .localCheckpoint()
        )
        rounds += 1
        if iterations is not None and rounds >= iterations:
            return kept
        n_now = kept.count()
        und = kept.select("a", "b").localCheckpoint()
        if n_now == n_prev:
            return kept
        n_prev = n_now


def _bounded_reach_pairs(
    e: DataFrame, roots: DataFrame, k: int
) -> DataFrame:
    """All-pairs bounded BFS -> (root, node, dist) for dist in [0, k]:
    per level one frontier ⋈ edges join + distinct + anti-join against
    the visited pair set, frontiers localCheckpoint-ed so a task retry
    replays one level. `e` must be a (node, nxt) relation already
    checkpointed by the caller (it is referenced once per level).
    Shared by harmonic_centrality and scc_bounded."""
    root_col = roots.columns[0]
    frontier = (
        roots.select(F.col(root_col).alias("root"))
        .distinct()
        .withColumn("node", F.col("root"))
        .localCheckpoint()
    )
    visited = frontier.withColumn("dist", F.lit(0))
    for level in range(1, k + 1):
        nxt = (
            frontier.join(e, "node")
            .select("root", F.col("nxt").alias("node"))
            .distinct()
            .join(
                visited.select("root", "node"),
                ["root", "node"],
                "left_anti",
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("dist", F.lit(level))
        ).localCheckpoint()
        frontier = nxt
    return visited


def harmonic_centrality(
    edges: DataFrame,
    k: int,
    roots: Optional[DataFrame] = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-bounded harmonic centrality -> (node, n_reached, score) with
    score = sum over nodes u reached within k hops of 1/dist(node, u)
    (Boldi & Vigna 2014's harmonic variant of closeness, truncated at
    radius k — the truncation both bounds the work and is the standard
    fixed-round contract this family uses so an unrolled SQL mirror can
    replay it, same as k_core/k_truss).

    `roots=None` computes the exact bounded score for EVERY node: an
    all-pairs bounded BFS whose state is O(sum of k-hop ball sizes) —
    fine on sparse/bounded-degree graphs, quadratic on dense ones. For
    10^10-node graphs pass `roots` = a deterministic node sample and the
    result is the Eppstein-Wang style estimator restricted to sampled
    roots (each root's score is still exact; sampling chooses WHICH
    nodes get scored, it does not approximate any individual score).

    Per level: one frontier ⋈ edges join + distinct + anti-join against
    the visited pair set; pair frontiers are localCheckpoint-ed so a
    task retry replays one level. The (root, node) visited relation is
    the only state — no per-node arrays, so hub fan-in is absorbed by
    the distinct's partial aggregation.

    The edge relation is referenced k+1 times (each level + the root
    derivation), so it is localCheckpoint-ed ONCE up front — without it
    an expensive upstream subtree (e.g. the co-occurrence self-join that
    builds a co-purchase graph) re-executes per level."""
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nxt")
    ).localCheckpoint()
    if roots is None:
        roots = e.select("node").distinct()
    visited = _bounded_reach_pairs(e, roots, k)
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy(F.col("root").alias("node"))
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            # try_divide, not /: the dist=0 branch of the visited union
            # carries a literal 0, and ANSI constant folding evaluates
            # 1.0/0 at PLAN time even though the filter drops the branch.
            F.sum(
                F.try_divide(F.lit(1.0), F.col("dist").cast("double"))
            ).alias("score"),
        )
    )


def walk_counts(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Number of length-EXACTLY-k directed walks between every node pair
    with at least one -> (src, dst, n_walks): the k-th power of the
    adjacency matrix computed as k-1 join+aggregate rounds (walks may
    revisit nodes — this is A^k, the kernel behind Katz similarity,
    graph kernels, and expected random-walk visit counts).

    Each round is ONE shuffle join (acc.dst = edges.src) and ONE hash
    aggregate summing walk counts into the new endpoint pair; partial
    aggregation collapses hub fan-through map-side. The accumulator is
    localCheckpoint-ed per round (lineage O(1)). State is the nonzero
    entries of A^i — bounded on sparse graphs for small k, which is the
    only regime walk counting is meaningful in (on dense graphs A^k
    fills in and the counts are dominated by degree products).

    The edge relation participates in every round, so it is
    localCheckpoint-ed once up front (same multi-consumer-subtree
    reasoning as harmonic_centrality)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = (
        edges.select(src, dst)
        .distinct()
        .select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
        )
        .localCheckpoint()
    )
    acc = e.withColumn("n_walks", F.lit(1).cast("long"))
    for _ in range(k - 1):
        acc = (
            acc.alias("l")
            .join(
                e.alias("r"), F.col("l.dst") == F.col("r.src"), "inner"
            )
            .groupBy(
                F.col("l.src").alias("src"),
                F.col("r.dst").alias("dst"),
            )
            .agg(F.sum("l.n_walks").alias("n_walks"))
            .localCheckpoint()
        )
    return acc


def scc_bounded(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_cc_iter: int = 25,
) -> DataFrame:
    """k-bounded strongly connected components over a DIRECTED graph ->
    (node, scc_id): u and v share a class iff they are connected through
    the mutual-reachability relation R_k = {(u,v) : dist(u→v) <= k AND
    dist(v→u) <= k}. When every true SCC has directed diameter <= k the
    result IS the SCC decomposition (all mutual pairs inside an SCC are
    present and no mutual pair crosses SCCs — mutual reachability at any
    bound implies same SCC); the bound is the deterministic, replayable
    contract this family uses (same as k_core/k_truss) and caps the
    reach-state for 10^10-edge graphs where full Tarjan-style passes
    don't distribute.

    Shape: one bounded all-pairs BFS over the directed edges (state =
    (root, node) pairs within k hops), a self-join of the reach relation
    against its own transpose to keep mutual pairs, then min-label
    connected components over the (undirected by construction) mutual
    graph; nodes in no mutual pair are their own singleton class."""
    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nxt"))
        .filter(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select("node")
        .unionByName(e.select(F.col("nxt").alias("node")))
        .distinct()
    )
    reach = (
        _bounded_reach_pairs(e, nodes, k)
        .filter(F.col("dist") > 0)
        .select("root", "node")
        .localCheckpoint()
    )
    mutual = (
        reach.alias("l")
        .join(
            reach.alias("r"),
            (F.col("l.root") == F.col("r.node"))
            & (F.col("l.node") == F.col("r.root")),
        )
        .filter(F.col("l.root") < F.col("l.node"))
        .select(F.col("l.root").alias("a"), F.col("l.node").alias("b"))
        .distinct()
    )
    from kernel_memory_spark.operators.canonicalize import (
        connected_components,
    )

    comp = connected_components(mutual, max_iter=max_cc_iter)
    return nodes.join(
        comp, nodes["node"] == comp["norm"], "left"
    ).select(
        "node", F.coalesce("component", "node").alias("scc_id")
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
) -> DataFrame:
    """Newman modularity decomposition of a community assignment ->
    (label, n_nodes, m_intra, deg_sum, contribution) with
    contribution = m_c/m - (d_c/2m)^2 (sum over rows = Q) — the standard
    measurement of whether LPA/rollup communities are real structure or
    noise (Q ≈ 0 means no better than a random degree-preserving graph).

    Evaluation, not iteration: two keyed joins (edge endpoints against
    the label relation), two hash aggregates, one 1-row edge-count
    scalar crossed back in. Self-loops are dropped and the edge set is
    canonicalized to distinct unordered pairs first, so double-counted
    inputs can't inflate m."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    lab = labels.select(
        F.col(node).alias("n"), F.col(label).alias("label")
    )
    m = und.agg(F.count(F.lit(1)).cast("double").alias("__m"))
    intra = (
        und.join(lab.withColumnRenamed("n", "a"), "a")
        .withColumnRenamed("label", "__la")
        .join(lab.withColumnRenamed("n", "b"), "b")
        .filter(F.col("__la") == F.col("label"))
        .groupBy(F.col("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("m_intra"))
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    dc = (
        lab.join(deg, "n")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("deg_sum"),
        )
    )
    return (
        dc.join(intra, "label", "left")
        .crossJoin(m)
        .select(
            "label",
            "n_nodes",
            F.coalesce("m_intra", F.lit(0)).cast("long").alias("m_intra"),
            "deg_sum",
            # + 0.0 normalizes IEEE -0.0 (a community whose contribution
            # rounds to negative zero) so the value serializes
            # identically in every engine
            (
                F.round(
                    F.coalesce("m_intra", F.lit(0)) / F.col("__m")
                    - F.pow(
                        F.col("deg_sum") / (F.lit(2.0) * F.col("__m")),
                        F.lit(2.0),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("contribution"),
        )
    )


def graph_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """One-row global graph audit -> (n_nodes, n_edges, density,
    avg_degree, max_degree, assortativity): the summary a KG operator
    reads before choosing partition counts and skew strategy (density
    and max_degree bound the wedge joins; assortativity — Newman 2002's
    degree-correlation r over edge endpoints — tells whether hubs attach
    to hubs, the regime where degree-ordered tricks pay most).

    The edge set is canonicalized to distinct unordered pairs; degrees
    are joined onto both endpoints and every moment Newman's formula
    needs is ONE hash-free global aggregate over the edge relation
    (map-side partial everywhere; only the 1-row result moves)."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    ends = (
        und.join(
            deg.select(F.col("n").alias("a"), F.col("deg").alias("ja")),
            "a",
        )
        .join(
            deg.select(F.col("n").alias("b"), F.col("deg").alias("jb")),
            "b",
        )
    )
    mom = ends.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(F.col("ja") * F.col("jb")).alias("s_jk"),
        F.sum((F.col("ja") + F.col("jb")) / 2.0).alias("s_half"),
        F.sum(
            (F.col("ja") * F.col("ja") + F.col("jb") * F.col("jb")) / 2.0
        ).alias("s_sq"),
    )
    nstats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("deg").cast("long").alias("max_degree"),
    )
    mean = F.col("s_half") / F.col("m")
    num = F.col("s_jk") / F.col("m") - mean * mean
    den = F.col("s_sq") / F.col("m") - mean * mean
    return mom.crossJoin(nstats).select(
        "n_nodes",
        F.col("m").cast("long").alias("n_edges"),
        F.round(
            F.col("m") / (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2.0),
            6,
        ).alias("density"),
        F.round(2.0 * F.col("m") / F.col("n_nodes"), 6).alias(
            "avg_degree"
        ),
        "max_degree",
        # + 0.0 normalizes -0.0 (see modularity); try_divide guards the
        # degenerate regular graph where the variance denominator is 0
        (
            F.round(F.try_divide(num, den), 6) + F.lit(0.0)
        ).alias("assortativity"),
    )


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
) -> DataFrame:
    """Per-community conductance -> (label, n_nodes, cut, volume,
    conductance) with conductance = cut / min(vol, 2m - vol): the
    boundary-quality complement to modularity (a community can score
    well on modularity yet leak — conductance measures the leak
    directly; it is THE objective local clustering methods optimize,
    Shi-Malik / sweep-cut literature).

    Same shape as modularity: canonicalized edge relation, two keyed
    label joins (classifying each edge as intra or cut), one degree
    aggregate, a 1-row 2m scalar crossed back in. -0.0-normalized and
    NULL (try_divide) for a community with zero volume."""
    und = (
        edges.select(src, dst)
        .filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    lab = labels.select(
        F.col(node).alias("n"), F.col(label).alias("label")
    )
    classified = (
        und.join(
            lab.select(F.col("n").alias("a"), F.col("label").alias("la")),
            "a",
        )
        .join(
            lab.select(F.col("n").alias("b"), F.col("label").alias("lb")),
            "b",
        )
    )
    # a cut edge charges BOTH its communities; an intra edge charges its
    # community zero cut but both endpoints' degree (via volume below)
    cut = (
        classified.filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("label"))
        .unionByName(
            classified.filter(F.col("la") != F.col("lb")).select(
                F.col("lb").alias("label")
            )
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )
    adj = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    vol = (
        lab.join(deg, "n")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("deg").cast("long").alias("volume"),
        )
    )
    m2 = und.agg(
        (2.0 * F.count(F.lit(1))).cast("double").alias("__m2")
    )
    return (
        vol.join(cut, "label", "left")
        .crossJoin(m2)
        .select(
            "label",
            "n_nodes",
            F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
            "volume",
            (
                F.round(
                    F.try_divide(
                        F.coalesce("cut", F.lit(0)).cast("double"),
                        F.least(
                            F.col("volume").cast("double"),
                            F.col("__m2") - F.col("volume"),
                        ),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("conductance"),
        )
    )


def temporal_khop(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-respecting bounded reachability over a temporal graph ->
    (node, hops, earliest_arrival): node v is reached within k hops iff
    a path exists whose edge timestamps are NON-DECREASING (information
    can only flow forward in time — the temporal-network semantics of
    Holme & Saramäki 2012 that plain k_hop silently violates: a 2012
    edge cannot propagate something learned via a 2020 edge).
    earliest_arrival is the minimum last-edge timestamp over all such
    paths of length <= k; hops is the fewest hops achieving exactly
    that arrival (lexicographic (arrival, hops) minimum — a total,
    engine-neutral tie-break).

    Exact for fixed k: each level joins the previous level's
    (node, arrival) frontier against edges with ts >= arrival and
    min-aggregates arrivals per node (map-side combine absorbs fan-in),
    so level d holds at most |V| rows regardless of path multiplicity;
    no visited set is needed because the per-level min-aggregation IS
    the dominance prune. Sources are their own hop-0 row with a NULL
    arrival (they were never arrived at)."""
    e = edges.select(
        F.col(src).alias("node"),
        F.col(dst).alias("nxt"),
        F.col(ts_col).alias("__ts"),
    ).localCheckpoint()
    node_col = sources.columns[0]
    frontier = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("arr", F.lit(None).cast(dict(e.dtypes)["__ts"]))
        .localCheckpoint()
    )
    reached = frontier.select(
        "node", F.lit(0).alias("hops"), F.col("arr")
    )
    for level in range(1, k + 1):
        frontier = (
            frontier.join(e, "node")
            .filter(
                F.col("arr").isNull() | (F.col("__ts") >= F.col("arr"))
            )
            .groupBy(F.col("nxt").alias("node"))
            .agg(F.min("__ts").alias("arr"))
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        reached = reached.unionByName(
            frontier.select(
                "node", F.lit(level).alias("hops"), F.col("arr")
            )
        )
    non_source = (
        reached.filter(F.col("hops") > 0)
        .groupBy("node")
        .agg(F.min(F.struct("arr", "hops")).alias("__best"))
        .select(
            "node",
            F.col("__best.hops").alias("hops"),
            F.col("__best.arr").alias("earliest_arrival"),
        )
    )
    srcs = reached.filter(F.col("hops") == 0).select(
        "node", "hops", F.col("arr").alias("earliest_arrival")
    )
    # sources stay hop-0 rows even if also reachable via a cycle
    return srcs.unionByName(
        non_source.join(srcs.select("node"), "node", "left_anti")
    )


def hyper_anf(
    edges: DataFrame,
    hops: int = 2,
    p: int = 5,
) -> DataFrame:
    """Approximate neighborhood function via per-node HyperLogLog
    register propagation (Boldi, Rosa & Vigna 2011, "HyperANF") ->
    (h, node, est_ball) for h = 0..hops: the estimated number of nodes
    within h hops of each node — the primitive behind effective-diameter
    and centrality estimates on graphs where exact per-node BFS closure
    (|V| x |V| pairs) is unpayable.

    Why it scales: node v's state is <= 2^p HLL registers (32 for p=5),
    and one hop is ONE equi-join (edge x register) + ONE max-aggregate —
    registers merge by MAX, so map-side combine collapses fan-in before
    the shuffle, and per-hop state is bounded by |V| * 2^p rows no
    matter how dense the balls get. Contrast k_hop, which is exact but
    carries one row per (source, reached) pair — quadratic on small-
    diameter graphs.

    Determinism: registers use the repo's md5-hex-window idiom
    (sketch.hll_build) — bucket and rank from two 32-bit md5 windows —
    and the estimator (alpha_m m^2 / sum 2^-M_j with linear-counting
    small-range correction) is closed-form, so ball estimates replay
    bit-for-bit in any engine with md5 + log2. `edges` must be the
    symmetrized directed adjacency (see `symmetrize`)."""
    m = 2 ** p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    k = F.col("node").cast("string")
    hx = F.md5(F.concat(F.lit("hll|"), k))
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    rank = F.when(h2 == 0, F.lit(33)).otherwise(
        F.lit(32) - F.floor(F.log2(h2))
    )
    regs = nodes.select(
        "node",
        F.pmod(h1, F.lit(m)).alias("bucket"),
        rank.cast("long").alias("max_rank"),
    ).localCheckpoint()

    def _estimate(r: DataFrame, h: int) -> DataFrame:
        per = r.groupBy("node").agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("__s"),
        )
        raw = F.lit(alpha * m * m) / (
            F.col("__s") + (F.lit(m) - F.col("__n"))
        )
        v = F.lit(m) - F.col("__n")
        linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
        est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(
            raw
        )
        return per.select(
            F.lit(h).alias("h"), "node", est.alias("est_ball")
        )

    out = _estimate(regs, 0)
    for h in range(1, hops + 1):
        prop = edges.join(
            regs, edges["dst"] == regs["node"], "inner"
        ).select(
            edges["src"].alias("node"), "bucket", "max_rank"
        )
        regs = (
            regs.unionByName(prop)
            .groupBy("node", "bucket")
            .agg(F.max("max_rank").alias("max_rank"))
            .localCheckpoint()
        )
        out = out.unionByName(_estimate(regs, h))
    return out


def bounded_distances(
    edges: DataFrame,
    roots: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source bounded BFS -> (root, node, dist), dist in [0, k]:
    the public face of `_bounded_reach_pairs` (one frontier join +
    anti-join per level, state = reached (root, node) pairs only)."""
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nxt")
    ).localCheckpoint()
    return _bounded_reach_pairs(e, roots, k)


def landmark_distances(
    edges: DataFrame,
    pairs: DataFrame,
    n_landmarks: int = 8,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Landmark-based shortest-distance estimation (Potamias, Bonchi,
    Castillo & Gionis 2009; the simplest deterministic member of Cohen's
    distance-sketch family) -> (u, v, est_dist) for the query pairs:
    est_dist = min over landmarks l of d(u,l) + d(l,v), an UPPER bound
    on d(u,v), exact whenever some shortest path passes a landmark;
    NULL when u and v share no landmark within max_hops.

    Why this is the 10^10-node shape: exact all-pairs distance is
    |V|^2 state, but the sketch is ONE multi-source bounded BFS whose
    state is L x |V| (root, node, dist) rows, built once and then
    served to ANY number of queries by two keyed joins + a min — the
    same build-once/probe-many economics as the ANN and FTS indexes.
    Landmarks are the L nodes of smallest md5 rank: deterministic,
    engine-replayable, degree-agnostic (no collect of a degree table).
    `pairs` must have columns (u, v); `edges` symmetrized."""
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nxt")
    ).localCheckpoint()
    nodes = e.select("node").distinct()
    lm = (
        nodes.withColumn(
            "__rk",
            F.md5(F.concat(F.lit("lm|"), F.col("node").cast("string"))),
        )
        .orderBy("__rk")
        .limit(n_landmarks)
        .select("node")
    )
    reach = _bounded_reach_pairs(e, lm, max_hops)
    du = reach.select(
        F.col("root").alias("__l"),
        F.col("node").alias("u"),
        F.col("dist").alias("__du"),
    )
    dv = reach.select(
        F.col("root").alias("__l"),
        F.col("node").alias("v"),
        F.col("dist").alias("__dv"),
    )
    est = (
        pairs.join(du, "u")
        .join(dv, ["__l", "v"])
        .groupBy("u", "v")
        .agg(F.min(F.col("__du") + F.col("__dv")).alias("est_dist"))
    )
    return pairs.join(est, ["u", "v"], "left")


def neighborhood_function(
    edges: DataFrame, hops: int = 2, p: int = 5
) -> DataFrame:
    """HyperANF neighborhood function N(h) -> (h, est_pairs): estimated
    number of (u, v) pairs with d(u, v) <= h, the sum of per-node ball
    estimates. One row per hop."""
    return (
        hyper_anf(edges, hops=hops, p=p)
        .groupBy("h")
        .agg(F.sum("est_ball").alias("est_pairs"))
    )


def effective_diameter(
    edges: DataFrame,
    hops: int = 2,
    p: int = 5,
    q: float = 0.9,
) -> DataFrame:
    """Effective diameter estimate (Boldi, Rosa & Vigna 2011 §2; Palmer
    et al. 2002's ANF definition) -> ONE row (eff_diameter, n_pairs_max):
    the interpolated hop count h* at which the neighborhood function
    first covers a fraction q of N(hops) —
    h* = (h-1) + (q*N(hops) - N(h-1)) / (N(h) - N(h-1)) for the first
    h with N(h) >= q*N(hops) (h* = 0 when N(0) already covers q).

    Everything after the register propagation is a hops-row relation:
    the interpolation is a window over <= hops+1 rows — driver-free,
    closed-form, engine-replayable. On a 10^10-node graph the entire
    computation is `hops` join+max rounds over |V| x 2^p register rows;
    the exact alternative (all-pairs BFS) is |V|^2 and unpayable."""
    nf = neighborhood_function(edges, hops=hops, p=p)
    total = nf.agg(F.max("est_pairs").alias("__max"))
    lagw = Window.orderBy("h")
    steps = (
        nf.crossJoin(F.broadcast(total))
        .select(
            "h",
            "est_pairs",
            (F.col("est_pairs") >= F.lit(q) * F.col("__max")).alias(
                "__covered"
            ),
            F.lag("est_pairs").over(lagw).alias("__prev"),
            F.col("__max"),
        )
        .filter(F.col("__covered"))
        .orderBy("h")
        .limit(1)
    )
    return steps.select(
        F.when(F.col("__prev").isNull(), F.col("h").cast("double"))
        .otherwise(
            F.col("h") - 1
            + (F.lit(q) * F.col("__max") - F.col("__prev"))
            / (F.col("est_pairs") - F.col("__prev"))
        )
        .alias("eff_diameter"),
        F.col("__max").alias("n_pairs_max"),
    )


def katz_index(
    edges: DataFrame,
    max_len: int = 3,
    beta: float = 0.05,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Truncated Katz similarity (Katz 1953; Liben-Nowell & Kleinberg
    2003's strongest unsupervised link predictor) -> (src, dst,
    katz): sum over path lengths L = 1..max_len of beta^L * (number of
    length-L walks u -> v). beta < 1/lambda_max truncated at max_len —
    the standard scalable variant (the closed form (I - beta*A)^-1 - I
    is a dense inverse no one materializes at 10^10 nodes).

    Threads the running power A^L = A^(L-1) ⋈ A (the same join+agg
    round walk_counts uses, checkpointed per round so the accumulator
    union reads materialized results instead of re-deriving each power
    from scratch — max_len-1 joins total rather than
    max_len(max_len-1)/2); the accumulator union + final aggregate keep
    only observed pairs, so state is the nonzero support of
    A^1..A^max_len — bounded on sparse graphs, the only regime the
    truncated index is meaningful in."""
    e = (
        edges.select(src, dst)
        .distinct()
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .localCheckpoint()
    )
    power = e.withColumn("n_walks", F.lit(1).cast("long"))
    acc = None
    for length in range(1, max_len + 1):
        if length > 1:
            power = (
                power.alias("l")
                .join(e.alias("r"), F.col("l.dst") == F.col("r.src"),
                      "inner")
                .groupBy(
                    F.col("l.src").alias("src"),
                    F.col("r.dst").alias("dst"),
                )
                .agg(F.sum("l.n_walks").alias("n_walks"))
                .localCheckpoint()
            )
        # beta^L computed driver-side and inlined as one double literal:
        # pow() last-ulp behavior is libm-specific, a decimal literal
        # parses to the identical double in every engine
        term = power.select(
            "src",
            "dst",
            (F.lit(float(beta) ** length) * F.col("n_walks")).alias(
                "__t"
            ),
        )
        acc = term if acc is None else acc.unionByName(term)
    return acc.groupBy("src", "dst").agg(
        F.sum("__t").alias("katz")
    )


def powerlaw_tail_fit(
    degrees: DataFrame,
    deg_col: str = "degree",
    k_tail: int = 100,
) -> DataFrame:
    """Hill estimator of the power-law tail exponent (Hill 1975; the
    standard degree-distribution diagnostic, Clauset-Shalizi-Newman
    2009 §3.1 for the discrete caveats) -> ONE row (k_tail, d_min,
    alpha): alpha = 1 + k / sum over the k largest degrees of
    ln(d_i / d_min), with d_min = the (k+1)-th largest degree.

    Why you fit this at all: hub-driven skew is what breaks naive
    joins/aggregations at 10^12 edges — alpha < 2 means unbounded mean
    degree (salting mandatory), 2 < alpha < 3 unbounded variance (AQE
    skew handling recommended). Cost: ONE top-(k+1) TakeOrdered over
    the degree relation (per-partition heaps, no global sort) + one
    k-row aggregate on the driver-side-free plan.

    Degenerate-input caveats (r5 advice, documented as the pinned
    contract): when the k_tail largest degrees all equal d_min the
    log-sum is 0 and alpha is NULL in Spark vs inf in DuckDB (0/0 vs
    x/0 conventions); fewer than k_tail+1 degree rows yields an empty
    frame rather than an error. The sf fixtures are non-degenerate, so
    the cross-engine hash is pinned on real inputs only."""
    top = (
        degrees.select(F.col(deg_col).cast("double").alias("d"))
        .orderBy(F.desc("d"))
        .limit(k_tail + 1)
    )
    w = Window.orderBy(F.desc("d"))
    ranked = top.select(
        "d", F.row_number().over(w).alias("__rn")
    )
    dmin = ranked.filter(F.col("__rn") == k_tail + 1).select(
        F.col("d").alias("__dmin")
    )
    tail = ranked.filter(F.col("__rn") <= k_tail)
    return (
        tail.crossJoin(F.broadcast(dmin))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_tail"),
            F.min("__dmin").alias("d_min"),
            (
                F.lit(1.0)
                + F.count(F.lit(1))
                / F.sum(F.log(F.col("d") / F.col("__dmin")))
            ).alias("alpha"),
        )
    )
