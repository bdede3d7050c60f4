"""Graph analytics (operators/graph.py): exact results on hand-built
graphs, invariance under layout, convergence guards."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import graph as GR


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ref_pagerank(edges, iterations, d=0.85):
    """Driver-side reference: same fixed-iteration, no-dangling-
    redistribution semantics as the distributed operator."""
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        s = {v: 0.0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] * (1.0 / out[u])
        r = {v: (1.0 - d) / n + d * s[v] for v in nodes}
    return r


class TestPageRank:
    def test_cycle_is_stationary(self, spark):
        """On a directed cycle the uniform vector is exactly stationary."""
        e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
        got = {r.node: r.rank for r in GR.pagerank(e, iterations=5).collect()}
        for v in (1, 2, 3):
            assert got[v] == pytest.approx(1.0 / 3, abs=1e-12)

    def test_matches_reference_with_dangling(self, spark):
        """Chain with a dangling sink: mass decays through the teleport
        term exactly as in the driver-side reference implementation."""
        pairs = [(1, 2), (2, 3), (1, 3), (4, 1)]
        e = _edges(spark, pairs)
        got = {r.node: r.rank for r in GR.pagerank(e, iterations=4).collect()}
        ref = _ref_pagerank(pairs, iterations=4)
        assert set(got) == set(ref)
        for v, rv in ref.items():
            assert got[v] == pytest.approx(rv, abs=1e-12)

    def test_layout_independent(self, spark):
        pairs = [(i, (i * 3 + 1) % 17) for i in range(17)] + [
            (i, (i + 5) % 17) for i in range(17)
        ]
        e = _edges(spark, [p for p in pairs if p[0] != p[1]])
        a = {r.node: r.rank for r in GR.pagerank(e, iterations=6).collect()}
        b = {
            r.node: r.rank
            for r in GR.pagerank(e.repartition(7), iterations=6).collect()
        }
        for v in a:
            assert a[v] == pytest.approx(b[v], abs=1e-12)

    def test_weighted_prefers_heavy_edge(self, spark):
        e = spark.createDataFrame(
            [(1, 2, 9.0), (1, 3, 1.0)], "src long, dst long, w double"
        )
        got = {
            r.node: r.rank
            for r in GR.pagerank(e, iterations=1, weight="w").collect()
        }
        # node 2 receives 0.9 of node 1's mass, node 3 receives 0.1
        assert got[2] > got[3]
        assert got[2] - got[3] == pytest.approx(
            0.85 * (1.0 / 3) * 0.8, abs=1e-12
        )


class TestTriangles:
    def test_single_triangle_plus_tail(self, spark):
        e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
        got = {
            r.node: r.n_triangles
            for r in GR.triangles_per_node(e).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}  # node 4 in no triangle -> absent

    def test_k4_complete(self, spark):
        pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
        got = {
            r.node: r.n_triangles
            for r in GR.triangles_per_node(_edges(spark, pairs)).collect()
        }
        # K4 has C(3,2)=3 triangles per node
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_direction_and_duplicates_ignored(self, spark):
        e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)])
        got = {
            r.node: r.n_triangles
            for r in GR.triangles_per_node(e).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}


class TestKHop:
    def test_path_graph_min_distance(self, spark):
        path = [(i, i + 1) for i in range(1, 5)]
        adj = GR.symmetrize(_edges(spark, path))
        src = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.dist for r in GR.k_hop(adj, src, k=2).collect()}
        assert got == {1: 0, 2: 1, 3: 2}

    def test_early_exit_on_exhausted_component(self, spark):
        adj = GR.symmetrize(_edges(spark, [(1, 2), (2, 3), (7, 8)]))
        src = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.dist for r in GR.k_hop(adj, src, k=10).collect()}
        assert got == {1: 0, 2: 1, 3: 2}  # other component never reached

    def test_multi_source_takes_min(self, spark):
        adj = GR.symmetrize(_edges(spark, [(1, 2), (2, 3), (3, 4)]))
        src = spark.createDataFrame([(1,), (4,)], "node long")
        got = {r.node: r.dist for r in GR.k_hop(adj, src, k=3).collect()}
        assert got == {1: 0, 4: 0, 2: 1, 3: 1}

    def test_isolated_source_kept_at_zero(self, spark):
        adj = GR.symmetrize(_edges(spark, [(1, 2)]))
        src = spark.createDataFrame([(99,)], "node long")
        got = {r.node: r.dist for r in GR.k_hop(adj, src, k=2).collect()}
        assert got == {99: 0}


def _ref_ppr(edges, seeds, iterations, d=0.85):
    """Driver-side personalized-PageRank reference (teleport to seeds;
    |seeds| counts seeds absent from the graph too)."""
    nodes = sorted({u for e in edges for u in e})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    tele = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    r = dict(tele)
    for _ in range(iterations):
        s = {v: 0.0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] * (1.0 / out[u])
        r = {v: (1.0 - d) * tele[v] + d * s[v] for v in nodes}
    return r


class TestPersonalizedPageRank:
    def test_matches_reference(self, spark):
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 3), (2, 4)]
        seeds = {1}
        got = {
            r.node: r.rank
            for r in GR.personalized_pagerank(
                _edges(spark, pairs),
                spark.createDataFrame([(s,) for s in seeds], "node long"),
                iterations=6,
            ).collect()
        }
        exp = _ref_ppr(pairs, seeds, 6)
        assert set(got) == set(exp)
        for v in exp:
            assert got[v] == pytest.approx(exp[v], abs=1e-12), v

    def test_mass_concentrates_near_seed(self, spark):
        # path 1-2-3-4-5 (undirected), seed at node 1: rank must be
        # monotonically decreasing with distance from the seed
        pairs = [(i, i + 1) for i in range(1, 5)]
        adj = GR.symmetrize(_edges(spark, pairs))
        got = {
            r.node: r.rank
            for r in GR.personalized_pagerank(
                adj,
                spark.createDataFrame([(1,)], "node long"),
                iterations=10,
            ).collect()
        }
        assert got[1] > got[2] > got[3] > got[4] > got[5]

    def test_absent_seed_dilutes_teleport(self, spark):
        # seed 99 not in graph: teleport mass halves, total rank < 1
        pairs = [(1, 2), (2, 1)]
        got = {
            r.node: r.rank
            for r in GR.personalized_pagerank(
                _edges(spark, pairs),
                spark.createDataFrame([(1,), (99,)], "node long"),
                iterations=4,
            ).collect()
        }
        exp = _ref_ppr(pairs, {1, 99}, 4)
        for v in exp:
            assert got[v] == pytest.approx(exp[v], abs=1e-12)
        assert sum(got.values()) < 1.0


class TestHtmlLinks:
    def test_extracts_href_and_anchor(self, spark):
        from kernel_memory_spark.functions.html import html_links_expr

        df = spark.createDataFrame(
            [
                (1, '<a href="/x">X</a> text <A HREF="/y" class="z">Y</A>'),
                (2, "no links here"),
                (3, '<a class="q" href="/only">mixed <b>tail'),
            ],
            "id long, html string",
        )
        out = (
            df.select("id", F.explode(html_links_expr("html")).alias("l"))
            .select("id", "l.href", "l.anchor")
            .collect()
        )
        got = {(r.id, r.href, r.anchor) for r in out}
        assert got == {
            (1, "/x", "X"),
            (1, "/y", "Y"),
            (3, "/only", "mixed "),  # inner tag ends the anchor capture
        }


def _ref_adamic_adar(pairs, max_degree=None, min_common=1):
    """Driver-side reference: exact AA over the undirected simple graph."""
    import math
    from collections import defaultdict

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    out = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in und:
                continue
            common = [
                w
                for w in nbrs[u] & nbrs[v]
                if max_degree is None or len(nbrs[w]) <= max_degree
            ]
            if len(common) >= min_common and common:
                out[(u, v)] = (
                    len(common),
                    sum(1.0 / math.log(len(nbrs[w])) for w in common),
                )
    return out


def _ref_neighbor_jaccard(pairs, max_degree=None, min_common=1):
    """Driver-side reference: capped-numerator / full-degree-denominator
    Jaccard, mirroring graph.neighbor_jaccard's documented semantics."""
    from collections import defaultdict

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    out = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in und:
                continue
            common = [
                w
                for w in nbrs[u] & nbrs[v]
                if max_degree is None or len(nbrs[w]) <= max_degree
            ]
            if len(common) >= min_common and common:
                out[(u, v)] = (
                    len(common),
                    len(common)
                    / (len(nbrs[u]) + len(nbrs[v]) - len(common)),
                )
    return out


class TestNeighborJaccard:
    def test_square(self, spark):
        """Square 1-2-3-4-1: non-edges (1,3),(2,4) share both neighbors
        -> jaccard 2 / (2 + 2 - 2) = 1.0."""
        e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        got = {
            (r.u, r.v): (r.n_common, r.jaccard)
            for r in GR.neighbor_jaccard(e).collect()
        }
        assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}

    def test_matches_reference(self, spark):
        pairs = [(i, (i * 5 + 2) % 23) for i in range(23)] + [
            (i, (i + 7) % 23) for i in range(23)
        ] + [(0, i) for i in range(1, 9)]
        pairs = [p for p in pairs if p[0] != p[1]]
        e = _edges(spark, pairs)
        got = {
            (r.u, r.v): (r.n_common, r.jaccard)
            for r in GR.neighbor_jaccard(e).collect()
        }
        ref = _ref_neighbor_jaccard(pairs)
        assert set(got) == set(ref)
        for k, (nc, sc) in ref.items():
            assert got[k][0] == nc, k
            assert got[k][1] == pytest.approx(sc, abs=1e-12), k

    def test_capped_numerator_full_denominator(self, spark):
        """Star 0-{1..5} + edge 1-2, cap 4: hub 0 (deg 5) stops
        witnessing, so (3,4) vanishes; (3,5)'s neighbor sets still size 1
        each. Capped jaccard never exceeds the exact value."""
        pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
        e = _edges(spark, pairs)
        got = {
            (r.u, r.v): (r.n_common, r.jaccard)
            for r in GR.neighbor_jaccard(e, max_degree=4).collect()
        }
        ref = _ref_neighbor_jaccard(pairs, max_degree=4)
        assert set(got) == set(ref)
        assert (3, 4) not in got
        exact = _ref_neighbor_jaccard(pairs)
        for k in got:
            assert got[k][1] <= exact[k][1] + 1e-12


class TestAdamicAdar:
    def test_square_plus_diagonal(self, spark):
        """Square 1-2-3-4-1: the two non-edges (1,3) and (2,4) each have
        two degree-2 common neighbors -> score 2/ln(2)."""
        import math

        e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        got = {
            (r.u, r.v): (r.n_common, r.score)
            for r in GR.adamic_adar(e).collect()
        }
        assert set(got) == {(1, 3), (2, 4)}
        for k in got:
            assert got[k][0] == 2
            assert got[k][1] == pytest.approx(2.0 / math.log(2), abs=1e-12)

    def test_matches_reference(self, spark):
        pairs = [(i, (i * 5 + 2) % 23) for i in range(23)] + [
            (i, (i + 7) % 23) for i in range(23)
        ] + [(0, i) for i in range(1, 9)]
        pairs = [p for p in pairs if p[0] != p[1]]
        e = _edges(spark, pairs)
        got = {
            (r.u, r.v): (r.n_common, r.score)
            for r in GR.adamic_adar(e).collect()
        }
        ref = _ref_adamic_adar(pairs)
        assert set(got) == set(ref)
        for k, (nc, sc) in ref.items():
            assert got[k][0] == nc, k
            assert got[k][1] == pytest.approx(sc, abs=1e-10), k

    def test_max_degree_drops_hub_witnesses(self, spark):
        """A hub common neighbor above the cap stops witnessing pairs:
        star 0-{1..5} plus edge 1-2. With cap 4 the hub (deg 5) is
        excluded, so e.g. (3,4) loses its only witness."""
        pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
        e = _edges(spark, pairs)
        got = {
            (r.u, r.v): (r.n_common, r.score)
            for r in GR.adamic_adar(e, max_degree=4).collect()
        }
        ref = _ref_adamic_adar(pairs, max_degree=4)
        assert set(got) == set(ref)
        assert (3, 4) not in got

    def test_existing_edges_excluded_and_layout_invariant(self, spark):
        pairs = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)]
        e = _edges(spark, pairs)
        got = GR.adamic_adar(e)
        und = {tuple(sorted(p)) for p in pairs}
        for r in got.collect():
            assert (r.u, r.v) not in und
        a = {(r.u, r.v): r.n_common for r in got.collect()}
        b = {
            (r.u, r.v): r.n_common
            for r in GR.adamic_adar(e.repartition(5)).collect()
        }
        assert a == b


def _ref_lpa(pairs, iterations):
    from collections import defaultdict

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        new = {}
        for v in nbrs:
            counts = defaultdict(int)
            for w in nbrs[v]:
                counts[labels[w]] += 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        labels = new
    return labels


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        """Two 4-cliques joined by one bridge edge: each clique converges
        to its own minimum label."""
        c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
        c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
        pairs = c1 + c2 + [(3, 10)]
        e = _edges(spark, pairs)
        got = {r.node: r.label for r in GR.label_propagation(e, 4).collect()}
        assert got == _ref_lpa(pairs, 4)
        assert {got[v] for v in range(4)} == {0}
        assert {got[v] for v in range(10, 14)} == {10}

    def test_matches_reference_and_layout_invariant(self, spark):
        pairs = [(i, (i * 3 + 1) % 19) for i in range(19)] + [
            (i, (i + 4) % 19) for i in range(19)
        ]
        pairs = [p for p in pairs if p[0] != p[1]]
        e = _edges(spark, pairs)
        for it in (1, 3):
            got = {
                r.node: r.label
                for r in GR.label_propagation(e, it).collect()
            }
            assert got == _ref_lpa(pairs, it), it
        a = GR.label_propagation(e, 3).collect()
        b = GR.label_propagation(e.repartition(7), 3).collect()
        assert {(r.node, r.label) for r in a} == {
            (r.node, r.label) for r in b
        }


def _ref_k_core(pairs, k, iterations=None):
    from collections import defaultdict

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    alive = set(nbrs)
    rounds = 0
    while True:
        keep = {v for v in alive if len(nbrs[v] & alive) >= k}
        rounds += 1
        if iterations is not None and rounds >= iterations:
            return keep
        if keep == alive:
            return keep
        alive = keep


class TestKCore:
    def test_cliques_survive_chain_peels(self, spark):
        """Two 4-cliques joined by a path: the 3-core is exactly the
        clique nodes — the path (and its clique attachment points'
        path-edges) peels away over several cascading rounds."""
        c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
        c2 = [(a, b) for a in range(20, 24) for b in range(20, 24) if a < b]
        path = [(3, 10), (10, 11), (11, 12), (12, 20)]
        pairs = c1 + c2 + path
        got = {r.node for r in GR.k_core(_edges(spark, pairs), 3).collect()}
        assert got == set(range(4)) | set(range(20, 24))
        assert got == _ref_k_core(pairs, 3)

    def test_cascading_peel_path_graph(self, spark):
        """A path fully dissolves under k=2, but only by cascading from
        the endpoints inward — exercises multi-round convergence."""
        pairs = [(i, i + 1) for i in range(9)]
        assert GR.k_core(_edges(spark, pairs), 2).count() == 0
        # a cycle is its own 2-core
        cyc = pairs + [(9, 0)]
        got = {r.node for r in GR.k_core(_edges(spark, cyc), 2).collect()}
        assert got == set(range(10))

    def test_fixed_rounds_match_reference(self, spark):
        pairs = [(i, (i * 3 + 1) % 21) for i in range(21)] + [
            (i, (i + 6) % 21) for i in range(21)
        ] + [(0, i) for i in range(1, 7)]
        pairs = [p for p in pairs if p[0] != p[1]]
        e = _edges(spark, pairs)
        for rounds in (1, 2, 3):
            got = {
                r.node for r in GR.k_core(e, 3, iterations=rounds).collect()
            }
            assert got == _ref_k_core(pairs, 3, iterations=rounds), rounds
        full = {r.node for r in GR.k_core(e, 3).collect()}
        assert full == _ref_k_core(pairs, 3)


def _ref_sssp(pairs, sources, iterations, weights=None):
    """Driver-side bounded Bellman-Ford (directed edges as given)."""
    dist = {s: 0.0 for s in sources}
    ws = weights or [1.0] * len(pairs)
    for _ in range(iterations):
        new = dict(dist)
        for (u, v), w in zip(pairs, ws):
            if u in dist and (v not in new or dist[u] + w < new[v]):
                new[v] = min(new.get(v, float("inf")), dist[u] + w)
        dist = new
    return dist


class TestShortestPaths:
    def test_weighted_beats_hop_count(self, spark):
        """Long cheap path vs short expensive edge: weighted dist must
        take the cheap detour while k_hop would take the direct edge."""
        rows = [
            (1, 2, 10.0),
            (1, 3, 1.0), (3, 4, 1.0), (4, 2, 1.0),
        ]
        e = spark.createDataFrame(rows, "src long, dst long, w double")
        srcs = spark.createDataFrame([(1,)], "node long")
        got = {
            r.node: r.dist
            for r in GR.shortest_paths(e, srcs, 5, weight="w").collect()
        }
        assert got[2] == pytest.approx(3.0)
        assert got == {1: 0.0, 3: 1.0, 4: 2.0, 2: 3.0}

    def test_hop_limit_semantics(self, spark):
        """iterations bounds the number of edges a path may use."""
        rows = [(1, 2, 5.0), (2, 3, 5.0), (1, 3, 100.0)]
        e = spark.createDataFrame(rows, "src long, dst long, w double")
        srcs = spark.createDataFrame([(1,)], "node long")
        one = {
            r.node: r.dist
            for r in GR.shortest_paths(e, srcs, 1, weight="w").collect()
        }
        assert one[3] == pytest.approx(100.0)  # 2-edge path not yet usable
        two = {
            r.node: r.dist
            for r in GR.shortest_paths(e, srcs, 2, weight="w").collect()
        }
        assert two[3] == pytest.approx(10.0)

    def test_matches_reference_unweighted_and_weighted(self, spark):
        pairs = [(i, (i * 3 + 1) % 17) for i in range(17)] + [
            (i, (i + 5) % 17) for i in range(17)
        ]
        pairs = [p for p in pairs if p[0] != p[1]]
        weights = [1.0 + ((a * 7 + b) % 5) for a, b in pairs]
        e = spark.createDataFrame(
            [(a, b, w) for (a, b), w in zip(pairs, weights)],
            "src long, dst long, w double",
        )
        srcs = spark.createDataFrame([(0,), (9,)], "node long")
        for it in (1, 3, 6):
            got = {
                r.node: r.dist
                for r in GR.shortest_paths(
                    e, srcs, it, weight="w"
                ).collect()
            }
            ref = _ref_sssp(pairs, [0, 9], it, weights)
            assert got.keys() == ref.keys(), it
            for n in ref:
                assert got[n] == pytest.approx(ref[n], abs=1e-12), (it, n)
        # unweighted: every edge costs 1.0
        got_u = {
            r.node: r.dist
            for r in GR.shortest_paths(e, srcs, 4).collect()
        }
        ref_u = _ref_sssp(pairs, [0, 9], 4)
        assert got_u.keys() == ref_u.keys()
        for n in ref_u:
            assert got_u[n] == pytest.approx(ref_u[n], abs=1e-12)

    def test_early_exit_on_convergence(self, spark):
        rows = [(1, 2, 1.0), (2, 3, 1.0)]
        e = spark.createDataFrame(rows, "src long, dst long, w double")
        srcs = spark.createDataFrame([(1,)], "node long")
        # far more iterations than the diameter: converges, exits, and
        # the answer is stable
        got = {
            r.node: r.dist
            for r in GR.shortest_paths(e, srcs, 50, weight="w").collect()
        }
        assert got == {1: 0.0, 2: 1.0, 3: 2.0}


def _ref_hits(edges, iterations):
    """Driver-side reference HITS with the same half-step L2
    normalization order as the operator (auth from h_{t-1}, hub from the
    NORMALIZED a_t; h_0 = 1)."""
    import math

    nodes = sorted({u for e in edges for u in e})
    h = {v: 1.0 for v in nodes}
    a = {}
    for _ in range(iterations):
        a = {v: 0.0 for v in nodes}
        for u, v in edges:
            a[v] += h[u]
        n2 = math.sqrt(sum(x * x for x in a.values()))
        a = {v: x / n2 for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for u, v in edges:
            h[u] += a[v]
        n2 = math.sqrt(sum(x * x for x in h.values()))
        h = {v: x / n2 for v, x in h.items()}
    return h, a


class TestHits:
    def test_star_hub_and_authority(self, spark):
        """One center pointing at 3 leaves: the center is the only hub,
        leaves are the only (equal) authorities."""
        e = _edges(spark, [(0, 1), (0, 2), (0, 3)])
        got = {r.node: (r.hub, r.authority)
               for r in GR.hits(e, iterations=3).collect()}
        assert got[0][0] == pytest.approx(1.0, abs=1e-12)
        assert got[0][1] == pytest.approx(0.0, abs=1e-12)
        for leaf in (1, 2, 3):
            assert got[leaf][0] == pytest.approx(0.0, abs=1e-12)
            assert got[leaf][1] == pytest.approx(
                1.0 / (3 ** 0.5), abs=1e-12
            )

    def test_matches_reference(self, spark):
        pairs = [(1, 2), (2, 3), (1, 3), (4, 1), (4, 3), (2, 4)]
        got = {r.node: (r.hub, r.authority)
               for r in GR.hits(_edges(spark, pairs),
                                iterations=4).collect()}
        h, a = _ref_hits(pairs, 4)
        assert set(got) == set(h)
        for v in h:
            assert got[v][0] == pytest.approx(h[v], abs=1e-12), v
            assert got[v][1] == pytest.approx(a[v], abs=1e-12), v

    def test_layout_invariant_and_dupes_ignored(self, spark):
        pairs = [(i, (i * 5 + 2) % 13) for i in range(13)] + [
            (i, (i + 3) % 13) for i in range(13)
        ]
        pairs = [p for p in pairs if p[0] != p[1]]
        e = _edges(spark, pairs + pairs[:5])  # duplicate edges collapse
        a = {r.node: (r.hub, r.authority)
             for r in GR.hits(e, iterations=5).collect()}
        b = {r.node: (r.hub, r.authority)
             for r in GR.hits(
                 _edges(spark, pairs).repartition(7), iterations=5
             ).collect()}
        for v in a:
            assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
            assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)


class TestClusteringCoefficient:
    def test_triangle_with_tail(self, spark):
        """Triangle 1-2-3 plus tail 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3
        (one closed of three possible pairs), lcc(4)=0 (deg 1)."""
        e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = {r.node: (r.deg, r.n_triangles, r.lcc)
               for r in GR.clustering_coefficient(e).collect()}
        assert got[1] == (2, 1, pytest.approx(1.0))
        assert got[2] == (2, 1, pytest.approx(1.0))
        assert got[3] == (3, 1, pytest.approx(1.0 / 3))
        assert got[4] == (1, 0, pytest.approx(0.0))

    def test_k4_all_one(self, spark):
        e = _edges(
            spark,
            [(a, b) for a in range(4) for b in range(4) if a < b],
        )
        got = {r.node: r.lcc
               for r in GR.clustering_coefficient(e).collect()}
        assert got == {
            v: pytest.approx(1.0) for v in range(4)
        }

    def test_direction_and_duplicates_ignored(self, spark):
        e = _edges(
            spark,
            [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 2)],
        )
        got = {r.node: (r.deg, r.n_triangles, r.lcc)
               for r in GR.clustering_coefficient(e).collect()}
        assert got == {
            1: (2, 1, pytest.approx(1.0)),
            2: (2, 1, pytest.approx(1.0)),
            3: (2, 1, pytest.approx(1.0)),
        }


class TestWarmStartPageRank:
    def test_warm_equals_cold(self, spark):
        """3 warm iterations from a 3-iteration snapshot == 6 cold
        iterations (the sync update is a pure function of the previous
        vector), so incremental refresh loses nothing."""
        pairs = [(1, 2), (2, 3), (1, 3), (4, 1), (3, 4)]
        e = _edges(spark, pairs)
        snap = GR.pagerank(e, iterations=3)
        warm = {
            r.node: r.rank
            for r in GR.pagerank(e, iterations=3, init=snap).collect()
        }
        cold = {
            r.node: r.rank for r in GR.pagerank(e, iterations=6).collect()
        }
        assert set(warm) == set(cold)
        for v in cold:
            assert warm[v] == pytest.approx(cold[v], abs=1e-12)

    def test_new_nodes_default_to_uniform(self, spark):
        """Nodes absent from the init snapshot start at 1/N: warm-starting
        the grown graph from the old snapshot equals cold-starting it when
        the snapshot itself is uniform."""
        old = GR.pagerank(_edges(spark, [(1, 2), (2, 1)]), iterations=0)
        grown = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1)])
        # old snapshot is uniform 1/2; new graph N=3 -> init differs for
        # nodes 1,2 (0.5 vs 1/3) so ONE iteration already diverges from
        # cold; this asserts node 3 was seeded (no null poisoning).
        got = {
            r.node: r.rank
            for r in GR.pagerank(grown, iterations=1, init=old).collect()
        }
        assert set(got) == {1, 2, 3}
        assert all(v == v and v > 0 for v in got.values())  # no NaN/null


def _ref_closure(pairs, max_hops):
    """Driver-side bounded reachability reference (BFS per source)."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    nodes = set()
    for u, v in pairs:
        adj[u].append(v)
        nodes.update((u, v))
    out = set()
    for s in nodes:
        seen = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if seen[u] == max_hops:
                continue
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        out.update((s, t) for t in seen if t != s)
    return out


class TestTransitiveClosure:
    def test_chain_doubling(self, spark):
        """A 9-node chain: 2 doubling rounds reach exactly <= 4 hops."""
        pairs = [(i, i + 1) for i in range(1, 9)]
        got = {
            (r.src, r.dst)
            for r in GR.transitive_closure(
                _edges(spark, pairs), doubling_rounds=2
            ).collect()
        }
        assert got == _ref_closure(pairs, max_hops=4)

    def test_dag_matches_reference(self, spark):
        pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 6)]
        got = {
            (r.src, r.dst)
            for r in GR.transitive_closure(
                _edges(spark, pairs), doubling_rounds=3
            ).collect()
        }
        assert got == _ref_closure(pairs, max_hops=8)

    def test_cycle_is_irreflexive(self, spark):
        """On a cycle the closure contains all ordered pairs but never a
        self-pair."""
        pairs = [(1, 2), (2, 3), (3, 1)]
        got = {
            (r.src, r.dst)
            for r in GR.transitive_closure(
                _edges(spark, pairs), doubling_rounds=3
            ).collect()
        }
        assert got == {(u, v) for u in (1, 2, 3) for v in (1, 2, 3) if u != v}


class TestCommunityRollup:
    def test_two_cliques_with_bridge(self, spark):
        """Two triangles joined by one bridge edge: LPA labels each
        triangle with its min node id; the rollup has two intra
        supernodes (3 edges each) and one inter edge."""
        k1 = [(1, 2), (2, 3), (1, 3)]
        k2 = [(4, 5), (5, 6), (4, 6)]
        bridge = [(3, 4)]
        out = {
            (r.c_src, r.c_dst): (r.n_edges, r.n_intra)
            for r in GR.community_rollup(
                _edges(spark, k1 + k2 + bridge), iterations=3
            ).collect()
        }
        intra = {k: v for k, v in out.items() if k[0] == k[1]}
        inter = {k: v for k, v in out.items() if k[0] != k[1]}
        assert sum(v[0] for v in intra.values()) + sum(
            v[0] for v in inter.values()
        ) == 7  # every undirected edge counted exactly once
        assert all(v[0] == v[1] for v in intra.values())  # intra flagged
        assert all(v[1] == 0 for v in inter.values())

    def test_explicit_labels(self, spark):
        """Caller-supplied (node, label) mapping bypasses LPA."""
        labels = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 20)], "node long, label long"
        )
        out = {
            (r.c_src, r.c_dst): r.n_edges
            for r in GR.community_rollup(
                _edges(spark, [(1, 2), (2, 3), (1, 3)]), labels=labels
            ).collect()
        }
        assert out == {(10, 10): 1, (10, 20): 2}


def _ref_k_truss(pairs, k):
    """Driver-side reference: peel edges with support < k-2 to fixpoint."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        support = {
            e: len(nbrs[e[0]] & nbrs[e[1]]) for e in edges
        }
        kept = {e for e in edges if support[e] >= k - 2}
        if kept == edges:
            return {(a, b, support[(a, b)]) for a, b in edges}
        edges = kept


class TestKTruss:
    def test_star_hub_dropped_triangle_kept(self, spark):
        """Star 0-{1..5} has no triangles -> empty 3-truss; adding the
        triangle 1-2 keeps exactly its three edges."""
        star = [(0, i) for i in range(1, 6)]
        assert GR.k_truss(_edges(spark, star), 3).count() == 0
        got = {
            (r.a, r.b, r.support)
            for r in GR.k_truss(_edges(spark, star + [(1, 2)]), 3).collect()
        }
        assert got == {(0, 1, 1), (0, 2, 1), (1, 2, 1)}

    def test_matches_reference_at_fixpoint(self, spark):
        pairs = [(i, (i * 7 + 3) % 19) for i in range(19)] + [
            (i, (i + 5) % 19) for i in range(19)
        ] + [(0, i) for i in range(1, 7)]
        pairs = [p for p in pairs if p[0] != p[1]]
        for k in (3, 4):
            got = {
                (r.a, r.b, r.support)
                for r in GR.k_truss(_edges(spark, pairs), k).collect()
            }
            assert got == _ref_k_truss(pairs, k), k

    def test_cascading_peel_needs_multiple_rounds(self, spark):
        """Two triangles sharing edge (1,2), plus a pendant triangle
        chain: peeling for k=4 removes everything in cascades; fixed
        2 rounds must differ from convergence when the cascade is
        deeper."""
        # 4-clique with a tail triangle hanging off one vertex
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        tail = [(3, 4), (3, 5), (4, 5)]
        pairs = k4 + tail
        conv = {
            (r.a, r.b)
            for r in GR.k_truss(_edges(spark, pairs), 4).collect()
        }
        # 4-truss: every edge in >= 2 triangles -> only the K4 survives
        assert conv == {(a, b) for a, b in k4}

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            GR.k_truss(_edges(spark, [(1, 2)]), 1)


def _ref_bounded_harmonic(pairs, k):
    """Driver-side reference: BFS from every node over the given directed
    edge list, sum 1/dist for dist in [1, k]."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    nodes = set()
    for u, v in pairs:
        adj[u].add(v)
        nodes.update((u, v))
    out = {}
    for r in sorted(nodes):
        dist = {r: 0}
        q = deque([r])
        while q:
            u = q.popleft()
            if dist[u] == k:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        reached = [d for v, d in dist.items() if d > 0]
        if reached:
            out[r] = (len(reached), sum(1.0 / d for d in reached))
    return out


class TestHarmonicCentrality:
    def test_path_graph_matches_reference(self, spark):
        """Undirected path 1-2-3-4-5 at k=2: interior nodes see more and
        closer neighbors than the endpoints."""
        und = [(1, 2), (2, 3), (3, 4), (4, 5)]
        pairs = und + [(v, u) for u, v in und]
        got = {
            r.node: (r.n_reached, r.score)
            for r in GR.harmonic_centrality(_edges(spark, pairs), k=2).collect()
        }
        ref = _ref_bounded_harmonic(pairs, 2)
        assert got.keys() == ref.keys()
        for v, (n, s) in ref.items():
            assert got[v][0] == n
            assert got[v][1] == pytest.approx(s, abs=1e-12)

    def test_roots_sample_restricts_and_preserves_scores(self, spark):
        """Passing a roots subset scores exactly those nodes, each with
        the same value as the all-roots run (sampling picks WHO is
        scored, never changes a score)."""
        und = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 6)]
        pairs = und + [(v, u) for u, v in und]
        e = _edges(spark, pairs)
        all_rows = {
            r.node: (r.n_reached, r.score)
            for r in GR.harmonic_centrality(e, k=3).collect()
        }
        roots = spark.createDataFrame([(2,), (5,)], "node long")
        sub = {
            r.node: (r.n_reached, r.score)
            for r in GR.harmonic_centrality(e, k=3, roots=roots).collect()
        }
        assert set(sub) == {2, 5}
        for v in sub:
            assert sub[v] == all_rows[v]

    def test_disconnected_node_with_no_out_edges_absent(self, spark):
        """A root that reaches nothing within k contributes no row (score
        would be the empty sum)."""
        pairs = [(1, 2), (3, 3)]  # self-loop on 3 is not a hop
        got = GR.harmonic_centrality(
            _edges(spark, [(1, 2)]), k=2,
            roots=spark.createDataFrame([(7,)], "node long"),
        ).collect()
        assert got == []


def _ref_walk_counts(pairs, k):
    """Driver-side reference: A^k by dict-of-dict matrix multiply."""
    a = {}
    for u, v in set(pairs):
        a.setdefault(u, {})[v] = 1
    acc = {u: dict(vs) for u, vs in a.items()}
    for _ in range(k - 1):
        nxt = {}
        for u, mids in acc.items():
            for m, c in mids.items():
                for v, c2 in a.get(m, {}).items():
                    nxt.setdefault(u, {})[v] = (
                        nxt.get(u, {}).get(v, 0) + c * c2
                    )
        acc = nxt
    return {
        (u, v): c for u, vs in acc.items() for v, c in vs.items()
    }


class TestWalkCounts:
    def test_triangle_a3_matches_reference(self, spark):
        """Undirected triangle: A^3 diagonal = 2 (the two orientations of
        the closed walk), off-diagonal = 3."""
        und = [(1, 2), (2, 3), (1, 3)]
        pairs = und + [(v, u) for u, v in und]
        got = {
            (r.src, r.dst): r.n_walks
            for r in GR.walk_counts(_edges(spark, pairs), k=3).collect()
        }
        ref = _ref_walk_counts(pairs, 3)
        assert got == ref
        assert got[(1, 1)] == 2 and got[(1, 2)] == 3

    def test_directed_chain_counts(self, spark):
        """Directed chain 1->2->3->4: exactly one length-3 walk (1->4),
        and k=1 is the edge set itself."""
        pairs = [(1, 2), (2, 3), (3, 4)]
        e = _edges(spark, pairs)
        got3 = {
            (r.src, r.dst): r.n_walks
            for r in GR.walk_counts(e, k=3).collect()
        }
        assert got3 == {(1, 4): 1}
        got1 = {
            (r.src, r.dst): r.n_walks
            for r in GR.walk_counts(e, k=1).collect()
        }
        assert got1 == {(u, v): 1 for u, v in pairs}

    def test_duplicate_input_edges_collapse(self, spark):
        """The input edge relation is distinct-ed: duplicated rows do not
        inflate walk counts."""
        pairs = [(1, 2), (1, 2), (2, 3)]
        got = {
            (r.src, r.dst): r.n_walks
            for r in GR.walk_counts(_edges(spark, pairs), k=2).collect()
        }
        assert got == {(1, 3): 1}

    def test_k_below_one_rejected(self, spark):
        with pytest.raises(ValueError):
            GR.walk_counts(_edges(spark, [(1, 2)]), k=0)


class TestSccBounded:
    def _sccs(self, spark, pairs, k):
        out = GR.scc_bounded(_edges(spark, pairs), k=k).collect()
        groups = {}
        for r in out:
            groups.setdefault(r.scc_id, set()).add(r.node)
        return set(frozenset(g) for g in groups.values())

    def test_cycle_plus_tail(self, spark):
        """Directed 3-cycle is one class (diameter 2 <= k); the node
        feeding into it is a singleton (no path back)."""
        got = self._sccs(spark, [(1, 2), (2, 3), (3, 1), (4, 1)], k=2)
        assert got == {frozenset({1, 2, 3}), frozenset({4})}

    def test_two_cycle_and_dag_edge(self, spark):
        got = self._sccs(spark, [(1, 2), (2, 1), (3, 4)], k=2)
        assert got == {frozenset({1, 2}), frozenset({3}), frozenset({4})}

    def test_bound_contract_on_long_cycle(self, spark):
        """A 4-cycle has directed diameter 3: at k=2 only OPPOSITE
        corners are mutually reachable (1->2->3 and 3->4->1), so the
        classes are the two diagonals — the documented bounded
        semantics; at k >= diameter the cycle is one class = true SCC."""
        cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
        assert self._sccs(spark, cyc, k=2) == {
            frozenset({1, 3}), frozenset({2, 4})
        }
        assert self._sccs(spark, cyc, k=3) == {frozenset({1, 2, 3, 4})}

    def test_components_close_over_shared_nodes(self, spark):
        """Two cyclically-oriented triangles sharing a node form ONE
        class: the output is the equivalence closure (connected
        components) of the mutual-reachability relation, matching true
        SCC here since the union is one SCC of diameter <= ... within
        each triangle every pair is mutual, and CC merges through the
        shared node exactly as Tarjan would."""
        tri1 = [(1, 2), (2, 3), (3, 1)]
        tri2 = [(3, 4), (4, 5), (5, 3)]
        got = self._sccs(spark, tri1 + tri2, k=2)
        assert got == {frozenset({1, 2, 3, 4, 5})}


class TestModularity:
    def test_two_cliques_with_bridge(self, spark):
        """Two triangles joined by one bridge edge, communities = the
        triangles: m=7, m_c=3, d_c=7 each -> contribution
        3/7 - (7/14)^2 = 0.178571 per community, Q ~ 0.357."""
        tri1 = [(1, 2), (2, 3), (1, 3)]
        tri2 = [(4, 5), (5, 6), (4, 6)]
        e = _edges(spark, tri1 + tri2 + [(3, 4)])
        labels = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
            "node long, label long",
        )
        rows = {r.label: r for r in GR.modularity(e, labels).collect()}
        for lab in (10, 20):
            assert rows[lab].n_nodes == 3
            assert rows[lab].m_intra == 3
            assert rows[lab].deg_sum == 7
            assert rows[lab].contribution == pytest.approx(
                3 / 7 - (7 / 14) ** 2, abs=1e-6
            )
        q = sum(r.contribution for r in rows.values())
        assert q == pytest.approx(0.357143, abs=1e-5)

    def test_single_community_q_zero(self, spark):
        """Everything in one community: Q = m/m - (2m/2m)^2 = 0 exactly
        (and serializes as +0.0, not -0.0)."""
        e = _edges(spark, [(1, 2), (2, 3)])
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "node long, label long"
        )
        rows = GR.modularity(e, labels).collect()
        assert len(rows) == 1
        assert repr(rows[0].contribution) == "0.0"

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        """m counts distinct unordered pairs: duplicated/reversed input
        rows don't inflate the null model."""
        e = _edges(spark, [(1, 2), (2, 1), (1, 2)])
        labels = spark.createDataFrame(
            [(1, 1), (2, 1)], "node long, label long"
        )
        r = GR.modularity(e, labels).collect()[0]
        assert r.m_intra == 1 and r.deg_sum == 2
        assert r.contribution == pytest.approx(1.0 - 1.0, abs=1e-9)


class TestGraphStats:
    def test_star_graph_disassortative(self, spark):
        """A star is maximally disassortative: hub (deg 4) always pairs
        with leaves (deg 1) -> assortativity = -1."""
        star = [(0, i) for i in range(1, 5)]
        r = GR.graph_stats(_edges(spark, star)).collect()[0]
        assert r.n_nodes == 5 and r.n_edges == 4
        assert r.max_degree == 4
        assert r.avg_degree == pytest.approx(8 / 5, abs=1e-9)
        assert r.density == pytest.approx(4 / 10, abs=1e-9)
        assert r.assortativity == pytest.approx(-1.0, abs=1e-6)

    def test_regular_graph_degenerate_variance(self, spark):
        """On a cycle every endpoint degree is 2: the variance
        denominator is 0 and assortativity is NULL (try_divide), not a
        crash or a fake 0."""
        cyc = [(1, 2), (2, 3), (3, 1)]
        r = GR.graph_stats(_edges(spark, cyc)).collect()[0]
        assert r.n_edges == 3 and r.max_degree == 2
        assert r.assortativity is None

    def test_matches_pearson_reference(self, spark):
        """Assortativity equals Newman's formula computed driver-side."""
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (3, 5)]
        got = GR.graph_stats(_edges(spark, pairs)).collect()[0]
        deg = {}
        for u, v in pairs:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        m = len(pairs)
        js = [(deg[u], deg[v]) for u, v in pairs]
        s_jk = sum(j * k for j, k in js) / m
        s_half = sum((j + k) / 2 for j, k in js) / m
        s_sq = sum((j * j + k * k) / 2 for j, k in js) / m
        ref = (s_jk - s_half**2) / (s_sq - s_half**2)
        assert got.assortativity == pytest.approx(ref, abs=1e-6)


class TestConductance:
    def test_two_cliques_with_bridge(self, spark):
        """Two triangles + 1 bridge, communities = the triangles:
        cut = 1 for both, volume = 7 each (2m = 14), conductance =
        1 / min(7, 7) = 0.142857."""
        tri1 = [(1, 2), (2, 3), (1, 3)]
        tri2 = [(4, 5), (5, 6), (4, 6)]
        e = _edges(spark, tri1 + tri2 + [(3, 4)])
        labels = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
            "node long, label long",
        )
        rows = {r.label: r for r in GR.conductance(e, labels).collect()}
        for lab in (10, 20):
            assert rows[lab].cut == 1 and rows[lab].volume == 7
            assert rows[lab].conductance == pytest.approx(1 / 7, abs=1e-6)

    def test_isolated_community_zero(self, spark):
        """A community with no cut edges has conductance exactly 0
        (serialized +0.0)."""
        e = _edges(spark, [(1, 2), (3, 4)])
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 2), (4, 2)], "node long, label long"
        )
        rows = {r.label: r for r in GR.conductance(e, labels).collect()}
        assert all(r.cut == 0 for r in rows.values())
        assert all(repr(r.conductance) == "0.0" for r in rows.values())

    def test_whole_graph_single_community_null(self, spark):
        """One community holding all volume: min(vol, 2m - vol) = 0 and
        conductance is NULL (try_divide), not inf or a crash."""
        e = _edges(spark, [(1, 2), (2, 3)])
        labels = spark.createDataFrame(
            [(1, 9), (2, 9), (3, 9)], "node long, label long"
        )
        r = GR.conductance(e, labels).collect()[0]
        assert r.cut == 0 and r.conductance is None


class TestTemporalKhop:
    def _edges_ts(self, spark, triples):
        return spark.createDataFrame(
            [(s, d, f"2024-01-{t:02d}") for s, d, t in triples],
            "src long, dst long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def _run(self, spark, triples, sources, k):
        src = spark.createDataFrame([(s,) for s in sources], "node long")
        return {
            r.node: (
                r.hops,
                None
                if r.earliest_arrival is None
                else r.earliest_arrival.day,
            )
            for r in GR.temporal_khop(
                self._edges_ts(spark, triples), src, k
            ).collect()
        }

    def test_time_respecting_only(self, spark):
        """1->2 on day 5, 2->3 on day 3: the 2-hop path is NOT
        time-respecting (3 < 5), so 3 is unreachable; with 2->3 on day
        7 it is."""
        got = self._run(spark, [(1, 2, 5), (2, 3, 3)], [1], k=2)
        assert got == {1: (0, None), 2: (1, 5)}
        got2 = self._run(spark, [(1, 2, 5), (2, 3, 7)], [1], k=2)
        assert got2 == {1: (0, None), 2: (1, 5), 3: (2, 7)}

    def test_earliest_arrival_minimum_over_paths(self, spark):
        """Two time-respecting routes to node 4: arrival is the minimum
        last-edge ts, hops the fewest achieving it."""
        triples = [
            (1, 2, 1), (2, 4, 9),     # 2 hops, arrives day 9
            (1, 4, 6),                # 1 hop, arrives day 6
        ]
        got = self._run(spark, triples, [1], k=2)
        assert got[4] == (1, 6)

    def test_dominance_prune_is_sound(self, spark):
        """The min-arrival frontier must not lose reachability: the
        earliest level-1 arrival at node 2 (day 2) enables every
        continuation a later arrival would."""
        triples = [(1, 2, 2), (1, 2, 8), (2, 3, 5)]
        got = self._run(spark, triples, [1], k=2)
        assert got[2] == (1, 2)
        assert got[3] == (2, 5)

    def test_source_stays_hop_zero_on_cycle(self, spark):
        got = self._run(spark, [(1, 2, 1), (2, 1, 2)], [1], k=2)
        assert got[1] == (0, None)
        assert got[2] == (1, 1)


class TestHyperAnf:
    def _edges(self, spark, pairs):
        und = spark.createDataFrame(pairs, "src long, dst long")
        return GR.symmetrize(und)

    def test_ball_estimates_track_exact_sizes(self, spark):
        # path graph 1-2-3-4-5: exact |B(v,h)| known in closed form
        adj = self._edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        out = GR.hyper_anf(adj, hops=2, p=5)
        got = {(r.h, r.node): r.est_ball for r in out.collect()}
        exact = {}
        for v in range(1, 6):
            for h in range(3):
                exact[(h, v)] = sum(
                    1 for u in range(1, 6) if abs(u - v) <= h
                )
        assert set(got) == set(exact)
        # m=32 linear counting on tiny sets: within 20% of truth
        for k, e in exact.items():
            assert got[k] == pytest.approx(e, rel=0.2)

    def test_monotone_in_h_and_partition_invariant(self, spark):
        adj = self._edges(
            spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
        ).cache()
        out = GR.hyper_anf(adj, hops=2, p=5)
        got = {(r.h, r.node): r.est_ball for r in out.collect()}
        for v in [1, 2, 3, 4, 5, 6]:
            assert got[(0, v)] <= got[(1, v)] + 1e-9
            assert got[(1, v)] <= got[(2, v)] + 1e-9
        re_out = GR.hyper_anf(adj.repartition(7), hops=2, p=5)
        re_got = {(r.h, r.node): r.est_ball for r in re_out.collect()}
        assert re_got == got


class TestLandmarkDistances:
    def _adj(self, spark, und_pairs):
        return GR.symmetrize(
            spark.createDataFrame(und_pairs, "src long, dst long")
        )

    def _pairs(self, spark, ps):
        return spark.createDataFrame(ps, "u long, v long")

    def test_all_landmarks_is_exact(self, spark):
        # landmark l = u gives d(u,u)+d(u,v) = d(u,v): with every node a
        # landmark the sketch collapses to the exact bounded distance
        adj = self._adj(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (2, 5)])
        pairs = self._pairs(
            spark, [(1, 3), (1, 5), (2, 4), (3, 5), (1, 4)]
        )
        est = {
            (r.u, r.v): r.est_dist
            for r in GR.landmark_distances(
                adj, pairs, n_landmarks=5, max_hops=4
            ).collect()
        }
        exact = {(1, 3): 2, (1, 5): 2, (2, 4): 2, (3, 5): 2, (1, 4): 3}
        assert est == exact

    def test_upper_bound_and_uncovered_null(self, spark):
        # two components: pairs across them get NULL; within-component
        # estimates are >= exact and >= the direct hop count
        adj = self._adj(spark, [(1, 2), (2, 3), (10, 11)])
        pairs = self._pairs(spark, [(1, 3), (1, 10)])
        out = {
            (r.u, r.v): r.est_dist
            for r in GR.landmark_distances(
                adj, pairs, n_landmarks=1, max_hops=3
            ).collect()
        }
        assert out[(1, 10)] is None
        est13 = out[(1, 3)]
        # single landmark lies in one component only; if it is in
        # {1,2,3} the estimate must be >= d(1,3) = 2
        assert est13 is None or est13 >= 2


class TestEffectiveDiameter:
    def test_clique_vs_path(self, spark):
        # 5-clique: everything reached at h=1 -> eff diameter <= 1
        clique = GR.symmetrize(
            spark.createDataFrame(
                [(a, b) for a in range(5) for b in range(a + 1, 5)],
                "src long, dst long",
            )
        )
        d_clique = GR.effective_diameter(
            clique, hops=2, p=5
        ).collect()[0]
        assert d_clique.eff_diameter <= 1.0 + 1e-9
        # path of 9 nodes: N(h) keeps growing past h=2 -> the truncated
        # eff diameter must sit strictly above the clique's
        path = GR.symmetrize(
            spark.createDataFrame(
                [(i, i + 1) for i in range(8)], "src long, dst long"
            )
        )
        d_path = GR.effective_diameter(path, hops=2, p=5).collect()[0]
        assert d_path.eff_diameter > d_clique.eff_diameter
        # interpolation stays within the hop budget
        assert 0.0 <= d_path.eff_diameter <= 2.0

    def test_pairs_max_tracks_reachability(self, spark):
        # two disjoint 3-cliques: N(2) ~= 2 * 9 = 18 pairs
        tri = [(a, b) for a in range(3) for b in range(a + 1, 3)]
        edges = tri + [(a + 10, b + 10) for a, b in tri]
        adj = GR.symmetrize(
            spark.createDataFrame(edges, "src long, dst long")
        )
        r = GR.effective_diameter(adj, hops=2, p=5).collect()[0]
        assert r.n_pairs_max == pytest.approx(18, rel=0.25)


class TestKatzIndex:
    def test_matches_matrix_power_reference(self, spark):
        import numpy as np

        und = [(0, 1), (1, 2), (2, 3), (0, 2)]
        adj = GR.symmetrize(
            spark.createDataFrame(und, "src long, dst long")
        )
        got = {
            (r.src, r.dst): r.katz
            for r in GR.katz_index(adj, max_len=3, beta=0.05).collect()
        }
        A = np.zeros((4, 4))
        for a, b in und:
            A[a][b] = A[b][a] = 1.0
        K = 0.05 * A + 0.05 ** 2 * (A @ A) + 0.05 ** 3 * (A @ A @ A)
        for u in range(4):
            for v in range(4):
                if K[u][v] > 0:
                    assert got[(u, v)] == pytest.approx(
                        K[u][v], rel=1e-12
                    ), (u, v)
        # support = nonzero entries only
        assert all(K[u][v] > 0 for (u, v) in got)


class TestPowerlawTailFit:
    def test_recovers_planted_exponent(self, spark):
        import math

        # plant a tail with DENSITY exponent alpha (CSN convention:
        # p(x) ~ x^-alpha, so CCDF ~ x^-(alpha-1)): quantile inversion
        # over a deterministic grid gives d = dmin * u^(-1/(alpha-1))
        alpha_true, dmin_true, n = 3.5, 10.0, 400
        degs = [
            (
                i,
                dmin_true
                * ((i + 0.5) / n) ** (-1.0 / (alpha_true - 1.0)),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(degs, "node long, degree double")
        r = GR.powerlaw_tail_fit(df, "degree", k_tail=100).collect()[0]
        assert r.k_tail == 100
        # Hill on the top-100 of a clean Pareto tail: close to truth
        assert r.alpha == pytest.approx(alpha_true, rel=0.15)
        # d_min is the 101st largest planted value
        expected_dmin = sorted((d for _, d in degs), reverse=True)[100]
        assert r.d_min == pytest.approx(expected_dmin, rel=1e-12)

    def test_tail_smaller_than_k(self, spark):
        # fewer than k_tail+1 rows: the estimator has no d_min row ->
        # empty result rather than a wrong fit
        df = spark.createDataFrame(
            [(i, float(i + 1)) for i in range(5)],
            "node long, degree double",
        )
        out = GR.powerlaw_tail_fit(df, "degree", k_tail=100).collect()
        assert len(out) == 1 and out[0].k_tail == 0
