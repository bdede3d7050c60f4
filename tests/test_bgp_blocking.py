"""BGP pattern matching (plans/bgp.py) and meta-blocking
(operators/blocking.py) on hand-built relations."""

import pytest

from kernel_memory_spark.operators import blocking as BL
from kernel_memory_spark.plans.bgp import bgp_match


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


GRAPH = [
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("alice", "lives", "paris"),
    ("bob", "lives", "paris"),
    ("carol", "lives", "rome"),
    ("narcissus", "knows", "narcissus"),
]


class TestBgpMatch:
    def test_single_pattern_with_constant(self, spark):
        t = _triples(spark, GRAPH)
        out = {
            r.x for r in bgp_match(t, [("?x", "lives", "paris")]).collect()
        }
        assert out == {"alice", "bob"}

    def test_join_across_patterns(self, spark):
        """Who knows someone living in rome?"""
        t = _triples(spark, GRAPH)
        out = {
            (r.x, r.y)
            for r in bgp_match(
                t, [("?x", "knows", "?y"), ("?y", "lives", "rome")]
            ).collect()
        }
        assert out == {("alice", "carol"), ("bob", "carol")}

    def test_repeated_var_within_element(self, spark):
        t = _triples(spark, GRAPH)
        out = {
            r.x for r in bgp_match(t, [("?x", "knows", "?x")]).collect()
        }
        assert out == {"narcissus"}

    def test_triangle_pattern(self, spark):
        t = _triples(spark, GRAPH)
        out = bgp_match(
            t,
            [
                ("?a", "knows", "?b"),
                ("?b", "knows", "?c"),
                ("?a", "knows", "?c"),
            ],
        ).collect()
        # SPARQL BGP semantics: distinct variables MAY bind to the same
        # term, so the self-loop satisfies the triangle with a=b=c.
        assert {(r.a, r.b, r.c) for r in out} == {
            ("alice", "bob", "carol"),
            ("narcissus", "narcissus", "narcissus"),
        }

    def test_ground_pattern_is_existence_filter(self, spark):
        t = _triples(spark, GRAPH)
        present = bgp_match(
            t, [("?x", "lives", "rome"), ("alice", "knows", "bob")]
        )
        assert {r.x for r in present.collect()} == {"carol"}
        absent = bgp_match(
            t, [("?x", "lives", "rome"), ("alice", "knows", "zeno")]
        )
        assert absent.count() == 0

    def test_cartesian_rejected_unless_forced(self, spark):
        t = _triples(spark, GRAPH)
        with pytest.raises(ValueError, match="cartesian"):
            bgp_match(t, [("?x", "lives", "paris"), ("?y", "lives", "rome")])
        forced = bgp_match(
            t,
            [("?x", "lives", "paris"), ("?y", "lives", "rome")],
            allow_cartesian=True,
        )
        assert forced.count() == 2

    def test_empty_pattern_raises(self, spark):
        with pytest.raises(ValueError):
            bgp_match(_triples(spark, GRAPH), [])


def _assign(spark, rows):
    return spark.createDataFrame(rows, "entity long, block string")


class TestMetaBlock:
    def test_cbs_weight_and_threshold(self, spark):
        rows = [
            (1, "x"), (2, "x"),
            (1, "y"), (2, "y"),
            (1, "z"), (3, "z"),
        ]
        out = {
            (r.a, r.b): r.n_common_blocks
            for r in BL.meta_block(
                _assign(spark, rows), min_common_blocks=2
            ).collect()
        }
        assert out == {(1, 2): 2}  # (1,3) has weight 1, pruned

    def test_block_purging(self, spark):
        """A block over the size cap contributes no pairs at all."""
        big = [(e, "stop") for e in range(10)]
        small = [(1, "rare"), (2, "rare")]
        out = {
            (r.a, r.b)
            for r in BL.meta_block(
                _assign(spark, big + small), max_block_size=5
            ).collect()
        }
        assert out == {(1, 2)}

    def test_node_centric_top_k(self, spark):
        """Pair survives if top-k of EITTHER endpoint: entity 1's weakest
        edge survives because it is entity 4's strongest."""
        rows = (
            [(1, f"b{i}") for i in range(3)] + [(2, f"b{i}") for i in range(3)]
            + [(1, f"c{i}") for i in range(2)] + [(3, f"c{i}") for i in range(2)]
            + [(1, "d0"), (4, "d0")]
        )
        out = BL.meta_block(_assign(spark, rows), top_k=1).collect()
        kept = {(r.a, r.b): r.n_common_blocks for r in out}
        # top-1 of entity 1 is (1,2) w=3; (1,3) w=2 is pruned (not top-1
        # of 1, and 3 ranks (1,3) first so it IS kept via endpoint 3;
        # (1,4) kept via endpoint 4.
        assert kept[(1, 2)] == 3
        assert (1, 4) in kept
        assert (1, 3) in kept  # rank-1 for endpoint 3

    def test_duplicate_assignments_ignored(self, spark):
        rows = [(1, "x"), (1, "x"), (2, "x")]
        out = BL.meta_block(_assign(spark, rows)).collect()
        assert {(r.a, r.b, r.n_common_blocks) for r in out} == {(1, 2, 1)}


class TestBlockingQuality:
    def test_metrics(self, spark):
        pairs = lambda rows: spark.createDataFrame(rows, "a long, b long")
        ents = spark.createDataFrame([(i,) for i in range(5)], "e long")
        cand = pairs([(1, 2), (3, 4), (1, 3)])
        truth = pairs([(1, 2), (3, 4), (2, 3), (4, 5)])
        row = __import__(
            "kernel_memory_spark.operators.blocking", fromlist=["x"]
        ).blocking_quality(cand, truth, ents).collect()[0]
        assert (row.n_candidates, row.n_true, row.n_covered) == (3, 4, 2)
        assert row.pairs_completeness == 0.5
        assert row.reduction_ratio == 0.7  # 1 - 3/10

    def test_empty_truth_gives_completeness_one(self, spark):
        pairs = lambda rows, s="a long, b long": spark.createDataFrame(
            rows, s
        )
        import pyspark.sql.types as T

        empty = spark.createDataFrame(
            [], T.StructType([
                T.StructField("a", T.LongType()),
                T.StructField("b", T.LongType()),
            ])
        )
        ents = spark.createDataFrame([(i,) for i in range(3)], "e long")
        row = __import__(
            "kernel_memory_spark.operators.blocking", fromlist=["x"]
        ).blocking_quality(pairs([(1, 2)]), empty, ents).collect()[0]
        assert row.pairs_completeness == 1.0


class TestSortedNeighborhood:
    def _recs(self, spark, names, parts=3):
        rows = [(i, n) for i, n in enumerate(names)]
        return spark.createDataFrame(
            rows, "doc_id long, name string"
        ).repartition(parts)

    def _ref(self, names, w):
        order = sorted(range(len(names)),
                       key=lambda i: f"{names[i]}|{i}")
        out = set()
        for ri, i in enumerate(order):
            for rj in range(ri + 1, min(ri + w, len(order))):
                out.add((i, order[rj], rj - ri))
        return out

    def test_matches_reference_windows(self, spark):
        import pyspark.sql.functions as F

        names = ["smith", "smyth", "adams", "smithe", "adamson",
                 "brown", "browne", "zed"]
        for w in (2, 3, 4):
            got = {
                (r.a, r.b, r.rank_dist)
                for r in BL.sorted_neighborhood(
                    self._recs(spark, names), "doc_id",
                    F.col("name"), window=w,
                ).collect()
            }
            assert got == self._ref(names, w), w

    def test_layout_independent(self, spark):
        import pyspark.sql.functions as F

        names = [f"key{i % 7}x{i}" for i in range(40)]
        sets = []
        for parts in (1, 11):
            sets.append({
                (r.a, r.b)
                for r in BL.sorted_neighborhood(
                    self._recs(spark, names, parts), "doc_id",
                    F.col("name"), window=3,
                ).collect()
            })
        assert sets[0] == sets[1]
        assert len(sets[0]) == 2 * 40 - 3

    def test_window_validation(self, spark):
        import pyspark.sql.functions as F

        with pytest.raises(ValueError):
            BL.sorted_neighborhood(
                self._recs(spark, ["a"]), "doc_id", F.col("name"), 1
            )


class TestBcubed:
    def test_matches_per_element_reference(self, spark):
        """Aggregated form equals the per-element definition (avg over
        elements of |pred∩truth|/|pred| and /|truth|)."""
        from kernel_memory_spark.operators.blocking import bcubed

        asg = [
            ("a", 1, 1), ("b", 1, 1), ("c", 1, 2),
            ("d", 2, 2), ("e", 2, 3), ("f", 3, 3),
        ]
        df = spark.createDataFrame(asg, "id string, pred long, truth long")
        got = bcubed(df).collect()[0]
        # driver-side reference, element by element
        from collections import Counter

        pc = Counter(p for _, p, _ in asg)
        tc = Counter(t for _, _, t in asg)
        ic = Counter((p, t) for _, p, t in asg)
        ps = [ic[(p, t)] / pc[p] for _, p, t in asg]
        rs = [ic[(p, t)] / tc[t] for _, p, t in asg]
        ref_p = sum(ps) / len(asg)
        ref_r = sum(rs) / len(asg)
        assert got.n == 6
        assert got.bcubed_precision == pytest.approx(ref_p, abs=1e-6)
        assert got.bcubed_recall == pytest.approx(ref_r, abs=1e-6)
        assert got.bcubed_f1 == pytest.approx(
            2 * ref_p * ref_r / (ref_p + ref_r), abs=1e-6
        )

    def test_perfect_clustering(self, spark):
        from kernel_memory_spark.operators.blocking import bcubed

        df = spark.createDataFrame(
            [("a", 1, 9), ("b", 1, 9), ("c", 2, 8)],
            "id string, pred long, truth long",
        )
        got = bcubed(df).collect()[0]
        assert (got.bcubed_precision, got.bcubed_recall, got.bcubed_f1) == (
            1.0, 1.0, 1.0,
        )
