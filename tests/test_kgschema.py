"""Type-hierarchy inference, truth discovery, property table
(operators/kgschema.py) on hand-built instances."""

import pytest

from kernel_memory_spark.operators import kgschema as KS


def _assign(spark, rows):
    return spark.createDataFrame(rows, "entity long, type string")


class TestTypeSubsumption:
    def test_strict_hierarchy(self, spark):
        """dog ⊑ mammal ⊑ animal; cat ⊑ mammal; no reverse edges."""
        rows = []
        for e, types in [
            (1, ["dog", "mammal", "animal"]),
            (2, ["dog", "mammal", "animal"]),
            (3, ["cat", "mammal", "animal"]),
            (4, ["fish", "animal"]),
        ]:
            rows += [(e, t) for t in types]
        out = {
            (r.sub_type, r.super_type): (r.n_sub, r.n_common)
            for r in KS.type_subsumption(_assign(spark, rows)).collect()
        }
        assert set(out) == {
            ("dog", "mammal"),
            ("dog", "animal"),
            ("cat", "mammal"),
            ("cat", "animal"),
            ("mammal", "animal"),
            ("fish", "animal"),
        }
        assert out[("mammal", "animal")] == (3, 3)

    def test_equal_extent_orients_by_name(self, spark):
        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
        out = [
            (r.sub_type, r.super_type)
            for r in KS.type_subsumption(_assign(spark, rows)).collect()
        ]
        assert out == [("a", "b")]

    def test_tolerance_admits_noise(self, spark):
        """9 of 10 dogs are mammals: strict containment rejects, 10%
        tolerance accepts."""
        rows = []
        for e in range(10):
            rows.append((e, "dog"))
            if e != 0:
                rows.append((e, "mammal"))
        rows += [(e, "mammal") for e in range(10, 15)]
        strict = KS.type_subsumption(_assign(spark, rows)).collect()
        assert not any(r.sub_type == "dog" for r in strict)
        loose = {
            (r.sub_type, r.super_type): r.containment
            for r in KS.type_subsumption(
                _assign(spark, rows), tolerance=0.1
            ).collect()
        }
        assert loose[("dog", "mammal")] == pytest.approx(0.9)

    def test_hub_cap_drops_spam_entity(self, spark):
        """An entity with more types than the cap contributes no pairs."""
        rows = [(1, f"t{i}") for i in range(5)] + [(2, "t0"), (2, "t1")]
        out = KS.type_subsumption(
            _assign(spark, rows), max_types_per_entity=3
        ).collect()
        # only entity 2 survives -> the single equal-extent pair (t0, t1)
        assert {(r.sub_type, r.super_type) for r in out} == {("t0", "t1")}

    def test_min_support_prunes_rare_types(self, spark):
        rows = [(1, "rare"), (1, "common"), (2, "common")]
        out = KS.type_subsumption(
            _assign(spark, rows), min_support=2
        ).collect()
        assert not any(
            "rare" in (r.sub_type, r.super_type) for r in out
        )


class TestResolveConflicts:
    def _triples(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )

    def test_majority_wins(self, spark):
        t = self._triples(
            spark,
            [("s", "p", "x"), ("s", "p", "x"), ("s", "p", "y")],
        )
        row = KS.resolve_conflicts(t).collect()[0]
        assert (row.obj, row.n_votes, row.n_alternatives) == ("x", 2, 2)

    def test_tie_breaks_to_smallest(self, spark):
        t = self._triples(spark, [("s", "p", "b"), ("s", "p", "a")])
        assert KS.resolve_conflicts(t).collect()[0].obj == "a"

    def test_unconflicted_flagged(self, spark):
        t = self._triples(spark, [("s", "p", "x"), ("s", "q", "y")])
        out = {r.pred: r.n_alternatives for r in KS.resolve_conflicts(t).collect()}
        assert out == {"p": 1, "q": 1}


class TestPropertyTable:
    def test_pivot_and_multivalue_min(self, spark):
        t = spark.createDataFrame(
            [
                ("s1", "name", "zed"),
                ("s1", "name", "alice"),  # multi-valued -> min
                ("s1", "age", "30"),
                ("s2", "name", "bob"),
            ],
            "subj string, pred string, obj string",
        )
        out = {
            r.subj: (r.name, r.age)
            for r in KS.property_table(t, ["name", "age"]).collect()
        }
        assert out == {"s1": ("alice", "30"), "s2": ("bob", None)}
