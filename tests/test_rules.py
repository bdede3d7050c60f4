"""Datalog-style inference (plans/rules.py): closure correctness vs a
driver-side naive fixpoint, semi-naive == naive, bounded recursion, and
early exit."""

import pytest
from pyspark.sql import functions as F

from kernel_memory_spark.plans import rules as RL


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


def _ref_closure(facts, rules, max_rounds):
    """Naive driver-side fixpoint over the same rule syntax."""
    def match(body, universe):
        outs = [dict()]
        for s, p, o in body:
            nxt = []
            for env in outs:
                for fs, fp, fo in universe:
                    e = dict(env)
                    ok = True
                    for term, val in ((s, fs), (p, fp), (o, fo)):
                        if term.startswith("?"):
                            v = term[1:]
                            if v in e and e[v] != val:
                                ok = False
                                break
                            e[v] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        nxt.append(e)
            outs = nxt
        return outs

    universe = set(facts)
    for _ in range(max_rounds):
        new = set()
        for body, head in rules:
            for env in match(body, universe):
                fact = tuple(
                    env[t[1:]] if t.startswith("?") else t for t in head
                )
                if fact not in universe:
                    new.add(fact)
        if not new:
            break
        universe |= new
    return universe


SOCIAL = [
    ("a", "parent", "b"), ("b", "parent", "c"), ("c", "parent", "d"),
    ("a", "spouse", "e"),
]


class TestInfer:
    def test_composition_and_inverse(self, spark):
        rules = [
            ([("?x", "parent", "?y"), ("?y", "parent", "?z")],
             ("?x", "grandparent", "?z")),
            ([("?x", "spouse", "?y")], ("?y", "spouse", "?x")),
        ]
        got = {
            (r.subj, r.pred, r.obj)
            for r in RL.infer(_t(spark, SOCIAL), rules, 3).collect()
        }
        assert got == _ref_closure(set(SOCIAL), rules, 3)
        assert ("a", "grandparent", "c") in got
        assert ("e", "spouse", "a") in got

    def test_multi_round_dependency(self, spark):
        """ancestor via recursive rule: bounded rounds derive bounded
        depth; semi-naive must still find depth-3 paths by round 2
        (delta joins closure, doubling reach)."""
        rules = [
            ([("?x", "parent", "?y")], ("?x", "anc", "?y")),
            ([("?x", "anc", "?y"), ("?y", "anc", "?z")],
             ("?x", "anc", "?z")),
        ]
        got = {
            (r.subj, r.pred, r.obj)
            for r in RL.infer(_t(spark, SOCIAL), rules, 3).collect()
        }
        ref = _ref_closure(set(SOCIAL), rules, 3)
        assert got == ref
        assert ("a", "anc", "d") in got

    def test_truncation_at_max_rounds(self, spark):
        chain = [(f"n{i}", "next", f"n{i+1}") for i in range(8)]
        rules = [
            ([("?x", "next", "?y")], ("?x", "reach", "?y")),
            ([("?x", "reach", "?y"), ("?y", "next", "?z")],
             ("?x", "reach", "?z")),
        ]
        got = {
            (r.subj, r.pred, r.obj)
            for r in RL.infer(_t(spark, chain), rules, 2).collect()
        }
        assert got == _ref_closure(set(chain), rules, 2)
        # linear rule: round r reaches depth r+1; depth-4 needs round 3
        assert ("n0", "reach", "n2") in got
        assert ("n0", "reach", "n4") not in got

    def test_early_exit_keeps_fixpoint(self, spark):
        rules = [([("?x", "spouse", "?y")], ("?y", "spouse", "?x"))]
        a = RL.infer(_t(spark, SOCIAL), rules, 2).collect()
        b = RL.infer(_t(spark, SOCIAL), rules, 10).collect()
        assert {tuple(r) for r in a} == {tuple(r) for r in b}

    def test_constant_head_and_body(self, spark):
        rules = [
            ([("?x", "parent", "b")], ("?x", "type", "Parent")),
        ]
        got = {
            (r.subj, r.pred, r.obj)
            for r in RL.infer(_t(spark, SOCIAL), rules, 1).collect()
        }
        assert ("a", "type", "Parent") in got

    def test_unbound_head_var_raises(self, spark):
        with pytest.raises(ValueError):
            RL.infer(
                _t(spark, SOCIAL),
                [([("?x", "parent", "?y")], ("?x", "p", "?zzz"))],
                1,
            ).collect()
