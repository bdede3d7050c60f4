"""match_scores (operators/matching.py): feature correctness on
hand-computable pairs, tier boundaries, and the capped-prefix guarantee."""

import pytest
from pyspark.sql import functions as F

from kernel_memory_spark.operators import matching as MT


def _run(spark, cand_rows, rec_rows, **kw):
    cand = spark.createDataFrame(cand_rows, "a string, b string")
    rec = spark.createDataFrame(rec_rows, "doc_id string, text string")
    return {
        (r.a, r.b): r
        for r in MT.match_scores(cand, rec, **kw).collect()
    }


class TestMatchScores:
    def test_identical_texts_score_one(self, spark):
        got = _run(
            spark,
            [("d1", "d2")],
            [("d1", "alpha beta gamma"), ("d2", "alpha beta gamma")],
        )
        r = got[("d1", "d2")]
        assert (r.token_jaccard, r.lev_sim, r.len_ratio) == (1.0, 1.0, 1.0)
        assert r.score == 1.0 and r.tier == "match"

    def test_disjoint_texts(self, spark):
        got = _run(
            spark, [("d1", "d2")], [("d1", "aaaa"), ("d2", "bbbb")]
        )
        r = got[("d1", "d2")]
        assert r.token_jaccard == 0.0
        # levenshtein(aaaa, bbbb) = 4 over max length 4
        assert r.lev_sim == 0.0
        assert r.len_ratio == 1.0
        assert r.score == pytest.approx(0.2)
        assert r.tier == "non_match"

    def test_hand_computed_features(self, spark):
        # tokens: {quick, brown, fox} vs {quick, red, fox}:
        # jaccard 2/4; lev("quick brown fox","quick red fox") = 4 edits
        # over 15 chars; len 15 vs 13
        got = _run(
            spark,
            [("d1", "d2")],
            [("d1", "Quick Brown Fox"), ("d2", "quick red fox")],
        )
        r = got[("d1", "d2")]
        assert r.token_jaccard == 0.5
        assert r.lev_sim == pytest.approx(1 - 4 / 15, abs=1e-6)
        assert r.len_ratio == pytest.approx(13 / 15, abs=1e-6)
        expect = 0.5 * 0.5 + 0.3 * (1 - 4 / 15) + 0.2 * (13 / 15)
        assert r.score == pytest.approx(expect, abs=1e-6)
        assert r.tier == "possible"

    def test_prefix_cap_bounds_levenshtein(self, spark):
        """Texts identical in the first `prefix_len` chars get lev_sim 1
        regardless of how the tails diverge — the cap that keeps per-pair
        cost constant at 100 TB."""
        head = "x" * 80
        got = _run(
            spark,
            [("d1", "d2")],
            [("d1", head + " tail one"), ("d2", head + " something else")],
            prefix_len=80,
        )
        assert got[("d1", "d2")].lev_sim == 1.0

    def test_empty_text_guarded(self, spark):
        got = _run(spark, [("d1", "d2")], [("d1", ""), ("d2", "abc")])
        r = got[("d1", "d2")]
        assert r.tier == "non_match"
        assert 0.0 <= r.score <= 1.0

    def test_plan_is_jvm_only(self, spark):
        cand = spark.createDataFrame([("d1", "d2")], "a string, b string")
        rec = spark.createDataFrame(
            [("d1", "x"), ("d2", "y")], "doc_id string, text string"
        )
        plan = (
            MT.match_scores(cand, rec)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for bad in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
            assert bad not in plan


class TestEditDistancePairs:
    def test_blocking_and_distance_semantics(self, spark):
        from kernel_memory_spark.operators import matching as MT

        rows = [
            (1, "smith"), (2, "smyth"),      # same block 'smi'? no: smy
            (3, "smith"), (4, "smiths"),     # dist 1, same 3-prefix
            (5, "jones"), (6, "janes"),      # differ inside prefix
            (7, "jones"),
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        out = {
            (r.id_a, r.id_b): r.dist
            for r in MT.edit_distance_pairs(
                df, "id", "name", max_distance=1, block_len=3
            ).collect()
        }
        # (1,3) identical, (3,4) one insert, (1,4)/(3,4) via 'smi';
        # 'smyth' blocked apart from 'smith' (prefix smy != smi);
        # 'janes' blocked apart from 'jones' (jan != jon)
        assert out == {(1, 3): 0, (1, 4): 1, (3, 4): 1, (5, 7): 0}

    def test_len_band_and_hot_block_cap(self, spark):
        from kernel_memory_spark.operators import matching as MT

        rows = [(1, "aaa"), (2, "aaaaa"), (3, "aaa"), (4, "aaa")]
        df = spark.createDataFrame(rows, "id long, name string")
        out = MT.edit_distance_pairs(
            df, "id", "name", max_distance=2, block_len=2, len_band=1
        ).collect()
        # (1,2) length diff 2 > band, excluded even though lev = 2
        assert sorted((r.id_a, r.id_b) for r in out) == [
            (1, 3), (1, 4), (3, 4)
        ]
        capped = MT.edit_distance_pairs(
            df, "id", "name", max_distance=2, block_len=2,
            len_band=1, max_block=3,
        ).collect()
        # block 'aa' holds 4 records > cap -> dropped entirely
        assert capped == []
