"""Retrieval-quality metrics (operators/ranking.py): hand-computed
NDCG/MRR/P@k values, no-relevant edge case, deterministic tie-breaks."""

import math

import pytest

from kernel_memory_spark.operators import ranking as RK


def _metrics(spark, rows, k):
    df = spark.createDataFrame(
        rows, "g string, id long, score double, rel int"
    )
    out = RK.ranking_metrics(df, "g", "score", "rel", "id", k=k)
    return {r.g: r for r in out.collect()}


class TestRankingMetrics:
    def test_hand_computed_group(self, spark):
        rows = [
            ("q", 1, 5.0, 0),
            ("q", 2, 4.0, 2),
            ("q", 3, 3.0, 1),
            ("q", 4, 2.0, 0),
        ]
        r = _metrics(spark, rows, k=2)["q"]
        dcg = 3.0 / math.log2(3.0)          # rel-2 item at run pos 2
        idcg = 3.0 / 1.0 + 1.0 / math.log2(3.0)
        assert r.n_items == 4
        assert r.ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-12)
        assert r.mrr == pytest.approx(0.5)
        assert r.precision_at_k == pytest.approx(0.5)

    def test_perfect_and_empty_groups(self, spark):
        rows = [
            # perfect ranking: rel desc == score desc
            ("p", 1, 3.0, 2), ("p", 2, 2.0, 1), ("p", 3, 1.0, 0),
            # no relevant item at all
            ("z", 4, 9.0, 0), ("z", 5, 8.0, 0),
        ]
        out = _metrics(spark, rows, k=3)
        assert out["p"].ndcg_at_k == pytest.approx(1.0)
        assert out["p"].mrr == pytest.approx(1.0)
        assert out["z"].ndcg_at_k == 0.0
        assert out["z"].mrr == 0.0
        assert out["z"].precision_at_k == 0.0

    def test_tie_broken_by_id(self, spark):
        # equal scores: id ASC wins, so the relevant item (higher id)
        # lands at position 2 -> mrr = 1/2, not 1
        rows = [("t", 1, 5.0, 0), ("t", 2, 5.0, 1)]
        r = _metrics(spark, rows, k=1)["t"]
        assert r.mrr == pytest.approx(0.5)
        assert r.precision_at_k == 0.0
        # ndcg@1: run top-1 has gain 0; ideal top-1 has gain 1 -> 0
        assert r.ndcg_at_k == 0.0
