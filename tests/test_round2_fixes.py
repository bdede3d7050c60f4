"""Regression tests for the round-2 ADVICE/VERDICT fixes:

- reserved-key collision in user tags merges values (TagCollection.CopyTo,
  TagCollection.cs:139-148) instead of raising DUPLICATED_MAP_KEY;
- tag keys containing ':'/'=' are dropped (TagCollection.ValidateKey,
  TagCollection.cs:180-198);
- unicode_trim strips non-ASCII whitespace (string.Trim parity);
- connected_components raises on non-convergence instead of returning
  silently-wrong labels;
- paginate and take_within_token_budget no longer funnel the full input
  through a single global-window task.
"""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark import schema as S
from kernel_memory_spark.functions.text import unicode_trim
from kernel_memory_spark.operators import canonicalize as czn
from kernel_memory_spark.operators import query as Q
from kernel_memory_spark.operators import save_records as sav
from kernel_memory_spark.operators import search_text as ST


class TestTagMerge:
    def test_reserved_key_collision_merges(self, spark):
        """A user tag reusing __document_id must merge, not throw."""
        from kernel_memory_spark.operators import (
            embeddings as emb,
            extract as ext,
            partition as prt,
        )
        from kernel_memory_spark.synth import synth_corpus

        corpus = synth_corpus(spark, 3)
        extracted = ext.extract(corpus)
        parts = prt.partition(extracted, max_tokens=60, overlap=0)
        vecs = emb.gen_embeddings(parts)
        tags = extracted.select(
            "doc_id",
            F.create_map(
                F.lit(S.TAG_DOCUMENT_ID), F.array(F.lit("user-override")),
                F.lit("ok"), F.array(F.lit("v")),
            ).alias("tags"),
        )
        rec = sav.build_records(parts, vecs, tags, extracted, "e1").first()
        # reserved value first, user value appended (CopyTo merge order)
        assert rec.tags[S.TAG_DOCUMENT_ID] == [rec.doc_id, "user-override"]
        assert rec.tags["ok"] == ["v"]

    def test_invalid_tag_keys_dropped(self, spark):
        df = spark.createDataFrame(
            [(1,)], "x int"
        ).select(
            sav.sanitize_user_tags(
                F.create_map(
                    F.lit("good"), F.array(F.lit("a")),
                    F.lit("bad:key"), F.array(F.lit("b")),
                    F.lit("bad=key"), F.array(F.lit("c")),
                )
            ).alias("tags")
        )
        tags = df.first().tags
        assert set(tags.keys()) == {"good"}


class TestUnicodeTrim:
    def test_non_ascii_whitespace(self, spark):
        df = spark.createDataFrame(
            [("   hello world 　",), ("  ascii  ",)], "s string"
        ).select(unicode_trim(F.col("s")).alias("t"))
        got = [r.t for r in df.collect()]
        assert got == ["hello world", "ascii"]
        # parity with Python .strip() (the pandas oracle's behavior)
        assert got[0] == "   hello world 　".strip()


class TestCCConvergence:
    def test_long_path_raises(self, spark):
        # path graph 0-1-2-...-9: diameter 9 > max_iter 3
        edges = spark.createDataFrame(
            [(f"{i:02d}", f"{i + 1:02d}") for i in range(9)], "a string, b string"
        )
        with pytest.raises(czn.NonConvergenceError):
            czn.connected_components(edges, max_iter=3)

    def test_non_strict_warns_and_returns(self, spark):
        edges = spark.createDataFrame(
            [(f"{i:02d}", f"{i + 1:02d}") for i in range(9)], "a string, b string"
        )
        labels = czn.connected_components(edges, max_iter=3, strict=False)
        assert labels.count() == 10

    def test_converged_path_ok(self, spark):
        edges = spark.createDataFrame(
            [(f"{i:02d}", f"{i + 1:02d}") for i in range(9)], "a string, b string"
        )
        labels = czn.connected_components(edges, max_iter=25)
        comps = {r.component for r in labels.collect()}
        assert comps == {"00"}


def _no_global_window_over_full_input(df) -> bool:
    """True when the plan pre-cuts with a limit before any empty-partition
    window: TakeOrderedAndProject (or a GlobalLimit) must appear BELOW the
    Window node, so the window never sees the full input."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Window" not in plan:
        return True
    win = plan.index("Window")
    below = plan[win:]
    return "TakeOrderedAndProject" in below or "GlobalLimit" in below


class TestScalablePlans:
    def test_paginate_pre_limits(self, spark):
        df = spark.range(10000).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        out = Q.paginate(df, [F.asc("id")], offset=100, limit=20)
        rows = [r.id for r in out.collect()]
        assert rows == list(range(100, 120))
        assert _no_global_window_over_full_input(out)

    def test_token_budget_pre_limits(self, spark):
        df = spark.range(10000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 100).alias("rank"),
            F.lit(10).alias("token_count"),
        )
        out = ST.take_within_token_budget(
            df, budget=200, order_by=[F.asc("rank"), F.asc("event_id")]
        )
        assert out.count() == 20  # 200 tokens / 10 per fact
        assert _no_global_window_over_full_input(out)

    def test_token_budget_matches_naive(self, spark):
        import random

        rnd = random.Random(7)
        rows = [(i, rnd.randint(1, 50)) for i in range(500)]
        df = spark.createDataFrame(rows, "event_id long, token_count long")
        got = sorted(
            r.event_id
            for r in ST.take_within_token_budget(
                df, budget=300, order_by=[F.asc("event_id")]
            ).collect()
        )
        cum, want = 0, []
        for i, tc in rows:
            cum += tc
            if cum > 300:
                break
            want.append(i)
        assert got == want
