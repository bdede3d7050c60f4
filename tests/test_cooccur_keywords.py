"""PMI co-occurrence edges (operators/cooccur.py), neighborhood feature
aggregation (graph.neighbor_mean), TF-IDF keywords (operators/keywords.py),
per-source quota caps (sampling.quota_cap): exact small-graph values +
layout independence."""

import math

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import cooccur as CO
from kernel_memory_spark.operators import graph as GR
from kernel_memory_spark.operators import keywords as KW
from kernel_memory_spark.operators import sampling as SMP


class TestPmiEdges:
    def _baskets(self, spark):
        # b1:{a,b}, b2:{a,b}, b3:{a,c}, b4:{b,c,d}  (a dup in b1 on purpose)
        rows = [
            (1, "a"), (1, "b"), (1, "a"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"), (4, "c"), (4, "d"),
        ]
        return spark.createDataFrame(rows, "b long, i string")

    def test_exact_pmi_values(self, spark):
        out = {
            (r.src, r.dst): (r.n_pairs, r.pmi)
            for r in CO.pmi_edges(self._baskets(spark), "b", "i").collect()
        }
        # N=4; n_a=3, n_b=3, n_c=2, n_d=1
        # (a,b): 2 -> ln(2*4/(3*3)); (a,c): 1 -> ln(1*4/(3*2)); etc.
        exp = {
            ("a", "b"): (2, math.log(8 / 9)),
            ("a", "c"): (1, math.log(4 / 6)),
            ("b", "c"): (1, math.log(4 / 6)),
            ("b", "d"): (1, math.log(4 / 3)),
            ("c", "d"): (1, math.log(4 / 2)),
        }
        assert set(out) == set(exp)
        for k, (n, pmi) in exp.items():
            assert out[k][0] == n
            assert out[k][1] == pytest.approx(pmi, abs=1e-12)

    def test_min_pairs_prunes(self, spark):
        out = CO.pmi_edges(self._baskets(spark), "b", "i", min_pairs=2)
        assert [(r.src, r.dst) for r in out.collect()] == [("a", "b")]

    def test_max_basket_guard(self, spark):
        # basket 4 has 3 distinct items -> dropped entirely at max_basket=2
        out = {
            (r.src, r.dst)
            for r in CO.pmi_edges(
                self._baskets(spark), "b", "i", max_basket=2
            ).collect()
        }
        assert out == {("a", "b"), ("a", "c")}

    def test_layout_independent(self, spark):
        df = self._baskets(spark)
        a = sorted(map(tuple, CO.pmi_edges(df, "b", "i").collect()))
        b = sorted(
            map(tuple, CO.pmi_edges(df.repartition(7), "b", "i").collect())
        )
        assert [(s, d, n) for s, d, n, _ in a] == [
            (s, d, n) for s, d, n, _ in b
        ]
        for (_, _, _, pa), (_, _, _, pb) in zip(a, b):
            assert pa == pytest.approx(pb, abs=1e-12)


class TestNeighborMean:
    def test_exact_means(self, spark):
        feats = spark.createDataFrame(
            [(1, [1.0, 10.0]), (2, [3.0, 30.0]), (3, [5.0, 50.0])],
            "id long, vec array<double>",
        )
        # star: 1-2, 1-3 (undirected)
        edges = GR.symmetrize(
            spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
        )
        out = {
            (r.node, r.pos): r.mean_val
            for r in GR.neighbor_mean(edges, feats, "id", "vec").collect()
        }
        assert out[(1, 0)] == pytest.approx(4.0)   # mean(3, 5)
        assert out[(1, 1)] == pytest.approx(40.0)
        assert out[(2, 0)] == pytest.approx(1.0)   # only neighbor is 1
        assert out[(3, 1)] == pytest.approx(10.0)

    def test_hub_is_aggregated_not_collected(self, spark):
        # 200-neighbor hub: mean of 0..199 = 99.5 per dim
        feats = spark.createDataFrame(
            [(i, [float(i)]) for i in range(200)] + [(999, [0.0])],
            "id long, vec array<double>",
        )
        edges = spark.createDataFrame(
            [(i, 999) for i in range(200)], "src long, dst long"
        )
        out = GR.neighbor_mean(edges, feats, "id", "vec").collect()
        hub = [r for r in out if r.node == 999]
        assert len(hub) == 1 and hub[0].mean_val == pytest.approx(99.5)


class TestTfidfTopTerms:
    def test_exact_scores_and_ranking(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple banana shared"),
                (2, "banana cherry shared"),
                (3, "cherry cherry cherry shared"),
            ],
            "doc_id long, text string",
        )
        out = KW.tfidf_top_terms(docs, "doc_id", "text", k=2)
        rows = {(r.id, r.rn): (r.term, r.tf, r.score) for r in out.collect()}
        idf2 = math.log(4 / 3) + 1  # df=2 terms (apple df=1!)
        idf1 = math.log(4 / 2) + 1  # df=1
        idf3 = math.log(4 / 4) + 1  # shared, df=3
        # doc1: apple tf=2 idf1, banana tf=1 idf2, shared tf=1 idf3
        assert rows[(1, 1)][0] == "apple"
        assert rows[(1, 1)][2] == pytest.approx(round(2 * idf1, 6))
        assert rows[(1, 2)][0] == "banana"
        assert rows[(1, 2)][2] == pytest.approx(round(1 * idf2, 6))
        # doc3: cherry tf=3 dominates, then shared
        assert rows[(3, 1)][0] == "cherry"
        assert rows[(3, 2)][0] == "shared"
        assert rows[(3, 2)][2] == pytest.approx(round(idf3, 6))

    def test_tie_breaks_on_term(self, spark):
        docs = spark.createDataFrame(
            [(1, "zed abc")], "doc_id long, text string"
        )
        out = KW.tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
        ranked = sorted(out, key=lambda r: r.rn)
        assert [r.term for r in ranked] == ["abc", "zed"]

    def test_min_len_and_case_fold(self, spark):
        docs = spark.createDataFrame(
            [(1, "Go BIG or go home, go!")], "doc_id long, text string"
        )
        out = KW.tfidf_top_terms(docs, "doc_id", "text", k=10).collect()
        terms = {r.term for r in out}
        assert terms == {"big", "home"}  # 'go'/'or' < 3 chars dropped


class TestQuotaCap:
    def _docs(self, spark):
        rows = [(i, "big") for i in range(40)] + [
            (100 + i, "small") for i in range(5)
        ]
        return spark.createDataFrame(rows, "doc_id long, src string")

    def test_cap_engages_only_over_quota(self, spark):
        out = SMP.quota_cap(self._docs(spark), "src", "doc_id", 10)
        kept = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
        assert kept == {"big": 10, "small": 5}

    def test_deterministic_and_layout_independent(self, spark):
        df = self._docs(spark)
        a = sorted(
            r.doc_id
            for r in SMP.quota_cap(df, "src", "doc_id", 10).collect()
        )
        b = sorted(
            r.doc_id
            for r in SMP.quota_cap(
                df.repartition(13), "src", "doc_id", 10
            ).collect()
        )
        assert a == b

    def test_growth_stability(self, spark):
        """Adding rows only displaces from the hash boundary: the kept set
        of the grown corpus restricted to old rows loses at most
        (new kept among old) - i.e. old survivors with smaller hash keep
        their place."""
        df = self._docs(spark)
        before = {
            r.doc_id
            for r in SMP.quota_cap(df, "src", "doc_id", 10).collect()
        }
        grown = df.unionByName(
            spark.createDataFrame(
                [(1000 + i, "big") for i in range(10)],
                "doc_id long, src string",
            )
        )
        after = {
            r.doc_id
            for r in SMP.quota_cap(grown, "src", "doc_id", 10).collect()
        }
        # old rows that survive the grown cap were all kept before
        assert {d for d in after if d < 1000} <= before


class TestCollapseDuplicates:
    def test_transitive_closure_and_singletons(self, spark):
        from kernel_memory_spark.operators import dedup as DD

        docs = spark.createDataFrame(
            [(i, "t") for i in (1, 2, 3, 7, 8, 9)], "doc_id long, text string"
        )
        # chain 1~2, 2~3 (1 and 3 never paired directly); isolated pair 7~8
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "dup_a long, dup_b long"
        )
        out = {
            r.id: (r.canonical_id, r.cluster_size, r.is_kept)
            for r in DD.collapse_duplicates(docs, pairs).collect()
        }
        assert out[1] == (1, 3, True)
        assert out[2] == (1, 3, False)
        assert out[3] == (1, 3, False)
        assert out[7] == (7, 2, True)
        assert out[8] == (7, 2, False)
        assert out[9] == (9, 1, True)  # singleton, no edge materialized

    def test_kept_set_is_one_per_cluster(self, spark):
        from kernel_memory_spark.operators import dedup as DD

        docs = spark.createDataFrame(
            [(i, "t") for i in range(20)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 10) for i in range(10)], "dup_a long, dup_b long"
        )
        out = DD.collapse_duplicates(docs, pairs)
        kept = out.filter("is_kept").count()
        clusters = out.select("canonical_id").distinct().count()
        assert kept == clusters == 10


class TestProfileTable:
    def test_one_pass_profile(self, spark):
        from kernel_memory_spark.operators import profile as PR

        df = spark.createDataFrame(
            [(9, "a"), (10, "b"), (2, None), (9, "a")],
            "n long, s string",
        )
        out = {
            r.col_name: (r.n_nulls, r.n_distinct, r.min_val, r.max_val)
            for r in PR.profile_table(df).collect()
        }
        # numeric min/max computed BEFORE the string cast: min 2, max 10
        assert out["n"] == (0, 3, "2", "10")
        assert out["s"] == (1, 2, "a", "b")

    def test_approx_mode_runs(self, spark):
        from kernel_memory_spark.operators import profile as PR

        df = spark.createDataFrame([(i,) for i in range(500)], "n long")
        row = {
            r.col_name: r.n_distinct
            for r in PR.profile_table(df, exact_distinct=False).collect()
        }
        assert abs(row["n"] - 500) / 500 < 0.1


class TestUnigramLm:
    def test_exact_logprobs(self, spark):
        import math

        from kernel_memory_spark.operators import lm as LM

        docs = spark.createDataFrame(
            [(1, "aa aa bb"), (2, "aa cc")], "doc_id long, text string"
        )
        # counts: aa=3, bb=1, cc=1; T=5, V=3, denom=8
        out = {
            r.id: (r.n_tokens, r.avg_logp)
            for r in LM.unigram_logprob_scores(docs).collect()
        }
        lp = {t: math.log((c + 1) / 8.0) for t, c in
              {"aa": 3, "bb": 1, "cc": 1}.items()}
        assert out[1][0] == 3
        assert out[1][1] == pytest.approx(
            (2 * lp["aa"] + lp["bb"]) / 3, abs=1e-12
        )
        assert out[2][1] == pytest.approx(
            (lp["aa"] + lp["cc"]) / 2, abs=1e-12
        )

    def test_oov_scored_with_floor(self, spark):
        import math

        from kernel_memory_spark.operators import lm as LM

        train = spark.createDataFrame(
            [(1, "aa aa bb")], "doc_id long, text string"
        )
        lm, oov = LM.train_unigram_lm(train)
        # T=3, V=2 -> denom=5; OOV logp = ln(1/5)
        assert oov == pytest.approx(math.log(1 / 5.0), abs=1e-12)
        score = spark.createDataFrame(
            [(9, "zz aa")], "doc_id long, text string"
        )
        out = LM.unigram_logprob_scores(score, lm, oov).collect()[0]
        # zz OOV -> ln(1/5); aa count=2 -> ln((2+1)/5)
        assert out.avg_logp == pytest.approx(
            (math.log(1 / 5.0) + math.log(3 / 5.0)) / 2, abs=1e-12
        )
        # gibberish scores strictly below in-vocab prose
        prose = LM.unigram_logprob_scores(
            spark.createDataFrame([(8, "aa aa")], "doc_id long, text string"),
            lm, oov,
        ).collect()[0]
        assert out.avg_logp < prose.avg_logp


class TestInt8Quantization:
    def test_roundtrip_error_bounded(self, spark):
        from kernel_memory_spark.functions import quant as Q

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25, 0.0]), (2, [100.0, -50.0, 1.0, 0.3])],
            "id long, vec array<double>",
        )
        qs = df.select(
            "id", "vec", Q.quantize_int8_expr("vec").alias("qs")
        )
        rec = qs.select(
            "id", "vec",
            Q.dequantize_expr(F.col("qs.q"), F.col("qs.scale")).alias("r"),
            F.col("qs.scale").alias("s"),
            F.col("qs.q").alias("q"),
        ).collect()
        for row in rec:
            assert all(abs(v) <= 127 for v in row.q)
            for v, r in zip(row.vec, row.r):
                assert abs(v - r) <= row.s / 2 + 1e-12
            # the max-|v| component maps to exactly +/-127
            assert max(abs(x) for x in row.q) == 127

    def test_zero_vector_guard(self, spark):
        from kernel_memory_spark.functions import quant as Q

        df = spark.createDataFrame([(1, [0.0, 0.0])], "id long, vec array<double>")
        row = df.select(Q.quantize_int8_expr("vec").alias("qs")).collect()[0]
        assert row.qs.scale == 0.0 and list(row.qs.q) == [0, 0]


class TestBoilerplateNgrams:
    def test_cross_doc_df_with_set_semantics(self, spark):
        from kernel_memory_spark.operators import cleaning as CL

        footer = "all rights reserved by example corp"
        docs = spark.createDataFrame(
            [
                (1, "unique one. " + footer),
                (2, "unique two! " + footer + " " + footer),  # twice in doc2
                (3, "unique three? " + footer),
                (4, "nothing shared here at all today"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.gram: r.df
            for r in CL.boilerplate_ngrams(docs, n=6, min_df=3).collect()
        }
        assert out.get("all rights reserved by example corp") == 3
        # doc-4-only gram never reaches min_df
        assert "nothing shared here at all today" not in out


class TestIncrementalCooccurIndex:
    def test_incremental_matches_full_rebuild(self, spark, tmp_catalog_root):
        from kernel_memory_spark.operators import cooccur as CO
        from kernel_memory_spark.sources.tables import TableCatalog

        rows1 = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
        rows2 = [(3, "a"), (3, "b"), (4, "b"), (4, "c"), (4, "d")]
        b1 = spark.createDataFrame(rows1, "b long, i string")
        b2 = spark.createDataFrame(rows2, "b long, i string")
        full = spark.createDataFrame(rows1 + rows2, "b long, i string")

        cat = TableCatalog(tmp_catalog_root)
        CO.upsert_cooccur_index(spark, cat, "cx", b1, "b", "i", n_buckets=4)
        CO.upsert_cooccur_index(spark, cat, "cx", b2, "b", "i", n_buckets=4)

        inc = {
            (r.src, r.dst): (r.n_pairs, r.pmi)
            for r in CO.pmi_from_index(spark, cat, "cx").collect()
        }
        ref = {
            (r.src, r.dst): (r.n_pairs, r.pmi)
            for r in CO.pmi_edges(full, "b", "i").collect()
        }
        assert set(inc) == set(ref)
        for k in ref:
            assert inc[k][0] == ref[k][0], k
            assert inc[k][1] == pytest.approx(ref[k][1], abs=1e-12), k

    def test_counts_accumulate_across_batches(self, spark, tmp_catalog_root):
        from kernel_memory_spark.operators import cooccur as CO
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(tmp_catalog_root)
        batch = spark.createDataFrame(
            [(1, "a"), (1, "b")], "b long, i string"
        )
        CO.upsert_cooccur_index(spark, cat, "cy", batch, "b", "i")
        batch2 = spark.createDataFrame(
            [(2, "a"), (2, "b")], "b long, i string"
        )
        CO.upsert_cooccur_index(spark, cat, "cy", batch2, "b", "i")
        pairs = cat.read(spark, "cy__pairs").collect()
        assert {(r.src, r.dst, r.n_pairs) for r in pairs} == {("a", "b", 2)}
        stats = cat.read(spark, "cy__stats").collect()[0]
        assert stats.n_baskets == 2

    def test_replace_redelivered_basket_matches_rebuild(
        self, spark, tmp_catalog_root
    ):
        """Re-deliver basket 1 with a CHANGED item set under replace=True:
        the index must converge to a full rebuild over the final corpus
        (old contribution subtracted, new one added)."""
        from kernel_memory_spark.operators import cooccur as CO
        from kernel_memory_spark.sources.tables import TableCatalog

        rows1 = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "c")]
        rows1_v2 = [(1, "a"), (1, "d")]  # basket 1 shrinks and shifts
        rows2 = [(3, "a"), (3, "b"), (4, "b"), (4, "d")]

        cat = TableCatalog(tmp_catalog_root)
        for batch, rep in (
            (rows1, False),
            (rows2, False),
            (rows1_v2, True),
        ):
            CO.upsert_cooccur_index(
                spark, cat, "cz",
                spark.createDataFrame(batch, "b long, i string"),
                "b", "i", n_buckets=4, replace=rep,
            )
        # final corpus: basket 1 replaced by v2, basket 2 (from batch 1)
        # untouched, baskets 3-4 from batch 2
        final = spark.createDataFrame(
            rows1_v2 + [(2, "a"), (2, "c")] + rows2, "b long, i string"
        )
        inc = {
            (r.src, r.dst): (r.n_pairs, r.pmi)
            for r in CO.pmi_from_index(spark, cat, "cz").collect()
        }
        ref = {
            (r.src, r.dst): (r.n_pairs, r.pmi)
            for r in CO.pmi_edges(final, "b", "i").collect()
        }
        assert set(inc) == set(ref)
        for k in ref:
            assert inc[k][0] == ref[k][0], k
            assert inc[k][1] == pytest.approx(ref[k][1], abs=1e-12), k
        stats = cat.read(spark, "cz__stats").collect()[0]
        assert stats.n_baskets == 4

    def test_replace_identical_redelivery_is_idempotent(
        self, spark, tmp_catalog_root
    ):
        from kernel_memory_spark.operators import cooccur as CO
        from kernel_memory_spark.sources.tables import TableCatalog

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
        cat = TableCatalog(tmp_catalog_root)
        df = spark.createDataFrame(rows, "b long, i string")
        CO.upsert_cooccur_index(spark, cat, "cw", df, "b", "i")
        before = {
            (r.src, r.dst, r.n_pairs, r.pmi)
            for r in CO.pmi_from_index(spark, cat, "cw").collect()
        }
        # re-deliver the SAME batch twice with replace=True: no drift
        for _ in range(2):
            CO.upsert_cooccur_index(
                spark, cat, "cw", df, "b", "i", replace=True
            )
        after = {
            (r.src, r.dst, r.n_pairs, r.pmi)
            for r in CO.pmi_from_index(spark, cat, "cw").collect()
        }
        assert after == before
        assert cat.read(spark, "cw__stats").collect()[0].n_baskets == 2

    def test_replace_tombstones_invisible(self, spark, tmp_catalog_root):
        """A pair whose count drops to zero disappears from pmi_from_index
        even though a tombstone row may remain in the counts table."""
        from kernel_memory_spark.operators import cooccur as CO
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(tmp_catalog_root)
        CO.upsert_cooccur_index(
            spark, cat, "cv",
            spark.createDataFrame([(1, "a"), (1, "b")], "b long, i string"),
            "b", "i",
        )
        assert {(r.src, r.dst) for r in
                CO.pmi_from_index(spark, cat, "cv").collect()} == {("a", "b")}
        CO.upsert_cooccur_index(
            spark, cat, "cv",
            spark.createDataFrame([(1, "a")], "b long, i string"),
            "b", "i", replace=True,
        )
        assert CO.pmi_from_index(spark, cat, "cv").count() == 0
        pair_rows = cat.read(spark, "cv__pairs").collect()
        assert all(r.n_pairs == 0 for r in pair_rows)


class TestBigramLm:
    def test_matches_reference_model(self, spark):
        """Spark scores equal a driver-side add-one bigram LM computed
        from the same corpus (ln((c12+1)/(c1+V)), V = unigram vocab)."""
        import math
        from collections import Counter

        from kernel_memory_spark.operators.lm import bigram_logprob_scores

        texts = {
            "d1": "the cat sat on the mat",
            "d2": "the cat ate the fish",
            "d3": "mat the on sat cat the",  # shuffled d1
        }
        df = spark.createDataFrame(
            list(texts.items()), "doc_id string, text string"
        )
        toks = {d: t.split() for d, t in texts.items()}
        c1 = Counter(w for ws in toks.values() for w in ws)
        c12 = Counter(
            (ws[i], ws[i + 1])
            for ws in toks.values()
            for i in range(len(ws) - 1)
        )
        v = len(c1)
        ref = {}
        for d, ws in toks.items():
            lps = [
                math.log((c12[(ws[i], ws[i + 1])] + 1.0) / (c1[ws[i]] + v))
                for i in range(len(ws) - 1)
            ]
            ref[d] = (len(lps), sum(lps) / len(lps))
        got = {
            r.id: (r.n_bigrams, r.avg_logp)
            for r in bigram_logprob_scores(df).collect()
        }
        assert got.keys() == ref.keys()
        for d in ref:
            assert got[d][0] == ref[d][0]
            assert got[d][1] == pytest.approx(ref[d][1], abs=1e-12)

    def test_order_sensitivity(self, spark):
        """A document with the same unigram bag but shuffled order scores
        strictly lower than the original (the reason bigram beats
        unigram for quality filtering)."""
        from kernel_memory_spark.operators.lm import bigram_logprob_scores

        df = spark.createDataFrame(
            [
                ("orig1", "the cat sat on the mat"),
                ("orig2", "the cat sat on the mat"),
                ("shuf", "mat on the sat cat the"),
            ],
            "doc_id string, text string",
        )
        got = {
            r.id: r.avg_logp for r in bigram_logprob_scores(df).collect()
        }
        assert got["shuf"] < got["orig1"]

    def test_short_docs_omitted_and_punct_split(self, spark):
        """<2 tokens -> no transitions -> no row; non-letters split
        tokens exactly like the unigram tokenizer."""
        from kernel_memory_spark.operators.lm import bigram_logprob_scores

        df = spark.createDataFrame(
            [("one", "hello"), ("two", "a-b"), ("empty", "123 !?")],
            "doc_id string, text string",
        )
        got = {r.id: r.n_bigrams for r in bigram_logprob_scores(df).collect()}
        assert got == {"two": 1}  # "a-b" -> (a, b)


class TestHotKeys:
    def test_top_k_share_and_rank(self, spark):
        from kernel_memory_spark.operators.profile import hot_keys

        rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
        df = spark.createDataFrame(rows, "k string")
        got = [
            (r.key, r.cnt, r.share, r.rank)
            for r in hot_keys(df, "k", k=3)
            .orderBy("rank")
            .collect()
        ]
        # b before c: count tie broken by key ascending
        assert got == [
            ("a", 5, round(5 / 12, 6), 1),
            ("b", 3, 0.25, 2),
            ("c", 3, 0.25, 3),
        ]

    def test_k_larger_than_cardinality(self, spark):
        from kernel_memory_spark.operators.profile import hot_keys

        df = spark.createDataFrame([("x",), ("y",)], "k string")
        assert hot_keys(df, "k", k=10).count() == 2


class TestAssociationRules:
    def _baskets(self, spark):
        # b1:{a,b}, b2:{a,b}, b3:{a,c}, b4:{b,c,d}
        rows = [
            (1, "a"), (1, "b"), (1, "a"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"), (4, "c"), (4, "d"),
        ]
        return spark.createDataFrame(rows, "b long, i string")

    def test_exact_rule_values(self, spark):
        out = {
            (r.antecedent, r.consequent): r
            for r in CO.association_rules(
                self._baskets(spark), "b", "i", min_pair_count=1
            ).collect()
        }
        # N=4; n_a=3, n_b=3, n_c=2, n_d=1; n_ab=2, others 1
        # both directions of every unordered pair
        assert len(out) == 10
        r = out[("a", "b")]
        assert r.n_both == 2
        assert r.support == pytest.approx(0.5)
        assert r.confidence == pytest.approx(2 / 3)
        assert r.lift == pytest.approx(2 * 4 / (3 * 3))
        r = out[("b", "a")]  # same lift, different confidence base
        assert r.confidence == pytest.approx(2 / 3)
        assert r.lift == pytest.approx(2 * 4 / (3 * 3))
        r = out[("d", "c")]
        assert r.confidence == pytest.approx(1.0)
        assert r.lift == pytest.approx(1 * 4 / (1 * 2))

    def test_min_pair_count_and_guard(self, spark):
        out = CO.association_rules(
            self._baskets(spark), "b", "i", min_pair_count=2
        ).collect()
        assert sorted((r.antecedent, r.consequent) for r in out) == [
            ("a", "b"), ("b", "a")
        ]
        # mega-basket guard drops b4 (3 distinct items > 2)
        capped = CO.association_rules(
            self._baskets(spark), "b", "i", min_pair_count=1, max_basket=2
        ).collect()
        pairs = {(r.antecedent, r.consequent) for r in capped}
        assert ("c", "d") not in pairs and ("b", "d") not in pairs


class TestFrequentTriples:
    def _baskets(self, spark):
        # {a,b,c} x3, {a,b,d} x2, {x,y,z} x1
        rows = []
        for b, items in enumerate(
            [("a", "b", "c")] * 3 + [("a", "b", "d")] * 2
            + [("x", "y", "z")]
        ):
            rows += [(b, i) for i in items]
        return spark.createDataFrame(rows, "b long, i string")

    def test_exact_supports(self, spark):
        out = {
            (r.i1, r.i2, r.i3): r.support
            for r in CO.frequent_triples(
                self._baskets(spark), "b", "i", min_support=2
            ).collect()
        }
        assert out == {("a", "b", "c"): 3, ("a", "b", "d"): 2}

    def test_prune_is_result_invariant(self, spark):
        # the naive unpruned three-way join must agree with the
        # Apriori-pruned operator (anti-monotonicity)
        df = self._baskets(spark)
        items = df.distinct()
        a = items.select("b", F.col("i").alias("i1"))
        c = items.select("b", F.col("i").alias("i2"))
        d = items.select("b", F.col("i").alias("i3"))
        naive = (
            a.join(c, "b").filter(F.col("i1") < F.col("i2"))
            .join(d, "b").filter(F.col("i2") < F.col("i3"))
            .groupBy("i1", "i2", "i3").count()
            .filter(F.col("count") >= 2)
        )
        nv = {
            (r.i1, r.i2, r.i3): r["count"] for r in naive.collect()
        }
        pr = {
            (r.i1, r.i2, r.i3): r.support
            for r in CO.frequent_triples(
                df, "b", "i", min_support=2
            ).collect()
        }
        assert pr == nv


class TestRulesFromIndex:
    def test_index_rules_match_one_shot(self, spark, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        rows = [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"), (4, "c"), (4, "d"),
        ]
        df = spark.createDataFrame(rows, "b long, i string")
        cat = TableCatalog(str(tmp_path / "idx"))
        CO.upsert_cooccur_index(
            spark, cat, "t", df.filter(F.col("b") <= 2), "b", "i"
        )
        CO.upsert_cooccur_index(
            spark, cat, "t", df.filter(F.col("b") > 2), "b", "i"
        )
        got = sorted(
            map(tuple,
                CO.rules_from_index(
                    spark, cat, "t", min_pair_count=1
                ).collect())
        )
        exp = sorted(
            map(tuple,
                CO.association_rules(
                    df, "b", "i", min_pair_count=1
                ).collect())
        )
        assert got == exp
