"""Corpus-cleaning operators: PII scrub, decontamination, repetition."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import cleaning as CL


class TestPiiScrub:
    def test_redacts_typed_placeholders(self, spark):
        df = spark.createDataFrame(
            [("mail bob.smith+x@corp.example.org now",),
             ("call +1 (555) 010-7788 today",),
             ("host 192.168.0.17 port",),
             ("account 123456789012 ok",),
             ("clean text stays",)],
            "text string",
        )
        got = [r.text_scrubbed for r in CL.pii_scrub(df).collect()]
        assert got[0] == "mail [EMAIL] now"
        assert got[1] == "call [PHONE] today"
        assert got[2] == "host [IP] port"
        assert got[3] == "account [ID] ok"
        assert got[4] == "clean text stays"


class TestDecontaminate:
    def test_overlap_counts(self, spark):
        bench = spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog tonight",)],
            "text string",
        )
        docs = spark.createDataFrame(
            [("d1", "prefix the quick brown fox jumps over the lazy dog tonight suffix"),
             ("d2", "totally unrelated words here about spark and tables only"),
             ("d3", "the quick brown fox jumps over the lazy dog tonight")],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.n_overlaps
               for r in CL.decontaminate(docs, bench, n=8).collect()}
        assert "d2" not in got          # clean doc absent
        assert got["d3"] == 3           # 10 words -> 3 distinct 8-grams
        assert got["d1"] >= 3           # superset text contains them all

    def test_short_docs_no_grams(self, spark):
        bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
        docs = spark.createDataFrame(
            [("d1", "a b c")], "doc_id string, text string"
        )
        assert CL.decontaminate(docs, bench, n=8).count() == 0


class TestRepetitionStats:
    def test_duplicate_lines(self, spark):
        text = "repeat me\nunique line one\nrepeat me\nunique line two"
        df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
        row = CL.repetition_stats(df).first()
        assert row.dup_line_frac == pytest.approx(2 / 4)
        dup_chars = 2 * len("repeat me")
        total = dup_chars + len("unique line one") + len("unique line two")
        assert row.dup_line_char_frac == pytest.approx(dup_chars / total)

    def test_line_dedup_cross_doc(self, spark):
        df = spark.createDataFrame(
            [("a", "shared header\nalpha body\n\nshared footer"),
             ("b", "shared header\nbeta body\nshared footer"),
             ("c", "gamma only")],
            "doc_id string, text string",
        )
        got = {r.doc_id: r for r in CL.line_dedup(df).collect()}
        # doc a is first (doc_id asc) -> reconstructs byte-identically
        assert got["a"].text_clean == "shared header\nalpha body\n\nshared footer"
        assert got["a"].n_lines_dropped == 0
        assert got["a"].n_lines_kept == 3  # blank line not counted as kept
        # doc b loses both shared lines, keeps its own
        assert got["b"].text_clean == "beta body"
        assert got["b"].n_lines_dropped == 2
        assert got["b"].n_lines_kept == 1
        assert got["c"].text_clean == "gamma only"

    def test_line_dedup_within_doc_and_blanks(self, spark):
        # duplicate INSIDE one doc: later position dropped; blanks survive
        df = spark.createDataFrame(
            [("d", "x\n\nx\ny")], "doc_id string, text string"
        )
        row = CL.line_dedup(df).first()
        assert row.text_clean == "x\n\ny"
        assert row.n_lines_kept == 2
        assert row.n_lines_dropped == 1

    def test_line_dedup_all_dropped(self, spark):
        df = spark.createDataFrame(
            [("a", "only line"), ("b", "only line")],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.text_clean for r in CL.line_dedup(df).collect()}
        assert got["a"] == "only line"
        assert got["b"] == ""  # every line dropped -> empty, doc preserved

    def test_top_bigram_fraction(self, spark):
        # 'spark rocks' bigram dominates
        df = spark.createDataFrame(
            [("d1", "spark rocks spark rocks spark rocks extra word")],
            "doc_id string, text string",
        )
        row = CL.repetition_stats(df).first()
        assert row.top_bigram_char_frac > 0.3
        assert row.dup_line_frac == 0.0  # one line, not duplicated

class TestNgramNovelty:
    def test_fractions_match_reference(self, spark):
        from kernel_memory_spark.operators.cleaning import ngram_novelty

        rows = [
            ("d1", "alpha beta gamma delta"),       # grams: abg, bgd
            ("d2", "alpha beta gamma epsilon"),     # grams: abg, bge
            ("d3", "zeta eta theta iota"),          # grams: zet, eti
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            r.doc_id: (r.n_grams, r.n_novel, r.novel_frac)
            for r in ngram_novelty(df, n=3).collect()
        }
        # "alpha beta gamma" is shared by d1/d2 -> not novel
        assert got["d1"] == (2, 1, 0.5)
        assert got["d2"] == (2, 1, 0.5)
        assert got["d3"] == (2, 2, 1.0)

    def test_short_docs_have_no_grams(self, spark):
        from kernel_memory_spark.operators.cleaning import ngram_novelty

        df = spark.createDataFrame(
            [("s", "two words"), ("l", "one two three")],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.n_grams for r in ngram_novelty(df, n=3).collect()}
        assert got == {"l": 1}  # the 2-word doc emits no trigram row

    def test_duplicate_grams_within_doc_count_once(self, spark):
        from kernel_memory_spark.operators.cleaning import ngram_novelty

        df = spark.createDataFrame(
            [("r", "x y z x y z x y z")], "doc_id string, text string"
        )
        r = ngram_novelty(df, n=3).collect()[0]
        # 7 positional trigrams but only 3 distinct ("x y z","y z x","z x y")
        assert r.n_grams == 3 and r.novel_frac == 1.0


class TestGopherGates:
    def test_gate_semantics(self, spark):
        from kernel_memory_spark.operators import textstats as TS

        long_ok = "the quick brown fox jumps over the lazy dog " * 12
        rows = [
            (1, long_ok),                        # passes everything
            (2, "short text only"),              # fails word count
            (3, ("### " * 60) + "the a b"),      # symbol + alpha fails
            (4, "\n".join(["- item ok the"] * 60)),  # bullet frac fails
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in TS.gopher_gates(
                df, min_stopword_hits=1
            ).collect()
        }
        assert out[1].keep is True
        assert out[2].g_word_count is False and out[2].keep is False
        assert out[3].g_symbol_ratio is False
        assert out[3].g_alpha_words is False
        assert out[4].g_bullet_lines is False and out[4].keep is False

    def test_measurements_exact(self, spark):
        from kernel_memory_spark.operators import textstats as TS

        df = spark.createDataFrame(
            [(1, "aa bb... cc#dd\n- the end...")],
            "doc_id long, text string",
        )
        r = TS.gopher_gates(df).collect()[0]
        # words: aa bb... cc#dd - the end...  -> 7 words? split on \s+:
        # ['aa','bb...','cc#dd','-','the','end...'] = 6
        assert r.n_words == 6
        # chars minus whitespace = len('aabb...cc#dd-theend...') = 22
        assert r.mean_word_len == pytest.approx(22 / 6, abs=1e-4)
        assert r.stopword_hits == 1
        # 1 '#', 2 '...' occurrences -> (1 + 2) / 6
        assert r.symbol_ratio == pytest.approx(0.5, abs=1e-4)
        # 2 lines, second is a bullet AND ends with ellipsis
        assert r.bullet_line_frac == pytest.approx(0.5, abs=1e-4)
        assert r.ellipsis_line_frac == pytest.approx(0.5, abs=1e-4)


class TestWinnowFingerprints:
    def test_shared_substring_guarantee_and_density(self, spark):
        from kernel_memory_spark.operators import textstats as TS

        # docs share a long substring; winnowing guarantees a shared
        # fingerprint for any common run >= k + w - 1 = 8 chars
        common = "identicalsharedblockoftext"
        rows = [
            (1, "prefix one " + common + " tail alpha"),
            (2, "another beginning " + common + " ending"),
            (3, "completely different content here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = TS.winnow_fingerprints(df, k=5, w=4).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, set()).add(r.gram_hash)
        assert by_doc[1] & by_doc[2]          # shared block detected
        assert not (by_doc[1] & by_doc[2] & by_doc[3])
        # density: roughly 2/(w+1) of gram positions selected
        n_grams = len("".join(
            ch for ch in rows[0][1].lower() if ch.isalnum()
        )) - 5 + 1
        assert len([r for r in out if r.doc_id == 1]) < n_grams

    def test_positions_are_rightmost_minima(self, spark):
        from kernel_memory_spark.operators import textstats as TS

        df = spark.createDataFrame(
            [(1, "abcdefghij")], "doc_id long, text string"
        )
        out = TS.winnow_fingerprints(df, k=3, w=2).collect()
        # every selected pos must be a valid gram start (0-based)
        n = len("abcdefghij") - 3 + 1
        assert all(0 <= r.pos < n for r in out)
        # dedup: no repeated (pos, hash)
        assert len(out) == len({(r.pos, r.gram_hash) for r in out})


class TestHashingTfSparse:
    def test_inner_product_preserved_and_unit_norm(self, spark):
        from kernel_memory_spark.operators import embeddings as EM

        rows = [
            (1, "apple banana apple"),
            (2, "apple banana apple"),      # identical -> cosine 1
            (3, "totally different words"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = EM.hashing_tf_sparse(df, dim=32).collect()
        vecs = {}
        for r in out:
            vecs.setdefault(r.doc_id, {})[r.pos] = r.val
        # unit norm per doc
        for d, v in vecs.items():
            assert sum(x * x for x in v.values()) == pytest.approx(1.0)
        dot12 = sum(
            vecs[1][p] * vecs[2].get(p, 0.0) for p in vecs[1]
        )
        assert dot12 == pytest.approx(1.0)
        dot13 = sum(
            vecs[1][p] * vecs[3].get(p, 0.0) for p in vecs[1]
        )
        assert abs(dot13) < 1.0  # different docs, not identical

    def test_unsigned_counts_and_no_normalize(self, spark):
        from kernel_memory_spark.operators import embeddings as EM

        df = spark.createDataFrame(
            [(1, "x x y")], "doc_id long, text string"
        )
        out = EM.hashing_tf_sparse(
            df, dim=1024, signed=False, l2_normalize=False
        ).collect()
        # dim large enough that x and y almost surely don't collide:
        # raw term frequencies survive
        assert sorted(r.val for r in out) == [1.0, 2.0]
