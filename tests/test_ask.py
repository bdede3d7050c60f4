"""RAG ask-prompt assembly (km-v1 AskStreamingAsync + PreparePrompt)."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import ask as A
from kernel_memory_spark.operators import (
    embeddings as emb,
    extract as ext,
    partition as prt,
    save_records as sav,
)
from kernel_memory_spark.synth import synth_corpus


@pytest.fixture(scope="module")
def records(spark):
    corpus = synth_corpus(spark, 5)
    extracted = ext.extract(corpus)
    parts = prt.partition(extracted, max_tokens=60, overlap=0)
    vecs = emb.gen_embeddings(parts)
    return sav.build_records(parts, vecs, None, extracted, "e1"), vecs


class TestAskFacts:
    def test_facts_fit_budget_in_relevance_order(self, spark, records):
        recs, vecs = records
        qvec = [float(v) for v in vecs.first().vector]
        facts = A.ask_facts(
            recs, qvec, "what is in the corpus",
            max_prompt_tokens=1200, answer_tokens=300,
        ).collect()
        assert len(facts) >= 1
        rels = [f.relevance for f in facts]
        assert rels == sorted(rels, reverse=True)
        budget = 1200 - A._count_tokens_str(A.DEFAULT_ANSWER_PROMPT) \
            - A._count_tokens_str("what is in the corpus") - 300
        assert sum(f.token_count for f in facts) <= budget
        # fact strings follow the FactTemplate rendering
        assert facts[0].fact.startswith("==== [File:")
        assert facts[0].fact.endswith("\n")

    def test_duplicate_facts_skipped(self, spark, records):
        recs, vecs = records
        qvec = [float(v) for v in vecs.first().vector]
        dup = recs.withColumn("id", F.concat(F.col("id"), F.lit("-copy")))
        both = recs.unionByName(dup)
        facts = A.ask_facts(both, qvec, "q", max_prompt_tokens=100000)
        texts = [f.fact for f in facts.collect()]
        assert len(texts) == len(set(texts))  # no duplicate fact bodies

    def test_empty_partitions_skipped(self, spark, records):
        recs, vecs = records
        qvec = [float(v) for v in vecs.first().vector]
        blanked = recs.withColumn(
            "payload",
            F.when(
                F.col("doc_id") == "doc-000000000",
                F.col("payload").withField("text", F.lit("   ")),
            ).otherwise(F.col("payload")),
        )
        facts = A.ask_facts(blanked, qvec, "q", max_prompt_tokens=100000)
        assert facts.filter(F.col("doc_id") == "doc-000000000").count() == 0


class TestAskPrompt:
    def test_prompt_substitutions(self, spark, records):
        recs, vecs = records
        qvec = [float(v) for v in vecs.first().vector]
        row = A.ask_prompt(
            recs, qvec, "  what is this ", max_prompt_tokens=100000
        ).first()
        p = row.prompt
        assert "{{$facts}}" not in p and "{{$input}}" not in p \
            and "{{$notFound}}" not in p
        # question trimmed + '?' appended (AnswerGenerator.cs:127-128)
        assert "Question: what is this?\n" in p
        assert f"reply with '{A.DEFAULT_EMPTY_ANSWER}'" in p
        assert p.startswith("Facts:\n==== [File:")
        assert p.endswith("Answer: ")
        assert row.n_facts >= 1

    def test_no_facts_prompt_still_renders(self, spark, records):
        recs, vecs = records
        qvec = [float(v) for v in vecs.first().vector]
        row = A.ask_prompt(
            recs, qvec, "q", min_relevance=1.1  # nothing passes
        ).first()
        assert row.n_facts == 0
        assert row.prompt.startswith("Facts:\n\n======")
