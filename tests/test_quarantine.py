"""Quarantine / poison-row routing (ReturnType.FatalError analog, Q5):
fatal rows land in the quarantine table with step/reason, the pipeline
completes over the clean rows."""

from pyspark.sql import functions as F

from kernel_memory_spark.operators import quarantine as qtn
from kernel_memory_spark.sources.tables import TableCatalog
from kernel_memory_spark.streaming.pipeline import Pipeline, PipelineConfig
from kernel_memory_spark.synth import synth_corpus, synth_doc_tags


def tags_with_poison(spark, n_docs):
    """Doc tags where doc 0 and doc 1 carry keys that TagCollection.
    ValidateKey rejects (':' / '=')."""
    tags = synth_doc_tags(spark, n_docs)
    poisoned = F.when(
        F.col("doc_id").isin("doc-000000000", "doc-000000001"),
        F.map_concat(
            F.col("tags"),
            F.create_map(F.lit("bad:key"), F.array(F.lit("v"))),
        ),
    ).otherwise(F.col("tags"))
    return tags.withColumn("tags", poisoned)


class TestTagKeyQuarantine:
    def test_invalid_keys_quarantined_and_pipeline_completes(self, spark, tmp_path):
        n = 6
        cat = TableCatalog(str(tmp_path))
        pipe = Pipeline(spark, cat, PipelineConfig(execution_id="qx"))
        metrics = pipe.run(synth_corpus(spark, n), tags_with_poison(spark, n))

        # pipeline completed every stage
        assert "materialize" in metrics

        q = cat.read(spark, qtn.QUARANTINE_TABLE).collect()
        assert {r.key for r in q} == {"doc-000000000", "doc-000000001"}
        for r in q:
            assert r.step == "save_records"
            assert r.reason == "invalid_tag_key"
            assert r.execution_id == "qx"
            assert "bad:key" in r.detail

        # poisoned docs keep their records (reserved tags intact) but have
        # no user tags; clean docs keep user tags
        recs = cat.read(spark, "records")
        poisoned = recs.filter(F.col("doc_id") == "doc-000000000").first()
        assert "user" not in poisoned.tags and "bad:key" not in poisoned.tags
        assert "__document_id" in poisoned.tags
        clean = recs.filter(F.col("doc_id") == "doc-000000003").first()
        assert "user" in clean.tags

    def test_no_quarantine_table_when_all_clean(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        pipe = Pipeline(spark, cat, PipelineConfig(execution_id="ok"))
        pipe.run(synth_corpus(spark, 3), synth_doc_tags(spark, 3))
        assert not cat.exists(qtn.QUARANTINE_TABLE)


class TestQuarantineIdempotency:
    def test_rewrite_same_execution_no_duplicates(self, spark, tmp_path):
        """Crash-after-quarantine-write, before ledger commit: the resumed
        step re-quarantines the same keys; rows must not duplicate."""
        cat = TableCatalog(str(tmp_path))
        fatal = spark.createDataFrame(
            [("d1", ), ("d2", )], "doc_id string"
        )
        q = qtn.quarantine_rows(fatal, "save_records", "ex1", "bad")
        qtn.write_quarantine(cat, q)
        qtn.write_quarantine(cat, q)  # simulated re-run of the same step
        assert cat.read(spark, qtn.QUARANTINE_TABLE).count() == 2

        # a DIFFERENT execution quarantining the same keys still appends
        q2 = qtn.quarantine_rows(fatal, "save_records", "ex2", "bad")
        qtn.write_quarantine(cat, q2)
        assert cat.read(spark, qtn.QUARANTINE_TABLE).count() == 4


class TestCustomStepQuarantine:
    def test_custom_step_fatal_condition(self, spark, tmp_path):
        cat = TableCatalog(str(tmp_path))
        pipe = Pipeline(spark, cat, PipelineConfig(execution_id="cs"))
        pipe.register_step(
            "docs_lenfilter",
            "extracted",
            lambda df: df.select("doc_id", F.length("text").alias("n")),
            fatal_condition=F.col("doc_id") == "doc-000000002",
            fatal_reason="blocked_doc",
        )
        metrics = pipe.run(synth_corpus(spark, 4), None)
        assert "docs_lenfilter" in metrics

        out = cat.read(spark, "docs_lenfilter")
        assert out.filter(F.col("doc_id") == "doc-000000002").count() == 0
        assert out.count() == 3

        q = cat.read(spark, qtn.QUARANTINE_TABLE).first()
        assert q.step == "docs_lenfilter"
        assert q.reason == "blocked_doc"
        assert q.key == "doc-000000002"
