"""End-to-end pipeline vs the single-node pandas oracle: triple P/R gate
(BASELINE.md: P and R >= 0.95), linking/canonicalization behavior, and
resume semantics (FIXTURES.md §6)."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.oracle import oracle_triples, precision_recall
from kernel_memory_spark.sources.tables import TableCatalog
from kernel_memory_spark.streaming.pipeline import Pipeline, PipelineConfig
from kernel_memory_spark.synth import gen_doc, synth_corpus, synth_doc_tags

N_DOCS = 150


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kms_e2e"))
    cat = TableCatalog(root)
    corpus = synth_corpus(spark, N_DOCS)
    tags = synth_doc_tags(spark, N_DOCS)
    pipe = Pipeline(spark, cat, PipelineConfig(execution_id="exec-pr"))
    metrics = pipe.run(corpus, tags)
    return cat, metrics


def spark_triple_set(spark, cat):
    rows = cat.read(spark, "triples").select(
        "subj", "pred", "obj", "doc_id"
    ).collect()
    return {(r.subj, r.pred, r.obj, r.doc_id) for r in rows}


class TestTriplePR:
    def test_pr_vs_oracle(self, spark, pipeline_run):
        cat, _ = pipeline_run
        predicted = spark_triple_set(spark, cat)
        docs = [gen_doc(i) for i in range(N_DOCS)]
        expected = oracle_triples(docs)
        p, r = precision_recall(predicted, expected)
        assert p >= 0.95, f"precision {p}"
        assert r >= 0.95, f"recall {r}"

    def test_canonicalization_merges_aliases(self, spark, pipeline_run):
        cat, _ = pipeline_run
        emap = {
            r.norm: r.canonical_id
            for r in cat.read(spark, "entity_map").collect()
        }
        # alias families from synth.ENTITIES collapse to one canonical id
        assert emap.get("alice m johnson") == emap.get("alice johnson")
        assert emap.get("helios dynamics inc") == emap.get("helios dynamics")
        # distinct entities stay distinct
        assert emap.get("robert chen") != emap.get("maria garcia")

    def test_ledger_has_all_steps(self, spark, pipeline_run):
        cat, metrics = pipeline_run
        steps = {
            r.step for r in cat.read(spark, "step_ledger").collect()
        }
        for s in ["ingest", "extract", "partition", "gen_embeddings",
                  "save_records", "triples", "link", "canonicalize",
                  "materialize"]:
            assert s in steps, s

    def test_resume_is_noop(self, spark, pipeline_run):
        cat, _ = pipeline_run
        v_before = {t: cat.current_version(t) for t in ["triples", "nodes", "edges"]}
        pipe = Pipeline(spark, cat, PipelineConfig(execution_id="exec-pr"))
        metrics = pipe.run(resume=True)
        assert metrics == {}  # nothing re-ran
        v_after = {t: cat.current_version(t) for t in ["triples", "nodes", "edges"]}
        assert v_before == v_after


class TestCrashResume:
    def test_crash_then_resume_matches_straight_run(self, spark, tmp_path_factory):
        n = 60
        corpus = synth_corpus(spark, n)
        tags = synth_doc_tags(spark, n)

        cat_a = TableCatalog(str(tmp_path_factory.mktemp("straight")))
        Pipeline(spark, cat_a, PipelineConfig(execution_id="e")).run(corpus, tags)

        cat_b = TableCatalog(str(tmp_path_factory.mktemp("crashy")))
        pipe_b = Pipeline(spark, cat_b, PipelineConfig(execution_id="e"))
        pipe_b.run(corpus, tags, stop_after="partition")  # crash mid-pipeline
        resumed = Pipeline(spark, cat_b, PipelineConfig(execution_id="e"))
        metrics = resumed.run(resume=True)
        # completed steps did not re-run
        assert "extract" not in metrics and "partition" not in metrics
        assert "gen_embeddings" in metrics

        assert spark_triple_set(spark, cat_a) == spark_triple_set(spark, cat_b)
        edges_a = {
            tuple(r) for r in cat_a.read(spark, "edges").collect()
        }
        edges_b = {
            tuple(r) for r in cat_b.read(spark, "edges").collect()
        }
        assert edges_a == edges_b


class TestParallelismInvariance:
    def test_triples_identical_at_two_parallelism_levels(self, spark, tmp_path_factory):
        """Sandbox analog of the two-cluster-size protocol: the same job at
        different partitioning must produce identical output."""
        n = 60
        out = []
        for parts in (2, 12):
            cat = TableCatalog(str(tmp_path_factory.mktemp(f"par{parts}")))
            corpus = synth_corpus(spark, n, partitions=parts).repartition(parts)
            Pipeline(spark, cat, PipelineConfig(execution_id="e")).run(corpus)
            out.append(spark_triple_set(spark, cat))
        assert out[0] == out[1]


class TestCustomSteps:
    def test_registered_step_runs_and_resumes(self, spark, tmp_path_factory):
        # IPipelineStepHandler analog (SURVEY §2.10): a named
        # DataFrame -> DataFrame stage with ledger/resume semantics.
        from pyspark.sql import functions as F

        cat = TableCatalog(str(tmp_path_factory.mktemp("custom")))
        corpus = synth_corpus(spark, 30)
        pipe = Pipeline(spark, cat, PipelineConfig(execution_id="e"))
        pipe.register_step(
            "node_degree", "edges",
            lambda edges: edges.groupBy("src").agg(F.sum("weight").alias("deg")),
        )
        metrics = pipe.run(corpus)
        assert "node_degree" in metrics
        assert cat.exists("node_degree")
        deg = cat.read(spark, "node_degree")
        assert deg.columns == ["src", "deg"]

        resumed = Pipeline(spark, cat, PipelineConfig(execution_id="e"))
        resumed.register_step(
            "node_degree", "edges",
            lambda edges: edges.groupBy("src").agg(F.sum("weight").alias("deg")),
        )
        assert resumed.run(resume=True) == {}
