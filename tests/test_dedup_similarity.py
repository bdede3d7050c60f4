"""Dedup + similarity-search operators on the driver-provided testdata."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import dedup as D
from kernel_memory_spark.operators import similarity as SIM
from kernel_memory_spark.operators import textstats as TS

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestDedup:
    def test_exact_dedup(self, spark):
        df = spark.createDataFrame(
            [("1", "same text"), ("2", "same text"), ("3", "other")],
            "doc_id string, text string",
        )
        got = {r.doc_id for r in D.dedup_exact(df).collect()}
        assert got == {"1", "3"}

    def test_minhash_finds_near_dups(self, spark):
        df = spark.createDataFrame(
            [
                ("1", "the quick brown fox jumps over the lazy dog"),
                ("2", "the quick brown fox jumps over the lazy dogs"),
                ("3", "completely different content about spark engines"),
            ],
            "doc_id string, text string",
        )
        pairs = D.minhash_dup_pairs(df, threshold=0.7).collect()
        assert {(p.a, p.b) for p in pairs} == {("1", "2")}

    def test_simhash_finds_near_dups(self, spark):
        # simhash is built for long documents: a one-char edit in a long text
        # stays within the banding's Hamming budget; short unrelated text not.
        long_a = "the quick brown fox jumps over the lazy dog. " * 10
        long_b = long_a[:-2] + "!"
        df = spark.createDataFrame(
            [
                ("1", long_a),
                ("2", long_b),
                ("3", "completely different content about spark engines"),
            ],
            "doc_id string, text string",
        )
        pairs = D.simhash_dup_pairs(df, max_hamming=3).collect()
        assert ("1", "2") in {(p.a, p.b) for p in pairs}
        assert ("1", "3") not in {(p.a, p.b) for p in pairs}

    def test_ngram_jaccard(self, spark):
        df = spark.createDataFrame(
            [
                ("1", "a b c d e f g h"),
                ("2", "a b c d e f g x"),
                ("3", "q w e r t y u i"),
            ],
            "doc_id string, text string",
        )
        pairs = {(p.a, p.b) for p in D.ngram_jaccard_pairs(df, threshold=0.5).collect()}
        assert pairs == {("1", "2")}

    def test_containment_catches_quote_jaccard_misses(self, spark):
        """Short doc quoted verbatim inside a long one: containment
        short->long is 1.0 while Jaccard stays below any useful
        threshold (the asymmetric case the operator exists for)."""
        quote = "the quick brown fox jumps over the lazy dog"
        filler = " ".join(f"w{i}" for i in range(60))
        df = spark.createDataFrame(
            [("s", quote), ("l", filler + " " + quote)],
            "doc_id string, text string",
        )
        got = {
            (r.src, r.dst): r.containment
            for r in D.containment_pairs(df, threshold=0.9).collect()
        }
        assert got == {("s", "l"): pytest.approx(1.0)}
        assert D.ngram_jaccard_pairs(df, threshold=0.5).count() == 0

    def test_containment_exact_values_both_directions(self, spark):
        """9-word vs 10-word docs sharing a 6-word prefix: 3-gram sets
        have 7 and 8 grams, 4 shared -> 4/7 and 4/8 exactly."""
        df = spark.createDataFrame(
            [
                ("a", "c1 c2 c3 c4 c5 c6 x1 x2 x3"),
                ("b", "c1 c2 c3 c4 c5 c6 y1 y2 y3 y4"),
            ],
            "doc_id string, text string",
        )
        got = {
            (r.src, r.dst): r.containment
            for r in D.containment_pairs(df, threshold=0.0).collect()
        }
        assert got[("a", "b")] == pytest.approx(4 / 7, abs=1e-12)
        assert got[("b", "a")] == pytest.approx(4 / 8, abs=1e-12)

    def test_exact_dedup_on_testdata(self, documents):
        # idempotent: deduping a dedup output changes nothing
        once = D.dedup_exact(documents)
        assert D.dedup_exact(once).count() == once.count()


class TestSimilarity:
    def test_brute_force_self_top1(self, spark, embeddings):
        q = embeddings.filter(F.col("vec_id") == 0).first().embedding
        top = SIM.brute_force_topk(embeddings, list(q), k=3).collect()
        assert top[0].vec_id == 0
        assert top[0].score == pytest.approx(1.0, abs=1e-5)

    def test_ann_lsh_contains_self(self, spark, embeddings):
        row = embeddings.filter(F.col("vec_id") == 0).first()
        dim = len(row.embedding)
        top = SIM.ann_lsh_topk(embeddings, list(row.embedding), dim, k=5).collect()
        assert top[0].vec_id == 0

    def test_ann_recall_vs_brute_force(self, spark, embeddings):
        # 4 hyperplanes (16 buckets) + radius-2 multiprobe on 500
        # unclustered vectors: ~70% of rows probed, >= 50% top-10 recall
        # (the exactness/latency dial; the >=0.9 quality gate is
        # TestAnnRecallGate on planted neighbors).
        row = embeddings.filter(F.col("vec_id") == 7).first()
        dim = len(row.embedding)
        exact = [r.vec_id for r in SIM.brute_force_topk(embeddings, list(row.embedding), k=10).collect()]
        approx = [r.vec_id for r in SIM.ann_lsh_topk(
            embeddings, list(row.embedding), dim, k=10, n_planes=4,
            probe_radius=2,
        ).collect()]
        overlap = len(set(exact) & set(approx)) / 10
        assert overlap >= 0.5

    def test_ivf_topk(self, spark, embeddings):
        rows = embeddings.orderBy("vec_id").limit(4).collect()
        centroids = [list(r.embedding) for r in rows]
        q = list(rows[0].embedding)
        got = SIM.ivf_topk(embeddings, centroids, q, k=5, nprobe=2).collect()
        assert got[0].vec_id == rows[0].vec_id


class TestTextStats:
    def test_language_id(self, spark):
        df = spark.createDataFrame(
            [
                ("1", "the cat and the dog sat in that house for a while"),
                ("2", "der hund ist nicht mit der katze auf dem sofa"),
                ("3", "xyzzy plugh"),
            ],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.lang_id for r in TS.with_language_id(df).collect()}
        assert got["1"] == "en" and got["2"] == "de" and got["3"] == "und"

    def test_quality_and_tokens(self, spark, documents):
        out = TS.with_token_counts(TS.with_quality_score(documents)).limit(50).collect()
        for r in out:
            assert 0.0 <= r.quality_score <= 1.0
            assert r.n_tokens_4char >= 1
            assert r.n_words >= 1

    def test_fingerprint_ignores_punct_and_case(self, spark):
        df = spark.createDataFrame(
            [("1", "Hello, World!"), ("2", "hello world"), ("3", "bye")],
            "doc_id string, text string",
        )
        got = {r.doc_id: r.fingerprint for r in TS.with_fingerprint(df).collect()}
        assert got["1"] == got["2"] != got["3"]


def _planted_embeddings(spark, embeddings):
    """Queries 0-9 plus 9 deterministic near-clones each (cos >= 0.99):
    the workload where ANN recall is meaningful — each query's true
    top-10 is self + its clones."""
    import numpy as np

    base = embeddings.filter(F.col("vec_id") < 10).collect()
    rows = []
    for q, r in enumerate(base):
        v = np.asarray(r.embedding, dtype=np.float64)
        v /= np.linalg.norm(v) or 1.0
        rows.append((q, [float(x) for x in v]))
        for j in range(1, 10):
            rng = np.random.RandomState(1000 * q + j)
            n = v + 0.03 * rng.standard_normal(v.shape)
            n /= np.linalg.norm(n)
            rows.append((q * 1000 + 100 + j, [float(x) for x in n]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestAnnRecallGate:
    """ANN recall quality gate. On the sandbox's synthetic unclustered
    embeddings, recall ~= fraction-of-corpus probed (measured sweep: 6
    planes/radius 1 -> 0.29 at 12% probed; no locality to exploit), so the
    meaningful gate is on PLANTED near-neighbors — the workload ANN exists
    for: each query's true top-k are deterministic small perturbations of
    itself (cos >= 0.99), and multiprobe LSH must recover >= 90% of them."""

    def test_planted_neighbor_recall_at_least_0_9(self, spark, embeddings):
        planted = _planted_embeddings(spark, embeddings)
        # ids < 10 are the queries; their true top-10 = self + 9 clones
        report = SIM.lsh_recall_report(
            planted, dim=64, n_planes=6, k=10, n_queries=10, probe_radius=1
        ).collect()
        recalls = [r.recall for r in report]
        assert len(recalls) == 10
        mean_recall = sum(recalls) / len(recalls)
        assert mean_recall >= 0.9, recalls

    def test_report_matches_per_query_paths(self, spark, embeddings):
        """The batched report must agree with the per-query ann_lsh_topk
        path (same planes, same probes) for one query."""
        row = embeddings.filter(F.col("vec_id") == 3).first()
        report = {
            r.query_id: r.recall
            for r in SIM.lsh_recall_report(
                embeddings, dim=64, n_planes=6, k=10, n_queries=10
            ).collect()
        }
        exact = [r.vec_id for r in SIM.brute_force_topk(
            embeddings, list(row.embedding), k=10).collect()]
        approx = [r.vec_id for r in SIM.ann_lsh_topk(
            embeddings, list(row.embedding), 64, k=10, n_planes=6).collect()]
        manual = round(len(set(exact) & set(approx)) / 10.0, 2)
        assert report[3] == manual


class TestPersistedIndex:
    """Write-once ANN index tables: probe path must be pruned-scan + JVM
    ranking (no per-query UDF over the full table)."""

    def test_lsh_index_recall_and_plan(self, spark, embeddings, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        row = embeddings.filter(F.col("vec_id") == 7).first()
        dim = len(row.embedding)
        SIM.build_lsh_index(spark, cat, embeddings, dim, n_planes=4)

        out = SIM.query_lsh_index(spark, cat, list(row.embedding), dim,
                                  k=10, n_planes=4, probe_radius=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # no Python in the probe path
        assert "InPandas" not in plan and "ArrowEval" not in plan
        # manifest-level pruning: the probe reads ONLY its buckets' files —
        # untouched buckets are never listed (stronger than hive partition
        # pruning, which still lists every directory)
        import os as _os

        all_files = {
            _os.path.join(dp, fn)
            for e in cat._entries("ann_lsh_index")
            for dp, _d, fns in _os.walk(
                _os.path.join(cat._dir("ann_lsh_index"), e["path"]))
            for fn in fns if fn.endswith(".parquet")
        }
        read_files = {f.split("://", 1)[-1] for f in out.inputFiles()}
        assert 0 < len(read_files) < len(all_files)
        assert read_files <= all_files

        exact = [r.vec_id for r in SIM.brute_force_topk(
            embeddings, list(row.embedding), k=10).collect()]
        approx = [r.vec_id for r in out.collect()]
        assert len(set(exact) & set(approx)) / 10 >= 0.5
        assert approx[0] == 7  # self always lands in its own bucket

    def test_lsh_index_upsert(self, spark, embeddings, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        first = embeddings.filter(F.col("vec_id") < 400)
        SIM.build_lsh_index(spark, cat, first, 64, n_planes=4)
        # add the remaining vectors + re-deliver one with a CHANGED vector
        # (its bucket may move: removal must be id-scoped, not bucket-scoped)
        rest = embeddings.filter(F.col("vec_id") >= 400)
        changed = embeddings.filter(F.col("vec_id") == 7).withColumn(
            "embedding", F.transform("embedding", lambda x: -x)
        )
        SIM.upsert_lsh_index(
            spark, cat, rest.unionByName(changed), 64, n_planes=4
        )
        idx = cat.read(spark, "ann_lsh_index")
        assert idx.count() == embeddings.count()  # no dup for vec 7
        assert idx.filter(F.col("vec_id") == 7).count() == 1
        # probing still works end-to-end after the upsert
        row = embeddings.filter(F.col("vec_id") == 450).first()
        out = SIM.query_lsh_index(spark, cat, list(row.embedding), 64,
                                  k=5, n_planes=4, probe_radius=2)
        assert out.first().vec_id == 450

    def test_lsh_upsert_rewrites_only_touched_buckets(
        self, spark, embeddings, tmp_path
    ):
        """Round-3 verdict item #1 done-criterion: an upsert touching one
        bucket must carry every other bucket's files by reference, not
        rewrite O(index)."""
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        SIM.build_lsh_index(spark, cat, embeddings, 64, n_planes=4)
        before = {e["path"]: e["bucket"] for e in cat._entries("ann_lsh_index")}
        n_buckets_before = len(before)
        assert n_buckets_before > 4  # 16 possible buckets, most populated

        # one NEW id: lands in exactly one bucket, replaces nothing
        one = embeddings.filter(F.col("vec_id") == 3).withColumn(
            "vec_id", F.lit(99_999).cast("long")
        )
        SIM.upsert_lsh_index(spark, cat, one, 64, n_planes=4)

        after = {e["path"]: e["bucket"] for e in cat._entries("ann_lsh_index")}
        carried = set(before) & set(after)
        # every bucket except the (single) touched one carried by reference
        assert len(carried) >= n_buckets_before - 1
        touched_buckets = {after[p] for p in set(after) - carried}
        assert len(touched_buckets) == 1
        assert cat.read(spark, "ann_lsh_index").count() == \
            embeddings.count() + 1

    def test_lsh_delete_rewrites_only_holding_bucket(
        self, spark, embeddings, tmp_path
    ):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        SIM.build_lsh_index(spark, cat, embeddings, 64, n_planes=4)
        before = set(
            e["path"] for e in cat._entries("ann_lsh_index")
        )
        SIM.delete_lsh_index(spark, cat, [7])
        after = set(e["path"] for e in cat._entries("ann_lsh_index"))
        # only the bucket holding vec 7 was rewritten
        assert len(before & after) >= len(before) - 1
        idx = cat.read(spark, "ann_lsh_index")
        assert idx.filter(F.col("vec_id") == 7).count() == 0
        assert idx.count() == embeddings.count() - 1

    def test_quantized_lsh_recall_within_0_02_of_float(
        self, spark, embeddings, tmp_path
    ):
        """Round-4 verdict stretch #8 done-criterion: planted-neighbor
        recall on the int8-quantized LSH index within 0.02 of the float32
        index. Buckets are assigned on the float vector before
        quantization, so the candidate sets are identical; only the final
        cosine ranking sees the <0.4%-per-component reconstruction error.
        The probe plan must stay JVM-only (dequantize is column algebra)."""
        from kernel_memory_spark.sources.tables import TableCatalog

        planted = _planted_embeddings(spark, embeddings).localCheckpoint()
        cat_f = TableCatalog(str(tmp_path / "f"))
        cat_q = TableCatalog(str(tmp_path / "q"))
        SIM.build_lsh_index(spark, cat_f, planted, 64, n_planes=6)
        SIM.build_lsh_index(spark, cat_q, planted, 64, n_planes=6,
                            quantize=True)
        # quantized index stores int8 + scale, never the float column
        qcols = cat_q.read(spark, "ann_lsh_index").columns
        assert "q" in qcols and "scale" in qcols and "embedding" not in qcols

        queries = {r.vec_id: list(r.embedding)
                   for r in planted.filter(F.col("vec_id") < 10).collect()}
        recalls = {}
        for cat in (cat_f, cat_q):
            total = 0.0
            for qid, qv in queries.items():
                out = SIM.query_lsh_index(spark, cat, qv, 64, k=10,
                                          n_planes=6, probe_radius=1)
                if cat is cat_q:
                    plan = (out._jdf.queryExecution().executedPlan()
                            .toString())
                    assert "InPandas" not in plan
                    assert "ArrowEval" not in plan
                truth = {qid} | {qid * 1000 + 100 + j for j in range(1, 10)}
                got = {r.vec_id for r in out.collect()}
                total += len(got & truth) / 10.0
            recalls[id(cat)] = total / len(queries)
        r_float, r_quant = recalls[id(cat_f)], recalls[id(cat_q)]
        assert r_float >= 0.9
        assert abs(r_float - r_quant) <= 0.02, (r_float, r_quant)

    def test_quantized_lsh_upsert_matches_full_build(
        self, spark, embeddings, tmp_path
    ):
        """Incremental maintenance of a quantized index: build on half,
        upsert the rest + a changed re-delivery — same rows and same top-k
        as one quantized full build."""
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        SIM.build_lsh_index(
            spark, cat, embeddings.filter(F.col("vec_id") < 400),
            64, n_planes=4, quantize=True,
        )
        changed = embeddings.filter(F.col("vec_id") == 7).withColumn(
            "embedding", F.transform("embedding", lambda x: -x)
        )
        SIM.upsert_lsh_index(
            spark, cat,
            embeddings.filter(F.col("vec_id") >= 400).unionByName(changed),
            64, n_planes=4, quantize=True,
        )
        idx = cat.read(spark, "ann_lsh_index")
        assert idx.count() == embeddings.count()
        assert idx.filter(F.col("vec_id") == 7).count() == 1
        row = embeddings.filter(F.col("vec_id") == 450).first()
        out = SIM.query_lsh_index(spark, cat, list(row.embedding), 64,
                                  k=5, n_planes=4, probe_radius=2)
        assert out.first().vec_id == 450

    def test_ivf_index_probe(self, spark, embeddings, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        rows = embeddings.orderBy("vec_id").limit(4).collect()
        centroids = [list(r.embedding) for r in rows]
        SIM.build_ivf_index(spark, cat, embeddings, centroids)
        out = SIM.query_ivf_index(spark, cat, centroids,
                                  list(rows[0].embedding), k=5, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InPandas" not in plan and "ArrowEval" not in plan
        got = out.collect()
        assert got[0].vec_id == rows[0].vec_id

    def test_ivf_lifecycle_build_upsert_delete_query(
        self, spark, embeddings, tmp_path
    ):
        """Full maintenance lifecycle (round-3 verdict stretch #8):
        build -> upsert -> delete -> query stays correct throughout."""
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        rows = embeddings.orderBy("vec_id").limit(4).collect()
        centroids = [list(r.embedding) for r in rows]
        SIM.build_ivf_index(
            spark, cat, embeddings.filter(F.col("vec_id") < 300), centroids
        )
        SIM.upsert_ivf_index(
            spark, cat, embeddings.filter(F.col("vec_id") >= 300), centroids
        )
        before = {e["path"]: e["bucket"]
                  for e in cat._entries("ann_ivf_index")}
        SIM.delete_ivf_index(spark, cat, [int(rows[1].vec_id)])
        after = {e["path"] for e in cat._entries("ann_ivf_index")}
        # every rewritten entry belongs to the ONE centroid holding the id
        # (it may span several manifest entries from earlier merges)
        rewritten = {before[p] for p in set(before) - after}
        assert len(rewritten) == 1
        idx = cat.read(spark, "ann_ivf_index")
        assert idx.count() == embeddings.count() - 1
        assert idx.filter(F.col("vec_id") == rows[1].vec_id).count() == 0
        # deleted vector no longer retrievable; its centroid still probes
        out = SIM.query_ivf_index(
            spark, cat, centroids, list(rows[1].embedding), k=3, nprobe=2
        ).collect()
        assert rows[1].vec_id not in [r.vec_id for r in out]
        assert len(out) == 3

    def test_ivf_index_upsert(self, spark, embeddings, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        rows = embeddings.orderBy("vec_id").limit(4).collect()
        centroids = [list(r.embedding) for r in rows]
        SIM.build_ivf_index(
            spark, cat, embeddings.filter(F.col("vec_id") < 400), centroids
        )
        rest = embeddings.filter(F.col("vec_id") >= 400)
        redelivered = embeddings.filter(F.col("vec_id") == 5)
        SIM.upsert_ivf_index(
            spark, cat, rest.unionByName(redelivered), centroids
        )
        idx = cat.read(spark, "ann_ivf_index")
        assert idx.count() == embeddings.count()
        assert idx.filter(F.col("vec_id") == 5).count() == 1


class TestCosineDup:
    def test_clone_pairs_found(self, spark, embeddings):
        from kernel_memory_spark.operators import dedup as D

        both = embeddings.select("vec_id", "embedding").unionByName(
            embeddings.select(
                (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
            )
        )
        dim = len(embeddings.first().embedding)
        pairs = D.cosine_dup_pairs(both, dim, threshold=0.98)
        got = {(r.a, r.b) for r in pairs.collect()}
        n = embeddings.count()
        # every clone pairs with its original at cos=1
        want = {(i, i + 100000) for i in range(n)}
        assert want <= got

    def test_ids_only_blocking_plan(self, spark, embeddings):
        from kernel_memory_spark.operators import dedup as D

        dim = len(embeddings.first().embedding)
        pairs = D.cosine_dup_pairs(
            embeddings.select("vec_id", "embedding"), dim
        )
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        # exactly one Python stage (the bucketizer); the verify is JVM-only
        assert "MapInPandas" not in plan  # signatures checkpointed once


class TestIvfTraining:
    def test_kmeans_recovers_planted_clusters(self, spark):
        """Three well-separated planted clusters: training from cold seeds
        must converge to one centroid per cluster, and every member must
        assign to its cluster's centroid."""
        import numpy as np

        base = {
            0: [1.0] * 8 + [0.0] * 8,
            1: [0.0] * 8 + [1.0] * 8,
            2: ([1.0, -1.0] * 8),
        }
        rows = []
        for vid in range(90):
            c = vid % 3
            v = np.array(base[c], dtype=np.float64)
            # deterministic small jitter, cluster structure preserved
            v = v + 0.05 * np.sin(np.arange(16) * (vid + 1))
            rows.append((vid, [float(x) for x in v]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

        cents = SIM.train_ivf_centroids(df, k=3, max_iter=10)
        assert len(cents) == 3
        assigned = SIM.ivf_assign(df, cents)
        got = {
            (r.vec_id % 3, r.centroid) for r in assigned.collect()
        }
        # each planted cluster maps to exactly one trained centroid
        mapping = {}
        for cluster, centroid in got:
            mapping.setdefault(cluster, set()).add(centroid)
        assert all(len(v) == 1 for v in mapping.values())
        assert len({next(iter(v)) for v in mapping.values()}) == 3

    def test_training_is_layout_independent(self, spark):
        rows = [
            (i, [float((i * 7 + j * 3) % 11) for j in range(8)])
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = SIM.train_ivf_centroids(df, k=4, max_iter=4)
        b = SIM.train_ivf_centroids(df.repartition(13), k=4, max_iter=4)
        for va, vb in zip(a, b):
            assert va == pytest.approx(vb, abs=1e-9)


class TestPrefixJaccardJoin:
    @staticmethod
    def _brute(rows, t):
        toks = {i: set((x or "").lower().split()) for i, x in rows}
        out = {}
        ids = sorted(toks)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                inter = len(toks[a] & toks[b])
                union = len(toks[a] | toks[b])
                if union and inter / union >= t:
                    out[(a, b)] = (inter, round(inter / union, 6))
        return out

    def test_lossless_vs_brute_force(self, spark):
        """Prefix + length filtering misses NOTHING: the pruned join
        equals the quadratic brute-force pair set exactly."""
        from kernel_memory_spark.operators.dedup import prefix_jaccard_join

        rows = [
            ("d1", "the quick brown fox jumps over the lazy dog"),
            ("d2", "the quick brown fox leaps over the lazy dog"),
            ("d3", "the quick brown fox jumps over a lazy dog"),
            ("d4", "completely different words here entirely"),
            ("d5", "completely different words here entirely today"),
            ("d6", "the the the the"),  # all-stopword degenerate doc
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        for t in (0.5, 0.7, 0.9):
            got = {
                (r.a, r.b): (r.n_common, r.jaccard)
                for r in prefix_jaccard_join(df, threshold=t).collect()
            }
            assert got == self._brute(rows, t), t

    def test_exact_duplicates_score_one(self, spark):
        from kernel_memory_spark.operators.dedup import prefix_jaccard_join

        df = spark.createDataFrame(
            [("a", "x y z"), ("b", "x y z"), ("c", "p q r")],
            "doc_id string, text string",
        )
        got = prefix_jaccard_join(df, threshold=0.99).collect()
        assert [(r.a, r.b, r.jaccard) for r in got] == [("a", "b", 1.0)]

    def test_stopword_heavy_corpus_prunes(self, spark):
        """Docs sharing ONLY ubiquitous tokens never become candidates
        unless the threshold is reachable — the prefix is drawn from
        rare tokens, so common-token-only overlap is pruned, and the
        result is still exact."""
        from kernel_memory_spark.operators.dedup import prefix_jaccard_join

        rows = [(f"d{i}", f"the of and unique{i} rare{i}") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {
            (r.a, r.b)
            for r in prefix_jaccard_join(df, threshold=0.6).collect()
        }
        assert got == set()  # jaccard = 3/7 < 0.6 for every pair


class TestColumnSimilarities:
    def _mat(self, spark):
        # 3 rows x 3 cols dense-ish matrix, hand-checkable
        rows = [
            (1, "x", 1.0), (1, "y", 2.0),
            (2, "x", 2.0), (2, "y", 1.0), (2, "z", 2.0),
            (3, "y", 2.0), (3, "z", 1.0),
        ]
        return spark.createDataFrame(rows, "r long, c string, v double")

    def test_exact_matches_hand_cosine(self, spark):
        import math
        got = {
            (r.src, r.dst): r.sim_est
            for r in SIM.column_similarities(
                self._mat(spark), "r", "c", "v"
            ).collect()
        }
        nx, ny, nz = math.sqrt(5.0), 3.0, math.sqrt(5.0)
        exp = {
            ("x", "y"): (1 * 2 + 2 * 1) / (nx * ny),
            ("x", "z"): (2 * 2) / (nx * nz),
            ("y", "z"): (1 * 2 + 2 * 1) / (ny * nz),
        }
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-12)

    def test_huge_gamma_degenerates_to_exact(self, spark):
        # sqrt(gamma) above every norm -> p = 1, d = norm: identical to
        # the exact path, coins never drop anything
        m = self._mat(spark)
        exact = {
            (r.src, r.dst): r.sim_est
            for r in SIM.column_similarities(m, "r", "c", "v").collect()
        }
        est = {
            (r.src, r.dst): r.sim_est
            for r in SIM.column_similarities(
                m, "r", "c", "v", gamma=1e6
            ).collect()
        }
        assert est == exact

    def test_max_row_guard_and_partition_invariance(self, spark):
        m = self._mat(spark)
        capped = SIM.column_similarities(
            m, "r", "c", "v", max_row=2
        ).collect()
        # row 2 (3 distinct cols) dropped: only pairs from rows 1 and 3
        assert sorted((r.src, r.dst) for r in capped) == [
            ("x", "y"), ("y", "z")
        ]
        a = SIM.column_similarities(m.repartition(5), "r", "c", "v",
                                    gamma=4.0).collect()
        b = SIM.column_similarities(m.coalesce(1), "r", "c", "v",
                                    gamma=4.0).collect()
        assert sorted(map(tuple, a)) == pytest.approx(
            sorted(map(tuple, b))
        )


class TestWeightedJaccard:
    def test_rare_grams_dominate(self, spark):
        import math

        from kernel_memory_spark.operators import dedup as D

        # A and B share a RARE trigram run; A and C share only a gram
        # that appears in every doc (common -> low idf)
        common = "alpha beta gamma delta"
        rows = [
            (1, "unique shard signal one " + common),
            (2, "unique shard signal two " + common),
            (3, "totally different words here " + common),
            (4, "yet another separate body text " + common),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        pairs = {
            (r.a, r.b): r.wjaccard
            for r in D.weighted_jaccard_pairs(
                df, threshold=0.0, gram_df_cap=64
            ).collect()
        }
        # the pair sharing rare grams scores far above pairs sharing
        # only the ubiquitous run
        assert pairs[("1", "2")] > 2 * pairs.get(("3", "4"), 0.0)
        # identity bound: weighted jaccard <= 1, symmetric-input pairs
        assert all(v <= 1.0 + 1e-9 for v in pairs.values())

    def test_exact_clone_scores_one(self, spark):
        from kernel_memory_spark.operators import dedup as D

        rows = [(1, "quick brown fox jumps over dog"),
                (2, "quick brown fox jumps over dog"),
                (3, "some other unrelated sentence body")]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        pairs = {
            (r.a, r.b): r.wjaccard
            for r in D.weighted_jaccard_pairs(
                df, threshold=0.5
            ).collect()
        }
        assert pairs == {("1", "2"): pytest.approx(1.0)}
