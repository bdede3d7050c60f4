"""Deterministic hash sampling: layout-independent, split-stable."""

from pyspark.sql import functions as F

from kernel_memory_spark.operators import sampling as SMP


class TestDeterministicSample:
    def test_layout_independent(self, spark):
        df = spark.range(0, 10000).withColumnRenamed("id", "k")
        a = {r.k for r in SMP.deterministic_sample(df, "k", 0.1).collect()}
        b = {
            r.k for r in SMP.deterministic_sample(
                df.repartition(17), "k", 0.1
            ).collect()
        }
        assert a == b  # identical sample under any partitioning
        assert 0.07 < len(a) / 10000 < 0.13

    def test_growing_corpus_keeps_old_members(self, spark):
        small = spark.range(0, 5000).withColumnRenamed("id", "k")
        big = spark.range(0, 10000).withColumnRenamed("id", "k")
        a = {r.k for r in SMP.deterministic_sample(small, "k", 0.1).collect()}
        b = {r.k for r in SMP.deterministic_sample(big, "k", 0.1).collect()}
        assert a <= b  # old members never drop out

    def test_salt_decorrelates(self, spark):
        df = spark.range(0, 10000).withColumnRenamed("id", "k")
        a = {r.k for r in SMP.deterministic_sample(df, "k", 0.5, "s1").collect()}
        b = {r.k for r in SMP.deterministic_sample(df, "k", 0.5, "s2").collect()}
        overlap = len(a & b) / len(a)
        assert 0.4 < overlap < 0.6  # ~independent halves


class TestStratifiedSample:
    def test_per_stratum_rates(self, spark):
        df = spark.range(0, 20000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, "web").otherwise("code").alias("src"),
        )
        got = SMP.stratified_sample(
            df, "src", "k", {"web": 0.05, "code": 0.5}
        )
        counts = {r.src: r.n for r in
                  got.groupBy("src").agg(F.count("*").alias("n")).collect()}
        assert 300 < counts["web"] < 700        # ~500 of 10000
        assert 4500 < counts["code"] < 5500     # ~5000 of 10000

    def test_default_fraction_zero_drops_unlisted(self, spark):
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("other").alias("src")
        )
        assert SMP.stratified_sample(df, "src", "k", {"web": 1.0}).count() == 0


class TestSplit:
    def test_disjoint_exhaustive_stable(self, spark):
        df = spark.range(0, 10000).withColumnRenamed("id", "k")
        train, val, test = SMP.split(df, "k", (0.8, 0.1, 0.1))
        t = {r.k for r in train.collect()}
        v = {r.k for r in val.collect()}
        s = {r.k for r in test.collect()}
        assert len(t) + len(v) + len(s) == 10000
        assert not (t & v) and not (t & s) and not (v & s)
        assert 7500 < len(t) < 8500
        # growing the corpus never moves an existing key between splits
        bigger = spark.range(0, 20000).withColumnRenamed("id", "k")
        t2, v2, s2 = SMP.split(bigger, "k", (0.8, 0.1, 0.1))
        assert t <= {r.k for r in t2.collect()}
        assert v <= {r.k for r in v2.collect()}
