"""Count-Min Sketch (operators/sketch.py): one-sided error guarantee,
mergeability, bounded size."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
)


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


class TestCountMin:
    def test_estimates_never_undercount(self, spark):
        """CMS guarantee: est >= true for EVERY key, and exact when the
        sketch is wide enough that no collision occurred."""
        keys = ["a"] * 50 + ["b"] * 7 + ["c"] * 1 + ["d"] * 13
        df = _df(spark, keys)
        sketch = count_min_build(df, "k", depth=4, width=1024)
        est = {
            r.k: r.est_cnt
            for r in count_min_estimate(
                sketch, _df(spark, ["a", "b", "c", "d", "zzz"]).distinct(),
                "k", depth=4, width=1024,
            ).collect()
        }
        true = {"a": 50, "b": 7, "c": 1, "d": 13, "zzz": 0}
        for k, t in true.items():
            assert est[k] >= t, k
        # 4 distinct keys in 4x1024 counters: collisions are possible in
        # principle but the min over 4 independent rows must be exact here
        assert est == true

    def test_sketch_size_bounded_by_depth_width(self, spark):
        df = _df(spark, [f"k{i}" for i in range(500)])
        sketch = count_min_build(df, "k", depth=3, width=16)
        assert sketch.count() <= 3 * 16
        rows = sketch.collect()
        assert {r.row for r in rows} <= {0, 1, 2}
        assert all(0 <= r.bucket < 16 for r in rows)
        # total mass per row = number of input rows
        per_row = {}
        for r in rows:
            per_row[r.row] = per_row.get(r.row, 0) + r.cnt
        assert set(per_row.values()) == {500}

    def test_merge_by_addition(self, spark):
        """Sketches of two partitions summed counter-wise equal the
        sketch of the union — the property that makes CMS build a plain
        hash aggregate at any scale."""
        a, b = ["x"] * 5 + ["y"] * 2, ["x"] * 3 + ["z"] * 4
        sa = count_min_build(_df(spark, a), "k", depth=2, width=32)
        sb = count_min_build(_df(spark, b), "k", depth=2, width=32)
        merged = (
            sa.unionByName(sb)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        direct = count_min_build(_df(spark, a + b), "k", depth=2, width=32)
        assert {
            (r.row, r.bucket, r.cnt) for r in merged.collect()
        } == {(r.row, r.bucket, r.cnt) for r in direct.collect()}

    def test_narrow_sketch_overcounts_but_bounded(self, spark):
        """Force collisions (width 2): estimates still >= true and <=
        total mass."""
        keys = ["a"] * 10 + ["b"] * 20 + ["c"] * 30
        sketch = count_min_build(_df(spark, keys), "k", depth=3, width=2)
        est = {
            r.k: r.est_cnt
            for r in count_min_estimate(
                sketch, _df(spark, ["a", "b", "c"]).distinct(), "k",
                depth=3, width=2,
            ).collect()
        }
        true = {"a": 10, "b": 20, "c": 30}
        for k in true:
            assert true[k] <= est[k] <= 60


class TestHyperLogLog:
    def test_estimate_within_expected_error(self, spark):
        """2^9 registers -> ~4.6% standard error; 5000 distinct keys must
        estimate within 15% (3 sigma)."""
        from kernel_memory_spark.operators.sketch import (
            hll_build,
            hll_estimate,
        )

        df = _df(spark, [f"user{i}" for i in range(5000)])
        est = hll_estimate(hll_build(df, "k", p=9), p=9).collect()[0]
        assert abs(est.est_distinct - 5000) / 5000 < 0.15

    def test_duplicates_do_not_move_estimate(self, spark):
        """Registers are MAX-aggregated: feeding every key 10x yields the
        identical register table and estimate."""
        from kernel_memory_spark.operators.sketch import (
            hll_build,
            hll_estimate,
        )

        once = [f"u{i}" for i in range(800)]
        r1 = hll_build(_df(spark, once), "k", p=7)
        r2 = hll_build(_df(spark, once * 10), "k", p=7)
        assert {
            (r.bucket, r.max_rank) for r in r1.collect()
        } == {(r.bucket, r.max_rank) for r in r2.collect()}
        e1 = hll_estimate(r1, p=7).collect()[0].est_distinct
        e2 = hll_estimate(r2, p=7).collect()[0].est_distinct
        assert e1 == e2

    def test_small_range_linear_counting(self, spark):
        """A handful of keys triggers the linear-counting branch and is
        near-exact."""
        from kernel_memory_spark.operators.sketch import (
            hll_build,
            hll_estimate,
        )

        df = _df(spark, [f"k{i}" for i in range(20)])
        est = hll_estimate(hll_build(df, "k", p=9), p=9).collect()[0]
        assert abs(est.est_distinct - 20) <= 2

    def test_merge_by_max(self, spark):
        """union+MAX of two register tables equals the sketch of the
        union of the inputs."""
        from kernel_memory_spark.operators.sketch import hll_build

        a = [f"a{i}" for i in range(300)]
        b = [f"b{i}" for i in range(300)] + a[:100]
        ra, rb = hll_build(_df(spark, a), "k"), hll_build(_df(spark, b), "k")
        merged = (
            ra.unionByName(rb)
            .groupBy("bucket")
            .agg(F.max("max_rank").alias("max_rank"))
        )
        direct = hll_build(_df(spark, a + b), "k")
        assert {
            (r.bucket, r.max_rank) for r in merged.collect()
        } == {(r.bucket, r.max_rank) for r in direct.collect()}


class TestBloom:
    def test_no_false_negatives_and_fp_rate(self, spark):
        from kernel_memory_spark.operators.sketch import (
            bloom_build,
            bloom_probe,
        )

        members = [f"m{i}" for i in range(500)]
        others = [f"x{i}" for i in range(500)]
        bloom = bloom_build(_df(spark, members), "k", 4096, 3)
        got = {
            r.k: r.maybe_member
            for r in bloom_probe(
                bloom, _df(spark, members + others), "k", 4096, 3
            ).collect()
        }
        assert all(got[m] for m in members)  # NEVER a false negative
        fp = sum(1 for o in others if got[o])
        # k=3, n=500, m=4096 -> theoretical fp ~ (1-e^{-3*500/4096})^3
        # ~ 2.9%; 500 trials, allow generous slack
        assert fp / 500 < 0.10

    def test_union_by_distinct_bits(self, spark):
        from kernel_memory_spark.operators.sketch import bloom_build

        a = [f"a{i}" for i in range(100)]
        b = [f"b{i}" for i in range(100)]
        ba = bloom_build(_df(spark, a), "k", 1024, 3)
        bb = bloom_build(_df(spark, b), "k", 1024, 3)
        merged = ba.unionByName(bb).distinct()
        direct = bloom_build(_df(spark, a + b), "k", 1024, 3)
        assert {r.bit for r in merged.collect()} == {
            r.bit for r in direct.collect()
        }


class TestCmsJoinSize:
    def test_estimate_upper_bounds_true_join(self, spark):
        from kernel_memory_spark.operators.sketch import (
            cms_join_size,
            count_min_build,
        )

        a = ["x"] * 10 + ["y"] * 5 + ["z"] * 2
        b = ["x"] * 3 + ["y"] * 1 + ["w"] * 9
        true = 10 * 3 + 5 * 1  # 35
        sa = count_min_build(_df(spark, a), "k", depth=4, width=1024)
        sb = count_min_build(_df(spark, b), "k", depth=4, width=1024)
        est = cms_join_size(sa, sb, depth=4).collect()[0].est_join_size
        assert est >= true
        # wide sketch, 4 keys: the min over 4 rows is exact here
        assert est == true

    def test_disjoint_key_sets_estimate_small(self, spark):
        from kernel_memory_spark.operators.sketch import (
            cms_join_size,
            count_min_build,
        )

        sa = count_min_build(
            _df(spark, [f"a{i}" for i in range(50)]), "k", 4, 2048
        )
        sb = count_min_build(
            _df(spark, [f"b{i}" for i in range(50)]), "k", 4, 2048
        )
        est = cms_join_size(sa, sb, depth=4).collect()[0].est_join_size
        assert est <= 5  # only hash collisions contribute


class TestGroupedHll:
    def test_estimates_within_hll_error_and_merge(self, spark):
        from kernel_memory_spark.operators import sketch as SK

        # group A: 500 distinct keys, group B: 30 distinct keys
        rows = [("A", i) for i in range(500)] * 2 + [
            ("B", i) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "g string, k long")
        regs = SK.hll_build_grouped(df, "g", "k", p=6)
        est = {
            r.g: r.est_distinct
            for r in SK.hll_estimate_grouped(regs, "g", p=6).collect()
        }
        # m=64 -> relative error ~1.04/8 = 13%; allow 3 sigma
        assert est["A"] == pytest.approx(500, rel=0.4)
        assert est["B"] == pytest.approx(30, rel=0.4)
        # MAX-merge property: sketch of two halves unions to the whole
        h1 = SK.hll_build_grouped(
            df.filter(F.col("k") < 250), "g", "k", p=6
        )
        h2 = SK.hll_build_grouped(
            df.filter(F.col("k") >= 250), "g", "k", p=6
        )
        merged = (
            h1.unionByName(h2)
            .groupBy("g", "bucket")
            .agg(F.max("max_rank").alias("max_rank"))
        )
        est_m = {
            r.g: r.est_distinct
            for r in SK.hll_estimate_grouped(
                merged, "g", p=6
            ).collect()
        }
        assert est_m == est
