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


# ---------------------------------------------------------------------------
# Property suite (round-3 verdict item #7). The operator's core claims —
# membership is a pure function of (key, salt, fraction), splits are
# disjoint+exhaustive for ANY weight vector — are properties of the md5
# position arithmetic, so hypothesis drives a bit-exact Python mirror of
# _hash_pos at 300+ examples per property, and one Spark test pins the
# mirror to the real column expression (the bridge); layout independence
# is then asserted on Spark across a spread of repartition() widths.
# ---------------------------------------------------------------------------

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_M = SMP._M


def hash_pos_py(key, salt: str) -> int:
    """Bit-exact mirror of sampling._hash_pos (verified by TestHashBridge)."""
    h = hashlib.md5((salt + "|" + str(key)).encode("utf-8")).hexdigest()
    return int(h[:8], 16) % _M


def split_ranges(weights):
    """Mirror of split()'s range arithmetic."""
    total = sum(weights)
    ranges, lo = [], 0.0
    for i, w in enumerate(weights):
        hi = lo + w / total
        hi_i = _M if i == len(weights) - 1 else int(hi * _M)
        ranges.append((int(lo * _M), hi_i))
        lo = hi
    return ranges


texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
)


class TestHashBridge:
    def test_spark_column_matches_python_mirror(self, spark):
        keys = [
            "", "a", "doc-00042", "käse", "日本語", "a|b", "0", "-1",
            "space key", "'quote'", "\\", "x" * 200,
        ] + [f"k{i}" for i in range(100)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got = {
            r.k: r.pos
            for r in df.select(
                "k", SMP._hash_pos("k", "sample").alias("pos")
            ).collect()
        }
        for k in keys:
            assert got[k] == hash_pos_py(k, "sample"), repr(k)


class TestSplitProperties:
    @settings(max_examples=300, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        keys=st.lists(texts, min_size=1, max_size=20),
        weights=st.lists(
            st.floats(min_value=1e-3, max_value=100.0,
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=6,
        ),
        salt=st.text(max_size=8),
    )
    def test_disjoint_and_exhaustive(self, keys, weights, salt):
        """Every key lands in EXACTLY one split for any weight vector —
        no key lost at a range boundary, none duplicated."""
        ranges = split_ranges(weights)
        assert ranges[0][0] == 0 and ranges[-1][1] == _M
        # consecutive ranges share their boundary (no crack, no overlap)
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi == lo
        for k in keys:
            pos = hash_pos_py(k, salt or "split")
            hits = [i for i, (a, b) in enumerate(ranges) if a <= pos < b]
            assert len(hits) == 1

    @settings(max_examples=300, deadline=None)
    @given(
        key=texts,
        f1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        f2=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    )
    def test_sample_membership_monotone_in_fraction(self, key, f1, f2):
        """Growing the sampling rate only ADDS members (the training-mix
        reproducibility contract: a 10% sample is a subset of the 20%)."""
        lo, hi = sorted((f1, f2))
        pos = hash_pos_py(key, "sample")
        if pos < int(lo * _M):
            assert pos < int(hi * _M)


class TestLayoutInvariance:
    @pytest.mark.parametrize("n", [1, 2, 7, 17, 32, 64])
    def test_sample_invariant_under_repartition(self, spark, n):
        df = spark.range(0, 4000).withColumnRenamed("id", "k")
        base = {r.k for r in SMP.deterministic_sample(df, "k", 0.2).collect()}
        got = {
            r.k
            for r in SMP.deterministic_sample(
                df.repartition(n), "k", 0.2
            ).collect()
        }
        assert got == base

    @pytest.mark.parametrize("n", [3, 29])
    def test_split_invariant_under_repartition(self, spark, n):
        df = spark.range(0, 4000).withColumnRenamed("id", "k")
        parts = SMP.split(df, "k", (0.7, 0.2, 0.1))
        reparts = SMP.split(df.repartition(n), "k", (0.7, 0.2, 0.1))
        for a, b in zip(parts, reparts):
            assert {r.k for r in a.collect()} == {r.k for r in b.collect()}


class TestReferentialSample:
    def test_fk_integrity_and_determinism(self, spark):
        from kernel_memory_spark.operators import sampling as SMP

        parent = spark.createDataFrame(
            [(i,) for i in range(200)], "pk long"
        )
        child = spark.createDataFrame(
            [(i, i % 200) for i in range(1000)], "id long, fk long"
        )
        sp, kids = SMP.referential_sample(
            parent, {"c": (child, "fk")}, "pk", 0.25
        )
        pks = {r.pk for r in sp.collect()}
        crows = kids["c"].collect()
        # every surviving FK resolves to a surviving parent
        assert all(r.fk in pks for r in crows)
        # child keeps EXACTLY the rows of surviving parents (no loss)
        assert len(crows) == 5 * len(pks)
        # deterministic under re-run and repartition
        sp2, kids2 = SMP.referential_sample(
            parent.repartition(7), {"c": (child.repartition(5), "fk")},
            "pk", 0.25,
        )
        assert {r.pk for r in sp2.collect()} == pks
        assert sorted(map(tuple, kids2["c"].collect())) == sorted(
            map(tuple, crows)
        )
        # fraction lands in the statistical ballpark
        assert 0.10 < len(pks) / 200 < 0.45
