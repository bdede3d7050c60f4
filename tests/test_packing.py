"""Packing/sharding (operators/packing.py) and temperature mixing
(operators/sampling.py): exact invariants + layout independence."""

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import packing as PK
from kernel_memory_spark.operators import sampling as SMP


def _docs(spark, toks):
    rows = [(i, t) for i, t in enumerate(toks)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


class TestGlobalCumsum:
    def test_matches_driver_prefix_sum(self, spark):
        toks = [(i * 37 + 11) % 97 + 1 for i in range(200)]
        out = PK.global_cumsum(
            _docs(spark, toks), "doc_id", "n_tokens", num_partitions=7
        )
        got = {r.doc_id: r.cum_before for r in out.collect()}
        acc = 0
        for i, t in enumerate(toks):
            assert got[i] == acc, i
            acc += t

    def test_layout_independent(self, spark):
        toks = [5, 10, 1, 99, 3, 42, 7, 8]
        df = _docs(spark, toks)
        a = {
            r.doc_id: r.cum_before
            for r in PK.global_cumsum(df, "doc_id", "n_tokens").collect()
        }
        b = {
            r.doc_id: r.cum_before
            for r in PK.global_cumsum(
                df.repartition(5), "doc_id", "n_tokens", num_partitions=3
            ).collect()
        }
        assert a == b


class TestShardByBudget:
    def test_shards_are_contiguous_and_budget_bounded(self, spark):
        toks = [(i * 13 + 7) % 50 + 1 for i in range(300)]
        out = PK.shard_by_budget(
            _docs(spark, toks), "n_tokens", "doc_id", budget=100
        )
        rows = sorted(out.collect(), key=lambda r: r.doc_id)
        # shard ids non-decreasing in key order (contiguity)
        shards = [r.shard for r in rows]
        assert shards == sorted(shards)
        # exclusive-cumsum rule: doc goes to shard floor(cum_before/100)
        acc = 0
        for r in rows:
            assert r.shard == acc // 100
            acc += r.n_tokens
        # every shard except the last ends with a document that crosses its
        # upper boundary (documents are never split, so the boundary doc is
        # counted into the shard it started in)
        end = {}  # shard -> cum_after of its last doc
        acc = 0
        for r in rows:
            acc += r.n_tokens
            end[r.shard] = acc
        last = max(end)
        for s, cum_after in end.items():
            if s != last:
                assert cum_after >= (s + 1) * 100


class TestFirstFitPacking:
    def test_partition_of_inputs_and_capacity(self, spark):
        toks = [(i * 17 + 3) % 120 + 1 for i in range(400)]
        df = _docs(spark, toks)
        out = PK.pack_first_fit(
            df, "doc_id", "n_tokens", budget=100, n_groups=8
        ).collect()
        # every doc exactly once
        assert sorted(int(r.doc_id) for r in out) == list(range(400))
        sums, oversize = {}, 0
        for r in out:
            if r.oversize:
                oversize += 1
                assert r.n_tokens > 100
                continue
            sums[r.pack_id] = sums.get(r.pack_id, 0) + r.n_tokens
        assert all(v <= 100 for v in sums.values())
        assert oversize == sum(1 for t in toks if t > 100)

    def test_deterministic_under_layout(self, spark):
        toks = [(i * 29 + 5) % 90 + 1 for i in range(150)]
        df = _docs(spark, toks)
        a = sorted(
            map(tuple, PK.pack_first_fit(df, "doc_id", "n_tokens", 64).collect())
        )
        b = sorted(
            map(
                tuple,
                PK.pack_first_fit(
                    df.repartition(11), "doc_id", "n_tokens", 64
                ).collect(),
            )
        )
        assert a == b

    def test_tree_placement_identical_to_linear_scan(self):
        """The O(log b) leftmost-fit segment tree places every item in
        exactly the bin a linear first-fit scan would pick — the r5
        speedup must not change packing output."""
        import random

        rng = random.Random(20260817)
        for trial in range(40):
            budget = rng.choice([16, 100, 1000])
            toks = [rng.randint(0, budget) for _ in range(rng.randint(1, 400))]
            toks.sort(reverse=True)  # FFD order, as the operator sorts
            tree = PK._FirstFitBins(budget)
            caps = []  # reference: linear scan over remaining capacities
            for t in toks:
                ref = next(
                    (i for i, c in enumerate(caps) if c >= t), None
                )
                if ref is None:
                    caps.append(budget)
                    ref = len(caps) - 1
                caps[ref] -= t
                got = tree.place(t)
                assert got == ref, (trial, t, caps)
            assert caps == tree.cap

    def test_spark_output_matches_driver_reference(self, spark):
        """End-to-end: pack_first_fit output equals a driver-side linear
        first-fit reference with the same grouping + FFD order."""
        import zlib

        toks = [(i * 31 + 9) % 130 + 1 for i in range(300)]
        budget, n_groups = 100, 4
        out = {
            (r.pack_id, r.doc_id)
            for r in PK.pack_first_fit(
                _docs(spark, toks), "doc_id", "n_tokens", budget, n_groups
            ).collect()
        }
        groups = {}
        for i, t in enumerate(toks):
            g = zlib.crc32(str(i).encode()) % n_groups
            groups.setdefault(g, []).append((t, str(i)))
        expect = set()
        for g, items in groups.items():
            items.sort(key=lambda x: (-x[0], x[1]))
            caps = []
            for t, _id in items:
                if t > budget:
                    expect.add((f"{g}:oversize-{_id}", _id))
                    continue
                b = next((i for i, c in enumerate(caps) if c >= t), None)
                if b is None:
                    caps.append(budget)
                    b = len(caps) - 1
                caps[b] -= t
                expect.add((f"{g}:{b}", _id))
        assert out == expect

    def test_auto_group_sizing(self, spark):
        """n_groups=None sizes groups from the data: small input -> floor
        of 32 groups; docs_per_group honored."""
        df = _docs(spark, [10] * 50)
        out = PK.pack_first_fit(df, "doc_id", "n_tokens", 100)
        assert out.count() == 50  # every doc packed once
        df2 = _docs(spark, [10] * 64)
        out2 = PK.pack_first_fit(
            df2, "doc_id", "n_tokens", 100, docs_per_group=2
        )
        n_grp = len({r.pack_id.split(":")[0] for r in out2.collect()})
        assert n_grp > 8  # 64/2 = 32 target groups, most non-empty

    def test_ffd_is_reasonably_tight(self, spark):
        """120 docs of 50 tokens, budget 100 -> FFD within one group packs
        pairs: exactly 60 packs, zero waste."""
        df = _docs(spark, [50] * 120)
        out = PK.pack_first_fit(df, "doc_id", "n_tokens", 100, n_groups=1)
        packs = out.groupBy("pack_id").agg(F.sum("n_tokens").alias("t"))
        rows = packs.collect()
        assert len(rows) == 60
        assert all(r.t == 100 for r in rows)


class TestTemperatureMix:
    def _skewed(self, spark):
        rows = []
        sizes = {"big": 400, "mid": 80, "tiny": 20}
        i = 0
        for src, n in sizes.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, src string"), sizes

    def test_alpha_one_keeps_natural_proportions(self, spark):
        df, sizes = self._skewed(spark)
        out = SMP.temperature_mix(
            df, "src", "doc_id", alpha=1.0, target_frac=0.5
        )
        # alpha=1 -> every source rate is exactly target_frac
        kept = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
        for src, n in sizes.items():
            assert kept.get(src, 0) == pytest.approx(n * 0.5, abs=n * 0.25)

    def test_alpha_half_upweights_tail(self, spark):
        df, sizes = self._skewed(spark)
        out = SMP.temperature_mix(
            df, "src", "doc_id", alpha=0.5, target_frac=0.5
        )
        kept = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
        # tail keep-RATE must exceed head keep-rate
        assert kept["tiny"] / sizes["tiny"] > kept["big"] / sizes["big"]
        # and nothing is upsampled
        for src, n in sizes.items():
            assert kept.get(src, 0) <= n

    def test_subset_and_layout_independent(self, spark):
        df, _ = self._skewed(spark)
        a = sorted(
            r.doc_id
            for r in SMP.temperature_mix(
                df, "src", "doc_id", 0.5, 0.4
            ).collect()
        )
        b = sorted(
            r.doc_id
            for r in SMP.temperature_mix(
                df.repartition(9), "src", "doc_id", 0.5, 0.4
            ).collect()
        )
        assert a == b
        all_ids = {r.doc_id for r in df.collect()}
        assert set(a) <= all_ids

    def test_rate_caps_at_one(self, spark):
        """A 2-row source under alpha=0 with a large target keeps both rows
        (no upsampling past 1.0)."""
        rows = [(i, "big") for i in range(100)] + [(100, "t"), (101, "t")]
        df = spark.createDataFrame(rows, "doc_id long, src string")
        out = SMP.temperature_mix(df, "src", "doc_id", 0.0, 0.9)
        kept = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
        assert kept["t"] == 2


class TestGlobalRank:
    def test_dense_contiguous_and_layout_independent(self, spark):
        import random

        keys = random.Random(7).sample(range(10000), 500)
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        out = {r.k: r.idx for r in PK.global_rank(df, "k").collect()}
        expect = {k: i for i, k in enumerate(sorted(keys))}
        assert out == expect
        out2 = {
            r.k: r.idx
            for r in PK.global_rank(
                df.repartition(13), "k", num_partitions=5
            ).collect()
        }
        assert out2 == expect
