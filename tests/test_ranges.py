"""Range (interval) join via time-bucket blocking + multi-grain rollup."""

from datetime import datetime

from pyspark.sql import functions as F

from kernel_memory_spark.operators.ranges import range_join, time_rollup


class TestRangeJoin:
    def test_containment_semantics(self, spark):
        points = spark.createDataFrame(
            [("p1", 50), ("p2", 150), ("p3", 7300), ("p4", 99999)],
            "pid string, ts_s long",
        )
        intervals = spark.createDataFrame(
            [("i1", 0, 100), ("i2", 40, 200), ("i3", 7000, 8000)],
            "iid string, start_s long, end_s long",
        )
        got = {
            (r.pid, r.iid)
            for r in range_join(points, intervals, bucket_width=3600).collect()
        }
        assert got == {("p1", "i1"), ("p1", "i2"), ("p2", "i2"),
                       ("p3", "i3")}

    def test_interval_spanning_many_buckets(self, spark):
        points = spark.createDataFrame(
            [("p1", 5000)], "pid string, ts_s long"
        )
        intervals = spark.createDataFrame(
            [("wide", 0, 40000)], "iid string, start_s long, end_s long"
        )
        got = range_join(points, intervals, bucket_width=3600).collect()
        assert len(got) == 1  # matched once despite covering 12 buckets

    def test_keys_restrict_matches(self, spark):
        points = spark.createDataFrame(
            [("u1", "p1", 50), ("u2", "p2", 50)],
            "user string, pid string, ts_s long",
        )
        intervals = spark.createDataFrame(
            [("u1", "i1", 0, 100)],
            "user string, iid string, start_s long, end_s long",
        )
        got = range_join(
            points, intervals, keys=["user"], bucket_width=100
        ).collect()
        assert [(r.pid, r.iid) for r in got] == [("p1", "i1")]

    def test_no_nested_loop_join_in_plan(self, spark):
        points = spark.createDataFrame([("p1", 50)], "pid string, ts_s long")
        intervals = spark.createDataFrame(
            [("i1", 0, 100)], "iid string, start_s long, end_s long"
        )
        plan = range_join(points, intervals)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestTimeRollup:
    def test_grains_match_separate_aggregations(self, spark):
        events = spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 10, 5), "a", 1.0),
             (2, datetime(2024, 1, 1, 10, 55), "a", 2.0),
             (3, datetime(2024, 1, 1, 11, 5), "a", 3.0),
             (4, datetime(2024, 1, 2, 9, 0), "b", 4.0)],
            "event_id long, ts timestamp, event_type string, value double",
        )
        out = time_rollup(events, sum_col="value")
        rows = {(r.grain, r.bucket_start, r.event_type): (r.n, r.total)
                for r in out.collect()}
        assert rows[("hour", datetime(2024, 1, 1, 10, 0), "a")] == (2, 3.0)
        assert rows[("day", datetime(2024, 1, 1), "a")] == (3, 6.0)
        assert rows[("month", datetime(2024, 1, 1), "a")] == (3, 6.0)
        assert rows[("month", datetime(2024, 1, 1), "b")] == (1, 4.0)
        # one pass: hour+day+month rows all present
        assert {g for g, _, _ in rows} == {"hour", "day", "month"}


class TestRangeJoinFloor:
    def test_negative_timestamps_bucket_with_floor(self, spark):
        # pre-1970 epochs: cast('long') truncates toward zero, which would
        # put ts=-10 in bucket 0 instead of -1 and miss the containing
        # interval (ADVICE r3) — floor() buckets correctly
        points = spark.createDataFrame(
            [("p1", -10), ("p2", -3600), ("p3", -1)],
            "pid string, ts_s long",
        )
        intervals = spark.createDataFrame(
            [("i1", -100, -5), ("i2", -4000, -3000)],
            "iid string, start_s long, end_s long",
        )
        got = {
            (r.pid, r.iid)
            for r in range_join(points, intervals, bucket_width=3600).collect()
        }
        assert got == {("p1", "i1"), ("p2", "i2")}


class TestCubeCounts:
    def test_all_grouping_sets_present(self, spark):
        """2 dims -> 4 grouping sets; gid bitmask has the leftmost dim as
        the most significant bit (SQL GROUPING() convention)."""
        from kernel_memory_spark.operators.ranges import cube_counts

        df = spark.createDataFrame(
            [("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 4.0)],
            "s string, p string, v double",
        )
        rows = cube_counts(df, ["s", "p"], sum_col="v").collect()
        by_gid = {}
        for r in rows:
            by_gid.setdefault(r.gid, []).append(r)
        assert set(by_gid) == {0, 1, 2, 3}
        # gid=3: grand total, both dims aggregated away (NULL)
        gt = by_gid[3][0]
        assert gt.s is None and gt.p is None
        assert gt.n == 3 and gt.total == 7.0
        # gid=1: p aggregated away (LSB = rightmost dim), s kept
        s_only = {r.s: (r.n, r.total) for r in by_gid[1]}
        assert s_only == {"A": (2, 3.0), "B": (1, 4.0)}
        # gid=2: s aggregated away (MSB = leftmost dim), p kept
        p_only = {r.p: (r.n, r.total) for r in by_gid[2]}
        assert p_only == {"x": (2, 5.0), "y": (1, 2.0)}
        # gid=0: full detail
        assert len(by_gid[0]) == 3

    def test_single_shuffle_expand_plan(self, spark):
        """The cube compiles to ONE Expand + aggregate, not 2^d scans."""
        from kernel_memory_spark.operators.ranges import cube_counts

        df = spark.createDataFrame([("A", "x")], "s string, p string")
        plan = (
            cube_counts(df, ["s", "p"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Expand") == 1


class TestGroupQuantiles:
    def test_matches_sorted_reference(self, spark):
        """Exact discrete quantiles equal the rank-max(1, ceil(q*n))
        element of the sorted values, per group, duplicates included."""
        import math

        from kernel_memory_spark.operators.profile import group_quantiles

        data = [("g1", v) for v in [5.0, 1.0, 3.0, 3.0, 9.0, 7.0, 1.0]]
        data += [("g2", v) for v in [10.0, 20.0]]
        df = spark.createDataFrame(data, "g string, v double")
        qs = [0.0, 0.25, 0.5, 0.9, 1.0]
        got = {
            (r.g, r.q): (r.value, r.n)
            for r in group_quantiles(df, ["g"], "v", qs).collect()
        }
        ref = {}
        for g in ("g1", "g2"):
            vals = sorted(v for gg, v in data if gg == g)
            for q in qs:
                rank = max(1, math.ceil(q * len(vals)))
                ref[(g, q)] = (vals[rank - 1], len(vals))
        assert got == ref

    def test_window_ranks_distinct_values_not_rows(self, spark):
        """The pre-aggregate collapses duplicates: a group of 1000 equal
        values feeds a 1-row window, and every quantile is that value."""
        from kernel_memory_spark.operators.profile import group_quantiles

        df = spark.createDataFrame(
            [("g", 42.0)] * 1000, "g string, v double"
        )
        out = group_quantiles(df, ["g"], "v", [0.5, 0.99])
        rows = out.collect()
        assert {(r.q, r.value, r.n) for r in rows} == {
            (0.5, 42.0, 1000),
            (0.99, 42.0, 1000),
        }


class TestSkyline2d:
    def _run(self, spark, pts, n=None):
        from kernel_memory_spark.operators.ranges import skyline_2d

        df = spark.createDataFrame(pts, "x double, y double")
        kw = {"num_partitions": n} if n else {}
        return {
            (r.x, r.y) for r in skyline_2d(df, "x", "y", **kw).collect()
        }

    @staticmethod
    def _brute(pts):
        pts = set(pts)
        return {
            (x, y)
            for x, y in pts
            if not any(
                sx <= x and sy <= y and (sx < x or sy < y)
                for sx, sy in pts
                if (sx, sy) != (x, y)
            )
        }

    def test_matches_brute_force_dominance(self, spark):
        pts = [
            (1.0, 9.0), (2.0, 7.0), (3.0, 8.0), (4.0, 3.0),
            (5.0, 3.0), (6.0, 1.0), (7.0, 2.0), (1.0, 12.0),
        ]
        assert self._run(spark, pts) == self._brute(pts)

    def test_partition_count_invariance(self, spark):
        """The broadcast-prefix-minima construction returns the same
        frontier at any range-partition count (incl. partitions whose
        rows all dominate / are all dominated)."""
        import random

        rng = random.Random(7)
        pts = [
            (float(rng.randrange(100)), float(rng.randrange(100)))
            for _ in range(200)
        ]
        ref = self._brute(pts)
        for n in (1, 2, 7, 32):
            assert self._run(spark, pts, n=n) == ref, n

    def test_same_x_collapses_to_min_y(self, spark):
        got = self._run(spark, [(1.0, 5.0), (1.0, 3.0), (2.0, 4.0)])
        assert got == {(1.0, 3.0)}  # (2,4) dominated by... no: 4 > 3 -> dropped

    def test_monotone_chain_all_kept(self, spark):
        pts = [(float(i), float(10 - i)) for i in range(5)]
        assert self._run(spark, pts) == set(pts)


class TestMadOutliers:
    def test_hand_computed(self, spark):
        from kernel_memory_spark.operators import profile as PR

        # group A: values 1..9 plus a wild 1000
        # median (discrete, rank ceil(10/2)=5 ascending) = 5
        # absdevs: 4,3,2,1,0,1,2,3,4,995 -> sorted 0,1,1,2,2,3,3,4,4,995
        # MAD = rank-5 value = 2; outliers: |x-5| > 6 -> only 1000
        rows = [("A", float(v)) for v in range(1, 10)] + [("A", 1000.0)]
        rows += [("B", 7.0), ("B", 7.0), ("B", 7.0)]  # constant group
        df = spark.createDataFrame(rows, "g string, x double")
        out = {
            r.g: r
            for r in PR.mad_outliers(df, ["g"], "x", k=3.0).collect()
        }
        assert out["A"].median == 5.0
        assert out["A"].mad == 2.0
        assert out["A"].n == 10
        assert out["A"].n_outliers == 1
        # constant group: MAD = 0, nothing strictly exceeds 0 deviation
        assert out["B"].mad == 0.0
        assert out["B"].n_outliers == 0


class TestGroupPercentileRank:
    def test_matches_native_percent_rank_with_ties(self, spark):
        from pyspark.sql import Window as W

        from kernel_memory_spark.operators import profile as PR

        rows = [
            ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0),
            ("a", 4, 30.0), ("b", 5, 7.0), ("b", 6, 7.0),
            ("c", 7, 99.0),  # singleton group -> 0.0
        ]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        got = {
            r.id: r.pct_rank
            for r in PR.group_percentile_rank(
                df, ["g"], "v"
            ).collect()
        }
        native = {
            r.id: r.pr
            for r in df.select(
                "id",
                F.percent_rank()
                .over(W.partitionBy("g").orderBy("v"))
                .alias("pr"),
            ).collect()
        }
        assert got == native
        assert got[7] == 0.0
        assert got[2] == got[3]  # ties share min rank
