"""Gap-based sessionization (one user-window lag + cumsum, no joins)."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import sessions as SESS


def ev(uid, eid, minute, second=0):
    return (eid, datetime(2024, 1, 1, 10, minute, second), uid)


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        df = spark.createDataFrame(
            [
                ev(1, 1, 0), ev(1, 2, 5), ev(1, 3, 40),   # gap 35m -> new
                ev(1, 4, 41), ev(2, 5, 0),                # other user
            ],
            "event_id long, ts timestamp, user_id long",
        )
        got = {
            r.event_id: (r.session_n, r.session_id)
            for r in SESS.sessionize(df, gap_seconds=1800).collect()
        }
        assert got[1] == (1, "1#1") and got[2] == (1, "1#1")
        assert got[3] == (2, "1#2") and got[4] == (2, "1#2")
        assert got[5] == (1, "2#1")

    def test_exact_gap_boundary_stays_in_session(self, spark):
        # the split condition is STRICTLY greater than gap
        df = spark.createDataFrame(
            [ev(1, 1, 0), ev(1, 2, 30)],
            "event_id long, ts timestamp, user_id long",
        )
        got = SESS.sessionize(df, gap_seconds=1800).collect()
        assert {r.session_n for r in got} == {1}

    def test_session_stats(self, spark):
        df = spark.createDataFrame(
            [ev(1, 1, 0), ev(1, 2, 10), ev(1, 3, 50)],
            "event_id long, ts timestamp, user_id long",
        )
        stats = {
            r.session_id: (r.n_events, r.duration_sec)
            for r in SESS.session_stats(
                SESS.sessionize(df, gap_seconds=1800)
            ).collect()
        }
        assert stats == {"1#1": (2, 600), "1#2": (1, 0)}


class TestFunnel:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )

    def test_ordered_completion(self, spark):
        import datetime as dt

        T = dt.datetime
        from kernel_memory_spark.operators.sessions import funnel

        rows = [
            # u1 completes in order
            (1, T(2024, 1, 1, 10), "view"),
            (1, T(2024, 1, 1, 11), "click"),
            (1, T(2024, 1, 1, 12), "purchase"),
            # u2 clicks BEFORE viewing: click must not count
            (2, T(2024, 1, 1, 9), "click"),
            (2, T(2024, 1, 1, 10), "view"),
            # u3 views only
            (3, T(2024, 1, 1, 8), "view"),
            # u4 never views -> absent entirely
            (4, T(2024, 1, 1, 8), "purchase"),
        ]
        out = {
            r.user_id: (r.t_1, r.t_2, r.t_3, r.steps_completed)
            for r in funnel(
                self._events(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1][3] == 3
        assert out[2] == (T(2024, 1, 1, 10), None, None, 1)
        assert out[3][3] == 1

    def test_earliest_qualifying_step_time(self, spark):
        import datetime as dt

        T = dt.datetime
        from kernel_memory_spark.operators.sessions import funnel

        rows = [
            (1, T(2024, 1, 1, 10), "view"),
            (1, T(2024, 1, 1, 11), "click"),
            (1, T(2024, 1, 1, 12), "click"),  # later click ignored
        ]
        row = funnel(
            self._events(spark, rows), ["view", "click"]
        ).collect()[0]
        assert row.t_2 == T(2024, 1, 1, 11)


class TestEventTransitions:
    def test_counts_and_row_normalization(self, spark):
        from kernel_memory_spark.operators.sessions import event_transitions

        rows = [
            # user 1: a -> b -> a -> c ; user 2: a -> b
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 1, "2024-01-01 00:01:00", "b"),
            (3, 1, "2024-01-01 00:02:00", "a"),
            (4, 1, "2024-01-01 00:03:00", "c"),
            (5, 2, "2024-01-01 00:00:00", "a"),
            (6, 2, "2024-01-01 00:05:00", "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            (r.from_type, r.to_type): (r.n, r.prob)
            for r in event_transitions(df).collect()
        }
        assert got == {
            ("a", "b"): (2, round(2 / 3, 6)),
            ("a", "c"): (1, round(1 / 3, 6)),
            ("b", "a"): (1, 1.0),
        }

    def test_no_cross_user_transitions(self, spark):
        from kernel_memory_spark.operators.sessions import event_transitions

        rows = [
            (1, 1, "2024-01-01 00:00:00", "a"),
            (2, 2, "2024-01-01 00:01:00", "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        assert event_transitions(df).count() == 0

    def test_simultaneous_events_tie_break_by_id(self, spark):
        from kernel_memory_spark.operators.sessions import event_transitions

        rows = [
            (2, 1, "2024-01-01 00:00:00", "x"),
            (1, 1, "2024-01-01 00:00:00", "y"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = [
            (r.from_type, r.to_type)
            for r in event_transitions(df).collect()
        ]
        assert got == [("y", "x")]  # id 1 first


class TestBurstScores:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_burst_scores_against_reference(self, spark):
        """Steady 2-per-hour baseline then a 10-event burst: the burst
        bucket's z equals (10 - mean)/sd over the preceding buckets."""
        import statistics

        from kernel_memory_spark.operators.sessions import burst_scores

        rows, eid = [], 0
        counts = [2, 2, 2, 2, 10]
        for h, c in enumerate(counts):
            for i in range(c):
                eid += 1
                rows.append((eid, 1, f"2024-01-01 {h:02d}:{i:02d}:00", "a"))
        got = {
            r.bucket_start.hour: (r.n, r.trail_mean, r.z)
            for r in burst_scores(self._events(spark, rows)).collect()
        }
        # hour 4: baseline = [2,2,2,2] -> sd 0 -> z NULL? No: sd of
        # constant series is 0 -> NULL by contract
        assert got[4][0] == 10 and got[4][1] == 2.0 and got[4][2] is None
        # make the baseline non-constant: verify against statistics module
        rows2, eid = [], 0
        counts2 = [1, 3, 2, 4, 10]
        for h, c in enumerate(counts2):
            for i in range(c):
                eid += 1
                rows2.append((eid, 1, f"2024-01-02 {h:02d}:{i:02d}:00", "b"))
        got2 = {
            r.bucket_start.hour: r.z
            for r in burst_scores(self._events(spark, rows2)).collect()
        }
        base = counts2[:4]
        ref = (10 - statistics.mean(base)) / statistics.stdev(base)
        assert got2[4] == pytest.approx(ref, abs=1e-6)

    def test_cold_start_null(self, spark):
        from kernel_memory_spark.operators.sessions import burst_scores

        rows = [(1, 1, "2024-01-01 00:00:00", "a"),
                (2, 1, "2024-01-01 01:00:00", "a")]
        got = sorted(
            (r.bucket_start.hour, r.z)
            for r in burst_scores(self._events(spark, rows)).collect()
        )
        # first bucket: 0 preceding; second: 1 preceding -> both NULL
        assert got == [(0, None), (1, None)]

    def test_types_isolated(self, spark):
        from kernel_memory_spark.operators.sessions import burst_scores

        rows = [(i, 1, f"2024-01-01 {h:02d}:00:00", t)
                for i, (h, t) in enumerate(
                    [(0, "a"), (1, "a"), (2, "a"), (0, "b")]
                )]
        got = burst_scores(self._events(spark, rows)).collect()
        by_type = {}
        for r in got:
            by_type.setdefault(r.event_type, []).append(r)
        assert len(by_type["b"]) == 1  # b's baseline never sees a's buckets
