"""Gap-based sessionization (one user-window lag + cumsum, no joins)."""

from datetime import datetime

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
