"""As-of join (union + ordered-window; one shuffle, no range-join blowup)."""

from pyspark.sql import functions as F

from kernel_memory_spark.operators.asof import asof_join


def frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "e1"), ("u1", 25, "e2"), ("u1", 5, "e0"),
         ("u2", 50, "e3")],
        "user string, ts long, event string",
    )
    right = spark.createDataFrame(
        [("u1", 8, "A"), ("u1", 20, "B"), ("u1", 25, "C"), ("u3", 1, "Z")],
        "user string, ts long, label string",
    )
    return left, right


class TestAsofJoin:
    def test_backward(self, spark):
        left, right = frames(spark)
        got = {
            r.event: (r.label_asof, r.matched_asof_ts)
            for r in asof_join(left, right, ["user"]).collect()
        }
        assert got["e0"] == (None, None)   # nothing at-or-before ts=5
        assert got["e1"] == ("A", 8)       # latest <= 10
        assert got["e2"] == ("C", 25)      # equal ts matches
        assert got["e3"] == (None, None)   # u2 has no right rows

    def test_forward(self, spark):
        left, right = frames(spark)
        got = {
            r.event: (r.label_asof, r.matched_asof_ts)
            for r in asof_join(
                left, right, ["user"], direction="forward"
            ).collect()
        }
        assert got["e0"] == ("A", 8)       # earliest >= 5
        assert got["e1"] == ("B", 20)
        assert got["e2"] == ("C", 25)
        assert got["e3"] == (None, None)

    def test_single_shuffle_plan(self, spark):
        left, right = frames(spark)
        plan = asof_join(left, right, ["user"])._jdf.queryExecution() \
            .executedPlan().toString()
        # no cartesian/range join; the union sorts once per key
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
