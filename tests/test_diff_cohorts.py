"""table_diff/snapshot_diff (operators/diff.py), retention_cohorts
(operators/sessions.py), rank_facts (operators/kgschema.py)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from kernel_memory_spark.operators import diff as DF_
from kernel_memory_spark.operators import kgschema as KS
from kernel_memory_spark.operators import sessions as SS


class TestTableDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
             (4, None, 40.0)],
            "k long, s string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "B", 25.0), (4, "d", 40.0),
             (5, "e", 50.0)],
            "k long, s string, v double",
        )
        return old, new

    def test_classification_and_changed_cols(self, spark):
        old, new = self._frames(spark)
        got = {
            r.k: (r.change, tuple(r.changed_cols))
            for r in DF_.table_diff(old, new, ["k"]).collect()
        }
        assert got == {
            2: ("changed", ("s", "v")),
            3: ("removed", ()),
            4: ("changed", ("s",)),  # None -> 'd' is a change
            5: ("added", ()),
        }
        assert 1 not in got  # unchanged rows omitted

    def test_compare_cols_subset(self, spark):
        old, new = self._frames(spark)
        got = {
            r.k: r.change
            for r in DF_.table_diff(
                old, new, ["k"], compare_cols=["v"]
            ).collect()
        }
        # key 4's only difference is s, which is not compared
        assert got == {2: "changed", 3: "removed", 5: "added"}

    def test_null_equality_is_not_a_change(self, spark):
        old = spark.createDataFrame([(1, None)], "k long, s string")
        new = spark.createDataFrame([(1, None)], "k long, s string")
        assert DF_.table_diff(old, new, ["k"]).count() == 0

    def test_snapshot_diff_over_catalog(self, spark, tmp_path):
        from kernel_memory_spark.sources.tables import TableCatalog

        cat = TableCatalog(str(tmp_path))
        v1 = spark.createDataFrame(
            [(1, "x"), (2, "y")], "k long, s string"
        )
        cat.overwrite(v1, "t")
        old_v = cat.current_version("t")
        cat.merge(spark, "t",
                  spark.createDataFrame([(2, "z"), (3, "w")],
                                        "k long, s string"), "k")
        got = {
            r.k: r.change
            for r in DF_.snapshot_diff(
                cat, spark, "t", old_v, cat.current_version("t"), ["k"]
            ).collect()
        }
        assert got == {2: "changed", 3: "added"}


class TestRetentionCohorts:
    def test_triangle(self, spark):
        t0 = dt.datetime(2024, 1, 1, 12, 0)
        wk = dt.timedelta(days=7)
        rows = [
            # u1, u2 start week 0; u1 returns weeks 1 and 2, u2 only 2
            (1, t0), (2, t0), (1, t0 + wk), (1, t0 + 2 * wk),
            (2, t0 + 2 * wk),
            # u3 starts week 1
            (3, t0 + wk),
            # duplicate events same week must not double-count
            (1, t0 + dt.timedelta(hours=3)),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r.cohort.day, r.period.day): (r.n_active, r.n_cohort)
            for r in SS.retention_cohorts(ev).collect()
        }
        assert got == {
            (1, 1): (2, 2), (1, 8): (1, 2), (1, 15): (2, 2),
            (8, 8): (1, 1),
        }

    def test_retention_ratio(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, t0) for i in range(4)] + [
            (0, t0 + dt.timedelta(days=7))
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        r = {
            r.period.day: r.retention
            for r in SS.retention_cohorts(ev).collect()
        }
        assert r == {1: 1.0, 8: 0.25}


class TestRankFacts:
    def test_informativeness_ordering(self, spark):
        # 'common' fact shared by all 4 subjects, 'rare' by one
        rows = [(f"s{i}", "t", "common") for i in range(4)]
        rows += [("s0", "m", "rare"), ("s0", "m", "semi"),
                 ("s1", "m", "semi")]
        t = spark.createDataFrame(rows, "subj string, pred string, obj string")
        got = {
            (r.subj, r.rank): (r.pred, r.obj, r.df, r.score)
            for r in KS.rank_facts(t, k=2).collect()
        }
        assert got[("s0", 1)][:2] == ("m", "rare")
        assert got[("s0", 1)][3] == pytest.approx(
            round(math.log(4 / 1), 6)
        )
        assert got[("s0", 2)][:2] == ("m", "semi")
        # subjects with only the common fact still get it, score ln(1)=0
        assert got[("s2", 1)] == ("t", "common", 4, 0.0)

    def test_duplicate_triples_counted_once(self, spark):
        rows = [("s0", "p", "x"), ("s0", "p", "x"), ("s1", "p", "x")]
        t = spark.createDataFrame(rows, "subj string, pred string, obj string")
        got = KS.rank_facts(t, k=1).collect()
        assert all(r.df == 2 for r in got)
        assert len(got) == 2
