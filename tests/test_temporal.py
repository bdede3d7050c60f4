"""SCD2 versioning + as-of snapshots (operators/temporal.py) and
predicate profiling (operators/kgschema.py) on hand-built facts."""

import datetime

import pytest

from pyspark.sql import functions as F

from kernel_memory_spark.operators import kgschema as KS
from kernel_memory_spark.operators import temporal as TP


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts timestamp, val string, id long"
    )


TS = datetime.datetime


class TestScd2:
    def test_chain_and_current(self, spark):
        rows = [
            ("a", TS(2024, 1, 1), "x", 1),
            ("a", TS(2024, 2, 1), "y", 2),
            ("a", TS(2024, 3, 1), "z", 3),
            ("b", TS(2024, 1, 15), "q", 4),
        ]
        v = {
            r.id: (r.valid_from, r.valid_to, r.is_current)
            for r in TP.scd2_versions(
                _facts(spark, rows), ["k"], "ts", tiebreak_cols=["id"]
            ).collect()
        }
        assert v[1] == (TS(2024, 1, 1), TS(2024, 2, 1), False)
        assert v[2] == (TS(2024, 2, 1), TS(2024, 3, 1), False)
        assert v[3] == (TS(2024, 3, 1), None, True)
        assert v[4] == (TS(2024, 1, 15), None, True)

    def test_same_ts_tiebreak_deterministic(self, spark):
        rows = [
            ("a", TS(2024, 1, 1), "x", 2),
            ("a", TS(2024, 1, 1), "y", 1),
        ]
        v = {
            r.id: r.is_current
            for r in TP.scd2_versions(
                _facts(spark, rows), ["k"], "ts", tiebreak_cols=["id"]
            ).collect()
        }
        assert v == {1: False, 2: True}

    def test_change_cols_collapse_noop_reupserts(self, spark):
        """Runs of identical values collapse; versions step only on
        actual change."""
        rows = [
            ("a", TS(2024, 1, 1), "x", 1),
            ("a", TS(2024, 2, 1), "x", 2),  # no-op re-upsert, dropped
            ("a", TS(2024, 3, 1), "y", 3),
            ("a", TS(2024, 4, 1), "y", 4),  # no-op, dropped
        ]
        out = TP.scd2_versions(
            _facts(spark, rows), ["k"], "ts",
            tiebreak_cols=["id"], change_cols=["val"],
        ).collect()
        assert sorted(r.id for r in out) == [1, 3]
        v = {r.id: (r.valid_to, r.is_current) for r in out}
        assert v[1] == (TS(2024, 3, 1), False)
        assert v[3] == (None, True)

    def test_as_of_snapshot(self, spark):
        rows = [
            ("a", TS(2024, 1, 1), "x", 1),
            ("a", TS(2024, 3, 1), "y", 2),
            ("b", TS(2024, 2, 10), "q", 3),
        ]
        v = TP.scd2_versions(
            _facts(spark, rows), ["k"], "ts", tiebreak_cols=["id"]
        )
        snap = {
            r.k: r.val
            for r in TP.as_of(v, TS(2024, 2, 15)).collect()
        }
        assert snap == {"a": "x", "b": "q"}
        # boundary: valid_from inclusive, valid_to exclusive
        at_change = {
            r.k: r.val
            for r in TP.as_of(v, TS(2024, 3, 1)).collect()
        }
        assert at_change["a"] == "y"
        # before anything existed for a key
        early = {r.k for r in TP.as_of(v, TS(2024, 1, 20)).collect()}
        assert early == {"a"}


class TestPredicateStats:
    def test_functionality(self, spark):
        triples = spark.createDataFrame(
            [
                ("s1", "name", "Alice"),
                ("s2", "name", "Bob"),
                ("s1", "knows", "s2"),
                ("s1", "knows", "s3"),
                ("s2", "knows", "s3"),
            ],
            "subj string, pred string, obj string",
        )
        out = {r.pred: r for r in KS.predicate_stats(triples).collect()}
        assert out["name"].n_triples == 2
        assert out["name"].functionality == pytest.approx(1.0)
        assert out["name"].inv_functionality == pytest.approx(1.0)
        assert out["knows"].n_triples == 3
        assert out["knows"].n_subj == 2
        assert out["knows"].n_obj == 2
        assert out["knows"].functionality == pytest.approx(
            round(2 / 3, 6)
        )

    def test_approx_mode_runs(self, spark):
        triples = spark.createDataFrame(
            [("s%d" % i, "p", "o%d" % (i % 3)) for i in range(50)],
            "subj string, pred string, obj string",
        )
        row = KS.predicate_stats(triples, approx=True).collect()[0]
        assert row.n_triples == 50
        # HLL is exact at this cardinality
        assert row.n_obj == 3


class TestScd2Apply:
    def _all(self, spark, rows):
        return _facts(spark, rows)

    def test_parity_with_full_recompute(self, spark):
        initial_rows = [
            ("a", TS(2024, 1, 1), "x", 1),
            ("a", TS(2024, 2, 1), "y", 2),
            ("b", TS(2024, 1, 5), "q", 3),
        ]
        batch_rows = [
            ("a", TS(2024, 3, 1), "z", 4),
            ("c", TS(2024, 2, 2), "w", 5),
        ]
        initial = TP.scd2_versions(
            self._all(spark, initial_rows), ["k"], "ts",
            tiebreak_cols=["id"],
        )
        merged = TP.scd2_apply(
            initial, self._all(spark, batch_rows), ["k"], "ts",
            tiebreak_cols=["id"],
        )
        full = TP.scd2_versions(
            self._all(spark, initial_rows + batch_rows), ["k"], "ts",
            tiebreak_cols=["id"],
        )
        key = lambda r: (r.k, r.id)
        got = sorted(merged.collect(), key=key)
        want = sorted(full.collect(), key=key)
        assert [r.asDict() for r in got] == [r.asDict() for r in want]

    def test_late_arrival_splices_chain(self, spark):
        """A fact OLDER than the key's head re-threads the validity
        chain — the case append-only fast paths corrupt."""
        initial = TP.scd2_versions(
            self._all(spark, [
                ("a", TS(2024, 1, 1), "x", 1),
                ("a", TS(2024, 3, 1), "z", 3),
            ]),
            ["k"], "ts", tiebreak_cols=["id"],
        )
        merged = TP.scd2_apply(
            initial,
            self._all(spark, [("a", TS(2024, 2, 1), "y", 2)]),
            ["k"], "ts", tiebreak_cols=["id"],
        )
        v = {
            r.id: (r.valid_from, r.valid_to, r.is_current)
            for r in merged.collect()
        }
        assert v[1] == (TS(2024, 1, 1), TS(2024, 2, 1), False)
        assert v[2] == (TS(2024, 2, 1), TS(2024, 3, 1), False)
        assert v[3] == (TS(2024, 3, 1), None, True)

    def test_untouched_keys_pass_through(self, spark):
        initial = TP.scd2_versions(
            self._all(spark, [("b", TS(2024, 1, 1), "q", 1)]),
            ["k"], "ts", tiebreak_cols=["id"],
        )
        merged = TP.scd2_apply(
            initial,
            self._all(spark, [("a", TS(2024, 1, 2), "x", 2)]),
            ["k"], "ts", tiebreak_cols=["id"],
        )
        v = {r.k: r.is_current for r in merged.collect()}
        assert v == {"a": True, "b": True}


class TestDecayedScores:
    def test_half_life_semantics(self, spark):
        from kernel_memory_spark.operators import temporal as TMP

        rows = [
            ("u", "2024-01-08 00:00:00", 10.0),  # T (newest): weight 1
            ("u", "2024-01-01 00:00:00", 10.0),  # 7 days old: weight .5
            ("v", "2023-12-25 00:00:00", 8.0),   # 14 days old: .25
        ]
        df = spark.createDataFrame(
            rows, "g string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {
            r.g: (r.n_events, r.decayed_score)
            for r in TMP.decayed_scores(
                df, "g", "ts", "value", half_life_seconds=7 * 86400.0
            ).collect()
        }
        assert out["u"][0] == 2
        assert out["u"][1] == pytest.approx(10.0 + 5.0, abs=1e-9)
        assert out["v"][1] == pytest.approx(2.0, abs=1e-9)

    def test_explicit_now_and_merge_property(self, spark):
        from kernel_memory_spark.operators import temporal as TMP
        import datetime as dt

        rows = [("u", "2024-01-01 00:00:00", 4.0),
                ("u", "2024-01-08 00:00:00", 4.0)]
        df = spark.createDataFrame(
            rows, "g string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        T = dt.datetime(2024, 1, 15).timestamp()
        whole = TMP.decayed_scores(
            df, "g", "ts", "value", 7 * 86400.0, now=T
        ).collect()[0].decayed_score
        # decayed counters merge by addition at a shared T
        parts = [
            TMP.decayed_scores(
                df.limit(1), "g", "ts", "value", 7 * 86400.0, now=T
            ).collect()[0].decayed_score,
            TMP.decayed_scores(
                df.subtract(df.limit(1)), "g", "ts", "value",
                7 * 86400.0, now=T,
            ).collect()[0].decayed_score,
        ]
        assert whole == pytest.approx(sum(parts), abs=1e-9)
