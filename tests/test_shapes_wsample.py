"""validate_shapes (kgschema.py) and weighted_sample (sampling.py):
SHACL cardinality/pattern semantics and the Efraimidis-Spirakis race."""

import math

import pytest
from pyspark.sql import functions as F

from kernel_memory_spark.operators import kgschema as KS
from kernel_memory_spark.operators import sampling as SMP


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


class TestValidateShapes:
    def test_min_count_checks_absence(self, spark):
        """SHACL minCount: a subject with ZERO values for the shaped
        predicate violates — s2 has a name but no type."""
        t = _triples(
            spark,
            [("s1", "type", "A"), ("s1", "name", "x"),
             ("s2", "name", "y")],
        )
        got = {
            (r.subj, r.pred, r.violation, r.observed)
            for r in KS.validate_shapes(
                t, [{"pred": "type", "min_count": 1}]
            ).collect()
        }
        assert got == {("s2", "type", "min_count", 0)}

    def test_max_count_and_pattern(self, spark):
        t = _triples(
            spark,
            [("s1", "code", "AB"), ("s1", "code", "CD"),
             ("s2", "code", "bad-1"), ("s2", "code", "bad-2")],
        )
        shapes = [{"pred": "code", "max_count": 1,
                   "pattern": "^[A-Z]{2}$"}]
        got = {
            (r.subj, r.violation, r.observed)
            for r in KS.validate_shapes(t, shapes).collect()
        }
        assert ("s1", "max_count", 2) in got
        assert ("s2", "max_count", 2) in got
        assert ("s2", "pattern", 2) in got
        assert not any(
            v == ("s1", "pattern", 2) for v in got
        )

    def test_conforming_graph_is_empty(self, spark):
        t = _triples(spark, [("s1", "lang", "en"), ("s2", "lang", "de")])
        out = KS.validate_shapes(
            t,
            [{"pred": "lang", "min_count": 1, "max_count": 1,
              "pattern": "^[a-z]{2}$"}],
        )
        assert out.count() == 0

    def test_no_checks_raises(self, spark):
        t = _triples(spark, [("s1", "p", "o")])
        with pytest.raises(ValueError):
            KS.validate_shapes(t, [{"pred": "p"}])


def _docs(spark, weights):
    rows = [(i, f"d{i}", float(w)) for i, w in enumerate(weights)]
    return spark.createDataFrame(
        rows, "doc_id long, name string, w double"
    )


def _ref_race(doc_id, w, salt="wsample"):
    import hashlib

    h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()
    u = (int(h[:8], 16) % 1_000_000 + 0.5) / 1_000_000
    return -math.log(u) / max(w, 1e-9)


class TestWeightedSample:
    def test_matches_reference_selection(self, spark):
        df = _docs(spark, [5, 1, 100, 3, 40, 7, 2, 9])
        got = {
            r.doc_id
            for r in SMP.weighted_sample(df, "doc_id", "w", k=3).collect()
        }
        ranked = sorted(range(8), key=lambda i: (_ref_race(i, [5, 1, 100, 3, 40, 7, 2, 9][i]), i))
        assert got == set(ranked[:3])

    def test_without_replacement_and_k_per_stratum(self, spark):
        rows = [(i, "a" if i < 10 else "b", 1.0 + i) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, s string, w double")
        out = SMP.weighted_sample(df, "doc_id", "w", k=4, strata_col="s")
        rows = out.collect()
        assert len(rows) == 8
        assert len({r.doc_id for r in rows}) == 8
        by = {}
        for r in rows:
            by.setdefault(r.s, 0)
            by[r.s] += 1
        assert by == {"a": 4, "b": 4}

    def test_layout_independent(self, spark):
        df = _docs(spark, range(1, 30))
        a = {r.doc_id for r in SMP.weighted_sample(
            df.repartition(1), "doc_id", "w", k=5).collect()}
        b = {r.doc_id for r in SMP.weighted_sample(
            df.repartition(13), "doc_id", "w", k=5).collect()}
        assert a == b

    def test_heavy_weight_dominates(self, spark):
        """One item with 10^6x the weight of 49 others wins k=1 for the
        vast majority of salts."""
        df = _docs(spark, [1e6] + [1.0] * 49)
        wins = 0
        for salt in ("s1", "s2", "s3", "s4", "s5"):
            got = SMP.weighted_sample(
                df, "doc_id", "w", k=1, salt=salt
            ).collect()
            wins += got[0].doc_id == 0
        assert wins >= 4

    def test_zero_weight_clamped_not_nan(self, spark):
        df = _docs(spark, [0.0, 5.0])
        rows = SMP.weighted_sample(df, "doc_id", "w", k=2).collect()
        assert len(rows) == 2
