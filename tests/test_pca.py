"""Distributed PCA (operators/pca.py): Gram parity with numpy, fit
equality with a driver-side reference PCA, projection invariants, and
layout independence (the partial-aggregation property that makes it
cluster-safe)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kernel_memory_spark.operators import pca as P

D, N = 6, 40


def _data(seed=7, n=N, d=D):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so eigenvalue gaps are healthy
    base = rng.normal(size=(n, d)) * np.linspace(3.0, 0.3, d)
    return base.astype(np.float32)


def _df(spark, x, parts=4):
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


class TestGram:
    def test_matches_numpy(self, spark):
        x = _data()
        got = P.gram_matrix(_df(spark, x), dim=D).collect()
        g = np.zeros((D, D))
        for r in got:
            g[r.i, r.j] = r.value
        ref = x.astype(np.float64).T @ x.astype(np.float64)
        assert len(got) == D * D
        np.testing.assert_allclose(g, ref, rtol=0, atol=1e-9)

    def test_layout_independent(self, spark):
        x = _data()
        a = P.gram_matrix(_df(spark, x, parts=1), dim=D).collect()
        b = P.gram_matrix(_df(spark, x, parts=7), dim=D).collect()
        da = {(r.i, r.j): r.value for r in a}
        db = {(r.i, r.j): r.value for r in b}
        assert set(da) == set(db)
        for k in da:
            assert da[k] == pytest.approx(db[k], abs=1e-9)

    def test_bad_vectors_skipped(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, None), (2, [1.0]), (3, [0.0, 2.0])],
            "vec_id long, embedding array<float>",
        )
        g = {
            (r.i, r.j): r.value
            for r in P.gram_matrix(df, dim=2).collect()
        }
        assert g[(0, 0)] == pytest.approx(1.0)
        assert g[(1, 1)] == pytest.approx(4.0)
        assert g[(0, 1)] == pytest.approx(0.0)


class TestFitProject:
    def test_matches_reference_pca(self, spark):
        x = _data()
        comps, vals, mean = P.fit_pca(_df(spark, x), k=3)
        xd = x.astype(np.float64)
        mu = xd.mean(axis=0)
        cov = (xd - mu).T @ (xd - mu) / len(xd)
        rvals, rvecs = np.linalg.eigh(cov)
        order = np.argsort(rvals)[::-1][:3]
        np.testing.assert_allclose(mean, mu, atol=1e-9)
        np.testing.assert_allclose(vals, rvals[order], atol=1e-9)
        for c in range(3):  # same deterministic sign rule
            rv = rvecs[:, order[c]]
            if rv[np.argmax(np.abs(rv))] < 0:
                rv = -rv
            np.testing.assert_allclose(comps[:, c], rv, atol=1e-7)

    def test_components_orthonormal_variance_desc(self, spark):
        comps, vals, _ = P.fit_pca(_df(spark, _data()), k=4)
        np.testing.assert_allclose(
            comps.T @ comps, np.eye(4), atol=1e-9
        )
        assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(3))
        assert vals[0] > 0

    def test_projection_variance_equals_eigenvalues(self, spark):
        x = _data()
        df = _df(spark, x)
        comps, vals, mean = P.fit_pca(df, k=3)
        out = P.project(df, comps, mean).select("pca").collect()
        y = np.asarray([r.pca for r in out], dtype=np.float64)
        # population variance of each projected coordinate = eigenvalue
        np.testing.assert_allclose(
            y.var(axis=0), vals, rtol=1e-3
        )
        np.testing.assert_allclose(y.mean(axis=0), 0, atol=1e-3)

    def test_pca_project_schema_and_rows(self, spark):
        df = _df(spark, _data())
        out = P.pca_project(df, k=2)
        assert out.columns == ["vec_id", "embedding", "pca"]
        rows = out.collect()
        assert len(rows) == N
        assert all(len(r.pca) == 2 for r in rows)

    def test_explained_variance(self):
        ev = P.explained_variance(np.array([3.0, 1.0]))
        np.testing.assert_allclose(ev, [0.75, 0.25])
        assert P.explained_variance(np.array([0.0, 0.0])).sum() == 0
