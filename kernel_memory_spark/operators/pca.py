"""Distributed PCA for embedding columns: Gram-matrix partial
aggregation + driver-side eigendecomposition + broadcast projection.

Embedding tables at 10^12 rows can't be decomposed directly, but d is
small (64-1536): X^T X is a d x d matrix, so the scale-correct recipe is
the classic one (the same shape spark.ml's RowMatrix.computeGramianMatrix
uses) — each partition folds its rows into a local d x d float64 partial
with one BLAS call per Arrow batch, partials are summed by (i, j) cell
(d^2 tiny rows through the shuffle, NOT the data), and the
eigendecomposition runs on the driver against a d x d array. Projection
then broadcasts the d x k component matrix back and applies one matmul
per Arrow batch.

Why not spark.ml: the pipeline standardizes on DataFrame-native
array<float> columns (operators/similarity.py, functions/quant.py);
pulling in the mllib Vector UDT would force a conversion pass over the
full table in both directions. The partial-Gram trick is ~30 lines.

Reference: Kernel Memory stores embeddings opaquely
(service/Core/MemoryStorage/*, embedding as float[]); dimensionality
reduction is the post-hoc analytics a stored embedding corpus exists for
(index compression, drift inspection), same role as operators/graph.py
for the stored KG.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: Optional[int] = None
) -> DataFrame:
    """Second-moment Gram matrix X^T X -> d^2 rows (i, j, value).

    float32 inputs are widened to float64 BEFORE the products (a float32
    element is exact in float64, so per-pair products are bit-identical
    to any other engine's; only the summation association differs —
    round the result before hashing cross-engine). Rows with a NULL or
    wrong-length vector are skipped (counted into no cell) rather than
    poisoning the whole matrix with NaN."""
    if dim is None:
        probe = df.select(F.size(vec_col).alias("n")).first()
        dim = int(probe["n"])
    d = dim

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.float64)
        seen = False
        for pdf in batches:
            vecs = [
                v for v in pdf["v"] if v is not None and len(v) == d
            ]
            if not vecs:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )
            acc += x.T @ x
            seen = True
        if seen:
            ii, jj = np.indices((d, d))
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "value": acc.ravel(),
                }
            )

    partials = df.select(F.col(vec_col).alias("v")).mapInPandas(
        fold, _GRAM_SCHEMA
    )
    return partials.groupBy("i", "j").agg(F.sum("value").alias("value"))


def _mean_vector(df: DataFrame, vec_col: str, dim: int) -> np.ndarray:
    """Column means via ONE aggregate over element sums (no collect of
    rows): d sum cells + a count leave the cluster."""
    sums = [
        F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(
            f"s{i}"
        )
        for i in range(dim)
    ]
    row = df.agg(F.count("*").alias("n"), *sums).first()
    n = max(int(row["n"]), 1)
    return np.array([row[f"s{i}"] / n for i in range(dim)])


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    center: bool = True,
    dim: Optional[int] = None,
):
    """Fit PCA -> (components d x k float64, eigenvalues desc, mean).

    Covariance = (X^T X)/n - mean mean^T when centering (one Gram pass +
    one mean aggregate; the raw data is never re-read or shuffled).
    Eigenvectors get a deterministic sign (largest-|.| element positive)
    so refits are reproducible."""
    if dim is None:
        probe = df.select(F.size(vec_col).alias("n")).first()
        dim = int(probe["n"])
    cells = gram_matrix(df, vec_col, dim=dim).collect()
    n = df.count()
    g = np.zeros((dim, dim))
    for r in cells:
        g[r["i"], r["j"]] = r["value"]
    mean = (
        _mean_vector(df, vec_col, dim) if center else np.zeros(dim)
    )
    cov = g / max(n, 1) - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    vals = vals[order]
    for c in range(comps.shape[1]):  # deterministic sign
        m = np.argmax(np.abs(comps[:, c]))
        if comps[m, c] < 0:
            comps[:, c] = -comps[:, c]
    return comps, vals, mean


def project(
    df: DataFrame,
    components: np.ndarray,
    mean: Optional[np.ndarray] = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto fitted components: one broadcast d x k
    matmul per Arrow batch, appended as array<float> `out_col`."""
    comps = np.asarray(components, dtype=np.float64)
    mu = (
        np.zeros(comps.shape[0])
        if mean is None
        else np.asarray(mean, dtype=np.float64)
    )
    sc = df.sparkSession.sparkContext
    b_c, b_m = sc.broadcast(comps), sc.broadcast(mu)
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c, m = b_c.value, b_m.value
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(x) == 0:
                continue
            y = (x - m) @ c
            pdf = pdf[cols].copy()
            pdf[out_col] = [r.astype(np.float32) for r in y]
            yield pdf

    return df.mapInPandas(proj, out_schema)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    center: bool = True,
    out_col: str = "pca",
) -> DataFrame:
    """fit_pca + project in one call (two jobs over the input: Gram/mean
    aggregate, then the projection map — no other full-table passes)."""
    comps, _, mean = fit_pca(df, vec_col, k=k, center=center)
    return project(df, comps, mean if center else None, vec_col, out_col)


def explained_variance(eigenvalues: np.ndarray) -> np.ndarray:
    """Fraction of total variance captured by each component (over the
    RETURNED components only; pass all d eigenvalues for true ratios)."""
    tot = float(np.sum(eigenvalues))
    if not math.isfinite(tot) or tot <= 0:
        return np.zeros_like(np.asarray(eigenvalues, dtype=np.float64))
    return np.asarray(eigenvalues, dtype=np.float64) / tot
