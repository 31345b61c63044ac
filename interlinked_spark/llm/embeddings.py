"""Embedding-matrix operators (SURVEY.md §2b-K extensions).

``pca_project`` is distributed PCA by the covariance method — the
standard shape for tall-skinny embedding matrices (n rows >> d dims):

1. ONE Arrow pass computes per-batch partials ``(n, sum_x, X^T X)``;
2. the driver reduces the tiny partials (O(partitions * d^2) floats —
   for d=32 that is ~4 KB per partition, nothing like collecting rows)
   and eigendecomposes the d x d covariance with numpy;
3. projection onto the top-k components is a second Arrow pass with the
   (d x k) component matrix shipped in the UDF closure.

Eigenvector sign is fixed deterministically (largest-magnitude loading
positive), so projections are reproducible run-to-run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Fit the covariance-method PCA: one Arrow partials pass, driver
    ``eigh`` on the d x d reduction.  Returns ``(mean, components,
    eigenvalues, n_rows)`` as plain Python lists/ints — the fit state a
    projection (or a verification query) broadcasts."""
    import numpy as np

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pca_fit on an empty DataFrame")
    d_dim = len(first[0])
    if not 1 <= k <= d_dim:
        raise ValueError(f"k must be in [1, {d_dim}], got {k}")

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                [{"n": len(X), "s": X.sum(axis=0).tolist(), "g": (X.T @ X).ravel().tolist()}]
            )

    parts = df.select(vec_col).mapInPandas(partials, "n long, s array<double>, g array<double>").collect()
    n = sum(p.n for p in parts)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.sum([np.asarray(p.s) for p in parts], axis=0)
    gram = np.sum([np.asarray(p.g).reshape(d_dim, d_dim) for p in parts], axis=0)
    mean = s / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    for j in range(comps.shape[1]):  # deterministic sign
        if comps[np.argmax(np.abs(comps[:, j])), j] < 0:
            comps[:, j] = -comps[:, j]
    return mean.tolist(), comps.tolist(), vals[order].tolist(), n


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    fit=None,
) -> DataFrame:
    """Project each vector onto the top-``k`` principal components of
    the column's covariance.  Returns ``(id, pc: array<double>)``.
    Pass a precomputed :func:`pca_fit` result to skip the partials
    pass."""
    mean_l, comps_l, _vals, _n = fit if fit is not None else pca_fit(df, vec_col, k)

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        import numpy as _np

        M = _np.asarray(comps_l)
        mu = _np.asarray(mean_l)
        return vs.map(lambda v: ((_np.asarray(v, dtype=_np.float64) - mu) @ M).tolist())

    return df.select(F.col(id_col).alias("id"), project(vec_col).alias("pc"))


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector int8 quantization (§2b-K storage path): min/max range
    scaling to 0..255 codes — 4x smaller than float32 on the wire and
    at rest, which at 100 TB of embeddings is the difference between
    one storage tier and the next.  Returns ``(id, q_min, q_scale,
    codes, max_abs_err, mean_abs_err)``: everything needed to
    dequantize (``q_min + code * q_scale``) plus the reconstruction
    error actually incurred (bounded by ``q_scale / 2``).

    Stepwise column materialization matters here: inlining ``mn`` /
    ``scale`` directly into the nested lambdas duplicates their whole
    subtree at every reference (HOF lambdas defeat common-subexpression
    elimination) — measured 5.1s vs 0.19s at sf0.1 for identical
    results.  One narrow projection, no shuffle, SQL-recomputable
    bit-for-bit (the oracle re-derives codes and errors; the rounding
    rule ``floor(t + 0.5)`` is engine-portable, unlike banker's
    rounding).  Degenerate constant vectors quantize to code 0 with
    scale 0."""
    t = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("__x"),
    )
    t = t.withColumn("__mn", F.array_min("__x"))
    t = t.withColumn("__scale", (F.array_max("__x") - F.col("__mn")) / F.lit(255.0))
    t = t.withColumn(
        "codes",
        F.transform(
            F.col("__x"),
            lambda v: F.when(
                F.col("__scale") > 0,
                F.floor((v - F.col("__mn")) / F.col("__scale") + F.lit(0.5)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        ),
    )
    t = t.withColumn(
        "__deq",
        F.transform(
            F.col("codes"), lambda c: F.col("__mn") + c.cast("double") * F.col("__scale")
        ),
    )
    t = t.withColumn("__err", F.zip_with(F.col("__x"), F.col("__deq"), lambda a, b: F.abs(a - b)))
    return t.select(
        "id",
        F.round(F.col("__mn"), 6).alias("q_min"),
        F.round(F.col("__scale"), 9).alias("q_scale"),
        "codes",
        F.round(F.array_max("__err"), 6).alias("max_abs_err"),
        F.round(
            F.aggregate("__err", F.lit(0.0), lambda a, v: a + v) / F.size("__x"), 6
        ).alias("mean_abs_err"),
    )
