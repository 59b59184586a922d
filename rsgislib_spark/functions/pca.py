"""PCA — fit (distributed moment sums → driver-local eigen
decomposition) and apply (Catalyst projection expressions), completing
the reference's PCA surface beyond the covariance matrix:
``get_pca_eigen_vector`` / ``perform_image_pca`` / whitening
(python/rsgislib/imagecalc/__init__.py:594-818;
imageutils/__init__.py:3933-4087).

Physical shape mirrors the reference's own split (sample → numpy SVD →
image-wide apply): the covariance comes from one distributed aggregation
of integer-exact moment sums; the k×k eigenproblem is driver-local
numpy; the projection is pure Catalyst column arithmetic with the
components baked in as literals — streams at scan speed, no UDF.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F


class PCAModel:
    def __init__(self, feat_cols, mean, components, eigenvalues):
        self.feat_cols = list(feat_cols)
        self.mean = np.asarray(mean, np.float64)
        self.components = np.asarray(components, np.float64)  # rows = comps
        self.eigenvalues = np.asarray(eigenvalues, np.float64)


def covariance_sums(df: DataFrame, feat_cols: Sequence[str]):
    """(n, mean vector, covariance matrix) from integer-exact moment sums
    (population covariance — the q52 formulation)."""
    p = len(feat_cols)
    aggs = [F.count("*").alias("n")]
    aggs += [F.sum(F.col(c).cast("double")).alias(f"s_{i}") for i, c in enumerate(feat_cols)]
    for i in range(p):
        for j in range(i, p):
            aggs.append(
                F.sum(F.col(feat_cols[i]).cast("double") * F.col(feat_cols[j]).cast("double"))
                .alias(f"s_{i}_{j}")
            )
    r = df.agg(*aggs).first()
    n = float(r["n"])
    s = np.array([r[f"s_{i}"] for i in range(p)])
    cov = np.empty((p, p))
    for i in range(p):
        for j in range(i, p):
            cov[i, j] = cov[j, i] = (r[f"s_{i}_{j}"] - s[i] * s[j] / n) / n
    return int(n), s / n, cov


def pca_fit(df: DataFrame, feat_cols: Sequence[str]) -> PCAModel:
    """Eigendecomposition of the population covariance; components sorted
    by DESCENDING eigenvalue, each sign-normalised so its largest-|.|
    entry is positive (deterministic across LAPACK builds)."""
    n, mean, cov = covariance_sums(df, feat_cols)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    w = w[order]
    v = v[:, order].T  # rows = components
    for i in range(v.shape[0]):
        j = int(np.argmax(np.abs(v[i])))
        if v[i, j] < 0:
            v[i] = -v[i]
    return PCAModel(feat_cols, mean, v, w)


def pca_apply(
    df: DataFrame,
    model: PCAModel,
    n_components: int | None = None,
    whiten: bool = False,
    prefix: str = "pc",
) -> DataFrame:
    """Append pc1..pcK score columns: (x − mean) · componentᵀ, divided by
    √eigenvalue when whitening. Pure Catalyst literals."""
    k = n_components or len(model.components)
    out = df
    for i in range(k):
        expr = F.lit(0.0)
        for j, c in enumerate(model.feat_cols):
            expr = expr + (F.col(c).cast("double") - F.lit(float(model.mean[j]))) * F.lit(
                float(model.components[i, j])
            )
        if whiten:
            expr = expr / F.lit(float(np.sqrt(max(model.eigenvalues[i], 1e-300))))
        out = out.withColumn(f"{prefix}{i + 1}", expr)
    return out


def sym3_eigenvalues(cov: np.ndarray) -> np.ndarray:
    """Closed-form eigenvalues of a symmetric 3×3 (trigonometric cubic —
    the same formula the SQL oracle evaluates), descending."""
    a11, a22, a33 = cov[0, 0], cov[1, 1], cov[2, 2]
    a12, a13, a23 = cov[0, 1], cov[0, 2], cov[1, 2]
    p1 = a12 ** 2 + a13 ** 2 + a23 ** 2
    q = (a11 + a22 + a33) / 3.0
    if p1 == 0.0:
        return np.sort(np.array([a11, a22, a33]))[::-1]
    p2 = (a11 - q) ** 2 + (a22 - q) ** 2 + (a33 - q) ** 2 + 2.0 * p1
    p = np.sqrt(p2 / 6.0)
    b11, b22, b33 = (a11 - q) / p, (a22 - q) / p, (a33 - q) / p
    b12, b13, b23 = a12 / p, a13 / p, a23 / p
    detb = (
        b11 * (b22 * b33 - b23 ** 2)
        - b12 * (b12 * b33 - b23 * b13)
        + b13 * (b12 * b23 - b22 * b13)
    )
    r = np.clip(detb / 2.0, -1.0, 1.0)
    phi = np.arccos(r) / 3.0
    e1 = q + 2.0 * p * np.cos(phi)
    e3 = q + 2.0 * p * np.cos(phi + 2.0 * np.pi / 3.0)
    return np.array([e1, 3.0 * q - e1 - e3, e3])


class MNFModel:
    def __init__(self, feat_cols, whitening, projection, offset, eigenvalues):
        self.feat_cols = list(feat_cols)
        self.whitening = np.asarray(whitening, np.float64)  # Aw (p×p)
        self.projection = np.asarray(projection, np.float64)  # Aw·Eᵀ combined (p×k)
        self.offset = np.asarray(offset, np.float64)  # μ_w · Eᵀ (k)
        self.eigenvalues = np.asarray(eigenvalues, np.float64)


def zca_whitening_matrix(cov: np.ndarray) -> np.ndarray:
    """ZCA whitening Aw = V·S^{-1/2}·Vᵀ from the SVD of the covariance
    (whiten_image's _whiten, imageutils/__init__.py:3978-4002)."""
    U, S, Vt = np.linalg.svd(cov)
    return Vt.T @ np.diag(S ** -0.5) @ Vt


def mnf_fit(
    df: DataFrame,
    feat_cols: Sequence[str],
    sample: DataFrame | None = None,
) -> MNFModel:
    """Minimum Noise Fraction (perform_image_mnf,
    imagecalc/__init__.py:708-830): ZCA-whiten with the FULL-data
    covariance, then PCA on the whitened SAMPLE (the reference's
    every-Nth-pixel sample; pass the sample DataFrame, default = full
    df). Both covariances are population (÷n) — documented deviation
    from the reference's ÷(n−1); the MNF eigenvalues are the
    generalized eigenvalues of (C_sample, C_full), which is what the
    q107 oracle evaluates closed-form.

    Distributed shape: two moment-sum aggregations (full + sample);
    everything else is p×p driver math; apply is Catalyst literals.
    """
    _, _, cov_full = covariance_sums(df, feat_cols)
    aw = zca_whitening_matrix(cov_full)
    sdf = sample if sample is not None else df
    _, mean_s, cov_s = covariance_sums(sdf, feat_cols)
    # whitened-sample covariance = Awᵀ·C_s·Aw (Aw symmetric)
    cov_w = aw @ cov_s @ aw
    w, v = np.linalg.eigh(cov_w)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order].T
    for i in range(v.shape[0]):
        j = int(np.argmax(np.abs(v[i])))
        if v[i, j] < 0:
            v[i] = -v[i]
    proj = aw @ v.T  # x @ proj = whitened scores before centering
    offset = (mean_s @ aw) @ v.T
    return MNFModel(feat_cols, aw, proj, offset, w)


def mnf_apply(df: DataFrame, model: MNFModel, prefix: str = "mnf") -> DataFrame:
    """Append mnf1..mnfK: x·(Aw·Eᵀ) − μ_w·Eᵀ as Catalyst literals."""
    p, k = model.projection.shape
    out = df
    for i in range(k):
        expr = F.lit(-float(model.offset[i]))
        for j, c in enumerate(model.feat_cols):
            expr = expr + F.col(c).cast("double") * F.lit(float(model.projection[j, i]))
        out = out.withColumn(f"{prefix}{i + 1}", expr)
    return out
