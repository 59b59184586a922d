"""Spectral unmixing — linear mixture models.

Reference: imagecalc/specunmixing/__init__.py — spec_unmix_spts_ucls
(:244, unconstrained least squares via pysptools UCLS),
spec_unmix_spts_nnls (:330, non-negative least squares),
spec_unmix_spts_fcls (:418, fully constrained). pysptools/rios are
env-bound; the models are implemented natively.

Spark shape: the UCLS abundance map is a LINEAR operator — per-pixel
abundances a = (EᵀE)⁻¹ Eᵀ x — so applying it is pure Catalyst literal
arithmetic at scan speed (the pca_apply pattern), and any SUM of
abundances over pixels is a closed form of the band-dot sums (linearity
— how the q115 oracle stays integer-exact until one division). NNLS is
an active-set iteration per pixel: batch-vectorized numpy kernel
(Lawson–Hanson with the passive set re-solved per iteration), for
mapInPandas use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def ucls_matrix(endmembers: np.ndarray) -> np.ndarray:
    """Unmixing matrix U = (EᵀE)⁻¹Eᵀ for endmembers E (rows = members,
    cols = bands): abundances = U @ x."""
    E = np.asarray(endmembers, np.float64)
    return np.linalg.inv(E @ E.T) @ E


def ucls_unmix(
    df: DataFrame, band_cols: list[str], endmembers, prefix: str = "ab"
) -> DataFrame:
    """Append ab1..abK unconstrained abundance columns as Catalyst
    literal arithmetic (spec_unmix_spts_ucls:244)."""
    U = ucls_matrix(np.asarray(endmembers, np.float64))
    out = df
    for i in range(U.shape[0]):
        expr = F.lit(0.0)
        for j, c in enumerate(band_cols):
            expr = expr + F.col(c).cast("double") * F.lit(float(U[i, j]))
        out = out.withColumn(f"{prefix}{i + 1}", expr)
    return out


def nnls_unmix_kernel(X: np.ndarray, endmembers: np.ndarray) -> np.ndarray:
    """Batch EXACT NNLS (spec_unmix_spts_nnls:330): for the small
    endmember counts of unmixing (k ≤ 12), enumerate every passive set,
    solve its unconstrained normal equations for ALL pixels at once, and
    keep the feasible solution with minimum residual — the NNLS optimum
    (the optimal support's unconstrained solution is feasible, and every
    feasible candidate's residual bounds it). Fully vectorized across
    pixels; tests certify the KKT conditions. X: (n, bands) → (n, k)."""
    E = np.asarray(endmembers, np.float64)
    Xa = np.asarray(X, np.float64)
    n, k = Xa.shape[0], E.shape[0]
    if k > 12:
        raise ValueError("exact-enumeration NNLS supports at most 12 endmembers")
    G = E @ E.T
    best_res = (Xa * Xa).sum(1)  # empty support: a = 0
    best_a = np.zeros((n, k))
    for mask in range(1, 1 << k):
        sel = np.array([i for i in range(k) if mask >> i & 1])
        Gs = G[np.ix_(sel, sel)]
        try:
            Us = np.linalg.solve(Gs, E[sel])
        except np.linalg.LinAlgError:
            continue
        a_s = Xa @ Us.T  # (n, |sel|)
        feas = (a_s > 1e-12).all(1)
        if not feas.any():
            continue
        r = Xa - a_s @ E[sel]
        res = (r * r).sum(1)
        upd = feas & (res < best_res - 1e-12)
        if upd.any():
            best_res[upd] = res[upd]
            best_a[upd] = 0.0
            tmp = np.zeros((int(upd.sum()), k))
            tmp[:, sel] = a_s[upd]
            best_a[upd] = tmp
    return best_a


def fcls_sum_to_one(a: np.ndarray) -> np.ndarray:
    """Project abundances onto the sum-to-one simplex the way
    spec_unmix_spts_fcls's weight formulation drives them: clip at zero
    then renormalise rows (documented approximation of the fully
    constrained model — exact FCLS needs a QP solver, env-bound).
    All-zero rows (no positive abundance) stay zero."""
    a = np.clip(np.asarray(a, np.float64), 0.0, None)
    s = a.sum(1, keepdims=True)
    s[s == 0] = 1.0
    return a / s
