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
    """Clip-at-zero + row renormalise — the cheap simplex projection
    some pipelines apply to NNLS output. NOT the FCLS optimum; use
    `fcls_unmix_kernel` for the exact fully-constrained model.
    All-zero rows (no positive abundance) stay zero."""
    a = np.clip(np.asarray(a, np.float64), 0.0, None)
    s = a.sum(1, keepdims=True)
    s[s == 0] = 1.0
    return a / s


def fcls_support_solvers(endmembers: np.ndarray):
    """Per-support equality-constrained solvers for exact FCLS.

    For every nonempty support S ⊆ {1..k}, the minimizer of
    ‖x − E_Sᵀa_S‖² subject to 1ᵀa_S = 1 satisfies the KKT system
    [G_S 1; 1ᵀ 0]·[a_S; λ] = [E_S x; 1] — a LINEAR map of x. Returns
    [(sel, A, b)] with a_S = A @ x + b (A: |S|×bands, b: |S|).
    Supports whose KKT matrix is singular are skipped."""
    E = np.asarray(endmembers, np.float64)
    k, nb = E.shape
    if k > 12:
        raise ValueError("exact-enumeration FCLS supports at most 12 endmembers")
    G = E @ E.T
    out = []
    for mask in range(1, 1 << k):
        sel = np.array([i for i in range(k) if mask >> i & 1])
        m = len(sel)
        K = np.zeros((m + 1, m + 1))
        K[:m, :m] = G[np.ix_(sel, sel)]
        K[:m, m] = 1.0
        K[m, :m] = 1.0
        try:
            Kinv = np.linalg.inv(K)
        except np.linalg.LinAlgError:
            continue
        # a_S = Kinv[:m, :m] @ E_S @ x + Kinv[:m, m] · 1
        A = Kinv[:m, :m] @ E[sel]
        b = Kinv[:m, m].copy()
        out.append((sel, A, b))
    return out


def fcls_unmix_kernel(X: np.ndarray, endmembers: np.ndarray) -> np.ndarray:
    """Batch EXACT fully-constrained least squares
    (spec_unmix_spts_fcls, specunmixing/__init__.py:418): a ≥ 0 and
    Σa = 1. Same certification as the NNLS enumeration: the optimum's
    support solves the equality-constrained problem restricted to that
    support, so enumerating every support's KKT solution and keeping
    the feasible minimum-residual candidate IS the FCLS optimum.
    Vectorized across pixels; X: (n, bands) → (n, k) abundances."""
    E = np.asarray(endmembers, np.float64)
    Xa = np.asarray(X, np.float64)
    n, k = Xa.shape[0], E.shape[0]
    best_res = np.full(n, np.inf)
    best_a = np.zeros((n, k))
    for sel, A, b in fcls_support_solvers(E):
        a_s = Xa @ A.T + b  # (n, |sel|)
        feas = (a_s >= -1e-9).all(1)
        if not feas.any():
            continue
        r = Xa - a_s @ E[sel]
        res = (r * r).sum(1)
        # Strict < keeps the FIRST-enumerated (lowest-mask) support on
        # exact residual ties — bit-identical to the relational oracle's
        # ORDER BY res ASC, mask ASC selection (an epsilon would keep an
        # earlier support the oracle rejects when residuals differ by
        # less than the epsilon).
        upd = feas & (res < best_res)
        if upd.any():
            best_res[upd] = res[upd]
            tmp = np.zeros((int(upd.sum()), k))
            tmp[:, sel] = a_s[upd]
            best_a[upd] = tmp
    return best_a
