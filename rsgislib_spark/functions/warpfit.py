"""Affine (1st-order polynomial) warp fitting from tie points — the
transform-estimation half of image registration.

Reference: imageregistration (python/rsgislib/imageregistration) — tie
points from window correlation (q66) become GCPs driving a polynomial
warp (warp_with_gcps_with_gdal; GDAL's gdal_warp -order 1 fits the same
least-squares affine).

Spark shape: ONE moment-sum aggregation over the tie-point table (all
sums map-side combined); the 3×3 normal-equation solve and the residual
SSE are closed-form scalar arithmetic on those sums (driver-side, and
reproduced verbatim by the q110 SQL oracle — explicit cofactor
formulas, not LAPACK, so both engines round identically). Residuals are
NEVER re-scanned: SSE = Σt² − 2aᵀ(Xᵀt) + aᵀ(XᵀX)a from the same sums,
which avoids an order-dependent distributed float sum.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def affine_moments(df: DataFrame, sx: str, sy: str, tx: str, ty: str) -> dict:
    """The 14 moment sums of the normal equations, one aggregation."""
    x, y = F.col(sx).cast("double"), F.col(sy).cast("double")
    u, v = F.col(tx).cast("double"), F.col(ty).cast("double")
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy"), F.sum(y * y).alias("syy"),
        F.sum(u).alias("stx"), F.sum(v).alias("sty"),
        F.sum(x * u).alias("sxtx"), F.sum(y * u).alias("sytx"),
        F.sum(x * v).alias("sxty"), F.sum(y * v).alias("syty"),
        F.sum(u * u).alias("stxtx"), F.sum(v * v).alias("styty"),
    ).first()
    return {k: float(r[k]) for k in r.asDict()}


def _solve3(n, sx, sy, sxx, sxy, syy, r0, r1, r2):
    """Explicit cofactor solve of the symmetric normal matrix
    [[n,sx,sy],[sx,sxx,sxy],[sy,sxy,syy]] — written to match the q110
    SQL expression-for-expression."""
    det = (
        n * (sxx * syy - sxy * sxy)
        - sx * (sx * syy - sxy * sy)
        + sy * (sx * sxy - sxx * sy)
    )
    a0 = (
        r0 * (sxx * syy - sxy * sxy)
        - sx * (r1 * syy - sxy * r2)
        + sy * (r1 * sxy - sxx * r2)
    ) / det
    a1 = (
        n * (r1 * syy - sxy * r2)
        - r0 * (sx * syy - sxy * sy)
        + sy * (sx * r2 - r1 * sy)
    ) / det
    a2 = (
        n * (sxx * r2 - r1 * sxy)
        - sx * (sx * r2 - r1 * sy)
        + r0 * (sx * sxy - sxx * sy)
    ) / det
    return a0, a1, a2


class AffineModel:
    def __init__(self, a, b, rmse_x, rmse_y, n):
        self.a = a  # (a0, a1, a2): x' = a0 + a1·x + a2·y
        self.b = b
        self.rmse_x = rmse_x
        self.rmse_y = rmse_y
        self.n = n


def affine_fit(df: DataFrame, sx: str, sy: str, tx: str, ty: str) -> AffineModel:
    """Least-squares affine fit x'=a0+a1·x+a2·y, y'=b0+b1·x+b2·y with
    moment-sum residual RMSE."""
    m = affine_moments(df, sx, sy, tx, ty)
    n, sxs, sys_ = m["n"], m["sx"], m["sy"]
    sxx, sxy, syy = m["sxx"], m["sxy"], m["syy"]
    a = _solve3(n, sxs, sys_, sxx, sxy, syy, m["stx"], m["sxtx"], m["sytx"])
    b = _solve3(n, sxs, sys_, sxx, sxy, syy, m["sty"], m["sxty"], m["syty"])

    def sse(t, st, sxt, syt, stt):
        a0, a1, a2 = t
        return (
            stt
            - 2.0 * (a0 * st + a1 * sxt + a2 * syt)
            + (
                a0 * a0 * n + a1 * a1 * sxx + a2 * a2 * syy
                + 2.0 * (a0 * a1 * sxs + a0 * a2 * sys_ + a1 * a2 * sxy)
            )
        )

    sse_x = sse(a, m["stx"], m["sxtx"], m["sytx"], m["stxtx"])
    sse_y = sse(b, m["sty"], m["sxty"], m["syty"], m["styty"])
    return AffineModel(
        a, b, math.sqrt(max(sse_x, 0.0) / n), math.sqrt(max(sse_y, 0.0) / n), int(n)
    )


def affine_apply(
    df: DataFrame, model: AffineModel, sx: str, sy: str, prefix: str = "warp"
) -> DataFrame:
    """Apply the fitted transform as Catalyst literal arithmetic."""
    x, y = F.col(sx).cast("double"), F.col(sy).cast("double")
    a0, a1, a2 = model.a
    b0, b1, b2 = model.b
    return df.withColumn(
        f"{prefix}_x", F.lit(a0) + F.lit(a1) * x + F.lit(a2) * y
    ).withColumn(f"{prefix}_y", F.lit(b0) + F.lit(b1) * x + F.lit(b2) * y)
