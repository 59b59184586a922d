"""Distributed OLS regression with k-fold cross-validated metrics.

Reference: regression/regresssklearn.perform_kfold_fit (:213-335) —
k-fold fit + per-fold r2 / RMSE / normalised RMSE / bias / normalised
bias (tools/stats.bias_score:1016). The sklearn estimator families are
env-bound (no sklearn in this sandbox); linear OLS is implemented
natively, scale-first.

Spark shape — the part worth copying at 100 TB: ONE aggregation
computes the moment sums PER FOLD; every fold's training model is then
the COMPLEMENT of its fold (total − fold sums), so k models plus all
per-fold test metrics come from a single scan — no per-fold re-scan,
no collect of data rows. Residual SSE/bias/variance are evaluated from
the same fold moments (quad form), never by re-scoring rows.

The q114 oracle replays fold assignment (md5 bucket), the cofactor
solve, and every metric expression-for-expression; the lattice fixture
keeps all moment sums exact in float64.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from rsgislib_spark.functions.sampling import hash_bucket
from rsgislib_spark.functions.warpfit import _solve3


def kfold_ols_metrics(
    df: DataFrame,
    feat_cols: list[str],
    target: str,
    key,
    k: int = 4,
    salt: str = "",
) -> DataFrame:
    """k-fold cross-validated OLS (2 features + intercept) from one
    moment-sum pass. Returns one row per fold: n_test, a0/a1/a2 of the
    complement-trained model, rmse, norm_rmse, bias, norm_bias, r2."""
    if len(feat_cols) != 2:
        raise ValueError("kfold_ols_metrics: exactly 2 feature columns")
    fx, fy = (F.col(c).cast("double") for c in feat_cols)
    t = F.col(target).cast("double")
    folds = (
        df.withColumn("_fold", hash_bucket(key, k, salt))
        .groupBy("_fold")
        .agg(
            F.count("*").alias("n"),
            F.sum(fx).alias("sx"), F.sum(fy).alias("sy"),
            F.sum(fx * fx).alias("sxx"), F.sum(fx * fy).alias("sxy"),
            F.sum(fy * fy).alias("syy"),
            F.sum(t).alias("st"), F.sum(fx * t).alias("sxt"),
            F.sum(fy * t).alias("syt"), F.sum(t * t).alias("stt"),
        )
        .collect()
    )
    keys = ["n", "sx", "sy", "sxx", "sxy", "syy", "st", "sxt", "syt", "stt"]
    tot = {kk: sum(float(r[kk]) for r in folds) for kk in keys}
    rows = []
    for r in sorted(folds, key=lambda r: r["_fold"]):
        f = {kk: float(r[kk]) for kk in keys}
        tr = {kk: tot[kk] - f[kk] for kk in keys}
        a0, a1, a2 = _solve3(
            tr["n"], tr["sx"], tr["sy"], tr["sxx"], tr["sxy"], tr["syy"],
            tr["st"], tr["sxt"], tr["syt"],
        )
        sse = (
            f["stt"]
            - 2.0 * (a0 * f["st"] + a1 * f["sxt"] + a2 * f["syt"])
            + (
                a0 * a0 * f["n"] + a1 * a1 * f["sxx"] + a2 * a2 * f["syy"]
                + 2.0 * (a0 * a1 * f["sx"] + a0 * a2 * f["sy"] + a1 * a2 * f["sxy"])
            )
        )
        rmse = math.sqrt(max(sse, 0.0) / f["n"])
        mean_t = f["st"] / f["n"]
        sstot = f["stt"] - (f["st"] * f["st"]) / f["n"]
        r2 = 1.0 - sse / sstot
        sum_yhat = a0 * f["n"] + a1 * f["sx"] + a2 * f["sy"]
        bias = (sum_yhat - f["st"]) / f["n"]
        rows.append(
            (
                int(r["_fold"]), int(f["n"]), a0, a1, a2,
                rmse, (rmse / mean_t) * 100.0, bias, (bias / mean_t) * 100.0, r2,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "fold int, n_test long, a0 double, a1 double, a2 double, "
        "rmse double, norm_rmse double, bias double, norm_bias double, r2 double",
    )
