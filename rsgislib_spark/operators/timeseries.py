"""Per-group time-series model fitting — the Spark face of the
reference's season-trend regression over dated raster stacks
(python/rsgislib/timeseries/modelfitting.py:54-264: per-pixel OLS fit of
a trend + harmonic model across dates).

Shape: ``groupBy(entity).applyInPandas(fit)`` — each group's series fits
in one Arrow batch; the model is a closed-form normal-equation solve in
numpy (vectorized within the group, no per-row Python). At 10^12 scale
the entity key partitions the shuffle uniformly and each task fits many
independent models.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def linear_trend_fit(
    df: DataFrame,
    group_col: str = "user_id",
    t_col: str = "t",
    y_col: str = "value",
) -> DataFrame:
    """OLS slope/intercept of y over t per group (the trend component of
    the reference's model; harmonics are additional columns in the same
    normal-equation solve). Returns
    (group, n, slope, intercept, residual RMS)."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[t_col].to_numpy(np.float64)
        y = pdf[y_col].to_numpy(np.float64)
        n = len(t)
        st, sy = t.sum(), y.sum()
        stt, sty = (t * t).sum(), (t * y).sum()
        den = n * stt - st * st
        if den == 0:
            slope, icept = 0.0, y.mean() if n else 0.0
        else:
            slope = (n * sty - st * sy) / den
            icept = (sy - slope * st) / n
        resid = y - (slope * t + icept)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "slope": [slope],
                "intercept": [icept],
                "rms": [float(np.sqrt((resid**2).mean()))] if n else [0.0],
            }
        )

    schema = f"{group_col} long, n long, slope double, intercept double, rms double"
    return df.select(group_col, t_col, y_col).groupBy(group_col).applyInPandas(_fit, schema)


def harmonic_design(t: np.ndarray, period: float, n_harmonics: int = 2) -> np.ndarray:
    """Design matrix [1, t, sin/cos harmonics] — modelfitting.py:54-113
    model shape; used with np.linalg.lstsq per group."""
    cols = [np.ones_like(t), t]
    for k in range(1, n_harmonics + 1):
        w = 2.0 * np.pi * k * t / period
        cols += [np.sin(w), np.cos(w)]
    return np.column_stack(cols)


def harmonic_fit_predict(t, y, period: float, n_harmonics: int = 2):
    """Fit + fitted values (the reference's predict step)."""
    X = harmonic_design(np.asarray(t, np.float64), period, n_harmonics)
    coef, *_ = np.linalg.lstsq(X, np.asarray(y, np.float64), rcond=None)
    return coef, X @ coef
