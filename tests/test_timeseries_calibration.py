"""Tests: per-group trend/harmonic fitting and radiometric calibration
kernels (timeseries/modelfitting + imagecalibration families)."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.kernels import calibration as CAL
from rsgislib_spark.operators.timeseries import (
    harmonic_design,
    harmonic_fit_predict,
    linear_trend_fit,
)


def test_linear_trend_fit_recovers_known_line(spark):
    t = np.arange(50, dtype=np.float64)
    rows = []
    for g, (slope, icept) in enumerate([(2.5, 10.0), (-1.0, 3.0)]):
        for ti in t:
            rows.append((g, float(ti), slope * ti + icept))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "t", "value"]))
    out = {r["user_id"]: r for r in linear_trend_fit(df).collect()}
    assert out[0]["slope"] == pytest.approx(2.5) and out[0]["intercept"] == pytest.approx(10.0)
    assert out[1]["slope"] == pytest.approx(-1.0) and out[1]["rms"] == pytest.approx(0.0, abs=1e-9)


def test_linear_trend_fit_degenerate_single_t(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 1], "t": [5.0, 5.0], "value": [2.0, 4.0]})
    )
    r = linear_trend_fit(df).collect()[0]
    assert r["slope"] == 0.0 and r["intercept"] == pytest.approx(3.0)


def test_harmonic_fit_recovers_seasonal_signal():
    t = np.arange(0, 730, 8, dtype=np.float64)
    y = 5.0 + 0.01 * t + 3.0 * np.sin(2 * np.pi * t / 365.25) + 1.5 * np.cos(
        4 * np.pi * t / 365.25
    )
    coef, fitted = harmonic_fit_predict(t, y, period=365.25, n_harmonics=2)
    assert np.abs(fitted - y).max() < 1e-8
    assert coef[0] == pytest.approx(5.0) and coef[1] == pytest.approx(0.01)
    assert harmonic_design(t, 365.25, 2).shape == (len(t), 6)


def test_dn_to_radiance_and_reflectance():
    dn = np.array([[0, 100], [200, 255]], dtype=np.int64)
    L = CAL.dn_to_radiance(dn, 0.01, -0.1)
    assert L[0, 0] == pytest.approx(-0.1) and L[1, 1] == pytest.approx(2.45)
    rho = CAL.radiance_to_toa_reflectance(L, 1536.0, 1.0, 0.0)
    assert rho[1, 1] == pytest.approx(np.pi * 2.45 / 1536.0)


def test_julian_day_and_solar_distance():
    assert CAL.julian_day(2000, 1, 1) == 2451545  # J2000 epoch noon JDN
    d = CAL.solar_distance(4)  # perihelion ≈ Jan 4 → minimum distance
    assert d == pytest.approx(1.0 - 0.01672)
    assert CAL.solar_distance(185) > 1.0  # aphelion in July
