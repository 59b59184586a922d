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


def test_calibration_col_builders(spark):
    """The Catalyst *_col transforms agree with hand-computed references
    (imagecalibration family, RSGISStandardDN2RadianceCalibration.cpp)."""
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from rsgislib_spark.kernels import calibration as CAL

    df = spark.createDataFrame(pd.DataFrame({"dn": [0, 100, 255]}))
    d, cz = 1.0163, math.cos(math.radians(30.0))
    l_ma = CAL.dn_to_radiance_multi_add_col(F.col("dn"), 1.17662, -6.2)
    rho = CAL.radiance_to_toa_refl_col(l_ma, 1536.0, d, cz)
    out = df.select(
        "dn",
        CAL.dn_to_radiance_grad_col(F.col("dn"), -6.2, 293.7, 1.0, 255.0).alias("lg"),
        l_ma.alias("lma"),
        CAL.spot5_to_radiance_col(F.col("dn"), 1.3, 0.0).alias("ls"),
        CAL.worldview2_to_radiance_col(F.col("dn"), 0.00965, 0.0625).alias("lw"),
        CAL.thermal_rad_to_brightness_col(l_ma, 774.89, 1321.08).alias("bt"),
        rho.alias("rho"),
        CAL.toa_refl_to_radiance_col(rho, 1536.0, d, cz).alias("linv"),
        CAL.apply_6s_coeff_single_col(rho, 2.5, 0.1, 0.5).alias("sref"),
        CAL.subtract_offsets_col(rho, 0.02, 0.01).alias("dos"),
    ).toPandas().set_index("dn")

    r100 = out.loc[100]
    lma = 1.17662 * 100 - 6.2
    assert abs(r100.lg - ((293.7 + 6.2) / 254.0 * 99.0 - 6.2)) < 1e-9
    assert abs(r100.lma - lma) < 1e-12
    assert abs(r100.ls - 100 / 1.3) < 1e-12
    assert abs(r100.lw - 0.00965 * 100 / 0.0625) < 1e-12
    assert abs(r100.bt - (1321.08 / math.log(774.89 / lma + 1) - 273.15)) < 1e-9
    rho100 = math.pi * lma * d * d / (1536.0 * cz)
    assert abs(r100.rho - rho100) < 1e-12
    assert abs(r100.linv - lma) < 1e-9  # exact round-trip
    y = 2.5 * rho100 - 0.1
    assert abs(r100.sref - y / (1 + 0.5 * y) * 1000.0) < 1e-9
    assert abs(r100.dos - (rho100 - 0.01)) < 1e-12
    # dn=0: negative radiance -> thermal guard 0; dos snaps to 1.0; sref clamps 0
    r0 = out.loc[0]
    assert r0.bt == 0.0 and r0.dos == 1.0 and r0.sref == 0.0
