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


def test_elev_lut_blend_matches_cpp_replay(spark):
    """apply_6s_coeff_elev_lut_col replicates the reference's scheme
    (RSGISApply6SCoefficients.cpp:142-290) — nearest knot by squared
    distance, neighbour toward the pixel elevation (end-clamped),
    reflectance blended with 1-|de|/|e1-e2| proportions (which
    EXTRAPOLATES outside the knot range, like the C++) — checked
    against a literal python replay at off-lattice elevations."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from rsgislib_spark.kernels import calibration as CAL

    lut = [(0.0, 0.92, 0.05, 0.0015), (1000.0, 0.95, 0.04, 0.0012),
           (2000.0, 0.98, 0.03, 0.0010)]

    def replay(rho, elev, scale=1000.0):
        knots = [e for e, *_ in lut]
        d = [(k - elev) ** 2 for k in knots]
        i1 = min(range(3), key=lambda i: (d[i], i))
        if i1 == 0:
            i2 = 1
        elif i1 == 2:
            i2 = 1
        else:
            i2 = i1 - 1 if elev - knots[i1] < 0 else i1 + 1

        def sref(i):
            _, a, b, c = lut[i]
            y = a * rho - b
            return y / (1.0 + c * y) * scale

        diff = abs(knots[i1] - knots[i2])
        p1 = 1 - abs(elev - knots[i1]) / diff
        p2 = 1 - abs(elev - knots[i2]) / diff
        return min(scale, sref(i1) * p1 + sref(i2) * p2)

    rows = [(0.12, -250.0), (0.2, 0.0), (0.3, 499.0), (0.3, 500.0),
            (0.4, 501.0), (0.5, 1000.0), (0.6, 1499.0), (0.7, 1750.0),
            (0.8, 2000.0), (0.9, 2600.0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rho", "elev"]))
    out = (
        df.withColumn(
            "sref",
            CAL.apply_6s_coeff_elev_lut_col(F.col("rho"), F.col("elev"), lut),
        )
        .orderBy("elev", "rho")
        .collect()
    )
    for r in out:
        assert abs(r.sref - replay(r.rho, r.elev)) < 1e-9, (r.rho, r.elev)


def test_elev_aot_lut_nearest_nearest(spark):
    """apply_6s_coeff_elev_aot_lut_col: NEAREST elevation then NEAREST
    AOT, no interpolation (RSGISApply6SCoefficients.cpp:310-440)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rsgislib_spark.kernels import calibration as CAL

    lut = [(0.0, [(0.0, 0.90, 0.06, 0.0016), (0.4, 0.93, 0.05, 0.0013)]),
           (1000.0, [(0.0, 0.94, 0.045, 0.0011), (0.4, 0.97, 0.035, 0.0009)])]

    def sref(a, b, c, rho, scale=1000.0):
        y = a * rho - b
        return min(scale, y / (1.0 + c * y) * scale)

    # (rho, elev, aot) → expected knot choice
    cases = [
        (0.3, 100.0, 0.05, (0, 0)),
        (0.3, 100.0, 0.39, (0, 1)),
        (0.3, 900.0, 0.0, (1, 0)),
        (0.3, 2000.0, 0.4, (1, 1)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame([c[:3] for c in cases], columns=["rho", "elev", "aot"])
    )
    out = (
        df.withColumn(
            "sref",
            CAL.apply_6s_coeff_elev_aot_lut_col(
                F.col("rho"), F.col("elev"), F.col("aot"), lut
            ),
        )
        .orderBy("elev", "aot")
        .collect()
    )
    by_key = {(round(r.elev, 3), round(r.aot, 3)): r.sref for r in out}
    for rho, elev, aot, (ie, ja) in cases:
        _, a, b, c = lut[ie][1][ja]
        assert abs(by_key[(round(elev, 3), round(aot, 3))] - sref(a, b, c, rho)) < 1e-9
