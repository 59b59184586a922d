"""Radiometric calibration kernels — the imagecalibration family
(python/src/imagecalibration.cpp:1665-1954, ~40 sensor transforms) is a
family of per-pixel scalar maps.

Two layers here:

- numpy kernels (`dn_to_radiance`, `radiance_to_toa_reflectance`) for
  the fused mapInPandas pipelines, and
- **Catalyst column-expression builders** (`*_col`) — the Spark-first
  form. Each transform is a pure `pyspark.sql.Column` map, so at 100 TB
  it fuses into the parquet scan under whole-stage codegen: no Python,
  no shuffle, filter/projection pushdown preserved. This is the exact
  analogue of the reference registering each transform as a per-pixel
  RSGISCalcImageValue (src/calibration/
  RSGISStandardDN2RadianceCalibration.cpp:40-185).

Formula provenance (reference impl lines, not copied — re-derived from
the published sensor-handbook formulas they implement):
- gradient DN→radiance: RSGISStandardDN2RadianceCalibration.cpp:59-60
- multi/add DN→radiance: :94
- SPOT5 DN→radiance: :107
- WorldView2 DN→radiance: :182
- thermal radiance→brightness: RSGISCalculateTopOfAtmosphereReflectance.cpp:75-78
- radiance→TOA reflectance: :46, inverse :116
- 6S single-param SREF: RSGISApply6SCoefficients.cpp:90-91 (+ clamp :104-106)
- dark-object subtract offsets: RSGISApplySubtractOffsets.cpp:106-115
"""

from __future__ import annotations

import numpy as np

# Representative per-band linear coefficients (gain, offset) — the shape
# of landsat_to_radiance's band_defs (imagecalibration.cpp:1666-1680).
BAND_COEFFS = {
    "red": (0.01, -0.1),
    "nir": (0.008, -0.05),
}

ESUN = {"red": 1536.0, "nir": 1145.0}


def dn_to_radiance(dn: np.ndarray, gain: float, offset: float) -> np.ndarray:
    """L = gain·DN + offset (landsat_to_radiance per-band linear map)."""
    return gain * dn.astype(np.float64) + offset


def radiance_to_toa_reflectance(
    L: np.ndarray, esun: float, solar_dist: float, sza_deg: float
) -> np.ndarray:
    """ρ = π·L·d² / (ESUN·cos θ_s) (radiance_to_toa_refl,
    imagecalibration.cpp:1759-1790 signature)."""
    return (np.pi * L * solar_dist**2) / (esun * np.cos(np.radians(sza_deg)))


def julian_day(year: int, month: int, day: int) -> int:
    """Standard Julian Day Number (the reference computes it for solar
    distance, imagecalibration.cpp:1933-1953)."""
    a = (14 - month) // 12
    y = year + 4800 - a
    m = month + 12 * a - 3
    return day + (153 * m + 2) // 5 + 365 * y + y // 4 - y // 100 + y // 400 - 32045


def solar_distance(jday_of_year: int) -> float:
    """Earth–sun distance in AU from day-of-year (standard approximation
    used by the 6S workflow the reference wraps)."""
    return 1.0 - 0.01672 * np.cos(np.radians(0.9856 * (jday_of_year - 4)))


# --------------------------------------------------------------------------
# Catalyst column-expression builders — whole-stage-codegen scalar maps.
# Every argument may be a Column or a Python literal; outputs are DOUBLE.
# --------------------------------------------------------------------------

def _c(x):
    from pyspark.sql import Column, functions as F

    return x if isinstance(x, Column) else F.lit(float(x))


def dn_to_radiance_grad_col(dn, lmin, lmax, qcalmin, qcalmax):
    """L = ((lMax−lMin)/(qCalMax−qCalMin))·(DN−qCalMin) + lMin — the
    Landsat header gradient form (landsat_to_radiance)."""
    dn, lmin, lmax, qlo, qhi = map(_c, (dn, lmin, lmax, qcalmin, qcalmax))
    return (lmax - lmin) / (qhi - qlo) * (dn - qlo) + lmin


def dn_to_radiance_multi_add_col(dn, mult, add):
    """L = RADIANCE_MULT·DN + RADIANCE_ADD (landsat_to_radiance_multi_add)."""
    return _c(mult) * _c(dn) + _c(add)


def spot5_to_radiance_col(dn, gain, bias):
    """L = DN/gain + bias (spot5_to_radiance)."""
    return _c(dn) / _c(gain) + _c(bias)


def worldview2_to_radiance_col(dn, abs_cal_fact, eff_band_width):
    """L = absCalFact·DN / effBandWidth (worldview2_to_radiance)."""
    return _c(abs_cal_fact) * _c(dn) / _c(eff_band_width)


def thermal_rad_to_brightness_col(radiance, k1, k2, scale_factor=1.0):
    """T(°C) = (K2/ln(K1/L + 1) − 273.15)·scale for L>0, else 0
    (landsat_thermal_rad_to_brightness)."""
    from pyspark.sql import functions as F

    L, k1, k2 = map(_c, (radiance, k1, k2))
    t = (k2 / F.log(k1 / L + F.lit(1.0)) - F.lit(273.15)) * _c(scale_factor)
    return F.when(L > 0, t).otherwise(F.lit(0.0))


def radiance_to_toa_refl_col(radiance, esun, solar_dist, cos_sza, scale_factor=1.0):
    """ρ = π·L·d² / (ESUN·cosθs) · scale (radiance_to_toa_refl)."""
    import math

    from pyspark.sql import functions as F

    L, esun, d, cz = map(_c, (radiance, esun, solar_dist, cos_sza))
    return F.lit(math.pi) * L * d * d / (esun * cz) * _c(scale_factor)


def toa_refl_to_radiance_col(refl, esun, solar_dist, cos_sza, scale_factor=1.0):
    """L = (ρ/scale)·ESUN·cosθs / (π·d²) — the inverse map
    (toa_refl_to_radiance)."""
    import math

    from pyspark.sql import functions as F

    r, esun, d, cz = map(_c, (refl, esun, solar_dist, cos_sza))
    return (r / _c(scale_factor)) * esun * cz / (F.lit(math.pi) * d * d)


def apply_6s_coeff_single_col(refl, a_x, b_x, c_x, scale_factor=1000.0):
    """Surface reflectance from the 6S direct/diffuse/env coefficients:
    y = aX·ρ − bX; SREF = scale·y/(1 + cX·y), clamped to [0, scale]
    (apply_6s_coeff_single_param core formula + upper clamp)."""
    from pyspark.sql import functions as F

    y = _c(a_x) * _c(refl) - _c(b_x)
    sref = y / (F.lit(1.0) + _c(c_x) * y) * _c(scale_factor)
    return F.greatest(F.lit(0.0), F.least(_c(scale_factor), sref))


def subtract_offsets_col(value, offset, dark_obj_refl=0.0, non_negative=True):
    """out = (v − offset) + darkObjRefl, with the reference's
    non-negative rule: results ≤ 0 snap to 1.0 (apply_subtract_offsets)."""
    from pyspark.sql import functions as F

    out = _c(value) - _c(offset) + _c(dark_obj_refl)
    if non_negative:
        return F.when(out <= 0, F.lit(1.0)).otherwise(out)
    return out
