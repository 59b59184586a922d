"""Radiometric calibration kernels — the imagecalibration family
(python/src/imagecalibration.cpp:1665-1954, ~40 sensor transforms) is a
family of per-pixel scalar maps; these are the two canonical members,
with the standard published formulas, vectorized over numpy arrays.
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
