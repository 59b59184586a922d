"""Terrain kernels — slope/aspect/hillshade/incidence/DEM-fill/detrend,
the engine-side counterpart of the reference's elevation module
(python/src/elevation.cpp, 13 ops; tests python_tests/test_elevation.py).

All pure-numpy, vectorized, edge-padded with `edge` mode; driven per
halo-tile by operators/focal.py's template at scale. Gradient convention
is Horn's 3×3 (the GDAL one): gx/gy are Sobel sums, directional
derivatives are gx/(8·res).

Deviation note: the reference's shadow mask ray-casts sun occlusion;
here `shadow_mask_local` flags only self-shadowed cells (incidence
cos ≤ 0) — cast shadows are a documented gap.
"""

from __future__ import annotations

import numpy as np

from rsgislib_spark.kernels.focal import sobel


def horn_derivatives(dem: np.ndarray, res: float = 1.0):
    """(dz/dx, dz/dy) via Horn's method."""
    gx, gy = sobel(dem)
    return gx / (8.0 * res), gy / (8.0 * res)


def slope_aspect(dem: np.ndarray, res: float = 1.0):
    """(slope_rad, aspect_rad): slope = atan(|∇z|); aspect =
    atan2(dz/dy, -dz/dx) (the GDAL hillshade intermediate)."""
    x, y = horn_derivatives(dem, res)
    slope = np.arctan(np.sqrt(x * x + y * y))
    aspect = np.arctan2(y, -x)
    return slope, aspect


def aspect_degrees(dem: np.ndarray, res: float = 1.0) -> np.ndarray:
    """Compass aspect (0=N, clockwise), flat cells → -1 (the elevation
    module's flat flag)."""
    x, y = horn_derivatives(dem, res)
    asp = np.degrees(np.arctan2(-x, y))  # 0 = north, clockwise east +
    asp = np.where(asp < 0, asp + 360.0, asp)
    flat = (x == 0) & (y == 0)
    return np.where(flat, -1.0, asp)


def hillshade(
    dem: np.ndarray,
    res: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
) -> np.ndarray:
    """GDAL-formula hillshade in [0, 255] (elevation.cpp hillshade op)."""
    slope, aspect = slope_aspect(dem, res)
    zen = np.radians(90.0 - altitude)
    azr = np.radians(360.0 - azimuth + 90.0)
    hs = 255.0 * (
        np.cos(zen) * np.cos(slope)
        + np.sin(zen) * np.sin(slope) * np.cos(azr - aspect)
    )
    return np.maximum(hs, 0.0)


def incidence_angle(
    dem: np.ndarray, res: float = 1.0, azimuth: float = 315.0, altitude: float = 45.0
) -> np.ndarray:
    """Solar incidence angle (radians between surface normal and sun) —
    elevation.cpp incidence-angle op."""
    slope, aspect = slope_aspect(dem, res)
    zen = np.radians(90.0 - altitude)
    azr = np.radians(360.0 - azimuth + 90.0)
    cosi = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(azr - aspect)
    return np.arccos(np.clip(cosi, -1.0, 1.0))


def shadow_mask_local(
    dem: np.ndarray, res: float = 1.0, azimuth: float = 315.0, altitude: float = 45.0
) -> np.ndarray:
    """Self-shadow mask: 1 where the surface faces away from the sun
    (incidence cos ≤ 0). Cast shadows not modelled (documented gap)."""
    slope, aspect = slope_aspect(dem, res)
    zen = np.radians(90.0 - altitude)
    azr = np.radians(360.0 - azimuth + 90.0)
    cosi = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(azr - aspect)
    return (cosi <= 0.0).astype(np.uint8)


def cast_shadow_mask(
    dem: np.ndarray,
    res: float = 1.0,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    max_steps: int | None = None,
) -> np.ndarray:
    """TRUE cast-shadow mask by ray marching toward the sun
    (elevation.cpp shadow op): a cell is shadowed when any DEM sample
    along the sun ray rises above the ray's climbing line
    z + dist·tan(altitude). Vectorized over ALL pixels per step (one
    bilinear DEM sample per step), O(pixels × steps); rays leave the
    tile edge after ≤ max(h, w) steps. Per halo-tile use at scale the
    halo must cover the shadow reach (terrain-height / tan(altitude))."""
    from rsgislib_spark.kernels.resample import bilinear_sample

    d = dem.astype(np.float64)
    h, w = d.shape
    # sun direction in grid coords: azimuth 0=N (−y), 90=E (+x)
    az = np.radians(azimuth)
    dx = float(np.sin(az))
    dy = float(-np.cos(az))
    # snap ~1e-16 trig residue at cardinal azimuths: a 1e-16 drift is
    # enough to push edge-row rays out of bounds on the first step
    if abs(dx) < 1e-12:
        dx = 0.0
    if abs(dy) < 1e-12:
        dy = 0.0
    tan_alt = np.tan(np.radians(altitude))
    steps = max_steps or int(np.ceil(np.hypot(h, w)))
    yy, xx = np.mgrid[0:h, 0:w]
    xx = xx.astype(np.float64).ravel()
    yy = yy.astype(np.float64).ravel()
    base = d.ravel()
    shadow = np.zeros(h * w, dtype=bool)
    alive = np.ones(h * w, dtype=bool)
    for s in range(1, steps + 1):
        px = xx + s * dx
        py = yy + s * dy
        oob = (px < 0) | (px > w - 1) | (py < 0) | (py > h - 1)
        alive &= ~oob  # a ray that left the grid can never be shadowed
        if not alive.any():
            break
        idx = np.flatnonzero(alive)
        zray = base[idx] + s * res * tan_alt
        zdem = bilinear_sample(d, px[idx], py[idx])
        hit = zdem > zray
        shadow[idx[hit]] = True
        alive[idx[hit]] = False  # shadowed — stop marching this ray
    return shadow.reshape(h, w).astype(np.uint8)


def _erode3(a: np.ndarray) -> np.ndarray:
    p = np.pad(a, 1, mode="edge")
    out = p[1:-1, 1:-1].copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = np.minimum(out, p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx])
    return out


def dem_fill(dem: np.ndarray, max_iter: int = 10000) -> np.ndarray:
    """Depression filling by morphological reconstruction-by-erosion
    (Soille & Gratin 1994 — the algorithm behind the reference's
    dtm_aspect/fill op in elevation.cpp): marker = +inf except the
    border, iterate marker = max(dem, erode3(marker)) to stability.
    Returns the filled surface (≥ dem, equal outside depressions)."""
    d = dem.astype(np.float64)
    marker = np.full_like(d, np.inf)
    marker[0, :] = d[0, :]
    marker[-1, :] = d[-1, :]
    marker[:, 0] = d[:, 0]
    marker[:, -1] = d[:, -1]
    for _ in range(max_iter):
        nxt = np.maximum(d, _erode3(marker))
        if np.array_equal(nxt, marker):
            break
        marker = nxt
    return marker


def detrend(dem: np.ndarray) -> np.ndarray:
    """Remove the least-squares plane (elevation detrend op)."""
    h, w = dem.shape
    yy, xx = np.mgrid[0:h, 0:w]
    A = np.stack([xx.ravel(), yy.ravel(), np.ones(h * w)], axis=1)
    coef, *_ = np.linalg.lstsq(A, dem.astype(np.float64).ravel(), rcond=None)
    return dem - (coef[0] * xx + coef[1] * yy + coef[2])

def fft_dem_fusion(
    high_res: "np.ndarray", low_res: "np.ndarray", c_size: int = 20
) -> "np.ndarray":
    """FFT DEM fusion (elevation.fft_dem_fusion, elevation/__init__.py:
    10-91; Karkee et al. 2008): low-frequency structure from the
    LOW-resolution DEM + high-frequency detail from the HIGH-resolution
    DEM via a centred box swap in the shifted spectrum.

    Documented deviation: the reference's array indexing copies the
    CENTRE (low-frequency) box from the high-res spectrum into the
    low-res spectrum — the inverse of its own docstring; this kernel
    implements the documented intent (centre box from the LOW-res
    spectrum into the high-res spectrum). c_size=0 degenerates to the
    high-res input; a box covering the spectrum returns the low-res.
    """
    a = np.asarray(high_res, np.float64)
    b = np.asarray(low_res, np.float64)
    if a.shape != b.shape:
        raise ValueError("DEMs must share a pixel grid (resample first)")
    fa = np.fft.fftshift(np.fft.fft2(a))
    fb = np.fft.fftshift(np.fft.fft2(b))
    rows, cols = a.shape
    crow, ccol = rows // 2, cols // 2
    fa[crow - c_size : crow + c_size, ccol - c_size : ccol + c_size] = fb[
        crow - c_size : crow + c_size, ccol - c_size : ccol + c_size
    ]
    return np.abs(np.fft.ifft2(np.fft.ifftshift(fa)))
