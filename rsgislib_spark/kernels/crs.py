"""CRS transforms — pure-numpy, vectorized (no pyproj in the env).

Covers the projections the engine's fixtures and catalog need, playing
the role of the reference's GDAL/OSR-backed reproject surface
(``reproject_image`` / ``resample_img_to_match``,
python/rsgislib/imageutils/__init__.py:2104-2450; vector reproject
python/rsgislib/vectorutils/__init__.py:779-1059; point reproject
tools/geometrytools.py:541-591):

 - EPSG:4326  — WGS84 geographic (lon/lat degrees)
 - EPSG:3857  — spherical Web Mercator (exact closed form)
 - EPSG:326xx — WGS84 / UTM zone xx N (transverse Mercator, Snyder 1987
   series, ~mm accuracy inside the zone; USGS PP 1395 eq. 8-9..8-25 —
   public-domain math)

All functions take/return float64 numpy arrays and are used inside
Arrow-batched pandas UDFs (no per-row Python, per the north rule).

The registry routes any supported pair through lon/lat:
``transform(src_epsg, dst_epsg, x, y)``.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
_EP2 = WGS84_E2 / (1.0 - WGS84_E2)  # e'²
_K0 = 0.9996  # UTM scale factor at the central meridian
_FE = 500000.0  # UTM false easting

_R_MERC = WGS84_A  # spherical web mercator radius


# ------------------------------------------------------------ web mercator

def lonlat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R_MERC * np.radians(lon)
    y = _R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R_MERC)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------- UTM (Snyder series)

def _meridional_arc(phi):
    e2, e4, e6 = WGS84_E2, WGS84_E2 ** 2, WGS84_E2 ** 3
    return WGS84_A * (
        (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * np.sin(2 * phi)
        + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4 * phi)
        - (35.0 * e6 / 3072.0) * np.sin(6 * phi)
    )


def utm_zone_central_meridian(zone: int) -> float:
    return float(zone * 6 - 183)


def lonlat_to_utm(lon, lat, zone: int):
    """Snyder 1987 eq. 8-9..8-15 (northern hemisphere)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    lam0 = np.radians(utm_zone_central_meridian(zone))
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    N = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_p ** 2)
    T = tan_p ** 2
    C = _EP2 * cos_p ** 2
    A = (lam - lam0) * cos_p
    M = _meridional_arc(phi)
    x = _K0 * N * (
        A
        + (1.0 - T + C) * A ** 3 / 6.0
        + (5.0 - 18.0 * T + T ** 2 + 72.0 * C - 58.0 * _EP2) * A ** 5 / 120.0
    ) + _FE
    y = _K0 * (
        M
        + N * tan_p * (
            A ** 2 / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C ** 2) * A ** 4 / 24.0
            + (61.0 - 58.0 * T + T ** 2 + 600.0 * C - 330.0 * _EP2) * A ** 6 / 720.0
        )
    )
    return x, y


def utm_to_lonlat(x, y, zone: int):
    """Snyder 1987 eq. 8-17..8-25 (footpoint-latitude inverse)."""
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64)
    lam0 = np.radians(utm_zone_central_meridian(zone))
    M = y / _K0
    mu = M / (WGS84_A * (1.0 - WGS84_E2 / 4.0 - 3.0 * WGS84_E2 ** 2 / 64.0
                         - 5.0 * WGS84_E2 ** 3 / 256.0))
    e1 = (1.0 - np.sqrt(1.0 - WGS84_E2)) / (1.0 + np.sqrt(1.0 - WGS84_E2))
    phi1 = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2 * mu)
        + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4 * mu)
        + (151.0 * e1 ** 3 / 96.0) * np.sin(6 * mu)
        + (1097.0 * e1 ** 4 / 512.0) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = _EP2 * cos1 ** 2
    T1 = tan1 ** 2
    N1 = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin1 ** 2)
    R1 = WGS84_A * (1.0 - WGS84_E2) / (1.0 - WGS84_E2 * sin1 ** 2) ** 1.5
    D = x / (N1 * _K0)
    phi = phi1 - (N1 * tan1 / R1) * (
        D ** 2 / 2.0
        - (5.0 + 3.0 * T1 + 10.0 * C1 - 4.0 * C1 ** 2 - 9.0 * _EP2) * D ** 4 / 24.0
        + (61.0 + 90.0 * T1 + 298.0 * C1 + 45.0 * T1 ** 2 - 252.0 * _EP2
           - 3.0 * C1 ** 2) * D ** 6 / 720.0
    )
    lam = lam0 + (
        D
        - (1.0 + 2.0 * T1 + C1) * D ** 3 / 6.0
        + (5.0 - 2.0 * C1 + 28.0 * T1 - 3.0 * C1 ** 2 + 8.0 * _EP2
           + 24.0 * T1 ** 2) * D ** 5 / 120.0
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


# --------------------------------------------------------------- registry

def _epsg_to_lonlat(epsg: int, x, y):
    if epsg == 4326:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if epsg == 3857:
        return webmercator_to_lonlat(x, y)
    if 32601 <= epsg <= 32660:
        return utm_to_lonlat(x, y, epsg - 32600)
    raise ValueError(f"unsupported EPSG:{epsg}")


def _lonlat_to_epsg(epsg: int, lon, lat):
    if epsg == 4326:
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if epsg == 3857:
        return lonlat_to_webmercator(lon, lat)
    if 32601 <= epsg <= 32660:
        return lonlat_to_utm(lon, lat, epsg - 32600)
    raise ValueError(f"unsupported EPSG:{epsg}")


def transform(src_epsg: int, dst_epsg: int, x, y):
    """Vectorized coordinate transform, routed through lon/lat."""
    if src_epsg == dst_epsg:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    lon, lat = _epsg_to_lonlat(src_epsg, x, y)
    return _lonlat_to_epsg(dst_epsg, lon, lat)


def transform_bbox(src_epsg: int, dst_epsg: int, minx, miny, maxx, maxy):
    """Reprojected bbox = envelope of the 4 transformed corners (the
    reference's get_vec_layer_extent-after-reproject convention; exact
    for the affine-ish transforms here at fixture extents)."""
    minx = np.asarray(minx, np.float64)
    miny = np.asarray(miny, np.float64)
    maxx = np.asarray(maxx, np.float64)
    maxy = np.asarray(maxy, np.float64)
    xs = np.stack([minx, maxx, minx, maxx])  # 4 corners × n
    ys = np.stack([miny, miny, maxy, maxy])
    tx, ty = transform(src_epsg, dst_epsg, xs.ravel(), ys.ravel())
    tx = tx.reshape(4, -1)
    ty = ty.reshape(4, -1)
    return tx.min(axis=0), ty.min(axis=0), tx.max(axis=0), ty.max(axis=0)


# ------------------------------------------------------ affine geotransform

def affine_apply(gt, px, py):
    """GDAL 6-element geotransform: pixel → world (gt = (x0, dx, rx, y0,
    ry, dy)); ref geotransform read zonalstats/__init__.py:251-262."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    x = gt[0] + px * gt[1] + py * gt[2]
    y = gt[3] + px * gt[4] + py * gt[5]
    return x, y


def affine_invert(gt):
    """Inverse geotransform (world → pixel) as another 6-tuple."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0:
        raise ValueError("singular geotransform")
    inv1 = gt[5] / det
    inv2 = -gt[2] / det
    inv4 = -gt[4] / det
    inv5 = gt[1] / det
    x0 = -(inv1 * gt[0] + inv2 * gt[3])
    y0 = -(inv4 * gt[0] + inv5 * gt[3])
    return (x0, inv1, inv2, y0, inv4, inv5)
