"""CRS transforms — pure-numpy, vectorized (no pyproj in the env).

Covers the projections the engine's fixtures and catalog need, playing
the role of the reference's GDAL/OSR-backed reproject surface
(``reproject_image`` / ``resample_img_to_match``,
python/rsgislib/imageutils/__init__.py:2104-2450; vector reproject
python/rsgislib/vectorutils/__init__.py:779-1059; point reproject
tools/geometrytools.py:541-591):

 - EPSG:4326  — WGS84 geographic (lon/lat degrees)
 - EPSG:3857  — spherical Web Mercator (exact closed form)
 - EPSG:326xx/327xx — WGS84 / UTM zone xx N and S (transverse
   Mercator, Snyder 1987 series, ~mm accuracy inside the zone; USGS
   PP 1395 eq. 8-9..8-25 — public-domain math)
 - EPSG:2154  — RGF93 / Lambert-93 (Lambert conformal conic 2SP,
   Snyder eq. 15-1..15-11 ellipsoidal, GRS80)
 - EPSG:5070  — NAD83 / Conus Albers (Albers equal-area conic,
   Snyder eq. 14-1..14-11 + authalic series 3-18, GRS80)
 - EPSG:3035  — ETRS89-extended / LAEA Europe (Lambert azimuthal
   equal-area, Snyder eq. 24-2..24-14 ellipsoidal, GRS80)
 - EPSG:3413 / 3031 — NSIDC Sea Ice Polar Stereographic North /
   Antarctic Polar Stereographic (Snyder eq. 21-33..21-35 / 22-19
   ellipsoidal variant B, WGS84)

Datum note: RGF93 / NAD83 / ETRS89 are all realisations that agree with
WGS84 at the sub-metre level; like GDAL with no datum grids loaded, the
registry applies a null datum shift and only the projection math (this
matches the reference's default OSR behaviour for these CRSs).

All functions take/return float64 numpy arrays and are used inside
Arrow-batched pandas UDFs (no per-row Python, per the north rule).

The registry routes any supported pair through lon/lat:
``transform(src_epsg, dst_epsg, x, y)``.

EPSG codes OUTSIDE the builtin registry route through a pluggable
external backend (``external_crs_backend()``): pyproj is probed at first
use and serves any EPSG pair when installed (`pip install pyproj` at
deploy); absent, the registry raises with that instruction — the same
seam pattern as kernels/codecs.py's pluggable codec backends. Builtin
codes always use the closed-form math so catalog oracles stay
hash-exact regardless of what is installed.
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


def lonlat_to_utm(lon, lat, zone: int, south: bool = False):
    """Snyder 1987 eq. 8-9..8-15 (``south`` adds the 10,000,000 m false
    northing of the EPSG:327xx zones)."""
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
    if south:
        y = y + 10000000.0
    return x, y


def utm_to_lonlat(x, y, zone: int, south: bool = False):
    """Snyder 1987 eq. 8-17..8-25 (footpoint-latitude inverse)."""
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64)
    if south:
        y = y - 10000000.0
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


# ------------------------------------------- conic / azimuthal projections
#
# Parametrized ellipsoidal forms from Snyder 1987 (USGS PP 1395 —
# public-domain math). Each class precomputes the projection constants
# once at registry-build time; fwd/inv are pure vectorized numpy.

# GRS80 ellipsoid (EPSG:7019) — the ellipsoid of ETRS89 / NAD83 / RGF93.
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101


def _m_par(phi, e2):
    """Snyder eq. 14-15: m = cos(phi) / sqrt(1 - e² sin²(phi))."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)


def _t_conformal(phi, e):
    """Snyder eq. 15-9: isometric-latitude kernel for conformal conics."""
    s = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - s) / (1.0 + s)) ** (e / 2.0)


def _q_authalic(phi, e, e2):
    """Snyder eq. 3-12: authalic-latitude kernel for equal-area forms."""
    s = np.sin(phi)
    es = e * s
    return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                         - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es)))


def _inv_conformal_lat(chi, e2):
    """Snyder eq. 3-5: latitude from conformal latitude (series)."""
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    return (chi
            + (e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0) * np.sin(2 * chi)
            + (7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0) * np.sin(4 * chi)
            + (7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0) * np.sin(6 * chi)
            + (4279.0 * e8 / 161280.0) * np.sin(8 * chi))


def _inv_authalic_lat(beta, e2):
    """Snyder eq. 3-18: latitude from authalic latitude (series)."""
    e4, e6 = e2 * e2, e2 ** 3
    return (beta
            + (e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0) * np.sin(2 * beta)
            + (23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0) * np.sin(4 * beta)
            + (761.0 * e6 / 45360.0) * np.sin(6 * beta))


class LambertConformalConic2SP:
    """Snyder 1987 eq. 15-1..15-11 (ellipsoidal, two standard parallels)."""

    def __init__(self, a, f, phi1_deg, phi2_deg, phi0_deg, lam0_deg, fe, fn):
        self.a, self.fe, self.fn = a, fe, fn
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        self.lam0 = np.radians(lam0_deg)
        p1, p2, p0 = (np.radians(d) for d in (phi1_deg, phi2_deg, phi0_deg))
        m1, m2 = _m_par(p1, self.e2), _m_par(p2, self.e2)
        t1, t2, t0 = (_t_conformal(p, self.e) for p in (p1, p2, p0))
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = a * self.F * t0 ** self.n

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64))
        t = _t_conformal(phi, self.e)
        rho = self.a * self.F * t ** self.n
        th = self.n * (lam - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inv(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(self.n) * np.sqrt(dx * dx + dy * dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = _inv_conformal_lat(chi, self.e2)
        lam = self.lam0 + np.arctan2(dx, dy) / self.n
        return np.degrees(lam), np.degrees(phi)


class AlbersEqualArea:
    """Snyder 1987 eq. 14-1..14-11 (ellipsoidal, two standard parallels)."""

    def __init__(self, a, f, phi1_deg, phi2_deg, phi0_deg, lam0_deg, fe, fn):
        self.a, self.fe, self.fn = a, fe, fn
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        self.lam0 = np.radians(lam0_deg)
        p1, p2, p0 = (np.radians(d) for d in (phi1_deg, phi2_deg, phi0_deg))
        m1, m2 = _m_par(p1, self.e2), _m_par(p2, self.e2)
        q1, q2, q0 = (_q_authalic(p, self.e, self.e2) for p in (p1, p2, p0))
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.qp = _q_authalic(np.pi / 2.0, self.e, self.e2)
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64))
        q = _q_authalic(phi, self.e, self.e2)
        rho = self.a * np.sqrt(self.C - self.n * q) / self.n
        th = self.n * (lam - self.lam0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inv(self, x, y):
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sqrt(dx * dx + dy * dy)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        beta = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        phi = _inv_authalic_lat(beta, self.e2)
        lam = self.lam0 + np.arctan2(dx, dy) / self.n
        return np.degrees(lam), np.degrees(phi)


class LambertAzimuthalEqualArea:
    """Snyder 1987 eq. 24-2..24-14 (ellipsoidal oblique case)."""

    def __init__(self, a, f, phi0_deg, lam0_deg, fe, fn):
        self.a, self.fe, self.fn = a, fe, fn
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        self.lam0 = np.radians(lam0_deg)
        p0 = np.radians(phi0_deg)
        self.qp = _q_authalic(np.pi / 2.0, self.e, self.e2)
        q0 = _q_authalic(p0, self.e, self.e2)
        self.beta0 = np.arcsin(q0 / self.qp)
        self.Rq = a * np.sqrt(self.qp / 2.0)
        self.D = a * _m_par(p0, self.e2) / (self.Rq * np.cos(self.beta0))

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64))
        q = _q_authalic(phi, self.e, self.e2)
        beta = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        sb0, cb0 = np.sin(self.beta0), np.cos(self.beta0)
        sb, cb = np.sin(beta), np.cos(beta)
        cl = np.cos(lam - self.lam0)
        B = self.Rq * np.sqrt(2.0 / (1.0 + sb0 * sb + cb0 * cb * cl))
        x = self.fe + B * self.D * cb * np.sin(lam - self.lam0)
        y = self.fn + (B / self.D) * (cb0 * sb - sb0 * cb * cl)
        return x, y

    def inv(self, x, y):
        dx = (np.asarray(x, np.float64) - self.fe) / self.D
        dy = (np.asarray(y, np.float64) - self.fn) * self.D
        rho = np.sqrt(dx * dx + dy * dy)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        sb0, cb0 = np.sin(self.beta0), np.cos(self.beta0)
        with np.errstate(invalid="ignore"):
            qs = self.qp * (cce * sb0 + dy * sce * cb0 / rho)
        qs = np.where(rho == 0.0, self.qp * sb0, qs)  # projection centre
        beta = np.arcsin(np.clip(qs / self.qp, -1.0, 1.0))
        phi = _inv_authalic_lat(beta, self.e2)
        lam = self.lam0 + np.arctan2(
            dx * sce, rho * cb0 * cce - dy * sb0 * sce)
        lam = np.where(rho == 0.0, self.lam0, lam)
        return np.degrees(lam), np.degrees(phi)


class PolarStereographic:
    """Snyder 1987 eq. 21-33..21-35 / 22-19 (ellipsoidal, variant B:
    standard parallel ``phi_ts``). ``south=True`` is the Antarctic
    aspect — the north equations on mirrored inputs with the outputs
    point-reflected about the false origin."""

    def __init__(self, a, f, phi_ts_deg, lam0_deg, fe, fn, south=False):
        self.a, self.fe, self.fn, self.south = a, fe, fn, south
        self.e2 = f * (2.0 - f)
        self.e = np.sqrt(self.e2)
        self.lam0 = np.radians(lam0_deg)
        pts = np.radians(abs(phi_ts_deg))
        self.mc = _m_par(pts, self.e2)
        self.tc = _t_conformal(pts, self.e)

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        dlam = np.radians(np.asarray(lon, np.float64)) - self.lam0
        s = -1.0 if self.south else 1.0
        t = _t_conformal(s * phi, self.e)
        rho = self.a * self.mc * t / self.tc
        # north: x = ρ sinΔλ, y = −ρ cosΔλ; south aspect point-reflects
        return (self.fe + s * rho * np.sin(s * dlam),
                self.fn - s * rho * np.cos(s * dlam))

    def inv(self, x, y):
        s = -1.0 if self.south else 1.0
        dx = s * (np.asarray(x, np.float64) - self.fe)
        dy = s * (np.asarray(y, np.float64) - self.fn)
        rho = np.sqrt(dx * dx + dy * dy)
        t = rho * self.tc / (self.a * self.mc)
        chi = np.pi / 2.0 - 2.0 * np.arctan(t)
        phi = s * _inv_conformal_lat(chi, self.e2)
        lam = self.lam0 + s * np.arctan2(dx, -dy)
        return np.degrees(lam), np.degrees(phi)


#: Builtin parametrized projections (EPSG registry definitions — public).
PROJECTIONS = {
    # RGF93 / Lambert-93: sp 49°/44°, origin 46.5°N 3°E, FE 700000 FN 6600000
    2154: LambertConformalConic2SP(GRS80_A, GRS80_F, 49.0, 44.0, 46.5, 3.0,
                                   700000.0, 6600000.0),
    # NAD83 / Conus Albers: sp 29.5°/45.5°, origin 23°N 96°W
    5070: AlbersEqualArea(GRS80_A, GRS80_F, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    # ETRS89-extended / LAEA Europe: origin 52°N 10°E, FE 4321000 FN 3210000
    3035: LambertAzimuthalEqualArea(GRS80_A, GRS80_F, 52.0, 10.0,
                                    4321000.0, 3210000.0),
    # NSIDC Sea Ice Polar Stereographic North: sp 70°N, λ0 45°W (WGS84)
    3413: PolarStereographic(WGS84_A, WGS84_F, 70.0, -45.0, 0.0, 0.0),
    # Antarctic Polar Stereographic: sp 71°S, λ0 0° (WGS84)
    3031: PolarStereographic(WGS84_A, WGS84_F, -71.0, 0.0, 0.0, 0.0,
                             south=True),
}


# -------------------------------------------- pluggable external backend
#
# Same seam pattern as kernels/codecs.py: builtin closed-form math is the
# default (deterministic — catalog oracles hash against it); EPSG codes
# the builtin registry doesn't know route through pyproj when installed.
# Ref: the reference's OSR-backed any-EPSG reproject
# (imageutils/__init__.py:2210-2450).

_EXTERNAL_CRS = None  # None = not yet probed; [] = probed, absent


class _PyprojBackend:
    """pyproj-backed any-EPSG transform (probed once per process)."""

    name = "pyproj"

    def __init__(self):
        import pyproj  # noqa: F401 — probe
        self._pyproj = pyproj
        self._cache = {}

    def transform(self, src_epsg: int, dst_epsg: int, x, y):
        key = (src_epsg, dst_epsg)
        tr = self._cache.get(key)
        if tr is None:
            tr = self._pyproj.Transformer.from_crs(
                f"EPSG:{src_epsg}", f"EPSG:{dst_epsg}", always_xy=True)
            self._cache[key] = tr
        tx, ty = tr.transform(np.asarray(x, np.float64),
                              np.asarray(y, np.float64))
        return np.asarray(tx, np.float64), np.asarray(ty, np.float64)


def external_crs_backend():
    """The external CRS backend if installed (probed once), else None.
    Empty in the sandbox (no pyproj); live after `pip install pyproj`
    at deploy. Tests monkeypatch the module global to inject a fake."""
    global _EXTERNAL_CRS
    if _EXTERNAL_CRS is None:
        try:
            _EXTERNAL_CRS = [_PyprojBackend()]
        except Exception:
            _EXTERNAL_CRS = []
    return _EXTERNAL_CRS[0] if _EXTERNAL_CRS else None


# --------------------------------------------------------------- registry

def _epsg_to_lonlat(epsg: int, x, y):
    if epsg == 4326:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if epsg == 3857:
        return webmercator_to_lonlat(x, y)
    if 32601 <= epsg <= 32660:
        return utm_to_lonlat(x, y, epsg - 32600)
    if 32701 <= epsg <= 32760:
        return utm_to_lonlat(x, y, epsg - 32700, south=True)
    proj = PROJECTIONS.get(epsg)
    if proj is not None:
        return proj.inv(x, y)
    raise ValueError(f"unsupported EPSG:{epsg}")


def _lonlat_to_epsg(epsg: int, lon, lat):
    if epsg == 4326:
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if epsg == 3857:
        return lonlat_to_webmercator(lon, lat)
    if 32601 <= epsg <= 32660:
        return lonlat_to_utm(lon, lat, epsg - 32600)
    if 32701 <= epsg <= 32760:
        return lonlat_to_utm(lon, lat, epsg - 32700, south=True)
    proj = PROJECTIONS.get(epsg)
    if proj is not None:
        return proj.fwd(lon, lat)
    raise ValueError(f"unsupported EPSG:{epsg}")


def is_builtin_epsg(epsg: int) -> bool:
    return (epsg in (4326, 3857) or 32601 <= epsg <= 32660
            or 32701 <= epsg <= 32760 or epsg in PROJECTIONS)


def transform(src_epsg: int, dst_epsg: int, x, y):
    """Vectorized coordinate transform, routed through lon/lat.

    Builtin EPSG codes always take the closed-form path (deterministic
    — oracle-hashed); any other code routes through the external
    backend (pyproj) when installed, else raises with the deploy
    instruction."""
    if src_epsg == dst_epsg:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if is_builtin_epsg(src_epsg) and is_builtin_epsg(dst_epsg):
        lon, lat = _epsg_to_lonlat(src_epsg, x, y)
        return _lonlat_to_epsg(dst_epsg, lon, lat)
    be = external_crs_backend()
    if be is not None:
        return be.transform(src_epsg, dst_epsg, x, y)
    raise ValueError(
        f"EPSG:{src_epsg}->EPSG:{dst_epsg} is outside the builtin registry "
        "and no external CRS backend is installed — `pip install pyproj` "
        "at deploy (kernels/crs.py external_crs_backend seam)")


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
