"""CRS transform + resampling kernel correctness (pure numpy) and the
reproject operators end-to-end."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.kernels import crs, resample


class TestWebMercator:
    def test_known_anchors(self):
        # equator/prime meridian is the origin
        x, y = crs.lonlat_to_webmercator(np.array([0.0]), np.array([0.0]))
        assert x[0] == pytest.approx(0.0, abs=1e-9)
        assert y[0] == pytest.approx(0.0, abs=1e-9)
        # 180° E is πR
        x, _ = crs.lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
        assert x[0] == pytest.approx(np.pi * 6378137.0, rel=1e-12)
        # 45°N northing (closed form R·ln(tan(3π/8)))
        _, y = crs.lonlat_to_webmercator(np.array([0.0]), np.array([45.0]))
        assert y[0] == pytest.approx(6378137.0 * np.log(np.tan(3 * np.pi / 8)), rel=1e-12)

    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-179, 179, 500)
        lat = rng.uniform(-84, 84, 500)
        x, y = crs.lonlat_to_webmercator(lon, lat)
        lon2, lat2 = crs.webmercator_to_lonlat(x, y)
        assert np.allclose(lon, lon2, atol=1e-9)
        assert np.allclose(lat, lat2, atol=1e-9)


class TestUTM:
    def test_central_meridian_anchor(self):
        # on the CM at the equator: easting exactly 500000, northing 0
        x, y = crs.lonlat_to_utm(np.array([3.0]), np.array([0.0]), zone=31)
        assert x[0] == pytest.approx(500000.0, abs=1e-6)
        assert y[0] == pytest.approx(0.0, abs=1e-6)

    def test_scale_factor_on_cm(self):
        # along the CM the projection scale is k0 = 0.9996: northing of
        # 1° latitude ≈ k0 · meridional arc length
        x, y = crs.lonlat_to_utm(np.array([3.0]), np.array([1.0]), zone=31)
        arc = crs._meridional_arc(np.radians(np.array([1.0])))[0]
        assert y[0] == pytest.approx(0.9996 * arc, rel=1e-12)
        assert x[0] == pytest.approx(500000.0, abs=1e-6)

    def test_roundtrip_inside_zone(self):
        rng = np.random.default_rng(11)
        lon = rng.uniform(0.5, 5.5, 500)  # zone 31 spans 0..6E
        lat = rng.uniform(-70, 70, 500)
        x, y = crs.lonlat_to_utm(lon, lat, zone=31)
        lon2, lat2 = crs.utm_to_lonlat(x, y, zone=31)
        # Snyder series round-trip: sub-millimetre (≈1e-8 deg)
        assert np.allclose(lon, lon2, atol=1e-7)
        assert np.allclose(lat, lat2, atol=1e-7)

    def test_transform_routing(self):
        # 3857 → UTM → 3857 via the registry round-trips
        x = np.array([250000.0, 400000.0])
        y = np.array([5000000.0, 6000000.0])
        ux, uy = crs.transform(3857, 32631, x, y)
        x2, y2 = crs.transform(32631, 3857, ux, uy)
        assert np.allclose(x, x2, atol=1e-4)
        assert np.allclose(y, y2, atol=1e-4)


class TestConicAzimuthal:
    """Snyder 1987 conic/azimuthal family (EPSG:2154 / 5070 / 3035)."""

    def test_origins_map_to_false_origin(self):
        for code, (lon0, lat0) in ((2154, (3.0, 46.5)), (5070, (-96.0, 23.0)),
                                   (3035, (10.0, 52.0))):
            p = crs.PROJECTIONS[code]
            x, y = p.fwd(np.array([lon0]), np.array([lat0]))
            assert abs(x[0] - p.fe) < 1e-6
            assert abs(y[0] - p.fn) < 1e-6

    def test_epsg_guidance_note_laea_example(self):
        # EPSG Guidance Note 7-2 worked example (ETRS89-LAEA, 50°N 5°E)
        x, y = crs.PROJECTIONS[3035].fwd(np.array([5.0]), np.array([50.0]))
        assert abs(x[0] - 3962799.45) < 0.01
        assert abs(y[0] - 2999718.85) < 0.01

    def test_scale_unity_at_standard_parallels(self):
        # conformal (LCC) meridional scale k=1 at both standard parallels
        p = crs.PROJECTIONS[2154]
        e2, a = p.e2, p.a
        for lat in (49.0, 44.0):
            d = 1e-6
            x1, y1 = p.fwd(np.array([3.0]), np.array([lat - d / 2]))
            x2, y2 = p.fwd(np.array([3.0]), np.array([lat + d / 2]))
            phi = np.radians(lat)
            M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
            k = np.hypot(x2 - x1, y2 - y1) / (np.radians(d) * M)
            assert abs(k[0] - 1.0) < 1e-6

    def test_roundtrips_in_area_of_use(self):
        grids = {2154: (np.linspace(-4, 9, 15), np.linspace(41, 51, 15)),
                 5070: (np.linspace(-124, -67, 15), np.linspace(24, 49, 15)),
                 3035: (np.linspace(-10, 30, 15), np.linspace(35, 70, 15))}
        for code, (lons, lats) in grids.items():
            LO, LA = np.meshgrid(lons, lats)
            x, y = crs.transform(4326, code, LO.ravel(), LA.ravel())
            lo2, la2 = crs.transform(code, 4326, x, y)
            # authalic/conformal inverse series: ≲1e-8 deg ≈ 1 mm
            assert np.abs(lo2 - LO.ravel()).max() < 1e-7
            assert np.abs(la2 - LA.ravel()).max() < 1e-7

    def test_laea_centre_is_finite(self):
        # rho == 0 at the projection centre exercises the guarded branch
        lo, la = crs.PROJECTIONS[3035].inv(np.array([4321000.0]),
                                           np.array([3210000.0]))
        assert abs(lo[0] - 10.0) < 1e-9
        assert abs(la[0] - 52.0) < 1e-7

    def test_cross_projection_routing(self):
        # Lambert-93 -> Conus Albers via lon/lat and back
        x = np.array([700000.0, 900000.0])
        y = np.array([6600000.0, 6800000.0])
        ax, ay = crs.transform(2154, 5070, x, y)
        x2, y2 = crs.transform(5070, 2154, ax, ay)
        assert np.allclose(x, x2, atol=1e-3)
        assert np.allclose(y, y2, atol=1e-3)


class TestUtmSouthAndPolar:
    def test_utm_south_false_northing_and_roundtrip(self):
        # Sydney, zone 56S (EPSG:32756): known grid ≈ 334 km E / 6,247 km N
        x, y = crs.transform(4326, 32756, np.array([151.2]), np.array([-33.9]))
        assert abs(x[0] - 333569) < 5 and abs(y[0] - 6247473) < 5
        lo, la = crs.transform(32756, 4326, x, y)
        assert abs(lo[0] - 151.2) < 1e-8 and abs(la[0] + 33.9) < 1e-8
        # south northing = north-formula northing + 10,000,000
        xn, yn = crs.lonlat_to_utm(np.array([151.2]), np.array([-33.9]), 56)
        assert abs((y[0] - yn[0]) - 10000000.0) < 1e-6

    def test_polar_poles_map_to_false_origin(self):
        for code, pole in ((3413, 90.0), (3031, -90.0)):
            p = crs.PROJECTIONS[code]
            x, y = p.fwd(np.array([123.0]), np.array([pole]))
            assert abs(x[0] - p.fe) < 1e-6 and abs(y[0] - p.fn) < 1e-6

    def test_polar_scale_unity_at_standard_parallel(self):
        for code, lat in ((3413, 70.0), (3031, -71.0)):
            p = crs.PROJECTIONS[code]
            d = 1e-6
            x1, y1 = p.fwd(np.array([30.0 - d / 2]), np.array([lat]))
            x2, y2 = p.fwd(np.array([30.0 + d / 2]), np.array([lat]))
            phi = np.radians(lat)
            N = crs.WGS84_A / np.sqrt(1 - crs.WGS84_E2 * np.sin(phi) ** 2)
            k = np.hypot(x2 - x1, y2 - y1) / (np.radians(d) * N * np.cos(phi))
            assert abs(k[0] - 1.0) < 1e-6

    def test_polar_orientation(self):
        # EPSG:3413: the 45°W meridian runs down the -y axis (Greenland
        # side); EPSG:3031: the Greenwich meridian runs up the +y axis
        x, y = crs.PROJECTIONS[3413].fwd(np.array([-45.0]), np.array([75.0]))
        assert abs(x[0]) < 1e-6 and y[0] < 0
        x, y = crs.PROJECTIONS[3031].fwd(np.array([0.0]), np.array([-75.0]))
        assert abs(x[0]) < 1e-6 and y[0] > 0

    def test_polar_roundtrips(self):
        for code, lats in ((3413, np.linspace(60, 89, 8)),
                           (3031, np.linspace(-89, -60, 8))):
            p = crs.PROJECTIONS[code]
            LO, LA = np.meshgrid(np.linspace(-180, 175, 16), lats)
            x, y = p.fwd(LO.ravel(), LA.ravel())
            lo2, la2 = p.inv(x, y)
            dl = (lo2 - LO.ravel() + 180) % 360 - 180
            assert np.abs(dl).max() < 1e-9
            assert np.abs(la2 - LA.ravel()).max() < 1e-9


class TestExternalCrsBackend:
    def test_unknown_epsg_raises_with_deploy_hint(self, monkeypatch):
        monkeypatch.setattr(crs, "_EXTERNAL_CRS", [])  # probed, absent
        with pytest.raises(ValueError, match="pip install pyproj"):
            crs.transform(4326, 27700, np.array([0.0]), np.array([51.0]))

    def test_builtin_codes_never_route_external(self, monkeypatch):
        class _Boom:
            def transform(self, *a):
                raise AssertionError("builtin pair must not use the backend")

        monkeypatch.setattr(crs, "_EXTERNAL_CRS", [_Boom()])
        x, y = crs.transform(4326, 2154, np.array([3.0]), np.array([46.5]))
        assert abs(x[0] - 700000.0) < 1e-6

    def test_injected_backend_serves_unknown_codes(self, monkeypatch):
        class _Fake:
            name = "fake"

            def transform(self, s, d, x, y):
                return np.asarray(x) + 1.0, np.asarray(y) + 2.0

        monkeypatch.setattr(crs, "_EXTERNAL_CRS", [_Fake()])
        x, y = crs.transform(4326, 27700, np.array([0.0]), np.array([51.0]))
        assert x[0] == 1.0 and y[0] == 53.0

    def test_pyproj_parity_when_installed(self):
        pyproj = pytest.importorskip("pyproj")  # absent in the sandbox
        tr = pyproj.Transformer.from_crs("EPSG:4326", "EPSG:2154",
                                         always_xy=True)
        lon = np.linspace(-1, 7, 9)
        lat = np.linspace(43, 50, 9)
        px, py = tr.transform(lon, lat)
        bx, by = crs.transform(4326, 2154, lon, lat)
        # null datum shift: RGF93≈WGS84 — agree to the metre
        assert np.abs(np.asarray(px) - bx).max() < 1.0
        assert np.abs(np.asarray(py) - by).max() < 1.0


def test_affine_apply_invert():
    gt = (1000.0, 10.0, 0.0, 5000.0, 0.0, -10.0)
    px = np.array([0.0, 3.0, 7.5])
    py = np.array([0.0, 2.0, 4.25])
    x, y = crs.affine_apply(gt, px, py)
    inv = crs.affine_invert(gt)
    px2, py2 = crs.affine_apply(inv, x, y)
    assert np.allclose(px, px2)
    assert np.allclose(py, py2)


class TestResample:
    def _grid(self, h=12, w=16, seed=3):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 251, size=(h, w)).astype(np.int64)

    def test_nearest_identity(self):
        g = self._grid()
        assert np.array_equal(resample.resample_nearest(g, 16, 12), g)

    def test_bilinear_identity_and_constancy(self):
        g = self._grid()
        out = resample.resample_bilinear(g, 16, 12)
        assert np.allclose(out, g)  # identity at same size
        const = np.full((8, 8), 42.0)
        assert np.allclose(resample.resample_bilinear(const, 13, 5), 42.0)

    def test_bilinear_halfscale_is_block_mean(self):
        # half-pixel convention at 0.5×: sample points hit the exact
        # centre of each 2×2 block → block mean
        g = self._grid(8, 8)
        out = resample.resample_bilinear(g, 4, 4)
        want = resample.resample_average(g, 2)
        assert np.allclose(out, want)

    def test_bilinear_sample_vs_manual(self):
        g = self._grid(6, 6)
        v = resample.bilinear_sample(g, np.array([2.25]), np.array([3.75]))[0]
        want = (
            g[3, 2] * 0.75 * 0.25 + g[3, 3] * 0.25 * 0.25
            + g[4, 2] * 0.75 * 0.75 + g[4, 3] * 0.25 * 0.75
        )
        assert v == pytest.approx(want)

    def test_cubic_identity_and_range(self):
        g = self._grid()
        out = resample.resample_cubic(g, 16, 12)
        assert np.allclose(out, g)  # interpolating kernel: identity at nodes
        up = resample.resample_cubic(g.astype(float), 32, 24)
        assert up.shape == (24, 32)
        # Keys kernel can overshoot but stays near the data range
        assert up.min() > -30 and up.max() < 290

    def test_lanczos_identity_and_constancy(self):
        g = self._grid()
        # normalised windowed sinc: identity at nodes, DC preserved
        assert np.allclose(resample.resample_lanczos(g, 16, 12), g, atol=1e-9)
        const = np.full((9, 9), 17.0)
        assert np.allclose(resample.resample_lanczos(const, 14, 6), 17.0)

    def test_cubicspline_smooths_but_preserves_dc(self):
        const = np.full((10, 10), 33.0)
        assert np.allclose(resample.resample_cubicspline(const, 15, 7), 33.0)
        imp = np.zeros((11, 11))
        imp[5, 5] = 90.0
        out = resample.resample_cubicspline(imp, 11, 11)
        # B-spline kernel SMOOTHS: the impulse peak drops (no prefilter)
        assert out[5, 5] < 90.0 and out[5, 5] > 0
        assert out[4, 5] > 0  # energy spread to neighbours

    def test_resample_dispatch_all_methods(self):
        g = self._grid()
        for m in ("nearest", "bilinear", "cubic", "cubicspline", "lanczos"):
            out = resample.resample(g, 8, 6, m)
            assert out.shape == (6, 8)

    def test_mode_blocks(self):
        g = np.array([[1, 1, 2, 2], [1, 3, 2, 5], [4, 4, 6, 6], [4, 4, 6, 7]])
        out = resample.resample_mode(g, 2)
        assert out.tolist() == [[1, 2], [4, 6]]


def test_reproject_operators_roundtrip(spark):
    from rsgislib_spark.operators.reproject import reproject_footprints, reproject_points

    pdf = pd.DataFrame(
        {
            "pt_id": [1, 2, 3],
            "x": [50000.0, 75000.5, 99000.25],
            "y": [40000.0, 61000.5, 88000.75],
        }
    )
    df = spark.createDataFrame(pdf)
    rt = reproject_points(
        reproject_points(df, 3857, 4326), 4326, 3857
    ).toPandas().set_index("pt_id")
    for pid, x, y in pdf.itertuples(index=False):
        assert rt.loc[pid, "x"] == pytest.approx(x, abs=1e-6)
        assert rt.loc[pid, "y"] == pytest.approx(y, abs=1e-6)

    fp = pd.DataFrame(
        {"image_key": [1], "minx": [50000.0], "miny": [40000.0],
         "maxx": [51280.0], "maxy": [40640.0]}
    )
    fdf = spark.createDataFrame(fp)
    out = reproject_footprints(fdf, 3857, 4326).toPandas().iloc[0]
    # envelope stays ordered and in plausible degree range near (0.45°, 0.36°)
    assert 0.4 < out["minx"] < out["maxx"] < 0.5
    assert 0.3 < out["miny"] < out["maxy"] < 0.4
    back = reproject_footprints(
        reproject_footprints(fdf, 3857, 4326), 4326, 3857
    ).toPandas().iloc[0]
    assert back["minx"] == pytest.approx(50000.0, abs=1e-6)
    assert back["maxy"] == pytest.approx(40640.0, abs=1e-6)
