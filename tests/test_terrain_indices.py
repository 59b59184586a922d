"""Terrain kernels, derivative filters, and spectral-index breadth —
golden-value and property tests (no Spark needed)."""

import numpy as np
import pytest

from rsgislib_spark.kernels import bands as BK
from rsgislib_spark.kernels import focal as FK
from rsgislib_spark.kernels import terrain as TK


class TestTerrain:
    def _ramp_east(self, slope_per_px=2.0, n=12):
        # elevation increases toward +x (east)
        return np.tile(np.arange(n) * slope_per_px, (n, 1))

    def test_slope_aspect_on_ramp(self):
        dem = self._ramp_east(2.0)
        slope, aspect = TK.slope_aspect(dem, res=1.0)
        # interior: dz/dx = 2 exactly, dz/dy = 0
        assert np.allclose(np.tan(slope[2:-2, 2:-2]), 2.0)
        asp = TK.aspect_degrees(dem, res=1.0)
        # upslope to the east ⇒ aspect faces WEST (270°)
        assert np.allclose(asp[2:-2, 2:-2], 270.0)

    def test_aspect_flat_flag(self):
        assert (TK.aspect_degrees(np.zeros((6, 6))) == -1.0).all()

    def test_hillshade_flat_and_range(self):
        # flat surface, altitude 45° ⇒ hs = 255·cos(45°)
        flat = TK.hillshade(np.zeros((8, 8)), altitude=45.0)
        assert np.allclose(flat, 255.0 * np.cos(np.radians(45.0)))
        rng = np.random.default_rng(2)
        hs = TK.hillshade(rng.uniform(0, 100, (16, 16)), res=1.0)
        assert hs.min() >= 0.0 and hs.max() <= 255.0

    def test_hillshade_sun_facing_brighter(self):
        # sun from NW (az 315): a NW-facing ramp is brighter than SE-facing
        dem = self._ramp_east(1.0)  # east-rising = west-facing
        hs_w = TK.hillshade(dem, azimuth=270.0)[3:-3, 3:-3].mean()  # sun west
        hs_e = TK.hillshade(dem, azimuth=90.0)[3:-3, 3:-3].mean()  # sun east
        assert hs_w > hs_e

    def test_incidence_and_local_shadow(self):
        dem = self._ramp_east(5.0)
        inc = TK.incidence_angle(dem, azimuth=270.0, altitude=10.0)
        assert (inc >= 0).all() and (inc <= np.pi).all()
        # steep anti-sun slope at low sun → self-shadow
        sm = TK.shadow_mask_local(dem, azimuth=90.0, altitude=5.0)
        assert sm[3:-3, 3:-3].all()

    def test_cast_shadow_behind_wall(self):
        # a tall wall at x=10; sun from the EAST (az 90) at 45°: cells
        # west of the wall within (height) cells are shadowed
        dem = np.zeros((9, 21))
        dem[:, 10] = 5.0
        sm = TK.cast_shadow_mask(dem, res=1.0, azimuth=90.0, altitude=45.0)
        # tan(45)=1 → shadow reaches 5 cells west of the wall (x 5..9)
        assert sm[4, 6] == 1 and sm[4, 9] == 1
        assert sm[4, 4] == 0  # beyond the shadow length
        assert sm[4, 12] == 0  # sun side unshadowed
        # the wall crest itself is lit
        assert sm[4, 10] == 0

    def test_cast_shadow_flat_and_altitude(self):
        assert TK.cast_shadow_mask(np.zeros((8, 8))).sum() == 0
        dem = np.zeros((9, 21)); dem[:, 10] = 5.0
        lo = TK.cast_shadow_mask(dem, azimuth=90.0, altitude=20.0).sum()
        hi = TK.cast_shadow_mask(dem, azimuth=90.0, altitude=70.0).sum()
        assert lo > hi  # lower sun → longer shadows

    def test_cast_shadow_matches_brute(self):
        rng = np.random.default_rng(8)
        dem = rng.uniform(0, 6, (14, 14))
        az, alt = 225.0, 30.0
        got = TK.cast_shadow_mask(dem, azimuth=az, altitude=alt)
        dxx = np.sin(np.radians(az)); dyy = -np.cos(np.radians(az))
        ta = np.tan(np.radians(alt))
        from rsgislib_spark.kernels.resample import bilinear_sample
        for y in range(0, 14, 3):
            for x in range(0, 14, 3):
                sh = 0
                for s in range(1, 20):
                    px, py = x + s * dxx, y + s * dyy
                    if not (0 <= px <= 13 and 0 <= py <= 13):
                        break
                    z = bilinear_sample(dem, np.array([px]), np.array([py]))[0]
                    if z > dem[y, x] + s * ta:
                        sh = 1
                        break
                assert got[y, x] == sh, (x, y)

    def test_dem_fill_fills_pit(self):
        dem = np.full((9, 9), 10.0)
        dem[4, 4] = 1.0  # pit
        filled = TK.dem_fill(dem)
        assert filled[4, 4] == 10.0
        assert np.array_equal(filled[0], dem[0])  # border untouched
        # surfaces without depressions are unchanged
        ramp = self._ramp_east(1.0)
        assert np.allclose(TK.dem_fill(ramp), ramp)

    def test_detrend_removes_plane(self):
        yy, xx = np.mgrid[0:10, 0:12]
        plane = 3.0 * xx - 2.0 * yy + 7.0
        assert np.allclose(TK.detrend(plane), 0.0, atol=1e-8)
        bump = plane.copy()
        bump[5, 6] += 10.0
        assert abs(TK.detrend(bump)[5, 6] - 10.0) < 1.0


class TestDerivFilters:
    def test_prewitt_on_ramp(self):
        ramp = np.tile(np.arange(10.0), (10, 1))
        gx, gy = FK.prewitt(ramp)
        assert np.allclose(gx[2:-2, 2:-2], 6.0)  # 3 rows × step 2
        assert np.allclose(gy[2:-2, 2:-2], 0.0)

    def test_laplacian_zero_on_plane_peak_on_impulse(self):
        yy, xx = np.mgrid[0:9, 0:9]
        plane = 2.0 * xx + 3.0 * yy
        assert np.allclose(FK.laplacian(plane)[1:-1, 1:-1], 0.0)
        imp = np.zeros((9, 9))
        imp[4, 4] = 1.0
        lap = FK.laplacian(imp)
        assert lap[4, 4] == -4.0 and lap[4, 3] == 1.0

    def test_gaussian_smooth_preserves_mean_and_flat(self):
        flat = np.full((12, 12), 7.0)
        assert np.allclose(FK.gaussian_smooth(flat, 1.5), 7.0)
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 10, (40, 40))
        sm = FK.gaussian_smooth(a, 1.0)
        # interior mean preserved to ~edge effects; variance reduced
        assert sm.var() < a.var()

    def test_gaussian_derivs(self):
        ramp = np.tile(np.arange(20.0), (20, 1))
        gx, gy = FK.gaussian_deriv1(ramp, sigma=1.0)
        # d/dx of a unit ramp ≈ 1 in the interior (DoG is exact on linear)
        assert np.allclose(gx[5:-5, 5:-5], 1.0, atol=1e-6)
        assert np.allclose(gy[5:-5, 5:-5], 0.0, atol=1e-9)
        log = FK.gaussian_deriv2(ramp, sigma=1.0)
        assert np.allclose(log[5:-5, 5:-5], 0.0, atol=1e-6)


class TestIndices:
    def test_ratio_indices_golden(self):
        g = np.array([[100.0]])
        n = np.array([[300.0]])
        s = np.array([[200.0]])
        b = np.array([[50.0]])
        assert BK.wbi(b, n)[0, 0] == pytest.approx(50.0 / 300.0)
        assert BK.ndwi_swir(n, s)[0, 0] == pytest.approx(100.0 / 500.0)
        assert BK.gndwi(g, n)[0, 0] == pytest.approx(-200.0 / 400.0)
        assert BK.gmndwi(g, s)[0, 0] == pytest.approx(-100.0 / 300.0)
        assert BK.ndsi(g, s)[0, 0] == BK.gmndwi(g, s)[0, 0]
        assert BK.nbr(n, s)[0, 0] == pytest.approx(100.0 / 500.0)
        assert BK.gndvi(g, n)[0, 0] == pytest.approx(200.0 / 400.0)
        assert BK.mvi(g, n, s)[0, 0] == pytest.approx(200.0 / 100.0)

    def test_guard_values(self):
        z = np.array([[0.0]])
        assert BK.wbi(z, z)[0, 0] == -999.0
        assert BK.ndwi_swir(z, z)[0, 0] == -999.0
        assert BK.whiteness(z, z, z)[0, 0] == -999.0
        assert BK.ctvi(z, z)[0, 0] == -999.0

    def test_whiteness_and_brightness(self):
        b, g, r = np.array([[90.0]]), np.array([[100.0]]), np.array([[110.0]])
        # mean 100 → |Δ| sum = 20 → /100
        assert BK.whiteness(b, g, r)[0, 0] == pytest.approx(0.2)
        assert BK.brightness_norm(b, g, r, 1000.0)[0, 0] == pytest.approx(0.1)

    def test_ctvi_formula(self):
        r, n = np.array([[100.0]]), np.array([[300.0]])
        ndvi = 200.0 / 400.0
        want = (ndvi + 0.5) / np.sqrt(abs(ndvi + 0.5))
        assert BK.ctvi(r, n)[0, 0] == pytest.approx(want)

    def test_bai_and_evi(self):
        r, n = np.array([[100.0]]), np.array([[60.0]])
        # r/1000=0.1, n/1000=0.06 → denominator 0 → exact singularity
        out = BK.bai(r, n, 1000.0)
        assert np.isinf(out[0, 0])  # exact burn-point singularity
        r2, n2 = np.array([[200.0]]), np.array([[160.0]])
        want = 1.0 / ((0.1 - 0.2) ** 2 + (0.06 - 0.16) ** 2)
        assert BK.bai(r2, n2, 1000.0)[0, 0] == pytest.approx(want)
        b = np.array([[50.0]])
        evi = BK.evi(b, r2, n2, refl_scale_factor=0.001)
        den = 0.16 + 6.0 * 0.2 - 7.5 * 0.05 + 1.0
        assert evi[0, 0] == pytest.approx(2.5 * (0.16 - 0.2) / den)


def test_fft_dem_fusion():
    import numpy as np
    from rsgislib_spark.kernels import terrain as TK

    rng = np.random.RandomState(3)
    coarse = np.repeat(np.repeat(rng.uniform(100, 200, (4, 4)), 8, 0), 8, 1)
    detail = rng.uniform(-3, 3, (32, 32))
    high = coarse + detail
    low = coarse  # the smooth structure only
    fused = TK.fft_dem_fusion(high, low, c_size=4)
    # fused keeps low's coarse structure with high's detail: closer to
    # high than low is, but anchored to the low-res means
    assert abs(fused.mean() - low.mean()) < 1.0
    assert np.abs(fused - high).mean() < np.abs(low - high).mean() + 0.5
    # degenerate cases
    assert np.allclose(TK.fft_dem_fusion(high, low, c_size=0), np.abs(high), atol=1e-9)
    full = TK.fft_dem_fusion(high, low, c_size=16)
    assert np.allclose(full, np.abs(low), atol=1e-9)
    import pytest as _pt
    with _pt.raises(ValueError):
        TK.fft_dem_fusion(high, low[:16, :16])
