"""Unit tests for the focal-window and band-math kernel families plus
deterministic sampling — brute-force oracles, reference semantics noted
per function (SURVEY.md §2.2/§2.5/§2.6)."""

import numpy as np
import pytest

from rsgislib_spark.kernels import bands as BK
from rsgislib_spark.kernels import focal as FK


def brute_focal(arr, radius, fn):
    h, w = arr.shape
    out = np.empty((h, w), dtype=np.float64)
    for y in range(h):
        for x in range(w):
            win = arr[max(y - radius, 0): y + radius + 1, max(x - radius, 0): x + radius + 1]
            out[y, x] = fn(win)
    return out


@pytest.fixture(scope="module")
def raster():
    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    return rng.integers(0, 255, (23, 31)).astype(np.int64)


def test_focal_sum_count_matches_brute(raster):
    s, c = FK.focal_sum_count(raster, 1)
    assert np.array_equal(s, brute_focal(raster, 1, np.sum).astype(np.int64))
    assert np.array_equal(c, brute_focal(raster, 1, np.size).astype(np.int64))


def test_focal_sum_count_radius2(raster):
    s, c = FK.focal_sum_count(raster, 2)
    assert np.array_equal(s, brute_focal(raster, 2, np.sum).astype(np.int64))
    assert c[0, 0] == 9 and c[5, 5] == 25  # corner window clipped to 3x3


def test_focal_mean_min_max_median(raster):
    assert np.allclose(FK.focal_mean(raster, 1), brute_focal(raster, 1, np.mean))
    assert np.array_equal(FK.focal_min(raster, 1), brute_focal(raster, 1, np.min))
    assert np.array_equal(FK.focal_max(raster, 1), brute_focal(raster, 1, np.max))
    assert np.allclose(FK.focal_median(raster, 1), brute_focal(raster, 1, np.median))


def test_focal_stddev(raster):
    assert np.allclose(
        FK.focal_stddev_pop(raster, 1), brute_focal(raster, 1, lambda w: np.std(w))
    )


def test_focal_range(raster):
    assert np.array_equal(
        FK.focal_range(raster, 1), brute_focal(raster, 1, np.ptp).astype(np.int64)
    )


def test_slope_flat_and_ramp():
    flat = np.full((9, 9), 100.0)
    assert np.allclose(FK.slope_degrees(flat, 10.0), 0.0)
    ramp = np.tile(np.arange(9, dtype=np.float64), (9, 1)) * 10.0  # dz/dx = 1
    interior = FK.slope_degrees(ramp, 10.0)[2:-2, 2:-2]
    assert np.allclose(interior, 45.0)


def test_synth_bands_deterministic_and_in_range():
    g1 = BK.synth_band_grid(707, 64, 40, "red")
    g2 = BK.synth_band_grid(707, 64, 40, "red")
    assert np.array_equal(g1, g2)
    assert g1.min() >= 0 and g1.max() < 251
    nir = BK.synth_band_grid(707, 64, 40, "nir")
    assert nir.max() < 241 and not np.array_equal(g1, nir)


def test_ndvi_guard_and_values():
    red = np.array([[10, 0], [100, 251]], dtype=np.int64) % 251
    nir = np.array([[30, 0], [50, 0]], dtype=np.int64)
    v = BK.ndvi(red, nir)
    assert v[0, 0] == pytest.approx(0.5)
    assert v[0, 1] == 0.0  # 0/0 guard
    assert v[1, 0] == pytest.approx(-1 / 3)


def test_rmse_sq_sum():
    a = np.array([[1, 2]], dtype=np.int64)
    b = np.array([[4, 0]], dtype=np.int64)
    assert BK.rmse_sq_sum(a, b) == 9 + 4


def test_focal_operator_matches_whole_array(spark):
    """focal_stats_tiled (halo tiles) == whole-array focal_sum_count."""
    from rsgislib_spark.operators.focal import focal_stats_tiled

    imgs = spark.createDataFrame(
        [(401, 100, 64), (802, 37, 53)], "image_key long, w int, h int"
    )
    got = {
        r["image_key"]: (r["sum_focal_sum"], r["sum_focal_cnt"])
        for r in focal_stats_tiled(imgs, "sum_count", radius=1, tile=32).collect()
    }
    for key, w, h in [(401, 100, 64), (802, 37, 53)]:
        grid = BK.synth_band_grid(key, w, h, "red")
        s, c = FK.focal_sum_count(grid, 1)
        assert got[key] == (int(s.sum()), int(c.sum()))


def test_focal_operator_remainder_tile_equals_radius(spark):
    """Regression: when size % tile is in (0, radius], the expanded window
    of an interior tile reaches the image edge while a remainder tile
    still exists; the interior crop must come from the anchor span, not
    halo inference, or halo pixels double-count."""
    from rsgislib_spark.operators.focal import focal_stats_tiled

    cases = [(901, 33, 33), (902, 65, 64), (903, 37, 33)]  # 33%32=1==radius
    imgs = spark.createDataFrame(cases, "image_key long, w int, h int")
    got = {
        r["image_key"]: (r["sum_focal_sum"], r["sum_focal_cnt"])
        for r in focal_stats_tiled(imgs, "sum_count", radius=1, tile=32).collect()
    }
    for key, w, h in cases:
        grid = BK.synth_band_grid(key, w, h, "red")
        s, c = FK.focal_sum_count(grid, 1)
        assert got[key] == (int(s.sum()), int(c.sum())), (key, w, h)


def test_kuwahara_pick_int_vs_brute():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 251, size=(12, 15)).astype(np.int64)
    win_sum, n = FK.kuwahara_pick_int(a, radius=1)
    assert n == 4 and win_sum.shape == (10, 13)
    for yi in range(10):
        for xi in range(13):
            y, x = yi + 1, xi + 1
            quads = [
                a[y - 1 : y + 1, x - 1 : x + 1],
                a[y - 1 : y + 1, x : x + 2],
                a[y : y + 2, x - 1 : x + 1],
                a[y : y + 2, x : x + 2],
            ]
            metrics = [4 * int((q * q).sum()) - int(q.sum()) ** 2 for q in quads]
            pick = int(np.argmin(metrics))  # first-wins
            assert win_sum[yi, xi] == int(quads[pick].sum()), (y, x)


def test_hash_bucket_stable_and_partition_invariant(spark):
    from pyspark.sql import functions as F

    from rsgislib_spark.functions.sampling import hash_bucket, train_test_split

    df = spark.range(0, 2000).select(F.col("id"))
    b1 = df.repartition(13).select(hash_bucket(F.col("id")).alias("b")).groupBy("b").count()
    b2 = df.repartition(3).select(hash_bucket(F.col("id")).alias("b")).groupBy("b").count()
    assert {tuple(r) for r in b1.collect()} == {tuple(r) for r in b2.collect()}
    train, test = train_test_split(df, F.col("id"))
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 2000
    assert 0.2 < n_test / 2000 < 0.4  # ~3/10 buckets


def test_chebyshev_distance_transform_vs_brute():
    from rsgislib_spark.kernels.disttrans import buffer_mask, chebyshev_distance_transform

    def brute(targets):
        h, w = targets.shape
        ty, tx = np.nonzero(targets)
        yy, xx = np.mgrid[0:h, 0:w]
        return np.maximum(
            np.abs(yy[:, :, None] - ty[None, None, :]),
            np.abs(xx[:, :, None] - tx[None, None, :]),
        ).min(axis=2).astype(np.int64)

    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    for dens in (0.01, 0.2):
        for _ in range(5):
            m = rng.random((37, 53)) < dens
            if m.any():
                assert np.array_equal(chebyshev_distance_transform(m), brute(m))
    m = np.zeros((20, 20), bool)
    m[3, 4] = True
    assert buffer_mask(m, 2).sum() == 25  # 5x5 chessboard ball
    assert (chebyshev_distance_transform(np.zeros((4, 4), bool)) >= 1 << 30).all()


def brute_kuwahara(a, r):
    a = a.astype(np.float64)
    h, w = a.shape
    out = np.empty((h, w))
    for y in range(h):
        for x in range(w):
            best = None
            for (y0, y1, x0, x1) in [
                (y - r, y, x - r, x), (y - r, y, x, x + r),
                (y, y + r, x - r, x), (y, y + r, x, x + r),
            ]:
                win = a[max(y0, 0): y1 + 1, max(x0, 0): x1 + 1]
                cand = (win.var(), win.mean())
                if best is None or cand[0] < best[0]:
                    best = cand
            out[y, x] = best[1]
    return out


def test_morphology_composites(raster):
    assert np.array_equal(FK.morph_opening(raster, 1),
                          FK.focal_max(FK.focal_min(raster, 1), 1))
    assert (FK.white_tophat(raster, 1) >= 0).all()   # opening <= arr
    assert (FK.black_tophat(raster, 1) >= 0).all()   # closing >= arr
    assert np.array_equal(FK.morph_gradient(raster, 1), FK.focal_range(raster, 1))


def test_kuwahara_matches_brute(raster):
    got = FK.kuwahara(raster, 2)
    want = brute_kuwahara(raster, 2)
    assert np.allclose(got, want)


def test_kuwahara_preserves_step_edge():
    a = np.zeros((12, 12)); a[:, 6:] = 100.0
    out = FK.kuwahara(a, 2)
    assert np.allclose(np.unique(out), [0.0, 100.0])  # no edge blur


def test_lee_filter_limits(raster):
    # huge noise variance -> output ~ local mean; zero noise -> ~identity
    smooth = FK.lee_filter(raster, 1, noise_var=1e12)
    assert np.allclose(smooth, FK.focal_mean(raster, 1), atol=1e-3)
    sharp = FK.lee_filter(raster, 1, noise_var=0.0)
    assert np.allclose(sharp, raster, atol=1e-6)
