"""Statistics-filter kernels: reference semantics on hand-checked
windows, tiled-vs-whole-array exactness, and the operator output."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.kernels import focal as FK
from rsgislib_spark.kernels.bands import synth_band_grid
from rsgislib_spark.kernels.pixelmath import tile_windows_overlap_anchored


def test_small_window_semantics():
    a = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.int64)
    # centre pixel: full 3x3 window
    assert FK.focal_total(a)[1, 1] == 45
    assert FK.focal_total_diff(a)[1, 1] == 45 - 9 * 5
    assert FK.focal_total_diff_abs(a)[1, 1] == sum(abs(v - 5) for v in range(1, 10))
    assert FK.focal_mean_diff(a)[1, 1] == (45 - 45) / 8
    # corner pixel: clipped 2x2 in-bounds window {1,2,4,5}
    assert FK.focal_total(a)[0, 0] == 12
    assert FK.focal_total_diff(a)[0, 0] == 12 - 4 * 1
    assert FK.focal_total_diff_abs(a)[0, 0] == (0 + 1 + 3 + 4)
    assert FK.focal_mean_diff(a)[0, 0] == pytest.approx(8 / 3)
    cv = FK.focal_coeff_of_var(a)
    m = np.mean(a)
    assert cv[1, 1] == pytest.approx(np.sqrt(np.mean((a - m) ** 2)) / m)


def test_mode_smallest_on_tie():
    a = np.array([[1, 1, 2], [2, 3, 3], [4, 5, 6]], np.int64)
    # centre window counts: 1x2, 2x2, 3x2, 4/5/6 x1 -> tie 1/2/3, pick 1
    assert FK.focal_mode(a)[1, 1] == 1
    # corner (0,0) in-bounds window {1,1,2,3}: mode 1
    assert FK.focal_mode(a)[0, 0] == 1


def test_mode_matches_bruteforce():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 9, size=(17, 13)).astype(np.int64)
    got = FK.focal_mode(a)
    for y in range(a.shape[0]):
        for x in range(a.shape[1]):
            win = a[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2].ravel()
            counts = np.bincount(win)
            want = int(np.flatnonzero(counts == counts.max())[0])
            assert got[y, x] == want, (y, x)


def test_mode_requires_int():
    with pytest.raises(ValueError):
        FK.focal_mode(np.zeros((2, 2), np.float64))


@pytest.mark.parametrize("w,h,tile", [(130, 67, 64), (128, 128, 64)])
def test_tiled_equals_whole(w, h, tile):
    grid = synth_band_grid(401, w, h, "red")
    s, c = FK.focal_sum_count(grid, 1)
    want = (
        int(s.sum()),
        int(np.abs(FK.focal_total_diff(grid, 1)).sum()),
        int(FK.focal_total_diff_abs(grid, 1).sum()),
        int((c - 1).sum()),
        int(FK.focal_mode(grid, 1).sum()),
    )
    acc = [0] * 5
    for tx, ty, x0, y0, tw, th, ax0, ay0, aw, ah in (
        tile_windows_overlap_anchored(w, h, tile, tile, overlap=1)
    ):
        sub = grid[y0 : y0 + th, x0 : x0 + tw]
        iy0, ix0 = ay0 - y0, ax0 - x0
        crop = (slice(iy0, iy0 + ah), slice(ix0, ix0 + aw))
        ss, cc = FK.focal_sum_count(sub, 1)
        acc[0] += int(ss[crop].sum())
        acc[1] += int(np.abs(FK.focal_total_diff(sub, 1)[crop]).sum())
        acc[2] += int(FK.focal_total_diff_abs(sub, 1)[crop].sum())
        acc[3] += int((cc[crop] - 1).sum())
        acc[4] += int(FK.focal_mode(sub, 1)[crop].sum())
    assert tuple(acc) == want


def test_operator_output(spark):
    from rsgislib_spark.operators.focal import stat_filters_tiled

    images = spark.createDataFrame(
        pd.DataFrame({"image_key": [5], "w": [66], "h": [70]})
    )
    row = stat_filters_tiled(images, tile=64).toPandas().iloc[0]
    grid = synth_band_grid(5, 66, 70, "red")
    s, c = FK.focal_sum_count(grid, 1)
    assert row["n_px"] == 66 * 70
    assert row["sum_total"] == int(s.sum())
    assert row["sum_abs_total_diff"] == int(
        np.abs(FK.focal_total_diff(grid, 1)).sum()
    )
    assert row["sum_abs_total_diff"] > 0  # signed sums would telescope to 0
    assert row["sum_abs_nbr_diff"] == int(FK.focal_total_diff_abs(grid, 1).sum())
    assert row["sum_nbrs"] == int((c - 1).sum())
    assert row["sum_mode"] == int(FK.focal_mode(grid, 1).sum())


def _brute_norm_var(arr, moments, radius=1):
    h, w = arr.shape
    out = np.zeros((h, w))
    for y in range(h):
        for x in range(w):
            if arr[y, x] == 0 or not np.isfinite(arr[y, x]):
                continue
            win = arr[max(0, y - radius) : y + radius + 1,
                      max(0, x - radius) : x + radius + 1].ravel()
            vals = win[(win != 0) & np.isfinite(win)]
            if len(vals) > 3:
                m1 = np.mean(moments[0](vals))
                m2 = np.mean(moments[1](vals))
                out[y, x] = m2 / (m1 * m1) - 1.0
    return out


def test_sar_norm_var_family():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 20, size=(12, 9)).astype(np.float64)  # zeros present
    got_p = FK.focal_norm_var_power(a)
    want_p = _brute_norm_var(a, (lambda v: v, lambda v: v * v))
    np.testing.assert_allclose(got_p, want_p, atol=1e-9)

    got_a = FK.focal_norm_var_amplitude(a)
    want_a = _brute_norm_var(a, (np.sqrt, lambda v: v))
    np.testing.assert_allclose(got_a, want_a, atol=1e-9)

    got_l = FK.focal_norm_var_ln_power(a)
    want_l = _brute_norm_var(a, (np.log, lambda v: np.log(v) ** 2))
    np.testing.assert_allclose(got_l, want_l, atol=1e-9)


def test_texture_var():
    rng = np.random.RandomState(11)
    a = rng.randint(0, 20, size=(10, 8)).astype(np.float64)
    got = FK.focal_texture_var(a)
    h, w = a.shape
    for y in range(h):
        for x in range(w):
            if a[y, x] == 0:
                assert got[y, x] == 0.0
                continue
            win = a[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2].ravel()
            vals = win[win != 0]
            n = len(vals)
            if n <= 3:
                assert got[y, x] == 0.0
                continue
            cv2 = np.var(vals) / np.mean(vals) ** 2
            want = (cv2 - 1.0 / n) / (1.0 + 1.0 / n)
            assert got[y, x] == pytest.approx(want, abs=1e-9), (y, x)


def test_circular_se():
    se3 = FK.circular_se(3)
    # r=1: (r+0.25)^2 = 1.5625 -> corners (2) excluded, cross included
    assert se3.tolist() == [[False, True, False], [True, True, True], [False, True, False]]
    se5 = FK.circular_se(5)
    assert se5[0, 0] == False and se5[2, 2] == True and se5[0, 2] == True
    with pytest.raises(ValueError):
        FK.circular_se(4)


def test_se_erode_dilate_bruteforce():
    rng = np.random.RandomState(5)
    a = rng.randint(0, 50, size=(11, 9)).astype(np.int64)
    se = FK.circular_se(3)
    er = FK.morph_erode_se(a, se)
    di = FK.morph_dilate_se(a, se)
    h, w = a.shape
    for y in range(h):
        for x in range(w):
            vals = []
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    if se[dy + 1, dx + 1] and 0 <= y + dy < h and 0 <= x + dx < w:
                        vals.append(a[y + dy, x + dx])
            assert er[y, x] == min(vals)
            assert di[y, x] == max(vals)


def test_local_minima():
    a = np.array([[5, 4, 5], [4, 1, 4], [5, 4, 5]], np.int64)
    m = FK.local_minima(a)
    assert m[1, 1] == 1 and m.sum() == 1
    # plateau: allow_equals keeps both, strict drops both
    b = np.array([[3, 3, 9], [9, 9, 9], [9, 9, 9]], np.int64)
    assert FK.local_minima(b, allow_equals=True)[0, 0] == 1
    assert FK.local_minima(b, allow_equals=True)[0, 1] == 1
    assert FK.local_minima(b, allow_equals=False)[0, 0] == 0
    # circular SE: corner neighbours are ignored
    c = np.array([[0, 9, 9], [9, 5, 9], [9, 9, 0]], np.int64)
    assert FK.local_minima(c, se=FK.circular_se(3))[1, 1] == 1  # diagonals excluded
    assert FK.local_minima(c)[1, 1] == 0


def test_float_raster_focal_stats_exact():
    """Float rasters must NOT be truncated by int64 accumulators
    (ADVICE r3: focal_coeff_of_var squared via astype(int64))."""
    rng = np.random.RandomState(11)
    a = rng.rand(9, 7) * 3.0  # fractional values throughout
    r = 1
    h, w = a.shape
    for y in range(h):
        for x in range(w):
            win = a[max(0, y - r): y + r + 1, max(0, x - r): x + r + 1]
            m, sd = win.mean(), win.std()
            assert abs(FK.focal_mean(a, r)[y, x] - m) < 1e-9
            assert abs(FK.focal_stddev_pop(a, r)[y, x] - sd) < 1e-9
            assert abs(FK.focal_coeff_of_var(a, r)[y, x] - sd / m) < 1e-9
            assert abs(FK.focal_total_diff(a, r)[y, x] - (win.sum() - win.size * a[y, x])) < 1e-9
            assert abs(
                FK.focal_mean_diff(a, r)[y, x]
                - (win.sum() - win.size * a[y, x]) / (win.size - 1)
            ) < 1e-9


def test_int_raster_focal_stats_still_integer_exact():
    a = (np.arange(35, dtype=np.int64) ** 3).reshape(5, 7) % 1000
    s, c = FK.focal_sum_count(a, 1)
    assert s.dtype == np.int64  # integer rasters keep exact int64 sums
    assert s[0, 0] == a[:2, :2].sum()
