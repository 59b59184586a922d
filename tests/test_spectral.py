"""Savitzky–Golay spectral smoothing vs direct polynomial-fit replay."""

import numpy as np
import pytest

from rsgislib_spark.kernels.spectral import (
    savgol_coeffs_int,
    savgol_numerator,
    savgol_spectral,
)


def naive_savgol(series, win, poly):
    """Per-point SG by explicit local polyfit (mode='interp' edges)."""
    n = len(series)
    half = win // 2
    out = np.empty(n, float)
    x = np.arange(win, dtype=float)
    V = np.vander(x, poly + 1, increasing=True)
    P = V @ np.linalg.pinv(V)
    for i in range(n):
        if i < half:
            out[i] = (P @ series[:win])[i]
        elif i >= n - half:
            out[i] = (P @ series[n - win :])[i - (n - win)]
        else:
            out[i] = (P @ series[i - half : i + half + 1])[half]
    return out


@pytest.mark.parametrize("win,poly", [(5, 2), (5, 3), (7, 2), (9, 2)])
def test_savgol_matches_polyfit(win, poly):
    rng = np.random.RandomState(win * 10 + poly)
    cube = rng.randint(0, 251, size=(12, 4, 3)).astype(np.int64)
    got = savgol_spectral(cube, win, poly)
    for y in range(4):
        for x in range(3):
            want = naive_savgol(cube[:, y, x].astype(float), win, poly)
            assert np.allclose(got[:, y, x], want, atol=1e-8), (y, x)


def test_savgol_integer_taps_exact():
    taps, div = savgol_coeffs_int(5, 3)
    assert taps.sum() == div  # preserves constants
    cube = np.arange(10 * 2 * 2, dtype=np.int64).reshape(10, 2, 2) % 251
    num = savgol_numerator(cube, 5, 3)
    assert num.shape == (6, 2, 2)
    # linear series are reproduced exactly by SG (poly >= 1)
    lin = (np.arange(10, dtype=np.int64) * 7)[:, None, None] * np.ones((1, 2, 2), np.int64)
    out = savgol_numerator(lin, 5, 3)
    assert np.array_equal(out, 35 * lin[2:8])


def test_savgol_exactly_fits_quadratic():
    x = np.arange(11, dtype=np.float64)
    quad = (3 * x * x - 5 * x + 2)[:, None, None] * np.ones((1, 1, 1))
    sm = savgol_spectral(quad, 5, 2)
    assert np.allclose(sm, quad, atol=1e-7)  # incl. the 'interp' edges


def test_savgol_unknown_window_raises():
    with pytest.raises(ValueError):
        savgol_coeffs_int(11, 4)
    with pytest.raises(ValueError):
        savgol_spectral(np.zeros((3, 2, 2)), 5, 3)  # too few bands
