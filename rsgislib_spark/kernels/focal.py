"""Focal (2-D sliding window) kernels — pure numpy.

The reference's imagefilter/imagemorphology/elevation families are all
windowed per-pixel reductions (SURVEY.md §2.5): median/mean/min/max/...
filters (python/rsgislib/imagefilter/__init__.py:37-980), morphology
dilate/erode (python/src/imagemorphology.cpp), 3×3 terrain derivatives
(python/src/elevation.cpp).

Edge rule: windows are clipped at the raster edge — the reduction runs
over the in-bounds pixels only (sum & count tracked separately so exact
integer parity with a SQL neighbour-join oracle is possible).

In the engine these kernels run per tile-with-halo inside mapInPandas
(operators/focal.py); the halo width equals the filter radius so tile
outputs are exact, matching the reference's tiled-filter blueprint
(python/rsgislib/imagefilter/tiledfilter.py).
"""

from __future__ import annotations

import numpy as np


def _integral(arr: np.ndarray, dtype=np.int64) -> np.ndarray:
    """Summed-area table with a zero row/col prepended."""
    s = np.zeros((arr.shape[0] + 1, arr.shape[1] + 1), dtype=dtype)
    np.cumsum(np.cumsum(arr, axis=0, dtype=dtype), axis=1, out=s[1:, 1:])
    return s


def focal_sum_count(arr: np.ndarray, radius: int = 1, dtype=np.int64):
    """(sum, count) of the clipped (2r+1)² window around every pixel.

    O(1) per pixel via integral image — integer-exact. Counts are
    analytic (outer product of per-axis clipped window lengths), so only
    one integral image is materialized; pass ``dtype=np.int32`` when
    ``arr.max() * arr.size < 2**31`` to halve memory traffic (the fused
    pipeline kernel does — bandwidth, not FLOPs, bounds this kernel).
    """
    h, w = arr.shape
    s = _integral(arr, dtype)
    y0 = np.clip(np.arange(h) - radius, 0, h)
    y1 = np.clip(np.arange(h) + radius + 1, 0, h)
    x0 = np.clip(np.arange(w) - radius, 0, w)
    x1 = np.clip(np.arange(w) + radius + 1, 0, w)
    Y0, X0 = np.ix_(y0, x0)
    Y1, X1 = np.ix_(y1, x1)
    win_sum = s[Y1, X1] - s[Y0, X1] - s[Y1, X0] + s[Y0, X0]
    win_cnt = np.outer((y1 - y0).astype(np.int64), (x1 - x0).astype(np.int64))
    return win_sum, win_cnt


def focal_mean(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Clipped-window mean filter (imagefilter apply_mean_filter)."""
    s, c = focal_sum_count(arr, radius)
    return s / c


def _windows(arr: np.ndarray, radius: int, pad_val):
    """Padded sliding windows view: (h, w, k, k)."""
    k = 2 * radius + 1
    p = np.pad(arr, radius, mode="constant", constant_values=pad_val)
    return np.lib.stride_tricks.sliding_window_view(p, (k, k))


def focal_min(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Min filter / grayscale erosion (imagemorphology erode; clipped
    edges via +inf padding)."""
    hi = np.iinfo(arr.dtype).max if arr.dtype.kind in "iu" else np.inf
    return _windows(arr, radius, hi).min(axis=(2, 3))


def focal_max(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Max filter / grayscale dilation (imagemorphology dilate)."""
    lo = np.iinfo(arr.dtype).min if arr.dtype.kind in "iu" else -np.inf
    return _windows(arr, radius, lo).max(axis=(2, 3))


def focal_range(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Range filter (imagefilter apply_range_filter)."""
    return focal_max(arr, radius) - focal_min(arr, radius)


def focal_stddev_pop(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Population stddev over the clipped window (apply_stddev_filter)."""
    s, c = focal_sum_count(arr, radius)
    s2, _ = focal_sum_count(arr.astype(np.int64) ** 2, radius)
    mean = s / c
    return np.sqrt(np.maximum(s2 / c - mean * mean, 0.0))


def focal_median(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Median filter (apply_median_filter); edge windows use the clipped
    in-bounds pixels (NaN-padded)."""
    w = _windows(arr.astype(np.float64), radius, np.nan)
    k = 2 * radius + 1
    return np.nanmedian(w.reshape(arr.shape[0], arr.shape[1], k * k), axis=2)


def morph_opening(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Grayscale opening = dilate(erode) (imagemorphology opening op)."""
    return focal_max(focal_min(arr, radius), radius)


def morph_closing(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Grayscale closing = erode(dilate) (imagemorphology closing op)."""
    return focal_min(focal_max(arr, radius), radius)


def white_tophat(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """arr − opening (imagemorphology white top-hat)."""
    return arr - morph_opening(arr, radius)


def black_tophat(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """closing − arr (imagemorphology black top-hat)."""
    return morph_closing(arr, radius) - arr


def morph_gradient(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """dilate − erode (imagemorphology gradient) == focal_range."""
    return focal_range(arr, radius)


def kuwahara(arr: np.ndarray, radius: int = 2) -> np.ndarray:
    """Kuwahara edge-preserving filter (apply_kuwahara_filter): the mean
    of whichever of the four overlapping (r+1)² corner sub-windows has
    the lowest variance. Vectorized: per-quadrant mean/var come from
    shifted focal_sum_count grids; argmin selects per pixel."""
    a = arr.astype(np.float64)
    h, w = a.shape
    r = radius
    # quadrant stats via cumulative sums over (r+1)x(r+1) windows anchored
    # at each of the 4 corners around the pixel
    S = np.zeros((h + 1, w + 1))
    S[1:, 1:] = np.cumsum(np.cumsum(a, 0), 1)
    S2 = np.zeros((h + 1, w + 1))
    S2[1:, 1:] = np.cumsum(np.cumsum(a * a, 0), 1)

    def win_stats(y0, y1, x0, x1):
        """means/vars of the inclusive window [y0:y1]x[x0:x1] per pixel,
        where the bounds arrays are per-pixel and clipped."""
        y0c, y1c = np.clip(y0, 0, h), np.clip(y1 + 1, 0, h)
        x0c, x1c = np.clip(x0, 0, w), np.clip(x1 + 1, 0, w)
        yy0 = y0c[:, None]
        yy1 = y1c[:, None]
        xx0 = x0c[None, :]
        xx1 = x1c[None, :]
        n = (yy1 - yy0) * (xx1 - xx0)
        n = np.maximum(n, 1)
        sm = S[yy1, xx1] - S[yy0, xx1] - S[yy1, xx0] + S[yy0, xx0]
        s2 = S2[yy1, xx1] - S2[yy0, xx1] - S2[yy1, xx0] + S2[yy0, xx0]
        mean = sm / n
        var = s2 / n - mean * mean
        return mean, var

    ys = np.arange(h)
    xs = np.arange(w)
    quads = [
        win_stats(ys - r, ys, xs - r, xs),  # NW
        win_stats(ys - r, ys, xs, xs + r),  # NE
        win_stats(ys, ys + r, xs - r, xs),  # SW
        win_stats(ys, ys + r, xs, xs + r),  # SE
    ]
    means = np.stack([m for m, _ in quads])
    variances = np.stack([v for _, v in quads])
    pick = np.argmin(variances, axis=0)
    return np.take_along_axis(means, pick[None], axis=0)[0]


def lee_filter(arr: np.ndarray, radius: int = 1, noise_var: float | None = None) -> np.ndarray:
    """Lee adaptive speckle filter (apply_lee_filter): out = mean +
    k·(x − mean), k = var/(var + noise_var) from the local window."""
    a = arr.astype(np.float64)
    s, c = focal_sum_count(a, radius, dtype=np.float64)
    mean = s / c
    s2, _ = focal_sum_count(a * a, radius, dtype=np.float64)
    var = np.maximum(s2 / c - mean * mean, 0.0)
    nv = float(np.mean(var)) if noise_var is None else noise_var
    k = var / (var + nv + 1e-12)
    return mean + k * (a - mean)


def sobel(arr: np.ndarray):
    """Sobel gradient pair (apply_sobel_x/y_filter); zero-padded edges."""
    a = np.pad(arr.astype(np.float64), 1, mode="edge")
    gx = (
        (a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[1:-1, :-2] + a[2:, :-2])
    )
    gy = (
        (a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + 2 * a[:-2, 1:-1] + a[:-2, 2:])
    )
    return gx, gy


def slope_degrees(dem: np.ndarray, res: float = 1.0) -> np.ndarray:
    """3×3 Horn slope (python/src/elevation.cpp slope op)."""
    gx, gy = sobel(dem)
    return np.degrees(np.arctan(np.hypot(gx / (8 * res), gy / (8 * res))))
