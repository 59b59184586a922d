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
