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


def _acc_dtype(arr: np.ndarray, requested=np.int64):
    """Accumulator dtype: honour an integer request only for integer
    rasters — accumulating a float raster in int64 silently truncates."""
    if arr.dtype.kind == "f" and np.dtype(requested).kind in "iu":
        return np.float64
    return requested


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
    s = _integral(arr, _acc_dtype(arr, dtype))
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
    s2, _ = focal_sum_count(arr.astype(_acc_dtype(arr)) ** 2, radius)
    mean = s / c
    return np.sqrt(np.maximum(s2 / c - mean * mean, 0.0))


def focal_median(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Median filter (apply_median_filter); edge windows use the clipped
    in-bounds pixels (NaN-padded)."""
    w = _windows(arr.astype(np.float64), radius, np.nan)
    k = 2 * radius + 1
    return np.nanmedian(w.reshape(arr.shape[0], arr.shape[1], k * k), axis=2)


def focal_total(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Total (window-sum) filter (apply_total_filter; RSGISTotalFilter,
    src/filtering/RSGISStatsFilters.cpp:466-487); clipped in-bounds
    window like the rest of the family."""
    s, _ = focal_sum_count(arr, radius)
    return s


def focal_coeff_of_var(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Coefficient of variation = stddev_pop / mean over the window
    (apply_coeff_of_var_filter; RSGISCoeffOfVarFilter,
    RSGISStatsFilters.cpp:295-330)."""
    s, c = focal_sum_count(arr, radius)
    # int64 squares for integer rasters (exact); float64 squares for float
    # rasters — casting a float raster to int64 would silently truncate
    # fractional values and return a wrong CoV.
    s2, _ = focal_sum_count(arr.astype(_acc_dtype(arr)) ** 2, radius)
    mean = s / c
    return np.sqrt(np.maximum(s2 / c - mean * mean, 0.0)) / mean


def focal_total_diff(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Sum of (neighbour − centre) over the window excluding the centre
    (apply_total_diff_filter; RSGISTotalDiffFilter,
    RSGISStatsFilters.cpp:782-810). The centre term contributes zero, so
    this is ``window_sum − count·centre`` — integral-image exact."""
    s, c = focal_sum_count(arr, radius)
    return s - c * arr.astype(_acc_dtype(arr))


def focal_mean_diff(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """total_diff / (count − 1) (apply_mean_diff_filter;
    RSGISMeanDiffFilter, RSGISStatsFilters.cpp:673-705 — the reference
    divides by the neighbour count excluding the centre)."""
    s, c = focal_sum_count(arr, radius)
    return (s - c * arr.astype(_acc_dtype(arr))) / (c - 1)


def focal_total_diff_abs(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """Sum of |neighbour − centre| over the window
    (apply_total_diff_abs_filter; RSGISTotalDiffAbsFilter,
    RSGISStatsFilters.cpp:833-861). No integral-image shortcut for the
    absolute value — NaN-padded sliding windows; integer-valued exact on
    integer rasters."""
    w = _windows(arr.astype(np.float64), radius, np.nan)
    d = np.abs(w - arr.astype(np.float64)[:, :, None, None])
    return np.nansum(d, axis=(2, 3))


def focal_mean_diff_abs(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """total_diff_abs / (count − 1) (apply_mean_diff_abs_filter;
    RSGISMeanDiffAbsFilter, RSGISStatsFilters.cpp:729-760)."""
    _, c = focal_sum_count(arr, radius)
    return focal_total_diff_abs(arr, radius) / (c - 1)


def focal_mode(arr: np.ndarray, radius: int = 1, vmax: int = 4095) -> np.ndarray:
    """Window mode for small non-negative integer rasters, SMALLEST
    value on ties (apply_mode_filter; RSGISModeFilter,
    RSGISStatsFilters.cpp:125-151). Documented deviation: the
    reference's SortedGenericList::getMostCommonValue compares element
    POINTERS, not values (SortedGenericList.cpp:327), so its run-length
    scan never sees a run longer than 1 and the returned "mode" is
    indeterminate; this engine implements the textbook semantics the
    API documents. Vectorized: one scatter-add per window offset into a
    per-pixel value-count cube, argmax picks the first (= smallest)
    maximal value."""
    if arr.dtype.kind not in "iu":
        raise ValueError("focal_mode needs an integer raster")
    top = int(arr.max()) if arr.size else 0
    if top > vmax:
        raise ValueError(f"focal_mode value range {top} exceeds vmax={vmax}")
    h, w = arr.shape
    counts = np.zeros((h, w, top + 1), np.int16)
    iy, ix = np.mgrid[0:h, 0:w]
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            ys0, ys1 = max(0, -dy), min(h, h - dy)
            xs0, xs1 = max(0, -dx), min(w, w - dx)
            sub = arr[ys0 + dy : ys1 + dy, xs0 + dx : xs1 + dx]
            counts[
                iy[ys0:ys1, xs0:xs1], ix[ys0:ys1, xs0:xs1], sub
            ] += 1
    return counts.argmax(axis=2).astype(np.int64)


def _norm_var_sar(m1: np.ndarray, m2: np.ndarray, arr: np.ndarray, radius: int):
    """Shared finalizer for the SAR texture (normalised-variance) family
    (RSGISSARTextureFilters.cpp): window sums of two moment arrays over
    VALID (nonzero, finite) pixels; output (E[m2]/E[m1]² − 1), zero
    where the centre pixel is invalid or fewer than 4 valid values."""
    valid = (arr != 0) & np.isfinite(arr)
    s1, _ = focal_sum_count(np.where(valid, m1, 0.0), radius, dtype=np.float64)
    s2, _ = focal_sum_count(np.where(valid, m2, 0.0), radius, dtype=np.float64)
    n, _ = focal_sum_count(valid.astype(np.int64), radius)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s1 / n
        out = (s2 / n) / (mean * mean) - 1.0
    return np.where(valid & (n > 3), out, 0.0)


def focal_norm_var_power(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """SAR normalised variance of power (apply_norm_var_power_filter;
    RSGISNormVarPowerFilter, RSGISSARTextureFilters.cpp:52-68):
    E[v²]/E[v]² − 1 over valid window values."""
    a = arr.astype(np.float64)
    return _norm_var_sar(a, a * a, a, radius)


def focal_norm_var_amplitude(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """SAR normalised variance treating input as power, moments of the
    amplitude √v (apply_norm_var_amplitude_filter;
    RSGISNormVarAmplitudeFilter, RSGISSARTextureFilters.cpp:71-87):
    E[v]/E[√v]² − 1."""
    a = arr.astype(np.float64)
    with np.errstate(invalid="ignore"):
        amp = np.sqrt(np.where(a > 0, a, 0.0))
    return _norm_var_sar(amp, a, a, radius)


def focal_norm_var_ln_power(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """SAR normalised variance of log-power
    (apply_norm_var_ln_power_filter; RSGISNormVarLnPowerFilter,
    RSGISSARTextureFilters.cpp:90-106): E[ln²v]/E[ln v]² − 1."""
    a = arr.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ln = np.where(a > 0, np.log(np.where(a > 0, a, 1.0)), 0.0)
    return _norm_var_sar(ln, ln * ln, a, radius)


def focal_texture_var(arr: np.ndarray, radius: int = 1) -> np.ndarray:
    """SAR texture variance (apply_texture_var_filter; RSGISTextureVar,
    RSGISSARTextureFilters.cpp:128-146): ((σ/μ)² − 1/n)/(1 + 1/n) over
    valid (nonzero, finite) window values, zero where the centre is
    invalid or n ≤ 3. Documented deviation: the reference computes
    ``1/numVal`` in UNSIGNED INTEGER arithmetic, which is 0 for every
    window, silently reducing its output to plain CV²; this engine
    implements the estimator the formula documents (float 1/n)."""
    valid = (arr != 0) & np.isfinite(arr)
    a = np.where(valid, arr.astype(np.float64), 0.0)
    s1, _ = focal_sum_count(a, radius, dtype=np.float64)
    s2, _ = focal_sum_count(a * a, radius, dtype=np.float64)
    n, _ = focal_sum_count(valid.astype(np.int64), radius)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s1 / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        cv2 = var / (mean * mean)
        out = (cv2 - 1.0 / n) / (1.0 + 1.0 / n)
    return np.where(valid & (n > 3), out, 0.0)


def circular_se(size: int) -> np.ndarray:
    """Circular binary structuring element (create_circular_op;
    RSGISMatrices::makeCircularBinaryMatrix, RSGISMatrices.cpp:1109):
    cell (dx,dy) included iff dx²+dy² ≤ (r+0.25)², r=(size−1)/2. Size
    must be odd."""
    if size % 2 == 0:
        raise ValueError("structuring element size must be odd")
    r = (size - 1) // 2
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    return (dx * dx + dy * dy) <= (r + 0.25) ** 2


def _se_reduce(arr: np.ndarray, se: np.ndarray, op: str) -> np.ndarray:
    """Min/max over the SE-masked clipped window of every pixel."""
    k = se.shape[0]
    radius = (k - 1) // 2
    pad = (
        (np.iinfo(arr.dtype).max if arr.dtype.kind in "iu" else np.inf)
        if op == "min"
        else (np.iinfo(arr.dtype).min if arr.dtype.kind in "iu" else -np.inf)
    )
    w = _windows(arr, radius, pad)
    flat = w.reshape(arr.shape[0], arr.shape[1], k * k)[:, :, se.ravel()]
    return flat.min(axis=2) if op == "min" else flat.max(axis=2)


def morph_erode_se(arr: np.ndarray, se: np.ndarray) -> np.ndarray:
    """Erosion under an arbitrary binary structuring element
    (image_erode with an operator file; RSGISMorphologyErode.cpp)."""
    return _se_reduce(arr, se, "min")


def morph_dilate_se(arr: np.ndarray, se: np.ndarray) -> np.ndarray:
    """Dilation under an arbitrary binary structuring element
    (image_dilate with an operator file; RSGISMorphologyDilate.cpp)."""
    return _se_reduce(arr, se, "max")


def local_minima(
    arr: np.ndarray,
    radius: int = 1,
    allow_equals: bool = True,
    se: np.ndarray | None = None,
) -> np.ndarray:
    """Local-minima detection (local_pixel_minima;
    RSGISMorphologyFindLocalMinima, RSGISMorphologyFindExtrema.cpp):
    1 where the centre is below (or, with ``allow_equals``, not above)
    every SE neighbour, clipped at image edges. Documented deviation:
    the reference's neighbour filter is ``(i != c) & (j != c)`` —
    bitwise AND — which skips the entire centre ROW and COLUMN, so it
    only ever compares the diagonal quadrants; this engine excludes
    just the centre pixel, the semantics the API documents."""
    k = 2 * radius + 1
    if se is None:
        se = np.ones((k, k), bool)
    se = se.copy()
    se[radius, radius] = False  # centre never compares against itself
    hi = np.iinfo(arr.dtype).max if arr.dtype.kind in "iu" else np.inf
    w = _windows(arr, radius, hi)
    nbr_min = w.reshape(arr.shape[0], arr.shape[1], k * k)[:, :, se.ravel()].min(axis=2)
    if allow_equals:
        return (arr <= nbr_min).astype(np.int64)
    return (arr < nbr_min).astype(np.int64)


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


def kuwahara_pick_int(arr: np.ndarray, radius: int = 1):
    """Integer-exact Kuwahara quadrant selection over INTERIOR pixels
    (all four (r+1)² windows fully inside): per pixel, the sum of the
    minimum-variance quadrant, comparing the scale-free integer metric
    n·Σx² − (Σx)² (ties → NW, NE, SW, SE — the same first-wins order the
    float kernel's argmin uses). Returns (win_sum, n_win) int64 arrays
    of shape (h−2r, w−2r) — the cross-engine-exact core of `kuwahara`.
    """
    a = arr.astype(np.int64)
    h, w = a.shape
    r = radius
    S = np.zeros((h + 1, w + 1), dtype=np.int64)
    S[1:, 1:] = np.cumsum(np.cumsum(a, 0), 1)
    S2 = np.zeros((h + 1, w + 1), dtype=np.int64)
    S2[1:, 1:] = np.cumsum(np.cumsum(a * a, 0), 1)

    def win(y0, x0):
        """(sum, sumsq) of the (r+1)² window with top-left (y0, x0),
        vectorized over the interior anchor grid."""
        ys = np.arange(r, h - r) + y0
        xs = np.arange(r, w - r) + x0
        yy0, yy1 = ys[:, None], (ys + r + 1)[:, None]
        xx0, xx1 = xs[None, :], (xs + r + 1)[None, :]
        sm = S[yy1, xx1] - S[yy0, xx1] - S[yy1, xx0] + S[yy0, xx0]
        s2 = S2[yy1, xx1] - S2[yy0, xx1] - S2[yy1, xx0] + S2[yy0, xx0]
        return sm, s2

    n = (r + 1) ** 2
    quads = [win(-r, -r), win(-r, 0), win(0, -r), win(0, 0)]  # NW NE SW SE
    metrics = np.stack([n * s2 - sm * sm for sm, s2 in quads])
    sums = np.stack([sm for sm, _ in quads])
    pick = np.argmin(metrics, axis=0)  # first-wins on ties
    win_sum = np.take_along_axis(sums, pick[None], axis=0)[0]
    return win_sum, n


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


def prewitt(arr: np.ndarray):
    """Prewitt gradient pair (apply_prewitt_filter,
    imagefilter/__init__.py:601-700); edge-padded like sobel."""
    a = np.pad(arr.astype(np.float64), 1, mode="edge")
    gx = (
        (a[:-2, 2:] + a[1:-1, 2:] + a[2:, 2:])
        - (a[:-2, :-2] + a[1:-1, :-2] + a[2:, :-2])
    )
    gy = (
        (a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:])
        - (a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:])
    )
    return gx, gy


def laplacian(arr: np.ndarray) -> np.ndarray:
    """4-neighbour Laplacian (∇² kernel [[0,1,0],[1,-4,1],[0,1,0]];
    imagefilter gaussian-2nd-deriv family's discrete base)."""
    a = np.pad(arr.astype(np.float64), 1, mode="edge")
    return a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:] - 4.0 * a[1:-1, 1:-1]


def gaussian_kernel_1d(sigma: float, radius: int | None = None) -> np.ndarray:
    """Normalised 1-D Gaussian taps (radius defaults to ceil(3σ))."""
    r = int(np.ceil(3.0 * sigma)) if radius is None else int(radius)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _sep_convolve(arr: np.ndarray, kx: np.ndarray, ky: np.ndarray) -> np.ndarray:
    """Separable 2-D convolution with edge padding (tap loop, not pixel
    loop — vectorized over the array per tap)."""
    ry, rx = len(ky) // 2, len(kx) // 2
    a = np.pad(arr.astype(np.float64), ((ry, ry), (0, 0)), mode="edge")
    tmp = np.zeros_like(arr, dtype=np.float64)
    for i, w in enumerate(ky):
        tmp += w * a[i : i + arr.shape[0], :]
    b = np.pad(tmp, ((0, 0), (rx, rx)), mode="edge")
    out = np.zeros_like(tmp)
    for j, w in enumerate(kx):
        out += w * b[:, j : j + arr.shape[1]]
    return out


def gaussian_smooth(arr: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Gaussian smoothing (apply_gaussian_smooth_filter,
    imagefilter/__init__.py:701-780)."""
    k = gaussian_kernel_1d(sigma)
    return _sep_convolve(arr, k, k)


def gaussian_deriv1(arr: np.ndarray, sigma: float = 1.0):
    """Gaussian 1st-derivative pair (apply_gaussian_1st_deriv_filter):
    derivative-of-Gaussian along one axis × Gaussian along the other."""
    r = int(np.ceil(3.0 * sigma))
    x = np.arange(-r, r + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    # derivative taps normalised so correlation with a unit ramp returns
    # exactly 1 (Σ x·dg = 1) — the discrete-σ variance correction
    dg = x * g
    dg /= (x * dg).sum()
    gx = _sep_convolve(arr, dg, g)
    gy = _sep_convolve(arr, g, dg)
    return gx, gy


def gaussian_deriv2(arr: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Laplacian-of-Gaussian (apply_gaussian_2nd_deriv_filter): smooth
    then the discrete ∇²."""
    return laplacian(gaussian_smooth(arr, sigma))
