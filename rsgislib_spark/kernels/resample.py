"""Raster resampling kernels — vectorized numpy, no scipy/cv2.

The engine-side counterpart of the reference's GDAL-warp interp methods
(``resample_img_to_match`` with 7 methods, enum
python/rsgislib/__init__.py:214-220; imageutils/__init__.py:2104-2209).
Implemented — all 7 reference methods: nearest, bilinear, cubic (Keys
a=-0.5), cubicspline (cubic B-spline kernel, GDAL's smoothing variant —
no IIR prefilter), lanczos (windowed sinc, a=3), average (block),
mode (block).

Convention: HALF-PIXEL centres (GDAL's): source coordinate of output
pixel d along an axis is ``(d + 0.5) * scale - 0.5`` with
``scale = src_size / out_size``. Edges clamp.
"""

from __future__ import annotations

import numpy as np


def _src_coords(out_size: int, src_size: int) -> np.ndarray:
    scale = src_size / float(out_size)
    return (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5


def resample_nearest(src: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    sy = np.clip(np.floor(_src_coords(out_h, src.shape[0]) + 0.5), 0, src.shape[0] - 1).astype(np.int64)
    sx = np.clip(np.floor(_src_coords(out_w, src.shape[1]) + 0.5), 0, src.shape[1] - 1).astype(np.int64)
    return src[np.ix_(sy, sx)]


def bilinear_sample(src: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Bilinear sample at arbitrary fractional (x, y) points; edge clamp.
    Vectorized over flat point arrays."""
    h, w = src.shape
    xs = np.clip(np.asarray(xs, np.float64), 0.0, w - 1.0)
    ys = np.clip(np.asarray(ys, np.float64), 0.0, h - 1.0)
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = xs - x0
    fy = ys - y0
    s = src.astype(np.float64)
    return (
        s[y0, x0] * (1 - fx) * (1 - fy)
        + s[y0, x1] * fx * (1 - fy)
        + s[y1, x0] * (1 - fx) * fy
        + s[y1, x1] * fx * fy
    )


def resample_bilinear(src: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    sx = _src_coords(out_w, src.shape[1])
    sy = _src_coords(out_h, src.shape[0])
    gx, gy = np.meshgrid(sx, sy)
    return bilinear_sample(src, gx.ravel(), gy.ravel()).reshape(out_h, out_w)


def _cubic_weights(f: np.ndarray) -> np.ndarray:
    """Keys cubic (a = -0.5) weights for offsets (-1, 0, 1, 2)."""
    a = -0.5
    w = np.empty((4,) + f.shape, dtype=np.float64)
    d = 1.0 + f  # offset -1
    w[0] = a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a
    d = f  # offset 0
    w[1] = (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1
    d = 1.0 - f  # offset 1
    w[2] = (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1
    d = 2.0 - f  # offset 2
    w[3] = a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a
    return w


def resample_cubic(src: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = src.shape
    sx = np.clip(_src_coords(out_w, w), 0.0, w - 1.0)
    sy = np.clip(_src_coords(out_h, h), 0.0, h - 1.0)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    wx = _cubic_weights(sx - x0)  # (4, out_w)
    wy = _cubic_weights(sy - y0)  # (4, out_h)
    s = src.astype(np.float64)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for j in range(4):  # 16 fixed taps — loop over taps, not pixels
        yy = np.clip(y0 + j - 1, 0, h - 1)
        row_acc = np.zeros((out_h, out_w), dtype=np.float64)
        for i in range(4):
            xx = np.clip(x0 + i - 1, 0, w - 1)
            row_acc += s[np.ix_(yy, xx)] * wx[i][None, :]
        out += row_acc * wy[j][:, None]
    return out


def _tap_resample(src: np.ndarray, out_w: int, out_h: int, taps: int,
                  weight_fn) -> np.ndarray:
    """Generic separable tap-loop resampler: ``taps`` support points per
    axis centred at floor(coord) − taps/2 + 1, weights from
    ``weight_fn(offset_array)``; weights renormalised per position (the
    GDAL convention for windowed kernels at edges)."""
    h, w = src.shape
    half = taps // 2
    sx = np.clip(_src_coords(out_w, w), 0.0, w - 1.0)
    sy = np.clip(_src_coords(out_h, h), 0.0, h - 1.0)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    wx = np.stack([weight_fn(fx - (j - half + 1)) for j in range(taps)])  # (taps, out_w)
    wy = np.stack([weight_fn(fy - (j - half + 1)) for j in range(taps)])
    wx /= wx.sum(axis=0, keepdims=True)
    wy /= wy.sum(axis=0, keepdims=True)
    s = src.astype(np.float64)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for j in range(taps):
        yy = np.clip(y0 + j - half + 1, 0, h - 1)
        row = np.zeros((out_h, out_w), dtype=np.float64)
        for i in range(taps):
            xx = np.clip(x0 + i - half + 1, 0, w - 1)
            row += s[np.ix_(yy, xx)] * wx[i][None, :]
        out += row * wy[j][:, None]
    return out


def _lanczos_weight(x: np.ndarray, a: int = 3) -> np.ndarray:
    x = np.asarray(x, np.float64)
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(np.abs(x) < a, out, 0.0)


def resample_lanczos(src: np.ndarray, out_w: int, out_h: int, a: int = 3) -> np.ndarray:
    """Lanczos windowed-sinc (GDAL 'lanczos', a=3 → 6 taps/axis)."""
    return _tap_resample(src, out_w, out_h, 2 * a, lambda x: _lanczos_weight(x, a))


def _bspline3_weight(x: np.ndarray) -> np.ndarray:
    ax = np.abs(np.asarray(x, np.float64))
    out = np.zeros_like(ax)
    m1 = ax < 1.0
    out[m1] = (4.0 - 6.0 * ax[m1] ** 2 + 3.0 * ax[m1] ** 3) / 6.0
    m2 = (ax >= 1.0) & (ax < 2.0)
    out[m2] = (2.0 - ax[m2]) ** 3 / 6.0
    return out


def resample_cubicspline(src: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Cubic B-spline kernel (GDAL 'cubicspline'): smoothing — applies
    the B3 kernel directly, no interpolation prefilter, so node values
    are smoothed rather than preserved."""
    return _tap_resample(src, out_w, out_h, 4, _bspline3_weight)


def resample_average(src: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor block mean (GDAL 'average' on exact factors)."""
    h, w = src.shape
    th, tw = h // factor, w // factor
    v = src[: th * factor, : tw * factor].astype(np.float64)
    return v.reshape(th, factor, tw, factor).mean(axis=(1, 3))


def resample_mode(src: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor block mode over small-int rasters (ties → smallest
    value, matching the RAT mode convention)."""
    h, w = src.shape
    th, tw = h // factor, w // factor
    v = src[: th * factor, : tw * factor].astype(np.int64)
    blocks = v.reshape(th, factor, tw, factor).transpose(0, 2, 1, 3).reshape(th, tw, -1)
    vmax = int(blocks.max()) + 1 if blocks.size else 1
    # bincount per block over the value range (small-int rasters)
    idx = blocks + (np.arange(th * tw).reshape(th, tw, 1) * vmax)
    counts = np.bincount(idx.ravel(), minlength=th * tw * vmax).reshape(th, tw, vmax)
    return counts.argmax(axis=2)


METHODS = {
    "nearest": resample_nearest,
    "bilinear": resample_bilinear,
    "cubic": resample_cubic,
    "cubicspline": resample_cubicspline,
    "lanczos": resample_lanczos,
}


def resample(src: np.ndarray, out_w: int, out_h: int, method: str = "nearest") -> np.ndarray:
    if method not in METHODS:
        raise ValueError(f"method must be one of {sorted(METHODS)} (or use "
                         "resample_average/resample_mode for block methods)")
    return METHODS[method](src, out_w, out_h)
