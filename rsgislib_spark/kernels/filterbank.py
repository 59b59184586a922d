"""Leung-Malik texture filter bank — reference `leung_malik_filter_bank`
(python/src/imagefilter.cpp; rsgislib applies the LM bank per band for
texture features). Standard published construction (Leung & Malik 2001):

 - 36 first/second Gaussian-derivative filters (bar + edge) at 6
   orientations × 3 scales (elongation 3:1),
 - 8 Laplacian-of-Gaussian filters,
 - 4 Gaussian filters,

48 filters total, each L1-normalized and zero-meaned (except the
Gaussians). Application is direct convolution via a sliding-window
einsum — fine for the 49×49 default support on tile-sized rasters; at
scale each tile-with-halo convolves independently inside mapInPandas
(same skeleton as operators/focal).
"""

from __future__ import annotations

import numpy as np

SUP = 49  # default support (Leung-Malik standard)


def _gauss1d(sigma: float, mean: float, x: np.ndarray, order: int) -> np.ndarray:
    x = x - mean
    v = sigma * sigma
    g = np.exp(-(x * x) / (2 * v)) / np.sqrt(2 * np.pi * v)
    if order == 1:
        g = -g * (x / v)
    elif order == 2:
        g = g * ((x * x - v) / (v * v))
    return g


def _oriented_filter(scale: float, phasex: int, phasey: int, angle: float, sup: int) -> np.ndarray:
    hs = (sup - 1) // 2
    gx, gy = np.meshgrid(np.arange(-hs, hs + 1), np.arange(-hs, hs + 1))
    pts = np.vstack([gx.ravel(), gy.ravel()])
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]]) @ pts
    f = _gauss1d(3 * scale, 0, rot[0], phasex) * _gauss1d(scale, 0, rot[1], phasey)
    f = f.reshape(sup, sup)
    f -= f.mean()
    a = np.abs(f).sum()
    return f / a if a > 0 else f


def _log2d(sigma: float, sup: int) -> np.ndarray:
    hs = (sup - 1) // 2
    gx, gy = np.meshgrid(np.arange(-hs, hs + 1), np.arange(-hs, hs + 1))
    r2 = gx * gx + gy * gy
    v = sigma * sigma
    g = np.exp(-r2 / (2 * v)) / (2 * np.pi * v)
    f = g * (r2 - 2 * v) / (v * v)
    f -= f.mean()
    return f / np.abs(f).sum()


def _gauss2d(sigma: float, sup: int) -> np.ndarray:
    hs = (sup - 1) // 2
    gx, gy = np.meshgrid(np.arange(-hs, hs + 1), np.arange(-hs, hs + 1))
    v = sigma * sigma
    g = np.exp(-(gx * gx + gy * gy) / (2 * v)) / (2 * np.pi * v)
    return g / g.sum()


def lm_filter_bank(sup: int = SUP) -> np.ndarray:
    """(48, sup, sup) LM-small bank: scales √2, 2, 2√2 for the oriented
    filters; LoG at σ and 3σ for σ ∈ {√2, 2, 2√2, 4}; Gaussians at the
    four basic scales."""
    scales = [np.sqrt(2.0), 2.0, 2.0 * np.sqrt(2.0)]
    n_orient = 6
    filters = []
    for phase in (1, 2):  # edge (1st deriv), bar (2nd deriv)
        for sc in scales:
            for o in range(n_orient):
                angle = np.pi * o / n_orient
                filters.append(_oriented_filter(sc, 0, phase, angle, sup))
    basic = [np.sqrt(2.0), 2.0, 2.0 * np.sqrt(2.0), 4.0]
    for s in basic:
        filters.append(_log2d(s, sup))
    for s in basic:
        filters.append(_log2d(3.0 * s, sup))
    for s in basic:
        filters.append(_gauss2d(s, sup))
    return np.stack(filters)


def apply_bank(img: np.ndarray, bank: np.ndarray) -> np.ndarray:
    """(n_filters, h', w') valid-mode responses via sliding-window einsum
    (no scipy dependency); h' = h − sup + 1."""
    sup = bank.shape[-1]
    win = np.lib.stride_tricks.sliding_window_view(img.astype(np.float64), (sup, sup))
    return np.einsum("hwij,fij->fhw", win, bank)


def texture_features(img: np.ndarray, bank: np.ndarray) -> np.ndarray:
    """Mean absolute response per filter — the per-tile texture vector."""
    return np.abs(apply_bank(img, bank)).mean(axis=(1, 2))
