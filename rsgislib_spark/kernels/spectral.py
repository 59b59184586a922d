"""Spectral-axis kernels — Savitzky–Golay smoothing across bands.

Reference: imageutils.spectral_smoothing (python/rsgislib/imageutils/
__init__.py:4088-4180) — per-pixel scipy.signal.savgol_filter along the
band axis (hyperspectral denoising), window 5 / polyorder 3 default.

The central SG coefficients are exact rationals; for the shipped
(window, polyorder) pairs they are integer vectors over a common
divisor, so the smoothed value is (integer dot)/divisor — which keeps
the DuckDB oracle a closed-form integer expression (q106). Edge bands
use the reference's 'interp' behaviour: a least-squares polynomial of
``polyorder`` is fitted to the first/last window and evaluated at the
edge positions (deterministic closed form via the Vandermonde
pseudo-inverse).
"""

from __future__ import annotations

import numpy as np

# central-point SG coefficients as (integer taps, divisor); polyorder 3
# shares the order-2 smoothing taps (odd orders add nothing at the
# central point of a symmetric window)
_INT_COEFFS: dict[tuple[int, int], tuple[tuple[int, ...], int]] = {
    (5, 2): ((-3, 12, 17, 12, -3), 35),
    (5, 3): ((-3, 12, 17, 12, -3), 35),
    (7, 2): ((-2, 3, 6, 7, 6, 3, -2), 21),
    (7, 3): ((-2, 3, 6, 7, 6, 3, -2), 21),
    (9, 2): ((-21, 14, 39, 54, 59, 54, 39, 14, -21), 231),
    (9, 3): ((-21, 14, 39, 54, 59, 54, 39, 14, -21), 231),
}


def savgol_coeffs_int(win_len: int, polyorder: int) -> tuple[np.ndarray, int]:
    """Integer central taps + divisor for the supported (win, poly)."""
    key = (int(win_len), int(polyorder))
    if key not in _INT_COEFFS:
        raise ValueError(f"no integer SG taps for window={win_len}, poly={polyorder}")
    taps, div = _INT_COEFFS[key]
    return np.asarray(taps, np.int64), div


def savgol_numerator(cube: np.ndarray, win_len: int = 5, polyorder: int = 3) -> np.ndarray:
    """Exact integer SG numerator for the INTERIOR band range.

    cube: (bands, h, w) integer array. Returns (bands - win + 1, h, w)
    int64 = sum_t taps[t] * cube[b + t]; smoothed = numerator / divisor.
    """
    taps, _ = savgol_coeffs_int(win_len, polyorder)
    c = cube.astype(np.int64, copy=False)
    out = np.zeros((c.shape[0] - win_len + 1,) + c.shape[1:], np.int64)
    for t, w in enumerate(taps):
        out += w * c[t : t + out.shape[0]]
    return out


def _edge_fit(window: np.ndarray, polyorder: int) -> np.ndarray:
    """Evaluate the least-squares poly fit of a leading/trailing window
    at every window position: returns (win, win) projection P with
    fitted = P @ window (scipy savgol mode='interp' edge semantics)."""
    n = window.shape[0] if window.ndim else window
    x = np.arange(n, dtype=np.float64)
    V = np.vander(x, polyorder + 1, increasing=True)
    return V @ np.linalg.pinv(V)


def savgol_spectral(
    cube: np.ndarray, win_len: int = 5, polyorder: int = 3
) -> np.ndarray:
    """Savitzky–Golay smoothing along axis 0 of (bands, h, w), float64
    output; interior = integer taps / divisor, edges = polynomial fit
    over the first/last window ('interp')."""
    taps, div = savgol_coeffs_int(win_len, polyorder)
    c = cube.astype(np.float64, copy=False)
    nb = c.shape[0]
    if nb < win_len:
        raise ValueError("need at least win_len bands")
    half = win_len // 2
    out = np.empty_like(c)
    interior = savgol_numerator(cube, win_len, polyorder).astype(np.float64) / div
    out[half : nb - half] = interior
    P = _edge_fit(np.arange(win_len), polyorder)
    flat = c.reshape(nb, -1)
    head = P @ flat[:win_len]
    tail = P @ flat[nb - win_len :]
    out.reshape(nb, -1)[:half] = head[:half]
    out.reshape(nb, -1)[nb - half :] = tail[win_len - half :]
    return out
