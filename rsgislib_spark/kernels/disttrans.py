"""Distance-transform kernel — calc_dist_to_img_vals family
(imagecalc/__init__.py:136-236; tiled variant :271-458 is the
reference's own partitioned blueprint).

Chessboard (Chebyshev) distance to the nearest target pixel, EXACT via
the classic two-pass chamfer sweep. Both passes are fully vectorized:
the vertical step is a row-shift minimum; the horizontal running min
exploits d[x] ≤ d[x-1]+1 ⟺ (d[x]-x) ≤ (d[x-1]-(x-1)), so a
``np.minimum.accumulate`` over (d - x) does the in-row scan without a
per-pixel Python loop.
"""

from __future__ import annotations

import numpy as np

INF = np.int64(1 << 30)


def _row_scan(d: np.ndarray) -> np.ndarray:
    """In-place left-to-right then right-to-left running min with +1/step
    along the last axis."""
    w = d.shape[-1]
    x = np.arange(w, dtype=np.int64)
    e = np.minimum.accumulate(d - x, axis=-1) + x
    er = np.minimum.accumulate((e + x)[..., ::-1], axis=-1)[..., ::-1] - x
    return er


def chebyshev_distance_transform(targets: np.ndarray) -> np.ndarray:
    """(h, w) int64 chessboard distance to the nearest True pixel.

    Pixels in images with no targets get INF (caller decides the no-data
    rule, mirroring the reference's out_val_no_data parameter).
    """
    h, w = targets.shape
    d = np.where(targets, np.int64(0), INF)
    # forward sweep: rows top→bottom; vertical/diagonal predecessors are
    # row[y-1] shifted {-1,0,+1}, then the horizontal running min
    for y in range(h):
        if y > 0:
            up = d[y - 1]
            v = np.minimum(up, np.roll(up, 1))
            v[0] = up[0]
            v2 = np.roll(up, -1)
            v2[-1] = up[-1]
            d[y] = np.minimum(d[y], np.minimum(v, v2) + 1)
        d[y] = _row_scan(d[y][None, :])[0]
    # backward sweep: rows bottom→top
    for y in range(h - 2, -1, -1):
        dn = d[y + 1]
        v = np.minimum(dn, np.roll(dn, 1))
        v[0] = dn[0]
        v2 = np.roll(dn, -1)
        v2[-1] = dn[-1]
        d[y] = np.minimum(d[y], np.minimum(v, v2) + 1)
        d[y] = _row_scan(d[y][None, :])[0]
    return d


def buffer_mask(targets: np.ndarray, radius: int) -> np.ndarray:
    """buffer_img_pxl_vals (imagecalc/__init__.py:271-458 family): pixels
    within chessboard radius of a target."""
    return chebyshev_distance_transform(targets) <= radius
