"""Polygon clipping kernels — the geometry-OUTPUT half of the overlay
family (vectorgeoms intersection/clip_vec_lyr,
vectorgeoms/__init__.py:1137-1188, :2477-2511): produce the clipped
polygon itself, not just a predicate.

Sutherland–Hodgman clipping of a polygon ring by an axis-aligned rect
(the classic published algorithm): clip successively against the four
half-planes. Exact for convex clip regions; outputs follow the input
winding. Vectorized per half-plane over the ring's vertex array.
"""

from __future__ import annotations

import numpy as np


def _clip_halfplane(pts: np.ndarray, axis: int, bound: float, keep_leq: bool) -> np.ndarray:
    """One Sutherland–Hodgman pass: keep the side axis<=bound (or >=)."""
    if len(pts) == 0:
        return pts
    v = pts[:, axis]
    inside = v <= bound if keep_leq else v >= bound
    out = []
    n = len(pts)
    for i in range(n):
        j = (i + 1) % n
        a, b = pts[i], pts[j]
        ain, bin_ = inside[i], inside[j]
        if ain:
            out.append(a)
        if ain != bin_:
            t = (bound - a[axis]) / (b[axis] - a[axis])
            out.append(a + t * (b - a))
    return np.asarray(out, dtype=np.float64).reshape(-1, 2)


def clip_ring_to_rect(ring: np.ndarray, rect) -> np.ndarray:
    """Clip one ring (N,2) to rect (minx,miny,maxx,maxy). Returns the
    clipped ring ((M,2), possibly empty)."""
    minx, miny, maxx, maxy = rect
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    pts = _clip_halfplane(pts, 0, float(maxx), True)
    pts = _clip_halfplane(pts, 0, float(minx), False)
    pts = _clip_halfplane(pts, 1, float(maxy), True)
    pts = _clip_halfplane(pts, 1, float(miny), False)
    return pts


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive for CCW)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def clip_polygon_to_rect(rings, rect):
    """Clip a polygon (shell + holes) to a rect; returns (rings, area)
    with area = |shell| − Σ|holes| of the clipped parts."""
    out_rings = []
    area = 0.0
    for i, ring in enumerate(rings):
        c = clip_ring_to_rect(ring, rect)
        if len(c) >= 3:
            a = abs(ring_area(c))
            out_rings.append(c)
            area += a if i == 0 else -a
    return out_rings, area
