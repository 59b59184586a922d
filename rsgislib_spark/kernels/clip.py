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


def rect_difference_parts(rect, covers):
    """Exact rectilinear difference rect − ∪covers (the geometry-output
    'difference' overlay for axis-aligned inputs — the fixture family;
    ref vectorgeoms/__init__.py:1189-1240 delegates the general case to
    geopandas, which this engine scopes to rectilinear zones).

    ``rect`` = (x0, y0, x1, y1); ``covers`` = (m, 4) array of rects
    (same layout). Coordinates should be INTEGERS (callers scale a
    lattice by its denominator first) so the sweep and areas are exact.

    Coordinate-compression sweep: x-breakpoints from cover edges split
    the rect into vertical strips; per strip, the union of active cover
    y-intervals (sorted running-max merge) leaves uncovered y-segments,
    each emitted as one part rect.

    Returns (parts, covered_area): parts is a list of (x0, y0, x1, y1)
    int tuples whose disjoint union IS rect − ∪covers; covered_area is
    the exact area of rect ∩ ∪covers.
    """
    x0, y0, x1, y1 = (int(v) for v in rect)
    c = np.asarray(covers, dtype=np.int64).reshape(-1, 4)
    # clip covers to the rect; drop empties
    if len(c):
        cx0 = np.maximum(c[:, 0], x0)
        cy0 = np.maximum(c[:, 1], y0)
        cx1 = np.minimum(c[:, 2], x1)
        cy1 = np.minimum(c[:, 3], y1)
        keep = (cx0 < cx1) & (cy0 < cy1)
        cx0, cy0, cx1, cy1 = cx0[keep], cy0[keep], cx1[keep], cy1[keep]
    else:
        cx0 = cy0 = cx1 = cy1 = np.empty(0, dtype=np.int64)
    if not len(cx0):
        return ([(x0, y0, x1, y1)] if x0 < x1 and y0 < y1 else []), 0
    xs = np.unique(np.concatenate(([x0, x1], cx0, cx1)))
    parts = []
    covered = 0
    for xa, xb in zip(xs[:-1], xs[1:]):
        active = (cx0 <= xa) & (cx1 >= xb)
        if not active.any():
            parts.append((int(xa), y0, int(xb), y1))
            continue
        ys0 = cy0[active]
        ys1 = cy1[active]
        order = np.argsort(ys0, kind="stable")
        ys0, ys1 = ys0[order], ys1[order]
        cur = y0
        for s, e in zip(ys0, ys1):
            if s > cur:
                parts.append((int(xa), int(cur), int(xb), int(s)))
            if e > cur:
                covered += int(xb - xa) * int(min(e, y1) - max(s, cur))
                cur = max(cur, e)
        if cur < y1:
            parts.append((int(xa), int(cur), int(xb), int(y1)))
    return parts, covered
