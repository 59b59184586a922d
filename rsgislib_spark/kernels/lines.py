"""Line/polyline geometry kernels.

Reference: vectorgeoms/__init__.py — get_pt_on_line (:154),
find_pt_to_side (:206), create_orthg_lines (:300+),
closest_line_intersection / line_intersection_range (:400+),
simplify_geometries (geopandas .simplify → Douglas–Peucker).

Formulation deviation (documented): the reference computes points with
atan/sin/cos plus four quadrant cases; these kernels use the equivalent
vector algebra (unit direction d/|d| and right-hand normal
(dy, −dx)/|d|) — same geometry, sqrt-only arithmetic, which keeps the
SQL oracle bit-exact (sqrt is correctly rounded; libm trig is not
guaranteed identical across engines). tests/test_lines.py checks the
vector forms against a faithful port of the reference's trig math.

All kernels are batch-vectorized over numpy arrays of line/point
coordinates (no per-row Python in Spark hot paths).
"""

from __future__ import annotations

import numpy as np


def pt_on_line(x1, y1, x2, y2, dist):
    """Point at ``dist`` from (x1,y1) along the line to (x2,y2)
    (get_pt_on_line:154). Vectorized over arrays."""
    dx, dy = np.asarray(x2) - x1, np.asarray(y2) - y1
    ln = np.sqrt(dx * dx + dy * dy)
    with np.errstate(invalid="ignore", divide="ignore"):
        ux, uy = dx / ln, dy / ln
    ux = np.where(ln > 0, ux, 0.0)
    uy = np.where(ln > 0, uy, 0.0)
    return x1 + np.asarray(dist) * ux, y1 + np.asarray(dist) * uy


def pt_to_side(x1, y1, px, py, x2, y2, line_len, left_hand=False):
    """Point at right angles to the (x1,y1)→(x2,y2) vector at location
    (px,py), ``line_len`` away (find_pt_to_side:206). right-hand side by
    default; ``left_hand`` mirrors (the reference swaps the line ends)."""
    if left_hand:
        x1, y1, x2, y2 = x2, y2, x1, y1
    dx, dy = np.asarray(x2) - x1, np.asarray(y2) - y1
    ln = np.sqrt(dx * dx + dy * dy)
    with np.errstate(invalid="ignore", divide="ignore"):
        nx, ny = dy / ln, -dx / ln
    nx = np.where(ln > 0, nx, 0.0)
    ny = np.where(ln > 0, ny, 0.0)
    return np.asarray(px) + np.asarray(line_len) * nx, np.asarray(py) + np.asarray(line_len) * ny


def orthogonal_segments(x1, y1, x2, y2, step: float, line_len: float):
    """Orthogonal lines at ``step`` intervals along each input line
    (create_orthg_lines): returns (k, sx, sy, ex, ey) arrays — the k-th
    orthogonal segment starts ON the line at distance k·step and ends
    ``line_len`` off the right-hand side. 1→N over scalar line coords."""
    dx, dy = float(x2) - float(x1), float(y2) - float(y1)
    ln = float(np.sqrt(dx * dx + dy * dy))
    ks = np.arange(1, max(int(ln / step), 0) + 1, dtype=np.int64)
    d = ks * float(step)
    sx, sy = pt_on_line(float(x1), float(y1), float(x2), float(y2), d)
    ex, ey = pt_to_side(float(x1), float(y1), sx, sy, float(x2), float(y2), float(line_len))
    return ks, sx, sy, ex, ey


def segment_intersection(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Proper intersection of segment A with segment(s) B: returns
    (hit, t, ix, iy) where t is the parametric position along A.
    Parallel/degenerate pairs report hit=False. Vectorized over B."""
    r_x, r_y = np.asarray(ax2, float) - ax1, np.asarray(ay2, float) - ay1
    s_x = np.asarray(bx2, float) - np.asarray(bx1, float)
    s_y = np.asarray(by2, float) - np.asarray(by1, float)
    denom = r_x * s_y - r_y * s_x
    qpx = np.asarray(bx1, float) - ax1
    qpy = np.asarray(by1, float) - ay1
    with np.errstate(invalid="ignore", divide="ignore"):
        t = (qpx * s_y - qpy * s_x) / denom
        u = (qpx * r_y - qpy * r_x) / denom
    hit = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    with np.errstate(invalid="ignore"):
        return hit, t, ax1 + t * r_x, ay1 + t * r_y


def closest_line_intersection(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Closest intersection to the start of segment A over a batch of
    candidate segments B (closest_line_intersection): index (or -1),
    t, x, y of the winner; ties resolved by smallest candidate index."""
    hit, t, ix, iy = segment_intersection(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    if not hit.any():
        return -1, np.nan, np.nan, np.nan
    tm = np.where(hit, t, np.inf)
    i = int(np.argmin(tm))
    return i, float(t[i]), float(ix[i]), float(iy[i])


def douglas_peucker(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker polyline simplification (simplify_geometries →
    shapely .simplify semantics): keep endpoints, recursively keep the
    farthest point whose perpendicular distance exceeds ``tol``.
    Iterative stack, vectorized distance per span."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        ln = np.hypot(*seg)
        mid = pts[i + 1 : j]
        if ln == 0:
            d = np.hypot(mid[:, 0] - pts[i, 0], mid[:, 1] - pts[i, 1])
        else:
            d = np.abs(
                (mid[:, 0] - pts[i, 0]) * seg[1] - (mid[:, 1] - pts[i, 1]) * seg[0]
            ) / ln
        k = int(np.argmax(d))
        if d[k] > tol:
            km = i + 1 + k
            keep[km] = True
            stack.append((i, km))
            stack.append((km, j))
    return pts[keep]
