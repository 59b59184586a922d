"""Alpha shapes (concave hulls) from scratch.

Reference: vectorgeoms.create_alpha_shape (python/rsgislib/vectorgeoms/
__init__.py) — wraps the `alphashape` package (env-bound): Delaunay
triangulation, keep triangles whose circumradius < 1/alpha, boundary =
edges used by exactly one kept triangle.

From-scratch Bowyer–Watson Delaunay (super-triangle, incremental
insertion in input order — deterministic), double-precision
circumcircle tests. Point sets here are per-group samples (the
reference runs it per vector layer), so the kernel is worker-local;
fan out per group with applyInPandas for many layers.
"""

from __future__ import annotations

import numpy as np


def _circumcircle(a, b, c):
    """(centre, radius²) of the triangle abc; (None, inf) if degenerate."""
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0:
        return None, np.inf
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy), r2


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer–Watson Delaunay triangulation. Returns index triangles
    (sorted vertex ids). Assumes general position (no 4 cocircular);
    points: (n, 2) float."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < 3:
        return []
    # super-triangle comfortably containing everything
    cx, cy = pts.mean(0)
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0) * 64.0
    sup = np.array(
        [[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]]
    )
    allp = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2
    tris = {(s0, s1, s2): _circumcircle(allp[s0], allp[s1], allp[s2])}
    for i in range(n):
        p = allp[i]
        bad = []
        for t, (cc, r2) in tris.items():
            if cc is not None and (p[0] - cc[0]) ** 2 + (p[1] - cc[1]) ** 2 < r2:
                bad.append(t)
        # polygon hole boundary = edges of bad triangles used exactly once
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            del tris[t]
            for e in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
                e = (min(e), max(e))
                edge_count[e] = edge_count.get(e, 0) + 1
        for (u, v), cnt in edge_count.items():
            if cnt == 1:
                t = tuple(sorted((u, v, i)))
                tris[t] = _circumcircle(allp[t[0]], allp[t[1]], allp[t[2]])
    return [t for t in tris if all(v < n for v in t)]


def alpha_shape_edges(points: np.ndarray, alpha: float):
    """Boundary edges of the alpha shape: Delaunay triangles with
    circumradius < 1/alpha kept; edges used by exactly ONE kept triangle
    form the boundary (create_alpha_shape semantics). alpha=0 keeps all
    triangles → the convex hull boundary. Returns (kept_triangles,
    boundary_edges) as index lists."""
    pts = np.asarray(points, np.float64)
    tris = delaunay(pts)
    if alpha > 0:
        rmax2 = (1.0 / alpha) ** 2
        kept = [
            t for t in tris
            if _circumcircle(pts[t[0]], pts[t[1]], pts[t[2]])[1] < rmax2
        ]
    else:
        kept = tris
    edge_count: dict[tuple[int, int], int] = {}
    for t in kept:
        for e in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
            e = (min(e), max(e))
            edge_count[e] = edge_count.get(e, 0) + 1
    boundary = sorted(e for e, c in edge_count.items() if c == 1)
    return kept, boundary
