"""Least-cost path over a raster cost surface.

Reference: imagecalc/leastcostpath.py (:52-78) — skimage.graph
route_through_array(geometric=True, fully_connected=True), i.e.
MCP_Geometric: 8-connected Dijkstra where traversing u→v costs
(cost[u] + cost[v])/2 × step length (1 or √2). skimage is env-bound;
this is a from-scratch heapq Dijkstra with deterministic (dist, y, x)
tie-breaking, per-image worker-local (the raster tile fits the worker —
the same parallel unit as every other per-image kernel here).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

_STEPS8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
_STEPS4 = [(-1, 0), (0, -1), (0, 1), (1, 0)]


def least_cost_path(
    cost: np.ndarray,
    start: tuple[int, int],
    end: tuple[int, int],
    fully_connected: bool = True,
    geometric: bool = True,
):
    """Minimum-cost path from start to end (both (y, x)).

    Returns (path, total_cost): path is an (n, 2) int array of (y, x)
    steps from start to end inclusive. Edge weight u→v is
    (cost[u]+cost[v])/2·len when ``geometric`` (MCP_Geometric), else
    cost[v]·len (MCP). Negative costs are rejected.
    """
    c = np.asarray(cost, np.float64)
    if (c < 0).any():
        raise ValueError("cost surface must be non-negative")
    h, w = c.shape
    sy, sx = map(int, start)
    ey, ex = map(int, end)
    steps = _STEPS8 if fully_connected else _STEPS4
    dist = np.full((h, w), np.inf)
    prev = np.full((h, w, 2), -1, np.int64)
    dist[sy, sx] = 0.0
    pq = [(0.0, sy, sx)]
    while pq:
        d, y, x = heapq.heappop(pq)
        if d > dist[y, x]:
            continue
        if (y, x) == (ey, ex):
            break
        for dy, dx in steps:
            ny, nx = y + dy, x + dx
            if not (0 <= ny < h and 0 <= nx < w):
                continue
            ln = math.sqrt(2.0) if (dy and dx) else 1.0
            wgt = (c[y, x] + c[ny, nx]) / 2.0 * ln if geometric else c[ny, nx] * ln
            nd = d + wgt
            if nd < dist[ny, nx]:
                dist[ny, nx] = nd
                prev[ny, nx] = (y, x)
                heapq.heappush(pq, (nd, ny, nx))
    if not np.isfinite(dist[ey, ex]):
        raise ValueError("end not reachable from start")
    path = [(ey, ex)]
    while path[-1] != (sy, sx):
        y, x = path[-1]
        path.append(tuple(prev[y, x]))
    return np.array(path[::-1], np.int64), float(dist[ey, ex])


def path_mask(cost: np.ndarray, start, end, **kw) -> np.ndarray:
    """1-valued raster mask of the least-cost path (the reference's
    output raster, leastcostpath.py:74-77)."""
    p, _ = least_cost_path(cost, start, end, **kw)
    out = np.zeros_like(np.asarray(cost), dtype=np.int64)
    out[p[:, 0], p[:, 1]] = 1
    return out
