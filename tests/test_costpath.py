"""Least-cost path vs a Bellman-Ford replay of the same edge weights."""

import math

import numpy as np
import pytest

from rsgislib_spark.kernels.costpath import least_cost_path, path_mask


def bellman_dist(cost, start, fully_connected=True, geometric=True):
    h, w = cost.shape
    steps = (
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
        if fully_connected
        else [(-1, 0), (0, -1), (0, 1), (1, 0)]
    )
    dist = np.full((h, w), np.inf)
    dist[start] = 0.0
    for _ in range(h * w):
        changed = False
        for y in range(h):
            for x in range(w):
                if not np.isfinite(dist[y, x]):
                    continue
                for dy, dx in steps:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w:
                        ln = math.sqrt(2.0) if (dy and dx) else 1.0
                        wgt = (
                            (cost[y, x] + cost[ny, nx]) / 2.0 * ln
                            if geometric
                            else cost[ny, nx] * ln
                        )
                        if dist[y, x] + wgt < dist[ny, nx] - 1e-15:
                            dist[ny, nx] = dist[y, x] + wgt
                            changed = True
        if not changed:
            break
    return dist


@pytest.mark.parametrize("seed,geometric", [(0, True), (1, True), (2, False)])
def test_dijkstra_matches_bellman(seed, geometric):
    rng = np.random.RandomState(seed)
    cost = rng.uniform(1, 10, (12, 10))
    start, end = (0, 0), (11, 9)
    path, total = least_cost_path(cost, start, end, geometric=geometric)
    want = bellman_dist(cost, start, geometric=geometric)[end]
    assert total == pytest.approx(want, abs=1e-9)
    # the returned path realizes exactly that cost
    acc = 0.0
    for (y0, x0), (y1, x1) in zip(path[:-1], path[1:]):
        assert max(abs(y1 - y0), abs(x1 - x0)) == 1  # 8-adjacent single steps
        ln = math.sqrt(2.0) if (y1 != y0 and x1 != x0) else 1.0
        acc += (
            (cost[y0, x0] + cost[y1, x1]) / 2.0 * ln
            if geometric
            else cost[y1, x1] * ln
        )
    assert acc == pytest.approx(total, abs=1e-9)
    assert tuple(path[0]) == start and tuple(path[-1]) == end


def test_path_avoids_barrier():
    cost = np.ones((7, 7))
    cost[3, :6] = 1000.0  # wall with a gap at the right edge
    path, total = least_cost_path(cost, (0, 3), (6, 3))
    assert total < 100  # went around, never through the wall
    ys, xs = path[:, 0], path[:, 1]
    assert (cost[ys, xs] < 1000).all()
    m = path_mask(cost, (0, 3), (6, 3))
    assert m.sum() == len(path)


def test_unreachable_and_negative():
    cost = np.ones((3, 3))
    with pytest.raises(ValueError):
        least_cost_path(-cost, (0, 0), (2, 2))
    # 4-connectivity cannot cross a full diagonal wall of inf... use a
    # disconnected case via an impossible index instead: same-cell path
    p, t = least_cost_path(cost, (1, 1), (1, 1))
    assert t == 0.0 and len(p) == 1
