"""Delaunay/alpha-shape: definitional certificates (empty circumcircle,
hull-area cover, boundary closure)."""

import numpy as np
import pytest

from rsgislib_spark.kernels.alphashape import _circumcircle, alpha_shape_edges, delaunay


def tri_area(a, b, c):
    return 0.5 * abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1]))


def hull_area(pts):
    # exact convex hull area via monotone chain
    P = sorted(map(tuple, pts))

    def half(P):
        h = []
        for p in P:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    hull = half(P)[:-1] + half(P[::-1])[:-1]
    a = 0.0
    for i in range(len(hull)):
        x0, y0 = hull[i]
        x1, y1 = hull[(i + 1) % len(hull)]
        a += x0 * y1 - x1 * y0
    return abs(a) / 2


@pytest.mark.parametrize("seed,n", [(0, 30), (1, 60), (2, 120)])
def test_delaunay_certificates(seed, n):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(0, 100, (n, 2))
    tris = delaunay(pts)
    # empty-circumcircle property (the Delaunay definition)
    for t in tris:
        cc, r2 = _circumcircle(pts[t[0]], pts[t[1]], pts[t[2]])
        for i in range(n):
            if i in t:
                continue
            d2 = (pts[i, 0] - cc[0]) ** 2 + (pts[i, 1] - cc[1]) ** 2
            assert d2 > r2 * (1 - 1e-9), (t, i)
    # triangulation tiles the convex hull exactly
    total = sum(tri_area(pts[a], pts[b], pts[c]) for a, b, c in tris)
    assert total == pytest.approx(hull_area(pts), rel=1e-9)


def test_alpha_zero_gives_convex_hull_boundary():
    rng = np.random.RandomState(5)
    pts = rng.uniform(0, 50, (40, 2))
    _, boundary = alpha_shape_edges(pts, alpha=0.0)
    # boundary edge count equals convex hull vertex count
    P = {tuple(p) for p in pts}
    # each boundary vertex appears in exactly 2 boundary edges (closed ring)
    from collections import Counter

    deg = Counter(v for e in boundary for v in e)
    assert all(d == 2 for d in deg.values())


def test_alpha_recovers_concavity():
    # two distant clusters: a small-enough 1/alpha splits the shape into
    # two closed components; alpha=0 (hull) bridges them
    rng = np.random.RandomState(9)
    a = rng.uniform(0, 10, (25, 2))
    b = rng.uniform(0, 10, (25, 2)) + [100, 0]
    pts = np.vstack([a, b])
    kept0, bound0 = alpha_shape_edges(pts, alpha=0.0)
    kept, bound = alpha_shape_edges(pts, alpha=1 / 15.0)  # circumradius < 15
    # bridging triangles (spanning the 100-unit gap) are dropped
    assert len(kept) < len(kept0)
    for t in kept:
        xs = pts[list(t), 0]
        assert xs.max() - xs.min() < 50  # no triangle spans the gap
    from collections import Counter

    deg = Counter(v for e in bound for v in e)
    assert all(d == 2 for d in deg.values())  # two disjoint closed rings
