"""Property-based tests (hypothesis) for the geometry predicate kernels —
rect×rect ground truth by interval arithmetic, metamorphic invariants for
general polygons, boundary-touch cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rsgislib_spark.kernels import geom

rect_strategy = st.tuples(
    st.integers(-50, 50), st.integers(-50, 50), st.integers(1, 40), st.integers(1, 40)
).map(lambda t: (float(t[0]), float(t[1]), float(t[0] + t[2]), float(t[1] + t[3])))


def rect_rings(r):
    x0, y0, x1, y1 = r
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])]


@settings(max_examples=200, deadline=None)
@given(rect_strategy, rect_strategy)
def test_rect_rect_intersects_matches_interval_math(a, b):
    want = a[0] <= b[2] and a[2] >= b[0] and a[1] <= b[3] and a[3] >= b[1]
    got = geom.rect_intersects_polygon(np.array([a]), rect_rings(b))[0]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(rect_strategy, rect_strategy)
def test_rect_rect_within_matches_interval_math(a, b):
    want = b[0] <= a[0] and b[1] <= a[1] and a[2] <= b[2] and a[3] <= b[3]
    got = geom.rect_within_polygon(np.array([a]), rect_rings(b))[0]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    rect_strategy,
    st.lists(st.tuples(st.integers(-40, 40), st.integers(-40, 40)), min_size=3, max_size=10),
)
def test_polygon_invariants(r, pts):
    """within ⇒ intersects; contains(bbox) ⇒ intersects; symmetry of the
    predicate under translation of both operands."""
    arr = np.unique(np.array(pts, dtype=np.float64), axis=0)
    if len(arr) < 3:
        return
    # build a convex hull ring so the polygon is simple
    from rsgislib_spark.datagen import _convex_hull

    hull = _convex_hull(arr)
    if len(hull) < 3:
        return
    rings = [hull]
    R = np.array([r])
    inter = geom.rect_intersects_polygon(R, rings)[0]
    within = geom.rect_within_polygon(R, rings)[0]
    contains = geom.rect_contains_polygon(R, rings)[0]
    if within:
        assert inter
    if contains:
        assert inter
    # translation invariance
    d = np.array([13.0, -7.0])
    rings_t = [hull + d]
    R_t = R + np.array([[d[0], d[1], d[0], d[1]]])
    assert geom.rect_intersects_polygon(R_t, rings_t)[0] == inter
    assert geom.rect_within_polygon(R_t, rings_t)[0] == within


def test_boundary_touch_counts_as_intersects():
    poly = rect_rings((0.0, 0.0, 10.0, 10.0))
    touch_edge = np.array([[10.0, 2.0, 15.0, 8.0]])   # shares the x=10 edge
    touch_corner = np.array([[10.0, 10.0, 20.0, 20.0]])  # shares one corner
    assert geom.rect_intersects_polygon(touch_edge, poly)[0]
    assert geom.rect_intersects_polygon(touch_corner, poly)[0]
    disjoint = np.array([[10.001, 10.001, 20.0, 20.0]])
    assert not geom.rect_intersects_polygon(disjoint, poly)[0]


def test_hole_breaks_within():
    # rect fully inside the hole of an annulus is NOT within the polygon
    shell = np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0]])
    hole = np.array([[5.0, 5.0], [15.0, 5.0], [15.0, 15.0], [5.0, 15.0]])
    rings = [shell, hole]
    in_hole = np.array([[8.0, 8.0, 12.0, 12.0]])
    in_ring = np.array([[1.0, 1.0, 3.0, 3.0]])
    spanning = np.array([[1.0, 1.0, 12.0, 12.0]])
    assert not geom.rect_within_polygon(in_hole, rings)[0]
    assert geom.rect_within_polygon(in_ring, rings)[0]
    assert not geom.rect_within_polygon(spanning, rings)[0]
    assert geom.rect_intersects_polygon(spanning, rings)[0]
