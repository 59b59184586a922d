"""Line kernels vs a faithful port of the reference's trig formulations
(vectorgeoms get_pt_on_line:154 / find_pt_to_side:206), plus
Douglas-Peucker and polygon-hole helpers."""

import math

import numpy as np
import pytest

from rsgislib_spark.kernels import geom as GK
from rsgislib_spark.kernels import lines as LK


def ref_pt_on_line(x1, y1, x2, y2, dist):
    """Trig port of get_pt_on_line (quadrant cases)."""
    if dist == 0:
        return x1, y1
    dx, dy = x2 - x1, y2 - y1
    if abs(dx) > 0 and abs(dy) > 0:
        theta = math.atan(dy / dx)
        y_off = dist * math.sin(theta)
        x_off = dist * math.cos(theta)
        if dx >= 0:
            return x1 + x_off, y1 + y_off
        return x1 - x_off, y1 - y_off
    if dx == 0:
        return x1, y1 + dist * (1 if dy > 0 else -1)
    return x1 + dist * (1 if dx > 0 else -1), y1


@pytest.mark.parametrize(
    "x1,y1,x2,y2",
    [(0, 0, 30, 40), (10, 5, -20, 45), (-3, -4, -30, -44), (5, 5, 45, 5), (2, 1, 2, 90)],
)
def test_pt_on_line_matches_reference_trig(x1, y1, x2, y2):
    for dist in (0.0, 10.0, 33.3):
        gx, gy = LK.pt_on_line(float(x1), float(y1), float(x2), float(y2), dist)
        wx, wy = ref_pt_on_line(float(x1), float(y1), float(x2), float(y2), dist)
        assert gx == pytest.approx(wx, abs=1e-9)
        assert gy == pytest.approx(wy, abs=1e-9)


def test_pt_to_side_right_angle_and_distance():
    rng = np.random.RandomState(4)
    for _ in range(20):
        x1, y1, x2, y2 = rng.uniform(-100, 100, 4)
        t = rng.uniform(0.1, 0.9)
        px, py = x1 + t * (x2 - x1), y1 + t * (y2 - y1)
        ox, oy = LK.pt_to_side(x1, y1, px, py, x2, y2, 25.0)
        # distance from the line point is exactly line_len
        assert np.hypot(ox - px, oy - py) == pytest.approx(25.0, abs=1e-9)
        # orthogonal to the direction
        assert (ox - px) * (x2 - x1) + (oy - py) * (y2 - y1) == pytest.approx(0, abs=1e-6)
        # right-hand side: cross(direction, offset) < 0
        assert (x2 - x1) * (oy - py) - (y2 - y1) * (ox - px) < 0
        # left_hand mirrors
        lx, ly = LK.pt_to_side(x1, y1, px, py, x2, y2, 25.0, left_hand=True)
        assert lx == pytest.approx(2 * px - ox, abs=1e-9)
        assert ly == pytest.approx(2 * py - oy, abs=1e-9)


def test_orthogonal_segments():
    ks, sx, sy, ex, ey = LK.orthogonal_segments(0.0, 0.0, 100.0, 0.0, 30.0, 10.0)
    assert ks.tolist() == [1, 2, 3]
    assert np.allclose(sx, [30, 60, 90]) and np.allclose(sy, 0)
    assert np.allclose(ex, sx) and np.allclose(ey, -10.0)  # right-hand of +x is -y


def test_segment_intersection_batch():
    bx1 = np.array([0.0, 0.0, 20.0])
    by1 = np.array([10.0, -5.0, 0.0])
    bx2 = np.array([10.0, 10.0, 30.0])
    by2 = np.array([0.0, -5.0, 0.0])
    hit, t, ix, iy = LK.segment_intersection(0.0, 0.0, 10.0, 10.0, bx1, by1, bx2, by2)
    assert hit.tolist() == [True, False, False]  # 2nd parallel-offset, 3rd out of range
    assert t[0] == pytest.approx(0.5) and ix[0] == pytest.approx(5) and iy[0] == pytest.approx(5)


def test_closest_line_intersection():
    bx1 = np.array([0.0, 0.0])
    by1 = np.array([8.0, 4.0])
    bx2 = np.array([10.0, 10.0])
    by2 = np.array([8.0, 4.0])
    i, t, x, y = LK.closest_line_intersection(5.0, 0.0, 5.0, 10.0, bx1, by1, bx2, by2)
    assert i == 1 and y == pytest.approx(4.0)  # nearer crossing wins
    i2, t2, _, _ = LK.closest_line_intersection(0.0, 0.0, 1.0, 0.0, bx1, by1, bx2, by2)
    assert i2 == -1 and np.isnan(t2)


def naive_dp(pts, tol):
    if len(pts) <= 2:
        return pts
    seg = pts[-1] - pts[0]
    ln = np.hypot(*seg)
    if ln == 0:
        d = np.hypot(pts[1:-1, 0] - pts[0, 0], pts[1:-1, 1] - pts[0, 1])
    else:
        d = np.abs((pts[1:-1, 0] - pts[0, 0]) * seg[1] - (pts[1:-1, 1] - pts[0, 1]) * seg[0]) / ln
    k = int(np.argmax(d)) + 1
    if d[k - 1] <= tol:
        return np.array([pts[0], pts[-1]])
    left = naive_dp(pts[: k + 1], tol)
    right = naive_dp(pts[k:], tol)
    return np.vstack([left[:-1], right])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_douglas_peucker_matches_recursive(seed):
    rng = np.random.RandomState(seed)
    x = np.arange(40, dtype=float)
    y = np.cumsum(rng.uniform(-3, 3, 40))
    pts = np.stack([x, y], 1)
    for tol in (0.5, 2.0, 10.0):
        got = LK.douglas_peucker(pts, tol)
        want = naive_dp(pts, tol)
        assert np.array_equal(got, want), tol
    # endpoints always kept; large tol leaves just the endpoints
    assert len(LK.douglas_peucker(pts, 1e9)) == 2


def test_hole_helpers():
    shell = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]])
    hole = np.array([[2.0, 2], [4, 2], [4, 4], [2, 4]])
    rings = [shell, hole]
    assert GK.poly_hole_area(rings) == pytest.approx(4.0)
    assert GK.polygon_area(rings) == pytest.approx(96.0)
    assert GK.polygon_area(GK.drop_holes(rings)) == pytest.approx(100.0)
    # threshold: keep holes >= thres
    kept = GK.drop_holes(rings, area_thres=2.0)
    assert len(kept) == 2
    assert len(GK.drop_holes(rings, area_thres=5.0)) == 1


def test_bbox_union_and_snap():
    boxes = np.array([[0.0, 5, 10, 8], [-3, 6, 4, 20], [1, 1, 2, 2]])
    assert GK.bbox_union(boxes).tolist() == [-3, 1, 10, 20]
    out = GK.snap_extent_to_grid([3.2, 4.7, 17.1, 19.9], 5.0, full_contain=True)
    assert out.tolist() == [0.0, 0.0, 20.0, 20.0]
    inner = GK.snap_extent_to_grid([3.2, 4.7, 17.1, 19.9], 5.0, full_contain=False)
    assert inner.tolist() == [5.0, 5.0, 15.0, 15.0]
