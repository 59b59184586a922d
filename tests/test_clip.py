"""Sutherland–Hodgman clipping kernel — exact-area oracles on analytic
cases plus an overlay operator round trip."""

import numpy as np
import pytest

from rsgislib_spark.kernels.clip import rect_difference_parts


class TestRectDifference:
    def _brute(self, rect, covers, res=1):
        x0, y0, x1, y1 = rect
        grid = np.zeros((y1 - y0, x1 - x0), dtype=bool)
        for cx0, cy0, cx1, cy1 in covers:
            gx0, gy0 = max(cx0, x0) - x0, max(cy0, y0) - y0
            gx1, gy1 = min(cx1, x1) - x0, min(cy1, y1) - y0
            if gx0 < gx1 and gy0 < gy1:
                grid[gy0:gy1, gx0:gx1] = True
        return int(grid.sum())

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_covers_match_brute(self, seed):
        rng = np.random.default_rng(seed)
        rect = (0, 0, 40, 30)
        covers = []
        for _ in range(rng.integers(0, 12)):
            cx0 = int(rng.integers(-10, 45))
            cy0 = int(rng.integers(-10, 35))
            covers.append((cx0, cy0, cx0 + int(rng.integers(1, 20)), cy0 + int(rng.integers(1, 18))))
        parts, covered = rect_difference_parts(rect, np.array(covers).reshape(-1, 4))
        assert covered == self._brute(rect, covers)
        part_area = sum((px1 - px0) * (py1 - py0) for px0, py0, px1, py1 in parts)
        assert part_area + covered == 40 * 30
        # parts are disjoint and uncovered (rasterize check)
        grid = np.zeros((30, 40), dtype=np.int32)
        for px0, py0, px1, py1 in parts:
            grid[py0:py1, px0:px1] += 1
        assert grid.max() <= 1
        cov_grid = np.zeros((30, 40), dtype=bool)
        for cx0, cy0, cx1, cy1 in covers:
            gx0, gy0, gx1, gy1 = max(cx0, 0), max(cy0, 0), min(cx1, 40), min(cy1, 30)
            if gx0 < gx1 and gy0 < gy1:
                cov_grid[gy0:gy1, gx0:gx1] = True
        assert not (grid.astype(bool) & cov_grid).any()

    def test_explode_multi_geoms(self, spark):
        from rsgislib_spark.kernels import geom
        from rsgislib_spark.operators.overlay import explode_multi_geoms

        sq = lambda x0, y0, s: np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float
        )
        multi = geom.multipolygon_to_wkb([[sq(0, 0, 2)], [sq(10, 10, 3)]])
        single = geom.polygon_to_wkb([sq(5, 5, 4)])
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame({"zone_id": [1, 2], "geometry": [multi, single]})
        )
        got = explode_multi_geoms(df).toPandas().sort_values(["zone_id", "part"])
        assert list(got["zone_id"]) == [1, 1, 2]
        assert list(got["part"]) == [0, 1, 0]
        assert list(got["part_area"]) == [4.0, 9.0, 16.0]
        # parts round-trip as plain polygons
        rings = geom.wkb_to_polygon(got.iloc[1]["part_wkb"])
        assert np.allclose(rings[0], sq(10, 10, 3))
        # wkb_to_parts on a plain polygon → one part
        assert len(geom.wkb_to_parts(single)) == 1

    def test_no_covers_and_full_cover(self):
        parts, covered = rect_difference_parts((0, 0, 5, 5), np.empty((0, 4), dtype=np.int64))
        assert parts == [(0, 0, 5, 5)] and covered == 0
        parts, covered = rect_difference_parts((0, 0, 5, 5), np.array([[-1, -1, 6, 6]]))
        assert parts == [] and covered == 25
import pytest

from rsgislib_spark.kernels.clip import clip_polygon_to_rect, clip_ring_to_rect, ring_area


def square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)


def test_rect_rect_clip_area():
    rings, area = clip_polygon_to_rect([square(0, 0, 10)], (5, 5, 20, 20))
    assert area == pytest.approx(25.0)
    assert len(rings) == 1 and len(rings[0]) == 4


def test_clip_fully_inside_and_outside():
    _, a_in = clip_polygon_to_rect([square(2, 2, 3)], (0, 0, 10, 10))
    assert a_in == pytest.approx(9.0)
    rings, a_out = clip_polygon_to_rect([square(20, 20, 3)], (0, 0, 10, 10))
    assert a_out == 0.0 and rings == []


def test_clip_triangle_half():
    tri = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    c = clip_ring_to_rect(tri, (0, 0, 5, 10))  # vertical cut at x=5
    # area left of x=5: full (50) minus right triangle (12.5) = 37.5
    assert abs(ring_area(c)) == pytest.approx(37.5)


def test_clip_polygon_with_hole():
    shell = square(0, 0, 10)
    hole = square(2, 2, 4)
    _, area = clip_polygon_to_rect([shell, hole], (0, 0, 4, 10))
    # shell part 4x10=40; hole part 2x4=8 -> 32
    assert area == pytest.approx(32.0)


def test_clip_area_matches_interval_math_random():
    rng = np.random.Generator(np.random.Philox(key=[21, 0]))
    for _ in range(50):
        a = rng.uniform(0, 50, 2)
        b = a + rng.uniform(1, 30, 2)
        r = rng.uniform(0, 50, 2)
        s = r + rng.uniform(1, 30, 2)
        _, area = clip_polygon_to_rect(
            [np.array([[a[0], a[1]], [b[0], a[1]], [b[0], b[1]], [a[0], b[1]]])],
            (r[0], r[1], s[0], s[1]),
        )
        want = max(0.0, min(b[0], s[0]) - max(a[0], r[0])) * max(
            0.0, min(b[1], s[1]) - max(a[1], r[1])
        )
        assert area == pytest.approx(want)


def test_clip_convex_blob_area_via_montecarlo():
    from rsgislib_spark.datagen import _convex_hull

    rng = np.random.Generator(np.random.Philox(key=[22, 0]))
    pts = rng.uniform(0, 20, (12, 2))
    hull = _convex_hull(pts)
    rect = (5.0, 5.0, 15.0, 15.0)
    _, area = clip_polygon_to_rect([hull], rect)
    # Monte-Carlo estimate inside the rect using point-in-polygon
    from rsgislib_spark.kernels.geom import points_in_polygon

    n = 200_000
    xs = rng.uniform(rect[0], rect[2], n)
    ys = rng.uniform(rect[1], rect[3], n)
    frac = points_in_polygon(xs, ys, [hull]).mean()
    mc_area = frac * (rect[2] - rect[0]) * (rect[3] - rect[1])
    assert area == pytest.approx(mc_area, rel=0.02)


def test_overlay_intersection_operator(spark):
    """Operator round trip on datagen zones (rects, hulls, holes): areas
    positive, WKB decodable, and rect-zone areas match interval math."""
    import pandas as pd

    from rsgislib_spark import datagen
    from rsgislib_spark.kernels.geom import wkb_to_polygon
    from rsgislib_spark.operators.overlay import overlay_intersection

    images_pdf = datagen.image_footprints(
        datagen.gen_images(120, seed=42, with_pixels=False)
    )
    images = spark.createDataFrame(
        images_pdf[["image_id", "minx", "miny", "maxx", "maxy"]]
    )
    zones_pdf = datagen.gen_zones(40, seed=42)
    out = overlay_intersection(images, zones_pdf[["zone_id", "geometry"]]).toPandas()
    assert len(out) > 0
    assert (out["clip_area"] > 0).all()
    # every clipped geometry decodes and fits inside both bboxes
    im = images_pdf.set_index("image_id")
    zn = zones_pdf.set_index("zone_id")
    rect_zone_ids = set(zones_pdf[zones_pdf["zone_id"] % 4 == 0]["zone_id"])
    n_rect_checked = 0
    for rec in out.itertuples(index=False):
        rings = wkb_to_polygon(bytes(rec.clip_wkb))
        pts = np.vstack(rings)
        r = im.loc[rec.image_id]
        assert pts[:, 0].min() >= r.minx - 1e-9 and pts[:, 0].max() <= r.maxx + 1e-9
        if rec.zone_id in rect_zone_ids:
            z = zn.loc[rec.zone_id]
            want = max(0.0, min(r.maxx, z.maxx) - max(r.minx, z.minx)) * max(
                0.0, min(r.maxy, z.maxy) - max(r.miny, z.miny)
            )
            assert rec.clip_area == pytest.approx(want)
            n_rect_checked += 1
    assert n_rect_checked > 0
