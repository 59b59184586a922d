"""Spatial-join parity: broadcast strategy vs numpy oracle vs cell strategy.

Oracle role: the reference delegates its joins to geopandas/shapely
(vectorutils/__init__.py:2217); with those unavailable in this container,
the oracle is an independent brute-force evaluation of the same predicate
kernels over ALL (image, zone) pairs — no tree, no cells — so index and
join plumbing are tested against exhaustive evaluation.
"""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.kernels import geom
from rsgislib_spark.operators.spatial_join import (
    ZoneIndex,
    spatial_join_broadcast,
    spatial_join_cells,
    spatial_select,
)


def brute_pairs(images_pdf: pd.DataFrame, zones_pdf: pd.DataFrame, join_op: str):
    rects = images_pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(dtype=np.float64)
    ids = images_pdf["image_id"].to_numpy()
    out = set()
    for z in zones_pdf.itertuples(index=False):
        rings = geom.wkb_to_polygon(z.geometry)
        if join_op == "intersects":
            ok = geom.rect_intersects_polygon(rects, rings)
        elif join_op == "within":
            ok = geom.rect_within_polygon(rects, rings)
        else:
            ok = geom.rect_contains_polygon(rects, rings)
        for i in np.nonzero(ok)[0]:
            out.add((ids[i], int(z.zone_id)))
    return out


@pytest.fixture(scope="module")
def spark_tables(spark, images_nopix_pdf, zones_pdf):
    images = spark.createDataFrame(
        images_nopix_pdf[["image_id", "w", "h", "caption", "minx", "miny", "maxx", "maxy"]]
    )
    zones = spark.createDataFrame(zones_pdf)
    return images, zones


@pytest.mark.parametrize("join_op", ["intersects", "within", "contains"])
def test_broadcast_join_matches_oracle(spark_tables, images_nopix_pdf, zones_pdf, join_op):
    images, zones = spark_tables
    got = (
        spatial_join_broadcast(images, zones, join_op=join_op, join_how="inner")
        .select("image_id", "zone_id")
        .toPandas()
    )
    got_pairs = set(zip(got["image_id"], got["zone_id"].astype(int)))
    exp = brute_pairs(images_nopix_pdf, zones_pdf, join_op)
    assert got_pairs == exp
    if join_op == "intersects":
        assert len(exp) > 100  # skewed placement must produce real matches


def test_cell_join_matches_broadcast(spark_tables, images_nopix_pdf, zones_pdf):
    images, zones = spark_tables
    for join_op in ["intersects", "within"]:
        a = (
            spatial_join_broadcast(images, zones, join_op=join_op)
            .select("image_id", "zone_id").toPandas()
        )
        b = spatial_join_cells(images, zones, join_op=join_op).toPandas()
        pa = set(zip(a["image_id"], a["zone_id"].astype(int)))
        pb = set(zip(b["image_id"], b["zone_id"].astype(int)))
        assert pa == pb


def test_left_join_keeps_unmatched_images(spark_tables):
    images, zones = spark_tables
    n_images = images.count()
    left = spatial_join_broadcast(images, zones, join_op="within", join_how="left")
    # every image appears at least once
    assert left.select("image_id").distinct().count() == n_images
    assert left.filter("zone_id IS NULL").count() > 0


def test_right_join_keeps_unmatched_zones(spark_tables, zones_pdf):
    images, zones = spark_tables
    right = spatial_join_broadcast(images, zones, join_op="contains", join_how="right")
    assert right.select("zone_id").distinct().count() == len(zones_pdf)


def test_empty_join_yields_empty_result(spark, zones_pdf):
    """Reference: inner spatial join with zero matches produces no output
    (test_vectorutils.py:850-873 — no file written)."""
    far = pd.DataFrame(
        {
            "image_id": ["img_x"],
            "minx": [5e6], "miny": [5e6], "maxx": [5.1e6], "maxy": [5.1e6],
        }
    )
    images = spark.createDataFrame(far)
    zones = spark.createDataFrame(zones_pdf)
    out = spatial_join_broadcast(images, zones, join_op="intersects", join_how="inner")
    assert out.count() == 0


def test_spatial_select_semi(spark_tables, images_nopix_pdf, zones_pdf):
    images, zones = spark_tables
    sel = spatial_select(images, zones, join_op="intersects").toPandas()
    exp_ids = {i for i, _ in brute_pairs(images_nopix_pdf, zones_pdf, "intersects")}
    assert set(sel["image_id"]) == exp_ids
    # semi-join: image columns only, no duplication
    assert len(sel) == len(exp_ids)


def test_zone_index_pickles(zones_pdf):
    import pickle

    zx = ZoneIndex.from_pandas(zones_pdf)
    zx2 = pickle.loads(pickle.dumps(zx))
    rects = np.array([[0, 0, 100, 100.0]])
    a = zx.match(rects, "intersects")
    b = zx2.match(rects, "intersects")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


class TestLayerPredicates:
    """Boolean layer predicates (vec_intersects_vec family,
    vectorgeoms/__init__.py:2541-2952): ANY-pair semantics, both truthy
    and falsy cases, on hand-built rect layers."""

    def _mk(self, spark, rects, id0=0):
        rows = []
        for i, (x0, y0, x1, y1) in enumerate(rects):
            rows.append((id0 + i, float(x0), float(y0), float(x1), float(y1)))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["image_id", "minx", "miny", "maxx", "maxy"])
        )

    def _zones(self, spark, rects, id0=100):
        rows = []
        for i, (x0, y0, x1, y1) in enumerate(rects):
            wkb = geom.polygon_to_wkb(
                [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=float)]
            )
            rows.append((id0 + i, wkb))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["zone_id", "geometry"])
        )

    def test_predicates_truth_table(self, spark):
        from rsgislib_spark.operators.spatial_join import (
            vec_contains_vec,
            vec_intersects_vec,
            vec_overlaps_vec,
            vec_within_vec,
        )

        zones = self._zones(spark, [(10.0, 10.0, 20.0, 20.0)])
        inside = self._mk(spark, [(12.0, 12.0, 18.0, 18.0)])
        straddle = self._mk(spark, [(15.0, 15.0, 25.0, 25.0)])
        outside = self._mk(spark, [(30.0, 30.0, 40.0, 40.0)])
        covering = self._mk(spark, [(0.0, 0.0, 50.0, 50.0)])

        assert vec_intersects_vec(inside, zones)
        assert vec_intersects_vec(straddle, zones)
        assert not vec_intersects_vec(outside, zones)

        assert vec_within_vec(inside, zones)
        assert not vec_within_vec(straddle, zones)
        assert not vec_within_vec(outside, zones)

        assert vec_contains_vec(covering, zones)
        assert not vec_contains_vec(inside, zones)

        assert vec_overlaps_vec(straddle, zones)
        assert not vec_overlaps_vec(inside, zones)  # within, not overlaps
        assert not vec_overlaps_vec(covering, zones)  # contains, not overlaps
        assert not vec_overlaps_vec(outside, zones)

    def test_identity_parts_cover_image_exactly(self, spark):
        """For NON-overlapping zones, identity parts partition each
        image: zone-tagged + free areas sum to the image area."""
        from rsgislib_spark.operators.overlay import overlay_identity

        zones_pdf = pd.DataFrame(
            {
                "zone_id": [1, 2],
                "geometry": [
                    geom.polygon_to_wkb(
                        [np.array([[0.25, 0.25], [10.25, 0.25], [10.25, 10.25], [0.25, 10.25]])]
                    ),
                    geom.polygon_to_wkb(
                        [np.array([[20.25, 0.25], [30.25, 0.25], [30.25, 10.25], [20.25, 10.25]])]
                    ),
                ],
            }
        )
        imgs = self._mk(spark, [(5.0, 5.0, 25.0, 8.0), (100.0, 100.0, 110.0, 110.0)])
        parts = overlay_identity(imgs, zones_pdf, scale=4).toPandas()
        tot = parts.groupby("image_id")["part_area_scaled"].sum()
        assert tot[0] == int((25 - 5) * (8 - 5) * 16)
        assert tot[1] == int(10 * 10 * 16)
        sub = parts[parts.image_id == 0]
        assert set(sub["zone_id"].dropna().astype(int)) == {1, 2}
        assert (sub["zone_id"].isna()).sum() >= 1  # the gap between zones


def test_cells_left_right_hows_match_broadcast(spark_tables):
    """Cells-path left/right parity with the broadcast path (VERDICT r4
    task 4): identical pair sets including the null-padded unmatched
    rows, with zero broadcast of either side in the cells plan."""
    images, zones = spark_tables
    # left: every image survives; unmatched ones carry null zone_id
    bl = (
        spatial_join_broadcast(images, zones, join_op="within", join_how="left")
        .select("image_id", "zone_id").toPandas()
    )
    cl = spatial_join_cells(
        images, zones, join_op="within", join_how="left"
    ).toPandas()
    key = lambda df: set(
        (i, -1 if z != z else int(z))  # NaN → -1 sentinel
        for i, z in zip(df["image_id"], df["zone_id"].astype("float"))
    )
    assert key(bl) == key(cl)
    assert cl["zone_id"].isna().sum() > 0
    # right: every zone survives; unmatched ones carry null image_id
    br = (
        spatial_join_broadcast(images, zones, join_op="contains", join_how="right")
        .select("image_id", "zone_id").toPandas()
    )
    cr = spatial_join_cells(
        images, zones, join_op="contains", join_how="right"
    ).toPandas()
    zkey = lambda df: set(
        ("~none" if i is None or i != i else i, int(z))
        for i, z in zip(df["image_id"], df["zone_id"])
    )
    assert zkey(br) == zkey(cr)
    assert cr["image_id"].isna().sum() > 0
