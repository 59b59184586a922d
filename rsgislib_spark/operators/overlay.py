"""Geometry-output overlay joins — the vectorgeoms overlay family
(intersection / difference / symmetric difference / union / clip,
vectorgeoms/__init__.py:1137-1401, :2175-2511): rows carry the produced
GEOMETRY (WKB) and its exact area, not just a match flag.

 - :func:`overlay_intersection` — per intersecting pair, the clipped
   zone polygon (Sutherland–Hodgman) + area.
 - :func:`overlay_difference` — per image, the exact rectilinear
   decomposition of image − ∪zones (coordinate-compression sweep on a
   scaled integer lattice; axis-aligned zones — the fixture family).
 - :func:`overlay_union_pairs` / :func:`overlay_sym_difference_pairs`
   — per intersecting pair, |A∪B| and |A△B| from the clipped
   intersection (areas exact on the lattice).

Plan shape: broadcast ZoneIndex candidates (bbox tree) → per-pair /
per-image numpy kernels inside mapInPandas. The per-pair python cost is
bounded by the candidate count, which the tree keeps proportional to
true overlaps.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rsgislib_spark.kernels import geom
from rsgislib_spark.kernels.clip import (
    clip_polygon_to_rect,
    rect_difference_parts,
    ring_area,
)
from rsgislib_spark.operators.spatial_join import ZoneIndex


def overlay_intersection(
    images: DataFrame,
    zones_pdf: pd.DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """(image, zone, clipped WKB, area) for every overlapping pair.

    ``zones_pdf`` is the small zone table (zone_id, geometry WKB) —
    broadcast like every zone-side structure in this engine.
    """
    spark = images.sparkSession
    zb = spark.sparkContext.broadcast(ZoneIndex.from_pandas(zones_pdf))
    id_type = dict(images.dtypes)[id_col]
    schema = f"{id_col} {id_type}, zone_id long, clip_wkb binary, clip_area double"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zx: ZoneIndex = zb.value
        for pdf in it:
            if not len(pdf):
                continue
            rects = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(np.float64)
            qi, zi = zx.tree.query(rects)
            ids, zids, wkbs, areas = [], [], [], []
            id_vals = pdf[id_col].to_numpy()
            for q, z in zip(qi, zi):
                rings, area = clip_polygon_to_rect(zx.rings[z], rects[q])
                if area > 0 and rings:
                    ids.append(id_vals[q])
                    zids.append(int(zx.zone_ids[z]))
                    wkbs.append(geom.polygon_to_wkb(rings))
                    areas.append(area)
            yield pd.DataFrame(
                {id_col: ids, "zone_id": zids, "clip_wkb": wkbs, "clip_area": areas}
            )

    return images.select(id_col, "minx", "miny", "maxx", "maxy").mapInPandas(
        _run, schema=schema
    )


def overlay_difference(
    images: DataFrame,
    zones_pdf: pd.DataFrame,
    id_col: str = "image_id",
    scale: int = 4,
) -> DataFrame:
    """image − ∪zones as an exact disjoint set of rect parts.

    ``scale`` is the lattice denominator: coordinates ×scale must be
    integers (the catalog's zones live on a 0.25 lattice → scale=4), so
    the sweep and the emitted areas are integer-exact. One output row per
    uncovered rect part: (id, part_x0..part_y1 in WORLD coords,
    part_area_scaled = area × scale²); an image fully covered emits no
    rows, an image with no overlapping zone emits itself as one part.

    Ref: vec_lyr_difference / gp difference overlay
    (vectorgeoms/__init__.py:1189-1240, :2321-2476), scoped to
    axis-aligned zones (the general polygon case remains a gap).
    """
    spark = images.sparkSession
    zb = spark.sparkContext.broadcast(ZoneIndex.from_pandas(zones_pdf))
    id_type = dict(images.dtypes)[id_col]
    s = float(scale)
    schema = (
        f"{id_col} {id_type}, part_x0 double, part_y0 double, "
        "part_x1 double, part_y1 double, part_area_scaled long"
    )

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zx: ZoneIndex = zb.value
        zr = np.rint(zx.bboxes * s).astype(np.int64)  # zone rects, scaled
        for pdf in it:
            if not len(pdf):
                continue
            rects = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(np.float64)
            ri = np.rint(rects * s).astype(np.int64)
            qi, zi = zx.tree.query(rects)
            id_vals = pdf[id_col].to_numpy()
            rows = []
            for q in range(len(pdf)):
                covers = zr[zi[qi == q]]
                parts, _cov = rect_difference_parts(ri[q], covers)
                for (px0, py0, px1, py1) in parts:
                    rows.append(
                        (
                            id_vals[q], px0 / s, py0 / s, px1 / s, py1 / s,
                            int((px1 - px0) * (py1 - py0)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "part_x0", "part_y0", "part_x1", "part_y1",
                         "part_area_scaled"],
            )

    return images.select(id_col, "minx", "miny", "maxx", "maxy").mapInPandas(
        _run, schema=schema
    )


def _pair_areas(images: DataFrame, zones_pdf: pd.DataFrame, id_col: str) -> DataFrame:
    """(id, zone_id, a_area, z_area, inter_area) per intersecting pair —
    shared base of the union / symmetric-difference overlays."""
    inter = overlay_intersection(images, zones_pdf, id_col=id_col)

    def _poly_area(wkb: bytes) -> float:
        rings = geom.wkb_to_polygon(wkb)
        return abs(ring_area(rings[0])) - sum(abs(ring_area(r)) for r in rings[1:])

    zareas = pd.DataFrame(
        {
            "zone_id": zones_pdf["zone_id"].to_numpy(np.int64),
            "z_area": [_poly_area(w) for w in zones_pdf["geometry"]],
        }
    )
    spark = images.sparkSession
    zdf = spark.createDataFrame(zareas)
    from pyspark.sql import functions as F

    a = images.select(
        id_col,
        ((F.col("maxx") - F.col("minx")) * (F.col("maxy") - F.col("miny"))).alias("a_area"),
    )
    return (
        inter.select(id_col, "zone_id", F.col("clip_area").alias("inter_area"))
        .join(F.broadcast(zdf), "zone_id")
        .join(a, id_col)
    )


def overlay_union_pairs(
    images: DataFrame, zones_pdf: pd.DataFrame, id_col: str = "image_id"
) -> DataFrame:
    """|A ∪ B| per intersecting pair (gp 'union' overlay keeps one row
    per pair with both attribute sets; areas here —
    vectorgeoms/__init__.py:1350-1401)."""
    from pyspark.sql import functions as F

    return _pair_areas(images, zones_pdf, id_col).select(
        id_col, "zone_id",
        (F.col("a_area") + F.col("z_area") - F.col("inter_area")).alias("union_area"),
    )


def overlay_sym_difference_pairs(
    images: DataFrame, zones_pdf: pd.DataFrame, id_col: str = "image_id"
) -> DataFrame:
    """|A △ B| per intersecting pair (vectorgeoms/__init__.py:1241-1294)."""
    from pyspark.sql import functions as F

    return _pair_areas(images, zones_pdf, id_col).select(
        id_col, "zone_id",
        (F.col("a_area") + F.col("z_area") - 2 * F.col("inter_area")).alias("sym_diff_area"),
    )


def explode_multi_geoms(
    df: DataFrame, id_col: str = "zone_id", geom_col: str = "geometry"
) -> DataFrame:
    """Multi-part → single-part geometry explode (``explode_vec_lyr(s)``,
    vectorgeoms/__init__.py:1609-1674): one output row per member
    polygon with the part index, its WKB, and its exact shoelace area.
    A plain POLYGON passes through as part 0 (gp explode semantics).
    1→N mapInPandas UDTF — the same shape as the tiler."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, part int, part_wkb binary, part_area double"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, parts, wkbs, areas = [], [], [], []
            for rec in pdf.itertuples(index=False):
                gid = getattr(rec, id_col)
                for i, rings in enumerate(geom.wkb_to_parts(getattr(rec, geom_col))):
                    area = abs(ring_area(rings[0])) - sum(
                        abs(ring_area(r)) for r in rings[1:]
                    )
                    ids.append(gid)
                    parts.append(i)
                    wkbs.append(geom.polygon_to_wkb(rings))
                    areas.append(area)
            yield pd.DataFrame(
                {id_col: ids, "part": parts, "part_wkb": wkbs, "part_area": areas}
            )

    return df.select(id_col, geom_col).mapInPandas(_run, schema=schema)


def overlay_identity(
    images: DataFrame,
    zones_pdf: pd.DataFrame,
    id_col: str = "image_id",
    scale: int = 4,
) -> DataFrame:
    """IDENTITY overlay (``vec_lyr`` identity — gp.overlay(how='identity'),
    vectorgeoms/__init__.py:1295-1349): every piece of each input
    geometry, tagged with the identity layer's attributes where covered
    and null where not. Composition of the existing exact kernels:
    intersection parts (zone_id set, one row per overlapping pair) ∪
    difference parts (zone_id null, the uncovered rect decomposition).
    Areas are ×scale² integer-exact on the coordinate lattice, so an
    area-sum oracle closes over them without float slop."""
    from pyspark.sql import functions as F

    s2 = scale * scale
    inter = overlay_intersection(images, zones_pdf, id_col=id_col).select(
        id_col,
        "zone_id",
        F.round(F.col("clip_area") * F.lit(s2)).cast("long").alias("part_area_scaled"),
    )
    diff = overlay_difference(images, zones_pdf, id_col=id_col, scale=scale).select(
        id_col,
        F.lit(None).cast("long").alias("zone_id"),
        "part_area_scaled",
    )
    return inter.unionByName(diff)
