"""Spatial join: image footprints × zone polygons.

Reimplements ``rsgislib.vectorutils.perform_spatial_join`` semantics
(``python/rsgislib/vectorutils/__init__.py:2159-2225``):
``join_how ∈ {inner, left, right}`` × ``join_op ∈ {intersects, within,
contains}``, one output row per matching pair (geopandas sjoin
multiplicity), base attributes retained.

Two physical strategies, same semantics:

 - :func:`spatial_join_broadcast` — the zone side is broadcast as a
   pickled ZoneIndex (STR bbox tree + rings). A single ``mapInPandas``
   pass over the images computes candidate pairs (tree query) and the
   exact predicate (vectorized rect×polygon kernels) with ZERO shuffle
   of the big side. This is the 100 TB path whenever zones fit on an
   executor (they do by design — the reference's zone side is a small
   vector layer).

 - :func:`spatial_join_cells` — both sides exploded to covering grid
   cells, cell equi-join (Catalyst sort-merge/shuffle-hash with AQE),
   exact refine afterwards, then pair-dedup. The scale-out path when the
   zone side is itself huge.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from rsgislib_spark.kernels import geom
from rsgislib_spark.kernels.strtree import STRtree
from rsgislib_spark.operators.footprints import DEFAULT_RES, explode_footprint_cells

JOIN_OPS = ("intersects", "within", "contains")
JOIN_HOWS = ("inner", "left", "right")

#: Driver fence for the broadcast zone side: 500k polygons × ~1 KB WKB
#: ≈ 0.5 GB on the driver — above that the zone side is no longer
#: "small by construction" (SURVEY §1.1) and must go through the cells
#: path with the zone explode run as a DataFrame op.
MAX_BROADCAST_ZONES = 500_000


def _fenced_zones_pdf(zones_slim: DataFrame) -> pd.DataFrame:
    from rsgislib_spark.qcommon import fenced_small_pdf

    return fenced_small_pdf(
        zones_slim,
        "spatial_join broadcast zone index",
        "Use spatial_join_cells (both-sides-large path) instead.",
        max_rows=MAX_BROADCAST_ZONES,
    )


class ZoneIndex:
    """Broadcastable zone-polygon index: STR bbox tree + decoded rings."""

    def __init__(self, zone_ids: np.ndarray, wkbs: list):
        self.zone_ids = np.asarray(zone_ids, dtype=np.int64)
        self.rings = [geom.wkb_to_polygon(w) for w in wkbs]
        self.bboxes = np.array([geom.polygon_bbox(r) for r in self.rings]).reshape(-1, 4)
        self.tree = STRtree(self.bboxes)

    @classmethod
    def from_pandas(cls, zones_pdf: pd.DataFrame) -> "ZoneIndex":
        return cls(zones_pdf["zone_id"].to_numpy(), list(zones_pdf["geometry"]))

    def match(self, rects: np.ndarray, join_op: str):
        """(rect_idx, zone_pos) arrays of exact predicate matches.

        Candidates are grouped per zone by argsort + segment slicing —
        O(P log P) in the pair count P, NOT O(|zones|·P) boolean masks
        (the mask formulation was >80% of the north-star match cost)."""
        if join_op not in JOIN_OPS:
            raise ValueError(f"join_op must be one of {JOIN_OPS}")
        qi, zi = self.tree.query(rects)
        if len(qi) == 0:
            return qi, zi
        order = np.argsort(zi, kind="stable")
        qs, zs = qi[order], zi[order]
        starts = np.flatnonzero(np.r_[True, zs[1:] != zs[:-1]])
        ends = np.r_[starts[1:], len(zs)]
        keep = np.zeros(len(qs), dtype=bool)
        for a, b in zip(starts, ends):
            z = int(zs[a])
            sub = rects[qs[a:b]]
            if join_op == "intersects":
                ok = geom.rect_intersects_polygon(sub, self.rings[z])
            elif join_op == "within":
                ok = geom.rect_within_polygon(sub, self.rings[z])
            else:  # contains: image rect ⊇ zone polygon
                ok = geom.rect_contains_polygon(sub, self.rings[z])
            keep[a:b] = ok
        return qs[keep], zs[keep]


def _pairs_df(images: DataFrame, zindex_b, join_op: str, id_col: str) -> DataFrame:
    """Inner pair list (id_col, zone_id) via broadcast index.

    A THIN input (fewer scan partitions than cores — e.g. one small
    parquet file) would run the whole match kernel on 1-2 tasks; the
    skinny (id, bbox) projection is repartitioned up to the default
    parallelism first. The shuffled rows are ~40 bytes each, so this
    costs microseconds per thousand images and buys full-width refine."""
    from rsgislib_spark.qcommon import widen

    slim = widen(images.select(id_col, "minx", "miny", "maxx", "maxy"))
    id_type = dict(images.dtypes)[id_col]
    schema = f"{id_col} {id_type}, zone_id long"

    def _match(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zx: ZoneIndex = zindex_b.value
        for pdf in it:
            if not len(pdf):
                continue
            rects = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(dtype=np.float64)
            qi, zi = zx.match(rects, join_op)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[qi], "zone_id": zx.zone_ids[zi]}
            )

    return slim.mapInPandas(_match, schema=schema)


def spatial_join_broadcast(
    images: DataFrame,
    zones: DataFrame,
    join_op: str = "intersects",
    join_how: str = "inner",
    id_col: str = "image_id",
) -> DataFrame:
    """Spatial join with the zone side broadcast (primary strategy).

    Output columns: all image columns + ``zone_id`` + zone attribute
    columns (minus zone geometry/bbox). ``left``/``right`` keep unmatched
    rows of the respective side with nulls, mirroring geopandas sjoin via
    the reference's join_how validation (vectorutils/__init__.py:2196-2207).
    """
    if join_how not in JOIN_HOWS:
        raise ValueError(f"join_how must be one of {JOIN_HOWS}")
    if join_op not in JOIN_OPS:
        raise ValueError(f"join_op must be one of {JOIN_OPS}")
    spark = images.sparkSession
    zones_pdf = _fenced_zones_pdf(zones.select("zone_id", "geometry"))
    zindex_b = spark.sparkContext.broadcast(ZoneIndex.from_pandas(zones_pdf))

    pairs = _pairs_df(images, zindex_b, join_op, id_col)
    zone_attrs = zones.drop("geometry", "minx", "miny", "maxx", "maxy")

    if join_how == "inner":
        out = images.join(pairs, id_col, "inner").join(
            F.broadcast(zone_attrs), "zone_id", "inner"
        )
    elif join_how == "left":
        out = images.join(pairs, id_col, "left").join(
            F.broadcast(zone_attrs), "zone_id", "left"
        )
    else:  # right: every zone at least once
        out = (
            images.join(pairs, id_col, "inner")
            .join(F.broadcast(zone_attrs), "zone_id", "right")
        )
    return out


def spatial_join_cells(
    images: DataFrame,
    zones: DataFrame,
    join_op: str = "intersects",
    res: int = DEFAULT_RES,
    id_col: str = "image_id",
    join_how: str = "inner",
) -> DataFrame:
    """Cell equi-join + exact refine — both sides large. Returns the
    PAIR LIST (id_col, zone_id); callers attach payloads/attrs by
    equi-join afterwards (no broadcast — the point of this path).

    images exploded to covering cells; zones exploded to covering cells
    (driver-side, zone count small — if zones were huge this explode runs
    as a DataFrame op too); equi-join on cell; exact predicate refine in a
    vectorized kernel; duplicate pairs (image spanning k cells) removed
    with ``dropDuplicates`` BEFORE attaching payloads.

    ``join_how`` mirrors the reference's full inner/left/right surface
    (vectorutils/__init__.py:2159-2225) on this path too: ``left``
    preserves unmatched images (null zone_id) via an anti-join of the
    image ids against the refined pairs — one extra shuffle on the
    16-byte id key, no broadcast; ``right`` preserves unmatched zones
    (null id) symmetrically. A huge×huge LEFT spatial join is a real
    shape at 100 TB (every image row must survive into the tiling
    stage whether or not a zone claims it).
    """
    if join_how not in JOIN_HOWS:
        raise ValueError(f"join_how must be one of {JOIN_HOWS}")
    spark = images.sparkSession
    img_cells = explode_footprint_cells(images, res=res, id_col=id_col)

    zones_pdf = _fenced_zones_pdf(
        zones.select("zone_id", "geometry", "minx", "miny", "maxx", "maxy")
    )
    from rsgislib_spark.kernels import cells as cellmod

    ridx, cc = cellmod.cells_covering_bbox(
        zones_pdf["minx"].to_numpy(), zones_pdf["miny"].to_numpy(),
        zones_pdf["maxx"].to_numpy(), zones_pdf["maxy"].to_numpy(), res,
    )
    zcells = pd.DataFrame(
        {"zone_id": zones_pdf["zone_id"].to_numpy()[ridx], "cell": cc}
    )
    zcells_df = spark.createDataFrame(zcells)
    zindex_b = spark.sparkContext.broadcast(ZoneIndex.from_pandas(zones_pdf))

    cand = img_cells.join(F.broadcast(zcells_df), "cell", "inner").select(
        id_col, "zone_id", "minx", "miny", "maxx", "maxy"
    ).dropDuplicates([id_col, "zone_id"])

    id_type = dict(images.dtypes)[id_col]
    schema = f"{id_col} {id_type}, zone_id long"

    def _refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zx: ZoneIndex = zindex_b.value
        pos = {int(z): i for i, z in enumerate(zx.zone_ids)}
        for pdf in it:
            if not len(pdf):
                continue
            rects = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(dtype=np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            for z, grp in pdf.groupby("zone_id"):
                rows = grp.index.to_numpy()
                loc = pdf.index.get_indexer(rows)
                sub = rects[loc]
                rings = zx.rings[pos[int(z)]]
                if join_op == "intersects":
                    ok = geom.rect_intersects_polygon(sub, rings)
                elif join_op == "within":
                    ok = geom.rect_within_polygon(sub, rings)
                else:
                    ok = geom.rect_contains_polygon(sub, rings)
                keep[loc] = ok
            out = pdf.loc[keep, [id_col, "zone_id"]]
            yield out

    pairs = cand.mapInPandas(_refine, schema=schema)
    if join_how == "inner":
        return pairs
    id_type = dict(images.dtypes)[id_col]
    if join_how == "left":
        unmatched = (
            images.select(id_col)
            .join(pairs.select(id_col), id_col, "left_anti")
            .withColumn("zone_id", F.lit(None).cast("long"))
        )
        return pairs.unionByName(unmatched)
    # right: every zone at least once
    unmatched_z = (
        zones.select("zone_id")
        .join(pairs.select("zone_id"), "zone_id", "left_anti")
        .withColumn(id_col, F.lit(None).cast(id_type))
        .select(id_col, "zone_id")
    )
    return pairs.unionByName(unmatched_z)


def spatial_select(
    images: DataFrame, zones: DataFrame, join_op: str = "intersects",
    id_col: str = "image_id",
) -> DataFrame:
    """Semi-join: images matching ANY zone — reference ``spatial_select``
    (vectorutils/__init__.py:2565-2610). left_semi keeps image columns only."""
    pairs = spatial_join_broadcast(
        images.select(id_col, "minx", "miny", "maxx", "maxy"),
        zones, join_op=join_op, join_how="inner", id_col=id_col,
    ).select(id_col).distinct()
    return images.join(pairs, id_col, "left_semi")


# ---------------------------------------------- boolean layer predicates

def layer_predicate(
    images: DataFrame, zones: DataFrame, join_op: str = "intersects",
    id_col: str = "image_id",
) -> bool:
    """True iff ANY feature of ``images`` <join_op> ANY feature of
    ``zones`` — the boolean layer predicates ``vec_intersects_vec`` /
    ``vec_within_vec`` / ``vec_contains_vec``
    (vectorgeoms/__init__.py:2541-2952). Plan: broadcast-index pair
    generation + ``isEmpty`` on the pair stream — Spark's collect-limit
    stops at the first surviving pair, so a hit on an early partition
    never scans the rest."""
    spark = images.sparkSession
    zones_pdf = _fenced_zones_pdf(zones.select("zone_id", "geometry"))
    zindex_b = spark.sparkContext.broadcast(ZoneIndex.from_pandas(zones_pdf))
    return not _pairs_df(images, zindex_b, join_op, id_col).isEmpty()


def vec_intersects_vec(images: DataFrame, zones: DataFrame, id_col: str = "image_id") -> bool:
    """Any image intersects any zone (vectorgeoms/__init__.py:2541-...)."""
    return layer_predicate(images, zones, "intersects", id_col)


def vec_within_vec(images: DataFrame, zones: DataFrame, id_col: str = "image_id") -> bool:
    """Any image lies within any zone."""
    return layer_predicate(images, zones, "within", id_col)


def vec_contains_vec(images: DataFrame, zones: DataFrame, id_col: str = "image_id") -> bool:
    """Any image contains any zone."""
    return layer_predicate(images, zones, "contains", id_col)


def vec_overlaps_vec(images: DataFrame, zones: DataFrame, id_col: str = "image_id") -> bool:
    """Any pair overlaps: intersects but neither side contains the other
    (DE-9IM overlaps, assuming interiors meet when the closed rects do —
    exact on the catalog's tie-free lattices, where boundary-only
    contact cannot occur; touches/crosses remain out of scope for the
    rectilinear kernels and should use a full geometry library)."""
    spark = images.sparkSession
    zones_pdf = _fenced_zones_pdf(zones.select("zone_id", "geometry"))
    zindex_b = spark.sparkContext.broadcast(ZoneIndex.from_pandas(zones_pdf))
    pi = _pairs_df(images, zindex_b, "intersects", id_col)
    pw = _pairs_df(images, zindex_b, "within", id_col)
    pc = _pairs_df(images, zindex_b, "contains", id_col)
    return not pi.join(
        pw.unionByName(pc).distinct(), [id_col, "zone_id"], "left_anti"
    ).isEmpty()
