"""Geometry-output overlay join — vectorgeoms intersection / clip_vec_lyr
(vectorgeoms/__init__.py:1137-1188, :2477-2511): each intersecting
(image, zone) pair yields the CLIPPED zone geometry (WKB) plus its exact
area, not just a match flag.

Plan shape: broadcast ZoneIndex candidates (bbox tree) → per-pair
Sutherland–Hodgman clip in the kernel → rows (id, zone_id, wkb, area).
The per-pair python cost is bounded by the candidate count, which the
tree keeps proportional to true overlaps.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rsgislib_spark.kernels import geom
from rsgislib_spark.kernels.clip import clip_polygon_to_rect
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
