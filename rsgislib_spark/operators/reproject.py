"""Reprojection operators: footprint / point CRS transforms and
resample-to-match — the Spark face of the reference's warp surface.

Ref parity targets:
 - ``reproject_image`` / ``resample_img_to_match``
   (python/rsgislib/imageutils/__init__.py:2104-2450) — here an image's
   *footprint* reprojects via the CRS kernel and its *pixels* resample
   via kernels.resample inside mapInPandas;
 - ``reproj_vector_layer`` (python/rsgislib/vectorutils/__init__.py:779-1059)
   and point reproject (tools/geometrytools.py:541-591) — vectorized
   column transforms.

All math is the pure-numpy kernels.crs registry (4326 / 3857 / UTM);
everything runs as Arrow-batched pandas UDFs — no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rsgislib_spark.kernels import crs


def reproject_points(
    df: DataFrame,
    src_epsg: int,
    dst_epsg: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Transform point coordinate columns in place (same schema out)."""
    cols = df.columns
    schema = df.schema

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                tx, ty = crs.transform(
                    src_epsg, dst_epsg,
                    pdf[x_col].to_numpy(np.float64),
                    pdf[y_col].to_numpy(np.float64),
                )
                pdf = pdf.copy()
                pdf[x_col] = tx
                pdf[y_col] = ty
            yield pdf[cols]

    return df.mapInPandas(_run, schema=schema)


def reproject_footprints(
    df: DataFrame,
    src_epsg: int,
    dst_epsg: int,
    bbox_cols: tuple = ("minx", "miny", "maxx", "maxy"),
) -> DataFrame:
    """Reproject bbox columns: new bbox = envelope of the 4 transformed
    corners (same convention the reference applies when warping layer
    extents). Schema is preserved."""
    cols = df.columns
    schema = df.schema
    cminx, cminy, cmaxx, cmaxy = bbox_cols

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                nx0, ny0, nx1, ny1 = crs.transform_bbox(
                    src_epsg, dst_epsg,
                    pdf[cminx].to_numpy(np.float64),
                    pdf[cminy].to_numpy(np.float64),
                    pdf[cmaxx].to_numpy(np.float64),
                    pdf[cmaxy].to_numpy(np.float64),
                )
                pdf = pdf.copy()
                pdf[cminx], pdf[cminy] = nx0, ny0
                pdf[cmaxx], pdf[cmaxy] = nx1, ny1
            yield pdf[cols]

    return df.mapInPandas(_run, schema=schema)
