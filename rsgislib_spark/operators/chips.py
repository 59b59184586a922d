"""Point-centred training-chip extraction — the DL sample workflow.

Reference: zonalstats chip extraction (get_img_chips_for_samples /
extract chips around mask pixels, zonalstats/__init__.py:1674-1904):
N × chip × chip sample tensors around sample locations.

Spark shape: points are the SMALL side — broadcast (pt_id, x, y); one
pass over the image table emits chip rows (1→N UDTF via mapInPandas).
Chips are ALWAYS full chip_size² — edge chips re-anchor inside the
image (the square-block iterator convention, kernels/pixelmath), which
is also what keeps every chip usable as a fixed-shape training sample.
Pixel lookup uses the plain floor offset convention
(zonalstats:1536-1558).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rsgislib_spark.datagen import PIXEL_SIZE
#: Driver fence for the broadcast side (fenced_small_pdf) — patchable in tests.
MAX_BROADCAST_POINTS = 5_000_000



def extract_chips(
    images: DataFrame,
    points: DataFrame,
    chip_size: int = 8,
    band: str = "red",
    pixel_size: float = PIXEL_SIZE,
    with_pixels: bool = False,
) -> DataFrame:
    """Chip rows for every (covering image, point) pair: pt_id,
    image_key, x0, y0 (anchored top-left pixel), chip_sum, and — with
    ``with_pixels`` — the flattened chip values. images must carry
    image_key/w/h/minx/miny (the synthetic-lattice table)."""
    from rsgislib_spark.kernels import bands as BK

    spark = images.sparkSession
    from rsgislib_spark.qcommon import fenced_small_pdf

    pts_pdf = fenced_small_pdf(
        points.select("pt_id", "x", "y"),
        "chip extraction broadcast point set",
        "Cell-bucket the points and join on the image cell key instead.",
        max_rows=MAX_BROADCAST_POINTS,
    )
    pts_b = spark.sparkContext.broadcast(
        (
            pts_pdf["pt_id"].to_numpy(np.int64),
            pts_pdf["x"].to_numpy(np.float64),
            pts_pdf["y"].to_numpy(np.float64),
        )
    )
    cs = int(chip_size)
    cols = "pt_id long, image_key long, x0 long, y0 long, chip_sum long"
    if with_pixels:
        cols += ", chip array<long>"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid, px, py = pts_b.value
        for pdf in it:
            outs = []
            for rec in pdf.itertuples(index=False):
                k, w, h = int(rec.image_key), int(rec.w), int(rec.h)
                maxx = rec.minx + w * pixel_size
                maxy = rec.miny + h * pixel_size
                cand = (px >= rec.minx) & (px < maxx) & (py > rec.miny) & (py <= maxy)
                if not cand.any():
                    continue
                if w < cs or h < cs:
                    # np.clip's upper bound (w - cs) would go negative and
                    # the Python slice would silently wrap — fail loudly,
                    # but only when a point actually anchors here: an
                    # undersized image no point falls in is a no-op, not
                    # a reason to kill the whole job.
                    raise ValueError(
                        f"image {k} is {w}x{h}, smaller than chip_size={cs}; "
                        "full-size chips cannot be anchored inside it"
                    )
                ix = np.floor((px[cand] - rec.minx) / pixel_size).astype(np.int64)
                iy = np.floor((maxy - py[cand]) / pixel_size).astype(np.int64)
                x0 = np.clip(ix - cs // 2, 0, w - cs)
                y0 = np.clip(iy - cs // 2, 0, h - cs)
                grid = BK.synth_band_grid(k, w, h, band)
                rows = []
                for p, xa, ya in zip(pid[cand], x0, y0):
                    chip = grid[ya : ya + cs, xa : xa + cs]
                    row = {
                        "pt_id": int(p), "image_key": k,
                        "x0": int(xa), "y0": int(ya),
                        "chip_sum": int(chip.sum()),
                    }
                    if with_pixels:
                        row["chip"] = chip.ravel().tolist()
                    rows.append(row)
                outs.append(pd.DataFrame(rows))
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    columns=["pt_id", "image_key", "x0", "y0", "chip_sum"]
                    + (["chip"] if with_pixels else [])
                )
            )

    return images.select("image_key", "w", "h", "minx", "miny").mapInPandas(
        _run, schema=cols
    )
