"""edge_filters_tiled: tiling must not change the edge-padded stencil
results — the halo gives interior crop pixels their true neighbours and
image-boundary pixels coincide with clipped tile boundaries, so tiled
output equals the whole-array filter bit-for-bit."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.kernels import focal as FK
from rsgislib_spark.kernels.bands import synth_band_grid
from rsgislib_spark.kernels.pixelmath import tile_windows_overlap_anchored


def _whole_image_sums(grid):
    gxs, gys = FK.sobel(grid)
    gxp, gyp = FK.prewitt(grid)
    lap = FK.laplacian(grid)
    return [int(np.abs(g).sum()) for g in (gxs, gys, gxp, gyp, lap)]


@pytest.mark.parametrize("w,h,tile", [
    (64, 64, 128),    # single tile (tile > image)
    (128, 192, 64),   # exact multiples
    (130, 67, 64),    # ragged remainders 2 and 3 (≤ overlap territory)
    (65, 64, 64),     # remainder 1 == overlap
])
def test_tiled_equals_whole_image(w, h, tile):
    grid = synth_band_grid(9973, w, h, "red")
    want = _whole_image_sums(grid)
    acc = [0] * 5
    for tx, ty, x0, y0, tw, th, ax0, ay0, aw, ah in (
        tile_windows_overlap_anchored(w, h, tile, tile, overlap=1)
    ):
        sub = grid[y0 : y0 + th, x0 : x0 + tw]
        iy0, ix0 = ay0 - y0, ax0 - x0
        crop = (slice(iy0, iy0 + ah), slice(ix0, ix0 + aw))
        gxs, gys = FK.sobel(sub)
        gxp, gyp = FK.prewitt(sub)
        lap = FK.laplacian(sub)
        for j, g in enumerate((gxs, gys, gxp, gyp, lap)):
            acc[j] += int(np.abs(g[crop]).sum())
    assert acc == want


def test_operator_output(spark):
    from rsgislib_spark.operators.focal import edge_filters_tiled

    images = spark.createDataFrame(
        pd.DataFrame({"image_key": [1, 2], "w": [64, 130], "h": [67, 64]})
    )
    out = edge_filters_tiled(images, tile=64).toPandas().set_index("image_key")
    for key, w, h in ((1, 64, 67), (2, 130, 64)):
        grid = synth_band_grid(key, w, h, "red")
        want = _whole_image_sums(grid)
        row = out.loc[key]
        assert row["n_px"] == w * h
        got = [
            int(row[c])
            for c in (
                "sum_abs_gx_sobel", "sum_abs_gy_sobel",
                "sum_abs_gx_prewitt", "sum_abs_gy_prewitt",
                "sum_abs_laplacian",
            )
        ]
        assert got == want
