"""Raster↔vector tiling: cut each decoded image into (overlapping) pixel
tiles, one output row per tile, assigned to grid cells.

Reproduces the reference's three tiling conventions exactly
(kernels.pixelmath):

 - ``simple``  — full tiles + partial remainder tiles
   (``imageutils/__init__.py:2614-2669``, create_tiles_multi_core)
 - ``overlap`` — C++ ``create_tiles`` overlap/offset expansion
   (``src/cmds/RSGISCmdImageUtils.cpp:262+``)
 - ``block``   — StdImgBlockIter full-size edge re-anchoring
   (``stdimgblockiter.py:214-286``)

The operator is the engine's UDTF shape (1 image row → N tile rows) via
``mapInPandas``; decode runs once per image inside the Arrow batch, tile
payloads are raw uint8 (lossless past this point). This is the Spark
replacement for the reference's tmp-file tile exchange
(``segmentation/tiledclump.py:134-224``) — the shuffle IS the filesystem.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rsgislib_spark.datagen import PIXEL_SIZE
from rsgislib_spark.kernels import cells, codecs, pixelmath
from rsgislib_spark.operators.footprints import DEFAULT_RES

TILE_SCHEMA = (
    "image_id string, tile_x int, tile_y int, x0 int, y0 int, "
    "tw int, th int, pixels binary, cell long"
)

_MODES = ("simple", "overlap", "block")


def tile_windows(mode: str, w: int, h: int, tile_w: int, tile_h: int,
                 overlap: int = 0, offset: bool = False) -> np.ndarray:
    if mode == "simple":
        return pixelmath.tile_windows_simple(w, h, tile_w, tile_h)
    if mode == "overlap":
        return pixelmath.tile_windows_overlap(w, h, tile_w, tile_h, overlap, offset)
    if mode == "block":
        return pixelmath.block_windows_anchored(w, h, tile_w)
    raise ValueError(f"mode must be one of {_MODES}")


def tile_images(
    images: DataFrame,
    tile_w: int = 64,
    tile_h: int = 64,
    mode: str = "simple",
    overlap: int = 0,
    offset: bool = False,
    res: int = DEFAULT_RES,
    pixel_size: float = PIXEL_SIZE,
) -> DataFrame:
    """images(image_id, bytes, w, h, fmt, minx, miny, ...) → tile rows.

    Cell assignment: the grid cell containing the tile's spatial center
    (image row 0 is the TOP of the footprint, GDAL convention).

    Tuning: transfer-bound BOTH ways (bytes in, tile payloads out) —
    set spark.sql.execution.arrow.maxRecordsPerBatch ≈ 64 for the
    session running it (measured 3.2× vs the default; see
    scripts/bench_decode.py and BENCH/BASELINE.md).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    src = images.select("image_id", "bytes", "w", "h", "fmt", "minx", "miny")

    def _tile(it):
        # mapInArrow both ways: binary payload columns never round-trip
        # through pandas object arrays (input decode views are zero-copy
        # Arrow buffer slices; output tile payloads go straight into an
        # Arrow binary array).
        import pyarrow as pa

        for b in it:
            if not b.num_rows:
                continue
            cols = {name: b.column(i) for i, name in enumerate(b.schema.names)}
            ids = cols["image_id"].to_pylist()
            ws = cols["w"].to_numpy(zero_copy_only=False)
            hs = cols["h"].to_numpy(zero_copy_only=False)
            minxs = cols["minx"].to_numpy(zero_copy_only=False)
            minys = cols["miny"].to_numpy(zero_copy_only=False)
            fmts = cols["fmt"].to_pylist()
            views = codecs.arrow_binary_views(cols["bytes"])
            out = {k: [] for k in
                   ("image_id", "tile_x", "tile_y", "x0", "y0", "tw", "th", "pixels", "cell")}
            for r in range(b.num_rows):
                w, h = int(ws[r]), int(hs[r])
                img = codecs.decode_image(views[r], fmts[r], h, w)
                wins = tile_windows(mode, w, h, tile_w, tile_h, overlap, offset)
                maxy = minys[r] + h * pixel_size
                cx = minxs[r] + (wins[:, 2] + wins[:, 4] / 2.0) * pixel_size
                cy = maxy - (wins[:, 3] + wins[:, 5] / 2.0) * pixel_size
                cc = cells.encode_point(cx, cy, res)
                for k, (tx, ty, x0, y0, tw, th) in enumerate(wins):
                    out["image_id"].append(ids[r])
                    out["tile_x"].append(int(tx))
                    out["tile_y"].append(int(ty))
                    out["x0"].append(int(x0))
                    out["y0"].append(int(y0))
                    out["tw"].append(int(tw))
                    out["th"].append(int(th))
                    out["pixels"].append(
                        np.ascontiguousarray(img[y0 : y0 + th, x0 : x0 + tw]).tobytes()
                    )
                    out["cell"].append(int(cc[k]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["image_id"], pa.string()),
                    pa.array(out["tile_x"], pa.int32()),
                    pa.array(out["tile_y"], pa.int32()),
                    pa.array(out["x0"], pa.int32()),
                    pa.array(out["y0"], pa.int32()),
                    pa.array(out["tw"], pa.int32()),
                    pa.array(out["th"], pa.int32()),
                    pa.array(out["pixels"], pa.binary()),
                    pa.array(out["cell"], pa.int64()),
                ],
                names=["image_id", "tile_x", "tile_y", "x0", "y0",
                       "tw", "th", "pixels", "cell"],
            )

    return src.mapInArrow(_tile, schema=TILE_SCHEMA)


def tile_manifest(tiles: DataFrame) -> DataFrame:
    """Per-image tile counts + payload bytes — the lineage/manifest row
    source (see operators.manifest for the resumable writer)."""
    from pyspark.sql import functions as F

    return tiles.groupBy("image_id").agg(
        F.count("*").alias("n_tiles"),
        F.sum(F.length("pixels")).alias("payload_bytes"),
        F.min("cell").alias("min_cell"),
        F.max("cell").alias("max_cell"),
    )


def tile_batches(
    images: DataFrame,
    block: int = 64,
    batch_size: int = 32,
) -> DataFrame:
    """Batch-of-blocks iterator for DL inference — the Spark shape of
    ``StdImgBlockIterBatches`` (imageutils/stdimgblockiterbatches.py):
    decode → FULL-SIZE anchored blocks (the iterator's edge re-anchor
    rule, kernels.pixelmath.block_windows_anchored) → fixed-size batches
    of stacked uint8 tensors, batched WITHIN each partition (no shuffle;
    a model predict step maps over these rows and joins results back on
    the exploded (image_id, x_block, y_block) list).

    Output rows: (batch_id string, n int, tensor binary [n·th·tw bytes,
    C-order], image_ids array<string>, xs array<int>, ys array<int>).
    The trailing batch of a partition may hold fewer than batch_size
    blocks — exactly like the reference's last yield.
    """
    from pyspark import TaskContext

    from rsgislib_spark.kernels.pixelmath import block_windows_anchored

    src = images.select("image_id", "bytes", "w", "h", "fmt")
    schema = (
        "batch_id string, n int, tensor binary, image_ids array<string>, "
        "xs array<int>, ys array<int>"
    )

    def _run(it):
        # mapInArrow + zero-copy payload views per the repo's
        # Arrow-boundary rule for binary columns (4.4× on the decode
        # bench); tensors leave as one pandas-free RecordBatch per
        # Arrow input batch.
        import pyarrow as pa

        from rsgislib_spark.operators.zonal import _batch_cols

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        buf_t, buf_id, buf_x, buf_y = [], [], [], []
        seq = 0
        rows = []

        def flush():
            nonlocal seq, buf_t, buf_id, buf_x, buf_y
            if not buf_t:
                return
            tensor = np.stack(buf_t).astype(np.uint8)
            rows.append(
                (f"p{pid}_b{seq}", len(buf_t), tensor.tobytes(),
                 list(buf_id), [int(v) for v in buf_x], [int(v) for v in buf_y])
            )
            seq += 1
            buf_t, buf_id, buf_x, buf_y = [], [], [], []

        for b in it:
            if not b.num_rows:
                continue
            ids, views, ws, hs, fmts = _batch_cols(
                b, "image_id", "bytes", "w", "h", "fmt"
            )
            for k in range(b.num_rows):
                w, h = int(ws[k]), int(hs[k])
                if w < block or h < block:
                    continue  # reference iterator requires block ≤ image
                img = codecs.decode_image(views[k], fmts[k], h, w)
                for xb, yb, x0, y0, tw, th in block_windows_anchored(w, h, block):
                    buf_t.append(img[y0 : y0 + th, x0 : x0 + tw])
                    buf_id.append(ids[k])
                    buf_x.append(xb)
                    buf_y.append(yb)
                    if len(buf_t) >= batch_size:
                        flush()
        flush()
        if rows:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.string()),
                    pa.array([r[1] for r in rows], pa.int32()),
                    pa.array([r[2] for r in rows], pa.binary()),
                    pa.array([r[3] for r in rows], pa.list_(pa.string())),
                    pa.array([r[4] for r in rows], pa.list_(pa.int32())),
                    pa.array([r[5] for r in rows], pa.list_(pa.int32())),
                ],
                names=["batch_id", "n", "tensor", "image_ids", "xs", "ys"],
            )

    return src.mapInArrow(_run, schema=schema)
