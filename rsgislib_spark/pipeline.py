"""The north-star pipeline: spatial-join + tiling over the image table,
end to end — the job the BASELINE.json metric (images/sec, N→4N scaling
efficiency ≥ 0.8) is measured on.

Stages (all DataFrame-declarative; Catalyst plans them):
 1. footprints    — derive (minx,miny,maxx,maxy) per image; column exprs
 2. spatial join  — images × zone polygons, broadcast STRtree refine
                    (perform_spatial_join semantics, vectorutils:2159-2225);
                    zero shuffle of the image side
 3. tiling + tile kernels — cut each image into fixed tiles + remainders
                    (create_tiles semantics, imageutils.cpp:2061-2093) with
                    the per-pixel compute fused in: band synthesis, focal
                    sum/count (integral image), per-tile block reductions
                    via ufunc.reduceat — one whole-image numpy pass, no
                    per-tile Python loop, no pixel payload shuffle
 4. zonal rollup  — per-zone aggregation of tile stats through the join
                    (populate_rat_with_stats, rastergis.cpp:1740-1766)

Scale design: the image side partitions by range on image_key (uniform);
the zone side broadcasts (small by construction). The only shuffles move
per-image/per-tile STATS rows (9 small columns), never pixels. Driver
work is O(|zones|) pandas — no extra Spark jobs before the main one.

``replicate=R`` multiplies the image side R× with distinct keys (pixel
content differs per replica) — the sandbox stand-in for the 10^12-row
table when measuring scaling, since fixed planning cost must be amortized
exactly as it is on a real cluster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from rsgislib_spark.kernels import geom

TILE = 96


# ------------------------------------------------------------ zone prep

def load_zones_pdf(sf_dir: str) -> pd.DataFrame:
    """Zone rectangles (GEO_ZONES derivation, queries.py) built directly
    from the supplier parquet with pandas — keeps driver-side prep off
    the Spark scheduler (it was a measurable fixed cost per job)."""
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])[
        "s_suppkey"
    ].to_numpy(np.int64)
    zminx = np.where(s % 10 == 0, 45000 + (s % 7) * 100, (s * 7919) % 90000).astype(
        np.float64
    ) + 0.25
    zminy = np.where(
        s % 10 == 0, 45000 + ((s * 3) % 7) * 100, (s * 104729) % 90000
    ).astype(np.float64) + 0.25
    zw = 2000 + (s % 12) * 1500
    zh = 2000 + ((s * 5) % 12) * 1500
    zmaxx = zminx + zw
    zmaxy = zminy + zh
    wkbs = [
        geom.polygon_to_wkb(
            [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])]
        )
        for x0, y0, x1, y1 in zip(zminx, zminy, zmaxx, zmaxy)
    ]
    return pd.DataFrame({"zone_id": s, "geometry": wkbs})


# ------------------------------------------------------ image derivation

def images_df(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Footprint columns from the part table (GEO_IMAGES derivation) as
    pure column expressions — pushdown-friendly, codegen'd."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey")
    k = F.col("p_partkey")
    minx = F.when(k % 5 == 0, 50000 + (k % 97) * 10).otherwise((k * 9973) % 99000)
    miny = F.when(k % 5 == 0, 50000 + ((k * 3) % 97) * 10).otherwise((k * 6151) % 99000)
    w = (64 + (k % 4) * 64).cast("int")
    h = (64 + ((k * 7) % 4) * 64).cast("int")
    d = p.select(
        k.alias("base_key"),
        minx.cast("double").alias("minx"),
        miny.cast("double").alias("miny"),
        (minx + w * 10).cast("double").alias("maxx"),
        (miny + h * 10).cast("double").alias("maxy"),
        w.alias("w"),
        h.alias("h"),
    )
    if replicate > 1:
        d = d.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
    else:
        d = d.withColumn("rep", F.lit(0))
    return d.select(
        (F.col("base_key") * replicate + F.col("rep")).alias("image_key"),
        "minx", "miny", "maxx", "maxy", "w", "h",
    )


# ------------------------------------------------------- fused tile stage

CHUNK = 8  # images per kernel invocation: keeps int16 temporaries (~2·h·w·2B·CHUNK)
# inside per-core L2 so the kernel stays cache-resident — at CHUNK=64 the
# arrays stream DRAM and the 32-core node hits its bandwidth ceiling
# (measured: aggregate throughput capped ~1.7x from 8→32 cores)


def lattice_grid(keys: np.ndarray, w: int, h: int) -> np.ndarray:
    """The synthetic band grid (image_key·7 + x·13 + y·17) mod 251 for a
    chunk of same-shape images, as (m, h, w) uint8. The per-pixel modulo
    is replaced by a conditional subtract: both addends are pre-reduced
    mod 251, so their sum is < 502 and one masked subtract restores the
    residue — 2× faster than int16 ``%`` (integer division) per pixel.

    The x·13 + y·17 products are formed in int32 (w·13 + h·17 would wrap
    int16 negative from w,h ≈ 2521, and the ``%`` of the wrapped value is
    a silently wrong residue); the reduced xym fits int16 for the
    subsequent chunk arrays."""
    xym = (
        (
            (np.arange(w, dtype=np.int32) * 13)
            + (np.arange(h, dtype=np.int32) * 17)[:, None]
        )
        % 251
    ).astype(np.int16)
    k7 = ((keys.astype(np.int64) * 7) % 251).astype(np.int16)
    g = k7[:, None, None] + xym
    np.subtract(g, 251, out=g, where=g >= 251)
    return g.astype(np.uint8)


def _tile_stats_chunk(keys: np.ndarray, w: int, h: int, tile: int, radius: int):
    """Per-tile stats for a CHUNK of same-shape images in one 3-D numpy
    pass. int32 throughout (values bounded: pixel < 251, tile sum <
    251·96² < 2³¹, focal window sum < 251·9) — halves memory traffic vs
    int64, which is what bounds this kernel on a full node."""
    m = len(keys)
    grid = lattice_grid(keys, w, h)  # (m, h, w)

    y0 = np.clip(np.arange(h) - radius, 0, h)
    y1 = np.clip(np.arange(h) + radius + 1, 0, h)
    x0 = np.clip(np.arange(w) - radius, 0, w)
    x1 = np.clip(np.arange(w) + radius + 1, 0, w)
    if radius == 1 and h >= 3 and w >= 3:
        # separable 3-term box sums, edges as 2-term sums (the clipped-
        # window rule); int16 partials, no pad copies — this kernel is
        # memory-bandwidth bound on a full node, so every byte/px counts
        row = np.empty((m, h, w), dtype=np.int16)
        g16 = grid.astype(np.int16)  # one widened copy reused 3×
        np.add(g16[:, :, :-2], g16[:, :, 1:-1], out=row[:, :, 1:-1])
        np.add(row[:, :, 1:-1], g16[:, :, 2:], out=row[:, :, 1:-1])
        np.add(g16[:, :, 0], g16[:, :, 1], out=row[:, :, 0])
        np.add(g16[:, :, -2], g16[:, :, -1], out=row[:, :, -1])
        fs = np.empty((m, h, w), dtype=np.int16)
        np.add(row[:, :-2], row[:, 1:-1], out=fs[:, 1:-1])
        np.add(fs[:, 1:-1], row[:, 2:], out=fs[:, 1:-1])
        np.add(row[:, 0], row[:, 1], out=fs[:, 0])
        np.add(row[:, -2], row[:, -1], out=fs[:, -1])
    else:
        s = np.zeros((m, h + 1, w + 1), dtype=np.int32)
        np.cumsum(np.cumsum(grid, axis=1, dtype=np.int32), axis=2, out=s[:, 1:, 1:])
        Y0, X0 = np.ix_(y0, x0)
        Y1, X1 = np.ix_(y1, x1)
        fs = s[:, Y1, X1] - s[:, Y0, X1] - s[:, Y1, X0] + s[:, Y0, X0]
    fc2d = np.outer(y1 - y0, x1 - x0).astype(np.int64)

    xs = np.arange(0, w, tile)
    ys = np.arange(0, h, tile)

    def blocks(a, uf=np.add):
        # accumulate in int64 WITHOUT materializing a widened copy
        dt = np.int64 if uf is np.add else None
        return uf.reduceat(uf.reduceat(a, ys, axis=1, dtype=dt), xs, axis=2, dtype=dt)

    tw = np.diff(np.append(xs, w))
    th = np.diff(np.append(ys, h))
    ntx, nty = len(xs), len(ys)
    txg, tyg = np.meshgrid(np.arange(ntx, dtype=np.int32) + 1,
                           np.arange(nty, dtype=np.int32) + 1)
    nt = ntx * nty
    fcnt2d = np.add.reduceat(np.add.reduceat(fc2d, ys, axis=0), xs, axis=1)
    return {
        "image_key": np.repeat(keys, nt),
        "tile_x": np.tile(txg.ravel(), m),
        "tile_y": np.tile(tyg.ravel(), m),
        "n_px": np.tile(np.outer(th, tw).ravel().astype(np.int64), m),
        "sum_v": blocks(grid).reshape(-1).astype(np.int64),
        "min_v": blocks(grid, np.minimum).reshape(-1).astype(np.int64),
        "max_v": blocks(grid, np.maximum).reshape(-1).astype(np.int64),
        "focal_sum": blocks(fs).reshape(-1).astype(np.int64),
        "focal_cnt": np.tile(fcnt2d.ravel(), m),
    }


def tile_stats_df(images: DataFrame, tile: int = TILE, radius: int = 1) -> DataFrame:
    """Stage 3: tiler UDTF with pixel kernels fused. Images are grouped by
    shape and processed CHUNK at a time in a single 3-D numpy pass:
    synth band grid → integral-image focal sums → per-tile block
    reductions with ``ufunc.reduceat`` at the tile boundaries (full +
    remainder tiles, create_tiles semantics). Emits per-tile stats rows
    only — pixels never leave the task."""

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            keys_all = pdf["image_key"].to_numpy(np.int64)
            ws = pdf["w"].to_numpy(np.int32)
            hs = pdf["h"].to_numpy(np.int32)
            frames = []
            order = np.lexsort((keys_all, hs, ws))
            i = 0
            while i < len(order):
                w, h = int(ws[order[i]]), int(hs[order[i]])
                j = i
                while j < len(order) and ws[order[j]] == w and hs[order[j]] == h:
                    j += 1
                grp = keys_all[order[i:j]]
                for c0 in range(0, len(grp), CHUNK):
                    frames.append(
                        pd.DataFrame(
                            _tile_stats_chunk(grp[c0 : c0 + CHUNK], w, h, tile, radius)
                        )
                    )
                i = j
            yield pd.concat(frames, ignore_index=True)

    schema = (
        "image_key long, tile_x int, tile_y int, n_px long, sum_v long, "
        "min_v long, max_v long, focal_sum long, focal_cnt long"
    )
    return images.select("image_key", "w", "h").mapInPandas(_run, schema=schema)


def _image_stats_chunk(keys: np.ndarray, w: int, h: int, radius: int):
    """Whole-image reductions for a CHUNK of same-shape images — the
    per-tile → per-image rollup of :func:`_tile_stats_chunk` fused away
    algebraically (Σ over tiles of tile-sums ≡ whole-image sum), so no
    reduceat/tile assembly runs at all. Same band + focal kernels."""
    grid = lattice_grid(keys, w, h)
    return _stats_from_grid(grid, radius)


def _stats_from_grid(grid: np.ndarray, radius: int):
    """Whole-image band + focal reductions over a (m, h, w) uint8 pixel
    stack — the kernel half of :func:`_image_stats_chunk`, shared by the
    synthetic path (grid derived from keys) and the DECODED path (grid
    decoded from stored bytes by kernels.codecs)."""
    m, h, w = grid.shape

    row = np.empty((m, h, w), dtype=np.int16)
    g16 = grid.astype(np.int16)
    np.add(g16[:, :, :-2], g16[:, :, 1:-1], out=row[:, :, 1:-1])
    np.add(row[:, :, 1:-1], g16[:, :, 2:], out=row[:, :, 1:-1])
    np.add(g16[:, :, 0], g16[:, :, 1], out=row[:, :, 0])
    np.add(g16[:, :, -2], g16[:, :, -1], out=row[:, :, -1])
    fs = np.empty((m, h, w), dtype=np.int16)
    np.add(row[:, :-2], row[:, 1:-1], out=fs[:, 1:-1])
    np.add(fs[:, 1:-1], row[:, 2:], out=fs[:, 1:-1])
    np.add(row[:, 0], row[:, 1], out=fs[:, 0])
    np.add(row[:, -2], row[:, -1], out=fs[:, -1])

    cx = np.full(w, 2 * radius + 1, dtype=np.int64)
    cx[:radius] = cx[-radius:] = 2 * radius
    cy = np.full(h, 2 * radius + 1, dtype=np.int64)
    cy[:radius] = cy[-radius:] = 2 * radius
    focal_cnt = int(cy.sum() * cx.sum())
    return (
        grid.sum(axis=(1, 2), dtype=np.int64),
        grid.min(axis=(1, 2)).astype(np.int64),
        grid.max(axis=(1, 2)).astype(np.int64),
        fs.sum(axis=(1, 2), dtype=np.int64),
        focal_cnt,
    )


def image_stats_df(images: DataFrame, tile: int = TILE, radius: int = 1) -> DataFrame:
    """Fused tiler + kernels + per-image reduction: only ONE stats row
    per image reaches the Arrow boundary (640k rows instead of ~5.5M
    tile rows at replicate 32), assembled as ONE DataFrame per Arrow
    batch (per-chunk DataFrame construction dominated the stubbed-kernel
    profile). Footprint columns pass through for the zonal match."""
    if radius != 1:
        raise ValueError("fused image stats kernel supports radius=1")

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            keys_all = pdf["image_key"].to_numpy(np.int64)
            ws = pdf["w"].to_numpy(np.int32)
            hs = pdf["h"].to_numpy(np.int32)
            bbox = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(np.float64)
            n = len(keys_all)
            order = np.lexsort((keys_all, hs, ws))
            out_keys = keys_all[order]
            out_bbox = bbox[order]
            sum_v = np.empty(n, np.int64)
            min_v = np.empty(n, np.int64)
            max_v = np.empty(n, np.int64)
            focal_sum = np.empty(n, np.int64)
            focal_cnt = np.empty(n, np.int64)
            n_tiles = np.empty(n, np.int64)
            n_px = np.empty(n, np.int64)
            i = 0
            while i < n:
                w, h = int(ws[order[i]]), int(hs[order[i]])
                j = i
                while j < n and ws[order[j]] == w and hs[order[j]] == h:
                    j += 1
                nt = -(-w // tile) * -(-h // tile)
                for c0 in range(i, j, CHUNK):
                    c1 = min(c0 + CHUNK, j)
                    s, mn, mx, fsum, fcnt = _image_stats_chunk(
                        out_keys[c0:c1], w, h, radius
                    )
                    sum_v[c0:c1] = s
                    min_v[c0:c1] = mn
                    max_v[c0:c1] = mx
                    focal_sum[c0:c1] = fsum
                    focal_cnt[c0:c1] = fcnt
                n_tiles[i:j] = nt
                n_px[i:j] = w * h
                i = j
            yield pd.DataFrame(
                {
                    "image_key": out_keys,
                    "minx": out_bbox[:, 0], "miny": out_bbox[:, 1],
                    "maxx": out_bbox[:, 2], "maxy": out_bbox[:, 3],
                    "n_tiles": n_tiles, "n_px": n_px,
                    "sum_v": sum_v, "min_v": min_v, "max_v": max_v,
                    "focal_sum": focal_sum, "focal_cnt": focal_cnt,
                }
            )

    schema = (
        "image_key long, minx double, miny double, maxx double, maxy double, "
        "n_tiles long, n_px long, sum_v long, min_v long, max_v long, "
        "focal_sum long, focal_cnt long"
    )
    return images.select(
        "image_key", "w", "h", "minx", "miny", "maxx", "maxy"
    ).mapInPandas(_run, schema=schema)


STAT_COLS = ["n_tiles", "n_px", "sum_v", "min_v", "max_v", "focal_sum", "focal_cnt"]


def zonal_rollup_df(img_stats: DataFrame, zindex_b) -> DataFrame:
    """Map-side spatial match + PARTIAL per-zone aggregation: the
    image×zone pair list (≈27 pairs/image at sf0.1 — tens of millions of
    rows) is never materialized or shuffled; each task emits ≤|zones|
    partial rows and only those shuffle to the final groupBy. This is
    aggregation pushdown through the spatial join — the shape that keeps
    the 10^12-image job's shuffle O(tasks × zones), not O(pairs)."""

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zx = zindex_b.value
        for pdf in it:
            if not len(pdf):
                continue
            rects = pdf[["minx", "miny", "maxx", "maxy"]].to_numpy(np.float64)
            qi, zi = zx.match(rects, "intersects")
            if not len(qi):
                continue
            m = pd.DataFrame({"zone_id": zx.zone_ids[zi]})
            for c in STAT_COLS:
                m[c] = pdf[c].to_numpy()[qi]
            g = m.groupby("zone_id", sort=False)
            out = g.agg(
                n_images=("n_px", "size"),
                n_tiles=("n_tiles", "sum"),
                n_px=("n_px", "sum"),
                sum_v=("sum_v", "sum"),
                min_v=("min_v", "min"),
                max_v=("max_v", "max"),
                focal_sum=("focal_sum", "sum"),
                focal_cnt=("focal_cnt", "sum"),
            ).reset_index()
            yield out

    schema = (
        "zone_id long, n_images long, n_tiles long, n_px long, sum_v long, "
        "min_v long, max_v long, focal_sum long, focal_cnt long"
    )
    partials = img_stats.mapInPandas(_run, schema=schema)
    return partials.groupBy("zone_id").agg(
        F.sum("n_images").alias("n_images"),
        F.sum("n_tiles").alias("n_tiles"),
        F.sum("n_px").alias("n_px"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.round(F.sum("focal_sum") / F.sum("focal_cnt"), 6).alias("mean_focal"),
    )


# ------------------------------------------------------------- pipeline

def _derive_footprints(keys: np.ndarray, replicate: int):
    """Vectorized in-kernel footprint derivation (same GEO_IMAGES
    formulas as :func:`images_df`) so only the 8-byte image_key crosses
    the JVM→Python Arrow boundary — the JVM feeder threads share cores
    with the Python workers in local mode, so feed bytes are wall time."""
    base = keys // replicate
    minx = np.where(base % 5 == 0, 50000 + (base % 97) * 10, (base * 9973) % 99000)
    miny = np.where(base % 5 == 0, 50000 + ((base * 3) % 97) * 10, (base * 6151) % 99000)
    w = (64 + (base % 4) * 64).astype(np.int32)
    h = (64 + ((base * 7) % 4) * 64).astype(np.int32)
    bbox = np.column_stack(
        [minx, miny, minx + w * 10, miny + h * 10]
    ).astype(np.float64)
    return w, h, bbox


def _zone_partials_fused(zindex_b, tile: int, radius: int, replicate: int):
    """One mapInPandas body = footprint derivation + kernels + per-image
    rollup + STRtree match + per-zone partial agg. A single JVM↔Python
    Arrow crossing per task; only ≤|zones| partial rows leave each task."""

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zx = zindex_b.value
        # consume the whole partition at once: the per-zone refine loop
        # then runs once per TASK (not once per Arrow batch), and the
        # zonal partial has at most |zones| rows per task
        batches = [p for p in it if len(p)]
        if not batches:
            return
        for pdf in [pd.concat(batches, ignore_index=True) if len(batches) > 1 else batches[0]]:
            keys_all = pdf["image_key"].to_numpy(np.int64)
            ws, hs, bbox = _derive_footprints(keys_all, replicate)
            n = len(keys_all)
            order = np.lexsort((keys_all, hs, ws))
            sum_v = np.empty(n, np.int64)
            min_v = np.empty(n, np.int64)
            max_v = np.empty(n, np.int64)
            focal_sum = np.empty(n, np.int64)
            focal_cnt = np.empty(n, np.int64)
            n_tiles = np.empty(n, np.int64)
            n_px = np.empty(n, np.int64)
            i = 0
            while i < n:
                w, h = int(ws[order[i]]), int(hs[order[i]])
                j = i
                while j < n and ws[order[j]] == w and hs[order[j]] == h:
                    j += 1
                for c0 in range(i, j, CHUNK):
                    c1 = min(c0 + CHUNK, j)
                    s, mn, mx, fsum, fcnt = _image_stats_chunk(
                        keys_all[order[c0:c1]], w, h, radius
                    )
                    sum_v[c0:c1] = s
                    min_v[c0:c1] = mn
                    max_v[c0:c1] = mx
                    focal_sum[c0:c1] = fsum
                    focal_cnt[c0:c1] = fcnt
                n_tiles[i:j] = -(-w // tile) * -(-h // tile)
                n_px[i:j] = w * h
                i = j
            rects = bbox[order]
            qi, zi = zx.match(rects, "intersects")
            if not len(qi):
                continue
            m = pd.DataFrame(
                {
                    "zone_id": zx.zone_ids[zi],
                    "n_tiles": n_tiles[qi], "n_px": n_px[qi],
                    "sum_v": sum_v[qi], "min_v": min_v[qi], "max_v": max_v[qi],
                    "focal_sum": focal_sum[qi], "focal_cnt": focal_cnt[qi],
                }
            )
            g = m.groupby("zone_id", sort=False)
            yield g.agg(
                n_images=("n_px", "size"),
                n_tiles=("n_tiles", "sum"),
                n_px=("n_px", "sum"),
                sum_v=("sum_v", "sum"),
                min_v=("min_v", "min"),
                max_v=("max_v", "max"),
                focal_sum=("focal_sum", "sum"),
                focal_cnt=("focal_cnt", "sum"),
            ).reset_index()

    return _run


def north_star(
    spark: SparkSession,
    sf_dir: str,
    n_partitions: int | None = None,
    replicate: int = 1,
    tile: int = TILE,
) -> DataFrame:
    """Full pipeline → per-zone tile statistics. Forcing the result
    executes every stage. Plan shape: scan → explode → [ONE fused map:
    tiler/kernels/per-image rollup/STRtree match/zonal partials] → one
    tiny shuffle → final agg. No pair materialization, no pixel shuffle,
    one Python stage."""
    from rsgislib_spark.operators.spatial_join import ZoneIndex

    imgs = images_df(spark, sf_dir, replicate)
    if n_partitions is None:
        # the part scan is 1-2 partitions at bench scale — without an
        # explicit width the whole fused kernel would run on 1-2 cores
        n_partitions = spark.sparkContext.defaultParallelism * 4
    imgs = imgs.repartition(n_partitions, "image_key")

    zindex_b = spark.sparkContext.broadcast(
        ZoneIndex.from_pandas(load_zones_pdf(sf_dir))
    )
    schema = (
        "zone_id long, n_images long, n_tiles long, n_px long, sum_v long, "
        "min_v long, max_v long, focal_sum long, focal_cnt long"
    )
    partials = imgs.select("image_key").mapInPandas(
        _zone_partials_fused(zindex_b, tile, 1, max(replicate, 1)), schema=schema
    )
    return partials.groupBy("zone_id").agg(
        F.sum("n_images").alias("n_images"),
        F.sum("n_tiles").alias("n_tiles"),
        F.sum("n_px").alias("n_px"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.round(F.sum("focal_sum") / F.sum("focal_cnt"), 6).alias("mean_focal"),
    )


def north_star_resumable(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_buckets: int = 8,
    replicate: int = 1,
) -> dict:
    """North-star with checkpoint-resumable output (north rule): per-zone
    results land bucket-by-bucket with manifest commits + lineage rows —
    a killed job re-invoked with the same ``out_dir`` skips every bucket
    whose manifest row exists and recomputes nothing else."""
    from rsgislib_spark.operators.manifest import resumable_write

    result = north_star(spark, sf_dir, replicate=replicate)
    return resumable_write(
        result, out_dir, id_col="zone_id", n_buckets=n_buckets, stage="north_star"
    )


# ----------------------------------------- decode-inclusive north star

def encode_images_df(
    spark: SparkSession,
    sf_dir: str,
    n_partitions: int | None = None,
    replicate: int = 1,
    where=None,
) -> DataFrame:
    """Bytes-bearing image table (the ``input_hint`` shape): the synthetic
    band grid of each image ENCODED with the in-house codecs — raw for
    even keys, png-class (Paeth-predicted deflate) for odd — so
    ``decode(encode(grid)) == grid`` exactly and downstream stats stay
    oracle-provable. This is the sandbox stand-in for scanning the stored
    ``bytes`` column of the Iceberg table."""
    from rsgislib_spark.kernels import codecs

    imgs = images_df(spark, sf_dir, replicate)
    if where is not None:
        # Subset BEFORE the encode stage: a filter applied by the caller
        # lands above the opaque mapInPandas node and cannot push through
        # it, so the whole table would be encoded only to be discarded.
        imgs = imgs.filter(where)
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism * 4
    imgs = imgs.repartition(n_partitions, "image_key")

    def _enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            keys = pdf["image_key"].to_numpy(np.int64)
            ws = pdf["w"].to_numpy(np.int32)
            hs = pdf["h"].to_numpy(np.int32)
            bufs, fmts = [], []
            order = np.lexsort((keys, hs, ws))
            out = pdf.iloc[order].reset_index(drop=True)
            okeys = keys[order]
            i = 0
            while i < len(order):
                w, h = int(ws[order[i]]), int(hs[order[i]])
                j = i
                while j < len(order) and ws[order[j]] == w and hs[order[j]] == h:
                    j += 1
                for c0 in range(i, j, CHUNK):
                    grp = okeys[c0 : min(c0 + CHUNK, j)]
                    grid = lattice_grid(grp, w, h)
                    for t, kk in enumerate(grp):
                        fmt = "raw" if kk % 2 == 0 else "png"
                        bufs.append(codecs.encode_image(grid[t], fmt))
                        fmts.append(fmt)
                i = j
            out["bytes"] = bufs
            out["fmt"] = fmts
            yield out[
                ["image_key", "bytes", "fmt", "w", "h", "minx", "miny", "maxx", "maxy"]
            ]

    schema = (
        "image_key long, bytes binary, fmt string, w int, h int, "
        "minx double, miny double, maxx double, maxy double"
    )
    return imgs.mapInPandas(_enc, schema=schema)


def _zone_partials_decoded(zindex_b, tile: int, radius: int):
    """Fused decode → kernels → per-image rollup → STRtree match →
    per-zone partial agg over BYTES-BEARING rows: the executor reads real
    pixel payloads exactly as ``RSGISCalcImage::calcImage`` does
    (src/img/RSGISCalcImage.cpp:149-230 — the reference executor always
    decodes pixels before the per-pixel callback). Decode is per image
    (variable-size codec payloads), the stats kernels run on same-shape
    CHUNK stacks like the synthetic path."""
    from rsgislib_spark.kernels import codecs

    def _run(it):
        import pyarrow as pa

        zx = zindex_b.value
        # Arrow RecordBatches, NOT pandas: converting a binary column to
        # pandas materializes one Python bytes object per row — measured
        # 4.4× slower end-to-end than reading the Arrow buffers directly
        # (22.1 s vs 5.0 s pass-through on the 50k-image bench table).
        batches = [b for b in it if b.num_rows]
        if not batches:
            return
        ws_l, hs_l, bbox_l, bufs, fmts = [], [], [], [], []
        for b in batches:
            cols = {name: b.column(i) for i, name in enumerate(b.schema.names)}
            ws_l.append(cols["w"].to_numpy(zero_copy_only=False).astype(np.int32))
            hs_l.append(cols["h"].to_numpy(zero_copy_only=False).astype(np.int32))
            bbox_l.append(
                np.stack(
                    [cols[c].to_numpy(zero_copy_only=False).astype(np.float64)
                     for c in ("minx", "miny", "maxx", "maxy")], axis=1
                )
            )
            bufs.extend(codecs.arrow_binary_views(cols["bytes"]))
            fmts.extend(cols["fmt"].to_pylist())
        ws = np.concatenate(ws_l)
        hs = np.concatenate(hs_l)
        bbox = np.concatenate(bbox_l, axis=0)
        n = len(ws)
        order = np.lexsort((np.arange(n), hs, ws))
        sum_v = np.empty(n, np.int64)
        min_v = np.empty(n, np.int64)
        max_v = np.empty(n, np.int64)
        focal_sum = np.empty(n, np.int64)
        focal_cnt = np.empty(n, np.int64)
        n_tiles = np.empty(n, np.int64)
        n_px = np.empty(n, np.int64)
        i = 0
        while i < n:
            w, h = int(ws[order[i]]), int(hs[order[i]])
            j = i
            while j < n and ws[order[j]] == w and hs[order[j]] == h:
                j += 1
            for c0 in range(i, j, CHUNK):
                c1 = min(c0 + CHUNK, j)
                stack = np.empty((c1 - c0, h, w), dtype=np.uint8)
                for t, oi in enumerate(order[c0:c1]):
                    stack[t] = codecs.decode_image(bufs[oi], fmts[oi], h, w)
                s, mn, mx, fsum, fcnt = _stats_from_grid(stack, radius)
                sum_v[c0:c1] = s
                min_v[c0:c1] = mn
                max_v[c0:c1] = mx
                focal_sum[c0:c1] = fsum
                focal_cnt[c0:c1] = fcnt
            n_tiles[i:j] = -(-w // tile) * -(-h // tile)
            n_px[i:j] = w * h
            i = j
        rects = bbox[order]
        qi, zi = zx.match(rects, "intersects")
        if not len(qi):
            return
        m = pd.DataFrame(
            {
                "zone_id": zx.zone_ids[zi],
                "n_tiles": n_tiles[qi], "n_px": n_px[qi],
                "sum_v": sum_v[qi], "min_v": min_v[qi], "max_v": max_v[qi],
                "focal_sum": focal_sum[qi], "focal_cnt": focal_cnt[qi],
            }
        )
        g = m.groupby("zone_id", sort=False)
        out = g.agg(
            n_images=("n_px", "size"),
            n_tiles=("n_tiles", "sum"),
            n_px=("n_px", "sum"),
            sum_v=("sum_v", "sum"),
            min_v=("min_v", "min"),
            max_v=("max_v", "max"),
            focal_sum=("focal_sum", "sum"),
            focal_cnt=("focal_cnt", "sum"),
        ).reset_index()
        yield pa.RecordBatch.from_pandas(
            out.astype(
                {c: np.int64 for c in out.columns if c != "zone_id"}
            ),
            preserve_index=False,
        )

    return _run


def north_star_decoded(
    spark: SparkSession,
    sf_dir: str,
    n_partitions: int | None = None,
    replicate: int = 1,
    tile: int = TILE,
    images_bytes: DataFrame | None = None,
) -> DataFrame:
    """DECODE-INCLUSIVE north star: bytes-bearing rows → codec decode →
    band/focal kernels → per-image rollup → map-side STRtree zonal match
    → per-zone stats. Identical result to :func:`north_star` because the
    raw/png-class codecs are exact, so it shares the q64 oracle math —
    but the timed path now includes the codec work that dominates a
    100 TB deployment. Pass ``images_bytes`` (e.g. a parquet scan of a
    prebuilt bytes table) to exclude encode from the measured window;
    by default the encode stage feeds the decode stage in-plan (bytes
    cross the Arrow boundary between the two Python stages — the
    sandbox stand-in for a storage scan; pixels still never shuffle)."""
    from rsgislib_spark.operators.spatial_join import ZoneIndex

    if images_bytes is None:
        images_bytes = encode_images_df(spark, sf_dir, n_partitions, replicate)
    zindex_b = spark.sparkContext.broadcast(
        ZoneIndex.from_pandas(load_zones_pdf(sf_dir))
    )
    schema = (
        "zone_id long, n_images long, n_tiles long, n_px long, sum_v long, "
        "min_v long, max_v long, focal_sum long, focal_cnt long"
    )
    partials = images_bytes.select(
        "bytes", "fmt", "w", "h", "minx", "miny", "maxx", "maxy"
    ).mapInArrow(_zone_partials_decoded(zindex_b, tile, 1), schema=schema)
    return partials.groupBy("zone_id").agg(
        F.sum("n_images").alias("n_images"),
        F.sum("n_tiles").alias("n_tiles"),
        F.sum("n_px").alias("n_px"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.round(F.sum("focal_sum") / F.sum("focal_cnt"), 6).alias("mean_focal"),
    )
