"""Connected-components ("clumping") — the reference's segmentation
primitive (clump: python/src/segmentation.cpp:685-696) and its tiled
variant with cross-tile label reconciliation
(perform_clumping_multi_process + merge_equiv_clumps,
segmentation/tiledclump.py:134-224).

Spark shape (SURVEY §3.3): per-tile labelling is an embarrassingly
parallel numpy kernel inside mapInPandas; the only global step is the
boundary-equivalence reconcile, whose input is O(perimeter) — tiny
relative to the pixel data — collected to the driver for a union-find
pass and broadcast back (the same asymptotic shape as the reference's
merge_equiv_clumps global LUT).

The in-tile labeller is label-propagation with pointer jumping
(min-neighbour sweep + path compression), a classic data-parallel CC
formulation — O(log diameter) vectorized iterations, no per-pixel
Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def label_components(
    mask: np.ndarray,
    connectivity: int = 4,
    categories: np.ndarray | None = None,
) -> np.ndarray:
    """4- or 8-connected component labels of a boolean mask.

    Returns int64 labels; background = -1. Labels are the minimum linear
    pixel index of the component — deterministic, order-free.

    With ``categories`` (an int raster, e.g. k-means cluster ids), two
    neighbours link only when their category values are equal — the
    reference's clump-of-equal-valued-regions semantics (clump,
    python/src/segmentation.cpp:685-696).
    """
    h, w = mask.shape
    lab = np.where(mask, np.arange(h * w, dtype=np.int64).reshape(h, w), -1)
    if connectivity == 4:
        shifts = ((0, 1), (0, -1), (1, 0), (-1, 0))
    else:
        shifts = (
            (0, 1), (0, -1), (1, 0), (-1, 0),
            (1, 1), (-1, -1), (1, -1), (-1, 1),
        )

    def sweep(cur: np.ndarray) -> np.ndarray:
        # monotone min-accumulation per directed shift: each cell only
        # ever DECREASES toward the component minimum (a two-sided
        # write-back of a precomputed min can undo progress and create
        # spurious fixpoints)
        out = cur.copy()
        for dy, dx in shifts:
            ys0, ys1 = max(dy, 0), h - max(-dy, 0)
            xs0, xs1 = max(dx, 0), w - max(-dx, 0)
            dst = out[ys0:ys1, xs0:xs1]
            nb = out[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
            both = (dst >= 0) & (nb >= 0)
            if categories is not None:
                both &= (
                    categories[ys0:ys1, xs0:xs1]
                    == categories[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
                )
            np.minimum(dst, nb, out=dst, where=both)
        return out

    flat_bg = np.arange(h * w, dtype=np.int64)  # identity for background
    while True:
        new = sweep(lab)
        # pointer jumping: follow the label chain to its current root
        f = new.ravel().copy()
        valid = f >= 0
        tbl = np.where(valid, f, flat_bg)
        for _ in range(2):
            tbl = tbl[tbl]
        f[valid] = tbl[valid]
        new = f.reshape(h, w)
        if np.array_equal(new, lab):
            return lab
        lab = new


class _UnionFind:
    def __init__(self):
        self.p: dict = {}

    def find(self, x):
        p = self.p
        while p.setdefault(x, x) != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def clump_images(
    images: DataFrame,
    threshold: int = 125,
    tile: int = 128,
) -> DataFrame:
    """Per-image component stats with tiled labelling + reconcile.

    Pixels come from the synthetic band (mask = band > threshold); each
    tile is labelled independently, tiles exchange only their boundary
    rows, and a driver-side union-find merges cross-tile equivalences
    (merge_equiv_clumps). Emits (image_key, n_components, largest_px).
    """
    from rsgislib_spark.kernels.pixelmath import tile_windows_simple

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                k, w, h = int(rec.image_key), int(rec.w), int(rec.h)
                uf = _UnionFind()
                sizes: dict = {}
                # per-tile labelling; labels are GLOBAL pixel indices so
                # they are unique across tiles with zero coordination
                edges_v: dict = {}  # (x) -> label of bottom row pixel of tile above
                edges_h: dict = {}
                for tx, ty, x0, y0, tw, th in tile_windows_simple(w, h, tile, tile):
                    px = (np.arange(x0, x0 + tw, dtype=np.int64) * 13)[None, :]
                    py = (np.arange(y0, y0 + th, dtype=np.int64) * 17)[:, None]
                    band = (k * 7 + px + py) % 251
                    mask = band > threshold
                    loc = label_components(mask)
                    # map local linear label (within tile) → global pixel id
                    ly, lx = np.divmod(np.maximum(loc, 0), tw)
                    glob = np.where(loc >= 0, (y0 + ly) * w + (x0 + lx), -1)
                    for lbl, cnt in zip(*np.unique(glob[glob >= 0], return_counts=True)):
                        sizes[int(lbl)] = sizes.get(int(lbl), 0) + int(cnt)
                    # boundary exchange: top row ↔ tile above, left col ↔ tile left
                    if y0 > 0:
                        top = glob[0]
                        for x in np.nonzero(top >= 0)[0]:
                            up = edges_v.get((x0 + int(x), y0))
                            if up is not None:
                                uf.union(int(top[x]), up)
                    if x0 > 0:
                        left = glob[:, 0]
                        for y in np.nonzero(left >= 0)[0]:
                            lft = edges_h.get((x0, y0 + int(y)))
                            if lft is not None:
                                uf.union(int(left[y]), lft)
                    bot = glob[-1]
                    for x in np.nonzero(bot >= 0)[0]:
                        edges_v[(x0 + int(x), y0 + th)] = int(bot[x])
                    rgt = glob[:, -1]
                    for y in np.nonzero(rgt >= 0)[0]:
                        edges_h[(x0 + tw, y0 + int(y))] = int(rgt[y])
                merged: dict = {}
                for lbl, cnt in sizes.items():
                    r = uf.find(lbl)
                    merged[r] = merged.get(r, 0) + cnt
                rows.append(
                    (k, len(merged), max(merged.values()) if merged else 0)
                )
            yield pd.DataFrame(rows, columns=["image_key", "n_components", "largest_px"])

    return images.select("image_key", "w", "h").mapInPandas(
        _run, schema="image_key long, n_components long, largest_px long"
    )


def rel_diff_neigh_stats(
    edges: DataFrame,
    values: DataFrame,
    id_col: str = "zone_id",
    val_col: str = "v",
) -> DataFrame:
    """Per-zone stats of (own value − neighbour value) over the
    adjacency edge list — ``calc_rel_diff_neigh_stats``
    (python/src/rastergis.cpp:2002-2027, impl
    src/rastergis/RSGISCalcNeighbourStats.cpp). ``edges`` carries each
    unordered pair once as (zone_a, zone_b); both directions are
    expanded here. Returns id + n_neigh/min/max/sum_diff/mean_diff
    (mean as ratio-of-sums, rounded 6 — cross-engine exact when values
    are integers)."""
    both = edges.select(
        F.col("zone_a").alias(id_col), F.col("zone_b").alias("nbr")
    ).unionByName(
        edges.select(F.col("zone_b").alias(id_col), F.col("zone_a").alias("nbr"))
    )
    v_self = values.select(F.col(id_col), F.col(val_col).alias("v_self"))
    v_nbr = values.select(F.col(id_col).alias("nbr"), F.col(val_col).alias("v_nbr"))
    d = (
        both.join(v_self, id_col)
        .join(v_nbr, "nbr")
        .withColumn("d", F.col("v_self") - F.col("v_nbr"))
    )
    return d.groupBy(id_col).agg(
        F.count("*").alias("n_neigh"),
        F.min("d").alias("min_diff"),
        F.max("d").alias("max_diff"),
        F.sum("d").cast("long").alias("sum_diff"),
        F.round(F.sum("d").cast("double") / F.count("*"), 6).alias("mean_diff"),
    )


def label_border_counts(labels: np.ndarray):
    """Per-label border-edge counts over 4-adjacency — the kernel behind
    ``calc_border_length`` / ``calc_rel_border``
    (python/src/rastergis.cpp:1915-1965, impl
    src/rastergis/RSGISClumpBorders.cpp). For every in-bounds
    pixel/neighbour pair with differing labels, each SIDE's label gets
    one border count (matching the per-pixel neighbour scan).

    Returns (labels_sorted, n_border, border_with) where border_with is
    a dict label → {other_label: count}."""
    lab = np.asarray(labels, dtype=np.int64)
    pairs = []
    # (own, other) for the 4 directed neighbour views
    pairs.append((lab[:, :-1], lab[:, 1:]))   # right
    pairs.append((lab[:, 1:], lab[:, :-1]))   # left
    pairs.append((lab[:-1, :], lab[1:, :]))   # down
    pairs.append((lab[1:, :], lab[:-1, :]))   # up
    nmax = int(lab.max()) + 1
    total = np.zeros(nmax, dtype=np.int64)
    with_counts: dict = {}
    for own, other in pairs:
        diff = own != other
        o = own[diff].ravel()
        t = other[diff].ravel()
        total += np.bincount(o, minlength=nmax)
        key = o * nmax + t
        uniq, cnt = np.unique(key, return_counts=True)
        for kk, c in zip(uniq, cnt):
            a, b = int(kk // nmax), int(kk % nmax)
            with_counts.setdefault(a, {}).setdefault(b, 0)
            with_counts[a][b] += int(c)
    present = np.flatnonzero(total > 0)
    return present, total, with_counts


def boundary_pixel_mask(labels: np.ndarray) -> np.ndarray:
    """1 where a pixel has a 4-neighbour with a different label
    (find_boundary_pixels, src/segmentation/RSGISDefineSpectralDivision
    / clump tooling); background (-1) never flagged."""
    h, w = labels.shape
    out = np.zeros((h, w), bool)
    out[:, 1:] |= labels[:, 1:] != labels[:, :-1]
    out[:, :-1] |= labels[:, :-1] != labels[:, 1:]
    out[1:, :] |= labels[1:, :] != labels[:-1, :]
    out[:-1, :] |= labels[:-1, :] != labels[1:, :]
    return (out & (labels >= 0)).astype(np.int64)


def border_clumps(labels: np.ndarray) -> np.ndarray:
    """Sorted ids of clumps touching the raster edge
    (define_border_clumps — the tiled pipeline's re-segmentation set)."""
    edge = np.concatenate(
        [labels[0, :], labels[-1, :], labels[:, 0], labels[:, -1]]
    )
    return np.unique(edge[edge >= 0])


def clump_tile_positions(labels: np.ndarray, tile: int) -> dict:
    """Label → 'boundary' | 'core' by whether the clump touches any
    internal tile seam or the raster edge (define_clump_tile_positions,
    segmentation/tiledclump.py staging)."""
    h, w = labels.shape
    seam = [labels[0, :], labels[-1, :], labels[:, 0], labels[:, -1]]
    for tx in range(tile, w, tile):
        seam.extend([labels[:, tx - 1], labels[:, tx]])
    for ty in range(tile, h, tile):
        seam.extend([labels[ty - 1, :], labels[ty, :]])
    touching = set(np.unique(np.concatenate(seam)).tolist()) - {-1}
    return {
        int(v): ("boundary" if int(v) in touching else "core")
        for v in np.unique(labels)
        if v >= 0
    }
