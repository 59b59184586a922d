"""Shepherd et al. (2019) iterative-elimination segmentation.

Reference pipeline (run_shepherd_segmentation,
python/rsgislib/segmentation/shepherdseg.py:68-398): k-means cluster →
label pixels from centres → clump equal-valued regions → stepwise
eliminate small clumps (RSGISEliminateSmallClumps::
stepwiseEliminateSmallClumps, src/segmentation/
RSGISEliminateSmallClumps.cpp:284-560) → relabel consecutive.

Spark shape: one image's clump map is worker-local (images are tiles in
the north-star layout), so the whole per-image pipeline is a vectorized
numpy kernel fanned out with mapInPandas — embarrassingly parallel, no
shuffle until the final per-clump rollup. At 100 TB the parallel unit is
the image, exactly like the reference's per-scene operation.

Elimination semantics follow the reference stepwise loop:

- rounds ``clump_area = 1..min_size``; a clump is eligible when
  ``size <= clump_area`` AND ``size < min_size`` (so exactly-min-size
  clumps are queued in the last round but never merged, matching the
  ``pxls->size() < minClumpSize`` guard);
- decisions use START-of-round sizes/means/adjacency (the reference
  applies its merge lookup table only after the round's decision loop);
- merge target = the 4-adjacent neighbour with STRICTLY larger
  (start-of-round) size at minimum Euclidean band-mean distance, ties
  broken by smallest neighbour id (the reference's sorted-unique
  neighbour list with strict ``<`` keeps the first);
- the merge happens only when that distance < ``dist_thres``.

Documented deviation: when a round's merge targets themselves merge in
the same round (possible only target-size ≤ clump_area), the reference
applies pairs sequentially and can stamp pixels with an already-merged
id (RSGISEliminateSmallClumps.cpp:513-540 writes the IMMEDIATE target's
id after that target's own pixels were relabelled — a dangling-label /
use-after-free edge). This engine resolves such chains order-free by
pointer-jumping to the final live target (chains are acyclic because
sizes strictly increase along them, and depth ≤ clump_area because every
non-terminal link is itself eligible).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rsgislib_spark.operators.clump import label_components


def run_clumps_1d(cat: np.ndarray) -> np.ndarray:
    """Row-run initial labels: each maximal horizontal run of equal
    ``cat`` is one clump, labelled by the linear index of its first
    pixel. SQL-closed-form (window functions), used by the q102 oracle."""
    h, w = cat.shape
    pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
    start = np.ones_like(cat, dtype=bool)
    start[:, 1:] = cat[:, 1:] != cat[:, :-1]
    run_id = np.cumsum(start.ravel()).reshape(h, w)  # global run counter
    # label = pos of run start: scatter starts then forward-fill by run
    starts_pos = pos.ravel()[start.ravel()]
    return starts_pos[run_id.ravel() - 1].reshape(h, w)


def _adjacency_pairs(labels: np.ndarray) -> np.ndarray:
    """Distinct directed 4-adjacent (a, b) label pairs, a != b, both >= 0."""
    pairs = []
    for sl_a, sl_b in (
        (np.s_[:, :-1], np.s_[:, 1:]),
        (np.s_[:-1, :], np.s_[1:, :]),
    ):
        a, b = labels[sl_a].ravel(), labels[sl_b].ravel()
        m = (a != b) & (a >= 0) & (b >= 0)
        pairs.append(np.stack([a[m], b[m]], 1))
        pairs.append(np.stack([b[m], a[m]], 1))
    allp = np.concatenate(pairs, 0)
    return np.unique(allp, axis=0)


def eliminate_small_clumps(
    labels: np.ndarray,
    spectral: np.ndarray,
    min_size: int,
    dist_thres: float,
) -> np.ndarray:
    """Stepwise small-clump elimination (rm_small_clumps_stepwise).

    labels: int64 (h, w) clump ids (any non-negative ints; -1 =
    background, never merged). spectral: (h, w) or (bands, h, w)
    float64. Returns the relabelled raster (surviving original ids).
    Fully vectorized — no per-clump Python loops beyond the
    min_size-bounded round structure, which is the algorithm's own data
    dependency.
    """
    lab = labels.astype(np.int64, copy=True)
    spec = spectral.astype(np.float64, copy=False)
    if spec.ndim == 2:
        spec = spec[None]
    thres2 = float(dist_thres) * float(dist_thres)

    for area in range(1, int(min_size) + 1):
        flat = lab.ravel()
        fg = flat >= 0
        uniq, inv = np.unique(flat[fg], return_inverse=True)
        sizes = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sums = np.stack(
            [np.bincount(inv, weights=b.ravel()[fg], minlength=len(uniq)) for b in spec]
        )
        means = sums / sizes  # (bands, n_clumps)

        pairs = _adjacency_pairs(lab)
        if len(pairs) == 0:
            break
        ai = np.searchsorted(uniq, pairs[:, 0])
        bi = np.searchsorted(uniq, pairs[:, 1])
        elig = (sizes[ai] <= area) & (sizes[ai] < min_size) & (sizes[bi] > sizes[ai])
        ai, bi = ai[elig], bi[elig]
        if len(ai) == 0:
            continue
        d2 = ((means[:, ai] - means[:, bi]) ** 2).sum(0)
        ok = d2 < thres2
        ai, bi, d2 = ai[ok], bi[ok], d2[ok]
        if len(ai) == 0:
            continue
        # argmin distance per source, ties -> smallest neighbour id
        order = np.lexsort((uniq[bi], d2, ai))
        ai, bi = ai[order], bi[order]
        first = np.ones(len(ai), bool)
        first[1:] = ai[1:] != ai[:-1]
        src, dst = ai[first], bi[first]
        # order-free chain resolution: jump to the final live target
        ptr = np.arange(len(uniq), dtype=np.int64)
        ptr[src] = dst
        for _ in range(int(min_size)):
            nxt = ptr[ptr]
            if np.array_equal(nxt, ptr):
                break
            ptr = nxt
        new_flat = flat.copy()
        new_flat[fg] = uniq[ptr[inv]]
        lab = new_flat.reshape(lab.shape)
    return lab


def relabel_sequential(labels: np.ndarray) -> np.ndarray:
    """Relabel surviving clump ids to consecutive 1..n in id order
    (relabel_clumps, python/src/segmentation.cpp); background -1 -> 0."""
    flat = labels.ravel()
    fg = flat >= 0
    uniq, inv = np.unique(flat[fg], return_inverse=True)
    out = np.zeros(flat.shape, np.int64)
    out[fg] = inv + 1
    return out.reshape(labels.shape)


def _kmeans_pixels(
    spec: np.ndarray, num_clusters: int, max_iter: int = 20
) -> np.ndarray:
    """Deterministic per-image Lloyd over pixel band vectors: diagonal
    initialisation between band minima and maxima
    (INITCLUSTER_DIAGONAL_FULL_ATTACH, imagecalc/__init__.py
    kmeans_clustering). spec: (bands, h, w). Returns (h, w) cluster ids."""
    bands = spec.reshape(spec.shape[0], -1).T  # (n_px, bands)
    lo, hi = bands.min(0), bands.max(0)
    t = (np.arange(num_clusters, dtype=np.float64) + 0.5) / num_clusters
    centres = lo + t[:, None] * (hi - lo)  # (k, bands) on the diagonal
    assign = None
    for _ in range(max_iter):
        d2 = ((bands[:, None, :] - centres[None]) ** 2).sum(2)
        new_assign = d2.argmin(1)
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for c in range(num_clusters):
            m = assign == c
            if m.any():
                centres[c] = bands[m].mean(0)
    return assign.reshape(spec.shape[1:])


def shepherd_segment(
    spec: np.ndarray,
    num_clusters: int = 8,
    min_size: int = 5,
    dist_thres: float = 1e9,
) -> np.ndarray:
    """Full per-image Shepherd pipeline: k-means → clump equal-labelled
    regions → stepwise eliminate → relabel consecutive. spec: (h, w) or
    (bands, h, w)."""
    s = spec[None] if spec.ndim == 2 else spec
    km = _kmeans_pixels(s.astype(np.float64), num_clusters)
    clumps = label_components(np.ones(km.shape, bool), 4, categories=km)
    elim = eliminate_small_clumps(clumps, s, min_size, dist_thres)
    return relabel_sequential(elim)


def shepherd_segment_images(
    images: DataFrame,
    num_clusters: int = 8,
    min_size: int = 5,
    dist_thres: float = 1e9,
) -> DataFrame:
    """Distributed Shepherd segmentation over the synthetic image table:
    one image per kernel call inside mapInPandas (the reference's
    per-scene unit), emitting per-image segment stats."""
    from rsgislib_spark.kernels import bands as BK

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                k, w, h = int(rec.image_key), int(rec.w), int(rec.h)
                g = BK.synth_band_grid(k, w, h, "red").astype(np.float64)
                seg = shepherd_segment(g, num_clusters, min_size, dist_thres)
                n_seg = int(seg.max())
                sizes = np.bincount(seg.ravel())[1:]
                rows.append((k, n_seg, int(sizes.min()), int(sizes.max())))
            yield pd.DataFrame(
                rows, columns=["image_key", "n_segments", "min_seg_px", "max_seg_px"]
            )

    return images.mapInPandas(
        _run,
        schema="image_key long, n_segments long, min_seg_px long, max_seg_px long",
    )


def shepherd_segment_tiled(
    spec: np.ndarray,
    num_clusters: int = 8,
    min_size: int = 5,
    dist_thres: float = 1e9,
    tile: int = 64,
    merge_thres: float | None = None,
) -> np.ndarray:
    """Tiled Shepherd segmentation with seam reconciliation
    (perform_tiled_segmentation, segmentation/tiledsegsingle.py:464-710).

    Each tile is segmented independently (globally-offset labels); then
    4-adjacent label pairs ACROSS tile seams whose segment band-mean
    distance is below ``merge_thres`` (default ``dist_thres``) are
    united with a union-find pass over the O(seam-length) pair table —
    the same reconcile shape as clump_images. This is a one-pass
    approximation of the reference's 3-stage border re-segmentation
    (documented); at cluster scale tiles are rows and the seam-pair
    table is the only cross-tile exchange.
    """
    from rsgislib_spark.operators.clump import _UnionFind

    s = spec[None] if spec.ndim == 2 else np.asarray(spec, np.float64)
    h, w = s.shape[1:]
    lab = np.empty((h, w), np.int64)
    offset = 0
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            sub = s[:, ty : ty + tile, tx : tx + tile]
            seg = shepherd_segment(
                sub[0] if s.shape[0] == 1 else sub, num_clusters, min_size, dist_thres
            )
            lab[ty : ty + tile, tx : tx + tile] = seg + offset
            offset += int(seg.max()) + 1

    thr = float(dist_thres if merge_thres is None else merge_thres)
    flat = lab.ravel()
    uniq, inv = np.unique(flat, return_inverse=True)
    sizes = np.bincount(inv)
    means = np.stack(
        [np.bincount(inv, weights=b.ravel()) for b in s]
    ) / sizes
    uf = _UnionFind()
    seams = []
    for tx in range(tile, w, tile):
        seams.append((lab[:, tx - 1], lab[:, tx]))
    for ty in range(tile, h, tile):
        seams.append((lab[ty - 1, :], lab[ty, :]))
    for la, lb in seams:
        pairs = np.unique(np.stack([la, lb], 1), axis=0)
        ia = np.searchsorted(uniq, pairs[:, 0])
        ib = np.searchsorted(uniq, pairs[:, 1])
        d2 = ((means[:, ia] - means[:, ib]) ** 2).sum(0)
        for a, b in pairs[d2 < thr * thr]:
            uf.union(int(a), int(b))
    # Vectorized remap: Python only over the |uniq| labels (tiny); the
    # full-raster pass is a searchsorted + int64 gather — no per-pixel
    # Python (the inv indices from np.unique already ARE the searchsorted
    # positions of every pixel's label in uniq).
    roots = np.array([uf.find(int(v)) for v in uniq], dtype=np.int64)
    merged = roots[inv].reshape(lab.shape)
    return relabel_sequential(merged)


def vectorise_pixels_to_points(
    band: np.ndarray, value: int, minx: float, maxy_or_miny: float, pxl_size: float
) -> np.ndarray:
    """Pixel-centroid points for pixels equal to ``value``
    (vectorise_pxls_to_pts, vectorutils/createvectors.py:119-180).
    Returns (n, 4): px, py, x, y with x/y the pixel-centre coordinates
    in the image frame (origin at miny, y increasing upward — this
    engine's footprint convention)."""
    ys, xs = np.nonzero(np.asarray(band) == value)
    x = minx + (xs + 0.5) * pxl_size
    y = maxy_or_miny + (ys + 0.5) * pxl_size
    return np.stack([xs.astype(np.float64), ys.astype(np.float64), x, y], 1)


def polygonise_rect_parts(labels: np.ndarray) -> np.ndarray:
    """Rectilinear polygonisation by maximal-rectangle decomposition
    (polygonise_raster_to_vec_lyr, createvectors.py:20-117 — GDAL
    polygonize analog): each label region becomes the minimal set of
    pixel-aligned rectangles obtained by merging identical horizontal
    runs down consecutive rows. Deterministic and SQL-replayable (runs
    via LAG windows, vertical merge via run-identity grouping).

    Returns (n, 5) int64 rows: label, x0, y0, x1, y1 (exclusive ends).
    """
    lab = np.asarray(labels, np.int64)
    h, w = lab.shape
    parts: dict[tuple[int, int, int], list] = {}  # (label, x0, x1) -> open rect
    out = []
    for y in range(h):
        row = lab[y]
        start = np.ones(w, bool)
        start[1:] = row[1:] != row[:-1]
        idx = np.nonzero(start)[0]
        ends = np.append(idx[1:], w)
        nxt: dict[tuple[int, int, int], list] = {}
        for x0, x1 in zip(idx, ends):
            v = int(row[x0])
            if v < 0:
                continue
            key = (v, int(x0), int(x1))
            if key in parts:
                rect = parts.pop(key)
                rect[4] = y + 1  # extend downward
            else:
                rect = [v, int(x0), y, int(x1), y + 1]
            nxt[key] = rect
        out.extend(parts.values())  # unextended rects are finished
        parts = nxt
    out.extend(parts.values())
    res = np.array(sorted(map(tuple, out)), np.int64)
    return res.reshape(-1, 5)
