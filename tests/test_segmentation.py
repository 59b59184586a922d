"""Shepherd elimination: vectorized kernel vs a naive sequential replay
of the reference's stepwise loop (RSGISEliminateSmallClumps.cpp:284-560,
with the documented order-free chain resolution)."""

import numpy as np
import pytest

from rsgislib_spark.operators.clump import label_components
from rsgislib_spark.operators.segmentation import (
    eliminate_small_clumps,
    relabel_sequential,
    run_clumps_1d,
    shepherd_segment,
)


def naive_eliminate(labels, spectral, min_size, dist_thres):
    lab = labels.astype(np.int64).copy()
    spec = spectral.astype(np.float64)
    if spec.ndim == 2:
        spec = spec[None]
    h, w = lab.shape
    for area in range(1, min_size + 1):
        ids = sorted(set(lab.ravel()) - {-1})
        sizes = {i: int((lab == i).sum()) for i in ids}
        means = {
            i: np.array([b[lab == i].mean() for b in spec]) for i in ids
        }
        merges = {}
        for i in ids:
            if not (sizes[i] <= area and sizes[i] < min_size):
                continue
            nbrs = set()
            ys, xs = np.nonzero(lab == i)
            for y, x in zip(ys, xs):
                for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and lab[yy, xx] not in (i, -1):
                        nbrs.add(int(lab[yy, xx]))
            best, best_d = None, None
            for nb in sorted(nbrs):
                if sizes[nb] > sizes[i]:
                    d = float(np.sqrt(((means[i] - means[nb]) ** 2).sum()))
                    if best is None or d < best_d:
                        best, best_d = nb, d
            if best is not None and best_d < dist_thres:
                merges[i] = best
        # order-free chain resolution (documented deviation)
        def final(t):
            while t in merges:
                t = merges[t]
            return t

        remap = {s: final(t) for s, t in merges.items()}
        for s, t in remap.items():
            lab[lab == s] = t
    return lab


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_eliminate_matches_naive(seed):
    rng = np.random.RandomState(seed)
    cat = rng.randint(0, 3, size=(14, 11))
    spec = rng.randint(0, 100, size=(14, 11)).astype(np.float64)
    lab0 = label_components(np.ones(cat.shape, bool), 4, categories=cat)
    got = eliminate_small_clumps(lab0, spec, min_size=4, dist_thres=60.0)
    want = naive_eliminate(lab0, spec, min_size=4, dist_thres=60.0)
    assert np.array_equal(got, want)
    # survivors are >= min_size or had no admissible neighbour
    sizes = np.bincount(got.ravel())
    small = [v for v in np.unique(got) if sizes[v] < 4]
    # every remaining small clump must lack a larger neighbour within threshold
    for v in small:
        assert (got == v).sum() < 4  # still small means elimination stalled


def test_eliminate_respects_threshold():
    lab = np.array([[0, 1, 1], [0, 1, 1], [0, 1, 1]], np.int64)
    lab = np.where(lab == 0, 0, 4)
    spec = np.where(lab == 0, 10.0, 90.0)
    # distance 80 > threshold 50: no merge
    out = eliminate_small_clumps(lab, spec, min_size=4, dist_thres=50.0)
    assert np.array_equal(out, lab)
    # raise the threshold: the 3-px clump merges into the 6-px clump
    out2 = eliminate_small_clumps(lab, spec, min_size=4, dist_thres=100.0)
    assert (out2 == 4).all()


def test_eliminate_background_untouched():
    lab = np.array([[-1, -1, 2], [3, 3, 2], [3, 3, 2]], np.int64)
    spec = np.ones(lab.shape)
    out = eliminate_small_clumps(lab, spec, min_size=4, dist_thres=10.0)
    assert (out[lab == -1] == -1).all()


def test_categorical_clump_labels():
    cat = np.array([[1, 1, 2], [2, 1, 2], [2, 2, 2]])
    lab = label_components(np.ones(cat.shape, bool), 4, categories=cat)
    # three components: {(0,0),(0,1),(1,1)}, {(0,2),(1,2),(2,2),(2,1),(2,0),(1,0)}
    assert lab[0, 0] == lab[0, 1] == lab[1, 1] == 0
    assert lab[0, 2] == lab[1, 2] == lab[2, 2] == lab[2, 0] == lab[1, 0] == 2
    assert len(np.unique(lab)) == 2


def test_run_clumps_1d():
    cat = np.array([[1, 1, 2, 2, 2], [3, 3, 3, 1, 1]])
    lab = run_clumps_1d(cat)
    assert lab.tolist() == [[0, 0, 2, 2, 2], [5, 5, 5, 8, 8]]


def test_relabel_sequential():
    lab = np.array([[7, 7, -1], [3, 3, 12]], np.int64)
    out = relabel_sequential(lab)
    assert out.tolist() == [[2, 2, 0], [1, 1, 3]]


def test_shepherd_end_to_end_deterministic():
    rng = np.random.RandomState(9)
    spec = (
        rng.randint(0, 40, size=(24, 24))
        + np.repeat(np.repeat(rng.randint(0, 200, size=(3, 3)), 8, 0), 8, 1)
    ).astype(np.float64)
    seg1 = shepherd_segment(spec, num_clusters=4, min_size=5, dist_thres=1e9)
    seg2 = shepherd_segment(spec, num_clusters=4, min_size=5, dist_thres=1e9)
    assert np.array_equal(seg1, seg2)
    assert seg1.min() >= 1
    # every surviving segment either reached min size or stalled without
    # an admissible (strictly larger) neighbour within threshold
    sizes = np.bincount(seg1.ravel())[1:]
    assert sizes.max() >= 5
    assert seg1.max() < seg1.size  # actually segmented, not all singletons


def test_tiled_shepherd_merges_seam_segments():
    from rsgislib_spark.operators.segmentation import (
        shepherd_segment,
        shepherd_segment_tiled,
    )

    rng = np.random.RandomState(12)
    # a horizontal homogeneous band crossing the vertical tile seam
    spec = rng.uniform(0, 20, (32, 64))
    spec[12:20, :] = 200.0 + rng.uniform(0, 1, (8, 64))
    tiled = shepherd_segment_tiled(
        spec, num_clusters=4, min_size=5, dist_thres=1e9, tile=32, merge_thres=10.0
    )
    # the bright band is ONE segment despite the seam at x=32
    band_labels = np.unique(tiled[14:18, :])
    assert len(band_labels) == 1
    # without seam merging it stays split
    split = shepherd_segment_tiled(
        spec, num_clusters=4, min_size=5, dist_thres=1e9, tile=32, merge_thres=0.0
    )
    assert len(np.unique(split[14:18, :])) >= 2
    # labels are consecutive from 1
    assert tiled.min() >= 1 and tiled.max() == len(np.unique(tiled))


def test_tiled_shepherd_single_tile_equals_whole():
    from rsgislib_spark.operators.segmentation import (
        shepherd_segment,
        shepherd_segment_tiled,
    )

    rng = np.random.RandomState(13)
    spec = rng.uniform(0, 100, (24, 24))
    whole = shepherd_segment(spec, num_clusters=4, min_size=4, dist_thres=1e9)
    tiled = shepherd_segment_tiled(
        spec, num_clusters=4, min_size=4, dist_thres=1e9, tile=24, merge_thres=0.0
    )
    assert np.array_equal(whole, tiled)  # one tile, no seams -> identical


def test_boundary_and_border_helpers():
    from rsgislib_spark.operators.clump import (
        border_clumps,
        boundary_pixel_mask,
        clump_tile_positions,
    )

    lab = np.array(
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.int64
    )
    m = boundary_pixel_mask(lab)
    # the 4 outer corners have no differing 4-neighbour; the other 12 do
    assert m.sum() == 12
    assert m[0, 0] == 0 and m[0, 1] == 1
    big = np.zeros((6, 6), np.int64)
    big[2:4, 2:4] = 5
    mb = boundary_pixel_mask(big)
    assert mb[2, 2] == 1 and mb[0, 0] == 0  # interior of label-0 sea is calm
    assert set(border_clumps(lab).tolist()) == {0, 1, 2, 3}
    inner = -np.ones((5, 5), np.int64)
    inner[2, 2] = 7
    assert border_clumps(inner).tolist() == []
    pos = clump_tile_positions(lab, tile=2)
    assert set(pos.values()) == {"boundary"}  # all four touch the seam
    solo = np.zeros((4, 4), np.int64)
    solo[1:3, 1:3] = 1
    pos2 = clump_tile_positions(solo, tile=4)
    assert pos2[0] == "boundary" and pos2[1] == "core"


def test_polygonise_rect_parts_properties():
    from rsgislib_spark.operators.segmentation import polygonise_rect_parts

    rng = np.random.RandomState(6)
    lab = rng.randint(0, 4, (20, 15)).astype(np.int64)
    parts = polygonise_rect_parts(lab)
    # exact cover: every pixel in exactly one part of its own label
    cover = np.full(lab.shape, -1, np.int64)
    for v, x0, y0, x1, y1 in parts:
        assert (lab[y0:y1, x0:x1] == v).all()  # parts are label-pure
        assert (cover[y0:y1, x0:x1] == -1).all()  # no overlaps
        cover[y0:y1, x0:x1] = v
    assert np.array_equal(cover, lab)  # full tiling
    # background (-1) is skipped
    lab2 = lab.copy()
    lab2[lab2 == 0] = -1
    parts2 = polygonise_rect_parts(lab2)
    assert (parts2[:, 0] != -1).all()
    assert ((parts2[:, 3] - parts2[:, 1]) * (parts2[:, 4] - parts2[:, 2])).sum() == (lab2 >= 0).sum()


def test_vectorise_pixels_to_points():
    from rsgislib_spark.operators.segmentation import vectorise_pixels_to_points

    band = np.array([[5, 1], [1, 5]], np.int64)
    pts = vectorise_pixels_to_points(band, 5, 1000.0, 2000.0, 10.0)
    assert pts.shape == (2, 4)
    assert pts[0].tolist() == [0.0, 0.0, 1005.0, 2005.0]
    assert pts[1].tolist() == [1.0, 1.0, 1015.0, 2015.0]


def test_extract_chips_pixels(spark):
    import pandas as pd
    from rsgislib_spark.kernels import bands as BK
    from rsgislib_spark.operators.chips import extract_chips

    images = spark.createDataFrame(
        pd.DataFrame([{"image_key": 3, "w": 64, "h": 64, "minx": 0.0, "miny": 0.0}])
    )
    # one interior point and one corner point (re-anchor case)
    points = spark.createDataFrame(
        pd.DataFrame({"pt_id": [1, 2], "x": [305.0, 5.0], "y": [305.0, 635.0]})
    )
    out = (
        extract_chips(images, points, chip_size=8, with_pixels=True)
        .toPandas()
        .set_index("pt_id")
    )
    grid = BK.synth_band_grid(3, 64, 64, "red")
    # interior: x=305 -> px=30, y=305 -> py=floor((640-305)/10)=33; anchored (26,29)
    r = out.loc[1]
    assert (r.x0, r.y0) == (26, 29)
    assert np.array_equal(
        np.array(r.chip).reshape(8, 8), grid[29:37, 26:34]
    )
    # corner: px=0, py=0 -> clamped anchor (0, 0)
    r2 = out.loc[2]
    assert (r2.x0, r2.y0) == (0, 0)
    assert r2.chip_sum == int(grid[0:8, 0:8].sum())


def _adjusted_rand(a, b):
    a, b = a.ravel(), b.ravel()
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    cm = np.zeros((len(ua), len(ub)), np.int64)
    np.add.at(cm, (ia, ib), 1)
    n = a.size
    comb = lambda x: x * (x - 1) // 2
    sij = comb(cm).sum()
    si = comb(cm.sum(1)).sum()
    sj = comb(cm.sum(0)).sum()
    exp = si * sj / comb(n)
    return (sij - exp) / ((si + sj) / 2 - exp)


def test_tiled_shepherd_agreement_bounded():
    """MEASURED fidelity bound for the one-pass seam merge (vs the
    reference's 3-stage border re-segmentation,
    segmentation/tiledsegsingle.py:464-710): tile-vs-whole adjusted
    Rand >= 0.75 per seeded fixture and >= 0.9 on average, with blocks
    deliberately misaligned to the 64-px tile grid. Seed 3 is a known
    under-merge case (~0.81) — the bound documents it quantitatively."""
    from rsgislib_spark.operators.segmentation import (
        shepherd_segment,
        shepherd_segment_tiled,
    )

    scores = []
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        base = rng.randint(0, 4, (6, 6)) * 35
        img = np.kron(base, np.ones((24, 24), np.int64))[:128, :128] + rng.randint(
            0, 15, (128, 128)
        )
        spec = img[None].astype(np.float64)
        whole = shepherd_segment(spec, num_clusters=4, min_size=10, dist_thres=1e9)
        tiled = shepherd_segment_tiled(
            spec, num_clusters=4, min_size=10, tile=64, merge_thres=10.0
        )
        s = _adjusted_rand(whole, tiled)
        assert s >= 0.75, f"seed {seed}: tile-vs-whole ARI {s:.3f} < 0.75"
        scores.append(s)
    assert sum(scores) / len(scores) >= 0.9
