"""Operator parity tests: tiler / zonal / point extraction / kNN vs
independent numpy oracles over the deterministic fixtures."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark import datagen
from rsgislib_spark.kernels import codecs, geom, pixelmath
from rsgislib_spark.operators.knn import closest_point_join, knn_apply, radius_count
from rsgislib_spark.operators.point_extract import extract_point_values
from rsgislib_spark.operators.tiler import tile_images, tile_manifest
from rsgislib_spark.operators.zonal import segment_mode, segment_stats, zonal_band_stats


@pytest.fixture(scope="module")
def small_images_pdf():
    return datagen.image_footprints(datagen.gen_images(24, seed=42))


@pytest.fixture(scope="module")
def images_df(spark, small_images_pdf):
    return spark.createDataFrame(small_images_pdf).cache()


# ------------------------------------------------------------------- tiler
class TestTiler:
    def test_tile_counts_and_roundtrip(self, spark, images_df, small_images_pdf):
        tiles = tile_images(images_df, 64, 64, mode="simple").toPandas()
        # oracle per image
        for rec in small_images_pdf.itertuples(index=False):
            wins = pixelmath.tile_windows_simple(rec.w, rec.h, 64, 64)
            sub = tiles[tiles.image_id == rec.image_id]
            assert len(sub) == len(wins), rec.image_id
            # pixel roundtrip of one tile (tiles are raw, post-decode)
            img = codecs.decode_image(rec.bytes, rec.fmt, rec.h, rec.w)
            t0 = sub.iloc[0]
            arr = np.frombuffer(t0.pixels, dtype=np.uint8).reshape(t0.th, t0.tw)
            np.testing.assert_array_equal(
                arr, img[t0.y0 : t0.y0 + t0.th, t0.x0 : t0.x0 + t0.tw]
            )

    def test_block_mode_full_size(self, spark, images_df):
        tiles = tile_images(images_df, 64, 64, mode="block").toPandas()
        assert (tiles.tw == 64).all() and (tiles.th == 64).all()

    def test_overlap_mode(self, spark, images_df, small_images_pdf):
        tiles = tile_images(images_df, 64, 64, mode="overlap", overlap=4).toPandas()
        rec = small_images_pdf.iloc[0]
        wins = pixelmath.tile_windows_overlap(rec.w, rec.h, 64, 64, 4)
        sub = tiles[tiles.image_id == rec.image_id]
        assert len(sub) == len(wins)

    def test_cells_consistent_with_footprint(self, spark, images_df, small_images_pdf):
        from rsgislib_spark.kernels import cells

        tiles = tile_images(images_df, 64, 64).toPandas()
        rec = small_images_pdf.iloc[0]
        sub = tiles[tiles.image_id == rec.image_id].iloc[0]
        maxy = rec.miny + rec.h * datagen.PIXEL_SIZE
        cx = rec.minx + (sub.x0 + sub.tw / 2.0) * datagen.PIXEL_SIZE
        cy = maxy - (sub.y0 + sub.th / 2.0) * datagen.PIXEL_SIZE
        exp = cells.encode_point(np.array([cx]), np.array([cy]), 7)[0]
        assert sub.cell == exp

    def test_tile_batches_dl_iterator(self, spark, images_df, small_images_pdf):
        from rsgislib_spark.operators.tiler import tile_batches

        bs = 8
        got = tile_batches(images_df, block=32, batch_size=bs).toPandas()
        # every batch is full except possibly one per partition
        assert (got["n"] <= bs).all() and (got["n"] > 0).all()
        # total block count == anchored-window count over eligible images
        want = 0
        for rec in small_images_pdf.itertuples(index=False):
            if rec.w >= 32 and rec.h >= 32:
                want += len(pixelmath.block_windows_anchored(rec.w, rec.h, 32))
        assert got["n"].sum() == want
        # tensors round-trip: n × 32 × 32 uint8, content matches the decode
        row = got.iloc[0]
        t = np.frombuffer(row["tensor"], dtype=np.uint8).reshape(row["n"], 32, 32)
        src = small_images_pdf.set_index("image_id")
        rec = src.loc[row["image_ids"][0]]
        img = codecs.decode_image(rec["bytes"], rec["fmt"], rec["h"], rec["w"])
        wins = pixelmath.block_windows_anchored(rec["w"], rec["h"], 32)
        xb, yb = row["xs"][0], row["ys"][0]
        win = next(w for w in wins if w[0] == xb and w[1] == yb)
        assert np.array_equal(t[0], img[win[3]:win[3]+32, win[2]:win[2]+32])

    def test_caption_equality_per_tile_row(self, spark, images_df, small_images_pdf):
        # north-rule per-row invariant: every tile row equi-joins back to
        # exactly its source caption (caption equality, alongside the
        # decoded-pixel roundtrip asserted above)
        tiles = tile_images(images_df, 64, 64)
        joined = (
            tiles.select("image_id")
            .join(images_df.select("image_id", "caption"), "image_id")
            .toPandas()
        )
        src = small_images_pdf.set_index("image_id")["caption"]
        assert len(joined) > 0
        assert (
            joined["caption"].to_numpy() == src.loc[joined["image_id"]].to_numpy()
        ).all()

    def test_manifest(self, spark, images_df, small_images_pdf):
        tiles = tile_images(images_df, 64, 64)
        man = tile_manifest(tiles).toPandas()
        assert len(man) == len(small_images_pdf)
        rec = small_images_pdf.iloc[0]
        exp_tiles = len(pixelmath.tile_windows_simple(rec.w, rec.h, 64, 64))
        assert int(man[man.image_id == rec.image_id].n_tiles.iloc[0]) == exp_tiles


# ------------------------------------------------------------------- zonal
class TestZonal:
    @pytest.fixture(scope="class")
    def segs_pdf(self, small_images_pdf):
        return datagen.gen_segments(small_images_pdf, seed=42)

    def test_segment_stats_vs_numpy(self, spark, images_df, small_images_pdf, segs_pdf):
        segs_df = spark.createDataFrame(segs_pdf)
        got = segment_stats(images_df, segs_df).toPandas()
        rec = small_images_pdf.iloc[3]
        seg = segs_pdf[segs_pdf.image_id == rec.image_id].iloc[0]
        img = codecs.decode_image(rec.bytes, rec.fmt, rec.h, rec.w).astype(float).ravel()
        lab = np.frombuffer(seg.seg_bytes, dtype=np.int32)
        sub = got[got.image_id == rec.image_id].set_index("zone").sort_index()
        for z in range(seg.n_segments):
            vals = img[lab == z]
            if vals.size == 0:
                assert z not in sub.index
                continue
            row = sub.loc[z]
            assert row["count"] == vals.size
            assert row["min"] == vals.min() and row["max"] == vals.max()
            assert row["mean"] == pytest.approx(vals.mean())
            assert row["sum"] == pytest.approx(vals.sum())
            assert row["stddev"] == pytest.approx(vals.std(), abs=1e-9)

    def test_segment_mode_vs_numpy(self, spark, images_df, small_images_pdf, segs_pdf):
        segs_df = spark.createDataFrame(segs_pdf)
        got = segment_mode(images_df, segs_df).toPandas()
        rec = small_images_pdf.iloc[5]
        seg = segs_pdf[segs_pdf.image_id == rec.image_id].iloc[0]
        img = codecs.decode_image(rec.bytes, rec.fmt, rec.h, rec.w).ravel()
        lab = np.frombuffer(seg.seg_bytes, dtype=np.int32)
        sub = got[got.image_id == rec.image_id].set_index("zone")
        for z in np.unique(lab):
            vals = img[lab == z]
            u, c = np.unique(vals, return_counts=True)
            exp = u[np.argmax(c)]  # ties -> smallest (np.unique sorted)
            assert sub.loc[z, "mode"] == exp

    def test_zonal_band_stats_vs_numpy(self, spark, images_df, small_images_pdf, zones_pdf):
        zones_df = spark.createDataFrame(zones_pdf)
        got = zonal_band_stats(images_df, zones_df).toPandas().set_index("zone_id")

        # oracle: loop all images × zones, pixel-center-in-polygon within the
        # reference's envelope window (which clamps to size-1 and therefore
        # EXCLUDES the last row/col when a polygon reaches the image edge —
        # zonalstats/__init__.py:355-396; parity target, reproduced here)
        acc = {}
        for rec in small_images_pdf.itertuples(index=False):
            img = codecs.decode_image(rec.bytes, rec.fmt, rec.h, rec.w).astype(float)
            maxy = rec.miny + rec.h * datagen.PIXEL_SIZE
            for z in zones_pdf.itertuples(index=False):
                rings = geom.wkb_to_polygon(z.geometry)
                x1, y1, xs, ys, have = pixelmath.zonal_window(
                    [z.minx], [z.maxx], [z.miny], [z.maxy],
                    rec.minx, maxy, datagen.PIXEL_SIZE, datagen.PIXEL_SIZE,
                    rec.w, rec.h,
                )
                if not have[0]:
                    continue
                x1_, y1_, xs_, ys_ = int(x1[0]), int(y1[0]), int(xs[0]), int(ys[0])
                sub = img[y1_ : y1_ + ys_, x1_ : x1_ + xs_]
                pcx = rec.minx + (np.arange(x1_, x1_ + xs_) + 0.5) * datagen.PIXEL_SIZE
                pcy = maxy - (np.arange(y1_, y1_ + ys_) + 0.5) * datagen.PIXEL_SIZE
                gx, gy = np.meshgrid(pcx, pcy)
                m = geom.points_in_polygon(gx.ravel(), gy.ravel(), rings)
                vals = sub.ravel()[m]
                if vals.size:
                    acc.setdefault(z.zone_id, []).append(vals)
        for zid, chunks in acc.items():
            vals = np.concatenate(chunks)
            row = got.loc[zid]
            assert row["count"] == vals.size
            assert row["mean"] == pytest.approx(vals.mean())
            assert row["min"] == vals.min() and row["max"] == vals.max()
        # zones with no pixels are absent (reference: no_data fill)
        assert set(got.index) == set(acc.keys())

    def test_zonal_threshold_rules(self, spark, images_df, small_images_pdf, zones_pdf):
        zones_df = spark.createDataFrame(zones_pdf)
        lo, hi = 100.0, 200.0
        got = zonal_band_stats(images_df, zones_df, min_thres=lo, max_thres=hi).toPandas()
        assert (got["min"] >= lo).all() and (got["max"] <= hi).all()

    def test_zonal_mode_median_vs_numpy(self, spark, images_df, small_images_pdf, zones_pdf):
        from rsgislib_spark.operators.zonal import zonal_band_mode_median

        zones_df = spark.createDataFrame(zones_pdf)
        got = zonal_band_mode_median(images_df, zones_df).toPandas().set_index("zone_id")
        acc = {}
        for rec in small_images_pdf.itertuples(index=False):
            img = codecs.decode_image(rec.bytes, rec.fmt, rec.h, rec.w)
            maxy = rec.miny + rec.h * datagen.PIXEL_SIZE
            for z in zones_pdf.itertuples(index=False):
                rings = geom.wkb_to_polygon(z.geometry)
                x1, y1, xs, ys, have = pixelmath.zonal_window(
                    [z.minx], [z.maxx], [z.miny], [z.maxy],
                    rec.minx, maxy, datagen.PIXEL_SIZE, datagen.PIXEL_SIZE,
                    rec.w, rec.h,
                )
                if not have[0]:
                    continue
                x1_, y1_, xs_, ys_ = int(x1[0]), int(y1[0]), int(xs[0]), int(ys[0])
                sub = img[y1_ : y1_ + ys_, x1_ : x1_ + xs_]
                pcx = rec.minx + (np.arange(x1_, x1_ + xs_) + 0.5) * datagen.PIXEL_SIZE
                pcy = maxy - (np.arange(y1_, y1_ + ys_) + 0.5) * datagen.PIXEL_SIZE
                gx, gy = np.meshgrid(pcx, pcy)
                m = geom.points_in_polygon(gx.ravel(), gy.ravel(), rings)
                vals = sub.ravel()[m]
                if vals.size:
                    acc.setdefault(z.zone_id, []).append(vals.astype(np.int64))
        assert set(got.index) == set(acc.keys())
        for zid, chunks in acc.items():
            vals = np.concatenate(chunks)
            u, c = np.unique(vals, return_counts=True)
            assert got.loc[zid, "mode"] == u[np.argmax(c)]
            assert got.loc[zid, "median"] == pytest.approx(round(float(np.median(vals)), 1))
            assert got.loc[zid, "n_px"] == vals.size


# ---------------------------------------------------------------- points
class TestPointExtract:
    def test_values_vs_numpy(self, spark, images_df, small_images_pdf, points_pdf):
        pts_df = spark.createDataFrame(points_pdf)
        got = (
            extract_point_values(images_df, pts_df, out_no_data_val=-9999.0)
            .toPandas()
            .set_index("pt_id")
            .sort_index()
        )
        assert len(got) == len(points_pdf)
        # oracle
        import collections

        best = collections.defaultdict(list)
        for rec in small_images_pdf.itertuples(index=False):
            img = codecs.decode_image(rec.bytes, rec.fmt, rec.h, rec.w)
            maxy = rec.miny + rec.h * datagen.PIXEL_SIZE
            maxx = rec.minx + rec.w * datagen.PIXEL_SIZE
            for p in points_pdf.itertuples(index=False):
                if rec.minx <= p.x <= maxx and rec.miny <= p.y <= maxy:
                    ix = min(int((p.x - rec.minx) // datagen.PIXEL_SIZE), rec.w - 1)
                    iy = min(int((maxy - p.y) // datagen.PIXEL_SIZE), rec.h - 1)
                    best[p.pt_id].append((rec.image_id, float(img[iy, ix])))
        for p in points_pdf.itertuples(index=False):
            row = got.loc[p.pt_id]
            if p.pt_id in best:
                exp = sorted(best[p.pt_id])[0][1]  # first image_id wins
                assert row["value"] == exp
            else:
                assert row["value"] == -9999.0

    def test_threshold_to_nodata(self, spark, images_df, points_pdf):
        pts_df = spark.createDataFrame(points_pdf)
        got = extract_point_values(
            images_df, pts_df, min_thres=120, max_thres=140, out_no_data_val=-1.0
        ).toPandas()
        ok = got[got.value != -1.0]
        assert ((ok.value >= 120) & (ok.value <= 140)).all()


# ------------------------------------------------------------------- knn
class TestKNN:
    def _brute(self, q, t, tv, k, metric, thres=np.inf, vi=None):
        from rsgislib_spark.operators.knn import _distances

        dm = _distances(q, t, metric, 2.0, vi)
        out = []
        for i in range(len(q)):
            d = dm[i]
            order = np.argsort(d, kind="stable")
            sel = [j for j in order if d[j] < thres][:k]
            out.append(sel)
        return out, dm

    @pytest.mark.parametrize("metric", ["euclidean", "manhattan", "chebyshev"])
    def test_knn_apply_vs_brute(self, spark, points_pdf, metric):
        train = points_pdf[points_pdf.is_train == 1]
        apply_ = points_pdf[points_pdf.is_train == 0]
        feat = ["feat_1", "feat_2", "feat_3"]
        got = (
            knn_apply(
                spark.createDataFrame(apply_),
                spark.createDataFrame(train),
                feat, "feat_1", k=3, metric=metric, summary="mean",
            )
            .toPandas()
            .set_index("pt_id")
        )
        q = apply_[feat].to_numpy(float)
        t = train[feat].to_numpy(float)
        tv = train["feat_1"].to_numpy(float)
        sels, _ = self._brute(q, t, tv, 3, metric)
        for i, pid in enumerate(apply_["pt_id"]):
            assert got.loc[pid, "out_val"] == pytest.approx(tv[sels[i]].mean())

    def test_knn_mahalanobis_and_threshold(self, spark, points_pdf):
        train = points_pdf[points_pdf.is_train == 1]
        apply_ = points_pdf[points_pdf.is_train == 0]
        feat = ["feat_1", "feat_2", "feat_3"]
        got = (
            knn_apply(
                spark.createDataFrame(apply_), spark.createDataFrame(train),
                feat, "feat_2", k=12, metric="mahalanobis", summary="median",
                dist_thres=1.0,
            ).toPandas().set_index("pt_id")
        )
        t = train[feat].to_numpy(float)
        vi = np.linalg.pinv(np.atleast_2d(np.cov(t, rowvar=False)))
        q = apply_[feat].to_numpy(float)
        tv = train["feat_2"].to_numpy(float)
        sels, dm = self._brute(q, t, tv, 12, "mahalanobis", thres=1.0, vi=vi)
        for i, pid in enumerate(apply_["pt_id"]):
            if sels[i]:
                assert got.loc[pid, "out_val"] == pytest.approx(np.median(tv[sels[i]]))
            else:
                assert np.isnan(got.loc[pid, "out_val"])

    def test_closest_point_join(self, spark, points_pdf):
        base = points_pdf.iloc[:50]
        match = points_pdf.iloc[50:]
        got = (
            closest_point_join(
                spark.createDataFrame(base), spark.createDataFrame(match)
            ).toPandas().set_index("pt_id")
        )
        mx = match[["x", "y"]].to_numpy(float)
        mid = match["pt_id"].to_numpy()
        for p in base.itertuples(index=False):
            d = np.hypot(mx[:, 0] - p.x, mx[:, 1] - p.y)
            j = int(np.argmin(d))
            assert got.loc[p.pt_id, "closest_id"] == mid[j]
            assert got.loc[p.pt_id, "dist"] == pytest.approx(d[j])

    def test_closest_point_tolerance(self, spark, points_pdf):
        base = points_pdf.iloc[:20]
        match = points_pdf.iloc[50:]
        got = closest_point_join(
            spark.createDataFrame(base), spark.createDataFrame(match), tolerance=1000.0
        ).toPandas()
        far = got[got.closest_id.isna()]
        near = got[~got.closest_id.isna()]
        assert (near.dist < 1000.0).all()
        assert far.dist.isna().all()

    def test_radius_count_vs_brute(self, spark, points_pdf):
        r = 50000.0
        got = radius_count(spark.createDataFrame(points_pdf), r).toPandas().set_index("pt_id")
        xs = points_pdf["x"].to_numpy(float)
        ys = points_pdf["y"].to_numpy(float)
        d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
        exp = (d2 <= r * r).sum(axis=1) - 1
        for i, pid in enumerate(points_pdf["pt_id"]):
            assert got.loc[pid, "n_in_radius"] == exp[i]

    def test_radius_count_bucketed_matches_broadcast(self, spark, points_pdf):
        from rsgislib_spark.operators.knn import radius_count_bucketed

        r = 50000.0
        pts = spark.createDataFrame(points_pdf)
        brute = radius_count(pts, r).toPandas().set_index("pt_id")["n_in_radius"]
        buck = radius_count_bucketed(pts, r).toPandas().set_index("pt_id")["n_in_radius"]
        assert len(buck) == len(points_pdf)
        for pid in points_pdf["pt_id"]:
            assert buck[pid] == brute[pid]

    @pytest.mark.parametrize("cell", [2000.0, 50000.0])
    def test_knn_bucketed_equals_brute(self, spark, points_pdf, cell):
        """Small cell forces multi-round ring escalation; large cell
        resolves in one round — both must equal brute force exactly."""
        from rsgislib_spark.operators.knn import knn_points_bucketed

        k = 4
        pts = spark.createDataFrame(points_pdf)
        qs = spark.createDataFrame(points_pdf.iloc[:40])
        got = (
            knn_points_bucketed(qs, pts, k=k, cell=cell)
            .toPandas()
            .sort_values(["query_id", "rank"])
        )
        xs = points_pdf["x"].to_numpy(float)
        ys = points_pdf["y"].to_numpy(float)
        ids = points_pdf["pt_id"].to_numpy()
        for qrow in points_pdf.iloc[:40].itertuples(index=False):
            d2 = (xs - qrow.x) ** 2 + (ys - qrow.y) ** 2
            order = np.lexsort((ids, d2))
            order = order[ids[order] != qrow.pt_id][:k]
            sub = got[got.query_id == qrow.pt_id]
            assert list(sub["nbr_id"]) == list(ids[order])
            assert np.allclose(sub["d2"].to_numpy(), d2[order])

    def test_knn_bucketed_dist_thres_strict(self, spark, points_pdf):
        from rsgislib_spark.operators.knn import knn_points_bucketed

        pts = spark.createDataFrame(points_pdf)
        got = knn_points_bucketed(pts, pts, k=5, cell=4096.0, dist_thres=20000.0).toPandas()
        assert (got["d2"] < 20000.0 ** 2).all()
        # brute-force the expected per-query count under the threshold
        xs = points_pdf["x"].to_numpy(float)
        ys = points_pdf["y"].to_numpy(float)
        ids = points_pdf["pt_id"].to_numpy()
        cnt = got.groupby("query_id").size()
        for i, pid in enumerate(ids):
            d2 = (xs - xs[i]) ** 2 + (ys - ys[i]) ** 2
            n = int(((d2 < 20000.0 ** 2) & (ids != pid)).sum())
            assert cnt.get(pid, 0) == min(n, 5)

    @pytest.mark.parametrize("cell", [30.0, 400.0])
    def test_knn_features_bucketed_equals_brute(self, spark, points_pdf, cell):
        """3-D feature grid buckets == brute force, for an undersized
        cell (multi-round escalation) and a roomy one (single round)."""
        from rsgislib_spark.operators.knn import knn_features_bucketed

        feats = ["size_px", "x", "y"]  # any 3 numeric cols from the fixture
        pdf = points_pdf.copy()
        pdf["size_px"] = (pdf["pt_id"] * 37) % 500
        k = 3
        df = spark.createDataFrame(pdf)
        qs = spark.createDataFrame(pdf.iloc[:30])
        got = (
            knn_features_bucketed(qs, df, feats, k=k, cell=cell)
            .toPandas()
            .sort_values(["query_id", "rank"])
        )
        X = pdf[feats].to_numpy(float)
        ids = pdf["pt_id"].to_numpy()
        for qrow in pdf.iloc[:30].itertuples(index=False):
            qv = np.array([getattr(qrow, c) for c in feats], dtype=float)
            d2 = ((X - qv) ** 2).sum(axis=1)
            order = np.lexsort((ids, d2))
            order = order[ids[order] != qrow.pt_id][:k]
            sub = got[got.query_id == qrow.pt_id]
            assert list(sub["nbr_id"]) == list(ids[order]), qrow.pt_id
            assert np.allclose(sub["d2"].to_numpy(), d2[order])

    @pytest.mark.parametrize("d,cell", [(4, 250.0), (5, 700.0)])
    def test_knn_features_bucketed_high_d(self, spark, points_pdf, d, cell):
        """d ≥ 4 struct-key path (no radix budget) == brute force,
        including NEGATIVE feature values — the generalization past the
        packed key (VERDICT r4 task 5; ref RSGISRATKNN.cpp:82-86 takes
        arbitrarily many fields)."""
        from rsgislib_spark.operators.knn import knn_features_bucketed

        pdf = points_pdf.copy()
        pdf["g1"] = (pdf["pt_id"] * 37) % 1000
        pdf["g2"] = (pdf["pt_id"] * 41) % 1000 - 500  # negatives
        pdf["g3"] = (pdf["pt_id"] * 43) % 1000
        pdf["g4"] = (pdf["pt_id"] * 47) % 1000
        pdf["g5"] = (pdf["pt_id"] * 53) % 1000 - 250
        feats = ["g1", "g2", "g3", "g4", "g5"][:d]
        k = 3
        df = spark.createDataFrame(pdf)
        qs = spark.createDataFrame(pdf.iloc[:25])
        got = (
            knn_features_bucketed(qs, df, feats, k=k, cell=cell)
            .toPandas()
            .sort_values(["query_id", "rank"])
        )
        X = pdf[feats].to_numpy(float)
        ids = pdf["pt_id"].to_numpy()
        for qrow in pdf.iloc[:25].itertuples(index=False):
            qv = np.array([getattr(qrow, c) for c in feats], dtype=float)
            d2 = ((X - qv) ** 2).sum(axis=1)
            order = np.lexsort((ids, d2))
            order = order[ids[order] != qrow.pt_id][:k]
            sub = got[got.query_id == qrow.pt_id]
            assert list(sub["nbr_id"]) == list(ids[order]), qrow.pt_id
            assert np.allclose(sub["d2"].to_numpy(), d2[order])

    def test_closest_point_join_bucketed_matches_broadcast(self, spark, points_pdf):
        base = spark.createDataFrame(points_pdf.iloc[:50])
        match = spark.createDataFrame(points_pdf.iloc[50:])
        a = (
            closest_point_join(base, match, tolerance=80000.0)
            .toPandas().set_index("pt_id").sort_index()
        )
        b = (
            closest_point_join(base, match, tolerance=80000.0, strategy="bucketed")
            .toPandas().set_index("pt_id").sort_index()
        )
        assert list(a.index) == list(b.index)
        for pid in a.index:
            if pd.isna(a.loc[pid, "closest_id"]):
                assert pd.isna(b.loc[pid, "closest_id"])
            else:
                assert a.loc[pid, "closest_id"] == b.loc[pid, "closest_id"]
                assert a.loc[pid, "dist"] == pytest.approx(b.loc[pid, "dist"])


# ------------------------------------------------- round-3 regression fixes
class TestRound3Fixes:
    def test_median_even_count_distinct_middles(self, spark):
        """ADVICE r2 (high): histogram {1:2, 2:1, 3:1} (n=4, middles 1 and
        2) must give median 1.5 — the double-division rank bug returned
        2.0 (the upper middle) for even counts with distinct middles."""
        from rsgislib_spark.operators.zonal import mode_median_from_histogram

        hist = spark.createDataFrame(
            pd.DataFrame(
                {"zone_id": [7, 7, 7], "value": [1, 2, 3], "cnt": [2, 1, 1]}
            )
        )
        got = mode_median_from_histogram(hist, ["zone_id"]).toPandas()
        assert got.loc[0, "median"] == 1.5
        assert got.loc[0, "mode"] == 1
        assert got.loc[0, "n_px"] == 4
        # odd-count sanity: {1:2, 2:1} -> median 1.0
        hist2 = spark.createDataFrame(
            pd.DataFrame({"zone_id": [1, 1], "value": [1, 2], "cnt": [2, 1]})
        )
        got2 = mode_median_from_histogram(hist2, ["zone_id"]).toPandas()
        assert got2.loc[0, "median"] == 1.0

    def test_knn_bucketed_query_outside_point_bbox(self, spark, points_pdf):
        """ADVICE r2 (medium): a query far outside the point bbox must
        still find its true k nearest — max_ring derived from the points
        span alone under-covered the forced final ring."""
        from rsgislib_spark.operators.knn import knn_points_bucketed

        pts = points_pdf.iloc[:60]
        span = max(
            pts.x.max() - pts.x.min(), pts.y.max() - pts.y.min()
        )
        qpdf = pts.iloc[:5].copy()
        qpdf["pt_id"] = qpdf["pt_id"] + 1_000_000
        qpdf["x"] = qpdf["x"] + 3.0 * span  # well outside the point bbox
        k = 3
        got = (
            knn_points_bucketed(
                spark.createDataFrame(qpdf),
                spark.createDataFrame(pts),
                k=k,
                cell=span / 8.0,  # small cell: points-only max_ring would under-cover
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
        )
        xs = pts["x"].to_numpy(float)
        ys = pts["y"].to_numpy(float)
        ids = pts["pt_id"].to_numpy()
        for q in qpdf.itertuples(index=False):
            d2 = (xs - q.x) ** 2 + (ys - q.y) ** 2
            order = np.lexsort((ids, d2))[:k]
            sub = got[got.query_id == q.pt_id]
            assert list(sub["nbr_id"]) == list(ids[order]), q.pt_id
            assert np.allclose(sub["d2"].to_numpy(), d2[order])

    def test_closest_point_bucketed_nan_not_null_dist(self, spark, points_pdf):
        """ADVICE r2 (low): beyond-tolerance rows must emit NaN dist (not
        SQL NULL) from the bucketed path, matching the broadcast path."""
        from pyspark.sql import functions as F

        base = spark.createDataFrame(points_pdf.iloc[:20])
        match = spark.createDataFrame(points_pdf.iloc[50:])
        res = closest_point_join(base, match, tolerance=1000.0, strategy="bucketed")
        unmatched = res.filter(F.col("closest_id").isNull())
        assert unmatched.count() > 0  # fixture guarantees some far points
        assert unmatched.filter(F.col("dist").isNull()).count() == 0
        assert unmatched.filter(F.isnan("dist")).count() == unmatched.count()

    @pytest.mark.parametrize(
        "how", ["mean", "median", "mode", "min", "max", "stddev"]
    )
    def test_summarize_rows_matches_scalar(self, how):
        """The vectorized (batch × k) summarizer must agree with the
        reference per-row _summarize for every summary, including rows
        with zero valid neighbours."""
        from rsgislib_spark.operators.knn import _summarize, _summarize_rows

        rng = np.random.RandomState(7)
        vals = rng.randint(0, 9, size=(40, 6)).astype(float)
        valid = rng.rand(40, 6) < 0.7
        valid[3, :] = False  # a row with no neighbours
        got = _summarize_rows(vals, valid, how)
        for i in range(len(vals)):
            v = vals[i][valid[i]]
            if v.size == 0:
                assert np.isnan(got[i])
            else:
                assert got[i] == pytest.approx(_summarize(v, how)), (how, i)


# ------------------------------------------------ decode-inclusive pipeline
class TestNorthStarDecoded:
    SF = "/root/testdata/sf0.001"

    def test_encode_stage_roundtrips_exactly(self, spark):
        """The bytes the encode stage emits must decode back to the exact
        synthetic grid (raw + png-class are exact codecs), with both
        formats present — otherwise the 'decode-inclusive' bench would be
        timing a no-op."""
        from rsgislib_spark.kernels import bands as BK
        from rsgislib_spark.pipeline import encode_images_df

        pdf = encode_images_df(spark, self.SF).limit(40).toPandas()
        assert {"raw", "png"} <= set(pdf["fmt"])
        for rec in pdf.itertuples(index=False):
            grid = (
                BK.synth_band_grid(int(rec.image_key), int(rec.w), int(rec.h), "red")
                .astype(np.uint8)
            )
            got = codecs.decode_image(rec.bytes, rec.fmt, int(rec.h), int(rec.w))
            np.testing.assert_array_equal(got, grid)

    def test_decoded_equals_synthetic_north_star(self, spark):
        """north_star_decoded must produce exactly the synthetic
        north_star result — the codec round-trip is lossless, so any
        difference is a decode-path bug."""
        from rsgislib_spark.pipeline import north_star, north_star_decoded

        a = north_star(spark, self.SF).toPandas().sort_values("zone_id").reset_index(drop=True)
        b = (
            north_star_decoded(spark, self.SF)
            .toPandas()
            .sort_values("zone_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


def test_percentile_rank_integer_arithmetic(spark):
    """p=0.1 with n=110: double arithmetic gives ceil(11.000000000000002)=12
    (wrong order statistic); the integer rank must select the 11th value
    (ADVICE r3: zonal percentiles_from_histogram)."""
    import pandas as pd
    from rsgislib_spark.operators.zonal import percentiles_from_histogram

    # zone 1: values 1..110 each with count 1 -> p10 = 11th value = 11
    hist = spark.createDataFrame(
        pd.DataFrame({"zone": 1, "value": range(1, 111), "cnt": 1})
    )
    out = percentiles_from_histogram(hist, ["zone"], ps=(0.1,)).toPandas()
    assert out.loc[0, "n_px"] == 110
    assert out.loc[0, "p10"] == 11


def test_extract_chips_rejects_small_image(spark):
    import pandas as pd
    from rsgislib_spark.operators.chips import extract_chips

    images = spark.createDataFrame(
        pd.DataFrame([{"image_key": 9, "w": 4, "h": 64, "minx": 0.0, "miny": 0.0}])
    )
    points = spark.createDataFrame(
        pd.DataFrame({"pt_id": [1], "x": [5.0], "y": [635.0]})
    )
    import pytest as _pytest
    with _pytest.raises(Exception, match="smaller than chip_size"):
        extract_chips(images, points, chip_size=8).collect()


def test_extract_chips_skips_unanchored_small_image(spark):
    """An undersized image NO point falls in must not kill the job —
    the guard fires only for points that would actually mis-anchor."""
    import pandas as pd
    from rsgislib_spark.operators.chips import extract_chips

    images = spark.createDataFrame(
        pd.DataFrame(
            [
                {"image_key": 9, "w": 4, "h": 64, "minx": 0.0, "miny": 0.0},
                {"image_key": 10, "w": 64, "h": 64, "minx": 1000.0, "miny": 0.0},
            ]
        )
    )
    # the only point anchors in the NORMAL image; the 4x64 thumbnail is
    # a no-op, not a ValueError
    points = spark.createDataFrame(
        pd.DataFrame({"pt_id": [1], "x": [1325.0], "y": [315.0]})
    )
    out = extract_chips(images, points, chip_size=8).toPandas()
    assert out.image_key.tolist() == [10]
