"""kmeans / isodata / PCA unit correctness against numpy references."""

import numpy as np
import pandas as pd
import pytest

from rsgislib_spark.functions.clustering import isodata_fit, kmeans_assign, kmeans_fit
from rsgislib_spark.functions.pca import (
    pca_apply,
    pca_fit,
    sym3_eigenvalues,
)


def _blobs(seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[0, 0], [100, 0], [0, 100]], dtype=float)
    pts = np.concatenate([c + rng.normal(0, 3, size=(40, 2)) for c in centers])
    pts = pts[rng.permutation(len(pts))]  # ids interleave the blobs
    ids = np.arange(len(pts))
    return pd.DataFrame({"pt_id": ids, "fx": pts[:, 0], "fy": pts[:, 1]})


def test_kmeans_recovers_blobs(spark):
    pdf = _blobs()
    df = spark.createDataFrame(pdf)
    cents = kmeans_fit(df, ["fx", "fy"], k=3, n_iter=15, id_col="pt_id")
    got = sorted(tuple(np.round(c, -1)) for c in cents)
    want = sorted([(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)])
    assert got == want
    # assignments are the true blobs (40 each)
    counts = (
        kmeans_assign(df, ["fx", "fy"], cents).groupBy("cluster").count().toPandas()
    )
    assert sorted(counts["count"]) == [40, 40, 40]


def test_kmeans_matches_numpy_lloyd(spark):
    """Exact step-parity with a numpy Lloyd reference (same init, same
    tie-break) over a few iterations."""
    pdf = _blobs(seed=3)
    df = spark.createDataFrame(pdf)
    X = pdf[["fx", "fy"]].to_numpy(float)
    cents = X[:4].copy()  # init = 4 smallest pt_ids
    for _ in range(3):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)  # argmin takes first (smallest cid) on ties
        for c in range(4):
            if (lab == c).any():
                cents[c] = X[lab == c].mean(axis=0)
    got = kmeans_fit(df, ["fx", "fy"], k=4, n_iter=3, id_col="pt_id")
    assert np.allclose(np.array(got), cents, atol=1e-9)


def test_isodata_drops_small_clusters(spark):
    pdf = _blobs()
    df = spark.createDataFrame(pdf)
    # k=5 over 3 blobs: surplus centroids collapse / go empty and drop
    cents = isodata_fit(
        df, ["fx", "fy"], k=5, n_iter=10, min_cluster_size=10, id_col="pt_id"
    )
    assert 3 <= len(cents) <= 5
    # every kept centroid sits on one of the true blobs
    want = {(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)}
    got = {(abs(round(c[0], -1)), abs(round(c[1], -1))) for c in cents}
    assert got <= want


def test_pca_fit_apply_invariants(spark):
    rng = np.random.default_rng(5)
    # correlated 3D cloud
    base = rng.normal(0, 1, size=(500, 3))
    M = np.array([[5, 0, 0], [4, 2, 0], [1, 1, 0.5]])
    X = base @ M.T + np.array([10, -3, 7])
    pdf = pd.DataFrame(X, columns=["f1", "f2", "f3"])
    df = spark.createDataFrame(pdf)
    model = pca_fit(df, ["f1", "f2", "f3"])
    # components orthonormal
    VVt = model.components @ model.components.T
    assert np.allclose(VVt, np.eye(3), atol=1e-10)
    # eigenvalues descending, reconstruct the covariance
    assert model.eigenvalues[0] >= model.eigenvalues[1] >= model.eigenvalues[2]
    cov = np.cov(X, rowvar=False, bias=True)
    rec = model.components.T @ np.diag(model.eigenvalues) @ model.components
    assert np.allclose(rec, cov, atol=1e-8)
    # projected variance per component == eigenvalue; whiten → unit var
    proj = pca_apply(df, model).toPandas()
    for i in range(3):
        assert proj[f"pc{i+1}"].var(ddof=0) == pytest.approx(model.eigenvalues[i], rel=1e-6)
        assert proj[f"pc{i+1}"].mean() == pytest.approx(0.0, abs=1e-8)
    white = pca_apply(df, model, whiten=True).toPandas()
    assert white["pc1"].var(ddof=0) == pytest.approx(1.0, rel=1e-6)


def test_logreg_learns_separable_boundary(spark):
    from rsgislib_spark.functions.classify import logreg_fit, logreg_predict

    rng = np.random.default_rng(4)
    X = rng.uniform(0, 10, size=(400, 2))
    y = (X[:, 0] + X[:, 1] > 10).astype(int)
    pdf = pd.DataFrame({"fa": X[:, 0], "fb": X[:, 1], "y": y})
    df = spark.createDataFrame(pdf)
    model = logreg_fit(df, ["fa", "fb"], "y", n_iter=60, lr=1.0, feat_scale=10.0)
    out = logreg_predict(df, model).toPandas()
    acc = (out["pred"] == out["y"]).mean()
    # 60 full-batch GD steps: well above the ~0.5 majority baseline
    assert acc > 0.85, acc
    # deterministic: refit gives identical weights
    model2 = logreg_fit(df, ["fa", "fb"], "y", n_iter=60, lr=1.0, feat_scale=10.0)
    assert model["w"] == model2["w"] and model["b"] == model2["b"]


def test_fit_classifier_builtin_spec_delegates_to_logreg(spark):
    from rsgislib_spark.functions.classify import apply_classifier, fit_classifier

    rng = np.random.default_rng(4)
    X = rng.uniform(0, 10, size=(200, 2))
    y = (X[:, 0] + X[:, 1] > 10).astype(int)
    df = spark.createDataFrame(pd.DataFrame({"fa": X[:, 0], "fb": X[:, 1], "y": y}))
    m = fit_classifier(df, ["fa", "fb"], "y", spec="logreg",
                       params={"n_iter": 60, "lr": 1.0, "feat_scale": 10.0})
    assert m["spec"] == "logreg" and "w" in m
    out = apply_classifier(df, m).toPandas()
    assert (out["pred"] == out["y"]).mean() > 0.85


def test_fit_classifier_external_raises_with_deploy_hint(spark, monkeypatch):
    from rsgislib_spark.functions import classify

    monkeypatch.setattr(classify, "_EXTERNAL_ML", [])  # probed, absent
    df = spark.createDataFrame(pd.DataFrame({"fa": [1.0], "y": [0]}))
    with pytest.raises(ValueError, match="pip install scikit-learn"):
        classify.fit_classifier(df, ["fa"], "y", spec="random_forest")


def test_fit_classifier_injected_backend_plumbs_fit_and_apply(spark, monkeypatch):
    """Fake backend proves the wrapper's physical shape: driver-fenced
    sample collect for fit, Arrow-batched block predict for apply."""
    from rsgislib_spark.functions import classify

    class _ConstPredictor:
        # duck-types the sklearn estimator contract; defined locally so
        # cloudpickle ships it BY VALUE inside the task closure (the
        # same way a real fitted estimator travels)
        def __init__(self, cls):
            self.cls = cls

        def predict(self, X):
            return np.full(len(X), self.cls)

    class _Majority:
        name = "sklearn"  # route apply through the sklearn predict path

        def supports(self, spec):
            return spec == "random_forest"

        def fit(self, spec, X, y, params):
            assert X.shape[1] == 2
            return _ConstPredictor(int(np.bincount(np.asarray(y).astype(int)).argmax()))

    monkeypatch.setattr(classify, "_EXTERNAL_ML", [_Majority()])
    pdf = pd.DataFrame({"fa": [0.0, 1.0, 2.0, 3.0], "fb": [1.0] * 4,
                        "y": [1, 1, 1, 0]})
    df = spark.createDataFrame(pdf)
    m = classify.fit_classifier(df, ["fa", "fb"], "y", spec="random_forest")
    assert m["backend"] == "sklearn" and m["est"].cls == 1
    out = classify.apply_classifier(df, m).toPandas()
    assert list(out.columns) == ["fa", "fb", "y", "pred"]
    assert (out["pred"] == 1).all()


def test_fit_classifier_training_fence(spark, monkeypatch):
    from rsgislib_spark.functions import classify

    class _Any:
        name = "sklearn"

        def supports(self, spec):
            return True

        def fit(self, *a):  # pragma: no cover — fence fires first
            raise AssertionError

    monkeypatch.setattr(classify, "_EXTERNAL_ML", [_Any()])
    monkeypatch.setattr(classify, "MAX_TRAIN_ROWS", 2)
    df = spark.createDataFrame(pd.DataFrame({"fa": [1.0, 2.0, 3.0], "y": [0, 1, 0]}))
    with pytest.raises(ValueError, match="sample/stratify"):
        classify.fit_classifier(df, ["fa"], "y", spec="random_forest")


def test_sklearn_parity_when_installed(spark):
    pytest.importorskip("sklearn")  # absent in the sandbox
    from rsgislib_spark.functions.classify import apply_classifier, fit_classifier

    rng = np.random.default_rng(7)
    X = rng.uniform(0, 10, size=(300, 2))
    y = (X[:, 0] > X[:, 1]).astype(int)
    df = spark.createDataFrame(pd.DataFrame({"fa": X[:, 0], "fb": X[:, 1], "y": y}))
    m = fit_classifier(df, ["fa", "fb"], "y", spec="random_forest",
                       params={"n_estimators": 20, "random_state": 0})
    out = apply_classifier(df, m).toPandas()
    assert (out["pred"] == out["y"]).mean() > 0.9


def test_sym3_closed_form_matches_lapack():
    rng = np.random.default_rng(9)
    for _ in range(25):
        A = rng.normal(0, 10, size=(3, 3))
        S = A @ A.T  # SPD
        got = sym3_eigenvalues(S)
        want = np.sort(np.linalg.eigvalsh(S))[::-1]
        assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


def test_mnf_fit_apply(spark):
    import numpy as np
    import pandas as pd
    from rsgislib_spark.functions.pca import mnf_apply, mnf_fit, zca_whitening_matrix

    rng = np.random.RandomState(11)
    base = rng.randn(400, 2) @ np.array([[3.0, 1.0], [0.0, 2.0]])
    pdf = pd.DataFrame({"pt_id": np.arange(400), "f1": base[:, 0], "f2": base[:, 1]})
    df = spark.createDataFrame(pdf)
    sample = df.filter("pt_id % 3 = 0")
    model = mnf_fit(df, ["f1", "f2"], sample=sample)

    # eigenvalues == generalized eigenvalues of (C_sample, C_full)
    def popcov(a):
        a = a - a.mean(0)
        return a.T @ a / len(a)

    cf = popcov(base)
    cs = popcov(base[::3])
    lam = np.sort(np.linalg.eigvals(np.linalg.inv(cf) @ cs).real)[::-1]
    assert np.allclose(model.eigenvalues, lam, atol=1e-9)

    # Catalyst-projected sample scores reproduce the eigenvalues
    proj = mnf_apply(sample, model).toPandas()
    for i, ev in enumerate(model.eigenvalues):
        v = proj[f"mnf{i+1}"].to_numpy()
        assert np.isclose(v.var(), ev, atol=1e-8)
    # components are decorrelated
    assert abs(np.cov(proj["mnf1"], proj["mnf2"], bias=True)[0, 1]) < 1e-8

    # whitening the full data gives unit covariance
    aw = zca_whitening_matrix(cf)
    assert np.allclose(aw @ cf @ aw, np.eye(2), atol=1e-10)


def test_isodata_add_remove_replay():
    """Unit replay of addRemoveClusters (RSGISClustering.cpp:1061-1146):
    discard-small, sequential near-centre removal, mean-sigma split."""
    from rsgislib_spark.functions.clustering import _isodata_add_remove

    mk = lambda c, s, n: {"centre": list(c), "std": list(s), "n": n}
    # split: mean std 30 > 20 and n=10 > 2*2 -> centre +/- std/2
    out = _isodata_add_remove([mk([10.0, 20.0], [20.0, 40.0], 10)], 2, 0.0, 20.0, 1)
    assert len(out) == 2
    assert out[0]["centre"] == [20.0, 40.0]   # + sigma/2
    assert out[1]["centre"] == [0.0, 0.0]     # - sigma/2 appended
    # no split when too small (n <= 2*min)
    out = _isodata_add_remove([mk([10.0, 20.0], [20.0, 40.0], 4)], 2, 0.0, 20.0, 1)
    assert len(out) == 1
    # discard small
    out = _isodata_add_remove(
        [mk([0.0, 0.0], [1.0, 1.0], 1), mk([9.0, 9.0], [1.0, 1.0], 50)], 5, 0.0, 99.0, 1
    )
    assert len(out) == 1 and out[0]["centre"] == [9.0, 9.0]
    # sequential close-removal: first of the close pair is erased, survivor kept
    out = _isodata_add_remove(
        [mk([0.0, 0.0], [1.0, 1.0], 9), mk([0.5, 0.0], [1.0, 1.0], 9),
         mk([50.0, 0.0], [1.0, 1.0], 9)],
        1, 2.0, 99.0, 1,
    )
    assert [c["centre"][0] for c in out] == [0.5, 50.0]
    # min_n_clusters guard: no removals at/below the floor
    out = _isodata_add_remove(
        [mk([0.0, 0.0], [1.0, 1.0], 1)], 5, 10.0, 99.0, 1
    )
    assert len(out) == 1
