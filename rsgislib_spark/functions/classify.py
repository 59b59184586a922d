"""Classification — train → broadcast → predict, the reference's
classifier surface (python/rsgislib/classification/: sklearn/xgboost
wrappers fit locally on extracted samples, predict per block; surface
list classification/__init__.py:222-1533). Those libraries are absent
from this environment, so the engine ships its own minimal models with
the same physical shape:

 - nearest-centroid (q73's pattern — closed-form from integer sums);
 - :func:`logreg_fit` / :func:`logreg_predict` — LOGISTIC REGRESSION
   trained DISTRIBUTED: each gradient-descent step is one Catalyst
   aggregation (per-sample sigmoid + residual products, summed
   map-side); weights live on the driver and re-enter the plan as
   literals. Prediction is a pure column expression.

Determinism: zero-init weights, fixed iteration count and learning
rate, gradient sums ROUND()ed before the weight update — the same
replay runs relationally in the SQL oracle, so training itself is
hash-exact across engines.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _round9(x: float) -> float:
    """Half-away 9-digit round — pins down last-ulp exp() differences
    between engines before they compound across iterations."""
    return float(np.copysign(np.floor(abs(x) * 1e9 + 0.5) / 1e9, x))


def logreg_fit(
    df: DataFrame,
    feat_cols: Sequence[str],
    label_col: str,
    n_iter: int = 10,
    lr: float = 0.1,
    feat_scale: float = 1.0,
) -> dict:
    """Batch-GD logistic regression; returns {"w": [...], "b": float}.

    Each iteration is ONE distributed aggregation:
        p_i = sigmoid(w·x_i + b);  g_w = Σ(p_i − y_i)·x_i / n
    computed as Catalyst expressions (JVM exp, map-side partial sums).
    Feature scaling (x/feat_scale) keeps the exponent in range for raw
    integer features."""
    w = [0.0] * len(feat_cols)
    b = 0.0
    n = df.count()
    for _ in range(n_iter):
        z = F.lit(float(b))
        for wj, c in zip(w, feat_cols):
            z = z + F.lit(float(wj)) * (F.col(c).cast("double") / F.lit(float(feat_scale)))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = p - F.col(label_col).cast("double")
        aggs = [
            F.sum(r * (F.col(c).cast("double") / F.lit(float(feat_scale)))).alias(f"g{j}")
            for j, c in enumerate(feat_cols)
        ]
        aggs.append(F.sum(r).alias("gb"))
        row = df.agg(*aggs).first()
        w = [
            _round9(wj - lr * _round9(float(row[f"g{j}"]) / n))
            for j, wj in enumerate(w)
        ]
        b = _round9(b - lr * _round9(float(row["gb"]) / n))
    return {"w": w, "b": b, "feat_cols": list(feat_cols), "feat_scale": feat_scale}


def logreg_predict(df: DataFrame, model: dict, out: str = "pred") -> DataFrame:
    """Append the predicted class (sigmoid(w·x+b) > 0.5 ⇔ w·x+b > 0) —
    a pure column expression, streams at scan speed."""
    z = F.lit(float(model["b"]))
    for wj, c in zip(model["w"], model["feat_cols"]):
        z = z + F.lit(float(wj)) * (
            F.col(c).cast("double") / F.lit(float(model["feat_scale"]))
        )
    return df.withColumn(out, (z > 0).cast("int"))


# ------------------------------------------------ pluggable ML backends
#
# Same seam pattern as kernels/codecs.py and kernels/crs.py: the builtin
# deterministic models above are the default (oracle-hashed); the
# reference's sklearn/xgboost wrapper surface
# (classification/classsklearn.py train_sklearn_classifier /
# apply_sklearn_classifier; classxgboost.py) routes through a probed
# external backend when those libraries are installed — absent in the
# sandbox, live after `pip install scikit-learn` (or xgboost) at deploy.
# The physical shape is the reference's exactly: fit locally on an
# extracted sample table (driver-fenced collect), ship the fitted model
# to executors once, predict Arrow-batched per block.

_EXTERNAL_ML = None  # None = not yet probed; [] = probed, absent


class _SklearnBackend:
    """scikit-learn estimators behind the generic fit/apply wrapper."""

    name = "sklearn"

    def __init__(self):
        import sklearn  # noqa: F401 — probe
        from sklearn import ensemble, neural_network, svm
        self._specs = {
            "random_forest": ensemble.RandomForestClassifier,
            "extra_trees": ensemble.ExtraTreesClassifier,
            "gradient_boosting": ensemble.GradientBoostingClassifier,
            "svm": svm.SVC,
            "mlp": neural_network.MLPClassifier,
        }

    def supports(self, spec: str) -> bool:
        return spec in self._specs

    def fit(self, spec: str, X, y, params: dict):
        est = self._specs[spec](**params)
        est.fit(X, y)
        return est

    @staticmethod
    def predict(est, X):
        return est.predict(X)


class _XGBoostBackend:
    """xgboost sklearn-API estimator (ref classification/classxgboost.py)."""

    name = "xgboost"

    def __init__(self):
        import xgboost
        self._xgb = xgboost

    def supports(self, spec: str) -> bool:
        return spec == "xgboost"

    def fit(self, spec: str, X, y, params: dict):
        est = self._xgb.XGBClassifier(**params)
        est.fit(X, y)
        return est

    @staticmethod
    def predict(est, X):
        return est.predict(X)


def external_ml_backends() -> list:
    """External ML backends available in this environment (probed once).
    Empty in the sandbox (no sklearn/xgboost); tests monkeypatch the
    module global to inject a fake."""
    global _EXTERNAL_ML
    if _EXTERNAL_ML is None:
        found = []
        for cls in (_SklearnBackend, _XGBoostBackend):
            try:
                found.append(cls())
            except Exception:
                pass
        _EXTERNAL_ML = found
    return _EXTERNAL_ML


#: Driver fence for the training-sample collect: 5M rows × ~100 B of
#: features ≈ 500 MB — the same ceiling as the other broadcast builds.
MAX_TRAIN_ROWS = 5_000_000


def fit_classifier(
    train_df: DataFrame,
    feat_cols: Sequence[str],
    label_col: str,
    spec: str = "logreg",
    params: dict | None = None,
) -> dict:
    """Generic train wrapper (ref train_sklearn_classifier,
    classification/classsklearn.py): ``spec="logreg"`` is the builtin
    distributed-GD model (deterministic, oracle-hashed); tree/kernel
    specs fit locally on the driver-fenced sample collect through the
    external backend and raise with the deploy instruction when none is
    installed."""
    params = dict(params or {})
    if spec == "logreg":
        m = logreg_fit(train_df, feat_cols, label_col, **params)
        m["spec"] = "logreg"
        return m
    for be in external_ml_backends():
        if be.supports(spec):
            from rsgislib_spark.qcommon import fenced_small_pdf

            pdf = fenced_small_pdf(
                train_df.select(*feat_cols, label_col),
                f"fit_classifier({spec}) training set",
                "sample/stratify the training table first "
                "(functions/sampling.py) — model fitting is local by "
                "design, matching the reference's extracted-samples flow.",
                max_rows=MAX_TRAIN_ROWS,
            )
            X = pdf[list(feat_cols)].to_numpy(np.float64)
            y = pdf[label_col].to_numpy()
            est = be.fit(spec, X, y, params)
            return {"spec": spec, "backend": be.name, "est": est,
                    "feat_cols": list(feat_cols)}
    raise ValueError(
        f"classifier spec {spec!r} needs an external ML backend and none "
        "is installed — `pip install scikit-learn` (or xgboost) at deploy "
        "(functions/classify.py external_ml_backends seam)")


def apply_classifier(df: DataFrame, model: dict, out: str = "pred") -> DataFrame:
    """Generic predict wrapper (ref apply_sklearn_classifier): builtin
    models are pure column expressions; external models predict
    Arrow-batched per block (the fitted estimator ships to executors
    once inside the task closure — the reference's block-apply shape)."""
    if model.get("spec") == "logreg" or "w" in model:
        return logreg_predict(df, model, out=out)

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    feat_cols = model["feat_cols"]
    est = model["est"]
    backend_name = model["backend"]
    cols = df.columns
    out_schema = StructType(list(df.schema.fields) + [StructField(out, LongType())])

    def _pred(it):
        for pdf in it:
            if len(pdf):
                X = pdf[feat_cols].to_numpy(np.float64)
                # predict via the same backend class (static method —
                # no re-probe; the estimator itself was shipped pickled)
                if backend_name == "xgboost":
                    yhat = _XGBoostBackend.predict(est, X)
                else:
                    yhat = _SklearnBackend.predict(est, X)
                pdf = pdf.copy()
                pdf[out] = np.asarray(yhat).astype(np.int64)
            else:
                pdf = pdf.copy()
                pdf[out] = pd.Series([], dtype=np.int64)
            yield pdf[cols + [out]]

    return df.mapInPandas(_pred, schema=out_schema)
