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
