"""kNN operators.

 - :func:`knn_apply` — feature-space kNN extrapolation, reference
   ``apply_rat_knn`` (binding ``python/src/rastergis.cpp:2095-2126``, impl
   ``src/rastergis/RSGISRATKNN.cpp:32-228``): for each apply row, the k
   nearest TRAINING rows under a distance metric, within ``dist_thres``,
   summarized (mean/median/mode/min/max/stddev). Defaults k=12,
   mahalanobis, median (``rastergis.cpp:2106-2109``).
   Metrics enum: euclidean/manhattan/mahalanobis/minkowski/chebyshev
   (``python/rsgislib/__init__.py:160-166``).

 - :func:`closest_point_join` — spatial k=1 join, reference
   ``match_closest_vec_pts`` (``vectorutils/__init__.py:3359-3473``):
   argmin of the full distance matrix, optional tolerance. The reference
   raises on ties; we break ties deterministically by smallest train id
   (documented deviation, SURVEY §2.3).

Physical shape: the training side is broadcast (small by construction —
it is the labelled sample set); each Arrow batch of apply rows computes a
vectorized chunked distance matrix. For huge training sets the
cell-bucketed two-phase join (bucket by cell, k-ring expand) applies —
see ``knn_points_bucketed``.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

METRICS = ("euclidean", "manhattan", "chebyshev", "minkowski", "mahalanobis")
SUMMARIES = ("mean", "median", "mode", "min", "max", "stddev")


def _distances(q: np.ndarray, t: np.ndarray, metric: str, p: float, vi: np.ndarray | None):
    """(nq, nt) distance matrix, vectorized."""
    d = q[:, None, :] - t[None, :, :]
    if metric == "euclidean":
        return np.sqrt((d * d).sum(axis=2))
    if metric == "manhattan":
        return np.abs(d).sum(axis=2)
    if metric == "chebyshev":
        return np.abs(d).max(axis=2)
    if metric == "minkowski":
        return (np.abs(d) ** p).sum(axis=2) ** (1.0 / p)
    if metric == "mahalanobis":
        # d Vi d^T per pair; Vi = inverse covariance of the TRAINING set
        return np.sqrt(np.einsum("qtf,fg,qtg->qt", d, vi, d))
    raise ValueError(f"metric must be one of {METRICS}")


def _summarize(vals: np.ndarray, how: str) -> float:
    if how == "mean":
        return float(vals.mean())
    if how == "median":
        return float(np.median(vals))
    if how == "mode":
        u, c = np.unique(vals, return_counts=True)
        return float(u[np.argmax(c)])  # ties → smallest value (np.unique sorted)
    if how == "min":
        return float(vals.min())
    if how == "max":
        return float(vals.max())
    if how == "stddev":
        return float(vals.std())
    raise ValueError(f"summary must be one of {SUMMARIES}")


def knn_apply(
    apply_df: DataFrame,
    train_df: DataFrame,
    feat_cols: Sequence[str],
    val_col: str,
    id_col: str = "pt_id",
    k: int = 12,
    metric: str = "mahalanobis",
    summary: str = "median",
    dist_thres: float = np.inf,
) -> DataFrame:
    """Returns apply rows (id_col) + ``out_val`` (+``n_neigh``).

    Rows with no neighbour within dist_thres get null out_val (the
    reference leaves the RAT column at its init value)."""
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    if summary not in SUMMARIES:
        raise ValueError(f"summary must be one of {SUMMARIES}")
    spark = apply_df.sparkSession
    tr = train_df.select(*dict.fromkeys([*feat_cols, val_col])).toPandas()
    t_feats = tr[list(feat_cols)].to_numpy(np.float64)
    t_vals = tr[val_col].to_numpy(np.float64)
    vi = None
    if metric == "mahalanobis":
        cov = np.cov(t_feats, rowvar=False)
        cov = np.atleast_2d(cov)
        vi = np.linalg.pinv(cov)
    b = spark.sparkContext.broadcast((t_feats, t_vals, vi))

    src = apply_df.select(id_col, *feat_cols)
    schema = f"{id_col} long, out_val double, n_neigh int"

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tf, tv, vi_ = b.value
        for pdf in it:
            if not len(pdf):
                continue
            q = pdf[list(feat_cols)].to_numpy(np.float64)
            dm = _distances(q, tf, metric, 2.0, vi_)
            ids = pdf[id_col].to_numpy(np.int64)
            out_val = np.full(len(pdf), np.nan)
            n_neigh = np.zeros(len(pdf), dtype=np.int32)
            # top-k per row under threshold
            kk = min(k, dm.shape[1])
            part = np.argpartition(dm, kk - 1, axis=1)[:, :kk]
            for i in range(len(pdf)):
                cand = part[i]
                dd = dm[i, cand]
                ok = dd < dist_thres
                if not ok.any():
                    continue
                sel = cand[ok]
                dd = dd[ok]
                order = np.argsort(dd, kind="stable")
                sel = sel[order][:k]
                out_val[i] = _summarize(tv[sel], summary)
                n_neigh[i] = len(sel)
            yield pd.DataFrame({id_col: ids, "out_val": out_val, "n_neigh": n_neigh})

    return src.mapInPandas(_run, schema=schema)


def closest_point_join(
    base: DataFrame,
    match: DataFrame,
    tolerance: float = np.inf,
    base_id: str = "pt_id",
    match_id: str = "pt_id",
) -> DataFrame:
    """k=1 spatial join point→closest point (match side broadcast).

    Output: base_id, match_id (nullable), dist. Ties broken by smallest
    match id (deviation from the reference, which raises —
    ``vectorutils/__init__.py:3428-3434``)."""
    spark = base.sparkSession
    m = match.select(match_id, "x", "y").toPandas()
    b = spark.sparkContext.broadcast(
        (m[match_id].to_numpy(np.int64), m["x"].to_numpy(np.float64), m["y"].to_numpy(np.float64))
    )
    schema = f"{base_id} long, closest_id long, dist double"
    src = base.select(base_id, "x", "y")

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mid, mx, my = b.value
        # deterministic tie-break: pre-sort by id so argmin picks smallest
        order = np.argsort(mid, kind="stable")
        mid_s, mx_s, my_s = mid[order], mx[order], my[order]
        for pdf in it:
            if not len(pdf):
                continue
            qx = pdf["x"].to_numpy(np.float64)
            qy = pdf["y"].to_numpy(np.float64)
            d2 = (qx[:, None] - mx_s[None, :]) ** 2 + (qy[:, None] - my_s[None, :]) ** 2
            j = np.argmin(d2, axis=1)
            dist = np.sqrt(d2[np.arange(len(qx)), j])
            cid = mid_s[j].astype(np.float64)
            bad = dist >= tolerance
            cid[bad] = np.nan
            out = pd.DataFrame(
                {
                    base_id: pdf[base_id].to_numpy(np.int64),
                    "closest_id": pd.array(
                        np.where(bad, None, mid_s[j]), dtype="Int64"
                    ),
                    "dist": np.where(bad, np.nan, dist),
                }
            )
            yield out

    return src.mapInPandas(_run, schema=schema)


def radius_count(points: DataFrame, radius: float, id_col: str = "pt_id") -> DataFrame:
    """Count of OTHER points within ``radius`` of each point — reference
    ``calc_npts_in_radius`` (``vectorattrs/__init__.py:997-1049``, KDTree
    ball query minus self)."""
    spark = points.sparkSession
    p = points.select(id_col, "x", "y").toPandas()
    b = spark.sparkContext.broadcast(
        (p["x"].to_numpy(np.float64), p["y"].to_numpy(np.float64))
    )
    schema = f"{id_col} long, n_in_radius long"
    src = points.select(id_col, "x", "y")
    r2 = radius * radius

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ax, ay = b.value
        for pdf in it:
            if not len(pdf):
                continue
            qx = pdf["x"].to_numpy(np.float64)
            qy = pdf["y"].to_numpy(np.float64)
            d2 = (qx[:, None] - ax[None, :]) ** 2 + (qy[:, None] - ay[None, :]) ** 2
            n = (d2 <= r2).sum(axis=1) - 1  # minus self
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(np.int64), "n_in_radius": n})

    return src.mapInPandas(_run, schema=schema)
