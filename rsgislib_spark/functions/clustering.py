"""Clustering — deterministic k-means (and an ISODATA-lite variant) as
iterative groupBy-centroid loops, the Spark shape of the reference's
``kmeans_clustering`` / ``isodata_clustering``
(python/src/imagecalc.cpp:1888-1942; init methods enum
python/rsgislib/__init__.py:203-208).

Physical shape: centroids live on the driver (k rows) and enter the plan
as LITERALS each iteration — the per-row assignment is pure Catalyst
(array of (dist², cid) structs → array_min, tie-break by centroid id),
the centroid update is one groupBy over integer sums. No UDF, no
broadcast join; each iteration is one shuffle of k·|partitions| partial
rows. Deterministic end-to-end: init = features of the k smallest-id
rows, ties broken by id, empty clusters keep their previous centroid.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F


def kmeans_assign(
    df: DataFrame, feat_cols: Sequence[str], centroids: Sequence[Sequence[float]]
) -> DataFrame:
    """Add a ``cluster`` column = argmin centroid by squared euclidean
    distance (ties → smallest centroid id). Pure Catalyst."""
    entries = []
    for cid, cent in enumerate(centroids):
        d2 = F.lit(0.0)
        for col, m in zip(feat_cols, cent):
            diff = F.col(col).cast("double") - F.lit(float(m))
            d2 = d2 + diff * diff
        entries.append(F.struct(d2.alias("d"), F.lit(cid).alias("c")))
    return df.withColumn("cluster", F.array_min(F.array(*entries))["c"])


def kmeans_fit(
    df: DataFrame,
    feat_cols: Sequence[str],
    k: int = 4,
    n_iter: int = 10,
    id_col: str | None = None,
    tol: float = 0.0,
) -> list:
    """Deterministic Lloyd iterations; returns the final centroid list.

    Init = feature vectors of the k smallest ``id_col`` rows (the
    reference's diagonal/kpp inits are seeded differently but equally
    deterministic — documented deviation). Stops after ``n_iter`` or
    when no centroid moves more than ``tol`` (L∞)."""
    if id_col is not None:
        init_rows = df.orderBy(id_col).limit(k).select(*feat_cols).collect()
    else:
        init_rows = df.orderBy(*feat_cols).limit(k).select(*feat_cols).collect()
    cents = [[float(r[c]) for c in feat_cols] for r in init_rows]
    if len(cents) < k:
        raise ValueError(f"need at least k={k} rows to initialise")
    for _ in range(n_iter):
        assigned = kmeans_assign(df, feat_cols, cents)
        stats = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col(c).cast("double")).alias(f"s_{c}") for c in feat_cols],
        ).collect()
        by_c = {int(r["cluster"]): r for r in stats}
        new_cents = []
        shift = 0.0
        for cid in range(k):
            r = by_c.get(cid)
            if r is None or r["n"] == 0:
                new_cents.append(cents[cid])  # empty cluster keeps centroid
                continue
            c_new = [float(r[f"s_{c}"]) / float(r["n"]) for c in feat_cols]
            shift = max(shift, max(abs(a - b) for a, b in zip(c_new, cents[cid])))
            new_cents.append(c_new)
        cents = new_cents
        if shift <= tol:
            break
    return cents


def isodata_fit(
    df: DataFrame,
    feat_cols: Sequence[str],
    k: int = 4,
    n_iter: int = 10,
    min_cluster_size: int = 1,
    id_col: str | None = None,
) -> list:
    """ISODATA-lite: k-means iterations, but clusters falling under
    ``min_cluster_size`` are DROPPED (their points re-assign next round)
    — the discard half of the reference's isodata (split is not
    implemented; documented gap)."""
    cents = kmeans_fit(df, feat_cols, k=k, n_iter=1, id_col=id_col)
    for _ in range(n_iter):
        assigned = kmeans_assign(df, feat_cols, cents)
        stats = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col(c).cast("double")).alias(f"s_{c}") for c in feat_cols],
        ).collect()
        keep = []
        for r in sorted(stats, key=lambda r: int(r["cluster"])):
            if int(r["n"]) >= min_cluster_size:
                keep.append([float(r[f"s_{c}"]) / float(r["n"]) for c in feat_cols])
        if not keep:
            return cents
        cents = keep
    return cents
