"""Clustering — deterministic k-means and full ISODATA (discard / merge-remove / split) as
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


def _isodata_add_remove(
    clusters: list,
    min_cluster_size: int,
    min_dist_clusters: float,
    max_std_dev: float,
    min_n_clusters: int,
) -> list:
    """Driver-side replay of the reference's addRemoveClusters
    (RSGISISODataClusterer, src/math/RSGISClustering.cpp:1061-1146):

    1. If more than ``min_n_clusters`` clusters exist AT ENTRY (the
       reference checks the floor ONCE, cpp:1063 — sequential deletions
       inside the loop can legally drop the count below it), iterate in
       list order: drop clusters with fewer than ``min_cluster_size``
       members, then drop the CURRENT cluster if any still-listed
       cluster with a different centre lies within ``min_dist_clusters``
       (euclidean) — the same sequential erase-while-iterating
       semantics. "Different centre" is the reference's value-equality
       ``sameCluster`` test (cpp:1082-1089), NOT an index check: two
       clusters with bit-identical centres are never removed by the
       min-dist rule, exactly as in the reference.
    2. Split every survivor whose MEAN per-dim stddev exceeds
       ``max_std_dev`` and whose size exceeds 2·min_cluster_size: the
       new cluster sits at centre − σ/2 per dim, the original moves to
       centre + σ/2; new clusters append in iteration order.

    ``clusters`` is a list of dicts {centre, std, n}; returns the new list.
    """
    cl = [dict(c) for c in clusters]
    if len(cl) > min_n_clusters:
        i = 0
        while i < len(cl):
            if cl[i]["n"] < min_cluster_size:
                del cl[i]
                continue
            removed = False
            for j in range(len(cl)):
                if all(a == b for a, b in zip(cl[j]["centre"], cl[i]["centre"])):
                    continue
                d = (
                    sum((a - b) ** 2 for a, b in zip(cl[j]["centre"], cl[i]["centre"]))
                    ** 0.5
                )
                if d < min_dist_clusters:
                    del cl[i]
                    removed = True
                    break
            if not removed:
                i += 1
    new = []
    for c in cl:
        mean_std = sum(c["std"]) / len(c["std"])
        if mean_std > max_std_dev and c["n"] > min_cluster_size * 2:
            new.append(
                {
                    "centre": [m - s / 2 for m, s in zip(c["centre"], c["std"])],
                    "std": [0.0] * len(c["std"]),
                    "n": 0,
                }
            )
            c["centre"] = [m + s / 2 for m, s in zip(c["centre"], c["std"])]
    return cl + new


def isodata_fit(
    df: DataFrame,
    feat_cols: Sequence[str],
    k: int = 4,
    n_iter: int = 10,
    min_cluster_size: int = 1,
    id_col: str | None = None,
    min_dist_clusters: float = 0.0,
    max_std_dev: float = float("inf"),
    min_n_clusters: int = 1,
) -> list:
    """ISODATA (isodata_clustering, imagecalc.cpp:1888-1942; clusterer
    src/math/RSGISClustering.cpp:949-1146): k-means assign/update
    rounds, then the add/remove/split pass each round — small clusters
    discarded, near-duplicate centres removed (sequential rule), and
    high-variance clusters split ±σ/2 about the mean. Per-cluster σ is
    the population stddev from (n, Σx, Σx²) moment sums — one extra
    aggregate column per feature, still a single shuffle per round."""
    cents = kmeans_fit(df, feat_cols, k=k, n_iter=1, id_col=id_col)
    for _ in range(n_iter):
        assigned = kmeans_assign(df, feat_cols, cents)
        stats = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col(c).cast("double")).alias(f"s_{c}") for c in feat_cols],
            *[
                F.sum(F.col(c).cast("double") * F.col(c).cast("double")).alias(f"q_{c}")
                for c in feat_cols
            ],
        ).collect()
        clusters = []
        for r in sorted(stats, key=lambda r: int(r["cluster"])):
            n = int(r["n"])
            mean = [float(r[f"s_{c}"]) / n for c in feat_cols]
            std = [
                max(float(r[f"q_{c}"]) / n - m * m, 0.0) ** 0.5
                for c, m in zip(feat_cols, mean)
            ]
            clusters.append({"centre": mean, "std": std, "n": n})
        if not clusters:
            return cents
        clusters = _isodata_add_remove(
            clusters, min_cluster_size, min_dist_clusters, max_std_dev, min_n_clusters
        )
        if not clusters:
            return cents
        cents = [c["centre"] for c in clusters]
    return cents
