"""Histogram-based automatic thresholding (Otsu).

Reference: tools/stats.calc_otsu_threshold (python/rsgislib/tools/
stats.py:641-676, the scikit-image formulation: argmax over
between-class variance w1·w2·(µ1−µ2)²) and its windowed/per-image
application calc_split_win_thresholds (imagecalc/__init__.py:1581+).

Spark shape: the pixel-scale pass is ONE value-histogram aggregation
(map-side combined groupBy); threshold selection runs over the tiny
per-group histogram with window functions — entirely Catalyst, no
Python, no collect. At 100 TB the argmax input is |groups|·|distinct
values| rows.

Exactness/deviation: bins are the exact integer value domain (the
reference approximates with ~sqrt-rule fixed-width bins,
get_nbins_histogram); the variance metric is computed as
(c1·c2)·(s1/c1 − s2/c2)² from exact BIGINT cumulative counts/sums, so
Spark and an ANSI-SQL oracle produce bit-identical doubles and agree on
the argmax. Ties take the smallest threshold value (numpy argmax
first-max under ascending order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def value_histogram(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group integer-value histogram: (*group_cols, v, n)."""
    return df.groupBy(*group_cols, F.col(value_col).alias("v")).agg(
        F.count("*").alias("n")
    )


def otsu_threshold_from_histogram(
    hist: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Otsu threshold per group from a (v, n) histogram.

    Returns one row per group: (*group_cols, thres_v, n_lo, n_hi) where
    class 1 = values <= thres_v. thres_v never equals the group maximum
    (class 2 must be non-empty, stats.py:674 clips the last bin).
    """
    w = W.partitionBy(*group_cols).orderBy("v")
    cum = hist.select(
        *group_cols,
        "v",
        F.sum("n").over(w).alias("c1"),
        F.sum(F.col("n") * F.col("v")).over(w).alias("s1"),
    )
    tot = hist.groupBy(*group_cols).agg(
        F.sum("n").alias("nt"), F.sum(F.col("n") * F.col("v")).alias("st")
    )
    j = (
        cum.join(tot, group_cols)
        .withColumn("c2", F.col("nt") - F.col("c1"))
        .withColumn("s2", F.col("st") - F.col("s1"))
        .filter(F.col("c2") > 0)
    )
    d = F.col("s1") / F.col("c1") - F.col("s2") / F.col("c2")
    j = j.withColumn("metric", (F.col("c1") * F.col("c2")) * (d * d))
    rk = W.partitionBy(*group_cols).orderBy(F.desc("metric"), F.asc("v"))
    return (
        j.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select(
            *group_cols,
            F.col("v").alias("thres_v"),
            F.col("c1").alias("n_lo"),
            F.col("c2").alias("n_hi"),
        )
    )


def otsu_threshold(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Otsu threshold per group straight from a row-per-observation
    DataFrame (one histogram shuffle + tiny window argmax)."""
    return otsu_threshold_from_histogram(
        value_histogram(df, value_col, group_cols), group_cols
    )


def otsu_outliers(
    df: DataFrame, value_col: str, group_cols: list[str], low_tail: bool = True
) -> DataFrame:
    """Per-group Otsu outlier flagging (changedetect
    find_class_otsu_outliers, pxloutlierchng.py:344-433): each group
    (class) gets its own Otsu threshold; rows strictly beyond it on the
    chosen tail are flagged 2 ('chng'), the rest 1 ('no_chng') — the
    reference's band-math encoding. One histogram shuffle + a tiny
    broadcast join back."""
    thres = otsu_threshold(df, value_col, group_cols).select(
        *group_cols, "thres_v"
    )
    v = F.col(value_col)
    flag = (
        F.when(v < F.col("thres_v"), F.lit(2)) if low_tail
        else F.when(v > F.col("thres_v"), F.lit(2))
    ).otherwise(F.lit(1))
    return df.join(F.broadcast(thres), group_cols).withColumn("chng_cls", flag)
