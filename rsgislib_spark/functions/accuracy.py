"""Classification accuracy assessment — confusion matrix, per-class
precision/recall/F1, overall accuracy, Cohen's kappa, and the Pontius &
Millones (2011) quantity/allocation disagreement.

Reference: classification/classaccuracymetrics.py —
calc_class_accuracy_metrics (:120, sklearn confusion_matrix + per-class
P/R/F1 + cohen_kappa) and cls_quantity_accuracy (:46, Pontius Q/A/C/D).

Spark shape: one groupBy(ref, pred) shuffle produces the k×k confusion
counts (k tiny); every metric thereafter is a join/aggregate over that
≤k²-row table, entirely Catalyst — no Python, no collect. At 100 TB the
only pixel-scale pass is the single partial-aggregated count.

Exactness: every metric is a SINGLE division of exactly-computed BIGINT
quantities (e.g. kappa = (n·Σdiag − Σ row_k·col_k) / (n² − Σ
row_k·col_k); F1 = 2·diag / (row+col)), so Spark and any ANSI-SQL
oracle agree bit-for-bit after ROUND. For Q/A the per-class area is the
TRUE-class total (documented parameterization of cls_area), which
collapses the row-normalised confusion to cm/n and keeps all
disagreements integer-ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def confusion_counts(df: DataFrame, ref_col: str, pred_col: str) -> DataFrame:
    """k×k confusion counts: (ref, pred, n). One shuffle, map-side
    combined."""
    return df.groupBy(
        F.col(ref_col).alias("ref"), F.col(pred_col).alias("pred")
    ).agg(F.count("*").alias("n"))


def class_accuracy_metrics(
    df: DataFrame, ref_col: str, pred_col: str, digits: int = 6
) -> DataFrame:
    """Per-class accuracy metrics plus the overall/summary metrics
    repeated on every row (single result set, hash-stable).

    Columns: class_id, support (true count), n_pred, n_correct,
    precision, recall, f1, overall_accuracy, cohen_kappa,
    quantity_dis, allocation_dis, proportion_correct.
    """
    # localCheckpoint (eager) instead of persist(): the k×k counts are tiny,
    # and checkpointing releases the upstream lineage/cache immediately —
    # repeated calls in a long-lived session leave no CacheManager residue
    # (same pattern as minhash_band_pairs / ngram_jaccard_pairs).
    cm = confusion_counts(df, ref_col, pred_col).localCheckpoint(eager=True)

    row = cm.groupBy("ref").agg(F.sum("n").alias("row_n"))
    col = cm.groupBy("pred").agg(F.sum("n").alias("col_n"))
    diag = cm.filter(F.col("ref") == F.col("pred")).select(
        F.col("ref").alias("class_id"), F.col("n").alias("diag_n")
    )

    classes = (
        row.select(F.col("ref").alias("class_id"))
        .union(col.select(F.col("pred").alias("class_id")))
        .distinct()
    )
    per = (
        classes.join(row.withColumnRenamed("ref", "class_id"), "class_id", "left")
        .join(col.withColumnRenamed("pred", "class_id"), "class_id", "left")
        .join(diag, "class_id", "left")
        .select(
            "class_id",
            F.coalesce("row_n", F.lit(0)).alias("support"),
            F.coalesce("col_n", F.lit(0)).alias("n_pred"),
            F.coalesce("diag_n", F.lit(0)).alias("n_correct"),
        )
    )

    # overall scalars: n, sum diag, sum row_k*col_k, Q/A integer parts
    tot = per.agg(
        F.sum("support").alias("n"),
        F.sum("n_correct").alias("sum_diag"),
        F.sum(F.col("support") * F.col("n_pred")).alias("sum_rowcol"),
        F.sum(F.abs(F.col("support") - F.col("n_pred"))).alias("sum_absdiff"),
        F.sum(
            F.least(
                F.col("support") - F.col("n_correct"),
                F.col("n_pred") - F.col("n_correct"),
            )
        ).alias("sum_minco"),
    )

    r = lambda c: F.round(c, digits)
    out = per.crossJoin(F.broadcast(tot)).select(
        "class_id",
        "support",
        "n_pred",
        "n_correct",
        r(F.when(F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred"))
          .otherwise(F.lit(0.0))).alias("precision"),
        r(F.when(F.col("support") > 0, F.col("n_correct") / F.col("support"))
          .otherwise(F.lit(0.0))).alias("recall"),
        r(F.when(F.col("support") + F.col("n_pred") > 0,
                 2.0 * F.col("n_correct") / (F.col("support") + F.col("n_pred")))
          .otherwise(F.lit(0.0))).alias("f1"),
        r(F.col("sum_diag") / F.col("n")).alias("overall_accuracy"),
        r((F.col("n") * F.col("sum_diag") - F.col("sum_rowcol"))
          / (F.col("n") * F.col("n") - F.col("sum_rowcol"))).alias("cohen_kappa"),
        r(F.col("sum_absdiff") / (2.0 * F.col("n"))).alias("quantity_dis"),
        r(F.col("sum_minco") / F.col("n")).alias("allocation_dis"),
        r(F.col("sum_diag") / F.col("n")).alias("proportion_correct"),
    )
    return out
