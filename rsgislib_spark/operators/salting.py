"""Deterministic hot-cell salting — the engine's primary skew strategy
(SURVEY §4.2; AQE skew-join stays enabled as backstop, not primary).

At 10^12-image scale a handful of grid cells hold millions of footprints
(the synthetic corpus reproduces this: ~20% of images in ~1% of cells).
A cell equi-join then stalls on a few straggler tasks. Salting splits hot
cells into ``cell#salt`` subkeys:

 - big side: ``salt = xxhash64(id) % n_salts`` for hot cells, else 0 —
   HASH-based, so retries and manifest resume see identical assignment
   (north-rule determinism requirement);
 - small side: replicated once per salt for hot cells, else salt 0.

``repartitionByRange`` on the (Morton-ordered) cell id gives the
spatially-contiguous range partitioning the north rule asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def find_hot_cells(df: DataFrame, cell_col: str = "cell", hot_threshold: int = 100_000) -> DataFrame:
    """Cells whose row count exceeds the threshold (one cheap agg pass)."""
    return (
        df.groupBy(cell_col)
        .agg(F.count("*").alias("cell_rows"))
        .filter(F.col("cell_rows") > hot_threshold)
        .select(cell_col, "cell_rows")
    )


def with_salt(
    df: DataFrame,
    hot_cells: DataFrame,
    id_col: str,
    cell_col: str = "cell",
    n_salts: int = 8,
) -> DataFrame:
    """Big side: add deterministic ``salt`` (0 for cold cells)."""
    hot = F.broadcast(hot_cells.select(cell_col).withColumn("_hot", F.lit(True)))
    return (
        df.join(hot, cell_col, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("_hot")
    )


def replicate_for_salt(
    small: DataFrame,
    hot_cells: DataFrame,
    cell_col: str = "cell",
    n_salts: int = 8,
) -> DataFrame:
    """Small side: one copy per salt for hot cells, single copy otherwise."""
    hot = F.broadcast(hot_cells.select(cell_col).withColumn("_hot", F.lit(True)))
    salts = F.when(
        F.col("_hot").isNotNull(), F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    return (
        small.join(hot, cell_col, "left")
        .withColumn("salt", F.explode(salts))
        .withColumn("salt", F.col("salt").cast("int"))
        .drop("_hot")
    )


def salted_cell_join(
    big: DataFrame,
    small: DataFrame,
    big_id: str,
    cell_col: str = "cell",
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Cell equi-join with automatic hot-cell salting.

    Result is identical to ``big.join(small, cell_col)`` — salting only
    changes the physical key distribution.
    """
    hot = find_hot_cells(big, cell_col, hot_threshold)
    b = with_salt(big, hot, big_id, cell_col, n_salts)
    s = replicate_for_salt(small, hot, cell_col, n_salts)
    return b.join(s, [cell_col, "salt"], how).drop("salt")
