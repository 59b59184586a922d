"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: derive image footprints + zone rects from the
sf0.001 tables, run the engine's broadcast-STRtree spatial join
(intersects), attach zone class + tile counts — the north-star
spatial-join + tiling pipeline in one DataFrame.

``queries()`` / ``oracle_sql()`` — the catalog in
``rsgislib_spark.queries`` (every implemented operator family from
SURVEY.md §2 has at least one entry; oracles are ANSI SQL for DuckDB).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-star spatial-join + tiling pipeline
    (rsgislib_spark.pipeline.north_star) on /root/testdata/sf0.001 —
    footprints → fused tiler/band/focal kernels → map-side STRtree zonal
    rollup → per-zone stats. Driver checks rows>0 + stable schema."""
    from rsgislib_spark.pipeline import north_star

    return north_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rsgislib_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rsgislib_spark.queries import ORACLES

    return dict(ORACLES)
