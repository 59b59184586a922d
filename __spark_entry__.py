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
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from rsgislib_spark import queries as Q
    from rsgislib_spark.operators.spatial_join import spatial_join_broadcast

    sf_dir = "/root/testdata/sf0.001"
    Q.load_views(spark, sf_dir)
    images = Q._geo_images(spark).withColumnRenamed("image_key", "image_id")
    zones = spark.createDataFrame(Q._zones_with_wkb(spark))
    joined = spatial_join_broadcast(
        images, zones, join_op="intersects", join_how="inner", id_col="image_id"
    )
    tiles = Q.q19_tile_grid(spark, sf_dir).groupBy(
        F.col("image_key").alias("image_id")
    ).agg(F.count("*").alias("n_tiles"))
    return (
        joined.join(tiles, "image_id")
        .select("image_id", "zone_id", "class_name", "minx", "miny", "maxx", "maxy", "n_tiles")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rsgislib_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rsgislib_spark.queries import ORACLES

    return dict(ORACLES)
