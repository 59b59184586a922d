#!/usr/bin/env python
"""spark-submit driver for the north-star pipeline.

Cluster deployment (the north rule's mode):

    scripts/build_pyfiles.sh
    spark-submit --master <cluster> --py-files dist/rsgislib_spark.zip \
        scripts/submit_north_star.py <sf_dir> [replicate]

Local smoke: same command with --master 'local[4]'. Prints one JSON line
with row count and elapsed seconds.
"""

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_partitions = int(sys.argv[3]) if len(sys.argv) > 3 else None
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    spark = (
        SparkSession.builder.appName("north_star_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # package ships via --py-files; import AFTER the session exists
    from rsgislib_spark.pipeline import north_star

    walls, rows = [], []
    for _ in range(max(1, runs)):  # runs>1: first wall is the JIT warmup
        t0 = time.perf_counter()
        rows = north_star(spark, sf_dir, n_partitions=n_partitions,
                          replicate=rep).collect()
        walls.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "zones": len(rows),
                "elapsed_s": min(walls[1:]) if len(walls) > 1 else walls[0],
                "walls": walls,
                "sf_dir": sf_dir,
                "replicate": rep,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
