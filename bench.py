#!/usr/bin/env python
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` additionally runs the flagship spatial-join+tiling job at
local[8] and local[32] on the same input and reports throughput at both
plus scaling efficiency (the sandbox proxy for the north rule's N→4N
cluster-size criterion) — results written to BENCH/BASELINE.md by
scripts/run_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q10_cell_assign",
    "q11_spatial_join_intersects",
    "q14_zonal_point_stats",
    "q16_knn_zone_centers",
    "q19_tile_grid",
    "q20_tile_cells",
    "q25_focal_mean",
    "q31_token_stats",
    "q35_minhash_bands",
    "q40_ann_cosine_topk",
    "q55_salted_cell_join",
    "q64_north_star",
    "q91_north_star_decoded",
]


def run_bench(sf_dir: str, cpus: int, queries_to_run=None) -> dict:
    from rsgislib_spark.queries import QUERIES
    from rsgislib_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="rsgislib_spark_bench")
    timings = {}
    names = queries_to_run or HEADLINE
    # Warm the fixed startup paths once so per-query walls measure the
    # engine, not process bring-up: parquet reader + whole-stage codegen
    # (a real groupBy-agg) and the Python worker pool (a no-op
    # mapInPandas). Each query still pays its own codegen compile.
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey").agg(F.count("*"), F.sum("n_nationkey"))
        .collect()
    )
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        timings[f"{name}__rows"] = n
    spark.stop()
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    timings = run_bench(sf_dir, cpus)
    qt = {k: v for k, v in timings.items() if not k.endswith("__rows")}
    total = round(sum(qt.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": qt,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
