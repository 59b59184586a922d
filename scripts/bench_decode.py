#!/usr/bin/env python
"""Decode-INCLUSIVE throughput bench (VERDICT r1: the synthetic
north-star number excludes codec I/O; at 100 TB decode dominates).

Builds (once, cached) a bytes-bearing image table by DISTRIBUTED
generation — datagen's Philox per-row streams make spark.range →
mapInPandas produce the identical table a driver loop would — then
benches the two decode-heavy operators end-to-end:

 - image_features: decode → stats + 4×4 thumb + phash per image
 - tile_images:   decode → 64×64 tile rows with cell assignment

Output: one JSON line {images_per_sec, mpx_per_sec, ...} per op; also
appended (by hand) to BENCH/BASELINE.md for round-over-round tracking.

Usage: python scripts/bench_decode.py [n_images]   (default 50000)
Env:   SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_data")


def build_table(spark, n: int, seed: int = 42) -> str:
    path = os.path.join(DATA_DIR, f"decode_images_{n}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from rsgislib_spark import datagen

    def _gen(it):
        for pdf in it:
            yield datagen.gen_images_rows(pdf["id"].to_numpy(), seed=seed, with_pixels=True)

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, minx double, miny double"
    )
    t0 = time.perf_counter()
    (
        spark.range(n)
        .repartition(128)
        .mapInPandas(_gen, schema=schema)
        .write.mode("overwrite")
        .parquet(path)
    )
    print(f"# built {path} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from rsgislib_spark.operators.multimodal import image_features
    from rsgislib_spark.operators.tiler import tile_images
    from rsgislib_spark.pipeline import north_star_decoded
    from rsgislib_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # binary-payload tables are BYTE-heavy, row-light: the default 128 MB
    # scan split yields ~10 partitions for 1.2 GB and idles 2/3 of the
    # cores — split by bytes so the decode fan-out fills the machine
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="bench_decode",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    path = build_table(spark, n)
    images = spark.read.parquet(path)
    n_rows = images.count()
    tot_px = images.agg(F.sum(F.col("w").cast("long") * F.col("h"))).first()[0]

    # full flagship over stored bytes: scan → decode → kernels → zonal
    # rollup (the q91 path) — the measured window excludes encode, like a
    # production scan of the stored bytes column would
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    imgs_ns = images.select(
        "bytes", "fmt", "w", "h", "minx", "miny",
        (F.col("minx") + F.col("w") * 10.0).alias("maxx"),
        (F.col("miny") + F.col("h") * 10.0).alias("maxy"),
    )

    # optional op filter (argv[2:]): host bursts arrive every few minutes
    # and the full 3-op sweep straddles them — per-op runs fit a quiet gap
    only = set(sys.argv[2:])
    results = {}
    # Arrow batch sizing is PER-OP (interleaved A/B, r4): transfer-bound
    # ops (image_features, tile_images — fat bytes in, and tiles out)
    # win ~3× with 64-row batches because an 8 MB partition is ~330 rows
    # = ONE default batch per task, serializing transfer then compute;
    # q91's fused decode+zonal kernel computes enough per row that
    # per-batch overhead dominates instead, so it keeps the default.
    batch_recs = {"image_features": "64", "tile_images": "64",
                  "north_star_decoded": "10000"}
    for name, job in (
        ("image_features", lambda: image_features(images)),
        ("tile_images", lambda: tile_images(images, 64, 64)),
        (
            "north_star_decoded",
            lambda: north_star_decoded(spark, sf_dir, images_bytes=imgs_ns),
        ),
    ):
        if only and name not in only:
            continue
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", batch_recs[name]
        )
        best = None
        # min-of-N against host noise (bursts arrive ~every 6 min; more
        # repeats raise the chance one run lands clean)
        for _ in range(int(os.environ.get("BENCH_REPEATS", "2"))):
            t0 = time.perf_counter()
            job().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {
            "sec": round(best, 3),
            "images_per_sec": round(n_rows / best, 1),
            "mpx_per_sec": round(tot_px / best / 1e6, 1),
        }
    spark.stop()
    print(json.dumps({
        "metric": "decode_inclusive_throughput",
        "n_images": n_rows,
        "total_mpx": round(tot_px / 1e6, 1),
        "cpus": cpus,
        "ops": results,
    }))


if __name__ == "__main__":
    main()
